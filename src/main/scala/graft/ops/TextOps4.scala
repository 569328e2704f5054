package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.3 addition (round 6): Unicode NFC normalization as a curation gate
  * (reference scope: the training-data operators SURVEY.md §2 adds beyond
  * the reference's own SQL surface, which serves arbitrary DuckDB SQL over
  * one table — IcebergConnection.py:99-131).
  *
  * Why it matters at 100 TB: fingerprint/dedup keys are byte-level, so the
  * SAME text in composed (U+00E9) vs decomposed (e + U+0301) form silently
  * defeats exact and near dedup — real web corpora mix both (different OS
  * text stacks emit different forms). Normalizing BEFORE fingerprinting
  * collapses the forms; this op measures and applies exactly that.
  *
  * Scale shape: one linear scan, zero shuffles before the driver-bound
  * ORDER BY; normalization runs inside whole-stage codegen via the native
  * [[graft.functions.NfcNormalize]] expression (no UDF), with an ASCII
  * byte-scan fast path that skips allocation for the dominant case.
  */
object TextOps4 {

  /** The planted suffix in DECOMPOSED form: "Cafe" + combining acute
    * U+0301 (built from a char escape so no source/tool encoding step can
    * silently compose it) — NFC composes the trailing "e"+U+0301 to U+00E9,
    * so planted docs are guaranteed `changed` and one codepoint shorter. */
  private[ops] val decomposedSuffix: String = " Cafe" + '́'

  /** Per-document NFC audit: deterministically plant the decomposed-accent
    * suffix on every 7th doc (the corpus itself is ASCII-clean, so the mixed
    * reality of web text is simulated in-plan, identically on both engines),
    * then normalize and report (changed?, codepoint counts, md5 content
    * fingerprint of the normalized text). The md5 is the dedup-key payload:
    * it proves both engines agree on every normalized BYTE, not just on
    * which docs changed. */
  def tNfcNormalize(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.fanout(Tables.table(spark, dir, "documents"))
    docs
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(decomposedSuffix))).otherwise(col("text")).as("raw"))
      .select(col("doc_id"), col("raw"),
        graft.functions.Str.nfc(col("raw")).as("nfcd"))
      .select(col("doc_id"),
        (col("raw") =!= col("nfcd")).as("changed"),
        length(col("raw")).as("n_raw"),
        length(col("nfcd")).as("n_nfc"),
        md5(col("raw").cast("binary")).as("fp_raw"),
        md5(col("nfcd").cast("binary")).as("fp"))
      .orderBy("doc_id")
  }

  /** DuckDB replays the plant + normalization with its own `nfc_normalize`
    * (utf8proc) — JDK and utf8proc agree on NFC for all assigned codepoints
    * of any overlapping Unicode version (the composition tables are
    * stabilized), so the md5 gate holds; exotic UNASSIGNED codepoints could
    * in principle differ across Unicode versions, but cannot occur here
    * (corpus + planted suffix are fully assigned). The combining acute is
    * interpolated as the literal U+0301 character and UTF-8-preserved
    * through oracle_sql.json. */
  val tNfcNormalizeSql: String =
    s"""WITH raw AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 7 = 0 THEN text || '$decomposedSuffix' ELSE text END AS raw
       |  FROM documents),
       |n AS (SELECT doc_id, raw, nfc_normalize(raw) AS nfcd FROM raw)
       |SELECT doc_id, raw <> nfcd AS changed,
       |  CAST(length(raw) AS INT) AS n_raw, CAST(length(nfcd) AS INT) AS n_nfc,
       |  md5(raw) AS fp_raw, md5(nfcd) AS fp
       |FROM n ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t_nfc_normalize" -> (tNfcNormalize _))

  val oracles: Map[String, String] = Map(
    "t_nfc_normalize" -> tNfcNormalizeSql)
}
