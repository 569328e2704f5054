package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.3 additions (round 5): character-entropy scoring and C4-style
  * line-level filtering — two more of the text-quality gates a training-data
  * pipeline runs before anything expensive (reference scope: the
  * training-data operators SURVEY.md §2 adds beyond the reference's own SQL
  * surface, which serves arbitrary DuckDB SQL over one table —
  * IcebergConnection.py:99-131).
  *
  * Scale shape: both are linear, keyed only on doc_id (never a content key),
  * and every aggregate map-side combines. Entropy explodes one row per
  * character — the same O(corpus bytes) a tokenizing scan already pays — and
  * the C4 filter explodes one row per 12-word line.
  */
object TextOps3 {

  /** Per-document character-level Shannon entropy (plus distinct-char
    * count) — the classic gibberish/binary-junk detector: natural text sits
    * near 4.1 bits-equivalent (~2.9 nats), base64/hex junk runs higher,
    * mojibake and repeated-char padding lower. Identity used:
    * H = ln(N) − (Σ n·ln n)/N over per-char counts n, so the whole thing is
    * TWO map-side-combined aggregates — (doc_id, ch) counts, then one
    * doc_id-keyed rollup; no join-back of totals. Per-term products are
    * rounded then decimal-summed (§4 rule: fp sums must not depend on
    * partition order). */
  def tEntropy(spark: SparkSession, dir: String): DataFrame = {
    val chars = Tables.fanout(
      Tables.table(spark, dir, "documents").select("doc_id", "text"))
      // empty docs: Spark's 2-arg sequence(1, 0) infers step -1 and emits
      // phantom rows (the ADVICE r4 Multimodal2 bug class); DuckDB's
      // range(1, 1) is empty. Filter them out identically on both sides.
      .where(length(col("text")) > 0)
      .select(col("doc_id"), lower(col("text")).as("text"))
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("text")))).as("i"),
        col("text"))
      .select(col("doc_id"), expr("substring(text, i, 1)").as("ch"))
    chars
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("distinct_chars"),
        sum(col("n")).cast("long").as("n_chars_counted"),
        expr("cast(sum(cast(round(n * ln(n), 6) as decimal(30,7))) as double)")
          .as("s"))
      .select(col("doc_id"), col("distinct_chars"), col("n_chars_counted"),
        expr("round(ln(n_chars_counted) - s / n_chars_counted, 4)")
          .as("char_entropy"))
      .orderBy("doc_id")
  }

  val tEntropySql: String =
    """WITH chars AS (
      |  SELECT doc_id,
      |    substr(lower(text), CAST(unnest(range(1, length(text) + 1)) AS INT), 1) AS ch
      |  FROM documents WHERE length(text) > 0),
      |cnt AS (SELECT doc_id, ch, COUNT(*) AS n FROM chars GROUP BY 1, 2)
      |SELECT doc_id, COUNT(*) AS distinct_chars,
      |  CAST(SUM(n) AS BIGINT) AS n_chars_counted,
      |  round(ln(CAST(SUM(n) AS BIGINT))
      |    - CAST(SUM(CAST(round(n * ln(n), 6) AS DECIMAL(30,7))) AS DOUBLE)
      |      / CAST(SUM(n) AS BIGINT), 4) AS char_entropy
      |FROM cnt GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // 12-word "lines" via one sequential-findall regex pass (the corpus has no
  // newlines — same deterministic segmentation trick as ChunkOps; on real
  // data the identical operator runs on split(text, '\n')).
  private val lineRe = "(?:\\S+ ){11}\\S+"
  private def norm(c: org.apache.spark.sql.Column) =
    trim(regexp_replace(lower(c), "\\s+", " "))
  private val normSql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  /** C4/RefinedWeb-style LINE-level cleaning: segment each doc into lines,
    * keep a line iff (a) it is mostly non-repetitive — ≥ 7 of its 12 words
    * distinct — and (b) it contains no blocklisted token ('dup' stands in
    * for C4's bad-word list; the rule shape, a word-boundary containment
    * test on the normalized line, is the real thing). Emits per-doc line
    * counts, kept fraction, and the md5 of the IN-ORDER surviving text — the
    * cleaned doc itself, proving reassembly order, not just counts.
    *
    * Plan: chunking + per-line rules are all scan-projection column algebra;
    * the only shuffle is the doc_id-keyed reassembly aggregate (collect_list
    * is bounded by lines-per-doc, order restored by array_sort on the
    * (idx, line) struct — no window). */
  def tC4Filter(spark: SparkSession, dir: String): DataFrame = {
    val lines = Tables.fanout(
      Tables.table(spark, dir, "documents").select("doc_id", "text"))
      .select(col("doc_id"),
        posexplode(regexp_extract_all(norm(col("text")), lit(lineRe), lit(0)))
          .as(Seq("idx", "line")))
      .withColumn("keep",
        size(array_distinct(split(col("line"), " "))) >= 7 &&
          !concat(lit(" "), col("line"), lit(" ")).contains(" dup "))
    lines.groupBy("doc_id")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("keep").cast("long")).as("kept_lines"),
        md5(array_join(
          expr("transform(array_sort(collect_list(CASE WHEN keep THEN struct(idx, line) END)), x -> x.line)"),
          " ")).as("kept_md5"))
      .select(col("doc_id"), col("n_lines"), col("kept_lines"),
        round(col("kept_lines").cast("double") / col("n_lines"), 4)
          .as("kept_frac"),
        col("kept_md5"))
      .orderBy("doc_id")
  }

  val tC4FilterSql: String =
    s"""WITH ln AS (
       |  SELECT doc_id,
       |    generate_subscripts(regexp_extract_all($normSql, '$lineRe'), 1) - 1 AS idx,
       |    unnest(regexp_extract_all($normSql, '$lineRe')) AS line
       |  FROM documents),
       |k AS (
       |  SELECT doc_id, idx, line,
       |    len(list_distinct(string_split(line, ' '))) >= 7
       |      AND NOT contains(' ' || line || ' ', ' dup ') AS keep
       |  FROM ln)
       |SELECT doc_id, COUNT(*) AS n_lines,
       |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS kept_lines,
       |  round(SUM(CASE WHEN keep THEN 1 ELSE 0 END)*1.0 / COUNT(*), 4) AS kept_frac,
       |  md5(coalesce(string_agg(CASE WHEN keep THEN line END, ' ' ORDER BY idx), '')) AS kept_md5
       |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t_entropy" -> (tEntropy _),
    "t_c4_filter" -> (tC4Filter _))

  val oracles: Map[String, String] = Map(
    "t_entropy" -> tEntropySql,
    "t_c4_filter" -> tC4FilterSql)
}
