package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.2 Event analytics, part 2 (round 12): SAX motif discovery — the
  * time-series pattern-mining primitive (Lin et al., "Experiencing SAX",
  * DMKD 2007) the earlier event family stops short of: discretize the
  * daily series into a small symbolic alphabet, slide a fixed-length word
  * across it, and count recurring words (motifs). Recurring motifs are the
  * "same shape happened again" signal behind seasonality and anomaly
  * detectors; the symbolic form is what makes the count exact and
  * engine-portable where raw-valued subsequence matching is not.
  *
  * Scale shape: the raw event table collapses to the DAILY series first —
  * one map-side-combined aggregate; everything after (quartile symbols via
  * ntile, 3-day words via lead, motif counts) runs on the |days|-row spine,
  * bounded by the calendar, never by event volume. The ntile/lead windows
  * are single-partition BY DESIGN over that bounded spine — the same
  * contract as q_dau_mau's day grid. Discretization is rank-based
  * (quartiles), not z-normalized: no mean/std floating-point coupling, so
  * the symbol sequence is bit-identical in both engines (totals are exact
  * decimal sums rounded at 6 dp with a day tie-break).
  */
object Events2 {

  private val NS_DAY = "86400000000000"

  /** (motif, n, first_day): every 3-day symbolic word over the
    * quartile-coded daily-total series, its occurrence count and first
    * start day. Words require calendar-contiguous days (a gap breaks the
    * word — lead-by-row would silently bridge it, so the gap filter checks
    * lead(day,2) = day+2). */
  /** (day, motif) — every contiguous 3-day quartile word; the shared
    * derivation under [[qSaxMotif]] (recurrence) and [[qSaxDiscord]]
    * (isolation). */
  private def saxWords(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.table(spark, dir, "events")
      .select(expr(s"ts div $NS_DAY").as("day"), col("value"))
      .groupBy("day")
      .agg(round(Tables.dsum(col("value")), 6).as("total"))
    val sym = daily.withColumn("q",
        ntile(4).over(Window.orderBy(col("total"), col("day"))))
      .withColumn("sym", expr("substr('abcd', q, 1)"))
    val w = Window.orderBy("day")
    sym
      .select(col("day"),
        concat(col("sym"), lead(col("sym"), 1).over(w),
          lead(col("sym"), 2).over(w)).as("motif"),
        lead(col("day"), 2).over(w).as("d2"))
      .where(col("d2") === col("day") + 2)
      .select("day", "motif")
  }

  def qSaxMotif(spark: SparkSession, dir: String): DataFrame =
    saxWords(spark, dir)
      .groupBy("motif")
      .agg(count(lit(1)).as("n"), min(col("day")).as("first_day"))
      .orderBy(col("n").desc, col("motif"))

  val qSaxMotifSql: String =
    s"""WITH daily AS (
       |  SELECT epoch_ns(ts) // $NS_DAY AS day,
       |    round(CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE), 6) AS total
       |  FROM events GROUP BY 1),
       |sym AS (
       |  SELECT day, substr('abcd', ntile(4) OVER (ORDER BY total, day), 1) AS sym
       |  FROM daily),
       |words AS (
       |  SELECT day,
       |    sym || lead(sym, 1) OVER (ORDER BY day)
       |        || lead(sym, 2) OVER (ORDER BY day) AS motif,
       |    lead(day, 2) OVER (ORDER BY day) AS d2
       |  FROM sym)
       |SELECT motif, COUNT(*) AS n, MIN(day) AS first_day
       |FROM words WHERE d2 = day + 2
       |GROUP BY 1 ORDER BY n DESC, motif""".stripMargin

  /** SAX discord discovery — motif's anomaly-side sibling (Keogh et al.,
    * "HOT SAX", ICDM 2005): a DISCORD is the subsequence most unlike every
    * other, the shape that happened once and never again. Candidates are
    * the words with occurrence count 1; each is scored by its symbolic
    * Hamming distance to the NEAREST other word occurrence (position-wise
    * symbol mismatches over the 3-day word), ranked most-isolated first —
    * exactly the "top discord" report an anomaly triage reads.
    *
    * Scale shape: everything after the daily aggregate runs on the
    * calendar-bounded |days|-row word spine; the nearest-neighbor pass is
    * the |uniques| × |words| non-equi pair frame — q_mann_kendall's
    * calendar-bounded contract, it grows with the calendar, never with
    * event volume. Symbols are rank-coded (no float coupling), distances
    * are exact ints: fully hash-gated. */
  def qSaxDiscord(spark: SparkSession, dir: String): DataFrame = {
    // pinned once: the word spine feeds the unique-word pass AND both
    // sides of the nearest-neighbor pair frame
    val words = saxWords(spark, dir).localCheckpoint()
    val uniq = words.groupBy("motif")
      .agg(count(lit(1)).as("n"), min(col("day")).as("day"))
      .where(col("n") === 1)
      .select(col("day"), col("motif"))
    val others = words.select(col("day").as("o_day"), col("motif").as("o_motif"))
    uniq.join(others, col("o_day") =!= col("day"))
      .select(col("day"), col("motif"),
        (when(expr("substr(motif, 1, 1)") =!= expr("substr(o_motif, 1, 1)"), 1).otherwise(0)
          + when(expr("substr(motif, 2, 1)") =!= expr("substr(o_motif, 2, 1)"), 1).otherwise(0)
          + when(expr("substr(motif, 3, 1)") =!= expr("substr(o_motif, 3, 1)"), 1).otherwise(0))
          .as("dist"))
      .groupBy("day", "motif")
      .agg(min(col("dist")).cast("long").as("min_dist"))
      .orderBy(col("min_dist").desc, col("day"))
  }

  val qSaxDiscordSql: String =
    s"""WITH daily AS (
       |  SELECT epoch_ns(ts) // $NS_DAY AS day,
       |    round(CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE), 6) AS total
       |  FROM events GROUP BY 1),
       |sym AS (
       |  SELECT day, substr('abcd', ntile(4) OVER (ORDER BY total, day), 1) AS sym
       |  FROM daily),
       |w0 AS (
       |  SELECT day,
       |    sym || lead(sym, 1) OVER (ORDER BY day)
       |        || lead(sym, 2) OVER (ORDER BY day) AS motif,
       |    lead(day, 2) OVER (ORDER BY day) AS d2
       |  FROM sym),
       |words AS (SELECT day, motif FROM w0 WHERE d2 = day + 2),
       |uw AS (
       |  SELECT MIN(day) AS day, motif FROM words
       |  GROUP BY motif HAVING COUNT(*) = 1),
       |d AS (
       |  SELECT u.day, u.motif,
       |    MIN(CASE WHEN substr(u.motif, 1, 1) <> substr(w.motif, 1, 1) THEN 1 ELSE 0 END
       |      + CASE WHEN substr(u.motif, 2, 1) <> substr(w.motif, 2, 1) THEN 1 ELSE 0 END
       |      + CASE WHEN substr(u.motif, 3, 1) <> substr(w.motif, 3, 1) THEN 1 ELSE 0 END)
       |      AS min_dist
       |  FROM uw u JOIN words w ON w.day <> u.day
       |  GROUP BY 1, 2)
       |SELECT day, motif, CAST(min_dist AS BIGINT) AS min_dist
       |FROM d ORDER BY min_dist DESC, day""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sax_motif" -> (qSaxMotif _),
    "q_sax_discord" -> (qSaxDiscord _))

  val oracles: Map[String, String] = Map(
    "q_sax_motif" -> qSaxMotifSql,
    "q_sax_discord" -> qSaxDiscordSql)
}
