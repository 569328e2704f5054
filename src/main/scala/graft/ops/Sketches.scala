package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.2 addition (round 7): mergeable QUANTILE sketch — the third
  * mergeable-summary family, completing the set the engine already gates
  * exactly (q_hll_merge: distinct counts; q_cms_topk: frequencies). The
  * sketch is a deterministic hash-rank reservoir: per (type, day), keep
  * the 64 rows with the smallest cubic-PolyHash rank — a uniform sample
  * whose MERGE IS EXACT, because top-k under a fixed total order is
  * mergeable (the global top-64 of a type is a subset of the union of its
  * per-day top-64s, always). The op proves that contract in-plan
  * (merge_exact, the q_hll_merge regs_equal pattern) and reports sampled
  * vs exact p50/p90 per event type.
  *
  * 100 TB shape: per-partition sketches are built map-side (rank ≤ 64 per
  * (type, day) plans as WindowGroupLimit — k rows per partition cross the
  * shuffle, never the corpus); any date range is answered by re-ranking
  * the tiny per-day samples. The exact percentiles — the expensive
  * whole-corpus sort the sketch exists to avoid — are computed here only
  * as the accuracy reference, in the gated q_quantile_exact shape
  * (type-keyed windows, bounded fan). Hash and rank rules replay
  * bit-for-bit in DuckDB (GF(2^61−1) cubic, HUGEINT ↔ DECIMAL(19,0)). */
object Sketches {

  private val k = 64

  def qQuantileMerge(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val M = graft.functions.PolyHash.M
    val PHI = graft.functions.PolyHash.PHI
    val PSI = graft.functions.PolyHash.PSI
    val ev = Tables.table(spark, dir, "events")
      .select(col("event_type"), expr("ts div 86400000000000").as("day"),
        col("event_id"), col("value"))
      .withColumn("h1", expr(
        s"cast((cast($PHI as decimal(19,0)) * cast(event_id as decimal(19,0)) + $PSI) % $M as decimal(19,0))"))
      .withColumn("h", expr(s"cast((cast((h1 * h1) % $M as decimal(19,0)) * h1) % $M as bigint)"))
      .drop("h1")
    val wDay = Window.partitionBy("event_type", "day").orderBy(col("h"), col("event_id"))
    val perDay = ev.withColumn("r", row_number().over(wDay)).where(col("r") <= k)
      .drop("r").cache()
    val wType = Window.partitionBy("event_type").orderBy(col("h"), col("event_id"))
    val merged = perDay.withColumn("r", row_number().over(wType)).where(col("r") <= k)
      .drop("r")
    val direct = ev.withColumn("r", row_number().over(wType)).where(col("r") <= k)
      .select(col("event_type"), col("event_id"))
    val mex = merged.select(col("event_type"), col("event_id"))
      .join(direct, Seq("event_type", "event_id"))
      .groupBy("event_type").agg(count(lit(1)).as("n_match"))
    // sampled percentiles: the q_quantile_exact index rule over the sample
    val wsVal = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
    val sq = merged
      .withColumn("vr", row_number().over(wsVal))
      .withColumn("sn", count(lit(1)).over(Window.partitionBy("event_type")))
      .groupBy("event_type")
      .agg(max(col("sn")).as("sample_n"),
        max(when(col("vr") === expr("(sn * 50 + 99) div 100"), col("value"))).as("p50_sample"),
        max(when(col("vr") === expr("(sn * 90 + 99) div 100"), col("value"))).as("p90_sample"))
    // exact reference: the gated q_quantile_exact shape over the full rows
    val eq = ev
      .withColumn("vr", row_number().over(wsVal))
      .withColumn("nn", count(lit(1)).over(Window.partitionBy("event_type")))
      .groupBy("event_type")
      .agg(max(col("nn")).as("n"),
        countDistinct(col("day")).as("n_days"),
        max(when(col("vr") === expr("(nn * 50 + 99) div 100"), col("value"))).as("p50_exact"),
        max(when(col("vr") === expr("(nn * 90 + 99) div 100"), col("value"))).as("p90_exact"))
    eq.join(sq, "event_type").join(mex, "event_type")
      .select(col("event_type"), col("n"), col("n_days"), col("sample_n"),
        (col("n_match") === col("sample_n")).as("merge_exact"),
        col("p50_exact"), col("p50_sample"),
        col("p90_exact"), col("p90_sample"),
        round(abs(col("p50_sample") - col("p50_exact")), 6).as("p50_abs_err"),
        round(abs(col("p90_sample") - col("p90_exact")), 6).as("p90_abs_err"))
      .orderBy("event_type")
  }

  val qQuantileMergeSql: String = {
    val M = graft.functions.PolyHash.M
    val PHI = graft.functions.PolyHash.PHI
    val PSI = graft.functions.PolyHash.PSI
    s"""WITH ev AS (
       |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day, event_id, value,
       |    CAST(((CAST((CAST($PHI AS HUGEINT) * event_id + $PSI) % $M AS HUGEINT)
       |           * CAST((CAST($PHI AS HUGEINT) * event_id + $PSI) % $M AS HUGEINT)) % $M
       |          * CAST((CAST($PHI AS HUGEINT) * event_id + $PSI) % $M AS HUGEINT)) % $M AS BIGINT) AS h
       |  FROM events),
       |per_day AS (
       |  SELECT * FROM (
       |    SELECT ev.*, row_number() OVER (PARTITION BY event_type, day ORDER BY h, event_id) AS r
       |    FROM ev) WHERE r <= $k),
       |merged AS (
       |  SELECT * FROM (
       |    SELECT event_type, day, event_id, value, h,
       |      row_number() OVER (PARTITION BY event_type ORDER BY h, event_id) AS r
       |    FROM per_day) WHERE r <= $k),
       |direct AS (
       |  SELECT event_type, event_id FROM (
       |    SELECT event_type, event_id,
       |      row_number() OVER (PARTITION BY event_type ORDER BY h, event_id) AS r
       |    FROM ev) WHERE r <= $k),
       |mex AS (
       |  SELECT m.event_type, CAST(COUNT(*) AS BIGINT) AS n_match
       |  FROM merged m JOIN direct d ON d.event_type = m.event_type AND d.event_id = m.event_id
       |  GROUP BY 1),
       |sq AS (
       |  SELECT event_type, CAST(MAX(sn) AS BIGINT) AS sample_n,
       |    MAX(CASE WHEN vr = (sn * 50 + 99) // 100 THEN value END) AS p50_sample,
       |    MAX(CASE WHEN vr = (sn * 90 + 99) // 100 THEN value END) AS p90_sample
       |  FROM (
       |    SELECT event_type, value,
       |      row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS vr,
       |      COUNT(*) OVER (PARTITION BY event_type) AS sn
       |    FROM merged)
       |  GROUP BY 1),
       |eq AS (
       |  SELECT event_type, CAST(MAX(nn) AS BIGINT) AS n,
       |    CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days,
       |    MAX(CASE WHEN vr = (nn * 50 + 99) // 100 THEN value END) AS p50_exact,
       |    MAX(CASE WHEN vr = (nn * 90 + 99) // 100 THEN value END) AS p90_exact
       |  FROM (
       |    SELECT event_type, day, value,
       |      row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS vr,
       |      COUNT(*) OVER (PARTITION BY event_type) AS nn
       |    FROM ev)
       |  GROUP BY 1)
       |SELECT eq.event_type, eq.n, eq.n_days, sq.sample_n,
       |  (mex.n_match = sq.sample_n) AS merge_exact,
       |  eq.p50_exact, sq.p50_sample, eq.p90_exact, sq.p90_sample,
       |  round(abs(sq.p50_sample - eq.p50_exact), 6) AS p50_abs_err,
       |  round(abs(sq.p90_sample - eq.p90_exact), 6) AS p90_abs_err
       |FROM eq JOIN sq ON sq.event_type = eq.event_type
       |JOIN mex ON mex.event_type = eq.event_type
       |ORDER BY eq.event_type""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_quantile_merge" -> (qQuantileMerge _))

  val oracles: Map[String, String] = Map(
    "q_quantile_merge" -> qQuantileMergeSql)
}
