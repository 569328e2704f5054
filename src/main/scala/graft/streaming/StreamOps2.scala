package graft.streaming

import graft.Tables
import graft.catalog.LakeCatalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.7 addition (round 4): streaming CDC apply — consuming a keyed
  * change feed (upserts + deletes) into a lake table, the standing sync
  * job between an OLTP source and the analytical lake (the consumer side
  * of [[graft.catalog.LakeCatalog.changes]]' producer surface).
  *
  * Each micro-batch applies through [[LakeCatalog.applyCdc]]: ONE atomic
  * snapshot commit per batch carrying the rewrite (touched-file COW) and
  * the batch-id replay fence in the same snapshot-log line — a foreachBatch
  * redelivery after a crash is dropped whole, so the table equals the
  * change feed applied exactly once. Delete-wins + last-writer-wins
  * collapse inside a batch keep a noisy feed deterministic.
  *
  * The driver-checked entry applies a deterministic 3-batch change
  * sequence derived from `orders` (insert → update+delete → re-insert,
  * exercising key resurrection) through the SAME applyCdc path and reads
  * the final state; the oracle states last-writer-wins directly over
  * `orders`. StreamingSpec2 runs the identical batches through a real
  * MemoryStream + foreachBatch query, asserts stream ≡ batch, and replays
  * a batch id to prove the fence.
  */
object StreamOps2 {

  private def scratch: String =
    s"${System.getProperty("java.io.tmpdir")}/graft_warehouse"

  /** The deterministic change feed: 3 batches over orders keys ≤ 50.
    * Batch 0 inserts keys ≤ 40; batch 1 doubles keys 20–50 (inserting
    * 41–50) and deletes keys ≤ 10; batch 2 re-inserts keys 5–15 at half
    * price (resurrecting 5–10 after their delete). */
  private[graft] def cdcBatches(spark: SparkSession, dir: String): Seq[DataFrame] = {
    val o = Tables.table(spark, dir, "orders")
      .where(col("o_orderkey") <= 50)
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("p"))
    def u(b: DataFrame, v: org.apache.spark.sql.Column): DataFrame =
      b.select(col("k"), v.as("v"), lit("u").as("op"))
    def d(b: DataFrame): DataFrame =
      b.select(col("k"), lit(null).cast("double").as("v"), lit("d").as("op"))
    // all price math in DECIMAL (§4 rule): round(double/2) diverges between
    // engines on representation ties (…/2 = 65800.2749999… printing as
    // .275 went .28 vs .27 at sf0.1). Decimal cast recovers the intended
    // 2-dp cents; the halving MULTIPLIES by decimal 0.5 rather than
    // dividing — DuckDB promotes every DECIMAL division to DOUBLE (back to
    // the binary tie), but decimal × decimal stays exact in both engines.
    def dmath(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      c.cast("decimal(30,6)")
    val half = expr("cast(0.5 as decimal(2,1))")
    Seq(
      u(o.where(col("k") <= 40), round(dmath(col("p")), 2).cast("double")),
      u(o.where(col("k").between(20, 50)), round(dmath(col("p")) * 2, 2).cast("double"))
        .unionByName(d(o.where(col("k") <= 10))),
      u(o.where(col("k").between(5, 15)), round(dmath(col("p")) * half, 2).cast("double")))
  }

  private[graft] def freshCdcTable(cat: LakeCatalog, table: String): Unit = {
    cat.dropTable("scratch", table)
    cat.createTable("scratch", table, StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType))))
  }

  /** Streaming writer: every micro-batch of the change feed applied as one
    * fenced atomic commit (exposed for StreamingSpec2). */
  def applyCdcStream(changes: DataFrame, cat: LakeCatalog,
                     table: String): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        cat.applyCdc("scratch", table, batch, "k", "op", Some(id))
      }
      .start()

  /** Batch-equivalent driver entry: the 3-batch feed applied sequentially
    * through applyCdc, final table read back. */
  def stCdcApply(spark: SparkSession, dir: String): DataFrame = {
    val cat = new LakeCatalog(spark, scratch)
    freshCdcTable(cat, "cdc_apply")
    cdcBatches(spark, dir).zipWithIndex.foreach { case (b, i) =>
      cat.applyCdc("scratch", "cdc_apply", b, "k", "op", Some(i.toLong))
    }
    cat.load("scratch", "cdc_apply").orderBy("k")
  }

  val stCdcApplySql: String =
    """SELECT o_orderkey AS k,
      |  CAST(CASE WHEN o_orderkey BETWEEN 5 AND 15
      |         THEN round(CAST(o_totalprice AS DECIMAL(30,6)) * CAST(0.5 AS DECIMAL(2,1)), 2)
      |       WHEN o_orderkey BETWEEN 16 AND 19
      |         THEN round(CAST(o_totalprice AS DECIMAL(30,6)), 2)
      |       ELSE round(CAST(o_totalprice AS DECIMAL(30,6)) * 2, 2) END AS DOUBLE) AS v
      |FROM orders WHERE o_orderkey BETWEEN 5 AND 50
      |ORDER BY k""".stripMargin

  /** Late-data watermark audit: for every event type, how much data would a
    * 10-minute watermark DROP, and how late does the tail arrive? The input
    * an operator like this audits is (event time, ARRIVAL order); events is
    * time-sorted, so arrival is modeled with a deterministic network-delay
    * jitter (`(event_id % 20) × 90 s` — up to ~28 min, integer arithmetic,
    * engine-portable). An event is late iff its event time precedes the
    * watermark at its arrival instant: wm = max event time over everything
    * that arrived STRICTLY before, minus the 10-min delay — the row-granular
    * analog of Spark's micro-batch watermark (which only tightens per
    * batch, so the streaming engine drops AT MOST what this audit counts;
    * StreamingSpec2 pins a real MemoryStream query dropping a row the
    * audit flags).
    *
    * Scale shape — the global running max NEVER runs as a global window:
    * arrival is bucketed per hour (`arr div 3600e9`; bucket order ≡ arrival
    * order since the bucket key is a monotone function of arrival), then
    *  1. per-bucket max event time — map-side-combined aggregate;
    *  2. exclusive prefix-max over the BUCKET MAXES (a window over
    *     hours-of-history rows — p_pack_sequences' two-level Blelloch scan
    *     with max as the combine op);
    *  3. per-bucket windows (hash-partitioned on bucket) compute the
    *     within-bucket strict running max; wm = greatest(carry-in, local).
    * The first-ever event has NULL watermark (never late) — no sentinel
    * arithmetic, so nothing can ANSI-overflow. */
  def stLateAudit(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val delay = 600000000000L // 10 min in ns
    val e = Tables.table(spark, dir, "events")
      .select(col("event_type"), col("ts"), col("event_id"),
        (col("ts") + expr("(event_id % 20) * 90000000000")).as("arr"))
      .withColumn("bucket", expr("arr div 3600000000000"))
    val carry = e.groupBy("bucket").agg(max(col("ts")).as("bmax"))
      .withColumn("carry_in", max(col("bmax")).over(
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)))
      .select("bucket", "carry_in")
    val inBucket = Window.partitionBy("bucket").orderBy(col("arr"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val late = col("wm").isNotNull && col("ts") < col("wm") - delay
    e.join(broadcast(carry), Seq("bucket"))
      .withColumn("wm", greatest(max(col("ts")).over(inBucket), col("carry_in")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        count(when(late, 1)).as("n_late"),
        max(when(late, expr(s"(wm - $delay - ts) div 1000000000")))
          .as("max_late_s"))
      .withColumn("late_frac",
        round(col("n_late").cast("double") / col("n_events"), 6))
      .select("event_type", "n_events", "n_late", "late_frac", "max_late_s")
      .orderBy("event_type")
  }

  val stLateAuditSql: String =
    """WITH e AS (
      |  SELECT event_type, epoch_ns(ts) AS ns, event_id,
      |    epoch_ns(ts) + (event_id % 20) * 90000000000 AS arr
      |  FROM events),
      |w AS (
      |  SELECT event_type, ns,
      |    max(ns) OVER (ORDER BY arr, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
      |  FROM e)
      |SELECT event_type, COUNT(*) AS n_events,
      |  COUNT(CASE WHEN ns < wm - 600000000000 THEN 1 END) AS n_late,
      |  round(CAST(COUNT(CASE WHEN ns < wm - 600000000000 THEN 1 END) AS DOUBLE)
      |        / COUNT(*), 6) AS late_frac,
      |  MAX(CASE WHEN ns < wm - 600000000000
      |      THEN (wm - 600000000000 - ns) // 1000000000 END) AS max_late_s
      |FROM w GROUP BY 1 ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st_cdc_apply" -> (stCdcApply _),
    "st_late_audit" -> (stLateAudit _))

  val oracles: Map[String, String] = Map(
    "st_cdc_apply" -> stCdcApplySql,
    "st_late_audit" -> stLateAuditSql)
}
