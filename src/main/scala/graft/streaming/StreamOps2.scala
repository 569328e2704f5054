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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st_cdc_apply" -> (stCdcApply _))

  val oracles: Map[String, String] = Map(
    "st_cdc_apply" -> stCdcApplySql)
}
