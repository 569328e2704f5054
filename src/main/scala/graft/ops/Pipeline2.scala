package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.8 addition (round 4): sequence packing — mapping the ordered token
  * stream of a curated corpus onto fixed-length training sequences
  * (GPT-style concat-and-chunk: documents are concatenated in corpus order
  * and sliced every `budget` tokens; a document may straddle a boundary).
  * The output is the doc → sequence-range manifest a training loader needs.
  *
  * The global prefix-sum is the interesting part at 100 TB: a naive
  * `SUM() OVER (ORDER BY doc_id)` is a SINGLE-partition window — the exact
  * scale-killer VERDICT r2 flagged on t_zipf_slope. Instead: two-level scan
  *  1. bucket docs by `doc_id div W` (range-contiguous, no shuffle of the
  *     ordering guarantee needed — doc_id order within a bucket and bucket
  *     order together reconstruct corpus order);
  *  2. per-bucket token totals (map-side-combined aggregate, corpus/W rows);
  *  3. exclusive prefix over the BUCKET TOTALS ONLY (a window over corpus/W
  *     rows — at W=10⁴ that is 10⁵ rows per PB of docs, trivially one task);
  *  4. broadcast-join the offsets back and finish with a per-bucket window
  *     (hash-partitioned on bucket).
  * This is the classic distributed scan (Blelloch) expressed in DataFrame
  * ops; W dials level-2 size. The DuckDB oracle states the same result as
  * the naive single-window cumsum — identical output, different plan.
  */
object Pipeline2 {

  private def norm(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))
  private val normSql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  private val budget = 512L
  private val bucketW = 100L // 10⁴+ at real scale; 100 keeps sf0.01 multi-bucket

  def pPackSequences(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.table(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(norm(col("text")), " ")).cast("long").as("n_tokens"),
        (col("doc_id") / bucketW).cast("long").as("bucket"))
    val bucketTotals = toks.groupBy("bucket")
      .agg(sum(col("n_tokens")).as("bucket_toks"))
    // exclusive prefix over bucket totals: corpus/W rows — the ONLY ordered
    // window, and it is deliberately tiny (see scaladoc).
    val offsets = bucketTotals.withColumn("bucket_off",
      coalesce(sum(col("bucket_toks")).over(
        Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bucket", "bucket_off")
    val inBucket = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks.join(broadcast(offsets), Seq("bucket"))
      .withColumn("start_tok",
        col("bucket_off") + sum(col("n_tokens")).over(inBucket) - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        expr(s"start_tok div $budget").as("start_seq"),
        expr(s"(start_tok + n_tokens - 1) div $budget").as("end_seq"))
      .orderBy("doc_id")
  }

  val pPackSequencesSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(len(string_split($normSql, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, n_tokens,
       |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM t)
       |SELECT doc_id, n_tokens,
       |  (cum - n_tokens) // $budget AS start_seq,
       |  (cum - 1) // $budget AS end_seq
       |FROM c ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p_pack_sequences" -> (pPackSequences _))

  val oracles: Map[String, String] = Map(
    "p_pack_sequences" -> pPackSequencesSql)
}
