package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamOps3

/** Round-7 batch d: the streaming rolling forecast — flatMapGroupsWithState
  * holding a ≤20-day integer count buffer must replay the weight-grid batch
  * plan row-for-row across micro-batch boundaries. */
class Round7dSpec extends SparkSpec {

  test("st_forecast streaming ≡ batch: rolling EWMA state across 3 micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batch = StreamOps3.stForecast(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val ev = Tables.table(spark, sfDir, "events")
      .select(col("event_type"), expr("ts div 86400000000000").as("day"),
        col("event_id"))
      .as[StreamOps3.FcEvent]
      .collect().sortBy(e => (e.day, e.event_id))
    val chunks = ev.grouped((ev.length + 2) / 3).toSeq
    assert(chunks.size == 3)
    // terminal sentinel closes each type's open day (day boundaries are
    // only visible when a later event arrives)
    val sentinel = ev.map(_.event_type).distinct
      .map(t => StreamOps3.FcEvent(t, Long.MaxValue, 0L))
    val stream = MemoryStream[StreamOps3.FcEvent]
    val q = StreamOps3.forecastStream(stream.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("fc_out").start()
    try {
      chunks.foreach { c => stream.addData(c.toSeq); q.processAllAvailable() }
      stream.addData(sentinel.toSeq); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("fc_out").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.keySet == batch.keySet,
      s"row keys diverge: stream-only ${got.keySet -- batch.keySet}, " +
        s"batch-only ${batch.keySet -- got.keySet}")
    got.foreach { case (k, v) =>
      assert(v == batch(k),
        s"$k: stream $v != batch ${batch(k)} — rolling buffer diverged from the weight grid")
    }
    assert(batch.nonEmpty, "no evaluated days at this sf — fixture broken")
  }
}
