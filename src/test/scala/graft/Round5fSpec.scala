package graft

import graft.catalog.LakeCatalog
import graft.streaming.StreamOps2
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-5 batch f: partition-spec evolution and the late-data watermark
  * audit. */
class Round5fSpec extends SparkSpec {

  private def freshCat: LakeCatalog = {
    val root = java.nio.file.Files.createTempDirectory("graft_r5f").toString
    new LakeCatalog(spark, root)
  }

  test("partition evolution: old files untouched, new files pruned by path, reads agree") {
    import spark.implicits._
    val cat = freshCat
    cat.createTable("ns", "pe", StructType(Seq(
      StructField("id", LongType), StructField("src", StringType))))
    val rows = (1L to 40L).map(i => (i, s"s${i % 4}")).toDF("id", "src")
    cat.append("ns", "pe", rows.where(col("id") <= 20))        // old spec (flat)
    val oldFiles = cat.snapshots("ns", "pe").last._2.toSet
    cat.appendEvolved("ns", "pe", rows.where(col("id") > 20), "src") // new spec
    val curFiles = cat.snapshots("ns", "pe").last._2
    // evolution rewrote nothing: every old-spec file survives verbatim
    assert(oldFiles.subsetOf(curFiles.toSet))
    assert(curFiles.exists(_.startsWith("_p=")), "no new-spec files committed")
    // full read sees both layouts with identical schema
    assert(cat.load("ns", "pe").count() == 40)
    // prune: s1 files kept, other sources' new-spec files skipped entirely
    val (mustScan, kept) = cat.partitionFiles("ns", "pe", "s1")
    assert(mustScan.toSet == oldFiles.filter(curFiles.contains), "old spec must-scan set wrong")
    assert(kept.nonEmpty && kept.forall(_.startsWith("_p=s1/")))
    assert(mustScan.size + kept.size < curFiles.size, "nothing was pruned")
    // pruned read + residual predicate ≡ full-scan filter
    val viaPrune = cat.loadPartition("ns", "pe", "s1")
      .where(col("src") === "s1").select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val viaScan = cat.load("ns", "pe")
      .where(col("src") === "s1").select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(viaPrune == viaScan && viaPrune.nonEmpty)
    // time travel crosses the evolution point: v1 is the pre-evolution table
    assert(cat.loadSnapshot("ns", "pe", 1).count() == 20)
  }

  test("stLateAudit two-level prefix-max == naive global running max") {
    // the distributed (bucketed) watermark reconstruction must equal the
    // naive single-window formulation the oracle states
    val delay = 600000000000L
    val e = Tables.table(spark, sfDir, "events")
      .select(col("event_type"), col("ts"), col("event_id"),
        (col("ts") + expr("(event_id % 20) * 90000000000")).as("arr"))
    val naive = e.withColumn("wm", max(col("ts")).over(
        Window.orderBy(col("arr"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        count(when(col("wm").isNotNull && col("ts") < col("wm") - delay, 1)).as("n_late"))
      .orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val audit = StreamOps2.stLateAudit(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(audit == naive, s"two-level scan diverged:\n$audit\nvs\n$naive")
    assert(audit.map(_._3).sum > 0, "jitter model produced no late events")
  }

  test("a row the audit flags late is genuinely dropped by a streaming watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // batch 1: events at minutes 0..60 → watermark advances to 50 min;
    // batch 2: an event at minute 10 (40 min behind) must be DROPPED from
    // the append-mode windowed aggregate — the behavior stLateAudit bounds
    val mem = MemoryStream[(Long, Long)] // (event_id, ts ns)
    val minute = 60L * 1000000000L
    val sdf = mem.toDF().toDF("event_id", "ts")
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("win_start"), col("n"))
    val q = sdf.writeStream.format("memory").queryName("late_drop")
      .outputMode("append").start()
    mem.addData((0L to 60L by 5).map(m => (m, m * minute)))
    q.processAllAvailable()
    mem.addData(Seq((99L, 10L * minute))) // 40 min late — behind the watermark
    q.processAllAvailable()
    // close every window by advancing time well past the horizon
    mem.addData(Seq((100L, 200L * minute)))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("late_drop").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the minute-10 window emitted exactly ONE row (the on-time batch-1
    // event); the late replay was dropped, not merged
    assert(out(600L) == 1L, s"late row was not dropped: $out")
  }
}
