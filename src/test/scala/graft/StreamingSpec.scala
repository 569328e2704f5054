package graft

import graft.streaming.{StreamOps, StreamOps4}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming ≡ batch equivalence: drive the SAME transform over a
  * MemoryStream and over the batch table, compare results. */
class StreamingSpec extends SparkSpec {

  private def eventsBatch = Tables.table(spark, sfDir, "events")

  /** Run a streaming transform of the events table via MemoryStream to
    * completion (all data in one epoch, Complete/Append as given). */
  private def runStream(mode: String)(
      transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventsBatch
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Double)].collect().toSeq
    val mem = MemoryStream[(Long, Long, Long, String, Double)]
    mem.addData(rows)
    val sdf = transform(mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value"))
    val qname = s"q_${System.nanoTime()}"
    val q = sdf.writeStream.format("memory").queryName(qname).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(qname)
  }

  test("windowAgg: incremental multi-batch stream (complete mode) == batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventsBatch
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Double)].collect().toSeq
    val mem = MemoryStream[(Long, Long, Long, String, Double)]
    val sdf = StreamOps.windowAgg(mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value"))
    val q = sdf.writeStream.format("memory").queryName("incr_win")
      .outputMode("complete").start()
    // three out-of-order chunks across separate micro-batches: state must
    // merge partial windows, not overwrite them
    rows.grouped((rows.size / 3) + 1).toSeq.reverse.foreach { chunk =>
      mem.addData(chunk); q.processAllAvailable()
    }
    q.stop()
    val stream = spark.table("incr_win")
      .orderBy("win_start", "event_type").collect().toSeq
    val batch = StreamOps.windowAgg(eventsBatch)
      .orderBy("win_start", "event_type").collect().toSeq
    assert(batch.nonEmpty && batch == stream,
      s"batch ${batch.size} rows vs stream ${stream.size}")
  }

  test("windowAgg: stream (complete mode) == batch") {
    val batch = StreamOps.windowAgg(eventsBatch)
      .orderBy("win_start", "event_type").collect().toSeq
    val stream = runStream("complete")(StreamOps.windowAgg)
      .orderBy("win_start", "event_type").collect().toSeq
    assert(batch.nonEmpty && batch == stream,
      s"batch ${batch.size} rows vs stream ${stream.size} rows; first diff: " +
        batch.zip(stream).find { case (a, b) => a != b })
  }

  test("hoppingAgg: sliding windows, stream (complete mode) == batch, 2 windows per event") {
    import graft.streaming.StreamOps3
    val batch = StreamOps3.hoppingAgg(eventsBatch)
      .orderBy("win_start", "event_type").collect().toSeq
    val stream = runStream("complete")(StreamOps3.hoppingAgg)
      .orderBy("win_start", "event_type").collect().toSeq
    assert(batch.nonEmpty && batch == stream,
      s"batch ${batch.size} rows vs stream ${stream.size} rows")
    // every event lands in exactly 2 hop windows: Σn = 2·|events|
    val totalN = batch.map(_.getLong(2)).sum
    assert(totalN == 2 * eventsBatch.count(),
      s"hop multiplicity broken: sum(n)=$totalN, events=${eventsBatch.count()}")
  }

  test("dedup: streaming dropDuplicates preserves the distinct event count") {
    val expect = eventsBatch.select("event_id").distinct().count()
    val got = runStream("append")(StreamOps.dedup).count()
    assert(got == expect, s"stream dedup $got != batch distinct $expect")
  }

  test("sessionAgg (session_window): stream (complete) == batch") {
    val batch = StreamOps.sessionAgg(eventsBatch)
      .select(col("user_id"), col("session_window.start").as("s"), col("n_events"))
      .orderBy("user_id", "s").collect().toSeq
    val stream = runStream("complete")(StreamOps.sessionAgg)
      .select(col("user_id"), col("session_window.start").as("s"), col("n_events"))
      .orderBy("user_id", "s").collect().toSeq
    assert(batch.nonEmpty && batch == stream)
  }

  test("enrichJoin: stream-static join (complete) == batch") {
    val dim = Tables.table(spark, sfDir, "customer")
    val batch = StreamOps.enrichJoin(eventsBatch, dim)
      .orderBy("c_mktsegment").collect().toSeq
    val stream = runStream("complete")(df => StreamOps.enrichJoin(df, dim))
      .orderBy("c_mktsegment").collect().toSeq
    assert(batch.nonEmpty && batch == stream,
      s"batch ${batch.size} vs stream ${stream.size}")
  }

  test("streamStreamJoin: stream-stream interval join (append) == batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventsBatch
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Double)].collect().toSeq
    val memV = MemoryStream[(Long, Long, Long, String, Double)]
    val memP = MemoryStream[(Long, Long, Long, String, Double)]
    def named(m: MemoryStream[(Long, Long, Long, String, Double)]) =
      m.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    memV.addData(rows.filter(_._4 == "view"))
    memP.addData(rows.filter(_._4 == "purchase"))
    val sdf = StreamOps.streamStreamJoin(named(memV), named(memP))
    val q = sdf.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val stream = spark.table("ss_join")
      .orderBy("user_id", "view_id", "purchase_id").collect().toSeq
    val batch = StreamOps.streamStreamJoin(
      eventsBatch.where(col("event_type") === "view"),
      eventsBatch.where(col("event_type") === "purchase"))
      .orderBy("user_id", "view_id", "purchase_id").collect().toSeq
    assert(batch.nonEmpty && batch == stream,
      s"batch ${batch.size} pairs vs stream ${stream.size}")
  }

  test("ingestToLake: one snapshot per micro-batch, content equals input") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val cat = new graft.catalog.LakeCatalog(spark, root)
    cat.createTable("ns", "ingest", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType))))
    val rows = eventsBatch.select(col("event_id"), col("value"))
      .as[(Long, Double)].collect().toSeq
    val mem = MemoryStream[(Long, Double)]
    val q = StreamOps.ingestToLake(
      mem.toDF().toDF("event_id", "value"), cat, "ns", "ingest")
    rows.grouped((rows.size / 3) + 1).foreach { chunk =>
      mem.addData(chunk); q.processAllAvailable()
    }
    q.stop()
    val snaps = cat.snapshots("ns", "ingest")
    assert(snaps.length == 4, s"v0 + 3 batch commits, got ${snaps.length}")
    assert(cat.load("ns", "ingest").count() == rows.size)
    // each snapshot is a strict superset of the previous (append-only)
    snaps.sliding(2).foreach { case Seq((_, a), (_, b)) =>
      assert(a.toSet.subsetOf(b.toSet))
    }
    // time travel to the first batch: strictly fewer rows
    assert(cat.loadSnapshot("ns", "ingest", 1).count() < rows.size)
  }

  test("ingest commit is idempotent: replaying a batch id does not double-commit") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_replay").toString
    val cat = new graft.catalog.LakeCatalog(spark, root)
    cat.createTable("ns", "r", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType))))
    val b0 = Seq(1L, 2L).toDF("id")
    val b1 = Seq(3L).toDF("id")
    StreamOps.commitBatch(b0, 0, cat, "ns", "r")
    StreamOps.commitBatch(b0, 0, cat, "ns", "r") // failure replay of batch 0
    StreamOps.commitBatch(b1, 1, cat, "ns", "r")
    StreamOps.commitBatch(b1, 1, cat, "ns", "r") // replay of batch 1
    assert(cat.load("ns", "r").count() == 3, "replays must not double-commit")
    assert(cat.snapshots("ns", "r").length == 3) // v0 + two real commits
    assert(cat.lastCommittedBatch("ns", "r").contains(1L))
  }

  test("curateDocs: streaming curation (append, multi-batch) == batch summary") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docsBatch = Tables.table(spark, sfDir, "documents")
      .withColumn("event_time", timestamp_seconds(col("doc_id")))
    // streaming side: same docs in two micro-batches, plus a planted PII doc
    // and an exact duplicate pair that must collapse to one fingerprint
    val rows = docsBatch
      .select(col("doc_id"), col("text"), col("lang"))
      .as[(Long, String, String)].collect().toSeq
    val extra = Seq(
      (900001L, "the quality of the data is it in the line and the table of the part and the row is it the key of the scan and the sort in the batch", "en"),
      (900002L, "the quality of the data is it in the line and the table of the part and the row is it the key of the scan and the sort in the batch", "en"), // exact dup of 900001
      (900003L, "the quality of the data is it in the line and the table of the part and the row is it the key mail me at a@b.co for the copy of the scan", "en")) // PII → gated out
    val all = rows ++ extra
    val mem = MemoryStream[(Long, String, String)]
    val sdf = StreamOps.curateDocs(mem.toDF().toDF("doc_id", "text", "lang")
      .withColumn("event_time", timestamp_seconds(col("doc_id"))))
    val q = sdf.writeStream.format("memory").queryName("cur_stream")
      .outputMode("append").start()
    all.grouped((all.size / 2) + 1).foreach { chunk =>
      mem.addData(chunk); q.processAllAvailable()
    }
    q.stop()
    val stream = spark.table("cur_stream")
      .agg(count(lit(1)), coalesce(sum("n_tok"), lit(0L))).collect().head
    val batchIn = (docsBatch.select("doc_id", "text", "lang") unionByName
      extra.toDF("doc_id", "text", "lang"))
      .withColumn("event_time", timestamp_seconds(col("doc_id")))
    val batch = StreamOps.curateDocs(batchIn)
      .agg(count(lit(1)), coalesce(sum("n_tok"), lit(0L))).collect().head
    assert(batch.getLong(0) > 0)
    assert(stream == batch, s"stream $stream != batch $batch")
    // the duplicate pair collapsed: planted fp appears exactly once
    val plantedFp = spark.table("cur_stream").count()
    assert(plantedFp == batch.getLong(0))
  }

  test("lshScreen: streaming screen against the static index (complete, multi-batch) == batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.table(spark, sfDir, "documents").select("doc_id", "text")
    // static index from the corpus slice; arrivals stream in two batches
    val idx = StreamOps4.lshSigs(docs.where(col("doc_id") % 10 =!= 0))
      .localCheckpoint()
    val arrivals = docs.where(col("doc_id") % 10 === 0)
      .as[(Long, String)].collect().toSeq
    val mem = MemoryStream[(Long, String)]
    val sdf = StreamOps4.lshScreen(mem.toDF().toDF("doc_id", "text"), idx)
    val q = sdf.writeStream.format("memory").queryName("lsh_stream")
      .outputMode("complete").start()
    arrivals.grouped((arrivals.size / 2) + 1).foreach { chunk =>
      mem.addData(chunk); q.processAllAvailable()
    }
    q.stop()
    val stream = spark.table("lsh_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sorted.toSeq
    val batch = StreamOps4.lshScreen(docs.where(col("doc_id") % 10 === 0), idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sorted.toSeq
    assert(batch.nonEmpty)
    assert(stream == batch, s"stream screen != batch screen " +
      s"(stream ${stream.size} rows, batch ${batch.size})")
    // the screen is doing real work on this corpus: some arrivals collide
    // with the index (documents has planted near-dups) and some are novel
    assert(batch.exists(!_._3) && batch.exists(_._3),
      s"degenerate screen (all same verdict): ${batch.take(5)}")
  }

  test("sessionizeWithState agrees with the windowed sessionize operator") {
    import spark.implicits._
    val evs = eventsBatch.select(col("user_id"), col("ts").as("tsNs"), col("value"))
      .as[StreamOps.Ev]
    val custom = StreamOps.sessionizeWithState(spark, evs)
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
      .orderBy("user_id").collect().toSeq
    val windowed = ops.Relational.qSessionize(spark, sfDir)
      .groupBy("user_id").agg(countDistinct("session_id").as("n_sessions"))
      .orderBy("user_id").collect().toSeq
    assert(custom.nonEmpty && custom == windowed)
  }
}
