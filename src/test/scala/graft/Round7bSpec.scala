package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamOps3

/** Round-7 batch p: graph analytics (link prediction, assortativity,
  * k-core peel), basket lift, shingle containment, audio VAD — plus the
  * REAL streaming paths of st_anomaly and st_topk (MemoryStream through
  * flatMapGroupsWithState / stateful aggregation, asserted ≡ the batch
  * plans the driver gates). The DuckDB hash gate is the correctness
  * authority; these pin the invariants a wrong-but-deterministic change
  * could smuggle past a stale oracle. */
class Round7bSpec extends SparkSpec {

  test("st_anomaly streaming ≡ batch: Welford decimal state across 3 micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batch = StreamOps3.stAnomaly(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val ev = Tables.table(spark, sfDir, "events")
      .select(col("event_type"), col("value"),
        expr("ts div 1000").as("ts_us"), col("event_id"))
      .as[StreamOps3.AnomEvent]
      .collect().sortBy(e => (e.ts_us, e.event_id))
    val chunks = ev.grouped((ev.length + 2) / 3).toSeq
    assert(chunks.size == 3)
    val stream = MemoryStream[StreamOps3.AnomEvent]
    val q = StreamOps3.anomalyStream(stream.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("anom_out").start()
    try {
      chunks.foreach { c => stream.addData(c.toSeq); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.table("anom_out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1).map { case (t, rows) =>
        t -> ((rows.map(_._2).sum, rows.map(_._3).sum, rows.map(_._4).max))
      }
    assert(batch.nonEmpty, "no scored types at this sf — fixture broken")
    batch.foreach { case (t, (ns, na, mz)) =>
      val (gs, ga, gz) = got(t)
      assert(gs == ns && ga == na,
        s"$t: stream scored/anomalies ($gs, $ga) != batch ($ns, $na) — " +
          "the per-event decimal fold diverged from the window sums")
      val gz4 = BigDecimal(gz).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(gz4 - mz) < 1e-12,
        s"$t: stream max|z| $gz4 != batch $mz")
    }
  }

  test("st_topk: streamed stateful counts rank to the identical board") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val board = StreamOps3.stTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3), r.getLong(4)))
      .toSeq
    val ev = Tables.table(spark, sfDir, "events")
      .select(col("ts"), col("event_type"), col("user_id"))
      .as[(Long, String, Long)]
      .collect().sortBy(_._1)
    val chunks = ev.grouped((ev.length + 2) / 3).toSeq
    val stream = MemoryStream[(Long, String, Long)]
    val counts = StreamOps3.topkCounts(
      stream.toDS().toDF("ts", "event_type", "user_id"))
    val q = counts.writeStream.outputMode("complete")
      .format("memory").queryName("topk_counts").start()
    try {
      chunks.foreach { c => stream.addData(c.toSeq); q.processAllAvailable() }
    } finally q.stop()
    // rank DOWNSTREAM of the stateful aggregation, as the op documents
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("day", "event_type").orderBy(col("c").desc, col("user_id"))
    val streamed = spark.table("topk_counts")
      .withColumn("rnk", row_number().over(w)).where(col("rnk") <= 3)
      .select("day", "event_type", "rnk", "user_id", "c")
      .orderBy("day", "event_type", "rnk")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(board.nonEmpty && streamed == board,
      "streamed counts do not rank to the batch board")
  }

  test("q_kcore: peel is monotone and converges inside the unrolled rounds") {
    val rows = ops.Graph.qKcore(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("round")).toSeq == (1 to 6))
    val surviving = rows.map(_.getAs[Long]("n_surviving"))
    assert(surviving.zip(surviving.tail).forall { case (a, b) => b <= a },
      "survivor counts must be non-increasing")
    assert(rows.last.getAs[Long]("n_removed") == 0L,
      "peel did not converge within 6 rounds at test scale")
    // every survivor of a converged peel has degree >= 3 by definition;
    // the survivor count can't exceed the node count of round 0
    assert(surviving.last >= 0)
  }

  test("q_assortativity: r in [-1, 1] and edge count positive") {
    val r = ops.Graph.qAssortativity(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_edges") > 0)
    val a = r.getAs[Double]("assortativity")
    assert(a >= -1.0 - 1e-12 && a <= 1.0 + 1e-12, s"r=$a out of range")
  }

  test("q_link_predict: candidates are non-edges with consistent scores") {
    val rows = ops.Graph.qLinkPredict(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("u") < r.getAs[Long]("v"), "orientation lost")
      assert(r.getAs[Long]("cn") >= 1, "candidate without a common neighbor")
      val j = r.getAs[Long]("jaccard_ppm")
      assert(j >= 0 && j <= 1000000, s"jaccard_ppm $j out of range")
      assert(r.getAs[Long]("aa_ppm") >= r.getAs[Long]("cn"),
        "Adamic-Adar ppm must be >= cn (each term >= 10^6/deg >= 1... scaled)")
    }
    // ranking contract: cn desc, then jaccard desc
    val keys = rows.map(r => (-r.getAs[Long]("cn"), -r.getAs[Long]("jaccard_ppm"),
      r.getAs[Long]("u"), r.getAs[Long]("v"))).toSeq
    assert(keys == keys.sorted, "top-20 ordering violated")
  }

  test("q_basket_lift: support floor held; lift recomputes from the counts") {
    val rows = ops.StatsOps.qBasketLift(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_both") >= 2, "support floor violated")
      assert(r.getAs[Long]("p1") < r.getAs[Long]("p2"))
    }
  }

  test("d_shingle_containment: containment >= jaccard always; threshold held") {
    val rows = ops.Dedup2.dShingleContainment(spark, sfDir).collect()
    rows.foreach { r =>
      val c = r.getAs[Double]("containment")
      val j = r.getAs[Double]("jaccard")
      assert(c >= 0.8, s"threshold violated: $c")
      assert(c + 1e-9 >= j, s"containment $c < jaccard $j — impossible " +
        "(|A∩B|/|A| >= |A∩B|/|A∪B| since |A| <= |A∪B|)")
    }
  }

  test("q_runs_test: runs count bounded by sign count; z finite") {
    val r = ops.StatsOps.qRunsTest(spark, sfDir).collect().head
    val (n1, n2, runs) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"),
      r.getAs[Long]("runs"))
    assert(n1 > 0 && n2 > 0)
    assert(runs >= 1 && runs <= n1 + n2, s"runs=$runs out of [1, ${n1 + n2}]")
    assert(!r.getAs[Double]("z").isNaN)
  }

  test("s_ivf_imbalance: spine complete; imbalance >= 1 (ppm >= 1e6)") {
    val r = ops.Cluster.sIvfImbalance(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_cells") == 8L)
    assert(r.getAs[Long]("min_cell") <= r.getAs[Long]("max_cell"))
    // Cauchy-Schwarz: k·Σc² >= (Σc)², equality iff perfectly balanced
    assert(r.getAs[Long]("imbalance_ppm") >= 1000000L,
      "imbalance factor below 1 is mathematically impossible")
    assert(r.getAs[Long]("n_empty") >= 0 && r.getAs[Long]("n_empty") < 8)
  }

  test("m_patch_grid: patch extents tile the payload exactly") {
    val rows = ops.Multimodal2.mPatchGrid(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // per doc: sum of patch byte extents == payload length (no byte lost
    // or double-counted by the 2-D gather), patches per doc == 2 * ceil(W/8)
    val docs = Tables.table(spark, sfDir, "documents")
      .where(org.apache.spark.sql.functions.col("doc_id") % 7 === 2)
      .selectExpr("doc_id", "octet_length(encode(text, 'UTF-8')) AS len")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, ps) =>
      val len = docs(id)
      val w = (len + 15) / 16
      assert(ps.map(_.getAs[Int]("n_bytes")).sum == len,
        s"doc $id: patch extents don't tile the ${len}-byte payload")
      assert(ps.length == 2 * ((w + 7) / 8), s"doc $id: wrong patch count")
    }
  }

  test("st_backfill: the handoff itself — batch backfill ∪ streamed tail, id-deduped, ≡ full batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ev = Tables.table(spark, sfDir, "events")
      .select(col("event_id"), col("event_type"),
        expr("ts div 86400000000000").as("day"))
    val d0 = ev.agg(min("day")).head().getLong(0)
    val full = ev.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val backfill = ev.where(col("day") < d0 + 20)
      .select("event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // live tail streams in (one day of overlap with the backfill)
    val tail = ev.where(col("day") >= d0 + 19)
      .select(col("event_id"), col("event_type")).as[(Long, String)]
      .collect().sortBy(_._1)
    val stream = MemoryStream[(Long, String)]
    val live = stream.toDS().toDF("event_id", "event_type")
      .dropDuplicates("event_id")
    val q = live.writeStream.outputMode("append")
      .format("memory").queryName("live_tail").start()
    try {
      tail.grouped(math.max(1, (tail.length + 2) / 3))
        .foreach { c => stream.addData(c.toSeq); q.processAllAvailable() }
    } finally q.stop()
    val streamed = spark.table("live_tail").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // seam dedup: first-writer-wins on event_id (backfill wrote first)
    val union = (backfill ++ streamed).distinct
    assert(union.length == backfill.length + streamed.length -
      streamed.count(s => backfill.contains(s)), "dedup sanity")
    val got = union.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(got == full,
      s"handoff lost or duplicated events: got $got expected $full")
    // and the op's own report certifies the identity
    val report = graft.streaming.StreamOps3.stBackfill(spark, sfDir).collect()
    assert(report.nonEmpty && report.forall(_.getAs[Boolean]("gapless")))
  }

  test("m_audio_vad: per-doc counts internally consistent") {
    val rows = ops.Multimodal2.mAudioVad(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nf = r.getAs[Long]("n_frames")
      val na = r.getAs[Long]("n_active")
      val ns = r.getAs[Long]("n_segments")
      val lg = r.getAs[Long]("longest_segment")
      assert(na <= nf && na >= 0)
      assert(lg <= na, "longest run can't exceed total active frames")
      assert(ns == 0 || lg >= 2, "kept segments respect the min-duration floor")
      assert(ns * 2 <= na || ns == 0, "each kept segment has >= 2 frames")
      assert(r.getAs[Long]("speech_ppm") == 1000000L * na / nf)
    }
  }
}
