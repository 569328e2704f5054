package graft

import graft.catalog.LakeCatalog
import graft.ops.Graph
import graft.plans.CboRouteRule
import graft.streaming.StreamOps4
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-10 hardening invariants: the r9 review findings — screen-verdict
  * replay determinism at the curation seam, the conductance denominator
  * guard, the CBO absolute broadcast cap — plus the r9 verdict's action
  * items: the (dir, mtime)-memoized planner sidecar reads, SEMI/ANTI
  * routing for IN-subquery shapes, per-version DV fold targets at snapshot
  * expiry (the gap-version resurrection), and the persisted LSH index's
  * expiry maintenance verb. */
class Round10Spec extends SparkSpec {

  private def scratch: String =
    s"${System.getProperty("java.io.tmpdir")}/graft_warehouse"

  // --------------------------------------------- conductance denominator

  test("conductanceOf: a single community holding all endpoints reads 0, not NULL") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("lo", "hi")
    val nat = Seq((1L, 7L), (2L, 7L), (3L, 7L)).toDF("s_suppkey", "com")
    val rows = Graph.conductanceOf(edges, nat).collect()
    assert(rows.length == 1)
    assert(!rows(0).isNullAt(rows(0).fieldIndex("conductance_ppm")),
      "volume = 2m made the denominator 0 and the division NULL")
    assert(rows(0).getAs[Long]("conductance_ppm") == 0L,
      "no cut edges must mean conductance 0")
  }

  // ------------------------------ curation seam: crash-replay determinism

  test("screenBatch replay against its own partially-landed signatures keeps verdicts") {
    import spark.implicits._
    val wh = s"${System.getProperty("java.io.tmpdir")}/graft_replay_wh"
    val whDir = java.nio.file.Paths.get(wh)
    if (java.nio.file.Files.exists(whDir)) {
      import scala.jdk.CollectionConverters._
      val w = java.nio.file.Files.walk(whDir)
      try w.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
      finally w.close()
    }
    val cat = new LakeCatalog(spark, wh)
    cat.createTable("scratch", "rp_idx", StructType(Seq(
      StructField("doc_id", LongType), StructField("band", IntegerType),
      StructField("sig", LongType))))
    cat.createTable("scratch", "rp_verdicts", StructType(Seq(
      StructField("doc_id", LongType), StructField("fp", StringType),
      StructField("n_tok", LongType), StructField("admitted", BooleanType))))
    val a = "the quick brown fox jumps over the lazy dog while the sun is " +
      "setting and the birds of the valley sing to the wind in a calm " +
      "evening of early autumn light"
    val b = "a gentle river flows through the old town and the people walk " +
      "to the market in the morning to buy bread and fruit while it is " +
      "still cool under the tall trees"
    def gated(rows: Seq[(Long, String, String)]) =
      graft.streaming.StreamOps.gateDocs(
        rows.toDF("doc_id", "text", "lang")
          .withColumn("event_time", timestamp_seconds(col("doc_id"))))
    // batch 1 commits normally
    StreamOps4.screenBatch(gated(Seq((10L, a, "en"))),
      cat, "scratch", "rp_idx", "rp_verdicts", batchId = Some(1L))
    // batch 2 CRASHES between its two appends: its signatures landed in the
    // index, its fenced verdict append did not — simulate the partial state
    val batch2 = Seq((20L, b, "en"))
    cat.append("scratch", "rp_idx",
      StreamOps4.lshSigs(gated(batch2).select(col("doc_id"), col("text"))))
    // the REPLAY (fence not set for id 2, so it runs) now screens doc 20
    // against an index already holding doc 20's own signatures — the
    // verdict must still be ADMITTED (self-hits excluded), exactly what a
    // clean first run would have produced
    StreamOps4.screenBatch(gated(batch2),
      cat, "scratch", "rp_idx", "rp_verdicts", batchId = Some(2L))
    val verdicts = cat.load("scratch", "rp_verdicts")
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(verdicts == Map(10L -> true, 20L -> true),
      s"crash-replay changed verdicts (self-collision): $verdicts")
    // and a genuine near-dup of an OTHER doc still quarantines
    val aNear = a.replace("early autumn light", "late summer glow")
    StreamOps4.screenBatch(gated(Seq((30L, aNear, "en"))),
      cat, "scratch", "rp_idx", "rp_verdicts", batchId = Some(3L))
    val v30 = cat.load("scratch", "rp_verdicts")
      .where(col("doc_id") === 30L).head().getBoolean(3)
    assert(!v30, "self-hit exclusion must not blind the screen to real near-dups")
    cat.dropTable("scratch", "rp_idx")
    cat.dropTable("scratch", "rp_verdicts")
  }

  // ------------------------------------- quality drift: streaming merge parity

  test("quality-drift bucket counts maintained per micro-batch equal the batch form") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cat = new LakeCatalog(spark, scratch)
    cat.dropTable("scratch", "qd_counts")
    cat.createTable("scratch", "qd_counts", StructType(Seq(
      StructField("bucket", LongType), StructField("n", LongType))))
    val docs = Tables.table(spark, sfDir, "documents")
      .where(col("doc_id") % 10 === 0)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    // per micro-batch: the stateless bucket projection + a 10-row count
    // append — bucket counts are mergeable state (counts add)
    val q = mem.toDF().toDF("doc_id", "text").writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!b.isEmpty) cat.append("scratch", "qd_counts",
          StreamOps4.qualityBucket(b.toDF())
            .groupBy("bucket").agg(count(lit(1)).as("n")))
      }.start()
    docs.grouped((docs.size / 2) + 1).foreach { chunk =>
      mem.addData(chunk); q.processAllAvailable()
    }
    q.stop()
    val merged = cat.load("scratch", "qd_counts")
      .groupBy("bucket").agg(sum("n").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = StreamOps4.stQualityDrift(spark, sfDir)
      .collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("new_n"))
      .filter(_._2 > 0).toMap
    assert(merged == batch,
      s"streamed bucket counts diverge from the batch form: $merged vs $batch")
    cat.dropTable("scratch", "qd_counts")
  }

  // ----------------------------------------- CBO: memo, semi/anti, cap

  /** A dedicated-warehouse analyzed dim + probe pair for planner tests. */
  private def cboTables(wh: String): LakeCatalog = {
    val cat = new LakeCatalog(spark, wh)
    cat.dropTable("scratch", "dim10")
    cat.createTable("scratch", "dim10", StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_acctbal", DoubleType))))
    cat.append("scratch", "dim10",
      Tables.table(spark, sfDir, "customer")
        .select(col("c_custkey"), col("c_acctbal")))
    cat.analyzeTable("scratch", "dim10", Seq("c_acctbal"))
    cat.analyzeHistogram("scratch", "dim10", "c_acctbal")
    cat.dropTable("scratch", "probe10")
    cat.createTable("scratch", "probe10", StructType(Seq(
      StructField("o_custkey", LongType), StructField("o_totalprice", DoubleType))))
    cat.append("scratch", "probe10",
      Tables.table(spark, sfDir, "orders")
        .select(col("o_custkey"), col("o_totalprice")))
    cat
  }

  test("decide() parses sidecars once per content version across repeated planning") {
    import spark.implicits._
    val cat = cboTables(s"${System.getProperty("java.io.tmpdir")}/graft_cbomemo_wh")
    def planned(): String = {
      val df = cat.load("scratch", "probe10")
        .join(cat.load("scratch", "dim10")
            .where(col("c_acctbal") >= 0.0 && col("c_acctbal") < 1000.0),
          col("c_custkey") === col("o_custkey"))
        .agg(count(lit(1)))
      df.queryExecution.executedPlan.toString
    }
    CboRouteRule.clearDecideMemo()
    CboRouteRule.clearApplied()
    val p0 = CboRouteRule.sidecarParseCount
    val plan1 = planned()
    val p1 = CboRouteRule.sidecarParseCount
    assert(p1 - p0 == 1,
      s"first planning of one qualifying side should parse sidecars exactly once, got ${p1 - p0}")
    val plan2 = planned()
    val p2 = CboRouteRule.sidecarParseCount
    assert(p2 == p1,
      s"repeated planning of the same join re-parsed sidecars ${p2 - p1} times")
    assert(plan1.contains("BroadcastHashJoin") == plan2.contains("BroadcastHashJoin"),
      "memoized decision changed the plan")
    assert(CboRouteRule.lastApplied.nonEmpty, "rule did not route the join")
    // a commit invalidates the memo DETERMINISTICALLY (ADVICE r10): the
    // append grows the append-only snapshot log, so the (mtime, size) key
    // changes even on filesystems with coarse mtime granularity — no sleep
    cat.append("scratch", "dim10",
      Seq((999999L, 500.0)).toDF("c_custkey", "c_acctbal"))
    cat.analyzeHistogram("scratch", "dim10", "c_acctbal")
    planned()
    assert(CboRouteRule.sidecarParseCount > p2,
      "sidecar refresh did not invalidate the decide memo")
    cat.dropTable("scratch", "dim10"); cat.dropTable("scratch", "probe10")
  }

  test("a hint-free IN-subquery flips broadcast/shuffle across the threshold, results identical") {
    val wh = s"${System.getProperty("java.io.tmpdir")}/graft_cbosemi_wh"
    val cat = cboTables(wh)
    val gw = new graft.catalog.SqlGateway(spark, cat)
    def probe(hi: Double): (Long, String) = {
      val df = gw.execute(
        s"""SELECT CAST(COUNT(*) AS BIGINT) AS n FROM probe10
           |WHERE o_custkey IN (SELECT c_custkey FROM dim10
           |                    WHERE c_acctbal >= 0.0 AND c_acctbal < $hi)""".stripMargin)
      val plan = df.queryExecution.executedPlan.toString
      val strat =
        if (plan.contains("BroadcastHashJoin")) "broadcast"
        else if (plan.contains("SortMergeJoin")) "shuffle" else "other"
      (df.head().getLong(0), strat)
    }
    CboRouteRule.clearDecideMemo()
    val (nNarrow, sNarrow) = probe(1000.0)
    val (nWide, sWide) = probe(8000.0)
    assert(sNarrow == "broadcast",
      s"narrow IN-subquery did not broadcast its subquery side (got $sNarrow)")
    // the sharp half: at test scale Spark's size guess would broadcast the
    // wide side too — only the rule's SHUFFLE_MERGE pin explains a shuffle
    assert(sWide == "shuffle",
      s"wide IN-subquery was not pinned to shuffle by the sidecar estimate (got $sWide)")
    // route-invariance against the direct computation
    val cust = Tables.table(spark, sfDir, "customer")
    val ords = Tables.table(spark, sfDir, "orders")
    def direct(hi: Double): Long = ords.join(
        cust.where(col("c_acctbal") >= 0.0 && col("c_acctbal") < hi)
          .select("c_custkey"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .count()
    assert(nNarrow == direct(1000.0) && nWide == direct(8000.0),
      "routing changed IN-subquery results")
    cat.dropTable("scratch", "dim10"); cat.dropTable("scratch", "probe10")
  }

  test("the absolute broadcast row cap clamps a 20%-passing estimate to shuffle") {
    val cat = cboTables(s"${System.getProperty("java.io.tmpdir")}/graft_cbocap_wh")
    def planned(): String = {
      val df = cat.load("scratch", "probe10")
        .join(cat.load("scratch", "dim10")
            .where(col("c_acctbal") >= 0.0 && col("c_acctbal") < 1000.0),
          col("c_custkey") === col("o_custkey"))
        .agg(count(lit(1)))
      df.queryExecution.executedPlan.toString
    }
    assert(planned().contains("BroadcastHashJoin"),
      "setup: the narrow side should broadcast under the default cap")
    spark.conf.set("spark.graft.cbo.broadcastRowCap", "1")
    try {
      CboRouteRule.clearApplied()
      val plan = planned()
      assert(plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
        "a 1-row absolute cap must force the shuffle route regardless of the 20% rule")
      val d = CboRouteRule.lastApplied.last
      assert(d.threshold == 1L && d.route == "shuffle",
        s"decision did not record the clamped threshold: $d")
    } finally spark.conf.unset("spark.graft.cbo.broadcastRowCap")
    cat.dropTable("scratch", "dim10"); cat.dropTable("scratch", "probe10")
  }

  test("MAINTAIN STATS is a no-op below the factor and refreshes above it") {
    import spark.implicits._
    val cat = new LakeCatalog(spark, scratch)
    val gw = new graft.catalog.SqlGateway(spark, cat)
    cat.dropTable("scratch", "ms_spec")
    cat.createTable("scratch", "ms_spec", StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType))))
    cat.append("scratch", "ms_spec",
      (1L to 1000L).map(i => (i, i.toDouble)).toDF("k", "v"))
    cat.analyzeTable("scratch", "ms_spec", Seq("v"))
    cat.analyzeHistogram("scratch", "ms_spec", "v")
    // +20% growth: below the default 150% factor — metadata-only no-op
    cat.append("scratch", "ms_spec",
      (1L to 200L).map(i => (i, i.toDouble)).toDF("k", "v"))
    val r1 = gw.execute("MAINTAIN STATS scratch.ms_spec").head()
    assert(!r1.getAs[Boolean]("refreshed"), "refreshed below the factor")
    assert(cat.statsRowCount("scratch", "ms_spec", "v").contains(1000L),
      "no-op path rewrote the sidecar")
    // past the factor: refresh runs, analyzed rows track the manifest
    cat.append("scratch", "ms_spec",
      (1L to 500L).map(i => (i, i.toDouble)).toDF("k", "v"))
    val r2 = gw.execute("MAINTAIN STATS scratch.ms_spec FACTOR 150").head()
    assert(r2.getAs[Boolean]("refreshed"), "did not refresh past the factor")
    assert(cat.statsRowCount("scratch", "ms_spec", "v").contains(1700L),
      "refresh did not re-ANALYZE to the current manifest")
    assert(cat.histogramColumns("scratch", "ms_spec") == Seq("v"),
      "refresh lost the histogram coverage")
    cat.dropTable("scratch", "ms_spec")
  }

  // ------------------------- expiry: gap-version DV folds (low ref pins cutoff)

  test("a MOR delete in the gap between a low ref and the keep window survives expiry") {
    import spark.implicits._
    val cat = new LakeCatalog(spark, scratch)
    cat.dropTable("scratch", "dv_gap")
    cat.createTable("scratch", "dv_gap", StructType(Seq(
      StructField("k", LongType), StructField("q", DoubleType))))
    cat.append("scratch", "dv_gap",
      (1L to 40L).map(i => (i, i * 1.0)).toDF("k", "q"))           // v1
    cat.appendToBranch("scratch", "dv_gap",
      Seq((900L, 9.0)).toDF("k", "q"), "hold")                     // v2 (ref)
    assert(cat.deleteWhereMor("scratch", "dv_gap", col("k") <= 8) == 8) // v3 (tokened)
    (1 to 3).foreach(i =>
      cat.append("scratch", "dv_gap", Seq((100L + i, 1.0)).toDF("k", "q")))
    assert(cat.load("scratch", "dv_gap").count() == 35)
    val branchBefore = cat.loadBranch("scratch", "dv_gap", "hold").count()
    // keep=2 pins the last two versions; the ref pins v2 BELOW the delete's
    // v3, so the delete expires in the GAP — a single-cutoff fold would
    // either lose it (resurrection at HEAD) or leak it into the ref's read
    cat.expireSnapshots("scratch", "dv_gap", keep = 2)
    assert(cat.load("scratch", "dv_gap").count() == 35,
      "gap-version MOR delete resurrected at HEAD after expiry")
    assert(cat.countStar("scratch", "dv_gap").contains(35L))
    assert(cat.loadBranch("scratch", "dv_gap", "hold").count() == branchBefore,
      "the folded delete leaked into the pre-delete ref's read")
    cat.dropTable("scratch", "dv_gap")
  }

  // ----------------------------------- persisted LSH index expiry verb

  test("the gateway's EXPIRE INDEX verb sweeps dead signatures via the live table") {
    import spark.implicits._
    val cat = new LakeCatalog(spark, scratch)
    val gw = new graft.catalog.SqlGateway(spark, cat)
    cat.dropTable("scratch", "gw_idx"); cat.dropTable("scratch", "gw_live")
    cat.createTable("scratch", "gw_idx", StructType(Seq(
      StructField("doc_id", LongType), StructField("band", IntegerType),
      StructField("sig", LongType))))
    cat.createTable("scratch", "gw_live", StructType(Seq(
      StructField("doc_id", LongType))))
    cat.append("scratch", "gw_idx",
      (1L to 30L).flatMap(d => (0 to 3).map(b => (d, b, d * 100 + b)))
        .toDF("doc_id", "band", "sig"))
    cat.append("scratch", "gw_live",
      (1L to 30L).filter(_ % 3 != 0).toDF("doc_id"))
    val r = gw.execute("EXPIRE INDEX scratch.gw_idx USING scratch.gw_live").head()
    assert(r.getAs[Long]("rows_before") == 120L &&
      r.getAs[Long]("rows_after") == 80L && r.getAs[Long]("rows_expired") == 40L,
      s"verb telemetry wrong: $r")
    assert(cat.load("scratch", "gw_idx")
      .where(col("doc_id") % 3 === 0).count() == 0L,
      "dead doc signatures survived the verb")
    cat.dropTable("scratch", "gw_idx"); cat.dropTable("scratch", "gw_live")
  }

  test("expireIndex against an empty live set empties the index without breaking reads") {
    import spark.implicits._
    val cat = new LakeCatalog(spark, scratch)
    cat.dropTable("scratch", "empty_live_idx")
    cat.createTable("scratch", "empty_live_idx", StructType(Seq(
      StructField("doc_id", LongType), StructField("band", IntegerType),
      StructField("sig", LongType))))
    cat.append("scratch", "empty_live_idx",
      (1L to 10L).map(d => (d, 0, d)).toDF("doc_id", "band", "sig"))
    val (b0, a0) = StreamOps4.expireIndex(cat, "scratch", "empty_live_idx",
      Seq.empty[Long].toDF("doc_id"))
    assert(b0 == 10L && a0 == 0L, s"total expiry wrong: $b0 -> $a0")
    assert(cat.load("scratch", "empty_live_idx").count() == 0L)
    // the emptied index still serves screens (everything admits)
    val v = StreamOps4.lshScreen(
      Seq((99L, "the quick brown fox jumps over the lazy dog and then " +
        "the fox rests under the old tree near the river bank at noon"))
        .toDF("doc_id", "text"),
      cat.load("scratch", "empty_live_idx")).head()
    assert(v.getAs[Boolean]("admitted"), "empty index must admit everything")
    cat.dropTable("scratch", "empty_live_idx")
  }

  test("expireIndex removes exactly the dead docs' rows; live verdicts unchanged") {
    val out = StreamOps4.dIndexExpire(spark, sfDir)
      .collect()
    assert(out.nonEmpty, "no screened query docs at sf0.001")
    // hits never grow, and a post-expiry hit count equals the live-only
    // pre-expiry count by the op's own construction — spot-audit the
    // invariants the hash gate rides on
    out.foreach { r =>
      val (hb, ha) = (r.getAs[Long]("hits_before"), r.getAs[Long]("hits_after"))
      assert(ha <= hb, s"expiry INCREASED hits for doc ${r.getLong(0)}")
      assert(r.getAs[Boolean]("admitted_after") == (ha == 0L))
      assert(r.getAs[Boolean]("admitted_before") == (hb == 0L))
    }
    // the persisted index holds no expired doc ids
    val cat = new LakeCatalog(spark, scratch)
    val leftIds = cat.load("scratch", "lsh_exp_idx")
      .where(col("doc_id") % 7 === 3).count()
    assert(leftIds == 0L, s"$leftIds signature rows of deleted docs survived expiry")
    // the table's history keeps the pre-expiry index reachable (snapshot
    // replace, not erase): rows_before > rows_after in the verb's telemetry
    val (b2, a2) = StreamOps4.expireIndex(cat, "scratch", "lsh_exp_idx",
      cat.load("scratch", "lsh_exp_idx").select("doc_id"))
    assert(b2 == a2, "expiring against the full live set must be a no-op")
  }
}
