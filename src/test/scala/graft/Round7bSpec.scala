package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamOps3
import graft.catalog.LakeCatalog

/** Round-7 batch b: streaming anomaly detection (real flatMapGroupsWithState
  * Welford state vs the batch window replay) and hidden bucket
  * partitioning (spec-transformed equality scans prune to one directory). */
class Round7bSpec extends SparkSpec {

  test("st_anomaly streaming ≡ batch: Welford state across ordered micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the batch oracle replay (ground truth at this sf)
    val batch = StreamOps3.stAnomaly(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // the same events as a 3-micro-batch time-ordered stream
    val ev = Tables.table(spark, sfDir, "events")
      .select(col("event_type"), col("value"),
        expr("ts div 1000").as("ts_us"), col("event_id"))
      .as[StreamOps3.AnomEvent]
      .collect().sortBy(e => (e.ts_us, e.event_id))
    val chunks = ev.grouped((ev.length + 2) / 3).toSeq
    assert(chunks.size == 3)
    val stream = MemoryStream[StreamOps3.AnomEvent]
    val out = StreamOps3.anomalyStream(stream.toDS())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("anom_out").start()
    try {
      chunks.foreach { c => stream.addData(c.toSeq); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.table("anom_out")
      .groupBy("event_type")
      .agg(sum("scored").cast("long").as("scored"),
        sum("anomalies").cast("long").as("anomalies"),
        round(max("maxAbsZ"), 4).as("maxAbsZ"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == batch.keySet)
    got.foreach { case (k, v) =>
      assert(v == batch(k),
        s"$k: stream $v != batch ${batch(k)} — Welford state diverged from the window replay")
    }
  }

  test("q_hll_merge: register merge is exact; estimate lands inside the sketch bound") {
    val r = ops.Relational4.qHllMerge(spark, sfDir).collect().head
    assert(r.getBoolean(4), "merged registers != direct registers — merge algebra broken")
    assert(r.getBoolean(5), "estimate outside 20% of exact")
    val (exact, est) = (r.getLong(1), r.getDouble(2))
    assert(math.abs(est - exact) / exact < 0.1,
      f"estimate $est%.1f vs exact $exact — cubic hash mixing degraded")
  }

  test("q_cohort_revenue: matrix partitions total purchase revenue; age-0 covers every cohort user") {
    val rows = ops.Relational4.qCohortRevenue(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val p = Tables.table(spark, sfDir, "events")
      .where(col("event_type") === "purchase")
    val total = p.agg(Tables.dsum(col("value"))).collect().head.getDouble(0)
    val matrixTotal = rows.map(_.getDouble(3)).sum
    assert(math.abs(matrixTotal - total) < 1e-4,
      s"cohort matrix revenue $matrixTotal != corpus purchase revenue $total")
    // at age 0 every cohort member is active by construction (their first week)
    val cohortSizes = p.select(col("user_id"), expr("ts div 604800000000000").as("wk"))
      .groupBy("user_id").agg(min("wk").as("c"))
      .groupBy("c").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.filter(_.getLong(1) == 0L).foreach { r =>
      assert(r.getLong(2) == cohortSizes(r.getLong(0)),
        s"cohort ${r.getLong(0)}: age-0 users != cohort size")
    }
  }

  test("PolyRollHashes: rolling identity equals per-window refold; d_cdc_chunks conserves bytes") {
    import spark.implicits._
    // rolling == refold on real corpus text (the O(n) identity vs O(n·w))
    val texts = Tables.table(spark, sfDir, "documents")
      .where(length(col("text")) >= 8).limit(5).select("text").as[String].collect()
    texts.foreach { t =>
      val got = spark.range(1).select(lit(t).as("t"))
        .select(graft.functions.Poly.rollHashes(col("t"), 8).as("wh"))
        .as[Seq[Long]].head()
      val cps = t.codePoints.toArray
      val want = (0 to cps.length - 8).map { i =>
        var h = java.math.BigInteger.ZERO
        val M = java.math.BigInteger.valueOf(graft.functions.PolyHash.M)
        val B = java.math.BigInteger.valueOf(graft.functions.PolyHash.B)
        (0 until 8).foreach { j =>
          h = h.multiply(B).add(java.math.BigInteger.valueOf(cps(i + j) + 1L)).mod(M)
        }
        h.longValueExact()
      }
      assert(got == want, "rolling hash diverged from the window refold")
    }
    // chunking is a partition of each doc: chunk bytes sum to corpus bytes
    val r = ops.Dedup2.dCdcChunks(spark, sfDir).collect().head
    val total = Tables.table(spark, sfDir, "documents")
      .where(col("doc_id") % 5 === 0 && length(col("text")) >= 8)
      .agg(sum(length(col("text")))).collect().head.getLong(0)
    val meanLen = r.getDouble(5)
    assert(math.abs(meanLen * r.getLong(1) - total) < 1.0,
      s"chunk bytes ${meanLen * r.getLong(1)} != corpus bytes $total — chunking lost content")
    assert(r.getLong(2) <= r.getLong(1) && r.getLong(3) == r.getLong(1) - r.getLong(2))
  }

  test("st_topk: streamed counts rank to the identical board as the batch entry") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Tables.table(spark, sfDir, "events")
      .select(col("ts"), col("event_type"), col("user_id"))
      .as[(Long, String, Long)].collect().toSeq
    val mem = MemoryStream[(Long, String, Long)]
    val counts = StreamOps3.topkCounts(
      mem.toDF().toDF("ts", "event_type", "user_id"))
    val q = counts.writeStream.format("memory").queryName("topk_counts")
      .outputMode("complete").start()
    try {
      rows.grouped((rows.size / 3) + 1).foreach { c =>
        mem.addData(c); q.processAllAvailable()
      }
    } finally q.stop()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("day", "event_type").orderBy(col("c").desc, col("user_id"))
    val streamed = spark.table("topk_counts")
      .withColumn("rnk", row_number().over(w)).where(col("rnk") <= 3)
      .select("day", "event_type", "rnk", "user_id", "c")
      .orderBy("day", "event_type", "rnk").collect().toSeq
    val batch = StreamOps3.stTopk(spark, sfDir).collect().toSeq
    assert(batch.nonEmpty && batch == streamed)
  }

  test("q_skyline: two-level scan equals the brute-force dominance test; frontier strictly monotone") {
    val pts = ops.Relational4.qSkyline(spark, sfDir).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    assert(pts.nonEmpty)
    // strictly increasing in BOTH coordinates along the frontier
    pts.sliding(2).foreach { case Array((p1, q1), (p2, q2)) =>
      assert(p1 < p2 && q1 < q2, s"frontier not monotone: ($p1,$q1) -> ($p2,$q2)")
    case _ => }
    // brute-force dominance over the distinct point set
    val all = Tables.table(spark, sfDir, "lineitem")
      .select(col("l_extendedprice"), col("l_quantity")).distinct()
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val brute = all.filter { case (p, q) =>
      !all.exists { case (p2, q2) =>
        p2 <= p && q2 >= q && (p2 < p || q2 > q) }
    }.sortBy(_._1)
    assert(pts.sameElements(brute), "two-level skyline != brute-force skyline")
  }

  test("q_max_concurrency: sweep equals a sequential replay") {
    val rows = ops.Relational4.qMaxConcurrency(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tpe = r.getString(0)
      val starts = Tables.table(spark, sfDir, "events")
        .where(col("event_type") === tpe)
        .select(expr("ts div 1000")).collect().map(_.getLong(0)).sorted
      val pts = (starts.map(t => (t, 1)) ++ starts.map(t => (t + 300000000L, -1)))
        .sortBy(p => (p._1, p._2))
      var cur = 0L; var mx = 0L; var firstAt = Long.MaxValue
      pts.foreach { case (t, d) =>
        cur += d
        if (cur > mx) { mx = cur; firstAt = t }
      }
      assert(r.getLong(1) == mx, s"$tpe: max ${r.getLong(1)} != replay $mx")
      assert(r.getLong(2) == firstAt, s"$tpe: first peak mismatch")
    }
  }

  test("hidden partitioning: equality scan prunes to one bucket directory and loses no rows") {
    val scratch = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse"
    val cat = new LakeCatalog(spark, scratch)
    cat.dropTable("scratch", "ev_hidden_spec_test")
    cat.createTable("scratch", "ev_hidden_spec_test",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType))))
    val src = Tables.table(spark, sfDir, "events").select("event_id", "user_id")
    cat.appendBucketed("scratch", "ev_hidden_spec_test", src, "user_id", 8)
    assert(cat.hiddenSpec("scratch", "ev_hidden_spec_test").contains(("user_id", 8)))
    assert(cat.bucketDirs("scratch", "ev_hidden_spec_test").size > 1,
      "bucketing produced a single directory — pruning would be vacuous")
    // every user's scan: pruned to ONE directory, exact same rows as a full filter
    Seq(0L, 7L, 42L).foreach { u =>
      val scan = cat.scanEqual("scratch", "ev_hidden_spec_test", "user_id", u)
      val dirs = scan.inputFiles
        .flatMap(_.split("/").find(_.startsWith("_bucket="))).distinct
      assert(dirs.length == 1, s"user $u: scan read ${dirs.length} buckets")
      assert(scan.count() == src.where(col("user_id") === u).count())
      assert(!scan.columns.contains("_bucket"),
        "synthetic partition column leaked into the user schema")
    }
    // wrong column refuses (the spec is authoritative, not guessed)
    intercept[IllegalArgumentException] {
      cat.scanEqual("scratch", "ev_hidden_spec_test", "event_id", 1L)
    }
    // the spec is discoverable through the SQL gateway (MCP surface)
    val gw = new graft.catalog.SqlGateway(spark, cat)
    val spec = gw.execute("SHOW PARTITION SPEC FOR scratch.ev_hidden_spec_test")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(spec.contains(("bucket", "user_id", "8")))
    // $partitions metadata: per-bucket rows sum to the table, no scan
    val parts = gw.execute("SHOW PARTITIONS FOR scratch.ev_hidden_spec_test")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(parts.nonEmpty && parts.forall(_._1.startsWith("_bucket=")))
    assert(parts.map(_._3).sum == src.count(), "partition row counts != table rows")
    // drop removes the spec sidecar (recreate-inheritance hazard)
    cat.dropTable("scratch", "ev_hidden_spec_test")
    assert(cat.hiddenSpec("scratch", "ev_hidden_spec_test").isEmpty)
  }

  test("days() partitioning: range scan reads only covered day dirs; boundary rows exact") {
    import org.apache.spark.sql.types._
    val scratch = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse"
    val cat = new LakeCatalog(spark, scratch)
    cat.dropTable("scratch", "ev_days_spec_test")
    cat.createTable("scratch", "ev_days_spec_test", StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType))))
    val src = Tables.table(spark, sfDir, "events").select("event_id", "ts")
    cat.appendDayPartitioned("scratch", "ev_days_spec_test", src, "ts")
    val dayUs = 86400000000L
    val d0 = cat.partitionsMeta("scratch", "ev_days_spec_test")
      .map(_._1.stripPrefix("_day=").toLong).min
    val scan = cat.scanTsRangeUs("scratch", "ev_days_spec_test", "ts",
      (d0 + 2) * dayUs, (d0 + 4) * dayUs)
    val dirs = scan.inputFiles
      .flatMap(_.split("/").find(_.startsWith("_day="))).distinct.sorted
    assert(dirs.toSeq == Seq(s"_day=${d0 + 2}", s"_day=${d0 + 3}"),
      s"range scan read $dirs")
    // row-exact vs a full-scan filter at the same µs bounds
    val expect = src.where(
      expr(s"(ts div 1000) >= ${(d0 + 2) * dayUs} and (ts div 1000) < ${(d0 + 4) * dayUs}"))
      .count()
    assert(scan.count() == expect)
    cat.dropTable("scratch", "ev_days_spec_test")
  }
}
