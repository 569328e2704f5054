package graft

import graft.catalog.LakeCatalog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-8 hardening invariants: the review findings on the round-7 closing
  * ops — rename-aware gateway reads, MOR-update single-scan atomicity under
  * a nondeterministic predicate, the zone-map rule's partitioned-layout
  * bail, and the ADD FILES namespace jail. */
class Round8Spec extends SparkSpec {

  private def scratch: String =
    s"${System.getProperty("java.io.tmpdir")}/graft_warehouse"

  test("updateWhereMor: a nondeterministic predicate cannot desync delta rows from DV marks") {
    // pre-fix, the predicate was evaluated in TWO independent scans (delta
    // write vs DV collection): with rand() the matched sets could differ,
    // losing rows (DV-marked but no delta) or duplicating them (delta
    // without DV). The single materialized matched-scan makes the key
    // multiset invariant under ANY predicate.
    val cat = new LakeCatalog(spark, scratch)
    val li = Tables.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_quantity").as("q"))
      .groupBy("k").agg(sum("q").as("q")) // unique keys
    cat.dropTable("scratch", "nd_spec")
    cat.createTable("scratch", "nd_spec", StructType(Seq(
      StructField("k", LongType), StructField("q", DoubleType))))
    cat.append("scratch", "nd_spec", li.where(col("k") % 4 === 0))
    val before = cat.load("scratch", "nd_spec")
      .select("k").collect().map(_.getLong(0)).sorted.toSeq
    val n = cat.updateWhereMor("scratch", "nd_spec",
      rand() < 0.5, "q", col("q") + 1000000.0)
    val after = cat.load("scratch", "nd_spec")
      .select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(after == before,
      s"nondeterministic update desynced rows: ${before.size} -> ${after.size}")
    // the reported count matches the rows that actually changed
    val changed = cat.load("scratch", "nd_spec")
      .where(col("q") >= 1000000.0).count()
    assert(changed == n, s"reported $n updates but $changed rows changed")
    cat.dropTable("scratch", "nd_spec")
  }

  test("conflicting mutation fails BEFORE publication (expectedBase CAS pre-append)") {
    // updateWhereMor/deleteWhereMor now route their conflict check through
    // commitSnapshot's expectedBase CAS — the same pre-append check
    // deleteWhereAt exposes directly. A stale writer must throw WITHOUT
    // appending a snapshot line, leaving the head exactly as the concurrent
    // writer left it (the pre-fix behavior published the stale file list
    // first and detected the conflict after).
    val cat = new LakeCatalog(spark, scratch)
    import spark.implicits._
    cat.dropTable("scratch", "cc_spec")
    cat.createTable("scratch", "cc_spec", StructType(Seq(
      StructField("k", LongType), StructField("q", DoubleType))))
    cat.append("scratch", "cc_spec", Seq((1L, 1.0), (2L, 2.0)).toDF("k", "q"))
    val vPlanned = cat.headVersion("scratch", "cc_spec")
    // the concurrent writer lands between planning and commit
    cat.append("scratch", "cc_spec", Seq((3L, 3.0)).toDF("k", "q"))
    val snapsBefore = cat.snapshots("scratch", "cc_spec").map(_._1)
    intercept[graft.catalog.CommitConflictException] {
      cat.deleteWhereAt("scratch", "cc_spec", col("k") === 1L, vPlanned)
    }
    // nothing published: no new snapshot line, head content intact
    assert(cat.snapshots("scratch", "cc_spec").map(_._1) == snapsBefore,
      "conflicting commit appended a snapshot line before failing")
    assert(cat.load("scratch", "cc_spec").count() == 3,
      "conflicting delete mutated the published table state")
    cat.dropTable("scratch", "cc_spec")
  }

  test("ZoneMapPruneRule: bails out on hive-partitioned table layouts") {
    // appendEvolved's _p=<v>/ layout has BOTH a partition schema and a
    // filestats sidecar: the rule must not replace the partition-aware
    // FileIndex with a flat leaf-file index (which would drop or corrupt
    // the directory-derived _p values) — partition pruning already covers
    // these scans.
    import org.apache.spark.sql.execution.FileSourceScanExec
    val cat = new LakeCatalog(spark, scratch)
    import spark.implicits._
    cat.dropTable("scratch", "zp_spec")
    cat.createTable("scratch", "zp_spec", StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType))))
    val df = (1L to 1000L).map(i => (i, i.toDouble, (i % 4).toString))
      .toDF("k", "v", "grp")
    cat.appendEvolved("scratch", "zp_spec", df, "grp")
    val dirPath = s"$scratch/scratch/zp_spec"
    val read = spark.read.parquet(dirPath).where(col("k") >= 900L)
    // correct under the numeric filter the rule would otherwise act on
    assert(read.count() == 101)
    // partition column intact (directory-derived values survive planning)
    assert(read.where(col("_p").isNull).count() == 0,
      "partition values lost — the prune rule replaced a partitioned index")
    // and the rule really did leave the file list alone
    val scanned = read.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s.relation.location.inputFiles.length
    }.sum
    val total = spark.read.parquet(dirPath).queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s.relation.location.inputFiles.length
    }.sum
    assert(scanned == total,
      s"rule pruned a partitioned layout: $scanned of $total files")
    cat.dropTable("scratch", "zp_spec")
  }

  test("addFiles: landing dirs outside the namespace are rejected") {
    val cat = new LakeCatalog(spark, scratch)
    cat.dropTable("scratch", "aj_spec")
    cat.createTable("scratch", "aj_spec", StructType(Seq(
      StructField("k", LongType))))
    Seq("../main", "../../testdata", "/root/testdata/sf0.001", "..", ".")
      .foreach { dir =>
        intercept[IllegalArgumentException] { cat.addFiles("scratch", "aj_spec", dir) }
      }
    // a legitimate nested landing dir still works
    import spark.implicits._
    cat.dropTable("scratch", "aj_land")
    Seq(1L, 2L).toDF("k").coalesce(1)
      .write.parquet(s"$scratch/scratch/aj_land")
    assert(cat.addFiles("scratch", "aj_spec", "aj_land") == 1)
    assert(cat.load("scratch", "aj_spec").count() == 2)
    cat.dropTable("scratch", "aj_spec")
    cat.dropTable("scratch", "aj_land")
  }

  test("decimal moment sums are exact past the BIGINT cliff (q_spearman/q_mann_whitney class)") {
    // the escalated arithmetic shape: Σ rank2² where rank2 ≤ 2n. At
    // n = 3M the sum is ~4.8e19 > Long.MaxValue (9.22e18) — a BIGINT sum
    // would wrap. The DECIMAL(38,0) path must reproduce the closed form
    // 4·Σi² = 2n(n+1)(2n+1)/3 exactly.
    import spark.implicits._
    val n = 3000000L
    val ranks = spark.range(1, n + 1)
      .select((col("id") * 2).as("rank2")) // tie-free rank2 = 2·i
    val got = ranks
      .agg(sum(col("rank2").cast("decimal(38,0)") * col("rank2")).as("sxx"))
      .head().getDecimal(0)
    val expect = BigInt(2) * BigInt(n) * BigInt(n + 1) * BigInt(2 * n + 1) / 3
    assert(expect > BigInt(Long.MaxValue),
      "test series too small to prove anything past the BIGINT cliff")
    assert(BigInt(got.toBigInteger) == expect,
      s"decimal moment sum inexact: $got != $expect")
    // sanity: the live ops still produce finite statistics at spec scale
    val sp = ops.StatsOps.qSpearman(spark, sfDir).head()
    assert(!sp.isNullAt(1) && math.abs(sp.getDouble(1)) <= 1.0)
    val mw = ops.StatsOps.qMannWhitney(spark, sfDir).head()
    assert(!mw.isNullAt(5) && java.lang.Double.isFinite(mw.getDouble(5)))
    assert(mw.getDouble(2) + mw.getDouble(3) ==
      2.0 * mw.getLong(0) * mw.getLong(1), "U1 + U2 != n1·n2 identity (×2)")
  }

  test("link-predict degree cap: planted hub cannot flood the candidate set; top-k stable") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    val n = 40L
    val base = (for {
      a <- 0L until n; b <- (a + 1) until n if rnd.nextDouble() < 0.12
    } yield (a, b)).toSeq
    // plant a hub adjacent to EVERY node: every non-edge pair gains the hub
    // as a common neighbor, so the uncapped wedge join fans ~n²/2 candidates
    val hub = n
    val planted = base ++ (0L until n).map(h => (h, hub))
    val uncapped = ops.Graph.linkPredictOf(planted.toDF("lo", "hi"))
    val capped = ops.Graph.linkPredictOf(planted.toDF("lo", "hi"),
      maxMidDegree = n / 2)
    // in-memory reference on the planted graph with hub MIDPOINTS excluded
    // (endpoint degrees keep the hub edges — the documented cap semantics)
    val adj = (planted ++ planted.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val deg = adj.view.mapValues(_.size.toLong).toMap
    val eset = planted.toSet
    val ref = (for {
      u <- adj.keys; v <- adj.keys if u < v && !eset((u, v))
      common = (adj(u) intersect adj(v)).filter(deg(_) <= n / 2)
      if common.nonEmpty
    } yield {
      val cn = common.size.toLong
      val j = 1000000L * cn / (deg(u) + deg(v) - cn)
      val aa = common.toSeq.map(nb => 1000000L / deg(nb)).sum
      (u, v, cn, j, aa)
    }).toSeq.sortBy { case (u, v, cn, j, _) => (-cn, -j, u, v) }.take(20)
    val got = capped.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == ref, s"capped top-k diverged from reference:\n got $got\n ref $ref")
    // every capped candidate is supported by NON-hub structure: its cn must
    // match the base graph's common-neighbor count (hub contributes zero)
    val baseAdj = (base ++ base.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap.withDefaultValue(Set.empty[Long])
    got.foreach { case (u, v, cn, _, _) =>
      assert((baseAdj(u) intersect baseAdj(v)).size.toLong == cn,
        s"candidate ($u,$v) scored hub wedges despite the cap")
    }
    // and the uncapped run really is hub-flooded (the cap is load-bearing):
    // with the hub as a universal common neighbor, every returned pair's cn
    // counts it, so uncapped top-k != capped top-k pair sets differ in score
    val gotU = uncapped.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(gotU.forall(_._3 >= 1) && gotU.map(_._3).sum > got.map(_._3).sum,
      "hub did not inflate uncapped scores — planted graph broken")
  }

  test("triangle census: degree-ordered orientation is exact on seeded random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    for (t <- 1 to 8) {
      val n = 10 + rnd.nextInt(14)
      val edges = (for {
        a <- 0L until n; b <- (a + 1) until n if rnd.nextDouble() < 0.3
      } yield (a, b)).toSeq
      if (edges.nonEmpty) {
        val adj = (edges ++ edges.map(_.swap))
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        // yield the tuple, not a constant: a Set-typed inner generator
        // collapses duplicate yields, silently undercounting
        val refTri = (for {
          (a, b) <- edges
          c <- adj(a) intersect adj(b) if c > b
        } yield (a, b, c)).size.toLong
        val row = ops.Graph.triangleCensusOf(edges.toDF("lo", "hi")).head()
        assert(row.getLong(3) == refTri,
          s"trial $t: census ${row.getLong(3)} != reference $refTri")
        // wedge denominator: sum of C(deg, 2)
        val refW = adj.values.map(s => s.size.toLong * (s.size - 1) / 2).sum
        assert(row.getLong(2) == refW)
      }
    }
  }

  test("joinRouted: the sidecar estimate picks the physical join, results route-invariant") {
    val cat = new LakeCatalog(spark, scratch)
    cat.dropTable("scratch", "cbo_spec")
    cat.createTable("scratch", "cbo_spec", StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_acctbal", DoubleType))))
    cat.append("scratch", "cbo_spec",
      Tables.table(spark, sfDir, "customer").select(col("c_custkey"), col("c_acctbal")))
    cat.analyzeTable("scratch", "cbo_spec", Seq("c_acctbal"))
    cat.analyzeHistogram("scratch", "cbo_spec", "c_acctbal")
    val n = cat.statsRowCount("scratch", "cbo_spec", "c_acctbal").get
    val orders = Tables.table(spark, sfDir, "orders")
      .select(col("o_custkey").as("c_custkey"), col("o_totalprice"))
    // estimate accuracy: within the banded histogram's granularity
    val est = cat.estimateRange("scratch", "cbo_spec", "c_acctbal", 0.0, 1000.0).get
    val actual = cat.load("scratch", "cbo_spec")
      .where(col("c_acctbal") >= 0.0 && col("c_acctbal") < 1000.0).count()
    assert(math.abs(est - actual).toDouble <= math.max(0.25 * actual, n / 10.0),
      s"histogram estimate $est too far from actual $actual")
    // the SAME query routed both ways (threshold forced to each side):
    // identical results, opposite physical plans
    val (eB, rB, dfB) = cat.joinRouted("scratch", "cbo_spec", "c_acctbal",
      0.0, 1000.0, orders, "c_custkey", broadcastRowThreshold = Long.MaxValue)
    val (eS, rS, dfS) = cat.joinRouted("scratch", "cbo_spec", "c_acctbal",
      0.0, 1000.0, orders, "c_custkey", broadcastRowThreshold = 0L)
    assert(eB == eS && eB == est)
    assert(rB == "broadcast" && rS == "shuffle")
    val pB = planOf(dfB)
    val pS = planOf(dfS)
    assert(pB.contains("BroadcastHashJoin"),
      s"broadcast route did not plan BroadcastHashJoin:\n${pB.take(800)}")
    assert(pS.contains("SortMergeJoin") && !pS.contains("BroadcastHashJoin"),
      s"shuffle route did not pin SortMergeJoin:\n${pS.take(800)}")
    // order-invariant comparison: count + exact decimal sum (a raw double
    // sum is legitimately ordering-sensitive across different plans)
    val resB = dfB.agg(count(lit(1)), Tables.dsum(col("o_totalprice"))).head()
    val resS = dfS.agg(count(lit(1)), Tables.dsum(col("o_totalprice"))).head()
    assert(resB == resS, s"route changed the result: $resB vs $resS")
    // the sidecar-driven decision itself (the op's 20% threshold): narrow
    // range broadcasts, wide range shuffles — at this corpus's distribution
    val (_, routeN, _) = cat.joinRouted("scratch", "cbo_spec", "c_acctbal",
      0.0, 1000.0, orders, "c_custkey", n / 5)
    val (_, routeW, _) = cat.joinRouted("scratch", "cbo_spec", "c_acctbal",
      0.0, 8000.0, orders, "c_custkey", n / 5)
    assert(routeN == "broadcast" && routeW == "shuffle",
      s"sidecar routing decided ($routeN, $routeW)")
    cat.dropTable("scratch", "cbo_spec")
  }

  test("minhashArray (stateless projection) ≡ minhash aggregate, permutation-exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(61)
    val rows = (1L to 40L).map(d =>
      (d, Seq.fill(1 + rnd.nextInt(30))(rnd.nextLong()).distinct))
    val df = rows.toDF("doc_id", "hs")
    val viaArray = df
      .select(col("doc_id"), graft.functions.Poly.minhashArray(col("hs"), 128).as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaAgg = df.select(col("doc_id"), explode(col("hs")).as("h"))
      .groupBy("doc_id").agg(graft.functions.Poly.minhash(col("h"), 128).as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaArray.keySet == viaAgg.keySet)
    viaArray.foreach { case (d, m) =>
      assert(m == viaAgg(d), s"doc $d: projection minhash != aggregate minhash")
    }
  }

  test("s_ivf_rebalance: heavy-cell split improves balance and touches nothing else") {
    val rows = ops.Cluster.sIvfRebalance(spark, sfDir).collect()
    assert(rows.length == 9)
    val heavy = rows.head.getInt(3)
    val maxBefore = rows.head.getLong(4)
    // the split halves partition the heavy cell exactly
    val halves = rows.filter(_.getBoolean(2)).map(_.getLong(1))
    assert(halves.length == 2 && halves.sum == maxBefore,
      s"split halves ${halves.toSeq} do not partition the heavy cell ($maxBefore)")
    assert(halves.forall(_ > 0), "degenerate split: one empty half")
    // balance improved: the post-split max is strictly under the old max
    val maxAfter = rows.map(_.getLong(1)).max
    assert(maxAfter < maxBefore,
      s"rebalance did not reduce the max cell: $maxAfter vs $maxBefore")
    // incremental contract: every NON-split cell's census is exactly the
    // original assignment's (only the heavy cell's members were relabeled)
    val orig = ops.Cluster.sKmeansTrain(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    rows.filterNot(_.getBoolean(2)).foreach { r =>
      assert(orig.getOrElse(r.getInt(0), 0L) == r.getLong(1),
        s"non-split cell ${r.getInt(0)} changed")
    }
    assert(!rows.exists(r => r.getBoolean(2) && r.getInt(0) != heavy && r.getInt(0) != 8))
  }

  test("p_weighted_sample: A-ES keys are valid and weight-monotone; top-k pinned") {
    val rows = ops.Pipeline4.pWeightedSample(spark, sfDir).collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      val k = r.getDouble(3)
      assert(k > 0.0 && k < 1.0, s"A-ES key out of (0,1): $r")
    }
    // ordered by key descending with id tiebreak
    val keys = rows.map(r => (-r.getDouble(3), r.getLong(0))).toSeq
    assert(keys == keys.sorted, "sample not in key order")
    // monotonicity: for fixed u, a heavier doc's key u^(1/w) is never
    // smaller (the property that makes A-ES sample ∝ weight)
    val u = 0.37
    val k1 = math.pow(u, 1.0 / 100.0)
    val k2 = math.pow(u, 1.0 / 10000.0)
    assert(k2 > k1)
    // exact replay: top-100 from an independent in-memory recomputation
    val all = Tables.table(spark, sfDir, "documents")
      .select("doc_id", "n_chars").collect()
      .map { r =>
        val id = r.getLong(0); val w = r.getLong(1)
        val h = (BigInt(id) * BigInt(2654435761L) + 40503) % 1000003
        val uu = (h.toDouble + 1.0) / 1000004.0
        (id, math.pow(uu, 1.0 / w.toDouble))
      }.sortBy { case (id, k) => (-k, id) }.take(100).map(_._1).toSeq
    assert(rows.map(_.getLong(0)).toSeq == all,
      "Spark top-100 != in-memory A-ES replay")
  }

  test("ZoneMapPruneRule: bloom sidecar prunes scattered keys zone maps cannot") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val cat = new LakeCatalog(spark, scratch)
    import spark.implicits._
    cat.dropTable("scratch", "bp_spec")
    cat.createTable("scratch", "bp_spec", StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType))))
    // SCATTERED layout: round-robin repartition puts every file's k-bounds
    // across (nearly) the whole domain — zone maps are useless here
    cat.append("scratch", "bp_spec",
      (1L to 20000L).map(i => (i, i.toDouble)).toDF("k", "v").repartition(8))
    cat.recordBlooms("scratch", "bp_spec", "k")
    val dirPath = s"$scratch/scratch/bp_spec"
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.sparkPlan.collect {
        case s: FileSourceScanExec => s.relation.location.inputFiles.length
      }.sum
    val total = scannedFiles(spark.read.parquet(dirPath))
    // zone maps alone cannot prune this point lookup (bounds overlap)
    val (_, zoneDropped) = cat.pruneFiles("scratch", "bp_spec", "k", 42.0, 42.0)
    assert(zoneDropped.isEmpty,
      s"layout not scattered enough: zone maps pruned ${zoneDropped.size}")
    // the injected rule, via the bloom sidecar, prunes to ~1 file
    val ruled = spark.read.parquet(dirPath).where(col("k") === 42L)
    val n = scannedFiles(ruled)
    assert(n < total, s"bloom arm did not prune: $n of $total")
    assert(ruled.count() == 1L, "bloom pruning changed the result")
    // absent key: every file is a proven true negative (one kept survivor
    // by the rule's non-empty-scan contract), zero rows
    val absent = spark.read.parquet(dirPath).where(col("k") === 999999L)
    assert(scannedFiles(absent) == 1, "absent key should prune to the single kept survivor")
    assert(absent.count() == 0L)
    cat.dropTable("scratch", "bp_spec")
  }

  test("DIFF BRANCH: the WAP publish audit sees divergence through the gateway") {
    val wh = s"${System.getProperty("java.io.tmpdir")}/graft_gw_diff_wh"
    val dir = java.nio.file.Paths.get(wh)
    if (java.nio.file.Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      val w = java.nio.file.Files.walk(dir)
      try w.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
      finally w.close()
    }
    val cat = new LakeCatalog(spark, wh)
    val gw = new graft.catalog.SqlGateway(spark, cat)
    import spark.implicits._
    cat.createTable("scratch", "bd_spec", StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType))))
    cat.append("scratch", "bd_spec", Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"))
    cat.appendToBranch("scratch", "bd_spec", Seq((3L, 3.0)).toDF("k", "v"), "audit")
    cat.append("scratch", "bd_spec", Seq((4L, 4.0)).toDF("k", "v")) // diverge
    val rows = gw.execute("DIFF BRANCH audit IN scratch.bd_spec")
      .collect().map(r => (r.getAs[String]("_change"), r.getAs[Long]("k"))).sorted.toSeq
    // the audit's two findings: the branch ADDS k=3; a blind fast-forward
    // would LOSE main's post-fork k=4
    assert(rows == Seq(("delete", 4L), ("insert", 3L)), s"diff wrong: $rows")
    // against an explicit base equal to the branch itself: empty diff
    assert(gw.execute("DIFF BRANCH audit AGAINST audit IN scratch.bd_spec").count() == 0)
    cat.dropTable("scratch", "bd_spec")
  }

  test("mvMergeBatch: replays and stale batch ids are fenced; overwrite keeps history") {
    import graft.streaming.StreamOps4
    val cat = new LakeCatalog(spark, scratch)
    import spark.implicits._
    cat.dropTable("scratch", "mvf_spec")
    cat.createTable("scratch", "mvf_spec", StructType(Seq(
      StructField("cust_bucket", LongType), StructField("n", LongType),
      StructField("sum_state", DecimalType(30, 6)))))
    def mv(): Map[Long, (Long, java.math.BigDecimal)] =
      cat.load("scratch", "mvf_spec").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDecimal(2))).toMap
    val b1 = Seq((1L, 10.0), (2L, 20.0)).toDF("cust_bucket", "price")
    val b2 = Seq((1L, 5.0), (3L, 30.0)).toDF("cust_bucket", "price")
    StreamOps4.mvMergeBatch(b1, 1L, cat, "scratch", "mvf_spec")
    StreamOps4.mvMergeBatch(b2, 2L, cat, "scratch", "mvf_spec")
    val expect = mv()
    assert(expect(1L)._1 == 2 && expect(2L)._1 == 1 && expect(3L)._1 == 1)
    // replay of batch 2 and a STALE id (1) must both be skipped
    StreamOps4.mvMergeBatch(b2, 2L, cat, "scratch", "mvf_spec")
    StreamOps4.mvMergeBatch(b1, 1L, cat, "scratch", "mvf_spec")
    assert(mv() == expect, "replayed/stale batch mutated the MV")
    // overwrite kept history: the MV state after batch 1 is still readable
    // by time travel at its snapshot (create=v0, b1=v1, b2=v2)
    val v1 = cat.loadSnapshot("scratch", "mvf_spec", 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(v1 == Map(1L -> 1L, 2L -> 1L), s"time travel across overwrite broken: $v1")
    cat.dropTable("scratch", "mvf_spec")
  }

  test("r8 edge cases: empty-minhash contract, star-graph census, short-doc screen") {
    import spark.implicits._
    // minhashArray of an empty hash array = the aggregate's empty buffer
    // (all Long.MaxValue) — the documented signature-less-doc contract
    val empty = Seq((1L, Seq.empty[Long])).toDF("id", "hs")
      .select(graft.functions.Poly.minhashArray(col("hs"), 8))
      .head().getSeq[Long](0)
    assert(empty == Seq.fill(8)(Long.MaxValue))
    // a pure star (hub + leaves) has max wedges and ZERO triangles — the
    // exact shape the degree orientation exists for
    val star = (1L to 30L).map(l => (0L, l)).toDF("lo", "hi")
    val census = ops.Graph.triangleCensusOf(star).head()
    assert(census.getLong(3) == 0L, s"star graph counted triangles: $census")
    assert(census.getLong(2) == 30L * 29 / 2, "wedge count wrong on star")
    // a doc under 5 words emits no signature rows and therefore no screen
    // verdict (the documented no-evidence contract)
    val shortDoc = Seq((9L, "too short to shingle")).toDF("doc_id", "text")
    val idx = graft.streaming.StreamOps4.lshSigs(
      Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text"))
    assert(graft.streaming.StreamOps4.lshScreen(shortDoc, idx).count() == 0)
    // EXPLAIN ROUTE without a histogram: never guess small — shuffle
    val wh = s"${System.getProperty("java.io.tmpdir")}/graft_gw_route_wh"
    val dir = java.nio.file.Paths.get(wh)
    if (java.nio.file.Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      val w = java.nio.file.Files.walk(dir)
      try w.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
      finally w.close()
    }
    val cat = new LakeCatalog(spark, wh)
    val gw = new graft.catalog.SqlGateway(spark, cat)
    cat.createTable("scratch", "rt_spec", StructType(Seq(
      StructField("k", LongType))))
    cat.append("scratch", "rt_spec", (1L to 100L).toDF("k"))
    val r = gw.execute("EXPLAIN ROUTE scratch.rt_spec WHERE k >= 50").head()
    assert(r.getAs[String]("route").startsWith("shuffle (no"),
      s"missing-stats route not conservative: $r")
    cat.dropTable("scratch", "rt_spec")
  }

  test("gateway SELECT and INSERT are rename-aware across physical generations") {
    // dedicated warehouse: the gateway SELECT path registers a view for
    // EVERY catalog table, so the shared scratch warehouse's multi-format
    // debris would pollute this test
    val wh = s"${System.getProperty("java.io.tmpdir")}/graft_gw_rename_wh"
    val dir = java.nio.file.Paths.get(wh)
    if (java.nio.file.Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      val w = java.nio.file.Files.walk(dir)
      try w.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
      finally w.close()
    }
    val cat = new LakeCatalog(spark, wh)
    val gw = new graft.catalog.SqlGateway(spark, cat)
    import spark.implicits._
    cat.dropTable("scratch", "gr_spec")
    cat.createTable("scratch", "gr_spec", StructType(Seq(
      StructField("k", LongType), StructField("amount", DoubleType))))
    cat.append("scratch", "gr_spec", Seq((1L, 10.0), (2L, 20.0)).toDF("k", "amount"))
    gw.execute("ALTER TABLE scratch.gr_spec RENAME COLUMN amount TO amt")
    // SELECT immediately after the rename (no new append yet) resolves the
    // NEW name — pre-fix this failed outright
    val r0 = gw.execute("SELECT CAST(sum(amt) AS DOUBLE) AS s FROM scratch_gr_spec").head()
    assert(r0.getDouble(0) == 30.0, s"post-rename SELECT wrong: $r0")
    // INSERT under the new name lands in a new-generation file
    gw.execute("INSERT INTO scratch.gr_spec VALUES (3, 30.0)")
    val rows = gw.execute(
      "SELECT k, amt FROM scratch_gr_spec ORDER BY k").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows.forall(!_.isNullAt(1)),
      "renamed column NULL for one generation — mixed-schema read desynced")
    assert(rows.map(_.getDouble(1)).toSeq == Seq(10.0, 20.0, 30.0))
    cat.dropTable("scratch", "gr_spec")
  }
}
