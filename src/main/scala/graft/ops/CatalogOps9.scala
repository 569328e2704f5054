package graft.ops

import graft.Tables
import graft.catalog.LakeCatalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.1 round-8: cost-based join routing — the op that turns the stats
  * sidecars (c_stats_analyze row counts, c_stats_histogram range
  * selectivity) from telemetry into a PLANNING input. Until now every
  * broadcast-vs-shuffle choice in the surface was an authored hint; this
  * is the first choice the CATALOG makes, from its own metadata, before
  * anything is scanned.
  *
  * Reference capability anchor: entirely outside the reference (its scan
  * is an unconditional full-table read, IcebergConnection.py:99-131);
  * this is the Iceberg-stats → engine-CBO integration story at 100 TB.
  */
object CatalogOps9 {

  private def scratch: String =
    s"${System.getProperty("java.io.tmpdir")}/graft_warehouse"

  /** Two routed probes against the same analyzed dimension table
    * ([[LakeCatalog.joinRouted]]): a NARROW balance range whose histogram
    * estimate lands under the threshold (→ the build side broadcasts) and
    * a WIDE range whose estimate lands over it (→ merge-join shuffle).
    * The threshold itself comes from the stats sidecar (20% of the
    * analyzed row count), so the whole decision chain — row count,
    * selectivity, route — is metadata-driven and SCALE-INVARIANT (both
    * estimate and threshold scale linearly with the data, the ratio is
    * pinned by the balance distribution). The chosen route strings are
    * part of the hashed output: a wrong routing decision at any scale
    * factor fails the gate, not just a spec. Results are route-invariant
    * by construction (Round8Spec proves plan shape + result identity on
    * both sides of the threshold). */
  def cCboRoute(spark: SparkSession, dir: String): DataFrame = {
    val cat = new LakeCatalog(spark, scratch)
    cat.dropTable("scratch", "cust_cbo")
    cat.createTable("scratch", "cust_cbo", StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_acctbal", DoubleType))))
    cat.append("scratch", "cust_cbo",
      Tables.table(spark, dir, "customer").select(col("c_custkey"), col("c_acctbal")))
    cat.analyzeTable("scratch", "cust_cbo", Seq("c_acctbal"))
    cat.analyzeHistogram("scratch", "cust_cbo", "c_acctbal")
    val n = cat.statsRowCount("scratch", "cust_cbo", "c_acctbal")
      .getOrElse(sys.error("stats sidecar missing after ANALYZE"))
    val thr = n / 5 // broadcast iff the estimate keeps <= 20% of the dim
    val orders = Tables.table(spark, dir, "orders")
      .select(col("o_custkey").as("c_custkey"), col("o_totalprice"))
    // ~9% of the uniform [-999.99, 9999.99] balance domain → broadcast
    val (estN, routeN, dfN) = cat.joinRouted("scratch", "cust_cbo",
      "c_acctbal", 0.0, 1000.0, orders, "c_custkey", thr)
    // ~73% of the domain → shuffle
    val (estW, routeW, dfW) = cat.joinRouted("scratch", "cust_cbo",
      "c_acctbal", 0.0, 8000.0, orders, "c_custkey", thr)
    val aggN = dfN.agg(count(lit(1)).as("rows_narrow"),
      Tables.dsum(col("o_totalprice")).as("rev_narrow"))
    val aggW = dfW.agg(count(lit(1)).as("rows_wide"),
      Tables.dsum(col("o_totalprice")).as("rev_wide"))
    aggN.crossJoin(broadcast(aggW))
      .select(
        lit(routeN).as("route_narrow"), col("rows_narrow"), col("rev_narrow"),
        lit(routeW).as("route_wide"), col("rows_wide"), col("rev_wide"),
        lit(estN < estW).as("estimates_ordered"))
  }

  val cCboRouteSql: String =
    """SELECT
      |  'broadcast' AS route_narrow,
      |  (SELECT COUNT(*) FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |   WHERE c.c_acctbal >= 0.0 AND c.c_acctbal < 1000.0) AS rows_narrow,
      |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
      |   FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |   WHERE c.c_acctbal >= 0.0 AND c.c_acctbal < 1000.0) AS rev_narrow,
      |  'shuffle' AS route_wide,
      |  (SELECT COUNT(*) FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |   WHERE c.c_acctbal >= 0.0 AND c.c_acctbal < 8000.0) AS rows_wide,
      |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
      |   FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |   WHERE c.c_acctbal >= 0.0 AND c.c_acctbal < 8000.0) AS rev_wide,
      |  true AS estimates_ordered""".stripMargin

  /** The r8 op above proves the ROUTING MATH; this one proves the PLANNER
    * USES IT ([[graft.plans.CboRouteRule]], VERDICT r8 "What's wrong" #2):
    * two plain gateway SELECTs — no author hints anywhere — join a probe
    * table against the analyzed dimension under a narrow and a wide balance
    * predicate, and the physical join strategy each ACTUALLY PLANS is read
    * back from its executed plan and carried in the hashed output. Narrow
    * (est ≈ 9% of rows < 20% threshold) must plan BroadcastHashJoin; wide
    * (est ≈ 73%) must plan SortMergeJoin — the latter is the sharp half of
    * the proof, because at test scale Spark's own size guess would happily
    * broadcast the whole dimension: only the injected rule's SHUFFLE_MERGE
    * pin explains a shuffle there. `decisions_agree` additionally pins that
    * the recorded planner decisions match what EXPLAIN ROUTE reports from
    * the same sidecars (single decision function, CboRouteRule.routeOf).
    * Results are route-invariant; both aggregates hash-gate against the
    * direct DuckDB join. */
  def cCboPlanner(spark: SparkSession, dir: String): DataFrame = {
    import graft.plans.CboRouteRule
    // dedicated warehouse: the gateway SELECT path registers a view per
    // catalog table, and the SHARED scratch warehouse accumulates dozens
    // from other ops — 2 SELECTs × ~40 loadRenamed footer reads measured
    // 16 s warm at sf0.1. The op's own two tables keep registration O(1).
    val cat = new LakeCatalog(spark,
      s"${System.getProperty("java.io.tmpdir")}/graft_cbop_wh")
    val gw = new graft.catalog.SqlGateway(spark, cat)
    cat.dropTable("scratch", "cust_cbop")
    cat.createTable("scratch", "cust_cbop", StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_acctbal", DoubleType))))
    cat.append("scratch", "cust_cbop",
      Tables.table(spark, dir, "customer").select(col("c_custkey"), col("c_acctbal")))
    cat.analyzeTable("scratch", "cust_cbop", Seq("c_acctbal"))
    cat.analyzeHistogram("scratch", "cust_cbop", "c_acctbal")
    cat.dropTable("scratch", "ord_cbop")
    cat.createTable("scratch", "ord_cbop", StructType(Seq(
      StructField("o_custkey", LongType),
      StructField("o_totalprice", DoubleType))))
    cat.append("scratch", "ord_cbop",
      Tables.table(spark, dir, "orders").select(col("o_custkey"), col("o_totalprice")))
    def probe(hi: Double): (DataFrame, String) = {
      val df = gw.execute(
        s"""SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS rev
           |FROM ord_cbop o JOIN cust_cbop c ON c.c_custkey = o.o_custkey
           |WHERE c.c_acctbal >= 0.0 AND c.c_acctbal < $hi""".stripMargin)
      val plan = df.queryExecution.executedPlan.toString
      val strat =
        if (plan.contains("BroadcastHashJoin")) "broadcast"
        else if (plan.contains("SortMergeJoin")) "shuffle" else "other"
      (df, strat)
    }
    CboRouteRule.clearApplied()
    val (dfN, stratN) = probe(1000.0)
    val (dfW, stratW) = probe(8000.0)
    // the decisions the planner recorded vs the verb's report — same
    // sidecars, same routeOf, must agree
    val routesTaken = CboRouteRule.lastApplied.map(d => (d.column, d.route)).distinct
    val explained = Seq(1000.0, 8000.0).map { hi =>
      gw.execute(s"EXPLAIN ROUTE scratch.cust_cbop WHERE c_acctbal >= 0.0 AND c_acctbal < $hi")
        .select("route").head().getString(0)
    }
    val agree = routesTaken.toSet == Set(("c_acctbal", "broadcast"), ("c_acctbal", "shuffle")) &&
      explained == Seq("broadcast", "shuffle")
    dfN.select(col("n").as("rows_narrow"), col("rev").as("rev_narrow"))
      .crossJoin(broadcast(dfW.select(col("n").as("rows_wide"), col("rev").as("rev_wide"))))
      .select(
        lit(stratN).as("planned_narrow"), col("rows_narrow"), col("rev_narrow"),
        lit(stratW).as("planned_wide"), col("rows_wide"), col("rev_wide"),
        lit(agree).as("decisions_agree"))
  }

  val cCboPlannerSql: String =
    """SELECT
      |  'broadcast' AS planned_narrow,
      |  (SELECT COUNT(*) FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |   WHERE c.c_acctbal >= 0.0 AND c.c_acctbal < 1000.0) AS rows_narrow,
      |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
      |   FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |   WHERE c.c_acctbal >= 0.0 AND c.c_acctbal < 1000.0) AS rev_narrow,
      |  'shuffle' AS planned_wide,
      |  (SELECT COUNT(*) FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |   WHERE c.c_acctbal >= 0.0 AND c.c_acctbal < 8000.0) AS rows_wide,
      |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
      |   FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |   WHERE c.c_acctbal >= 0.0 AND c.c_acctbal < 8000.0) AS rev_wide,
      |  true AS decisions_agree""".stripMargin

  /** Stale-statistics extrapolation (r9 — the CBO-hygiene hole every
    * append-heavy dimension falls into: ANALYZE ran yesterday, the table
    * doubled overnight, and a "small" filtered build side quietly isn't).
    * [[LakeCatalog.estimateRange]] scales its histogram estimate by
    * (current manifest rows / analyzed rows) — both metadata — so absolute
    * estimates track growth without a re-ANALYZE. The op pins the behavior
    * end-to-end: ANALYZE on HALF of customer, route a fixed-absolute-
    * threshold probe (broadcast — the slice fits the budget), then append
    * the second half WITHOUT re-analyzing and route the SAME probe again —
    * the extrapolated estimate (~2×) now exceeds the absolute budget and
    * the route flips to shuffle. An unscaled (stale) estimate would keep
    * broadcasting the doubled slice — the silent OOM-at-100 TB this
    * closes. The threshold sits at 1.5× the pre-growth estimate, so the
    * flip is scale-factor-invariant by construction; both probes'
    * aggregates hash-gate against the direct joins, and est_doubled pins
    * the extrapolation factor (within banded-histogram rounding). */
  def cCboStale(spark: SparkSession, dir: String): DataFrame = {
    val cat = new LakeCatalog(spark, scratch)
    cat.dropTable("scratch", "cust_stale")
    cat.createTable("scratch", "cust_stale", StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_acctbal", DoubleType))))
    val c = Tables.table(spark, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"))
    cat.append("scratch", "cust_stale", c.where(col("c_custkey") % 2 === 0))
    cat.analyzeTable("scratch", "cust_stale", Seq("c_acctbal"))
    cat.analyzeHistogram("scratch", "cust_stale", "c_acctbal")
    val probe = Tables.table(spark, dir, "orders")
      .select(col("o_custkey").as("c_custkey"), col("o_totalprice"))
    val estBefore = cat.estimateRange("scratch", "cust_stale", "c_acctbal", 0.0, 1000.0)
      .getOrElse(sys.error("histogram missing after ANALYZE"))
    val thr = estBefore * 3 / 2 // a fixed ABSOLUTE broadcast budget
    val (_, routeBefore, dfBefore) = cat.joinRouted("scratch", "cust_stale",
      "c_acctbal", 0.0, 1000.0, probe, "c_custkey", thr)
    val aggBefore = dfBefore.agg(count(lit(1)).as("rows_before"),
      Tables.dsum(col("o_totalprice")).as("rev_before"))
    // the table doubles; the histogram is NOT re-analyzed
    cat.append("scratch", "cust_stale", c.where(col("c_custkey") % 2 === 1))
    val estAfter = cat.estimateRange("scratch", "cust_stale", "c_acctbal", 0.0, 1000.0)
      .getOrElse(sys.error("histogram missing"))
    val (_, routeAfter, dfAfter) = cat.joinRouted("scratch", "cust_stale",
      "c_acctbal", 0.0, 1000.0, probe, "c_custkey", thr)
    val aggAfter = dfAfter.agg(count(lit(1)).as("rows_after"),
      Tables.dsum(col("o_totalprice")).as("rev_after"))
    // extrapolation factor ≈ current/analyzed = 2 (± banded rounding)
    val estDoubled = estAfter >= estBefore * 19 / 10 && estAfter <= estBefore * 21 / 10
    aggBefore.crossJoin(broadcast(aggAfter))
      .select(
        lit(routeBefore).as("route_before"), col("rows_before"), col("rev_before"),
        lit(routeAfter).as("route_after"), col("rows_after"), col("rev_after"),
        lit(estDoubled).as("est_doubled"))
  }

  val cCboStaleSql: String =
    """SELECT
      |  'broadcast' AS route_before,
      |  (SELECT COUNT(*) FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |   WHERE c.c_custkey % 2 = 0 AND c.c_acctbal >= 0.0 AND c.c_acctbal < 1000.0) AS rows_before,
      |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
      |   FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |   WHERE c.c_custkey % 2 = 0 AND c.c_acctbal >= 0.0 AND c.c_acctbal < 1000.0) AS rev_before,
      |  'shuffle' AS route_after,
      |  (SELECT COUNT(*) FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |   WHERE c.c_acctbal >= 0.0 AND c.c_acctbal < 1000.0) AS rows_after,
      |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
      |   FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |   WHERE c.c_acctbal >= 0.0 AND c.c_acctbal < 1000.0) AS rev_after,
      |  true AS est_doubled""".stripMargin

  /** String-keyed bloom skipping (r9 — c_bloom_skip's sibling for the key
    * class zone maps can NEVER answer): `c_name` point lookups over a
    * table clustered on `c_acctbal`. Zone maps only cover numeric columns,
    * and a string key's file placement is uncorrelated with any numeric
    * clustering — doc ids, urls, uuids at 100 TB. The index
    * ([[LakeCatalog.recordBlooms]]) hashes strings through the PORTABLE
    * scalar polyhash and tags its lines "vtype":"s"; probes re-hash their
    * literal the same way ([[LakeCatalog.bloomPruneString]]) and a vtype
    * mismatch must-scans (soundness never rests on guessing the key
    * normalization). Probe 1: the first customer's name (present — the
    * clustered layout puts it in a strict file subset); probe 2: an absent
    * name (every file a true negative). The aggregate is computed FROM the
    * bloom-pruned scan, so prune soundness is hash-gated, not asserted.
    *
    * ORACLE CONTRACT (the c_bloom_skip discipline): `8 AS files_total` =
    * the numFiles below; `8 AS absent_skip_margin` requires all 8 files to
    * true-negative the absent name — recordBlooms' 32-bits-per-key sizing
    * pins the per-file FP rate ≈ 2e-4 at any scale; `true AS
    * bloom_effective` = clustering scatters ~one name per file subset.
    * Verified empirically at sf0.001/0.01/0.1; re-derive if the recipe
    * changes. */
  def cBloomString(spark: SparkSession, dir: String): DataFrame = {
    val cat = new LakeCatalog(spark, scratch)
    val c = Tables.table(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    cat.dropTable("scratch", "cust_sbloom")
    cat.createTable("scratch", "cust_sbloom", StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType),
      StructField("c_acctbal", DoubleType))),
      sortOrder = Seq("c_acctbal asc"))
    cat.appendClustered("scratch", "cust_sbloom", c, Seq("c_acctbal"), numFiles = 8)
    cat.recordBlooms("scratch", "cust_sbloom", "c_name")
    // deterministic, SQL-expressible probe: the minimum custkey's name
    val probe = c.orderBy("c_custkey").select("c_name").limit(1)
      .collect()(0).getString(0) // one scalar — metadata-scale
    val (readP, skipP) = cat.bloomPruneString("scratch", "cust_sbloom", "c_name", probe)
    val (readA, skipA) = cat.bloomPruneString("scratch", "cust_sbloom", "c_name",
      "Customer#no-such-row")
    cat.loadBloomPrunedString("scratch", "cust_sbloom", "c_name", probe)
      .where(col("c_name") === probe) // row-level predicate still applies
      .agg(count(lit(1)).as("n"),
        Tables.dsum(col("c_acctbal")).as("bal"),
        lit(readP.size + skipP.size).as("files_total"),
        lit(skipA.size - readA.size).as("absent_skip_margin"),
        lit(skipP.nonEmpty).as("bloom_effective"))
  }

  val cBloomStringSql: String =
    """WITH probe AS (
      |  SELECT c_name FROM customer ORDER BY c_custkey LIMIT 1)
      |SELECT COUNT(*) AS n,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE) AS bal,
      |  8 AS files_total, 8 AS absent_skip_margin, true AS bloom_effective
      |FROM customer JOIN probe USING (c_name)""".stripMargin

  /** WAP audit diff on a DIVERGED table ([[LakeCatalog.branchDiff]]): the
    * base slice lands on main, the next ingest is staged on an `audit`
    * branch, and main then moves forward independently — the exact state
    * where a blind FAST FORWARD is dangerous. The diff (branch vs main's
    * CURRENT head) answers the publish audit in one row-level report:
    * `insert` = what the branch adds, `delete` = what main gained since
    * the fork and a fast-forward would LOSE (the case CHERRY PICK exists
    * for). Only divergence files are read (the changes() contract); the
    * op hash-gates per-change counts and decimal sums against the
    * generating lineitem slices. */
  def cBranchDiff(spark: SparkSession, dir: String): DataFrame = {
    val cat = new LakeCatalog(spark, scratch)
    val li = Tables.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"))
    cat.dropTable("scratch", "li_bdiff")
    cat.createTable("scratch", "li_bdiff", StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_extendedprice", DoubleType))))
    cat.append("scratch", "li_bdiff", li.where(col("l_orderkey") % 4 === 0))
    cat.appendToBranch("scratch", "li_bdiff",
      li.where(col("l_orderkey") % 4 === 1), "audit")
    // main diverges AFTER the branch forked
    cat.append("scratch", "li_bdiff", li.where(col("l_orderkey") % 4 === 2))
    cat.branchDiff("scratch", "li_bdiff", "audit")
      .groupBy("_change")
      .agg(count(lit(1)).as("n_rows"),
        Tables.dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy("_change")
  }

  val cBranchDiffSql: String =
    """SELECT chg AS "_change", CAST(n AS BIGINT) AS n_rows, s AS sum_price
      |FROM (
      |  SELECT 'delete' AS chg, COUNT(*) AS n,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS s
      |  FROM lineitem WHERE l_orderkey % 4 = 2
      |  UNION ALL
      |  SELECT 'insert', COUNT(*),
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
      |  FROM lineitem WHERE l_orderkey % 4 = 1)
      |ORDER BY chg""".stripMargin

  /** SEMI/ANTI routing (r10 — [[graft.plans.CboRouteRule]] extended past
    * INNER equi-joins): a hint-free IN-subquery is the single most common
    * filtered-dimension probe a gateway user writes, and Catalyst rewrites
    * it to a LeftSemi join only in the late RewriteSubquery batch — AFTER
    * the operator-optimization fixpoint where injected rules run. The rule
    * therefore routes the subquery while it is STILL a ListQuery/Exists
    * expression: both classes carry the hint slot the rewrite copies into
    * the join's rightHint (the mechanism authored BROADCAST subquery
    * hints ride), so one injected rule covers every session — including
    * spark.newSession() clones, which PartitionInvarianceSpec pins. The op
    * issues a narrow and a wide IN-subquery SELECT — no hints anywhere —
    * and reads the strategy each ACTUALLY PLANNED from its executed plan:
    * narrow must broadcast the subquery side, wide must plan SortMergeJoin
    * (the sharp half — at test scale Spark's size guess would broadcast
    * both; only the rule's SHUFFLE_MERGE pin explains a shuffle). A NOT IN
    * anti probe rides the same sidecar decision. Counts hash-gate against
    * DuckDB's direct semi/anti joins; results are route-invariant by
    * construction. */
  def cCboSemijoin(spark: SparkSession, dir: String): DataFrame = {
    // dedicated warehouse: gateway SELECTs register a view per catalog
    // table (the c_cbo_planner 16 s lesson — PROFILE_r09)
    val cat = new LakeCatalog(spark,
      s"${System.getProperty("java.io.tmpdir")}/graft_cbosj_wh")
    val gw = new graft.catalog.SqlGateway(spark, cat)
    cat.dropTable("scratch", "cust_cbosj")
    cat.createTable("scratch", "cust_cbosj", StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_acctbal", DoubleType))))
    cat.append("scratch", "cust_cbosj",
      Tables.table(spark, dir, "customer").select(col("c_custkey"), col("c_acctbal")))
    cat.analyzeTable("scratch", "cust_cbosj", Seq("c_acctbal"))
    cat.analyzeHistogram("scratch", "cust_cbosj", "c_acctbal")
    cat.dropTable("scratch", "ord_cbosj")
    cat.createTable("scratch", "ord_cbosj", StructType(Seq(
      StructField("o_custkey", LongType))))
    cat.append("scratch", "ord_cbosj",
      Tables.table(spark, dir, "orders").select(col("o_custkey")))
    def probe(op: String, hi: Double): (DataFrame, String) = {
      val df = gw.execute(
        s"""SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ord_cbosj
           |WHERE o_custkey $op (SELECT c_custkey FROM cust_cbosj
           |  WHERE c_acctbal >= 0.0 AND c_acctbal < $hi)""".stripMargin)
      val plan = df.queryExecution.executedPlan.toString
      val strat =
        if (plan.contains("BroadcastHashJoin")) "broadcast"
        else if (plan.contains("SortMergeJoin")) "shuffle" else "other"
      (df, strat)
    }
    val (dfN, stratN) = probe("IN", 1000.0)
    val (dfW, stratW) = probe("IN", 8000.0)
    val (dfA, stratA) = probe("NOT IN", 1000.0)
    dfN.select(col("n").as("rows_narrow"))
      .crossJoin(broadcast(dfW.select(col("n").as("rows_wide"))))
      .crossJoin(broadcast(dfA.select(col("n").as("rows_anti"))))
      .select(
        lit(stratN).as("planned_narrow"), col("rows_narrow"),
        lit(stratW).as("planned_wide"), col("rows_wide"),
        lit(stratA).as("planned_anti"), col("rows_anti"))
  }

  val cCboSemijoinSql: String =
    """SELECT
      |  'broadcast' AS planned_narrow,
      |  (SELECT COUNT(*) FROM orders WHERE o_custkey IN
      |    (SELECT c_custkey FROM customer
      |     WHERE c_acctbal >= 0.0 AND c_acctbal < 1000.0)) AS rows_narrow,
      |  'shuffle' AS planned_wide,
      |  (SELECT COUNT(*) FROM orders WHERE o_custkey IN
      |    (SELECT c_custkey FROM customer
      |     WHERE c_acctbal >= 0.0 AND c_acctbal < 8000.0)) AS rows_wide,
      |  'broadcast' AS planned_anti,
      |  (SELECT COUNT(*) FROM orders WHERE o_custkey NOT IN
      |    (SELECT c_custkey FROM customer
      |     WHERE c_acctbal >= 0.0 AND c_acctbal < 1000.0)) AS rows_anti""".stripMargin

  /** Auto stats refresh under NON-proportional growth (r10 — the stats
    * lifecycle's last gap): c_cbo_stale proved extrapolation keeps
    * estimates honest under PROPORTIONAL growth; this op constructs the
    * growth shape extrapolation CANNOT see — a skewed append concentrating
    * entirely in the probed range — and proves MAINTAIN STATS
    * ([[LakeCatalog.refreshStatsIfStale]]) repairs it. ANALYZE runs on the
    * even half; the append adds the odd half PLUS the odd in-range rows
    * twice more (factor ≈ 2.2 — over the 150% refresh trigger; in-range
    * mass ≈ 1.8× what uniform extrapolation predicts). The stale route at
    * a 1.25×-stale-estimate threshold is broadcast (the under-estimate);
    * after the refresh the fresh histogram sees the true mass and the SAME
    * threshold routes shuffle — at 100 TB that under-estimate is a forced
    * broadcast of a dimension sliver that quietly tripled. Both routed
    * aggregates hash-gate against the direct join over the identical
    * table content (routes are content-invariant); est_grew pins the
    * estimate movement. */
  def cStatsRefresh(spark: SparkSession, dir: String): DataFrame = {
    val cat = new LakeCatalog(spark, scratch)
    cat.dropTable("scratch", "cust_refresh")
    cat.createTable("scratch", "cust_refresh", StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_acctbal", DoubleType))))
    val c = Tables.table(spark, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"))
    cat.append("scratch", "cust_refresh", c.where(col("c_custkey") % 2 === 0))
    cat.analyzeTable("scratch", "cust_refresh", Seq("c_acctbal"))
    cat.analyzeHistogram("scratch", "cust_refresh", "c_acctbal")
    // NON-proportional growth: the odd half plus its in-range rows twice
    // more — the probed range grows ~3x while the table grows ~2.2x
    val odd = c.where(col("c_custkey") % 2 === 1)
    val oddInRange = odd.where(col("c_acctbal") >= 0.0 && col("c_acctbal") < 1000.0)
    cat.append("scratch", "cust_refresh",
      odd.unionByName(oddInRange).unionByName(oddInRange))
    val probe = Tables.table(spark, dir, "orders")
      .select(col("o_custkey").as("c_custkey"), col("o_totalprice"))
    val estStale = cat.estimateRange("scratch", "cust_refresh", "c_acctbal", 0.0, 1000.0)
      .getOrElse(sys.error("histogram missing after ANALYZE"))
    val thr = estStale * 5 / 4
    val (_, routeStale, dfStale) = cat.joinRouted("scratch", "cust_refresh",
      "c_acctbal", 0.0, 1000.0, probe, "c_custkey", thr)
    val aggStale = dfStale.agg(count(lit(1)).as("rows_stale"),
      Tables.dsum(col("o_totalprice")).as("rev_stale"))
    val refreshed = cat.refreshStatsIfStale("scratch", "cust_refresh", 150)
    val estFresh = cat.estimateRange("scratch", "cust_refresh", "c_acctbal", 0.0, 1000.0)
      .getOrElse(sys.error("histogram missing after refresh"))
    val (_, routeFresh, dfFresh) = cat.joinRouted("scratch", "cust_refresh",
      "c_acctbal", 0.0, 1000.0, probe, "c_custkey", thr)
    val aggFresh = dfFresh.agg(count(lit(1)).as("rows_fresh"),
      Tables.dsum(col("o_totalprice")).as("rev_fresh"))
    aggStale.crossJoin(broadcast(aggFresh))
      .select(
        lit(routeStale).as("route_stale"), col("rows_stale"), col("rev_stale"),
        lit(refreshed).as("refreshed"),
        lit(routeFresh).as("route_fresh"), col("rows_fresh"), col("rev_fresh"),
        lit(estFresh > estStale).as("est_grew"))
  }

  val cStatsRefreshSql: String =
    """WITH grown AS (
      |  SELECT c_custkey, c_acctbal FROM customer
      |  UNION ALL
      |  SELECT c_custkey, c_acctbal FROM customer
      |  WHERE c_custkey % 2 = 1 AND c_acctbal >= 0.0 AND c_acctbal < 1000.0
      |  UNION ALL
      |  SELECT c_custkey, c_acctbal FROM customer
      |  WHERE c_custkey % 2 = 1 AND c_acctbal >= 0.0 AND c_acctbal < 1000.0),
      |j AS (
      |  SELECT o.o_totalprice FROM orders o JOIN grown c
      |    ON c.c_custkey = o.o_custkey
      |  WHERE c.c_acctbal >= 0.0 AND c.c_acctbal < 1000.0)
      |SELECT
      |  'broadcast' AS route_stale,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM j) AS rows_stale,
      |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) FROM j) AS rev_stale,
      |  true AS refreshed,
      |  'shuffle' AS route_fresh,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM j) AS rows_fresh,
      |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) FROM j) AS rev_fresh,
      |  true AS est_grew""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c_cbo_route" -> (cCboRoute _),
    "c_cbo_planner" -> (cCboPlanner _),
    "c_cbo_stale" -> (cCboStale _),
    "c_cbo_semijoin" -> (cCboSemijoin _),
    "c_stats_refresh" -> (cStatsRefresh _),
    "c_bloom_string" -> (cBloomString _),
    "c_branch_diff" -> (cBranchDiff _))

  val oracles: Map[String, String] = Map(
    "c_cbo_route" -> cCboRouteSql,
    "c_cbo_planner" -> cCboPlannerSql,
    "c_cbo_stale" -> cCboStaleSql,
    "c_cbo_semijoin" -> cCboSemijoinSql,
    "c_stats_refresh" -> cStatsRefreshSql,
    "c_bloom_string" -> cBloomStringSql,
    "c_branch_diff" -> cBranchDiffSql)
}
