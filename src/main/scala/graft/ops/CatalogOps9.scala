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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c_cbo_route" -> (cCboRoute _),
    "c_branch_diff" -> (cBranchDiff _))

  val oracles: Map[String, String] = Map(
    "c_cbo_route" -> cCboRouteSql,
    "c_branch_diff" -> cBranchDiffSql)
}
