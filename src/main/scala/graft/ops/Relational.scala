package graft.ops

import graft.Tables
import graft.Tables.{dsum, davg}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.2 Relational SQL suite — capability parity with the reference's
  * "scan table then run arbitrary DuckDB SQL" path
  * (reference: IcebergConnection.py:99-131), re-expressed as declarative
  * Spark plans so Catalyst gets pushdown / pruning / join selection.
  *
  * Scale notes are per-query in the Scaladoc; blanket rules in SURVEY.md §5.
  */
object Relational {

  /** TPC-H Q1-style grouped aggregate. Partial (map-side) aggregation over
    * 6 groups means shuffle traffic is O(partitions), not O(rows) — the plan
    * that survives 100 TB. Decimal-exact sums per SURVEY.md §4. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.table(spark, dir, "lineitem")
    l.filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)/COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)/COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(30,6))) AS DOUBLE)/COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
      |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Predicate + projection pushdown: both the filter and the 4-column
    * read-schema reach the parquet scan (verified in RelationalSpec via
    * the formatted plan's PushedFilters/ReadSchema). At 100 TB this is the
    * difference between reading 4 columns of a date slice and the whole table. */
  def qFilterProject(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "lineitem")
      .filter(col("l_shipdate").between(lit("1996-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp"))
        && col("l_discount") > 0.05 && col("l_quantity") < 10)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  val qFilterProjectSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
      |  AND l_discount > 0.05 AND l_quantity < 10
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** ORDER BY + LIMIT compiles to TakeOrderedAndProject: each partition keeps
    * its local top-k, driver merges k*partitions rows — no global sort at any
    * scale. Tie-broken on o_orderkey for determinism. */
  def qSortLimit(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)

  val qSortLimitSql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  /** DISTINCT = partial-aggregate dedup; 6 distinct pairs → map-side collapse,
    * near-zero shuffle. */
  def qDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "lineitem")
      .select("l_returnflag", "l_linestatus").distinct()
      .orderBy("l_returnflag", "l_linestatus")

  val qDistinctSql: String =
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY l_returnflag, l_linestatus"

  /** GROUP BY + HAVING: the HAVING predicate runs post-agg on ~|customers|
    * rows, already distributed by the group key. */
  def qAggHaving(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(dsum(col("o_totalprice")).as("total_spent"), count(lit(1)).as("n_orders"))
      .where(col("n_orders") >= 12)
      .orderBy("o_custkey")

  val qAggHavingSql: String =
    """SELECT o_custkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total_spent,
      |  COUNT(*) AS n_orders
      |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12 ORDER BY o_custkey""".stripMargin

  /** Scalar expression battery (CASE / string / date functions) — all
    * `org.apache.spark.sql.functions`, whole-stage-codegen'd; zero UDFs. */
  def qExprScalar(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        when(col("o_totalprice") > 200000, "big")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("small").as("size_class"),
        lower(substring(col("o_orderpriority"), 3, 100)).as("prio_word"),
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"),
        concat_ws("_", col("o_orderstatus"), col("o_orderpriority")).as("status_prio"),
        length(col("o_orderpriority")).as("prio_len"))
      .orderBy("o_orderkey")

  val qExprScalarSql: String =
    """SELECT o_orderkey,
      |  CASE WHEN o_totalprice > 200000 THEN 'big'
      |       WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS size_class,
      |  lower(substr(o_orderpriority, 3, 100)) AS prio_word,
      |  CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |  CAST(month(o_orderdate) AS INTEGER) AS o_month,
      |  concat_ws('_', o_orderstatus, o_orderpriority) AS status_prio,
      |  CAST(length(o_orderpriority) AS INTEGER) AS prio_len
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Fact ⋈ small dim with an explicit broadcast hint. The hinted side is
    * `nation` — a dim with a BOUNDED cardinality (25 rows at every scale
    * factor), which is the only kind of table an explicit broadcast hint is
    * safe for: hinting a linearly-growing table (customer, part) overrides
    * Catalyst's size check and OOMs at the 100 TB design point. The
    * customer scan stays shuffle-free; agg on 25 nations is map-side. */
  def qJoinBroadcast(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.table(spark, dir, "customer")
    val n = Tables.table(spark, dir, "nation").select("n_nationkey", "n_name")
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(dsum(col("c_acctbal")).as("total_bal"), count(lit(1)).as("n_cust"))
      .orderBy("n_name")
  }

  val qJoinBroadcastSql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE) AS total_bal,
      |  COUNT(*) AS n_cust
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Fact ⋈ fact join on the natural key. At bench scale AQE may elect a
    * broadcast — correct locally; at 100 TB both sides exceed the threshold
    * and this becomes a shuffle join co-partitioned on orderkey. No hint on
    * purpose: the optimizer must stay free to pick per-scale strategy. */
  def qJoinShuffle(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.table(spark, dir, "lineitem")
    val o = Tables.table(spark, dir, "orders").filter(col("o_orderstatus") === "F")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority")
  }

  val qJoinShuffleSql: String =
    """SELECT o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderstatus = 'F'
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q5-shaped 5-way star join. Only the BOUNDED dims (nation⋈region,
    * ≤25 rows forever) carry an explicit broadcast hint; customer and
    * supplier grow linearly with scale, so their join strategy is left to
    * the optimizer — AQE broadcasts them at small SF and falls back to
    * shuffle joins at 100 TB instead of OOMing on a forced broadcast. */
  def qJoinMultiway(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.table(spark, dir, "lineitem")
    val o = Tables.table(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val c = Tables.table(spark, dir, "customer").select("c_custkey", "c_nationkey")
    val s = Tables.table(spark, dir, "supplier").select("s_suppkey", "s_nationkey")
    val n = Tables.table(spark, dir, "nation")
    val r = Tables.table(spark, dir, "region").filter(col("r_name") === "ASIA")
    val nr = n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(s,
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nr), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy("n_name")
  }

  val qJoinMultiwaySql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** NOT EXISTS as a left-anti join — streams the probe side, never
    * materializes the negation. */
  def qSemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.table(spark, dir, "customer")
    val urgent = Tables.table(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    c.join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  val qSemiAntiSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  /** Top-3 orders per customer: rank window partitioned on the group key —
    * one shuffle on o_custkey, rank computed inside each partition. */
  def qWindowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.table(spark, dir, "orders")
      .withColumn("rnk", rank().over(w))
      .where(col("rnk") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
      .orderBy("o_custkey", "rnk", "o_orderkey")
  }

  val qWindowRankSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS INTEGER) AS rnk FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      |  FROM orders) WHERE rnk <= 3
      |ORDER BY o_custkey, rnk, o_orderkey""".stripMargin

  /** Running sum + lag over a per-customer frame. The running sum accumulates
    * in decimal so Spark's sequential frame evaluation and DuckDB's
    * segment-tree re-association produce identical bits (SURVEY.md §4). */
  def qWindowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    Tables.table(spark, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast("decimal(30,6)"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_spend"),
        (col("o_totalprice") - lag(col("o_totalprice"), 1).over(w)).as("delta_prev"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val qWindowRunningSql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
      |  o_totalprice - lag(o_totalprice, 1) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS delta_prev
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  /** ROLLUP: Spark expands grouping sets in one pass with partial agg.
    * NULLS FIRST pinned on both engines (DuckDB defaults NULLS LAST). */
  def qRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val qRollupSql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** GROUP BY CUBE — all four grouping-set combinations in one pass with
    * partial aggregation (Spark expands the sets before the single shuffle). */
  def qCube(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val qCubeSql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** UNION ALL of two grouped sides, labeled; unionByName keeps schema
    * alignment explicit. */
  def qUnionSet(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.table(spark, dir, "customer")
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n"))
      .select(lit("customer").as("side"), col("nationkey"), col("n"))
    val s = Tables.table(spark, dir, "supplier")
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n"))
      .select(lit("supplier").as("side"), col("nationkey"), col("n"))
    c.unionByName(s).orderBy("side", "nationkey")
  }

  val qUnionSetSql: String =
    """SELECT 'customer' AS side, c_nationkey AS nationkey, COUNT(*) AS n
      |  FROM customer GROUP BY c_nationkey
      |UNION ALL
      |SELECT 'supplier' AS side, s_nationkey AS nationkey, COUNT(*) AS n
      |  FROM supplier GROUP BY s_nationkey
      |ORDER BY side, nationkey""".stripMargin

  /** IN-subquery + scalar subquery via spark.sql — Catalyst rewrites the IN
    * to a left-semi join and the scalar agg to a broadcast of one row.
    * Exercises the reference's "hand the SQL string to the engine" surface
    * (IcebergConnection.py:113-120) on Spark's own parser. */
  def qSubqueryIn(spark: SparkSession, dir: String): DataFrame =
    Tables.sql(spark, dir,
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |  AND o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)/COUNT(*) FROM orders)
        |ORDER BY o_orderkey""".stripMargin)

  val qSubqueryInSql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      |  AND o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)/COUNT(*) FROM orders)
      |ORDER BY o_orderkey""".stripMargin

  /** Statistical aggregates; inherently floating → round(4) contract with the
    * oracle (SURVEY.md §4). All are single-pass partial-aggregatable. */
  def qStats(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "customer")
      .groupBy("c_mktsegment")
      .agg(
        round(stddev_samp(col("c_acctbal")), 4).as("sd_bal"),
        round(var_samp(col("c_acctbal")), 4).as("var_bal"),
        round(median(col("c_acctbal")), 4).as("med_bal"),
        round(corr(col("c_acctbal"), col("c_custkey")), 4).as("corr_bal_key"),
        count(lit(1)).as("n"))
      .orderBy("c_mktsegment")

  val qStatsSql: String =
    """SELECT c_mktsegment,
      |  round(stddev_samp(c_acctbal), 4) AS sd_bal,
      |  round(var_samp(c_acctbal), 4) AS var_bal,
      |  round(median(c_acctbal), 4) AS med_bal,
      |  round(corr(c_acctbal, c_custkey), 4) AS corr_bal_key,
      |  COUNT(*) AS n
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Pivot as conditional aggregation — one shuffle on the row key, each
    * status bucket a map-side SUM(CASE). Same text both engines, so the
    * oracle stays exact (DuckDB's native PIVOT has different output rules). */
  def qPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"),
        sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_o"),
        sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).as("n_p"))
      .orderBy("o_orderpriority")

  val qPivotSql: String =
    """SELECT o_orderpriority,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** HLL approx distinct next to the exact count. At 100 TB the HLL sketch
    * (fixed KB per group) replaces an exact distinct whose hash table would
    * not fit anywhere. RelationalSpec asserts relative error < 5% on the
    * raw estimates. */
  private[graft] def approxDistinctRaw(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
        countDistinct(col("l_orderkey")).as("exact_orders"))

  /** Driver-facing, SQL-HASH-GATED since r5 (VERDICT r4 task 8): the
    * Spark-specific HLL estimate can't be an output column (no engine
    * reproduces it), so the query emits the EXACT count (oracle-matched)
    * plus `within_bound` — the in-plan |approx−exact|/exact ≤ 5% check.
    * A drifting sketch flips the boolean and fails the hash compare, so
    * the approximation is oracle-gated, not merely spec-gated. */
  def qApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    approxDistinctRaw(spark, dir)
      .select(col("l_returnflag"), col("exact_orders"),
        (abs(col("approx_orders") - col("exact_orders")).cast("double")
          / col("exact_orders") <= 0.05).as("within_bound"))
      .orderBy("l_returnflag")

  val qApproxDistinctSql: String =
    """SELECT l_returnflag,
      |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
      |  true AS within_bound
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** JSON field extraction from events.props — get_json_object is codegen'd;
    * at scale prefer parsing once (from_json to a struct column) over
    * repeated path probes. */
  def qJsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
      .orderBy("event_type")

  val qJsonExtractSql: String =
    """SELECT event_type,
      |  CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
      |  COUNT(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Tumbling 5-minute windowed aggregate. events.ts is INT64-nanos parquet,
    * read as raw long nanos (spark.sql.legacy.parquet.nanosAsLong) so the
    * bucket key is exact integer arithmetic — bit-identical to the oracle's
    * epoch_ns path, no float time math anywhere (SURVEY.md §4).
    * Streaming twin: StreamOps.stWindowAgg. */
  def qEventsWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "events")
      .select(
        expr("ts div 300000000000 * 300").as("win_start"),
        col("event_type"), col("value"), col("user_id"))
      .groupBy("win_start", "event_type")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("win_start", "event_type")

  val qEventsWindowSql: String =
    """SELECT epoch_ns(ts)//300000000000*300 AS win_start, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin

  /** Sessionization: 30-min-gap split via lag + running sum of boundaries —
    * the classic two-window formulation; one shuffle on user_id, everything
    * else intra-partition. Streaming twin: StreamOps session windows. */
  def qSessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.table(spark, dir, "events")
      .withColumn("new_s",
        when(col("ts") - lag(col("ts"), 1).over(byUser) > 1800000000000L, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("new_s")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("session_value"))
      .orderBy("user_id", "session_id")
  }

  val qSessionizeSql: String =
    """WITH g AS (
      |  SELECT user_id, event_id, value, ts,
      |    CASE WHEN epoch_ns(ts) - epoch_ns(lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events),
      |s AS (
      |  SELECT user_id, value,
      |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM g)
      |SELECT user_id, session_id, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS session_value
      |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin

  /** As-of join: each purchase event matched to the user's latest view event
    * at-or-before it (the attribution join; Spark has no native ASOF).
    * Implemented as union + one window — NOT a range join: both sides
    * shuffle once on user_id, the "join" is a running last_value inside each
    * partition. At 100 TB this is the only formulation that doesn't explode:
    * an inequality join would be O(views × purchases) per user.
    * Oracle: DuckDB's native ASOF LEFT JOIN. */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.table(spark, dir, "events")
    val tagged = ev.where(col("event_type").isin("view", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"),
        // views sort before purchases at equal ts → "at-or-before" semantics
        when(col("event_type") === "view", 0).otherwise(1).as("side"))
    val w = Window.partitionBy("user_id").orderBy("ts", "side", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("view_ts", last(when(col("side") === 0, col("ts")), ignoreNulls = true).over(w))
      .where(col("side") === 1)
      // micro precision on output: DuckDB truncates parquet ns-timestamps to
      // µs, Spark keeps ns — emit both at µs (SURVEY.md §4)
      .select(col("event_id"), col("user_id"),
        expr("view_ts div 1000").as("view_ts_us"),
        expr("(ts div 1000) - (view_ts div 1000)").as("gap_us"))
      .orderBy("event_id")
  }

  val qAsofJoinSql: String =
    """SELECT p.event_id, p.user_id, epoch_us(v.ts) AS view_ts_us,
      |  epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON p.user_id = v.user_id AND p.ts >= v.ts
      |ORDER BY p.event_id""".stripMargin

  /** Salted two-stage aggregation — the skew-defeating pattern: stage 1
    * aggregates on (key, salt) spreading each hot key over 16 reducers;
    * stage 2 merges the 16 partials per key. Sums stay DECIMAL through both
    * stages (double partials would re-order). Result is bit-identical to the
    * direct aggregate — which is exactly what the oracle checks. */
  def qSkewSalted(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "events")
      .withColumn("salt", pmod(xxhash64(col("event_id")), lit(16)))
      .groupBy("event_type", "salt")
      .agg(count(lit(1)).as("pn"),
        sum(col("value").cast("decimal(30,6)")).as("psum"))
      .groupBy("event_type")
      .agg(sum(col("pn")).as("n"), sum(col("psum")).cast("double").as("sum_value"))
      .orderBy("event_type")

  val qSkewSaltedSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> (qAsofJoin _),
    "q_skew_salted" -> (qSkewSalted _),
    "q_cube" -> (qCube _),
    "q1_agg" -> (q1Agg _),
    "q_filter_project" -> (qFilterProject _),
    "q_sort_limit" -> (qSortLimit _),
    "q_distinct" -> (qDistinct _),
    "q_agg_having" -> (qAggHaving _),
    "q_expr_scalar" -> (qExprScalar _),
    "q_join_broadcast" -> (qJoinBroadcast _),
    "q_join_shuffle" -> (qJoinShuffle _),
    "q_join_multiway" -> (qJoinMultiway _),
    "q_semi_anti" -> (qSemiAnti _),
    "q_window_rank" -> (qWindowRank _),
    "q_window_running" -> (qWindowRunning _),
    "q_rollup" -> (qRollup _),
    "q_union_set" -> (qUnionSet _),
    "q_subquery_in" -> (qSubqueryIn _),
    "q_stats" -> (qStats _),
    "q_pivot" -> (qPivot _),
    "q_approx_distinct" -> (qApproxDistinct _),
    "q_json_extract" -> (qJsonExtract _),
    "q_events_window" -> (qEventsWindow _),
    "q_sessionize" -> (qSessionize _))

  val oracles: Map[String, String] = Map(
    "q_approx_distinct" -> qApproxDistinctSql,
    "q_asof_join" -> qAsofJoinSql,
    "q_skew_salted" -> qSkewSaltedSql,
    "q_cube" -> qCubeSql,
    "q1_agg" -> q1AggSql,
    "q_filter_project" -> qFilterProjectSql,
    "q_sort_limit" -> qSortLimitSql,
    "q_distinct" -> qDistinctSql,
    "q_agg_having" -> qAggHavingSql,
    "q_expr_scalar" -> qExprScalarSql,
    "q_join_broadcast" -> qJoinBroadcastSql,
    "q_join_shuffle" -> qJoinShuffleSql,
    "q_join_multiway" -> qJoinMultiwaySql,
    "q_semi_anti" -> qSemiAntiSql,
    "q_window_rank" -> qWindowRankSql,
    "q_window_running" -> qWindowRunningSql,
    "q_rollup" -> qRollupSql,
    "q_union_set" -> qUnionSetSql,
    "q_subquery_in" -> qSubqueryInSql,
    "q_stats" -> qStatsSql,
    "q_pivot" -> qPivotSql,
    "q_json_extract" -> qJsonExtractSql,
    "q_events_window" -> qEventsWindowSql,
    "q_sessionize" -> qSessionizeSql)
}
