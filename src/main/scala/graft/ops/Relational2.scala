package graft.ops

import graft.Tables
import graft.Tables.{davg, dsum}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.2 continued — round-2 relational additions: set operations, grouping
  * sets, full outer join, lateral explode, banded range join, time-series
  * gap fill, correlated scalar subquery, ordered array aggregation.
  *
  * Same contract as [[Relational]]: every operator is a declarative plan
  * (Catalyst owns pushdown/join selection) with a DuckDB oracle.
  */
object Relational2 {

  /** INTERSECT + EXCEPT in one result (tagged union). Both compile to
    * aggregate-based set ops (hash-partitioned on the full row), not joins —
    * shuffle is one pass over each input at any scale. */
  def qIntersectExcept(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.table(spark, dir, "orders")
    val f = o.where(col("o_orderstatus") === "F").select(col("o_custkey"))
    val oo = o.where(col("o_orderstatus") === "O").select(col("o_custkey"))
    f.intersect(oo).select(lit("both").as("tag"), col("o_custkey"))
      .unionByName(f.except(oo).select(lit("only_f").as("tag"), col("o_custkey")))
      .orderBy("tag", "o_custkey")
  }

  val qIntersectExceptSql: String =
    """SELECT 'both' AS tag, o_custkey FROM
      |  (SELECT o_custkey FROM orders WHERE o_orderstatus='F'
      |   INTERSECT
      |   SELECT o_custkey FROM orders WHERE o_orderstatus='O')
      |UNION ALL
      |SELECT 'only_f' AS tag, o_custkey FROM
      |  (SELECT o_custkey FROM orders WHERE o_orderstatus='F'
      |   EXCEPT
      |   SELECT o_custkey FROM orders WHERE o_orderstatus='O')
      |ORDER BY tag, o_custkey""".stripMargin

  /** GROUP BY GROUPING SETS with grouping() indicators — the general form
    * of rollup/cube (already covered) where the application picks exactly
    * which aggregation levels it wants; all levels are computed in ONE
    * partial-agg pass (Expand + HashAggregate), not one job per level. */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.sql(spark, dir,
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_prio,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)

  val qGroupingSetsSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
      |  CAST(grouping(o_orderpriority) AS INT) AS g_prio,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** FULL OUTER join of two per-customer year slices — the join type the
    * suite was missing (inner/semi/anti/left covered). Shuffle hash/SMJ on
    * o_custkey; COALESCE reconciles the key. */
  def qFullOuter(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.table(spark, dir, "orders")
    def yearAgg(y: Int) = o.where(year(col("o_orderdate")) === y)
      .groupBy("o_custkey")
      .agg(dsum(col("o_totalprice")).as(s"spent_$y"), count(lit(1)).as(s"n_$y"))
    yearAgg(1994).as("a")
      .join(yearAgg(1995).as("b"),
        col("a.o_custkey") === col("b.o_custkey"), "full_outer")
      .select(
        coalesce(col("a.o_custkey"), col("b.o_custkey")).as("custkey"),
        coalesce(col("spent_1994"), lit(0d)).as("spent_1994"),
        coalesce(col("n_1994"), lit(0L)).as("n_1994"),
        coalesce(col("spent_1995"), lit(0d)).as("spent_1995"),
        coalesce(col("n_1995"), lit(0L)).as("n_1995"))
      .orderBy("custkey")
  }

  val qFullOuterSql: String =
    """WITH a AS (
      |  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS spent_1994,
      |         COUNT(*) AS n_1994
      |  FROM orders WHERE year(o_orderdate)=1994 GROUP BY o_custkey),
      |b AS (
      |  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS spent_1995,
      |         COUNT(*) AS n_1995
      |  FROM orders WHERE year(o_orderdate)=1995 GROUP BY o_custkey)
      |SELECT COALESCE(a.o_custkey, b.o_custkey) AS custkey,
      |  COALESCE(spent_1994, 0) AS spent_1994, COALESCE(n_1994, 0) AS n_1994,
      |  COALESCE(spent_1995, 0) AS spent_1995, COALESCE(n_1995, 0) AS n_1995
      |FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
      |ORDER BY custkey""".stripMargin

  /** LATERAL VIEW / UNNEST: explode the words of p_type per part and
    * aggregate — the row-generating operator class. The explode runs inside
    * the scan stage (no shuffle until the aggregate), and the aggregate is
    * partial: shuffle carries one row per (word), not per (part, word). */
  def qLateralExplode(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "part")
      .select(col("p_partkey"), explode(split(col("p_type"), " ")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("n_parts"), countDistinct(col("p_partkey")).as("n_distinct"))
      .orderBy("word")

  val qLateralExplodeSql: String =
    """SELECT word, COUNT(*) AS n_parts,
      |  CAST(COUNT(DISTINCT p_partkey) AS BIGINT) AS n_distinct
      |FROM (SELECT p_partkey, unnest(string_split(p_type, ' ')) AS word FROM part)
      |GROUP BY word ORDER BY word""".stripMargin

  /** Banded range join — the scale-safe plan for pure interval joins (no
    * equi key): probes (every 200th event) match events within ±2 minutes.
    * Timestamps are bucketed into 2-minute bins; a probe explodes to its
    * bin±1, the join runs on the BIN as an equi key, and the exact |Δt|
    * predicate filters inside the hash join. Cost: |probes|×3 bin rows
    * joined against a bin-partitioned corpus — never the O(n²) cross
    * product a naive inequality join degenerates to (Spark would pick
    * BroadcastNestedLoopJoin). The 2-min bin = the band width, so every
    * true match shares a bin with the probe (lossless). */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val binNs = 120_000_000_000L // 2 minutes in nanos (ts is raw long nanos)
    // integer `div`, never `/`: ts ≈ 1.7e18 exceeds double's 53-bit mantissa,
    // so a float division here would mis-bucket boundary rows
    val e = Tables.table(spark, dir, "events")
      .select(col("event_id"), col("ts"), col("value"),
        expr(s"ts div ${binNs}L").as("bin"))
    val probes = e.where(col("event_id") % 200 === 0)
      .select(col("event_id").as("p_id"), col("ts").as("p_ts"),
        explode(array(col("bin") - 1, col("bin"), col("bin") + 1)).as("bin"))
    probes.join(e, Seq("bin"))
      .where(abs(col("ts") - col("p_ts")) <= binNs && col("event_id") =!= col("p_id"))
      .groupBy("p_id")
      .agg(count(lit(1)).as("n_near"), dsum(col("value")).as("sum_near"))
      .orderBy("p_id")
  }

  val qRangeJoinSql: String =
    """SELECT p.event_id AS p_id, COUNT(*) AS n_near,
      |  CAST(SUM(CAST(e.value AS DECIMAL(30,6))) AS DOUBLE) AS sum_near
      |FROM events p JOIN events e
      |  ON abs(epoch_ns(e.ts) - epoch_ns(p.ts)) <= 120000000000
      | AND e.event_id <> p.event_id
      |WHERE p.event_id % 200 = 0
      |GROUP BY p.event_id ORDER BY p_id""".stripMargin

  /** Time-series gap fill: daily event counts with missing days emitted as
    * zero rows. The day spine is generated IN-PLAN (sequence over the
    * min/max aggregate — one tiny broadcast row), left-joined to the daily
    * aggregate: no driver-side date loop, no collect. */
  def qTimeGapfill(spark: SparkSession, dir: String): DataFrame = {
    val dayNs = 86_400_000_000_000L
    val e = Tables.table(spark, dir, "events")
      .where(col("event_type") === "signup")
      .select(expr(s"ts div ${dayNs}L").as("day"), col("value"))
    val daily = e.groupBy("day")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
    val spine = Tables.table(spark, dir, "events")
      .agg(min(expr(s"ts div ${dayNs}L")).as("d0"),
        max(expr(s"ts div ${dayNs}L")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    spine.join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sum_value"), lit(0d)).as("sum_value"))
      .orderBy("day")
  }

  val qTimeGapfillSql: String =
    """WITH bounds AS (
      |  SELECT CAST(min(epoch_ns(ts)) // 86400000000000 AS BIGINT) AS d0,
      |         CAST(max(epoch_ns(ts)) // 86400000000000 AS BIGINT) AS d1
      |  FROM events),
      |spine AS (
      |  SELECT unnest(generate_series(d0, d1)) AS day FROM bounds),
      |daily AS (
      |  SELECT CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day,
      |         COUNT(*) AS n,
      |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
      |  FROM events WHERE event_type = 'signup' GROUP BY 1)
      |SELECT spine.day AS day, COALESCE(n, 0) AS n,
      |       COALESCE(sum_value, 0) AS sum_value
      |FROM spine LEFT JOIN daily ON spine.day = daily.day
      |ORDER BY day""".stripMargin

  /** Correlated scalar subquery (customers above their nation's average
    * balance). Spark-first shape: the per-nation average is a tiny
    * aggregate broadcast back to the customer scan — exactly what Catalyst
    * rewrites the correlated form into, made explicit. One scan of
    * customer feeds both sides (plan reuse), zero shuffles of the fact. */
  def qScalarCorrelated(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.table(spark, dir, "customer")
    val natAvg = c.groupBy("c_nationkey")
      .agg(davg(col("c_acctbal")).as("nation_avg"))
    c.join(broadcast(natAvg), Seq("c_nationkey"))
      .where(col("c_acctbal") > col("nation_avg"))
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
        round(col("nation_avg"), 4).as("nation_avg"))
      .orderBy("c_custkey")
  }

  val qScalarCorrelatedSql: String =
    """WITH na AS (
      |  SELECT c_nationkey,
      |    CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE)/COUNT(*) AS nation_avg
      |  FROM customer GROUP BY c_nationkey)
      |SELECT c.c_custkey, c.c_nationkey, c.c_acctbal,
      |  round(na.nation_avg, 4) AS nation_avg
      |FROM customer c JOIN na ON c.c_nationkey = na.c_nationkey
      |WHERE c.c_acctbal > na.nation_avg
      |ORDER BY c.c_custkey""".stripMargin

  /** Ordered array aggregation rendered portably: per order, item count +
    * the sorted partkey list as CSV (engine-portable string; raw array
    * columns don't hash stably across engines). collect_list + array_sort
    * is a single partial-aggregate pass. */
  def qArrayAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "lineitem")
      .where(col("l_orderkey") % 100 === 0)
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_items"),
        // numeric sort FIRST, then stringify — a string sort would order
        // "10" before "9" and diverge from the oracle's ORDER BY l_partkey
        expr("concat_ws(',', transform(array_sort(collect_list(l_partkey)), x -> cast(x AS STRING)))")
          .as("partkeys"))
      .orderBy("l_orderkey")

  val qArrayAggSql: String =
    """SELECT l_orderkey, COUNT(*) AS n_items,
      |  string_agg(CAST(l_partkey AS VARCHAR), ',' ORDER BY l_partkey) AS partkeys
      |FROM lineitem WHERE l_orderkey % 100 = 0
      |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_intersect_except" -> (qIntersectExcept _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_full_outer" -> (qFullOuter _),
    "q_lateral_explode" -> (qLateralExplode _),
    "q_range_join" -> (qRangeJoin _),
    "q_time_gapfill" -> (qTimeGapfill _),
    "q_scalar_correlated" -> (qScalarCorrelated _),
    "q_array_agg" -> (qArrayAgg _))

  val oracles: Map[String, String] = Map(
    "q_intersect_except" -> qIntersectExceptSql,
    "q_grouping_sets" -> qGroupingSetsSql,
    "q_full_outer" -> qFullOuterSql,
    "q_lateral_explode" -> qLateralExplodeSql,
    "q_range_join" -> qRangeJoinSql,
    "q_time_gapfill" -> qTimeGapfillSql,
    "q_scalar_correlated" -> qScalarCorrelatedSql,
    "q_array_agg" -> qArrayAggSql)
}
