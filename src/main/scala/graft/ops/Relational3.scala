package graft.ops

import graft.Tables
import graft.Tables.dsum
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.2 continued — analytic completeness batch: the window-function,
  * aggregate-function, date-function and regex-function families a DuckDB
  * user exercises daily, each as one oracle-matched operator. All pure
  * `functions._` column algebra (whole-stage codegen, no UDFs). */
object Relational3 {

  /** Window frames beyond rank/running: ntile, percent_rank, cume_dist,
    * nth_value, and a RANGE frame (trailing-30-day spend via integer-day
    * range). One shuffle on the partition key serves every frame. */
  def qWindowFrames(spark: SparkSession, dir: String): DataFrame = {
    val byCust = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val byCustDay = Window.partitionBy("o_custkey").orderBy(col("day"))
      .rangeBetween(-30, 0)
    Tables.table(spark, dir, "orders")
      .where(col("o_custkey") <= 300)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("o_orderdate"),
        datediff(col("o_orderdate"), lit("1990-01-01").cast("date")).as("day"))
      .select(col("o_custkey"), col("o_orderkey"),
        ntile(4).over(byCust).as("quartile"),
        round(percent_rank().over(byCust), 6).as("pct_rank"),
        round(cume_dist().over(byCust), 6).as("cdist"),
        nth_value(col("o_orderkey"), 2).over(
          Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
          .as("second_order"),
        dsumOver(col("o_totalprice"), byCustDay).as("trailing_30d"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Decimal-exact windowed sum (same rule as Tables.dsum, window form). */
  private def dsumOver(c: org.apache.spark.sql.Column, w: org.apache.spark.sql.expressions.WindowSpec) =
    sum(c.cast("decimal(30,6)")).over(w).cast("double")

  val qWindowFramesSql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
      |  round(percent_rank() OVER w, 6) AS pct_rank,
      |  round(cume_dist() OVER w, 6) AS cdist,
      |  nth_value(o_orderkey, 2) OVER
      |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_order,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) OVER
      |    (PARTITION BY o_custkey ORDER BY datediff('day', DATE '1990-01-01', o_orderdate)
      |     RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_30d
      |FROM orders WHERE o_custkey <= 300
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Aggregate-function extras: count_if, max_by/min_by (arg-extrema),
    * bool_or/bool_and, distinct counts — one partial-agg pass. max/min keys
    * are unique per group in this data (no arg-extrema tie ambiguity). */
  def qAggExtras(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        count_if(col("o_totalprice") > 150000).as("n_big"),
        max_by(col("o_orderkey"), col("o_totalprice")).as("priciest_order"),
        min_by(col("o_orderkey"), col("o_totalprice")).as("cheapest_order"),
        bool_or(col("o_orderstatus") === "F").as("any_f"),
        bool_and(col("o_totalprice") > 0).as("all_positive"),
        countDistinct(col("o_orderstatus")).as("n_statuses"))
      .orderBy("o_orderpriority")

  val qAggExtrasSql: String =
    """SELECT o_orderpriority,
      |  CAST(count_if(o_totalprice > 150000) AS BIGINT) AS n_big,
      |  arg_max(o_orderkey, o_totalprice) AS priciest_order,
      |  arg_min(o_orderkey, o_totalprice) AS cheapest_order,
      |  bool_or(o_orderstatus = 'F') AS any_f,
      |  bool_and(o_totalprice > 0) AS all_positive,
      |  CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Date-function family: trunc-to-month, last_day, add_months (both
    * engines clamp end-of-month), day diff, quarter, day-of-week
    * (normalized to Spark's 1=Sunday), ISO week. Dates rendered as strings
    * for engine-portable hashing. */
  def qDateSuite(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "lineitem")
      .where(col("l_orderkey") % 500 === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"),
        date_format(trunc(col("l_shipdate"), "month"), "yyyy-MM-dd").as("month_start"),
        date_format(last_day(col("l_shipdate")), "yyyy-MM-dd").as("month_end"),
        date_format(add_months(col("l_shipdate"), 3), "yyyy-MM-dd").as("plus_3mo"),
        datediff(col("l_shipdate"), lit("1995-01-01").cast("date")).as("days_since_95"),
        quarter(col("l_shipdate")).as("qtr"),
        dayofweek(col("l_shipdate")).as("dow"),
        weekofyear(col("l_shipdate")).as("iso_week"))
      .orderBy("l_orderkey", "l_linenumber")

  val qDateSuiteSql: String =
    """SELECT l_orderkey, l_linenumber,
      |  strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
      |  strftime(date_trunc('month', l_shipdate), '%Y-%m-%d') AS month_start,
      |  strftime(last_day(l_shipdate), '%Y-%m-%d') AS month_end,
      |  strftime(l_shipdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3mo,
      |  CAST(datediff('day', DATE '1995-01-01', l_shipdate) AS INTEGER) AS days_since_95,
      |  CAST(quarter(l_shipdate) AS INTEGER) AS qtr,
      |  CAST(dayofweek(l_shipdate) + 1 AS INTEGER) AS dow,
      |  CAST(weekofyear(l_shipdate) AS INTEGER) AS iso_week
      |FROM lineitem WHERE l_orderkey % 500 = 0
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Regex-function family over part names: extract, count, replace,
    * LIKE/ILIKE — RE2-and-Java-compatible patterns only (char classes,
    * quantifiers; no lookaround), so both engines agree. */
  def qRegexSuite(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "part")
      .where(col("p_partkey") % 50 === 0)
      .select(col("p_partkey"),
        regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"),
        regexp_count(col("p_name"), lit("[aeiou]")).as("n_vowels"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        col("p_name").like("%red%").as("has_red"),
        col("p_type").ilike("%BRUSHED%").as("is_brushed"))
      .orderBy("p_partkey")

  val qRegexSuiteSql: String =
    """SELECT p_partkey,
      |  regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
      |  CAST(length(regexp_extract_all(p_name, '[aeiou]')) AS INTEGER) AS n_vowels,
      |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
      |  p_name LIKE '%red%' AS has_red,
      |  p_type ILIKE '%BRUSHED%' AS is_brushed
      |FROM part WHERE p_partkey % 50 = 0 ORDER BY p_partkey""".stripMargin

  /** Approximate quantiles (Greenwald-Khanna sketch via percentile_approx)
    * per return flag — the mergeable-quantile-sketch family (HLL's
    * counterpart for order statistics). One partial-agg pass; sketches
    * merge across partitions, so no global sort at any scale.
    * Relational2Spec bounds the raw estimates against exact
    * percentile_cont. */
  private[graft] def approxQuantileRaw(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50"),
        percentile_approx(col("l_extendedprice"), lit(0.9), lit(10000)).as("p90"),
        percentile_approx(col("l_extendedprice"), lit(0.99), lit(10000)).as("p99"),
        count(lit(1)).as("n"))

  /** Driver-facing, SQL-HASH-GATED since r5 (VERDICT r4 task 8): the sketch
    * values are Spark-specific, so the query verifies them IN-PLAN by rank —
    * the estimates broadcast back onto the table and a second partial agg
    * counts rows ≤ each estimate; `ok_pXX` asserts the estimate's true rank
    * is within 1% of its target (GK guarantees 0.01% at accuracy 10⁴, so
    * the 1% gate only fails on a genuinely broken sketch — and then the
    * boolean flips and the hash compare fails). Output = exact group counts
    * + the three booleans, all oracle-reproducible. */
  def qApproxQuantile(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.table(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"))
    val est = approxQuantileRaw(spark, dir)
      .select("l_returnflag", "p50", "p90", "p99")
    li.join(broadcast(est), Seq("l_returnflag"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_extendedprice") <= col("p50"), 1L).otherwise(0L)).as("r50"),
        sum(when(col("l_extendedprice") <= col("p90"), 1L).otherwise(0L)).as("r90"),
        sum(when(col("l_extendedprice") <= col("p99"), 1L).otherwise(0L)).as("r99"))
      .select(col("l_returnflag"), col("n"),
        (abs(col("r50").cast("double") / col("n") - 0.5) <= 0.01).as("ok_p50"),
        (abs(col("r90").cast("double") / col("n") - 0.9) <= 0.01).as("ok_p90"),
        (abs(col("r99").cast("double") / col("n") - 0.99) <= 0.01).as("ok_p99"))
      .orderBy("l_returnflag")
  }

  val qApproxQuantileSql: String =
    """SELECT l_returnflag, COUNT(*) AS n,
      |  true AS ok_p50, true AS ok_p90, true AS ok_p99
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** UNPIVOT (wide → long), the inverse of q_pivot: per-order price/tax/
    * discount columns melted to (measure, value) rows via stack() — a
    * Generate in the scan stage, no shuffle until the consumer. */
  def qUnpivot(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "lineitem")
      .where(col("l_orderkey") % 1000 === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        expr("stack(3, 'price', l_extendedprice, 'discount', l_discount, 'tax', l_tax)")
          .as(Seq("measure", "value")))
      .orderBy("l_orderkey", "l_linenumber", "measure")

  val qUnpivotSql: String =
    """SELECT l_orderkey, l_linenumber, measure, value
      |FROM (
      |  UNPIVOT (SELECT l_orderkey, l_linenumber,
      |             l_extendedprice AS price, l_discount AS discount, l_tax AS tax
      |           FROM lineitem WHERE l_orderkey % 1000 = 0)
      |  ON price, discount, tax INTO NAME measure VALUE value)
      |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin

  /** Numeric histogram: fixed-width price buckets + per-bucket stats in one
    * partial-agg pass (bucket arithmetic is portable across engines;
    * width_bucket doesn't exist in DuckDB). */
  def qHistogram(spark: SparkSession, dir: String): DataFrame = {
    val bucket = least(floor(col("o_totalprice") / 50000).cast("int"), lit(9))
    Tables.table(spark, dir, "orders")
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"),
        round(min(col("o_totalprice")), 2).as("lo"),
        round(max(col("o_totalprice")), 2).as("hi"))
      .orderBy("bucket")
  }

  val qHistogramSql: String =
    """SELECT CAST(least(CAST(floor(o_totalprice / 50000) AS INTEGER), 9) AS INTEGER) AS bucket,
      |  COUNT(*) AS n, round(min(o_totalprice), 2) AS lo,
      |  round(max(o_totalprice), 2) AS hi
      |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin

  /** Typed JSON parsing: from_json with an explicit schema (the scale-safe
    * path — schema-on-read with no inference pass), grouped stats over the
    * extracted field. Complements q_json_extract's path-string API. */
  def qJsonTyped(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "events")
      .select(col("event_type"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.IntegerType)))).getField("k").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("k").cast("long")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy("event_type")

  val qJsonTypedSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS sum_k,
      |  min(CAST(props->>'$.k' AS INTEGER)) AS min_k,
      |  max(CAST(props->>'$.k' AS INTEGER)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** WITH RECURSIVE (new in Spark 4): hierarchy walk over the implicit
    * binary tree in customer keys (parent = key div 2), accumulating depth
    * and path balance from the root. Recursion executes as iterative
    * unions with AQE per step — each step is one distributed join, bounded
    * by the hierarchy depth (log₂ n), never row-by-row. */
  def qRecursive(spark: SparkSession, dir: String): DataFrame =
    // BROADCAST(chain): the recursive side is at most one tree level
    // (≤ depth·fanout rows) — broadcasting it makes every iteration a
    // single scan+BHJ stage instead of a per-level 32-partition shuffle
    // join; at depth d the recursion costs d broadcast joins total.
    Tables.sql(spark, dir,
      """WITH RECURSIVE chain AS (
        |  SELECT c_custkey AS key, 1 AS depth, c_acctbal AS path_bal
        |  FROM customer WHERE c_custkey = 1
        |  UNION ALL
        |  SELECT /*+ BROADCAST(chain) */
        |    c.c_custkey, chain.depth + 1, chain.path_bal + c.c_acctbal
        |  FROM customer c JOIN chain ON c.c_custkey div 2 = chain.key
        |  WHERE c.c_custkey <= 200 AND c.c_custkey > 1)
        |SELECT key, CAST(depth AS INT) AS depth, round(path_bal, 2) AS path_bal
        |FROM chain ORDER BY key""".stripMargin)

  val qRecursiveSql: String =
    """WITH RECURSIVE chain AS (
      |  SELECT c_custkey AS key, 1 AS depth, c_acctbal AS path_bal
      |  FROM customer WHERE c_custkey = 1
      |  UNION ALL
      |  SELECT c.c_custkey, chain.depth + 1, chain.path_bal + c.c_acctbal
      |  FROM customer c JOIN chain ON c.c_custkey // 2 = chain.key
      |  WHERE c.c_custkey <= 200 AND c.c_custkey > 1)
      |SELECT key, CAST(depth AS INT) AS depth, round(path_bal, 2) AS path_bal
      |FROM chain ORDER BY key""".stripMargin

  /** Correlated LATERAL subquery join — top-2 orders per customer in the
    * join-operator form (vs q_window_rank's window form). Catalyst
    * decorrelates the LATERAL into a ranked join (window over the order
    * side + join), so execution is one shuffle on the correlation key —
    * per-row subquery execution never happens. */
  def qLateralCorr(spark: SparkSession, dir: String): DataFrame =
    // The explicit `o_custkey <= 500` inside the lateral is REDUNDANT
    // (implied by o_custkey = c_custkey ∧ c_custkey <= 500) but
    // plan-critical: Catalyst does not infer it through the decorrelated
    // window, and without it the window ranks EVERY customer's orders
    // before the join throws 99.5% of them away — at 100 TB that's ranking
    // the whole orders table for a 500-key probe. With it, the predicate
    // reaches the orders parquet scan (PushedFilters), pinned by
    // Relational2Spec.
    Tables.sql(spark, dir,
      """SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
        |FROM customer c
        |JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c.c_custkey AND o_custkey <= 500
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |WHERE c.c_custkey <= 500
        |ORDER BY c.c_custkey, o.o_orderkey""".stripMargin)

  val qLateralCorrSql: String =
    """SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
      |FROM customer c, LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_custkey = c.c_custkey AND o_custkey <= 500
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
      |WHERE c.c_custkey <= 500
      |ORDER BY c.c_custkey, o.o_orderkey""".stripMargin

  /** NULL-semantics suite — the three-valued-logic corners every SQL
    * engine must agree on, exercised on synthesized NULLs (the test data
    * has none): a nullable GROUP BY key (the NULL group must survive
    * hashing identically), COUNT(*) vs COUNT(col), IS NOT DISTINCT FROM
    * (null-safe equality), SUM over an all/partially-NULL expression, and
    * the classic `NOT IN (subquery with a NULL)` trap — three-valued logic
    * makes it empty, and Spark plans it as a null-aware anti join (a
    * broadcast, never a cartesian). Spark side runs the same SQL text via
    * spark.sql, so the parser/analyzer path is exercised too. */
  private val qNullSuiteText =
    """WITH c AS (
      |  SELECT nullif(c_mktsegment, 'BUILDING') AS seg, c_custkey, c_acctbal
      |  FROM customer),
      |ni AS (
      |  SELECT COUNT(*) AS n_notin FROM c
      |  WHERE c_custkey NOT IN (SELECT nullif(c_custkey, c_custkey) FROM c))
      |SELECT seg,
      |  COUNT(*) AS n_rows,
      |  COUNT(seg) AS n_nonnull,
      |  CAST(COUNT(CASE WHEN seg IS NULL THEN 1 END) AS BIGINT) AS n_null,
      |  coalesce(seg, 'NONE') AS seg_filled,
      |  CAST(COUNT(CASE WHEN seg IS NOT DISTINCT FROM 'AUTOMOBILE' THEN 1 END) AS BIGINT) AS n_nullsafe_auto,
      |  CAST(SUM(CASE WHEN seg IS NULL THEN c_custkey END) AS BIGINT) AS nullgrp_keysum,
      |  max(n_notin) AS n_notin_with_null
      |FROM c CROSS JOIN ni
      |GROUP BY seg ORDER BY seg""".stripMargin

  def qNullSuite(spark: SparkSession, dir: String): DataFrame =
    Tables.sql(spark, dir,
      // Spark's COUNT already returns BIGINT; the casts are harmless no-ops
      qNullSuiteText)

  val qNullSuiteSql: String = qNullSuiteText
    .replace("COUNT(*) AS n_rows", "CAST(COUNT(*) AS BIGINT) AS n_rows")
    .replace("COUNT(seg) AS n_nonnull", "CAST(COUNT(seg) AS BIGINT) AS n_nonnull")
    .replace("COUNT(*) AS n_notin", "CAST(COUNT(*) AS BIGINT) AS n_notin")

  /** Grouped ordinary least squares (r6): price-on-quantity regression per
    * return flag from the closed-form normal equations — ONE map-side-
    * combined aggregate computing the six power sums (n, Σx, Σy, Σx²,
    * Σxy, Σy²), then slope/intercept/r² as pure driver-free arithmetic on
    * the 3 group rows. The sums are decimal-accumulated (§4 rule: fp
    * reordering across partitions must not leak into the model), so the
    * fitted coefficients are bit-identical on any partitioning and replay
    * exactly in DuckDB. This is the in-plan shape model-fitting takes at
    * 100 TB: sufficient statistics shuffle, never rows. */
  def qLinreg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.table(spark, dir, "lineitem")
      .select(col("l_returnflag").as("grp"),
        col("l_quantity").cast("double").as("x"),
        col("l_extendedprice").cast("double").as("y"))
    li.groupBy("grp").agg(
        count(lit(1)).cast("double").as("n"),
        Tables.dsum(col("x")).as("sx"),
        Tables.dsum(col("y")).as("sy"),
        Tables.dsum(col("x") * col("x")).as("sxx"),
        Tables.dsum(col("x") * col("y")).as("sxy"),
        Tables.dsum(col("y") * col("y")).as("syy"))
      .select(col("grp"), col("n"), col("sx"), col("sy"), col("sxx"),
        col("sxy"), col("syy"),
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx"))).as("m"))
      .select(col("grp"), col("n").cast("long").as("n_rows"),
        round(col("m"), 6).as("slope"),
        round((col("sy") - col("m") * col("sx")) / col("n"), 6).as("intercept"),
        round(((col("n") * col("sxy") - col("sx") * col("sy"))
            * (col("n") * col("sxy") - col("sx") * col("sy"))) /
          ((col("n") * col("sxx") - col("sx") * col("sx"))
            * (col("n") * col("syy") - col("sy") * col("sy"))), 6).as("r2"))
      .orderBy("grp")
  }

  val qLinregSql: String =
    """WITH a AS (
      |  SELECT l_returnflag AS grp,
      |    CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(CAST(CAST(l_quantity AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(CAST(l_extendedprice AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(CAST(l_quantity AS DOUBLE) * CAST(l_extendedprice AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE) AS sxy,
      |    CAST(SUM(CAST(CAST(l_extendedprice AS DOUBLE) * CAST(l_extendedprice AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE) AS syy
      |  FROM lineitem GROUP BY 1),
      |b AS (
      |  SELECT grp, n, sx, sy, sxx, sxy, syy,
      |    (n*sxy - sx*sy) / (n*sxx - sx*sx) AS m
      |  FROM a)
      |SELECT grp, CAST(n AS BIGINT) AS n_rows,
      |  round(m, 6) AS slope,
      |  round((sy - m*sx) / n, 6) AS intercept,
      |  round(((n*sxy - sx*sy) * (n*sxy - sx*sy))
      |        / ((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) AS r2
      |FROM b ORDER BY grp""".stripMargin

  /** Pairwise Pearson correlation matrix (r6) over three lineitem measures
    * — same sufficient-statistics shape as [[qLinreg]]: ONE map-side-
    * combined aggregate of the ten power sums, then every pairwise r as
    * arithmetic over the single result row (exploded to tidy pair rows
    * in-plan). At 100 TB a d-column correlation matrix is exactly this:
    * one pass, d(d+3)/2 decimal sums shuffled, never rows. */
  def qCorrMatrix(spark: SparkSession, dir: String): DataFrame = {
    // fanout (r13): the ten decimal power sums are the map-side cost and a
    // single-file scan serialized them onto one core (measured: one 2.54 s
    // task = the whole query). Decimal sums are order-independent, so the
    // round-robin spread changes nothing but the parallelism.
    val li = Tables.fanout(Tables.table(spark, dir, "lineitem")
      .select(col("l_quantity").cast("double").as("q"),
        col("l_extendedprice").cast("double").as("p"),
        col("l_discount").cast("double").as("d")))
    val a = li.agg(
      count(lit(1)).cast("double").as("n"),
      Tables.dsum(col("q")).as("sq"), Tables.dsum(col("p")).as("sp"),
      Tables.dsum(col("d")).as("sd"),
      Tables.dsum(col("q") * col("q")).as("sqq"),
      Tables.dsum(col("p") * col("p")).as("spp"),
      Tables.dsum(col("d") * col("d")).as("sdd"),
      Tables.dsum(col("q") * col("p")).as("sqp"),
      Tables.dsum(col("q") * col("d")).as("sqd"),
      Tables.dsum(col("p") * col("d")).as("spd"))
    def r(sa: String, sb: String, saa: String, sbb: String, sab: String) =
      round((col("n") * col(sab) - col(sa) * col(sb)) /
        sqrt((col("n") * col(saa) - col(sa) * col(sa))
          * (col("n") * col(sbb) - col(sb) * col(sb))), 6)
    a.select(explode(array(
        struct(lit("discount").as("var_a"), lit("extendedprice").as("var_b"),
          r("sd", "sp", "sdd", "spp", "spd").as("corr")),
        struct(lit("discount").as("var_a"), lit("quantity").as("var_b"),
          r("sd", "sq", "sdd", "sqq", "sqd").as("corr")),
        struct(lit("extendedprice").as("var_a"), lit("quantity").as("var_b"),
          r("sp", "sq", "spp", "sqq", "sqp").as("corr")))).as("x"))
      .select(col("x.var_a"), col("x.var_b"), col("x.corr"))
      .orderBy("var_a", "var_b")
  }

  val qCorrMatrixSql: String =
    """WITH a AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(CAST(CAST(l_quantity AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE) AS sq,
      |    CAST(SUM(CAST(CAST(l_extendedprice AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE) AS sp,
      |    CAST(SUM(CAST(CAST(l_discount AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE) AS sd,
      |    CAST(SUM(CAST(CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE) AS sqq,
      |    CAST(SUM(CAST(CAST(l_extendedprice AS DOUBLE) * CAST(l_extendedprice AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE) AS spp,
      |    CAST(SUM(CAST(CAST(l_discount AS DOUBLE) * CAST(l_discount AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE) AS sdd,
      |    CAST(SUM(CAST(CAST(l_quantity AS DOUBLE) * CAST(l_extendedprice AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE) AS sqp,
      |    CAST(SUM(CAST(CAST(l_quantity AS DOUBLE) * CAST(l_discount AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE) AS sqd,
      |    CAST(SUM(CAST(CAST(l_extendedprice AS DOUBLE) * CAST(l_discount AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE) AS spd
      |  FROM lineitem)
      |SELECT var_a, var_b, corr FROM (
      |  SELECT 'discount' AS var_a, 'extendedprice' AS var_b,
      |    round((n*spd - sd*sp) / sqrt((n*sdd - sd*sd) * (n*spp - sp*sp)), 6) AS corr
      |  FROM a
      |  UNION ALL
      |  SELECT 'discount', 'quantity',
      |    round((n*sqd - sd*sq) / sqrt((n*sdd - sd*sd) * (n*sqq - sq*sq)), 6)
      |  FROM a
      |  UNION ALL
      |  SELECT 'extendedprice', 'quantity',
      |    round((n*sqp - sp*sq) / sqrt((n*spp - sp*sp) * (n*sqq - sq*sq)), 6)
      |  FROM a)
      |ORDER BY var_a, var_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_corr_matrix" -> (qCorrMatrix _),
    "q_linreg" -> (qLinreg _),
    "q_null_suite" -> (qNullSuite _),
    "q_lateral_corr" -> (qLateralCorr _),
    "q_recursive" -> (qRecursive _),
    "q_json_typed" -> (qJsonTyped _),
    "q_histogram" -> (qHistogram _),
    "q_unpivot" -> (qUnpivot _),
    "q_window_frames" -> (qWindowFrames _),
    "q_agg_extras" -> (qAggExtras _),
    "q_date_suite" -> (qDateSuite _),
    "q_regex_suite" -> (qRegexSuite _),
    "q_approx_quantile" -> (qApproxQuantile _))

  val oracles: Map[String, String] = Map(
    "q_corr_matrix" -> qCorrMatrixSql,
    "q_linreg" -> qLinregSql,
    "q_null_suite" -> qNullSuiteSql,
    "q_lateral_corr" -> qLateralCorrSql,
    "q_recursive" -> qRecursiveSql,
    "q_json_typed" -> qJsonTypedSql,
    "q_histogram" -> qHistogramSql,
    "q_unpivot" -> qUnpivotSql,
    "q_window_frames" -> qWindowFramesSql,
    "q_agg_extras" -> qAggExtrasSql,
    "q_date_suite" -> qDateSuiteSql,
    "q_regex_suite" -> qRegexSuiteSql,
    "q_approx_quantile" -> qApproxQuantileSql)
}
