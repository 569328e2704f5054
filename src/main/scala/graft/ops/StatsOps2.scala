package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.2 round-7 closing batch: time-series relationships BETWEEN series.
  * q_autocorr measures a series against its own past; nothing yet measured
  * one operational series against another — the "does ordering lead
  * shipping, and by how many days?" question every ops dashboard answers
  * with a lagged cross-correlation function (CCF).
  *
  * Reference capability anchor: multi-series analysis is outside the
  * reference's single-table SELECT (IcebergConnection.py:99-131); same
  * classical-statistics family as q_autocorr/q_spearman (StatsOps).
  */
object StatsOps2 {

  /** Lead/lag cross-correlation between the DAILY ORDER COUNT (orders,
    * o_orderdate) and the DAILY SHIPMENT COUNT (lineitem, l_shipdate) at
    * signed lags −3..+3: r(lag) = corr(orders_t, ships_{t+lag}), so
    * positive lags measure "orders lead shipments". Both series reduce to
    * day-grain counts first (two map-side-combined aggregates — the only
    * table-scale work), then the CCF is a bounded-fan range join: each
    * day row meets the 7-row broadcast lag grid, pairs land on an integer
    * equi-join key (day + lag), and the per-lag moments are exact
    * DECIMAL(38,0) sums (HUGEINT in the oracle — daily counts are
    * volume-scale, so Σx² clears BIGINT past ~sf1) — one IEEE divide at
    * the end per the q_autocorr discipline, so
    * both engines emit bit-identical doubles. Scale shape: day-grain
    * series are ~table_span rows regardless of data size; everything
    * after the first aggregates is day-scale × 7. */
  def qXcorr(spark: SparkSession, dir: String): DataFrame = {
    val x = Tables.table(spark, dir, "orders")
      .select(expr("datediff(cast(o_orderdate as date), date '1970-01-01')").cast("long").as("day"))
      .groupBy("day").agg(count(lit(1)).as("x"))
    val y = Tables.table(spark, dir, "lineitem")
      .select(expr("datediff(cast(l_shipdate as date), date '1970-01-01')").cast("long").as("yday"))
      .groupBy("yday").agg(count(lit(1)).as("y"))
    val grid = spark.range(-3, 4).select(col("id").as("lag"))
    // DECIMAL(38,0) ↔ HUGEINT moments: daily counts are volume-scale, so
    // Σx² clears BIGINT past ~sf1 (the q_spearman escalation class, r8)
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    x.crossJoin(broadcast(grid))
      .join(y, col("day") + col("lag") === col("yday"))
      .groupBy("lag")
      .agg(count(lit(1)).as("n_pairs"),
        sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("x")) * col("y")).as("sxy"),
        sum(dec(col("x")) * col("x")).as("sxx"),
        sum(dec(col("y")) * col("y")).as("syy"))
      .select(col("lag"), col("n_pairs"),
        expr("(cast(n_pairs as double)*cast(sxy as double) - cast(sx as double)*cast(sy as double)) / (sqrt(cast(n_pairs as double)*cast(sxx as double) - cast(sx as double)*cast(sx as double)) * sqrt(cast(n_pairs as double)*cast(syy as double) - cast(sy as double)*cast(sy as double)))")
          .as("r"))
      .orderBy("lag")
  }

  val qXcorrSql: String =
    """WITH x AS (
      |  SELECT CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
      |         CAST(count(*) AS BIGINT) AS x
      |  FROM orders GROUP BY 1),
      |y AS (
      |  SELECT CAST(datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) AS yday,
      |         CAST(count(*) AS BIGINT) AS y
      |  FROM lineitem GROUP BY 1),
      |grid AS (SELECT unnest(generate_series(-3, 3)) AS lag),
      |p AS (SELECT g.lag, a.x, b.y
      |      FROM x a CROSS JOIN grid g
      |      JOIN y b ON a.day + g.lag = b.yday),
      |m AS (SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
      |             SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
      |             SUM(CAST(x AS HUGEINT)*y) AS sxy,
      |             SUM(CAST(x AS HUGEINT)*x) AS sxx,
      |             SUM(CAST(y AS HUGEINT)*y) AS syy
      |      FROM p GROUP BY 1)
      |SELECT lag, n_pairs,
      |  (CAST(n_pairs AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)) / (sqrt(CAST(n_pairs AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) * sqrt(CAST(n_pairs AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))) AS r
      |FROM m ORDER BY lag""".stripMargin

  /** Mann–Kendall trend test on the daily event-count series — the
    * NONPARAMETRIC "is there a monotone trend?" answer (q_linreg's slope
    * assumes linear+normal; MK only asks about pairwise order, so one
    * outlier day can't buy a trend). S = Σ_{i<j} sign(x_j − x_i) and the
    * tie-corrected variance are EXACT integers (var carried ×18 to clear
    * the /18); only the final z-score divides, identical-text IEEE.
    *
    * Scale shape: the day-grain reduction is the only table-scale work;
    * the pair frame is |days|² — a calendar-bounded constant (3650 days of
    * a decade = 6.6M pairs) that does NOT grow with data volume, the same
    * justification as q_theil_sen. Unlike q_spearman/q_mann_whitney (whose
    * moment sums grow with data volume and run in DECIMAL), every integer
    * here is |days|-scale: |S| ≤ |days|², var_x18 ≤ |days|³·2 — BIGINT is
    * exact to a ~2-million-day calendar, so no escalation is needed. The
    * continuity-corrected z uses S∓1 by sign (the standard normal
    * approximation). */
  def qMannKendall(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.table(spark, dir, "events")
      .groupBy(expr("ts div 86400000000000").as("day"))
      .agg(count(lit(1)).cast("long").as("c"))
    val pairs = daily.as("a").join(daily.as("b"), col("a.day") < col("b.day"))
      .agg(sum(signum(col("b.c") - col("a.c"))).cast("long").as("s_stat"))
    val ties = daily.groupBy("c").agg(count(lit(1)).as("t"))
      .agg(sum(expr("t * (t - 1) * (2 * t + 5)")).cast("long").as("tie_term"))
    val n = daily.agg(count(lit(1)).cast("long").as("n_days"))
    n.crossJoin(broadcast(pairs)).crossJoin(broadcast(ties))
      .select(col("n_days"), col("s_stat"),
        expr("n_days * (n_days - 1) * (2 * n_days + 5) - tie_term")
          .as("var_x18"))
      .select(col("n_days"), col("s_stat"), col("var_x18"),
        expr("""case when s_stat > 0 then (cast(s_stat as double) - 1.0) / sqrt(cast(var_x18 as double) / 18.0)
               |     when s_stat < 0 then (cast(s_stat as double) + 1.0) / sqrt(cast(var_x18 as double) / 18.0)
               |     else 0.0 end""".stripMargin).as("z"))
  }

  val qMannKendallSql: String =
    """WITH daily AS (
      |  SELECT epoch_ns(ts) // 86400000000000 AS day,
      |         CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1),
      |p AS (
      |  SELECT CAST(SUM(CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1
      |                       ELSE 0 END) AS BIGINT) AS s_stat
      |  FROM daily a JOIN daily b ON a.day < b.day),
      |t AS (
      |  SELECT CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
      |  FROM (SELECT c, CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY 1)),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
      |m AS (
      |  SELECT n_days, s_stat,
      |    n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS var_x18
      |  FROM n, p, t)
      |SELECT n_days, s_stat, var_x18,
      |  CASE WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1.0) / sqrt(CAST(var_x18 AS DOUBLE) / 18.0)
      |       WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1.0) / sqrt(CAST(var_x18 AS DOUBLE) / 18.0)
      |       ELSE 0.0 END AS z
      |FROM m""".stripMargin

  /** Theil–Sen robust slope of the daily event-count series: the MEDIAN of
    * all pairwise slopes — the estimator that shrugs off the outlier days
    * that drag an OLS fit (q_linreg's counterpart, as q_mann_kendall is
    * the robust counterpart of its t-test). The median pair is selected by
    * ordering the pair frame on the IEEE slope (identical-text division in
    * both engines) with a total (day₁, day₂) tiebreak, taking the lower
    * median by row_number — and the emitted slope is re-derived from that
    * pair's exact INTEGER rise/run, so the gate hashes integers plus one
    * identical-text divide, never a sort-order artifact. Same calendar-
    * bounded |days|² pair frame as q_mann_kendall. */
  def qTheilSen(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.table(spark, dir, "events")
      .groupBy(expr("ts div 86400000000000").as("day"))
      .agg(count(lit(1)).cast("long").as("c"))
    val pairs = daily.as("a").join(daily.as("b"), col("a.day") < col("b.day"))
      .select(col("a.day").as("d1"), col("b.day").as("d2"),
        (col("b.c") - col("a.c")).as("rise"),
        (col("b.day") - col("a.day")).as("run"))
      .withColumn("slope", col("rise").cast("double") / col("run").cast("double"))
    val w = Window.orderBy(col("slope"), col("d1"), col("d2"))
    pairs
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("n_pairs", count(lit(1)).over(Window.partitionBy()).cast("long"))
      .where(col("rnk") === expr("(n_pairs + 1) div 2"))
      .select(col("n_pairs"), col("rise").as("med_rise"), col("run").as("med_run"),
        (col("rise").cast("double") / col("run").cast("double")).as("slope_per_day"))
  }

  val qTheilSenSql: String =
    """WITH daily AS (
      |  SELECT epoch_ns(ts) // 86400000000000 AS day,
      |         CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1),
      |p AS (
      |  SELECT a.day AS d1, b.day AS d2,
      |         b.c - a.c AS rise, b.day - a.day AS run,
      |         CAST(b.c - a.c AS DOUBLE) / CAST(b.day - a.day AS DOUBLE) AS slope
      |  FROM daily a JOIN daily b ON a.day < b.day),
      |r AS (
      |  SELECT *, CAST(row_number() OVER (ORDER BY slope, d1, d2) AS BIGINT) AS rnk,
      |         CAST(COUNT(*) OVER () AS BIGINT) AS n_pairs
      |  FROM p)
      |SELECT n_pairs, rise AS med_rise, run AS med_run,
      |       CAST(rise AS DOUBLE) / CAST(run AS DOUBLE) AS slope_per_day
      |FROM r WHERE rnk = (n_pairs + 1) // 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_xcorr" -> (qXcorr _),
    "q_mann_kendall" -> (qMannKendall _),
    "q_theil_sen" -> (qTheilSen _))

  val oracles: Map[String, String] = Map(
    "q_xcorr" -> qXcorrSql,
    "q_mann_kendall" -> qMannKendallSql,
    "q_theil_sen" -> qTheilSenSql)
}
