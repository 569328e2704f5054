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
    * equi-join key (day + lag), and the per-lag moments are exact BIGINT
    * sums — one IEEE divide at the end per the q_autocorr discipline, so
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
    x.crossJoin(broadcast(grid))
      .join(y, col("day") + col("lag") === col("yday"))
      .groupBy("lag")
      .agg(count(lit(1)).as("n_pairs"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
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
      |             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |             CAST(SUM(x*y) AS BIGINT) AS sxy,
      |             CAST(SUM(x*x) AS BIGINT) AS sxx,
      |             CAST(SUM(y*y) AS BIGINT) AS syy
      |      FROM p GROUP BY 1)
      |SELECT lag, n_pairs,
      |  (CAST(n_pairs AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)) / (sqrt(CAST(n_pairs AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) * sqrt(CAST(n_pairs AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))) AS r
      |FROM m ORDER BY lag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_xcorr" -> (qXcorr _))

  val oracles: Map[String, String] = Map(
    "q_xcorr" -> qXcorrSql)
}
