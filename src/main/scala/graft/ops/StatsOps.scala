package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.2 additions (round 7, batches O-Q): the statistics and operational
  * analytics a reference user runs through the DuckDB post-processor
  * (capability parity with QueryManager.py:20-36 arbitrary-SQL surface).
  *
  * The CLASSICAL-TEST family — chi-square independence, Mann-Whitney U,
  * two-sample Kolmogorov-Smirnov, Wald-Wolfowitz runs, one-way ANOVA,
  * Spearman ρ — plus the concentration/association measures (Gini, lagged
  * autocorrelation, market-basket lift) and the operational reports
  * (ABC/Pareto triage, XmR control chart, weekly growth accounting,
  * cycle-time percentiles, backlog aging, censored survival hazard).
  *
  * Every op follows the §4 exactness discipline: observed counts and rank
  * sums are exact BIGINT algebra (order-independent, partial-agg safe); the
  * final test statistic is ONE row of double arithmetic written with
  * IDENTICAL expression text in both engines (IEEE *, /, sqrt are
  * correctly-rounded, so identical inputs + identical AST = identical
  * bits — no round() tie exposure). Rank/ECDF machinery uses the two-level
  * prefix-sum shape (per-BUCKET aggregate rows under the global window,
  * never raw rows — p_pack_sequences' pattern; property-swept against
  * textbook brute force in StatsPropSpec), so nothing here puts a
  * corpus-sized partition on one task at 100 TB.
  */
object StatsOps {

  // ---------------------------------------------------------------- chi2
  /** Pearson chi-square test of independence on the order-priority ×
    * order-status contingency table. Observed, row/column totals and the
    * grand total are exact BIGINT; each cell's term
    * (O·n − R·C)²/(n·R·C) is computed in double with identical text both
    * engines, then floor-scaled to integer ppm so the cross-cell SUM is
    * exact integer arithmetic (no double-sum ordering, no decimal-cast
    * rounding rule consulted). 100 TB shape: one map-side-combined
    * aggregate to ≤ |priorities|·|statuses| cells; everything after is
    * metadata-scale. */
  def qChi2Test(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.table(spark, dir, "orders")
      .groupBy(col("o_orderpriority").as("prio"), col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("o"))
    val rt = cells.groupBy("prio").agg(sum("o").cast("long").as("rt"))
    val ct = cells.groupBy("status").agg(sum("o").cast("long").as("ct"))
    val tot = cells.agg(sum("o").cast("long").as("n"),
      countDistinct("prio").cast("long").as("np"),
      countDistinct("status").cast("long").as("ns"))
    cells.join(rt, "prio").join(ct, "status").crossJoin(broadcast(tot))
      .select(col("n"), col("np"), col("ns"),
        expr("cast(floor((((cast(o as double)*cast(n as double) - cast(rt as double)*cast(ct as double)) * (cast(o as double)*cast(n as double) - cast(rt as double)*cast(ct as double))) / ((cast(n as double)*cast(rt as double))*cast(ct as double))) * 1000000.0) as long)")
          .as("term_ppm"))
      .groupBy("n", "np", "ns")
      .agg(sum("term_ppm").cast("long").as("chi2_ppm"))
      .select(col("n"), ((col("np") - lit(1L)) * (col("ns") - lit(1L))).as("dof"),
        col("chi2_ppm"),
        expr("cast(chi2_ppm as double) / 1000000.0").as("chi2"))
  }

  val qChi2TestSql: String =
    """WITH cells AS (
      |  SELECT o_orderpriority AS prio, o_orderstatus AS status,
      |         CAST(count(*) AS BIGINT) AS o
      |  FROM orders GROUP BY 1, 2),
      |rt AS (SELECT prio, CAST(SUM(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
      |ct AS (SELECT status, CAST(SUM(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
      |tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
      |               CAST(COUNT(DISTINCT prio) AS BIGINT) AS np,
      |               CAST(COUNT(DISTINCT status) AS BIGINT) AS ns
      |        FROM cells),
      |t AS (
      |  SELECT n, np, ns,
      |    CAST(floor((((CAST(o AS DOUBLE)*CAST(n AS DOUBLE) - CAST(rt AS DOUBLE)*CAST(ct AS DOUBLE)) * (CAST(o AS DOUBLE)*CAST(n AS DOUBLE) - CAST(rt AS DOUBLE)*CAST(ct AS DOUBLE))) / ((CAST(n AS DOUBLE)*CAST(rt AS DOUBLE))*CAST(ct AS DOUBLE))) * 1000000.0) AS BIGINT) AS term_ppm
      |  FROM cells JOIN rt USING (prio) JOIN ct USING (status) CROSS JOIN tot),
      |s AS (SELECT n, np, ns, CAST(SUM(term_ppm) AS BIGINT) AS chi2_ppm
      |      FROM t GROUP BY 1, 2, 3)
      |SELECT n, (np - 1)*(ns - 1) AS dof, chi2_ppm,
      |       CAST(chi2_ppm AS DOUBLE) / 1000000.0 AS chi2
      |FROM s""".stripMargin

  // ------------------------------------------------------- rank machinery
  /** Distinct-value rank table for the two-sample tests, two-level so the
    * global prefix runs over per-BUCKET aggregate rows (bucket =
    * floor(value), bounded by the VALUE DOMAIN, not the corpus): per
    * distinct value v — cnt, c1 (sample-1 rows), rows-before across the
    * whole joint sample (bucket prefix + within-bucket prefix), and the
    * inclusive per-sample cumulative counts the ECDF needs. All integer. */
  private def rankTable(spark: SparkSession, dir: String,
                        g1: String, g2: String): DataFrame =
    rankTableOf(Tables.table(spark, dir, "events")
      .where(col("event_type").isin(g1, g2))
      .select(col("value"), (col("event_type") === g1).cast("long").as("is1")))

  /** Same machinery over an arbitrary (value: double, is1: 0/1) frame —
    * lets the property spec drive random samples through the identical
    * two-level plan the driver ops run. */
  private[graft] def rankTableOf(ev: DataFrame): DataFrame = {
    // distinct-value aggregate feeds both the bucket prefix and the final
    // join — cache it instead of re-scanning the source twice
    val byV = ev.groupBy("value")
      .agg(count(lit(1)).as("cnt"), sum("is1").as("c1"))
      .withColumn("bucket", expr("cast(floor(value) as long)"))
      .withColumn("c2", col("cnt") - col("c1"))
      .cache()
    val perB = byV.groupBy("bucket")
      .agg(sum("cnt").as("bcnt"), sum("c1").as("bc1"), sum("c2").as("bc2"))
    val wg = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    val bpre = perB.select(col("bucket"),
      coalesce(sum("bcnt").over(wg), lit(0L)).as("bbefore"),
      coalesce(sum("bc1").over(wg), lit(0L)).as("bbefore1"),
      coalesce(sum("bc2").over(wg), lit(0L)).as("bbefore2"))
    val ww = Window.partitionBy("bucket").orderBy("value")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wi = Window.partitionBy("bucket").orderBy("value")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byV.join(bpre, "bucket")
      .select(col("value"), col("cnt"), col("c1"), col("c2"),
        (col("bbefore") + coalesce(sum("cnt").over(ww), lit(0L))).as("before"),
        (col("bbefore1") + sum("c1").over(wi)).as("cum1"),
        (col("bbefore2") + sum("c2").over(wi)).as("cum2"))
  }

  /** The identical SQL text of `rankTable` (DuckDB windowed SUM returns
    * HUGEINT — cast back at every use site, §4). */
  private def rankTableSql(g1: String, g2: String): String =
    s"""ev AS (
       |  SELECT value, CAST(event_type = '$g1' AS BIGINT) AS is1
       |  FROM events WHERE event_type IN ('$g1', '$g2')),
       |byv AS (
       |  SELECT value, CAST(floor(value) AS BIGINT) AS bucket,
       |         CAST(count(*) AS BIGINT) AS cnt, CAST(SUM(is1) AS BIGINT) AS c1,
       |         CAST(count(*) - SUM(is1) AS BIGINT) AS c2
       |  FROM ev GROUP BY 1, 2),
       |perb AS (SELECT bucket, CAST(SUM(cnt) AS BIGINT) AS bcnt,
       |                CAST(SUM(c1) AS BIGINT) AS bc1,
       |                CAST(SUM(c2) AS BIGINT) AS bc2
       |         FROM byv GROUP BY 1),
       |bpre AS (SELECT bucket,
       |  CAST(COALESCE(SUM(bcnt) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS bbefore,
       |  CAST(COALESCE(SUM(bc1) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS bbefore1,
       |  CAST(COALESCE(SUM(bc2) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS bbefore2
       |  FROM perb),
       |rk AS (
       |  SELECT value, cnt, c1, c2,
       |    bbefore + CAST(COALESCE(SUM(cnt) OVER (PARTITION BY byv.bucket ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS before,
       |    bbefore1 + CAST(SUM(c1) OVER (PARTITION BY byv.bucket ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum1,
       |    bbefore2 + CAST(SUM(c2) OVER (PARTITION BY byv.bucket ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum2
       |  FROM byv JOIN bpre USING (bucket))""".stripMargin

  // -------------------------------------------------------- Mann-Whitney
  /** Mann-Whitney U (Wilcoxon rank-sum) comparing `value` between the
    * click and purchase event populations. Tie-corrected: ranks are
    * midranks, carried ×2 so they stay integer (rank2 = 2·minrank+cnt−1);
    * U likewise ×2 (u1_x2 = 2·R1 − n1(n1+1)). The rank-sum and Σ(t³−t) tie
    * term grow as n² / t³ (t = per-value tie counts, data-volume-scale) —
    * past ~sf1 they clear BIGINT, so the moments run in exact DECIMAL(38,0)
    * (HUGEINT on the oracle side) and the U statistics emit as doubles
    * converted from the same exact integers in both engines. The
    * normal-approximation z (with the tie correction) is identical-text
    * IEEE. */
  def qMannWhitney(spark: SparkSession, dir: String): DataFrame = {
    val rk = rankTable(spark, dir, "click", "purchase")
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    rk.select(col("c1"), col("cnt"),
        (dec(col("c1")) * (lit(2L) * col("before") + col("cnt") + lit(1L))).as("r1x2"),
        (dec(col("cnt")) * col("cnt") * col("cnt") - col("cnt")).as("t3"))
      .agg(sum("c1").cast("long").as("n1"),
        (sum("cnt") - sum("c1")).cast("long").as("n2"),
        sum("r1x2").as("r1x2"),
        sum("t3").as("tsum"))
      .select(col("n1"), col("n2"),
        (col("r1x2") - dec(col("n1")) * (col("n1") + lit(1L))).as("u1_x2"),
        (lit(2L) * dec(col("n1")) * col("n2") - (col("r1x2") - dec(col("n1")) * (col("n1") + lit(1L)))).as("u2_x2"),
        col("tsum"))
      .select(col("n1"), col("n2"),
        col("u1_x2").cast("double").as("u1_x2"),
        col("u2_x2").cast("double").as("u2_x2"),
        col("tsum").cast("double").as("tsum"),
        expr("(cast(u1_x2 as double) - cast(n1 as double)*cast(n2 as double)) / (2.0 * sqrt(((cast(n1 as double)*cast(n2 as double))/12.0) * ((cast(n1 as double)+cast(n2 as double)+1.0) - cast(tsum as double)/((cast(n1 as double)+cast(n2 as double))*(cast(n1 as double)+cast(n2 as double)-1.0)))))")
          .as("z"))
  }

  val qMannWhitneySql: String =
    s"""WITH ${rankTableSql("click", "purchase")},
       |agg AS (
       |  SELECT CAST(SUM(c1) AS BIGINT) AS n1,
       |         CAST(SUM(cnt) - SUM(c1) AS BIGINT) AS n2,
       |         SUM(CAST(c1 AS HUGEINT) * (2*before + cnt + 1)) AS r1x2,
       |         SUM(CAST(cnt AS HUGEINT)*cnt*cnt - cnt) AS tsum
       |  FROM rk),
       |u AS (SELECT n1, n2, r1x2 - CAST(n1 AS HUGEINT)*(n1 + 1) AS u1_x2,
       |             2*CAST(n1 AS HUGEINT)*n2 - (r1x2 - CAST(n1 AS HUGEINT)*(n1 + 1)) AS u2_x2, tsum
       |      FROM agg)
       |SELECT n1, n2,
       |  CAST(u1_x2 AS DOUBLE) AS u1_x2, CAST(u2_x2 AS DOUBLE) AS u2_x2,
       |  CAST(tsum AS DOUBLE) AS tsum,
       |  (CAST(u1_x2 AS DOUBLE) - CAST(n1 AS DOUBLE)*CAST(n2 AS DOUBLE)) / (2.0 * sqrt(((CAST(n1 AS DOUBLE)*CAST(n2 AS DOUBLE))/12.0) * ((CAST(n1 AS DOUBLE)+CAST(n2 AS DOUBLE)+1.0) - CAST(tsum AS DOUBLE)/((CAST(n1 AS DOUBLE)+CAST(n2 AS DOUBLE))*(CAST(n1 AS DOUBLE)+CAST(n2 AS DOUBLE)-1.0))))) AS z
       |FROM u""".stripMargin

  // --------------------------------------------------- Kolmogorov-Smirnov
  /** Two-sample Kolmogorov-Smirnov D between the same two populations:
    * D = max over observed points of |F1 − F2|, maximized in EXACT integer
    * cross-multiplied form (d_num = max|cum1·n2 − cum2·n1|; the sup of a
    * cadlag step difference is attained at an observed point, inclusive
    * cums). d = d_num/(n1·n2) is the one double. */
  def qKsTest(spark: SparkSession, dir: String): DataFrame = {
    val rk = rankTable(spark, dir, "click", "purchase")
    val tot = rk.agg(sum("c1").cast("long").as("n1"),
      sum("c2").cast("long").as("n2"))
    rk.crossJoin(broadcast(tot))
      .select(col("n1"), col("n2"),
        abs(col("cum1") * col("n2") - col("cum2") * col("n1")).as("dd"))
      .groupBy("n1", "n2")
      .agg(max("dd").cast("long").as("d_num"))
      .select(col("n1"), col("n2"), col("d_num"),
        expr("cast(d_num as double) / (cast(n1 as double)*cast(n2 as double))").as("d"))
  }

  val qKsTestSql: String =
    s"""WITH ${rankTableSql("click", "purchase")},
       |tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
       |               CAST(SUM(c2) AS BIGINT) AS n2 FROM rk),
       |m AS (SELECT n1, n2, CAST(MAX(abs(cum1*n2 - cum2*n1)) AS BIGINT) AS d_num
       |      FROM rk CROSS JOIN tot GROUP BY 1, 2)
       |SELECT n1, n2, d_num,
       |       CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE)*CAST(n2 AS DOUBLE)) AS d
       |FROM m""".stripMargin

  // ----------------------------------------------------------------- Gini
  /** Gini concentration index of per-customer order revenue (the classic
    * "how concentrated is spend" audit). Money goes integer at the scan
    * (cents — §4: no decimal rule consulted, no fp sum); the sorted-rank
    * identity G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n runs two-level: within
    * REVENUE-BAND rank (numeric-keyed window) + band prefix over per-band
    * aggregate rows, so Σ i·xᵢ = Σ_bands (before_b·Σx_b + Σ_j j·x_j).
    * Equal-revenue tie order cannot change the sum (x constant within a
    * tie ⇒ Σ i·x invariant), custkey tiebreak pins determinism anyway. */
  def qGini(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.table(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(sum(expr("cast(round(o_totalprice * 100, 0) as long)")).as("cents"))
      .withColumn("band", expr("cents div 10000000"))
    val wj = Window.partitionBy("band").orderBy("cents", "o_custkey")
    val inner = rev.withColumn("j", row_number().over(wj).cast("long"))
      .groupBy("band")
      .agg(count(lit(1)).as("bn"), sum("cents").as("bsum"),
        sum(col("j") * col("cents")).as("binner"))
    val wg = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, -1)
    inner.select(col("bn"), col("bsum"), col("binner"),
        coalesce(sum("bn").over(wg), lit(0L)).as("bbefore"))
      .agg(sum("bn").cast("long").as("n_customers"),
        sum("bsum").cast("long").as("total_cents"),
        sum(col("bbefore") * col("bsum") + col("binner")).cast("long").as("s1"))
      .select(col("n_customers"), col("total_cents"),
        expr("(2.0*cast(s1 as double)) / (cast(n_customers as double)*cast(total_cents as double)) - (cast(n_customers as double)+1.0)/cast(n_customers as double)")
          .as("gini"))
  }

  val qGiniSql: String =
    """WITH rev AS (
      |  SELECT o_custkey,
      |         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |b AS (SELECT o_custkey, cents, cents // 10000000 AS band FROM rev),
      |j AS (SELECT band, cents,
      |        CAST(row_number() OVER (PARTITION BY band ORDER BY cents, o_custkey) AS BIGINT) AS j
      |      FROM b),
      |inner_ AS (SELECT band, CAST(count(*) AS BIGINT) AS bn,
      |                  CAST(SUM(cents) AS BIGINT) AS bsum,
      |                  CAST(SUM(j * cents) AS BIGINT) AS binner
      |           FROM j GROUP BY 1),
      |pre AS (SELECT bn, bsum, binner,
      |  CAST(COALESCE(SUM(bn) OVER (ORDER BY band ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS bbefore
      |  FROM inner_),
      |agg AS (SELECT CAST(SUM(bn) AS BIGINT) AS n_customers,
      |               CAST(SUM(bsum) AS BIGINT) AS total_cents,
      |               CAST(SUM(bbefore * bsum + binner) AS BIGINT) AS s1
      |        FROM pre)
      |SELECT n_customers, total_cents,
      |  (2.0*CAST(s1 AS DOUBLE)) / (CAST(n_customers AS DOUBLE)*CAST(total_cents AS DOUBLE)) - (CAST(n_customers AS DOUBLE)+1.0)/CAST(n_customers AS DOUBLE) AS gini
      |FROM agg""".stripMargin

  // ---------------------------------------------------------- autocorr
  /** Lag-1..7 Pearson autocorrelation of the DAILY event-count series —
    * the seasonality probe behind every traffic forecast. Daily counts are
    * one map-side-combined aggregate (|days| rows, bounded by the time
    * range); each lag pairs the series with itself via an equi-join on
    * day+lag over a broadcast 7-row lag grid. All five moment sums are
    * exact BIGINT; r per lag is one row of identical-text double math.
    * Missing days pair only where both endpoints exist (join semantics,
    * identical both engines). */
  def qAutocorr(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.table(spark, dir, "events")
      .select(expr("ts div 86400000000000").as("day"))
      .groupBy("day").agg(count(lit(1)).as("x"))
    val grid = spark.range(1, 8).select(col("id").as("lag"))
    val y = daily.select(col("day").as("yday"), col("x").as("y"))
    // moment sums in DECIMAL(38,0) ↔ HUGEINT: daily counts are VOLUME-scale
    // (~3e8/day at 100 TB), so Σx² over a decade of days clears BIGINT —
    // the q_spearman escalation class (r8)
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    daily.crossJoin(broadcast(grid))
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

  val qAutocorrSql: String =
    """WITH daily AS (
      |  SELECT epoch_ns(ts) // 86400000000000 AS day,
      |         CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1),
      |grid AS (SELECT unnest(generate_series(1, 7)) AS lag),
      |p AS (SELECT g.lag, a.x, b.x AS y
      |      FROM daily a CROSS JOIN grid g
      |      JOIN daily b ON a.day + g.lag = b.day),
      |m AS (SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
      |             SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
      |             SUM(CAST(x AS HUGEINT)*y) AS sxy,
      |             SUM(CAST(x AS HUGEINT)*x) AS sxx,
      |             SUM(CAST(y AS HUGEINT)*y) AS syy
      |      FROM p GROUP BY 1)
      |SELECT lag, n_pairs,
      |  (CAST(n_pairs AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)) / (sqrt(CAST(n_pairs AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) * sqrt(CAST(n_pairs AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))) AS r
      |FROM m ORDER BY lag""".stripMargin

  // ---------------------------------------------------------------- anova
  /** One-way ANOVA: does mean `value` differ across the five event types?
    * Completes the classical-test family (Welch t, chi-square, MW, KS,
    * runs): per-group n/Σv/Σv² in the exact decimal discipline, then the
    * textbook decomposition SSB = Σ nᵍ·meanᵍ² − n·mean², SSW = SST − SSB
    * and F = (SSB/(k−1))/(SSW/(n−k)) as ONE identical-text IEEE row over
    * the k=5 group rows (cross-group sums run in DECIMAL so partial-agg
    * order can't matter). One map-side-combined aggregate to k rows. */
  def qAnova(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.table(spark, dir, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(30,6)")).as("sx"),
        sum(expr("cast(round(value * value, 6) as decimal(30,7))")).as("sxx"))
    g.agg(count(lit(1)).cast("long").as("k"),
        sum("n").cast("long").as("n"),
        sum("sx").cast("double").as("tsx"),
        sum("sxx").cast("double").as("tsxx"),
        // Σ n_g·mean_g² with the per-group division in double, the
        // cross-group sum in decimal (identical text both engines)
        sum(expr("cast((cast(sx as double)*cast(sx as double))/cast(n as double) as decimal(30,6))"))
          .cast("double").as("sb"))
      .select(col("k"), col("n"),
        expr("((sb - (tsx*tsx)/cast(n as double)) / (cast(k as double) - 1.0)) / (((tsxx - sb)) / (cast(n as double) - cast(k as double)))")
          .as("f_stat"))
  }

  val qAnovaSql: String =
    """WITH g AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(CAST(value AS DECIMAL(30,6))) AS sx,
      |    SUM(CAST(round(value * value, 6) AS DECIMAL(30,7))) AS sxx
      |  FROM events GROUP BY 1),
      |t AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n) AS BIGINT) AS n,
      |    CAST(SUM(sx) AS DOUBLE) AS tsx, CAST(SUM(sxx) AS DOUBLE) AS tsxx,
      |    CAST(SUM(CAST((CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))/CAST(n AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE) AS sb
      |  FROM g)
      |SELECT k, n,
      |  ((sb - (tsx*tsx)/CAST(n AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0)) / (((tsxx - sb)) / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))) AS f_stat
      |FROM t""".stripMargin

  // ------------------------------------------------------------ spearman
  /** Midrank table for ONE variable: (value, rank2 = 2·midrank), the same
    * two-level bucket-prefix shape as [[rankTableOf]] (global window over
    * per-BUCKET aggregate rows only). `bucket` must be a monotone integer
    * function of `value` (same text both engines). */
  private def rank2Of(src: DataFrame, bucketExpr: String): DataFrame = {
    val byV = src.groupBy("value").agg(count(lit(1)).as("cnt"))
      .withColumn("bucket", expr(bucketExpr))
      .cache()
    val perB = byV.groupBy("bucket").agg(sum("cnt").as("bcnt"))
    val wg = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    val bpre = perB.select(col("bucket"),
      coalesce(sum("bcnt").over(wg), lit(0L)).as("bbefore"))
    val ww = Window.partitionBy("bucket").orderBy("value")
      .rowsBetween(Window.unboundedPreceding, -1)
    byV.join(bpre, "bucket")
      .select(col("value"),
        (lit(2L) * (col("bbefore") + coalesce(sum("cnt").over(ww), lit(0L)))
          + col("cnt") + lit(1L)).as("rank2"))
  }

  /** Spearman rank correlation between line quantity and extended price —
    * the monotone-association test Pearson's r (q_corr_matrix) misses when
    * the relation is nonlinear. Midranks carried ×2 so every rank is an
    * exact BIGINT (dense ties: quantity has ~50 distinct values); ρ =
    * Pearson on the rank2 columns, with the five moment sums exact
    * DECIMAL(38,0) — bounded by 4n³, which clears BIGINT past ~sf1, so the
    * products and sums run in 128-bit space (HUGEINT on the oracle side;
    * good to ~10³⁸, i.e. any conceivable corpus) — and the ratio one
    * identical-text IEEE row (the exact integers convert to the same
    * nearest double in both engines). Each variable's rank map is
    * value-domain-sized and joins back by value (equi-join) — rows never
    * globally sort. */
  def qSpearman(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.table(spark, dir, "lineitem")
      .select(col("l_quantity"), col("l_extendedprice"))
    val rq = rank2Of(li.select(col("l_quantity").as("value")),
      "cast(floor(value) as long)")
      .select(col("value").as("l_quantity"), col("rank2").as("rx"))
    val rp = rank2Of(li.select(col("l_extendedprice").as("value")),
      "cast(floor(value / 1000.0) as long)")
      .select(col("value").as("l_extendedprice"), col("rank2").as("ry"))
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    li.join(rq, "l_quantity").join(rp, "l_extendedprice")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(dec(col("rx"))).as("sx"), sum(dec(col("ry"))).as("sy"),
        sum(dec(col("rx")) * col("ry")).as("sxy"),
        sum(dec(col("rx")) * col("rx")).as("sxx"),
        sum(dec(col("ry")) * col("ry")).as("syy"))
      .select(col("n"),
        expr("(cast(n as double)*cast(sxy as double) - cast(sx as double)*cast(sy as double)) / (sqrt(cast(n as double)*cast(sxx as double) - cast(sx as double)*cast(sx as double)) * sqrt(cast(n as double)*cast(syy as double) - cast(sy as double)*cast(sy as double)))")
          .as("rho"))
  }

  val qSpearmanSql: String = {
    def rankCte(src: String, bucket: String, nm: String): String =
      s"""${nm}v AS (SELECT value, CAST(COUNT(*) AS BIGINT) AS cnt
         |        FROM $src GROUP BY 1),
         |${nm}b AS (SELECT $bucket AS bucket, value, cnt FROM ${nm}v),
         |${nm}p AS (SELECT bucket, CAST(SUM(cnt) AS BIGINT) AS bcnt
         |        FROM ${nm}b GROUP BY 1),
         |${nm}pre AS (SELECT bucket,
         |  CAST(COALESCE(SUM(bcnt) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS bbefore
         |  FROM ${nm}p),
         |${nm}r AS (
         |  SELECT value,
         |    2*(bbefore + CAST(COALESCE(SUM(cnt) OVER (PARTITION BY b.bucket ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)) + cnt + 1 AS rank2
         |  FROM ${nm}b b JOIN ${nm}pre USING (bucket))""".stripMargin
    s"""WITH ${rankCte("(SELECT l_quantity AS value FROM lineitem)",
        "CAST(floor(value) AS BIGINT)", "q")},
       |${rankCte("(SELECT l_extendedprice AS value FROM lineitem)",
        "CAST(floor(value / 1000.0) AS BIGINT)", "p")},
       |j AS (
       |  SELECT qr.rank2 AS rx, pr.rank2 AS ry
       |  FROM lineitem l
       |  JOIN qr ON qr.value = l.l_quantity
       |  JOIN pr ON pr.value = l.l_extendedprice),
       |m AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    SUM(CAST(rx AS HUGEINT)) AS sx, SUM(CAST(ry AS HUGEINT)) AS sy,
       |    SUM(CAST(rx AS HUGEINT)*ry) AS sxy,
       |    SUM(CAST(rx AS HUGEINT)*rx) AS sxx,
       |    SUM(CAST(ry AS HUGEINT)*ry) AS syy
       |  FROM j)
       |SELECT n,
       |  (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)) / (sqrt(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) * sqrt(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))) AS rho
       |FROM m""".stripMargin
  }

  // ------------------------------------------------------------ abc
  /** ABC / Pareto analysis of part revenue: class A = parts covering the
    * first 70% of revenue (descending), B to 90%, C the tail — the 80/20
    * classification every inventory/curation triage runs. Money integer at
    * the scan (cents); the descending cumulative uses the two-level band
    * identity (prefix of REVENUE-BAND aggregate sums + within-band prefix,
    * both exact BIGINT), class cuts compare 10·cum_before against 7·T/9·T
    * — all integer, no share division until the 3-row report. */
  def qAbcAnalysis(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.table(spark, dir, "lineitem")
      .groupBy("l_partkey")
      .agg(sum(expr("cast(round(l_extendedprice * 100, 0) as long)")).as("cents"))
      .withColumn("band", expr("cents div 100000"))
    val perB = rev.groupBy("band").agg(sum("cents").as("bsum"))
    val wg = Window.orderBy(col("band").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bpre = perB.select(col("band"),
      coalesce(sum("bsum").over(wg), lit(0L)).as("bbefore"))
    val ww = Window.partitionBy("band")
      .orderBy(col("cents").desc, col("l_partkey"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val tot = rev.agg(sum("cents").cast("long").as("t"))
    rev.join(bpre, "band")
      .withColumn("before",
        col("bbefore") + coalesce(sum("cents").over(ww), lit(0L)))
      .crossJoin(broadcast(tot))
      .select(col("cents"),
        when(col("before") * 10 < col("t") * 7, "A")
          .when(col("before") * 10 < col("t") * 9, "B")
          .otherwise("C").as("abc_class"),
        col("t"))
      .groupBy("abc_class")
      .agg(count(lit(1)).cast("long").as("n_parts"),
        sum("cents").cast("long").as("revenue_cents"),
        expr("(1000000 * cast(sum(cents) as bigint)) div max(t)").as("share_ppm"))
      .orderBy("abc_class")
  }

  val qAbcAnalysisSql: String =
    """WITH rev AS (
      |  SELECT l_partkey,
      |         CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
      |  FROM lineitem GROUP BY 1),
      |b AS (SELECT l_partkey, cents, cents // 100000 AS band FROM rev),
      |perb AS (SELECT band, CAST(SUM(cents) AS BIGINT) AS bsum FROM b GROUP BY 1),
      |bpre AS (SELECT band,
      |  CAST(COALESCE(SUM(bsum) OVER (ORDER BY band DESC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS bbefore
      |  FROM perb),
      |tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS t FROM rev),
      |pre AS (
      |  SELECT cents,
      |    bbefore + CAST(COALESCE(SUM(cents) OVER (PARTITION BY b.band ORDER BY cents DESC, l_partkey ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS before
      |  FROM b JOIN bpre USING (band)),
      |cls AS (
      |  SELECT cents, t,
      |    CASE WHEN before * 10 < t * 7 THEN 'A'
      |         WHEN before * 10 < t * 9 THEN 'B'
      |         ELSE 'C' END AS abc_class
      |  FROM pre CROSS JOIN tot)
      |SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_parts,
      |  CAST(SUM(cents) AS BIGINT) AS revenue_cents,
      |  (1000000 * CAST(SUM(cents) AS BIGINT)) // MAX(t) AS share_ppm
      |FROM cls GROUP BY 1 ORDER BY abc_class""".stripMargin

  // --------------------------------------------------------- control chart
  /** XmR (individuals + moving range) control chart on the daily event
    * count series — the SPC standard for low-frequency process monitoring
    * (st_anomaly is its per-event high-frequency sibling). Exact integer
    * Σx and ΣMR; the limits x̄ ± 2.66·M̄R and the violation count are one
    * identical-text IEEE pass over the |days| aggregate rows. */
  def qControlChart(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.table(spark, dir, "events")
      .select(expr("ts div 86400000000000").as("day"))
      .groupBy("day").agg(count(lit(1)).as("x"))
    val wd = Window.orderBy("day")
    val mr = daily.withColumn("prev", lag("x", 1).over(wd))
      .withColumn("mr", abs(col("x") - col("prev")))
    val lim = mr.agg(count(lit(1)).cast("long").as("n_days"),
        sum("x").cast("long").as("sx"),
        sum("mr").cast("long").as("smr"))
      .select(col("n_days"), col("sx"), col("smr"),
        expr("cast(sx as double)/cast(n_days as double) + 2.66 * (cast(smr as double)/(cast(n_days as double) - 1.0))").as("ucl"),
        expr("cast(sx as double)/cast(n_days as double) - 2.66 * (cast(smr as double)/(cast(n_days as double) - 1.0))").as("lcl"))
    daily.crossJoin(broadcast(lim))
      .groupBy("n_days", "sx", "smr", "ucl", "lcl")
      .agg(sum(when(col("x").cast("double") > col("ucl"), 1L)
          .when(col("x").cast("double") < col("lcl"), 1L)
          .otherwise(0L)).cast("long").as("n_violations"))
      .select(col("n_days"),
        expr("cast(sx as double)/cast(n_days as double)").as("mean_x"),
        expr("cast(smr as double)/(cast(n_days as double) - 1.0)").as("mr_bar"),
        col("ucl"), col("lcl"), col("n_violations"))
  }

  val qControlChartSql: String =
    """WITH daily AS (
      |  SELECT epoch_ns(ts) // 86400000000000 AS day,
      |         CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1),
      |m AS (SELECT day, x, abs(x - lag(x) OVER (ORDER BY day)) AS mr FROM daily),
      |lim AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(mr) AS BIGINT) AS smr
      |  FROM m),
      |l2 AS (
      |  SELECT n_days, sx, smr,
      |    CAST(sx AS DOUBLE)/CAST(n_days AS DOUBLE) + 2.66 * (CAST(smr AS DOUBLE)/(CAST(n_days AS DOUBLE) - 1.0)) AS ucl,
      |    CAST(sx AS DOUBLE)/CAST(n_days AS DOUBLE) - 2.66 * (CAST(smr AS DOUBLE)/(CAST(n_days AS DOUBLE) - 1.0)) AS lcl
      |  FROM lim)
      |SELECT n_days,
      |  CAST(sx AS DOUBLE)/CAST(n_days AS DOUBLE) AS mean_x,
      |  CAST(smr AS DOUBLE)/(CAST(n_days AS DOUBLE) - 1.0) AS mr_bar,
      |  ucl, lcl,
      |  (SELECT CAST(SUM(CASE WHEN CAST(x AS DOUBLE) > l2.ucl THEN 1
      |                        WHEN CAST(x AS DOUBLE) < l2.lcl THEN 1
      |                        ELSE 0 END) AS BIGINT) FROM daily) AS n_violations
      |FROM l2""".stripMargin

  // ------------------------------------------------------ growth accounting
  /** Weekly growth accounting: every active user classified as NEW (first
    * week), RETAINED (also active last week), or RESURRECTED (seen before,
    * inactive last week), plus last week's CHURN (active then, not now) —
    * the standard decomposition that explains a flat DAU line (q_dau_mau
    * measures the level; this explains its movement). Identity
    * active_w = new + retained + resurrected is carried in-plan.
    *
    * Shape: raw events collapse to the (user, week) GRID first (one
    * distinct — never raw events in the joins); classification is three
    * self-joins of the grid on (user, week±1) + one first-week min-agg,
    * all map-side-combinable equi-joins. */
  def qGrowthAccounting(spark: SparkSession, dir: String): DataFrame = {
    val uw = Tables.table(spark, dir, "events")
      .select(col("user_id"), expr("(ts div 86400000000000) div 7").as("w"))
      .distinct().cache()
    val first = uw.groupBy("user_id").agg(min("w").as("fw"))
    val prev = uw.select(col("user_id"), (col("w") + 1).as("w"),
      lit(1L).as("was_prev"))
    val cls = uw.join(first, "user_id")
      .join(prev, Seq("user_id", "w"), "left")
      .select(col("w"),
        when(col("fw") === col("w"), "new")
          .when(col("was_prev").isNotNull, "retained")
          .otherwise("resurrected").as("cls"))
      .groupBy("w").pivot("cls", Seq("new", "retained", "resurrected"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .withColumnRenamed("new", "n_new")
      .withColumnRenamed("retained", "n_retained")
      .withColumnRenamed("resurrected", "n_resurrected")
    val nxt = uw.select(col("user_id"), (col("w") - 1).as("w"))
    val churn = uw.join(nxt.withColumn("still", lit(1L)),
        Seq("user_id", "w"), "left")
      .where(col("still").isNull)
      .groupBy((col("w") + 1).as("w"))
      .agg(count(lit(1)).as("churned_in"))
    cls.join(churn, Seq("w"), "left")
      .select(col("w"), col("n_new"), col("n_retained"), col("n_resurrected"),
        (col("n_new") + col("n_retained") + col("n_resurrected")).as("active"),
        coalesce(col("churned_in"), lit(0L)).as("churned_from_prev"))
      .orderBy("w")
  }

  val qGrowthAccountingSql: String =
    """WITH uw AS (
      |  SELECT DISTINCT user_id,
      |         (epoch_ns(ts) // 86400000000000) // 7 AS w
      |  FROM events),
      |first_ AS (SELECT user_id, MIN(w) AS fw FROM uw GROUP BY 1),
      |cls AS (
      |  SELECT u.w,
      |    CASE WHEN f.fw = u.w THEN 'new'
      |         WHEN p.user_id IS NOT NULL THEN 'retained'
      |         ELSE 'resurrected' END AS cls
      |  FROM uw u JOIN first_ f USING (user_id)
      |  LEFT JOIN uw p ON p.user_id = u.user_id AND p.w = u.w - 1),
      |piv AS (
      |  SELECT w,
      |    CAST(SUM(CASE WHEN cls = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
      |    CAST(SUM(CASE WHEN cls = 'retained' THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
      |    CAST(SUM(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
      |  FROM cls GROUP BY 1),
      |churn AS (
      |  SELECT u.w + 1 AS w, CAST(COUNT(*) AS BIGINT) AS churned_in
      |  FROM uw u LEFT JOIN uw n ON n.user_id = u.user_id AND n.w = u.w + 1
      |  WHERE n.user_id IS NULL GROUP BY 1)
      |SELECT p.w, p.n_new, p.n_retained, p.n_resurrected,
      |  p.n_new + p.n_retained + p.n_resurrected AS active,
      |  COALESCE(c.churned_in, 0) AS churned_from_prev
      |FROM piv p LEFT JOIN churn c ON c.w = p.w
      |ORDER BY p.w""".stripMargin

  // ------------------------------------------------------- cycle time
  /** Order-to-ship cycle time per priority class: exact day deltas from
    * the orders⋈lineitem equi-join, nearest-rank p50/p90 WITHOUT a global
    * sort (the q_time_to_event two-level identity over DAY-DELTA buckets —
    * the delta domain is bounded by business rules, not data volume), plus
    * mean in exact ppm-days. The ops dashboard number behind every
    * "are we shipping slower?" question. */
  def qCycleTime(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.table(spark, dir, "orders")
      .join(Tables.table(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderpriority").as("prio"),
        expr("datediff(l_shipdate, o_orderdate)").cast("long").as("dd"))
    val byDelta = d.groupBy("prio", "dd").agg(count(lit(1)).as("cnt"))
    val wc = Window.partitionBy("prio").orderBy("dd")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = d.groupBy("prio").agg(count(lit(1)).as("n"),
      sum("dd").cast("long").as("sdd"))
    val cum = byDelta.withColumn("cum", sum("cnt").over(wc))
      .join(tot, "prio")
    def rankAt(q: Long, of: Long): org.apache.spark.sql.Column =
      (col("cum") * of >= col("n") * q) && ((col("cum") - col("cnt")) * of < col("n") * q)
    cum.groupBy("prio")
      .agg(max("n").cast("long").as("n_lines"),
        max(when(rankAt(50, 100), col("dd"))).cast("long").as("p50_days"),
        max(when(rankAt(90, 100), col("dd"))).cast("long").as("p90_days"),
        expr("(1000000 * max(sdd)) div max(n)").as("mean_ppm_days"))
      .orderBy("prio")
  }

  val qCycleTimeSql: String =
    """WITH d AS (
      |  SELECT o_orderpriority AS prio,
      |         CAST(datediff('day', o_orderdate, l_shipdate) AS BIGINT) AS dd
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |bd AS (SELECT prio, dd, CAST(COUNT(*) AS BIGINT) AS cnt FROM d GROUP BY 1, 2),
      |tot AS (SELECT prio, CAST(COUNT(*) AS BIGINT) AS n,
      |               CAST(SUM(dd) AS BIGINT) AS sdd FROM d GROUP BY 1),
      |cum AS (
      |  SELECT bd.prio, dd, cnt, n, sdd,
      |    CAST(SUM(cnt) OVER (PARTITION BY bd.prio ORDER BY dd
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM bd JOIN tot ON tot.prio = bd.prio)
      |SELECT prio, CAST(MAX(n) AS BIGINT) AS n_lines,
      |  CAST(MAX(CASE WHEN cum * 100 >= n * 50 AND (cum - cnt) * 100 < n * 50 THEN dd END) AS BIGINT) AS p50_days,
      |  CAST(MAX(CASE WHEN cum * 100 >= n * 90 AND (cum - cnt) * 100 < n * 90 THEN dd END) AS BIGINT) AS p90_days,
      |  (1000000 * MAX(sdd)) // MAX(n) AS mean_ppm_days
      |FROM cum GROUP BY 1 ORDER BY prio""".stripMargin

  // ------------------------------------------------------- backlog age
  /** Open-order backlog aging as of the corpus horizon (max order date):
    * orders still in status 'O' bucketed into the standard 0-30/31-60/
    * 61-90/90+ day aging bands, with counts and exact open value in cents
    * per band — the receivables-style aging report. One scan + one-row
    * horizon broadcast + one map-side rollup. */
  def qBacklogAge(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.table(spark, dir, "orders")
    val hor = o.agg(max(expr("cast(o_orderdate as date)")).as("h"))
    o.where(col("o_orderstatus") === "O")
      .crossJoin(broadcast(hor))
      .select(expr("datediff(h, cast(o_orderdate as date))").cast("long").as("age"),
        expr("cast(round(o_totalprice * 100, 0) as long)").as("cents"))
      .select(when(col("age") <= 30, "00-30")
          .when(col("age") <= 60, "31-60")
          .when(col("age") <= 90, "61-90")
          .otherwise("90+").as("age_band"),
        col("cents"))
      .groupBy("age_band")
      .agg(count(lit(1)).cast("long").as("n_orders"),
        sum("cents").cast("long").as("open_cents"))
      .orderBy("age_band")
  }

  val qBacklogAgeSql: String =
    """WITH hor AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS h FROM orders),
      |a AS (
      |  SELECT CAST(datediff('day', CAST(o_orderdate AS DATE), h) AS BIGINT) AS age,
      |         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
      |  FROM orders CROSS JOIN hor WHERE o_orderstatus = 'O'),
      |b AS (
      |  SELECT CASE WHEN age <= 30 THEN '00-30'
      |              WHEN age <= 60 THEN '31-60'
      |              WHEN age <= 90 THEN '61-90'
      |              ELSE '90+' END AS age_band, cents
      |  FROM a)
      |SELECT age_band, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(cents) AS BIGINT) AS open_cents
      |FROM b GROUP BY 1 ORDER BY age_band""".stripMargin

  // ------------------------------------------------------- hazard curve
  /** Discrete-time survival hazard for view→purchase conversion with
    * RIGHT-CENSORING: users who never purchase exit the risk set at their
    * last observed event (the censoring Kaplan-Meier exists to handle;
    * q_time_to_event ranks only the converters). Reported as the hazard
    * CURVE h(t) = events_t / at-risk_t in exact ppm per day-since-first-
    * view — the same information as the KM product-limit survival curve
    * but with NO floating-point product chain anywhere in the gate (S(t)
    * = Π(1−h) follows offline). At-risk counts come from cumulative
    * exit counts (two-level over DAY buckets), never a per-user scan.
    *
    * 100 TB shape: events collapse to per-user (first_view, first_purchase,
    * last_seen) — one min/max aggregate; the curve is |days| rows. */
  def qHazardCurve(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.table(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        expr("ts div 86400000000000").as("day"))
    val perUser = ev.groupBy("user_id")
      .agg(min(when(col("event_type") === "view", col("day"))).as("fv"),
        min(when(col("event_type") === "purchase", col("day"))).as("fp"),
        max("day").as("last"))
      .where(col("fv").isNotNull)
      // exit time: conversion day for converters (event), last-seen day
      // for the censored; both relative to first view, non-negative
      .select(
        when(col("fp").isNotNull && col("fp") >= col("fv"),
          col("fp") - col("fv")).as("t_event"),
        when(col("fp").isNull, col("last") - col("fv")).as("t_cens"))
      .where(col("t_event").isNotNull || col("t_cens").isNotNull)
      // events + cens + tot all branch from this frame (~5 references):
      // without the cache Spark re-runs the full scan + per-user min/max
      // aggregate per branch (sub-plans are not shared across reuse)
      .cache()
    val events = perUser.where(col("t_event").isNotNull)
      .groupBy(col("t_event").as("t")).agg(count(lit(1)).as("d"))
    val cens = perUser.where(col("t_cens").isNotNull)
      .groupBy(col("t_cens").as("t")).agg(count(lit(1)).as("c"))
    val tot = perUser.agg(count(lit(1)).cast("long").as("n0"))
    // at-risk at t = n0 − (events with t' < t) − (censored with t' < t):
    // exits BEFORE t leave the risk set; same-day exits still count at t
    val spine = events.select("t").union(cens.select("t")).distinct()
    val exits = spine.join(events, Seq("t"), "left")
      .join(cens, Seq("t"), "left")
      .select(col("t"), coalesce(col("d"), lit(0L)).as("d"),
        coalesce(col("c"), lit(0L)).as("c"))
    val wg = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    exits
      .withColumn("exited_before",
        coalesce(sum(col("d") + col("c")).over(wg), lit(0L)))
      .crossJoin(broadcast(tot))
      .select(col("t"), col("d").as("n_events"), col("c").as("n_censored"),
        (col("n0") - col("exited_before")).as("n_at_risk"),
        expr("(1000000 * d) div (n0 - exited_before)").as("hazard_ppm"))
      .where(col("n_events") > 0)
      .orderBy("t")
  }

  val qHazardCurveSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type,
      |         epoch_ns(ts) // 86400000000000 AS day
      |  FROM events),
      |pu AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'view' THEN day END) AS fv,
      |    MIN(CASE WHEN event_type = 'purchase' THEN day END) AS fp,
      |    MAX(day) AS last
      |  FROM ev GROUP BY 1),
      |x AS (
      |  SELECT CASE WHEN fp IS NOT NULL AND fp >= fv THEN fp - fv END AS t_event,
      |         CASE WHEN fp IS NULL THEN last - fv END AS t_cens
      |  FROM pu WHERE fv IS NOT NULL),
      |x2 AS (SELECT * FROM x WHERE t_event IS NOT NULL OR t_cens IS NOT NULL),
      |e AS (SELECT t_event AS t, CAST(COUNT(*) AS BIGINT) AS d
      |      FROM x2 WHERE t_event IS NOT NULL GROUP BY 1),
      |c AS (SELECT t_cens AS t, CAST(COUNT(*) AS BIGINT) AS c
      |      FROM x2 WHERE t_cens IS NOT NULL GROUP BY 1),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n0 FROM x2),
      |spine AS (SELECT t FROM e UNION SELECT t FROM c),
      |ex AS (
      |  SELECT s.t, COALESCE(e.d, 0) AS d, COALESCE(c.c, 0) AS c
      |  FROM spine s LEFT JOIN e ON e.t = s.t LEFT JOIN c ON c.t = s.t),
      |cum AS (
      |  SELECT t, d, c,
      |    CAST(COALESCE(SUM(d + c) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS exited_before
      |  FROM ex)
      |SELECT t, d AS n_events, c AS n_censored,
      |  n0 - exited_before AS n_at_risk,
      |  (1000000 * d) // (n0 - exited_before) AS hazard_ppm
      |FROM cum CROSS JOIN tot
      |WHERE d > 0 ORDER BY t""".stripMargin

  // ----------------------------------------------- position attribution
  /** Position-based (U-shaped) multi-touch attribution — q_attribution's
    * last-touch sibling: within the same 7-day lookback path, the first
    * and last touch each take 40% of the conversion credit and the middle
    * splits 20% evenly (1-touch paths take 100%, 2-touch 50/50 — the
    * standard degenerate cases). Credit is INTEGER MICRO-UNITS per
    * conversion (middle share = 200000 div (n−2), truncation documented —
    * totals are exact, order-free sums). Pathless purchases credit
    * 'organic' in full. Windows key on purchase id (numeric; fan = the
    * lookback path length, bounded by user activity × horizon). */
  def qAttributionPosition(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.table(spark, dir, "events")
    val touches = ev.where(col("event_type") =!= "purchase")
      .select(col("user_id"), col("ts").as("t_ts"),
        col("event_id").as("t_id"), col("event_type").as("channel"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val horizon = 7L * 86400000000000L
    val joined = purchases.join(touches,
      purchases("user_id") === touches("user_id") &&
        col("t_ts") < col("p_ts") && col("t_ts") >= col("p_ts") - horizon,
      "left").cache()
    val wo = Window.partitionBy("p_id")
      .orderBy(expr("t_ts div 1000"), col("t_id"))
    val wn = Window.partitionBy("p_id")
    val credited = joined.where(col("t_id").isNotNull)
      .withColumn("rn", row_number().over(wo).cast("long"))
      .withColumn("n", count(lit(1)).over(wn))
      .select(col("channel"),
        when(col("n") === 1, lit(1000000L))
          .when(col("n") === 2, lit(500000L))
          .when(col("rn") === 1 || col("rn") === col("n"), lit(400000L))
          .otherwise(expr("200000 div (n - 2)")).as("credit"))
    val organic = joined.groupBy("p_id").agg(max("t_id").as("any_touch"))
      .where(col("any_touch").isNull)
      .select(lit("organic").as("channel"), lit(1000000L).as("credit"))
    credited.union(organic)
      .groupBy("channel")
      .agg(count(lit(1)).cast("long").as("n_credits"),
        sum("credit").cast("long").as("credit_micro"))
      .orderBy("channel")
  }

  val qAttributionPositionSql: String =
    """WITH touches AS (
      |  SELECT user_id, epoch_ns(ts) AS t_ts, event_id AS t_id,
      |         event_type AS channel
      |  FROM events WHERE event_type <> 'purchase'),
      |purchases AS (
      |  SELECT user_id, event_id AS p_id, epoch_ns(ts) AS p_ts
      |  FROM events WHERE event_type = 'purchase'),
      |j AS MATERIALIZED (
      |  SELECT p.p_id, t.t_ts, t.t_id, t.channel
      |  FROM purchases p LEFT JOIN touches t
      |    ON t.user_id = p.user_id AND t.t_ts < p.p_ts
      |   AND t.t_ts >= p.p_ts - 604800000000000),
      |ranked AS (
      |  SELECT channel,
      |    CAST(row_number() OVER (PARTITION BY p_id
      |         ORDER BY t_ts // 1000, t_id) AS BIGINT) AS rn,
      |    CAST(COUNT(*) OVER (PARTITION BY p_id) AS BIGINT) AS n
      |  FROM j WHERE t_id IS NOT NULL),
      |credited AS (
      |  SELECT channel,
      |    CASE WHEN n = 1 THEN 1000000
      |         WHEN n = 2 THEN 500000
      |         WHEN rn = 1 OR rn = n THEN 400000
      |         ELSE 200000 // (n - 2) END AS credit
      |  FROM ranked),
      |organic AS (
      |  SELECT 'organic' AS channel, 1000000 AS credit
      |  FROM (SELECT p_id, MAX(t_id) AS any_touch FROM j GROUP BY 1)
      |  WHERE any_touch IS NULL),
      |u AS (SELECT * FROM credited UNION ALL SELECT * FROM organic)
      |SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_credits,
      |  CAST(SUM(credit) AS BIGINT) AS credit_micro
      |FROM u GROUP BY 1 ORDER BY channel""".stripMargin

  // ------------------------------------------------------- tukey fences
  /** Tukey box-plot outlier fences on order value: exact nearest-rank
    * Q1/Q3 (two-level over CENTS-BAND buckets — no global sort), fences at
    * Q1 − 1.5·IQR / Q3 + 1.5·IQR compared in DOUBLED integer units
    * (2·fence = 5·Q1 − 3·Q3 and 5·Q3 − 3·Q1 — no halves, no doubles
    * anywhere), and the outlier counts each side. The box-plot numbers
    * behind every order-value anomaly report. */
  def qTukeyFence(spark: SparkSession, dir: String): DataFrame = {
    val cents = Tables.table(spark, dir, "orders")
      .select(expr("cast(round(o_totalprice * 100, 0) as long)").as("cents"))
      .cache()
    val byV = cents.groupBy("cents").agg(count(lit(1)).as("cnt"))
      .withColumn("band", expr("cents div 10000000"))
    val perB = byV.groupBy("band").agg(sum("cnt").as("bcnt"))
    val wg = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, -1)
    val bpre = perB.select(col("band"),
      coalesce(sum("bcnt").over(wg), lit(0L)).as("bbefore"))
    val wi = Window.partitionBy("band").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = cents.agg(count(lit(1)).cast("long").as("n"))
    val cum = byV.join(bpre, "band")
      .withColumn("cum", col("bbefore") + sum("cnt").over(wi))
      .crossJoin(broadcast(tot))
    def rankAt(q: Long): org.apache.spark.sql.Column =
      (col("cum") * 100 >= col("n") * q) &&
        ((col("cum") - col("cnt")) * 100 < col("n") * q)
    val qs = cum.agg(
      max(when(rankAt(25), col("cents"))).cast("long").as("q1_cents"),
      max(when(rankAt(75), col("cents"))).cast("long").as("q3_cents"))
    cents.crossJoin(broadcast(qs)).crossJoin(broadcast(tot))
      .groupBy("n", "q1_cents", "q3_cents")
      .agg(sum(when(col("cents") * 2 < col("q1_cents") * 5 - col("q3_cents") * 3, 1L)
          .otherwise(0L)).cast("long").as("n_low_outliers"),
        sum(when(col("cents") * 2 > col("q3_cents") * 5 - col("q1_cents") * 3, 1L)
          .otherwise(0L)).cast("long").as("n_high_outliers"))
      .select(col("n"), col("q1_cents"), col("q3_cents"),
        (col("q3_cents") - col("q1_cents")).as("iqr_cents"),
        col("n_low_outliers"), col("n_high_outliers"))
  }

  val qTukeyFenceSql: String =
    """WITH cents AS (
      |  SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents FROM orders),
      |byv AS (SELECT cents, CAST(COUNT(*) AS BIGINT) AS cnt FROM cents GROUP BY 1),
      |b AS (SELECT cents, cnt, cents // 10000000 AS band FROM byv),
      |perb AS (SELECT band, CAST(SUM(cnt) AS BIGINT) AS bcnt FROM b GROUP BY 1),
      |bpre AS (SELECT band,
      |  CAST(COALESCE(SUM(bcnt) OVER (ORDER BY band ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS bbefore
      |  FROM perb),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM cents),
      |cum AS (
      |  SELECT cents, cnt,
      |    bbefore + CAST(SUM(cnt) OVER (PARTITION BY b.band ORDER BY cents
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM b JOIN bpre USING (band)),
      |qs AS (
      |  SELECT
      |    CAST(MAX(CASE WHEN cum * 100 >= n * 25 AND (cum - cnt) * 100 < n * 25 THEN cents END) AS BIGINT) AS q1_cents,
      |    CAST(MAX(CASE WHEN cum * 100 >= n * 75 AND (cum - cnt) * 100 < n * 75 THEN cents END) AS BIGINT) AS q3_cents
      |  FROM cum CROSS JOIN tot)
      |SELECT n, q1_cents, q3_cents, q3_cents - q1_cents AS iqr_cents,
      |  (SELECT CAST(SUM(CASE WHEN c.cents * 2 < qs.q1_cents * 5 - qs.q3_cents * 3 THEN 1 ELSE 0 END) AS BIGINT) FROM cents c) AS n_low_outliers,
      |  (SELECT CAST(SUM(CASE WHEN c.cents * 2 > qs.q3_cents * 5 - qs.q1_cents * 3 THEN 1 ELSE 0 END) AS BIGINT) FROM cents c) AS n_high_outliers
      |FROM qs CROSS JOIN tot""".stripMargin

  // ------------------------------------------------------- purchase cadence
  /** Repeat-purchase cadence: the distribution of days between a user's
    * consecutive purchases — the replenishment-cycle number behind every
    * reorder nudge (q_time_to_event measures first conversion; this
    * measures the repeat rhythm). Per-user lag over purchase events
    * (user-keyed window, µs+id order), day-delta histogram in exact
    * counts + share ppm, deltas capped into a 15+ tail bucket so the
    * report is fixed-width at any scale. */
  def qPurchaseCadence(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(expr("ts div 1000"), col("event_id"))
    val deltas = Tables.table(spark, dir, "events")
      .where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev", lag(expr("ts div 86400000000000"), 1).over(w))
      .where(col("prev").isNotNull)
      .select((expr("ts div 86400000000000") - col("prev")).as("dd"))
      .select(least(col("dd"), lit(15L)).cast("long").as("gap_days"))
    val tot = deltas.agg(count(lit(1)).cast("long").as("n"))
    deltas.groupBy("gap_days").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(tot))
      .select(col("gap_days"), col("cnt").cast("long").as("n_intervals"),
        expr("(1000000 * cnt) div n").as("share_ppm"))
      .orderBy("gap_days")
  }

  val qPurchaseCadenceSql: String =
    """WITH p AS (
      |  SELECT user_id, epoch_ns(ts) AS tns, event_id
      |  FROM events WHERE event_type = 'purchase'),
      |d AS (
      |  SELECT (tns // 86400000000000)
      |       - lag(tns // 86400000000000) OVER (PARTITION BY user_id
      |           ORDER BY tns // 1000, event_id) AS dd
      |  FROM p),
      |g AS (SELECT CAST(LEAST(dd, 15) AS BIGINT) AS gap_days
      |      FROM d WHERE dd IS NOT NULL),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM g)
      |SELECT gap_days, CAST(COUNT(*) AS BIGINT) AS n_intervals,
      |  (1000000 * CAST(COUNT(*) AS BIGINT)) // MAX(n) AS share_ppm
      |FROM g CROSS JOIN tot GROUP BY 1 ORDER BY gap_days""".stripMargin

  // ------------------------------------------------------------ SRM
  /** Sample-ratio mismatch — the experimentation sanity check that runs
    * BEFORE any treatment readout (q_ab_ttest): does the realized
    * assignment split match the designed 50/50? Assignment = user_id
    * parity (the deterministic hash bucket an experiment framework uses);
    * the statistic is the 1-dof chi-square (a−b)²/(a+b), floor-scaled to
    * integer ppm like q_chi2_test. An SRM fires on infra bugs (lossy
    * logging on one arm), not on treatment effects — which is why it gets
    * its own gate. */
  def qAbSrm(spark: SparkSession, dir: String): DataFrame = {
    Tables.table(spark, dir, "events")
      .select(col("user_id")).distinct()
      .select((col("user_id") % 2 === 0).as("arm_a"))
      .agg(sum(when(col("arm_a"), 1L).otherwise(0L)).cast("long").as("n_a"),
        sum(when(col("arm_a"), 0L).otherwise(1L)).cast("long").as("n_b"))
      .select(col("n_a"), col("n_b"),
        expr("cast(floor((((cast(n_a as double) - cast(n_b as double)) * (cast(n_a as double) - cast(n_b as double))) / (cast(n_a as double) + cast(n_b as double))) * 1000000.0) as long)")
          .as("chi2_ppm"))
      // 1-dof chi2 critical value at alpha=0.001 is 10.828: SRM fires
      // above it. Derived from the ONE computed chi2_ppm column (both
      // engines compare the same exact integer) — a second verbatim copy
      // of the statistic could silently drift from the flag.
      .withColumn("srm_detected", col("chi2_ppm") > 10828000L)
  }

  val qAbSrmSql: String =
    """WITH u AS (SELECT DISTINCT user_id FROM events),
      |a AS (
      |  SELECT CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |         CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_b
      |  FROM u),
      |c AS (
      |  SELECT n_a, n_b,
      |    CAST(floor((((CAST(n_a AS DOUBLE) - CAST(n_b AS DOUBLE)) * (CAST(n_a AS DOUBLE) - CAST(n_b AS DOUBLE))) / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))) * 1000000.0) AS BIGINT) AS chi2_ppm
      |  FROM a)
      |SELECT n_a, n_b, chi2_ppm, chi2_ppm > 10828000 AS srm_detected
      |FROM c""".stripMargin

  // ------------------------------------------------------------ CUPED
  /** CUPED variance reduction (Deng et al., public): adjust each user's
    * experiment-period metric by their PRE-period metric, θ = cov(pre,
    * post)/var(pre), and report the variance-reduction ratio — the lever
    * that cuts A/B runtimes 30-50% in practice. Periods = first/second
    * half of the event window (day < 15 vs ≥ 15); metric = per-user event
    * count (exact integer). All five moment sums exact BIGINT; θ and the
    * ratio are one identical-text IEEE row. Var(adjusted) =
    * var(post) − cov²/var(pre) — the closed form, so no second pass over
    * adjusted values is needed. */
  def qCuped(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.table(spark, dir, "events")
      .select(col("user_id"), expr("ts div 86400000000000").as("day"))
    val bounds = days.agg(min("day").as("d0"))
    val pu = days.crossJoin(broadcast(bounds))
      .select(col("user_id"), (col("day") >= col("d0") + 15).as("post"))
      .groupBy("user_id")
      .agg(sum(when(col("post"), 0L).otherwise(1L)).as("x"),
        sum(when(col("post"), 1L).otherwise(0L)).as("y"))
    pu.agg(count(lit(1)).cast("long").as("n"),
        sum("x").cast("long").as("sx"), sum("y").cast("long").as("sy"),
        sum(col("x") * col("y")).cast("long").as("sxy"),
        sum(col("x") * col("x")).cast("long").as("sxx"),
        sum(col("y") * col("y")).cast("long").as("syy"))
      // name the three scaled moments ONCE (cov_n = n·Σxy − Σx·Σy etc.),
      // then derive θ and the ratio from them — verbatim copies of the
      // covariance text in two output columns could silently drift apart
      .select(col("n"),
        expr("cast(n as double)*cast(sxy as double) - cast(sx as double)*cast(sy as double)").as("cov_n"),
        expr("cast(n as double)*cast(sxx as double) - cast(sx as double)*cast(sx as double)").as("varx_n"),
        expr("cast(n as double)*cast(syy as double) - cast(sy as double)*cast(sy as double)").as("vary_n"))
      .select(col("n"),
        (col("cov_n") / col("varx_n")).as("theta"),
        ((col("cov_n") * col("cov_n")) / (col("varx_n") * col("vary_n")))
          .as("variance_reduction"))
  }

  val qCupedSql: String =
    """WITH d AS (
      |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events),
      |b AS (SELECT MIN(day) AS d0 FROM d),
      |pu AS (
      |  SELECT user_id,
      |    CAST(SUM(CASE WHEN day >= d0 + 15 THEN 0 ELSE 1 END) AS BIGINT) AS x,
      |    CAST(SUM(CASE WHEN day >= d0 + 15 THEN 1 ELSE 0 END) AS BIGINT) AS y
      |  FROM d CROSS JOIN b GROUP BY 1),
      |m AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x*y) AS BIGINT) AS sxy,
      |    CAST(SUM(x*x) AS BIGINT) AS sxx,
      |    CAST(SUM(y*y) AS BIGINT) AS syy
      |  FROM pu),
      |v AS (
      |  SELECT n,
      |    CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE) AS cov_n,
      |    CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE) AS varx_n,
      |    CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE) AS vary_n
      |  FROM m)
      |SELECT n,
      |  cov_n / varx_n AS theta,
      |  (cov_n * cov_n) / (varx_n * vary_n) AS variance_reduction
      |FROM v""".stripMargin

  // ---------------------------------------------------------------- HHI
  /** Herfindahl–Hirschman concentration index of revenue by customer —
    * Gini's regulatory sibling (HHI = Σ shareᵢ², 1e6 = monopoly in ppm;
    * the antitrust thresholds live at 0.15/0.25). Per-customer revenue in
    * exact cents; Σcᵢ² carried in DECIMAL(19,0)² = DECIMAL(38,0) — exact
    * for any cent total below 10¹⁹ — so the one IEEE division at the end
    * is the only double. Also reports the top-1 share in exact ppm
    * (max(cᵢ) — an order-free aggregate). */
  def qHhi(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.table(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(sum(expr("cast(round(o_totalprice * 100, 0) as long)")).as("cents"))
    rev.agg(count(lit(1)).cast("long").as("n_customers"),
        sum("cents").cast("long").as("t"),
        max("cents").cast("long").as("max_cents"),
        sum(expr("cast(cents as decimal(19,0)) * cast(cents as decimal(19,0))"))
          .as("scc"))
      .select(col("n_customers"),
        expr("cast(floor((cast(scc as double) / (cast(t as double)*cast(t as double))) * 1000000.0) as long)")
          .as("hhi_ppm"),
        expr("(1000000 * max_cents) div t").as("top1_share_ppm"))
  }

  val qHhiSql: String =
    """WITH rev AS (
      |  SELECT o_custkey,
      |         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |agg AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
      |    CAST(SUM(cents) AS BIGINT) AS t,
      |    CAST(MAX(cents) AS BIGINT) AS max_cents,
      |    SUM(CAST(cents AS DECIMAL(19,0)) * CAST(cents AS DECIMAL(19,0))) AS scc
      |  FROM rev)
      |SELECT n_customers,
      |  CAST(floor((CAST(scc AS DOUBLE) / (CAST(t AS DOUBLE)*CAST(t AS DOUBLE))) * 1000000.0) AS BIGINT) AS hhi_ppm,
      |  (1000000 * max_cents) // t AS top1_share_ppm
      |FROM agg""".stripMargin

  // ----------------------------------------------------- interarrival
  /** Traffic burstiness per event type from inter-arrival times: the
    * coefficient of variation and the Goh–Barabási burstiness
    * B = (σ−μ)/(σ+μ) (−1 = metronome, 0 = Poisson, →1 = heavy bursts) —
    * the number capacity planning reads before sizing stream consumers.
    * Deltas are exact integer MICROSECONDS (µs-truncated event time, §4
    * ordering contract) from one type-keyed lag window; moments are exact
    * BIGINT/decimal (Σd² via DECIMAL(19,0)² — deltas can reach minutes of
    * µs, squares overflow int64); CV and B are one identical-text IEEE
    * row per type.
    *
    * Scale honesty (the qQuantileExact precedent): the lag window sorts
    * RAW event rows per event_type — a bounded-fan shuffle whose per-task
    * volume is corpus/|types| at 100 TB. That is this op's calibration
    * cost, accepted because exact inter-arrival deltas need per-type
    * order; the streaming monitor (st_anomaly) is the 100 TB default and
    * THIS op is what you run offline to size it. A windowed variant
    * (per-(type, hour) lags, dropping one boundary delta per hour) is the
    * scale-out escape hatch if the calibration corpus itself grows. */
  def qInterarrival(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type")
      .orderBy(col("tus"), col("event_id"))
    val deltas = Tables.table(spark, dir, "events")
      .select(col("event_type"), expr("ts div 1000").as("tus"), col("event_id"))
      .withColumn("prev", lag("tus", 1).over(w))
      .where(col("prev").isNotNull)
      .select(col("event_type"), (col("tus") - col("prev")).as("d"))
    deltas.groupBy("event_type")
      .agg(count(lit(1)).cast("long").as("n"),
        sum("d").cast("long").as("sd"),
        sum(expr("cast(d as decimal(19,0)) * cast(d as decimal(19,0))")).as("sdd"))
      .select(col("event_type"), col("n"),
        expr("sd div n").as("mean_us"),
        expr("sqrt((cast(sdd as double) - (cast(sd as double)*cast(sd as double))/cast(n as double)) / (cast(n as double) - 1.0)) / (cast(sd as double)/cast(n as double))")
          .as("cv"),
        expr("(sqrt((cast(sdd as double) - (cast(sd as double)*cast(sd as double))/cast(n as double)) / (cast(n as double) - 1.0)) - cast(sd as double)/cast(n as double)) / (sqrt((cast(sdd as double) - (cast(sd as double)*cast(sd as double))/cast(n as double)) / (cast(n as double) - 1.0)) + cast(sd as double)/cast(n as double))")
          .as("burstiness"))
      .orderBy("event_type")
  }

  val qInterarrivalSql: String =
    """WITH e AS (
      |  SELECT event_type, epoch_ns(ts) // 1000 AS tus, event_id FROM events),
      |d AS (
      |  SELECT event_type,
      |    tus - lag(tus) OVER (PARTITION BY event_type ORDER BY tus, event_id) AS d
      |  FROM e),
      |m AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(d) AS BIGINT) AS sd,
      |    SUM(CAST(d AS DECIMAL(19,0)) * CAST(d AS DECIMAL(19,0))) AS sdd
      |  FROM d WHERE d IS NOT NULL GROUP BY 1)
      |SELECT event_type, n, sd // n AS mean_us,
      |  sqrt((CAST(sdd AS DOUBLE) - (CAST(sd AS DOUBLE)*CAST(sd AS DOUBLE))/CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) / (CAST(sd AS DOUBLE)/CAST(n AS DOUBLE)) AS cv,
      |  (sqrt((CAST(sdd AS DOUBLE) - (CAST(sd AS DOUBLE)*CAST(sd AS DOUBLE))/CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) - CAST(sd AS DOUBLE)/CAST(n AS DOUBLE)) / (sqrt((CAST(sdd AS DOUBLE) - (CAST(sd AS DOUBLE)*CAST(sd AS DOUBLE))/CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) + CAST(sd AS DOUBLE)/CAST(n AS DOUBLE)) AS burstiness
      |FROM m ORDER BY event_type""".stripMargin

  // ------------------------------------------------------- basket lift
  /** Market-basket association: top part pairs by LIFT (observed
    * co-purchase rate over the independence expectation), the classic
    * "bought together" co-occurrence mining. Pair generation is an
    * equi-join on l_orderkey — fan bounded by basket size (≤ 7 lines
    * here), never a part × part product; lift is exact integer ppm
    * (10⁶·both·n div (cnt1·cnt2)). The support floor is RELATIVE
    * (both ≥ 2) because an absolute threshold that's dense at sf0.01 is
    * empty at sf0.1 (measured: both≥3 → 63 pairs vs 2) — the same
    * scale-honesty lesson as q_triangle_count's rank-based edge set. */
  def qBasketLift(spark: SparkSession, dir: String): DataFrame = {
    // one distinct-items scan feeds pair generation (twice), supports and
    // the basket total — cache it instead of re-scanning lineitem 5×
    val items = Tables.table(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      .cache()
    val supp = items.groupBy("pk").agg(count(lit(1)).as("cnt"))
    val tot = items.agg(countDistinct("ok").cast("long").as("n"))
    val pairs = items.as("a").join(items.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("p1"), col("b.pk").as("p2"))
      .agg(count(lit(1)).as("n_both"))
      .where(col("n_both") >= 2)
    pairs
      .join(supp.select(col("pk").as("p1"), col("cnt").as("cnt1")), "p1")
      .join(supp.select(col("pk").as("p2"), col("cnt").as("cnt2")), "p2")
      .crossJoin(broadcast(tot))
      .select(col("p1"), col("p2"), col("n_both"), col("cnt1"), col("cnt2"),
        expr("(1000000 * n_both * n) div (cnt1 * cnt2)").as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("p1"), col("p2"))
      .limit(20)
  }

  val qBasketLiftSql: String =
    """WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |supp AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS cnt FROM items GROUP BY 1),
      |tot AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n FROM items),
      |pairs AS (
      |  SELECT a.pk AS p1, b.pk AS p2, CAST(COUNT(*) AS BIGINT) AS n_both
      |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
      |SELECT p1, p2, n_both, s1.cnt AS cnt1, s2.cnt AS cnt2,
      |       (1000000 * n_both * n) // (s1.cnt * s2.cnt) AS lift_ppm
      |FROM pairs
      |JOIN supp s1 ON s1.pk = p1
      |JOIN supp s2 ON s2.pk = p2
      |CROSS JOIN tot
      |ORDER BY lift_ppm DESC, p1, p2 LIMIT 20""".stripMargin

  // ------------------------------------------------------------ runs test
  /** Wald–Wolfowitz runs test for randomness of the daily traffic
    * direction: sign of the day-over-day delta of daily event counts
    * (zeros dropped, the standard treatment), runs R = 1 + sign changes,
    * normal approximation z = (R − μ)/σ with μ, σ² the exact two-sample
    * run moments. Everything integer until the one identical-text IEEE z
    * row. The series is |days| AGGREGATE rows — the lag/change windows are
    * global but bounded by the time range (whitelisted two-level shape). */
  def qRunsTest(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.table(spark, dir, "events")
      .select(expr("ts div 86400000000000").as("day"))
      .groupBy("day").agg(count(lit(1)).as("x"))
    val wd = Window.orderBy("day")
    val signs = daily
      .withColumn("prev", lag("x", 1).over(wd))
      .where(col("prev").isNotNull && col("x") =!= col("prev"))
      .select(col("day"), when(col("x") > col("prev"), 1L).otherwise(-1L).as("s"))
    val ws = Window.orderBy("day")
    signs
      .withColumn("sprev", lag("s", 1).over(ws))
      .select(col("s"),
        when(col("sprev").isNull || col("s") =!= col("sprev"), 1L)
          .otherwise(0L).as("newrun"))
      .agg(sum(when(col("s") === 1L, 1L).otherwise(0L)).cast("long").as("n1"),
        sum(when(col("s") === -1L, 1L).otherwise(0L)).cast("long").as("n2"),
        sum("newrun").cast("long").as("runs"))
      .select(col("n1"), col("n2"), col("runs"),
        expr("(cast(runs as double) - ((2.0*cast(n1 as double)*cast(n2 as double))/(cast(n1 as double)+cast(n2 as double)) + 1.0)) / sqrt(((2.0*cast(n1 as double)*cast(n2 as double))*(2.0*cast(n1 as double)*cast(n2 as double) - cast(n1 as double) - cast(n2 as double))) / (((cast(n1 as double)+cast(n2 as double))*(cast(n1 as double)+cast(n2 as double)))*(cast(n1 as double)+cast(n2 as double)-1.0)))")
          .as("z"))
  }

  val qRunsTestSql: String =
    """WITH daily AS (
      |  SELECT epoch_ns(ts) // 86400000000000 AS day,
      |         CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1),
      |d AS (SELECT day, x, lag(x) OVER (ORDER BY day) AS prev FROM daily),
      |s AS (SELECT day, CASE WHEN x > prev THEN 1 ELSE -1 END AS s
      |      FROM d WHERE prev IS NOT NULL AND x <> prev),
      |r AS (SELECT s, CASE WHEN lag(s) OVER (ORDER BY day) IS NULL
      |                       OR s <> lag(s) OVER (ORDER BY day)
      |                     THEN 1 ELSE 0 END AS newrun
      |      FROM s),
      |agg AS (
      |  SELECT CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |         CAST(SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
      |         CAST(SUM(newrun) AS BIGINT) AS runs
      |  FROM r)
      |SELECT n1, n2, runs,
      |  (CAST(runs AS DOUBLE) - ((2.0*CAST(n1 AS DOUBLE)*CAST(n2 AS DOUBLE))/(CAST(n1 AS DOUBLE)+CAST(n2 AS DOUBLE)) + 1.0)) / sqrt(((2.0*CAST(n1 AS DOUBLE)*CAST(n2 AS DOUBLE))*(2.0*CAST(n1 AS DOUBLE)*CAST(n2 AS DOUBLE) - CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE))) / (((CAST(n1 AS DOUBLE)+CAST(n2 AS DOUBLE))*(CAST(n1 AS DOUBLE)+CAST(n2 AS DOUBLE)))*(CAST(n1 AS DOUBLE)+CAST(n2 AS DOUBLE)-1.0))) AS z
      |FROM agg""".stripMargin

  // ------------------------------------------------ seasonal decomposition
  /** Additive seasonal decomposition of the daily revenue series — the
    * classic trend / day-of-week-seasonal / residual split (STL's additive
    * skeleton) the time-series family was still missing: q_exp_smooth
    * forecasts the level, q_autocorr measures periodicity, q_control_chart
    * bounds noise — this one EXPLAINS a series by separating the weekly
    * rhythm from the trend before anomaly hunting. Per full-window day:
    * cents (exact), trend = centered 7-day mean, seasonal = mean day-of-week
    * deviation, residual = cents − trend − seasonal.
    *
    * Numeric contract (the q_control_chart pattern): everything that
    * crosses an aggregation is an exact BIGINT — daily cents, the centered
    * 7-day SUM, and the ×7-scaled detrended value (7·cents − sum7, exact
    * integer — no double ever sums across rows); every double is derived
    * from those integers by identical-text IEEE expressions in both
    * engines, so the gate hash-matches bit-exact.
    *
    * Shape: one shuffle to |days| aggregate rows; the centered window and
    * the 7-row day-of-week join run over that aggregate frame (two-level —
    * no raw-row global window, PlanAuditSpec-whitelisted like
    * q_control_chart's lag). At 100 TB the daily rollup is the only
    * data-scale pass. */
  def qSeasonalDecompose(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.table(spark, dir, "events")
      .select(expr("ts div 86400000000000").as("day"),
        expr("cast(round(value * 100, 0) as long)").as("c"))
      .groupBy("day").agg(sum("c").cast("long").as("cents"))
    // RANGE frame over the day VALUE, not a 7-ROW frame: with a calendar
    // gap a row frame would silently mix non-adjacent weeks into one
    // "week" and the n7 guard could not tell; RANGE + n7=7 enforces that
    // all seven calendar days exist (identical frame text in the oracle)
    val w7 = Window.orderBy("day").rangeBetween(-3, 3)
    val full = daily
      .withColumn("s7", sum("cents").over(w7).cast("long"))
      .withColumn("n7", count(lit(1)).over(w7).cast("long"))
      .where(col("n7") === 7) // edge days / gapped weeks lack a full window
      .withColumn("dx7", expr("7 * cents - s7")) // detrended ×7, exact int
      .withColumn("dow", expr("day % 7"))
    val seas = full.groupBy("dow")
      .agg(sum("dx7").cast("long").as("sdx"),
        count(lit(1)).cast("long").as("cnt"))
      .select(col("dow"),
        expr("cast(sdx as double) / (7.0 * cast(cnt as double))").as("seasonal"))
    full.join(broadcast(seas), "dow")
      .select(col("day"), col("cents"),
        expr("cast(s7 as double) / 7.0").as("trend"),
        col("seasonal"),
        expr("cast(dx7 as double) / 7.0 - seasonal").as("residual"))
      .orderBy("day")
  }

  val qSeasonalDecomposeSql: String =
    """WITH daily AS (
      |  SELECT epoch_ns(ts) // 86400000000000 AS day,
      |         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY 1),
      |t AS (
      |  SELECT day, cents,
      |    CAST(SUM(cents) OVER w AS BIGINT) AS s7,
      |    CAST(COUNT(*) OVER w AS BIGINT) AS n7
      |  FROM daily
      |  WINDOW w AS (ORDER BY day RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |f AS (
      |  SELECT day, cents, s7, 7 * cents - s7 AS dx7, day % 7 AS dow
      |  FROM t WHERE n7 = 7),
      |seas AS (
      |  SELECT dow,
      |    CAST(SUM(dx7) AS DOUBLE) / (7.0 * CAST(COUNT(*) AS DOUBLE)) AS seasonal
      |  FROM f GROUP BY 1)
      |SELECT day, cents,
      |  CAST(s7 AS DOUBLE) / 7.0 AS trend,
      |  seasonal,
      |  CAST(dx7 AS DOUBLE) / 7.0 - seasonal AS residual
      |FROM f JOIN seas USING (dow)
      |ORDER BY day""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_seasonal_decompose" -> qSeasonalDecompose,
    "q_runs_test" -> qRunsTest,
    "q_anova" -> qAnova,
    "q_spearman" -> qSpearman,
    "q_abc_analysis" -> qAbcAnalysis,
    "q_growth_accounting" -> qGrowthAccounting,
    "q_cycle_time" -> qCycleTime,
    "q_hazard_curve" -> qHazardCurve,
    "q_attribution_position" -> qAttributionPosition,
    "q_tukey_fence" -> qTukeyFence,
    "q_purchase_cadence" -> qPurchaseCadence,
    "q_ab_srm" -> qAbSrm,
    "q_cuped" -> qCuped,
    "q_hhi" -> qHhi,
    "q_interarrival" -> qInterarrival,
    "q_backlog_age" -> qBacklogAge,
    "q_control_chart" -> qControlChart,
    "q_chi2_test" -> qChi2Test,
    "q_mann_whitney" -> qMannWhitney,
    "q_ks_test" -> qKsTest,
    "q_gini" -> qGini,
    "q_autocorr" -> qAutocorr,
    "q_basket_lift" -> qBasketLift)

  val oracles: Map[String, String] = Map(
    "q_seasonal_decompose" -> qSeasonalDecomposeSql,
    "q_runs_test" -> qRunsTestSql,
    "q_anova" -> qAnovaSql,
    "q_spearman" -> qSpearmanSql,
    "q_abc_analysis" -> qAbcAnalysisSql,
    "q_growth_accounting" -> qGrowthAccountingSql,
    "q_cycle_time" -> qCycleTimeSql,
    "q_hazard_curve" -> qHazardCurveSql,
    "q_attribution_position" -> qAttributionPositionSql,
    "q_tukey_fence" -> qTukeyFenceSql,
    "q_purchase_cadence" -> qPurchaseCadenceSql,
    "q_ab_srm" -> qAbSrmSql,
    "q_cuped" -> qCupedSql,
    "q_hhi" -> qHhiSql,
    "q_interarrival" -> qInterarrivalSql,
    "q_backlog_age" -> qBacklogAgeSql,
    "q_control_chart" -> qControlChartSql,
    "q_chi2_test" -> qChi2TestSql,
    "q_mann_whitney" -> qMannWhitneySql,
    "q_ks_test" -> qKsTestSql,
    "q_gini" -> qGiniSql,
    "q_autocorr" -> qAutocorrSql,
    "q_basket_lift" -> qBasketLiftSql)
}
