package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.2 addition (round 4): ordered event-funnel analysis — the classic
  * product-analytics query (view → click-after-view → purchase-after-click)
  * the reference's SQL surface serves via DuckDB (reference
  * IcebergConnection.py:113-120 arbitrary-SELECT path).
  *
  * Semantics: stage 1 = user has a view; stage 2 = a click STRICTLY after
  * the first view; stage 3 = a purchase strictly after the first qualifying
  * click. Earliest-qualifying-event semantics make the result deterministic
  * and SQL-oracle-able.
  *
  * Plan shape: three min-aggregates + three joins, every one keyed on
  * user_id — all six operators share ONE hash partitioning, so at scale the
  * exchange happens once and the rest is co-partitioned (Spark reuses the
  * child distribution; no broadcast of anything corpus-sized). `ts` stays
  * integer nanoseconds end-to-end (see SURVEY.md §4 ns-timestamp rule).
  */
object Events {

  /** Per-user funnel depth (0–3) plus the stage timestamps (µs, nullable).
    * Users enter from the events table itself — depth 0 means "active but
    * never viewed". */
  def qFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.table(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
    val v = ev.where(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("tv"))
    val c = ev.where(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .where(col("ts") > col("tv"))
      .groupBy("user_id").agg(min(col("ts")).as("tc"))
    val p = ev.where(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .where(col("ts") > col("tc"))
      .groupBy("user_id").agg(min(col("ts")).as("tp"))
    ev.select("user_id").distinct()
      .join(v, Seq("user_id"), "left")
      .join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"),
        when(col("tp").isNotNull, 3)
          .when(col("tc").isNotNull, 2)
          .when(col("tv").isNotNull, 1).otherwise(0).as("stage"),
        expr("tv div 1000").as("tv_us"),
        expr("tc div 1000").as("tc_us"),
        expr("tp div 1000").as("tp_us"))
      .orderBy("user_id")
  }

  val qFunnelSql: String =
    """WITH ev AS (SELECT user_id, event_type, epoch_ns(ts) AS ns FROM events),
      |v AS (SELECT user_id, MIN(ns) AS tv FROM ev WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT ev.user_id, MIN(ns) AS tc FROM ev JOIN v USING (user_id)
      |      WHERE event_type = 'click' AND ns > tv GROUP BY 1),
      |p AS (SELECT ev.user_id, MIN(ns) AS tp FROM ev JOIN c USING (user_id)
      |      WHERE event_type = 'purchase' AND ns > tc GROUP BY 1)
      |SELECT u.user_id,
      |  CASE WHEN tp IS NOT NULL THEN 3 WHEN tc IS NOT NULL THEN 2
      |       WHEN tv IS NOT NULL THEN 1 ELSE 0 END AS stage,
      |  tv // 1000 AS tv_us, tc // 1000 AS tc_us, tp // 1000 AS tp_us
      |FROM (SELECT DISTINCT user_id FROM ev) u
      |LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
      |LEFT JOIN p USING (user_id)
      |ORDER BY user_id""".stripMargin

  /** Event path mining: the top-20 3-step event-type sequences users
    * actually take (clickstream path analysis — the other classic
    * product-analytics query besides the funnel). Consecutive triples come
    * from lead() windows partitioned BY USER (hash-partitioned, bounded
    * per-user state — never a global ordering), then one map-side-combined
    * count. Ties rank by path text so the top-k is deterministic. */
  def qEventPaths(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.table(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .where(col("e2").isNotNull && col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path")).limit(20)
  }

  val qEventPathsSql: String =
    """WITH s AS (
      |  SELECT user_id, event_type,
      |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
      |    lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
      |  FROM events)
      |SELECT event_type || '>' || e2 || '>' || e3 AS path, COUNT(*) AS n
      |FROM s WHERE e2 IS NOT NULL AND e3 IS NOT NULL
      |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin

  /** Cohort retention triangle: users grouped by first-activity week,
    * counted in each subsequent week they return — THE product-analytics
    * retention query. Every stage is keyed on user_id (distinct → min →
    * join all share one hash partitioning; Spark reuses the exchange), and
    * the final (cohort, offset) rollup is |weeks|² rows. Weeks are integer
    * day-bucket math over ns timestamps (§4 rule — no timezone drift). */
  def qRetention(spark: SparkSession, dir: String): DataFrame = {
    val uw = Tables.table(spark, dir, "events")
      .select(col("user_id"), expr("ts div 86400000000000 div 7").as("week"))
      .distinct()
    val cohort = uw.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    uw.join(cohort, Seq("user_id")) // co-partitioned: both sides keyed on user_id
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  val qRetentionSql: String =
    """WITH uw AS (
      |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 // 7 AS week
      |  FROM events),
      |c AS (SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY 1)
      |SELECT c.cohort_week, uw.week - c.cohort_week AS week_offset,
      |  COUNT(*) AS n_users
      |FROM uw JOIN c USING (user_id)
      |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin

  /** Gaps-and-islands: per-user runs of consecutive active DAYS (an island =
    * a maximal streak). The classic pattern: distinct active days → day −
    * row_number() is constant within a consecutive run → group on it. Both
    * windows partition on user_id (a numeric, bounded-fan key — never
    * content-derived; per-user state is days, not events), and every stage
    * shares the one user_id hash partitioning. Day buckets are integer
    * ns-arithmetic (§4 rule). */
  def qGapsIslands(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("day")
    val days = Tables.table(spark, dir, "events")
      .select(col("user_id"), expr("ts div 86400000000000").as("day"))
      .distinct()
    days
      .withColumn("grp", col("day") - row_number().over(w))
      .groupBy(col("user_id"), col("grp")).agg(count(lit(1)).as("run"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_islands"),
        max(col("run")).as("longest_run"),
        sum(col("run")).cast("long").as("active_days"))
      .orderBy("user_id")
  }

  val qGapsIslandsSql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day
      |  FROM events),
      |isl AS (
      |  SELECT user_id,
      |    day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
      |  FROM days),
      |runs AS (SELECT user_id, grp, COUNT(*) AS run FROM isl GROUP BY 1, 2)
      |SELECT user_id, COUNT(*) AS n_islands, MAX(run) AS longest_run,
      |  CAST(SUM(run) AS BIGINT) AS active_days
      |FROM runs GROUP BY 1 ORDER BY user_id""".stripMargin

  /** EXACT distinct-user counts per event type via bitmap aggregation (the
    * ClickHouse/Doris bitmap trick): user_id maps to (word = id div 64,
    * bit = id mod 64); bit_or collapses each 64-id block to one long, and
    * the distinct count is the popcount sum. Why it matters at 100 TB:
    * COUNT(DISTINCT) shuffles every raw (group, id) pair once per query,
    * while the bitmap shuffle is bounded by |id-space|/64 rows per group —
    * and the per-group bitmap words are REUSABLE partial states (mergeable
    * across partitions, days, or incremental refreshes by further bit_or).
    * Both aggregates map-side combine; shiftleft is pure bit math (no ANSI
    * overflow — wrap is the point). Oracle = plain COUNT(DISTINCT), proving
    * the bitmap path exact, not approximate. */
  def qBitmapDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "events")
      .select(col("event_type"), expr("user_id div 64").as("word"),
        expr("shiftleft(1L, cast(user_id % 64 as int))").as("bit"))
      .groupBy("event_type", "word")
      .agg(expr("bit_or(bit)").as("bm"))
      .groupBy("event_type")
      .agg(expr("cast(sum(bit_count(bm)) as bigint)").as("n_distinct"))
      .orderBy("event_type")

  val qBitmapDistinctSql: String =
    """SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin

  /** Heavy-hitter users via a count-min sketch, hash-gated by in-plan bound
    * checks (the q_approx_distinct pattern: the oracle pins the EXACT
    * counts and literal-true booleans; Spark additionally proves its CMS
    * estimates honor the sketch's guarantees inside the plan).
    *
    * The sketch is d=4 rows × w=1024 buckets: each event contributes +1 at
    * bucket xxhash64(user_id, r) mod w per row r. Built as ONE map-side-
    * combined aggregate — per partition at most d·w=4096 partial rows cross
    * the shuffle regardless of corpus size, which is the whole point: a
    * COUNT(*) GROUP BY user_id shuffles |users| rows, the CMS shuffles a
    * CONSTANT, and sketches from different days/batches merge by cell-wise
    * addition (the mergeable-summaries property streaming monitoring needs).
    * Estimates: est(u) = min over r of cell[r][h_r(u)] — never under the
    * true count (overest_ok), and within 4·N/w of it unless ALL d rows
    * collide badly (P ≤ (1/4)^d by Markov — bound_ok; deterministic here
    * with fixed data + seeded hashes, verified at sf0.001/0.01/0.1).
    * Candidates come from the exact top-20 so the oracle can pin them;
    * at 100 TB the candidate stream comes from per-partition local top-k
    * and the sketch is what keeps cross-batch merging cheap. */
  def qCmsTopk(spark: SparkSession, dir: String): DataFrame = {
    val d = 4
    val w = 1024
    val ev = Tables.table(spark, dir, "events").select("user_id")
    val hashes = array((0 until d).map(r =>
      pmod(xxhash64(col("user_id"), lit(r)), lit(w.toLong))): _*)
    val sketch = ev.select(posexplode(hashes).as(Seq("r", "bucket")))
      .groupBy("r", "bucket").agg(count(lit(1)).as("c"))
    val nEvents = ev.agg(count(lit(1)).as("n_events"))
    val top = ev.groupBy("user_id").agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("user_id")).limit(20)
    top
      .select(col("user_id"), col("exact_n"),
        posexplode(hashes).as(Seq("r", "bucket")))
      .join(broadcast(sketch), Seq("r", "bucket"))
      .groupBy("user_id", "exact_n").agg(min(col("c")).as("cms_est"))
      .crossJoin(broadcast(nEvents))
      .select(col("user_id"), col("exact_n"),
        (col("cms_est") >= col("exact_n")).as("overest_ok"),
        (col("cms_est").cast("double") <= col("exact_n").cast("double")
          + lit(4.0) * col("n_events").cast("double") / lit(w.toDouble))
          .as("bound_ok"))
      .orderBy(col("exact_n").desc, col("user_id"))
  }

  val qCmsTopkSql: String =
    """WITH top AS (
      |  SELECT user_id, COUNT(*) AS exact_n FROM events
      |  GROUP BY 1 ORDER BY exact_n DESC, user_id LIMIT 20)
      |SELECT user_id, exact_n, true AS overest_ok, true AS bound_ok
      |FROM top ORDER BY exact_n DESC, user_id""".stripMargin

  /** Experiment readout: Welch's two-sample t-test on `value` between the
    * two arms of a deterministic assignment (variant = user_id % 2 — in
    * production the admit-hash on user_id, same contract). Everything
    * derives from THREE mergeable sufficient statistics per arm (n, Σx,
    * Σx²) computed in ONE map-side-combined aggregate pass — the textbook
    * "statistics at 100 TB" shape: no sort, no window, two rows cross the
    * final exchange. Sums are decimal-accumulated (§4 rule: partition order
    * must not move the fp result), and mean/var/t/df are scalar arithmetic
    * on the two finished rows. Welch (unequal variances) rather than pooled
    * Student: arm sizes and variances are never equal in practice. */
  def qAbTtest(spark: SparkSession, dir: String): DataFrame = {
    // BOTH arms' sufficient stats in ONE aggregate over ONE scan
    // (conditional aggregates, no per-arm branch-and-join — a two-branch
    // plan would scan events twice for a 1-row result)
    def armAggs(v: Int): Seq[org.apache.spark.sql.Column] = {
      val in = (col("user_id") % 2).cast("int") === v
      Seq(
        count(when(in, 1)).as(s"n$v"),
        expr(s"cast(sum(case when user_id % 2 = $v then cast(value as decimal(30,6)) end) as double)").as(s"sx$v"),
        expr(s"cast(sum(case when user_id % 2 = $v then cast(round(value * value, 6) as decimal(30,7)) end) as double)").as(s"sxx$v"))
    }
    val aggs: Seq[org.apache.spark.sql.Column] = armAggs(0) ++ armAggs(1)
    Tables.table(spark, dir, "events")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("n0"), col("n1"),
        (col("sx0") / col("n0")).as("m0"), (col("sx1") / col("n1")).as("m1"),
        // sample variance from sufficient stats: (Σx² − (Σx)²/n) / (n−1)
        ((col("sxx0") - col("sx0") * col("sx0") / col("n0")) / (col("n0") - 1)).as("v0"),
        ((col("sxx1") - col("sx1") * col("sx1") / col("n1")) / (col("n1") - 1)).as("v1"))
      .select(col("n0"), col("n1"),
        round(col("m0"), 6).as("mean_a"), round(col("m1"), 6).as("mean_b"),
        round((col("m0") - col("m1"))
          / sqrt(col("v0") / col("n0") + col("v1") / col("n1")), 6).as("t_stat"),
        // Welch–Satterthwaite degrees of freedom
        round(pow(col("v0") / col("n0") + col("v1") / col("n1"), 2)
          / (pow(col("v0") / col("n0"), 2) / (col("n0") - 1)
            + pow(col("v1") / col("n1"), 2) / (col("n1") - 1)), 2).as("df"),
        (abs((col("m0") - col("m1"))
          / sqrt(col("v0") / col("n0") + col("v1") / col("n1"))) > 1.96)
          .as("significant_95"))
  }

  val qAbTtestSql: String =
    """WITH arms AS (
      |  SELECT CAST(user_id % 2 AS INT) AS variant, COUNT(*) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(round(value * value, 6) AS DECIMAL(30,7))) AS DOUBLE) AS sxx
      |  FROM events GROUP BY 1),
      |st AS (
      |  SELECT variant, n, sx / n AS mean,
      |    (sxx - sx * sx / n) / (n - 1) AS variance
      |  FROM arms),
      |j AS (
      |  SELECT a.n AS n0, b.n AS n1, a.mean AS m0, b.mean AS m1,
      |    a.variance AS v0, b.variance AS v1
      |  FROM st a, st b WHERE a.variant = 0 AND b.variant = 1)
      |SELECT n0, n1, round(m0, 6) AS mean_a, round(m1, 6) AS mean_b,
      |  round((m0 - m1) / sqrt(v0 / n0 + v1 / n1), 6) AS t_stat,
      |  round(pow(v0 / n0 + v1 / n1, 2)
      |    / (pow(v0 / n0, 2) / (n0 - 1) + pow(v1 / n1, 2) / (n1 - 1)), 2) AS df,
      |  abs((m0 - m1) / sqrt(v0 / n0 + v1 / n1)) > 1.96 AS significant_95
      |FROM j""".stripMargin

  /** Theta/KMV sketches with SET ALGEBRA — the capability HLL lacks:
    * intersect two distinct-count sketches (Dasgupta et al., the DataSketches
    * theta model, simplified to k-minimum-values). Members are (user_id,
    * active-day) pairs; sets are event types; the query estimates each
    * set's cardinality AND their intersection from k=128-value sketches,
    * then proves the estimates in-plan against exact counts (the
    * q_approx_distinct gating pattern — the oracle pins the exact numbers
    * and literal-true bound booleans).
    *
    * Scale shape: the sketch is the k smallest hash-values per set — a
    * rank ≤ k window on a bounded-fan key (event_type), which Spark turns
    * into a map-side Partial WindowGroupLimit: each partition ships AT MOST
    * k rows per set, so the shuffle is k·|sets| regardless of corpus size,
    * and sketches merge by k-min union (mergeable-summaries, same contract
    * as the CMS). θ = k-th minimum as a fraction of hash space;
    * est = (k−1)/θ; intersection: common sketch hashes below θ∩ = min(θᵢ)
    * scaled by 1/θ∩ — pure column algebra over two 128-row frames. */
  def qThetaSketch(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = 128
    // members feeds THREE consumers (sketch build, exact per-set counts,
    // exact intersection) — cache the distinct member table instead of
    // rescanning events per consumer (verified: 6 scans without it)
    val members = Tables.table(spark, dir, "events")
      .where(col("event_type").isin("click", "view"))
      .select(col("event_type"),
        col("user_id"), expr("ts div 86400000000000").as("day"))
      .distinct().cache()
    // u = hash mapped to (0,1): signed-long / 2^64 + 0.5 — order-isomorphic
    // to the unsigned hash order
    val hashed = members.select(col("event_type"),
      xxhash64(col("user_id"), col("day")).as("h"))
      .withColumn("u", col("h").cast("double") / lit(math.pow(2, 64)) + lit(0.5))
    val w = Window.partitionBy("event_type").orderBy("u")
    val sketch = hashed.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k).cache()
    val stats = sketch.groupBy("event_type")
      .agg(count(lit(1)).as("n_kept"), max(col("u")).as("theta"))
      .withColumn("est",
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit(k - 1) / col("theta")))
    val exact = members.groupBy("event_type").agg(count(lit(1)).as("exact_n"))
    val perSet = stats.join(exact, Seq("event_type"))
      .select(col("event_type").as("set_name"), col("exact_n"),
        (when(col("exact_n") < k, col("est") === col("exact_n").cast("double"))
          .otherwise(abs(col("est") - col("exact_n")) / col("exact_n") <= 0.35))
          .as("within_bound"))
    // intersection: common hashes below the combined θ, scaled back
    val s1 = sketch.where(col("event_type") === "click")
      .select(col("h"), col("u"))
    val s2 = sketch.where(col("event_type") === "view").select(col("h"))
    val thetas = stats.agg(min(
      when(col("n_kept") < k, lit(1.0)).otherwise(col("theta"))).as("theta_c"))
    val interEst = s1.join(s2, "h").crossJoin(broadcast(thetas))
      .where(col("u") < col("theta_c"))
      .groupBy(col("theta_c"))
      .agg(count(lit(1)).as("n_common"))
      .select((col("n_common") / col("theta_c")).as("est"))
    val interExact = members.groupBy("user_id", "day")
      .agg(countDistinct(col("event_type")).as("nt"))
      .where(col("nt") === 2)
      .agg(count(lit(1)).as("exact_n"))
    val inter = interExact.crossJoin(broadcast(interEst))
      .select(lit("click&view").as("set_name"), col("exact_n"),
        (abs(col("est") - col("exact_n")) / col("exact_n") <= 0.5)
          .as("within_bound"))
    perSet.unionByName(inter).orderBy("set_name")
  }

  val qThetaSketchSql: String =
    """WITH p AS (
      |  SELECT DISTINCT event_type, user_id, epoch_ns(ts) // 86400000000000 AS day
      |  FROM events WHERE event_type IN ('click', 'view')),
      |e AS (SELECT event_type AS set_name, COUNT(*) AS exact_n FROM p GROUP BY 1),
      |i AS (SELECT 'click&view' AS set_name, COUNT(*) AS exact_n FROM (
      |  SELECT user_id, day FROM p GROUP BY user_id, day
      |  HAVING COUNT(DISTINCT event_type) = 2))
      |SELECT set_name, exact_n, true AS within_bound
      |FROM (SELECT * FROM e UNION ALL SELECT * FROM i)
      |ORDER BY set_name""".stripMargin

  /** Windowed funnel (ClickHouse `windowFunnel` semantics): conversion
    * depth per user where every step must land within ONE HOUR of the
    * user's first view AND strictly after the previous step — the
    * time-bounded variant of q_funnel ("did they convert", vs "did they
    * convert while the session was hot"). Output is the funnel histogram
    * (users per depth) plus per-depth earliest-conversion medians... kept
    * simple: counts + decimal-exact mean time-to-convert in µs.
    *
    * Same scale shape as q_funnel: three min-aggregates + joins ALL keyed
    * on user_id — one exchange, everything else co-partitioned; the window
    * constraint is pure column algebra on integer-ns timestamps (§4 rule,
    * no timestamp arithmetic drift). */
  def qWindowFunnel(spark: SparkSession, dir: String): DataFrame = {
    val windowNs = 3600000000000L // 1 hour
    val ev = Tables.table(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
    val v = ev.where(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("tv"))
    val c = ev.where(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .where(col("ts") > col("tv") && col("ts") <= col("tv") + windowNs)
      .groupBy("user_id").agg(min(col("ts")).as("tc"), min(col("tv")).as("tv2"))
    val p = ev.where(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .where(col("ts") > col("tc") && col("ts") <= col("tv2") + windowNs)
      .groupBy("user_id").agg(min(col("ts")).as("tp"))
    ev.select("user_id").distinct()
      .join(v, Seq("user_id"), "left")
      .join(c.select("user_id", "tc"), Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(
        when(col("tp").isNotNull, 3)
          .when(col("tc").isNotNull, 2)
          .when(col("tv").isNotNull, 1).otherwise(0).as("depth"),
        col("tv"), col("tp"))
      .groupBy("depth")
      .agg(count(lit(1)).as("n_users"),
        expr("cast(avg((tp - tv) div 1000) as bigint)").as("mean_convert_us"))
      .orderBy("depth")
  }

  val qWindowFunnelSql: String =
    """WITH ev AS (SELECT user_id, event_type, epoch_ns(ts) AS ns FROM events),
      |v AS (SELECT user_id, MIN(ns) AS tv FROM ev WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT ev.user_id, MIN(ns) AS tc, MIN(tv) AS tv2 FROM ev JOIN v USING (user_id)
      |      WHERE event_type = 'click' AND ns > tv AND ns <= tv + 3600000000000 GROUP BY 1),
      |p AS (SELECT ev.user_id, MIN(ns) AS tp FROM ev JOIN c USING (user_id)
      |      WHERE event_type = 'purchase' AND ns > tc AND ns <= tv2 + 3600000000000 GROUP BY 1),
      |d AS (
      |  SELECT u.user_id,
      |    CASE WHEN tp IS NOT NULL THEN 3 WHEN tc IS NOT NULL THEN 2
      |         WHEN tv IS NOT NULL THEN 1 ELSE 0 END AS depth,
      |    tv, tp
      |  FROM (SELECT DISTINCT user_id FROM ev) u
      |  LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
      |  LEFT JOIN p USING (user_id))
      |SELECT depth, COUNT(*) AS n_users,
      |  CAST(AVG((tp - tv) // 1000) AS BIGINT) AS mean_convert_us
      |FROM d GROUP BY depth ORDER BY depth""".stripMargin

  /** Time-decayed engagement features (the feature-store "recency-weighted
    * activity" aggregate): per user, event count and value sum where each
    * event is weighted by its age at the reference instant T — recent
    * activity dominates, stale activity fades. TWO kernels, both emitted:
    *  - `decay_recip`: w = 1/(1 + age_days) — rational decay, pure IEEE
    *    +,-,*,/ (every op correctly rounded, so Spark and DuckDB agree
    *    bit-for-bit at full precision — pow()/exp() carry NO such
    *    guarantee across libm implementations, the §4 determinism rule,
    *    which is why the hash-gated kernel is rational);
    *  - `decay_exp`: w = 2^-weeks (7-day half-life, week-granular) — true
    *    exponential decay with the weight computed as 1.0/(1L << weeks):
    *    integer shift then a power-of-two division, both EXACT in IEEE
    *    double, so the exponential kernel is hash-gated too.
    * Scale shape: the weights are scan-projection column algebra; the
    * rollup is ONE map-side-combined user_id aggregate (no window, no
    * join); per-term round(6dp) → decimal sum makes the result independent
    * of partition/merge order (§4). The states are mergeable: decayed sums
    * at a fixed T add across batches, and advancing T → T+δ multiplies
    * every exponential state by the scalar 2^(-δ/hl) — the property that
    * makes incremental refresh (c_incremental_mv) work for these features. */
  def qDecayAgg(spark: SparkSession, dir: String): DataFrame = {
    val T = 1706745600000000000L // 2024-02-01 00:00:00 UTC, ns
    val ageDays = (lit(T) - col("ts")).cast("double") / lit(86400e9)
    val wRecip = lit(1.0) / (lit(1.0) + ageDays)
    val wExp = lit(1.0) /
      expr(s"cast(shiftleft(1L, cast(($T - ts) div 604800000000000 as int)) as double)")
    Tables.table(spark, dir, "events")
      .select(col("user_id"), col("value"),
        round(wRecip, 6).as("wr"),
        round(col("value") * wRecip, 6).as("vr"),
        round(col("value") * wExp, 6).as("ve"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        Tables.dsum(col("wr")).as("decayed_n"),
        Tables.dsum(col("vr")).as("decay_recip"),
        Tables.dsum(col("ve")).as("decay_exp"))
      .orderBy("user_id")
  }

  val qDecayAggSql: String =
    """WITH ev AS (
      |  SELECT user_id, value,
      |    (1706745600000000000 - epoch_ns(ts)) AS age_ns
      |  FROM events),
      |w AS (
      |  SELECT user_id, value,
      |    1.0 / (1.0 + CAST(age_ns AS DOUBLE) / 86400e9) AS wr,
      |    1.0 / CAST(CAST(1 AS BIGINT) << CAST(age_ns // 604800000000000 AS INTEGER) AS DOUBLE) AS we
      |  FROM ev)
      |SELECT user_id, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(round(wr, 6) AS DECIMAL(30,6))) AS DOUBLE) AS decayed_n,
      |  CAST(SUM(CAST(round(value * wr, 6) AS DECIMAL(30,6))) AS DOUBLE) AS decay_recip,
      |  CAST(SUM(CAST(round(value * we, 6) AS DECIMAL(30,6))) AS DOUBLE) AS decay_exp
      |FROM w GROUP BY 1 ORDER BY user_id""".stripMargin

  /** Last-touch attribution: every purchase is credited to the channel
    * (event type) of the LATEST preceding non-purchase event by the same
    * user within a 7-day lookback — the standard marketing-attribution
    * rollup. Deterministic winner: max by (ts, event_id) — integer-ns
    * tie-break, engine-portable.
    *
    * Scale shape: ONE user_id-keyed equi-join (both sides co-partitioned
    * on the same hash exchange) with the time-range predicate as a
    * residual filter; the per-purchase winner is a max(struct(ts,
    * event_id, type)) aggregate keyed on the purchase id — map-side
    * combined, no window. Fan-out per user = events/user × purchases/user
    * within the lookback, the bounded quantity the 7-day horizon dials
    * (the q_asof_join cost model). Unattributed purchases (no touch in
    * window) surface in the 'organic' bucket — they are data, not a drop. */
  def qAttribution(spark: SparkSession, dir: String): DataFrame =
    attributionOf(Tables.table(spark, dir, "events"))

  /** Core attribution over any events frame — exposed for planted-input
    * specs (organic bucket, tie-breaks, lookback edges). */
  private[graft] def attributionOf(ev: DataFrame): DataFrame = {
    val touches = ev.where(col("event_type") =!= "purchase")
      .select(col("user_id"), col("ts").as("t_ts"),
        col("event_id").as("t_id"), col("event_type").as("channel"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        col("ts").as("p_ts"), col("value"))
    val horizon = 7L * 86400000000000L
    // the window predicate is part of the JOIN condition: a purchase whose
    // only touches fall outside the lookback must keep its null row (and
    // land in 'organic'), not be filtered away post-join
    purchases.join(touches,
        purchases("user_id") === touches("user_id") &&
          col("t_ts") < col("p_ts") && col("t_ts") >= col("p_ts") - horizon,
        "left")
      .groupBy("p_id")
      .agg(first(col("value"), ignoreNulls = true).as("value"),
        max(struct(col("t_ts"), col("t_id"), col("channel"))).as("win"))
      .select(col("p_id"), col("value"),
        coalesce(col("win.channel"), lit("organic")).as("channel"))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_purchases"),
        Tables.dsum(col("value")).as("value_sum"))
      .orderBy("channel")
  }

  val qAttributionSql: String =
    """WITH p AS (
      |  SELECT user_id, event_id AS p_id, epoch_ns(ts) AS p_ns, value
      |  FROM events WHERE event_type = 'purchase'),
      |t AS (
      |  SELECT user_id, epoch_ns(ts) AS t_ns, event_id AS t_id,
      |    event_type AS channel
      |  FROM events WHERE event_type <> 'purchase'),
      |j AS (
      |  SELECT p.p_id, p.value,
      |    max(struct_pack(t_ns := t.t_ns, t_id := t.t_id, channel := t.channel)) AS win
      |  FROM p LEFT JOIN t ON p.user_id = t.user_id
      |    AND t.t_ns < p.p_ns AND t.t_ns >= p.p_ns - 604800000000000
      |  GROUP BY 1, 2)
      |SELECT coalesce(win.channel, 'organic') AS channel,
      |  COUNT(*) AS n_purchases,
      |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value_sum
      |FROM j GROUP BY 1 ORDER BY channel""".stripMargin

  /** Event-sequence pattern matching (the MATCH_RECOGNIZE / ClickHouse
    * sequenceCount shape): each user's history becomes a compact
    * one-letter-per-event string (ordered by ts, event_id) and behavioral
    * patterns are regexes over it — 'v[^p]*p' = view converts to purchase,
    * 'vp' = impulse purchase (adjacent), 'e[^p]*p' = recovery after error.
    * Counting uses non-overlapping leftmost matching, identical in Java
    * and RE2 for these patterns (no alternation ambiguity; [^p]* cannot
    * cross its terminator).
    *
    * Scale shape: ONE user-keyed aggregate builds the sequence string
    * (collect_list partials merge map-side; per-user state is bounded by
    * events/user — the sessionization contract); the regex scan is a
    * per-row projection over |users| rows; the pattern rollup is 3 groups.
    * At 100 TB the per-user string is the thing to bound (cap the window,
    * as st_session does) — the shuffle is already minimal. */
  def qMatchRecognize(spark: SparkSession, dir: String): DataFrame = {
    val letter = when(col("event_type") === "view", "v")
      .when(col("event_type") === "click", "c")
      .when(col("event_type") === "purchase", "p")
      .when(col("event_type") === "signup", "s")
      .otherwise("e")
    val seqs = Tables.table(spark, dir, "events")
      .select(col("user_id"), struct(col("ts"), col("event_id"), letter.as("ch")).as("ev"))
      .groupBy("user_id")
      .agg(expr("array_join(transform(array_sort(collect_list(ev)), s -> s.ch), '')").as("sq"))
    seqs.select(expr(
        """stack(3,
          |  'adjacent_vp',        regexp_count(sq, 'vp'),
          |  'error_recovery',     regexp_count(sq, 'e[^p]*p'),
          |  'view_then_purchase', regexp_count(sq, 'v[^p]*p')
          |) as (pattern, m)""".stripMargin))
      .groupBy("pattern")
      .agg(count(when(col("m") > 0, 1)).as("n_users"),
        sum(col("m")).cast("long").as("n_matches"))
      .orderBy("pattern")
  }

  val qMatchRecognizeSql: String =
    """WITH s AS (
      |  SELECT user_id,
      |    string_agg(CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
      |               WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
      |               ELSE 'e' END, '' ORDER BY ts, event_id) AS sq
      |  FROM events GROUP BY 1),
      |m AS (
      |  SELECT user_id, p.pattern, len(regexp_extract_all(sq, p.re)) AS m
      |  FROM s CROSS JOIN (VALUES
      |    ('adjacent_vp', 'vp'),
      |    ('error_recovery', 'e[^p]*p'),
      |    ('view_then_purchase', 'v[^p]*p')) p(pattern, re))
      |SELECT pattern, COUNT(CASE WHEN m > 0 THEN 1 END) AS n_users,
      |  CAST(SUM(m) AS BIGINT) AS n_matches
      |FROM m GROUP BY 1 ORDER BY pattern""".stripMargin

  /** OHLC time-series resampling: purchase values rolled to minute bars
    * (open/high/low/close + volume) — the downsampling shape every
    * metrics/market pipeline runs. Open and close are the values at the
    * bucket's first/last instant, selected by min/max over
    * struct(ts, event_id, value) — a map-side-combined aggregate (the
    * keep-first-without-a-window rule): deterministic through the
    * (ts, event_id) tie-break, ONE shuffle keyed on the time bucket,
    * bucket count bounded by the time range not the event rate. */
  def qOhlcResample(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "events")
      .where(col("event_type") === "purchase")
      .select(expr("ts div 60000000000").as("minute"),
        col("ts"), col("event_id"), col("value"))
      .groupBy("minute")
      .agg(count(lit(1)).as("n"),
        min(struct(col("ts"), col("event_id"), col("value"))).as("o"),
        max(struct(col("ts"), col("event_id"), col("value"))).as("c"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        Tables.dsum(col("value")).as("volume"))
      .select(col("minute"), col("n"), col("o.value").as("open"),
        col("high"), col("low"), col("c.value").as("close"), col("volume"))
      .orderBy("minute")

  val qOhlcResampleSql: String =
    """SELECT epoch_ns(ts) // 60000000000 AS minute, COUNT(*) AS n,
      |  min(struct_pack(ts := epoch_ns(ts), eid := event_id, v := value)).v AS open,
      |  max(value) AS high, min(value) AS low,
      |  max(struct_pack(ts := epoch_ns(ts), eid := event_id, v := value)).v AS close,
      |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS volume
      |FROM events WHERE event_type = 'purchase'
      |GROUP BY 1 ORDER BY minute""".stripMargin

  /** EXACT distributed quantiles (discrete p50/p90 per event type) — the
    * audit-path complement to q_approx_quantile's sketch: exact order
    * statistics need a per-group sort (the one shuffle here, keyed on the
    * bounded-fan event_type), which is exactly why the approx sketch is
    * the 100 TB default and THIS op is what you run to calibrate it.
    * Discrete (no interpolation) + (value, event_id) tie-break = the
    * selected element is a real row, identically chosen by both engines.
    * Target rank ceil(n·p/100) computed in integer arithmetic. */
  def qQuantileExact(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
    Tables.table(spark, dir, "events")
      .select(col("event_type"), col("value"), col("event_id"))
      .withColumn("rnk", row_number().over(w))
      .withColumn("nn", count(lit(1)).over(Window.partitionBy("event_type")))
      .groupBy("event_type")
      .agg(max(col("nn")).as("n"),
        max(when(col("rnk") === expr("(nn * 50 + 99) div 100"), col("value"))).as("p50"),
        max(when(col("rnk") === expr("(nn * 90 + 99) div 100"), col("value"))).as("p90"))
      .orderBy("event_type")
  }

  val qQuantileExactSql: String =
    """WITH r AS (
      |  SELECT event_type, value,
      |    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rnk,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM events)
      |SELECT event_type, COUNT(*) AS n,
      |  MAX(CASE WHEN rnk = (n * 50 + 99) // 100 THEN value END) AS p50,
      |  MAX(CASE WHEN rnk = (n * 90 + 99) // 100 THEN value END) AS p90
      |FROM r GROUP BY 1 ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ab_ttest" -> (qAbTtest _),
    "q_attribution" -> (qAttribution _),
    "q_match_recognize" -> (qMatchRecognize _),
    "q_ohlc_resample" -> (qOhlcResample _),
    "q_quantile_exact" -> (qQuantileExact _),
    "q_theta_sketch" -> (qThetaSketch _),
    "q_window_funnel" -> (qWindowFunnel _),
    "q_funnel" -> (qFunnel _),
    "q_event_paths" -> (qEventPaths _),
    "q_retention" -> (qRetention _),
    "q_gaps_islands" -> (qGapsIslands _),
    "q_bitmap_distinct" -> (qBitmapDistinct _),
    "q_decay_agg" -> (qDecayAgg _),
    "q_cms_topk" -> (qCmsTopk _))

  val oracles: Map[String, String] = Map(
    "q_funnel" -> qFunnelSql,
    "q_event_paths" -> qEventPathsSql,
    "q_retention" -> qRetentionSql,
    "q_gaps_islands" -> qGapsIslandsSql,
    "q_bitmap_distinct" -> qBitmapDistinctSql,
    "q_cms_topk" -> qCmsTopkSql,
    "q_ab_ttest" -> qAbTtestSql,
    "q_theta_sketch" -> qThetaSketchSql,
    "q_window_funnel" -> qWindowFunnelSql,
    "q_decay_agg" -> qDecayAggSql,
    "q_attribution" -> qAttributionSql,
    "q_match_recognize" -> qMatchRecognizeSql,
    "q_ohlc_resample" -> qOhlcResampleSql,
    "q_quantile_exact" -> qQuantileExactSql)
}
