package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.2 additions (round 7): three SQL-surface gaps a reference user would
  * hit — DISTINCT aggregates over windows, deterministic MODE / interpolated
  * exact MEDIAN, and the bitwise aggregate family (capability parity with the
  * reference's DuckDB post-processor, QueryManager.py:20-36 — DuckDB ships
  * `count(DISTINCT) OVER`, `mode()`, `median()`, `bit_and/or/xor` natively;
  * Spark lacks the first three, so each is re-expressed as scale-safe
  * relational algebra with identical semantics).
  */
object Relational4 {

  /** Time-to-coverage per user: the first event position at which the user
    * has seen every event type they ever produce — the canonical
    * "running COUNT(DISTINCT) over an ordered window" query.
    *
    * Spark has no DISTINCT window aggregates; the naive rewrite
    * (`size(collect_set().over(w))`) carries a growing set per row. The
    * scalable identity used instead: the first position where the running
    * distinct count reaches its final value n_types equals
    * max over types of (first occurrence position of that type) — so the
    * whole query is ONE row_number window (the per-user event order) plus
    * two map-side-combined min/max aggregates; per-row state is gone. The
    * DuckDB oracle runs the literal windowed-DISTINCT formulation, gating
    * the rewrite's equivalence at every scale factor.
    *
    * 100 TB shape: one shuffle+sort keyed on user_id (bounded per-user fan),
    * then pure aggregates; no content keys, no growing window state. */
  def qWindowDistinct(spark: SparkSession, dir: String): DataFrame = {
    // order on µs-truncated time + id: DuckDB truncates parquet ns
    // timestamps to µs (§4), so ordering on raw nanos diverges on the
    // (real, measured at sf0.1) ns pairs that collide at µs resolution
    val w = Window.partitionBy("user_id")
      .orderBy(expr("ts div 1000"), col("event_id"))
    val pos = Tables.table(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("pos", row_number().over(w))
    pos.groupBy("user_id", "event_type").agg(min("pos").as("first_pos"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_types"),
        max("first_pos").cast("long").as("events_to_cover"))
      .orderBy("user_id")
  }

  val qWindowDistinctSql: String =
    """WITH pos AS (
      |  SELECT user_id, event_id,
      |    count(DISTINCT event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seen,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pos
      |  FROM events),
      |tot AS (SELECT user_id, CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
      |        FROM events GROUP BY 1)
      |SELECT t.user_id, t.n_types, CAST(MIN(p.pos) AS BIGINT) AS events_to_cover
      |FROM tot t JOIN pos p ON p.user_id = t.user_id AND p.seen = t.n_types
      |GROUP BY 1, 2 ORDER BY 1""".stripMargin

  /** Deterministic MODE (max count, ties to the smallest value — both
    * engines' native mode() is tie-arbitrary, so neither is used) and the
    * standard interpolated exact MEDIAN per group. Median of an even count
    * averages the two middle rows; the multiplicity-weighted sum
    * `p × (1[rn=lo] + 1[rn=hi])` makes the odd case (lo=hi → weight 2) the
    * same `× 0.5` expression, and the halving runs entirely in DECIMAL on
    * both sides (§4: `/2` on a double is the representation-tie trap).
    *
    * Sibling of q_quantile_exact (nearest-rank, no interpolation); at
    * 100 TB the exact path is the verification tool and q_approx_quantile
    * is the production dial — per-group sorts of a full fact table are one
    * shuffle keyed on the 3-value group key (bounded fan here; a
    * high-cardinality group key keeps it linear per group). */
  def qModeMedian(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.table(spark, dir, "lineitem")
    val wm = Window.partitionBy("l_returnflag")
      .orderBy(col("c").desc, col("l_quantity"))
    val md = li.groupBy("l_returnflag", "l_quantity")
      .agg(count(lit(1)).as("c"))
      .withColumn("r", row_number().over(wm)).where(col("r") === 1)
      .select(col("l_returnflag"), col("l_quantity").as("mode_qty"),
        col("c").as("mode_cnt"))
    val wo = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    val med = li
      .select(col("l_returnflag"),
        col("l_extendedprice").cast("decimal(30,6)").as("p"),
        col("l_extendedprice"))
      .withColumn("rn", row_number().over(wo))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("l_returnflag")))
      .where(expr("rn IN ((n + 1) div 2, (n + 2) div 2)"))
      .groupBy("l_returnflag")
      .agg(expr(
        """cast(cast(sum(p * (cast(rn = (n + 1) div 2 as int)
          |             + cast(rn = (n + 2) div 2 as int))) as decimal(30,6))
          |     * cast(0.5 as decimal(2,1)) as double)""".stripMargin).as("mp"))
    md.join(med, "l_returnflag")
      .select(col("l_returnflag"), col("mode_qty"), col("mode_cnt"),
        round(col("mp"), 4).as("median_price"))
      .orderBy("l_returnflag")
  }

  val qModeMedianSql: String =
    """WITH cnt AS (
      |  SELECT l_returnflag, l_quantity, COUNT(*) AS c FROM lineitem GROUP BY 1, 2),
      |md AS (
      |  SELECT l_returnflag, l_quantity AS mode_qty, CAST(c AS BIGINT) AS mode_cnt,
      |    row_number() OVER (PARTITION BY l_returnflag ORDER BY c DESC, l_quantity) AS r
      |  FROM cnt),
      |ordered AS (
      |  SELECT l_returnflag, CAST(l_extendedprice AS DECIMAL(30,6)) AS p,
      |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
      |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      |  FROM lineitem),
      |med AS (
      |  SELECT l_returnflag,
      |    CAST(CAST(SUM(p * (CAST(rn = (n + 1) // 2 AS INT)
      |                 + CAST(rn = (n + 2) // 2 AS INT))) AS DECIMAL(30,6))
      |         * CAST(0.5 AS DECIMAL(2,1)) AS DOUBLE) AS mp
      |  FROM ordered WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
      |  GROUP BY 1)
      |SELECT m.l_returnflag, m.mode_qty, m.mode_cnt, round(d.mp, 4) AS median_price
      |FROM md m JOIN med d ON d.l_returnflag = m.l_returnflag
      |WHERE m.r = 1 ORDER BY 1""".stripMargin

  /** Bitwise aggregate family — bit_and / bit_or / bit_xor per group plus
    * the popcount of the OR (how many of the low id bits appear at all).
    * All three are associative+commutative single-word aggregates: perfect
    * map-side combine, constant shuffle payload per group — the same
    * mergeability contract as the sketch family (SURVEY §5) with zero
    * approximation. */
  def qBitAggs(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "events")
      .groupBy("event_type")
      .agg(expr("bit_and(user_id)").as("band"),
        expr("bit_or(user_id)").as("bor"),
        expr("bit_xor(user_id)").as("bxor"))
      .select(col("event_type"), col("band"), col("bor"), col("bxor"),
        expr("cast(bit_count(bor) as int)").as("bor_bits"))
      .orderBy("event_type")

  val qBitAggsSql: String =
    """SELECT event_type,
      |  CAST(bit_and(user_id) AS BIGINT) AS band,
      |  CAST(bit_or(user_id) AS BIGINT) AS bor,
      |  CAST(bit_xor(user_id) AS BIGINT) AS bxor,
      |  CAST(bit_count(bit_or(user_id)) AS INTEGER) AS bor_bits
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** HLL sketch MERGE, relationally: per-day HyperLogLog registers built
    * in-plan (register = max leading-zero rank per bucket), merged across
    * days by register-max, and proven IDENTICAL to the sketch built
    * directly over the whole range — the mergeability contract that makes
    * incremental distinct counting work (store per-partition sketches,
    * answer any date range by merging — never rescan). q_approx_distinct
    * gates Spark's native HLL by error bound; this op gates the REGISTER
    * ALGEBRA exactly, because the hash is the portable GF(2^61−1) family
    * ([[graft.functions.PolyHash]]) cubed for high-bit mixing (an affine
    * map of sequential ids leaves leading-zero statistics skewed —
    * measured 50% error; the cubic lands ≤3% at 10³–10⁴ scale), so DuckDB
    * replays registers bit-for-bit (HUGEINT ↔ DECIMAL(38) arithmetic, §4
    * ANSI-overflow rule).
    *
    * 100 TB shape: register build = one map-side-combined (day, j) max
    * aggregate (256 rows per day cross the shuffle); merge = 256-row max;
    * estimates are scalar math over one 256-row frame. The estimator runs
    * integer-exact until ONE final division (Σ2^-rho scaled by 2^54 into
    * exact BIGINTs — pow()/exp() are not cross-libm deterministic, §4). */
  def qHllMerge(spark: SparkSession, dir: String): DataFrame = {
    val M = graft.functions.PolyHash.M
    val PHI = graft.functions.PolyHash.PHI
    val PSI = graft.functions.PolyHash.PSI
    // alpha_256 = 0.7213/(1 + 1.079/256), inlined as the SAME literal text
    // both engines so no cross-engine literal arithmetic exists
    val E = "0.7182725932495458e0 * 65536e0 * 18014398509481984e0 / s"
    // r13: fanout — the decimal mod-M hash chain is the map-side cost and a
    // single-file scan serialized it onto one core; then ONE cached run of
    // the (day, j, rho) pipeline feeds all three register views (the old
    // shape cached dayreg but re-ran the full hash chain for `direct`).
    val hashed = Tables.fanout(Tables.table(spark, dir, "events")
        .select(expr("ts div 86400000000000").as("day"), col("user_id")))
      .withColumn("h1", expr(
        s"cast((cast($PHI as decimal(19,0)) * cast(user_id as decimal(19,0)) + $PSI) % $M as decimal(19,0))"))
      .withColumn("h", expr(s"cast((cast((h1 * h1) % $M as decimal(19,0)) * h1) % $M as bigint)"))
    val r = hashed.select(col("day"), expr("h % 256").as("j"),
      expr("case when h div 256 = 0 then 54 else 54 - length(bin(h div 256)) end")
        .as("rho")).cache()
    val dayreg = r.groupBy("day", "j").agg(max("rho").as("r"))
    val merged = dayreg.groupBy("j").agg(max("r").as("r")).cache()
    val direct = r.groupBy("j").agg(max("rho").as("r")).cache()
    def estOf(regs: DataFrame, out: String): DataFrame = regs
      .agg(expr("cast(sum(shiftleft(1L, cast(54 - r as int))) as bigint)" +
          " + (256 - count(1)) * shiftleft(1L, 54)").as("s"),
        expr("cast(256 - count(1) as bigint)").as("v"))
      .select(expr(
        s"round(case when v > 0 and $E <= 640e0 then 256e0 * ln(256e0 / v) else $E end, 4)")
        .as(out))
    val consistent = merged.as("m")
      .join(direct.as("d"), col("m.j") === col("d.j") && col("m.r") === col("d.r"))
      .agg(count(lit(1)).as("n_match"))
      .crossJoin(broadcast(merged.agg(count(lit(1)).as("n_regs"))))
      .select((col("n_match") === col("n_regs")).as("regs_equal"))
    val ex = Tables.table(spark, dir, "events")
      .agg(countDistinct(expr("ts div 86400000000000")).as("n_days"),
        countDistinct(col("user_id")).as("exact_users"))
    ex.crossJoin(broadcast(estOf(merged, "est_merged")))
      .crossJoin(broadcast(estOf(direct, "est_direct")))
      .crossJoin(broadcast(consistent))
      .select(col("n_days"), col("exact_users"), col("est_merged"),
        col("est_direct"),
        (col("regs_equal") && col("est_merged") === col("est_direct"))
          .as("merge_exact"),
        (abs(col("est_merged") - col("exact_users")) / col("exact_users")
          <= lit(0.2)).as("within20"))
  }

  val qHllMergeSql: String = {
    val M = graft.functions.PolyHash.M
    val PHI = graft.functions.PolyHash.PHI
    val PSI = graft.functions.PolyHash.PSI
    val E = "0.7182725932495458e0 * 65536e0 * 18014398509481984e0 / %s.s"
    s"""WITH h AS (
       |  SELECT epoch_ns(ts) // 86400000000000 AS day,
       |    CAST((CAST($PHI AS HUGEINT) * user_id + $PSI) % $M AS HUGEINT) AS h1
       |  FROM events),
       |hh AS (SELECT day, CAST((h1 * h1 % $M) * h1 % $M AS BIGINT) AS h FROM h),
       |r AS (
       |  SELECT day, h % 256 AS j,
       |    CASE WHEN h // 256 = 0 THEN 54
       |         ELSE 54 - length(bin(h // 256)) END AS rho
       |  FROM hh),
       |dayreg AS (SELECT day, j, MAX(rho) AS r FROM r GROUP BY 1, 2),
       |merged AS (SELECT j, MAX(r) AS r FROM dayreg GROUP BY 1),
       |direct AS (SELECT j, MAX(rho) AS r FROM r GROUP BY 1),
       |est_m AS (
       |  SELECT CAST(SUM(CAST(1 AS BIGINT) << (54 - r)) AS BIGINT)
       |         + (256 - COUNT(*)) * (CAST(1 AS BIGINT) << 54) AS s,
       |         256 - CAST(COUNT(*) AS BIGINT) AS v
       |  FROM merged),
       |est_d AS (
       |  SELECT CAST(SUM(CAST(1 AS BIGINT) << (54 - r)) AS BIGINT)
       |         + (256 - COUNT(*)) * (CAST(1 AS BIGINT) << 54) AS s,
       |         256 - CAST(COUNT(*) AS BIGINT) AS v
       |  FROM direct),
       |ex AS (SELECT CAST(COUNT(DISTINCT epoch_ns(ts) // 86400000000000) AS BIGINT) AS n_days,
       |              CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
       |       FROM events),
       |f AS (
       |  SELECT ex.n_days, ex.exact_users,
       |    round(CASE WHEN m.v > 0 AND ${E.format("m")} <= 640e0
       |          THEN 256e0 * ln(256e0 / m.v) ELSE ${E.format("m")} END, 4) AS est_merged,
       |    round(CASE WHEN d.v > 0 AND ${E.format("d")} <= 640e0
       |          THEN 256e0 * ln(256e0 / d.v) ELSE ${E.format("d")} END, 4) AS est_direct,
       |    (SELECT COUNT(*) FROM merged mm JOIN direct dd
       |       ON dd.j = mm.j AND dd.r = mm.r)
       |      = (SELECT COUNT(*) FROM merged) AS regs_equal
       |  FROM est_m m, est_d d, ex)
       |SELECT n_days, exact_users, est_merged, est_direct,
       |  regs_equal AND est_merged = est_direct AS merge_exact,
       |  abs(est_merged - exact_users) / exact_users <= 0.2e0 AS within20
       |FROM f""".stripMargin
  }

  /** Cohort revenue matrix: users bucketed by first-purchase week, revenue
    * and active-user counts tracked per cohort age — the standard retention
    * economics view (q_retention's sibling with money attached). Two
    * aggregates (first-week per user — map-side min; the cohort rollup)
    * joined on user_id; decimal-exact revenue (§4). */
  def qCohortRevenue(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.table(spark, dir, "events")
      .where(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts div 604800000000000").as("wk"),
        col("value"))
    val c = p.groupBy("user_id").agg(min("wk").as("cohort_wk"))
    p.join(c, "user_id")
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("age_wk"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        Tables.dsum(col("value")).as("revenue"))
      .orderBy("cohort_wk", "age_wk")
  }

  val qCohortRevenueSql: String =
    """WITH p AS (
      |  SELECT user_id, epoch_ns(ts) // 604800000000000 AS wk, value
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, MIN(wk) AS cohort_wk FROM p GROUP BY 1)
      |SELECT c.cohort_wk, p.wk - c.cohort_wk AS age_wk,
      |  CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS n_users,
      |  CAST(SUM(CAST(p.value AS DECIMAL(30,6))) AS DOUBLE) AS revenue
      |FROM p JOIN c ON c.user_id = p.user_id
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** 2-D skyline (Pareto frontier): the lineitem offers no other row beats
    * on BOTH price (min) and quantity (max). The sort-based identity — a
    * point survives iff its qty exceeds the running max over all strictly
    * cheaper points — turns the O(n²) dominance test into one ordered scan.
    *
    * The running max NEVER runs as a global window (59k distinct prices at
    * sf0.01 — a global sort straggler at scale): per-price maxes band into
    * price/1000 buckets, prefix-max over the BAND rows only, per-band
    * windows compute the within-band running max, carry-in via greatest —
    * st_late_audit's two-level Blelloch scan with max. The DuckDB oracle
    * runs the NAIVE single-window formulation — an independent derivation,
    * so the gate checks the algebraic identity, not a replay. */
  def qSkyline(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.table(spark, dir, "lineitem")
      .groupBy(col("l_extendedprice").as("price"),
        col("l_quantity").as("qty"))
      .agg(count(lit(1)).as("n_rows"))
    // r13: n_rows rides THROUGH pm via max(struct(qty, n_rows)) — (price,
    // qty) is unique in g, so per price the max-qty row is unique and the
    // struct max picks exactly its n_rows. The old shape joined the full
    // pair table back in at the end (one more exchange + the cache that
    // fed it); Lab-verified identical output, ~0.7 s warm saved.
    val pm = g.groupBy("price")
      .agg(max(struct(col("qty"), col("n_rows"))).as("m"))
      .select(col("price"), col("m.qty").as("qty"), col("m.n_rows").as("n_rows"))
      .withColumn("band", expr("cast(floor(price / 1000) as bigint)"))
    val carry = pm.groupBy("band").agg(max("qty").as("bmax"))
      .withColumn("carry_in", max(col("bmax")).over(
        Window.orderBy("band").rowsBetween(Window.unboundedPreceding, -1)))
      .select("band", "carry_in")
    val inBand = Window.partitionBy("band").orderBy("price")
      .rowsBetween(Window.unboundedPreceding, -1)
    pm.join(broadcast(carry), Seq("band"))
      .withColumn("prevmax",
        greatest(max(col("qty")).over(inBand), col("carry_in")))
      .where(col("prevmax").isNull || col("qty") > col("prevmax"))
      .select(col("price"), col("qty"), col("n_rows"))
      .orderBy("price")
  }

  val qSkylineSql: String =
    """WITH g AS (
      |  SELECT l_extendedprice AS price, l_quantity AS qty, COUNT(*) AS n_rows
      |  FROM lineitem GROUP BY 1, 2),
      |pm AS (SELECT price, MAX(qty) AS qty FROM g GROUP BY 1),
      |w AS (
      |  SELECT price, qty,
      |    MAX(qty) OVER (ORDER BY price
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
      |  FROM pm)
      |SELECT w.price, w.qty, CAST(g.n_rows AS BIGINT) AS n_rows
      |FROM w JOIN g ON g.price = w.price AND g.qty = w.qty
      |WHERE w.prevmax IS NULL OR w.qty > w.prevmax
      |ORDER BY w.price""".stripMargin

  /** Peak concurrency per event type (max simultaneous 5-minute sessions)
    * via the classic sweep line: +1 at session start, −1 at session end,
    * running sum, max. End points order BEFORE start points at the same
    * instant ((t, d) sort — [s, e) semantics), so back-to-back sessions
    * never double-count. One event_type-keyed window (bounded fan);
    * time in exact µs integers (§4). */
  def qMaxConcurrency(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.table(spark, dir, "events")
      .select(col("event_type"), expr("ts div 1000").as("us"))
    val pts = ev.select(col("event_type"), col("us").as("t"), lit(1).as("d"))
      .unionAll(ev.select(col("event_type"),
        (col("us") + lit(300000000L)).as("t"), lit(-1).as("d")))
    val w = Window.partitionBy("event_type").orderBy(col("t"), col("d"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val run = pts.withColumn("cur", sum("d").over(w)).cache()
    val mx = run.groupBy("event_type").agg(max("cur").as("max_concurrent"))
    run.join(mx, "event_type")
      .where(col("cur") === col("max_concurrent"))
      .groupBy("event_type", "max_concurrent")
      .agg(min("t").as("first_peak_us"))
      .orderBy("event_type")
  }

  val qMaxConcurrencySql: String =
    """WITH pts AS (
      |  SELECT event_type, epoch_us(ts) AS t, 1 AS d FROM events
      |  UNION ALL
      |  SELECT event_type, epoch_us(ts) + 300000000, -1 FROM events),
      |run AS (
      |  SELECT event_type, t, d,
      |    SUM(d) OVER (PARTITION BY event_type ORDER BY t, d
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cur
      |  FROM pts),
      |mx AS (
      |  SELECT event_type, CAST(MAX(cur) AS BIGINT) AS max_concurrent
      |  FROM run GROUP BY 1)
      |SELECT m.event_type, m.max_concurrent,
      |  CAST(MIN(r.t) AS BIGINT) AS first_peak_us
      |FROM mx m JOIN run r ON r.event_type = m.event_type
      |  AND r.cur = m.max_concurrent
      |GROUP BY 1, 2 ORDER BY 1""".stripMargin

  /** First-order Markov transition matrix over per-user event sequences:
    * counts and exact-ppm probabilities for every (prev → next) event-type
    * pair. One user-keyed lag window (µs+id order — §4) + two
    * map-side-combined aggregates; the |types|² matrix is the behavioral
    * fingerprint session-sequence models train on. */
  def qMarkovTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(expr("ts div 1000"), col("event_id"))
    val t = Tables.table(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .where(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type").as("next"))
      .agg(count(lit(1)).as("c"))
    val tot = t.groupBy("prev").agg(sum("c").cast("long").as("n"))
    t.join(tot, "prev")
      .select(col("prev"), col("next"), col("c"),
        expr("(1000000 * c) div n").as("p_ppm"))
      .orderBy("prev", "next")
  }

  val qMarkovTransitionsSql: String =
    """WITH s AS (
      |  SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |t AS (SELECT prev, event_type AS next, COUNT(*) AS c
      |      FROM s WHERE prev IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT prev, CAST(SUM(c) AS BIGINT) AS n FROM t GROUP BY 1)
      |SELECT t.prev, t.next, CAST(t.c AS BIGINT) AS c,
      |  (1000000 * CAST(t.c AS BIGINT)) // tot.n AS p_ppm
      |FROM t JOIN tot USING (prev) ORDER BY t.prev, t.next""".stripMargin

  /** Time-to-event: first view → first purchase per user, with exact
    * nearest-rank p25/p50/p75 of the conversion delay. The quantile ranks
    * are computed WITHOUT a global row window (billions of users would
    * serialize into one sort): per-user deltas bucket by hour, cumulative
    * counts run over the BUCKET rows only, and each row's global rank =
    * bucket carry-in + within-bucket rank (the st_late_audit two-level
    * scan). The DuckDB oracle ranks naively over all rows — an independent
    * derivation (the q_skyline pattern), so the gate checks the two-level
    * identity. */
  def qTimeToEvent(spark: SparkSession, dir: String): DataFrame = {
    val f = Tables.table(spark, dir, "events")
      .groupBy("user_id")
      .agg(min(when(col("event_type") === "view", expr("ts div 1000"))).as("v"),
        min(when(col("event_type") === "purchase", expr("ts div 1000"))).as("p"))
      .cache()
    val d = f.where(col("v").isNotNull && col("p").isNotNull &&
        col("p") >= col("v"))
      .select(col("user_id"), expr("(p - v) div 1000000").as("dt_s"))
    val b = d.withColumn("bucket", expr("dt_s div 3600"))
    val bc = b.groupBy("bucket").agg(count(lit(1)).as("bcnt"))
      .withColumn("cum_prev", coalesce(sum("bcnt").over(
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("bucket", "cum_prev")
    val wIn = Window.partitionBy("bucket").orderBy("dt_s", "user_id")
    val ranked = b.join(broadcast(bc), "bucket")
      .withColumn("grn", col("cum_prev") + row_number().over(wIn))
    val counts = f.agg(
      count(when(col("v").isNotNull, 1)).as("n_viewers"))
      .crossJoin(broadcast(d.agg(count(lit(1)).as("n_converted"))))
    ranked.crossJoin(broadcast(counts))
      .agg(
        max(when(col("grn") === expr("(n_converted + 1) div 2"), col("dt_s")))
          .as("p50_s"),
        max(when(col("grn") === expr("(n_converted + 3) div 4"), col("dt_s")))
          .as("p25_s"),
        max(when(col("grn") === expr("(3 * n_converted + 3) div 4"), col("dt_s")))
          .as("p75_s"),
        max("n_viewers").as("n_viewers"),
        max("n_converted").as("n_converted"))
      .select(col("n_viewers"), col("n_converted"), col("p25_s"),
        col("p50_s"), col("p75_s"))
  }

  val qTimeToEventSql: String =
    """WITH f AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS v,
      |    MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p
      |  FROM events GROUP BY 1),
      |d AS (
      |  SELECT user_id, (p - v) // 1000000 AS dt_s
      |  FROM f WHERE v IS NOT NULL AND p IS NOT NULL AND p >= v),
      |r AS (
      |  SELECT dt_s, row_number() OVER (ORDER BY dt_s, user_id) AS rn,
      |         COUNT(*) OVER () AS n
      |  FROM d)
      |SELECT
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM f WHERE v IS NOT NULL) AS n_viewers,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_converted,
      |  CAST(MAX(CASE WHEN rn = (n + 3) // 4 THEN dt_s END) AS BIGINT) AS p25_s,
      |  CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN dt_s END) AS BIGINT) AS p50_s,
      |  CAST(MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN dt_s END) AS BIGINT) AS p75_s
      |FROM r""".stripMargin

  /** Period-over-period report: weekly event volume + decimal revenue per
    * event type with week-over-week growth in exact ppm — the standard
    * growth dashboard query. Both engines' integer division truncates
    * toward zero (measured: DuckDB `-5 // 2 = -2`, same as Spark `div`),
    * so negative growth needs no floor shim. One map-side weekly
    * aggregate, one bounded-fan lag window over |types|×|weeks| aggregate
    * rows. */
  def qPeriodOverPeriod(spark: SparkSession, dir: String): DataFrame = {
    val wkly = Tables.table(spark, dir, "events")
      .groupBy(col("event_type"), expr("ts div 604800000000000").as("wk"))
      .agg(count(lit(1)).as("n"), Tables.dsum(col("value")).as("revenue"))
    val w = Window.partitionBy("event_type").orderBy("wk")
    wkly.withColumn("prev_n", lag(col("n"), 1).over(w))
      .withColumn("growth_ppm", expr("(n - prev_n) * 1000000 div prev_n"))
      .select(col("event_type"), col("wk"), col("n"), col("revenue"),
        col("prev_n"), col("growth_ppm"))
      .orderBy("event_type", "wk")
  }

  val qPeriodOverPeriodSql: String =
    """WITH wkly AS (
      |  SELECT event_type, epoch_ns(ts) // 604800000000000 AS wk,
      |    COUNT(*) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS revenue
      |  FROM events GROUP BY 1, 2),
      |l AS (
      |  SELECT *, lag(n) OVER (PARTITION BY event_type ORDER BY wk) AS prev_n
      |  FROM wkly)
      |SELECT event_type, wk, n, revenue, prev_n,
      |  CAST((n - prev_n) * 1000000 // prev_n AS BIGINT) AS growth_ppm
      |FROM l ORDER BY event_type, wk""".stripMargin

  /** Bootstrap confidence interval for the mean purchase value via the
    * POISSON bootstrap (Chamandy et al., the resampling scheme built for
    * data that cannot sit on one machine): instead of drawing n rows with
    * replacement per replicate — which needs global coordination — every
    * (row, replicate) pair independently gets a Poisson(1) multiplicity,
    * inverse-CDF'd from a deterministic portable hash (two rounds of the
    * multiplicative admit hash mod the prime 1000003; thresholds are the
    * Poisson(1) CDF floored to that scale, derivation pinned in the
    * constants). B = 200 replicates materialize as an explode in the SCAN
    * projection; each replicate's weighted mean is a map-side-combined
    * aggregate, so only B rows ever cross the shuffle regardless of corpus
    * size. The 95% CI is nearest-rank (ranks 5 and 195 of the 200 means —
    * a global window over B AGGREGATE rows, the audited two-level shape).
    * Every arithmetic step is either integer, decimal-exact, or a single
    * rounded IEEE division — the whole CI replays bit-exactly in DuckDB. */
  def qBootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    val B = 200
    // pure BIGINT two-round hash: event_id·A ≤ 2.7e15 and (h%p)·A ≤ 2.7e15
    // both fit int64 with headroom for event_id < 3.4e9 (documented bound;
    // beyond it switch to the DECIMAL form admitHash uses) — 5-6× faster
    // than DECIMAL arithmetic in the 200×-exploded hot loop
    val uSql = "((event_id * 2654435761 + b * 40503 + 7) % 1000003 * 2654435761) % 1000003"
    // Poisson(1) CDF × 1000003, floored: P(X<=k) for k=0..7
    val wSql = "CASE WHEN u < 367880 THEN 0 WHEN u < 735761 THEN 1" +
      " WHEN u < 919701 THEN 2 WHEN u < 981014 THEN 3 WHEN u < 996343 THEN 4" +
      " WHEN u < 999408 THEN 5 WHEN u < 999919 THEN 6 WHEN u < 999992 THEN 7 ELSE 8 END"
    val x = Tables.table(spark, dir, "events")
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("value"))
    // (r13 note: fanning the pre-explode rows out was measured a WASH —
    // the exploded pipeline is ~1.5 CPU-s single-threaded, and the 32-way
    // spread paid ~13× CPU in allocator/GC contention for the same wall.
    // Left single-split deliberately; at real scale the scan arrives with
    // thousands of splits and parallelism is free.)
    val reps = x.select(col("event_id"), col("value"),
        explode(sequence(lit(0), lit(B - 1))).as("b"))
      .withColumn("u", expr(uSql))
      .withColumn("wt", expr(wSql))
    val means = reps.groupBy("b")
      .agg(Tables.dsum(col("value") * col("wt")).as("sw"),
        sum(col("wt")).as("tw"))
      .select(col("b"), round(col("sw") / col("tw").cast("double"), 6).as("mb"))
    // checkpoint AFTER the rank window (200 rows): the ci_lo/ci_hi branches
    // then share one run of the 200×-exploded weighting pipeline (measured
    // 28 s → ~1.6 s warm), and the window keeps its Aggregate input visible
    // to the plan audit's two-level-shape proof
    val ranked = means.withColumn("r",
        row_number().over(Window.orderBy(col("mb"), col("b"))))
      .localCheckpoint()
    val full = x.agg(count(lit(1)).as("n"),
      round(Tables.dsum(col("value")) / count(lit(1)).cast("double"), 6).as("mean_value"))
    full.crossJoin(broadcast(ranked.where(col("r") === 5).select(col("mb").as("ci_lo"))))
      .crossJoin(broadcast(ranked.where(col("r") === 195).select(col("mb").as("ci_hi"))))
      .select(col("n"), col("mean_value"), col("ci_lo"), col("ci_hi"),
        lit(B.toLong).as("n_reps"))
  }

  val qBootstrapCiSql: String = {
    val uSql = "((event_id * 2654435761 + b * 40503 + 7) % 1000003 * 2654435761) % 1000003"
    val wSql = "CASE WHEN u < 367880 THEN 0 WHEN u < 735761 THEN 1" +
      " WHEN u < 919701 THEN 2 WHEN u < 981014 THEN 3 WHEN u < 996343 THEN 4" +
      " WHEN u < 999408 THEN 5 WHEN u < 999919 THEN 6 WHEN u < 999992 THEN 7 ELSE 8 END"
    s"""WITH x AS (
       |  SELECT event_id, value FROM events WHERE event_type = 'purchase'),
       |r AS (
       |  SELECT x.event_id, x.value, g.b
       |  FROM x CROSS JOIN generate_series(0, 199) g(b)),
       |wtd AS (
       |  SELECT b, value, $wSql AS wt
       |  FROM (SELECT *, $uSql AS u FROM r)),
       |m AS (
       |  SELECT b,
       |    round(CAST(SUM(CAST(value * wt AS DECIMAL(30,6))) AS DOUBLE)
       |          / CAST(SUM(wt) AS DOUBLE), 6) AS mb
       |  FROM wtd GROUP BY b),
       |rk AS (SELECT mb, row_number() OVER (ORDER BY mb, b) AS r FROM m)
       |SELECT
       |  (SELECT COUNT(*) FROM x) AS n,
       |  (SELECT round(CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE)
       |                / CAST(COUNT(*) AS DOUBLE), 6) FROM x) AS mean_value,
       |  (SELECT mb FROM rk WHERE r = 5) AS ci_lo,
       |  (SELECT mb FROM rk WHERE r = 195) AS ci_hi,
       |  CAST(200 AS BIGINT) AS n_reps""".stripMargin
  }

  /** DAU/MAU stickiness per day — the engagement ratio every product
    * dashboard tracks. The input collapses to the (user, day) GRID first
    * (one distinct — |users|·|days| rows, never raw events); the trailing
    * 28-day MAU is then a range join of that grid against the
    * |days|-row day spine (a bounded broadcast, the q_time_gapfill shape)
    * + COUNT(DISTINCT) per target day. Stickiness in exact ppm. At 100 TB
    * the same report keeps the grid shape but swaps exact COUNT(DISTINCT)
    * for the q_hll_merge register algebra (per-day HLL registers,
    * register-max over the trailing window) — the merge op this engine
    * already gates bit-exactly. */
  def qDauMau(spark: SparkSession, dir: String): DataFrame = {
    val ud = Tables.table(spark, dir, "events")
      .select(expr("ts div 86400000000000").as("day"), col("user_id"))
      .distinct()
    val days = ud.select(col("day").as("d")).distinct()
    val dau = ud.groupBy("day").agg(countDistinct("user_id").as("dau"))
    val mau = broadcast(days).join(ud,
        col("day").between(col("d") - 27, col("d")))
      .groupBy("d").agg(countDistinct("user_id").as("mau28"))
    dau.join(mau, dau("day") === mau("d"))
      .select(col("day"), col("dau"), col("mau28"),
        expr("dau * 1000000 div mau28").as("stickiness_ppm"))
      .orderBy("day")
  }

  val qDauMauSql: String =
    """WITH ud AS (
      |  SELECT DISTINCT epoch_ns(ts) // 86400000000000 AS day, user_id
      |  FROM events),
      |days AS (SELECT DISTINCT day AS d FROM ud),
      |dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM ud GROUP BY 1),
      |mau AS (
      |  SELECT d, COUNT(DISTINCT user_id) AS mau28
      |  FROM days JOIN ud ON ud.day BETWEEN d - 27 AND d GROUP BY 1)
      |SELECT dau.day, dau.dau, mau.mau28,
      |  CAST(dau.dau * 1000000 // mau.mau28 AS BIGINT) AS stickiness_ppm
      |FROM dau JOIN mau ON mau.d = dau.day ORDER BY dau.day""".stripMargin

  /** RFM customer segmentation (recency / frequency / monetary quintiles)
    * — the classic marketing segmentation, built scale-honest: quintile
    * scores come from cumulative distributions over METRIC-VALUE domains,
    * never a global sort of users. Recency and frequency have naturally
    * bounded domains (days, small counts); monetary buckets to $100 before
    * its cumulative (fixed-width histogram quantiles — the deterministic
    * approximation production systems use at scale, documented here as
    * part of the op's contract). score = 1 + ⌊(cum−1)·5/U⌋ per value (ties
    * share a score by construction), recency inverted so 5 = most recent.
    * All integer arithmetic; segment money totals in exact CENTS (the
    * decimal sum never round-trips through a double). Shape: one per-user
    * aggregate, three value-domain cumulative windows over AGGREGATE rows,
    * three small broadcast score-map joins, one segment rollup. */
  def qRfm(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.table(spark, dir, "events")
      .where(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts div 86400000000000").as("day"), col("value"))
    val perUser = p.groupBy("user_id").agg(
      max(col("day")).as("last_day"),
      count(lit(1)).as("f"),
      expr("CAST(sum(CAST(value AS DECIMAL(30,6))) * 100 AS BIGINT)").as("m_cents"))
    val maxDay = perUser.agg(max("last_day").as("gmax"), count(lit(1)).as("u"))
    val pu = perUser.crossJoin(broadcast(maxDay))
      .select(col("user_id"), (col("gmax") - col("last_day")).as("r"),
        col("f"), col("m_cents"), expr("m_cents div 10000").as("mb"), col("u"))
    def scoreMap(metric: String, invert: Boolean): DataFrame = {
      val counts = pu.groupBy(col(metric).as("v"), col("u"))
        .agg(count(lit(1)).as("c"))
      val cum = counts.withColumn("cum",
        sum(col("c")).over(Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val asc = cum.select(col("v"),
        (lit(1) + expr("(cum - 1) * 5 div u")).as("asc"))
      asc.select(col("v").as(metric + "_v"),
        (if (invert) lit(6) - col("asc") else col("asc"))
          .cast("int").as(metric + "_score"))
    }
    pu.join(broadcast(scoreMap("r", invert = true)), col("r") === col("r_v"))
      .join(broadcast(scoreMap("f", invert = false)), col("f") === col("f_v"))
      .join(broadcast(scoreMap("mb", invert = false)), col("mb") === col("mb_v"))
      .groupBy("r_score", "f_score", "mb_score")
      .agg(count(lit(1)).as("n_users"), sum(col("m_cents")).as("total_cents"))
      .orderBy("r_score", "f_score", "mb_score")
  }

  val qRfmSql: String =
    """WITH p AS (
      |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day, value
      |  FROM events WHERE event_type = 'purchase'),
      |per_user AS (
      |  SELECT user_id, MAX(day) AS last_day, COUNT(*) AS f,
      |    CAST(SUM(CAST(value AS DECIMAL(30,6))) * 100 AS BIGINT) AS m_cents
      |  FROM p GROUP BY 1),
      |g AS (SELECT MAX(last_day) AS gmax, COUNT(*) AS u FROM per_user),
      |pu AS (
      |  SELECT user_id, gmax - last_day AS r, f, m_cents,
      |    m_cents // 10000 AS mb, u
      |  FROM per_user, g),
      |rs AS (
      |  SELECT v AS r_v, CAST(6 - (1 + (cum - 1) * 5 // u) AS INTEGER) AS r_score
      |  FROM (SELECT r AS v, u, COUNT(*) AS c,
      |          SUM(COUNT(*)) OVER (ORDER BY r) AS cum
      |        FROM pu GROUP BY r, u)),
      |fs AS (
      |  SELECT v AS f_v, CAST(1 + (cum - 1) * 5 // u AS INTEGER) AS f_score
      |  FROM (SELECT f AS v, u, COUNT(*) AS c,
      |          SUM(COUNT(*)) OVER (ORDER BY f) AS cum
      |        FROM pu GROUP BY f, u)),
      |ms AS (
      |  SELECT v AS mb_v, CAST(1 + (cum - 1) * 5 // u AS INTEGER) AS mb_score
      |  FROM (SELECT mb AS v, u, COUNT(*) AS c,
      |          SUM(COUNT(*)) OVER (ORDER BY mb) AS cum
      |        FROM pu GROUP BY mb, u))
      |SELECT r_score, f_score, mb_score, COUNT(*) AS n_users,
      |  CAST(SUM(m_cents) AS BIGINT) AS total_cents
      |FROM pu
      |JOIN rs ON pu.r = rs.r_v
      |JOIN fs ON pu.f = fs.f_v
      |JOIN ms ON pu.mb = ms.mb_v
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** Exponentially-weighted forecast of daily event volume per type —
    * simple exponential smoothing with α = 1/2 truncated to a 20-day
    * window, chosen so the gate is EXACT: the dyadic weights 2^−(k+1) are
    * carried as INTEGER multiples of 2^−20 (weight unit u_k = 2^(19−k)),
    * so the level, the absolute errors, and the micro-unit report are pure
    * BIGINT arithmetic end to end — no decimal-precision capping rules
    * (which differ between engines above p=38) and no doubles anywhere.
    * forecast_micro = L_u·10^6 div 2^20 (truncating div matches in both
    * engines on the positive values here). Missing days contribute zero
    * mass by construction (their term is absent ≡ y=0); MAE is over days
    * whose next day is observed; the first 19 days are warm-up and
    * excluded. Shape: one daily aggregate, a 20-row weight-grid broadcast
    * (terms = |days|·|types|·20 AGGREGATE rows, never raw events), one
    * (type, day) rollup. The forecasting loop every capacity dashboard
    * runs, with a bit-exact cross-engine gate. */
  def qExpSmooth(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.table(spark, dir, "events")
      .groupBy(col("event_type"), expr("ts div 86400000000000").as("day"))
      .agg(count(lit(1)).as("y"))
    val weights = (0 until 20).map(k => (k.toLong, 1L << (19 - k)))
      .toDF("k", "u") // u_k = 2^(19-k): weight 2^-(k+1) in units of 2^-20
    val bounds = daily.agg(min("day").as("dmin"), max("day").as("dmax"))
    val level = daily.crossJoin(broadcast(weights))
      .select(col("event_type"), (col("day") + col("k")).as("t"),
        (col("y") * col("u")).as("term_u"))
      .groupBy("event_type", "t")
      .agg(sum(col("term_u")).as("l_u"))
      .crossJoin(broadcast(bounds))
      .where(col("t") >= col("dmin") + 19 && col("t") <= col("dmax"))
    val next = daily.select(col("event_type"), (col("day") - 1).as("t"),
      col("y").as("y_next"))
    val fc = level.groupBy("event_type")
      .agg(max(struct(col("t"), col("l_u"))).as("last"))
      .select(col("event_type"),
        expr("last.l_u * 1000000 div 1048576").as("forecast_micro"))
    level.join(next, Seq("event_type", "t"))
      .withColumn("abs_err_u", abs(col("y_next") * 1048576 - col("l_u")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(col("abs_err_u")).as("tot_u"))
      .select(col("event_type"), col("n_days"),
        expr("(tot_u * 1000000 div 1048576) div n_days").as("mae_micro"))
      .join(fc, "event_type")
      .select(col("event_type"), col("n_days"), col("forecast_micro"),
        col("mae_micro"))
      .orderBy("event_type")
  }

  val qExpSmoothSql: String = {
    val weightRows = (0 until 20)
      .map(k => s"($k, ${1L << (19 - k)})").mkString(", ")
    s"""WITH daily AS (
       |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
       |    COUNT(*) AS y
       |  FROM events GROUP BY 1, 2),
       |w(k, u) AS (VALUES $weightRows),
       |b AS (SELECT MIN(day) AS dmin, MAX(day) AS dmax FROM daily),
       |lvl AS (
       |  SELECT event_type, day + k AS t, CAST(SUM(y * u) AS BIGINT) AS l_u
       |  FROM daily CROSS JOIN w GROUP BY 1, 2),
       |lvl_win AS (
       |  SELECT lvl.* FROM lvl, b WHERE t >= dmin + 19 AND t <= dmax),
       |nxt AS (
       |  SELECT event_type, day - 1 AS t, y AS y_next FROM daily),
       |fc AS (
       |  SELECT event_type,
       |    CAST(max_by(l_u, t) * 1000000 // 1048576 AS BIGINT)
       |      AS forecast_micro
       |  FROM lvl_win GROUP BY 1)
       |SELECT s.event_type, s.n_days, fc.forecast_micro, s.mae_micro
       |FROM (
       |  SELECT l.event_type, COUNT(*) AS n_days,
       |    CAST((CAST(SUM(abs(y_next * 1048576 - l.l_u)) AS BIGINT)
       |          * 1000000 // 1048576) // COUNT(*) AS BIGINT) AS mae_micro
       |  FROM lvl_win l JOIN nxt USING (event_type, t)
       |  GROUP BY 1) s
       |JOIN fc USING (event_type)
       |ORDER BY s.event_type""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_exp_smooth" -> (qExpSmooth _),
    "q_rfm" -> (qRfm _),
    "q_dau_mau" -> (qDauMau _),
    "q_period_over_period" -> (qPeriodOverPeriod _),
    "q_bootstrap_ci" -> (qBootstrapCi _),
    "q_window_distinct" -> (qWindowDistinct _),
    "q_mode_median" -> (qModeMedian _),
    "q_bit_aggs" -> (qBitAggs _),
    "q_hll_merge" -> (qHllMerge _),
    "q_cohort_revenue" -> (qCohortRevenue _),
    "q_skyline" -> (qSkyline _),
    "q_max_concurrency" -> (qMaxConcurrency _),
    "q_markov_transitions" -> (qMarkovTransitions _),
    "q_time_to_event" -> (qTimeToEvent _),
    "q_changepoint" -> (qChangepoint _),
    "q_benford" -> (qBenford _),
    "q_rank_functions" -> (qRankFunctions _))

  /** The remaining rank-function family — ntile / percent_rank / cume_dist
    * — rolled into per-priority price deciles (bounds, counts, and the
    * tail rank statistics per decile). Both engines assign ntile
    * remainders to the leading buckets and compute percent_rank =
    * (rank−1)/(n−1), cume_dist = rows≤current/n as pure IEEE divisions of
    * exact integers; one bounded-fan window. */
  def qRankFunctions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("prio")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.table(spark, dir, "orders")
      .select(col("o_orderpriority").as("prio"), col("o_totalprice"),
        col("o_orderkey"))
      .withColumn("decile", ntile(10).over(w))
      .withColumn("pr", round(percent_rank().over(w), 6))
      .withColumn("cd", round(cume_dist().over(w), 6))
      .groupBy("prio", "decile")
      .agg(count(lit(1)).as("n"),
        round(min("o_totalprice"), 2).as("lo"),
        round(max("o_totalprice"), 2).as("hi"),
        max("pr").as("max_pr"), max("cd").as("max_cd"))
      .orderBy("prio", "decile")
  }

  val qRankFunctionsSql: String =
    """WITH r AS (
      |  SELECT o_orderpriority AS prio, o_totalprice,
      |    ntile(10) OVER w AS decile,
      |    round(percent_rank() OVER w, 6) AS pr,
      |    round(cume_dist() OVER w, 6) AS cd
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey))
      |SELECT prio, CAST(decile AS INT) AS decile, CAST(COUNT(*) AS BIGINT) AS n,
      |  round(MIN(o_totalprice), 2) AS lo, round(MAX(o_totalprice), 2) AS hi,
      |  MAX(pr) AS max_pr, MAX(cd) AS max_cd
      |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Change-point detection per event type: the CUSUM statistic over daily
    * counts — peak |cumulative − expected-under-uniform| locates the day
    * where the rate shifted. Entirely INTEGER arithmetic (dev = cum·n_days −
    * k·total — the ×n_days·total-scaled CUSUM, exact in BIGINT; magnitude
    * reported in ppm of the ceiling), so the gate is exact with no rounding
    * anywhere. One day-bucket aggregate + one type-keyed window over
    * DAY rows (time-range-bounded fan). */
  def qChangepoint(spark: SparkSession, dir: String): DataFrame = {
    val dc = Tables.table(spark, dir, "events")
      .groupBy(col("event_type"), expr("ts div 86400000000000").as("day"))
      .agg(count(lit(1)).as("c"))
    val m = dc.groupBy("event_type")
      .agg(sum("c").cast("long").as("tot"), count(lit(1)).as("nd"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val dev = dc.join(m, "event_type")
      .withColumn("cum",
        sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
      .withColumn("k", row_number().over(w).cast("long"))
      .select(col("event_type"), col("day"),
        expr("cum * nd - k * tot").as("dev"), col("tot"), col("nd"))
    val mx = dev.groupBy("event_type").agg(max(abs(col("dev"))).as("m"))
    dev.join(mx, "event_type")
      .where(abs(col("dev")) === col("m"))
      .groupBy(col("event_type"), col("m").as("peak_dev"),
        expr("(1000000 * m) div (tot * nd)").as("frac_ppm"))
      .agg(min("day").cast("long").as("peak_day"))
      .select(col("event_type"), col("peak_day"), col("peak_dev"),
        col("frac_ppm"))
      .orderBy("event_type")
  }

  val qChangepointSql: String =
    """WITH dc AS (
      |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day, COUNT(*) AS c
      |  FROM events GROUP BY 1, 2),
      |m AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS tot,
      |             CAST(COUNT(*) AS BIGINT) AS nd FROM dc GROUP BY 1),
      |cs AS (
      |  SELECT d.event_type, d.day,
      |    CAST(SUM(d.c) OVER (PARTITION BY d.event_type ORDER BY d.day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
      |    CAST(row_number() OVER (PARTITION BY d.event_type ORDER BY d.day) AS BIGINT) AS k,
      |    m.tot, m.nd
      |  FROM dc d JOIN m USING (event_type)),
      |dev AS (SELECT event_type, day, cum * nd - k * tot AS dev, tot, nd FROM cs),
      |mx AS (SELECT event_type, MAX(abs(dev)) AS m FROM dev GROUP BY 1)
      |SELECT d.event_type, CAST(MIN(d.day) AS BIGINT) AS peak_day,
      |  CAST(mm.m AS BIGINT) AS peak_dev,
      |  (1000000 * CAST(mm.m AS BIGINT)) // (d.tot * d.nd) AS frac_ppm
      |FROM dev d JOIN mx mm ON mm.event_type = d.event_type
      |  AND abs(d.dev) = mm.m
      |GROUP BY 1, 3, 4 ORDER BY 1""".stripMargin

  /** Benford first-digit audit of the value column — the classic
    * synthetic/fraudulent-number detector. Expected counts use INTEGER ppm
    * literals of log10(1+1/d) (no runtime libm, no double rounding —
    * expected = (ppm·n) div 10⁶ exactly); the per-digit deviation is
    * likewise exact ppm. */
  def qBenford(spark: SparkSession, dir: String): DataFrame = {
    val ppm = Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L,
      57992L, 51153L, 45757L)
    val h = Tables.table(spark, dir, "events")
      .where(abs(col("value")) >= 1)
      // floor, not cast: DuckDB CAST(double AS BIGINT) rounds-half-even
      // while Spark's truncates — floor() agrees in both engines
      .select(expr("cast(substring(cast(cast(floor(abs(value)) as bigint) as string), 1, 1) as int)")
        .as("d"))
      .groupBy("d").agg(count(lit(1)).as("observed"))
    val n = h.agg(sum("observed").cast("long").as("n"))
    val e = h.sparkSession.createDataFrame(
        ppm.zipWithIndex.map { case (p, i) => ((i + 1), p) })
      .toDF("d", "ppm")
    e.join(h, Seq("d"), "left")
      .crossJoin(broadcast(n))
      .select(col("d"), coalesce(col("observed"), lit(0L)).as("observed"),
        expr("(ppm * n) div 1000000").as("expected_benford"),
        expr("(1000000 * abs(coalesce(observed, 0) - (ppm * n) div 1000000)) div n")
          .as("abs_dev_ppm"))
      .orderBy("d")
  }

  val qBenfordSql: String =
    """WITH v AS (
      |  SELECT CAST(substr(CAST(CAST(floor(abs(value)) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS d
      |  FROM events WHERE abs(value) >= 1),
      |h AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS observed FROM v GROUP BY 1),
      |n AS (SELECT CAST(SUM(observed) AS BIGINT) AS n FROM h),
      |e AS (SELECT unnest(generate_series(1, 9)) AS d,
      |             unnest([301030, 176091, 124939, 96910, 79181, 66947,
      |                     57992, 51153, 45757]) AS ppm)
      |SELECT CAST(e.d AS INT) AS d, COALESCE(h.observed, 0) AS observed,
      |  (CAST(e.ppm AS BIGINT) * n.n) // 1000000 AS expected_benford,
      |  (1000000 * abs(COALESCE(h.observed, 0)
      |     - (CAST(e.ppm AS BIGINT) * n.n) // 1000000)) // n.n AS abs_dev_ppm
      |FROM e LEFT JOIN h ON h.d = e.d, n ORDER BY e.d""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_exp_smooth" -> qExpSmoothSql,
    "q_rfm" -> qRfmSql,
    "q_dau_mau" -> qDauMauSql,
    "q_period_over_period" -> qPeriodOverPeriodSql,
    "q_bootstrap_ci" -> qBootstrapCiSql,
    "q_window_distinct" -> qWindowDistinctSql,
    "q_mode_median" -> qModeMedianSql,
    "q_bit_aggs" -> qBitAggsSql,
    "q_hll_merge" -> qHllMergeSql,
    "q_cohort_revenue" -> qCohortRevenueSql,
    "q_skyline" -> qSkylineSql,
    "q_max_concurrency" -> qMaxConcurrencySql,
    "q_markov_transitions" -> qMarkovTransitionsSql,
    "q_time_to_event" -> qTimeToEventSql,
    "q_changepoint" -> qChangepointSql,
    "q_benford" -> qBenfordSql,
    "q_rank_functions" -> qRankFunctionsSql)
}
