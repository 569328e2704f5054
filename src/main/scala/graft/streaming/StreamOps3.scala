package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** §2.7 addition (round 7): streaming anomaly detection — a per-key running
  * z-score (Welford-style sufficient statistics) flagging events more than
  * 3σ from the history seen so far. The standing monitor a lake ingest runs
  * beside the pipeline: state per key is THREE numbers (n, Σx, Σx²), so a
  * million-key deployment carries megabytes of state, bounded regardless of
  * stream length.
  *
  * The driver-checked entry replays the identical semantics as batch
  * relational algebra (exclusive-prefix window sums per event_type — the
  * ORDER is the stream's arrival contract: µs-truncated event time + id,
  * §4 timestamp rule); Round7bSpec runs the REAL streaming path — a
  * MemoryStream fed time-ordered batches through flatMapGroupsWithState
  * with byte-identical decimal arithmetic — and asserts stream ≡ batch.
  */
object StreamOps3 {

  /** Batch-equivalent driver entry: per event type, how many events were
    * scored (≥30 prior observations), how many exceeded |z| > 3, and the
    * largest excursion. Prefix sums accumulate in DECIMAL (§4: fp window
    * sums must not depend on partition/order internals), rendered to double
    * once per row; z itself is then pure IEEE arithmetic, identical in both
    * engines. */
  def stAnomaly(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type")
      .orderBy(expr("ts div 1000"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.table(spark, dir, "events")
      .select(col("event_type"), col("value"), col("ts"), col("event_id"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx",
        sum(col("value").cast("decimal(30,6)")).over(w).cast("double"))
      .withColumn("sxx",
        sum(expr("cast(round(value * value, 6) as decimal(30,7))")).over(w)
          .cast("double"))
      .where(col("n") >= 30)
      .withColumn("z", (col("value") - col("sx") / col("n")) /
        sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_scored"),
        expr("cast(sum(case when abs(z) > 3 then 1 else 0 end) as bigint)")
          .as("n_anomalies"),
        round(max(abs(col("z"))), 4).as("max_abs_z"))
      .orderBy("event_type")
  }

  val stAnomalySql: String =
    """WITH r AS (
      |  SELECT event_type, value,
      |    COUNT(*) OVER w AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(30,6))) OVER w AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(round(value * value, 6) AS DECIMAL(30,7))) OVER w AS DOUBLE) AS sxx
      |  FROM events
      |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |z AS (
      |  SELECT event_type,
      |    (value - sx / n) / sqrt((sxx - sx * sx / n) / (n - 1)) AS z
      |  FROM r WHERE n >= 30)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_scored,
      |  CAST(SUM(CASE WHEN abs(z) > 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
      |  round(MAX(abs(z)), 4) AS max_abs_z
      |FROM z GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------- streaming path

  /** One input event on the stream: µs event time + id carry the arrival
    * order contract (ties broken by id, as in the batch window). */
  case class AnomEvent(event_type: String, value: Double, ts_us: Long,
                       event_id: Long)

  /** Welford state: exact decimal sufficient statistics. Strings (not
    * BigDecimal) so the case-class encoder stays kryo-free and exact. */
  case class AnomState(n: Long, sx: String, sxx: String)

  /** Per-batch emission: deltas this batch + the batch's largest |z|. */
  case class AnomBatchOut(event_type: String, scored: Long, anomalies: Long,
                          maxAbsZ: Double)

  private val HALF_UP = java.math.RoundingMode.HALF_UP

  /** The EXACT arithmetic the batch plan runs, one event at a time:
    * cast(value as decimal(30,6)) ≡ valueOf(v).setScale(6, HALF_UP);
    * cast(round(v², 6) as decimal(30,7)) ≡ the two-step below. Byte-for-byte
    * agreement with the window sums is what Round7bSpec asserts. */
  private[streaming] def foldGroup(
      key: String, it: Iterator[AnomEvent], state: GroupState[AnomState])
      : Iterator[AnomBatchOut] = {
    var (n, sx, sxx) = state.getOption match {
      case Some(s) => (s.n, new java.math.BigDecimal(s.sx),
        new java.math.BigDecimal(s.sxx))
      case None => (0L, java.math.BigDecimal.ZERO, java.math.BigDecimal.ZERO)
    }
    var scored = 0L; var anomalies = 0L; var maxAbs = 0.0
    // arrival contract: within a batch, events fold in (ts_us, id) order
    it.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
      if (n >= 30) {
        val sxd = sx.doubleValue; val sxxd = sxx.doubleValue
        val z = (e.value - sxd / n) /
          math.sqrt((sxxd - sxd * sxd / n) / (n - 1))
        scored += 1
        if (math.abs(z) > 3) anomalies += 1
        if (math.abs(z) > maxAbs) maxAbs = math.abs(z)
      }
      n += 1
      sx = sx.add(java.math.BigDecimal.valueOf(e.value).setScale(6, HALF_UP))
      val r6 = java.math.BigDecimal.valueOf(e.value * e.value)
        .setScale(6, HALF_UP).doubleValue
      sxx = sxx.add(java.math.BigDecimal.valueOf(r6).setScale(7, HALF_UP))
    }
    state.update(AnomState(n, sx.toPlainString, sxx.toPlainString))
    Iterator.single(AnomBatchOut(key, scored, anomalies, maxAbs))
  }

  /** The standing streaming query: per-type Welford state via
    * flatMapGroupsWithState, one summary row per (type, micro-batch).
    * State is O(1) per key; the shuffle per batch is keyed on event_type. */
  def anomalyStream(events: Dataset[AnomEvent]): Dataset[AnomBatchOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(foldGroup)
  }

  /** Shared batch/stream transform for st_topk: per-day per-type per-user
    * event counts. Streaming-safe as a stateful aggregation (complete mode,
    * or append with a watermark on the day bucket); the rank is applied
    * DOWNSTREAM of the aggregation — exactly where a production pipeline
    * ranks (on window close / in the serving query), because rank needs the
    * window's final counts. */
  def topkCounts(df: DataFrame): DataFrame =
    df.select(expr("ts div 86400000000000").as("day"), col("event_type"),
        col("user_id"))
      .groupBy("day", "event_type", "user_id")
      .agg(count(lit(1)).as("c"))

  /** Windowed heavy hitters: top-3 users per (day, event type) by event
    * count — q_cms_topk's exact windowed sibling and the standing "who is
    * hot right now" stream query. Rank ties break by user_id; the rank ≤ 3
    * filter compiles to the map-side WindowGroupLimit (≤3 rows per key
    * cross the shuffle). Round7bSpec proves the streamed counts rank to
    * the identical board. */
  def stTopk(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("day", "event_type")
      .orderBy(col("c").desc, col("user_id"))
    topkCounts(Tables.table(spark, dir, "events"))
      .withColumn("rnk", row_number().over(w)).where(col("rnk") <= 3)
      .select(col("day"), col("event_type"), col("rnk"), col("user_id"),
        col("c"))
      .orderBy("day", "event_type", "rnk")
  }

  val stTopkSql: String =
    """WITH c AS (
      |  SELECT epoch_ns(ts) // 86400000000000 AS day, event_type, user_id,
      |    COUNT(*) AS c
      |  FROM events GROUP BY 1, 2, 3),
      |r AS (
      |  SELECT day, event_type, user_id, CAST(c AS BIGINT) AS c,
      |    row_number() OVER (PARTITION BY day, event_type
      |                       ORDER BY c DESC, user_id) AS rnk
      |  FROM c)
      |SELECT day, event_type, CAST(rnk AS INT) AS rnk, user_id, c
      |FROM r WHERE rnk <= 3 ORDER BY day, event_type, rnk""".stripMargin

  // ------------------------------------------------- streaming forecast

  case class FcEvent(event_type: String, day: Long, event_id: Long)

  /** Rolling forecast state: the last ≤20 closed (day, count) pairs, the
    * currently-open day's running count, the level computed at the last
    * closed day (integer 2^-20 units), and the first day seen (warm-up). */
  case class FcState(days: List[Long], counts: List[Long],
                     curDay: Long, curY: Long,
                     lastT: Long, lastLu: Long, dmin: Long)

  case class FcOut(event_type: String, t: Long, forecast_micro: Long,
                   y_next: Long, err_micro: Long)

  private def levelU(days: List[Long], counts: List[Long], t: Long): Long =
    days.zip(counts).collect {
      case (d, y) if t - d <= 19 => y * (1L << (19 - (t - d)))
    }.sum

  /** The same integer-exact EWMA the q_exp_smooth batch plan computes,
    * folded one event at a time: a closed day D first scores the forecast
    * made at D−1 (only for consecutive observed days — the batch joins
    * level(t) to the observed day t+1), then pushes (D, y_D) into the
    * ≤20-day buffer and recomputes the level in 2^-20 units. Missing days
    * contribute zero mass in both formulations by construction. */
  private[streaming] def foldForecast(
      key: String, it: Iterator[FcEvent], state: GroupState[FcState])
      : Iterator[FcOut] = {
    var s = state.getOption.getOrElse(
      FcState(Nil, Nil, -1L, 0L, -1L, 0L, -1L))
    val out = scala.collection.mutable.ArrayBuffer.empty[FcOut]
    def close(): Unit = if (s.curDay >= 0) {
      val (d, y) = (s.curDay, s.curY)
      if (s.lastT == d - 1 && s.lastT >= s.dmin + 19) {
        val lu = s.lastLu
        out += FcOut(key, s.lastT, lu * 1000000L / 1048576L, y,
          math.abs(y * 1048576L - lu) * 1000000L / 1048576L)
      }
      val days = (s.days :+ d).takeRight(20)
      val counts = (s.counts :+ y).takeRight(20)
      s = s.copy(days = days, counts = counts,
        lastT = d, lastLu = levelU(days, counts, d))
    }
    // arrival contract: within a batch, events fold in (day, id) order
    it.toSeq.sortBy(e => (e.day, e.event_id)).foreach { e =>
      if (s.curDay < 0) s = s.copy(curDay = e.day, curY = 1L,
        dmin = if (s.dmin < 0) e.day else s.dmin)
      else if (e.day == s.curDay) s = s.copy(curY = s.curY + 1)
      else { close(); s = s.copy(curDay = e.day, curY = 1L) }
    }
    // day boundaries are only visible when the NEXT day's first event
    // arrives, so the open day stays buffered across micro-batches; a
    // terminal sentinel (day = Long.MaxValue) flushes it for testing
    state.update(s)
    out.iterator
  }

  def forecastStream(events: Dataset[FcEvent]): Dataset[FcOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(foldForecast)
  }

  /** Shared batch form of the rolling forecast: the q_exp_smooth weight-
    * grid level, restricted to OBSERVED days (the stream only closes days
    * that occur) and evaluated against the next observed day — the
    * per-day forecast/error SEQUENCE an online monitor emits, where
    * q_exp_smooth ships the summary. Warm-up (first 19 days per type)
    * excluded; all arithmetic integer 2^-20/micro units (q_exp_smooth's
    * exactness argument). Round7dSpec proves the flatMapGroupsWithState
    * fold above replays this plan row-for-row. */
  def stForecast(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.table(spark, dir, "events")
      .select(col("event_type"), expr("ts div 86400000000000").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("y"))
    val weights = (0 until 20).map(k => (k.toLong, 1L << (19 - k)))
      .toDF("k", "u")
    val bounds = daily.groupBy("event_type").agg(min("day").as("dmin"))
    val level = daily.crossJoin(broadcast(weights))
      .select(col("event_type"), (col("day") + col("k")).as("t"),
        (col("y") * col("u")).as("term_u"))
      .groupBy("event_type", "t").agg(sum(col("term_u")).as("l_u"))
      .join(daily.select(col("event_type"), col("day").as("t")),
        Seq("event_type", "t")) // observed days only — the stream's closings
    val next = daily.select(col("event_type"), (col("day") - 1).as("t"),
      col("y").as("y_next"))
    level.join(next, Seq("event_type", "t"))
      .join(bounds, "event_type")
      .where(col("t") >= col("dmin") + 19)
      .select(col("event_type"), col("t"),
        expr("l_u * 1000000 div 1048576").as("forecast_micro"),
        col("y_next"),
        expr("abs(y_next * 1048576 - l_u) * 1000000 div 1048576").as("err_micro"))
      .orderBy("event_type", "t")
  }

  val stForecastSql: String = {
    val weightRows = (0 until 20)
      .map(k => s"($k, ${1L << (19 - k)})").mkString(", ")
    s"""WITH daily AS (
       |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
       |    COUNT(*) AS y
       |  FROM events GROUP BY 1, 2),
       |w(k, u) AS (VALUES $weightRows),
       |b AS (SELECT event_type, MIN(day) AS dmin FROM daily GROUP BY 1),
       |lvl AS (
       |  SELECT event_type, day + k AS t, CAST(SUM(y * u) AS BIGINT) AS l_u
       |  FROM daily CROSS JOIN w GROUP BY 1, 2),
       |obs AS (
       |  SELECT l.event_type, l.t, l.l_u
       |  FROM lvl l JOIN daily d ON d.event_type = l.event_type AND d.day = l.t),
       |nxt AS (SELECT event_type, day - 1 AS t, y AS y_next FROM daily)
       |SELECT o.event_type, o.t,
       |  CAST(o.l_u * 1000000 // 1048576 AS BIGINT) AS forecast_micro,
       |  n.y_next,
       |  CAST(abs(n.y_next * 1048576 - o.l_u) * 1000000 // 1048576 AS BIGINT)
       |    AS err_micro
       |FROM obs o
       |JOIN nxt n USING (event_type, t)
       |JOIN b USING (event_type)
       |WHERE o.t >= b.dmin + 19
       |ORDER BY o.event_type, o.t""".stripMargin
  }

  /** Kappa-architecture cutover audit: a backfill covers days < d0+20, the
    * live stream starts at d0+19 — one day of deliberate OVERLAP (the
    * standard anti-gap margin: starting the stream exactly at the boundary
    * loses in-flight events; starting earlier double-reads). The audit
    * proves the seam: per type, backfill + live − overlap must equal the
    * distinct event total — any gap or double-count breaks the identity.
    * `gapless` carries that proof in-plan.
    *
    * This is the REPORT the handoff runs on its first day; Round7bSpec
    * runs the handoff itself (batch backfill ∪ MemoryStream live tail,
    * id-deduped at the seam ≡ the full-range batch). One scan, one
    * one-row min-day broadcast, one aggregate. */
  def stBackfill(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.table(spark, dir, "events")
      .select(col("event_id"), col("event_type"),
        expr("ts div 86400000000000").as("day"))
    val bounds = ev.agg(min("day").as("d0"))
    ev.crossJoin(broadcast(bounds))
      .select(col("event_type"),
        (col("day") < col("d0") + lit(20L)).as("bf"),
        (col("day") >= col("d0") + lit(19L)).as("lv"))
      .groupBy("event_type")
      .agg(sum(when(col("bf"), 1L).otherwise(0L)).cast("long").as("backfill_events"),
        sum(when(col("lv"), 1L).otherwise(0L)).cast("long").as("live_events"),
        sum(when(col("bf") && col("lv"), 1L).otherwise(0L)).cast("long")
          .as("overlap_events"),
        count(lit(1)).cast("long").as("total_events"))
      .select(col("event_type"), col("backfill_events"), col("live_events"),
        col("overlap_events"), col("total_events"),
        (col("backfill_events") + col("live_events") - col("overlap_events")
          === col("total_events")).as("gapless"))
      .orderBy("event_type")
  }

  val stBackfillSql: String =
    """WITH ev AS (
      |  SELECT event_id, event_type,
      |         epoch_ns(ts) // 86400000000000 AS day
      |  FROM events),
      |b AS (SELECT MIN(day) AS d0 FROM ev),
      |t AS (SELECT event_type,
      |        CASE WHEN day < d0 + 20 THEN 1 ELSE 0 END AS bf,
      |        CASE WHEN day >= d0 + 19 THEN 1 ELSE 0 END AS lv
      |      FROM ev CROSS JOIN b),
      |agg AS (
      |  SELECT event_type,
      |    CAST(SUM(bf) AS BIGINT) AS backfill_events,
      |    CAST(SUM(lv) AS BIGINT) AS live_events,
      |    CAST(SUM(bf * lv) AS BIGINT) AS overlap_events,
      |    CAST(COUNT(*) AS BIGINT) AS total_events
      |  FROM t GROUP BY 1)
      |SELECT event_type, backfill_events, live_events, overlap_events,
      |  total_events,
      |  (backfill_events + live_events - overlap_events = total_events) AS gapless
      |FROM agg ORDER BY event_type""".stripMargin

  /** Hopping (sliding) windows: 10-minute windows advancing every 5
    * minutes — each event lands in exactly TWO windows, giving the
    * overlap a tumbling aggregate (st_window_agg) can't: a spike
    * straddling a tumbling boundary splits in half; some hop window
    * always sees it whole. Identical transform batch/stream (the
    * StreamOps.windowAgg discipline — StreamingSpec asserts MemoryStream
    * parity); state per key holds duration/slide = 2 live windows, still
    * watermark-bounded. The oracle replays the window-assignment
    * arithmetic directly: an event at second t belongs to window starts
    * {⌊t/300⌋·300 − k·300, k ∈ {0,1}} — the two multiples of the 300 s
    * slide within 600 s of t. */
  def hoppingAgg(df: DataFrame): DataFrame =
    StreamOps.watermarked(df, "10 minutes")
      .groupBy(window(col("event_time"), "10 minutes", "5 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), Tables.dsum(col("value")).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n"), col("sum_value"))

  def stHopping(spark: SparkSession, dir: String): DataFrame =
    hoppingAgg(Tables.table(spark, dir, "events"))
      .orderBy("win_start", "event_type")

  val stHoppingSql: String =
    """SELECT (epoch_ns(ts) // 300000000000 - k.k) * 300 AS win_start,
      |  event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
      |FROM events, (VALUES (0), (1)) AS k(k)
      |GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st_anomaly" -> (stAnomaly _),
    "st_topk" -> (stTopk _),
    "st_forecast" -> (stForecast _),
    "st_backfill" -> (stBackfill _),
    "st_hopping" -> (stHopping _))

  val oracles: Map[String, String] = Map(
    "st_anomaly" -> stAnomalySql,
    "st_topk" -> stTopkSql,
    "st_forecast" -> stForecastSql,
    "st_backfill" -> stBackfillSql,
    "st_hopping" -> stHoppingSql)
}
