package graft.streaming

import graft.Tables
import graft.Tables.dsum
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.7 Structured Streaming over `events`.
  *
  * Each operator is one transform function applied to EITHER a batch or a
  * streaming DataFrame — the Spark unification the reference (a synchronous
  * request/response MCP server) has no analog for. The `queries` entries run
  * the batch plan (oracle-checkable); StreamingSpec drives the identical
  * transform over a MemoryStream and asserts batch ≡ stream results.
  *
  * Scale: watermarks bound state (no unbounded session maps); state store
  * shuffles partition by the grouping key, so sizing follows the same
  * shuffle-partition rule as batch (SURVEY.md §5).
  */
object StreamOps {

  /** events.ts arrives as long nanos (see Tables) → streaming needs a real
    * timestamp column for watermarks/windows: micros precision, exact. */
  def withEventTime(df: DataFrame): DataFrame =
    df.withColumn("event_time", timestamp_micros(expr("ts div 1000")))

  /** Tumbling 5-min window + watermark — THE canonical streaming aggregate.
    * Works identically on batch input (watermark is a no-op there). */
  private[streaming] def watermarked(df: DataFrame, delay: String): DataFrame = {
    val t = withEventTime(df)
    if (t.isStreaming) t.withWatermark("event_time", delay) else t
  }

  def windowAgg(df: DataFrame): DataFrame =
    watermarked(df, "10 minutes")
      .groupBy(window(col("event_time"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n"), col("sum_value"))

  def stWindowAgg(spark: SparkSession, dir: String): DataFrame =
    windowAgg(Tables.table(spark, dir, "events"))
      .orderBy("win_start", "event_type")

  val stWindowAggSql: String =
    """SELECT epoch_ns(ts)//300000000000*300 AS win_start, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin

  /** Streaming exact dedup on event_id with a watermark bounding state
    * retention. Streaming path uses dropDuplicatesWithinWatermark — plain
    * dropDuplicates(id) would keep every id in the state store FOREVER
    * (Spark only evicts dedup state when the event-time column is part of
    * the key set or the WithinWatermark variant is used). Batch form:
    * dropDuplicates. */
  def dedup(df: DataFrame): DataFrame = {
    val t = watermarked(df, "10 minutes")
    if (t.isStreaming) t.dropDuplicatesWithinWatermark("event_id")
    else t.dropDuplicates("event_id")
  }

  def stDedup(spark: SparkSession, dir: String): DataFrame =
    dedup(Tables.table(spark, dir, "events"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_unique"))
      .orderBy("event_type")

  val stDedupSql: String =
    """SELECT event_type, COUNT(DISTINCT event_id) AS n_unique
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Session windows (30-min gap) via the native session_window aggregate —
    * identical semantics batch/stream; the custom-state variant
    * (flatMapGroupsWithState) lives in [[sessionizeWithState]] and is
    * equivalence-tested in StreamingSpec. */
  def sessionAgg(df: DataFrame): DataFrame =
    watermarked(df, "30 minutes")
      .groupBy(col("user_id"), session_window(col("event_time"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))

  def stSession(spark: SparkSession, dir: String): DataFrame =
    sessionAgg(Tables.table(spark, dir, "events"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), max(col("n_events")).as("max_session_events"))
      .orderBy("user_id")

  val stSessionSql: String =
    """WITH g AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN epoch_ns(ts) - epoch_ns(lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)) >= 1800000000000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events),
      |s AS (
      |  SELECT user_id,
      |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM g),
      |per_session AS (
      |  SELECT user_id, session_id, COUNT(*) AS n_events
      |  FROM s GROUP BY user_id, session_id)
      |SELECT user_id, COUNT(*) AS n_sessions, max(n_events) AS max_session_events
      |FROM per_session GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Custom sessionization state machine via flatMapGroupsWithState — the
    * pattern for session logic session_window can't express (per-session
    * value caps, custom merge rules). Emits one row per closed session at
    * event-time timeout; used in StreamingSpec. */
  case class Ev(user_id: Long, tsNs: Long, value: Double)
  case class SessState(startNs: Long, lastNs: Long, n: Int, sum: Double)
  case class SessOut(user_id: Long, n_events: Int, session_value: Double)

  def sessionizeWithState(spark: SparkSession, events: org.apache.spark.sql.Dataset[Ev])
  : org.apache.spark.sql.Dataset[SessOut] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupState
    val gapNs = 1800000000000L
    events.groupByKey(_.user_id)
      .flatMapGroups { (uid: Long, rows: Iterator[Ev]) =>
        // batch form: sort within group, split on gaps — mirrors the
        // streaming state machine's timeout logic deterministically.
        val sorted = rows.toSeq.sortBy(e => (e.tsNs, e.value))
        val out = scala.collection.mutable.ArrayBuffer.empty[SessOut]
        var st: Option[SessState] = None
        sorted.foreach { e =>
          st match {
            case Some(s) if e.tsNs - s.lastNs <= gapNs =>
              st = Some(s.copy(lastNs = e.tsNs, n = s.n + 1, sum = s.sum + e.value))
            case Some(s) =>
              out += SessOut(uid, s.n, s.sum); st = Some(SessState(e.tsNs, e.tsNs, 1, e.value))
            case None => st = Some(SessState(e.tsNs, e.tsNs, 1, e.value))
          }
        }
        st.foreach(s => out += SessOut(uid, s.n, s.sum))
        out.iterator
      }
  }

  /** Stream-static enrichment join: the event stream joined to a broadcast
    * dimension (customer) — the lookup-table pattern. The static side is
    * broadcast per micro-batch (no state store involvement); the post-join
    * aggregate carries the streaming state. Identical plan on batch input. */
  def enrichJoin(events: DataFrame, dim: DataFrame): DataFrame =
    watermarked(events, "10 minutes")
      .join(broadcast(dim.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))

  def stEnrichJoin(spark: SparkSession, dir: String): DataFrame =
    enrichJoin(Tables.table(spark, dir, "events"),
      Tables.table(spark, dir, "customer"))
      .orderBy("c_mktsegment")

  val stEnrichJoinSql: String =
    """SELECT c_mktsegment, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Stream-stream attribution join: per user, purchases within 10 minutes
    * AFTER a view. Both sides watermarked; the event-time interval bound is
    * what lets Spark expire join state (an unbounded stream-stream join
    * would otherwise keep every row forever). Batch form: same equi+range
    * condition — a user-partitioned hash join with the range filter inside,
    * never a cross product. Time math in integer micros on both engines. */
  def streamStreamJoin(views: DataFrame, purchases: DataFrame): DataFrame = {
    val v = (if (views.isStreaming) withEventTime(views).withWatermark("event_time", "10 minutes")
             else withEventTime(views))
      .select(col("user_id"), col("event_id").as("view_id"),
        col("event_time").as("view_time"))
    val p = (if (purchases.isStreaming) withEventTime(purchases).withWatermark("event_time", "10 minutes")
             else withEventTime(purchases))
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"), col("event_time").as("purchase_time"))
    v.join(p, col("user_id") === col("p_user_id")
      && (unix_micros(col("purchase_time")) - unix_micros(col("view_time")))
        .between(lit(0L), lit(600000000L)))
      .select(col("user_id"), col("view_id"), col("purchase_id"))
  }

  def stStreamJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.table(spark, dir, "events")
    streamStreamJoin(e.where(col("event_type") === "view"),
      e.where(col("event_type") === "purchase"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("purchase_id")).as("n_attributed"))
      .orderBy("user_id")
  }

  val stStreamJoinSql: String =
    """SELECT v.user_id AS user_id, COUNT(*) AS n_pairs,
      |  CAST(COUNT(DISTINCT p.event_id) AS BIGINT) AS n_attributed
      |FROM (SELECT * FROM events WHERE event_type = 'view') v
      |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON v.user_id = p.user_id
      | AND epoch_ns(p.ts)//1000 - epoch_ns(v.ts)//1000 BETWEEN 0 AND 600000000
      |GROUP BY v.user_id ORDER BY user_id""".stripMargin

  /** Streaming ingest into the lake: every micro-batch commits one snapshot
    * through [[graft.catalog.LakeCatalog.append]] — the Iceberg
    * streaming-commit shape (immutable files + a new file-list per batch),
    * which is what makes `SHOW SNAPSHOTS` / time travel meaningful on a
    * continuously-ingested 100 TB table.
    *
    * Exactly-once: foreachBatch can REPLAY a batch id after a failure
    * (Spark guarantees at-least-once delivery to the sink); the commit is
    * made idempotent by embedding the batch id in the commit's own
    * snapshot-log line and skipping ids already committed — the same
    * batch-id-fencing every transactional Spark sink (Delta/Iceberg) uses,
    * and atomic because fence and commit are ONE log append.
    * StreamingSpec replays a batch id explicitly and asserts no double
    * commit. */
  def ingestToLake(events: DataFrame, cat: graft.catalog.LakeCatalog,
                   ns: String, table: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        commitBatch(batch, id, cat, ns, table)
      }
      .start()

  /** The idempotent per-batch commit (exposed for the replay spec). The
    * batch id rides IN the snapshot-log line the append itself writes
    * (LakeCatalog.commitSnapshot), so commit and replay-fence are one
    * atomic log append — no crash window between "data committed" and
    * "batch fenced" for a replay to double-commit through. */
  def commitBatch(batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                  id: Long, cat: graft.catalog.LakeCatalog,
                  ns: String, table: String): Unit = {
    if (cat.lastCommittedBatch(ns, table).forall(_ < id) && !batch.isEmpty) {
      cat.append(ns, table, batch, batch = Some(id))
    }
  }

  /** LEFT OUTER stream-stream interval join: every view emits, matched or
    * not — the "which impressions converted" shape. In streaming, the
    * unmatched-left row can only be emitted once the watermark passes the
    * view's join window (Spark holds it in state until then); the
    * watermark + time bound are REQUIRED for outer stream-stream joins,
    * not just an optimization. Batch form: plain left join, same
    * condition. */
  def streamStreamJoinLeft(views: DataFrame, purchases: DataFrame): DataFrame = {
    val v = (if (views.isStreaming) withEventTime(views).withWatermark("event_time", "10 minutes")
             else withEventTime(views))
      .select(col("user_id"), col("event_id").as("view_id"),
        col("event_time").as("view_time"))
    val p = (if (purchases.isStreaming) withEventTime(purchases).withWatermark("event_time", "10 minutes")
             else withEventTime(purchases))
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"), col("event_time").as("purchase_time"))
    v.join(p, col("user_id") === col("p_user_id")
      && (unix_micros(col("purchase_time")) - unix_micros(col("view_time")))
        .between(lit(0L), lit(600000000L)), "left_outer")
      .select(col("user_id"), col("view_id"), col("purchase_id"))
  }

  def stStreamJoinLeft(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.table(spark, dir, "events")
    streamStreamJoinLeft(e.where(col("event_type") === "view"),
      e.where(col("event_type") === "purchase"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_rows"),
        count(col("purchase_id")).as("n_matched"),
        sum(when(col("purchase_id").isNull, 1L).otherwise(0L)).as("n_unconverted"))
      .orderBy("user_id")
  }

  val stStreamJoinLeftSql: String =
    """SELECT v.user_id AS user_id, COUNT(*) AS n_rows,
      |  COUNT(p.event_id) AS n_matched,
      |  CAST(SUM(CASE WHEN p.event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unconverted
      |FROM (SELECT * FROM events WHERE event_type = 'view') v
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON v.user_id = p.user_id
      | AND epoch_ns(p.ts)//1000 - epoch_ns(v.ts)//1000 BETWEEN 0 AND 600000000
      |GROUP BY v.user_id ORDER BY user_id""".stripMargin

  /** Streaming curation — the per-doc gates of Pipeline.pCurateFull applied
    * AT INGEST: language, quality, PII and repetition gates are stateless
    * column algebra (stream-safe by construction), exact dedup is
    * dropDuplicatesWithinWatermark on the content fingerprint (state
    * bounded by the watermark — the unbounded-state trap of plain
    * dropDuplicates does not scale to an always-on ingest). Emits a
    * curation summary over fingerprint-level values only (n_tok derives
    * from the normalized text, i.e. from the fingerprint itself), so the
    * result is independent of WHICH duplicate copy the stream kept —
    * that's what makes batch ≡ stream hold exactly. */
  /** The stateless per-doc curation gates alone (r9 factoring): language,
    * quality, PII and repetition filters with the content fingerprint and
    * token count ATTACHED — every input column (doc_id, text, …) survives,
    * so downstream stages keep composing (StreamOps4's near-duplicate
    * screen needs the text to shingle). Pure column algebra — stream-safe
    * with no state, no shuffle. */
  def gateDocs(df: DataFrame): DataFrame = {
    val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    val nChars = length(col("text")).cast("double")
    val nTokens = size(split(norm, " ")).cast("double")
    val nPunct = size(regexp_extract_all(col("text"), lit("[^A-Za-z0-9\\s]"), lit(0))).cast("double")
    val nAlpha = size(regexp_extract_all(col("text"), lit("[A-Za-z]"), lit(0))).cast("double")
    val nStop = size(regexp_extract_all(concat(lit(" "), norm, lit(" ")),
      lit(" (the|a|of|and|to|in|is|it) "), lit(0))).cast("double")
    val quality = round(
      least(nTokens / 50.0, lit(1.0)) * 0.25
        + (lit(1.0) - least(nPunct / nChars * 5.0, lit(1.0))) * 0.25
        + least(nStop / nTokens * 5.0, lit(1.0)) * 0.25
        + nAlpha / nChars * 0.25, 6)
    val ws = split(norm, " ")
    val rep = lit(1.0) - size(array_distinct(ws)).cast("double") / size(ws)
    val nPii =
      size(regexp_extract_all(col("text"), lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), lit(0))) +
        size(regexp_extract_all(col("text"), lit("\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"), lit(0))) +
        size(regexp_extract_all(col("text"), lit("\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"), lit(0)))
    df.where(col("lang").isin("en", "fr"))
      .withColumn("quality", quality)
      .withColumn("rep", rep)
      .withColumn("n_pii", nPii)
      .where(col("quality") >= 0.55 && col("n_pii") === 0 && col("rep") <= 0.6)
      .drop("quality", "rep", "n_pii")
      .withColumn("fp", md5(norm))
      .withColumn("n_tok", size(split(norm, " ")).cast("long"))
  }

  def curateDocs(df: DataFrame): DataFrame = {
    val gated = gateDocs(df).select(col("event_time"), col("fp"), col("n_tok"))
    if (gated.isStreaming)
      gated.withWatermark("event_time", "10 minutes")
        .dropDuplicatesWithinWatermark("fp")
    else gated.dropDuplicates("fp")
  }

  /** Batch entry: documents get a synthetic arrival time (doc_id seconds —
    * deterministic; a real ingest carries its own event time). */
  def stCurate(spark: SparkSession, dir: String): DataFrame =
    curateDocs(Tables.table(spark, dir, "documents")
      .withColumn("event_time", timestamp_seconds(col("doc_id"))))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("n_tok")).as("n_tokens"))

  val stCurateSql: String = {
    val normSql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    val nChars = "CAST(length(text) AS DOUBLE)"
    val nTokens = s"CAST(length(string_split($normSql, ' ')) AS DOUBLE)"
    val nPunct = "CAST(length(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)"
    val nAlpha = "CAST(length(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)"
    val nStop = s"CAST(length(regexp_extract_all(' ' || $normSql || ' ', ' (the|a|of|and|to|in|is|it) ')) AS DOUBLE)"
    val nPii = """(length(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                 | + length(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b'))
                 | + length(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')))""".stripMargin
    s"""WITH q AS (
       |  SELECT md5($normSql) AS fp,
       |    CAST(length(string_split($normSql, ' ')) AS BIGINT) AS n_tok,
       |    round(least($nTokens / 50.0, 1.0) * 0.25
       |      + (1.0 - least($nPunct / $nChars * 5.0, 1.0)) * 0.25
       |      + least($nStop / $nTokens * 5.0, 1.0) * 0.25
       |      + $nAlpha / $nChars * 0.25, 6) AS quality,
       |    1.0 - CAST(len(list_distinct(string_split($normSql, ' '))) AS DOUBLE)
       |        / len(string_split($normSql, ' ')) AS rep,
       |    $nPii AS n_pii
       |  FROM documents WHERE lang IN ('en', 'fr')),
       |d AS (SELECT DISTINCT fp, n_tok FROM q
       |      WHERE quality >= 0.55 AND n_pii = 0 AND rep <= 0.6)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_kept,
       |       CAST(SUM(n_tok) AS BIGINT) AS n_tokens
       |FROM d""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st_curate" -> (stCurate _),
    "st_window_agg" -> (stWindowAgg _),
    "st_dedup" -> (stDedup _),
    "st_session" -> (stSession _),
    "st_enrich_join" -> (stEnrichJoin _),
    "st_stream_join" -> (stStreamJoin _),
    "st_stream_join_left" -> (stStreamJoinLeft _))

  val oracles: Map[String, String] = Map(
    "st_curate" -> stCurateSql,
    "st_window_agg" -> stWindowAggSql,
    "st_dedup" -> stDedupSql,
    "st_session" -> stSessionSql,
    "st_enrich_join" -> stEnrichJoinSql,
    "st_stream_join" -> stStreamJoinSql,
    "st_stream_join_left" -> stStreamJoinLeftSql)
}
