package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.6 continued (round 4): the two multimodal-lake operators that run on
  * MANIFESTS instead of payloads — at 100 TB the blobs are the bytes, and
  * these show the pattern: chunk/frame metadata (tiny) shuffles, payloads
  * never do.
  *
  *  - [[mCasDedup]]: content-addressable-store dedup accounting — the
  *    storage question every binary lake answers before enabling CAS
  *    (chunk-level sharing = dedup ratio). One chunking scan projection +
  *    one md5-grouped aggregate.
  *  - [[mAvSync]]: audio/video stream alignment — each container's video
  *    frames (25 fps ⇒ 40 ms pts steps) matched to the latest audio chunk
  *    (1024 samples @ 44.1 kHz ⇒ 23 219 954 ns steps) at-or-before the
  *    frame's pts. The as-of join runs in the union + running-window form
  *    (q_asof_join's O(n) shape — one shuffle on doc_id, NO range join),
  *    with all pts math in integer nanoseconds (§4 ns rule).
  */
object Multimodal2 {

  /** CAS dedup accounting over 64-byte content chunks: total vs unique
    * chunk counts and bytes, and the dedup savings the CAS layout would
    * realize. Chunking is a zero-shuffle scan projection; the only shuffle
    * is the md5-grouped aggregate (map-side combined), and the output is
    * one row. */
  def mCasDedup(spark: SparkSession, dir: String): DataFrame = {
    val chunks = Tables.fanout(Tables.table(spark, dir, "documents"))
      .select(col("doc_id"), col("text"), length(col("text")).as("n_chars"))
      // guard: sequence(0, -1) infers step -1 → two phantom chunks for an
      // empty payload, silently diverging from the oracle's empty
      // generate_series (ADVICE r4)
      .where(col("n_chars") > 0)
      .select(posexplode(expr(
        "transform(sequence(0, cast(ceil(n_chars / 64.0) AS INT) - 1), i -> substring(text, i * 64 + 1, 64))"))
        .as(Seq("chunk_id", "chunk")))
      .select(md5(encode(col("chunk"), "UTF-8")).as("m"),
        octet_length(encode(col("chunk"), "UTF-8")).cast("long").as("b"))
    chunks.groupBy("m")
      .agg(count(lit(1)).as("cnt"), sum(col("b")).as("sum_b"), min(col("b")).as("min_b"))
      .agg(sum(col("cnt")).as("n_chunks"),
        count(lit(1)).as("n_unique"),
        sum(col("sum_b")).as("bytes_total"),
        sum(col("min_b")).as("bytes_unique"))
      .select(col("n_chunks"), col("n_unique"), col("bytes_total"), col("bytes_unique"),
        round((lit(1.0) - col("bytes_unique").cast("double") / col("bytes_total").cast("double")) * 100, 4)
          .as("savings_pct"))
  }

  val mCasDedupSql: String =
    """WITH ch AS (
      |  SELECT md5(substr(text, i * 64 + 1, 64)) AS m,
      |    CAST(octet_length(encode(substr(text, i * 64 + 1, 64))) AS BIGINT) AS b
      |  FROM documents,
      |    LATERAL unnest(generate_series(0, CAST(ceil(length(text) / 64.0) AS INTEGER) - 1)) AS t(i)),
      |g AS (SELECT m, COUNT(*) AS cnt, SUM(b) AS sum_b, MIN(b) AS min_b FROM ch GROUP BY m)
      |SELECT CAST(SUM(cnt) AS BIGINT) AS n_chunks,
      |  COUNT(*) AS n_unique,
      |  CAST(SUM(sum_b) AS BIGINT) AS bytes_total,
      |  CAST(SUM(min_b) AS BIGINT) AS bytes_unique,
      |  round((1.0 - CAST(SUM(min_b) AS DOUBLE) / CAST(SUM(sum_b) AS DOUBLE)) * 100, 4) AS savings_pct
      |FROM g""".stripMargin

  private val framePtsNs = 40000000L    // 25 fps video
  private val audioPtsNs = 23219954L    // 1024 samples @ 44.1 kHz

  /** A/V alignment for every 10th container: per video frame, the latest
    * audio chunk at-or-before its pts plus the sync lag in µs. Streams are
    * synthesized from the payload manifest (frames = 64-byte chunks, audio
    * = 32-byte chunks — the codec boundary is [[Multimodal.FakeCodec]]'s
    * stub); the alignment machinery is the real thing. */
  def mAvSync(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.table(spark, dir, "documents")
      .where(col("doc_id") % 10 === 3)
      .select(col("doc_id"), octet_length(encode(col("text"), "UTF-8")).as("bytes"))
      // same phantom-chunk guard as mCasDedup (ADVICE r4)
      .where(col("bytes") > 0)
    val frames = docs.select(col("doc_id"),
      explode(expr("sequence(0, cast(ceil(bytes / 64.0) AS INT) - 1)")).as("frame_id"))
      .select(col("doc_id"), col("frame_id"),
        (col("frame_id") * framePtsNs).as("pts"), lit(1).as("kind"),
        lit(null).cast("int").as("audio_id"))
    val audio = docs.select(col("doc_id"),
      explode(expr("sequence(0, cast(ceil(bytes / 32.0) AS INT) - 1)")).as("audio_id"))
      .select(col("doc_id"), lit(null).cast("int").as("frame_id"),
        (col("audio_id") * audioPtsNs).as("pts"), lit(0).as("kind"),
        col("audio_id"))
    val w = Window.partitionBy("doc_id").orderBy(col("pts"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    frames.unionByName(audio.select(frames.columns.map(col): _*))
      .withColumn("a_id", last(col("audio_id"), ignoreNulls = true).over(w))
      .withColumn("a_pts", last(when(col("kind") === 0, col("pts")), ignoreNulls = true).over(w))
      .where(col("kind") === 1)
      .select(col("doc_id"), col("frame_id"),
        expr("pts div 1000").as("pts_us"), col("a_id").as("audio_id"),
        expr("(pts - a_pts) div 1000").as("lag_us"))
      .orderBy("doc_id", "frame_id")
  }

  val mAvSyncSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, octet_length(encode(text)) AS bytes FROM documents
       |  WHERE doc_id % 10 = 3),
       |fr AS (
       |  SELECT doc_id, i AS frame_id, CAST(i * 40000000 AS BIGINT) AS pts,
       |    1 AS kind, CAST(NULL AS INTEGER) AS audio_id
       |  FROM d, LATERAL unnest(generate_series(0, CAST(ceil(bytes / 64.0) AS INTEGER) - 1)) AS t(i)),
       |au AS (
       |  SELECT doc_id, CAST(NULL AS INTEGER) AS frame_id,
       |    CAST(i * 23219954 AS BIGINT) AS pts, 0 AS kind, i AS audio_id
       |  FROM d, LATERAL unnest(generate_series(0, CAST(ceil(bytes / 32.0) AS INTEGER) - 1)) AS t(i)),
       |u AS (SELECT * FROM fr UNION ALL SELECT * FROM au),
       |r AS (
       |  SELECT doc_id, frame_id, pts, kind,
       |    last_value(audio_id IGNORE NULLS) OVER
       |      (PARTITION BY doc_id ORDER BY pts, kind
       |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS a_id,
       |    last_value(CASE WHEN kind = 0 THEN pts END IGNORE NULLS) OVER
       |      (PARTITION BY doc_id ORDER BY pts, kind
       |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS a_pts
       |  FROM u)
       |SELECT doc_id, CAST(frame_id AS INTEGER) AS frame_id, pts // 1000 AS pts_us,
       |  CAST(a_id AS INTEGER) AS audio_id, (pts - a_pts) // 1000 AS lag_us
       |FROM r WHERE kind = 1 ORDER BY doc_id, frame_id""".stripMargin

  /** Perceptual-hash near-dup detection over DECODED content (dHash): CAS
    * (m_cas_dedup) only catches byte-identical chunks — re-encoded or
    * slightly-corrupted assets need a signature of what the media LOOKS
    * like. Per asset: decode frame lumas (the codec stub, batch-iterator
    * mapPartitions — same justified shape as m_frame_sample), build a
    * 64-bit difference hash (bit i = luma(i+1) > luma(i) — the classic
    * dHash, robust to level shifts), then find near-dups WITHOUT the
    * |assets|² comparison: the signature splits into 4 × 16-bit bands and
    * candidates must share one band exactly (pigeonhole: hamming ≤ 3 < 4
    * bands ⇒ some band is identical — ZERO false negatives at the
    * threshold), so the pair search is an equi-join on (band, value) —
    * d_simhash's banding, applied to decoded media (multi-index hashing:
    * band width is THE dial — wider bands ⇒ sparser candidates but a lower
    * guaranteed radius; 8-bit bands would cover hamming ≤ 7 at ~n²/32
    * candidate mass on near-random signatures, the wrong trade).
    * Verification is one codegen popcount per candidate. Payloads never
    * shuffle; 8-byte signatures do. r6: hash-gated — the codec stub is
    * deterministic byte arithmetic, so [[mPhashDedupSql]] replays lumas,
    * signatures, banding and the counts exactly; Round5hSpec keeps the
    * planted-corruption semantics (found within radius; disjoint not). */
  def mPhashDedup(spark: SparkSession, dir: String): DataFrame = {
    val cand = phashPairs(
      Tables.fanout(Tables.table(spark, dir, "documents"))
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")))
    val sigs = phashSigs(
      Tables.fanout(Tables.table(spark, dir, "documents"))
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")))
    sigs.agg(count(lit(1)).as("n_assets"))
      .crossJoin(broadcast(cand.agg(
        count(lit(1)).as("n_candidates"),
        count(when(col("hamming") <= 3, 1)).as("n_neardup"))))
  }

  /** dHash signatures for any (doc_id, payload binary) frame. */
  private[graft] def phashSigs(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val lumas = payload.grouped(Multimodal.FakeCodec.FrameBytes)
            .map(Multimodal.FakeCodec.frameLuma).take(65).toArray
          var sig = 0L
          if (lumas.nonEmpty) {
            var i = 0
            while (i < 64) {
              val a = lumas(math.min(i, lumas.length - 1))
              val b = lumas(math.min(i + 1, lumas.length - 1))
              if (b > a) sig |= (1L << i)
              i += 1
            }
          }
          (id, sig)
        }
      }.toDF("doc_id", "sig")
  }

  /** Banded candidate pairs (a, b, hamming) for any payload frame. */
  private[graft] def phashPairs(payloads: DataFrame): DataFrame = {
    val sigs = phashSigs(payloads)
    val bands = sigs.select(col("doc_id"), col("sig"),
      posexplode(array((0 until 4).map(b =>
        expr(s"(sig >> ${b * 16}) & 65535")): _*)).as(Seq("band", "bv")))
    bands.as("l")
      .join(bands.as("r"),
        col("l.band") === col("r.band") && col("l.bv") === col("r.bv") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("l.sig").as("sa"),
        col("r.doc_id").as("b"), col("r.sig").as("sb"))
      .distinct()
      .withColumn("hamming", expr("bit_count(sa ^ sb)"))
  }

  /** r6: stub-contract replay of the dHash pipeline — lumas (first 65
    * frames), the 64 clamped-index b>a comparisons (bit 63 built in
    * HUGEINT, signed-reconstructed, since BIGINT << 63 overflows there),
    * 16-bit banding, popcount verify, and the three counts. Hash-gated:
    * the gate pins chunking, banding and candidate generation bit-exactly;
    * a real codec would move the op back to rows-only + Round5hSpec. */
  val mPhashDedupSql: String =
    s"""WITH lum AS (
       |  SELECT doc_id, fid,
       |    ${graft.ops.Multimodal.lumaSql("substr(text, fid*64 + 1, 64)")} AS luma
       |  FROM (SELECT doc_id, text,
       |          unnest(range(0, LEAST(CAST(ceil(length(text) / 64.0) AS INT), 65))) AS fid
       |        FROM documents)),
       |ll AS (SELECT doc_id, list(luma ORDER BY fid) AS ls FROM lum GROUP BY 1),
       |sg AS (
       |  SELECT d.doc_id,
       |    CAST(CASE WHEN u >= 9223372036854775808::HUGEINT
       |         THEN u - 18446744073709551616::HUGEINT ELSE u END AS BIGINT) AS sig
       |  FROM (
       |    SELECT d0.doc_id,
       |      CASE WHEN ll.ls IS NULL THEN 0::HUGEINT ELSE
       |        list_sum([CASE WHEN ll.ls[LEAST(i+2, len(ll.ls))] > ll.ls[LEAST(i+1, len(ll.ls))]
       |                  THEN (1::HUGEINT << i) ELSE 0::HUGEINT END
       |                  for i in generate_series(0, 63)])
       |      END AS u
       |    FROM documents d0 LEFT JOIN ll ON d0.doc_id = ll.doc_id) d),
       |bd AS (
       |  SELECT doc_id, sig, b.b AS band, (sig >> (b.b*16)) & 65535 AS bv
       |  FROM sg CROSS JOIN generate_series(0, 3) b(b)),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS a, x.sig AS sa, y.doc_id AS b, y.sig AS sb
       |  FROM bd x JOIN bd y ON x.band = y.band AND x.bv = y.bv
       |                     AND x.doc_id < y.doc_id)
       |SELECT (SELECT COUNT(*) FROM sg) AS n_assets,
       |  COUNT(*) AS n_candidates,
       |  COUNT(CASE WHEN bit_count(xor(sa, sb)) <= 3 THEN 1 END) AS n_neardup
       |FROM cand""".stripMargin

  /** Scene-split plumbing: decode every frame of the 1-in-5 asset subset
    * (batch-iterator mapPartitions — payloads never shuffle), then detect
    * scene boundaries where consecutive frame lumas jump > 128 (half the
    * range). Scene ids are a running boundary count per asset — a doc-keyed
    * window over frame-METADATA rows (the payload stayed on the map side);
    * the rollup emits the per-asset scene profile (frame/scene counts,
    * longest scene) a video-curation pipeline keys its sampling on.
    *
    * Hash-gated under the stub contract ([[Multimodal.FakeCodec]] —
    * deterministic byte arithmetic, replayed by the oracle): the gate pins
    * chunk boundaries, decode inputs, the lag/threshold algebra and the
    * scene arithmetic; a real codec moves the op back to rows-only + spec
    * (the honest boundary, as for m_frame_sample). */
  def mSceneSplit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val frames = Tables.table(spark, dir, "documents")
      .where(col("doc_id") % 5 === 0)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          payload.grouped(Multimodal.FakeCodec.FrameBytes).zipWithIndex
            .map { case (chunk, idx) =>
              (id, idx, Multimodal.FakeCodec.frameLuma(chunk)) }
        }
      }.toDF("doc_id", "frame_id", "luma")
    val w = Window.partitionBy("doc_id").orderBy("frame_id")
    val scenes = frames
      .withColumn("prev", lag(col("luma"), 1).over(w))
      .withColumn("boundary",
        when(col("prev").isNull || abs(col("luma") - col("prev")) > 128, 1)
          .otherwise(0))
      .withColumn("scene_id",
        sum("boundary").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("doc_id", "scene_id").agg(count(lit(1)).as("len"))
    scenes.groupBy("doc_id")
      .agg(sum("len").cast("long").as("n_frames"),
        count(lit(1)).as("n_scenes"),
        max("len").cast("long").as("longest_scene"))
      .orderBy("doc_id")
  }

  val mSceneSplitSql: String =
    s"""WITH f AS (
       |  SELECT doc_id, fid,
       |    ${graft.ops.Multimodal.lumaSql("substr(text, fid*64 + 1, 64)")} AS luma
       |  FROM (SELECT doc_id, text,
       |          unnest(range(0, CAST(ceil(length(text) / 64.0) AS INT))) AS fid
       |        FROM documents WHERE doc_id % 5 = 0)),
       |b AS (
       |  SELECT doc_id, fid, luma,
       |    lag(luma) OVER (PARTITION BY doc_id ORDER BY fid) AS prev
       |  FROM f),
       |s AS (
       |  SELECT doc_id,
       |    SUM(CASE WHEN prev IS NULL OR abs(luma - prev) > 128 THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY fid
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS scene_id
       |  FROM b),
       |sl AS (SELECT doc_id, scene_id, COUNT(*) AS len FROM s GROUP BY 1, 2)
       |SELECT doc_id, CAST(SUM(len) AS BIGINT) AS n_frames,
       |  CAST(COUNT(*) AS BIGINT) AS n_scenes,
       |  CAST(MAX(len) AS BIGINT) AS longest_scene
       |FROM sl GROUP BY 1 ORDER BY doc_id""".stripMargin

  /** Voice-activity detection over stub-decoded audio frames: per-frame
    * energy (the codec stub's luma fold), level threshold (≥ 96 = speech),
    * consecutive active frames collapsed into segments (gaps-and-islands
    * on frame index), 1-frame blips dropped (len ≥ 2 — the hangover floor
    * every production VAD applies). Per-doc report: frame/active counts,
    * speech segments, longest run, speech ratio in exact ppm.
    *
    * m_scene_split's sibling on the AUDIO path: scene cuts threshold the
    * inter-frame DELTA; VAD thresholds the LEVEL and needs the island
    * machinery + minimum-duration filter. Payload chunked inside the task
    * (mapPartitions batch shape) — only per-frame metadata shuffles; the
    * per-doc windows key on doc_id (numeric, bounded fan = frames/doc).
    * Stub boundary: a real decoder swaps in for FakeCodec.frameLuma and
    * this op reverts to rows-only + spec (the r6 contract, stated at
    * m_frame_sample). */
  def mAudioVad(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val frames = Tables.table(spark, dir, "documents")
      .where(col("doc_id") % 3 === 1)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          payload.grouped(Multimodal.FakeCodec.FrameBytes).zipWithIndex
            .map { case (chunk, idx) =>
              (id, idx, Multimodal.FakeCodec.frameLuma(chunk)) }
        }
      }.toDF("doc_id", "frame_id", "luma")
    val perDoc = frames.groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("luma") >= 96, 1L).otherwise(0L)).as("n_active"))
    val w = Window.partitionBy("doc_id").orderBy("frame_id")
    val segs = frames.where(col("luma") >= 96)
      .withColumn("grp", col("frame_id") - row_number().over(w))
      .groupBy("doc_id", "grp").agg(count(lit(1)).as("len"))
      .where(col("len") >= 2)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_segments"), max("len").cast("long").as("longest"))
    perDoc.join(segs, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_frames"), col("n_active"),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("longest"), lit(0L)).as("longest_segment"),
        expr("(1000000 * n_active) div n_frames").as("speech_ppm"))
      .orderBy("doc_id")
  }

  val mAudioVadSql: String =
    s"""WITH f AS (
       |  SELECT doc_id, fid,
       |    ${graft.ops.Multimodal.lumaSql("substr(text, fid*64 + 1, 64)")} AS luma
       |  FROM (SELECT doc_id, text,
       |          unnest(range(0, CAST(ceil(length(text) / 64.0) AS INT))) AS fid
       |        FROM documents WHERE doc_id % 3 = 1)),
       |perdoc AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
       |         CAST(SUM(CASE WHEN luma >= 96 THEN 1 ELSE 0 END) AS BIGINT) AS n_active
       |  FROM f GROUP BY 1),
       |act AS (
       |  SELECT doc_id, fid,
       |    fid - row_number() OVER (PARTITION BY doc_id ORDER BY fid) AS grp
       |  FROM f WHERE luma >= 96),
       |runs AS (
       |  SELECT doc_id, grp, CAST(COUNT(*) AS BIGINT) AS len
       |  FROM act GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |segs AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segments,
       |         CAST(MAX(len) AS BIGINT) AS longest
       |  FROM runs GROUP BY 1)
       |SELECT p.doc_id, p.n_frames, p.n_active,
       |  COALESCE(s.n_segments, 0) AS n_segments,
       |  COALESCE(s.longest, 0) AS longest_segment,
       |  (1000000 * p.n_active) // p.n_frames AS speech_ppm
       |FROM perdoc p LEFT JOIN segs s ON s.doc_id = p.doc_id
       |ORDER BY p.doc_id""".stripMargin

  /** 2-D patch extraction — the ViT patchify plumbing: treat each payload
    * as a 16-row image in row-major byte layout (W = ⌈len/16⌉ bytes per
    * row), cut the 8×8 patch grid, and emit per-patch byte extent + the
    * stub "decode" (luma fold over the patch bytes, gathered row-slice by
    * row-slice — the strided memory access a real patchifier does). Ragged
    * right/bottom edges keep their short patches (real patchifiers pad;
    * the manifest records the true byte extent so the padding policy stays
    * downstream).
    *
    * Same batch-iterator shape as the frame ops: the 2-D gather runs
    * inside the task, only (doc_id, pr, pc, n_bytes, luma) manifest rows
    * ever shuffle. Stub boundary as at m_frame_sample. */
  def mPatchGrid(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "documents")
      .where(col("doc_id") % 7 === 2)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          val w = (payload.length + 15) / 16 // bytes per image row (H=16)
          val pcs = (w + 7) / 8
          for {
            pr <- 0 until 2 // 16 rows / 8-row patches
            pc <- 0 until pcs
          } yield {
            val width = math.min(8, w - pc * 8)
            val tile = (0 until 8).flatMap { i =>
              val start = (pr * 8 + i) * w + pc * 8
              payload.slice(start, start + width)
            }.toArray
            (id, pr, pc, tile.length, Multimodal.FakeCodec.frameLuma(tile))
          }
        }
      }.toDF("doc_id", "pr", "pc", "n_bytes", "luma")
      .orderBy("doc_id", "pr", "pc")
  }

  val mPatchGridSql: String = {
    val tile =
      """array_to_string([substr(text, CAST((pr*8 + i)*w + pc*8 + 1 AS BIGINT),
        |                        CAST(LEAST(8, w - pc*8) AS BIGINT))
        |                 for i in generate_series(0, 7)], '')""".stripMargin
    s"""WITH d AS (
       |  SELECT doc_id, text, (length(text) + 15) // 16 AS w
       |  FROM documents WHERE doc_id % 7 = 2),
       |g AS (
       |  SELECT doc_id, text, w, pr.pr, pc.pc
       |  FROM d
       |  CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS pr) pr
       |  CROSS JOIN LATERAL (SELECT unnest(generate_series(0, (w + 7) // 8 - 1)) AS pc) pc),
       |t AS (SELECT doc_id, pr, pc, $tile AS tile FROM g)
       |SELECT doc_id, CAST(pr AS INT) AS pr, CAST(pc AS INT) AS pc,
       |  CAST(length(tile) AS INT) AS n_bytes,
       |  ${graft.ops.Multimodal.lumaSql("tile")} AS luma
       |FROM t ORDER BY doc_id, pr, pc""".stripMargin
  }

  /** Container demux: split each payload's interleaved chunk stream by
    * stream id (stub: first byte mod 2 → video/audio — a real demuxer
    * reads the container's packet headers) into per-stream manifests, and
    * report INTERLEAVE HEALTH: the largest index gap between consecutive
    * video chunks. A muxer that buffers one stream too long produces
    * exactly this gap spike — players stall on it, and it's the QA number
    * container pipelines alert on.
    *
    * Same batch-iterator decode shape; per-doc numeric-keyed lag window
    * over chunk-index METADATA only. Stub boundary as at m_frame_sample. */
  def mContainerDemux(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val chunks = Tables.table(spark, dir, "documents")
      .where(col("doc_id") % 4 === 3)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          payload.grouped(Multimodal.FakeCodec.FrameBytes).zipWithIndex
            .map { case (chunk, idx) =>
              (id, idx, (chunk(0) & 0xff) % 2, chunk.length) }
        }
      }.toDF("doc_id", "fid", "sid", "len")
    val perDoc = chunks.groupBy("doc_id")
      .agg(sum(when(col("sid") === 0, 1L).otherwise(0L)).as("n_video"),
        sum(when(col("sid") === 1, 1L).otherwise(0L)).as("n_audio"),
        sum(when(col("sid") === 0, col("len")).otherwise(0L)).cast("long")
          .as("video_bytes"),
        sum(when(col("sid") === 1, col("len")).otherwise(0L)).cast("long")
          .as("audio_bytes"))
    val w = Window.partitionBy("doc_id").orderBy("fid")
    val gaps = chunks.where(col("sid") === 0)
      .withColumn("prev", lag("fid", 1).over(w))
      .where(col("prev").isNotNull)
      .groupBy("doc_id")
      .agg(max(col("fid") - col("prev")).cast("long").as("max_video_gap"))
    perDoc.join(gaps, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_video"), col("n_audio"),
        col("video_bytes"), col("audio_bytes"),
        coalesce(col("max_video_gap"), lit(0L)).as("max_video_gap"))
      .orderBy("doc_id")
  }

  val mContainerDemuxSql: String =
    """WITH f AS (
      |  SELECT doc_id, fid, substr(text, fid*64 + 1, 64) AS chunk
      |  FROM (SELECT doc_id, text,
      |          unnest(range(0, CAST(ceil(length(text) / 64.0) AS INT))) AS fid
      |        FROM documents WHERE doc_id % 4 = 3)),
      |c AS (SELECT doc_id, fid, unicode(substr(chunk, 1, 1)) % 2 AS sid,
      |             CAST(length(chunk) AS BIGINT) AS len
      |      FROM f),
      |perdoc AS (
      |  SELECT doc_id,
      |    CAST(SUM(CASE WHEN sid = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_video,
      |    CAST(SUM(CASE WHEN sid = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_audio,
      |    CAST(SUM(CASE WHEN sid = 0 THEN len ELSE 0 END) AS BIGINT) AS video_bytes,
      |    CAST(SUM(CASE WHEN sid = 1 THEN len ELSE 0 END) AS BIGINT) AS audio_bytes
      |  FROM c GROUP BY 1),
      |g AS (
      |  SELECT doc_id, fid, lag(fid) OVER (PARTITION BY doc_id ORDER BY fid) AS prev
      |  FROM c WHERE sid = 0),
      |mg AS (SELECT doc_id, CAST(MAX(fid - prev) AS BIGINT) AS max_video_gap
      |       FROM g WHERE prev IS NOT NULL GROUP BY 1)
      |SELECT p.doc_id, p.n_video, p.n_audio, p.video_bytes, p.audio_bytes,
      |  COALESCE(mg.max_video_gap, 0) AS max_video_gap
      |FROM perdoc p LEFT JOIN mg ON mg.doc_id = p.doc_id
      |ORDER BY p.doc_id""".stripMargin

  /** Keyframe (thumbnail) selection: per asset, the interior frame whose
    * luma CONTRAST against its neighbours is largest — the cheap heuristic
    * thumbnailers run before any learned scorer. Contrast carried DOUBLED
    * so it stays integer (score2 = |2·luma − prev − next|); winner by
    * max(struct(score2, −fid)) — one map-side-combined aggregate, ties to
    * the earliest frame; edge frames (missing a neighbour) can't win.
    * Same payload discipline as every frame op. */
  def mKeyframeSelect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val frames = Tables.table(spark, dir, "documents")
      .where(col("doc_id") % 5 === 2)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          payload.grouped(Multimodal.FakeCodec.FrameBytes).zipWithIndex
            .map { case (chunk, idx) =>
              (id, idx.toLong, Multimodal.FakeCodec.frameLuma(chunk).toLong) }
        }
      }.toDF("doc_id", "fid", "luma")
    val w = Window.partitionBy("doc_id").orderBy("fid")
    frames
      .withColumn("prev", lag("luma", 1).over(w))
      .withColumn("nxt", lead("luma", 1).over(w))
      .where(col("prev").isNotNull && col("nxt").isNotNull)
      .select(col("doc_id"), col("fid"),
        abs(lit(2L) * col("luma") - col("prev") - col("nxt")).as("score2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_interior"),
        max(struct(col("score2"), (-col("fid")).as("nf"))).as("win"))
      .select(col("doc_id"), col("n_interior"),
        (-col("win.nf")).as("keyframe"), col("win.score2").as("contrast_x2"))
      .orderBy("doc_id")
  }

  val mKeyframeSelectSql: String =
    s"""WITH f AS (
       |  SELECT doc_id, fid,
       |    ${graft.ops.Multimodal.lumaSql("substr(text, fid*64 + 1, 64)")} AS luma
       |  FROM (SELECT doc_id, text,
       |          unnest(range(0, CAST(ceil(length(text) / 64.0) AS INT))) AS fid
       |        FROM documents WHERE doc_id % 5 = 2)),
       |n AS (
       |  SELECT doc_id, fid, luma,
       |    lag(luma) OVER w AS prev, lead(luma) OVER w AS nxt
       |  FROM f WINDOW w AS (PARTITION BY doc_id ORDER BY fid)),
       |s AS (
       |  SELECT doc_id, CAST(fid AS BIGINT) AS fid,
       |    CAST(abs(2*luma - prev - nxt) AS BIGINT) AS score2
       |  FROM n WHERE prev IS NOT NULL AND nxt IS NOT NULL),
       |win AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_interior,
       |    max(struct_pack(score2 := score2, nf := -fid)) AS w
       |  FROM s GROUP BY 1)
       |SELECT doc_id, n_interior, -(w.nf) AS keyframe, w.score2 AS contrast_x2
       |FROM win ORDER BY doc_id""".stripMargin

  /** Multimodal context-packing budget report (r10 — p_pack_sequences
    * extended to MIXED modalities, the packing a multimodal-LLM pipeline
    * actually runs): each sample's cost is its text tokens PLUS its routed
    * modality's visual/audio token count, all derived from stub-contract
    * metadata arithmetic (image = the m_patch_grid 2×⌈w/8⌉ patch count,
    * audio = ⌈bytes/64⌉ frames, video = every-4th-frame samples — integer
    * identities on byte length, no payload ever read, let alone shuffled).
    * Samples pack in doc_id order into L=1024-token context windows via
    * the audited two-level prefix (ONE global window over bucket TOTALS,
    * never raw docs — the p_pack_sequences shape PlanAuditSpec enforces);
    * the report is each window's sample count and modality token mix —
    * the number a mixed-modality batch scheduler reads to balance vision
    * load across contexts. Exact integers end-to-end. */
  def mTokenBudget(spark: SparkSession, dir: String): DataFrame = {
    val L = 1024L
    val bucketW = 64L
    val toks = Tables.table(spark, dir, "documents")
      .select(col("doc_id"),
        (col("doc_id") / bucketW).cast("long").as("bucket"),
        element_at(split(lit("image,audio,video"), ","),
          (ascii(substring(col("text"), 1, 1)) % 3 + 1).cast("int")).as("modality"),
        size(split(Dedup.norm(col("text")), " ")).cast("long").as("text_toks"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("bytes"))
      .withColumn("media_toks",
        expr("""CASE modality
               |  WHEN 'image' THEN 2 * (((bytes + 15) div 16 + 7) div 8)
               |  WHEN 'audio' THEN (bytes + 63) div 64
               |  ELSE ((bytes + 63) div 64 + 3) div 4 END""".stripMargin))
      .withColumn("n_toks", col("text_toks") + col("media_toks"))
    val bucketTotals = toks.groupBy("bucket").agg(sum("n_toks").as("bucket_toks"))
    val offsets = bucketTotals.withColumn("bucket_off",
      coalesce(sum(col("bucket_toks")).over(
        Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bucket", "bucket_off")
    val inBucket = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks.join(broadcast(offsets), Seq("bucket"))
      .withColumn("start_tok",
        col("bucket_off") + sum(col("n_toks")).over(inBucket) - col("n_toks"))
      .groupBy(expr(s"start_tok div $L").as("seq"))
      .agg(count(lit(1)).as("n_samples"),
        sum("text_toks").as("text_toks"),
        sum(when(col("modality") === "image", col("media_toks")).otherwise(0L))
          .as("image_toks"),
        sum(when(col("modality") === "audio", col("media_toks")).otherwise(0L))
          .as("audio_toks"),
        sum(when(col("modality") === "video", col("media_toks")).otherwise(0L))
          .as("video_toks"),
        sum("n_toks").as("total_toks"))
      .orderBy("seq")
  }

  val mTokenBudgetSql: String = {
    val normSql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CASE (ascii(substr(text, 1, 1)) % 3) WHEN 0 THEN 'image'
       |         WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
       |    CAST(len(string_split($normSql, ' ')) AS BIGINT) AS text_toks,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS bytes
       |  FROM documents),
       |m AS (
       |  SELECT doc_id, modality, text_toks,
       |    CASE modality
       |      WHEN 'image' THEN 2 * (((bytes + 15) // 16 + 7) // 8)
       |      WHEN 'audio' THEN (bytes + 63) // 64
       |      ELSE ((bytes + 63) // 64 + 3) // 4 END AS media_toks
       |  FROM t),
       |c AS (SELECT *, text_toks + media_toks AS n_toks FROM m),
       |s AS (
       |  SELECT *, CAST(SUM(n_toks) OVER (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM c)
       |SELECT (cum - n_toks) // 1024 AS seq,
       |  CAST(COUNT(*) AS BIGINT) AS n_samples,
       |  CAST(SUM(text_toks) AS BIGINT) AS text_toks,
       |  CAST(SUM(CASE WHEN modality = 'image' THEN media_toks ELSE 0 END) AS BIGINT) AS image_toks,
       |  CAST(SUM(CASE WHEN modality = 'audio' THEN media_toks ELSE 0 END) AS BIGINT) AS audio_toks,
       |  CAST(SUM(CASE WHEN modality = 'video' THEN media_toks ELSE 0 END) AS BIGINT) AS video_toks,
       |  CAST(SUM(n_toks) AS BIGINT) AS total_toks
       |FROM s GROUP BY 1 ORDER BY seq""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m_token_budget" -> (mTokenBudget _),
    "m_keyframe_select" -> (mKeyframeSelect _),
    "m_scene_split" -> (mSceneSplit _),
    "m_cas_dedup" -> (mCasDedup _),
    "m_av_sync" -> (mAvSync _),
    "m_phash_dedup" -> (mPhashDedup _),
    "m_audio_vad" -> (mAudioVad _),
    "m_patch_grid" -> (mPatchGrid _),
    "m_container_demux" -> (mContainerDemux _))

  val oracles: Map[String, String] = Map(
    "m_token_budget" -> mTokenBudgetSql,
    "m_keyframe_select" -> mKeyframeSelectSql,
    "m_scene_split" -> mSceneSplitSql,
    "m_cas_dedup" -> mCasDedupSql,
    "m_av_sync" -> mAvSyncSql,
    "m_phash_dedup" -> mPhashDedupSql,
    "m_audio_vad" -> mAudioVadSql,
    "m_patch_grid" -> mPatchGridSql,
    "m_container_demux" -> mContainerDemuxSql)
}
