package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.6 Multimodal columns: image/audio/video as opaque `binary` columns
  * with typed metadata.
  *
  * The container has no media codecs, so the decode step is a clearly-marked
  * deterministic stub ([[FakeCodec]]); everything Spark-side — binary
  * schema, chunking, batch iteration shape, partitioning — is real and
  * tested. Payloads are derived from `documents.text` (utf-8 bytes) so all
  * sizes/offsets are verifiable against an oracle.
  *
  * At 100 TB: binary payloads dominate bytes, so the rules are (1) never
  * carry the payload through a shuffle — extract metadata first, drop the
  * blob; (2) decode in batch-iterator form (mapPartitions — the Scala
  * analog of mapInPandas) so codec state is reused across rows in a task.
  */
object Multimodal {

  /** Deterministic stand-in for the absent media codec. Real pipelines swap
    * this object for JNI/FFI bindings; the Spark plumbing is unchanged. */
  object FakeCodec {
    val FrameBytes = 64
    /** "Decode" a frame: cheap, deterministic pseudo-luma from the bytes. */
    def frameLuma(chunk: Array[Byte]): Int = {
      var acc = 0
      var i = 0
      while (i < chunk.length) { acc = (acc * 31 + (chunk(i) & 0xff)) & 0x7fffffff; i += 1 }
      acc % 256
    }
  }

  /** Binary payload + typed metadata extraction — byte length, 4-byte header
    * hex, chunk count — all codegen'd binary functions; the payload never
    * leaves the map side. */
  def mBinaryMeta(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"), col("text"))
      .select(
        col("doc_id"),
        octet_length(col("payload")).as("byte_len"),
        hex(encode(substring(col("text"), 1, 4), "UTF-8")).as("header_hex"),
        ceil(octet_length(col("payload")) / lit(64.0)).cast("int").as("n_frames"))
      .orderBy("doc_id")

  val mBinaryMetaSql: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
      |  hex(encode(substr(text, 1, 4))) AS header_hex,
      |  CAST(ceil(octet_length(encode(text)) / 64.0) AS INTEGER) AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Frame-sampling plumbing: payload → fixed-size chunks ("frames") via a
    * distributed mapPartitions decode (batch-iterator shape: one codec, many
    * rows), keep every 4th frame, emit (doc_id, frame_id, frame_bytes,
    * luma-stub). Chunking happens inside the task — the payload is never
    * shuffled, only the tiny per-frame metadata rows are.
    * r6: hash-gated — the stub is deterministic byte arithmetic, so
    * [[mFrameSampleSql]] replays the full pipeline given the stub's
    * contract; MultimodalSpec still pins frame counts/sizes/determinism. */
  def mFrameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = Tables.table(spark, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
    src.mapPartitions { rows =>
      // batch shape: codec initialized once per partition, streamed over rows
      rows.flatMap { case (docId, payload) =>
        payload.grouped(FakeCodec.FrameBytes).zipWithIndex.collect {
          case (chunk, idx) if idx % 4 == 0 =>
            (docId, idx, chunk.length, FakeCodec.frameLuma(chunk))
        }
      }
    }.toDF("doc_id", "frame_id", "frame_bytes", "luma")
      .orderBy("doc_id", "frame_id")
  }

  /** Modality routing: classify each payload by its "magic byte" (stub:
    * first byte mod 3 → image/audio/video — a real pipeline reads actual
    * container magics), write the blobs into a MODALITY-PARTITIONED lake
    * layout, and read back one modality with a partition predicate. This is
    * the binary-lake layout rule at 100 TB: route by modality/date at
    * ingest so every downstream decoder scans only its own directories
    * (PartitionFilters, zero foreign blobs read). */
  def mModalityRoute(spark: SparkSession, dir: String): DataFrame = {
    val scratch = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse"
    val cat = new graft.catalog.LakeCatalog(spark, scratch)
    val routed = Tables.table(spark, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
        element_at(split(lit("image,audio,video"), ","),
          (ascii(substring(col("text"), 1, 1)) % 3 + 1).cast("int")).as("modality"))
    cat.dropTable("scratch", "media")
    cat.createTable("scratch", "media", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.BinaryType),
      org.apache.spark.sql.types.StructField("modality", org.apache.spark.sql.types.StringType))))
    cat.appendPartitioned("scratch", "media", routed, Seq("modality"))
    cat.load("scratch", "media")
      .groupBy("modality")
      .agg(count(lit(1)).as("n"),
        sum(octet_length(col("payload"))).as("total_bytes"))
      .orderBy("modality")
  }

  val mModalityRouteSql: String =
    """SELECT CASE (ascii(substr(text, 1, 1)) % 3) WHEN 0 THEN 'image'
      |       WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
      |  COUNT(*) AS n,
      |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
      |FROM documents GROUP BY 1 ORDER BY modality""".stripMargin

  /** Content-addressable chunk manifest: every payload split into 64-byte
    * chunks, each with (offset, length, md5) — the structure that makes
    * chunk-level dedup and ranged fetches work on a binary lake. Chunking
    * is in-plan (sequence + substring inside the scan projection — no
    * shuffle carries the payload; only the manifest rows move). */
  def mChunkManifest(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "documents")
      .where(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("text"),
        length(col("text")).as("n_chars"))
      // empty payloads yield NO chunks: Spark's two-arg sequence infers
      // step -1 when start > stop, so sequence(0, -1) = [0, -1] — two
      // phantom chunks the DuckDB oracle's (empty) generate_series(0, -1)
      // would never emit (ADVICE r4)
      .where(col("n_chars") > 0)
      .select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(0, cast(ceil(n_chars / 64.0) AS INT) - 1), i -> substring(text, i * 64 + 1, 64))"))
          .as(Seq("chunk_id", "chunk")))
      .select(col("doc_id"), col("chunk_id"),
        (col("chunk_id") * 64).cast("long").as("offset"),
        octet_length(encode(col("chunk"), "UTF-8")).as("chunk_bytes"),
        md5(encode(col("chunk"), "UTF-8")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_id")

  val mChunkManifestSql: String =
    """SELECT doc_id, CAST(i AS INTEGER) AS chunk_id,
      |  CAST(i * 64 AS BIGINT) AS offset,
      |  CAST(octet_length(encode(substr(text, i * 64 + 1, 64))) AS INTEGER) AS chunk_bytes,
      |  md5(substr(text, i * 64 + 1, 64)) AS chunk_md5
      |FROM documents,
      |  LATERAL unnest(generate_series(0, CAST(ceil(length(text) / 64.0) AS INTEGER) - 1)) AS t(i)
      |WHERE doc_id % 10 = 0
      |ORDER BY doc_id, chunk_id""".stripMargin

  /** Frame-embedding stub: decode frames (FakeCodec), emit one fixed-width
    * feature vector per sampled frame — the mapPartitions batch shape a
    * real vision encoder runs in (model loaded once per task, streamed over
    * rows). Vector = 8 deterministic pseudo-lumas; downstream this column
    * feeds the §2.5 ANN operators unchanged. r6: hash-gated via
    * [[mFrameEmbedSql]] (stub-contract replay incl. float32 division and
    * 4-dp formatting); MultimodalSpec pins width/determinism. */
  def mFrameEmbed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = Tables.table(spark, dir, "documents")
      .where(col("doc_id") % 5 === 0)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
    src.mapPartitions { rows =>
      // one "model" per partition, reused across rows (batch-iterator shape)
      rows.flatMap { case (docId, payload) =>
        payload.grouped(FakeCodec.FrameBytes).zipWithIndex.collect {
          case (chunk, idx) if idx % 4 == 0 =>
            val vec = Array.tabulate(8) { d =>
              FakeCodec.frameLuma(chunk.drop(d * 8)) / 255.0f
            }
            (docId, idx, vec)
        }
      }
    }.toDF("doc_id", "frame_id", "frame_vec")
      .orderBy("doc_id", "frame_id")
  }

  /** Driver-consumable render of [[mFrameEmbed]]: the harness sorts every
    * column pandas-side, so the raw `array<float>` is unhashable there.
    * Emit the vector as a fixed-precision CSV string — sortable, hashable,
    * and still pins the exact values. The array-typed variant stays the
    * programmatic API (specs + ANN feed). */
  def mFrameEmbedFlat(spark: SparkSession, dir: String): DataFrame =
    mFrameEmbed(spark, dir)
      .select(col("doc_id"), col("frame_id"),
        concat_ws(",", transform(col("frame_vec"),
          x => format_number(x.cast("double"), 4))).as("frame_vec_csv"))
      .orderBy("doc_id", "frame_id")

  /** FakeCodec.frameLuma replayed over an ASCII string fragment: the
    * byte fold `acc = (acc·31 + byte) & 0x7fffffff` then mod 256. The
    * BIGINT `& 0x7fffffff` is exact vs Scala's Int32 wrap-then-mask
    * (the mask only keeps bits 0-30, which the wrap never touches).
    * Corpus payloads are `encode(text)` and the corpus is ASCII (byte ≡
    * codepoint — the same convention every gated m_* oracle already
    * relies on, e.g. the 64-CHAR ≡ 64-byte chunks of m_chunk_manifest). */
  private[ops] def lumaSql(s: String): String =
    s"""CAST((CASE WHEN $s = '' THEN 0 ELSE
       |  list_reduce([0::BIGINT] || [CAST(unicode(c) AS BIGINT) for c in string_split($s, '')],
       |    (acc, b) -> (acc * 31 + b) & 2147483647) END) % 256 AS INT)""".stripMargin

  /** r6: the codec STUB is deterministic byte arithmetic, so — given the
    * stub's contract — the whole frame pipeline (chunking, 1-in-4
    * sampling, luma) replays in SQL and the op hash-gates. What the gate
    * verifies is the Spark-side plumbing: batch shape, chunk boundaries,
    * frame ids, per-frame decode inputs. A REAL codec would move the op
    * back to rows-only + spec (the decode boundary is the stub). */
  val mFrameSampleSql: String =
    s"""WITH f AS (
       |  SELECT doc_id, fid, substr(text, fid*64 + 1, 64) AS chunk
       |  FROM (SELECT doc_id, text,
       |          unnest(range(0, CAST(ceil(length(text) / 64.0) AS INT))) AS fid
       |        FROM documents))
       |SELECT doc_id, CAST(fid AS INT) AS frame_id,
       |  CAST(length(chunk) AS INT) AS frame_bytes,
       |  ${lumaSql("chunk")} AS luma
       |FROM f WHERE fid % 4 = 0
       |ORDER BY doc_id, frame_id""".stripMargin

  /** r6: same stub-contract replay for the embedding pipeline — the 8
    * per-frame features are luma folds over byte suffixes, float-divided
    * by 255 (REAL-cast division ≡ float32, verified over all 256 luma
    * values) and 4-dp formatted (printf ≡ format_number HALF_EVEN: binary
    * floats never land on exact decimal midpoints except 0/1). */
  val mFrameEmbedSql: String =
    s"""WITH f AS (
       |  SELECT doc_id, fid, substr(text, fid*64 + 1, 64) AS chunk
       |  FROM (SELECT doc_id, text,
       |          unnest(range(0, CAST(ceil(length(text) / 64.0) AS INT))) AS fid
       |        FROM documents WHERE doc_id % 5 = 0))
       |SELECT doc_id, CAST(fid AS INT) AS frame_id,
       |  array_to_string(list_transform(generate_series(0, 7), d ->
       |    printf('%.4f',
       |      CAST(CAST(${lumaSql("substr(chunk, d*8 + 1)")} AS REAL)
       |           / CAST(255 AS REAL) AS REAL))), ',') AS frame_vec_csv
       |FROM f WHERE fid % 4 = 0
       |ORDER BY doc_id, frame_id""".stripMargin

  /** Image-text ALIGNMENT gate (r10 — the CLIP-score curation filter, the
    * single most load-bearing multimodal gate in production pipelines,
    * expressed with the honest stub boundary): per doc, cosine between a
    * pooled "vision" embedding (per-dim SUM of the sampled frames' stub
    * lumas — exact BIGINT, the FakeCodec contract) and a pooled "text"
    * embedding (the doc's 64-dim embeddings row block-pooled 8→1 and
    * quantized ×1e6 to BIGINT — the projection-head stand-in). Every
    * pooled coordinate is an EXACT integer, so dot and norms are exact
    * BIGINTs and the single cosine divide (IEEE /, sqrt — correctly
    * rounded) is bit-identical cross-engine; admit at ≥ 0.5. A real
    * pipeline swaps the two pooling stubs for CLIP towers; the Spark
    * shape — decode-side mapPartitions, per-dim map-side-combined sums,
    * one embeddings equi-join, no payload shuffle — is the real thing. */
  def mAlignFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val frames = Tables.table(spark, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (docId, payload) =>
          payload.grouped(FakeCodec.FrameBytes).zipWithIndex.collect {
            case (chunk, idx) if idx % 4 == 0 =>
              (docId, Array.tabulate(8)(d =>
                FakeCodec.frameLuma(chunk.drop(d * 8)).toLong))
          }
        }
      }.toDF("doc_id", "lumas")
    val img = frames
      .select(col("doc_id"), posexplode(col("lumas")).as(Seq("d", "luma")))
      .groupBy("doc_id", "d").agg(sum("luma").as("iv"))
    val txt = Tables.table(spark, dir, "embeddings")
      .select(col("vec_id").as("doc_id"),
        posexplode(expr(
          """transform(sequence(0, 7), d ->
            |  CAST(round(aggregate(slice(embedding, d * 8 + 1, 8), 0D,
            |    (a, x) -> a + CAST(x AS DOUBLE)) * 1000000) AS BIGINT))""".stripMargin))
          .as(Seq("d", "tv")))
    img.join(txt, Seq("doc_id", "d"))
      .groupBy("doc_id")
      .agg(sum(col("iv") * col("tv")).as("dt"),
        sum(col("iv") * col("iv")).as("na"),
        sum(col("tv") * col("tv")).as("nb"))
      .where(col("na") > 0 && col("nb") > 0)
      .select(col("doc_id"),
        round(col("dt").cast("double")
          / (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))), 6)
          .as("align_score"))
      .withColumn("admitted", col("align_score") >= 0.5)
      .orderBy("doc_id")
  }

  /** Stub-contract replay: frame chunking + per-dim luma folds (lumaSql),
    * the 8→1 block pooling of the text embedding (list_sum ≡ the Spark
    * left fold — the established dot-product idiom), exact-integer dot and
    * norms, ONE cosine divide with identical expression text. */
  val mAlignFilterSql: String =
    s"""WITH f AS (
       |  SELECT doc_id, fid, substr(text, fid*64 + 1, 64) AS chunk
       |  FROM (SELECT doc_id, text,
       |          unnest(range(0, CAST(ceil(length(text) / 64.0) AS INT))) AS fid
       |        FROM documents)
       |  WHERE fid % 4 = 0),
       |img AS (
       |  SELECT doc_id, t.d AS d,
       |    CAST(SUM(${lumaSql("substr(chunk, t.d*8 + 1)")}) AS BIGINT) AS iv
       |  FROM f CROSS JOIN generate_series(0, 7) t(d) GROUP BY 1, 2),
       |txt AS (
       |  SELECT vec_id AS doc_id, t.d AS d,
       |    CAST(round(list_sum([CAST(embedding[t.d*8 + j] AS DOUBLE)
       |                         for j in generate_series(1, 8)]) * 1000000) AS BIGINT) AS tv
       |  FROM embeddings CROSS JOIN generate_series(0, 7) t(d)),
       |s AS (
       |  SELECT img.doc_id,
       |    CAST(SUM(iv * tv) AS BIGINT) AS dt,
       |    CAST(SUM(iv * iv) AS BIGINT) AS na,
       |    CAST(SUM(tv * tv) AS BIGINT) AS nb
       |  FROM img JOIN txt ON txt.doc_id = img.doc_id AND txt.d = img.d
       |  GROUP BY 1)
       |SELECT doc_id,
       |  round(CAST(dt AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))), 6) AS align_score,
       |  round(CAST(dt AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))), 6) >= 0.5 AS admitted
       |FROM s WHERE na > 0 AND nb > 0
       |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m_binary_meta" -> (mBinaryMeta _),
    "m_frame_sample" -> (mFrameSample _),
    "m_modality_route" -> (mModalityRoute _),
    "m_chunk_manifest" -> (mChunkManifest _),
    "m_align_filter" -> (mAlignFilter _),
    "m_frame_embed" -> (mFrameEmbedFlat _))

  val oracles: Map[String, String] = Map(
    "m_binary_meta" -> mBinaryMetaSql,
    "m_modality_route" -> mModalityRouteSql,
    "m_chunk_manifest" -> mChunkManifestSql,
    "m_frame_sample" -> mFrameSampleSql,
    "m_align_filter" -> mAlignFilterSql,
    "m_frame_embed" -> mFrameEmbedSql)
}
