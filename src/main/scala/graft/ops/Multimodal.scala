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
    * xxhash-free but stub-decoded → rows-only; MultimodalSpec pins exact
    * frame counts/sizes against byte lengths and determinism across runs. */
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m_binary_meta" -> (mBinaryMeta _),
    "m_frame_sample" -> (mFrameSample _))

  val oracles: Map[String, String] = Map(
    "m_binary_meta" -> mBinaryMetaSql)
}
