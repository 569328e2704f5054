package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.8 Pipeline compositions, part 5 (round 12): the RAG/pretraining
  * chunk-prep funnel — the composition [[TextOps7.tChunkRag]]'s manifest
  * exists to feed. Real retrieval corpora are built exactly this way:
  * overlapping windows cut first (so no boundary sentence is lost), then
  * deduplicated at CHUNK granularity (overlap plus boilerplate makes chunk
  * dedup mandatory — every neighbor pair shares W−S words of material and
  * repeated headers repeat verbatim), then packed into fixed-token
  * sequences for embedding/training batches.
  */
object Pipeline5 {

  private val W = 40
  private val S = 30
  private val SEQ = 512 // packed-sequence width (words)

  /** Staged loss ledger of the chunk-prep funnel, one row per stage:
    *  - `chunk`:  every sliding window (docs, chunks, words — words count
    *    duplicated overlap material, the cost of no-hard-cuts);
    *  - `dedup`:  keep-first distinct chunk text (the earliest
    *    (doc_id, chunk_id) occurrence wins — [[Dedup.dExact]]'s contract at
    *    chunk grain); the words column is the surviving material a dedup'd
    *    retrieval index actually stores;
    *  - `pack`:   surviving words packed into ⌈words/512⌉ sequences (the
    *    batch count an embedder runs — exact integer arithmetic, nothing
    *    lost).
    *
    * Plan shape: chunking is the zero-shuffle explode; dedup is ONE
    * map-side-combined groupBy(chunk_md5) — no window, no content-keyed
    * join probe (the ChunkOps de-skew rule: a Zipfian chunk text never
    * partitions anything row-shaped); the ledger is three scalar
    * aggregates. At 100 TB every stage stays linear and skew-immune. */
  def pRagPrep(spark: SparkSession, dir: String): DataFrame = {
    val chunks = TextOps7.chunkFrame(spark, dir).cache()
    val stage1 = chunks.agg(
      countDistinct(col("doc_id")).as("n_docs"),
      count(lit(1)).as("n_units"),
      sum(col("n_words")).as("n_words"))
      .select(lit("chunk").as("stage"), col("n_docs"), col("n_units"),
        col("n_words"))
    val winners = chunks.groupBy("chunk_md5")
      .agg(min(struct(col("doc_id"), col("chunk_id"))).as("f"),
        max(col("n_words")).as("n_words")) // all occurrences share the width
    val stage2 = winners.agg(
      countDistinct(col("f.doc_id")).as("n_docs"),
      count(lit(1)).as("n_units"),
      sum(col("n_words")).as("n_words"))
      .select(lit("dedup").as("stage"), col("n_docs"), col("n_units"),
        col("n_words"))
    val stage3 = winners.agg(
      countDistinct(col("f.doc_id")).as("n_docs"),
      sum(col("n_words")).as("w"))
      .select(lit("pack").as("stage"), col("n_docs"),
        expr(s"(w + ${SEQ - 1}) div $SEQ").as("n_units"),
        col("w").as("n_words"))
    stage1.unionByName(stage2).unionByName(stage3)
  }

  val pRagPrepSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, string_split(${TextOps7.normSqlText}, ' ') AS ws
       |  FROM documents),
       |b AS (
       |  SELECT doc_id, ws, len(ws) AS n,
       |    CASE WHEN len(ws) <= $W THEN 1
       |         ELSE 1 + (len(ws) - $W + ${S - 1}) // $S END AS n_chunks
       |  FROM d),
       |c AS (
       |  SELECT doc_id, ws, n, unnest(generate_series(0, n_chunks - 1)) AS k
       |  FROM b),
       |ch AS (
       |  SELECT doc_id, CAST(k AS INT) AS chunk_id,
       |    CAST(least($W, n - k*$S) AS BIGINT) AS n_words,
       |    md5(array_to_string(
       |      ws[CAST(k*$S + 1 AS INT):CAST(least(k*$S + $W, n) AS INT)], ' '))
       |      AS chunk_md5
       |  FROM c),
       |win AS (
       |  SELECT chunk_md5,
       |    min(struct_pack(doc_id := doc_id, chunk_id := chunk_id)) AS f,
       |    max(n_words) AS n_words
       |  FROM ch GROUP BY 1),
       |s1 AS (
       |  SELECT 'chunk' AS stage, COUNT(DISTINCT doc_id) AS n_docs,
       |    COUNT(*) AS n_units, CAST(SUM(n_words) AS BIGINT) AS n_words
       |  FROM ch),
       |s2 AS (
       |  SELECT 'dedup' AS stage, COUNT(DISTINCT f.doc_id) AS n_docs,
       |    COUNT(*) AS n_units, CAST(SUM(n_words) AS BIGINT) AS n_words
       |  FROM win),
       |s3 AS (
       |  SELECT 'pack' AS stage, COUNT(DISTINCT f.doc_id) AS n_docs,
       |    CAST((SUM(n_words) + ${SEQ - 1}) // $SEQ AS BIGINT) AS n_units,
       |    CAST(SUM(n_words) AS BIGINT) AS n_words
       |  FROM win)
       |SELECT * FROM s1 UNION ALL SELECT * FROM s2 UNION ALL
       |SELECT * FROM s3""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p_rag_prep" -> (pRagPrep _))

  val oracles: Map[String, String] = Map(
    "p_rag_prep" -> pRagPrepSql)
}
