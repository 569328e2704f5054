package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.4/§2.3 additions (round 4): sub-document chunk operators — paragraph-
  * level dedup and boilerplate detection. Real curation pipelines dedup at
  * BOTH granularities: whole-document (Dedup.dExact/dMinhashLsh) and
  * paragraph/line level, where boilerplate (nav bars, license headers,
  * cookie banners) repeats across otherwise-distinct pages (reference scope:
  * the training-data operators SURVEY.md §2 adds beyond the reference's own
  * SQL surface; the chunk trick mirrors CCNet/RefinedWeb line-dedup).
  *
  * The synthetic corpus has no newlines, so "paragraph" is a deterministic
  * segmentation both engines can compute identically: consecutive
  * non-overlapping 5-word chunks via one regex pass
  * (`(?:\S+ ){4}\S+` — findall semantics are sequential in both Java regex
  * and RE2, so chunk k covers words 5k+1..5k+5; a <5-word tail is dropped).
  * On real data the same operators run with `split(text, '\n\n')`.
  *
  * Scale shape: chunking is a zero-shuffle scan projection; paragraph dedup
  * is pure map-side-combined aggregates (no window at all — see
  * [[dParagraphDedup]]); boilerplate df is one map-side-combined aggregate —
  * all linear and skew-immune at 100 TB.
  */
object ChunkOps {

  private def norm(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))
  private val normSql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  private val chunkRe = "(?:\\S+ ){4}\\S+"
  private val chunkReSql = "(?:\\S+ ){4}\\S+"

  /** (doc_id, chunk_idx, chunk) — chunk_idx is 0-based position in doc.
    * Scala-API regexp_extract_all (not expr()): SQL string literals eat
    * backslashes, the Column API passes the pattern through verbatim. */
  private[graft] def chunksOf(docs: DataFrame): DataFrame =
    Tables.fanout(docs)
      .select(col("doc_id"),
        posexplode(regexp_extract_all(norm(col("text")), lit(chunkRe), lit(0)))
          .as(Seq("chunk_idx", "chunk")))

  /** Paragraph-level dedup: a chunk occurrence is a duplicate iff the same
    * chunk text occurred earlier in corpus order (smaller doc_id, or same
    * doc at a smaller chunk_idx) — keep-first semantics, the same contract
    * as [[Dedup.dExact]] but sub-document. Emits per-doc duplication stats
    * for every doc carrying at least one duplicate chunk.
    *
    * Plan (r5 de-skew rewrite — VERDICT r4 "What's wrong" #2): keep-first
    * needs only the MINIMUM occurrence per chunk, never a rank — so there is
    * no window anywhere. A `row_number() OVER (PARTITION BY chunk)` would
    * ship EVERY occurrence of one chunk text into one task; chunk frequency
    * is Zipfian (t_boilerplate's premise), so at 100 TB a boilerplate chunk
    * in 10% of documents makes one straggler process 10% of the corpus.
    * Instead:
    *  1. pre-aggregate to (chunk, doc_id) granularity — keyed on BOTH
    *     columns, so hot chunks spread across tasks, and map-side combine
    *     collapses within-doc repeats before the shuffle;
    *  2. the global first occurrence per chunk is `min(struct(doc_id,
    *     min_idx))` — a map-side-combined aggregate (hot chunks reduce to
    *     one candidate per partition before shuffling);
    *  3. a doc's duplicate count = its total occurrences − the number of
    *     chunks whose global first occurrence it owns, so the only join is
    *     doc_id ⋈ doc_id — no content key ever partitions a window or a
    *     skewed join probe.
    * The (chunk, doc) pre-aggregate is cached because two branches consume
    * it (occurrence totals + first-occurrence winners) — one corpus scan,
    * not two. */
  def dParagraphDedup(spark: SparkSession, dir: String): DataFrame = {
    val g = chunksOf(Tables.table(spark, dir, "documents"))
      .groupBy("chunk", "doc_id")
      .agg(count(lit(1)).as("n_occ"), min(col("chunk_idx")).as("min_idx"))
      .cache()
    val perDoc = g.groupBy("doc_id").agg(sum(col("n_occ")).as("n_chunks"))
    val wins = g.groupBy("chunk")
      .agg(min(struct(col("doc_id"), col("min_idx"))).as("f"))
      .groupBy(col("f.doc_id").as("doc_id"))
      .agg(count(lit(1)).as("n_first"))
    perDoc.join(wins, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        (col("n_chunks") - coalesce(col("n_first"), lit(0L))).as("n_dup_chunks"))
      .where(col("n_dup_chunks") > 0)
      .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
        round(col("n_dup_chunks").cast("double") / col("n_chunks"), 6)
          .as("dup_frac"))
      .orderBy("doc_id")
  }

  val dParagraphDedupSql: String =
    s"""WITH ch AS (
       |  SELECT doc_id,
       |    generate_subscripts(regexp_extract_all($normSql, '$chunkReSql'), 1) - 1 AS chunk_idx,
       |    unnest(regexp_extract_all($normSql, '$chunkReSql')) AS chunk
       |  FROM documents),
       |r AS (
       |  SELECT doc_id, chunk,
       |    row_number() OVER (PARTITION BY chunk ORDER BY doc_id, chunk_idx) AS occ
       |  FROM ch)
       |SELECT doc_id, COUNT(*) AS n_chunks,
       |  CAST(SUM(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
       |  round(SUM(CASE WHEN occ > 1 THEN 1 ELSE 0 END)*1.0/COUNT(*), 6) AS dup_frac
       |FROM r GROUP BY doc_id
       |HAVING SUM(CASE WHEN occ > 1 THEN 1 ELSE 0 END) > 0
       |ORDER BY doc_id""".stripMargin

  /** Boilerplate detection: chunks appearing in ≥ 3 DISTINCT documents.
    * The df threshold is the CCNet line-frequency filter; at 100 TB the
    * output (true boilerplate) is tiny while the aggregate is map-side
    * combined on the chunk hash. Emits (chunk, df, n_occurrences) ordered
    * hottest-first with a deterministic text tie-break. */
  def tBoilerplate(spark: SparkSession, dir: String): DataFrame =
    chunksOf(Tables.table(spark, dir, "documents"))
      .groupBy("chunk")
      .agg(countDistinct(col("doc_id")).as("df"),
        count(lit(1)).as("n_occ"))
      .where(col("df") >= 3)
      .orderBy(col("df").desc, col("chunk"))

  val tBoilerplateSql: String =
    s"""WITH ch AS (
       |  SELECT doc_id, unnest(regexp_extract_all($normSql, '$chunkReSql')) AS chunk
       |  FROM documents)
       |SELECT chunk, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
       |  COUNT(*) AS n_occ
       |FROM ch GROUP BY chunk HAVING COUNT(DISTINCT doc_id) >= 3
       |ORDER BY df DESC, chunk""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d_paragraph_dedup" -> (dParagraphDedup _),
    "t_boilerplate" -> (tBoilerplate _))

  val oracles: Map[String, String] = Map(
    "d_paragraph_dedup" -> dParagraphDedupSql,
    "t_boilerplate" -> tBoilerplateSql)
}
