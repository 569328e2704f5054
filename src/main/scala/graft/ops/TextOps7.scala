package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.3 Text analysis, part 7 (round 12): retrieval-shape chunking and the
  * CCNet perplexity-bucket split — two curation primitives the earlier text
  * families stop short of (reference scope: the training-data operators
  * SURVEY.md §2.3 adds beyond the reference's own SQL surface).
  *
  * Scale shape: chunking is a zero-shuffle scan projection (explode of a
  * per-row integer sequence); bucketing is map-side aggregates plus a
  * cumulative window over DISTINCT (lang, score) VALUES — never a per-doc
  * rank — so the only per-doc operations are co-partitioned joins.
  */
object TextOps7 {

  private def norm(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))
  private val normSql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
  /** the normalizer's SQL text, shared with Pipeline5's funnel oracle */
  private[ops] def normSqlText: String = normSql

  private[ops] val W = 40 // chunk width (words)
  private[ops] val S = 30 // stride (words) → 10-word overlap between neighbors

  /** Sliding-window chunking with overlap — the chunk shape RAG corpora and
    * long-context training shards are cut into (fixed window W, stride S,
    * so consecutive chunks share W−S words and no boundary sentence is lost
    * to a hard cut). Emits one manifest row per chunk: 1-based word offset,
    * chunk word count, md5 of the chunk text. The tail chunk is the natural
    * short remainder; a doc shorter than W yields exactly one chunk.
    *
    * Unlike [[ChunkOps.chunksOf]] (non-overlapping fixed 5-grams feeding
    * dedup), the windows here OVERLAP — regexp findall can't produce them,
    * so the chunk set is an exploded integer sequence 0..n_chunks−1 with
    * each chunk a `slice` of the split word array: per-row column algebra,
    * zero shuffle, embarrassingly parallel at any corpus size. n_chunks =
    * 1 + ceil((n−W)/S) for n>W (exact in doubles far past any real doc
    * length; both engines replay it as the same integer arithmetic). */
  def tChunkRag(spark: SparkSession, dir: String): DataFrame =
    chunkFrame(spark, dir).orderBy("doc_id", "chunk_id")

  /** (doc_id, chunk_id, start_word, n_words, chunk_md5) — the unordered
    * chunk manifest, shared with [[Pipeline5.pRagPrep]]'s funnel. */
  private[graft] def chunkFrame(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.fanout(Tables.table(spark, dir, "documents"))
      .select(col("doc_id"), split(norm(col("text")), " ").as("ws"))
      .select(col("doc_id"), col("ws"), size(col("ws")).as("n"))
      .withColumn("n_chunks",
        when(col("n") <= W, lit(1))
          .otherwise(lit(1) + floor((col("n") - W + (S - 1)).cast("double") / S))
          .cast("int"))
    base
      .select(col("doc_id"), col("ws"), col("n"),
        explode(sequence(lit(0), col("n_chunks") - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        (col("chunk_id") * S + 1).as("start_word"),
        least(lit(W), col("n") - col("chunk_id") * S).as("n_words"),
        md5(array_join(
          slice(col("ws"), (col("chunk_id") * S + 1).cast("int"),
            least(lit(W), col("n") - col("chunk_id") * S).cast("int")), " "))
          .as("chunk_md5"))
  }

  val tChunkRagSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, string_split($normSql, ' ') AS ws FROM documents),
       |b AS (
       |  SELECT doc_id, ws, len(ws) AS n,
       |    CASE WHEN len(ws) <= $W THEN 1
       |         ELSE 1 + (len(ws) - $W + ${S - 1}) // $S END AS n_chunks
       |  FROM d),
       |c AS (
       |  SELECT doc_id, ws, n,
       |    unnest(generate_series(0, n_chunks - 1)) AS k
       |  FROM b)
       |SELECT doc_id, CAST(k AS INT) AS chunk_id,
       |  CAST(k*$S + 1 AS INT) AS start_word,
       |  CAST(least($W, n - k*$S) AS INT) AS n_words,
       |  md5(array_to_string(
       |    ws[CAST(k*$S + 1 AS INT):CAST(least(k*$S + $W, n) AS INT)], ' '))
       |    AS chunk_md5
       |FROM c ORDER BY doc_id, chunk_id""".stripMargin

  /** CCNet-style perplexity bucketing: score every doc with the corpus
    * char-trigram LM ([[TextOps2.charLmScores]]), then split EACH LANGUAGE
    * into head / middle / tail thirds by cross-entropy — the published
    * CCNet recipe keeps `head` (+ often `middle`) and drops `tail` as the
    * likely-garbled slice. Per-language conditioning is the point: absolute
    * perplexity is incomparable across languages, so the cut must be a
    * within-language quantile, not a global threshold.
    *
    * Tertile thresholds are derived at VALUE granularity, never per-doc
    * rank: the cumulative distribution runs over distinct (lang, xent)
    * pairs (xent is 4-dp-rounded, so the domain is bounded by score
    * granularity, not corpus size), and q_k = min{v : cum(v) ≥ ⌈k·n/3⌉} —
    * discrete quantiles with all equal-valued docs landing in one bucket,
    * the deterministic tie rule both engines replay identically. Per-doc
    * work is two co-partitioned joins plus a 5-row broadcast; at 100 TB the
    * production variant computes the same thresholds from a per-lang sample
    * and this op's map-side bucket apply is unchanged. */
  def tCcnetBuckets(spark: SparkSession, dir: String): DataFrame = {
    // cached: sd feeds THREE consumers (vc, tot, the bucket apply) — an
    // uncached frame would re-derive the LM scores per consumer
    val sd = Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .join(TextOps2.charLmScores(spark, dir).select("doc_id", "xent"), "doc_id")
      .cache()
    val vc = sd.groupBy("lang", "xent").agg(count(lit(1)).as("cnt"))
    val cum = vc.withColumn("cum",
      sum(col("cnt")).over(Window.partitionBy("lang").orderBy("xent")))
    val tot = sd.groupBy("lang").agg(count(lit(1)).as("n"))
    val th = cum.join(broadcast(tot), "lang")
      .groupBy("lang")
      .agg(min(when(col("cum") >= expr("(n + 2) div 3"), col("xent"))).as("q1"),
        min(when(col("cum") >= expr("(2*n + 2) div 3"), col("xent"))).as("q2"))
    sd.join(broadcast(th), "lang")
      .withColumn("bucket",
        when(col("xent") <= col("q1"), lit("head"))
          .when(col("xent") <= col("q2"), lit("middle"))
          .otherwise(lit("tail")))
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("xent")).as("min_xent"),
        max(col("xent")).as("max_xent"))
      .orderBy("lang", "bucket")
  }

  val tCcnetBucketsSql: String =
    s"""WITH ${TextOps2.charLmCtes},
       |sd AS (
       |  SELECT d2.doc_id, d2.lang, d2.n_chars, a.xent
       |  FROM documents d2 JOIN agg a ON d2.doc_id = a.doc_id),
       |vc AS (SELECT lang, xent, COUNT(*) AS cnt FROM sd GROUP BY 1, 2),
       |cm AS (
       |  SELECT lang, xent,
       |    SUM(cnt) OVER (PARTITION BY lang ORDER BY xent) AS cum
       |  FROM vc),
       |tot AS (SELECT lang, COUNT(*) AS n FROM sd GROUP BY 1),
       |th AS (
       |  SELECT cm.lang,
       |    MIN(CASE WHEN cum >= (n + 2) // 3 THEN xent END) AS q1,
       |    MIN(CASE WHEN cum >= (2*n + 2) // 3 THEN xent END) AS q2
       |  FROM cm JOIN tot ON cm.lang = tot.lang GROUP BY 1),
       |bk AS (
       |  SELECT sd.lang,
       |    CASE WHEN xent <= q1 THEN 'head'
       |         WHEN xent <= q2 THEN 'middle' ELSE 'tail' END AS bucket,
       |    n_chars, xent
       |  FROM sd JOIN th ON sd.lang = th.lang)
       |SELECT lang, bucket, COUNT(*) AS n_docs,
       |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       |  MIN(xent) AS min_xent, MAX(xent) AS max_xent
       |FROM bk GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin

  /** Word-bigram LM perplexity with Stupid Backoff — [[TextOps2.tCharLm]]'s
    * WORD-granularity sibling, the KenLM-ish quality signal CCNet-style
    * pipelines actually rank on (char trigrams catch encoding junk; word
    * bigrams catch incoherent-but-well-spelled text). The LM trains on the
    * EVEN-doc_id half of the corpus and scores the HELD-OUT odd half, which
    * is what makes backoff real: an LM scored on its own training data
    * never meets an unseen bigram. Scoring (Stupid Backoff, Brants et al.
    * 2007): a seen bigram scores the MLE ln(c2(w1,w2)/c1(w1)); an unseen
    * one backs off to α·unigram with add-one smoothing,
    * ln(0.4·(c1(w2)+1)/(T+V)) — one ln call per position on a
    * bit-identical IEEE argument in both engines (the DSIR single-ln
    * discipline), summed as 6-dp decimals (Tables.dsum) and rendered as a
    * 4-dp per-word cross-entropy.
    *
    * Scale shape: token/bigram counts are map-side-combined groupBys; the
    * scored-bigram joins hash-partition on word keys (AQE broadcasts the
    * unigram table when it is small, shuffles when vocabulary is genuinely
    * large) — no driver materialization, no caps; held-out scoring reads
    * each half exactly once. */
  def tWordLm(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.fanout(Tables.table(spark, dir, "documents"))
      .where(length(col("text")) > 0)
      .select(col("doc_id"), split(norm(col("text")), " ").as("ws"))
      .where(size(col("ws")) >= 2)
    val tr = d.where(col("doc_id") % 2 === 0)
    val sc = d.where(col("doc_id") % 2 === 1)
    val tru = tr.select(explode(col("ws")).as("w"))
    val c1 = tru.groupBy("w").agg(count(lit(1)).as("c"))
    val tot = tru.agg(count(lit(1)).as("t"),
      count_distinct(col("w")).as("v"))
    def bigrams(df: DataFrame, extra: Column*): DataFrame = df
      .select(extra :+ explode(sequence(lit(1), size(col("ws")) - 1)).as("i")
        :+ col("ws"): _*)
      .select(extra :+ expr("element_at(ws, cast(i as int))").as("w1")
        :+ expr("element_at(ws, cast(i as int) + 1)").as("w2"): _*)
    val c2 = bigrams(tr).groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val scb = bigrams(sc, col("doc_id"))
    val logp = when(col("c2").isNotNull,
        log(col("c2").cast("double") / col("c1w1")))
      .otherwise(log(lit(0.4) * (coalesce(col("c1w2"), lit(0L)) + 1) /
        (col("t") + col("v"))))
    scb
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1.withColumnRenamed("w", "w1").withColumnRenamed("c", "c1w1"),
        Seq("w1"), "left")
      .join(c1.withColumnRenamed("w", "w2").withColumnRenamed("c", "c1w2"),
        Seq("w2"), "left")
      .crossJoin(broadcast(tot))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bi"),
        sum(when(col("c2").isNull, 1L).otherwise(0L)).as("n_backoff"),
        round(-(Tables.dsum(logp) / count(lit(1))), 4).as("xent"))
      .orderBy("doc_id")
  }

  val tWordLmSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, string_split($normSql, ' ') AS ws FROM documents
       |  WHERE length(text) > 0 AND len(string_split($normSql, ' ')) >= 2),
       |tr AS (SELECT * FROM d WHERE doc_id % 2 = 0),
       |sc AS (SELECT * FROM d WHERE doc_id % 2 = 1),
       |tru AS (SELECT unnest(ws) AS w FROM tr),
       |c1 AS (SELECT w, COUNT(*) AS c FROM tru GROUP BY 1),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t,
       |               CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM tru),
       |trb AS (
       |  SELECT ws[CAST(i AS INT)] AS w1, ws[CAST(i AS INT) + 1] AS w2
       |  FROM tr, unnest(range(1, len(ws))) AS x(i)),
       |c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM trb GROUP BY 1, 2),
       |scb AS (
       |  SELECT doc_id, ws[CAST(i AS INT)] AS w1, ws[CAST(i AS INT) + 1] AS w2
       |  FROM sc, unnest(range(1, len(ws))) AS x(i)),
       |s AS (
       |  SELECT b.doc_id,
       |    CASE WHEN c2.c2 IS NOT NULL
       |         THEN ln(CAST(c2.c2 AS DOUBLE) / u1.c)
       |         ELSE ln(0.4 * (COALESCE(u2.c, 0) + 1) / (tot.t + tot.v))
       |    END AS logp,
       |    CASE WHEN c2.c2 IS NULL THEN 1 ELSE 0 END AS bo
       |  FROM scb b
       |  LEFT JOIN c2 ON c2.w1 = b.w1 AND c2.w2 = b.w2
       |  LEFT JOIN c1 u1 ON u1.w = b.w1
       |  LEFT JOIN c1 u2 ON u2.w = b.w2, tot)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bi,
       |  CAST(SUM(bo) AS BIGINT) AS n_backoff,
       |  round(-(CAST(SUM(CAST(logp AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*)), 4) AS xent
       |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t_chunk_rag" -> (tChunkRag _),
    "t_ccnet_buckets" -> (tCcnetBuckets _),
    "t_word_lm" -> (tWordLm _))

  val oracles: Map[String, String] = Map(
    "t_chunk_rag" -> tChunkRagSql,
    "t_ccnet_buckets" -> tCcnetBucketsSql,
    "t_word_lm" -> tWordLmSql)
}
