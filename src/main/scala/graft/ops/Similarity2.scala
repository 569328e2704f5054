package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.5 continued (round 5): SQ8 scalar quantization — the missing rung of
  * the quantization ladder (float32 → SQ8 → PQ → OPQ). Each dimension is
  * affinely mapped to 8 bits against per-dimension corpus [min,max] bounds:
  * 4× memory compression with near-lossless recall, the standard first
  * compression step vector stores apply before PQ (FAISS ScalarQuantizer).
  *
  * Unlike the PQ tiers (whose k-means codebooks force a rows-only gate),
  * SQ8 is PURE ARITHMETIC — bounds are a min/max aggregate and the
  * quantize/dequantize maps use only IEEE-exact ops (+,−,×,÷, floor,
  * least) — so the whole tier is replayable in SQL and HASH-GATED, the
  * only approximate-ANN tier on the board with a full DuckDB oracle.
  */
object Similarity2 {

  private def dot(a: Column, b: Column): Column = graft.functions.Vec.vdot(a, b)
  private def norm2(a: Column): Column = graft.functions.Vec.vnorm(a)

  /** SQ8-compressed cosine top-5 per query (self excluded).
    *
    * Scale shape:
    *  1. Per-dim bounds: posexplode → groupBy(dim) min/max — map-side
    *     combined, ≤ 64 rows per partition cross the shuffle regardless of
    *     corpus size; assembled into two 64-float arrays and broadcast.
    *  2. Quantize+dequantize each corpus vector ONCE — a linear scan
    *     projection (the 64-element `transform` runs per corpus row, never
    *     in the quadratic loop). q = min(⌊(x−mn)·256/(mx−mn)⌋, 255);
    *     dequant = mn + (q+0.5)·(mx−mn)/256 — the reconstruction FAISS
    *     uses. In production the int8 codes are what you STORE (4×
    *     compression); reconstruction happens at scan time.
    *  3. Score: queries × dequantized corpus through the codegen vdot
    *     (the hot quadratic loop stays whole-stage-codegen), rank on the
    *     6-dp rounded cosine + vec_id (engine-portable ordering).
    * The oracle replays the identical bounds → quantize → reconstruct →
    * score pipeline in SQL: floor/least/± are all IEEE-exact in both
    * engines, so the match is bit-for-bit. SimilaritySpec asserts
    * recall@5 ≥ 0.8 vs the exact float32 ranking. */
  def sSq8Topk(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.fanout(Tables.table(spark, dir, "embeddings"))
    val bounds = e
      .select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("i")
      .agg(min(col("x").cast("double")).as("mn"),
        max(col("x").cast("double")).as("mx"))
      .agg(array_sort(collect_list(struct(col("i"), col("mn"), col("mx")))).as("bs"))
      .select(expr("transform(bs, s -> s.mn)").as("mns"),
        expr("transform(bs, s -> s.mx)").as("mxs"))
    val deq = e.crossJoin(broadcast(bounds))
      .select(col("vec_id"),
        expr(
          """transform(embedding, (x, i) ->
            |  CASE WHEN mxs[i] > mns[i]
            |    THEN mns[i] + (least(floor((cast(x AS double) - mns[i]) * 256.0d
            |           / (mxs[i] - mns[i])), 255.0d) + 0.5d)
            |         * (mxs[i] - mns[i]) / 256.0d
            |    ELSE mns[i] END)""".stripMargin).as("deq"))
      .withColumn("dnrm", norm2(col("deq")))
    val q = e.where(col("vec_id") % 20 === 0 && col("vec_id") < 20000)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        norm2(col("embedding")).as("q_nrm"))
    val scored = q.crossJoin(deq)
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(dot(col("q_emb"), col("deq")) / (col("q_nrm") * col("dnrm")), 6)
          .as("cosine_sq8"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine_sq8").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 5)
      .select(col("q_id"), col("rnk"), col("vec_id"), col("cosine_sq8"))
      .orderBy("q_id", "rnk")
  }

  val sSq8TopkSql: String =
    """WITH b AS (
      |  SELECT t.i,
      |    MIN(CAST(embedding[t.i] AS DOUBLE)) AS mn,
      |    MAX(CAST(embedding[t.i] AS DOUBLE)) AS mx
      |  FROM embeddings CROSS JOIN generate_series(1, 64) AS t(i)
      |  GROUP BY 1),
      |ba AS (SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs FROM b),
      |dq AS (
      |  SELECT vec_id,
      |    [CASE WHEN mxs[i] > mns[i]
      |       THEN mns[i] + (least(floor((CAST(embedding[i] AS DOUBLE) - mns[i]) * 256.0
      |              / (mxs[i] - mns[i])), 255.0) + 0.5)
      |            * (mxs[i] - mns[i]) / 256.0
      |       ELSE mns[i] END
      |     for i in generate_series(1, len(embedding))] AS deq
      |  FROM embeddings CROSS JOIN ba),
      |dn AS (
      |  SELECT vec_id, deq,
      |    sqrt(list_sum([deq[i]*deq[i] for i in generate_series(1, len(deq))])) AS dnrm
      |  FROM dq),
      |qn AS (
      |  SELECT vec_id AS q_id, embedding AS q_emb,
      |    sqrt(list_sum([CAST(embedding[i] AS DOUBLE)*CAST(embedding[i] AS DOUBLE)
      |                   for i in generate_series(1, len(embedding))])) AS q_nrm
      |  FROM embeddings WHERE vec_id % 20 = 0 AND vec_id < 20000),
      |scored AS (
      |  SELECT q.q_id, c.vec_id,
      |    round(list_sum([CAST(q.q_emb[i] AS DOUBLE) * c.deq[i]
      |                    for i in generate_series(1, len(q.q_emb))])
      |          / (q.q_nrm * c.dnrm), 6) AS cosine_sq8
      |  FROM qn q JOIN dn c ON c.vec_id <> q.q_id),
      |ranked AS (
      |  SELECT q_id, vec_id, cosine_sq8,
      |    row_number() OVER (PARTITION BY q_id ORDER BY cosine_sq8 DESC, vec_id) AS rnk
      |  FROM scored)
      |SELECT q_id, CAST(rnk AS INTEGER) AS rnk, vec_id, cosine_sq8
      |FROM ranked WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin

  /** Matryoshka two-stage retrieval: a CHEAP first pass scores every
    * corpus vector on only its first 16 dimensions (MRL-style truncated
    * embeddings — 4× less vector IO and arithmetic; with the prefix stored
    * as its own column, column pruning means the full 64-dim vectors of
    * non-candidates are NEVER read), keeps the top-50 candidates per
    * query, and a full-precision 64-dim cosine reranks just those 50 to
    * the final top-5.
    *
    * This is the funnel shape every production retrieval stack uses
    * (cheap recall stage → expensive precision stage), and — like SQ8 —
    * it is pure deterministic arithmetic, so BOTH stages replay in SQL
    * and the op is hash-gated end-to-end. Both stage ranks order by the
    * 6-dp rounded score + vec_id (engine-portable); both window top-ks
    * get map-side WindowGroupLimit. Spec pins recall@5 vs the exact
    * full-dim ranking. */
  def sMatryoshkaRerank(spark: SparkSession, dir: String): DataFrame = {
    val pre = 16
    val e = Tables.fanout(Tables.table(spark, dir, "embeddings"))
      .select(col("vec_id"), col("embedding"),
        slice(col("embedding"), 1, pre).as("stub"))
      .withColumn("nrm", norm2(col("embedding")))
      .withColumn("snrm", norm2(col("stub")))
    val q = e.where(col("vec_id") % 20 === 0 && col("vec_id") < 20000)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("stub").as("q_stub"), col("nrm").as("q_nrm"), col("snrm").as("q_snrm"))
    val stage1 = q.crossJoin(e.select(col("vec_id"), col("embedding"), col("nrm"),
        col("stub"), col("snrm")))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("q_emb"), col("q_nrm"),
        col("vec_id"), col("embedding"), col("nrm"),
        round(dot(col("q_stub"), col("stub")) / (col("q_snrm") * col("snrm")), 6)
          .as("stub_cos"))
    val w1 = Window.partitionBy("q_id").orderBy(col("stub_cos").desc, col("vec_id"))
    val candidates = stage1.withColumn("r1", row_number().over(w1))
      .where(col("r1") <= 50)
    val w2 = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))
    candidates
      .select(col("q_id"), col("vec_id"),
        round(dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")), 6)
          .as("cosine"))
      .withColumn("rnk", row_number().over(w2))
      .where(col("rnk") <= 5)
      .select(col("q_id"), col("rnk"), col("vec_id"), col("cosine"))
      .orderBy("q_id", "rnk")
  }

  val sMatryoshkaRerankSql: String =
    """WITH n AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_sum([CAST(embedding[i] AS DOUBLE)*CAST(embedding[i] AS DOUBLE)
      |                   for i in generate_series(1, len(embedding))])) AS nrm,
      |    sqrt(list_sum([CAST(embedding[i] AS DOUBLE)*CAST(embedding[i] AS DOUBLE)
      |                   for i in generate_series(1, 16)])) AS snrm
      |  FROM embeddings),
      |s1 AS (
      |  SELECT q.vec_id AS q_id, q.embedding AS q_emb, q.nrm AS q_nrm,
      |    c.vec_id, c.embedding, c.nrm,
      |    round(list_sum([CAST(q.embedding[i] AS DOUBLE)*CAST(c.embedding[i] AS DOUBLE)
      |                    for i in generate_series(1, 16)])
      |          / (q.snrm * c.snrm), 6) AS stub_cos
      |  FROM n q JOIN n c ON c.vec_id <> q.vec_id
      |  WHERE q.vec_id % 20 = 0 AND q.vec_id < 20000),
      |cand AS (
      |  SELECT * FROM (
      |    SELECT q_id, q_emb, q_nrm, vec_id, embedding, nrm,
      |      row_number() OVER (PARTITION BY q_id ORDER BY stub_cos DESC, vec_id) AS r1
      |    FROM s1) WHERE r1 <= 50),
      |s2 AS (
      |  SELECT q_id, vec_id,
      |    round(list_sum([CAST(q_emb[i] AS DOUBLE)*CAST(embedding[i] AS DOUBLE)
      |                    for i in generate_series(1, len(q_emb))])
      |          / (q_nrm * nrm), 6) AS cosine
      |  FROM cand),
      |ranked AS (
      |  SELECT q_id, vec_id, cosine,
      |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rnk
      |  FROM s2)
      |SELECT q_id, CAST(rnk AS INTEGER) AS rnk, vec_id, cosine
      |FROM ranked WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin

  /** Attribute-FILTERED vector search (the "filtered ANN" every vector
    * store advertises): top-5 by cosine among candidates sharing the
    * query's label only (same-class search — language-restricted
    * retrieval, tenant isolation, modality routing all reduce to this).
    *
    * The load-bearing plan property: the label constraint makes the pair
    * generation an EQUI-JOIN on label — a hash join whose candidate mass
    * is Σ_label |class|² instead of |corpus|², with NO cartesian product
    * anywhere (the plan audit enforces it). At 100 TB this is why you
    * pre-partition (or IVF-index) WITHIN each filter class: the filter is
    * pushed below the expensive stage, never applied to its output. */
  def sFilteredTopk(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.fanout(Tables.table(spark, dir, "embeddings"))
      .select(col("vec_id"), col("label"), col("embedding"),
        norm2(col("embedding")).as("nrm"))
    val q = e.where(col("vec_id") % 20 === 0 && col("vec_id") < 20000)
      .select(col("vec_id").as("q_id"), col("label"),
        col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val scored = q.join(e, Seq("label")) // equi-join on the filter attribute
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("label"), col("vec_id"),
        round(dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")), 6)
          .as("cosine"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 5)
      .select(col("q_id"), col("label"), col("rnk"), col("vec_id"), col("cosine"))
      .orderBy("q_id", "rnk")
  }

  val sFilteredTopkSql: String =
    """WITH n AS (
      |  SELECT vec_id, label, embedding,
      |    sqrt(list_sum([CAST(embedding[i] AS DOUBLE)*CAST(embedding[i] AS DOUBLE)
      |                   for i in generate_series(1, len(embedding))])) AS nrm
      |  FROM embeddings),
      |scored AS (
      |  SELECT q.vec_id AS q_id, q.label, c.vec_id,
      |    round(list_sum([CAST(q.embedding[i] AS DOUBLE)*CAST(c.embedding[i] AS DOUBLE)
      |                    for i in generate_series(1, len(q.embedding))])
      |          / (q.nrm * c.nrm), 6) AS cosine
      |  FROM n q JOIN n c ON q.label = c.label AND c.vec_id <> q.vec_id
      |  WHERE q.vec_id % 20 = 0 AND q.vec_id < 20000),
      |ranked AS (
      |  SELECT q_id, label, vec_id, cosine,
      |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rnk
      |  FROM scored)
      |SELECT q_id, label, CAST(rnk AS INTEGER) AS rnk, vec_id, cosine
      |FROM ranked WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin

  /** SemDeDup threshold-tuning curve (r6): for each candidate cosine
    * threshold τ, the duplicate-edge count and the number of docs the
    * keep-lowest-id rule would drop, computed over the kNN self-join graph
    * — the scalable proxy for the all-pairs curve (at 100 TB the sweep is
    * exactly how τ gets chosen: build the kNN graph ONCE, roll up every τ
    * from it, never re-scan). One pass over the graph, 5-row broadcast of
    * the τ grid, map-side-combined rollup. Hash-gated by composition: the
    * kNN chain is already exactly replayable, the rollup is plain SQL. */
  def sTauSweep(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val knn = Similarity.sKnnJoin(spark, dir).select("q_id", "vec_id", "cosine")
    val taus = Seq(0.5, 0.6, 0.7, 0.8, 0.9).toDF("tau")
    knn.crossJoin(broadcast(taus))
      .where(col("cosine") >= col("tau"))
      .groupBy("tau")
      .agg(count(lit(1)).as("n_edges"),
        countDistinct(when(col("vec_id") < col("q_id"), col("q_id"))).as("n_dropped"))
      .orderBy("tau")
  }

  val sTauSweepSql: String =
    s"""WITH knn AS (SELECT q_id, vec_id, cosine FROM (${Similarity.sKnnJoinSql}) t),
       |taus AS (SELECT unnest([0.5e0, 0.6e0, 0.7e0, 0.8e0, 0.9e0]) AS tau)
       |SELECT tau, COUNT(*) AS n_edges,
       |  COUNT(DISTINCT CASE WHEN vec_id < q_id THEN q_id END) AS n_dropped
       |FROM taus CROSS JOIN knn
       |WHERE cosine >= tau
       |GROUP BY tau ORDER BY tau""".stripMargin

  /** Binary-embedding top-k by Hamming distance: each 64-dim float vector
    * collapses to its 64 sign bits, packed as two 32-bit halves in BIGINT
    * words (the low halves only — a full 64-bit pack would put bit 63 on
    * the sign and trip DuckDB/ANSI shift edges; two half-words cost nothing
    * and keep the oracle portable). Distance = popcount(xor) per word —
    * the cheapest rerank stage-0 there is: 8 bytes/vector (32× under the
    * float scan), distance in two ALU ops/word.
    *
    * Scale: the scan side reads ONLY the two packed words (at 100 TB the
    * signatures persist as a sidecar column; this op computes them in the
    * scan projection — a one-pass build). The probe batch is the standard
    * capped query set (|corpus|/20, the s_cosine_topk bound); for
    * corpus-×-corpus workloads the 64 bits split into 4×16-bit bands for
    * an exact-match candidate join (the d_minhash_lsh shape). Sign-bit
    * Hamming approximates angular distance (the SimHash estimator — same
    * family as d_simhash, applied to dense embeddings). */
  def sHammingTopk(spark: SparkSession, dir: String): DataFrame = {
    def half(off: Int): org.apache.spark.sql.Column = expr(
      s"""aggregate(sequence(0, 31), 0L,
         |  (acc, i) -> acc + CASE WHEN element_at(embedding, i + ${off + 1}) > 0
         |                    THEN shiftleft(1L, i) ELSE 0L END)""".stripMargin)
    val sig = Tables.table(spark, dir, "embeddings")
      .select(col("vec_id"), half(0).as("lo"), half(32).as("hi"))
      .cache()
    val q = sig.where(col("vec_id") % 20 === 0 && col("vec_id") < 20000)
      .select(col("vec_id").as("q_id"), col("lo").as("q_lo"), col("hi").as("q_hi"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("hamming"), col("vec_id"))
    q.crossJoin(sig)
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        expr("cast(bit_count(q_lo ^ lo) + bit_count(q_hi ^ hi) as int)").as("hamming"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 5)
      .select(col("q_id"), col("rnk"), col("vec_id"), col("hamming"))
      .orderBy("q_id", "rnk")
  }

  val sHammingTopkSql: String =
    """WITH sig AS (
      |  SELECT vec_id,
      |    CAST(list_sum([CASE WHEN embedding[i+1] > 0 THEN CAST(1 AS BIGINT) << i
      |                   ELSE CAST(0 AS BIGINT) END for i in range(0, 32)]) AS BIGINT) AS lo,
      |    CAST(list_sum([CASE WHEN embedding[i+33] > 0 THEN CAST(1 AS BIGINT) << i
      |                   ELSE CAST(0 AS BIGINT) END for i in range(0, 32)]) AS BIGINT) AS hi
      |  FROM embeddings),
      |scored AS (
      |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
      |    CAST(bit_count(xor(q.lo, c.lo)) + bit_count(xor(q.hi, c.hi)) AS INTEGER) AS hamming
      |  FROM sig q JOIN sig c ON c.vec_id <> q.vec_id
      |  WHERE q.vec_id % 20 = 0 AND q.vec_id < 20000),
      |ranked AS (
      |  SELECT q_id, vec_id, hamming,
      |    row_number() OVER (PARTITION BY q_id ORDER BY hamming, vec_id) AS rnk
      |  FROM scored)
      |SELECT q_id, CAST(rnk AS INTEGER) AS rnk, vec_id, hamming
      |FROM ranked WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin

  /** Compression-tier selection report: recall@5 vs the exact float32
    * ranking for each storage tier of the ANN ladder — SQ8 (64 B/vec), PQ
    * (8 B), binary sign bits (8 B) — the one table a deployment reads to
    * pick its memory/recall point. Every tier's top-k chain is already
    * bit-replayable, so the report hash-gates BY COMPOSITION
    * (s_ann_recall's pattern, across tiers): hits = left-semi join of tier
    * pairs against exact pairs, recall in exact integer ppm. Tiers score
    * IN-PLAN — no driver round trips; at 100 TB this is the index-build QA
    * gate run before swapping a cheaper tier into serving. */
  def sTierReport(spark: SparkSession, dir: String): DataFrame = {
    val exact = Similarity.sCosineTopk(spark, dir)
      .select(col("q_id"), col("vec_id")).cache()
    val tot = exact.agg(count(lit(1)).as("tot"))
    def row(tier: String, bytes: Int, df: DataFrame): DataFrame =
      df.select(col("q_id"), col("vec_id"))
        .join(exact, Seq("q_id", "vec_id"), "left_semi")
        .agg(count(lit(1)).as("hits"))
        .crossJoin(broadcast(tot))
        .select(lit(tier).as("tier"), lit(bytes).as("bytes_per_vec"),
          expr("(1000000 * hits) div tot").as("recall_ppm"))
    row("a_float32", 256, exact)
      .unionAll(row("b_sq8", 64, sSq8Topk(spark, dir)))
      .unionAll(row("c_pq", 8, Similarity.sPqTopk(spark, dir)))
      .unionAll(row("d_binary", 8, sHammingTopk(spark, dir)))
      .orderBy("tier")
  }

  val sTierReportSql: String =
    s"""WITH exact AS (SELECT q_id, vec_id FROM (${Similarity.sCosineTopkSql}) t),
       |sq8 AS (SELECT q_id, vec_id FROM ($sSq8TopkSql) t),
       |pq AS (SELECT q_id, vec_id FROM (${Similarity.sPqTopkSql}) t),
       |bin AS (SELECT q_id, vec_id FROM ($sHammingTopkSql) t),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS tot FROM exact)
       |SELECT tier, bytes_per_vec, recall_ppm FROM (
       |  SELECT 'a_float32' AS tier, 256 AS bytes_per_vec,
       |    (1000000 * (SELECT CAST(COUNT(*) AS BIGINT) FROM exact)) // tot.tot AS recall_ppm
       |  FROM tot
       |  UNION ALL
       |  SELECT 'b_sq8', 64,
       |    (1000000 * (SELECT CAST(COUNT(*) AS BIGINT)
       |       FROM sq8 s JOIN exact e ON e.q_id = s.q_id AND e.vec_id = s.vec_id)) // tot.tot
       |  FROM tot
       |  UNION ALL
       |  SELECT 'c_pq', 8,
       |    (1000000 * (SELECT CAST(COUNT(*) AS BIGINT)
       |       FROM pq p JOIN exact e ON e.q_id = p.q_id AND e.vec_id = p.vec_id)) // tot.tot
       |  FROM tot
       |  UNION ALL
       |  SELECT 'd_binary', 8,
       |    (1000000 * (SELECT CAST(COUNT(*) AS BIGINT)
       |       FROM bin b JOIN exact e ON e.q_id = b.q_id AND e.vec_id = b.vec_id)) // tot.tot
       |  FROM tot) z
       |ORDER BY tier""".stripMargin

  /** Graph-based ANN (the NSW/HNSW family's base layer): greedy BEAM SEARCH
    * over a navigable neighbor graph — the modern index shape (HNSW,
    * DiskANN/Vamana) the quantization ladder doesn't cover. The graph is the
    * bidirectional closure of [[Similarity.sKnnJoin]]'s top-5 edge set (a
    * kNN graph IS the NSW base layer); search starts every query at a fixed
    * entry node and runs 5 supersteps of expand-score-prune with beam
    * width 8: candidates = neighbors of the current beam (one equi-join
    * frontier expansion against the edge table), scored by 6-dp-rounded
    * cosine, new beam = top-8 of everything seen. Reports per query the
    * top-1 hit, nodes visited (the whole point: ~beam·degree·steps ≪ N
    * scored vectors), and recall@5 vs the exact brute baseline (the
    * documented capped |corpus|/100 query batch × corpus crossJoin, same
    * bound as s_ann_recall).
    *
    * 100 TB shape: the edge table shards by src (graph build is sKnnJoin's
    * bounded-blocking shape); each superstep is frontier ⋈ edges ⋈ corpus —
    * equi-joins whose left side is |queries|·beam rows, never corpus-scale;
    * the sequential depth (5 supersteps) is the algorithm's intrinsic hop
    * count, each one a single bounded shuffle (localCheckpoint bounds
    * lineage like every iterative op here). The oracle replays graph build
    * (nested sKnnJoinSql), all 5 supersteps, and the recall rollup — fully
    * hash-gated. */
  /** The NSW base-layer graph: bidirectional closure of sKnnJoin's top-5
    * edge set. Under [[ModelCache]] (bench only) the graph is BUILT once
    * per session and PERSISTED as a parquet index table — the deployed
    * shape (an NSW/HNSW graph at 100 TB is data-scale, so unlike the
    * k×d model matrices it must never transit the driver: the
    * d_index_persist pattern, write once, read per query); its one-time
    * cost is a build line and per-query timings measure search, not a
    * re-run of the index build. Verify and the oracle gate keep the full
    * in-query derivation (enabled=false); the edge set is deterministic in
    * (data, recipe), so results are identical either way (AnnCacheSpec). */
  private[graft] def nswEdges(spark: SparkSession, dir: String): DataFrame = {
    def build(): DataFrame = {
      val knn = Similarity.sKnnJoin(spark, dir)
      knn.select(col("q_id").as("src"), col("vec_id").as("dst"))
        .union(knn.select(col("vec_id").as("src"), col("q_id").as("dst")))
        .distinct()
    }
    if (!ModelCache.enabled)
      // materialize once: every superstep (and the final rollup) joins
      // against the graph — without this the full kNN-build pipeline
      // re-runs per iteration (measured 28 s → ~4 s warm)
      build().localCheckpoint()
    else {
      val path = ModelCache.memo(s"nswgraph:$dir") {
        // path keyed by the sanitized full dir PLUS a hash of the raw dir
        // (ADVICE r10): sanitization alone collides /a/b with /a_b — two
        // data dirs must never share (and overwrite) one index directory
        val p = s"${System.getProperty("java.io.tmpdir")}/graft_nsw_index/" +
          dir.replaceAll("[^A-Za-z0-9._-]", "_") + f"_${dir.hashCode}%08x"
        build().write.mode("overwrite").parquet(p)
        p
      }
      spark.read.parquet(path)
    }
  }

  def sNswSearch(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.fanout(Tables.table(spark, dir, "embeddings"))
      .select(col("vec_id"), col("embedding"), norm2(col("embedding")).as("nrm"))
    val edges = nswEdges(spark, dir)
    val qs = e.where(col("vec_id") % 100 === 0 && col("vec_id") < 100000)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    def score(cand: DataFrame): DataFrame =
      cand.join(e, cand("node") === e("vec_id"))
        .join(broadcast(qs), "q_id")
        .select(col("q_id"), col("node"),
          round(dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")), 6)
            .as("cosine"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("node"))
    var seen = score(qs.select(col("q_id")).withColumn("node", lit(1L)))
      .localCheckpoint()
    var beam = seen
    for (_ <- 1 to 5) {
      val cand = beam.join(edges, beam("node") === edges("src"))
        .select(col("q_id"), col("dst").as("node")).distinct()
      seen = seen.union(score(cand)).distinct().localCheckpoint()
      beam = seen.withColumn("r", row_number().over(w))
        .where(col("r") <= 8).select("q_id", "node", "cosine")
    }
    val ranked = seen.where(col("node") =!= col("q_id"))
      .withColumn("rnk", row_number().over(w))
    val approx = ranked.where(col("rnk") <= 5).select(col("q_id"), col("node"))
    val brute = qs.crossJoin(e).where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")), 6)
          .as("cosine"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))))
      .where(col("rnk") <= 5).select(col("q_id").as("b_q"), col("vec_id"))
    val hits = approx.join(brute,
        approx("q_id") === brute("b_q") && approx("node") === brute("vec_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("hits"))
    val vis = seen.groupBy("q_id").agg(countDistinct("node").as("n_visited"))
    ranked.where(col("rnk") === 1)
      .select(col("q_id"), col("node").as("top1_id"), col("cosine").as("top1_cos"))
      .join(vis, "q_id")
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"), col("top1_id"), col("top1_cos"), col("n_visited"),
        (coalesce(col("hits"), lit(0L)) * 200000).as("recall_ppm"))
      .orderBy("q_id")
  }

  val sNswSearchSql: String = {
    def cos(q: String, v: String): String =
      s"""round(list_sum([CAST($q.embedding[i] AS DOUBLE)*CAST($v.embedding[i] AS DOUBLE)
         |                for i in generate_series(1, len($q.embedding))])
         |      / ($q.nrm * $v.nrm), 6)""".stripMargin
    // AS MATERIALIZED throughout: every CTE below is referenced from
    // multiple supersteps — inlining would re-evaluate the nested Lloyd
    // chain once per reference (measured: minutes instead of seconds)
    val steps = (1 to 5).map { t =>
      val p = t - 1
      s"""cand$t AS MATERIALIZED (
         |  SELECT DISTINCT b.q_id, e.dst AS node
         |  FROM beam$p b JOIN edges e ON e.src = b.node),
         |sc$t AS MATERIALIZED (
         |  SELECT c.q_id, c.node, ${cos("q", "v")} AS cosine
         |  FROM cand$t c JOIN n v ON v.vec_id = c.node
         |  JOIN qs q ON q.q_id = c.q_id),
         |seen$t AS MATERIALIZED (
         |  SELECT DISTINCT * FROM (
         |    SELECT * FROM seen$p UNION ALL SELECT * FROM sc$t)),
         |beam$t AS MATERIALIZED (
         |  SELECT q_id, node, cosine FROM (
         |    SELECT *, row_number() OVER (PARTITION BY q_id
         |      ORDER BY cosine DESC, node) AS r FROM seen$t) WHERE r <= 8)""".stripMargin
    }.mkString(",\n")
    s"""WITH knn AS MATERIALIZED (SELECT * FROM (${Similarity.sKnnJoinSql}) t),
       |n AS MATERIALIZED (
       |  SELECT vec_id, embedding,
       |    sqrt(list_sum([CAST(embedding[i] AS DOUBLE)*CAST(embedding[i] AS DOUBLE)
       |                   for i in generate_series(1, len(embedding))])) AS nrm
       |  FROM embeddings),
       |edges AS MATERIALIZED (
       |  SELECT q_id AS src, vec_id AS dst FROM knn
       |  UNION SELECT vec_id, q_id FROM knn),
       |qs AS MATERIALIZED (SELECT vec_id AS q_id, embedding, nrm FROM n WHERE vec_id % 100 = 0 AND vec_id < 100000),
       |seen0 AS (
       |  SELECT q.q_id, v.vec_id AS node, ${cos("q", "v")} AS cosine
       |  FROM qs q JOIN n v ON v.vec_id = 1),
       |beam0 AS (SELECT * FROM seen0),
       |$steps,
       |ranked AS MATERIALIZED (
       |  SELECT q_id, node, cosine,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, node) AS rnk
       |  FROM seen5 WHERE node <> q_id),
       |brute AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q.q_id, v.vec_id,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY ${cos("q", "v")} DESC, v.vec_id) AS rnk
       |    FROM qs q CROSS JOIN n v WHERE v.vec_id <> q.q_id) WHERE rnk <= 5),
       |hits AS (
       |  SELECT a.q_id, COUNT(*) AS h
       |  FROM (SELECT q_id, node FROM ranked WHERE rnk <= 5) a
       |  JOIN brute b ON b.q_id = a.q_id AND b.vec_id = a.node
       |  GROUP BY 1),
       |vis AS (SELECT q_id, COUNT(DISTINCT node) AS n_visited FROM seen5 GROUP BY 1)
       |SELECT t.q_id, t.node AS top1_id, t.cosine AS top1_cos, v.n_visited,
       |  CAST(coalesce(h.h, 0) * 200000 AS BIGINT) AS recall_ppm
       |FROM ranked t JOIN vis v USING (q_id) LEFT JOIN hits h USING (q_id)
       |WHERE t.rnk = 1 ORDER BY t.q_id""".stripMargin
  }

  /** Embedding-space outlier report (OOD / noise detection for curation):
    * every vector's distance to its NEAREST k-means cell — 1 − max-cell
    * cosine, 6-dp rounded — ranked to the top-20 most out-of-distribution
    * vectors. The cheap first pass that catches corrupt embeddings,
    * wrong-modality rows and encoder failures before they poison training
    * batches; SemDeDup's complement (that op removes the TOO-similar, this
    * one flags the TOO-far). Cells come from the shared distributed Lloyd
    * chain (ModelCache — built once per bench session); scoring is one
    * scan projection of 8 codegen literal-centroid dots; ranking is
    * TakeOrderedAndProject (k rows per partition to the driver, never a
    * global sort). Oracle replays the Lloyd chain + per-vector max-cosine
    * rollup — hash-gated like every ANN tier. */
  def sOutlierDetect(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.fanout(Tables.table(spark, dir, "embeddings"))
      .select(col("vec_id"), col("embedding"), norm2(col("embedding")).as("nrm"))
    val cents = Similarity.ivfCells(spark, dir, kCells = 8)
    val sims = cents.toSeq.map { case (_, cv) =>
      val cn = math.sqrt(cv.map(x => x.toDouble * x.toDouble).sum)
      dot(col("embedding"), typedlit(cv.toSeq)) / (col("nrm") * lit(cn))
    }
    e.select(col("vec_id"),
        round(lit(1.0) - greatest(sims: _*), 6).as("ood_score"))
      .orderBy(col("ood_score").desc, col("vec_id"))
      .limit(20)
  }

  val sOutlierDetectSql: String = {
    val rounds = 4
    s"""WITH ${Cluster.lloydCtes(k = 8, rounds = rounds)},
       |best AS (
       |  SELECT e.vec_id, MAX(${Cluster.cosSql("e.embedding", "e.nrm", "c.cv")}) AS b
       |  FROM n e CROSS JOIN c$rounds c GROUP BY 1)
       |SELECT vec_id, round(1.0 - b, 6) AS ood_score
       |FROM best ORDER BY ood_score DESC, vec_id LIMIT 20""".stripMargin
  }

  /** Embedding-health telemetry: per-dimension variance profile collapsed
    * to the numbers an index/training run is gated on — degenerate
    * (near-zero-variance) dimension count, variance extremes, and the
    * participation ratio PR = (Σλ)²/Σλ² (effective dimensionality: 64 for
    * isotropic embeddings, ≪ 64 when mass collapses onto a few axes — the
    * anisotropy failure every embedding-collapse postmortem starts with).
    *
    * Per-dim moments are the stAnomaly decimal discipline (exact sums,
    * variance = identical-text IEEE row); the PR sums run over the 64
    * per-dim variance rows in DECIMAL so cross-dim summation order can't
    * matter. One posexplode scan + map-side-combined (dim) aggregate:
    * 64 rows cross the shuffle regardless of corpus size. */
  def sDimVariance(spark: SparkSession, dir: String): DataFrame = {
    val perDim = graft.Tables.table(spark, dir, "embeddings")
      .select(posexplode(col("embedding")).as(Seq("pos", "vf")))
      .select(col("pos"), col("vf").cast("double").as("v"))
      .groupBy("pos")
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(30,6)")).cast("double").as("sx"),
        sum(expr("cast(round(v * v, 6) as decimal(30,7))")).cast("double").as("sxx"))
      .select(col("n"),
        expr("(sxx - (sx*sx)/cast(n as double)) / (cast(n as double) - 1.0)")
          .as("variance"))
    perDim
      .agg(max("n").cast("long").as("n_vectors"),
        count(lit(1)).cast("long").as("n_dims"),
        sum(when(col("variance") < 0.0001, 1L).otherwise(0L)).cast("long")
          .as("n_degenerate"),
        min("variance").as("var_min"),
        max("variance").as("var_max"),
        sum(expr("cast(variance as decimal(15,8))")).as("sv"),
        sum(expr("cast(variance as decimal(15,8)) * cast(variance as decimal(15,8))"))
          .as("svv"))
      .select(col("n_vectors"), col("n_dims"), col("n_degenerate"),
        col("var_min"), col("var_max"),
        expr("(cast(sv as double)*cast(sv as double)) / cast(svv as double)")
          .as("participation_ratio"))
  }

  val sDimVarianceSql: String =
    """WITH x AS (
      |  SELECT t.i AS dim, CAST(embedding[t.i] AS DOUBLE) AS v
      |  FROM embeddings CROSS JOIN generate_series(1, 64) t(i)),
      |pd AS (
      |  SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CAST(v AS DECIMAL(30,6))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(round(v * v, 6) AS DECIMAL(30,7))) AS DOUBLE) AS sxx
      |  FROM x GROUP BY 1),
      |pv AS (
      |  SELECT n, (sxx - (sx*sx)/CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS variance
      |  FROM pd)
      |SELECT CAST(MAX(n) AS BIGINT) AS n_vectors,
      |  CAST(COUNT(*) AS BIGINT) AS n_dims,
      |  CAST(SUM(CASE WHEN variance < 0.0001 THEN 1 ELSE 0 END) AS BIGINT) AS n_degenerate,
      |  MIN(variance) AS var_min, MAX(variance) AS var_max,
      |  (CAST(SUM(CAST(variance AS DECIMAL(15,8))) AS DOUBLE)*CAST(SUM(CAST(variance AS DECIMAL(15,8))) AS DOUBLE)) / CAST(SUM(CAST(variance AS DECIMAL(15,8)) * CAST(variance AS DECIMAL(15,8))) AS DOUBLE) AS participation_ratio
      |FROM pv""".stripMargin

  /** Embedding drift between two corpus cohorts (vec_id parity as the
    * stand-in for "last month vs this month"): per-dimension decimal-exact
    * mean shift, L2² of the mean-shift vector (cross-dim sum in DECIMAL so
    * order can't matter), the largest single-dimension shift, and the
    * count of dimensions shifted beyond 0.01 — the drift gate an embedding
    * pipeline runs before trusting a frozen ANN index on new data
    * (s_index_append watches per-cell counts; this watches the SPACE).
    * Two map-side-combined (dim) aggregates + one 64-row join. */
  def sEmbedDrift(spark: SparkSession, dir: String): DataFrame = {
    def dimMeans(half: DataFrame): DataFrame = half
      .select(posexplode(col("embedding")).as(Seq("pos", "vf")))
      .select(col("pos"), col("vf").cast("double").as("v"))
      .groupBy("pos")
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(30,6)")).cast("double").as("sx"))
      .select(col("pos"), col("n"),
        expr("sx / cast(n as double)").as("m"))
    val e = graft.Tables.table(spark, dir, "embeddings")
    val a = dimMeans(e.where(col("vec_id") % 2 === 0))
      .select(col("pos"), col("n").as("n_a"), col("m").as("ma"))
    val b = dimMeans(e.where(col("vec_id") % 2 === 1))
      .select(col("pos"), col("n").as("n_b"), col("m").as("mb"))
    a.join(b, "pos")
      .select(col("n_a"), col("n_b"),
        expr("ma - mb").as("shift"),
        expr("cast((ma - mb)*(ma - mb) as decimal(25,12))").as("sh2"))
      .groupBy()
      .agg(max("n_a").cast("long").as("n_a"),
        max("n_b").cast("long").as("n_b"),
        sum("sh2").cast("double").as("l2_sq"),
        max(abs(col("shift"))).as("max_dim_shift"),
        sum(when(abs(col("shift")) > 0.01, 1L).otherwise(0L)).cast("long")
          .as("n_drifted_dims"))
  }

  val sEmbedDriftSql: String =
    """WITH x AS (
      |  SELECT vec_id, t.i AS pos, CAST(embedding[t.i] AS DOUBLE) AS v
      |  FROM embeddings CROSS JOIN generate_series(1, 64) t(i)),
      |a AS (
      |  SELECT pos, CAST(COUNT(*) AS BIGINT) AS n_a,
      |    CAST(SUM(CAST(v AS DECIMAL(30,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS ma
      |  FROM x WHERE vec_id % 2 = 0 GROUP BY 1),
      |b AS (
      |  SELECT pos, CAST(COUNT(*) AS BIGINT) AS n_b,
      |    CAST(SUM(CAST(v AS DECIMAL(30,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mb
      |  FROM x WHERE vec_id % 2 = 1 GROUP BY 1),
      |j AS (
      |  SELECT n_a, n_b, ma - mb AS shift,
      |         CAST((ma - mb)*(ma - mb) AS DECIMAL(25,12)) AS sh2
      |  FROM a JOIN b USING (pos))
      |SELECT CAST(MAX(n_a) AS BIGINT) AS n_a, CAST(MAX(n_b) AS BIGINT) AS n_b,
      |  CAST(SUM(sh2) AS DOUBLE) AS l2_sq,
      |  MAX(abs(shift)) AS max_dim_shift,
      |  CAST(SUM(CASE WHEN abs(shift) > 0.01 THEN 1 ELSE 0 END) AS BIGINT) AS n_drifted_dims
      |FROM j""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_dim_variance" -> (sDimVariance _),
    "s_embed_drift" -> (sEmbedDrift _),
    "s_outlier_detect" -> (sOutlierDetect _),
    "s_nsw_search" -> (sNswSearch _),
    "s_tier_report" -> (sTierReport _),
    "s_hamming_topk" -> (sHammingTopk _),
    "s_sq8_topk" -> (sSq8Topk _),
    "s_matryoshka_rerank" -> (sMatryoshkaRerank _),
    "s_filtered_topk" -> (sFilteredTopk _),
    "s_tau_sweep" -> (sTauSweep _))

  val oracles: Map[String, String] = Map(
    "s_dim_variance" -> sDimVarianceSql,
    "s_embed_drift" -> sEmbedDriftSql,
    "s_outlier_detect" -> sOutlierDetectSql,
    "s_nsw_search" -> sNswSearchSql,
    "s_tier_report" -> sTierReportSql,
    "s_hamming_topk" -> sHammingTopkSql,
    "s_sq8_topk" -> sSq8TopkSql,
    "s_matryoshka_rerank" -> sMatryoshkaRerankSql,
    "s_filtered_topk" -> sFilteredTopkSql,
    "s_tau_sweep" -> sTauSweepSql)
}
