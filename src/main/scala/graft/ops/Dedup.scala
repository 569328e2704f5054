package graft.ops

import graft.Tables
import graft.Tables.dsum
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.4 Deduplication over `documents` — the core LLM-training-data operators.
  *
  * Design rule for 100 TB: **no O(n²) stage, ever**. Every near-dup operator
  * is a *blocked* join — shingle inverted index (d_ngram_jaccard), LSH band
  * buckets (d_minhash_lsh), 16-bit simhash bands (d_simhash) — so the
  * candidate set stays ~linear in corpus size, and every aggregation is
  * partial (map-side) before its one hash shuffle.
  */
object Dedup {

  private[graft] def norm(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))
  private val normSql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  /** Exact dedup: one hash-partitioned aggregate over md5(canonical text).
    * Keeps min(doc_id) per group — the standard "first writer wins" policy.
    * At 100 TB: shuffle = one 16-byte key + id per doc; no sort, no skew
    * (md5 keys are uniform). */
  def dExact(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "documents")
      .groupBy(md5(norm(col("text"))).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_id")

  val dExactSql: String =
    s"""SELECT md5($normSql) AS fp, min(doc_id) AS keep_id, COUNT(*) AS n_copies
       |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin

  /** Distinct word-5-gram shingles per document, pre-hashed to 64 bits:
    * (doc_id, h). Built with an array `transform` inside the scan projection
    * — zero shuffles, zero window state — and hashed INSIDE the lambda
    * (multi-arg xxhash64 over the 5 words), so the shingle string is never
    * materialized: downstream joins/distincts run on (long, long) keys
    * instead of ~30-char strings. Equality semantics are identical (words
    * contain no separators; collisions are 2⁻⁶⁴-scale — immaterial next to
    * the 0.5 Jaccard threshold). The scan is fanned out first: shingling is
    * the per-row hot loop and must not be bound to the input split count. */
  private[graft] def shingles(spark: SparkSession, dir: String): DataFrame =
    shinglesOf(Tables.fanout(Tables.table(spark, dir, "documents")))

  /** The shingle pipeline over an arbitrary (doc_id, text) frame.
    * Native NgramHashes expression (one codegen loop) — the former
    * transform(sequence…, i -> xxhash64(…)) lambda is CodegenFallback
    * and paid interpreted dispatch per shingle; hash values unchanged.
    * array_distinct BEFORE the explode: per-doc distinct == global
    * distinct on (doc_id, h) because doc_id is part of the key — the
    * in-projection hash-set dedup replaces what was a full shuffle of
    * the shingle table (the largest intermediate in the dedup family). */
  private[graft] def shinglesOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(norm(col("text")), " ").as("ws"))
      .select(col("doc_id"),
        explode(array_distinct(
          graft.functions.Sketch.ngramHashes(col("ws"), 5))).as("h"))

  /** Skew guard for the inverted-index joins: drop shingles whose document
    * frequency exceeds `maxDf`. Ultra-common shingles carry no dedup signal
    * (they connect unrelated docs) and ALL of the join skew — a shingle
    * with df=d contributes d² candidate pairs. The blacklist (df > cap) is
    * tiny by Zipf's law, so it broadcasts; the anti-join adds no shuffle of
    * the shingle table. Jaccard stays EXACT over the filtered feature
    * universe (sizes and intersections both computed post-filter). Cap rule
    * at 100 TB: ~1e-5 × corpus; 1000 here (vacuous at test scale — every
    * oracle still hash-matches — but the guard is in the plan). */
  private[graft] def filteredShingles(spark: SparkSession, dir: String,
                                      maxDf: Int = 1000): DataFrame =
    filteredShinglesOf(
      Tables.fanout(Tables.table(spark, dir, "documents")), maxDf)

  /** Same pipeline over an arbitrary (doc_id, text) frame — callers that
    * have already gated the corpus (p_curate_full) shingle ONLY the
    * survivors instead of paying hash+explode for rows a scan-stage filter
    * would drop anyway. */
  private[graft] def filteredShinglesOf(docs: DataFrame,
                                        maxDf: Int = 1000): DataFrame = {
    val sh = shinglesOf(docs)
    val hot = sh.groupBy("h").agg(count(lit(1)).as("df"))
      .where(col("df") > maxDf).select("h")
    sh.join(broadcast(hot), Seq("h"), "left_anti")
  }

  /** Exact n-gram-Jaccard near-dup pairs (threshold 0.5) via the shingle
    * inverted index: pairs are generated ONLY for docs sharing a shingle —
    * the candidate count is Σ df(s)², bounded because word-5-grams are
    * near-unique outside true near-dups. The [[filteredShingles]] df cap
    * keeps hot shingles out of the join (see SURVEY.md §5). */
  def dNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = filteredShingles(spark, dir).cache()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val shared = sh.as("a").join(sh.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        round(col("shared").cast("double") /
          (col("sa.n_sh") + col("sb.n_sh") - col("shared")), 6).as("jaccard"))
      .where(col("jaccard") >= 0.5)
      .orderBy("doc_a", "doc_b")
  }

  val dNgramJaccardSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS word,
       |         generate_subscripts(string_split($normSql, ' '), 1) AS pos
       |  FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id,
       |    word || ' ' || lead(word,1) OVER w || ' ' || lead(word,2) OVER w
       |         || ' ' || lead(word,3) OVER w || ' ' || lead(word,4) OVER w AS shingle
       |  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
       |  QUALIFY lead(word,4) OVER w IS NOT NULL),
       |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |  round(shared*1.0/(sa.n_sh + sb.n_sh - shared), 6) AS jaccard
       |FROM pairs JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
       |WHERE round(shared*1.0/(sa.n_sh + sb.n_sh - shared), 6) >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin

  /** The engine-portable shingle pipeline (poly hashes instead of xxhash64,
    * same df-cap skew guard) — [[dMinhashLsh]]'s feature universe. Kept
    * separate from [[shingles]] (which keys equality-only consumers where
    * the hash VALUES never matter) so the jaccard family's hot loop is
    * untouched. */
  private[graft] def polyShingles(spark: SparkSession, dir: String,
                                  maxDf: Int = 1000): DataFrame = {
    val docs = Tables.fanout(Tables.table(spark, dir, "documents"))
    val sh = docs
      .select(col("doc_id"), split(norm(col("text")), " ").as("ws"))
      .select(col("doc_id"),
        explode(array_distinct(
          graft.functions.Poly.ngramHashes(col("ws"), 5))).as("h"))
    val hot = sh.groupBy("h").agg(count(lit(1)).as("df"))
      .where(col("df") > maxDf).select("h")
    sh.join(broadcast(hot), Seq("h"), "left_anti")
  }

  /** MinHash(128 perms) + LSH(32 bands × 4 rows) near-dup detection,
    * candidates verified with exact Jaccard ≥ 0.5 (precision 1.0 by
    * construction; recall ≥ 1-(1-j⁴)³² ≈ 1 for j ≥ 0.8 planted dups).
    *
    * Pipeline (all linear in corpus size):
    *  1. shingle → one portable poly hash ([[graft.functions.PolyHash]]),
    *     then 128 affine permutations g_p(h) = (a_p·h + b_p) mod 2^61−1 —
    *     partial (map-side) min collapses to docs×128 rows before the
    *     shuffle, so the exchange is tiny even at 100 TB.
    *  2. band signature = poly fold over the band's 4 minhashes (perm-sorted).
    *  3. self-join on (band, signature) → candidate pairs (distinct).
    *  4. verify candidates against exact shingle-Jaccard (semi-join first —
    *     only candidate docs' shingle sets are re-read).
    *
    * r6: the whole chain is modular arithmetic (the xxhash64 family was
    * engine-private — the op was rows-only for three rounds solely because
    * of it), so [[dMinhashLshSql]] now replays signatures, buckets AND the
    * misses exactly → HASH-GATED. DedupSpec still asserts recall ≥ 0.9 /
    * precision 1.0 vs exact jaccard.
    */
  def dMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val nPerm = 128
    val bandRows = 4

    val sh = polyShingles(spark, dir).cache()

    // All 128 permutation minimums in ONE agg column (PolyMinHashAgg:
    // primitive long[128] buffer — same TypedImperativeAggregate shape as
    // r3's MinHashAgg, affine g_p instead of seeded XXH64).
    val minh = sh.groupBy("doc_id")
      .agg(graft.functions.Poly.minhash(col("h"), nPerm).as("m"))
    // cache: sigs (docs×32 tiny rows) feeds BOTH sides of the self-join —
    // without it the 128-wide min-agg pipeline runs twice
    val sigs = minh
      .select(col("doc_id"),
        posexplode(graft.functions.Poly.bandSigs(col("m"), bandRows))
          .as(Seq("band", "sig")))
      .cache()
    val cand = sigs.as("x").join(sigs.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()

    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    // the candidate pair set is sparse by construction (near-dup graphs are
    // orders of magnitude smaller than the corpus) → broadcast it, so the
    // verify stage never shuffles the full shingle table on doc_id
    val shared = broadcast(cand)
      .join(sh.as("a"), col("doc_a") === col("a.doc_id"))
      .join(sh.as("b"), col("doc_b") === col("b.doc_id") && col("a.h") === col("b.h"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        round(col("shared").cast("double") /
          (col("sa.n_sh") + col("sb.n_sh") - col("shared")), 6).as("jaccard"))
      .where(col("jaccard") >= 0.5)
      .orderBy("doc_a", "doc_b")
  }

  /** 64-bit SimHash over word-bigram features (unigrams are too coarse on
    * low-vocab corpora), hamming ≤ 3 near-dups, blocked by 4 × 16-bit bands
    * (pigeonhole: hamming ≤ 3 ⇒ at least one band identical — blocking is
    * lossless, never a recall trade). Verified by exact bit_count(xor).
    * All bit math is codegen'd column algebra. Spec: exact match vs
    * brute-force hamming on sf0.001. */
  /** (doc_id, simhash) signatures — exposed for DedupSpec's unblocked
    * brute-force comparison. */
  private[graft] def simhashes(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.fanout(Tables.table(spark, dir, "documents"))
    // Word-bigram features hashed with the PORTABLE poly family (r6 — the
    // bigram string is still never materialized), then ONE SimHashAgg pass:
    // per-occurrence ±1 bit votes are equivalent to the count-weighted
    // formulation, so the former (doc, feature) counting shuffle disappears
    // — one exchange total, map-side combine into a long[64] vote buffer.
    // Poly hashes are 61-bit, so signature bits 61-63 are structurally 0 on
    // both engines (every occurrence votes −1 there) — banding/hamming
    // semantics unchanged, and the oracle replays the votes exactly.
    docs
      .select(col("doc_id"), split(norm(col("text")), " ").as("ws"))
      .select(col("doc_id"),
        explode(graft.functions.Poly.ngramHashes(col("ws"), 2)).as("fh"))
      .groupBy("doc_id")
      .agg(graft.functions.Sketch.simhash(col("fh")).as("simhash"))
  }

  def dSimhash(spark: SparkSession, dir: String): DataFrame = {
    // cache: one row per doc; the banded self-join reads it twice
    val sim = simhashes(spark, dir).cache()
    val banded = sim.select(col("doc_id"), col("simhash"),
      explode(sequence(lit(0), lit(3))).as("k"))
      .withColumn("bandval", expr("(simhash >> (k * 16)) & 65535"))
    banded.as("x").join(banded.as("y"),
        col("x.k") === col("y.k") && col("x.bandval") === col("y.bandval")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= 3)
      .orderBy("doc_a", "doc_b")
  }

  /** Embedding-cosine most-similar pairs: top-20 pairs by cosine. Exact
    * brute-force — correct as the *baseline*; the scale path is
    * Similarity.sLshAnn's bucketed join (SURVEY.md §5). Dot products are a
    * deterministic left fold (Catalyst `aggregate` HOF) in double precision;
    * oracle mirrors with double math (never DuckDB's float32
    * list_cosine_similarity). */
  def dEmbedNeardup(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.fanout(Tables.table(spark, dir, "embeddings"))
      .select(col("vec_id"), col("embedding"),
        graft.functions.Vec.vnorm(col("embedding")).as("nrm"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(
          graft.functions.Vec.vdot(col("a.embedding"), col("b.embedding"))
            / (col("a.nrm") * col("b.nrm")), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_a"), col("vec_b"))
      .limit(20)
  }

  val dEmbedNeardupSql: String =
    """WITH n AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_sum([CAST(embedding[i] AS DOUBLE)*CAST(embedding[i] AS DOUBLE)
      |                   for i in generate_series(1, len(embedding))])) AS nrm
      |  FROM embeddings)
      |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |  round(list_sum([CAST(a.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE)
      |                  for i in generate_series(1, len(a.embedding))]) / (a.nrm*b.nrm), 6) AS cosine
      |FROM n a JOIN n b ON a.vec_id < b.vec_id
      |ORDER BY cosine DESC, vec_a, vec_b LIMIT 20""".stripMargin

  /** Driver-side union-find labeling over the collected edge set — the
    * small-graph fast path kept as the cross-check for
    * [[dupClustersDistributed]] (PipelineSpec asserts exact agreement).
    * r5: no longer the primary `queries` path — the distributed
    * iterate-to-fixpoint labeling is (VERDICT r4 task 7), so the operator
    * the driver grades is the one that scales. */
  def dDupClusters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = dNgramJaccard(spark, dir).select("doc_a", "doc_b")
      .as[(Long, Long)].collect()
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { // min root wins → cluster_id = min doc_id in component
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    edges.foreach { case (a, b) => union(a, b) }
    val members = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
    members.map(d => (d, find(d))).toSeq
      .toDF("doc_id", "cluster_id")
      .orderBy("doc_id")
  }

  /** Fully distributed connected components — the PRIMARY `queries` path
    * since r5 (duplicate families: (doc_id, cluster_id = min doc_id in
    * component), the form a curation pipeline consumes): iterative
    * min-label propagation over the (undirected) edge list, each round one
    * shuffle join, `localCheckpoint` every round to sever the growing
    * lineage (without it round k replays rounds 1..k-1 and the DAG
    * explodes). The loop ITERATES TO FIXPOINT — a per-round convergence
    * probe (any label changed?) stops it as soon as labels stabilize, so
    * the round count is the graph diameter, not a guessed constant; dedup
    * families are near-cliques so the diameter is tiny. Returns the labels
    * plus (rounds run, converged?) so the spec can assert detection fired;
    * the SQL oracle states the converged result via 8 unrolled SQL rounds
    * (≥ any test-data diameter — oracle text must be static SQL). */
  private[graft] def dupClustersWithRounds(spark: SparkSession, dir: String,
      maxRounds: Int = 10): (DataFrame, Int, Boolean) = {
    val pairs = dNgramJaccard(spark, dir).select("doc_a", "doc_b")
    val edges = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .unionByName(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
      .localCheckpoint()
    var labels = edges.select(col("u").as("doc"), col("u").as("lbl")).distinct()
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      // Convergence detection is FUSED into the label aggregate (r6, VERDICT
      // r5 #3): the current label rides along as `old` (null on the
      // propagated side, so min() recovers exactly the one current label per
      // doc), and "any label changed?" becomes a filter scan of the already-
      // checkpointed result — one action per round instead of the former
      // second full `next ⋈ labels` probe join, which doubled per-round cost.
      val next = edges.join(labels.withColumnRenamed("doc", "v2"), col("v") === col("v2"))
        .select(col("u").as("doc"), col("lbl"), lit(null).cast("long").as("old"))
        .unionByName(labels.select(col("doc"), col("lbl"), col("lbl").as("old")))
        .groupBy("doc").agg(min(col("lbl")).as("lbl"), min(col("old")).as("old"))
        .localCheckpoint() // sever lineage: each round is one join, not k
      converged = next.where(col("lbl") =!= col("old")).isEmpty
      labels = next.select("doc", "lbl")
      round += 1
    }
    val out = labels.select(col("doc").as("doc_id"), col("lbl").as("cluster_id"))
      .orderBy("doc_id")
    (out, round, converged)
  }

  def dupClustersDistributed(spark: SparkSession, dir: String,
                             maxRounds: Int = 10): DataFrame =
    dupClustersWithRounds(spark, dir, maxRounds)._1

  val dDupClustersSql: String = {
    val base =
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS word,
         |         generate_subscripts(string_split($normSql, ' '), 1) AS pos
         |  FROM documents),
         |sh AS (
         |  SELECT DISTINCT doc_id,
         |    word || ' ' || lead(word,1) OVER w || ' ' || lead(word,2) OVER w
         |         || ' ' || lead(word,3) OVER w || ' ' || lead(word,4) OVER w AS shingle
         |  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
         |  QUALIFY lead(word,4) OVER w IS NOT NULL),
         |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
         |cand AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT doc_a, doc_b FROM cand
         |  JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
         |  WHERE round(shared*1.0/(sa.n_sh + sb.n_sh - shared), 6) >= 0.5),
         |e AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM pairs
         |      UNION ALL SELECT doc_b, doc_a FROM pairs),
         |l0 AS MATERIALIZED (SELECT DISTINCT u AS doc, u AS lbl FROM e)""".stripMargin
    val rounds = (1 to 8).map { i =>
      s"""l$i AS MATERIALIZED (
         |  SELECT d.doc AS doc, least(min(d.lbl), min(n.lbl)) AS lbl
         |  FROM l${i - 1} d JOIN e ON d.doc = e.u JOIN l${i - 1} n ON e.v = n.doc
         |  GROUP BY d.doc)""".stripMargin
    }.mkString(",\n")
    // NOTE: no stripMargin on the assembly — base/rounds are already
    // stripped, and a second pass would eat the leading bar of any
    // whitespace-led `||` concat line
    base + ",\n" + rounds +
      "\nSELECT doc AS doc_id, lbl AS cluster_id FROM l8 ORDER BY doc_id"
  }

  /** Substring-level duplication: doc pairs sharing a LONG ALIGNED RUN of
    * word-5-gram shingles — the "copied paragraph inside an otherwise
    * different document" case whole-doc Jaccard misses. Positional
    * shingles join on the hash; every match lands on a DIAGONAL
    * (pos_a − pos_b); ≥ `minRun` matches on one diagonal means a shared
    * word-substring of ≥ minRun+4 words at that alignment (the standard
    * alignment-count heuristic — gaps on a diagonal only under-claim
    * contiguity, never invent overlap). Same inverted-index blocking as
    * Jaccard, so no cross product; the diagonal aggregate is one extra
    * shuffle over matched shingles only. */
  def dSubstringSpan(spark: SparkSession, dir: String): DataFrame = {
    val minRun = 10
    val pos = Tables.fanout(Tables.table(spark, dir, "documents"))
      .select(col("doc_id"), split(norm(col("text")), " ").as("ws"))
      .select(col("doc_id"),
        posexplode(graft.functions.Sketch.ngramHashes(col("ws"), 5)).as(Seq("pos", "h")))
      .cache()
    pos.as("a").join(pos.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (col("a.pos") - col("b.pos")).as("diag"))
      .agg(count(lit(1)).as("run"))
      .where(col("run") >= minRun)
      .groupBy("doc_a", "doc_b")
      .agg(max(col("run")).as("max_run"), count(lit(1)).as("n_diags"))
      .orderBy("doc_a", "doc_b")
  }

  val dSubstringSpanSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS word,
       |         generate_subscripts(string_split($normSql, ' '), 1) AS pos
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, CAST(pos - 1 AS BIGINT) AS pos,
       |    word || ' ' || lead(word,1) OVER w || ' ' || lead(word,2) OVER w
       |         || ' ' || lead(word,3) OVER w || ' ' || lead(word,4) OVER w AS shingle
       |  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
       |  QUALIFY lead(word,4) OVER w IS NOT NULL),
       |diags AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos - b.pos AS diag,
       |         COUNT(*) AS run
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 3)
       |SELECT doc_a, doc_b, CAST(max(run) AS BIGINT) AS max_run,
       |       COUNT(*) AS n_diags
       |FROM diags WHERE run >= 10
       |GROUP BY doc_a, doc_b ORDER BY doc_a, doc_b""".stripMargin

  /** ExactSubstr dedup WITH REMOVAL (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better" — the production
    * span-level operator; VERDICT r10 next #1): [[dSubstringSpan]] DETECTS
    * copied spans; this op EMITS the cleaned corpus with every duplicated
    * span CUT and the document reassembled — what the published pipelines
    * actually apply to the training set.
    *
    * Policy (keep-first by doc_id, the ExactSubstr convention): a word
    * position is removed iff it is covered by a run of ≥ `minRun`
    * consecutive positional 5-gram shingles that each ALSO occur in some
    * EARLIER document (first occurrence across the corpus survives; a run
    * of R dup shingle-starts covers R+4 words). Within-doc repetition is
    * deliberately untouched — that is t_repetition's gate, not dedup.
    *
    * Plan at 100 TB: positional shingles are the scan projection the span
    * detector already uses; first-occurrence is ONE map-side-combined
    * min(doc_id) aggregate over the shingle hash; dup marking is the
    * equi-join back on the hash (bounded by true duplication mass, never
    * quadratic); runs/gaps-islands run per-doc (doc_id-keyed window,
    * bounded by doc length); coverage explodes to (doc_id, pos) rows
    * bounded by removed mass; reassembly is ONE doc_id aggregate whose
    * in-order md5 IS the gate (the t_c4_filter pattern — order proven,
    * not claimed). Oracle: the identical chain over shingle STRINGS in
    * DuckDB (the d_substring_span equivalence precedent).
    *
    * Collision assumption (stated because this op MUTATES corpus text):
    * Spark groups positional shingles by the 64-bit GF(2^61−1) polyhash
    * while the oracle groups by shingle STRINGS — a hash collision between
    * distinct 5-grams would mark a false duplicate span and diverge from
    * the oracle. At 2^61 the birthday bound needs ~10^9 DISTINCT shingles
    * per corpus for a ~1e-4 collision chance; the d_substring_span family
    * has carried the same assumption green since r9, and the oracle gate
    * itself is the per-round collision detector (a collision FAILS the
    * hash gate rather than passing silently). */
  def dSubstringRemove(spark: SparkSession, dir: String): DataFrame =
    substringRemoveOf(Tables.fanout(Tables.table(spark, dir, "documents")))

  /** The removal chain over an arbitrary (doc_id, text) frame — the spec
    * plants a copied paragraph across 3 docs and proves only the first
    * survives. */
  private[graft] def substringRemoveOf(docs: DataFrame): DataFrame = {
    val base = docs
      .select(col("doc_id"), split(norm(col("text")), " ").as("ws"))
      .cache() // two derivations below: positional shingles + token frame
    val sh = posShingles(base)
    val firstDoc = sh.groupBy("h").agg(min(col("doc_id")).as("first_doc"))
    val dup = sh.join(firstDoc, Seq("h"))
      .where(col("doc_id") > col("first_doc"))
      .select("doc_id", "pos")
    cutSpans(base, dup)
  }

  /** Positional 5-gram shingles of a (doc_id, ws) frame: (doc_id, pos, h). */
  private def posShingles(base: DataFrame): DataFrame =
    base.select(col("doc_id"),
      posexplode(graft.functions.Sketch.ngramHashes(col("ws"), 5)).as(Seq("pos", "h")))

  /** The span-removal tail shared by [[dSubstringRemove]] (corpus-internal
    * keep-first) and [[dSubstringScreen]] (arriving-vs-index): given the
    * duplicated shingle-start positions, find runs ≥ minRun, cut the
    * covered words, reassemble each doc and md5 the cleaned text. */
  private def cutSpans(base: DataFrame, dup: DataFrame,
                       minRun: Int = 10): DataFrame = {
    // gaps-islands per doc: consecutive dup shingle-starts share one grp
    val wDoc = Window.partitionBy("doc_id").orderBy("pos")
    val spans = dup
      .withColumn("grp", col("pos") - row_number().over(wDoc))
      .groupBy("doc_id", "grp")
      .agg(min(col("pos")).as("start"), count(lit(1)).as("run"))
      .where(col("run") >= minRun)
    // covered word positions: [start, start + run + 4 − 1] per span;
    // adjacent spans' tails may overlap → distinct before the mark join
    val covered = spans.select(col("doc_id"),
        explode(sequence(col("start"), col("start") + col("run") + lit(3)))
          .as("pos"))
      .distinct()
    val toks = base.select(col("doc_id"),
      posexplode(col("ws")).as(Seq("pos", "word")))
    val marked = toks.join(covered.withColumn("cut", lit(true)),
      Seq("doc_id", "pos"), "left_outer")
    val out = marked.groupBy("doc_id").agg(
      count(lit(1)).as("n_words"),
      sum(when(col("cut").isNull, 1L).otherwise(0L)).as("kept_words"),
      sum(when(col("cut").isNotNull, 1L).otherwise(0L)).as("removed_words"),
      md5(array_join(
        expr("transform(array_sort(collect_list(CASE WHEN cut IS NULL THEN struct(pos, word) END)), x -> x.word)"),
        " ")).as("clean_md5"))
    val spanCounts = spans.groupBy("doc_id").agg(count(lit(1)).as("n_spans"))
    out.join(spanCounts, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"), col("kept_words"),
        col("removed_words"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"), col("clean_md5"))
      .orderBy("doc_id")
  }

  /** Incremental ExactSubstr at the curation seam (d_substring_remove's
    * streaming-shaped sibling, the st_lsh_screen pattern applied to SPANS):
    * the reference corpus's distinct positional-shingle hashes are the
    * persisted index (64 bits per distinct shingle — the suffix-array
    * analog a production incremental dedup keeps hot); each ARRIVING doc
    * is screened independently — its shingles that hit the index mark
    * runs, runs ≥ minRun are cut, and the cleaned arriving doc is emitted
    * with its md5. Reference docs always win (they were there first);
    * arriving docs never interact with each other (stateless per doc
    * given the frozen index — replay-safe by construction). At 100 TB:
    * the screen is one equi-join of the arriving slice's shingles against
    * the index, cost ∝ arriving batch, never the corpus. */
  def dSubstringScreen(spark: SparkSession, dir: String): DataFrame =
    substringScreenOf(Tables.fanout(Tables.table(spark, dir, "documents")))

  /** The screen over an arbitrary (doc_id, text) frame: doc_id % 10 ≠ 0 is
    * the indexed reference corpus, % 10 = 0 the arriving slice. */
  private[graft] def substringScreenOf(docs: DataFrame): DataFrame =
    spanScreenAgainst(docs.where(col("doc_id") % 10 === 0),
      spanIndexOf(docs.where(col("doc_id") % 10 =!= 0)))

  /** The frozen span index of a reference corpus: its DISTINCT positional
    * 5-gram shingle hashes, one `h` column — what [[dSubstringScreen]]
    * derives in-query and st_substring_screen PERSISTS as a catalog table
    * (64 bits per distinct shingle, the production incremental-dedup
    * shape). */
  private[graft] def spanIndexOf(ref: DataFrame): DataFrame =
    posShingles(ref.select(col("doc_id"),
        split(norm(col("text")), " ").as("ws")))
      .select("h").distinct()

  /** Screen `arriving` (doc_id, text) against a frozen span index —
    * stateless per doc, the per-micro-batch body the streamed form runs
    * verbatim. */
  private[graft] def spanScreenAgainst(arriving: DataFrame,
                                       index: DataFrame): DataFrame = {
    val arr = arriving.select(col("doc_id"),
      split(norm(col("text")), " ").as("ws")).cache()
    val dup = posShingles(arr)
      .join(index.select("h"), Seq("h"), "left_semi")
      .select("doc_id", "pos")
    cutSpans(arr, dup)
  }

  val dSubstringScreenSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS word,
       |         generate_subscripts(string_split($normSql, ' '), 1) - 1 AS pos
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, pos,
       |    word || ' ' || lead(word,1) OVER w || ' ' || lead(word,2) OVER w
       |         || ' ' || lead(word,3) OVER w || ' ' || lead(word,4) OVER w AS shingle
       |  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
       |  QUALIFY lead(word,4) OVER w IS NOT NULL),
       |idx AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 <> 0),
       |dup AS (
       |  SELECT s.doc_id, s.pos FROM sh s
       |  JOIN idx i ON s.shingle = i.shingle
       |  WHERE s.doc_id % 10 = 0),
       |isl AS (
       |  SELECT doc_id, pos,
       |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       |  FROM dup),
       |spans AS (
       |  SELECT doc_id, min(pos) AS start, COUNT(*) AS run
       |  FROM isl GROUP BY doc_id, grp HAVING COUNT(*) >= 10),
       |atok AS (SELECT * FROM tok WHERE doc_id % 10 = 0),
       |cov AS (
       |  SELECT DISTINCT t.doc_id, t.pos FROM atok t
       |  JOIN spans p ON t.doc_id = p.doc_id
       |    AND t.pos BETWEEN p.start AND p.start + p.run + 3),
       |k AS (
       |  SELECT t.doc_id, t.pos, t.word, c.pos IS NOT NULL AS cut
       |  FROM atok t LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.pos = t.pos),
       |sp AS (SELECT doc_id, COUNT(*) AS n_spans FROM spans GROUP BY 1)
       |SELECT k.doc_id, COUNT(*) AS n_words,
       |  CAST(SUM(CASE WHEN NOT cut THEN 1 ELSE 0 END) AS BIGINT) AS kept_words,
       |  CAST(SUM(CASE WHEN cut THEN 1 ELSE 0 END) AS BIGINT) AS removed_words,
       |  CAST(COALESCE(min(sp.n_spans), 0) AS BIGINT) AS n_spans,
       |  md5(coalesce(string_agg(CASE WHEN NOT cut THEN word END, ' ' ORDER BY k.pos), '')) AS clean_md5
       |FROM k LEFT JOIN sp ON sp.doc_id = k.doc_id
       |GROUP BY k.doc_id ORDER BY k.doc_id""".stripMargin

  val dSubstringRemoveSql: String = "WITH " + substringRemoveChainSql("documents") +
    "\nSELECT * FROM srm_out ORDER BY doc_id"

  /** The full removal chain as a WITH-body fragment over source relation
    * `src(doc_id, text)`, ending in `srm_out(doc_id, n_words, kept_words,
    * removed_words, n_spans, clean_md5)` — reused by the standalone oracle
    * and by compositions that run span removal as a curation stage. */
  private[graft] def substringRemoveChainSql(src: String): String =
    s"""tok AS (
       |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS word,
       |         generate_subscripts(string_split($normSql, ' '), 1) - 1 AS pos
       |  FROM $src),
       |sh AS (
       |  SELECT doc_id, pos,
       |    word || ' ' || lead(word,1) OVER w || ' ' || lead(word,2) OVER w
       |         || ' ' || lead(word,3) OVER w || ' ' || lead(word,4) OVER w AS shingle
       |  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
       |  QUALIFY lead(word,4) OVER w IS NOT NULL),
       |fo AS (SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY 1),
       |dup AS (
       |  SELECT s.doc_id, s.pos FROM sh s
       |  JOIN fo f ON s.shingle = f.shingle AND s.doc_id > f.first_doc),
       |isl AS (
       |  SELECT doc_id, pos,
       |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       |  FROM dup),
       |spans AS (
       |  SELECT doc_id, min(pos) AS start, COUNT(*) AS run
       |  FROM isl GROUP BY doc_id, grp HAVING COUNT(*) >= 10),
       |cov AS (
       |  SELECT DISTINCT t.doc_id, t.pos FROM tok t
       |  JOIN spans p ON t.doc_id = p.doc_id
       |    AND t.pos BETWEEN p.start AND p.start + p.run + 3),
       |k AS (
       |  SELECT t.doc_id, t.pos, t.word, c.pos IS NOT NULL AS cut
       |  FROM tok t LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.pos = t.pos),
       |sp AS (SELECT doc_id, COUNT(*) AS n_spans FROM spans GROUP BY 1),
       |srm_out AS (
       |  SELECT k.doc_id, COUNT(*) AS n_words,
       |    CAST(SUM(CASE WHEN NOT cut THEN 1 ELSE 0 END) AS BIGINT) AS kept_words,
       |    CAST(SUM(CASE WHEN cut THEN 1 ELSE 0 END) AS BIGINT) AS removed_words,
       |    CAST(COALESCE(min(sp.n_spans), 0) AS BIGINT) AS n_spans,
       |    md5(coalesce(string_agg(CASE WHEN NOT cut THEN word END, ' ' ORDER BY k.pos), '')) AS clean_md5
       |  FROM k LEFT JOIN sp ON sp.doc_id = k.doc_id
       |  GROUP BY k.doc_id)""".stripMargin

  /** Fuzzy ENTITY dedup (names, not documents): part-name pairs within
    * Levenshtein distance ≤ 2 — the "cold bolt" / "old bolt" catalog-merge
    * case. Staged exactly like production entity resolution at 100 TB:
    *  1. exact collapse first — one partial agg to distinct names with
    *     representative key + cardinality (64 names from 2000 parts here;
    *     the fuzzy stage never sees per-row volume);
    *  2. blocked fuzzy join — block on the final token (the head noun), so
    *     candidate pairs are per-block quadratic only in tiny blocks, never
    *     corpus²;
    *  3. Spark's 3-arg levenshtein(l, r, threshold) inside the block:
    *     banded O(len·k) evaluation that abandons a pair the moment the
    *     distance exceeds the threshold (returns -1) — the per-pair cost is
    *     bounded by the threshold, not the string length².
    * Oracle: DuckDB levenshtein (unbanded) filtered to the same range. */
  def dFuzzyName(spark: SparkSession, dir: String): DataFrame = {
    val names = Tables.table(spark, dir, "part")
      .groupBy(col("p_name"))
      .agg(min(col("p_partkey")).as("rep_key"), count(lit(1)).as("n_parts"))
      .withColumn("blk", element_at(split(col("p_name"), " "), -1))
    val d = levenshtein(col("a.p_name"), col("b.p_name"), 2)
    names.as("a").join(names.as("b"),
        col("a.blk") === col("b.blk") && col("a.p_name") < col("b.p_name"))
      .where(d.between(1, 2))
      .select(col("a.p_name").as("name_a"), col("b.p_name").as("name_b"),
        d.as("dist"),
        col("a.n_parts").as("n_parts_a"), col("b.n_parts").as("n_parts_b"))
      .orderBy("name_a", "name_b")
  }

  val dFuzzyNameSql: String =
    """WITH n AS (
      |  SELECT p_name, min(p_partkey) AS rep_key, COUNT(*) AS n_parts,
      |    (string_split(p_name, ' '))[-1] AS blk
      |  FROM part GROUP BY p_name)
      |SELECT a.p_name AS name_a, b.p_name AS name_b,
      |  CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist,
      |  a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
      |FROM n a JOIN n b ON a.blk = b.blk AND a.p_name < b.p_name
      |WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 2
      |ORDER BY name_a, name_b""".stripMargin

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    * embedding-space near-duplicate removal made tractable by clustering —
    * pairwise cosine is computed ONLY within k-means cells, never across
    * the corpus. A vector is dropped iff some smaller-id vector in its cell
    * has cosine ≥ τ; keep-min-id makes the result deterministic and gives
    * the kept set a provable invariant (no two kept vectors in one cell are
    * ≥ τ — PipelineSpec brute-force checks both directions).
    *
    * 100 TB shape: the cell assignment is the same zero-shuffle argmax scan
    * projection IVF uses (Similarity.argmaxCell); the only shuffle is the
    * equi-join on cell, and the quadratic term is bounded by cell size —
    * kCells is THE dial (SemDeDup uses 50k cells for LAION; cost =
    * Σ|cell|², tuned so cells fit a task). Cells come from driver-trained
    * k-means (not SQL-expressible) → rows-only + spec. */
  val SemDedupTau = 0.4 // synthetic embeddings top out at cosine ~0.5 — τ chosen to exercise drops

  def dSemanticDedup(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.fanout(Tables.table(spark, dir, "embeddings"))
      .select(col("vec_id"), col("embedding"),
        graft.functions.Vec.vnorm(col("embedding")).as("nrm"))
    val cents = Similarity.ivfCells(spark, dir, kCells = 8)
    val assigned = e.withColumn("cell",
      Similarity.argmaxCell(cents)(col("embedding"), col("nrm")))
    // blocked pairwise: same cell only, smaller id on the left
    val near = assigned.as("a").join(assigned.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("b.vec_id").as("vec_id"), col("a.vec_id").as("smaller"),
        round(graft.functions.Vec.vdot(col("a.embedding"), col("b.embedding"))
          / (col("a.nrm") * col("b.nrm")), 6).as("cosine"))
      .where(col("cosine") >= SemDedupTau)
    val dropped = near.groupBy("vec_id")
      .agg(min(col("smaller")).as("dup_of"), max(col("cosine")).as("dup_cos"))
    assigned.join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        col("dup_of").isNull.as("kept"), col("dup_of"), col("dup_cos"))
      .orderBy("vec_id")
  }

  /** Full SQL replay of SemDeDup (r5 — rides the deterministic Lloyd
    * chain the IVF oracles use): re-train cells, re-assign, re-compare
    * within cells at the same rounded-6dp threshold. The keep/drop
    * DECISION — the thing a curation pipeline acts on — is hash-gated,
    * not just row-counted. */
  val dSemanticDedupSql: String = {
    val rounds = 4
    s"""WITH ${Cluster.lloydCtes(k = 8, rounds = rounds)},
       |asn AS (
       |  SELECT e.vec_id,
       |    max(struct_pack(cos := ${Cluster.cosSql("e.embedding", "e.nrm", "c.cv")},
       |                    nc := -c.cell)) AS w
       |  FROM n e CROSS JOIN c$rounds c GROUP BY 1),
       |av AS (
       |  SELECT a.vec_id, CAST(-(a.w.nc) AS INT) AS cell, n.embedding, n.nrm
       |  FROM asn a JOIN n USING (vec_id)),
       |near AS (
       |  SELECT b.vec_id AS vec_id, a.vec_id AS smaller,
       |    round(list_sum([CAST(a.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE)
       |                    for i in generate_series(1, len(a.embedding))])
       |          / (a.nrm * b.nrm), 6) AS cosine
       |  FROM av a JOIN av b ON a.cell = b.cell AND a.vec_id < b.vec_id),
       |dropped AS (
       |  SELECT vec_id, MIN(smaller) AS dup_of, MAX(cosine) AS dup_cos
       |  FROM near WHERE cosine >= $SemDedupTau GROUP BY 1)
       |SELECT av.vec_id, av.cell, (d.dup_of IS NULL) AS kept, d.dup_of, d.dup_cos
       |FROM av LEFT JOIN dropped d USING (vec_id) ORDER BY av.vec_id""".stripMargin
  }

  /** Poly-hash SQL fragment: the portable char fold over `strExpr`
    * (mirrors PolyHash.foldString — HUGEINT arithmetic, fold seeded by a
    * prepended 0). */
  private[graft] def polySql(strExpr: String): String = {
    val (m, b) = (graft.functions.PolyHash.M, graft.functions.PolyHash.B)
    s"""CAST(list_reduce([0::HUGEINT] ||
       |      [CAST(unicode(c)+1 AS HUGEINT) for c in string_split($strExpr, '')],
       |      (acc, x) -> (acc * $b + x) % $m::HUGEINT) AS BIGINT)""".stripMargin
  }

  /** Full SQL replay of MinHash-LSH (r6 — enabled by the portable poly-hash
    * family): shingle strings → poly hashes → 128 affine permutation
    * minimums → band-fold signatures → bucket self-join → exact-jaccard
    * verification. The df cap is vacuous at oracle scale (same convention
    * as dNgramJaccardSql, proven by the filteredShingles spec). */
  val dMinhashLshSql: String = {
    val M = graft.functions.PolyHash.M
    val (b2, phi, psi) = (graft.functions.PolyHash.B2,
      graft.functions.PolyHash.PHI, graft.functions.PolyHash.PSI)
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS word,
       |         generate_subscripts(string_split($normSql, ' '), 1) AS pos
       |  FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id,
       |    word || ' ' || lead(word,1) OVER w || ' ' || lead(word,2) OVER w
       |         || ' ' || lead(word,3) OVER w || ' ' || lead(word,4) OVER w AS shingle
       |  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
       |  QUALIFY lead(word,4) OVER w IS NOT NULL),
       |ph AS (SELECT doc_id, ${polySql("shingle")} AS h FROM sh),
       |mh AS (
       |  SELECT doc_id, t.p AS p,
       |    min((((CAST(2*t.p+1 AS HUGEINT) * $phi) % $M) * CAST(h AS HUGEINT)
       |         + ((CAST(t.p+1 AS HUGEINT) * $psi) % $M)) % $M) AS mv
       |  FROM ph CROSS JOIN generate_series(0, 127) t(p) GROUP BY 1, 2),
       |ml AS (SELECT doc_id, list(mv ORDER BY p) AS ml FROM mh GROUP BY 1),
       |sg AS (
       |  SELECT doc_id, b.b AS band,
       |    CAST(list_reduce([0::HUGEINT, CAST(b.b+1 AS HUGEINT)] ||
       |           [CAST(ml[b.b*4 + r] + 1 AS HUGEINT) for r in generate_series(1, 4)],
       |         (acc, x) -> (acc * $b2 + x) % $M::HUGEINT) AS BIGINT) AS sig
       |  FROM ml CROSS JOIN generate_series(0, 31) b(b)),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM sg x JOIN sg y ON x.band = y.band AND x.sig = y.sig
       |                     AND x.doc_id < y.doc_id),
       |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
       |shr AS (
       |  SELECT c.doc_a, c.doc_b, COUNT(*) AS shared
       |  FROM cand c
       |  JOIN sh a ON a.doc_id = c.doc_a
       |  JOIN sh b ON b.doc_id = c.doc_b AND a.shingle = b.shingle
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |  round(shared*1.0/(sa.n_sh + sb.n_sh - shared), 6) AS jaccard
       |FROM shr JOIN sizes sa ON doc_a = sa.doc_id
       |         JOIN sizes sb ON doc_b = sb.doc_id
       |WHERE round(shared*1.0/(sa.n_sh + sb.n_sh - shared), 6) >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Full SQL replay of SimHash (r6): poly bigram hashes → per-bit ±1 vote
    * sums → signature reconstruction (votes > 0 set the bit; poly hashes
    * are 61-bit so bits 61-63 are structurally 0 — series stops at 60) →
    * 16-bit band blocking → exact hamming verify. */
  val dSimhashSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS word,
       |         generate_subscripts(string_split($normSql, ' '), 1) AS pos
       |  FROM documents),
       |bg AS (
       |  SELECT doc_id, word || ' ' || lead(word,1) OVER w AS bigram
       |  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
       |  QUALIFY lead(word,1) OVER w IS NOT NULL),
       |ph AS (SELECT doc_id, ${polySql("bigram")} AS fh FROM bg),
       |vt AS (
       |  SELECT doc_id, j.j AS j,
       |    SUM(CASE WHEN (fh >> j.j) & 1 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM ph CROSS JOIN generate_series(0, 60) j(j) GROUP BY 1, 2),
       |sim AS (
       |  SELECT doc_id,
       |    CAST(SUM(CASE WHEN v > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS simhash
       |  FROM vt GROUP BY 1),
       |bd AS (
       |  SELECT doc_id, simhash, k.k AS k,
       |    (simhash >> (k.k*16)) & 65535 AS bandval
       |  FROM sim CROSS JOIN generate_series(0, 3) k(k))
       |SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |  CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
       |FROM bd x JOIN bd y ON x.k = y.k AND x.bandval = y.bandval
       |                   AND x.doc_id < y.doc_id
       |WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
       |ORDER BY doc_a, doc_b""".stripMargin

  /** LSH banding sweep — the (b, r) tuning table for d_minhash_lsh: from
    * ONE 128-permutation signature build, band three configurations
    * (r=2/b=64, r=4/b=32, r=8/b=16) and measure, per config, candidate
    * volume and recall against the exact-jaccard truth set. The S-curve
    * trade made MEASURABLE: small r → high recall at high candidate cost,
    * large r → cheap but leaky; this is the table that picks r before a
    * 100 TB dedup run (d_lsh_recall plots one config's curve; this
    * compares configs at fixed permutation budget — rebanding reuses the
    * signatures, so the sweep costs 3 band-joins, not 3 sig builds).
    *
    * Structural guarantee the spec pins: an r=2k band is the concatenation
    * of two r=k bands, so an r=2k band match implies both halves match —
    * candidates(r=8) ⊆ candidates(r=4) ⊆ candidates(r=2), and recall is
    * monotone in 1/r by SET CONTAINMENT, not just in expectation. */
  def dBandSweep(spark: SparkSession, dir: String): DataFrame = {
    val sh = polyShingles(spark, dir).cache()
    val minh = sh.groupBy("doc_id")
      .agg(graft.functions.Poly.minhash(col("h"), 128).as("m")).cache()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val truth = {
      val shared = sh.as("a").join(sh.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("shared"))
      shared
        .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
        .where(round(col("shared").cast("double") /
          (col("sa.n_sh") + col("sb.n_sh") - col("shared")), 6) >= 0.5)
        .select("doc_a", "doc_b").cache()
    }
    val tcount = truth.agg(count(lit(1)).cast("long").as("n_true"))
    Seq(2, 4, 8).map { r =>
      val sigs = minh.select(col("doc_id"),
        posexplode(graft.functions.Poly.bandSigs(col("m"), r))
          .as(Seq("band", "sig")))
      val cand = sigs.as("x").join(sigs.as("y"),
          col("x.band") === col("y.band") && col("x.sig") === col("y.sig")
            && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct().cache()
      val hits = cand.join(truth, Seq("doc_a", "doc_b"), "left_semi")
      cand.agg(count(lit(1)).cast("long").as("n_candidates"))
        .crossJoin(broadcast(hits.agg(count(lit(1)).cast("long").as("n_hits"))))
        .crossJoin(broadcast(tcount))
        .select(lit(r).as("band_rows"), lit(128 / r).as("n_bands"),
          col("n_candidates"), col("n_hits"), col("n_true"),
          expr("(1000000 * n_hits) div n_true").as("recall_ppm"))
    }.reduce(_ union _).orderBy("band_rows")
  }

  val dBandSweepSql: String = {
    val M = graft.functions.PolyHash.M
    val (b2, phi, psi) = (graft.functions.PolyHash.B2,
      graft.functions.PolyHash.PHI, graft.functions.PolyHash.PSI)
    def bandCtes(r: Int): String = {
      val b = 128 / r
      s"""sg$r AS (
         |  SELECT doc_id, b.b AS band,
         |    CAST(list_reduce([0::HUGEINT, CAST(b.b+1 AS HUGEINT)] ||
         |           [CAST(ml[b.b*$r + j] + 1 AS HUGEINT) for j in generate_series(1, $r)],
         |         (acc, x) -> (acc * $b2 + x) % $M::HUGEINT) AS BIGINT) AS sig
         |  FROM ml CROSS JOIN generate_series(0, ${b - 1}) b(b)),
         |cand$r AS MATERIALIZED (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM sg$r x JOIN sg$r y ON x.band = y.band AND x.sig = y.sig
         |                         AND x.doc_id < y.doc_id)""".stripMargin
    }
    def row(r: Int): String =
      s"""SELECT $r AS band_rows, ${128 / r} AS n_bands,
         |  (SELECT COUNT(*) FROM cand$r) AS n_candidates,
         |  (SELECT COUNT(*) FROM cand$r c JOIN truth t
         |     ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b) AS n_hits,
         |  (SELECT COUNT(*) FROM truth) AS n_true""".stripMargin
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS word,
       |         generate_subscripts(string_split($normSql, ' '), 1) AS pos
       |  FROM documents),
       |sh AS MATERIALIZED (
       |  SELECT DISTINCT doc_id,
       |    word || ' ' || lead(word,1) OVER w || ' ' || lead(word,2) OVER w
       |         || ' ' || lead(word,3) OVER w || ' ' || lead(word,4) OVER w AS shingle
       |  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
       |  QUALIFY lead(word,4) OVER w IS NOT NULL),
       |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
       |truth AS MATERIALIZED (
       |  SELECT p.doc_a, p.doc_b FROM (
       |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
       |    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |    GROUP BY 1, 2) p
       |  JOIN sizes sa ON p.doc_a = sa.doc_id
       |  JOIN sizes sb ON p.doc_b = sb.doc_id
       |  WHERE round(shared*1.0/(sa.n_sh + sb.n_sh - shared), 6) >= 0.5),
       |ph AS (SELECT doc_id, ${polySql("shingle")} AS h FROM sh),
       |mh AS (
       |  SELECT doc_id, t.p AS p,
       |    min((((CAST(2*t.p+1 AS HUGEINT) * $phi) % $M) * CAST(h AS HUGEINT)
       |         + ((CAST(t.p+1 AS HUGEINT) * $psi) % $M)) % $M) AS mv
       |  FROM ph CROSS JOIN generate_series(0, 127) t(p) GROUP BY 1, 2),
       |ml AS MATERIALIZED (SELECT doc_id, list(mv ORDER BY p) AS ml FROM mh GROUP BY 1),
       |${bandCtes(2)},
       |${bandCtes(4)},
       |${bandCtes(8)}
       |SELECT CAST(band_rows AS INT) AS band_rows, CAST(n_bands AS INT) AS n_bands,
       |  CAST(n_candidates AS BIGINT) AS n_candidates,
       |  CAST(n_hits AS BIGINT) AS n_hits, CAST(n_true AS BIGINT) AS n_true,
       |  (1000000 * CAST(n_hits AS BIGINT)) // CAST(n_true AS BIGINT) AS recall_ppm
       |FROM (${row(2)}
       |UNION ALL
       |${row(4)}
       |UNION ALL
       |${row(8)})
       |ORDER BY band_rows""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d_band_sweep" -> (dBandSweep _),
    "d_semantic_dedup" -> (dSemanticDedup _),
    "d_fuzzy_name" -> (dFuzzyName _),
    "d_substring_span" -> (dSubstringSpan _),
    "d_substring_remove" -> (dSubstringRemove _),
    "d_substring_screen" -> (dSubstringScreen _),
    "d_dup_clusters" -> ((s: SparkSession, d: String) => dupClustersDistributed(s, d)),
    "d_exact" -> (dExact _),
    "d_ngram_jaccard" -> (dNgramJaccard _),
    "d_minhash_lsh" -> (dMinhashLsh _),
    "d_simhash" -> (dSimhash _),
    "d_embed_neardup" -> (dEmbedNeardup _))

  val oracles: Map[String, String] = Map(
    "d_band_sweep" -> dBandSweepSql,
    "d_semantic_dedup" -> dSemanticDedupSql,
    "d_fuzzy_name" -> dFuzzyNameSql,
    "d_substring_span" -> dSubstringSpanSql,
    "d_substring_remove" -> dSubstringRemoveSql,
    "d_substring_screen" -> dSubstringScreenSql,
    "d_dup_clusters" -> dDupClustersSql,
    "d_exact" -> dExactSql,
    "d_ngram_jaccard" -> dNgramJaccardSql,
    "d_minhash_lsh" -> dMinhashLshSql,
    "d_simhash" -> dSimhashSql,
    "d_embed_neardup" -> dEmbedNeardupSql)
}
