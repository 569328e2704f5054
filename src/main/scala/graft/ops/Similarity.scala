package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.5 Similarity search over `embeddings` (Array[Float], 64-dim).
  *
  * Three tiers, one contract (query vec → top-k neighbors by cosine):
  *  - sCosineTopk: exact brute force — the baseline and the oracle. Bounded:
  *    cost = |queries| × |corpus|, so the query batch must be capped; at
  *    100 TB this is the re-ranking stage, never the candidate generator.
  *  - sLshAnn: random-hyperplane LSH — corpus hashed once (linear), queries
  *    probe their bucket (+ multiprobe neighbors); candidates ≪ corpus.
  *  - sIvfTopk: IVF-style coarse quantization — corpus assigned to centroid
  *    cells once, queries probe nprobe nearest cells.
  *
  * All dot products are deterministic left folds (`aggregate` HOF) in double
  * precision — codegen'd, no UDFs.
  */
object Similarity {

  /** dot(a,b): native codegen expression (graft.functions.FloatVecDot) —
    * same strict left-fold semantics as the `aggregate(zip_with(...))` HOF
    * formulation (so DuckDB oracles still match bit-for-bit) at ~10× less
    * per-row cost. */
  private def dot(a: Column, b: Column): Column = graft.functions.Vec.vdot(a, b)

  private def norm2(a: Column): Column = graft.functions.Vec.vnorm(a)

  /** Query subset: every 20th vector, CAPPED at a fixed 1000-query panel
    * (`vec_id < 20000` — VERDICT r12 #3). The cap makes every exact-scored
    * arm panel(const) × corpus — LINEAR in corpus like any scan — instead
    * of the 0.05·n² a proportional panel grows into at 100×. Vacuous at
    * test scale (vec_id ≤ 1999), so every hash gate is unchanged; the
    * oracle SQL carries the identical bound. Same cap applied at every
    * `% 100` walk panel (< 100000) in Similarity2/Similarity4. */
  private def queriesOf(e: DataFrame): DataFrame =
    e.where(col("vec_id") % 20 === 0 && col("vec_id") < 20000)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))

  private def withNorm(spark: SparkSession, dir: String): DataFrame =
    Tables.fanout(Tables.table(spark, dir, "embeddings"))
      .select(col("vec_id"), col("embedding"), norm2(col("embedding")).as("nrm"))

  /** Exact cosine top-5 per query (self excluded): crossJoin + window top-k.
    * Ranked on the ROUNDED cosine (6 dp) + candidate id so the ordering is
    * engine-portable (unrounded last-ulp differences can't flip ranks). */
  def sCosineTopk(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(spark, dir)
    val q = queriesOf(e)
    val scored = q.crossJoin(e)
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")), 6).as("cosine"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 5)
      .select(col("q_id"), col("rnk"), col("vec_id"), col("cosine"))
      .orderBy("q_id", "rnk")
  }

  val sCosineTopkSql: String =
    """WITH n AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_sum([CAST(embedding[i] AS DOUBLE)*CAST(embedding[i] AS DOUBLE)
      |                   for i in generate_series(1, len(embedding))])) AS nrm
      |  FROM embeddings),
      |scored AS (
      |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
      |    round(list_sum([CAST(q.embedding[i] AS DOUBLE)*CAST(c.embedding[i] AS DOUBLE)
      |                    for i in generate_series(1, len(q.embedding))]) / (q.nrm*c.nrm), 6) AS cosine
      |  FROM n q JOIN n c ON c.vec_id <> q.vec_id
      |  WHERE q.vec_id % 20 = 0 AND q.vec_id < 20000),
      |ranked AS (
      |  SELECT q_id, vec_id, cosine,
      |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rnk
      |  FROM scored)
      |SELECT q_id, CAST(rnk AS INTEGER) AS rnk, vec_id, cosine
      |FROM ranked WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin

  /** Random-hyperplane LSH ANN, multi-table (L=12 tables × k=6 planes — the
    * same band structure as MinHash-LSH): candidate iff query and vector
    * share a full 6-bit signature in ANY table. Hyperplanes are
    * deterministic seeded Gaussians, so the index is reproducible with zero
    * stored model.
    *
    * Recall math (cos θ neighbors, per-plane agree p = 1−θ/π):
    * recall = 1−(1−p^k)^L — at cos 0.8, p≈0.80 → ~0.63 with L=12; at cos
    * 0.5 → ~0.5; random pairs (cos≈0) hit ~17% of the corpus as candidates.
    * k and L are THE scale dials: at 100 TB raise k (smaller buckets) and L
    * (recall back up); index build stays one linear pass, probe cost
    * |corpus|·(1/2)^k·L.
    * Approximate → no SQL oracle; SimilaritySpec asserts recall@5 ≥ 0.35 vs
    * sCosineTopk and candidate-set ≤ 40% of corpus.
    */
  /** Deterministic Gaussian hyperplanes (seeded PRNG): plane (t, j) is
    * Random(1000·t + j) Gaussians — a pure function of the indices, no
    * data, which is what lets the LSH oracles embed them as SQL literals
    * (r6). Shared by [[sLshAnn]] and [[sMultiprobe]]. */
  private[ops] def lshPlanes(nTables: Int, k: Int, dims: Int): Seq[Seq[Float]] =
    (for (t <- 0 until nTables; j <- 0 until k) yield {
      val rng = new scala.util.Random(1000L * t + j)
      Seq.fill(dims)(rng.nextGaussian().toFloat)
    })

  def sLshAnn(spark: SparkSession, dir: String): DataFrame = {
    val k = 6 // planes per table
    val nTables = 12
    val dims = 64
    val e = withNorm(spark, dir)

    // All 72 projections are computed by ONE HyperplaneSigs expression (a
    // single codegen loop over the plane matrix) — same double-precision
    // dots bit-for-bit as 72 separate literal-plane vdots, without the
    // 72-expression projection that cost seconds of Janino compile per
    // cold plan.
    val planes: Seq[Seq[Float]] = lshPlanes(nTables, k, dims)

    // Cache ONLY (vec_id, t, sig): the 72 projections are the expensive
    // part; carrying embedding+nrm through the 12-way explode would pin
    // 12 duplicated copies of the corpus in storage memory. Vectors are
    // joined back from the (cheap, pushdown-pruned) base scan for scoring.
    val sigs = e.select(
      col("vec_id"),
      posexplode(graft.functions.Sketch.hyperplaneSigs(col("embedding"), planes, k))
        .as(Seq("t", "sig")))
      .cache()
    val q = sigs.where(col("vec_id") % 20 === 0 && col("vec_id") < 20000)
      .select(col("vec_id").as("q_id"), col("t"), col("sig"))
    val cand = q.join(sigs, Seq("t", "sig"))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"))
      .dropDuplicates("q_id", "vec_id")
    val qv = e.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      col("nrm").as("q_nrm"))
    val scored = cand
      .join(qv, Seq("q_id"))
      .join(e, Seq("vec_id"))
      .select(col("q_id"), col("vec_id"),
        round(dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")), 6).as("cosine"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 5)
      .select(col("q_id"), col("rnk"), col("vec_id"), col("cosine"))
      .orderBy("q_id", "rnk")
  }

  /** IVF ANN with k-means-TRAINED cells (k=16, Lloyd 8 rounds over the
    * shared 256-vector driver-side sample — the same trainer the PQ
    * codebooks use, with the whole embedding as the single "subvector"):
    * corpus assigned to its nearest centroid, queries probe the nprobe
    * nearest cells then exact-rerank. Training cost is bounded by the
    * sample regardless of corpus size.
    *
    * Assignment is a genuine zero-shuffle map pass: the k centroid vectors
    * (tiny) are embedded as array literals, so each corpus row computes its
    * argmax cell inside the scan projection. No crossJoin, no window, no
    * embedding-carrying shuffle anywhere in the assignment. */
  def sIvfTopk(spark: SparkSession, dir: String): DataFrame =
    ivfTopk(spark, dir, nprobe = 3)

  /** nprobe-parameterized IVF — PipelineSpec sweeps nprobe to assert the
    * recall/cost curve behaves (more probed cells ⇒ recall non-decreasing,
    * reaching 1.0 when every cell is probed). */
  /** IVF cells from the DISTRIBUTED trainer ([[Cluster.train]], r5 — VERDICT
    * r4 task 5): full Lloyd over the whole corpus with the data staying
    * distributed (assign = codegen argmax scan projection, update = map-side
    * combined (cell,dim) average); only the k×d model matrix reaches the
    * driver per round. This replaces the 256-vector driver-side sample the
    * cells previously trained on — at 100 TB the corpus participates in its
    * own index. The PQ CODEBOOKS remain sample-trained (codebook quality is
    * statistical, sample-sufficient; cell assignment is what must see the
    * full distribution). Shared by [[ivfTopk]], [[ivfPqTopk]], [[sKnnJoin]]. */
  private[graft] def ivfCells(spark: SparkSession, dir: String,
                       kCells: Int): Array[(Int, Array[Float])] =
    Cluster.train(spark, dir, kCells, rounds = 4).zipWithIndex
      .map { case (c, i) => i -> c }.toArray

  /** per-row cell similarities as literal-centroid vdots (codegen'd) */
  private[graft] def cellSims(cents: Array[(Int, Array[Float])])(
      emb: Column, nrm: Column): Seq[(Int, Column)] =
    cents.toSeq.map { case (cell, cvec) =>
      val cn = math.sqrt(cvec.map(x => x.toDouble * x.toDouble).sum)
      cell -> (dot(emb, typedlit(cvec.toSeq)) / (nrm * lit(cn)))
    }

  /** argmax cell: sims packed into an array (cell order), argmax = 1-based
    * position of the max — first occurrence, so ties break to the lowest
    * cell deterministically */
  private[graft] def argmaxCell(cents: Array[(Int, Array[Float])])(
      emb: Column, nrm: Column): Column = {
    val simArr = array(cellSims(cents)(emb, nrm).map(_._2): _*)
    element_at(typedlit(cents.map(_._1).toSeq),
      array_position(simArr, array_max(simArr)).cast("int"))
  }

  /** queries probe their nprobe nearest cells. `qPred` selects the query
    * rows — the every-20th external-batch stand-in for the ANN ops, ALL
    * rows for [[sKnnJoin]]. The explode+window is |queries|×kCells rows,
    * hash-partitioned on q_id — linear either way. */
  private[graft] def probeCells(e: DataFrame, cents: Array[(Int, Array[Float])],
                         nprobe: Int,
                         qPred: Column = col("vec_id") % 20 === 0 && col("vec_id") < 20000): DataFrame =
    e.where(qPred)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"),
        explode(array(cellSims(cents)(col("embedding"), col("nrm")).map { case (cell, sim) =>
          struct(lit(cell).as("cell"), sim.as("sim"))
        }: _*)).as("cs"))
      .select(col("q_id"), col("q_emb"), col("q_nrm"),
        col("cs.cell").as("cell"), col("cs.sim").as("sim"))
      .withColumn("r", row_number().over(
        Window.partitionBy("q_id").orderBy(col("sim").desc, col("cell"))))
      .where(col("r") <= nprobe)
      .select(col("q_id"), col("q_emb"), col("q_nrm"), col("cell"))

  private[graft] def ivfTopk(spark: SparkSession, dir: String, nprobe: Int): DataFrame = {
    val e = withNorm(spark, dir)
    val cents = ivfCells(spark, dir, kCells = 8)
    val assigned = e.withColumn("cell", argmaxCell(cents)(col("embedding"), col("nrm")))
    val qProbes = probeCells(e, cents, nprobe)

    val scored = qProbes.join(assigned, Seq("cell"))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")), 6).as("cosine"))
      // r13: pin the top-k window's exchange explicitly — the window needs
      // a q_id exchange anyway, but the candidate-score bytes are small
      // enough that AQE's byte-proportional coalescing folded the final
      // sort+rank to ONE task (measured 3 s single-task while 31 cores
      // idle). Explicit width forbids the under-coalescing; no extra
      // shuffle is added.
      .repartition(spark.sparkContext.defaultParallelism, col("q_id"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 5)
      .select(col("q_id"), col("rnk"), col("vec_id"), col("cosine"))
      .orderBy("q_id", "rnk")
  }

  /** Radius search — the other standard ANN contract: ALL neighbors with
    * cosine ≥ 0.25 per query (vs top-k's fixed count). Same bounded
    * brute-force shape as sCosineTopk; at 100 TB the LSH/IVF candidate
    * generators feed this exact scoring + threshold filter. */
  def sRadius(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(spark, dir)
    val q = queriesOf(e)
    q.crossJoin(e)
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")), 6).as("cosine"))
      .where(col("cosine") >= 0.25)
      .orderBy("q_id", "vec_id")
  }

  val sRadiusSql: String =
    """WITH n AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_sum([CAST(embedding[i] AS DOUBLE)*CAST(embedding[i] AS DOUBLE)
      |                   for i in generate_series(1, len(embedding))])) AS nrm
      |  FROM embeddings)
      |SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
      |  round(list_sum([CAST(q.embedding[i] AS DOUBLE)*CAST(c.embedding[i] AS DOUBLE)
      |                  for i in generate_series(1, len(q.embedding))]) / (q.nrm*c.nrm), 6) AS cosine
      |FROM n q JOIN n c ON c.vec_id <> q.vec_id
      |WHERE q.vec_id % 20 = 0 AND q.vec_id < 20000
      |  AND round(list_sum([CAST(q.embedding[i] AS DOUBLE)*CAST(c.embedding[i] AS DOUBLE)
      |                      for i in generate_series(1, len(q.embedding))]) / (q.nrm*c.nrm), 6) >= 0.25
      |ORDER BY q_id, vec_id""".stripMargin

  /** Hybrid retrieval (keyword ⊕ vector), the RAG-pipeline flagship: for
    * the query terms {spark, table}, score every document by
    * 0.5·(tfidf/max_tfidf) + 0.5·cosine(doc_emb, query_emb), where
    * query_emb is the centroid of the top-20 keyword hits (pseudo-relevance
    * feedback — no query vector needed). Four stages, all in-plan:
    * keyword partial-agg → top-20 (TakeOrderedAndProject) → centroid (one
    * agg over 20·dims rows, decimal-exact per §4 so both engines see
    * identical doubles) → full-corpus fused scoring (broadcast centroid).
    * Every ranking uses ROUNDED scores + doc_id tie-breaks (§4 rule). */
  def sHybridSearch(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.table(spark, dir, "documents")
    val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    val toks = Tables.fanout(docs)
      .select(col("doc_id"), explode(split(norm, " ")).as("word"))
      .where(col("word").isin("spark", "table"))
    val tf = toks.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("word").agg(count(lit(1)).as("df")) // one tokenize pass
    val n = docs.agg(count(lit(1)).as("n_docs"))
    // kw feeds THREE consumers (max, top-20 centroid seed, final scoring) —
    // cache the tiny per-doc score table instead of re-tokenizing per use
    val kw = tf.join(broadcast(df), Seq("word")).crossJoin(broadcast(n))
      .groupBy("doc_id")
      .agg(round(sum(col("tf") * log(col("n_docs").cast("double") / col("df"))), 6).as("kw"))
      .cache()
    val top20 = kw.orderBy(col("kw").desc, col("doc_id")).limit(20)
    // query centroid: decimal-exact per-dim mean over the top-20 embeddings
    // (a parallel double sum would be order-nondeterministic, §4 rule)
    val qemb = Tables.table(spark, dir, "embeddings")
      .join(top20.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("dim")
      .agg((Tables.dsum(col("v").cast("double")) / count(lit(1))).as("c"))
      .groupBy()
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("c")))),
        x => x.getField("c")).as("qe"))
      .select(col("qe"),
        sqrt(expr("aggregate(qe, 0d, (a, x) -> a + x * x)")).as("qn"))
    val maxKw = kw.agg(max(col("kw")).as("max_kw"))
    val e = Tables.table(spark, dir, "embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding"),
        graft.functions.Vec.vnorm(col("embedding")).as("nrm"))
    val scored = e
      .join(kw, Seq("doc_id"), "left")
      .crossJoin(broadcast(maxKw)).crossJoin(broadcast(qemb))
      .select(col("doc_id"),
        round(
          coalesce(col("kw"), lit(0d)) / col("max_kw") * 0.5
            // codegen float×double dot (FloatVecDot): same strict
            // left-to-right fold as the HOF form, but a tight compiled loop
            // — the full-corpus hot path must never be interpreted
            + graft.functions.Vec.vdot(col("embedding"), col("qe"))
              / (col("nrm") * col("qn")) * 0.5, 6).as("hybrid"))
    scored.orderBy(col("hybrid").desc, col("doc_id")).limit(20)
      .select(col("doc_id"), col("hybrid"))
  }

  val sHybridSearchSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS word
      |  FROM documents),
      |qt AS (SELECT doc_id, word FROM toks WHERE word IN ('spark', 'table')),
      |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM qt GROUP BY 1, 2),
      |df AS (SELECT word, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, word FROM qt) GROUP BY 1),
      |n AS (SELECT COUNT(*) AS n_docs FROM documents),
      |kw AS (
      |  SELECT doc_id, round(SUM(tf * ln(CAST(n_docs AS DOUBLE) / df)), 6) AS kw
      |  FROM tf JOIN df ON tf.word = df.word CROSS JOIN n GROUP BY doc_id),
      |top20 AS (SELECT doc_id FROM kw ORDER BY kw DESC, doc_id LIMIT 20),
      |qdims AS (
      |  SELECT dim, CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS c
      |  FROM (SELECT unnest(e.embedding) AS v,
      |               generate_subscripts(e.embedding, 1) AS dim
      |        FROM embeddings e JOIN top20 t ON e.vec_id = t.doc_id)
      |  GROUP BY dim),
      |q AS (
      |  SELECT list(c ORDER BY dim) AS qe,
      |    sqrt(list_sum([x * x for x in list(c ORDER BY dim)])) AS qn
      |  FROM qdims),
      |mk AS (SELECT max(kw) AS max_kw FROM kw),
      |scored AS (
      |  SELECT e.vec_id AS doc_id,
      |    round(COALESCE(kw.kw, 0) / mk.max_kw * 0.5
      |      + list_sum([CAST(e.embedding[i] AS DOUBLE) * q.qe[i]
      |                  for i in generate_series(1, len(e.embedding))])
      |        / (sqrt(list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)
      |                          for i in generate_series(1, len(e.embedding))])) * q.qn) * 0.5,
      |      6) AS hybrid
      |  FROM embeddings e
      |  LEFT JOIN kw ON e.vec_id = kw.doc_id
      |  CROSS JOIN mk CROSS JOIN q)
      |SELECT doc_id, hybrid FROM scored ORDER BY hybrid DESC, doc_id LIMIT 20""".stripMargin

  /** Product-quantization ANN (the fourth tier: brute / LSH / IVF / PQ):
    * corpus vectors compressed to m=8 4-bit-ish codes (16 centroids per
    * 8-dim subvector), queries score the WHOLE corpus by asymmetric
    * distance (exact query × quantized corpus — one table lookup + 8 mults
    * per subvector instead of 64), then the top-50 shortlist is exactly
    * re-ranked. At 100 TB the win is memory-bandwidth: 8 bytes/vector
    * scanned instead of 256 — the codes column is the index, vectors are
    * only touched for the shortlist.
    *
    * r6: the codebook trains DISTRIBUTED over the full corpus
    * ([[PqTrain.train]] — per-subspace decimal-mean Lloyd, VERDICT r5 task
    * 2), replacing the 256-vector driver-side sample. Training is
    * engine-portable arithmetic, so the op is hash-gated end-to-end
    * ([[sPqTopkSql]] re-trains, re-encodes and re-scores in DuckDB);
    * SimilaritySpec additionally bounds recall vs exact. */
  def sPqTopk(spark: SparkSession, dir: String): DataFrame = {
    val m = 8
    val kCent = 16
    val e = withNorm(spark, dir)
    val codebook: Seq[Seq[Seq[Float]]] = PqTrain.train(e, 64, m, kCent, rounds = 4, space = s"$dir:raw")
    val coded = e.select(col("vec_id"),
      graft.functions.Sketch.pqEncode(col("embedding"), codebook).as("codes"))
    val q = queriesOf(e)
    // ADC over the full corpus: cheap scan of (vec_id, 8 codes)
    val shortlist = q.crossJoin(coded)
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("q_emb"), col("q_nrm"), col("vec_id"),
        graft.functions.Sketch.pqAdc(col("q_emb"), col("codes"), codebook).as("adc"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("adc").desc, col("vec_id"))))
      .where(col("rnk") <= 50)
    // exact re-rank of the shortlist
    val scored = shortlist
      .join(e, Seq("vec_id"))
      .select(col("q_id"), col("vec_id"),
        round(dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")), 6).as("cosine"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 5)
      .select(col("q_id"), col("rnk"), col("vec_id"), col("cosine"))
      .orderBy("q_id", "rnk")
  }

  /** IVF×PQ composed ANN (the 100 TB endgame tier, Jégou et al. TPAMI'11
    * IVFADC): corpus rows carry (cell, 8-byte PQ code); queries probe their
    * nprobe nearest IVF cells and ADC-score ONLY the rows in those cells —
    * the full-corpus code scan [[sPqTopk]] pays becomes a bucketed scan of
    * ~nprobe/kCells of the corpus. Memory per scanned row is still 8 bytes
    * (codes), and candidates are exactly re-ranked in original space. At
    * 100 TB this is the standard shape: coarse quantizer prunes the corpus,
    * product quantizer makes the surviving scan memory-bandwidth-bound,
    * exact re-rank restores precision on the shortlist.
    * r6: hash-gated (dist-trained cells AND codebook, composed oracle);
    * PipelineSpec bounds recall by the measured blocking ceiling. */
  def sIvfPqTopk(spark: SparkSession, dir: String): DataFrame =
    ivfPqTopk(spark, dir, nprobe = 6)

  private[graft] def ivfPqTopk(spark: SparkSession, dir: String, nprobe: Int): DataFrame = {
    val m = 8
    val kCent = 16
    val e = withNorm(spark, dir)
    val cents = ivfCells(spark, dir, kCells = 16)
    val codebook = PqTrain.train(e, 64, m, kCent, rounds = 4, space = s"$dir:raw")

    // one linear index-build pass: every corpus row gets its coarse cell
    // (argmax over literal centroids, in the scan projection) + PQ codes
    val coded = e.select(col("vec_id"),
      argmaxCell(cents)(col("embedding"), col("nrm")).as("cell"),
      graft.functions.Sketch.pqEncode(col("embedding"), codebook).as("codes"))

    // ADC only inside the probed cells (the equi-join on cell IS the prune)
    val shortlist = probeCells(e, cents, nprobe)
      .join(coded, Seq("cell"))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("q_emb"), col("q_nrm"), col("vec_id"),
        graft.functions.Sketch.pqAdc(col("q_emb"), col("codes"), codebook).as("adc"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("adc").desc, col("vec_id"))))
      .where(col("rnk") <= 50)
    // exact re-rank of the shortlist in original space
    val scored = shortlist
      .join(e, Seq("vec_id"))
      .select(col("q_id"), col("vec_id"),
        round(dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")), 6).as("cosine"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 5)
      .select(col("q_id"), col("rnk"), col("vec_id"), col("cosine"))
      .orderBy("q_id", "rnk")
  }

  /** IVFADC with RESIDUAL encoding (Jégou et al. TPAMI'11 §IV-A, the form
    * the paper actually ships — VERDICT r10 next #2): PQ-encode the
    * residual x − centroid(cell), not the raw vector. Same 8 bytes per
    * row; the residual's variance is what remains AFTER the coarse
    * quantizer explains the cell, so the codebook spends its 16 centroids
    * per subspace on a much tighter distribution — measurably better ADC
    * shortlists at equal bytes (Round11Spec pins residual recall@5 ≥ raw
    * on identical candidates; the candidate sets are the same cells, so
    * the delta isolates pure encoding quality).
    *
    * Score decomposition (inner product): dot(q, c_cell + pq(r)) =
    * dot(q, c_cell) + dot(q, pq(r)) — the centroid term is a broadcast
    * 16-row literal lookup, the residual term the same flat ADC fold; the
    * oracle mirrors both folds in order. The residual itself is ONE float
    * subtraction per dim (exactly rounded, mirrored as CAST(… AS REAL)),
    * so the whole chain — Lloyd cells, residual codebook training,
    * encoding, ADC, exact re-rank — stays a deterministic function of the
    * data, fully hash-gated. */
  def sIvfPqResidual(spark: SparkSession, dir: String): DataFrame =
    ivfPqResidualTopk(spark, dir, nprobe = 6)

  private[graft] def ivfPqResidualTopk(spark: SparkSession, dir: String,
                                       nprobe: Int): DataFrame = {
    val m = 8
    val kCent = 16
    val e = withNorm(spark, dir)
    val cents = ivfCells(spark, dir, kCells = 16)
    val centLit = typedlit(cents.sortBy(_._1).map(_._2.toSeq).toSeq)
    val assigned = e.withColumn("cell",
      argmaxCell(cents)(col("embedding"), col("nrm")))
    // residual = x − centroid(cell): float arithmetic, exactly rounded once
    val resids = assigned.select(col("vec_id"), col("cell"),
      zip_with(col("embedding"), element_at(centLit, col("cell") + 1),
        (x, c) => x - c).as("embedding"))
      .cache() // consumed by training rounds + the encode pass
    val codebook = PqTrain.train(resids, 64, m, kCent, rounds = 4,
      space = s"$dir:residual")
    val coded = resids.select(col("vec_id"), col("cell"),
      graft.functions.Sketch.pqEncode(col("embedding"), codebook).as("codes"))
    // ADC inside probed cells; score = centroid term + residual ADC fold
    val shortlist = probeCells(e, cents, nprobe)
      .join(coded, Seq("cell"))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("q_emb"), col("q_nrm"), col("vec_id"),
        (dot(col("q_emb"), element_at(centLit, col("cell") + 1))
          + graft.functions.Sketch.pqAdc(col("q_emb"), col("codes"), codebook))
          .as("adc"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("adc").desc, col("vec_id"))))
      .where(col("rnk") <= 50)
    val scored = shortlist
      .join(e, Seq("vec_id"))
      .select(col("q_id"), col("vec_id"),
        round(dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")), 6).as("cosine"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 5)
      .select(col("q_id"), col("rnk"), col("vec_id"), col("cosine"))
      .orderBy("q_id", "rnk")
  }

  /** The candidate mass ivfPqTopk actually ADC-scores (rows reaching the
    * ADC expression) — PipelineSpec uses this to prove the IVF prune is
    * real (< 1/2 of |queries|×|corpus| at nprobe=4, kCells=8). */
  private[graft] def ivfPqScoredRows(spark: SparkSession, dir: String, nprobe: Int): Long = {
    val e = withNorm(spark, dir)
    val cents = ivfCells(spark, dir, kCells = 16)
    val coded = e.select(col("vec_id"),
      argmaxCell(cents)(col("embedding"), col("nrm")).as("cell"))
    probeCells(e, cents, nprobe).join(coded, Seq("cell"))
      .where(col("vec_id") =!= col("q_id")).count()
  }

  /** The (q_id, vec_id) pairs the IVF-PQ candidate generator can reach —
    * PipelineSpec measures the blocking recall ceiling from this set. */
  private[graft] def ivfPqCandidates(spark: SparkSession, dir: String,
                                     nprobe: Int): Set[(Long, Long)] = {
    val e = withNorm(spark, dir)
    val cents = ivfCells(spark, dir, kCells = 16)
    val coded = e.select(col("vec_id"),
      argmaxCell(cents)(col("embedding"), col("nrm")).as("cell"))
    probeCells(e, cents, nprobe).join(coded, Seq("cell"))
      .where(col("vec_id") =!= col("q_id"))
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  /** Multiprobe LSH — the round-3 refinement of [[sLshAnn]]: HALF the hash
    * tables (L=6 vs 12), with each query additionally probing the k buckets
    * at Hamming distance 1 from its signature (flip one of the k sig bits).
    * Near-miss neighbors concentrate in distance-1 buckets (they disagreed
    * with the query on exactly one close-to-zero projection), so multiprobe
    * recovers most of the recall the dropped tables paid for while HALVING
    * the index build cost and memory — the standard quality/cost dial at
    * 100 TB, where index size is the binding constraint (Lv et al., VLDB'07
    * multi-probe LSH). Corpus side is untouched (still one sig per table);
    * only the tiny query side explodes ×(k+1). Probe cost:
    * |corpus|·(1/2)^k·L·(k+1) candidate mass — same order as sLshAnn's
    * 2L tables, but with L-table storage. PipelineSpec (measured at
    * sf0.001): recall@5 0.79 vs the 2×-bigger single-probe index's 0.41 —
    * distance-1 probes beat extra tables at equal candidate budget. */
  def sMultiprobe(spark: SparkSession, dir: String): DataFrame = {
    val k = 6
    val nTables = 6 // half of sLshAnn's 12
    val dims = 64
    val e = withNorm(spark, dir)
    val planes: Seq[Seq[Float]] = lshPlanes(nTables, k, dims)

    val sigs = e.select(
      col("vec_id"),
      posexplode(graft.functions.Sketch.hyperplaneSigs(col("embedding"), planes, k))
        .as(Seq("t", "sig")))
      .cache()
    // query probes: exact bucket + the k single-bit-flip buckets
    val probeSet = array((col("sig") +:
      (0 until k).map(j => col("sig").bitwiseXOR(lit(1 << j)))): _*)
    val q = sigs.where(col("vec_id") % 20 === 0 && col("vec_id") < 20000)
      .select(col("vec_id").as("q_id"), col("t"), explode(probeSet).as("sig"))
    val cand = q.join(sigs, Seq("t", "sig"))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"))
      .dropDuplicates("q_id", "vec_id")
    val qv = e.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      col("nrm").as("q_nrm"))
    val scored = cand
      .join(qv, Seq("q_id"))
      .join(e, Seq("vec_id"))
      .select(col("q_id"), col("vec_id"),
        round(dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")), 6).as("cosine"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 5)
      .select(col("q_id"), col("rnk"), col("vec_id"), col("cosine"))
      .orderBy("q_id", "rnk")
  }

  /** OPQ-style rotated product quantization (5th tier): a deterministic
    * orthonormal rotation R (seeded Gaussian + modified Gram-Schmidt,
    * trained driver-side like the codebooks) is applied before PQ — train,
    * encode, and ADC all run in the rotated space, spreading variance
    * across subvectors so the per-subvector quantizer wastes less of its
    * budget (Ge et al., CVPR'13 optimized product quantization; full OPQ
    * alternates R and codebook updates — the rotation plumbing and cost
    * model here are identical). Rotation = one [[graft.functions.MatVecMul]]
    * codegen loop in the scan projection (rows×dims² multiplies, zero
    * shuffles); the exact re-rank uses ORIGINAL vectors (rotation is
    * orthonormal, so true cosines are unchanged — only the quantizer sees
    * rotated space). r6: hash-gated — rotated-space distributed training,
    * rotation-matrix literals in the oracle; PipelineSpec bounds recall
    * alongside plain PQ. */
  /** Deterministic orthonormal rotation: seeded Gaussian matrix, modified
    * Gram-Schmidt in double precision. Driver-side, dims² doubles — tiny.
    * Pure function of the seed (java.util.Random's nextGaussian algorithm
    * is specified), so the OPQ oracle can embed it as SQL literals. */
  private[ops] lazy val opqRotation: Seq[Seq[Double]] = {
    val dims = 64
    val rng = new scala.util.Random(20260812L)
    val g = Array.fill(dims, dims)(rng.nextGaussian())
    for (i <- 0 until dims) {
      for (p <- 0 until i) {
        var d = 0.0; var j = 0
        while (j < dims) { d += g(i)(j) * g(p)(j); j += 1 }
        var j2 = 0
        while (j2 < dims) { g(i)(j2) -= d * g(p)(j2); j2 += 1 }
      }
      var n = 0.0; var j = 0
      while (j < dims) { n += g(i)(j) * g(i)(j); j += 1 }
      val inv = 1.0 / math.sqrt(n)
      var j3 = 0
      while (j3 < dims) { g(i)(j3) *= inv; j3 += 1 }
    }
    g.map(_.toSeq).toSeq
  }

  def sOpqTopk(spark: SparkSession, dir: String): DataFrame = {
    val m = 8
    val kCent = 16
    val rot = opqRotation

    val e = withNorm(spark, dir)
    // r6: codebook trains DISTRIBUTED in the rotated space — the rotation
    // is one MatVecMul codegen pass in the scan projection, so train,
    // encode and ADC all see identical float-truncated rotated values.
    val rotated = e.select(col("vec_id"),
      graft.functions.Vec.matvec(col("embedding"), rot).as("embedding"))
    val codebook = PqTrain.train(rotated, 64, m, kCent, rounds = 4, space = s"$dir:opq")
    val coded = e.select(col("vec_id"),
      graft.functions.Sketch.pqEncode(
        graft.functions.Vec.matvec(col("embedding"), rot), codebook).as("codes"))
    val q = queriesOf(e)
    val shortlist = q.crossJoin(coded)
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("q_emb"), col("q_nrm"), col("vec_id"),
        graft.functions.Sketch.pqAdc(
          graft.functions.Vec.matvec(col("q_emb"), rot), col("codes"), codebook).as("adc"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("adc").desc, col("vec_id"))))
      .where(col("rnk") <= 50)
    val scored = shortlist
      .join(e, Seq("vec_id"))
      .select(col("q_id"), col("vec_id"),
        round(dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")), 6).as("cosine"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 5)
      .select(col("q_id"), col("rnk"), col("vec_id"), col("cosine"))
      .orderBy("q_id", "rnk")
  }

  /** kNN self-join (round 4): EVERY vector's top-5 cosine neighbors — the
    * all-pairs contract behind SemDeDup-style pruning and graph building,
    * where "queries" are the corpus itself and a crossJoin would be
    * |corpus|² (the one shape that can never ship at 100 TB). IVF blocking
    * makes it an equi-join: corpus rows sit in their argmax cell, every
    * vector ALSO probes its nprobe=4 nearest cells as a query, and scoring
    * happens only inside cell buckets — candidate mass ≈ nprobe/kCells of
    * |corpus|². nprobe/kCells is the dial: at real scale kCells ~ √|corpus|
    * and the ratio collapses. Recall@5 measured 0.49/0.74 at nprobe 2/4 on
    * sf0.001 (spec pins ≥ 0.6); hash-gated since r5 ([[sKnnJoinSql]]
    * replays the Lloyd chain + blocking exactly). */
  def sKnnJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(spark, dir)
    val cents = ivfCells(spark, dir, kCells = 8)
    val assigned = e.withColumn("cell", argmaxCell(cents)(col("embedding"), col("nrm")))
    val probes = probeCells(e, cents, nprobe = 4, qPred = lit(true))
    val scored = probes.join(assigned, Seq("cell"))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")), 6).as("cosine"))
      // r13: pin the top-k window's parallelism (see ivfTopk). The
      // repartition alone was NOT enough — AQE still folded the reducer
      // side to one task (measured 3.1 s single-task while 31 cores idle);
      // localCheckpoint materializes the scored rows AT width 32, which no
      // runtime re-optimization can coalesce. Measured 4.6 → 1.1 s with
      // identical output (Lab `knn`). The materialized frame is the same
      // candidate set the window must sort anyway — no extra data is held.
      .repartition(spark.sparkContext.defaultParallelism, col("q_id"))
      .localCheckpoint()
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 5)
      .select(col("q_id"), col("rnk"), col("vec_id"), col("cosine"))
      .orderBy("q_id", "rnk")
  }

  /** MMR (maximal-marginal-relevance) diversified top-10 retrieval — the
    * RAG/training-batch reranker that trades raw relevance for coverage:
    * greedily pick argmax of λ·rel(c) − (1−λ)·max_{s∈selected} sim(c,s),
    * λ=0.7, seeded with the most-relevant item (query = vec 0, pool =
    * top-30 by cosine).
    *
    * Scale split: the RELEVANCE scan + top-30 pool is the corpus-scale part
    * and runs distributed (codegen dot + TakeOrderedAndProject — same shape
    * as s_cosine_topk); the greedy itself is inherently sequential in k but
    * touches only the POOL (30 rows + its 30×29 rounded sim matrix —
    * model-parameter scale, same bounded-collect class as the 256-row
    * codebook samples), so it runs on the driver after a bounded collect.
    * All cosines are rounded to 6 dp BEFORE the greedy on both engines, and
    * the driver rounds scores exactly as Spark's `round` does
    * (BigDecimal.valueOf + HALF_UP), so pick order is engine-portable; ties
    * break by vec_id. The DuckDB oracle replays the identical greedy as a
    * recursive CTE over the same rounded pool — full hash gate, no
    * rows-only concession. */
  def sMmrDiversify(spark: SparkSession, dir: String): DataFrame = {
    val lambda = 0.7
    val k = 10
    val e = withNorm(spark, dir)
    val pool = e.where(col("vec_id") =!= 0).crossJoin(broadcast(
        e.where(col("vec_id") === 0)
          .select(col("embedding").as("q_emb"), col("nrm").as("q_nrm"))))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        round(dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")), 6)
          .as("rel"))
      .orderBy(col("rel").desc, col("vec_id")).limit(30)
      .cache()
    val simDf = pool.select(col("vec_id").as("a"), col("embedding").as("ea"),
        col("nrm").as("na"))
      .join(pool.select(col("vec_id").as("b"), col("embedding").as("eb"),
        col("nrm").as("nb")), col("a") =!= col("b"))
      .select(col("a"), col("b"),
        round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6).as("s"))
    val rels = pool.select("vec_id", "rel").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val sim = simDf.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    pool.unpersist()
    // the greedy itself: mirrors Spark/DuckDB round() digit-for-digit
    def r6(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val first = rels.maxBy { case (id, r) => (r, -id) }
    val picks = scala.collection.mutable.ArrayBuffer(
      (1, first._1, first._2, Option.empty[Double]))
    val selected = scala.collection.mutable.LinkedHashSet(first._1)
    for (step <- 2 to k) {
      val (id, rel, ms, _) = rels.filterNot(c => selected(c._1))
        .map { case (id, r) =>
          val ms = selected.map(s => sim((id, s))).max
          (id, r, ms, r6(lambda * r - 0.3 * ms))
        }
        .maxBy { case (id, _, _, sc) => (sc, -id) }
      picks += ((step, id, rel, Some(ms)))
      selected += id
    }
    val rows = picks.map { case (st, id, r, ms) =>
      org.apache.spark.sql.Row(st, id, r,
        ms.map(java.lang.Double.valueOf).orNull)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("step",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("rel",
          org.apache.spark.sql.types.DoubleType, nullable = false),
        org.apache.spark.sql.types.StructField("max_sim",
          org.apache.spark.sql.types.DoubleType, nullable = true))))
      .orderBy("step")
  }

  val sMmrDiversifySql: String =
    """WITH RECURSIVE
      |n AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_sum([CAST(embedding[i] AS DOUBLE)*CAST(embedding[i] AS DOUBLE)
      |                   for i in generate_series(1, len(embedding))])) AS nrm
      |  FROM embeddings),
      |rel AS (
      |  SELECT c.vec_id,
      |    round(list_sum([CAST(q.embedding[i] AS DOUBLE)*CAST(c.embedding[i] AS DOUBLE)
      |                    for i in generate_series(1, len(q.embedding))]) / (q.nrm*c.nrm), 6) AS rel
      |  FROM n c, (SELECT * FROM n WHERE vec_id = 0) q
      |  WHERE c.vec_id <> 0
      |  ORDER BY rel DESC, c.vec_id LIMIT 30),
      |sim AS (
      |  SELECT a.vec_id AS a, b.vec_id AS b,
      |    round(list_sum([CAST(na.embedding[i] AS DOUBLE)*CAST(nb.embedding[i] AS DOUBLE)
      |                    for i in generate_series(1, len(na.embedding))]) / (na.nrm*nb.nrm), 6) AS s
      |  FROM rel a JOIN rel b ON a.vec_id <> b.vec_id
      |  JOIN n na ON na.vec_id = a.vec_id JOIN n nb ON nb.vec_id = b.vec_id),
      |mmr AS (
      |  SELECT * FROM (
      |    SELECT 1 AS step, vec_id, rel, CAST(NULL AS DOUBLE) AS max_sim, [vec_id] AS sel
      |    FROM rel ORDER BY rel DESC, vec_id LIMIT 1)
      |  UNION ALL
      |  SELECT step + 1, pick.vec_id, pick.rel, pick.ms, list_append(mmr.sel, pick.vec_id)
      |  FROM mmr, LATERAL (
      |    SELECT vec_id, rel, ms FROM (
      |      SELECT r.vec_id, r.rel,
      |        (SELECT max(s.s) FROM sim s
      |         WHERE s.a = r.vec_id AND list_contains(mmr.sel, s.b)) AS ms
      |      FROM rel r WHERE NOT list_contains(mmr.sel, r.vec_id)) cand
      |    ORDER BY round(0.7*rel - 0.3*ms, 6) DESC, vec_id LIMIT 1) pick
      |  WHERE mmr.step < 10)
      |SELECT CAST(step AS INT) AS step, vec_id, rel, max_sim
      |FROM mmr ORDER BY step""".stripMargin

  /** Reciprocal-rank fusion (RRF, Cormack et al. SIGIR'09) of two rankers —
    * the standard hybrid-retrieval combiner that needs NO score calibration
    * (ranks only, so a BM25 scale and a cosine scale fuse without tuning):
    * rrf(d) = Σ_r 1/(60 + rank_r(d)) over the rankers that retrieved d.
    *
    * Ranker A = keyword tf-idf over {spark, table} (the s_hybrid_search
    * scorer); ranker B = cosine vs the vec-0 embedding. Each ranker's
    * corpus-scale scan is distributed and ends in a TakeOrdered top-20;
    * ranks are then assigned WITHOUT a window: collect_list over the
    * 20-row frame → array_sort → posexplode (pos+1 = rank) — the
    * t_zipf_slope bounded-sort pattern, so no unpartitioned window exists
    * in the plan. Fusion is a full outer join of two 20-row frames.
    * Scores are rounded to 6 dp BEFORE ranking (ties by doc_id) so rank
    * assignment is engine-portable; the oracle replays both rankers and
    * the fusion in SQL. */
  def sRrfFusion(spark: SparkSession, dir: String): DataFrame = {
    val k = 60
    // ranker A: tf-idf keyword score (the s_hybrid_search kw scorer)
    val docs = Tables.table(spark, dir, "documents")
    val normed = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    val toks = Tables.fanout(docs)
      .select(col("doc_id"), explode(split(normed, " ")).as("word"))
      .where(col("word").isin("spark", "table"))
    val tf = toks.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val idf = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val kwTop = tf.join(broadcast(idf), Seq("word"))
      .crossJoin(broadcast(nDocs))
      .groupBy("doc_id")
      .agg(round(sum(col("tf") * log(col("n_docs").cast("double") / col("df"))), 6)
        .as("kw"))
      .orderBy(col("kw").desc, col("doc_id")).limit(20)
    // ranker B: cosine vs vec 0 over the full embedding corpus
    val e = withNorm(spark, dir)
    val cosTop = e.where(col("vec_id") =!= 0).crossJoin(broadcast(
        e.where(col("vec_id") === 0)
          .select(col("embedding").as("q_emb"), col("nrm").as("q_nrm"))))
      .select(col("vec_id").as("doc_id"),
        round(dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")), 6)
          .as("cos"))
      .orderBy(col("cos").desc, col("doc_id")).limit(20)
    // rank without a window: bounded array sort over the 20-row frame
    def ranked(df: DataFrame, score: String): DataFrame =
      df.agg(collect_list(struct(col(score), col("doc_id"))).as("xs"))
        .select(posexplode(expr(
          s"transform(array_sort(xs, (l, r) -> " +
            s"case when l.$score > r.$score then -1 when l.$score < r.$score then 1 " +
            s"when l.doc_id < r.doc_id then -1 else 1 end), x -> x.doc_id)"))
          .as(Seq("pos", "doc_id")))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as(s"rank_$score"))
    ranked(kwTop, "kw").join(ranked(cosTop, "cos"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        round(coalesce(lit(1.0) / (lit(k) + col("rank_kw")), lit(0.0))
          + coalesce(lit(1.0) / (lit(k) + col("rank_cos")), lit(0.0)), 6).as("rrf"),
        col("rank_kw"), col("rank_cos"))
      .orderBy(col("rrf").desc, col("doc_id")).limit(10)
  }

  val sRrfFusionSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(
      |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS word
      |  FROM documents),
      |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM toks
      |       WHERE word IN ('spark', 'table') GROUP BY 1, 2),
      |idf AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT COUNT(*) AS n_docs FROM documents),
      |kw AS (
      |  SELECT tf.doc_id,
      |    round(SUM(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / idf.df)), 6) AS kw
      |  FROM tf JOIN idf USING (word) CROSS JOIN n
      |  GROUP BY 1 ORDER BY kw DESC, doc_id LIMIT 20),
      |rk AS (SELECT doc_id,
      |  row_number() OVER (ORDER BY kw DESC, doc_id) AS rank_kw FROM kw),
      |nv AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_sum([CAST(embedding[i] AS DOUBLE)*CAST(embedding[i] AS DOUBLE)
      |                   for i in generate_series(1, len(embedding))])) AS nrm
      |  FROM embeddings),
      |cs AS (
      |  SELECT c.vec_id AS doc_id,
      |    round(list_sum([CAST(q.embedding[i] AS DOUBLE)*CAST(c.embedding[i] AS DOUBLE)
      |                    for i in generate_series(1, len(q.embedding))]) / (q.nrm*c.nrm), 6) AS cos
      |  FROM nv c, (SELECT * FROM nv WHERE vec_id = 0) q
      |  WHERE c.vec_id <> 0
      |  ORDER BY cos DESC, c.vec_id LIMIT 20),
      |rc AS (SELECT doc_id,
      |  row_number() OVER (ORDER BY cos DESC, doc_id) AS rank_cos FROM cs)
      |SELECT COALESCE(rk.doc_id, rc.doc_id) AS doc_id,
      |  round(COALESCE(CAST(1 AS DOUBLE) / (60 + rank_kw), 0)
      |      + COALESCE(CAST(1 AS DOUBLE) / (60 + rank_cos), 0), 6) AS rrf,
      |  CAST(rank_kw AS BIGINT) AS rank_kw, CAST(rank_cos AS BIGINT) AS rank_cos
      |FROM rk FULL OUTER JOIN rc ON rk.doc_id = rc.doc_id
      |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin

  /** Full SQL replay of the IVF pipeline (r5 — enabled by the
    * deterministic decimal-mean Lloyd trainer in [[Cluster]]): the oracle
    * re-trains the 4-round cell model as chained CTEs, re-assigns the
    * corpus (struct-max argmax, lowest-cell ties), re-probes the nprobe=3
    * nearest cells per query and re-scores exact cosine — so even this
    * APPROXIMATE op is hash-gated end-to-end: the approximation is a
    * deterministic function of (data, model recipe), not of the engine. */
  val sIvfTopkSql: String = {
    val rounds = 4
    s"""WITH ${Cluster.lloydCtes(k = 8, rounds = rounds)},
       |asn AS (
       |  SELECT e.vec_id,
       |    max(struct_pack(cos := ${Cluster.cosSql("e.embedding", "e.nrm", "c.cv")},
       |                    nc := -c.cell)) AS w
       |  FROM n e CROSS JOIN c$rounds c GROUP BY 1),
       |assigned AS (SELECT vec_id, -(w.nc) AS cell FROM asn),
       |pr AS (
       |  SELECT q.vec_id AS q_id, c.cell,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${Cluster.cosSql("q.embedding", "q.nrm", "c.cv")} DESC, c.cell) AS r
       |  FROM n q CROSS JOIN c$rounds c WHERE q.vec_id % 20 = 0 AND q.vec_id < 20000),
       |cand AS (
       |  SELECT p.q_id, a.vec_id
       |  FROM (SELECT q_id, cell FROM pr WHERE r <= 3) p
       |  JOIN assigned a USING (cell)
       |  WHERE a.vec_id <> p.q_id),
       |scored AS (
       |  SELECT cd.q_id, cd.vec_id,
       |    round(list_sum([CAST(q.embedding[i] AS DOUBLE)*CAST(c.embedding[i] AS DOUBLE)
       |                    for i in generate_series(1, len(q.embedding))])
       |          / (q.nrm * c.nrm), 6) AS cosine
       |  FROM cand cd JOIN n q ON q.vec_id = cd.q_id JOIN n c ON c.vec_id = cd.vec_id),
       |ranked AS (
       |  SELECT q_id, vec_id, cosine,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rnk
       |  FROM scored)
       |SELECT q_id, CAST(rnk AS INTEGER) AS rnk, vec_id, cosine
       |FROM ranked WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin
  }

  /** Same full replay for the kNN SELF-join (every vector is a query,
    * nprobe = 4): the |corpus|²-avoiding IVF blocking is itself
    * deterministic arithmetic, so the blocked join's exact output —
    * including which true neighbors the blocking misses — is hash-gated.
    * The recall spec (vs brute force) measures the approximation; the
    * oracle pins its reproducibility. */
  val sKnnJoinSql: String = {
    val rounds = 4
    s"""WITH ${Cluster.lloydCtes(k = 8, rounds = rounds)},
       |asn AS (
       |  SELECT e.vec_id,
       |    max(struct_pack(cos := ${Cluster.cosSql("e.embedding", "e.nrm", "c.cv")},
       |                    nc := -c.cell)) AS w
       |  FROM n e CROSS JOIN c$rounds c GROUP BY 1),
       |assigned AS (SELECT vec_id, -(w.nc) AS cell FROM asn),
       |pr AS (
       |  SELECT q.vec_id AS q_id, c.cell,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${Cluster.cosSql("q.embedding", "q.nrm", "c.cv")} DESC, c.cell) AS r
       |  FROM n q CROSS JOIN c$rounds c),
       |cand AS (
       |  SELECT p.q_id, a.vec_id
       |  FROM (SELECT q_id, cell FROM pr WHERE r <= 4) p
       |  JOIN assigned a USING (cell)
       |  WHERE a.vec_id <> p.q_id),
       |scored AS (
       |  SELECT cd.q_id, cd.vec_id,
       |    round(list_sum([CAST(q.embedding[i] AS DOUBLE)*CAST(c.embedding[i] AS DOUBLE)
       |                    for i in generate_series(1, len(q.embedding))])
       |          / (q.nrm * c.nrm), 6) AS cosine
       |  FROM cand cd JOIN n q ON q.vec_id = cd.q_id JOIN n c ON c.vec_id = cd.vec_id),
       |ranked AS (
       |  SELECT q_id, vec_id, cosine,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rnk
       |  FROM scored)
       |SELECT q_id, CAST(rnk AS INTEGER) AS rnk, vec_id, cosine
       |FROM ranked WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin
  }

  /** Full SQL replay of the LSH tiers (r6): the hyperplanes are a pure
    * function of their seeds — no data — so they embed as DOUBLE literals
    * (float-exact values); signature bits replay HyperplaneSigs' in-order
    * double fold and strict `> 0` test, candidates are the same (table,
    * sig) equi-join (+ single-bit-flip probes for multiprobe), and the
    * exact re-rank is the shared rounded-cosine tail. Even the recall the
    * index MISSES is pinned cross-engine. */
  private def lshSql(nTables: Int, k: Int, multiprobe: Boolean): String = {
    val dims = 64
    val flat = lshPlanes(nTables, k, dims).flatten
    val pLit = flat.map(f => PqTrain.fmtD(f.toDouble)).mkString("[", ", ", "]")
    val sigExpr =
      s"""CAST(list_sum([CASE WHEN list_sum([e.emb[i] * P[(t.t*$k + j)*$dims + i]
         |                                   for i in generate_series(1, $dims)]) > 0
         |                    THEN 1 << j ELSE 0 END
         |               for j in generate_series(0, ${k - 1})]) AS INT)""".stripMargin
    val qside =
      if (multiprobe)
        s"""qp AS (
           |  SELECT vec_id AS q_id, t,
           |    CASE WHEN b < 0 THEN sig ELSE xor(sig, 1 << b) END AS sig
           |  FROM sg CROSS JOIN generate_series(-1, ${k - 1}) pb(b)
           |  WHERE vec_id % 20 = 0 AND vec_id < 20000)""".stripMargin
      else
        s"""qp AS (
           |  SELECT vec_id AS q_id, t, sig FROM sg WHERE vec_id % 20 = 0 AND vec_id < 20000)""".stripMargin
    s"WITH ${PqTrain.srcCte(dims)},\n" +
      s"pl AS (SELECT $pLit AS P),\n" +
      s"""sg AS (
         |  SELECT e.vec_id, t.t, $sigExpr AS sig
         |  FROM pn e CROSS JOIN generate_series(0, ${nTables - 1}) t(t) CROSS JOIN pl),
         |$qside,
         |cand AS (
         |  SELECT DISTINCT q.q_id, c.vec_id
         |  FROM qp q JOIN sg c ON q.t = c.t AND q.sig = c.sig
         |  WHERE c.vec_id <> q.q_id),
         |scored AS (
         |  SELECT cd.q_id, cd.vec_id,
         |    round(list_sum([q.emb[i] * c.emb[i] for i in generate_series(1, $dims)])
         |          / (q.nrm * c.nrm), 6) AS cosine
         |  FROM cand cd JOIN pn q ON q.vec_id = cd.q_id JOIN pn c ON c.vec_id = cd.vec_id),
         |ranked AS (
         |  SELECT q_id, vec_id, cosine,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rnk
         |  FROM scored)
         |SELECT q_id, CAST(rnk AS INTEGER) AS rnk, vec_id, cosine
         |FROM ranked WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin
  }

  val sLshAnnSql: String = lshSql(nTables = 12, k = 6, multiprobe = false)
  val sMultiprobeSql: String = lshSql(nTables = 6, k = 6, multiprobe = true)

  /** Full SQL replay of the PQ pipeline (r6 — enabled by the distributed
    * decimal-mean subspace trainer [[PqTrain]]): the oracle re-trains the
    * 4-round per-subspace codebook as chained CTEs, re-encodes the corpus
    * (struct-max L2 argmin, first-wins ties), ADC-scores with the identical
    * flat 64-term fold, and exactly re-ranks the top-50 shortlist — the
    * approximation is a deterministic function of (data, recipe), not of
    * the engine. */
  val sPqTopkSql: String =
    "WITH " + PqTrain.srcCte(64) + ",\n" +
      PqTrain.pqCtes("pn", 64, 8, 16, 4) + ",\n" +
      PqTrain.encodeCtes("pn", "pc4", 64, 8) + ",\n" +
      PqTrain.crossAdcCte("pn", 64) + ",\n" +
      PqTrain.rankTail(64)

  /** OPQ replay: the rotation matrix is a pure function of its seed (no
    * data), so it is embedded as DOUBLE literals; rotation mirrors
    * MatVecMul bit-for-bit (in-order double fold, REAL truncation), then
    * training/encode/ADC replay in rotated space and the re-rank reads
    * original space — same structure as the Spark plan. */
  val sOpqTopkSql: String = {
    val dims = 64
    val rmat = opqRotation
      .map(row => row.map(PqTrain.fmtD).mkString("[", ", ", "]"))
      .mkString("[\n    ", ",\n    ", "]")
    s"WITH rmat AS (SELECT $rmat AS R),\n" +
      PqTrain.srcCte(dims) + ",\n" +
      s"""rot AS (
         |  SELECT pn.vec_id,
         |    [CAST(CAST(list_sum([R[i][j] * pn.emb[j] for j in generate_series(1, $dims)]) AS REAL) AS DOUBLE)
         |     for i in generate_series(1, $dims)] AS emb
         |  FROM pn CROSS JOIN rmat)""".stripMargin + ",\n" +
      PqTrain.pqCtes("rot", dims, 8, 16, 4) + ",\n" +
      PqTrain.encodeCtes("rot", "pc4", dims, 8) + ",\n" +
      PqTrain.crossAdcCte("rot", dims) + ",\n" +
      PqTrain.rankTail(dims)
  }

  /** IVF×PQ replay: coarse cells from the [[Cluster]] Lloyd chain (k=16),
    * PQ codebook from the [[PqTrain]] chain, candidates = probed-cell
    * equi-join, ADC only inside the probed cells, exact re-rank — the
    * 100 TB endgame tier fully hash-gated. */
  val sIvfPqTopkSql: String = {
    val rounds = 4
    "WITH " + Cluster.lloydCtes(k = 16, rounds = rounds) + ",\n" +
      PqTrain.srcCte(64) + ",\n" +
      PqTrain.pqCtes("pn", 64, 8, 16, 4) + ",\n" +
      PqTrain.encodeCtes("pn", "pc4", 64, 8) + ",\n" +
      s"""asn AS (
         |  SELECT e.vec_id,
         |    max(struct_pack(cos := ${Cluster.cosSql("e.embedding", "e.nrm", "c.cv")},
         |                    nc := -c.cell)) AS w
         |  FROM n e CROSS JOIN c$rounds c GROUP BY 1),
         |assigned AS (SELECT vec_id, -(w.nc) AS cell FROM asn),
         |pr AS (
         |  SELECT q.vec_id AS q_id, c.cell,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY ${Cluster.cosSql("q.embedding", "q.nrm", "c.cv")} DESC, c.cell) AS r
         |  FROM n q CROSS JOIN c$rounds c WHERE q.vec_id % 20 = 0 AND q.vec_id < 20000),
         |cand AS (
         |  SELECT p.q_id, a.vec_id
         |  FROM (SELECT q_id, cell FROM pr WHERE r <= 6) p
         |  JOIN assigned a USING (cell)
         |  WHERE a.vec_id <> p.q_id),
         |adc AS (
         |  SELECT cd.q_id, cd.vec_id,
         |    list_sum([q.emb[i] * f.fcv[i] for i in generate_series(1, 64)]) AS adc
         |  FROM cand cd JOIN pn q ON q.vec_id = cd.q_id JOIN fc f ON f.vec_id = cd.vec_id)""".stripMargin + ",\n" +
      PqTrain.rankTail(64)
  }

  /** IVFADC-residual replay: the raw-IVFPQ oracle with the PQ chain
    * re-trained on residuals (rsrc = pn − assigned cell centroid, float-
    * rounded) and the ADC score carrying the centroid term — every fold
    * in the order the Spark expressions evaluate it. */
  val sIvfPqResidualSql: String = {
    val rounds = 4
    "WITH " + Cluster.lloydCtes(k = 16, rounds = rounds) + ",\n" +
      PqTrain.srcCte(64) + ",\n" +
      s"""asn AS MATERIALIZED (
         |  SELECT e.vec_id,
         |    max(struct_pack(cos := ${Cluster.cosSql("e.embedding", "e.nrm", "c.cv")},
         |                    nc := -c.cell)) AS w
         |  FROM n e CROSS JOIN c$rounds c GROUP BY 1),
         |assigned AS MATERIALIZED (SELECT vec_id, -(w.nc) AS cell FROM asn),
         |rsrc AS MATERIALIZED (
         |  SELECT p.vec_id,
         |    [CAST(CAST(p.emb[i] - c.cv[i] AS REAL) AS DOUBLE)
         |     for i in generate_series(1, 64)] AS emb
         |  FROM pn p JOIN assigned a USING (vec_id)
         |  JOIN c$rounds c ON c.cell = a.cell)""".stripMargin + ",\n" +
      PqTrain.pqCtes("rsrc", 64, 8, 16, 4) + ",\n" +
      PqTrain.encodeCtes("rsrc", "pc4", 64, 8) + ",\n" +
      s"""pr AS (
         |  SELECT q.vec_id AS q_id, c.cell,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY ${Cluster.cosSql("q.embedding", "q.nrm", "c.cv")} DESC, c.cell) AS r
         |  FROM n q CROSS JOIN c$rounds c WHERE q.vec_id % 20 = 0 AND q.vec_id < 20000),
         |cand AS (
         |  SELECT p.q_id, a.vec_id, a.cell
         |  FROM (SELECT q_id, cell FROM pr WHERE r <= 6) p
         |  JOIN assigned a USING (cell)
         |  WHERE a.vec_id <> p.q_id),
         |adc AS (
         |  SELECT cd.q_id, cd.vec_id,
         |    list_sum([q.emb[i] * c.cv[i] for i in generate_series(1, 64)])
         |    + list_sum([q.emb[i] * f.fcv[i] for i in generate_series(1, 64)]) AS adc
         |  FROM cand cd JOIN pn q ON q.vec_id = cd.q_id
         |  JOIN fc f ON f.vec_id = cd.vec_id
         |  JOIN c$rounds c ON c.cell = cd.cell)""".stripMargin + ",\n" +
      PqTrain.rankTail(64)
  }

  /** ANN recall telemetry (r6): per-query recall@5 of the IVF tier against
    * the exact tier — the index-quality report a production ANN deployment
    * recomputes after every index build ("measure, don't guess" applied to
    * the index itself). At 100 TB the exact side runs over a sampled query
    * panel (here: the standing every-20th panel both tiers already use),
    * so the report costs one brute-force pass over |panel|×|corpus| plus
    * the IVF probe — linear in corpus, and the whole thing is one plan:
    * both tiers compose in-plan, no driver round-trip. Hash-gated by
    * construction: both inputs are already exactly replayable, so their
    * composition is too (the oracle nests both WITH-chains as derived
    * tables). */
  def sAnnRecall(spark: SparkSession, dir: String): DataFrame = {
    val ex = sCosineTopk(spark, dir).select(col("q_id"), col("vec_id"))
    val iv = sIvfTopk(spark, dir).select(col("q_id"), col("vec_id"))
    val hits = ex.join(iv, Seq("q_id", "vec_id"), "left_semi")
      .groupBy("q_id").agg(count(lit(1)).as("n_hit"))
    ex.groupBy("q_id").agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"), col("n_exact"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_exact"), 6)
          .as("recall"))
      .orderBy("q_id")
  }

  val sAnnRecallSql: String =
    s"""WITH ex AS (SELECT q_id, vec_id FROM ($sCosineTopkSql) tex),
       |iv AS (SELECT q_id, vec_id FROM ($sIvfTopkSql) tiv),
       |h AS (SELECT e.q_id, COUNT(*) AS n_hit
       |      FROM ex e JOIN iv USING (q_id, vec_id) GROUP BY 1),
       |ne AS (SELECT q_id, COUNT(*) AS n_exact FROM ex GROUP BY 1)
       |SELECT ne.q_id, ne.n_exact, COALESCE(h.n_hit, 0) AS n_hit,
       |  round(CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / ne.n_exact, 6) AS recall
       |FROM ne LEFT JOIN h USING (q_id) ORDER BY q_id""".stripMargin

  /** PQ quantization distortion — faiss's OTHER index-quality number
    * (s_ann_recall measures what the index misses; this measures how much
    * each stored vector is DAMAGED by 32× compression): per-vector squared
    * reconstruction error ‖x − q(x)‖², reported as exact-decimal MSE +
    * max. Per-subspace errors recompute the assigned-centroid distance
    * (the identical in-order fold PqEncode minimized, against the
    * broadcast m×k codebook rows) and combine IN SUB ORDER via a
    * sort_array fold — so the oracle's per-sub negd list_sum matches
    * bit-for-bit. One code scan + one m×k broadcast join; training rides
    * the shared PqTrain chain (ModelCache at bench time). */
  def sPqDistortion(spark: SparkSession, dir: String): DataFrame = {
    val m = 8
    val sub = 8
    val e = withNorm(spark, dir)
    val codebook: Seq[Seq[Seq[Float]]] =
      PqTrain.train(e, 64, m, kCent = 16, rounds = 4, space = s"$dir:raw")
    val coded = e.select(col("vec_id"), col("embedding"),
      graft.functions.Sketch.pqEncode(col("embedding"), codebook).as("codes"))
    val cbRows = for {
      s <- codebook.indices; c <- codebook(s).indices
    } yield (s, c, codebook(s)(c).map(_.toDouble))
    val cbDf = spark.createDataFrame(cbRows).toDF("sub", "cell", "cv")
    val perSub = coded
      .select(col("vec_id"), col("embedding"),
        posexplode(col("codes")).as(Seq("sub", "cell")))
      .join(broadcast(cbDf), Seq("sub", "cell"))
      .select(col("vec_id"), col("sub"),
        expr(s"aggregate(sequence(1, $sub), 0D, (acc, j) -> acc + (cast(element_at(embedding, sub*$sub + j) as double) - element_at(cv, j)) * (cast(element_at(embedding, sub*$sub + j) as double) - element_at(cv, j)))")
          .as("suberr"))
    perSub.groupBy("vec_id")
      .agg(sort_array(collect_list(struct(col("sub"), col("suberr")))).as("parts"))
      .select(expr("aggregate(parts, 0D, (acc, p) -> acc + p.suberr)").as("err"))
      .agg(count(lit(1)).cast("long").as("n_vectors"),
        sum(expr("cast(err as decimal(25,10))")).cast("double").as("sse"),
        max("err").as("max_err"))
      .select(col("n_vectors"),
        expr("sse / cast(n_vectors as double)").as("mse"),
        col("max_err"))
  }

  val sPqDistortionSql: String =
    s"""WITH ${PqTrain.srcCte(64)},
       |${PqTrain.pqCtes("pn", 64, 8, 16, 4)},
       |enc AS (
       |  SELECT e.vec_id, c.sub,
       |    max(struct_pack(negd := -list_sum([(e.emb[c.sub*8+j] - c.cv[j]) * (e.emb[c.sub*8+j] - c.cv[j])
       |                 for j in generate_series(1, 8)]),
       |                    nc := -c.cell)) AS w
       |  FROM pn e CROSS JOIN pc4 c GROUP BY 1, 2),
       |pv AS (
       |  SELECT vec_id, list_sum(list(-(w.negd) ORDER BY sub)) AS err
       |  FROM enc GROUP BY 1),
       |agg AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
       |    CAST(SUM(CAST(err AS DECIMAL(25,10))) AS DOUBLE) AS sse,
       |    MAX(err) AS max_err
       |  FROM pv)
       |SELECT n_vectors, sse / CAST(n_vectors AS DOUBLE) AS mse, max_err
       |FROM agg""".stripMargin

  /** IVF nprobe sweep (r10 — d_band_sweep's ANN-side sibling, the tuning
    * table every IVF deployment is sized from): from ONE trained cell
    * model and ONE corpus assignment, measure recall@5 vs exact truth and
    * candidate volume at nprobe ∈ {1,2,4,8}. The sweep reuses everything:
    * probe ranks are computed once to the max level and each level is a
    * FILTER (rc ≤ nprobe), never a re-probe; candidates score once and
    * fan 4× through a broadcast 4-row level join; truth is the capped
    * brute-force baseline (the s_ann_recall budget — at 100 TB truth runs
    * on a held-out query sample, the sweep itself stays index-priced).
    * recall in exact ppm (integer division, one divide); the whole table —
    * including which true neighbors each nprobe level misses — hash-gates
    * against a full DuckDB re-train replay. */
  def sNprobeSweep(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val maxNp = 8
    val e = withNorm(spark, dir)
    val cents = ivfCells(spark, dir, kCells = 8)
    val assigned = e.withColumn("cell", argmaxCell(cents)(col("embedding"), col("nrm")))
    val q = queriesOf(e)
    // probe ranks to the MAX swept level, once
    val probes = q
      .select(col("q_id"), col("q_emb"), col("q_nrm"),
        explode(array(cellSims(cents)(col("q_emb"), col("q_nrm")).map { case (cell, sim) =>
          struct(lit(cell).as("cell"), sim.as("sim"))
        }: _*)).as("cs"))
      .select(col("q_id"), col("q_emb"), col("q_nrm"),
        col("cs.cell").as("cell"), col("cs.sim").as("sim"))
      .withColumn("rc", row_number().over(
        Window.partitionBy("q_id").orderBy(col("sim").desc, col("cell"))))
      .where(col("rc") <= maxNp)
    // each candidate scores ONCE and carries its cell's probe rank (a
    // vector lives in exactly one cell, so no per-level dedup)
    val cand = probes.join(assigned, Seq("cell"))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), col("rc"),
        round(dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")), 6)
          .as("cosine"))
      .localCheckpoint()
    val levels = Seq(1, 2, 4, 8).toDF("nprobe")
    val swept = cand.join(broadcast(levels), col("rc") <= col("nprobe"))
    val top = swept.withColumn("rnk", row_number().over(
        Window.partitionBy("nprobe", "q_id").orderBy(col("cosine").desc, col("vec_id"))))
      .where(col("rnk") <= 5)
      .select("nprobe", "q_id", "vec_id")
    val truth = q.crossJoin(e)
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")), 6)
          .as("cosine"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))))
      .where(col("rnk") <= 5)
      .select("q_id", "vec_id")
      .localCheckpoint()
    val t5 = truth.agg(count(lit(1)).cast("long").as("t5"))
    val candCnt = swept.groupBy("nprobe").agg(count(lit(1)).as("n_candidates"))
    val hits = top.join(truth, Seq("q_id", "vec_id"), "left_semi")
      .groupBy("nprobe").agg(count(lit(1)).as("n_hits"))
    candCnt.join(hits, Seq("nprobe"), "left")
      .crossJoin(broadcast(t5))
      .select(col("nprobe"), col("n_candidates"),
        expr("CAST((1000000 * coalesce(n_hits, 0)) div t5 AS BIGINT)").as("recall_ppm"))
      .orderBy("nprobe")
  }

  val sNprobeSweepSql: String = {
    val rounds = 4
    s"""WITH ${Cluster.lloydCtes(k = 8, rounds = rounds)},
       |asn AS (
       |  SELECT e.vec_id,
       |    max(struct_pack(cos := ${Cluster.cosSql("e.embedding", "e.nrm", "c.cv")},
       |                    nc := -c.cell)) AS w
       |  FROM n e CROSS JOIN c$rounds c GROUP BY 1),
       |assigned AS (SELECT vec_id, -(w.nc) AS cell FROM asn),
       |pr AS (
       |  SELECT q.vec_id AS q_id, c.cell,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${Cluster.cosSql("q.embedding", "q.nrm", "c.cv")} DESC, c.cell) AS rc
       |  FROM n q CROSS JOIN c$rounds c WHERE q.vec_id % 20 = 0 AND q.vec_id < 20000),
       |cand AS (
       |  SELECT p.q_id, a.vec_id, p.rc
       |  FROM (SELECT q_id, cell, rc FROM pr WHERE rc <= 8) p
       |  JOIN assigned a USING (cell)
       |  WHERE a.vec_id <> p.q_id),
       |sc AS (
       |  SELECT cd.q_id, cd.vec_id, cd.rc,
       |    round(list_sum([CAST(q.embedding[i] AS DOUBLE)*CAST(c.embedding[i] AS DOUBLE)
       |                    for i in generate_series(1, len(q.embedding))])
       |          / (q.nrm * c.nrm), 6) AS cosine
       |  FROM cand cd JOIN n q ON q.vec_id = cd.q_id JOIN n c ON c.vec_id = cd.vec_id),
       |lv AS (SELECT * FROM (VALUES (1), (2), (4), (8)) t(nprobe)),
       |sw AS (SELECT lv.nprobe, sc.q_id, sc.vec_id, sc.cosine
       |       FROM sc JOIN lv ON sc.rc <= lv.nprobe),
       |top AS (
       |  SELECT nprobe, q_id, vec_id FROM (
       |    SELECT nprobe, q_id, vec_id,
       |      row_number() OVER (PARTITION BY nprobe, q_id
       |        ORDER BY cosine DESC, vec_id) AS rnk
       |    FROM sw) z WHERE rnk <= 5),
       |truth AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        round(list_sum([CAST(q.embedding[i] AS DOUBLE)*CAST(c.embedding[i] AS DOUBLE)
       |                        for i in generate_series(1, len(q.embedding))])
       |              / (q.nrm * c.nrm), 6) DESC, c.vec_id) AS rnk
       |    FROM n q JOIN n c ON c.vec_id <> q.vec_id
       |    WHERE q.vec_id % 20 = 0 AND q.vec_id < 20000) z WHERE rnk <= 5),
       |tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS t5 FROM truth),
       |cc AS (SELECT nprobe, CAST(COUNT(*) AS BIGINT) AS n_candidates
       |       FROM sw GROUP BY 1),
       |hh AS (SELECT t.nprobe, CAST(COUNT(*) AS BIGINT) AS n_hits
       |       FROM top t JOIN truth u ON u.q_id = t.q_id AND u.vec_id = t.vec_id
       |       GROUP BY 1)
       |SELECT cc.nprobe, cc.n_candidates,
       |  CAST((1000000 * COALESCE(hh.n_hits, 0)) // tt.t5 AS BIGINT) AS recall_ppm
       |FROM cc LEFT JOIN hh ON hh.nprobe = cc.nprobe
       |CROSS JOIN tt ORDER BY cc.nprobe""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_nprobe_sweep" -> (sNprobeSweep _),
    "s_pq_distortion" -> (sPqDistortion _),
    "s_ann_recall" -> (sAnnRecall _),
    "s_mmr_diversify" -> (sMmrDiversify _),
    "s_rrf_fusion" -> (sRrfFusion _),
    "s_knn_join" -> (sKnnJoin _),
    "s_ivfpq_topk" -> (sIvfPqTopk _),
    "s_ivfpq_residual" -> (sIvfPqResidual _),
    "s_multiprobe" -> (sMultiprobe _),
    "s_opq_topk" -> (sOpqTopk _),
    "s_radius" -> (sRadius _),
    "s_cosine_topk" -> (sCosineTopk _),
    "s_lsh_ann" -> (sLshAnn _),
    "s_ivf_topk" -> (sIvfTopk _),
    "s_hybrid_search" -> (sHybridSearch _),
    "s_pq_topk" -> (sPqTopk _))

  val oracles: Map[String, String] = Map(
    "s_nprobe_sweep" -> sNprobeSweepSql,
    "s_radius" -> sRadiusSql,
    "s_cosine_topk" -> sCosineTopkSql,
    "s_hybrid_search" -> sHybridSearchSql,
    "s_mmr_diversify" -> sMmrDiversifySql,
    "s_rrf_fusion" -> sRrfFusionSql,
    "s_ivf_topk" -> sIvfTopkSql,
    "s_knn_join" -> sKnnJoinSql,
    "s_pq_topk" -> sPqTopkSql,
    "s_opq_topk" -> sOpqTopkSql,
    "s_ivfpq_topk" -> sIvfPqTopkSql,
    "s_ivfpq_residual" -> sIvfPqResidualSql,
    "s_lsh_ann" -> sLshAnnSql,
    "s_multiprobe" -> sMultiprobeSql,
    "s_ann_recall" -> sAnnRecallSql,
    "s_pq_distortion" -> sPqDistortionSql)
}
