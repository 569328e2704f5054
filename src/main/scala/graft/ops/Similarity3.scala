package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.5 addition (round 7): Johnson-Lindenstrauss random projection — the
  * dimensionality-REDUCTION tier of the ANN ladder, distinct from every
  * quantization tier already gated (PQ/OPQ code distances, SQ8 per-dim
  * buckets, matryoshka prefix truncation): JL maps 64-d → 16-d with a
  * dense ±1 sign matrix (Achlioptas 2001, public) and PRESERVES pairwise
  * L2 distances in expectation — E‖Px‖² = 16·‖x‖² for ±1 entries — which
  * is the property this op gates, per pair, as measured distortion ratios.
  *
  * 100 TB shape: the projection is ONE codegen [[graft.functions.MatVecMul]]
  * pass in the scan projection at ingest (the s_opq_topk rotation path —
  * no shuffle, no state); downstream search then runs at 4× less memory
  * bandwidth and the 16-d index feeds any existing tier. The sign matrix
  * embeds as literals in the DuckDB oracle (the s_lsh_ann plane
  * precedent), and the float32 output boundary of MatVecMul replays via
  * the OPQ CAST(CAST(… AS REAL) AS DOUBLE) idiom, so the gate is
  * bit-exact end-to-end. Signs come from the cubic GF(2^61−1) PolyHash
  * parity — a deterministic stand-in with the statistics JL needs
  * (balanced, well-mixed; Round7eSpec pins both); a production build
  * draws them from a seeded cryptographic stream, same plan. */
object Similarity3 {

  private val dIn = 64
  private val dOut = 16

  /** ±1 sign matrix, rows = output dims (MatVecMul orientation): parity of
    * the cubic GF(2^61−1) PolyHash of the flat index — the same mixing
    * the HLL register build uses (an LCG's bit pattern over sequential
    * indices is visibly structured; measured here as distortion ratios
    * drifting to mean 0.86 — the cubic centers them at 1). */
  private[graft] val jlMatrix: Seq[Seq[Double]] = {
    import graft.functions.PolyHash.{M, PHI, PSI, mulmod}
    (0 until dOut).map { i =>
      (0 until dIn).map { j =>
        val k = i.toLong * dIn + j + 1L
        val h1 = (mulmod(PHI, k) + PSI) % M
        val h = mulmod(mulmod(h1, h1), h1)
        if (h % 2 == 0) 1.0 else -1.0
      }
    }
  }

  def sJlProject(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.fanout(Tables.table(spark, dir, "embeddings"))
      .select(col("vec_id"), col("embedding"),
        graft.functions.Vec.matvec(col("embedding"), jlMatrix).as("proj"))
    val a = e.where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("a_id"), col("embedding").as("a_emb"),
        col("proj").as("a_proj"))
    // only vec_ids ≡ 1,2,3 (mod 50) can match the exploded pair keys —
    // the map-side filter that keeps ~94% of the corpus out of the join
    // shuffle at scale (result-invariant; review r7)
    val b = e.where(col("vec_id") % 50 <= 3 && col("vec_id") % 50 >= 1)
      .select(col("vec_id").as("b_id"), col("embedding").as("b_emb"),
        col("proj").as("b_proj"))
    // Column-based (not expr-string) lambdas: the self-join re-resolves
    // attribute ids, and string exprs bind too late. zip_with + aggregate
    // folds left-to-right, value-identical to the oracle's list_sum
    // comprehension.
    def d2(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(
        zip_with(x, y, (p, q) =>
          (p.cast("double") - q.cast("double")) * (p.cast("double") - q.cast("double"))),
        lit(0.0), (acc, v) => acc + v)
    // pair candidates by EXPLODED key + equi-join, not a BETWEEN theta-join
    // (a non-equi join plans as BroadcastNestedLoopJoin — the plan audit
    // rightly bans it; the exploded form shuffles on b_id like any join)
    a.withColumn("b_id",
        explode(array(col("a_id") + 1, col("a_id") + 2, col("a_id") + 3)))
      .join(b, "b_id")
      .select(col("a_id"), col("b_id"),
        d2(col("a_emb"), col("b_emb")).as("r_orig"),
        d2(col("a_proj"), col("b_proj")).as("r_proj"))
      .where(col("r_orig") > 0)
      .select(col("a_id"), col("b_id"),
        round(col("r_orig"), 6).as("d2_orig"),
        round(col("r_proj"), 6).as("d2_proj"),
        round(col("r_proj") / (lit(16.0) * col("r_orig")), 4).as("ratio"))
      .orderBy("a_id", "b_id")
  }

  val sJlProjectSql: String = {
    val smat = jlMatrix
      .map(row => row.map(PqTrain.fmtD).mkString("[", ", ", "]"))
      .mkString("[\n    ", ",\n    ", "]")
    s"""WITH smat AS (SELECT $smat AS S),
       |p AS (
       |  SELECT vec_id, embedding,
       |    [CAST(CAST(list_sum([S[i][j] * CAST(embedding[j] AS DOUBLE)
       |                         for j in generate_series(1, $dIn)]) AS REAL) AS DOUBLE)
       |     for i in generate_series(1, $dOut)] AS proj
       |  FROM embeddings CROSS JOIN smat),
       |pairs AS (
       |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |    list_sum([(CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))
       |            * (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))
       |              for i in generate_series(1, $dIn)]) AS r_orig,
       |    list_sum([(a.proj[i] - b.proj[i]) * (a.proj[i] - b.proj[i])
       |              for i in generate_series(1, $dOut)]) AS r_proj
       |  FROM p a JOIN p b ON b.vec_id BETWEEN a.vec_id + 1 AND a.vec_id + 3
       |  WHERE a.vec_id % 50 = 0)
       |SELECT a_id, b_id, round(r_orig, 6) AS d2_orig, round(r_proj, 6) AS d2_proj,
       |  round(r_proj / (16.0e0 * r_orig), 4) AS ratio
       |FROM pairs WHERE r_orig > 0 ORDER BY a_id, b_id""".stripMargin
  }

  // ------------------------------------------------- power-iteration PCA
  // The dominant principal direction of the embedding corpus, computed
  // MATRIX-FREE: the covariance/second-moment matrix is never materialized
  // (64×64 would be cheap here, but the recipe must survive d where d² rows
  // per partition isn't — and the matrix-free form is also how everyone
  // actually runs power iteration at scale). Each round is one pass:
  //   score_r = ⟨x, v⟩ in the scan projection (codegen FloatVecDot),
  //   v'_j    = Σ_rows x_j·score — posexplode → groupBy(dim), a map-side-
  //             combined DECIMAL aggregate to d rows (the Lloyd update
  //             discipline: decimal sums are associative, so training is
  //             bit-stable at any partitioning),
  //   normalize on the driver (d doubles — model-parameter exchange, the
  //   k×d Lloyd precedent) and store at float32 (CAST AS REAL mirror).
  // Five rounds from the deterministic e₁ start; the sign is canonicalized
  // by the max-|w| component so the eigenvector's inherent ± ambiguity
  // can't flip between engines. Uncentered (second-moment) direction: the
  // honest-boundary note — mean-centering adds one more aggregate and a
  // subtraction in the scan, same plan shape; the gate covers the
  // iteration algebra either way.

  private[graft] def pcaVector(spark: SparkSession, dir: String,
                             rounds: Int): Array[Float] =
    ModelCache.memo(s"pca:$dir:rounds=$rounds") {
      val e = Tables.fanout(Tables.table(spark, dir, "embeddings"))
        .select(col("vec_id"), col("embedding"))
      var v = Array.tabulate(dIn)(j => if (j == 0) 1.0f else 0.0f)
      for (_ <- 1 to rounds) {
        val raw = e
          .select(graft.functions.Vec.vdot(col("embedding"),
            typedlit(v.toSeq)).as("score"),
            posexplode(col("embedding")).as(Seq("dim", "x")))
          .groupBy("dim")
          .agg(sum((col("x").cast("double") * col("score"))
            .cast("decimal(30,6)")).cast("double").as("raw"))
          .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
        val arr = Array.tabulate(dIn)(j => raw.getOrElse(j, 0.0))
        val n = math.sqrt(arr.foldLeft(0.0)((a, x) => a + x * x))
        v = arr.map(x => (x / n).toFloat)
      }
      v
    }

  /** Top principal direction by 5 matrix-free power-iteration rounds:
    * top-8 loading dims (by |weight|, sign-canonicalized) + the Rayleigh
    * quotient (mean squared projection — the variance captured along the
    * direction) and corpus size. Every scalar the model touches is either
    * an exact decimal sum or an identical-text IEEE expression, so the
    * whole 5-round chain replays bit-for-bit in the DuckDB oracle. */
  def sPcaPower(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val v = pcaVector(spark, dir, rounds = 5)
    val jstar = v.indices.minBy(j => (-math.abs(v(j)), j))
    val vc = if (v(jstar) < 0f) v.map(x => -x) else v
    val top = vc.zipWithIndex
      .sortBy { case (w, j) => (-math.abs(w), j) }.take(8).zipWithIndex
      .map { case ((w, j), r) => (r + 1, j, w.toDouble) }.toSeq
      .toDF("rnk", "dim", "weight")
    val e = Tables.fanout(Tables.table(spark, dir, "embeddings"))
    val ray = e
      .select(graft.functions.Vec.vdot(col("embedding"),
        typedlit(vc.toSeq)).as("s"))
      .agg((sum((col("s") * col("s")).cast("decimal(30,6)")).cast("double")
        / count(lit(1))).as("rayleigh"),
        count(lit(1)).as("n_vectors"))
    top.crossJoin(broadcast(ray)).orderBy("rnk")
  }

  val sPcaPowerSql: String = {
    val rounds = 5
    val iter = (1 to rounds).map { r =>
      val p = r - 1
      s"""sc$r AS (
         |  SELECT e.vec_id,
         |    list_sum([CAST(e.embedding[i] AS DOUBLE) * v.vw[i]
         |              for i in generate_series(1, $dIn)]) AS score
         |  FROM n e CROSS JOIN v${p}l v),
         |u$r AS (
         |  SELECT t.i AS dim,
         |    CAST(SUM(CAST(CAST(e.embedding[t.i] AS DOUBLE) * s.score
         |             AS DECIMAL(30,6))) AS DOUBLE) AS raw
         |  FROM sc$r s JOIN n e USING (vec_id)
         |  CROSS JOIN generate_series(1, $dIn) t(i)
         |  GROUP BY 1),
         |ul$r AS (SELECT list(raw ORDER BY dim) AS rl FROM u$r),
         |v${r}l AS (
         |  SELECT [CAST(CAST(rl[i] / sqrt(list_sum([rl[j]*rl[j]
         |            for j in generate_series(1, $dIn)])) AS REAL) AS DOUBLE)
         |          for i in generate_series(1, $dIn)] AS vw
         |  FROM ul$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH n AS (SELECT vec_id, embedding FROM embeddings),
       |v0l AS (
       |  SELECT [CASE WHEN i = 1 THEN 1.0e0 ELSE 0.0e0 END
       |          for i in generate_series(1, $dIn)] AS vw),
       |$iter,
       |wq AS (
       |  SELECT CAST(t.i - 1 AS INTEGER) AS dim, v.vw[t.i] AS w
       |  FROM v${rounds}l v CROSS JOIN generate_series(1, $dIn) t(i)),
       |fl AS (
       |  SELECT CASE WHEN (SELECT w FROM wq ORDER BY abs(w) DESC, dim LIMIT 1) < 0
       |         THEN -1.0e0 ELSE 1.0e0 END AS f),
       |wf AS (SELECT dim, w * f AS weight FROM wq, fl),
       |top AS (
       |  SELECT CAST(row_number() OVER (ORDER BY abs(weight) DESC, dim) AS INTEGER) AS rnk,
       |         dim, weight
       |  FROM wf),
      |scf AS (
       |  SELECT list_sum([CAST(e.embedding[i] AS DOUBLE) * v.vw[i]
       |                   for i in generate_series(1, $dIn)]) AS score
       |  FROM n e CROSS JOIN v${rounds}l v),
       |ray AS (
       |  SELECT CAST(SUM(CAST(s.score * s.score AS DECIMAL(30,6))) AS DOUBLE)
       |           / COUNT(*) AS rayleigh,
       |         CAST(COUNT(*) AS BIGINT) AS n_vectors
       |  FROM scf s)
       |SELECT rnk, dim, weight, rayleigh, n_vectors
       |FROM top, ray WHERE rnk <= 8 ORDER BY rnk""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_jl_project" -> (sJlProject _),
    "s_pca_power" -> (sPcaPower _))

  val oracles: Map[String, String] = Map(
    "s_jl_project" -> sJlProjectSql,
    "s_pca_power" -> sPcaPowerSql)
}
