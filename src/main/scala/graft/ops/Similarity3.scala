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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_jl_project" -> (sJlProject _))

  val oracles: Map[String, String] = Map(
    "s_jl_project" -> sJlProjectSql)
}
