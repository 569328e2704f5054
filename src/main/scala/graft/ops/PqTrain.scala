package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed product-quantization codebook training (round 6 — VERDICT r5
  * task 2: the last driver-sample collect in the ANN ladder becomes a full
  * in-cluster trainer, and PQ assignment becomes engine-portable arithmetic
  * so the PQ tiers graduate from rows-only to hash-gated).
  *
  * Per-subspace Lloyd, the [[Cluster]] recipe applied m times in ONE pass
  * per round:
  *  - assign:  [[graft.functions.PqEncode]] — the SAME codegen expression
  *             the index build uses IS the training assignment (L2 argmin
  *             per subvector, first-wins ties), zero shuffle;
  *  - update:  posexplode(embedding) keyed by (subspace, assigned cell,
  *             dim-in-subspace) → decimal-mean aggregate: associative, so
  *             bit-stable at any partitioning (§4 rule), and replayable in
  *             SQL — which is what makes the oracle possible;
  *  - model:   m × kCent × (dims/m) floats (= dims·kCent = 1024 values
  *             here) cross to the driver per round — model-parameter scale,
  *             independent of corpus size.
  *
  * Init is deterministic: the kCent lowest-vec_id vectors, sliced per
  * subspace (no RNG, rerun- and engine-stable). Empty cells keep their
  * previous centroid. Stored model precision is float32 (`.toFloat`),
  * mirrored in SQL as CAST(AS REAL).
  *
  * The DuckDB replay ([[pqCtes]]/[[encodeCtes]]) re-trains the codebook as
  * chained CTEs over a source CTE `(vec_id, emb LIST(DOUBLE))` whose values
  * are float-exact doubles, re-encodes the corpus, and ADC-scores with the
  * identical flat left-fold — so the approximate PQ shortlist, including
  * what it misses, is a deterministic function of (data, recipe), not of
  * the engine. Reference capability anchor: SELECT post-processing over one
  * table (IcebergConnection.py:99-131); the ANN ladder itself is the
  * SURVEY §2 training-data extension.
  */
object PqTrain {

  /** Train m per-subspace codebooks over `e` = (vec_id, embedding
    * array<float> of `dims`). Returns codebook(sub)(cell)(dimInSub).
    * `space` names the input frame for the bench-only [[ModelCache]]
    * (e.g. "<dir>:raw" vs "<dir>:opq" — a DataFrame can't key a cache);
    * training is bit-deterministic, so the memo returns the same model. */
  private[ops] def train(e: DataFrame, dims: Int, m: Int, kCent: Int,
                         rounds: Int, space: String): Seq[Seq[Seq[Float]]] =
    ModelCache.memo(s"pq:$space:dims=$dims:m=$m:k=$kCent:rounds=$rounds") {
      trainUncached(e, dims, m, kCent, rounds)
    }

  private def trainUncached(e: DataFrame, dims: Int, m: Int, kCent: Int,
                            rounds: Int): Seq[Seq[Seq[Float]]] = {
    val sub = dims / m
    val seeds = e.orderBy("vec_id").limit(kCent)
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    var cb: Array[Array[Array[Float]]] =
      Array.tabulate(m)(s => seeds.map(v => v.slice(s * sub, (s + 1) * sub)))
    for (_ <- 1 to rounds) {
      val cbSeq: Seq[Seq[Seq[Float]]] = cb.map(_.map(_.toSeq).toSeq).toSeq
      val subIdx = expr(s"CAST(dim div $sub AS INT)")
      val means = e.select(
          graft.functions.Sketch.pqEncode(col("embedding"), cbSeq).as("codes"),
          posexplode(col("embedding")).as(Seq("dim", "v")))
        .select(subIdx.as("sub"),
          expr(s"CAST(dim % $sub AS INT) + 1").as("d"),
          element_at(col("codes"), subIdx + 1).as("cell"),
          col("v"))
        .groupBy("sub", "cell", "d")
        .agg((sum(col("v").cast("double").cast("decimal(30,6)")).cast("double")
          / count(lit(1))).as("mn"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)), r.getDouble(3)))
        .toMap
      cb = Array.tabulate(m) { s =>
        Array.tabulate(kCent) { c =>
          if (means.contains((s, c, 1)))
            Array.tabulate(sub)(j => means((s, c, j + 1)).toFloat)
          else cb(s)(c) // empty cell: keep previous — deterministic
        }
      }
    }
    cb.map(_.map(_.toSeq).toSeq).toSeq
  }

  /** The per-subspace squared-L2 fragment against codebook row `c` (cv of
    * length dims/m) for source row `e` — in-order double fold, the exact
    * arithmetic of PqEncode's inner loop. */
  private def distSql(sub: Int): String =
    s"""list_sum([(e.emb[c.sub*$sub+j] - c.cv[j]) * (e.emb[c.sub*$sub+j] - c.cv[j])
       |                 for j in generate_series(1, $sub)])""".stripMargin

  /** CTE chain re-training the codebook from source CTE `src(vec_id, emb
    * LIST(DOUBLE) float-exact)`: ps (seeds), pc0 (init), then per round
    * pa/pu/pc — final codebook is `pc<rounds>(sub, cell, cv)`. */
  private[ops] def pqCtes(src: String, dims: Int, m: Int, kCent: Int,
                          rounds: Int): String = {
    val sub = dims / m
    val base =
      s"""ps AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, emb
         |  FROM (SELECT vec_id, emb FROM $src ORDER BY vec_id LIMIT $kCent)),
         |pc0 AS (
         |  SELECT t.s AS sub, cell,
         |    [emb[t.s*$sub + j] for j in generate_series(1, $sub)] AS cv
         |  FROM ps CROSS JOIN generate_series(0, ${m - 1}) t(s))""".stripMargin
    val roundCtes = (1 to rounds).map { r =>
      val p = r - 1
      s"""pa$r AS (
         |  SELECT e.vec_id, c.sub,
         |    max(struct_pack(negd := -${distSql(sub)},
         |                    nc := -c.cell)) AS w
         |  FROM $src e CROSS JOIN pc$p c GROUP BY 1, 2),
         |pu$r AS (
         |  SELECT a.sub, -(a.w.nc) AS cell, t.j AS d,
         |    CAST(CAST(CAST(SUM(CAST(e.emb[a.sub*$sub + t.j] AS DECIMAL(30,6))) AS DOUBLE)
         |         / COUNT(*) AS REAL) AS DOUBLE) AS mn
         |  FROM pa$r a JOIN $src e USING (vec_id)
         |  CROSS JOIN generate_series(1, $sub) t(j)
         |  GROUP BY 1, 2, 3),
         |pc$r AS (
         |  SELECT p.sub, p.cell, list(coalesce(u.mn, p.cv[d.j]) ORDER BY d.j) AS cv
         |  FROM pc$p p CROSS JOIN generate_series(1, $sub) d(j)
         |  LEFT JOIN pu$r u ON u.sub = p.sub AND u.cell = p.cell AND u.d = d.j
         |  GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    base + ",\n" + roundCtes
  }

  /** CTE pair re-encoding `src` with the final codebook `pcFinal` and
    * flattening each row's 8 centroids into one dims-long list `fcv` (sub
    * order), so ADC is a flat in-order 64-term fold — the exact arithmetic
    * of PqAdc's accumulator. */
  private[ops] def encodeCtes(src: String, pcFinal: String, dims: Int,
                              m: Int): String = {
    val sub = dims / m
    s"""enc AS (
       |  SELECT e.vec_id, c.sub,
       |    max(struct_pack(negd := -${distSql(sub)},
       |                    nc := -c.cell)) AS w
       |  FROM $src e CROSS JOIN $pcFinal c GROUP BY 1, 2),
       |fc AS (
       |  SELECT en.vec_id, flatten(list(c.cv ORDER BY en.sub)) AS fcv
       |  FROM (SELECT vec_id, sub, -(w.nc) AS cell FROM enc) en
       |  JOIN $pcFinal c ON c.sub = en.sub AND c.cell = en.cell
       |  GROUP BY en.vec_id)""".stripMargin
  }

  /** Source CTE exposing raw embeddings as float-exact doubles plus the
    * exact L2 norm — shared head of every PQ-family oracle. */
  private[ops] def srcCte(dims: Int): String =
    s"""pn AS (
       |  SELECT vec_id,
       |    [CAST(embedding[i] AS DOUBLE) for i in generate_series(1, $dims)] AS emb,
       |    sqrt(list_sum([CAST(embedding[i] AS DOUBLE)*CAST(embedding[i] AS DOUBLE)
       |                   for i in generate_series(1, $dims)])) AS nrm
       |  FROM embeddings)""".stripMargin

  /** Full-corpus ADC scan CTE: every (query, corpus) pair scored by the
    * flat in-order 64-term fold — the exact arithmetic of PqAdc's
    * accumulator. `qsrc` supplies the query emb the ADC uses (rotated for
    * OPQ, raw for PQ). */
  private[ops] def crossAdcCte(qsrc: String, dims: Int): String =
    s"""adc AS (
       |  SELECT q.vec_id AS q_id, f.vec_id,
       |    list_sum([q.emb[i] * f.fcv[i] for i in generate_series(1, $dims)]) AS adc
       |  FROM $qsrc q JOIN fc f ON f.vec_id <> q.vec_id
       |  WHERE q.vec_id % 20 = 0 AND q.vec_id < 20000)""".stripMargin

  /** Top-50 ADC shortlist + exact re-rank in ORIGINAL space (`pn`) + final
    * top-5 — the tail shared by all PQ-family oracles; expects an `adc`
    * CTE with (q_id, vec_id, adc). */
  private[ops] def rankTail(dims: Int): String =
    s"""short AS (
       |  SELECT q_id, vec_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY adc DESC, vec_id) AS r
       |  FROM adc),
       |scored AS (
       |  SELECT s.q_id, s.vec_id,
       |    round(list_sum([q.emb[i] * c.emb[i] for i in generate_series(1, $dims)])
       |          / (q.nrm * c.nrm), 6) AS cosine
       |  FROM (SELECT q_id, vec_id FROM short WHERE r <= 50) s
       |  JOIN pn q ON q.vec_id = s.q_id JOIN pn c ON c.vec_id = s.vec_id),
       |ranked AS (
       |  SELECT q_id, vec_id, cosine,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rnk
       |  FROM scored)
       |SELECT q_id, CAST(rnk AS INTEGER) AS rnk, vec_id, cosine
       |FROM ranked WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin

  /** Render a Double as a DuckDB DOUBLE literal: bare decimal literals
    * parse as DECIMAL there, so force the float type with an exponent. */
  private[ops] def fmtD(x: Double): String = {
    val s = x.toString
    if (s.contains('E') || s.contains('e')) s else s + "e0"
  }
}
