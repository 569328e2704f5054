package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.5 addition (round 4): DISTRIBUTED spherical k-means training over the
  * embeddings table — the index-build path that closes the 100 TB ANN story.
  *
  * The IVF/PQ family (Similarity.scala) trains its quantizers on a bounded
  * 256-vector driver-side sample: statistically fine for codebooks, but the
  * corpus never participates. This operator is the full Lloyd iteration with
  * the DATA staying distributed end-to-end:
  *
  *  - assign:   argmax cosine against k broadcast centroid literals — a
  *              codegen'd scan projection (reuses the [[Similarity]] argmax
  *              shape), zero shuffle;
  *  - update:   posexplode(embedding) → groupBy(cell, dim) avg — one
  *              map-side-combined aggregate whose shuffle is k×d rows PER
  *              PARTITION, independent of corpus size;
  *  - model:    only the k×d centroid matrix (512 floats here) crosses to
  *              the driver between rounds — model-parameter scale, the same
  *              class as a broadcast dim table, NOT a data collect.
  *
  * Spherical (cosine) k-means because embeddings are direction-coded; each
  * new centroid is re-normalized implicitly by the cosine assignment.
  * Init is deterministic: the k lowest-vec_id vectors (no RNG — rerun-stable,
  * like p_sample_stratified's hash sampling). Empty cells keep their old
  * centroid. ClusterSpec pins: inertia non-increasing across rounds, final
  * assignment = argmax of final centroids, and determinism across runs.
  *
  * Approximate/iterative → rows-only driver check + spec.
  */
object Cluster {

  private def dot(a: Column, b: Column): Column = graft.functions.Vec.vdot(a, b)
  private def norm2(a: Column): Column = graft.functions.Vec.vnorm(a)

  private[ops] def withNorm(spark: SparkSession, dir: String): DataFrame =
    Tables.fanout(Tables.table(spark, dir, "embeddings"))
      .select(col("vec_id"), col("embedding"), norm2(col("embedding")).as("nrm"))

  /** cosine of each row against every centroid, as codegen'd literal vdots */
  private def sims(cents: Array[Array[Float]])(emb: Column, nrm: Column): Seq[Column] =
    cents.toSeq.map { cvec =>
      val cn = math.sqrt(cvec.map(x => x.toDouble * x.toDouble).sum)
      dot(emb, typedlit(cvec.toSeq)) / (nrm * lit(cn))
    }

  /** 1-based argmax over the centroid cosines → 0-based cell id */
  private[ops] def argmax(cents: Array[Array[Float]])(emb: Column, nrm: Column): Column = {
    val s = array(sims(cents)(emb, nrm): _*)
    (array_position(s, array_max(s)) - 1).cast("int")
  }

  /** One Lloyd round: assign distributed, average distributed, only the
    * k×d centroid matrix collected (model parameters, not data).
    *
    * The per-dim mean is a DECIMAL sum / count, not avg(): double
    * summation order varies with partitioning, so avg() makes training
    * bit-NONdeterministic on a real cluster (different run → different
    * model) — the §4 rule applied to ML state. The decimal mean is
    * associative (bit-stable at any partitioning) and replayable in SQL,
    * which is what lets s_kmeans_train carry a full DuckDB oracle;
    * `.toFloat` (the stored model precision) is mirrored by CAST(AS REAL). */
  private def step(e: DataFrame, cents: Array[Array[Float]]): Array[Array[Float]] = {
    val d = cents(0).length
    val means = e
      .select(argmax(cents)(col("embedding"), col("nrm")).as("cell"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("cell", "dim")
      .agg((sum(col("v").cast("double").cast("decimal(30,6)")).cast("double")
        / count(lit(1))).as("m"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    cents.indices.toArray.map { c =>
      if (means.contains((c, 0)))
        Array.tabulate(d)(j => means((c, j)).toFloat)
      else cents(c) // empty cell: keep old centroid
    }
  }

  /** deterministic init: the k lowest-vec_id vectors of `e` */
  private def initOf(e: DataFrame, k: Int): Array[Array[Float]] =
    e.orderBy("vec_id").limit(k)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)

  /** Lloyd over an arbitrary (vec_id, embedding, nrm) frame — the
    * full-corpus trainer below and the frozen-index append op both ride
    * this. `space` names the frame for the bench-only [[ModelCache]]. */
  private[ops] def trainOn(e: DataFrame, k: Int, rounds: Int,
                           space: String): Array[Array[Float]] =
    // bench-only build/query split: training is bit-deterministic in
    // (data, recipe), so the memo returns the identical model
    ModelCache.memo(s"lloyd:$space:k=$k:rounds=$rounds") {
      (1 to rounds).foldLeft(initOf(e, k))((c, _) => step(e, c))
    }

  private[graft] def train(spark: SparkSession, dir: String,
                           k: Int, rounds: Int): Array[Array[Float]] =
    trainOn(withNorm(spark, dir), k, rounds, space = dir)

  /** Mean cosine distance (1 − cos to assigned centroid) under `cents` —
    * the spherical-k-means objective; ClusterSpec asserts it never
    * increases across Lloyd rounds. */
  private[graft] def inertia(spark: SparkSession, dir: String,
                             cents: Array[Array[Float]]): Double = {
    val e = withNorm(spark, dir)
    val s = array(sims(cents)(col("embedding"), col("nrm")): _*)
    e.select(avg(lit(1.0) - array_max(s)).as("j")).collect()(0).getDouble(0)
  }

  /** Driver-facing op: 3 Lloyd rounds, then per-cluster population and
    * cohesion. Deterministic end-to-end (seeded init, argmax ties break
    * low) — but iterative/multi-job, so rows-only driver check. */
  def sKmeansTrain(spark: SparkSession, dir: String): DataFrame = {
    val cents = train(spark, dir, k = 8, rounds = 3)
    val e = withNorm(spark, dir)
    e.select(argmax(cents)(col("embedding"), col("nrm")).as("cell"),
        (array_max(array(sims(cents)(col("embedding"), col("nrm")): _*)))
          .as("cos"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_members"),
        round(Tables.davg(col("cos")), 6).as("mean_cos"))
      .orderBy("cell")
  }

  /** Full SQL replay of the 3 Lloyd rounds — what the decimal-mean update
    * buys: training is pure deterministic arithmetic (in-order double
    * dots, decimal-exact means, float32 model truncation as CAST AS REAL,
    * lowest-cell tie-break as a struct max), so DuckDB reproduces the
    * MODEL bit-for-bit and the op graduates from rows-only to hash-gated —
    * an iterative ML trainer with an exact cross-engine oracle. */
  /** cos(row, centroid) fragment against a centroid list column. */
  private[ops] def cosSql(emb: String, nrm: String, cv: String): String =
    s"""list_sum([CAST($emb[i] AS DOUBLE) * $cv[i]
       |             for i in generate_series(1, 64)])
       |      / ($nrm * sqrt(list_sum([$cv[i]*$cv[i]
       |             for i in generate_series(1, 64)])))""".stripMargin

  /** The Lloyd CTE chain (`n`, `c0`, per-round assign/update/recenter up
    * to `c<rounds>`) — the WITH-body fragment shared by the k-means oracle
    * and every IVF oracle that probes [[train]]'s cells. `prefix` renames
    * every CTE (`<prefix>n`, `<prefix>c0`, …) so TWO chains can coexist in
    * one query — the rebalance oracle trains a sub-quantizer on the heavy
    * cell's members inside the same WITH body. */
  private[ops] def lloydCtes(k: Int, rounds: Int,
                             src: String = "embeddings",
                             prefix: String = ""): String = {
    val base =
      s"""${prefix}n AS (
         |  SELECT vec_id, embedding,
         |    sqrt(list_sum([CAST(embedding[i] AS DOUBLE)*CAST(embedding[i] AS DOUBLE)
         |                   for i in generate_series(1, len(embedding))])) AS nrm
         |  FROM $src),
         |${prefix}c0 AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
         |    [CAST(embedding[i] AS DOUBLE) for i in generate_series(1, 64)] AS cv
         |  FROM (SELECT vec_id, embedding FROM $src ORDER BY vec_id LIMIT $k))""".stripMargin
    val roundCtes = (1 to rounds).map { r =>
      val p = r - 1
      s"""${prefix}as$r AS (
         |  SELECT e.vec_id,
         |    max(struct_pack(cos := ${cosSql("e.embedding", "e.nrm", "c.cv")},
         |                    nc := -c.cell)) AS w
         |  FROM ${prefix}n e CROSS JOIN ${prefix}c$p c GROUP BY 1),
         |${prefix}up$r AS (
         |  SELECT -(w.nc) AS cell, t.i AS dim,
         |    CAST(CAST(CAST(SUM(CAST(CAST(e.embedding[t.i] AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE)
         |         / COUNT(*) AS REAL) AS DOUBLE) AS m
         |  FROM ${prefix}as$r JOIN ${prefix}n e USING (vec_id)
         |  CROSS JOIN generate_series(1, 64) t(i)
         |  GROUP BY 1, 2),
         |${prefix}c$r AS (
         |  SELECT p.cell, list(coalesce(u.m, p.cv[d.i]) ORDER BY d.i) AS cv
         |  FROM ${prefix}c$p p CROSS JOIN generate_series(1, 64) d(i)
         |  LEFT JOIN ${prefix}up$r u ON u.cell = p.cell AND u.dim = d.i
         |  GROUP BY 1)""".stripMargin
    }
    (base +: roundCtes).mkString(",\n")
  }

  val sKmeansTrainSql: String = {
    val rounds = 3
    s"""WITH ${lloydCtes(k = 8, rounds = rounds)},
       |fin AS (
       |  SELECT e.vec_id,
       |    max(struct_pack(cos := ${cosSql("e.embedding", "e.nrm", "c.cv")},
       |                    nc := -c.cell)) AS w
       |  FROM n e CROSS JOIN c$rounds c GROUP BY 1)
       |SELECT CAST(-(w.nc) AS INT) AS cell, COUNT(*) AS n_members,
       |  round(CAST(SUM(CAST(w.cos AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*), 6) AS mean_cos
       |FROM fin GROUP BY 1 ORDER BY cell""".stripMargin
  }

  /** Incremental index maintenance (r7) — the APPEND path a deployed
    * 100 TB ANN index actually runs: the quantizer was trained on the
    * corpus as of index build; new vectors arrive and are assigned to the
    * FROZEN cells (no retrain), and the maintainer watches per-cell append
    * counts and cohesion to decide when drift justifies a rebuild.
    * Simulated split: build corpus = vec_id % 10 != 7 (cells trained on it
    * alone), append batch = the other 10%.
    *
    * Scale shape: the append touches ONLY the new batch — assignment is
    * argmax over k broadcast centroid literals in the scan projection
    * (zero shuffle, embarrassingly parallel), the drift report is one
    * map-side-combined groupBy(cell) whose output is k rows. Existing
    * members are never re-read in a real deployment; the n_old column here
    * re-derives their counts only so the oracle can prove the frozen-cell
    * contract on both populations. */
  def sIndexAppend(spark: SparkSession, dir: String): DataFrame = {
    val all = withNorm(spark, dir)
    val old = all.where(col("vec_id") % 10 =!= 7)
    val newb = all.where(col("vec_id") % 10 === 7)
    val cents = trainOn(old, k = 8, rounds = 3, space = s"$dir:mod10ne7")
    def assigned(e: DataFrame): DataFrame = e.select(
      argmax(cents)(col("embedding"), col("nrm")).as("cell"),
      array_max(array(sims(cents)(col("embedding"), col("nrm")): _*)).as("cos"))
    val oldCnt = assigned(old).groupBy("cell").agg(count(lit(1)).as("n_old"))
    val newAgg = assigned(newb).groupBy("cell")
      .agg(count(lit(1)).as("n_new"),
        round(Tables.davg(col("cos")), 6).as("mean_cos_new"))
    val cells = spark.range(0, 8).select(col("id").cast("int").as("cell"))
    cells.join(oldCnt, Seq("cell"), "left").join(newAgg, Seq("cell"), "left")
      .select(col("cell"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        col("mean_cos_new"))
      .orderBy("cell")
  }

  val sIndexAppendSql: String = {
    val rounds = 3
    s"""WITH old AS (
       |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 != 7),
       |${lloydCtes(k = 8, rounds = rounds, src = "old")},
       |nn AS (
       |  SELECT vec_id, embedding,
       |    sqrt(list_sum([CAST(embedding[i] AS DOUBLE)*CAST(embedding[i] AS DOUBLE)
       |                   for i in generate_series(1, len(embedding))])) AS nrm
       |  FROM embeddings WHERE vec_id % 10 = 7),
       |aso AS (
       |  SELECT e.vec_id,
       |    max(struct_pack(cos := ${cosSql("e.embedding", "e.nrm", "c.cv")},
       |                    nc := -c.cell)) AS w
       |  FROM n e CROSS JOIN c$rounds c GROUP BY 1),
       |asn AS (
       |  SELECT e.vec_id,
       |    max(struct_pack(cos := ${cosSql("e.embedding", "e.nrm", "c.cv")},
       |                    nc := -c.cell)) AS w
       |  FROM nn e CROSS JOIN c$rounds c GROUP BY 1),
       |oldc AS (
       |  SELECT CAST(-(w.nc) AS INT) AS cell, COUNT(*) AS n_old
       |  FROM aso GROUP BY 1),
       |newc AS (
       |  SELECT CAST(-(w.nc) AS INT) AS cell, COUNT(*) AS n_new,
       |    round(CAST(SUM(CAST(w.cos AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*), 6)
       |      AS mean_cos_new
       |  FROM asn GROUP BY 1),
       |cells AS (SELECT CAST(cell AS INT) AS cell FROM c$rounds)
       |SELECT c.cell, CAST(coalesce(o.n_old, 0) AS BIGINT) AS n_old,
       |  CAST(coalesce(nw.n_new, 0) AS BIGINT) AS n_new, nw.mean_cos_new
       |FROM cells c
       |LEFT JOIN oldc o USING (cell) LEFT JOIN newc nw USING (cell)
       |ORDER BY c.cell""".stripMargin
  }

  /** IVF index-balance telemetry — the number faiss prints after every
    * coarse-quantizer build: imbalance factor k·Σc²/(Σc)² (1 = perfectly
    * balanced; probe cost scales with it because query latency follows the
    * probed cells' sizes), plus min/max/empty cell counts over the FULL
    * k-cell spine (an empty cell is an index defect — it must appear, not
    * vanish from the groupBy). Exact integer end-to-end: counts, squares,
    * one ppm division. s_ann_recall measures the index's RECALL; this op
    * measures its COST SHAPE — the two numbers an operator tunes nlist
    * against. One scan-projection assignment + k-row rollup. */
  def sIvfImbalance(spark: SparkSession, dir: String): DataFrame = {
    val cents = train(spark, dir, k = 8, rounds = 3)
    val e = withNorm(spark, dir)
    val counts = e
      .select(argmax(cents)(col("embedding"), col("nrm")).as("cell"))
      .groupBy("cell").agg(count(lit(1)).as("c"))
    val spine = spark.range(0, 8).select(col("id").cast("int").as("cell"))
    spine.join(counts, Seq("cell"), "left")
      .select(coalesce(col("c"), lit(0L)).as("c"))
      .agg(count(lit(1)).cast("long").as("n_cells"),
        sum("c").cast("long").as("n_vectors"),
        min("c").cast("long").as("min_cell"),
        max("c").cast("long").as("max_cell"),
        sum(when(col("c") === 0L, 1L).otherwise(0L)).cast("long").as("n_empty"),
        sum(col("c") * col("c")).cast("long").as("scc"))
      .select(col("n_cells"), col("n_vectors"), col("min_cell"),
        col("max_cell"), col("n_empty"),
        expr("(8000000 * scc) div (n_vectors * n_vectors)").as("imbalance_ppm"))
  }

  val sIvfImbalanceSql: String = {
    val rounds = 3
    s"""WITH ${lloydCtes(k = 8, rounds = rounds)},
       |fin AS (
       |  SELECT e.vec_id,
       |    max(struct_pack(cos := ${cosSql("e.embedding", "e.nrm", "c.cv")},
       |                    nc := -c.cell)) AS w
       |  FROM n e CROSS JOIN c$rounds c GROUP BY 1),
       |cnt AS (SELECT -(w.nc) AS cell, CAST(COUNT(*) AS BIGINT) AS c
       |        FROM fin GROUP BY 1),
       |spine AS (SELECT unnest(generate_series(0, 7)) AS cell),
       |f AS (SELECT s.cell, COALESCE(cnt.c, 0) AS c
       |      FROM spine s LEFT JOIN cnt ON cnt.cell = s.cell)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       |  CAST(SUM(c) AS BIGINT) AS n_vectors,
       |  CAST(MIN(c) AS BIGINT) AS min_cell,
       |  CAST(MAX(c) AS BIGINT) AS max_cell,
       |  CAST(SUM(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
       |  CAST((8000000 * SUM(c*c)) // (SUM(c) * SUM(c)) AS BIGINT) AS imbalance_ppm
       |FROM f""".stripMargin
  }

  /** IVF REBALANCE (r8) — the maintenance verb s_ivf_imbalance's telemetry
    * exists to trigger: the heaviest cell (the one that dominates probe
    * latency) is SPLIT by a 2-means sub-quantizer trained on its members
    * alone, relabeling only those members (every other cell's assignment —
    * and therefore its posting list — is untouched, which is what makes
    * the operation incremental: at 100 TB a rebalance re-reads one cell's
    * vectors, never the index). Deterministic end-to-end: the same Lloyd
    * recipe as the full build (decimal means, lowest-vec_id init, low-cell
    * tie-break) applied to the member subset, so the whole split replays
    * in DuckDB and the op is hash-gated. Output: the 9-cell census after
    * the split over the full 0..8 spine (vanished cells surface as 0),
    * with the split provenance (split_cell, max_before) on every row.
    * Round8Spec asserts the balance actually improved. */
  def sIvfRebalance(spark: SparkSession, dir: String): DataFrame = {
    val cents = train(spark, dir, k = 8, rounds = 3)
    val e = withNorm(spark, dir)
    val assigned = e.select(col("vec_id"), col("embedding"), col("nrm"),
      argmax(cents)(col("embedding"), col("nrm")).as("cell")).cache()
    // k-row census to the driver (model/metadata scale) to pick the split
    val counts = assigned.groupBy("cell").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val (heavy, heavyN) = counts.sortBy { case (c, n) => (-n, c) }.head
    val sub = trainOn(assigned.where(col("cell") === heavy)
        .select("vec_id", "embedding", "nrm"),
      k = 2, rounds = 2, space = s"$dir:rebalance:c$heavy")
    val relabeled = assigned.withColumn("new_cell",
      when(col("cell") =!= heavy, col("cell"))
        .otherwise(when(argmax(sub)(col("embedding"), col("nrm")) === 0,
          lit(heavy)).otherwise(lit(8))).cast("int"))
    val spine = spark.range(0, 9).select(col("id").cast("int").as("cell"))
    spine.join(
        relabeled.groupBy(col("new_cell").as("cell"))
          .agg(count(lit(1)).as("n")),
        Seq("cell"), "left")
      .select(col("cell"), coalesce(col("n"), lit(0L)).as("n_members"),
        (col("cell") === heavy || col("cell") === 8).as("from_split"),
        lit(heavy).as("split_cell"), lit(heavyN).as("max_before"))
      .orderBy("cell")
  }

  val sIvfRebalanceSql: String = {
    val rounds = 3
    s"""WITH ${lloydCtes(k = 8, rounds = rounds)},
       |fin AS (
       |  SELECT e.vec_id,
       |    max(struct_pack(cos := ${cosSql("e.embedding", "e.nrm", "c.cv")},
       |                    nc := -c.cell)) AS w
       |  FROM n e CROSS JOIN c$rounds c GROUP BY 1),
       |asg AS (SELECT vec_id, CAST(-(w.nc) AS INT) AS cell FROM fin),
       |cnt AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS c FROM asg GROUP BY 1),
       |heavy AS (SELECT cell, c FROM cnt ORDER BY c DESC, cell LIMIT 1),
       |members AS (
       |  SELECT e.vec_id, e.embedding
       |  FROM embeddings e JOIN asg a USING (vec_id)
       |  WHERE a.cell = (SELECT cell FROM heavy)),
       |${lloydCtes(k = 2, rounds = 2, src = "members", prefix = "s")},
       |sfin AS (
       |  SELECT e.vec_id,
       |    max(struct_pack(cos := ${cosSql("e.embedding", "e.nrm", "c.cv")},
       |                    nc := -c.cell)) AS w
       |  FROM sn e CROSS JOIN sc2 c GROUP BY 1),
       |sasg AS (SELECT vec_id, CAST(-(w.nc) AS INT) AS subcell FROM sfin),
       |relab AS (
       |  SELECT a.vec_id,
       |    CASE WHEN a.cell <> (SELECT cell FROM heavy) THEN a.cell
       |         WHEN s.subcell = 0 THEN a.cell ELSE 8 END AS cell
       |  FROM asg a LEFT JOIN sasg s USING (vec_id)),
       |rc AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n FROM relab GROUP BY 1),
       |spine AS (SELECT unnest(generate_series(0, 8)) AS cell)
       |SELECT CAST(sp.cell AS INT) AS cell,
       |  CAST(COALESCE(rc.n, 0) AS BIGINT) AS n_members,
       |  (sp.cell = (SELECT cell FROM heavy) OR sp.cell = 8) AS from_split,
       |  CAST((SELECT cell FROM heavy) AS INT) AS split_cell,
       |  (SELECT c FROM heavy) AS max_before
       |FROM spine sp LEFT JOIN rc ON rc.cell = sp.cell
       |ORDER BY sp.cell""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_kmeans_train" -> (sKmeansTrain _),
    "s_index_append" -> (sIndexAppend _),
    "s_ivf_imbalance" -> (sIvfImbalance _),
    "s_ivf_rebalance" -> (sIvfRebalance _))

  val oracles: Map[String, String] = Map(
    "s_kmeans_train" -> sKmeansTrainSql,
    "s_index_append" -> sIndexAppendSql,
    "s_ivf_imbalance" -> sIvfImbalanceSql,
    "s_ivf_rebalance" -> sIvfRebalanceSql)
}
