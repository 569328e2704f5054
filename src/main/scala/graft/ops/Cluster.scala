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

  private def withNorm(spark: SparkSession, dir: String): DataFrame =
    Tables.fanout(Tables.table(spark, dir, "embeddings"))
      .select(col("vec_id"), col("embedding"), norm2(col("embedding")).as("nrm"))

  /** cosine of each row against every centroid, as codegen'd literal vdots */
  private def sims(cents: Array[Array[Float]])(emb: Column, nrm: Column): Seq[Column] =
    cents.toSeq.map { cvec =>
      val cn = math.sqrt(cvec.map(x => x.toDouble * x.toDouble).sum)
      dot(emb, typedlit(cvec.toSeq)) / (nrm * lit(cn))
    }

  /** 1-based argmax over the centroid cosines → 0-based cell id */
  private def argmax(cents: Array[Array[Float]])(emb: Column, nrm: Column): Column = {
    val s = array(sims(cents)(emb, nrm): _*)
    (array_position(s, array_max(s)) - 1).cast("int")
  }

  /** One Lloyd round: assign distributed, average distributed, only the
    * k×d centroid matrix collected (model parameters, not data). */
  private def step(e: DataFrame, cents: Array[Array[Float]]): Array[Array[Float]] = {
    val d = cents(0).length
    val means = e
      .select(argmax(cents)(col("embedding"), col("nrm")).as("cell"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("cell", "dim").agg(avg(col("v")).as("m"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    cents.indices.toArray.map { c =>
      if (means.contains((c, 0)))
        Array.tabulate(d)(j => means((c, j)).toFloat)
      else cents(c) // empty cell: keep old centroid
    }
  }

  /** deterministic init: the k lowest-vec_id vectors */
  private def init(spark: SparkSession, dir: String, k: Int): Array[Array[Float]] =
    Tables.table(spark, dir, "embeddings")
      .orderBy("vec_id").limit(k)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)

  private[graft] def train(spark: SparkSession, dir: String,
                           k: Int, rounds: Int): Array[Array[Float]] = {
    val e = withNorm(spark, dir)
    (1 to rounds).foldLeft(init(spark, dir, k))((c, _) => step(e, c))
  }

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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_kmeans_train" -> (sKmeansTrain _))

  val oracles: Map[String, String] = Map.empty
}
