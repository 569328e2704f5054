package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.5 Similarity search, part 5 (round 12): the DELETE path of a deployed
  * ANN index — the lifecycle face [[Cluster.sIndexAppend]] (insert) and
  * [[Cluster.sIvfRebalance]] (retrain trigger) leave open. Real vector
  * indexes never rewrite on delete: faiss `remove_ids` and DiskANN's lazy
  * delete both TOMBSTONE the ids (searches filter them at probe time) and
  * physically re-pack a posting list only when its tombstone mass crosses a
  * threshold — exactly the MOR-delete contract the catalog family gates on
  * tables, applied to index postings.
  */
object Similarity5 {

  /** Tombstone-delete report under the frozen full-corpus quantizer
    * (k=8, 3 Lloyd rounds — the family's shared coarse index): ids with
    * vec_id % 9 = 4 (≈11%, "a source got retracted") are tombstoned; per
    * cell the report carries live-before/tombstoned/live-after counts, the
    * tombstone fraction in exact ppm, and the repack trigger (>10% dead —
    * the faiss-style compaction threshold). The full 8-cell spine appears
    * even if a cell holds no members: an absent cell row is
    * indistinguishable from a lost posting list.
    *
    * Scale shape: assignment is an argmax over k broadcast centroid
    * literals inside the scan projection (zero shuffle); the tombstone mark
    * is a predicate, not a join — at 100 TB the delete set arrives as a key
    * table and the mark becomes one broadcast (or bucketed) anti-join
    * against the posting lists, never a rewrite; the report is one
    * map-side-combined groupBy(cell) emitting k rows. Searches compose the
    * tombstone filter for free (Round12Spec pins that a post-delete probe
    * never returns a tombstoned id). */
  def sIndexDelete(spark: SparkSession, dir: String): DataFrame = {
    val cents = Cluster.train(spark, dir, k = 8, rounds = 3)
    val asg = Cluster.withNorm(spark, dir)
      .select(col("vec_id"),
        Cluster.argmax(cents)(col("embedding"), col("nrm")).as("cell"))
    val rep = asg.groupBy("cell")
      .agg(count(lit(1)).as("n_before"),
        sum(when(col("vec_id") % 9 === 4, 1L).otherwise(0L)).as("n_del"))
    val cells = spark.range(0, 8).select(col("id").cast("int").as("cell"))
    cells.join(rep, Seq("cell"), "left")
      .select(col("cell"),
        coalesce(col("n_before"), lit(0L)).as("n_before"),
        coalesce(col("n_del"), lit(0L)).as("n_del"))
      .withColumn("n_after", col("n_before") - col("n_del"))
      .withColumn("del_ppm",
        when(col("n_before") > 0, expr("n_del * 1000000 div n_before")))
      .withColumn("repack", coalesce(col("del_ppm") > 100000, lit(false)))
      .orderBy("cell")
  }

  val sIndexDeleteSql: String = {
    val rounds = 3
    s"""WITH ${Cluster.lloydCtes(k = 8, rounds = rounds)},
       |fin AS (
       |  SELECT e.vec_id,
       |    max(struct_pack(cos := ${Cluster.cosSql("e.embedding", "e.nrm", "c.cv")},
       |                    nc := -c.cell)) AS w
       |  FROM n e CROSS JOIN c$rounds c GROUP BY 1),
       |rep AS (
       |  SELECT CAST(-(w.nc) AS INT) AS cell, COUNT(*) AS n_before,
       |    SUM(CASE WHEN vec_id % 9 = 4 THEN 1 ELSE 0 END) AS n_del
       |  FROM fin GROUP BY 1),
       |cells AS (SELECT CAST(cell AS INT) AS cell FROM c$rounds)
       |SELECT c.cell,
       |  CAST(coalesce(r.n_before, 0) AS BIGINT) AS n_before,
       |  CAST(coalesce(r.n_del, 0) AS BIGINT) AS n_del,
       |  CAST(coalesce(r.n_before, 0) - coalesce(r.n_del, 0) AS BIGINT) AS n_after,
       |  CASE WHEN coalesce(r.n_before, 0) > 0
       |       THEN CAST(coalesce(r.n_del, 0) * 1000000 // r.n_before AS BIGINT)
       |       END AS del_ppm,
       |  coalesce(coalesce(r.n_del, 0) * 1000000 // r.n_before > 100000, false)
       |    AS repack
       |FROM cells c LEFT JOIN rep r USING (cell)
       |ORDER BY c.cell""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_index_delete" -> (sIndexDelete _))

  val oracles: Map[String, String] = Map(
    "s_index_delete" -> sIndexDeleteSql)
}
