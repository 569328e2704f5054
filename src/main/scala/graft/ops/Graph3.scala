package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.2 round-7 closing batch: sampled centrality — the graph measure the
  * suite still lacked. q_bfs_layers answers "how far is everything from ONE
  * node"; q_pagerank ranks by link mass; neither answers "which nodes are
  * CLOSE to everywhere" (the facility-location / influence question).
  * Exact closeness needs all-pairs shortest paths — quadratic supersteps,
  * off the table at any scale — so every production system estimates it
  * from a SAMPLE of BFS sources (Eppstein–Wang): this op runs the
  * multi-source variant with 4 pinned sources as one fused Pregel loop,
  * the exact shape that scales to 100 TB (frontier keyed by (source,
  * node), each superstep one equi-join + anti-join shuffle; adding
  * sources widens rows, never adds supersteps).
  *
  * Harmonic centrality (Σ 1/d) is used instead of classic closeness
  * because it is defined under unreachability (unreached pairs contribute
  * 0, no ∞ edge cases) — and the reciprocals are carried as exact
  * integers ×2520 (lcm of 1..9, so 2520/d is exact for every hop count
  * ≤ 4) keeping the whole measure inside the hash gate.
  *
  * Reference capability anchor: graph measures are entirely outside the
  * reference's single-table SELECT surface (IcebergConnection.py:99-131);
  * same §2.2-extension family as q_pagerank/q_sssp.
  */
object Graph3 {

  /** Harmonic centrality estimated from 4 pinned BFS sources (the 4
    * smallest node ids — deterministic, metadata-scale driver exchange)
    * over the co-supply graph, 4 supersteps deep. Emits the top 20 nodes
    * by estimate with the number of sources that reached each — the
    * telemetry a sampled-centrality deployment reports. */
  def qHarmonicCentrality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = Graph.coSupplyEdges(spark, dir).localCheckpoint()
    val bidir = edges.select(col("lo").as("src"), col("hi").as("dst"))
      .union(edges.select(col("hi").as("src"), col("lo").as("dst")))
      .localCheckpoint()
    // 4 smallest node ids = the pinned source sample (driver exchange: 4 longs)
    val srcIds = edges.select(col("lo").as("id"))
      .union(edges.select(col("hi").as("id")))
      .distinct().orderBy("id").limit(4)
      .collect().map(_.getLong(0)).toSeq
    var frontier = srcIds.map(s => (s, s)).toDF("s", "id").localCheckpoint()
    var reached = frontier
    val layers = scala.collection.mutable.ArrayBuffer[DataFrame]()
    for (d <- 1 to 4) {
      val next = frontier.join(bidir, col("id") === col("src"))
        .select(col("s"), col("dst").as("id")).distinct()
        .join(reached, Seq("s", "id"), "left_anti")
        .localCheckpoint()
      layers += next.select(col("s"), col("id"), lit(2520L / d).as("w"))
      reached = reached.union(next).localCheckpoint()
      frontier = next
    }
    layers.reduce(_ union _)
      .groupBy("id")
      .agg(sum("w").cast("long").as("harmonic_x2520"),
        countDistinct("s").cast("long").as("n_src_reached"))
      .orderBy(col("harmonic_x2520").desc, col("id"))
      .limit(20)
      .select(
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("harmonic_x2520").desc, col("id"))).as("rnk"),
        col("id"), col("harmonic_x2520"), col("n_src_reached"))
      .orderBy("rnk")
  }

  val qHarmonicCentralitySql: String = {
    val steps = (1 to 4).map { t =>
      val p = t - 1
      s"""d$t AS MATERIALIZED (
         |  SELECT DISTINCT f.s, b.dst AS id FROM d$p f JOIN bidir b ON b.src = f.id
         |  WHERE NOT EXISTS (SELECT 1 FROM r$p r WHERE r.s = f.s AND r.id = b.dst)),
         |r$t AS MATERIALIZED (
         |  SELECT s, id FROM r$p UNION SELECT s, id FROM d$t)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${Graph.coSupplyCteSql()},
       |bidir AS MATERIALIZED (
       |  SELECT lo AS src, hi AS dst FROM edges
       |  UNION ALL SELECT hi, lo FROM edges),
       |srcs AS (
       |  SELECT id FROM (
       |    SELECT DISTINCT lo AS id FROM edges
       |    UNION SELECT DISTINCT hi FROM edges)
       |  ORDER BY id LIMIT 4),
       |d0 AS (SELECT id AS s, id FROM srcs),
       |r0 AS (SELECT s, id FROM d0),
       |$steps,
       |contrib AS (
       |  SELECT s, id, 2520 AS w FROM d1
       |  UNION ALL SELECT s, id, 1260 FROM d2
       |  UNION ALL SELECT s, id, 840 FROM d3
       |  UNION ALL SELECT s, id, 630 FROM d4),
       |h AS (
       |  SELECT id, CAST(SUM(w) AS BIGINT) AS harmonic_x2520,
       |         CAST(COUNT(DISTINCT s) AS BIGINT) AS n_src_reached
       |  FROM contrib GROUP BY id)
       |SELECT CAST(row_number() OVER (ORDER BY harmonic_x2520 DESC, id) AS INTEGER) AS rnk,
       |       id, harmonic_x2520, n_src_reached
       |FROM h ORDER BY harmonic_x2520 DESC, id LIMIT 20""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_harmonic_centrality" -> (qHarmonicCentrality _))

  val oracles: Map[String, String] = Map(
    "q_harmonic_centrality" -> qHarmonicCentralitySql)
}
