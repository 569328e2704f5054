package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.2 additions (round 7, second graph batch): the two remaining classic
  * iterative-graph questions the Graph.scala suite doesn't answer —
  * weighted shortest-path distances (q_sssp: "how CHEAP is everything to
  * reach from here", vs q_bfs_layers' unweighted "how many HOPS") and
  * community detection (q_communities: synchronous label propagation —
  * vs q_modularity, which only SCORES a given partition, and
  * d_dup_clusters, whose min-label fixpoint computes connected components,
  * not dense communities).
  *
  * Both follow the Graph.scala superstep discipline: a fixed unroll of
  * per-round plans, each ONE equi-join keyed on an edge endpoint plus
  * map-side-combined aggregates, localCheckpoint bounding lineage; the
  * DuckDB oracles replay the identical rounds as chained CTEs. All
  * arithmetic is integer end-to-end (weights and distances are BIGINTs,
  * the LPA argmax is the overflow-free two-stage max-count-then-min-label
  * form), so the gate never touches a double.
  *
  * Scale shape at 100 TB: per round cost ∝ |frontier ⋈ edges| (SSSP) or
  * |edges| (LPA), shuffles keyed on node id — the Pregel shape. Hub-fan
  * skew inherits the co-supply edge set's df-cap treatment (see
  * Graph.coSupplyEdges). Reference capability anchor: the reference's
  * DuckDB post-processor answers single-table SQL only
  * (IcebergConnection.py:99-131); graph analytics is part of the
  * beyond-reference §2.2 surface.
  */
object Graph2 {

  private val ssspRounds = 6
  private val lpaRounds = 4

  /** Deterministic symmetric integer edge weight in [1, 9]: a fixed hash
    * of the ORIENTED (lo < hi) endpoint pair, so both directions of an
    * undirected edge cost the same and both engines compute the identical
    * literal expression. */
  private val weightExpr = "1 + (lo * 7 + hi * 3) % 9"

  /** Single-source shortest paths on the co-supply graph (weighted
    * Bellman-Ford, 6 synchronous relaxation rounds from the smallest
    * node — the q_bfs_layers source convention). Emits the distance
    * HISTOGRAM (distance → node count) plus the unreachable remainder as
    * an explicit (-1, n) row: the reachability-cost profile an analyst
    * reads off a logistics / routing graph. Rounds are a fixed unroll
    * (6 ≥ the graph's weighted-path depth at every test scale — the
    * q_kcore honesty rule applies: an unconverged graph shows its true
    * 6-round distances and the oracle unrolls identically, so the gate
    * still matches). Driver exchange: the single source id. */
  def qSssp(spark: SparkSession, dir: String): DataFrame =
    ssspOf(Graph.coSupplyEdges(spark, dir).localCheckpoint(), ssspRounds)

  /** The relaxation loop over an arbitrary (lo, hi) edge frame —
    * GraphPropSpec drives seeded random graphs through the identical
    * distributed plan against an in-memory Bellman-Ford. */
  private[graft] def ssspOf(edges: DataFrame, rounds: Int): DataFrame = {
    import edges.sparkSession.implicits._
    val weighted = edges.select(col("lo"), col("hi"),
      expr(weightExpr).cast("long").as("w"))
    val bidir = weighted.select(col("lo").as("src"), col("hi").as("dst"), col("w"))
      .union(weighted.select(col("hi"), col("lo"), col("w")))
      .localCheckpoint()
    // one scalar to the driver (metadata scale — the qBfsLayers precedent);
    // an empty edge frame yields a NULL min → return the empty histogram
    // instead of an NPE (review r7: defensive, the gated corpora are never
    // empty but GraphPropSpec-style callers can be)
    val srcRow = edges.agg(min(least(col("lo"), col("hi")))).head()
    if (srcRow.isNullAt(0))
      return Seq.empty[(Long, Long)].toDF("dist", "n_nodes")
    val srcId = srcRow.getLong(0)
    var dist = Seq((srcId, 0L)).toDF("id", "dist").localCheckpoint()
    for (_ <- 1 to rounds) {
      val relax = dist.join(bidir, col("id") === col("src"))
        .select(col("dst").as("id"), (col("dist") + col("w")).as("dist"))
      dist = dist.union(relax)
        .groupBy("id").agg(min("dist").as("dist"))
        .localCheckpoint()
    }
    val nodes = edges.select(col("lo").as("id"))
      .union(edges.select(col("hi").as("id"))).distinct()
    val hist = dist.groupBy("dist").agg(count(lit(1)).as("n_nodes"))
    val unreach = nodes.join(dist, Seq("id"), "left_anti")
      .agg(count(lit(1)).as("n_nodes"))
      .select(lit(-1L).as("dist"), col("n_nodes"))
    hist.select(col("dist"), col("n_nodes")).union(unreach).orderBy("dist")
  }

  val qSsspSql: String = {
    val steps = (1 to ssspRounds).map { t =>
      val p = t - 1
      s"""d$t AS MATERIALIZED (
         |  SELECT id, MIN(dist) AS dist FROM (
         |    SELECT id, dist FROM d$p
         |    UNION ALL
         |    SELECT b.dst AS id, f.dist + b.w AS dist
         |    FROM d$p f JOIN bidir b ON b.src = f.id)
         |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${Graph.coSupplyCteSql()},
       |bidir AS MATERIALIZED (
       |  SELECT lo AS src, hi AS dst, CAST($weightExpr AS BIGINT) AS w FROM edges
       |  UNION ALL SELECT hi, lo, CAST($weightExpr AS BIGINT) FROM edges),
       |d0 AS (SELECT MIN(LEAST(lo, hi)) AS id, CAST(0 AS BIGINT) AS dist FROM edges),
       |$steps,
       |nodes AS (
       |  SELECT DISTINCT id FROM (
       |    SELECT lo AS id FROM edges UNION ALL SELECT hi FROM edges))
       |SELECT dist, n_nodes FROM (
       |  SELECT dist, CAST(COUNT(*) AS BIGINT) AS n_nodes
       |  FROM d$ssspRounds GROUP BY 1
       |  UNION ALL
       |  SELECT CAST(-1 AS BIGINT),
       |         (SELECT COUNT(*) FROM nodes)
       |           - (SELECT COUNT(*) FROM d$ssspRounds))
       |ORDER BY dist""".stripMargin
  }

  /** Community detection on the co-supply graph: 4 rounds of SYNCHRONOUS
    * label propagation (Raghavan et al. 2007) — every node simultaneously
    * adopts its neighbors' most frequent label, ties broken by the
    * SMALLEST label, seeds = node ids. Deterministic by construction (no
    * random visit order — the synchronous variant trades convergence
    * speed for reproducibility, the right trade under a bit-exact gate;
    * the known oscillation on bipartite structures shows up honestly in
    * the trace, which the oracle replays identically). Emits the
    * CONVERGENCE TRACE — one row per round with the surviving community
    * count and the largest community's size (the q_kcore presentation:
    * informative on any graph, where a final-sizes table degenerates to
    * one row once a dense graph collapses — measured: the sf0.01
    * co-supply graph runs 25 → 7 → 2 → 1). The per-round argmax is the
    * overflow-free two-stage form: max neighbor-label count per node,
    * then min label among the argmax set — two map-side-combined
    * aggregates plus one equi-join, valid at any degree and any label
    * range (a packed score like c·10¹²−lab would overflow on 10⁷-degree
    * hubs at 100 TB). */
  def qCommunities(spark: SparkSession, dir: String): DataFrame =
    communitiesOf(Graph.coSupplyEdges(spark, dir).localCheckpoint(), lpaRounds)

  /** The propagation loop over an arbitrary (lo, hi) edge frame —
    * GraphPropSpec checks seeded random graphs against an in-memory
    * synchronous-LPA reference. */
  private[graft] def communitiesOf(edges: DataFrame, rounds: Int): DataFrame = {
    val bidir = edges.select(col("lo").as("src"), col("hi").as("dst"))
      .union(edges.select(col("hi").as("src"), col("lo").as("dst")))
      .localCheckpoint()
    var lab = bidir.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("lab")).localCheckpoint()
    val rows = scala.collection.mutable.ArrayBuffer[DataFrame]()
    for (r <- 1 to rounds) {
      val gathered = bidir
        .join(lab.select(col("id").as("dst"), col("lab")), "dst")
        .groupBy(col("src").as("id"), col("lab"))
        .agg(count(lit(1)).as("c"))
      val best = gathered.groupBy("id").agg(max("c").as("mc"))
      lab = gathered.join(best, "id")
        .where(col("c") === col("mc"))
        .groupBy("id").agg(min("lab").as("lab"))
        .localCheckpoint()
      rows += lab.groupBy("lab").agg(count(lit(1)).as("sz"))
        .agg(count(lit(1)).as("n_communities"), max("sz").as("top_size"))
        .select(lit(r).as("round"), col("n_communities"), col("top_size"))
    }
    rows.reduce(_ union _).orderBy("round")
  }

  val qCommunitiesSql: String = {
    val steps = (1 to lpaRounds).map { t =>
      val p = t - 1
      s"""g$t AS (
         |  SELECT b.src AS id, l.lab AS lab, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM bidir b JOIN l$p l ON l.id = b.dst
         |  GROUP BY 1, 2),
         |m$t AS (SELECT id, MAX(c) AS mc FROM g$t GROUP BY 1),
         |l$t AS MATERIALIZED (
         |  SELECT g.id, MIN(g.lab) AS lab
         |  FROM g$t g JOIN m$t m ON m.id = g.id AND g.c = m.mc
         |  GROUP BY 1),
         |s$t AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_communities,
         |         CAST(MAX(sz) AS BIGINT) AS top_size
         |  FROM (SELECT lab, COUNT(*) AS sz FROM l$t GROUP BY 1))""".stripMargin
    }.mkString(",\n")
    val trace = (1 to lpaRounds).map { t =>
      s"SELECT $t AS round, n_communities, top_size FROM s$t"
    }.mkString("\nUNION ALL\n")
    s"""WITH ${Graph.coSupplyCteSql()},
       |bidir AS MATERIALIZED (
       |  SELECT lo AS src, hi AS dst FROM edges
       |  UNION ALL SELECT hi, lo FROM edges),
       |l0 AS (SELECT DISTINCT src AS id, src AS lab FROM bidir),
       |$steps
       |SELECT CAST(round AS INT) AS round, n_communities, top_size
       |FROM ($trace)
       |ORDER BY round""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sssp" -> (qSssp _),
    "q_communities" -> (qCommunities _))

  val oracles: Map[String, String] = Map(
    "q_sssp" -> qSsspSql,
    "q_communities" -> qCommunitiesSql)
}
