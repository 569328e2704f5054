package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.2 addition (round 5): graph analytics as iterated relational algebra —
  * PageRank by power iteration, the canonical "big graph on a relational
  * engine" workload (the same join-aggregate per superstep that Pregel/
  * GraphX schedule, expressed as DataFrame ops so Catalyst plans it).
  *
  * Scale shape per iteration: ONE shuffle keyed on edge dst (the
  * contribution aggregate, map-side combined), a broadcast of two scalars
  * (node count, dangling mass), and a broadcast-joined rank update — no
  * global window, no driver-side graph state; ranks live in the cluster.
  * The iteration count is fixed (power iteration converges geometrically at
  * rate d≈0.85; 5 rounds is the demo dial, production runs ~30 or an L1
  * convergence check — the per-round plan is identical).
  *
  * Determinism across engines (SURVEY §4): every per-node contribution sum
  * is rounded then DECIMAL-accumulated, every rank is re-rounded to 12 dp
  * per round, and all literals are explicit doubles on both sides — so the
  * DuckDB oracle (the same 5 iterations unrolled as chained CTEs) matches
  * bit-for-bit at 6 dp output rounding.
  */
object Graph {

  private val damping = 0.85
  private val iters = 5

  /** Decimal-exact sum of 12-dp-rounded terms (finer-scaled sibling of
    * Tables.dsum — pageranks are O(1/N) and need the extra digits).
    * Shared with TextOps6's TextRank iteration — ONE definition of the
    * load-bearing rounding rule. */
  private[ops] def dsum12(c: Column): Column =
    sum(round(c, 12).cast("decimal(30,13)")).cast("double")

  /** The co-supply edge-set derivation as oracle CTEs — ONE copy of the
    * pair-generation/rank/cap recipe every graph oracle interpolates
    * (8 call sites; a recipe change must not be able to miss one). The
    * `materialized` dial mirrors the historical per-oracle text exactly
    * (the triangle census predates the MATERIALIZED hints). */
  private[ops] def coSupplyCteSql(materialized: Boolean = true): String =
    s"""ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
       |pairs AS (
       |  SELECT a.l_suppkey AS lo, b.l_suppkey AS hi, COUNT(*) AS shared
       |  FROM ps a JOIN ps b ON a.l_partkey = b.l_partkey
       |    AND a.l_suppkey < b.l_suppkey
       |  GROUP BY 1, 2),
       |ranked AS (
       |  SELECT lo, hi, row_number() OVER (ORDER BY shared DESC, lo, hi) AS rnk,
       |         COUNT(*) OVER () AS np
       |  FROM pairs),
       |edges AS ${if (materialized) "MATERIALIZED " else ""}(SELECT lo, hi FROM ranked WHERE rnk <= (np + 9) // 10)""".stripMargin

  /** PageRank over the customer→supplier trade graph (distinct
    * (o_custkey → l_suppkey) pairs via the orders⋈lineitem equi-join):
    * top-20 nodes by rank. Suppliers have no out-edges (bipartite), so the
    * dangling-mass redistribution path is genuinely exercised. */
  def qPagerank(spark: SparkSession, dir: String): DataFrame = {
    val edges = Tables.table(spark, dir, "orders")
      .join(Tables.table(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))
      .distinct()
      // r13: pin the cached edge width — AQE coalesces the distinct's
      // reducer by BYTES, leaving the cache ~10 partitions, and every
      // iteration's decimal contribution sums (the per-superstep map cost)
      // then run that narrow. src-keyed so the per-iteration contrib join
      // and groupBy reuse the layout. Lab A/B: identical ranks, ~12% wall.
      .repartition(spark.sparkContext.defaultParallelism, col("src"))
      .cache()
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct().cache()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg")).cache()
    // one scalar to the driver (metadata scale — the CatalogOps3 precedent);
    // the SQL oracle carries the same value as a cross-joined 1-row CTE
    val n = nodes.count()
    var pr = nodes.select(col("id"), (lit(1.0) / lit(n)).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = edges.join(deg, "src")
        .join(pr, pr("id") === edges("src"))
        .groupBy(col("dst").as("id"))
        .agg(dsum12(col("pr") / col("deg")).as("cin"))
      val dang = pr.join(deg, pr("id") === deg("src"), "left_anti")
        .agg(coalesce(dsum12(col("pr")), lit(0.0)).as("dm"))
      pr = nodes.join(contrib, Seq("id"), "left")
        .crossJoin(broadcast(dang))
        .select(col("id"),
          round(lit(0.15) / lit(n)
            + lit(damping) * (coalesce(col("cin"), lit(0.0))
              + col("dm") / lit(n)), 12).as("pr"))
        .localCheckpoint() // bound plan depth across supersteps (d_dup_clusters pattern)
    }
    pr.select(col("id"), round(col("pr"), 6).as("pagerank"))
      .orderBy(col("pagerank").desc, col("id")).limit(20)
  }

  /** The identical 5 iterations unrolled as chained CTEs (no aggregation
    * inside a recursive term — portable SQL), every literal an explicit
    * DOUBLE so DuckDB's decimal literals never change the arithmetic. */
  val qPagerankSql: String = {
    val base =
      """WITH edges AS (
        |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |nodes AS (
        |  SELECT src AS id FROM edges UNION SELECT dst FROM edges),
        |deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1),
        |nn AS (SELECT COUNT(*) AS n FROM nodes),
        |pr0 AS (SELECT id, CAST(1 AS DOUBLE) / nn.n AS pr FROM nodes, nn)""".stripMargin
    val rounds = (1 to iters).map { k =>
      val p = k - 1
      s"""in$k AS (
         |  SELECT e.dst AS id,
         |    CAST(SUM(CAST(round(p.pr / d.deg, 12) AS DECIMAL(30,13))) AS DOUBLE) AS cin
         |  FROM edges e JOIN pr$p p ON p.id = e.src JOIN deg d ON d.src = e.src
         |  GROUP BY 1),
         |dang$k AS (
         |  SELECT COALESCE(CAST(SUM(CAST(round(p.pr, 12) AS DECIMAL(30,13))) AS DOUBLE),
         |                  CAST(0 AS DOUBLE)) AS dm
         |  FROM pr$p p LEFT JOIN deg d ON d.src = p.id WHERE d.src IS NULL),
         |pr$k AS (
         |  SELECT nd.id,
         |    round(CAST(0.15 AS DOUBLE) / nn.n
         |      + CAST(0.85 AS DOUBLE) * (COALESCE(i.cin, CAST(0 AS DOUBLE))
         |        + g.dm / nn.n), 12) AS pr
         |  FROM nodes nd LEFT JOIN in$k i ON i.id = nd.id, nn, dang$k g)""".stripMargin
    }
    (base +: rounds).mkString("", ",\n", "\n") +
      s"""SELECT id, round(pr, 6) AS pagerank FROM pr$iters
         |ORDER BY pagerank DESC, id LIMIT 20""".stripMargin
  }

  /** Triangle census + global clustering coefficient of the supplier
    * co-supply graph (edge = two suppliers among the top decile of pairs by
    * number of distinct co-supplied parts). The classic O(m^1.5) oriented
    * wedge-join: edges stored once in (lo < hi) orientation, wedges
    * enumerated from the mid vertex, closed by a second equi-join — never
    * an all-pairs product.
    *
    * Edge selection is rank-based (top ⌈n/10⌉ by (shared DESC, lo, hi)) so
    * the edge set is deterministic and self-tuning at EVERY scale factor
    * (an absolute support threshold that keeps sf0.01's complete graph
    * sparse keeps sf0.1's graph empty — measured). The rank is REALIZED
    * as histogram-threshold-then-filter ([[topKByRank]]) — no global sort,
    * no GlobalLimit, no `.toInt` on a data-proportional k.
    *
    * Skew guard at scale: pair generation is an equi-join on l_partkey with
    * per-part supplier fan bounded by the part's supplier count (26 here);
    * a Zipfian part catalog gets the d_ngram_jaccard df-cap treatment.
    * Clustering coefficient is reported in exact integer ppm
    * ((3·10⁶·triangles) div wedges) — no double rounding to tie-break. */
  /** The deterministic rank-based co-supply edge set every graph op runs
    * on (top decile of supplier pairs by co-supplied parts; see
    * qTriangleCount's scaladoc for why rank beats an absolute threshold).
    * Under [[ModelCache]] (bench only) the edge LIST is built once per
    * session and its cost reported as a build line — the graph-analytics
    * analog of the ANN build/query split: a deployed stack materializes
    * the edge table as a pipeline step, it doesn't re-derive it per query.
    * The cached list is k edge pairs (k = |pairs|/10 — index scale, not
    * data scale); Verify and the oracle gate keep the full in-query
    * derivation (enabled=false), and determinism makes the results
    * identical either way. */
  /** Exactly the top `k` rows of a (lo, hi, shared) frame by
    * (shared DESC, lo, hi) — WITHOUT a global sort-limit. A
    * data-proportional k planned as `orderBy(...).limit(k)` is a
    * GlobalLimit: every selected row squeezes through ONE partition (and
    * `k.toInt` overflows past 2³¹ rows) — invisible at sf0.1, fatal at
    * 100×. Instead the rank is realized as a THRESHOLD (the q_abc_analysis
    * descending-cumulative identity):
    *
    *   1. support histogram `groupBy(shared).count` — one map-side-combined
    *      aggregate whose row count is the number of DISTINCT support
    *      values (Zipf-bounded metadata scale, the c_stats_histogram
    *      bucket-rows-to-the-driver precedent), walked descending on the
    *      driver to find the cut value s* and how many rows rank above it;
    *   2. `shared > s*` and (when the cut lands on a value boundary)
    *      `shared = s*` select by pure map-side FILTER — fully parallel;
    *   3. only when rank k falls INSIDE the s* tie band: a two-level band
    *      prefix on `lo` (≤256 value-range bands; band totals to the
    *      driver) narrows the residual selection to ONE band, ranked by a
    *      window PARTITIONED on the band key — bounded by band granularity,
    *      never a global row sort.
    *
    * Ties break exactly as the rank form: (lo, hi) ascending within the cut
    * value (GraphPropSpec proves set identity against `orderBy.limit` over
    * random tie-heavy frames; the DuckDB oracles keep the row_number form).
    */
  private[graft] def topKByRank(pairs: DataFrame, k: Long): DataFrame = {
    if (k <= 0) return pairs.where(lit(false)).select("lo", "hi")
    val hist = pairs.groupBy("shared").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(-_._1)
    var above = 0L
    var i = 0
    while (i < hist.length && above + hist(i)._2 < k) { above += hist(i)._2; i += 1 }
    if (i >= hist.length) return pairs.select("lo", "hi") // k >= |pairs|
    val (sStar, cntAtS) = hist(i)
    val need = k - above // 1 <= need <= cntAtS
    val whole = pairs.where(col("shared") > sStar).select("lo", "hi")
    if (need >= cntAtS) // cut on a value boundary: the whole band filters in
      return whole.union(pairs.where(col("shared") === sStar).select("lo", "hi"))
    val tie = pairs.where(col("shared") === sStar)
    val mm = tie.agg(min(col("lo")).as("mn"), max(col("lo")).as("mx")).head()
    val (mnLo, mxLo) = (mm.getLong(0), mm.getLong(1))
    val width = math.max(1L, (mxLo - mnLo) / 256L + 1L)
    val banded = tie.withColumn("__band", expr(s"(lo - $mnLo) div $width"))
    val bandCnt = banded.groupBy("__band").agg(count(lit(1)).as("bcnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var before = 0L
    var b = 0
    while (before + bandCnt(b)._2 < need) { before += bandCnt(b)._2; b += 1 }
    val bCut = bandCnt(b)._1
    val fullBands = banded.where(col("__band") < bCut).select("lo", "hi")
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy("__band").orderBy("lo", "hi")
    val inCut = banded.where(col("__band") === bCut)
      .withColumn("__rn", row_number().over(wc))
      .where(col("__rn") <= need - before)
      .select("lo", "hi")
    whole.union(fullBands).union(inCut)
  }

  private[graft] def coSupplyEdges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def build(): DataFrame = {
      val ps = Tables.table(spark, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      val pairs = ps.as("a").join(ps.as("b"),
          col("a.l_partkey") === col("b.l_partkey") &&
            col("a.l_suppkey") < col("b.l_suppkey"))
        .groupBy(col("a.l_suppkey").as("lo"), col("b.l_suppkey").as("hi"))
        .agg(count(lit(1)).as("shared"))
        .cache()
      // one scalar to the driver (metadata scale — the qPagerank n precedent)
      val k = (pairs.count() + 9) / 10
      topKByRank(pairs, k)
        .repartition(col("lo")) // key-spread the edge frame for the joins
        .cache()
    }
    if (!ModelCache.enabled) build()
    else {
      // bench-mode memo stores a PARQUET PATH, never rows (the nswEdges
      // pattern, Similarity2.nswEdges): an edge list is DATA scale, and a
      // collect() of it would OOM the driver at a bigger sf even though
      // bench never runs there (VERDICT r9 item 3). Path keyed by the
      // sanitized full dir PLUS a hash of the raw dir (ADVICE r10: two
      // distinct dirs like /a/b and /a_b sanitize identically — the
      // second run would overwrite the parquet the first dir's still-live
      // memo entry points at).
      val path = ModelCache.memo(s"cosupply:$dir") {
        val p = s"${System.getProperty("java.io.tmpdir")}/graft_cosupply_edges/" +
          dir.replaceAll("[^A-Za-z0-9._-]", "_") + f"_${dir.hashCode}%08x"
        build().write.mode("overwrite").parquet(p)
        p
      }
      spark.read.parquet(path).repartition(col("lo"))
    }
  }

  def qTriangleCount(spark: SparkSession, dir: String): DataFrame =
    triangleCensusOf(coSupplyEdges(spark, dir))

  /** Census over an arbitrary (lo, hi) edge frame. The wedge join runs
    * DEGREE-ORDERED (each edge re-oriented from its lower-(deg, id)
    * endpoint to the higher): a triangle's unique apex is its
    * minimum-order vertex, so the count stays EXACT, but every node's
    * out-degree is bounded by O(√m) — the classic hub-proof orientation
    * (a 10⁷-degree hub under id-orientation fans 10¹⁴ wedges from one
    * task; under degree-orientation it is almost always the wedge FOOT,
    * never the apex). This is the always-on rendition of the absolute
    * degree dial [[linkPredictOf]] exposes — a census must stay exact, so
    * it gets the count-preserving guard. */
  private[graft] def triangleCensusOf(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("lo").as("id"))
      .union(edges.select(col("hi").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // orient by (deg, id): src = lower endpoint in that total order; carry
    // the dst's order key so wedge legs can be ordered without a re-join
    // the oriented frame feeds all three wedge-join legs — pin it once
    // (localCheckpoint: m-row edge scale) instead of re-running the two
    // degree joins per leg
    val o = edges
      .join(deg.select(col("id").as("lo"), col("deg").as("dlo")), "lo")
      .join(deg.select(col("id").as("hi"), col("deg").as("dhi")), "hi")
      .select(
        when(col("dlo") < col("dhi") ||
             (col("dlo") === col("dhi") && col("lo") < col("hi")),
          col("lo")).otherwise(col("hi")).as("src"),
        when(col("dlo") < col("dhi") ||
             (col("dlo") === col("dhi") && col("lo") < col("hi")),
          col("hi")).otherwise(col("lo")).as("dst"),
        greatest(col("dlo"), col("dhi")).as("ddeg"))
      .localCheckpoint()
    val tri = o.as("e1")
      .join(o.as("e2"), col("e2.src") === col("e1.src") &&
        (col("e1.ddeg") < col("e2.ddeg") ||
          (col("e1.ddeg") === col("e2.ddeg") && col("e1.dst") < col("e2.dst"))))
      .join(o.as("e3"),
        col("e3.src") === col("e1.dst") && col("e3.dst") === col("e2.dst"))
      .agg(count(lit(1)).as("n_triangles"))
    val wed = deg.agg(
      sum(expr("deg * (deg - 1) div 2")).cast("long").as("n_wedges"))
    val counts = deg.agg(count(lit(1)).as("n_nodes"))
      .crossJoin(edges.agg(count(lit(1)).as("n_edges")))
    counts.crossJoin(broadcast(wed)).crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        expr("(3000000 * n_triangles) div n_wedges").as("clustering_ppm"))
  }

  val qTriangleCountSql: String =
    s"""WITH ${coSupplyCteSql(materialized = false)},
      |deg AS (
      |  SELECT id, COUNT(*) AS deg FROM (
      |    SELECT lo AS id FROM edges UNION ALL SELECT hi FROM edges) GROUP BY 1),
      |tri AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
      |  FROM edges e1 JOIN edges e2 ON e2.lo = e1.hi
      |       JOIN edges e3 ON e3.lo = e1.lo AND e3.hi = e2.hi),
      |wed AS (SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges FROM deg)
      |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
      |       (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_edges,
      |       n_wedges, n_triangles,
      |       (3000000 * n_triangles) // n_wedges AS clustering_ppm
      |FROM tri, wed""".stripMargin

  /** BFS layer census: node counts at hop distance 0..4 from the smallest
    * node of the co-supply graph (q_triangle_count's deterministic
    * rank-based edge set), plus the unreachable remainder (distance −1) —
    * the shortest-path / reachability class (connected components and
    * PageRank don't answer "how FAR is everything from here"). Each
    * superstep is one frontier ⋈ bidirectional-edges equi-join + one
    * anti-join against the reached set — Pregel's BFS as relational
    * algebra, localCheckpoint bounding lineage. Layers emit as COUNT
    * aggregates (an empty layer is an explicit 0 row, matching the
    * oracle's unrolled CTEs). Driver exchange: the single source id. */
  def qBfsLayers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = coSupplyEdges(spark, dir).localCheckpoint()
    val bidir = edges.select(col("lo").as("src"), col("hi").as("dst"))
      .union(edges.select(col("hi").as("src"), col("lo").as("dst")))
      .localCheckpoint()
    val srcId = edges.agg(min(least(col("lo"), col("hi")))).head().getLong(0)
    var frontier = Seq(srcId).toDF("id").localCheckpoint()
    var reached = frontier
    val layers = scala.collection.mutable.ArrayBuffer[(Int, DataFrame)]()
    layers += ((0, frontier))
    for (t <- 1 to 4) {
      val next = frontier.join(bidir, col("id") === col("src"))
        .select(col("dst").as("id")).distinct()
        .join(reached, Seq("id"), "left_anti")
        .localCheckpoint()
      layers += ((t, next))
      reached = reached.union(next).distinct().localCheckpoint()
      frontier = next
    }
    val nodes = edges.select(col("lo").as("id"))
      .union(edges.select(col("hi").as("id"))).distinct()
    val unreachable = nodes.join(reached, Seq("id"), "left_anti")
    val layerRows = layers.map { case (d, df) =>
      df.agg(count(lit(1)).as("n_nodes")).select(lit(d).as("distance"), col("n_nodes"))
    }
    (layerRows :+ unreachable.agg(count(lit(1)).as("n_nodes"))
        .select(lit(-1).as("distance"), col("n_nodes")))
      .reduce(_ union _)
      .orderBy("distance")
  }

  val qBfsLayersSql: String = {
    val steps = (1 to 4).map { t =>
      val p = t - 1
      s"""d$t AS MATERIALIZED (
         |  SELECT DISTINCT b.dst AS id FROM d$p f JOIN bidir b ON b.src = f.id
         |  WHERE b.dst NOT IN (SELECT id FROM r$p)),
         |r$t AS MATERIALIZED (SELECT id FROM r$p UNION SELECT id FROM d$t)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${coSupplyCteSql()},
       |bidir AS MATERIALIZED (
       |  SELECT lo AS src, hi AS dst FROM edges
       |  UNION ALL SELECT hi, lo FROM edges),
       |d0 AS (SELECT MIN(LEAST(lo, hi)) AS id FROM edges),
       |r0 AS (SELECT id FROM d0),
       |$steps,
       |nodes AS (
       |  SELECT DISTINCT id FROM (
       |    SELECT lo AS id FROM edges UNION ALL SELECT hi FROM edges))
       |SELECT distance, n_nodes FROM (
       |  SELECT 0 AS distance, COUNT(*) AS n_nodes FROM d0
       |  UNION ALL SELECT 1, COUNT(*) FROM d1
       |  UNION ALL SELECT 2, COUNT(*) FROM d2
       |  UNION ALL SELECT 3, COUNT(*) FROM d3
       |  UNION ALL SELECT 4, COUNT(*) FROM d4
       |  UNION ALL SELECT -1, (SELECT COUNT(*) FROM nodes)
       |                       - (SELECT COUNT(*) FROM r4))
       |ORDER BY distance""".stripMargin
  }

  /** Link prediction on the co-supply graph (q_triangle_count's
    * deterministic rank-based edge set): for every NON-edge pair with at
    * least one common neighbor, the three classic similarity scores —
    * common-neighbor count, Jaccard of neighborhoods, and Adamic-Adar
    * (carried as Σ 10⁶ div deg(n), the exact-integer rendition — the
    * harmonic damping without a log() in the gate). Top-20 candidates by
    * (cn, jaccard, ids).
    *
    * Shape: candidate generation is the SAME oriented wedge-join the
    * triangle census runs (common neighbors are wedge midpoints — never
    * all-pairs); existing edges leave via one anti-join; degrees join in
    * by node key. At 100 TB the hub-fan guard is the same df-cap the
    * wedge-join carries there. */
  def qLinkPredict(spark: SparkSession, dir: String): DataFrame =
    linkPredictOf(coSupplyEdges(spark, dir))

  /** Scoring over an arbitrary (lo, hi) edge frame — GraphPropSpec checks
    * random graphs against an in-memory reference scorer.
    *
    * `maxMidDegree` is the 100 TB hub dial (SURVEY §2.2): a wedge MIDPOINT
    * of degree d fans d² candidate pairs, so one Zipfian hub can dominate
    * the shuffle — and a hub common-neighbor is also the WEAKEST evidence
    * (Adamic-Adar already damps it as 1/deg). Capping the midpoint degree
    * bounds the fan at cap·m while leaving every structurally-supported
    * candidate scored; the default (MaxValue) keeps the exact-oracle gate
    * semantics. Endpoint degrees (du/dv, the Jaccard denominators) stay
    * UNCAPPED — the cap only prunes which wedges generate candidates. */
  private[graft] def linkPredictOf(edges: DataFrame,
                                   maxMidDegree: Long = Long.MaxValue): DataFrame = {
    val adj = edges.select(col("lo").as("node"), col("hi").as("nb"))
      .union(edges.select(col("hi").as("node"), col("lo").as("nb")))
    val deg = adj.groupBy("node").agg(count(lit(1)).as("deg"))
    // r13: pin the wedge join's input partitioning explicitly. Its input is
    // a few hundred KB — AQE's byte-proportional coalescing folded it to
    // ONE task — but its OUTPUT is the Σd² wedge fan, the expensive part.
    // An explicit co-partitioning on the join key keeps the fan spread
    // parallelism-wide at any scale (the exchange is required by the join
    // anyway, so this adds no shuffle — it only forbids under-coalescing).
    val nbDeg = adj.join(deg.select(col("node").as("nb"), col("deg").as("nbdeg")), "nb")
      .where(col("nbdeg") <= maxMidDegree)
      .repartition(edges.sparkSession.sparkContext.defaultParallelism, col("nb"))
      // localCheckpoint: materialize AT that width (AQE would otherwise
      // re-coalesce the reducer side — the sKnnJoin finding), and the
      // self-join below reads nbDeg twice, so the one materialization also
      // halves its recomputation.
      .localCheckpoint()
    val cand = nbDeg.as("x").join(nbDeg.as("y"),
        col("x.nb") === col("y.nb") && col("x.node") < col("y.node"))
      .groupBy(col("x.node").as("u"), col("y.node").as("v"))
      .agg(count(lit(1)).as("cn"),
        sum(expr("1000000 div x.nbdeg")).cast("long").as("aa_ppm"))
    cand.join(edges, cand("u") === edges("lo") && cand("v") === edges("hi"),
        "left_anti")
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .select(col("u"), col("v"), col("cn"),
        expr("(1000000 * cn) div (du + dv - cn)").as("jaccard_ppm"),
        col("aa_ppm"))
      .orderBy(col("cn").desc, col("jaccard_ppm").desc, col("u"), col("v"))
      .limit(20)
  }

  val qLinkPredictSql: String =
    s"""WITH ${coSupplyCteSql()},
      |adj AS MATERIALIZED (
      |  SELECT lo AS node, hi AS nb FROM edges
      |  UNION ALL SELECT hi, lo FROM edges),
      |deg AS MATERIALIZED (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
      |                     FROM adj GROUP BY 1),
      |nbdeg AS MATERIALIZED (
      |  SELECT a.node, a.nb, d.deg AS nbdeg
      |  FROM adj a JOIN deg d ON d.node = a.nb),
      |cand AS (
      |  SELECT x.node AS u, y.node AS v, CAST(COUNT(*) AS BIGINT) AS cn,
      |         CAST(SUM(1000000 // x.nbdeg) AS BIGINT) AS aa_ppm
      |  FROM nbdeg x JOIN nbdeg y ON x.nb = y.nb AND x.node < y.node
      |  GROUP BY 1, 2),
      |nonedge AS (
      |  SELECT c.* FROM cand c
      |  WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.lo = c.u AND e.hi = c.v))
      |SELECT n.u, n.v, n.cn,
      |       (1000000 * n.cn) // (du.deg + dv.deg - n.cn) AS jaccard_ppm,
      |       n.aa_ppm
      |FROM nonedge n
      |JOIN deg du ON du.node = n.u
      |JOIN deg dv ON dv.node = n.v
      |ORDER BY n.cn DESC, jaccard_ppm DESC, n.u, n.v LIMIT 20""".stripMargin

  /** Degree assortativity of the co-supply graph — Newman's r: the Pearson
    * correlation of endpoint degrees over the DIRECTED edge-endpoint list
    * (each undirected edge contributes both orientations, the standard
    * undirected treatment; symmetry makes Σx = Σy and the two variance
    * terms equal). Hub-to-hub wiring → r > 0; hub-to-leaf → r < 0. All
    * moment sums exact BIGINT (degrees bounded by node count), r is one
    * identical-text IEEE row. One wedge-free pass: edges ⋈ deg twice. */
  def qAssortativity(spark: SparkSession, dir: String): DataFrame = {
    val edges = coSupplyEdges(spark, dir)
    val bidir = edges.select(col("lo").as("src"), col("hi").as("dst"))
      .union(edges.select(col("hi").as("src"), col("lo").as("dst")))
    val deg = bidir.groupBy("src").agg(count(lit(1)).as("deg"))
    bidir
      .join(deg.select(col("src"), col("deg").as("dx")), "src")
      .join(deg.select(col("src").as("dst"), col("deg").as("dy")), "dst")
      .agg(count(lit(1)).as("n_endpoints"),
        sum("dx").as("sx"), sum(col("dx") * col("dy")).as("sxy"),
        sum(col("dx") * col("dx")).as("sxx"))
      .select(expr("n_endpoints div 2").as("n_edges"),
        expr("(cast(n_endpoints as double)*cast(sxy as double) - cast(sx as double)*cast(sx as double)) / (cast(n_endpoints as double)*cast(sxx as double) - cast(sx as double)*cast(sx as double))")
          .as("assortativity"))
  }

  val qAssortativitySql: String =
    s"""WITH ${coSupplyCteSql()},
      |bidir AS MATERIALIZED (
      |  SELECT lo AS src, hi AS dst FROM edges
      |  UNION ALL SELECT hi, lo FROM edges),
      |deg AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
      |                     FROM bidir GROUP BY 1),
      |m AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_endpoints,
      |         CAST(SUM(dx.deg) AS BIGINT) AS sx,
      |         CAST(SUM(dx.deg * dy.deg) AS BIGINT) AS sxy,
      |         CAST(SUM(dx.deg * dx.deg) AS BIGINT) AS sxx
      |  FROM bidir b JOIN deg dx ON dx.src = b.src JOIN deg dy ON dy.src = b.dst)
      |SELECT n_endpoints // 2 AS n_edges,
      |  (CAST(n_endpoints AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) / (CAST(n_endpoints AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) AS assortativity
      |FROM m""".stripMargin

  /** 3-core decomposition by iterative peeling: drop nodes with degree < 3
    * in the surviving induced subgraph until fixpoint, 6 unrolled rounds
    * (the BFS/PageRank superstep discipline — one deg-aggregate + one
    * semi-join per round, localCheckpoint lineage bound). Emits one row
    * per round (nodes removed, nodes surviving); round 6 removing 0 IS the
    * in-plan convergence evidence (GraphSpec asserts it at test scale; a
    * graph needing more rounds shows a non-zero tail row — honest, and the
    * oracle unrolls identically so the gate still matches). The k-core is
    * THE cheap structural filter before expensive community/embedding
    * passes at 100 TB: each round is degree-threshold pruning, cost
    * proportional to surviving edges. */
  def qKcore(spark: SparkSession, dir: String): DataFrame =
    kcorePeel(coSupplyEdges(spark, dir).localCheckpoint(), k = 3, rounds = 6)

  /** The peel loop over an arbitrary (lo, hi) edge frame — GraphPropSpec
    * drives random graphs through the identical distributed plan and
    * checks each round against an in-memory reference peel. */
  private[graft] def kcorePeel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    val bidir = edges.select(col("lo").as("src"), col("hi").as("dst"))
      .union(edges.select(col("hi").as("src"), col("lo").as("dst")))
      .localCheckpoint()
    var surv = bidir.select(col("src").as("id")).distinct().localCheckpoint()
    val rows = scala.collection.mutable.ArrayBuffer[DataFrame]()
    for (r <- 1 to rounds) {
      val liveDeg = bidir
        .join(surv.select(col("id").as("src")), "src")
        .join(surv.select(col("id").as("dst")), "dst")
        .groupBy("src").agg(count(lit(1)).as("deg"))
      val next = liveDeg.where(col("deg") >= k)
        .select(col("src").as("id")).localCheckpoint()
      val removed = surv.join(next, Seq("id"), "left_anti")
      rows += removed.agg(count(lit(1)).as("n_removed"))
        .crossJoin(next.agg(count(lit(1)).as("n_surviving")))
        .select(lit(r).as("round"), col("n_removed"), col("n_surviving"))
      surv = next
    }
    rows.reduce(_ union _).orderBy("round")
  }

  val qKcoreSql: String = {
    val steps = (1 to 6).map { r =>
      val p = r - 1
      s"""s$r AS MATERIALIZED (
         |  SELECT b.src AS id FROM bidir b
         |  JOIN s$p x ON x.id = b.src JOIN s$p y ON y.id = b.dst
         |  GROUP BY 1 HAVING COUNT(*) >= 3)""".stripMargin
    }.mkString(",\n")
    val rows = (1 to 6).map { r =>
      val p = r - 1
      s"""SELECT $r AS round,
         |  (SELECT COUNT(*) FROM s$p) - (SELECT COUNT(*) FROM s$r) AS n_removed,
         |  (SELECT COUNT(*) FROM s$r) AS n_surviving""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH ${coSupplyCteSql()},
       |bidir AS MATERIALIZED (
       |  SELECT lo AS src, hi AS dst FROM edges
       |  UNION ALL SELECT hi, lo FROM edges),
       |s0 AS MATERIALIZED (SELECT DISTINCT src AS id FROM bidir),
       |$steps
       |SELECT CAST(round AS INT) AS round, CAST(n_removed AS BIGINT) AS n_removed,
       |       CAST(n_surviving AS BIGINT) AS n_surviving
       |FROM ($rows)
       |ORDER BY round""".stripMargin
  }

  /** Newman modularity of the NATION partition on the co-supply graph —
    * "do suppliers co-supply within their nation more than chance?" Per
    * community: node count, internal edges e_c, degree sum d_c, and the
    * exact-ppm modularity contribution (4m·e_c − d_c²)·10⁶ div 4m² (the
    * e_c/m − (d_c/2m)² term, integer end-to-end; negative = the community
    * is LESS intra-wired than the configuration-model expectation). The
    * judge of any community detection run is this number against a
    * candidate partition; here the partition is the natural metadata one.
    * Shape: edge set ⋈ supplier nation twice (equi-joins on suppkey), two
    * map-side-combined aggregates, one-row m broadcast. */
  def qModularity(spark: SparkSession, dir: String): DataFrame = {
    val edges = coSupplyEdges(spark, dir)
    val nat = Tables.table(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey").cast("long").as("com"))
    modularityOf(edges, nat)
  }

  /** Modularity over arbitrary (lo, hi) edges and (s_suppkey, com) labels
    * — GraphPropSpec sweeps random partitions against an in-memory
    * reference. */
  private[graft] def modularityOf(edges: DataFrame, nat: DataFrame): DataFrame = {
    val tagged = edges
      .join(nat.select(col("s_suppkey").as("lo"), col("com").as("clo")), "lo")
      .join(nat.select(col("s_suppkey").as("hi"), col("com").as("chi")), "hi")
    val m = tagged.agg(count(lit(1)).cast("long").as("m"))
    val eIn = tagged.where(col("clo") === col("chi"))
      .groupBy(col("clo").as("com")).agg(count(lit(1)).as("e_in"))
    val dSum = tagged.select(col("clo").as("com"))
      .union(tagged.select(col("chi").as("com")))
      .groupBy("com").agg(count(lit(1)).as("d_sum"))
    val nNodes = edges.select(col("lo").as("s_suppkey"))
      .union(edges.select(col("hi").as("s_suppkey"))).distinct()
      .join(nat, "s_suppkey")
      .groupBy("com").agg(count(lit(1)).as("n_nodes"))
    nNodes.join(dSum, "com").join(eIn, Seq("com"), "left")
      .crossJoin(broadcast(m))
      .select(col("com"), col("n_nodes"),
        coalesce(col("e_in"), lit(0L)).as("internal_edges"),
        col("d_sum").as("degree_sum"),
        expr("(1000000 * (4 * m * coalesce(e_in, 0) - d_sum * d_sum)) div (4 * m * m)")
          .as("contribution_ppm"))
      .orderBy("com")
  }

  val qModularitySql: String =
    s"""WITH ${coSupplyCteSql()},
      |nat AS (SELECT s_suppkey, CAST(s_nationkey AS BIGINT) AS com FROM supplier),
      |tagged AS MATERIALIZED (
      |  SELECT e.lo, e.hi, nl.com AS clo, nh.com AS chi
      |  FROM edges e JOIN nat nl ON nl.s_suppkey = e.lo
      |               JOIN nat nh ON nh.s_suppkey = e.hi),
      |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM tagged),
      |ein AS (SELECT clo AS com, CAST(COUNT(*) AS BIGINT) AS e_in
      |        FROM tagged WHERE clo = chi GROUP BY 1),
      |dsum AS (SELECT com, CAST(COUNT(*) AS BIGINT) AS d_sum FROM (
      |           SELECT clo AS com FROM tagged
      |           UNION ALL SELECT chi FROM tagged) GROUP BY 1),
      |nn AS (SELECT n.com, CAST(COUNT(*) AS BIGINT) AS n_nodes FROM (
      |         SELECT DISTINCT id FROM (
      |           SELECT lo AS id FROM edges UNION ALL SELECT hi FROM edges)) s
      |       JOIN nat n ON n.s_suppkey = s.id GROUP BY 1)
      |SELECT nn.com, nn.n_nodes, COALESCE(ein.e_in, 0) AS internal_edges,
      |  dsum.d_sum AS degree_sum,
      |  (1000000 * (4 * m.m * COALESCE(ein.e_in, 0) - dsum.d_sum * dsum.d_sum)) // (4 * m.m * m.m) AS contribution_ppm
      |FROM nn JOIN dsum ON dsum.com = nn.com
      |LEFT JOIN ein ON ein.com = nn.com
      |CROSS JOIN m
      |ORDER BY nn.com""".stripMargin

  /** Conductance of the NATION partition on the co-supply graph (r9 —
    * [[qModularity]]'s cut-based sibling: modularity judges a partition
    * against the configuration-model NULL, conductance judges each
    * community's BOUNDARY — cut edges over min(vol, 2m−vol), the bottleneck
    * score sparsest-cut / community-quality pipelines threshold on). Exact
    * integer ppm end-to-end; same one-pass shape as modularity: edges ⋈
    * nation twice, two map-side-combined aggregates, one-row m broadcast.
    * Communities appear iff they hold ≥1 edge endpoint (vol > 0), so the
    * denominator is never 0 on a partitioned graph. */
  def qConductance(spark: SparkSession, dir: String): DataFrame = {
    val edges = coSupplyEdges(spark, dir)
    val nat = Tables.table(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey").cast("long").as("com"))
    conductanceOf(edges, nat)
  }

  /** Conductance over arbitrary (lo, hi) edges and (s_suppkey, com) labels
    * — GraphPropSpec sweeps random partitions against an in-memory
    * reference. */
  private[graft] def conductanceOf(edges: DataFrame, nat: DataFrame): DataFrame = {
    val tagged = edges
      .join(nat.select(col("s_suppkey").as("lo"), col("com").as("clo")), "lo")
      .join(nat.select(col("s_suppkey").as("hi"), col("com").as("chi")), "hi")
    val m = tagged.agg(count(lit(1)).cast("long").as("m"))
    val cut = tagged.where(col("clo") =!= col("chi"))
    val cutC = cut.select(col("clo").as("com"))
      .union(cut.select(col("chi").as("com")))
      .groupBy("com").agg(count(lit(1)).as("cut_edges"))
    val vol = tagged.select(col("clo").as("com"))
      .union(tagged.select(col("chi").as("com")))
      .groupBy("com").agg(count(lit(1)).as("volume"))
    vol.join(cutC, Seq("com"), "left")
      .crossJoin(broadcast(m))
      .select(col("com"),
        coalesce(col("cut_edges"), lit(0L)).as("cut_edges"),
        col("volume"),
        // least(vol, 2m - vol) = 0 only when ONE community holds every edge
        // endpoint (vol = 2m or 0) — and then cut_edges is necessarily 0, so
        // clamping the denominator to 1 yields the true conductance 0 instead
        // of NULL (ADVICE r9: the unguarded div diverged from DuckDB's //).
        expr("(1000000 * coalesce(cut_edges, 0)) div greatest(least(volume, 2 * m - volume), 1)")
          .as("conductance_ppm"))
      .orderBy("com")
  }

  val qConductanceSql: String =
    s"""WITH ${coSupplyCteSql()},
      |nat AS (SELECT s_suppkey, CAST(s_nationkey AS BIGINT) AS com FROM supplier),
      |tagged AS MATERIALIZED (
      |  SELECT e.lo, e.hi, nl.com AS clo, nh.com AS chi
      |  FROM edges e JOIN nat nl ON nl.s_suppkey = e.lo
      |               JOIN nat nh ON nh.s_suppkey = e.hi),
      |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM tagged),
      |cutc AS (SELECT com, CAST(COUNT(*) AS BIGINT) AS cut_edges FROM (
      |           SELECT clo AS com FROM tagged WHERE clo <> chi
      |           UNION ALL SELECT chi FROM tagged WHERE clo <> chi) GROUP BY 1),
      |vol AS (SELECT com, CAST(COUNT(*) AS BIGINT) AS volume FROM (
      |          SELECT clo AS com FROM tagged
      |          UNION ALL SELECT chi FROM tagged) GROUP BY 1)
      |SELECT v.com, COALESCE(c.cut_edges, 0) AS cut_edges, v.volume,
      |  (1000000 * COALESCE(c.cut_edges, 0)) // GREATEST(LEAST(v.volume, 2 * m.m - v.volume), 1) AS conductance_ppm
      |FROM vol v LEFT JOIN cutc c ON c.com = v.com
      |CROSS JOIN m
      |ORDER BY v.com""".stripMargin

  /** Degree distribution of the co-supply graph (r9): the histogram
    * (degree, node count) plus the cumulative node fraction — THE hub
    * telemetry every graph op's skew guard is sized from (the wedge-join
    * family's maxMidDegree dial, the O(√m) orientation bound). One
    * map-side-combined degree aggregate; the cumulative runs over
    * HISTOGRAM rows only (distinct degrees — bounded by max degree, never
    * node count: the audited two-level shape). Exact integers end-to-end. */
  def qDegreeDistribution(spark: SparkSession, dir: String): DataFrame = {
    val edges = coSupplyEdges(spark, dir)
    val deg = edges.select(col("lo").as("id"))
      .union(edges.select(col("hi").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
    val hist = deg.groupBy("degree").agg(count(lit(1)).as("n_nodes"))
    val tot = hist.agg(sum("n_nodes").cast("long").as("t"))
    // default RANGE frame; histogram degrees are distinct so no peer rows
    val w = org.apache.spark.sql.expressions.Window.orderBy("degree")
    hist
      .withColumn("cum", sum("n_nodes").over(w).cast("long"))
      .crossJoin(broadcast(tot))
      .select(col("degree"), col("n_nodes"),
        expr("(1000000 * cum) div t").as("cum_nodes_ppm"))
      .orderBy("degree")
  }

  val qDegreeDistributionSql: String =
    s"""WITH ${coSupplyCteSql()},
      |deg AS (
      |  SELECT id, CAST(COUNT(*) AS BIGINT) AS degree FROM (
      |    SELECT lo AS id FROM edges UNION ALL SELECT hi FROM edges) GROUP BY 1),
      |hist AS (SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
      |         FROM deg GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n_nodes) AS BIGINT) AS t FROM hist)
      |SELECT degree, n_nodes,
      |  CAST((1000000 * SUM(n_nodes) OVER (ORDER BY degree)) // t AS BIGINT) AS cum_nodes_ppm
      |FROM hist, tot ORDER BY degree""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_conductance" -> (qConductance _),
    "q_degree_distribution" -> (qDegreeDistribution _),
    "q_pagerank" -> (qPagerank _),
    "q_triangle_count" -> (qTriangleCount _),
    "q_bfs_layers" -> (qBfsLayers _),
    "q_link_predict" -> (qLinkPredict _),
    "q_assortativity" -> (qAssortativity _),
    "q_kcore" -> (qKcore _),
    "q_modularity" -> (qModularity _))

  val oracles: Map[String, String] = Map(
    "q_conductance" -> qConductanceSql,
    "q_degree_distribution" -> qDegreeDistributionSql,
    "q_pagerank" -> qPagerankSql,
    "q_triangle_count" -> qTriangleCountSql,
    "q_bfs_layers" -> qBfsLayersSql,
    "q_link_predict" -> qLinkPredictSql,
    "q_assortativity" -> qAssortativitySql,
    "q_kcore" -> qKcoreSql,
    "q_modularity" -> qModularitySql)
}
