package graft

/** The bench-only ModelCache (build/query cost split, VERDICT r6 #3) must
  * be RESULT-invisible: training is bit-deterministic in (data, recipe),
  * so a memoized model and a freshly trained one produce identical rows.
  * s_ivfpq_topk exercises both cached model families in one plan (Lloyd
  * cells via ivfCells + PQ codebook via PqTrain). */
class AnnCacheSpec extends SparkSpec {

  test("cached ANN models are bit-identical to in-query training") {
    def rows() = ops.Similarity.sIvfPqTopk(spark, sfDir).collect()
      .map(_.toSeq).sortBy(_.toString)
    ops.ModelCache.clear()
    ops.ModelCache.enabled = false
    val uncached = rows()
    try {
      ops.ModelCache.enabled = true
      val coldCache = rows() // trains + records build time
      val warmCache = rows() // pure reuse
      assert(coldCache.length == uncached.length && coldCache.sameElements(uncached),
        "first cached run diverged from uncached training")
      assert(warmCache.sameElements(uncached),
        "model reuse changed query results")
      val builds = ops.ModelCache.buildSecs
      assert(builds.exists(_._1.startsWith("lloyd:")) &&
        builds.exists(_._1.startsWith("pq:")),
        s"both model families must report build cost, got ${builds.map(_._1)}")
      assert(builds.forall(_._2 > 0.0))
    } finally {
      ops.ModelCache.enabled = false
      ops.ModelCache.clear()
    }
  }

  test("cached co-supply edge set is result-invisible to the graph ops") {
    // the r7 graph build/query split (coSupplyEdges memo): the edge set is
    // a deterministic function of (data, recipe), so a graph op over the
    // cached list must emit the identical rows as the in-query derivation
    def rows() = ops.Graph.qTriangleCount(spark, sfDir).collect()
      .map(_.toSeq).sortBy(_.toString)
    ops.ModelCache.clear()
    ops.ModelCache.enabled = false
    val uncached = rows()
    try {
      ops.ModelCache.enabled = true
      val coldCache = rows()
      val warmCache = rows()
      assert(coldCache.sameElements(uncached),
        "first cached run diverged from the in-query edge derivation")
      assert(warmCache.sameElements(uncached),
        "edge-list reuse changed query results")
      assert(ops.ModelCache.buildSecs.exists(_._1.startsWith("cosupply:")),
        "edge build cost must be reported as a build line")
    } finally {
      ops.ModelCache.enabled = false
      ops.ModelCache.clear()
    }
  }

  test("persisted NSW graph index is result-invisible to the beam search") {
    // the NSW graph is DATA-scale (N x degree), so its cache is a parquet
    // index table (write once, read per query) rather than driver rows —
    // the d_index_persist shape; rows must match the in-query derivation
    def rows() = ops.Similarity2.sNswSearch(spark, sfDir).collect()
      .map(_.toSeq).sortBy(_.toString)
    ops.ModelCache.clear()
    ops.ModelCache.enabled = false
    val uncached = rows()
    try {
      ops.ModelCache.enabled = true
      val coldCache = rows()
      val warmCache = rows()
      assert(coldCache.sameElements(uncached),
        "first cached run diverged from the in-query graph build")
      assert(warmCache.sameElements(uncached),
        "persisted-index reuse changed query results")
      assert(ops.ModelCache.buildSecs.exists(_._1.startsWith("nswgraph:")),
        "graph build cost must be reported as a build line")
    } finally {
      ops.ModelCache.enabled = false
      ops.ModelCache.clear()
    }
  }

  test("persisted HNSW layer tables are result-invisible to the hierarchical search") {
    // the layer tables are index-scale fractions of the base graph; like
    // nswgraph they cache as a parquet index, never driver rows
    def rows() = ops.Similarity4.sHnswSearch(spark, sfDir).collect()
      .map(_.toSeq).sortBy(_.toString)
    ops.ModelCache.clear()
    ops.ModelCache.enabled = false
    val uncached = rows()
    try {
      ops.ModelCache.enabled = true
      val coldCache = rows()
      val warmCache = rows()
      assert(coldCache.sameElements(uncached),
        "first cached run diverged from the in-query layer build")
      assert(warmCache.sameElements(uncached),
        "persisted layer-table reuse changed query results")
      assert(ops.ModelCache.buildSecs.exists(_._1.startsWith("hnswlayers:")),
        "layer build cost must be reported as a build line")
    } finally {
      ops.ModelCache.enabled = false
      ops.ModelCache.clear()
    }
  }
}
