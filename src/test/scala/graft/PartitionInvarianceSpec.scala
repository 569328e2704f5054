package graft

/** Results must be a function of (data, recipe) — NOT of the cluster shape.
  * Every double-bearing op in the registry claims order-independent
  * arithmetic (decimal-exact partial sums, deterministic tie-breaks); this
  * spec pins the claim by re-running representative ops on a sibling
  * session with a DIFFERENT (prime, non-divisor) shuffle-partition count
  * and asserting bit-identical output. At 100 TB the same property is what
  * makes a backfill on 200 executors agree with the nightly run on 1000.
  *
  * Representatives cover each arithmetic family: decimal-rounded power
  * iteration (q_pagerank, t_textrank), HLL register algebra (q_hll_merge),
  * prefix-window Welford (st_anomaly), banded MinHash-LSH (d_minhash_lsh),
  * the sort-based skyline identity (q_skyline), and hash-seeded noise
  * (p_dp_release). */
class PartitionInvarianceSpec extends SparkSpec {

  private val opsUnderTest = Seq(
    "q_pagerank", "t_textrank", "q_hll_merge", "st_anomaly",
    "d_minhash_lsh", "q_skyline", "p_dp_release",
    // second wave: integer iterative relaxation, hash-rank reservoir
    // windows, float32 mat-vec projection, BM25 idf/tf scoring
    "q_sssp", "q_quantile_merge", "s_jl_project", "t_bm25",
    // r8 wave: degree-ordered wedge census, 128-bit decimal moments,
    // stream-static LSH screen, decimal-mean cell split, A-ES weighted
    // top-k, read-merge-replace MV maintenance
    "q_triangle_count", "q_spearman", "st_lsh_screen",
    "s_ivf_rebalance", "p_weighted_sample", "st_mv_refresh",
    // r9 wave: histogram-threshold edge selection (the de-funneled
    // substrate under the whole graph family), planner-routed joins
    // (route must not depend on cluster shape), string-hashed blooms,
    // the composed near-dup curation chain
    "q_conductance", "q_degree_distribution", "c_cbo_planner",
    "c_bloom_string", "st_curate_neardup",
    // r10 wave: semi/anti planner routing, the before/after index-expiry
    // screen pair, the nprobe sweep's level-fanned rank selection
    "c_cbo_semijoin", "d_index_expire", "s_nprobe_sweep")

  test("outputs are invariant to spark.sql.shuffle.partitions (4 vs 7)") {
    val alt = spark.newSession()
    alt.conf.set("spark.sql.shuffle.partitions", "7")
    assert(alt.conf.get("spark.sql.shuffle.partitions") == "7" &&
      spark.conf.get("spark.sql.shuffle.partitions") == "4")
    opsUnderTest.foreach { name =>
      val fn = SparkEntry.queries(name)
      val base = fn(spark, sfDir).collect().map(_.toString).toSeq
      // the sibling session SHARES the SparkContext's CacheManager: without
      // clearing here, the 7-partition run would silently reuse any
      // intermediate the 4-partition run .cache()d (q_pagerank's edge set,
      // q_hll_merge's registers …) and never execute the cached segment at
      // the alternate partitioning — exactly the vacuity this spec exists
      // to avoid (review r7)
      spark.catalog.clearCache()
      val other = fn(alt, sfDir).collect().map(_.toString).toSeq
      assert(base.nonEmpty, s"$name returned no rows")
      assert(base == other,
        s"$name differs across shuffle-partition counts: " +
          base.zip(other).find { case (a, b) => a != b })
      alt.catalog.clearCache()
    }
  }
}
