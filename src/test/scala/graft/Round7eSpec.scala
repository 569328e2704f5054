package graft

import org.apache.spark.sql.functions._

/** Invariants for the fifth-pass round-7 ops (the per-batch pin the round
  * has kept: structural properties the oracle hash can't articulate). */
class Round7eSpec extends SparkSpec {

  test("s_jl_project: sign matrix is balanced and rows are distinct") {
    val m = ops.Similarity3.jlMatrix
    assert(m.length == 16 && m.forall(_.length == 64))
    assert(m.flatten.forall(v => v == 1.0 || v == -1.0))
    // balance: a parity-biased hash would skew projections systematically.
    // |Σ| over 1024 fair signs has σ = 32; 128 = 4σ, generous (knife-edge
    // margins over sampled constants flake — the c_zorder lesson)
    val s = m.flatten.sum
    assert(math.abs(s) <= 128.0, s"sign sum $s suggests a biased hash")
    assert(m.distinct.length == 16, "duplicate projection rows")
  }

  test("s_jl_project: distortion ratios center near 1 at test scale") {
    val df = ops.Similarity3.sJlProject(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val ratios = rows.map(_.getDouble(4))
    assert(ratios.forall(r => r > 0.0), "a negative/zero distortion ratio")
    val mean = ratios.sum / ratios.length
    // JL with 16 output dims: per-pair σ ≈ sqrt(2/16) ≈ 0.35; the MEAN of
    // ~30 pairs sits within ~3·σ/√30 ≈ 0.2 of 1. Measured 0.975 at sf0.01.
    assert(mean > 0.7 && mean < 1.3, s"mean distortion ratio $mean far from 1")
  }

  test("p_dp_release: releases are clamped and within the truncation bound") {
    val rows = ops.Pipeline4.pDpRelease(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nTrue = r.getLong(2); val noise = r.getLong(3); val rel = r.getLong(4)
      assert(rel >= 0, s"negative release: $r")
      assert(math.abs(noise) <= 5, s"noise beyond the truncation cap: $r")
      assert(rel == math.max(0L, nTrue + noise), s"release != clamp(true+noise): $r")
    }
    // the mechanism must actually perturb something at test scale — all-zero
    // noise means the seed path is broken (P(all zero) = 2^-|groups|·…)
    assert(rows.exists(_.getLong(3) != 0L), "noise is identically zero")
  }

  test("t_textrank: top-20 ranks are positive, sorted, and sum below 1") {
    val rows = ops.TextOps6.tTextrank(spark, sfDir).collect()
    assert(rows.length == 20)
    val ranks = rows.map(_.getDouble(1))
    assert(ranks.forall(r => r > 0.0 && r < 1.0))
    assert(ranks.sameElements(ranks.sorted.reverse), "ranks not descending")
    // ranks are a sub-distribution: the top-20 mass can't exceed the whole
    assert(ranks.sum < 1.0 + 1e-9, s"top-20 mass ${ranks.sum} exceeds 1")
  }

  test("q_sssp: histogram accounts for every node exactly once, distances in range") {
    val edges = ops.Graph.coSupplyEdges(spark, sfDir)
    val nNodes = edges.select(col("lo").as("id"))
      .union(edges.select(col("hi").as("id"))).distinct().count()
    val rows = ops.Graph2.ssspOf(edges, 6).collect()
    val total = rows.map(_.getLong(1)).sum
    assert(total == nNodes, s"histogram mass $total != $nNodes nodes")
    // max weighted distance after 6 rounds of weight ≤ 9 edges is 54
    rows.foreach { r =>
      val d = r.getLong(0)
      assert(d == -1L || (d >= 0L && d <= 54L), s"distance out of range: $r")
    }
    // the source contributes an exact (0, ...) bucket
    assert(rows.exists(r => r.getLong(0) == 0L && r.getLong(1) >= 1L))
  }
}
