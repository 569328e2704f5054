package graft

import org.apache.spark.sql.functions._

/** Round-7 batch a: relational-surface gaps (windowed DISTINCT rewrite,
  * deterministic mode / interpolated median, bitwise aggregates), the
  * triangle census, Gopher quality rules, PMI collocations, and binary
  * Hamming retrieval. The DuckDB hash gate is the correctness authority;
  * these specs pin the in-plan invariants that would let a wrong-but-
  * deterministic change slip past a stale oracle. */
class Round7Spec extends SparkSpec {

  test("q_window_distinct: rewrite ≡ naive running-distinct semantics") {
    val rows = ops.Relational4.qWindowDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, cover) = (r.getLong(1), r.getLong(2))
      assert(cover >= n, s"coverage position $cover < n_types $n")
    }
    // cross-check one user against the literal windowed-distinct definition
    val u = rows.head.getLong(0)
    val ev = Tables.table(spark, sfDir, "events")
      .where(col("user_id") === u)
      .orderBy(expr("ts div 1000"), col("event_id")) // µs order — the op's contract
      .select("event_type").collect().map(_.getString(0))
    val nTypes = ev.distinct.length
    val naive = ev.scanLeft(Set.empty[String])(_ + _).drop(1)
      .indexWhere(_.size == nTypes) + 1
    assert(rows.head.getLong(1) == nTypes.toLong)
    assert(rows.head.getLong(2) == naive.toLong)
  }

  test("q_mode_median: mode is the max count with smallest-value tie-break; median brackets") {
    val li = Tables.table(spark, sfDir, "lineitem")
    ops.Relational4.qModeMedian(spark, sfDir).collect().foreach { r =>
      val flag = r.getString(0)
      val grp = li.where(col("l_returnflag") === flag)
      val counts = grp.groupBy("l_quantity").count()
        .collect().map(x => x.getDouble(0) -> x.getLong(1))
      val maxC = counts.map(_._2).max
      assert(r.getLong(2) == maxC, s"$flag: mode_cnt is not the max count")
      val tieWinner = counts.filter(_._2 == maxC).map(_._1).min
      assert(r.getDouble(1) == tieWinner, s"$flag: mode tie-break not smallest value")
      val (mn, mx) = grp.agg(min("l_extendedprice"), max("l_extendedprice"))
        .collect().map(x => (x.getDouble(0), x.getDouble(1))).head
      assert(r.getDouble(3) >= mn && r.getDouble(3) <= mx)
    }
  }

  test("q_bit_aggs: AND ⊆ OR as bitsets; popcount consistent") {
    ops.Relational4.qBitAggs(spark, sfDir).collect().foreach { r =>
      val (band, bor) = (r.getLong(1), r.getLong(2))
      assert((band & bor) == band, "bit_and must be a subset of bit_or")
      assert(r.getInt(4) == java.lang.Long.bitCount(bor))
    }
  }

  test("q_triangle_count: census internally consistent; edge set is the top decile") {
    val r = ops.Graph.qTriangleCount(spark, sfDir).collect().head
    val (nodes, edges, wedges, tris, ppm) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(edges > 0 && nodes > 0)
    assert(tris <= wedges, "closed wedges cannot exceed all wedges")
    assert(ppm == 3000000L * tris / wedges)
    assert(ppm <= 1000000L)
    // edge count equals ⌈pairs/10⌉ of the support-ranked pair set
    val ps = Tables.table(spark, sfDir, "lineitem")
      .select("l_partkey", "l_suppkey").distinct()
    val pairs = ps.as("a").join(ps.as("b"),
        col("a.l_partkey") === col("b.l_partkey") &&
          col("a.l_suppkey") < col("b.l_suppkey"))
      .groupBy(col("a.l_suppkey"), col("b.l_suppkey")).count().count()
    assert(edges == (pairs + 9) / 10)
  }

  test("t_gopher_filter: verdict recomputes from the reported measurements") {
    val rows = ops.TextOps5.tGopherFilter(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expected = r.getLong(1) >= 50 && r.getLong(1) <= 100000 &&
        r.getDouble(2) >= 3.0 && r.getDouble(2) <= 10.0 &&
        r.getDouble(3) >= 0.8 && r.getLong(4) >= 2
      assert(r.getBoolean(5) == expected, s"doc ${r.getLong(0)}: verdict drift")
    }
    // both verdicts must occur, or the gate is vacuous on this corpus
    assert(rows.exists(_.getBoolean(5)) && rows.exists(!_.getBoolean(5)))
  }

  test("t_pmi_bigrams: support threshold held; ranking is (pmi desc, bigram)") {
    val rows = ops.TextOps5.tPmiBigrams(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach(r => assert(r.getLong(2) >= 25))
    val keys = rows.map(r => (-r.getDouble(3), r.getString(0), r.getString(1)))
    assert(keys.sameElements(keys.sortBy(identity)), "output not in rank order")
  }

  test("s_hamming_topk: per-query ranking monotone; hamming approximates angle") {
    val rows = ops.Similarity2.sHammingTopk(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (_, rs) =>
      val hs = rs.sortBy(_.getInt(1)).map(_.getInt(3))
      assert(hs.sameElements(hs.sorted), "hamming not monotone in rank")
      assert(hs.forall(h => h >= 0 && h <= 64))
    }
    // sign-bit hamming is the SimHash angular estimator: top-5 mean distance
    // must sit well under the ~32-bit expectation of random sign vectors
    val mean = rows.map(_.getInt(3)).sum.toDouble / rows.length
    assert(mean < 28.0, f"top-5 mean hamming $mean%.1f not better than random (32)")
  }
}
