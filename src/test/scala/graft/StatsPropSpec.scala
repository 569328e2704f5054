package graft

/** Property sweep for the two-level rank machinery behind q_mann_whitney /
  * q_ks_test (ops/StatsOps.rankTableOf). The DuckDB gate proves the two
  * ENGINES agree; this proves the rank table agrees with the TEXTBOOK
  * definitions on random samples — a shared systematic bug (wrong bucket
  * carry, off-by-one in the prefix, tie mishandling) would pass the gate
  * and fail here. Samples are drawn at 2dp over a narrow range so ties and
  * bucket-boundary crossings are dense. */
class StatsPropSpec extends SparkSpec {

  /** Brute-force 2×U1: pairs (x ∈ g1, y ∈ g2) scored 2/1/0 for >/=/<. */
  private def bruteU1x2(g1: Seq[Double], g2: Seq[Double]): Long = {
    var u = 0L
    for (x <- g1; y <- g2)
      u += (if (x > y) 2L else if (x == y) 1L else 0L)
    u
  }

  /** Brute-force KS numerator: max over observed points of
    * |#{g1 ≤ v}·n2 − #{g2 ≤ v}·n1|. */
  private def bruteKsNum(g1: Seq[Double], g2: Seq[Double]): Long = {
    val n1 = g1.size.toLong; val n2 = g2.size.toLong
    (g1 ++ g2).distinct.map { v =>
      math.abs(g1.count(_ <= v) * n2 - g2.count(_ <= v) * n1)
    }.max
  }

  test("rank table ≡ textbook U and D on 60 seeded random samples (dense ties)") {
    val rnd = new scala.util.Random(42)
    for (t <- 1 to 60) {
      val n1 = 1 + rnd.nextInt(25)
      val n2 = 1 + rnd.nextInt(25)
      // 2dp over [0, 5): multiple per-bucket values, frequent exact ties,
      // integer values land ON bucket boundaries
      def draw(n: Int): Seq[Double] =
        Seq.fill(n)(math.floor(rnd.nextDouble() * 500) / 100.0)
      val (g1, g2) = (draw(n1), draw(n2))
      val df = spark.createDataFrame(
          g1.map(v => (v, 1L)) ++ g2.map(v => (v, 0L)))
        .toDF("value", "is1")
      val rk = ops.StatsOps.rankTableOf(df).collect()
        .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6)))
      // internal consistency: before counts rows strictly smaller; the
      // inclusive cums at the largest value equal the group sizes
      val total = n1 + n2
      rk.foreach { case (v, cnt, c1, c2, before, cum1, cum2) =>
        assert(c1 + c2 == cnt, s"trial $t: group split broken at $v")
        assert(before == rk.filter(_._1 < v).map(_._2).sum,
          s"trial $t: 'before' wrong at $v")
        assert(cum1 == rk.filter(_._1 <= v).map(_._3).sum &&
          cum2 == rk.filter(_._1 <= v).map(_._4).sum,
          s"trial $t: inclusive cums wrong at $v")
      }
      assert(rk.map(_._2).sum == total)
      // Mann-Whitney via the op's aggregation formula over the table
      val r1x2 = rk.map { case (_, cnt, c1, _, before, _, _) =>
        c1 * (2 * before + cnt + 1)
      }.sum
      val u1x2 = r1x2 - n1.toLong * (n1 + 1)
      assert(u1x2 == bruteU1x2(g1, g2),
        s"trial $t (n1=$n1, n2=$n2): U1x2 $u1x2 != brute ${bruteU1x2(g1, g2)}")
      // KS via the op's cross-multiplied maximum
      val dnum = rk.map { case (_, _, _, _, _, cum1, cum2) =>
        math.abs(cum1 * n2 - cum2 * n1)
      }.max
      assert(dnum == bruteKsNum(g1, g2),
        s"trial $t (n1=$n1, n2=$n2): D_num $dnum != brute ${bruteKsNum(g1, g2)}")
    }
  }

  test("gini identity: two-level band decomposition ≡ direct sorted-rank sum") {
    // the op's S1 = Σ_bands (before_b·Σx_b + Σ_j j·x_j) identity, swept over
    // random cent vectors against the direct Σ i·x_i on the global sort
    val rnd = new scala.util.Random(7)
    for (t <- 1 to 100) {
      val n = 1 + rnd.nextInt(40)
      val cents = Seq.fill(n)(rnd.nextInt(50000000).toLong)
      val bandW = 10000000L
      val sorted = cents.sorted
      val direct = sorted.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      // two-level: group by band, within-band rank, band prefix
      val byBand = cents.groupBy(_ / bandW).toSeq.sortBy(_._1)
      var before = 0L
      var s1 = 0L
      byBand.foreach { case (_, xs) =>
        val ws = xs.sorted
        s1 += before * ws.sum + ws.zipWithIndex.map { case (x, j) => (j + 1) * x }.sum
        before += ws.size
      }
      assert(s1 == direct, s"trial $t: band decomposition broke the rank sum")
    }
  }
}
