package graft

/** Property sweep for the distributed graph machinery against in-memory
  * references on seeded random graphs — the oracle gate proves engine
  * agreement on ONE corpus-derived graph; these prove the ALGORITHMS on
  * many adversarial shapes (disconnected pieces, pendant chains, cliques). */
class GraphPropSpec extends SparkSpec {

  /** Reference 3-core peel: per round, (removed, surviving). */
  private def refPeel(edges: Seq[(Long, Long)], k: Int,
                      rounds: Int): Seq[(Long, Long)] = {
    var surv = edges.flatMap(e => Seq(e._1, e._2)).toSet
    (1 to rounds).map { _ =>
      val deg = edges.filter(e => surv(e._1) && surv(e._2))
        .flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val next = surv.filter(n => deg.getOrElse(n, 0L) >= k)
      val out = ((surv.size - next.size).toLong, next.size.toLong)
      surv = next
      out
    }
  }

  test("k-core peel ≡ in-memory reference on 12 seeded random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (t <- 1 to 12) {
      val n = 8 + rnd.nextInt(16)
      val p = 0.15 + rnd.nextDouble() * 0.25
      val edges = (for {
        a <- 0L until n
        b <- (a + 1) until n
        if rnd.nextDouble() < p
      } yield (a, b)).toSeq
      if (edges.nonEmpty) {
        val df = edges.toDF("lo", "hi")
        val got = ops.Graph.kcorePeel(df, k = 3, rounds = 6).collect()
          .map(r => (r.getLong(1), r.getLong(2))).toSeq
        val want = refPeel(edges, k = 3, rounds = 6)
        assert(got == want,
          s"trial $t (n=$n, |E|=${edges.size}): peel $got != reference $want")
      }
    }
  }

  test("peel is idempotent at the fixpoint: a converged survivor set has min degree >= k") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val n = 20
    val edges = (for {
      a <- 0L until n; b <- (a + 1) until n if rnd.nextDouble() < 0.3
    } yield (a, b)).toSeq
    val rows = ops.Graph.kcorePeel(edges.toDF("lo", "hi"), k = 3, rounds = 8)
      .collect()
    // once a round removes 0, every later round must also remove 0
    val removed = rows.map(_.getLong(1))
    val afterConverge = removed.dropWhile(_ > 0)
    assert(afterConverge.forall(_ == 0L), s"peel resumed after fixpoint: ${removed.toSeq}")
  }
}
