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

  test("link prediction ≡ in-memory reference scorer on 8 seeded random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    for (t <- 1 to 8) {
      val n = 8 + rnd.nextInt(10)
      val edges = (for {
        a <- 0L until n; b <- (a + 1) until n if rnd.nextDouble() < 0.35
      } yield (a, b)).toSeq
      if (edges.nonEmpty) {
        // reference: adjacency sets, candidate = non-edge with >=1 common nb
        val adj = (edges ++ edges.map(_.swap))
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val deg = adj.view.mapValues(_.size.toLong).toMap
        val eset = edges.toSet
        val ref = (for {
          u <- adj.keys; v <- adj.keys if u < v && !eset((u, v))
          common = adj(u) intersect adj(v) if common.nonEmpty
        } yield {
          val cn = common.size.toLong
          val j = 1000000L * cn / (deg(u) + deg(v) - cn)
          val aa = common.toSeq.map(nb => 1000000L / deg(nb)).sum
          (u, v, cn, j, aa)
        }).toSeq.sortBy { case (u, v, cn, j, _) => (-cn, -j, u, v) }.take(20)
        val got = ops.Graph.linkPredictOf(edges.toDF("lo", "hi")).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getLong(4))).toSeq
        assert(got == ref,
          s"trial $t (n=$n, |E|=${edges.size}):\n got $got\n ref $ref")
      }
    }
  }

  test("modularity contributions ≡ in-memory reference on random partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    for (t <- 1 to 6) {
      val n = 10 + rnd.nextInt(10)
      val edges = (for {
        a <- 0L until n; b <- (a + 1) until n if rnd.nextDouble() < 0.3
      } yield (a, b)).toSeq
      val coms = (0L until n).map(i => (i, rnd.nextInt(3).toLong))
      if (edges.nonEmpty) {
        val comMap = coms.toMap
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val m = edges.size.toLong
        val dSum = (edges.map(_._1) ++ edges.map(_._2))
          .groupBy(comMap).view.mapValues(_.size.toLong).toMap
        val eIn = edges.filter(e => comMap(e._1) == comMap(e._2))
          .groupBy(e => comMap(e._1)).view.mapValues(_.size.toLong).toMap
        val nN = nodes.groupBy(comMap).view.mapValues(_.size.toLong).toMap
        val ref = nN.keys.toSeq.sorted.map { c =>
          val e = eIn.getOrElse(c, 0L); val d = dSum(c)
          (c, nN(c), e, d, 1000000L * (4 * m * e - d * d) / (4 * m * m))
        }
        val got = ops.Graph.modularityOf(edges.toDF("lo", "hi"),
            coms.toDF("s_suppkey", "com")).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getLong(4))).toSeq
        assert(got == ref, s"trial $t:\n got $got\n ref $ref")
      }
    }
  }

  test("conductance ≡ in-memory reference on random partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    for (t <- 1 to 6) {
      val n = 10 + rnd.nextInt(10)
      val edges = (for {
        a <- 0L until n; b <- (a + 1) until n if rnd.nextDouble() < 0.3
      } yield (a, b)).toSeq
      val coms = (0L until n).map(i => (i, rnd.nextInt(3).toLong))
      if (edges.nonEmpty) {
        val comMap = coms.toMap
        val m = edges.size.toLong
        val vol = (edges.map(_._1) ++ edges.map(_._2))
          .groupBy(comMap).view.mapValues(_.size.toLong).toMap
        val cut = (edges.filter(e => comMap(e._1) != comMap(e._2))
          .flatMap(e => Seq(comMap(e._1), comMap(e._2))))
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        val ref = vol.keys.toSeq.sorted.map { c =>
          val cc = cut.getOrElse(c, 0L); val v = vol(c)
          (c, cc, v, 1000000L * cc / math.min(v, 2 * m - v))
        }
        val got = ops.Graph.conductanceOf(edges.toDF("lo", "hi"),
            coms.toDF("s_suppkey", "com")).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSeq
        assert(got == ref, s"trial $t:\n got $got\n ref $ref")
      }
    }
  }

  test("sssp ≡ in-memory Bellman-Ford on 10 seeded random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    for (t <- 1 to 10) {
      val n = 8 + rnd.nextInt(14)
      val p = 0.1 + rnd.nextDouble() * 0.3
      val edges = (for {
        a <- 0L until n; b <- (a + 1) until n if rnd.nextDouble() < p
      } yield (a, b)).toSeq
      if (edges.nonEmpty) {
        val rounds = 6
        // reference: synchronous relaxation over the same weighted bidir list
        val w = edges.map { case (lo, hi) => ((lo, hi), 1L + (lo * 7 + hi * 3) % 9) }.toMap
        val bidir = edges.flatMap { case (lo, hi) =>
          Seq((lo, hi, w((lo, hi))), (hi, lo, w((lo, hi)))) }
        val src = edges.flatMap(e => Seq(e._1, e._2)).min
        var dist = Map(src -> 0L)
        for (_ <- 1 to rounds) {
          val relax = bidir.flatMap { case (s, d, wt) =>
            dist.get(s).map(x => (d, x + wt)) }
          dist = (dist.toSeq ++ relax).groupBy(_._1)
            .view.mapValues(_.map(_._2).min).toMap
        }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSet
        val hist = dist.values.groupBy(identity)
          .map { case (d, xs) => (d, xs.size.toLong) }
        val ref = (hist + (-1L -> (nodes.size - dist.size).toLong))
          .toSeq.sortBy(_._1)
        val got = ops.Graph2.ssspOf(edges.toDF("lo", "hi"), rounds).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
        assert(got == ref,
          s"trial $t (n=$n, |E|=${edges.size}):\n got $got\n ref $ref")
      }
    }
  }

  test("label propagation ≡ in-memory synchronous LPA on 10 seeded random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    for (t <- 1 to 10) {
      val n = 8 + rnd.nextInt(14)
      val p = 0.1 + rnd.nextDouble() * 0.3
      val edges = (for {
        a <- 0L until n; b <- (a + 1) until n if rnd.nextDouble() < p
      } yield (a, b)).toSeq
      if (edges.nonEmpty) {
        val rounds = 4
        val adj = (edges ++ edges.map(_.swap))
          .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
        var lab = adj.keys.map(i => (i, i)).toMap
        val ref = (1 to rounds).map { r =>
          lab = adj.map { case (node, nbs) =>
            val counts = nbs.map(lab).groupBy(identity)
              .view.mapValues(_.size.toLong).toMap
            val mc = counts.values.max
            (node, counts.collect { case (l, c) if c == mc => l }.min)
          }
          val sizes = lab.values.groupBy(identity).map(_._2.size.toLong)
          (r, sizes.size.toLong, sizes.max)
        }
        val got = ops.Graph2.communitiesOf(edges.toDF("lo", "hi"), rounds)
          .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
        assert(got == ref,
          s"trial $t (n=$n, |E|=${edges.size}):\n got $got\n ref $ref")
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
