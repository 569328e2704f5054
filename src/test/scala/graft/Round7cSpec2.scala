package graft

/** Round-7 batch q: operational/statistical analytics invariants — ABC
  * classes, growth accounting conservation, cycle-time monotonicity,
  * control-chart limits, burstiness floor, ANOVA/Spearman ranges. */
class Round7cSpec2 extends SparkSpec {

  test("q_abc_analysis: classes partition revenue; shares ordered A >= B-range >= C-tail") {
    val rows = ops.StatsOps.qAbcAnalysis(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows.keySet.subsetOf(Set("A", "B", "C")) && rows.contains("A"))
    val shares = rows.view.mapValues(_._3).toMap
    // A covers ~70% (boundary part may overshoot), B ~20, C ~10
    assert(shares("A") >= 650000 && shares("A") <= 800000, s"A share ${shares("A")}")
    assert(shares.values.sum >= 999998 && shares.values.sum <= 1000002,
      s"shares must sum to ~1e6 ppm: $shares")
    // every part classified exactly once: n_parts sums to the part count
    val nParts = Tables.table(spark, sfDir, "lineitem")
      .select("l_partkey").distinct().count()
    assert(rows.values.map(_._1).sum == nParts)
  }

  test("q_growth_accounting: conservation + first week is all-new") {
    val rows = ops.StatsOps.qGrowthAccounting(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("active") ==
        r.getAs[Long]("n_new") + r.getAs[Long]("n_retained") + r.getAs[Long]("n_resurrected"))
    }
    val first = rows.minBy(_.getAs[Long]("w"))
    assert(first.getAs[Long]("n_retained") == 0 && first.getAs[Long]("n_resurrected") == 0,
      "week 0 must classify everyone as new")
  }

  test("q_cycle_time: p50 <= p90 and both within the observed delta range") {
    val rows = ops.StatsOps.qCycleTime(spark, sfDir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (p50, p90) = (r.getAs[Long]("p50_days"), r.getAs[Long]("p90_days"))
      assert(p50 <= p90, s"${r.getString(0)}: p50 $p50 > p90 $p90")
      assert(p50 >= 0 && p90 <= 3660, "ship delay out of sane range")
    }
  }

  test("q_backlog_age: bands partition the open orders") {
    val rows = ops.StatsOps.qBacklogAge(spark, sfDir).collect()
    val openCount = Tables.table(spark, sfDir, "orders")
      .where(org.apache.spark.sql.functions.col("o_orderstatus") === "O").count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == openCount)
  }

  test("q_interarrival: moments positive; burstiness in [-1, 1); counts tie out") {
    val rows = ops.StatsOps.qInterarrival(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val perType = Tables.table(spark, sfDir, "events")
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      // n intervals = n events of the type - 1 (one lag per ordered pair)
      assert(r.getAs[Long]("n") == perType(t) - 1,
        s"$t: ${r.getAs[Long]("n")} intervals for ${perType(t)} events")
      assert(r.getAs[Long]("mean_us") > 0, s"$t: non-positive mean gap")
      assert(r.getAs[Double]("cv") > 0.0, s"$t: non-positive cv")
      val b = r.getAs[Double]("burstiness")
      // B = (sigma-mu)/(sigma+mu) with sigma,mu > 0 is strictly inside
      assert(b > -1.0 && b < 1.0, s"$t: burstiness $b out of (-1, 1)")
    }
  }

  test("q_control_chart: lcl < mean < ucl; violations bounded by day count") {
    val r = ops.StatsOps.qControlChart(spark, sfDir).collect().head
    assert(r.getAs[Double]("lcl") < r.getAs[Double]("mean_x"))
    assert(r.getAs[Double]("mean_x") < r.getAs[Double]("ucl"))
    assert(r.getAs[Long]("n_violations") <= r.getAs[Long]("n_days"))
  }

  test("t_burstiness: VMR > 0; df floor held; top list ordered by df") {
    val rows = ops.TextOps5.tBurstiness(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("df") >= 20)
      assert(r.getAs[Long]("tf") >= r.getAs[Long]("df"))
      assert(r.getAs[Double]("burstiness") >= 0.0)
    }
    val dfs = rows.map(_.getAs[Long]("df")).toSeq
    assert(dfs == dfs.sortBy(-_), "not ordered by df desc")
  }

  test("s_embed_drift: parity cohorts of one corpus drift ~nothing") {
    val r = ops.Similarity2.sEmbedDrift(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_a") > 0 && r.getAs[Long]("n_b") > 0)
    // vec_id parity is a random split of ONE distribution: the L2 shift
    // must be tiny relative to the unit-scale embeddings
    assert(r.getAs[Double]("l2_sq") < 1.0, s"parity drift ${r.getAs[Double]("l2_sq")}")
  }

  test("q_hazard_curve: at-risk never increases; hazard within [0, 1e6]") {
    val rows = ops.StatsOps.qHazardCurve(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val risk = rows.map(_.getAs[Long]("n_at_risk"))
    assert(risk.zip(risk.tail).forall { case (a, b) => b <= a },
      "risk set must shrink monotonically")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_events") <= r.getAs[Long]("n_at_risk"))
      val h = r.getAs[Long]("hazard_ppm")
      assert(h >= 0 && h <= 1000000)
    }
  }

  test("q_attribution_position: per-conversion credit conserved up to middle truncation") {
    val rows = ops.StatsOps.qAttributionPosition(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val totalCredit = rows.map(_.getAs[Long]("credit_micro")).sum
    // every purchase distributes <= 1e6 micro (equality except the
    // truncated middle shares), and never more
    val nPurchases = Tables.table(spark, sfDir, "events")
      .where(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .count()
    assert(totalCredit <= 1000000L * nPurchases)
    assert(totalCredit > 900000L * nPurchases,
      "credit lost to truncation should be a sliver")
  }

  test("q_tukey_fence: quartiles ordered; outliers a small minority") {
    val r = ops.StatsOps.qTukeyFence(spark, sfDir).collect().head
    assert(r.getAs[Long]("q1_cents") <= r.getAs[Long]("q3_cents"))
    val out = r.getAs[Long]("n_low_outliers") + r.getAs[Long]("n_high_outliers")
    assert(out * 10 < r.getAs[Long]("n"), "more than 10% flagged as outliers")
  }

  test("q_purchase_cadence: shares sum to ~1e6 ppm; gaps within [0, 15]") {
    val rows = ops.StatsOps.qPurchaseCadence(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getAs[Long]("gap_days")
      assert(g >= 0 && g <= 15)
    }
    val total = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(total >= 999900 && total <= 1000000, s"shares sum to $total")
  }

  test("q_ab_srm: parity split of sequential ids is exactly balanced -> no SRM") {
    val r = ops.StatsOps.qAbSrm(spark, sfDir).collect().head
    assert(math.abs(r.getAs[Long]("n_a") - r.getAs[Long]("n_b")) <= 1)
    assert(!r.getAs[Boolean]("srm_detected"))
  }

  test("q_cuped: variance reduction ratio = theta-normalized correlation^2, in [0, 1]") {
    val r = ops.StatsOps.qCuped(spark, sfDir).collect().head
    val vr = r.getAs[Double]("variance_reduction")
    assert(vr >= 0.0 && vr <= 1.0, s"reduction ratio $vr out of [0,1]")
  }

  test("d_band_sweep: candidate volume non-increasing in r; recall perfect at r=2 implies >= at smaller r") {
    val rows = ops.Dedup.dBandSweep(spark, sfDir).collect()
      .map(r => r.getAs[Int]("band_rows") ->
        ((r.getAs[Long]("n_candidates"), r.getAs[Long]("recall_ppm")))).toMap
    assert(rows.keySet == Set(2, 4, 8))
    // smaller r = more permissive banding: candidates(r=2) >= candidates(r=4) >= candidates(r=8)
    assert(rows(2)._1 >= rows(4)._1 && rows(4)._1 >= rows(8)._1,
      s"candidate monotonicity violated: $rows")
    assert(rows(2)._2 >= rows(4)._2 && rows(4)._2 >= rows(8)._2,
      s"recall monotonicity violated: $rows")
  }

  test("s_pq_distortion: MSE positive and bounded by max; max below the unit-scale ceiling") {
    val r = ops.Similarity.sPqDistortion(spark, sfDir).collect().head
    val (mse, mx) = (r.getAs[Double]("mse"), r.getAs[Double]("max_err"))
    assert(r.getAs[Long]("n_vectors") > 0)
    assert(mse > 0.0 && mse <= mx)
  }

  test("q_hhi: many-customer corpus concentrates nowhere near the 0.15 threshold") {
    val r = ops.StatsOps.qHhi(spark, sfDir).collect().head
    val hhi = r.getAs[Long]("hhi_ppm")
    // lower bound: perfectly equal shares give 1e6/n
    assert(hhi >= 1000000L / r.getAs[Long]("n_customers"))
    assert(hhi < 150000L, s"uniform-ish TPC-H customers can't be concentrated: $hhi")
    assert(r.getAs[Long]("top1_share_ppm") >= hhi / 1000,
      "top-1 share sanity")
  }

  test("d_cross_source_dup: complete pair spine; diagonal excluded; ppm bounded") {
    val rows = ops.Dedup2.dCrossSourceDup(spark, sfDir).collect()
    val srcs = rows.map(_.getString(0)).distinct.length
    assert(rows.length == srcs * (srcs - 1), "matrix spine incomplete")
    rows.foreach { r =>
      assert(r.getString(0) != r.getString(1))
      val ppm = r.getAs[Long]("dup_ppm")
      assert(ppm >= 0 && ppm <= 1000000)
      assert(r.getAs[Long]("dup_docs") <= r.getAs[Long]("a_total"))
    }
  }

  test("t_code_detect: synthetic prose corpus routes almost nothing to code") {
    val rows = ops.TextOps5.tCodeDetect(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val code = rows.map(_.getAs[Long]("n_code")).sum
    assert(code.toDouble / total < 0.05,
      s"prose corpus flagged $code/$total as code")
  }
}
