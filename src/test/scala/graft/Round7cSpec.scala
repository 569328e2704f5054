package graft

import org.apache.spark.sql.functions._
import graft.catalog.LakeCatalog

/** Round-7 batch c: z-order clustering — layout geometry (z-files are
  * (user, time) rectangles, linear files are full-time-range slabs), prune
  * sharpness, and soundness of the 2-D pruned scan against a full scan. */
class Round7cSpec extends SparkSpec {

  private def scratch: String =
    s"${System.getProperty("java.io.tmpdir")}/graft_warehouse"

  test("c_zorder: oracle booleans hold and the box aggregate is non-trivial") {
    val r = ops.CatalogOps7.cZorder(spark, sfDir).collect().head
    assert(r.getLong(0) > 0, "empty box — bounds derivation broken")
    assert(r.getBoolean(3), "linear layout unexpectedly pruned on time")
    assert(r.getBoolean(4), "z-order failed to prune a time slab below half")
    assert(r.getBoolean(5), "z-order failed to prune the 2-D box below half")
  }

  test("c_zorder: prune margins are wide, not knife-edge (flake guard, sf0.1)") {
    // The op's booleans gate at `read < 16 of 32`. The one sf0.1 flake this
    // round was a quarter-wide probe slab flipping 15<->16 with the range
    // partitioner's run-dependent sampled boundaries; the strip-aligned slab
    // reads 8 ideal + bounded bleed. Assert the MARGIN (<= 12 slab, <= 10
    // box) so erosion surfaces here before it ever flips the driver gate.
    // Deliberately at sf0.1 — the scale the flake appeared at (sampling
    // bleed is scale-dependent; a small-sf guard could stay green while
    // the driver-gate scale erodes) — and through the op's OWN
    // zorderLayoutAndBounds, so the guarded geometry is the gated one.
    val dir01 = "/root/testdata/sf0.1"
    assume(new java.io.File(s"$dir01/events.parquet").exists, s"$dir01 absent")
    val (cat, uLo, uHi, tLo, tHi) =
      ops.CatalogOps7.zorderLayoutAndBounds(spark, dir01)
    val (slabRead, slabSkip) = cat.pruneFilesBox("scratch", "ev_zorder",
      Seq(("ts_us", tLo.toDouble, tHi.toDouble)))
    val total = slabRead.size + slabSkip.size
    assert(total >= 16, s"z-ordered table has only $total files — layout changed?")
    assert(slabRead.size * 8 <= total * 3,
      s"strip-aligned time slab reads ${slabRead.size}/$total z-files — " +
        "margin to the <1/2 gate is eroding (ideal 1/8 + bleed)")
    val (boxRead, boxSkip) = cat.pruneFilesBox("scratch", "ev_zorder",
      Seq(("user_id", uLo.toDouble, uHi.toDouble), ("ts_us", tLo.toDouble, tHi.toDouble)))
    assert(boxRead.size * 16 <= (boxRead.size + boxSkip.size) * 5,
      s"2-D box reads ${boxRead.size}/${boxRead.size + boxSkip.size} z-files — " +
        "margin to the <1/2 gate is eroding (ideal 1/16 + bleed)")
  }

  test("z-ordered files are rectangles; linear files span the full time range") {
    ops.CatalogOps7.cZorder(spark, sfDir).collect() // (re)build both layouts
    val cat = new LakeCatalog(spark, scratch)
    val src = Tables.table(spark, sfDir, "events")
      .select(expr("ts div 1000").as("ts_us"))
    val b = src.agg(min("ts_us"), max("ts_us")).head()
    val span = (b.getLong(1) - b.getLong(0)).toDouble
    def tsExtents(table: String): Seq[Double] = {
      val bounds = cat.fileBounds("scratch", table)
      val (files, _) = cat.pruneFilesBox("scratch", table, Seq.empty)
      files.flatMap(f => bounds.get(f).flatMap(_.get("ts_us")))
        .map { case (lo, hi) => (hi - lo) / span }
    }
    val zExt = tsExtents("ev_zorder")
    val linExt = tsExtents("ev_linear")
    assert(zExt.nonEmpty && linExt.nonEmpty, "missing recorded bounds")
    // median linear file spans most of the time range — the second
    // dimension is invisible to a one-column sort (uniform ts: a user band
    // of even a few dozen rows samples ~the whole range)
    val linMedian = linExt.sorted.apply(linExt.size / 2)
    assert(linMedian > 0.6,
      f"median linear-file time extent $linMedian%.2f — expected ~full range")
    // typical z-file covers a narrow time band (32-file split of the curve
    // → cells 1/8 of the time range tall)
    val zMedian = zExt.sorted.apply(zExt.size / 2)
    assert(zMedian < 0.35,
      f"median z-file time extent $zMedian%.2f — Morton layout not rectangular")
    assert(zMedian < linMedian / 2,
      f"z extent $zMedian%.2f not clearly below linear $linMedian%.2f")
  }

  test("c_history_meta: rollback lineage via SHOW HISTORY (protocol surface)") {
    ops.CatalogOps7.cHistoryMeta(spark, sfDir).collect()
    val gw = new graft.catalog.SqlGateway(spark,
      new LakeCatalog(spark, scratch))
    val rows = gw.execute("SHOW HISTORY IN scratch.li_hist")
      .orderBy("version").collect()
    assert(rows.length == 5, s"expected 5 history rows, got ${rows.length}")
    val anc = rows.map(r => r.getInt(0) -> r.getBoolean(3)).toMap
    assert(anc == Map(0 -> true, 1 -> true, 2 -> false, 3 -> false, 4 -> true),
      s"ancestry flags wrong: ${anc.toSeq.sorted}")
    val parents = rows.map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(parents(4) == 1, "post-rollback commit must parent the rolled-back-to snapshot")
    assert(parents(2) == 1 && parents(3) == 2, "linear segment parents wrong")
  }

  test("c_overwrite_partitions: only the corrected partition's files change") {
    val rows = ops.CatalogOps7.cOverwritePartitions(spark, sfDir).collect()
    assert(rows.length == 5, s"expected 5 event types, got ${rows.length}")
    assert(rows.forall(_.getBoolean(3)), "untouched partition was restaged")
    assert(rows.forall(_.getBoolean(4)), "target partition kept stale files")
  }

  test("p_temperature_mix: low-resource languages get boosted, never above parity") {
    val rows = ops.Pipeline3.pTemperatureMix(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val en = rows.find(_._1 == "en").get
    assert(en._3 > en._4, "temperature share must shrink the dominant language")
    rows.filter(_._1 != "en").foreach { case (lang, _, nat, temp) =>
      assert(temp > nat, s"$lang: temperature share $temp !> natural $nat")
    }
    // shares still ordered by corpus size (α > 0 keeps monotonicity)
    val bySize = rows.sortBy(-_._2).map(_._4)
    assert(bySize.sameElements(bySize.sorted.reverse), "α=0.5 broke monotonicity")
  }

  test("c_clone_table: clones inherit merge-on-read deletion vectors") {
    import org.apache.spark.sql.types._
    val cat = new LakeCatalog(spark, scratch)
    cat.dropTable("scratch", "cl_dv_src")
    cat.dropTable("scratch", "cl_dv_dst")
    cat.createTable("scratch", "cl_dv_src", StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_extendedprice", DoubleType))))
    val li = Tables.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"))
    cat.append("scratch", "cl_dv_src", li.where(col("l_orderkey") % 4 === 0))
    val deleted = cat.deleteWhereMor("scratch", "cl_dv_src",
      col("l_orderkey") % 8 === 4)
    assert(deleted > 0, "MOR delete removed nothing — fixture broken")
    val srcCount = cat.load("scratch", "cl_dv_src").count()
    cat.cloneTable("scratch", "cl_dv_src", "cl_dv_dst")
    val cloneCount = cat.load("scratch", "cl_dv_dst").count()
    assert(cloneCount == srcCount,
      s"clone resurrected MOR-deleted rows: $cloneCount != $srcCount")
    assert(cat.countStar("scratch", "cl_dv_dst").contains(srcCount),
      "clone metadata COUNT(*) ignores inherited deletion vectors")
  }

  test("s_nsw_search: beam search beats visiting the corpus and still finds neighbors") {
    val rows = ops.Similarity2.sNswSearch(spark, sfDir).collect()
    assert(rows.nonEmpty, "no query rows")
    val n = Tables.table(spark, sfDir, "embeddings").count()
    rows.foreach { r =>
      val visited = r.getLong(3)
      assert(visited < n / 2,
        s"q=${r.getLong(0)}: visited $visited of $n — not sublinear, graph search pointless")
    }
    val meanRecall = rows.map(_.getLong(4)).sum.toDouble / rows.length / 1e6
    assert(meanRecall >= 0.4,
      f"mean recall@5 $meanRecall%.2f < 0.4 — beam search lost the neighborhood")
  }

  test("cherry-pick: CHERRY PICK verb works protocol-level; COW snapshots refused") {
    import org.apache.spark.sql.types._
    ops.CatalogOps7.cCherryPick(spark, sfDir).collect() // builds li_cherry
    val cat = new LakeCatalog(spark, scratch)
    val gw = new graft.catalog.SqlGateway(spark, cat)
    // a second staged append cherry-picks through the gateway verb
    val li = Tables.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"))
    cat.appendToBranch("scratch", "li_cherry",
      li.where(col("l_orderkey") % 3 === 1).limit(10), "hotfix")
    val before = cat.load("scratch", "li_cherry").count()
    val status = gw.execute("CHERRY PICK hotfix INTO scratch.li_cherry")
      .collect().head.getString(0)
    assert(status.startsWith("Cherry-picked"), s"unexpected status: $status")
    assert(cat.load("scratch", "li_cherry").count() == before + 10)
    // a ref pointing at a COW snapshot (parent files removed) must be refused
    cat.dropTable("scratch", "li_cow")
    cat.createTable("scratch", "li_cow", StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_extendedprice", DoubleType))))
    cat.append("scratch", "li_cow", li.where(col("l_orderkey") % 100 === 0))
    cat.deleteWhere("scratch", "li_cow", col("l_orderkey") % 200 === 0)
    val cowV = cat.snapshots("scratch", "li_cow").map(_._1).max
    cat.tagSnapshot("scratch", "li_cow", "cowtag", cowV)
    val e = intercept[IllegalArgumentException] {
      cat.cherryPick("scratch", "li_cow", "cowtag")
    }
    assert(e.getMessage.contains("not an append"),
      s"wrong refusal message: ${e.getMessage}")
  }

  test("c_stats_histogram: SHOW HISTOGRAM verb serves near-equal heights from metadata") {
    ops.CatalogOps7.cStatsHistogram(spark, sfDir).collect()
    val cat = new LakeCatalog(spark, scratch)
    val gw = new graft.catalog.SqlGateway(spark, cat)
    val rows = gw.execute("SHOW HISTOGRAM FOR scratch.li_histo (l_extendedprice)")
      .orderBy("bucket").collect()
    assert(rows.length == 10, s"expected 10 buckets, got ${rows.length}")
    val heights = rows.map(_.getLong(3))
    val n = heights.sum
    // equi-height up to band granularity: every bucket within 2× of n/10
    heights.foreach(h => assert(h * 10 <= n * 2 && h * 20 >= n,
      s"bucket height $h far from n/10 = ${n / 10} — banding degenerated"))
    // buckets tile the range in order without overlap
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(2) <= b.getDouble(1) + 1e-9,
        s"buckets overlap: ${a.getDouble(2)} > ${b.getDouble(1)}")
    }
  }

  test("d_lsh_recall: the banding S-curve holds — high-similarity recall ≈ 1") {
    val rows = ops.Dedup2.dLshRecall(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(rows.nonEmpty, "no ground-truth pairs at this sf — fixture broken")
    rows.get(9).foreach(r9 =>
      assert(r9 >= 900000L, s"bucket-9 recall $r9 ppm — bands misconfigured"))
    val worst = rows.values.min
    assert(worst >= 500000L,
      s"recall $worst ppm in some bucket ≥ τ — the index misses half its targets")
  }

  test("q_bootstrap_ci: interval brackets the sample mean and is nondegenerate") {
    val r = ops.Relational4.qBootstrapCi(spark, sfDir).collect().head
    val (mean, lo, hi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(lo < hi, s"degenerate CI [$lo, $hi]")
    assert(lo <= mean && mean <= hi, s"CI [$lo, $hi] misses sample mean $mean")
    // Poisson-bootstrap width sanity: σ/√n scaling says half-width < mean/√n·5
    val n = r.getLong(0).toDouble
    assert((hi - lo) / 2 < mean * 5 / math.sqrt(n),
      s"CI implausibly wide for n=$n: [$lo, $hi] around $mean")
  }

  test("2-D pruned scan ≡ full scan under the box predicate (prune soundness)") {
    ops.CatalogOps7.cZorder(spark, sfDir).collect()
    val cat = new LakeCatalog(spark, scratch)
    val src = Tables.table(spark, sfDir, "events")
      .select(col("user_id"), expr("ts div 1000").as("ts_us"))
    val r = src.agg(min("user_id"), max("user_id"), min("ts_us"), max("ts_us")).head()
    val (umn, umx) = (r.getLong(0), r.getLong(1))
    val (tmn, tmx) = (r.getLong(2), r.getLong(3))
    val uLo = umn + (umx - umn) * 3 / 8
    val uHi = umn + (umx - umn) * 5 / 8
    val tLo = tmn + (tmx - tmn) * 3 / 8
    val tHi = tmn + (tmx - tmn) * 5 / 8
    val pred = col("user_id") >= uLo && col("user_id") < uHi &&
      col("ts_us") >= tLo && col("ts_us") < tHi
    val pruned = cat.loadPrunedBox("scratch", "ev_zorder",
        Seq(("user_id", uLo.toDouble, uHi.toDouble), ("ts_us", tLo.toDouble, tHi.toDouble)))
      .where(pred).count()
    val full = src.where(pred).count()
    assert(pruned == full,
      s"pruned scan lost rows: $pruned != $full — zone-map prune unsound")
  }
}
