package graft

import graft.catalog.LakeCatalog
import graft.ops.{CatalogOps3, ClassifyOps, Dedup2}
import graft.streaming.StreamOps2
import org.apache.spark.sql.functions._

/** Semantics specs for the round-4b operators: zone-map file skipping,
  * bloom-filter ingest dedup, the in-plan classifiers, and streaming CDC
  * apply. All four are also DuckDB-hash-gated by the driver; these pin the
  * properties a result-hash can't state (files actually skipped, FPR
  * bounds, stream ≡ batch, replay fencing). */
class Round4bSpec extends SparkSpec {

  private def scratch: String =
    s"${System.getProperty("java.io.tmpdir")}/graft_warehouse"

  test("c_zone_skip: writer-clustered layout prunes most files from metadata; pruned ≡ full scan") {
    // run the op once: ONE appendClustered call builds the banded table +
    // records zone maps (r5: the layout comes from the writer, not from
    // hand-arranged per-band commits)
    val out = CatalogOps3.cZoneSkip(spark, sfDir).collect()(0)
    assert(out.getInt(2) == 8, s"expected 8 writer-produced files, got ${out.getInt(2)}")
    assert(out.getBoolean(3), "prune not effective (fewer than half the files skipped)")
    val cat = new LakeCatalog(spark, scratch)
    val bounds = cat.fileBounds("scratch", "ord_zones")
    val o = Tables.table(spark, sfDir, "orders")
    val maxKey = o.agg(max(col("o_orderkey"))).collect()(0).getLong(0)
    val w = maxKey / 8 + 1
    val lo = 2.0 * w
    val hi = 4.0 * w - 1
    val (read, skipped) = cat.pruneFiles("scratch", "ord_zones", "o_orderkey", lo, hi)
    // a 2-ideal-band predicate may straddle sampled boundaries but can
    // never intersect more than 4 of the 8 bands
    assert(read.size <= 4 && skipped.size >= 4,
      s"prune weaker than the band structure allows: read=$read skipped=$skipped")
    // the skip PROOF: every skipped file's recorded key range is disjoint
    // from the predicate, and every data file carries narrow bounds (the
    // writer's clustering quality: span < 2 ideal band widths)
    val dataFiles = read ++ skipped
    dataFiles.foreach { f =>
      val (bLo, bHi) = bounds(f)("o_orderkey")
      assert(bLo <= bHi, s"file $f bounds inverted")
      assert(bHi - bLo < 2.0 * w, s"file $f not clustered: span ${bHi - bLo} >= ${2 * w}")
    }
    skipped.foreach { f =>
      val (bLo, bHi) = bounds(f)("o_orderkey")
      assert(bHi < lo || bLo > hi, s"skipped file $f bounds [$bLo,$bHi] intersect [$lo,$hi]")
    }
    // correctness of pruning: pruned scan + predicate ≡ full scan + predicate
    val full = cat.load("scratch", "ord_zones")
      .where(col("o_orderkey").between(lo, hi)).count()
    val pruned = cat.loadPruned("scratch", "ord_zones", "o_orderkey", lo, hi)
      .where(col("o_orderkey").between(lo, hi)).count()
    assert(pruned == full && full == out.getLong(0))
  }

  test("d_bloom_ingest: no false negatives; bloom pass-through bounded") {
    // ground truth: the exact fingerprint join with no bloom in front
    val docs = Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), Dedup2.fingerprint(col("text")).as("t"))
    val truth = docs.where(col("doc_id") % 10 === 0).as("b")
      .join(docs.where(col("doc_id") % 10 =!= 0).as("c"), col("b.t") === col("c.t"))
      .groupBy(col("b.doc_id")).agg(min(col("c.doc_id")).as("dup_of"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "hollow test: no cross-split fingerprint dups in corpus")
    val got = Dedup2.dBloomIngest(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == truth, s"bloom-filtered result diverged: ${got.size} vs ${truth.size}")
    // the probe is selective: survivors = true dups + FPR-bounded extras.
    // m=2^18 bits, k=5, n ≈ corpus size ⇒ FPR ≪ 1%; allow ≤ 1% of batch.
    val batchSize = docs.where(col("doc_id") % 10 === 0).count()
    val survivors = Dedup2.bloomSurvivors(spark, sfDir).count()
    val trueDups = truth.size
    assert(survivors >= trueDups, "bloom dropped a true duplicate")
    assert(survivors - trueDups <= math.max(1L, batchSize / 100),
      s"bloom false positives ${survivors - trueDups} exceed 1% of batch $batchSize")
  }

  test("t_nb_classify: learner recovers a planted class-vocabulary signal at >= 0.9") {
    // The real corpus's lang column is independent of its text (documented
    // in the op's scaladoc) — the driver's DuckDB hash gate covers the
    // computation there. Here: a corpus whose classes DO have distinct
    // vocabulary must be learned nearly perfectly, proving the trainer
    // trains. 3 classes × 60 docs, 5 shared + 2 class-specific words/doc.
    import spark.implicits._
    val langs = Seq("aa", "bb", "cc")
    val planted = (0 until 180).map { i =>
      val lang = langs(i % 3)
      val shared = Seq("alpha", "beta", "gamma", "delta", "eps")
        .map(w => w + (i % 7)) // shared noise vocabulary
      val marker = Seq(s"marker_${lang}_${i % 4}", s"tag_$lang")
      (i.toLong, lang, (shared ++ marker).mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val cm = ClassifyOps.nbConfusion(planted).collect()
    val total = cm.map(_.getLong(2)).sum
    val correct = cm.filter(r => r.getString(0) == r.getString(1)).map(_.getLong(2)).sum
    assert(total == 36, s"expected 36 test docs, scored $total") // 180/5
    assert(correct.toDouble / total >= 0.9,
      s"planted-signal accuracy ${correct.toDouble / total} < 0.9")
    // and the real-corpus entry stays total + deterministic
    val real = ClassifyOps.tNbClassify(spark, sfDir).collect()
    assert(real.map(_.getLong(2)).sum > 0)
    val again = ClassifyOps.tNbClassify(spark, sfDir).collect()
    assert(real.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("s_label_probe: confusion matrix totals the test split; self-consistent argmax") {
    val cm = ClassifyOps.sLabelProbe(spark, sfDir).collect()
    val total = cm.map(_.getLong(2)).sum
    val testN = Tables.table(spark, sfDir, "embeddings")
      .where(col("vec_id") % 5 === 0).count()
    assert(total == testN, s"confusion total $total != test rows $testN")
    assert(cm.forall(_.getLong(2) > 0))
  }

  test("st_cdc_apply: stream ≡ batch; replayed batch id is fenced; resurrection works") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batchResult = StreamOps2.stCdcApply(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet

    // the same three batches through a real streaming query
    val cat = new LakeCatalog(spark, scratch)
    StreamOps2.freshCdcTable(cat, "cdc_stream")
    val mem = MemoryStream[(Long, Double, String)]
    val changes = mem.toDF().toDF("k", "v", "op")
      .select(col("k"), when(col("op") === "d", lit(null).cast("double"))
        .otherwise(col("v")).as("v"), col("op"))
    val q = StreamOps2.applyCdcStream(changes, cat, "cdc_stream")
    val batches = StreamOps2.cdcBatches(spark, sfDir).map(_.collect().map(r =>
      (r.getLong(0), if (r.isNullAt(1)) 0.0 else r.getDouble(1), r.getString(2))))
    batches.foreach { b => mem.addData(b.toSeq); q.processAllAvailable() }
    q.stop()
    val streamed = cat.load("scratch", "cdc_stream")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(streamed == batchResult, "stream result diverged from batch apply")

    // replay fence: re-applying an already-committed batch id is a no-op
    val before = cat.snapshots("scratch", "cdc_stream").length
    val replay = StreamOps2.cdcBatches(spark, sfDir)(1)
    cat.applyCdc("scratch", "cdc_stream", replay, "k", "op", Some(1L))
    assert(cat.snapshots("scratch", "cdc_stream").length == before,
      "replayed batch id was not fenced")
    // resurrection: keys 5..10 were deleted in batch 1 and re-upserted in
    // batch 2 — they must exist at half price
    val res = cat.load("scratch", "cdc_stream")
      .where(col("k").between(5, 10)).count()
    val expect = Tables.table(spark, sfDir, "orders")
      .where(col("o_orderkey").between(5, 10)).count()
    assert(res == expect, s"resurrected keys $res != $expect")
  }
}
