package graft

import graft.catalog.LakeCatalog
import graft.ops.{Multimodal, Multimodal2}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-5 regression tests for the ADVICE r4 findings: zone-map sidecar
  * robustness (non-finite stats, BIGINT narrowing), CDC unknown-op safety,
  * and the empty-payload phantom-chunk guard. */
class Round5Spec extends SparkSpec {

  private def freshCat: LakeCatalog = {
    val root = java.nio.file.Files.createTempDirectory("graft_r5_spec").toString
    new LakeCatalog(spark, root)
  }

  test("non-finite double stats (Inf/NaN) never poison the stats sidecar") {
    // ADVICE r4 (medium): ±Infinity is a legitimate parquet min/max stat;
    // serializing it emitted an 'Infinity' token Jackson rejects, after
    // which EVERY sidecar read (countStar, filesMeta, pruneFiles, SHOW
    // FILES/BOUNDS) threw for the table. Now: such columns get no bounds
    // (the absent-stats path) and everything stays readable.
    import spark.implicits._
    val cat = freshCat
    cat.createTable("ns", "inf", StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType))))
    cat.append("ns", "inf", Seq((1L, 1.5), (2L, 2.5)).toDF("id", "v").coalesce(1))
    cat.append("ns", "inf",
      Seq((3L, Double.PositiveInfinity), (4L, Double.NegativeInfinity))
        .toDF("id", "v").coalesce(1))
    cat.append("ns", "inf", Seq((5L, Double.NaN)).toDF("id", "v").coalesce(1))
    // all metadata paths must survive the commits above
    assert(cat.countStar("ns", "inf").contains(5L))
    assert(cat.filesMeta("ns", "inf").count() >= 3)
    val bounds = cat.fileBounds("ns", "inf")
    assert(bounds.nonEmpty, "sidecar unreadable after non-finite append")
    // id has bounds in every data file; v has none where non-finite
    val flat = bounds.values.flatMap(_.keySet).toSet
    assert(flat.contains("id"))
    assert(bounds.values.flatten.collect { case ("v", (lo, hi)) => (lo, hi) }
      .forall { case (lo, hi) => lo.isFinite && hi.isFinite },
      "non-finite bound leaked into the sidecar")
    // the Inf/NaN files have no v bounds -> must-read under any v range
    val (read, skipped) = cat.pruneFiles("ns", "inf", "v", 100.0, 200.0)
    assert(read.size >= 2, s"files with non-finite v stats must stay must-read: $read / $skipped")
  }

  test("BIGINT bounds beyond 2^53 widen conservatively (never tighten)") {
    // ADVICE r4 (low): Long->Double narrowing rounds to nearest, so a
    // recorded min could round UP past real rows and pruneFiles would
    // wrongly "prove" disjointness. Bounds must bracket the true values.
    import spark.implicits._
    val cat = freshCat
    val big = (1L << 60) + 1L
    cat.createTable("ns", "big", StructType(Seq(StructField("k", LongType))))
    cat.append("ns", "big", Seq(big, -big).toDF("k").coalesce(1))
    val kb = cat.fileBounds("ns", "big").values.flatMap(_.get("k")).toSeq
    assert(kb.nonEmpty, "no bounds recorded for k")
    kb.foreach { case (lo, hi) =>
      assert(BigDecimal(lo) <= BigDecimal(-big), s"min bound $lo tighter than ${-big}")
      assert(BigDecimal(hi) >= BigDecimal(big), s"max bound $hi tighter than $big")
    }
    // the defining property: a range query touching the true extremes must
    // NOT skip the file
    val (read, _) = cat.pruneFiles("ns", "big", "k", big.toDouble, big.toDouble)
    assert(read.nonEmpty, "file containing k=2^60+1 was wrongly pruned")
  }

  test("applyCdc ignores unknown ops instead of silently deleting their keys") {
    // ADVICE r4 (low): allKeys was built from ALL change rows but only
    // 'u' rows were re-inserted — an unknown op (Debezium 'c'/'r') removed
    // its key from the table. Unknown ops must be no-ops.
    import spark.implicits._
    val cat = freshCat
    cat.createTable("ns", "cdc", StructType(Seq(
      StructField("k", LongType), StructField("v", StringType))))
    cat.append("ns", "cdc",
      Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("k", "v").coalesce(1))
    val changes = Seq(
      (1L, "updated", "u"),  // normal upsert
      (2L, "ignored", "c"),  // unknown op: must not touch key 2
      (3L, "gone", "d"))     // normal delete
      .toDF("k", "v", "op")
    cat.applyCdc("ns", "cdc", changes, "k", "op")
    val got = cat.load("ns", "cdc").select("k", "v").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "updated"), (2L, "two")),
      s"unknown-op row corrupted the table: $got")
  }

  test("empty payloads yield zero chunks/frames (no sequence(0,-1) phantoms)") {
    // ADVICE r4 (low): Spark's two-arg sequence infers step -1 when
    // start > stop, so an empty text produced [0, -1] — two phantom
    // chunks — while DuckDB's generate_series(0, -1) is empty. The ops
    // must produce IDENTICAL results with empty docs present.
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_r5_empty").toString
    val docs = Tables.table(spark, sfDir, "documents")
    val empties = Seq(
      (1000000L, "", "en", "web", 0L),   // doc_id % 10 == 0 -> m_chunk_manifest
      (1000003L, "", "en", "web", 0L))   // doc_id % 10 == 3 -> m_av_sync
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.unionByName(empties).write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")

    val manifest = Multimodal.mChunkManifest(spark, tmp).collect()
    assert(!manifest.exists(_.getLong(0) == 1000000L),
      "phantom chunks for an empty payload in m_chunk_manifest")
    assert(manifest.length == Multimodal.mChunkManifest(spark, sfDir).count())

    val av = Multimodal2.mAvSync(spark, tmp).collect()
    assert(!av.exists(_.getLong(0) == 1000003L),
      "phantom frames for an empty payload in m_av_sync")

    val casWith = Multimodal2.mCasDedup(spark, tmp).collect().toSeq
    val casWithout = Multimodal2.mCasDedup(spark, sfDir).collect().toSeq
    assert(casWith == casWithout,
      s"empty docs changed CAS accounting: $casWith vs $casWithout")
  }
}
