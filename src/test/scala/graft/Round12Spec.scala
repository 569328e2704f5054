package graft

import graft.catalog.LakeCatalog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-12 invariants: the r11 verdict's action list — the MOR-aware
  * change feed (a pure-DV delete must feed its rows; an update must feed
  * its delete half), equality deletes (precedence vs positional DVs,
  * sequence-number scope, survival through compaction/expiry/clone), the
  * merge-on-read MERGE arm, the MAINTAIN ALL composition, the streamed
  * span screen's batch≡stream parity, and the PQ-graph-search quality pin
  * (recall ≥ ivfpq at strictly fewer full-vector scores). */
class Round12Spec extends SparkSpec {

  private def warehouse =
    s"${System.getProperty("java.io.tmpdir")}/graft_spec_warehouse"

  private def freshTable(cat: LakeCatalog, name: String,
                         rows: Seq[(Long, Double)]): Unit = {
    import spark.implicits._
    cat.dropTable("spec", name)
    cat.createTable("spec", name, StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType))))
    cat.append("spec", name, rows.toDF("k", "v"))
  }

  private def loaded(cat: LakeCatalog, name: String): Map[Long, Seq[Double]] =
    cat.load("spec", name).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSeq.sorted }

  // ------------------------------------- MOR-aware change feed (r11 #1)

  test("changes(): a pure-DV MOR delete feeds a NON-empty delete set equal to the DV'd rows") {
    val cat = new LakeCatalog(spark, warehouse)
    freshTable(cat, "chg_dv", (1L to 10L).map(k => k -> k.toDouble))
    val v1 = cat.headVersion("spec", "chg_dv")
    val files1 = cat.snapshots("spec", "chg_dv").last._2
    val n = cat.deleteWhereMor("spec", "chg_dv", col("k") % 3 === 0)
    val v2 = cat.headVersion("spec", "chg_dv")
    assert(cat.snapshots("spec", "chg_dv").last._2 == files1,
      "MOR delete must not change the file list")
    val feed = cat.changes("spec", "chg_dv", v1, v2).collect()
    assert(feed.nonEmpty, "pure-DV window produced an EMPTY feed (the r11 hole)")
    assert(feed.forall(_.getAs[String]("_change") == "delete"))
    assert(feed.map(_.getAs[Long]("k")).sorted.toSeq == Seq(3L, 6L, 9L))
    assert(n == 3L)
  }

  test("changes(): a MOR update feeds its full delete(old) + insert(new) pair") {
    val cat = new LakeCatalog(spark, warehouse)
    freshTable(cat, "chg_upd", (1L to 8L).map(k => k -> k.toDouble))
    val v1 = cat.headVersion("spec", "chg_upd")
    cat.updateWhereMor("spec", "chg_upd", col("k") === 5L, "v", col("v") * 2)
    val v2 = cat.headVersion("spec", "chg_upd")
    val feed = cat.changes("spec", "chg_upd", v1, v2).collect()
      .map(r => (r.getAs[String]("_change"), r.getLong(0), r.getDouble(1)))
      .toSet
    assert(feed == Set(("delete", 5L, 5.0), ("insert", 5L, 10.0)),
      s"update must feed both halves, got $feed")
  }

  test("changes(): an equality delete in the window feeds the matched rows as deletes") {
    val cat = new LakeCatalog(spark, warehouse)
    freshTable(cat, "chg_eq", (1L to 6L).map(k => k -> k.toDouble))
    val v1 = cat.headVersion("spec", "chg_eq")
    cat.deleteWhereEq("spec", "chg_eq", "k", Seq(2L, 4L))
    val v2 = cat.headVersion("spec", "chg_eq")
    val feed = cat.changes("spec", "chg_eq", v1, v2).collect()
      .map(r => (r.getAs[String]("_change"), r.getLong(0))).toSet
    assert(feed == Set(("delete", 2L), ("delete", 4L)))
  }

  // -------------------------------------------- equality deletes (r11 #2)

  test("equality delete: DV precedence, sequence-number scope, and compaction survival") {
    val cat = new LakeCatalog(spark, warehouse)
    import spark.implicits._
    freshTable(cat, "eqd", (1L to 10L).map(k => k -> k.toDouble))
    // positional DV kills k=4 first
    assert(cat.deleteWhereMor("spec", "eqd", col("k") === 4L) == 1L)
    // equality delete on {2, 4, 6}: 4 is already DV-dead → matched = 2 only
    val matched = cat.deleteWhereEq("spec", "eqd", "k", Seq(2L, 4L, 6L))
    assert(matched == 2L, s"DV-dead row must not be re-counted, got $matched")
    // re-insert key 2 AFTER the delete: alive by the scope rule
    cat.append("spec", "eqd", Seq((2L, 20.0)).toDF("k", "v"))
    val expect = Map(1L -> Seq(1.0), 2L -> Seq(20.0), 3L -> Seq(3.0),
      5L -> Seq(5.0), 7L -> Seq(7.0), 8L -> Seq(8.0), 9L -> Seq(9.0),
      10L -> Seq(10.0))
    assert(loaded(cat, "eqd") == expect)
    assert(cat.countStar("spec", "eqd").contains(8L),
      "countStar must stay metadata-exact under mixed DV + equality deletes")
    // compaction MATERIALIZES both mechanisms; answers survive verbatim
    cat.compact("spec", "eqd", 1)
    assert(loaded(cat, "eqd") == expect)
    assert(cat.countStar("spec", "eqd").contains(8L))
  }

  test("equality delete: expiry folds the line without widening its scope") {
    val cat = new LakeCatalog(spark, warehouse)
    import spark.implicits._
    freshTable(cat, "eqx", (1L to 6L).map(k => k -> k.toDouble))
    cat.deleteWhereEq("spec", "eqx", "k", Seq(2L, 6L))
    cat.append("spec", "eqx", Seq((2L, 20.0)).toDF("k", "v"))
    // expiry truncates the log line that validates the eq line's token —
    // the fold must keep the delete live AND keep the re-insert alive
    cat.expireSnapshots("spec", "eqx", keep = 1)
    val got = loaded(cat, "eqx")
    assert(!got.contains(6L), "expiry resurrected an equality-deleted row")
    assert(got(2L) == Seq(20.0),
      s"fold widened the delete onto the post-delete re-insert: ${got.get(2L)}")
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("equality delete: clone inherits the delete scoped to the cloned baseline only") {
    val cat = new LakeCatalog(spark, warehouse)
    import spark.implicits._
    freshTable(cat, "eqc_src", (1L to 5L).map(k => k -> k.toDouble))
    cat.deleteWhereEq("spec", "eqc_src", "k", Seq(3L))
    cat.dropTable("spec", "eqc_dst")
    cat.cloneTable("spec", "eqc_src", "eqc_dst")
    assert(!loaded(cat, "eqc_dst").contains(3L),
      "clone resurrected the source's equality-deleted row")
    // the clone's OWN append of the deleted key is after the inherited
    // delete in the clone's sequence → alive
    cat.append("spec", "eqc_dst", Seq((3L, 30.0)).toDF("k", "v"))
    assert(loaded(cat, "eqc_dst")(3L) == Seq(30.0))
  }

  // ------------------------------------------------- MOR MERGE (r11 #3)

  test("mergeMor: zero rewrite, one commit, chains onto its own delta rows, compact materializes") {
    val cat = new LakeCatalog(spark, warehouse)
    import spark.implicits._
    freshTable(cat, "mm", (1L to 6L).map(k => k -> k.toDouble))
    val filesBefore = cat.snapshots("spec", "mm").last._2.toSet
    val vBefore = cat.headVersion("spec", "mm")
    val (u1, i1) = cat.mergeMor("spec", "mm",
      Seq((2L, 200.0), (4L, 400.0), (11L, 11.0)).toDF("k", "v"), "k")
    assert((u1, i1) == (2L, 1L))
    val filesAfter = cat.snapshots("spec", "mm").last._2.toSet
    assert(filesBefore.subsetOf(filesAfter),
      "MOR merge must keep every pre-merge file verbatim")
    assert(cat.headVersion("spec", "mm") == vBefore + 1, "exactly one commit")
    // chain: merging onto a key whose live row IS a delta row DV-marks the
    // delta file's copy and lands a fresh delta
    val (u2, i2) = cat.mergeMor("spec", "mm",
      Seq((2L, 222.0)).toDF("k", "v"), "k")
    assert((u2, i2) == (1L, 0L))
    val expect = Map(1L -> Seq(1.0), 2L -> Seq(222.0), 3L -> Seq(3.0),
      4L -> Seq(400.0), 5L -> Seq(5.0), 6L -> Seq(6.0), 11L -> Seq(11.0))
    assert(loaded(cat, "mm") == expect)
    assert(cat.countStar("spec", "mm").contains(7L))
    cat.compact("spec", "mm", 1)
    assert(loaded(cat, "mm") == expect)
    assert(cat.countStar("spec", "mm").contains(7L))
  }

  // ---------------------------------------------- MAINTAIN ALL (r11 #6)

  test("maintainAll: arms run in the documented order and reader answers survive the pass") {
    val cat = new LakeCatalog(spark, warehouse)
    import spark.implicits._
    cat.dropTable("spec", "mnt")
    cat.createTable("spec", "mnt", StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType))))
    (0 until 5).foreach { j =>
      cat.append("spec", "mnt",
        (1L to 20L).map(k => (k + j * 100L) -> k.toDouble).toDF("k", "v")
          .repartition(1))
      if (j == 0) cat.analyzeTable("spec", "mnt", Seq("v"))
    }
    val before = loaded(cat, "mnt")
    val countBefore = cat.countStar("spec", "mnt")
    val report = cat.maintainAll("spec", "mnt", maxFiles = 2, keepSnapshots = 1)
    assert(report.map(_._1) ==
      Seq("stats", "compact", "expire", "manifests", "orphans"),
      s"arm order is the contract, got ${report.map(_._1)}")
    val byArm = report.map(r => r._1 -> r).toMap
    assert(byArm("stats")._2 == "refreshed", "5x-stale stats must refresh")
    assert(byArm("compact")._2 == "compacted" && byArm("compact")._4 <= 2L)
    assert(byArm("expire")._2 == "expired")
    assert(byArm("manifests")._2 == "rewritten")
    assert(loaded(cat, "mnt") == before, "maintenance changed a data answer")
    assert(cat.countStar("spec", "mnt") == countBefore)
  }

  // --------------------------- streamed span screen ≡ batch (r11 #4)

  test("span-screen verdicts per micro-batch equal the batch form (frozen shingle index)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.fanout(Tables.table(spark, sfDir, "documents"))
    val index = graft.ops.Dedup
      .spanIndexOf(docs.where(col("doc_id") % 10 =!= 0))
      .localCheckpoint() // FROZEN: built once, every micro-batch reuses it
    val arriving = docs.where(col("doc_id") % 10 === 0)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val got = scala.collection.mutable.Map.empty[Long, (Long, Long, Boolean, String)]
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!b.isEmpty)
          graft.streaming.StreamOps5.screenSpans(b.toDF(), index).collect()
            .foreach { r =>
              got(r.getAs[Long]("doc_id")) = (
                r.getAs[Long]("kept_words"), r.getAs[Long]("n_spans"),
                r.getAs[Boolean]("admitted"), r.getAs[String]("clean_md5"))
            }
      }.start()
    arriving.grouped((arriving.size / 2) + 1).foreach { chunk =>
      mem.addData(chunk); q.processAllAvailable()
    }
    q.stop()
    val batch = graft.streaming.StreamOps5.stSubstringScreen(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> (
        r.getAs[Long]("kept_words"), r.getAs[Long]("n_spans"),
        r.getAs[Boolean]("admitted"), r.getAs[String]("clean_md5"))).toMap
    assert(got.toMap == batch,
      "streamed span-screen verdicts diverge from the batch form")
    assert(batch.values.exists(_._3) && batch.values.exists(!_._3),
      "gate exercises both admit and cut on the test corpus")
  }

  // -------------------------------- PQ graph search quality pin (r11 #5)

  test("s_hnsw_pq: recall@5 >= s_ivfpq_topk's at strictly fewer full-vector scores") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact top-5 baseline and ivfpq answers, restricted to the graph
    // ops' query set (vec_id % 100 = 0 ⊂ the PQ family's % 20 = 0)
    val exact = pairs(graft.ops.Similarity.sCosineTopk(spark, sfDir))
      .filter(_._1 % 100 == 0)
    val ivf = pairs(graft.ops.Similarity.sIvfPqTopk(spark, sfDir))
      .filter(_._1 % 100 == 0)
    val ivfRecall = (ivf & exact).size.toDouble / exact.size
    val rows = graft.ops.Similarity4.sHnswPq(spark, sfDir).collect()
    val pqRecall = rows.map(_.getAs[Long]("recall_ppm")).sum.toDouble /
      (rows.length * 1e6)
    assert(rows.forall(_.getAs[Long]("n_exact") < 50L),
      "every query must pay strictly fewer exact scores than ivfpq's 50-deep re-rank")
    assert(pqRecall >= ivfRecall,
      s"PQ graph search lost recall: hnsw_pq=$pqRecall ivfpq=$ivfRecall")
  }

  // ------------------------- MOR CDC writer: compaction + fence interplay

  test("applyCdcMor: compaction between batches materializes deletes without breaking the fence") {
    val cat = new LakeCatalog(spark, warehouse)
    import spark.implicits._
    cat.dropTable("spec", "cdcm")
    cat.createTable("spec", "cdcm", StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType))))
    def batch(rows: Seq[(Long, Double, String)]) =
      rows.toDF("k", "v", "op")
    val (d0, u0) = cat.applyCdcMor("spec", "cdcm",
      batch(Seq((1L, 1.0, "u"), (2L, 2.0, "u"), (3L, 3.0, "u"))),
      "k", "op", Some(0L))
    assert((d0, u0) == (0L, 3L))
    val (d1, u1) = cat.applyCdcMor("spec", "cdcm",
      batch(Seq((2L, 22.0, "u"), (3L, 0.0, "d"))), "k", "op", Some(1L))
    assert((d1, u1) == (2L, 1L), "both touched keys' old copies must die")
    // compact mid-stream: materializes the eq deletes, commits WITHOUT a
    // batch id — the fence must survive it
    cat.compact("spec", "cdcm", 1)
    assert(loaded(cat, "cdcm") == Map(1L -> Seq(1.0), 2L -> Seq(22.0)))
    // a replay of batch 1 after the compact is still fenced
    assert(cat.applyCdcMor("spec", "cdcm",
      batch(Seq((2L, 999.0, "u"))), "k", "op", Some(1L)) == ((0L, 0L)))
    // and the next real batch applies normally, resurrecting key 3
    val (d2, u2) = cat.applyCdcMor("spec", "cdcm",
      batch(Seq((3L, 33.0, "u"))), "k", "op", Some(2L))
    assert((d2, u2) == (0L, 1L))
    assert(loaded(cat, "cdcm") ==
      Map(1L -> Seq(1.0), 2L -> Seq(22.0), 3L -> Seq(33.0)))
    assert(cat.countStar("spec", "cdcm").contains(3L))
  }

  // ------------------------------- select→mix→pack composition (r11 #7)

  test("p_select_mix_pack: monotone loss accounting and exact pack arithmetic") {
    val rows = graft.ops.Pipeline4.pSelectMixPack(spark, sfDir).collect()
      .map(r => r.getAs[String]("stage") -> r).toMap
    def docs(s: String) = rows(s).getAs[Long]("n_docs")
    def toks(s: String) = rows(s).getAs[Long]("n_tokens")
    assert(docs("s0_raw") >= docs("s1_select") &&
      docs("s1_select") >= docs("s2_mix"), "doc counts must be monotone")
    assert(toks("s0_raw") >= toks("s1_select") &&
      toks("s1_select") >= toks("s2_mix"), "token counts must be monotone")
    assert(docs("s1_select") == 200L, "DSIR draw is a fixed-size top-k")
    // packing loses nothing and its sequence count is exact arithmetic
    assert(docs("s3_pack") == docs("s2_mix") && toks("s3_pack") == toks("s2_mix"))
    val nSeqs = rows("s3_pack").getAs[Long]("n_seqs")
    assert(nSeqs == (toks("s3_pack") + 511L) / 512L,
      "contiguous greedy pack: n_seqs = ceil(tokens / 512)")
    assert(rows("s3_pack").getAs[Long]("n_split_docs") <= docs("s3_pack"))
  }
}
