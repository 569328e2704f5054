package graft

import graft.catalog.{LakeCatalog, SqlGateway}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-12 second wave: invariants for the session's additions — RAG
  * chunk-manifest geometry, CCNet bucket ordering/partitioning, SAX motif
  * accounting, the ANN tombstone-delete report (including the
  * filter-before-rank demonstration that makes probe-time tombstone
  * filtering load-bearing), and the SHOW CHANGES gateway verb. */
class Round12bSpec extends SparkSpec {

  private val W = 40
  private val S = 30

  // ------------------------------------------------------- t_chunk_rag

  test("t_chunk_rag: chunk geometry tiles every doc (stride, overlap, exact tail)") {
    val chunks = ops.TextOps7.tChunkRag(spark, sfDir).collect()
    val docLens = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        size(split(trim(regexp_replace(lower(col("text")), "\\s+", " ")), " "))
          .as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byDoc = chunks.groupBy(_.getLong(0))
    assert(byDoc.keySet == docLens.keySet, "every doc must be chunked")
    byDoc.foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_.getInt(1))
      // chunk ids are dense from 0
      assert(sorted.map(_.getInt(1)).toSeq == sorted.indices.toSeq)
      // every chunk starts exactly S past the previous one
      assert(sorted.map(_.getInt(2)).toSeq ==
        sorted.indices.map(_ * S + 1).toSeq)
      // all chunks are full-width except possibly the tail
      sorted.init.foreach(r => assert(r.getInt(3) == W))
      // the tail reaches the last word exactly — no word lost, none invented
      val last = sorted.last
      assert(last.getInt(2) + last.getInt(3) - 1 == docLens(doc),
        s"doc $doc tail must end at word ${docLens(doc)}")
      // a short doc yields exactly one chunk
      if (docLens(doc) <= W) assert(sorted.length == 1)
      // consecutive chunks overlap: the next chunk starts before the
      // previous full-width chunk ends (W−S shared words — no hard cut)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getInt(2) <= a.getInt(2) + W - 1,
            "neighbors must share W−S words")
        case _ => ()
      }
    }
  }

  // --------------------------------------------------- t_ccnet_buckets

  test("t_ccnet_buckets: buckets partition each language and are xent-ordered") {
    val rows = ops.TextOps7.tCcnetBuckets(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(4), r.getDouble(5)))
    val perLang = spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (lang, bs) =>
      // the three buckets partition the language exactly
      assert(bs.map(_._3).sum == perLang(lang), s"$lang bucket counts must sum")
      val m = bs.map(b => b._2 -> b).toMap
      assert(m.contains("head"), s"$lang: head is never empty by construction")
      // value ordering is strict across bucket boundaries: every head doc
      // scores below every middle doc, every middle below every tail
      for {
        (lo, hi) <- Seq("head" -> "middle", "middle" -> "tail")
        l <- m.get(lo); h <- m.get(hi)
      } assert(l._5 < h._4, s"$lang: max_xent($lo) must be < min_xent($hi)")
      // no bucket takes more than ⌈n/3⌉ + ties-at-threshold would allow —
      // sanity: head holds at least 1 and at most the whole language
      assert(m("head")._3 >= 1 && m("head")._3 <= perLang(lang))
    }
  }

  // ------------------------------------------------------- q_sax_motif

  test("q_sax_motif: occurrence mass equals the contiguous 3-day windows, words are a–d") {
    val rows = ops.Events2.qSaxMotif(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (motif, n, _) =>
      assert(motif.matches("[a-d]{3}"), s"motif '$motif' must be a 3-symbol word")
      assert(n >= 1)
    }
    // total motif occurrences = number of day triples (d, d+1, d+2) present
    val days = Tables.table(spark, sfDir, "events")
      .select(expr("ts div 86400000000000").as("day"))
      .distinct().collect().map(_.getLong(0)).toSet
    val triples = days.count(d => days(d + 1) && days(d + 2))
    assert(rows.map(_._2).sum == triples.toLong,
      "every contiguous window contributes exactly one occurrence")
    // first_day of every motif is a day that starts a contiguous triple
    rows.foreach { case (_, _, fd) => assert(days(fd) && days(fd + 1) && days(fd + 2)) }
  }

  // ---------------------------------------------------- s_index_delete

  test("s_index_delete: report arithmetic, full spine, repack trigger") {
    val rep = ops.Similarity5.sIndexDelete(spark, sfDir).collect()
    assert(rep.map(_.getInt(0)).toSeq == (0 until 8), "full 8-cell spine")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val total = emb.count()
    val dels = emb.where(col("vec_id") % 9 === 4).count()
    assert(rep.map(_.getLong(1)).sum == total, "n_before sums to corpus")
    assert(rep.map(_.getLong(2)).sum == dels, "n_del sums to tombstone set")
    rep.foreach { r =>
      assert(r.getLong(3) == r.getLong(1) - r.getLong(2), "n_after arithmetic")
      if (r.getLong(1) > 0) {
        val ppm = r.getLong(2) * 1000000L / r.getLong(1)
        assert(r.getLong(4) == ppm)
        assert(r.getBoolean(5) == (ppm > 100000L))
      } else assert(r.isNullAt(4) && !r.getBoolean(5))
    }
  }

  test("s_index_delete: tombstone filtering must happen BEFORE rank (naive top-k-then-filter under-returns)") {
    // ground truth: with ~11% of the corpus tombstoned, at least one query's
    // unfiltered top-3 contains a tombstoned id — so an index that ranks
    // first and filters after returns FEWER than 3 live neighbors for it,
    // while probe-time filtering (the op's contract) always returns 3.
    import graft.functions.Vec
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"),
        Vec.vnorm(col("embedding")).as("nrm"))
    val qs = emb.where(col("vec_id") % 50 === 0 && col("vec_id") % 9 =!= 4)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))
    val scored = qs.crossJoin(emb)
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        (Vec.vdot(col("qe"), col("embedding")) / (col("qn") * col("nrm"))).as("cos"),
        (col("vec_id") % 9 === 4).as("dead"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    val top3 = scored.withColumn("rk", row_number().over(w)).where(col("rk") <= 3)
    val polluted = top3.groupBy("qid")
      .agg(sum(when(col("dead"), 1).otherwise(0)).as("n_dead"))
      .where(col("n_dead") > 0).count()
    assert(polluted > 0,
      "no query's top-3 touches a tombstone — the ordering demonstration is vacuous")
    // and filtering before rank always fills k from live vectors
    val live3 = scored.where(!col("dead"))
      .withColumn("rk", row_number().over(w)).where(col("rk") <= 3)
      .groupBy("qid").count()
    assert(live3.collect().forall(_.getLong(1) == 3L))
  }

  // --------------------------------------------------------- p_rag_prep

  test("p_rag_prep: monotone funnel ledger, exact pack arithmetic, dedup consistency") {
    val rows = ops.Pipeline5.pRagPrep(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (cd, cu, cw) = rows("chunk")
    val (dd, du, dw) = rows("dedup")
    val (pd, pu, pw) = rows("pack")
    // chunk stage covers every doc; dedup can only lose material
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(cd == nDocs)
    assert(du <= cu && dw <= cw && dd <= cd)
    // dedup'd unit count equals the number of distinct chunk texts
    val distinctMd5 = ops.TextOps7.chunkFrame(spark, sfDir)
      .select("chunk_md5").distinct().count()
    assert(du == distinctMd5)
    // pack stage loses nothing and its arithmetic is exact
    assert(pw == dw && pd == dd)
    assert(pu == (dw + 511) / 512)
    assert(pu >= 1)
  }

  // ---------------------------------------- format-version (c_v2_upgrade)

  test("format-version: v1 refuses ALL row-level-delete verbs without committing, upgrade unlocks them") {
    val root = java.nio.file.Files.createTempDirectory("graft_v1").toString
    val cat = new LakeCatalog(spark, root)
    import spark.implicits._
    cat.createTable("spec", "t_v1", StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType))),
      properties = Map("format-version" -> "1"))
    cat.append("spec", "t_v1", (1L to 10L).map(k => k -> k.toDouble).toDF("k", "v"))
    val v0 = cat.headVersion("spec", "t_v1")
    // every row-level verb refuses on v1 — and commits nothing
    val verbs: Seq[() => Any] = Seq(
      () => cat.deleteWhereMor("spec", "t_v1", col("k") === 2L),
      () => cat.updateWhereMor("spec", "t_v1", col("k") === 2L, "v", col("v") * 2),
      () => cat.deleteWhereEq("spec", "t_v1", "k", Seq(2L)),
      () => cat.mergeMor("spec", "t_v1",
        Seq((2L, 9.0)).toDF("k", "v"), "k"),
      () => cat.applyCdcMor("spec", "t_v1",
        Seq((2L, 9.0, "u")).toDF("k", "v", "op"), "k", "op"))
    verbs.foreach { f =>
      val e = intercept[IllegalStateException](f())
      assert(e.getMessage.contains("format-version"), e.getMessage)
    }
    assert(cat.headVersion("spec", "t_v1") == v0, "a refused verb must commit NOTHING")
    assert(cat.load("spec", "t_v1").count() == 10L)
    // COW stays allowed on v1
    cat.deleteWhere("spec", "t_v1", col("k") === 10L)
    assert(cat.load("spec", "t_v1").count() == 9L)
    // metadata-only upgrade: no snapshot, then the same verb succeeds
    val vPre = cat.headVersion("spec", "t_v1")
    assert(cat.upgradeFormat("spec", "t_v1") == (1, 2))
    assert(cat.headVersion("spec", "t_v1") == vPre, "upgrade must be metadata-only")
    assert(cat.formatVersion("spec", "t_v1") == 2)
    assert(cat.deleteWhereMor("spec", "t_v1", col("k") === 2L) == 1L)
    assert(cat.load("spec", "t_v1").count() == 8L)
    // idempotent: upgrading a v2 table is a no-op
    assert(cat.upgradeFormat("spec", "t_v1") == (2, 2))
  }

  test("setProperty preserves unrelated metadata (schema echo, spec, sort, other props)") {
    val root = java.nio.file.Files.createTempDirectory("graft_prop").toString
    val cat = new LakeCatalog(spark, root)
    cat.createTable("spec", "t_meta", StructType(Seq(
      StructField("id", LongType), StructField("ds", StringType))),
      properties = Map("owner" -> "graft", "format-version" -> "1"),
      partitionSpec = Seq("ds"), sortOrder = Seq("id asc"))
    cat.setProperty("spec", "t_meta", "format-version", "2")
    val (pspec, sort, props) = cat.tableMeta("spec", "t_meta")
    assert(pspec == Seq("ds") && sort == Seq("id asc"))
    assert(props == Map("owner" -> "graft", "format-version" -> "2"))
  }

  // --------------------------------------------- NDV sketches (c_stats_ndv)

  test("NDV sketches: incremental analyze scans only new files; merged estimate == direct sketch") {
    val root = java.nio.file.Files.createTempDirectory("graft_ndv").toString
    val cat = new LakeCatalog(spark, root)
    import spark.implicits._
    cat.createTable("spec", "t_ndv", StructType(Seq(
      StructField("k", LongType), StructField("s", StringType))))
    cat.append("spec", "t_ndv",
      (1L to 200L).map(k => k -> s"val_${k % 90}").toDF("k", "s").repartition(2))
    val s1 = cat.recordNdvSketch("spec", "t_ndv", "s")
    assert(s1 == 3, s"v0 empty file + 2 data files, got $s1")
    val (n1, _, cov1, live1) = cat.ndvSketchMerged("spec", "t_ndv", "s")
    assert(cov1 == live1)
    assert(n1 == 64L, "90 distinct values > k=64 keeps a full sketch")
    // second append: ONLY the new file is scanned, old sketches reused
    cat.append("spec", "t_ndv",
      (201L to 260L).map(k => k -> s"val_${k % 130}").toDF("k", "s").repartition(1))
    assert(cat.recordNdvSketch("spec", "t_ndv", "s") == 1)
    assert(cat.recordNdvSketch("spec", "t_ndv", "s") == 0, "idempotent when covered")
    val (n2, h2, cov2, live2) = cat.ndvSketchMerged("spec", "t_ndv", "s")
    assert(cov2 == live2)
    // KMV merge identity: merged k-min of per-file sketches == whole-data k-min
    val direct = cat.load("spec", "t_ndv")
      .select(graft.functions.Poly.stringHash(col("s")).as("h"))
      .distinct().orderBy("h").limit(64)
      .collect().map(_.getLong(0)).toSeq
    assert(n2 == direct.size.toLong && h2 == direct.last)
    // the estimate is in the right ballpark for the true NDV
    val exact = cat.load("spec", "t_ndv").select("s").distinct().count()
    val est = 63.0 * 2305843009213693951L.toDouble / h2.toDouble
    assert(math.abs(est - exact) / exact <= 0.5,
      s"KMV estimate $est vs exact $exact drifted past 50%")
  }

  // ------------------------------------------------ SHOW CHANGES (verb)

  test("SHOW CHANGES surfaces the DV-aware change feed protocol-level") {
    val root = java.nio.file.Files.createTempDirectory("graft_gw_chg").toString
    val cat = new LakeCatalog(spark, root)
    import spark.implicits._
    cat.createTable("spec", "chg_sql", StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType))))
    cat.append("spec", "chg_sql", (1L to 10L).map(k => k -> k.toDouble).toDF("k", "v"))
    val v1 = cat.headVersion("spec", "chg_sql")
    cat.deleteWhereMor("spec", "chg_sql", col("k") % 4 === 0)
    val v2 = cat.headVersion("spec", "chg_sql")
    val gw = new SqlGateway(spark, cat)
    val feed = gw.execute(s"SHOW CHANGES IN spec.chg_sql BETWEEN $v1 AND $v2")
      .collect().map(r => (r.getAs[String]("_change"), r.getAs[Long]("k"))).toSet
    assert(feed == Set(("delete", 4L), ("delete", 8L)),
      "the gateway verb must return the same DV-aware feed as changes()")
  }

  test("ALTER TABLE SET PROPERTY drives the v1->v2 upgrade protocol-level") {
    val root = java.nio.file.Files.createTempDirectory("graft_gw_fv").toString
    val cat = new LakeCatalog(spark, root)
    import spark.implicits._
    cat.createTable("spec", "fv_sql", StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType))),
      properties = Map("format-version" -> "1"))
    cat.append("spec", "fv_sql", (1L to 6L).map(k => k -> k.toDouble).toDF("k", "v"))
    val gw = new SqlGateway(spark, cat)
    val e = intercept[IllegalStateException](
      gw.execute("DELETE MOR FROM spec.fv_sql WHERE k = 3"))
    assert(e.getMessage.contains("format-version"))
    val st = gw.execute(
      "ALTER TABLE spec.fv_sql SET PROPERTY 'format-version' = '2'")
      .head().getString(0)
    assert(st.contains("format-version"))
    assert(gw.execute("DELETE MOR FROM spec.fv_sql WHERE k = 3")
      .head().getString(0).contains("Marked 1 rows"))
    assert(cat.load("spec", "fv_sql").count() == 5L)
  }
}
