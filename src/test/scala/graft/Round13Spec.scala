package graft

import graft.catalog.LakeCatalog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** Round-13 invariants: the r12 verdict's action list — the c_cdc_mirror
  * proof/serve split (the multiset-equality GATE lives here now, not in the
  * served plan), distributed parquet delete files for large MOR/equality
  * deletes (payload never transits the driver), the DataFrame-keyed
  * equality-delete API, the HNSW lazy-delete lifecycle op, and the two
  * ADVICE hardenings (format-version property contract, NDV null safety). */
class Round13Spec extends SparkSpec {

  private def warehouse =
    s"${System.getProperty("java.io.tmpdir")}/graft_spec_warehouse"

  // ------------- VERDICT r12 #2: the CDC mirror equality proof (the gate)

  private def pinMirror(dir: String): Unit = {
    val (replica, fin, nb) = ops.CatalogOps11.cdcMirrorReplay(spark, dir)
    assert(nb == 4L)
    assert(replica.exceptAll(fin).isEmpty,
      "replica holds rows the table lost — a feed double-reported")
    assert(fin.exceptAll(replica).isEmpty,
      "table holds rows the replica missed — a feed lost rows")
  }

  test("cdc mirror: replica ≡ table (multiset, both directions) at sf0.001") {
    pinMirror("/root/testdata/sf0.001")
  }
  test("cdc mirror: replica ≡ table (multiset, both directions) at sf0.01") {
    pinMirror("/root/testdata/sf0.01")
  }
  test("cdc mirror: replica ≡ table (multiset, both directions) at sf0.1") {
    pinMirror("/root/testdata/sf0.1")
  }

  // ------------- VERDICT r12 #4: distributed delete files

  test("deleteWhereMor: a million-row delete commits via parquet delete files; " +
    "the sidecar carries only a ref + per-file counts") {
    val cat = new LakeCatalog(spark, warehouse)
    cat.dropTable("spec", "bigdel")
    cat.createTable("spec", "bigdel", StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType))))
    cat.append("spec", "bigdel", spark.range(1000000L)
      .select(col("id").as("k"), (col("id") % 97).cast("double").as("v")))
    val v1 = cat.headVersion("spec", "bigdel")
    val n = cat.deleteWhereMor("spec", "bigdel", col("k") % 3 === 0)
    assert(n == 333334L)
    // the commit payload is a parquet REF, never inline positions: this IS
    // the no-driver-materialization assertion — the row payload exists
    // only as distributed parquet, and the JSON line is file-count scale
    val dv = Files.readString(Paths.get(s"$warehouse/spec/bigdel_dv.json"))
    assert(dv.contains("\"ref\":"), "large delete must write a ref line")
    assert(!dv.contains("\"pos\":"), "large delete must not inline positions")
    assert(dv.contains("\"nfiles\":"))
    val refRel = "\"ref\":\"([^\"]+)\"".r.findFirstMatchIn(dv).get.group(1)
    val parts = Files.list(Paths.get(s"$warehouse/$refRel")).toArray.toSeq
      .map(_.toString).filter(_.endsWith(".parquet"))
    assert(parts.nonEmpty, "delete-file parquet missing")
    // reads, metadata count, and time travel all honor the ref payload
    assert(cat.countStar("spec", "bigdel").contains(666666L),
      "countStar must stay metadata-only-correct over ref lines")
    assert(cat.load("spec", "bigdel").count() == 666666L)
    assert(cat.load("spec", "bigdel").where(col("k") % 3 === 0).count() == 0L)
    assert(cat.loadSnapshot("spec", "bigdel", v1).count() == 1000000L)
    // the change feed computes the ref boundary without inline pairs
    val v2 = cat.headVersion("spec", "bigdel")
    val feed = cat.changes("spec", "bigdel", v1, v2)
    assert(feed.where(col("_change") === "insert").count() == 0L)
    assert(feed.where(col("_change") === "delete").count() == 333334L)
  }

  test("deleteWhereEq(DataFrame): a large key frame commits via parquet ref; " +
    "re-inserts of a deleted key stay alive (scope rule)") {
    val cat = new LakeCatalog(spark, warehouse)
    cat.dropTable("spec", "bigeq")
    cat.createTable("spec", "bigeq", StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType))))
    cat.append("spec", "bigeq", spark.range(200000L)
      .select(col("id").as("k"), lit(1.0).as("v")))
    val keys = spark.range(200000L).select(col("id").as("k"))
      .where(col("k") % 4 === 0) // 50k distinct keys > dvInlineMax
    val n = cat.deleteWhereEq("spec", "bigeq", "k", keys)
    assert(n == 50000L)
    val eq = Files.readString(Paths.get(s"$warehouse/spec/bigeq_eqdel.json"))
    assert(eq.contains("\"ref\":"), "large key set must write a ref line")
    assert(!eq.contains("\"vals\":"), "large key set must not inline keys")
    assert(cat.countStar("spec", "bigeq").contains(150000L))
    assert(cat.load("spec", "bigeq").count() == 150000L)
    assert(cat.load("spec", "bigeq").where(col("k") % 4 === 0).count() == 0L)
    // sequence-number scope: a key re-inserted AFTER the delete is alive
    import spark.implicits._
    cat.append("spec", "bigeq", Seq((8L, 2.0)).toDF("k", "v"))
    assert(cat.load("spec", "bigeq").where(col("k") === 8L).count() == 1L)
    assert(cat.countStar("spec", "bigeq").contains(150001L))
  }

  test("deleteWhereEq(DataFrame): a small key frame delegates to the inline arm") {
    val cat = new LakeCatalog(spark, warehouse)
    cat.dropTable("spec", "smalleq")
    cat.createTable("spec", "smalleq", StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType))))
    import spark.implicits._
    cat.append("spec", "smalleq", (1L to 20L).map(k => (k, 1.0)).toDF("k", "v"))
    val n = cat.deleteWhereEq("spec", "smalleq", "k",
      Seq(4L, 8L).toDF("k"))
    assert(n == 2L)
    val eq = Files.readString(Paths.get(s"$warehouse/spec/smalleq_eqdel.json"))
    assert(eq.contains("\"vals\":") && !eq.contains("\"ref\":"))
    assert(cat.load("spec", "smalleq").count() == 18L)
  }

  test("small MOR delete still inlines its positions (the fast path is intact)") {
    val cat = new LakeCatalog(spark, warehouse)
    cat.dropTable("spec", "smalldv")
    cat.createTable("spec", "smalldv", StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType))))
    import spark.implicits._
    cat.append("spec", "smalldv", (1L to 20L).map(k => (k, 1.0)).toDF("k", "v"))
    assert(cat.deleteWhereMor("spec", "smalldv", col("k") % 5 === 0) == 4L)
    val dv = Files.readString(Paths.get(s"$warehouse/spec/smalldv_dv.json"))
    assert(dv.contains("\"pos\":") && !dv.contains("\"ref\":"))
    assert(cat.load("spec", "smalldv").count() == 16L)
  }

  test("ref-shaped deletes survive clone inheritance and the expiry fold") {
    val cat = new LakeCatalog(spark, warehouse)
    cat.dvInlineMax = 0L // force the ref arm on a small table
    try {
      cat.dropTable("spec", "refl")
      cat.dropTable("spec", "refl_c")
      cat.createTable("spec", "refl", StructType(Seq(
        StructField("k", LongType), StructField("v", DoubleType))))
      import spark.implicits._
      cat.append("spec", "refl", (1L to 20L).map(k => (k, k.toDouble)).toDF("k", "v"))
      assert(cat.deleteWhereMor("spec", "refl", col("k") % 4 === 0) == 5L)
      val dv = Files.readString(Paths.get(s"$warehouse/spec/refl_dv.json"))
      assert(dv.contains("\"ref\":"))
      // deep clone: data files AND the ref payload are copied; the clone
      // must not resurrect the deleted rows
      cat.cloneTable("spec", "refl", "refl_c", deep = true)
      assert(cat.load("spec", "refl_c").count() == 15L)
      assert(cat.load("spec", "refl_c").where(col("k") % 4 === 0).count() == 0L)
      // the clone's ref must not dangle on a source drop
      cat.dropTable("spec", "refl")
      assert(cat.load("spec", "refl_c").count() == 15L)
      // expiry fold: truncating the log must keep the ref line live
      cat.append("spec", "refl_c", Seq((100L, 1.0)).toDF("k", "v"))
      cat.append("spec", "refl_c", Seq((101L, 1.0)).toDF("k", "v"))
      cat.expireSnapshots("spec", "refl_c", keep = 1)
      assert(cat.load("spec", "refl_c").count() == 17L,
        "expiry fold resurrected (or lost) ref-shaped deletes")
      assert(cat.load("spec", "refl_c").where(col("k") % 4 === 0 && col("k") < 100).count() == 0L)
      assert(cat.countStar("spec", "refl_c").contains(17L))
    } finally cat.dvInlineMax = 10000L
  }

  // ------------- VERDICT r12 #5: HNSW lazy delete

  test("s_hnsw_delete: tombstoned ids are never served; recall survives the delete") {
    val del = ops.Similarity5.sHnswDelete(spark, sfDir).collect()
    assert(del.nonEmpty)
    assert(del.forall(_.getAs[Long]("top1_id") % 10 != 3),
      "a deleted node surfaced as a result")
    assert(del.forall(_.getAs[Long]("n_visited") > 0L))
    val delRec = del.map(_.getAs[Long]("recall_ppm")).sum.toDouble / del.length
    val intact = ops.Similarity2.sNswSearch(spark, sfDir).collect()
    val intactRec = intact.map(_.getAs[Long]("recall_ppm")).sum.toDouble / intact.length
    // deleting ~10% of nodes (with bridge repair) may cost recall, but the
    // index must not collapse: within 20 recall points of the intact walk
    assert(delRec >= intactRec - 200000.0,
      s"recall after 10% delete collapsed: $delRec vs intact $intactRec")
  }

  // ------------- ADVICE r12: format-version contract

  test("setProperty: format-version must parse as int and never downgrade") {
    val cat = new LakeCatalog(spark, warehouse)
    cat.dropTable("spec", "fv")
    cat.createTable("spec", "fv", StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType))))
    import spark.implicits._
    cat.append("spec", "fv", Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"))
    cat.upgradeFormat("spec", "fv")
    assert(cat.formatVersion("spec", "fv") == 2)
    cat.deleteWhereMor("spec", "fv", col("k") === 1L)
    intercept[IllegalArgumentException] {
      cat.setProperty("spec", "fv", "format-version", "x")
    }
    intercept[IllegalStateException] {
      cat.setProperty("spec", "fv", "format-version", "1")
    }
    cat.setProperty("spec", "fv", "format-version", "2") // idempotent: fine
    cat.setProperty("spec", "fv", "format-version", "3") // upgrade: fine
    assert(cat.formatVersion("spec", "fv") == 3)
    // row-level verbs still work after the hardening
    assert(cat.load("spec", "fv").count() == 1L)
  }

  // ------------- ADVICE r12: NDV null safety

  test("recordNdvSketch: NULL values are excluded, never an NPE") {
    val cat = new LakeCatalog(spark, warehouse)
    cat.dropTable("spec", "ndvnull")
    cat.createTable("spec", "ndvnull", StructType(Seq(
      StructField("k", LongType), StructField("s", StringType))))
    import spark.implicits._
    cat.append("spec", "ndvnull",
      Seq((1L, "a"), (2L, null), (3L, "b"), (4L, null), (5L, "a"))
        .toDF("k", "s"))
    val scanned = cat.recordNdvSketch("spec", "ndvnull", "s")
    assert(scanned > 0)
    val (nKept, _, covered, live) = cat.ndvSketchMerged("spec", "ndvnull", "s")
    assert(nKept == 2L, "NDV must count non-null distinct values only")
    assert(covered == live)
  }
}
