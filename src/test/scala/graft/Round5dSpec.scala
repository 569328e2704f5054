package graft

import graft.catalog.{LakeCatalog, SqlGateway}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Merge-on-read deletion vectors: the contract c_mor_delete proves on the
  * driver table, pinned here on planted inputs — plus the edge cases (3VL
  * predicates, idempotent re-delete, DV-aware metadata COUNT, the dialect
  * verb) the oracle query doesn't reach. */
class Round5dSpec extends SparkSpec {

  private def freshCat: LakeCatalog = {
    val root = java.nio.file.Files.createTempDirectory("graft_r5d").toString
    new LakeCatalog(spark, root)
  }

  private def mk(cat: LakeCatalog, t: String, parts: Int = 3): Unit = {
    import spark.implicits._
    cat.createTable("ns", t, StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType))))
    cat.append("ns", t, (1L to 30L).map(i => (i, i * 1.0)).toDF("id", "v")
      .repartition(parts))
  }

  test("MOR delete: no rewrite, exact read subtraction, version-keyed time travel") {
    val cat = freshCat
    mk(cat, "t1")
    val filesBefore = cat.snapshots("ns", "t1").last._2.toSet
    val marked = cat.deleteWhereMor("ns", "t1", col("id") % 5 === 0)
    assert(marked == 6)
    val filesAfter = cat.snapshots("ns", "t1").last._2.toSet
    assert(filesAfter == filesBefore, "MOR delete rewrote or added data files")
    assert(cat.load("ns", "t1").count() == 24)
    assert(cat.load("ns", "t1").where(col("id") % 5 === 0).isEmpty)
    // pre-delete snapshot unaffected (DVs apply only at/after their commit)
    assert(cat.loadSnapshot("ns", "t1", 1).count() == 30)
    // metadata-only COUNT(*) subtracts the vectors without a scan
    assert(cat.countStar("ns", "t1").contains(24L))
  }

  test("MOR delete: idempotent re-delete, 3VL null predicate, second vector stacks") {
    val cat = freshCat
    mk(cat, "t2")
    assert(cat.deleteWhereMor("ns", "t2", col("id") <= 10) == 10)
    // same predicate again: every hit already marked — nothing new, no commit
    val vBefore = cat.snapshots("ns", "t2").length
    assert(cat.deleteWhereMor("ns", "t2", col("id") <= 10) == 0)
    assert(cat.snapshots("ns", "t2").length == vBefore, "no-op delete committed")
    // NULL predicate deletes nothing (3VL — the deleteWhere COW rule holds here too)
    assert(cat.deleteWhereMor("ns", "t2", lit(null).cast("boolean")) == 0)
    // a second, later vector stacks on the first
    assert(cat.deleteWhereMor("ns", "t2", col("id") === 11) == 1)
    assert(cat.load("ns", "t2").count() == 19)
  }

  test("compact materializes the vectors; history stays exact") {
    val cat = freshCat
    mk(cat, "t3")
    cat.deleteWhereMor("ns", "t3", col("id") > 25)          // v2
    cat.compact("ns", "t3", 1)                               // v3: rewritten
    assert(cat.load("ns", "t3").count() == 25)
    val sum = cat.load("ns", "t3").agg(expr("sum(id)")).collect()(0).getLong(0)
    assert(sum == (1L to 25L).sum)
    // the marked rows are physically gone from the new files: a raw read of
    // the v3 file list (no DV application path triggers — the vectors key on
    // v2's filenames) already excludes them
    assert(cat.loadSnapshot("ns", "t3", 3).count() == 25)
    // and history is still exact on both sides of the delete
    assert(cat.loadSnapshot("ns", "t3", 1).count() == 30)
    assert(cat.loadSnapshot("ns", "t3", 2).count() == 25)
  }

  test("DELETE MOR FROM dialect verb routes to deletion vectors") {
    val cat = freshCat
    mk(cat, "t4")
    val gw = new SqlGateway(spark, cat)
    val filesBefore = cat.snapshots("ns", "t4").last._2.toSet
    val out = gw.execute("DELETE MOR FROM ns.t4 WHERE id % 2 = 0").collect()(0).getString(0)
    assert(out.contains("15") && out.toLowerCase.contains("merge-on-read"), out)
    assert(cat.snapshots("ns", "t4").last._2.toSet == filesBefore)
    assert(cat.load("ns", "t4").count() == 15)
    // the COW verb still rewrites (both forms live side by side)
    gw.execute("DELETE FROM ns.t4 WHERE id = 1")
    assert(cat.snapshots("ns", "t4").last._2.toSet != filesBefore)
    assert(cat.load("ns", "t4").count() == 14)
  }

  test("COW rewrites after a MOR delete never resurrect vectored rows (merge + CDC paths)") {
    import spark.implicits._
    val cat = freshCat
    mk(cat, "t5", parts = 1) // one file: every rewrite touches the DV file
    cat.deleteWhereMor("ns", "t5", col("id") <= 5)
    cat.merge("ns", "t5", Seq((6L, 600.0)).toDF("id", "v"), "id")
    assert(cat.load("ns", "t5").count() == 25, "merge resurrected MOR-deleted rows")
    assert(cat.load("ns", "t5").where(col("id") === 6).collect()(0).getDouble(1) == 600.0)
    val cdc = Seq((7L, 700.0, "u"), (8L, 0.0, "d")).toDF("id", "v", "op")
    cat.applyCdc("ns", "t5", cdc, "id", "op")
    assert(cat.load("ns", "t5").count() == 24, "CDC apply resurrected MOR-deleted rows")
    assert(cat.load("ns", "t5").where(col("id") <= 5).isEmpty)
  }
}
