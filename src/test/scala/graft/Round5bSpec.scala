package graft

import graft.catalog.LakeCatalog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-5 widening: semantics tests for the WAP branch surface, orphan
  * cleanup, ANALYZE stats, bitmap-exact distinct, gaps-and-islands, entropy
  * scoring and the C4 line filter (the oracle gate proves engine-vs-engine
  * equality; these pin the semantics themselves on planted inputs). */
class Round5bSpec extends SparkSpec {

  private def freshCat: LakeCatalog = {
    val root = java.nio.file.Files.createTempDirectory("graft_r5b_spec").toString
    new LakeCatalog(spark, root)
  }

  private def mkTable(cat: LakeCatalog, ns: String, t: String): Unit =
    cat.createTable(ns, t, StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType))))

  private def rows(a: Long, b: Long) = {
    import spark.implicits._
    (a to b).map(i => (i, i * 1.5)).toDF("id", "v").coalesce(1)
  }

  test("WAP: branch commits are invisible to main until fast-forward") {
    val cat = freshCat
    mkTable(cat, "ns", "wap")
    cat.append("ns", "wap", rows(1, 4))
    cat.appendToBranch("ns", "wap", rows(5, 8), "audit")
    assert(cat.load("ns", "wap").count() == 4, "main saw staged rows")
    assert(cat.loadBranch("ns", "wap", "audit").count() == 8)
    // audit reads see main's base + the staged batch; publish is a ref swap
    cat.fastForward("ns", "wap", "audit")
    assert(cat.load("ns", "wap").count() == 8)
    assert(cat.refs("ns", "wap").get("audit").isEmpty, "branch not retired")
    // main keeps advancing normally after the refs sidecar exists
    cat.append("ns", "wap", rows(9, 10))
    assert(cat.load("ns", "wap").count() == 10)
  }

  test("WAP: abandoned branch retires via dropBranch -> expire; main data intact") {
    val cat = freshCat
    mkTable(cat, "ns", "aband")
    cat.append("ns", "aband", rows(1, 4))
    cat.appendToBranch("ns", "aband", rows(100, 200), "bad")
    cat.dropBranch("ns", "aband", "bad")
    assert(cat.load("ns", "aband").count() == 4)
    // age out everything but the current main snapshot; the bad branch's
    // files are then unreferenced and reclaimed by the same sweep
    cat.expireSnapshots("ns", "aband", keep = 1)
    assert(cat.load("ns", "aband").count() == 4, "expire damaged main")
    assert(cat.load("ns", "aband").agg(sum(col("id"))).collect()(0).getLong(0) == 10)
  }

  test("WAP: a live branch head survives snapshot expiry") {
    val cat = freshCat
    mkTable(cat, "ns", "livebr")
    cat.append("ns", "livebr", rows(1, 2))
    cat.appendToBranch("ns", "livebr", rows(3, 4), "hold")
    cat.append("ns", "livebr", rows(5, 6))
    cat.append("ns", "livebr", rows(7, 8))
    cat.expireSnapshots("ns", "livebr", keep = 1)
    // the branch ref pins its snapshot through expiry (Iceberg refs do the
    // same) — audit reads still work afterwards
    assert(cat.loadBranch("ns", "livebr", "hold").count() == 4)
    assert(cat.load("ns", "livebr").count() == 6)
  }

  test("orphan sweep removes only unreferenced files; time travel survives") {
    val root = java.nio.file.Files.createTempDirectory("graft_r5b_spec").toString
    val cat = new LakeCatalog(spark, root)
    mkTable(cat, "ns", "orph")
    cat.append("ns", "orph", rows(1, 3))
    cat.append("ns", "orph", rows(4, 6))
    val dir = java.nio.file.Paths.get(s"$root/ns/orph")
    java.nio.file.Files.writeString(dir.resolve("part-bogus-orphan.parquet"), "")
    val found = cat.orphanFiles("ns", "orph")
    assert(found == Seq("part-bogus-orphan.parquet"), s"found $found")
    assert(cat.removeOrphans("ns", "orph") == found)
    assert(cat.orphanFiles("ns", "orph").isEmpty)
    // every snapshot remains readable — referenced files were never touched
    val vs = cat.snapshots("ns", "orph").map(_._1)
    assert(cat.loadSnapshot("ns", "orph", vs.init.last).count() == 3)
    assert(cat.load("ns", "orph").count() == 6)
    // age threshold: a just-written file is protected when olderThan is set
    java.nio.file.Files.writeString(dir.resolve("part-inflight.parquet"), "")
    assert(cat.orphanFiles("ns", "orph", olderThanMs = 60000L).isEmpty,
      "in-flight write swept by aged sweep")
    assert(cat.removeOrphans("ns", "orph") == Seq("part-inflight.parquet"))
  }

  test("ANALYZE stats match direct computation") {
    import spark.implicits._
    val cat = freshCat
    cat.createTable("ns", "stats", StructType(Seq(
      StructField("k", LongType), StructField("s", StringType))))
    val df = Seq((1L, "a"), (2L, "b"), (3L, null), (4L, "a"), (4L, "b"))
      .toDF("k", "s")
    cat.append("ns", "stats", df.coalesce(1))
    cat.analyzeTable("ns", "stats", Seq("k", "s"))
    val st = cat.showStats("ns", "stats").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(st("k").getLong(1) == 5 && st("k").getLong(2) == 0 &&
      st("k").getLong(3) == 4 && st("k").getString(4) == "1" &&
      st("k").getString(5) == "4")
    assert(st("s").getLong(2) == 1 && st("s").getLong(3) == 2 &&
      st("s").getString(4) == "a" && st("s").getString(5) == "b")
  }

  test("bitmap distinct == exact COUNT(DISTINCT) per group") {
    val got = ops.Events.qBitmapDistinct(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Tables.table(spark, sfDir, "events")
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("gaps-and-islands invariants + one user hand-checked") {
    val out = ops.Events.qGapsIslands(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, longest, active) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n >= 1 && longest >= 1 && longest <= active && n <= active,
        s"impossible islands row: $r")
    }
    val u = out.head.getLong(0)
    val days = Tables.table(spark, sfDir, "events")
      .where(col("user_id") === u)
      .select(expr("ts div 86400000000000").as("d")).distinct()
      .collect().map(_.getLong(0)).sorted
    // runs of consecutive days, recomputed imperatively: (lastDay, len) list
    val runs = days.foldLeft(List.empty[(Long, Long)]) {
      case ((last, len) :: t, d) if d == last + 1 => (d, len + 1) :: t
      case (acc, d) => (d, 1L) :: acc
    }.map(_._2)
    val byUser = out.find(_.getLong(0) == u).get
    assert(byUser.getLong(3) == days.length, "active_days mismatch")
    assert(byUser.getLong(1) == runs.length, "n_islands mismatch")
    assert(byUser.getLong(2) == runs.max, "longest_run mismatch")
  }

  test("char entropy hand-checked against direct recomputation") {
    val out = ops.TextOps3.tEntropy(spark, sfDir).limit(5).collect()
    val texts = Tables.table(spark, sfDir, "documents")
      .select("doc_id", "text").orderBy("doc_id").limit(5).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val t = texts(r.getLong(0)).toLowerCase
      val counts = t.groupBy(identity).map(_._2.length.toDouble)
      val n = t.length.toDouble
      val h = counts.map(c => -(c / n) * math.log(c / n)).sum
      assert(r.getLong(1) == counts.size, "distinct_chars mismatch")
      assert(r.getLong(2) == t.length, "n_chars mismatch")
      assert(math.abs(r.getDouble(3) - h) < 2e-3,
        s"entropy drift: got ${r.getDouble(3)} want $h")
    }
  }

  test("C4 line filter: rules fire, reassembly md5 matches recomputation") {
    val out = ops.TextOps3.tC4Filter(spark, sfDir).collect()
    assert(out.exists(r => r.getLong(2) < r.getLong(1)),
      "filter vacuous: nothing ever dropped")
    assert(out.exists(r => r.getLong(2) > 0), "filter degenerate: all dropped")
    val texts = Tables.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.take(10).foreach { r =>
      val norm = texts(r.getLong(0)).toLowerCase.trim.replaceAll("\\s+", " ")
      val words = norm.split(" ")
      val lines = words.grouped(12).filter(_.length == 12).map(_.mkString(" ")).toSeq
      val kept = lines.filter(l => l.split(" ").distinct.length >= 7 &&
        !s" $l ".contains(" dup "))
      assert(r.getLong(1) == lines.size, s"n_lines mismatch doc ${r.getLong(0)}")
      assert(r.getLong(2) == kept.size, s"kept_lines mismatch doc ${r.getLong(0)}")
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(kept.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(r.getString(4) == md5, s"kept_md5 mismatch doc ${r.getLong(0)}")
    }
  }
}
