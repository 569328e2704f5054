package graft

import graft.catalog.LakeCatalog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-6 batch b: bloom-filter file skipping + grouped OLS. */
class Round6bSpec extends SparkSpec {

  private def scratch: String =
    s"${System.getProperty("java.io.tmpdir")}/graft_warehouse_r6b"

  test("bloom skip: sound (never drops a matching file), sharp on absent keys") {
    val cat = new LakeCatalog(spark, scratch)
    val o = Tables.table(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    cat.dropTable("scratch", "bsp")
    cat.createTable("scratch", "bsp", StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_totalprice", DoubleType))),
      sortOrder = Seq("o_orderkey asc"))
    cat.appendClustered("scratch", "bsp", o, Seq("o_orderkey"), numFiles = 8)
    cat.recordBlooms("scratch", "bsp", "o_custkey")

    // absent key: every file is a true negative; at ~sf0.001 key counts the
    // per-file FP odds are ~1e-4 — assert the FULL 8/8 skip sharply
    val (readA, skipA) = cat.bloomPrune("scratch", "bsp", "o_custkey", -1L)
    assert(readA.isEmpty && skipA.size == 8,
      s"absent key must skip all 8 files, read=${readA.size} skip=${skipA.size}")

    // soundness for EVERY present custkey: files containing the key are
    // never skipped (blooms cannot false-negative), and pruned+predicate
    // equals the full-scan answer
    val byFile = cat.load("scratch", "bsp")
      .select(col("o_custkey")).distinct().collect().map(_.getLong(0))
    val sample = byFile.sorted.take(25)
    sample.foreach { key =>
      val (read, _) = cat.bloomPrune("scratch", "bsp", "o_custkey", key)
      val full = cat.load("scratch", "bsp")
        .where(col("o_custkey") === key).count()
      val pruned = cat.loadBloomPruned("scratch", "bsp", "o_custkey", key)
        .where(col("o_custkey") === key).count()
      assert(pruned == full, s"key $key: pruned $pruned != full $full")
      assert(read.nonEmpty)
    }

    // effectiveness: the rarest key lives in few files — most files skip
    val probe = o.groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt"), col("o_custkey")).limit(1).collect()(0).getLong(0)
    val (readP, skipP) = cat.bloomPrune("scratch", "bsp", "o_custkey", probe)
    assert(skipP.nonEmpty, "bloom must skip at least one file for the rarest key")
    assert(readP.size + skipP.size == 8)
  }

  test("bloom skip stays sound across compaction and MOR deletes") {
    val cat = new LakeCatalog(spark, scratch)
    val o = Tables.table(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    cat.dropTable("scratch", "bmt")
    cat.createTable("scratch", "bmt", StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_totalprice", DoubleType))),
      sortOrder = Seq("o_orderkey asc"))
    cat.appendClustered("scratch", "bmt", o, Seq("o_orderkey"), numFiles = 4)
    cat.recordBlooms("scratch", "bmt", "o_custkey")
    val key = o.select("o_custkey").limit(1).collect()(0).getLong(0)
    // MOR delete: the bloom still contains the key (false positive now) —
    // skipping stays sound, and the DV subtracts the rows on read
    cat.deleteWhereMor("scratch", "bmt", col("o_custkey") === key)
    val afterMor = cat.loadBloomPruned("scratch", "bmt", "o_custkey", key)
      .where(col("o_custkey") === key).count()
    assert(afterMor == 0, s"MOR-deleted rows resurfaced through the bloom path: $afterMor")
    // compaction rewrites into NEW files with no recorded bloom → every
    // file is conservatively must-read (sound), and re-indexing restores
    // the absent-key skip
    cat.compact("scratch", "bmt", 2)
    val (readC, skipC) = cat.bloomPrune("scratch", "bmt", "o_custkey", -1L)
    assert(skipC.isEmpty && readC.nonEmpty,
      s"compacted files have no blooms and must be read: read=${readC.size} skip=${skipC.size}")
    cat.recordBlooms("scratch", "bmt", "o_custkey")
    val (readC2, skipC2) = cat.bloomPrune("scratch", "bmt", "o_custkey", -1L)
    assert(readC2.isEmpty && skipC2.nonEmpty,
      "re-indexing after compaction must restore the absent-key skip")
  }

  test("gateway: CREATE BLOOM INDEX + SHOW BLOOMS drive the bloom sidecar") {
    val cat = new LakeCatalog(spark, scratch)
    val gw = new graft.catalog.SqlGateway(spark, cat)
    val o = Tables.table(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    cat.dropTable("scratch", "bgw")
    cat.createTable("scratch", "bgw", StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_totalprice", DoubleType))))
    cat.append("scratch", "bgw", o)
    val st = gw.execute("CREATE BLOOM INDEX ON scratch.bgw (o_custkey)").collect()
    assert(st.head.getString(0).contains("o_custkey"))
    val rows = gw.execute("SHOW BLOOMS IN scratch.bgw").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("column") == "o_custkey")
      assert(r.getAs[Int]("m_bits") == 16384)
      assert(r.getAs[Int]("k_hashes") == 4)
      assert(r.getAs[Int]("bits_set") > 0)
    }
  }

  test("bloom sidecar: packed encoding bounds the bytes/line; re-index and drop leave no stale rows") {
    val cat = new LakeCatalog(spark, scratch)
    val o = Tables.table(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    cat.dropTable("scratch", "bsz")
    cat.createTable("scratch", "bsz", StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_totalprice", DoubleType))),
      sortOrder = Seq("o_orderkey asc"))
    cat.appendClustered("scratch", "bsz", o, Seq("o_orderkey"), numFiles = 8)
    // explicit m: this case bounds the ENCODING (bytes per line at fixed m);
    // auto-sizing is covered below
    cat.recordBlooms("scratch", "bsz", "o_custkey", mBits = 16384)
    cat.recordBlooms("scratch", "bsz", "o_orderkey", mBits = 16384)
    // re-index one column twice: the rewrite must REPLACE its lines, so the
    // sidecar holds exactly one line per (file, column) — 8 files × 2 cols
    cat.recordBlooms("scratch", "bsz", "o_custkey", mBits = 16384)
    val sidecar = java.nio.file.Paths.get(s"$scratch/scratch/bsz_blooms.json")
    val lines = java.nio.file.Files.readAllLines(sidecar)
    assert(lines.size == 16, s"expected 8 files x 2 columns, got ${lines.size} lines")
    // packed encoding: m=16384 bits = 2048 bytes = 2732 base64 chars; with
    // JSON framing each line stays under 2.9 KB regardless of fill (the r6
    // int-list encoding was 10-20x this on full blooms)
    lines.forEach(l => assert(l.length <= 2900, s"sidecar line ${l.length} B exceeds packed bound"))
    // SHOW BLOOMS dedups by (file, column) even on legacy append-era
    // sidecars; on a rewritten sidecar it is exactly the line set
    assert(cat.bloomsMeta("scratch", "bsz").size == 16)
    // pruning still works on the packed form for both indexed columns
    val (readA, skipA) = cat.bloomPrune("scratch", "bsz", "o_custkey", -1L)
    assert(readA.isEmpty && skipA.size == 8)
    // auto-sizing (default mBits=0): m = pow2ceil(32 × max per-file NDV),
    // floored at 16384 — a power of two, and ≥ 16× the per-file key count
    // so the filter can never saturate at scale (the sf0.1 failure mode of
    // a fixed m: 96% fill → 84% FP → zero pruning)
    cat.recordBlooms("scratch", "bsz", "o_custkey")
    val metas = cat.bloomsMeta("scratch", "bsz").filter(_._2 == "o_custkey")
    assert(metas.nonEmpty)
    val ndv = cat.load("scratch", "bsz").select("o_custkey").distinct().count()
    metas.foreach { case (_, _, m, _, _) =>
      assert(Integer.bitCount(m) == 1 && m >= 16384, s"auto m=$m not a pow2 floor-16384")
      assert(m >= 16L * ndv / 8, s"auto m=$m under-sized for ~${ndv / 8} keys/file")
    }
    // drop removes the sidecar: a recreated table must not inherit blooms
    // keyed by reused part-file names
    cat.dropTable("scratch", "bsz")
    assert(!java.nio.file.Files.exists(sidecar), "dropTable must delete the bloom sidecar")
  }

  test("q_linreg: coefficients match an exact BigDecimal reference on sf0.001") {
    val out = ops.Relational3.qLinreg(spark, sfDir).collect()
    assert(out.nonEmpty)
    val rows = Tables.table(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("double"),
        col("l_extendedprice").cast("double")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    out.foreach { r =>
      val grp = r.getString(0)
      val g = rows.filter(_._1 == grp)
      assert(r.getLong(1) == g.length)
      val n = g.length.toDouble
      def dsum(vs: Seq[Double]): Double =
        vs.map(v => BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP))
          .sum.toDouble
      val sx = dsum(g.map(_._2)); val sy = dsum(g.map(_._3))
      val sxx = dsum(g.map(t => t._2 * t._2))
      val sxy = dsum(g.map(t => t._2 * t._3))
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(math.abs(r.getDouble(2) - slope) < 1e-5,
        s"$grp slope ${r.getDouble(2)} vs ref $slope")
      val intercept = (sy - slope * sx) / n
      assert(math.abs(r.getDouble(3) - intercept) < 1e-4,
        s"$grp intercept ${r.getDouble(3)} vs ref $intercept")
      val r2 = r.getDouble(4)
      assert(r2 >= 0.0 && r2 <= 1.0, s"$grp r2 $r2 out of range")
    }
  }
}
