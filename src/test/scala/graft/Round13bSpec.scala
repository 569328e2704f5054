package graft

import graft.catalog.{LakeCatalog, SqlGateway}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** Round-13 second wave: the size-gated distributed delete-file arm
  * extended from DELETE MOR to EVERY MOR writer (updateWhereMor / mergeMor
  * — the r12 #4 FULL closure: no row-level write path transits the
  * driver above dvInlineMax), and the change feed as a SELECT-able
  * relation (`FROM t CHANGES BETWEEN a AND b`) composable into arbitrary
  * gateway SQL, not just the SHOW CHANGES verb. */
class Round13bSpec extends SparkSpec {

  private def warehouse =
    s"${System.getProperty("java.io.tmpdir")}/graft_spec_warehouse"

  test("updateWhereMor above dvInlineMax writes parquet delete files, " +
    "never inline positions; reads/counts/chaining stay exact") {
    val cat = new LakeCatalog(spark, warehouse)
    cat.dvInlineMax = 0L // force the ref arm on a small table
    try {
      cat.dropTable("spec", "refu")
      cat.createTable("spec", "refu", StructType(Seq(
        StructField("k", LongType), StructField("v", DoubleType))))
      import spark.implicits._
      cat.append("spec", "refu", (1L to 20L).map(k => (k, k.toDouble)).toDF("k", "v"))
      val n = cat.updateWhereMor("spec", "refu", col("k") % 4 === 0,
        "v", col("v") * 100)
      assert(n == 5L)
      val dv = Files.readString(Paths.get(s"$warehouse/spec/refu_dv.json"))
      assert(dv.contains("\"ref\":"), "large MOR update must write a ref line")
      assert(!dv.contains("\"pos\":"), "large MOR update must not inline positions")
      // the superseded copies are dead, the delta copies alive, count stable
      assert(cat.load("spec", "refu").count() == 20L)
      assert(cat.countStar("spec", "refu").contains(20L))
      assert(cat.load("spec", "refu").where(col("k") === 8L)
        .head().getDouble(1) == 800.0)
      assert(cat.load("spec", "refu").where(col("k") % 4 === 0 && col("v") < 100)
        .count() == 0L, "a ref-superseded row stayed visible")
      // updates CHAIN onto their own delta rows through a second ref commit
      assert(cat.updateWhereMor("spec", "refu", col("k") === 8L,
        "v", col("v") + 1) == 1L)
      assert(cat.load("spec", "refu").where(col("k") === 8L)
        .head().getDouble(1) == 801.0)
      assert(cat.load("spec", "refu").count() == 20L)
    } finally cat.dvInlineMax = 10000L
  }

  test("mergeMor above dvInlineMax writes parquet delete files for the " +
    "superseded copies; upsert results stay exact") {
    val cat = new LakeCatalog(spark, warehouse)
    cat.dvInlineMax = 0L
    try {
      cat.dropTable("spec", "refm")
      cat.createTable("spec", "refm", StructType(Seq(
        StructField("k", LongType), StructField("v", DoubleType))))
      import spark.implicits._
      cat.append("spec", "refm", (1L to 10L).map(k => (k, k.toDouble)).toDF("k", "v"))
      val (nUpd, nIns) = cat.mergeMor("spec", "refm",
        Seq((2L, 20.0), (4L, 40.0), (11L, 11.0)).toDF("k", "v"), "k")
      assert((nUpd, nIns) == (2L, 1L))
      val dv = Files.readString(Paths.get(s"$warehouse/spec/refm_dv.json"))
      assert(dv.contains("\"ref\":"), "large MOR merge must write a ref line")
      assert(!dv.contains("\"pos\":"), "large MOR merge must not inline positions")
      assert(cat.load("spec", "refm").count() == 11L)
      assert(cat.countStar("spec", "refm").contains(11L))
      assert(cat.load("spec", "refm").where(col("k") === 2L)
        .head().getDouble(1) == 20.0)
      assert(cat.load("spec", "refm").where(col("k") === 4L)
        .head().getDouble(1) == 40.0)
      assert(cat.load("spec", "refm").where(col("k") === 11L)
        .head().getDouble(1) == 11.0)
      assert(cat.load("spec", "refm").where(col("k") === 3L)
        .head().getDouble(1) == 3.0, "an unmatched row changed")
    } finally cat.dvInlineMax = 10000L
  }

  test("FROM t CHANGES BETWEEN a AND b is a SELECT-able relation " +
    "(aggregates and joins compose over the change feed)") {
    val root = java.nio.file.Files.createTempDirectory("graft_gw_chtf").toString
    val cat = new LakeCatalog(spark, root)
    import spark.implicits._
    cat.createTable("spec", "chtf", StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType))))
    cat.append("spec", "chtf", (1L to 10L).map(k => k -> k.toDouble).toDF("k", "v"))
    val v1 = cat.headVersion("spec", "chtf")
    cat.deleteWhereMor("spec", "chtf", col("k") % 4 === 0)
    cat.append("spec", "chtf", Seq((21L, 21.0), (22L, 22.0)).toDF("k", "v"))
    val v2 = cat.headVersion("spec", "chtf")
    val gw = new SqlGateway(spark, cat)
    // aggregate over the feed: the relation form the verb can't express
    val agg = gw.execute(
      s"SELECT _change, count(*) AS n FROM chtf CHANGES BETWEEN $v1 AND $v2 " +
        "GROUP BY _change ORDER BY _change")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg == Map("delete" -> 2L, "insert" -> 2L))
    // join the feed back against the live table: inserted keys are alive,
    // deleted keys are gone
    val joined = gw.execute(
      s"SELECT c._change, count(t.k) AS alive " +
        s"FROM chtf CHANGES BETWEEN $v1 AND $v2 c " +
        "LEFT JOIN chtf t ON c.k = t.k GROUP BY c._change ORDER BY c._change")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(joined == Map("delete" -> 0L, "insert" -> 2L))
  }

  test("t_word_lm: held-out scoring is real (backoff fires), scores are " +
    "per-word cross-entropies, and only the odd half is scored") {
    val r = ops.TextOps7.tWordLm(spark, sfDir).collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getAs[Long]("doc_id") % 2 == 1),
      "a training-half doc was scored")
    assert(r.map(_.getAs[Long]("n_backoff")).sum > 0L,
      "no unseen bigram in the held-out half — the split is not doing its job")
    assert(r.forall { row =>
      val x = row.getAs[Double]("xent")
      x > 0.0 && x < 20.0 // nats/word: positive, far below ln(V)+slack
    })
    assert(r.forall(row =>
      row.getAs[Long]("n_backoff") <= row.getAs[Long]("n_bi")))
  }
}
