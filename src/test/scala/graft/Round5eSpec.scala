package graft

import graft.catalog.{LakeCatalog, SqlGateway}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-5 batch e: snapshot rollback, soft-dedup weights, time-decay
  * features, SQ8 quantized ANN. */
class Round5eSpec extends SparkSpec {

  private def freshCat: LakeCatalog = {
    val root = java.nio.file.Files.createTempDirectory("graft_r5e").toString
    new LakeCatalog(spark, root)
  }

  test("rollbackTo: bad commit undone, history preserved, lineage continues") {
    import spark.implicits._
    val cat = freshCat
    cat.createTable("ns", "rb", StructType(Seq(StructField("id", LongType))))
    cat.append("ns", "rb", (1L to 10L).toDF("id"))   // v1
    cat.append("ns", "rb", (11L to 20L).toDF("id"))  // v2
    cat.append("ns", "rb", (90L to 99L).toDF("id"))  // v3: the bad ingest
    cat.rollbackTo("ns", "rb", 2)
    assert(cat.load("ns", "rb").count() == 20)
    assert(cat.load("ns", "rb").where(col("id") >= 90).isEmpty)
    // history is append-only: the bad snapshot still time-travels
    assert(cat.loadSnapshot("ns", "rb", 3).count() == 30)
    // the next commit bases on the rolled-back state, fresh version number
    cat.append("ns", "rb", (21L to 25L).toDF("id")) // v4
    assert(cat.load("ns", "rb").count() == 25)
    assert(cat.snapshots("ns", "rb").map(_._1).max == 4)
    // rollback to a version that never existed must refuse
    intercept[IllegalArgumentException] { cat.rollbackTo("ns", "rb", 99) }
  }

  test("ROLLBACK gateway verb routes to the catalog") {
    import spark.implicits._
    val cat = freshCat
    cat.createTable("ns", "rbg", StructType(Seq(StructField("id", LongType))))
    cat.append("ns", "rbg", (1L to 5L).toDF("id"))  // v1
    cat.append("ns", "rbg", (6L to 9L).toDF("id"))  // v2
    val gw = new SqlGateway(spark, cat)
    val out = gw.execute("ROLLBACK TABLE ns.rbg TO VERSION 1")
    assert(out.collect().head.getString(0).contains("version 1"))
    assert(cat.load("ns", "rbg").count() == 5)
  }

  test("p_dedup_weight: weight mass sums to the cluster count (soft-dedup invariant)") {
    import spark.implicits._
    // planted corpus: "dup" appears 4× across two sources (weights 0.25),
    // "twin" 2× in one source, three unique docs
    val docs = Seq(
      (1L, "a", "dup"), (2L, "a", "dup"), (3L, "b", "dup"), (4L, "b", "dup"),
      (5L, "a", "twin"), (6L, "a", "twin"),
      (7L, "a", "solo one"), (8L, "b", "solo two"), (9L, "c", "solo three")
    ).toDF("doc_id", "source", "text")
    val out = ops.Pipeline3.dedupWeightOf(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    // cluster count = 5 (dup, twin, 3 solos); weight mass splits per source
    assert(out("a").getAs[Long]("n_docs") == 5)
    assert(out("a").getAs[Double]("weight_mass") == 0.5 + 1.0 + 1.0) // dup 2/4 + twin + solo
    assert(out("b").getAs[Double]("weight_mass") == 0.5 + 1.0)
    assert(out("c").getAs[Double]("weight_mass") == 1.0)
    // representative attribution: min doc_id copy's source wins
    assert(out("a").getAs[Long]("n_reps") == 3) // dup(1), twin(5), solo(7)
    assert(out("b").getAs[Long]("n_reps") == 1)
    val totalMass = out.values.map(_.getAs[Double]("weight_mass")).sum
    assert(math.abs(totalMass - 5.0) < 1e-6)
    assert(math.abs(out("a").getAs[Double]("dup_factor") - 5.0 / 2.5) < 1e-6)
    // and on the driver corpus the invariant Σ mass = Σ reps still holds
    val drv = ops.Pipeline3.pDedupWeight(spark, sfDir).collect()
    val mass = drv.map(_.getAs[Double]("weight_mass")).sum
    val reps = drv.map(_.getAs[Long]("n_reps")).sum
    assert(math.abs(mass - reps) < 0.01)
  }

  test("q_decay_agg: weights bounded, exponential kernel exact powers of two") {
    val out = ops.Events.qDecayAgg(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n_events").toDouble
      // every per-event weight lies in (0, 1] ⇒ sums bounded by the count
      assert(r.getAs[Double]("decayed_n") > 0 && r.getAs[Double]("decayed_n") <= n + 1e-6)
      // the exponential kernel can only shrink magnitude vs the raw sum
      assert(r.getAs[Double]("decay_exp").abs <= r.getAs[Long]("n_events") * 1e3)
    }
    // determinism: rebuilding the plan yields the identical frame (the
    // resumability contract sampling/decay features need at 100 TB)
    val again = ops.Events.qDecayAgg(spark, sfDir).collect()
    assert(out.toSeq == again.toSeq)
  }

  test("s_sq8_topk: 8-bit quantized ranking keeps recall@5 >= 0.8 vs exact") {
    val exact = ops.Similarity.sCosineTopk(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSet }
    val sq8 = ops.Similarity2.sSq8Topk(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSet }
    assert(sq8.keySet == exact.keySet)
    val recalls = exact.map { case (q, ids) =>
      (sq8(q) & ids).size.toDouble / ids.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"SQ8 mean recall@5 $mean < 0.8")
  }
}
