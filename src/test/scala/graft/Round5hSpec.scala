package graft

import org.apache.spark.sql.functions._

/** Round-5 batch h: perceptual-hash near-dup detection. */
class Round5hSpec extends SparkSpec {

  test("m_phash_dedup: corrupted copy detected within radius, unrelated asset not") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    def randText(n: Int): String =
      Seq.fill(n)(('a' + rng.nextInt(26)).toChar).mkString
    val base = randText(4096)
    // corruption confined to ONE 64-byte frame → one luma changes → at most
    // the two dHash bits comparing against that frame flip (≤ 3 = radius)
    val corrupted = base.updated(100, '!').updated(101, '?')
    val other = randText(4096)
    val payloads = Seq((1L, base), (2L, corrupted), (3L, other))
      .toDF("doc_id", "text")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val pairs = ops.Multimodal2.phashPairs(payloads).collect()
    val near = pairs.filter(_.getAs[Int]("hamming") <= 3)
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(near == Set((1L, 2L)),
      s"expected exactly the corrupted pair, got $near " +
        s"(all candidates: ${pairs.map(r => (r.getLong(0), r.getLong(2), r.getAs[Int]("hamming"))).mkString(", ")})")
    // identical payloads hash identically (hamming 0, always candidates)
    val twins = ops.Multimodal2.phashPairs(
      Seq((7L, base), (8L, base)).toDF("doc_id", "text")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")))
      .collect()
    assert(twins.exists(r => r.getAs[Int]("hamming") == 0L))
  }

  test("t_bpe_apply: learned merges compress — n_words <= bpe_tokens < n_chars") {
    val out = ops.TextOps3.tBpeApply(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val words = r.getAs[Long]("n_words")
      val chars = r.getAs[Long]("n_chars")
      val toks = r.getAs[Long]("bpe_tokens")
      // every word is >= 1 token; 5 learned merges must beat char-level
      assert(toks >= words, s"${r.getAs[String]("source")}: tokens < words")
      assert(toks < chars, s"${r.getAs[String]("source")}: merges compressed nothing")
      assert(r.getAs[Double]("chars_per_token") > 1.0)
    }
  }

  test("m_phash_dedup driver entry emits one stats row with consistent counts") {
    val out = ops.Multimodal2.mPhashDedup(spark, sfDir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_assets") > 0)
    assert(r.getAs[Long]("n_neardup") <= r.getAs[Long]("n_candidates"))
  }
}
