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

  test("s_filtered_topk: every neighbor shares the query's label") {
    val lbl = Tables.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val out = ops.Similarity2.sFilteredTopk(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val q = r.getAs[Long]("q_id")
      val v = r.getAs[Long]("vec_id")
      assert(lbl(q) == lbl(v), s"neighbor $v of $q crosses the label filter")
      assert(r.getAs[Int]("label") == lbl(q))
    }
  }

  test("q_match_recognize counts non-overlapping pattern hits on planted sequences") {
    import spark.implicits._
    val m = 1000000000L
    // user 1: v c p v p  → vp adjacency 1 ('v p' at the end), v..p 2, e..p 0
    // user 2: e v p      → e..p 1, v..p 1, vp adjacent 1
    // user 3: c c c      → nothing
    val ev = Seq(
      (1L, 1L * m, 1L, "view", 0.0), (2L, 2L * m, 1L, "click", 0.0),
      (3L, 3L * m, 1L, "purchase", 0.0), (4L, 4L * m, 1L, "view", 0.0),
      (5L, 5L * m, 1L, "purchase", 0.0),
      (10L, 1L * m, 2L, "error", 0.0), (11L, 2L * m, 2L, "view", 0.0),
      (12L, 3L * m, 2L, "purchase", 0.0),
      (20L, 1L * m, 3L, "click", 0.0), (21L, 2L * m, 3L, "click", 0.0),
      (22L, 3L * m, 3L, "click", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    ev.createOrReplaceTempView("r5h_events")
    // reuse the op's letter/regex logic by writing the frame to a temp dir
    val tmp = java.nio.file.Files.createTempDirectory("r5h_ev")
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = ops.Events.qMatchRecognize(spark, tmp.toString).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_users"), r.getAs[Long]("n_matches"))).toMap
    // sequences: u1 = "vcpvp", u2 = "evp", u3 = "ccc"
    assert(out("adjacent_vp") == (2L, 2L))        // u1 "vp" once, u2 once
    assert(out("view_then_purchase") == (2L, 3L)) // u1 twice, u2 once
    assert(out("error_recovery") == (1L, 1L))     // u2 only
  }

  test("m_phash_dedup driver entry emits one stats row with consistent counts") {
    val out = ops.Multimodal2.mPhashDedup(spark, sfDir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_assets") > 0)
    assert(r.getAs[Long]("n_neardup") <= r.getAs[Long]("n_candidates"))
  }
}
