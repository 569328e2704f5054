package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Round-6 batch a: NFC normalization (expression + op) and the events.ts
  * type-normalization contract. */
class Round6Spec extends SparkSpec {

  // composed via escapes, decomposed via NFD, so no editor/tool encoding
  // pass can silently collapse the two forms into one.
  private val composed = "Caf\u00e9 cr\u00e8me"
  private val decomposed =
    java.text.Normalizer.normalize(composed, java.text.Normalizer.Form.NFD)

  test("fixture sanity: composed and decomposed differ at the char level") {
    assert(composed != decomposed)
    assert(decomposed.length == composed.length + 2)
  }

  test("NfcNormalize.nfc: composed/decomposed/ASCII semantics, no-copy fast paths") {
    val dec = UTF8String.fromString(decomposed)
    val comp = UTF8String.fromString(composed)
    val ascii = UTF8String.fromString("plain ascii only")
    assert(NfcTestAccess.nfc(dec).toString == composed,
      "decomposed input must compose under NFC")
    // already-NFC inputs come back as the SAME buffer (no copy)
    assert(NfcTestAccess.nfc(comp) eq comp)
    assert(NfcTestAccess.nfc(ascii) eq ascii)
    // idempotence
    assert(NfcTestAccess.nfc(NfcTestAccess.nfc(dec)).toString == composed)
  }

  test("nfc expression: codegen and interpreted paths agree; SQL name registered") {
    import spark.implicits._
    val df = Seq((1L, decomposed), (2L, composed), (3L, "ascii"), (4L, null.asInstanceOf[String]))
      .toDF("id", "s")
    // DataFrame path (whole-stage codegen)
    val viaColumn = df.select(col("id"), functions.Str.nfc(col("s")).as("n"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(viaColumn(1L).contains(composed))
    assert(viaColumn(2L).contains(composed))
    assert(viaColumn(3L).contains("ascii"))
    assert(viaColumn(4L).isEmpty, "null in, null out")
    // SQL path through the GraftExtensions registration
    df.createOrReplaceTempView("nfc_probe")
    val viaSql = spark.sql("SELECT id, nfc_norm(s) AS n FROM nfc_probe")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(viaSql == viaColumn, "SQL nfc_norm must match the Column API")
  }

  test("t_nfc_normalize: planted docs compose (one codepoint shorter), others untouched") {
    val out = ops.TextOps4.tNfcNormalize(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val changed = r.getAs[Boolean]("changed")
      val nRaw = r.getAs[Int]("n_raw")
      val nNfc = r.getAs[Int]("n_nfc")
      if (id % 7 == 0) {
        assert(changed, s"doc $id carries the decomposed suffix, must change")
        assert(nNfc == nRaw - 1,
          s"doc $id: composing e+U+0301 must drop exactly one codepoint ($nRaw -> $nNfc)")
        assert(r.getAs[String]("fp") != r.getAs[String]("fp_raw"),
          s"doc $id: normalized bytes must differ from raw")
      } else {
        assert(!changed, s"doc $id is ASCII corpus text, must be NFC already")
        assert(nNfc == nRaw)
        assert(r.getAs[String]("fp") == r.getAs[String]("fp_raw"))
      }
    }
  }

  test("normalizeEventTs: TIMESTAMP_NTZ events.ts loads as epoch-nanos BIGINT") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ntz").toString
    // 2021-03-04 05:06:07.123456 UTC as micros since epoch
    val micros = 1614834367123456L
    Seq((1L, micros), (2L, 0L))
      .toDF("event_id", "us")
      .select(col("event_id"),
        expr("cast(timestamp_micros(us) as timestamp_ntz)").as("ts"),
        lit("click").as("etype"), lit(1L).as("user_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val loaded = Tables.table(spark, dir, "events")
    assert(loaded.schema("ts").dataType == org.apache.spark.sql.types.LongType)
    val byId = loaded.select("event_id", "ts").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(1L) == micros * 1000L, s"expected ${micros * 1000L}, got ${byId(1L)}")
    assert(byId(2L) == 0L)
  }

  test("normalizeEventTs: unsupported ts type fails loudly at the load boundary") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-badts").toString
    Seq((1L, "not-a-time")).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException](Tables.table(spark, dir, "events"))
    assert(e.getMessage.contains("events.ts"))
    assert(e.getMessage.toLowerCase.contains("string"))
  }

  test("PolyHash: mulmod, permutations and UTF-8 codepoint fold match a BigInt reference") {
    import graft.functions.PolyHash
    val M = BigInt(PolyHash.M)
    val rng = new scala.util.Random(99)
    for (_ <- 1 to 2000) {
      val a = math.abs(rng.nextLong()) % PolyHash.M
      val b = math.abs(rng.nextLong()) % PolyHash.M
      assert(BigInt(PolyHash.mulmod(a, b)) == BigInt(a) * BigInt(b) % M)
      assert(BigInt(PolyHash.perm(b, PolyHash.permA(7), PolyHash.permB(7))) ==
        (BigInt(PolyHash.permA(7)) * b + PolyHash.permB(7)) % M)
    }
    def ref(s: String): Long = {
      var h = BigInt(0)
      s.codePoints().toArray.foreach(cp => h = (h * PolyHash.B + cp + 1) % M)
      h.toLong
    }
    // covers 1-, 2-, 3- and 4-byte UTF-8 sequences (the codegen decoder
    // must agree with DuckDB's unicode() codepoints on all of them)
    val samples = Seq("hello world", "", "a", composed, decomposed,
      "ß中文", new String(Character.toChars(0x1F600)) + "z")
    samples.foreach { s =>
      assert(PolyHash.foldString(0L, UTF8String.fromString(s)) == ref(s),
        s"fold mismatch on ${s.codePoints().toArray.mkString(",")}")
    }
  }

  test("d_dup_clusters distributed: fused convergence still detects fixpoint and matches union-find") {
    val (out, rounds, converged) = ops.Dedup.dupClustersWithRounds(spark, sfDir)
    assert(converged, "must reach fixpoint within the round budget")
    assert(rounds >= 1)
    val dist = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uf = ops.Dedup.dDupClusters(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dist == uf, "distributed labels must equal the union-find cross-check")
  }
}

/** Bridge for the private nfc helper (same package, object keeps the spec
  * honest about what is public API vs internals under test). */
object NfcTestAccess {
  def nfc(s: UTF8String): UTF8String = functions.NfcNormalize.nfc(s)
}
