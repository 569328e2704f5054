package graft

import graft.ops.TextOps2
import org.apache.spark.sql.functions._

/** Semantics specs for the repetition and PII operators — the synthetic
  * corpus has no PII, so detection/redaction semantics are proven here on
  * planted documents (the oracle covers the no-PII corpus end-to-end).
  */
class Text2Spec extends SparkSpec {

  test("t_repetition / t_pii_scrub run and return one row per document") {
    val nDocs = Tables.table(spark, sfDir, "documents").count()
    assert(TextOps2.tRepetition(spark, sfDir).count() == nDocs)
    assert(TextOps2.tPiiScrub(spark, sfDir).count() == nDocs)
  }

  test("t_repetition: degenerate text scores high, all-distinct text scores zero") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"), // fully repeated
      (2L, "one two three four five six"), // fully distinct
      (3L, "alpha beta alpha beta alpha beta") // repeated bigram period 2
    ).toDF("doc_id", "text")
    val r = TextOps2.repetition(docs).collect()
      .map(x => x.getLong(0) -> x).toMap

    // doc 1: 1 unique of 6 words; every bigram/trigram identical; top word = all
    assert(r(1L).getDouble(1) > 0.8 && r(1L).getDouble(2) > 0.7)
    assert(r(1L).getDouble(4) == 1.0) // top_word_frac
    // doc 2: nothing repeats at any n
    assert(r(2L).getDouble(1) == 0.0 && r(2L).getDouble(2) == 0.0
      && r(2L).getDouble(3) == 0.0)
    // doc 3: 2 unique words of 6; bigrams alternate between two values
    assert(r(3L).getDouble(1) > 0.6 && r(3L).getDouble(2) > 0.5)
    // all signals are fractions
    r.values.foreach { row =>
      (1 to 4).foreach { i =>
        assert(row.getDouble(i) >= 0.0 && row.getDouble(i) <= 1.0)
      }
    }
  }

  test("pii scrub: planted email/phone/ip are counted and redacted") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact jane.doe@example.com or bob@corp.io for details"),
      (2L, "call 555-123-4567 or 555.987.6543 now"),
      (3L, "server at 10.0.0.1 and 192.168.1.254"),
      (4L, "clean text with no identifiers at all"),
      (5L, "mix: a@b.co, 111-222-3333, 8.8.8.8")
    ).toDF("doc_id", "text")
    val out = TextOps2.piiScrub(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(1) == 2 && out(1L).getInt(2) == 0)
    assert(out(1L).getBoolean(5)) // has_pii
    assert(out(2L).getInt(2) == 2 && out(2L).getBoolean(5))
    assert(out(3L).getInt(3) == 2 && out(3L).getBoolean(5))
    assert(out(4L).getInt(1) == 0 && out(4L).getInt(2) == 0
      && out(4L).getInt(3) == 0 && !out(4L).getBoolean(5))
    assert(out(5L).getInt(1) == 1 && out(5L).getInt(2) == 1 && out(5L).getInt(3) == 1)

    // redaction removes the raw identifiers and substitutes placeholders
    val redacted = docs.select(col("doc_id"), TextOps2.redact(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(redacted(1L) == "contact <EMAIL> or <EMAIL> for details")
    assert(redacted(2L) == "call <PHONE> or <PHONE> now")
    assert(redacted(3L) == "server at <IP> and <IP>")
    assert(redacted(4L) == "clean text with no identifiers at all")
    assert(redacted(5L) == "mix: <EMAIL>, <PHONE>, <IP>")
    // no-PII text hashes to the identity redaction (oracle relies on this)
    assert(!redacted.values.exists(t =>
      t.contains("@") || t.matches(".*\\d{3}[-.]\\d{3}[-.]\\d{4}.*")))
  }
}
