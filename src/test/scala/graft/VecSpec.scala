package graft

import graft.functions.Vec
import org.apache.spark.sql.functions._

/** Native expression specs: vdot ≡ the HOF fold bit-for-bit, SQL injection
  * via SparkSessionExtensions, null handling. */
class VecSpec extends SparkSpec {

  test("vdot equals the aggregate(zip_with) fold bit-for-bit on real embeddings") {
    val e = Tables.table(spark, sfDir, "embeddings").limit(200)
    val hof = aggregate(zip_with(col("embedding"), col("embedding"),
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0d), (acc, x) => acc + x)
    val diffs = e.select(
      Vec.vdot(col("embedding"), col("embedding")).as("native"), hof.as("hof"))
      .where(col("native") =!= col("hof")).count()
    assert(diffs == 0, s"$diffs rows differ between native vdot and HOF fold")
  }

  test("vdot is callable from SQL via GraftExtensions") {
    Tables.registerAll(spark, sfDir)
    val r = spark.sql(
      """SELECT vec_id, vdot(embedding, embedding) AS sq
        |FROM embeddings ORDER BY vec_id LIMIT 5""".stripMargin).collect()
    assert(r.length == 5 && r.forall(_.getDouble(1) > 0))
  }

  test("vdot null semantics: null array in, null out") {
    Tables.registerAll(spark, sfDir)
    val r = spark.sql(
      "SELECT vdot(CAST(NULL AS ARRAY<FLOAT>), embedding) AS d FROM embeddings LIMIT 1")
      .head()
    assert(r.isNullAt(0))
  }

  test("vdot rejects non-float-array inputs at analysis time") {
    Tables.registerAll(spark, sfDir)
    val e = intercept[Exception] {
      spark.sql("SELECT vdot(array(1.0, 2.0), array(1.0, 2.0))").collect()
    }
    assert(e.getMessage.contains("vdot expects"), e.getMessage)
  }

  test("ngram_hashes / minhash / simhash are callable from SQL text") {
    Tables.registerAll(spark, sfDir)
    // SQL path must produce the SAME hashes the DataFrame API produces
    val viaSql = spark.sql(
      """SELECT doc_id, ngram_hashes(split(lower(text), ' '), 5) AS h
        |FROM documents ORDER BY doc_id LIMIT 3""".stripMargin).collect()
    val viaDf = Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"),
        graft.functions.Sketch.ngramHashes(split(lower(col("text")), " "), 5).as("h"))
      .orderBy("doc_id").limit(3).collect()
    assert(viaSql.map(_.toString).toSeq == viaDf.map(_.toString).toSeq)

    val agg = spark.sql(
      """SELECT minhash(h, 8) AS m, simhash(h) AS s FROM (
        |  SELECT explode(ngram_hashes(split(lower(text), ' '), 5)) AS h
        |  FROM documents WHERE doc_id = 0)""".stripMargin).head()
    assert(agg.getSeq[Long](0).length == 8)
    assert(agg.getLong(1) != 0L)
  }
}
