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
}
