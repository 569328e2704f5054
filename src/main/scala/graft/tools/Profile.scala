package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the slow operators — not part of the driver
  * contract; run with `sbt "runMain graft.tools.Profile"`. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.local(cpus, "graft-profile")
    spark.read.parquet(s"$sfDir/region.parquet").count()

    // wall + process-CPU + /proc/stat host-steal per timing, so a starved
    // window is mechanically evident in the profile output itself
    // (wall >> cpu and steal spikes => the JVM wasn't scheduled).
    def procCpu(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime / 1e9
        case _ => -1.0
      }
    def steal(): Double = try {
      scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu ")).map(_.trim.split("\\s+"))
        .filter(_.length > 8).map(_(8).toDouble / 100.0).getOrElse(-1.0)
    } catch { case _: Throwable => -1.0 }
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val c0 = procCpu(); val s0 = steal()
      val n = f
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $name%-30s $w%8.2f s  cpu ${procCpu() - c0}%7.2f s  steal ${steal() - s0}%6.2f s  ($n rows)")
    }

    args.headOption.getOrElse("minhash") match {
      case "minhash" =>
        // stage decomposition of dMinhashLsh
        val sh = graft.ops.Dedup.shingles(spark, sfDir)
        time("shingles")(sh.count())
        val shc = sh.cache()
        time("shingles cached")(shc.count())
        time("minhash agg only")(
          shc.groupBy("doc_id")
            .agg(graft.functions.Sketch.minhash(col("h"), 128).as("m")).count())
        time("full d_minhash_lsh")(graft.ops.Dedup.dMinhashLsh(spark, sfDir).count())
        spark.catalog.clearCache()
        time("full again (cold cache)")(graft.ops.Dedup.dMinhashLsh(spark, sfDir).count())
        spark.catalog.clearCache()
        graft.ops.Dedup.dMinhashLsh(spark, sfDir).explain("formatted")
      case "clusters" =>
        time("d_ngram_jaccard")(graft.ops.Dedup.dNgramJaccard(spark, sfDir).count())
        spark.catalog.clearCache()
        time("d_dup_clusters")(graft.ops.Dedup.dDupClusters(spark, sfDir).count())
        spark.catalog.clearCache()
      case "cosine" =>
        time("s_cosine_topk")(graft.ops.Similarity.sCosineTopk(spark, sfDir).count())
        time("s_cosine_topk warm")(graft.ops.Similarity.sCosineTopk(spark, sfDir).count())
      case "explain" =>
        graft.SparkEntry.queries(args(1))(spark, sfDir).explain("formatted")
      case l if l.startsWith("list:") =>
        // cold+warm for a comma-separated query list, Bench-style cache
        // hygiene between runs
        l.stripPrefix("list:").split(',').foreach { q =>
          time(q)(graft.SparkEntry.queries(q)(spark, sfDir).count())
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
          time(q + " warm")(graft.SparkEntry.queries(q)(spark, sfDir).count())
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        }
      case other =>
        time(other)(graft.SparkEntry.queries(other)(spark, sfDir).count())
        spark.catalog.clearCache()
        time(other + " warm")(graft.SparkEntry.queries(other)(spark, sfDir).count())
    }
    spark.stop()
  }
}
