package graft

/** Throwaway isolated profiler for the r8 suspect rows (mirrors the
  * PROFILE_r07 methodology: fresh session, per-query cold + 3 warm). */
object Profile8 {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = Sessions.local("32", "graft-profile8")
    spark.read.parquet(s"$sfDir/region.parquet").count()
    ops.ModelCache.enabled = true
    val names = Seq("q_pagerank", "q_pagerank2", "q_pagerank3").map(_ => "q_pagerank")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      def steal(): Double = scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu ")).map(_.trim.split("\\s+")).filter(_.length > 8)
        .map(_(8).toDouble / 100.0).getOrElse(-1.0)
      def cpu(): Double =
        java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
          case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime / 1e9
          case _ => -1.0
        }
      val times = (0 to 2).map { i =>
        val t0 = System.nanoTime(); val s0 = steal(); val c0 = cpu()
        fn(spark, sfDir).count()
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        ((System.nanoTime() - t0) / 1e9, steal() - s0, cpu() - c0)
      }
      println(f"PROFILE $n " + times.map { case (w, st, c) =>
        f"wall=$w%.2f steal=$st%.2f cpu=$c%.1f" }.mkString(" | "))
    }
    spark.stop()
  }
}
