package graft

/** Isolated per-query profiler — the PROFILE_r0N methodology as a tool:
  * fresh session, one cold + N warm passes per named query, with wall,
  * host-steal delta, and process-CPU delta per pass (wall ≫ cpu + steal
  * spike = not scheduled; cpu ≫ steady-state = JIT/codegen churn or
  * recomputation — the two confounders the bench's suspect flag exists
  * to separate).
  *
  *   Test/runMain graft.ProfileQueries q_pagerank q_triangle_count [...]
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  * GRAFT_PROFILE_WARM (default 3 warm passes). */
object ProfileQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val warm = sys.env.getOrElse("GRAFT_PROFILE_WARM", "3").toInt
    val spark = Sessions.local(cpus, "graft-profile")
    spark.read.parquet(s"$sfDir/region.parquet").count()
    ops.ModelCache.enabled = true
    def steal(): Double = scala.io.Source.fromFile("/proc/stat").getLines()
      .find(_.startsWith("cpu ")).map(_.trim.split("\\s+")).filter(_.length > 8)
      .map(_(8).toDouble / 100.0).getOrElse(-1.0)
    def cpu(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime / 1e9
        case _ => -1.0
      }
    val names = if (args.nonEmpty) args.toSeq else Seq("q1_agg")
    names.foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query '$n' — see SparkEntry.queries"))
      val passes = (0 to warm).map { _ =>
        val t0 = System.nanoTime(); val s0 = steal(); val c0 = cpu()
        fn(spark, sfDir).count()
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        ((System.nanoTime() - t0) / 1e9, steal() - s0, cpu() - c0)
      }
      println(f"PROFILE $n " + passes.zipWithIndex.map { case ((w, st, c), i) =>
        val tag = if (i == 0) "cold" else s"warm$i"
        f"$tag=$w%.2fs(steal=$st%.2f,cpu=$c%.1f)"
      }.mkString(" "))
    }
    spark.stop()
  }
}
