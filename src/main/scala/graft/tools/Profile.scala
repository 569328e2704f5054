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
    // bench-parity knob: the Bench main enables ModelCache so ANN model
    // builds are priced separately from query cost — set
    // SPARK_GRAFT_MODELCACHE=1 to profile under the same split
    if (sys.env.get("SPARK_GRAFT_MODELCACHE").contains("1"))
      graft.ops.ModelCache.enabled = true
    // ad-hoc runtime conf overrides for profiling experiments:
    // SPARK_GRAFT_SET="key=value;key=value"
    sys.env.get("SPARK_GRAFT_SET").foreach(_.split(';').filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v) })

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
      case "finalplan" =>
        // AQE final plan: execute first, then explain — shows actual join
        // strategies, AQEShuffleRead coalescing and runtime stats
        val df = graft.SparkEntry.queries(args(1))(spark, sfDir)
        df.count()
        df.explain("formatted")
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
      case l if l.startsWith("jobs:") =>
        // per-Spark-job wall decomposition of one query (guide §1.1/§7):
        // run once untimed (codegen/model warmup), then attach a listener
        // and re-run, printing every job's duration + task-time so the
        // expensive stage is mechanically identified
        val q = l.stripPrefix("jobs:")
        def hygiene(): Unit = {
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        }
        graft.SparkEntry.queries(q)(spark, sfDir).count(); hygiene()
        val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
        val jobTask = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]
        val stageJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            jobs.put(e.jobId, (e.time, Option(e.properties.getProperty("spark.job.description")).getOrElse("")))
            e.stageIds.foreach(s => stageJob.put(s, e.jobId))
            jobTask.put(e.jobId, new java.util.concurrent.atomic.AtomicLong)
          }
          override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            val j = stageJob.getOrDefault(e.stageId, -1)
            if (j >= 0 && e.taskMetrics != null)
              jobTask.get(j).addAndGet(e.taskMetrics.executorRunTime)
          }
          override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = e.stageInfo
            val wall = (for { a <- si.submissionTime; b <- si.completionTime } yield (b - a) / 1e3).getOrElse(-1.0)
            if (wall > 0.1) {
              val ops = si.rddInfos.map(_.name).distinct.mkString(">")
              println(f"[stage] ${si.stageId}%4d  wall $wall%7.3f s  tasks ${si.numTasks}%4d  $ops%.160s")
            }
          }
          override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val (t0, desc) = jobs.getOrDefault(e.jobId, (e.time, "?"))
            println(f"[job] ${e.jobId}%4d  wall ${(e.time - t0) / 1e3}%7.3f s  taskTime ${jobTask.get(e.jobId).get / 1e3}%8.3f s  $desc%.110s")
          }
        }
        spark.sparkContext.addSparkListener(listener)
        time(q + " instrumented")(graft.SparkEntry.queries(q)(spark, sfDir).count())
        spark.sparkContext.removeSparkListener(listener)
      case other =>
        time(other)(graft.SparkEntry.queries(other)(spark, sfDir).count())
        spark.catalog.clearCache()
        time(other + " warm")(graft.SparkEntry.queries(other)(spark, sfDir).count())
    }
    spark.stop()
  }
}
