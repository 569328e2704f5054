package graft

import org.apache.spark.sql.SparkSession

/** One place for the session config every entry point (Bench, Verify,
  * Profile, specs) shares — keeps the oracle-critical settings (UTC, nanos
  * passthrough, graft extensions) from drifting between mains.
  */
object Sessions {
  def local(cpus: String, appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // graft's sketch aggregates (MinHashAgg/SimHashAgg) are
      // TypedImperativeAggregates → ObjectHashAggregate. The default
      // sort-fallback threshold (128 in-memory groups) would force a
      // per-partition sort on any real corpus; buffers are ≤1 KB, so
      // 512k groups/task ≈ 0.5 GB — sized for the local 128 GiB heap.
      // Cluster rule: threshold × bufferBytes ≤ ~25% executor heap.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", (1 << 19).toString)
      // Shuffle/spill files on tmpfs: the container's virtual disk shows
      // multi-second (sometimes multi-minute) write stalls under load,
      // which serialized every shuffle-heavy operator through a sick
      // device. The box has 126 GiB of tmpfs; local-mode shuffle volumes
      // at bench scale are MBs. On a real cluster this maps to the
      // standard practice of NVMe/ramdisk scratch volumes for shuffle.
      // default to tmpfs only where it exists (Linux); elsewhere fall back
      // to the JVM tmpdir so the session still starts (ADVICE r4)
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_LOCAL_DIRS",
          if (java.nio.file.Files.isDirectory(
            java.nio.file.Paths.get("/dev/shm"))) "/dev/shm/graft-spark"
          else System.getProperty("java.io.tmpdir") + "/graft-spark"))
      // Straggler defense: the host hypervisor intermittently starves
      // single vCPUs for seconds (kernel logs delayed timer interrupts),
      // and one starved task holds the whole 32-task stage — measured as
      // 5-30x wall-time inflation on shuffle-heavy ops. Speculative
      // re-launch of the slowest tasks sidesteps a stalled thread the
      // same way it sidesteps a sick node on a real cluster.
      .config("spark.speculation", "true")
      .config("spark.speculation.multiplier", "3")
      .config("spark.speculation.quantile", "0.75")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
