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
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
