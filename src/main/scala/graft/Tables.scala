package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table access layer for the graft warehouse.
  *
  * Mirrors the reference's catalog-mediated table loading
  * (reference: IcebergConnection.py:99-110 `catalog.load_table(...).scan()`)
  * but Spark-native: `spark.read.parquet` gives a lazy, pushdown-capable scan
  * — filters and column pruning reach the parquet reader instead of the
  * reference's full-scan-then-filter (reference README.md:5).
  *
  * At 100 TB each table is a partitioned parquet dataset; the same
  * `spark.read.parquet(root)` call handles partition discovery + pruning.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Schema memo for the (immutable, read-only) benchmark tables: a bare
  // spark.read.parquet infers the schema from the footer on EVERY call
  // (~70 ms measured), and operators load 2-3 tables each — across 335
  // queries that inference was a double-digit-seconds tax per bench pass.
  // Passing the memoized schema skips the footer read; the data path is
  // untouched and the schema of a given dir never changes within a run.
  // At 100 TB the analog is standard practice: readers take the schema
  // from the table catalog (as the reference does via pyiceberg), never
  // by per-query file inference.
  private val schemaMemo =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val schema = schemaMemo.computeIfAbsent(path,
      _ => spark.read.parquet(path).schema)
    val df = spark.read.schema(schema).parquet(path)
    if (name == "events") normalizeEventTs(df) else df
  }

  /** `events.ts` varies across driver testdata generations: parquet
    * timestamp[ns] arrives as raw long nanos (the nanosAsLong conf in
    * Sessions), parquet timestamp[us] arrives as TIMESTAMP_NTZ. Normalize
    * to epoch-nanos BIGINT at the load boundary so every downstream plan
    * keeps the tz-free integer-nanos arithmetic (SURVEY §4) and the DuckDB
    * oracles' `epoch_ns(ts)` sees the identical value. timestampdiff on
    * NTZ is timezone-independent — no session-tz coupling. */
  private def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case org.apache.spark.sql.types.TimestampNTZType => df.withColumn("ts",
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) * 1000"))
      // tz-adjusted TIMESTAMP (parquet isAdjustedToUTC=true) is only correct
      // because Sessions pins spark.sql.session.timeZone=UTC — the NTZ
      // literal is then the true epoch. Localize that assumption here rather
      // than in a catch-all so any OTHER type (date/string/struct) fails
      // loudly instead of with a confusing analysis error downstream.
      case org.apache.spark.sql.types.TimestampType => df.withColumn("ts",
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) * 1000"))
      case other => throw new IllegalArgumentException(
        s"events.ts: expected BIGINT (epoch nanos), TIMESTAMP_NTZ or TIMESTAMP, got ${other.sql}")
    }

  /** Decouple map-side parallelism from the input split count for
    * compute-heavy per-row work (regex, shingling, vector math). A small
    * parquet file arrives as ONE split (< files.maxPartitionBytes), which
    * would serialize all downstream per-row compute onto a single core. The
    * round-robin shuffle moves only the tiny input (KBs–MBs); at 100 TB the
    * scan already has thousands of splits and the repartition count equals
    * the cluster's default parallelism, so the pattern stays correct — the
    * shuffle is what you pay to fix pathological split skew (many small
    * files per executor is the cluster analog of this local case). */
  def fanout(df: DataFrame): DataFrame = {
    // Scale-adaptive (r13, guide §2.5 "input skew — one huge unsplittable
    // file"): repartition ONLY when the scan arrives with fewer splits than
    // the session's parallelism. Locally a single small parquet file is one
    // split and the shuffle is what buys 32-way map parallelism; at 100 TB
    // the same scan already has thousands of splits and this is a NO-OP —
    // the old unconditional repartition would have been a full-table
    // shuffle for nothing at exactly the scale that can't afford it.
    // Row multiset is unchanged either way (round-robin repartition), and
    // every consumer downstream is order-independent (decimal sums,
    // hash joins, windows with explicit ORDER BY) — results identical.
    //
    // The width probe is `inputFiles.length` (analysis-only, ~1 ms — a
    // physical-plan probe via df.rdd measured +53 ms per call, which at 66
    // call sites was a visible tail across the whole bench): a scan backed
    // by >= parallelism FILES has >= parallelism splits. A table of few
    // giant multi-split files would repartition needlessly — at real scale
    // parquet tables are many-filed, and the repartition is still correct,
    // only redundant. Non-file-backed frames fall back to the exact probe.
    val p = df.sparkSession.sparkContext.defaultParallelism
    val files = try df.inputFiles catch { case _: Throwable => Array.empty[String] }
    val wide =
      if (files.nonEmpty) files.length >= p
      else df.rdd.getNumPartitions >= p
    if (wide) df else df.repartition(p)
  }

  /** Register every table as a temp view so `spark.sql` covers the
    * reference's arbitrary-SQL surface (IcebergConnection.py:113-120). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))

  def sql(spark: SparkSession, dir: String, text: String): DataFrame = {
    registerAll(spark, dir)
    spark.sql(text)
  }

  /** Exact, order-independent sum of a double column: accumulate as decimal
    * (associative, no fp reordering drift across partitions/AQE re-plans),
    * render as double. The DuckDB oracle uses the identical text
    * `CAST(SUM(CAST(x AS DECIMAL(30,6))) AS DOUBLE)` so both engines agree
    * bit-for-bit. See SURVEY.md §4.
    */
  def dsum(c: Column): Column = sum(c.cast("decimal(30,6)")).cast("double")

  /** Deterministic mean built from dsum / count — same text both engines. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))
}
