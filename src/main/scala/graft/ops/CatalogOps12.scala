package graft.ops

import graft.Tables
import graft.catalog.LakeCatalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.1 round-12 second batch: the format-version contract (Iceberg v1
  * tables must REFUSE row-level-delete writes until upgraded — the
  * capability gate every verb this round added sits behind) and mergeable
  * per-file NDV sketches (the Iceberg Puffin theta-stats shape, KMV over
  * the portable GF(2^61−1) hash so the estimate replays bit-exactly).
  *
  * Reference capability anchor: pyiceberg loads format-version from table
  * metadata and refuses v2 write features on v1 tables; Puffin NDV blobs
  * feed its scan planning. The reference demonstrator exercises neither —
  * a 100 TB lake lives on both.
  */
object CatalogOps12 {

  private def scratch: String =
    s"${System.getProperty("java.io.tmpdir")}/graft_warehouse"

  private val M = 2305843009213693951L // GF(2^61−1) hash modulus

  /** Format-version lifecycle ([[LakeCatalog.formatVersion]] /
    * [[LakeCatalog.upgradeFormat]]): a table created at format-version 1
    * accepts COW writes (v1's contract) but REFUSES every row-level-delete
    * verb — a v1 reader knows nothing of delete files, so a writer that
    * emitted them would corrupt, not degrade; refusal must also commit
    * NOTHING (the refused attempts are proven snapshot-free). The upgrade
    * is a metadata-only property write (`format-version` = 2 — zero data
    * IO, the only acceptable cost on a 100 TB table), after which the SAME
    * MOR delete and equality delete succeed. The gate replays the final
    * state (count, decimal sum, per-mechanism matched counts) from first
    * principles plus the metadata countStar. */
  def cV2Upgrade(spark: SparkSession, dir: String): DataFrame = {
    val cat = new LakeCatalog(spark, scratch)
    val cust = Tables.table(spark, dir, "customer")
      .select(col("c_custkey").cast("long").as("k"), col("c_acctbal").as("bal"))
      .where(col("k") % 2 === 1)
    cat.dropTable("scratch", "cust_v1")
    cat.createTable("scratch", "cust_v1", StructType(Seq(
      StructField("k", LongType), StructField("bal", DoubleType))),
      properties = Map("format-version" -> "1"))
    cat.append("scratch", "cust_v1", cust)
    // v1 allows copy-on-write
    val nPre = cat.load("scratch", "cust_v1").count()
    cat.deleteWhere("scratch", "cust_v1", col("k") % 30 === 9)
    val nCow = nPre - cat.load("scratch", "cust_v1").count()
    val vAfterCow = cat.headVersion("scratch", "cust_v1")
    // v1 refuses row-level deletes, and the refusal commits nothing
    val refusedMor =
      try { cat.deleteWhereMor("scratch", "cust_v1", col("k") % 10 === 3); false }
      catch { case e: IllegalStateException => e.getMessage.contains("format-version") }
    val eqKeys = cust.where(col("k") % 25 === 21)
      .select(col("k")).distinct().collect().map(_.getLong(0)).sorted.toSeq
    val refusedEq =
      try { cat.deleteWhereEq("scratch", "cust_v1", "k", eqKeys); false }
      catch { case e: IllegalStateException => e.getMessage.contains("format-version") }
    val refusalCommitted = cat.headVersion("scratch", "cust_v1") != vAfterCow
    // metadata-only upgrade, then the same verbs succeed
    val (fmtBefore, fmtAfter) = cat.upgradeFormat("scratch", "cust_v1")
    val nDv = cat.deleteWhereMor("scratch", "cust_v1", col("k") % 10 === 3)
    val nEq = cat.deleteWhereEq("scratch", "cust_v1", "k", eqKeys)
    val metaCount = cat.countStar("scratch", "cust_v1")
    cat.load("scratch", "cust_v1")
      .agg(count(lit(1)).as("rows_total"), Tables.dsum(col("bal")).as("sum_bal"))
      .select(lit(fmtBefore).as("fmt_before"), lit(fmtAfter).as("fmt_after"),
        lit(refusedMor && !refusalCommitted).as("refused_mor"),
        lit(refusedEq && !refusalCommitted).as("refused_eq"),
        lit(nCow).as("n_cow_deleted"), lit(nDv).as("n_dv_deleted"),
        lit(nEq).as("n_eq_matched"),
        col("rows_total"), col("sum_bal"),
        lit(metaCount.getOrElse(-1L)).as("meta_count"))
  }

  val cV2UpgradeSql: String =
    """WITH c AS (SELECT c_custkey AS k, c_acctbal AS bal FROM customer
      |           WHERE c_custkey % 2 = 1),
      |a1 AS (SELECT * FROM c WHERE k % 30 <> 9),
      |fin AS (SELECT * FROM a1 WHERE k % 10 <> 3 AND k % 25 <> 21)
      |SELECT
      |  CAST(1 AS INT) AS fmt_before, CAST(2 AS INT) AS fmt_after,
      |  true AS refused_mor, true AS refused_eq,
      |  (SELECT COUNT(*) FROM c WHERE k % 30 = 9) AS n_cow_deleted,
      |  (SELECT COUNT(*) FROM a1 WHERE k % 10 = 3) AS n_dv_deleted,
      |  (SELECT COUNT(*) FROM a1 WHERE k % 25 = 21 AND k % 10 <> 3)
      |    AS n_eq_matched,
      |  (SELECT COUNT(*) FROM fin) AS rows_total,
      |  (SELECT CAST(SUM(CAST(bal AS DECIMAL(30,6))) AS DOUBLE) FROM fin)
      |    AS sum_bal,
      |  (SELECT COUNT(*) FROM fin) AS meta_count""".stripMargin

  /** Mergeable per-file NDV sketches ([[LakeCatalog.recordNdvSketch]] /
    * [[LakeCatalog.ndvSketchMerged]] — Iceberg Puffin theta stats as
    * k-minimum-values over the portable polyhash): the sketch action scans
    * ONLY files without a recorded sketch (n_scan_incr pins that the second
    * pass reads exactly the one new file), the table-level estimate answers
    * METADATA-ONLY by merging live files' 64-value sketches (k smallest of
    * the union of k-smallest sets ≡ k smallest of the union — the KMV merge
    * identity, proven in-row against a direct whole-data sketch), and the
    * estimate (k−1)·M/h_k replays in DuckDB from the same hash values
    * (the k-th minimum is an exact integer; the estimate is three
    * exactly-rounded IEEE ops on it). The under-k exact arm is mirrored
    * in both engines; per-file sketches exercise it wherever a file holds
    * fewer than k distinct values (the v0 empty file always does). */
  def cStatsNdv(spark: SparkSession, dir: String): DataFrame = {
    val cat = new LakeCatalog(spark, scratch)
    // NULL names excluded at the source (mirrored in the oracle's c CTE):
    // NDV ≡ count(DISTINCT) excludes NULLs in both engines, and Spark's
    // .distinct().count() exact arms would otherwise count a NULL row
    // DuckDB's COUNT(DISTINCT) ignores — vacuous on this data,
    // load-bearing the day c_name gains NULLs
    val cust = Tables.table(spark, dir, "customer")
      .where(col("c_name").isNotNull)
      .select(col("c_custkey").cast("long").as("k"), col("c_name").as("name"))
    cat.dropTable("scratch", "cust_ndv")
    cat.createTable("scratch", "cust_ndv", StructType(Seq(
      StructField("k", LongType), StructField("name", StringType))))
    cat.append("scratch", "cust_ndv",
      cust.where(col("k") % 3 < 2).repartition(2))
    val scan1 = cat.recordNdvSketch("scratch", "cust_ndv", "name")
    val (n1, h1, _, _) = cat.ndvSketchMerged("scratch", "cust_ndv", "name")
    cat.append("scratch", "cust_ndv",
      cust.where(col("k") % 3 === 2).repartition(1))
    val scan2 = cat.recordNdvSketch("scratch", "cust_ndv", "name")
    val (n2, h2, covered, live) = cat.ndvSketchMerged("scratch", "cust_ndv", "name")
    // direct whole-data sketch: the KMV merge identity check. NULLs
    // excluded up front like recordNdvSketch (NDV ≡ count(DISTINCT): a NULL
    // hash would rank nulls-first and NPE the getLong — vacuous on this
    // data, load-bearing the day c_name gains NULLs)
    val direct = cat.load("scratch", "cust_ndv")
      .where(col("name").isNotNull)
      .select(graft.functions.Poly.stringHash(col("name")).as("h"))
      .distinct().orderBy("h").limit(64)
      .collect().map(_.getLong(0)).toSeq
    val mergeExact = n2 == direct.size.toLong &&
      (n2 < 64 || h2 == direct.last)
    def est(n: Long, hk: Long) =
      if (n < 64) round(lit(n).cast("double"), 4)
      else round(lit(63).cast("double") * lit(M).cast("double") /
        lit(hk).cast("double"), 4)
    val exact1 = cust.where(col("k") % 3 < 2).select("name").distinct().count()
    val exactAll = cust.select("name").distinct().count()
    spark.range(1).select(
      lit(scan1).as("n_scan_initial"), lit(scan2).as("n_scan_incr"),
      lit(covered == live).as("all_covered"),
      lit(n1).as("n_kept1"), lit(h1).as("theta1"),
      est(n1, h1).as("ndv_est1"), lit(exact1).as("exact1"),
      lit(n2).as("n_kept2"), lit(h2).as("theta2"),
      est(n2, h2).as("ndv_est2"), lit(exactAll).as("exact2"),
      lit(mergeExact).as("merge_exact"))
  }

  val cStatsNdvSql: String = {
    def sketch(tag: String, where: String): String =
      s"""h$tag AS (SELECT DISTINCT ${Dedup.polySql("name")} AS h
         |  FROM c $where),
         |r$tag AS (SELECT h, row_number() OVER (ORDER BY h) AS r FROM h$tag),
         |s$tag AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, MAX(h) AS theta
         |          FROM r$tag WHERE r <= 64)""".stripMargin
    def estSel(tag: String): String =
      s"""(SELECT round(CASE WHEN n < 64 THEN CAST(n AS DOUBLE)
         |  ELSE CAST(63 AS DOUBLE) * CAST($M AS DOUBLE) / CAST(theta AS DOUBLE)
         |  END, 4) FROM s$tag)""".stripMargin
    s"""WITH c AS (SELECT c_custkey AS k, c_name AS name FROM customer
       |           WHERE c_name IS NOT NULL),
       |${sketch("1", "WHERE k % 3 < 2")},
       |${sketch("2", "")}
       |SELECT
       |  CAST(3 AS INT) AS n_scan_initial, CAST(1 AS INT) AS n_scan_incr,
       |  true AS all_covered,
       |  (SELECT n FROM s1) AS n_kept1,
       |  (SELECT CASE WHEN n = 64 THEN theta ELSE -1 END FROM s1) AS theta1,
       |  ${estSel("1")} AS ndv_est1,
       |  (SELECT COUNT(DISTINCT name) FROM c WHERE k % 3 < 2) AS exact1,
       |  (SELECT n FROM s2) AS n_kept2,
       |  (SELECT CASE WHEN n = 64 THEN theta ELSE -1 END FROM s2) AS theta2,
       |  ${estSel("2")} AS ndv_est2,
       |  (SELECT COUNT(DISTINCT name) FROM c) AS exact2,
       |  true AS merge_exact""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c_v2_upgrade" -> (cV2Upgrade _),
    "c_stats_ndv" -> (cStatsNdv _))

  val oracles: Map[String, String] = Map(
    "c_v2_upgrade" -> cV2UpgradeSql,
    "c_stats_ndv" -> cStatsNdvSql)
}
