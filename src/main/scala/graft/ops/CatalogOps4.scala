package graft.ops

import graft.Tables
import graft.catalog.LakeCatalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** §2.1 continued (round 5): three more table-management capabilities a
  * production lake runs daily — write-audit-publish branches, ANALYZE column
  * statistics, and orphan-file cleanup. All three are Iceberg-surface
  * analogs (SnapshotRef branches / puffin stats / remove_orphan_files) the
  * reference's pyiceberg stack exposes, re-expressed over
  * [[graft.catalog.LakeCatalog]]'s snapshot log (reference catalog surface:
  * IcebergConnection.py:41-77; the snapshot machinery is what
  * `table.append` commits ride on, IcebergConnection.py:180-183).
  */
object CatalogOps4 {

  private def scratch: String =
    s"${System.getProperty("java.io.tmpdir")}/graft_warehouse"

  /** Write-audit-publish: stage an append on a branch, prove main readers
    * never see it (isolation), audit the staged snapshot, fast-forward main
    * when it passes. The publish is an atomic refs-file swap — zero data
    * movement, because the staged files have been in their final location
    * since the branch commit (the property that makes WAP free at 100 TB:
    * auditing a 10 TB ingest then publishing costs one metadata write).
    * Counts derive from lineitem so the oracle recomputes them from source. */
  def cWapBranch(spark: SparkSession, dir: String): DataFrame = {
    val cat = new LakeCatalog(spark, scratch)
    val li = Tables.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"))
    cat.dropTable("scratch", "li_wap")
    cat.createTable("scratch", "li_wap", StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_extendedprice", DoubleType))))
    cat.append("scratch", "li_wap", li.where(col("l_orderkey") % 4 === 0))
    val mainBefore = cat.load("scratch", "li_wap").count()
    // stage the next ingest on a branch: committed, durable, invisible
    cat.appendToBranch("scratch", "li_wap",
      li.where(col("l_orderkey") % 4 === 1), "audit")
    val isolated = cat.load("scratch", "li_wap").count() == mainBefore
    // the audit step: validate the STAGED view (here: staged rows exist and
    // carry no nulls — the gate a real WAP pipeline runs before publish)
    val staged = cat.loadBranch("scratch", "li_wap", "audit")
    val stagedRows = staged.count()
    val auditPass = stagedRows > mainBefore &&
      staged.where(col("l_orderkey").isNull).isEmpty
    if (auditPass) cat.fastForward("scratch", "li_wap", "audit")
    cat.load("scratch", "li_wap").agg(
      count(lit(1)).as("rows_main_after"),
      Tables.dsum(col("l_extendedprice")).as("total_after"),
      lit(mainBefore).as("rows_main_before"),
      lit(stagedRows).as("rows_branch_staged"),
      lit(isolated && auditPass).as("wap_clean"))
  }

  val cWapBranchSql: String =
    """WITH b AS (SELECT COUNT(*) AS n FROM lineitem WHERE l_orderkey % 4 = 0),
      |s AS (SELECT COUNT(*) AS n FROM lineitem WHERE l_orderkey % 4 = 1)
      |SELECT CAST(b.n + s.n AS BIGINT) AS rows_main_after,
      |  (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
      |     FROM lineitem WHERE l_orderkey % 4 IN (0, 1)) AS total_after,
      |  CAST(b.n AS BIGINT) AS rows_main_before,
      |  CAST(b.n + s.n AS BIGINT) AS rows_branch_staged,
      |  true AS wap_clean
      |FROM b, s""".stripMargin

  /** ANALYZE TABLE + SHOW STATS: one distributed aggregate pass computes
    * per-column (n_rows, n_nulls, ndv, min, max) into a metadata sidecar;
    * SHOW STATS then answers from metadata alone — the inputs a cost-based
    * planner needs for join ordering and broadcast decisions (Iceberg
    * puffin-file analog). Nulls are planted deterministically so the null
    * accounting is non-trivial; min/max columns are integral/decimal typed
    * (string-rendered identically by both engines — §4 double-render rule). */
  def cStatsAnalyze(spark: SparkSession, dir: String): DataFrame = {
    val cat = new LakeCatalog(spark, scratch)
    val src = Tables.table(spark, dir, "orders").select(
      col("o_orderkey"), col("o_custkey"),
      when(col("o_orderkey") % 10 === 0, lit(null))
        .otherwise(col("o_totalprice")).cast(DecimalType(12, 2)).as("price_n"))
    cat.dropTable("scratch", "ord_stats")
    cat.createTable("scratch", "ord_stats", StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("price_n", DecimalType(12, 2)))))
    cat.append("scratch", "ord_stats", src)
    cat.analyzeTable("scratch", "ord_stats",
      Seq("o_orderkey", "o_custkey", "price_n"))
    cat.showStats("scratch", "ord_stats").orderBy("column")
  }

  val cStatsAnalyzeSql: String =
    """WITH t AS (
      |  SELECT o_orderkey, o_custkey,
      |    CAST(CASE WHEN o_orderkey % 10 = 0 THEN NULL ELSE o_totalprice END
      |      AS DECIMAL(12,2)) AS price_n
      |  FROM orders)
      |SELECT 'o_custkey' AS "column", COUNT(*) AS n_rows,
      |  CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
      |  COUNT(DISTINCT o_custkey) AS ndv,
      |  CAST(MIN(o_custkey) AS VARCHAR) AS min_v,
      |  CAST(MAX(o_custkey) AS VARCHAR) AS max_v FROM t
      |UNION ALL
      |SELECT 'o_orderkey', COUNT(*),
      |  CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  COUNT(DISTINCT o_orderkey),
      |  CAST(MIN(o_orderkey) AS VARCHAR), CAST(MAX(o_orderkey) AS VARCHAR) FROM t
      |UNION ALL
      |SELECT 'price_n', COUNT(*),
      |  CAST(SUM(CASE WHEN price_n IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  COUNT(DISTINCT price_n),
      |  CAST(MIN(price_n) AS VARCHAR), CAST(MAX(price_n) AS VARCHAR) FROM t
      |ORDER BY "column"""".stripMargin

  /** Orphan-file detection and cleanup: a crashed write leaves data files in
    * the table directory that no snapshot references (tasks wrote; the
    * commit never happened). The sweep is pure metadata set-difference —
    * directory listing minus the union of every snapshot's file list — so
    * at 100 TB it costs one listing, never a data scan, and files referenced
    * by ANY snapshot or branch are untouchable by construction. The query
    * plants a fake failed-write file, proves reads never saw it, sweeps it,
    * and proves the table (rows + files) intact. */
  def cOrphanFiles(spark: SparkSession, dir: String): DataFrame = {
    val cat = new LakeCatalog(spark, scratch)
    val o = Tables.table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    cat.dropTable("scratch", "ord_orphan")
    cat.createTable("scratch", "ord_orphan", StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_totalprice", DoubleType))))
    cat.append("scratch", "ord_orphan", o.where(col("o_orderkey") % 2 === 0))
    cat.append("scratch", "ord_orphan", o.where(col("o_orderkey") % 2 === 1))
    // simulate the failed write: a data file lands in the directory with no
    // commit (byte-copy of a live file under an uncommitted name)
    val tdir = java.nio.file.Paths.get(s"$scratch/scratch/ord_orphan")
    val live = java.nio.file.Files.list(tdir).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSeq.sorted
    java.nio.file.Files.copy(tdir.resolve(live.head),
      tdir.resolve("part-failed-write-orphan.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val rowsWithOrphan = cat.load("scratch", "ord_orphan").count() // snapshot isolation
    val found = cat.orphanFiles("scratch", "ord_orphan")
    val removed = cat.removeOrphans("scratch", "ord_orphan")
    val cleanAfter = cat.orphanFiles("scratch", "ord_orphan").isEmpty
    cat.load("scratch", "ord_orphan").agg(
      count(lit(1)).as("n_rows"),
      Tables.dsum(col("o_totalprice")).as("total"),
      lit(rowsWithOrphan).as("n_rows_with_orphan_present"),
      lit(found.size.toLong).as("orphans_found"),
      lit(removed == found && cleanAfter).as("sweep_clean"))
  }

  val cOrphanFilesSql: String =
    """SELECT COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total,
      |  COUNT(*) AS n_rows_with_orphan_present,
      |  CAST(1 AS BIGINT) AS orphans_found,
      |  true AS sweep_clean
      |FROM orders""".stripMargin

  /** Incremental append scan (Iceberg incremental read): a consumer that
    * has processed up to snapshot v reads ONLY the files later snapshots
    * added — exactly-once batch consumption of an append-only table without
    * ever rescanning it. Three appends land as snapshots 0/1/2; the
    * consumer remembers v=0 and incrementally reads (0 → 2]. The file set
    * comes from a metadata set-difference (cost ∝ increment, not table);
    * the oracle recomputes the same rows from source predicates. The
    * full-scan total is emitted alongside to prove the increment + baseline
    * partition the table. */
  def cIncrementalRead(spark: SparkSession, dir: String): DataFrame = {
    val cat = new LakeCatalog(spark, scratch)
    val o = Tables.table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    cat.dropTable("scratch", "ord_inc")
    cat.createTable("scratch", "ord_inc", StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_totalprice", DoubleType))))
    cat.append("scratch", "ord_inc", o.where(col("o_orderkey") % 3 === 0)) // v1 (v0 = create)
    cat.append("scratch", "ord_inc", o.where(col("o_orderkey") % 3 === 1)) // v2
    cat.append("scratch", "ord_inc", o.where(col("o_orderkey") % 3 === 2)) // v3
    val inc = cat.loadIncremental("scratch", "ord_inc", 1, 3)
    val full = cat.load("scratch", "ord_inc")
      .agg(count(lit(1)).as("full_rows")).select(col("full_rows"))
    inc.agg(
      count(lit(1)).as("inc_rows"),
      Tables.dsum(col("o_totalprice")).as("inc_total"),
      min(col("o_orderkey")).as("inc_min_key"))
      .crossJoin(broadcast(full))
  }

  val cIncrementalReadSql: String =
    """SELECT
      |  (SELECT COUNT(*) FROM orders WHERE o_orderkey % 3 IN (1, 2)) AS inc_rows,
      |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
      |     FROM orders WHERE o_orderkey % 3 IN (1, 2)) AS inc_total,
      |  (SELECT MIN(o_orderkey) FROM orders WHERE o_orderkey % 3 IN (1, 2)) AS inc_min_key,
      |  (SELECT COUNT(*) FROM orders) AS full_rows""".stripMargin

  /** Merge-on-read DELETE via deletion vectors (Iceberg v3 DVs): marking
    * row positions instead of rewriting files. The query proves the whole
    * contract in one pass: (a) the MOR delete rewrote NOTHING — the file
    * list is byte-identical before and after (the property that makes a
    * sparse delete on a 100 TB table a metadata-sized commit); (b) readers
    * subtract the marked rows exactly; (c) time travel to the pre-delete
    * snapshot still sees every row (DVs are version-keyed); (d) the
    * metadata-only COUNT(*) stays DV-correct without a scan; (e) compact()
    * MATERIALIZES the deletes — rewritten files simply lack the rows and
    * the vectors go inert. Counts derive from orders so the oracle
    * recomputes everything from source predicates. */
  def cMorDelete(spark: SparkSession, dir: String): DataFrame = {
    val cat = new LakeCatalog(spark, scratch)
    val o = Tables.table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    cat.dropTable("scratch", "ord_mor")
    cat.createTable("scratch", "ord_mor", StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_totalprice", DoubleType))))
    cat.append("scratch", "ord_mor", o.repartition(4)) // v1, 4 files
    val filesBefore = cat.filesMeta("scratch", "ord_mor").count()
    val fullRows = cat.load("scratch", "ord_mor").count()
    val marked = cat.deleteWhereMor("scratch", "ord_mor",
      col("o_orderkey") % 7 === 3) // v2: DV-only commit
    val filesAfter = cat.filesMeta("scratch", "ord_mor").count()
    val metaCount = cat.countStar("scratch", "ord_mor")
    val travelRows = cat.loadSnapshot("scratch", "ord_mor", 1).count()
    cat.compact("scratch", "ord_mor", 2) // v3: deletes materialized
    val dfAfter = cat.load("scratch", "ord_mor")
    dfAfter.agg(
      count(lit(1)).as("rows_after_compact"),
      Tables.dsum(col("o_totalprice")).as("total_after"),
      lit(marked).as("rows_marked"),
      lit(filesBefore == filesAfter && travelRows == fullRows
        && metaCount.contains(fullRows - marked)).as("mor_contract_held"))
  }

  val cMorDeleteSql: String =
    """SELECT
      |  (SELECT COUNT(*) FROM orders WHERE o_orderkey % 7 <> 3) AS rows_after_compact,
      |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
      |     FROM orders WHERE o_orderkey % 7 <> 3) AS total_after,
      |  (SELECT COUNT(*) FROM orders WHERE o_orderkey % 7 = 3) AS rows_marked,
      |  true AS mor_contract_held""".stripMargin

  /** Incremental materialized-view maintenance — the composition the
    * round-5 primitives exist for: a pre-aggregated rollup is kept current
    * by merging the PARTIAL AGGREGATE STATES of each append increment,
    * never recomputing from the full table. The algebra: sum and count are
    * mergeable states (merge = add), so
    * `MV(v2) = mergeStates(MV(v1), agg(increment(v1 → v2)))` — the
    * count/sum/avg maintenance rule every warehouse MV engine implements.
    * At 100 TB: refresh cost ∝ increment (loadIncremental's file
    * set-difference), merge cost ∝ |MV| (group-key cardinality, not
    * table size). avg is NOT merged as avg — it derives from the merged
    * (sum, count) states, the classic non-distributive-aggregate rule.
    * The query proves merged-MV ≡ full recompute inside the plan and the
    * oracle recomputes the final rollup from source.
    *
    * Scope: append-only maintenance (loadIncremental's contract). A COW
    * rewrite or MOR delete in the refresh window invalidates pure
    * state-addition — production engines either retract via the CDC feed
    * (applyCdc is the hook here) or fall back to recompute; callers must
    * pick one, never silently merge across a delete. */
  def cIncrementalMv(spark: SparkSession, dir: String): DataFrame = {
    val cat = new LakeCatalog(spark, scratch)
    val o = Tables.table(spark, dir, "orders")
      .select(col("o_custkey") % 100, col("o_totalprice"))
      .toDF("cust_bucket", "price")
    cat.dropTable("scratch", "ord_mv_src")
    cat.createTable("scratch", "ord_mv_src", StructType(Seq(
      StructField("cust_bucket", LongType), StructField("price", DoubleType))))
    def aggOf(df: DataFrame): DataFrame = df.groupBy("cust_bucket")
      .agg(count(lit(1)).as("n"),
        sum(col("price").cast("decimal(30,6)")).as("sum_state"))
    cat.append("scratch", "ord_mv_src", o.where(col("cust_bucket") % 2 === 0)) // v1
    val mv1 = aggOf(cat.load("scratch", "ord_mv_src"))                          // MV at v1
    cat.append("scratch", "ord_mv_src", o.where(col("cust_bucket") % 2 === 1)) // v2
    val incAgg = aggOf(cat.loadIncremental("scratch", "ord_mv_src", 1, 2))
    // state merge: add counts, add decimal sums — group keys union
    val mv2 = mv1.unionByName(incAgg).groupBy("cust_bucket")
      .agg(sum(col("n")).cast("long").as("n"),
        sum(col("sum_state")).as("sum_state"))
    val full = aggOf(cat.load("scratch", "ord_mv_src"))
      .select(col("cust_bucket"), col("n").as("n_full"),
        col("sum_state").as("sum_full"))
    mv2.join(full, Seq("cust_bucket"))
      .select(col("cust_bucket"), col("n"),
        col("sum_state").cast("double").as("total"),
        round(col("sum_state").cast("double") / col("n"), 6).as("avg_price"),
        (col("n") === col("n_full")
          && col("sum_state") === col("sum_full")).as("matches_full_recompute"))
      .orderBy("cust_bucket")
  }

  val cIncrementalMvSql: String =
    """SELECT o_custkey % 100 AS cust_bucket, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total,
      |  round(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
      |  true AS matches_full_recompute
      |FROM orders GROUP BY 1 ORDER BY cust_bucket""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c_incremental_mv" -> (cIncrementalMv _),
    "c_wap_branch" -> (cWapBranch _),
    "c_stats_analyze" -> (cStatsAnalyze _),
    "c_orphan_files" -> (cOrphanFiles _),
    "c_incremental_read" -> (cIncrementalRead _),
    "c_mor_delete" -> (cMorDelete _))

  val oracles: Map[String, String] = Map(
    "c_wap_branch" -> cWapBranchSql,
    "c_stats_analyze" -> cStatsAnalyzeSql,
    "c_orphan_files" -> cOrphanFilesSql,
    "c_incremental_read" -> cIncrementalReadSql,
    "c_mor_delete" -> cMorDeleteSql,
    "c_incremental_mv" -> cIncrementalMvSql)
}
