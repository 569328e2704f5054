package graft.ops

import graft.Tables
import graft.catalog.LakeCatalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.1 continued (round 5): snapshot rollback — the "undo the bad ingest"
  * verb (Iceberg `rollback_to_snapshot`; the reference's pyiceberg catalog
  * carries the same snapshot lineage this rides on,
  * IcebergConnection.py:41-77). Rollback is the operational complement of
  * time travel: time travel READS an old version, rollback makes an old
  * version CURRENT again — and at 100 TB it must cost zero data movement,
  * which the refs design delivers (one atomic sidecar write; the bad
  * snapshot's files simply stop being referenced by main and age out via
  * expire + orphan sweep).
  */
object CatalogOps5 {

  private def scratch: String =
    s"${System.getProperty("java.io.tmpdir")}/graft_warehouse"

  /** Rollback lineage proof, on a 4-commit table:
    *   v1 append A (o_orderkey % 4 = 0)
    *   v2 append B (% 4 = 1)
    *   v3 append BAD (% 4 = 2)      ← the ingest to undo
    *   rollback main → v2            (pure metadata)
    *   v4 append D (% 4 = 3)         (bases on v2's files, NOT v3's)
    * Emits the final row/sum state (A∪B∪D — provably no BAD rows), plus the
    * BAD snapshot's row count via time travel (history survives rollback:
    * the log is append-only, audits still read v3). `no_bad_rows` is
    * computed IN-PLAN from the final table, so the oracle's literal `true`
    * hash-gates the isolation property itself. */
  def cRollback(spark: SparkSession, dir: String): DataFrame = {
    val cat = new LakeCatalog(spark, scratch)
    val o = Tables.table(spark, dir, "orders")
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("p"))
    cat.dropTable("scratch", "ord_rb")
    cat.createTable("scratch", "ord_rb", StructType(Seq(
      StructField("k", LongType), StructField("p", DoubleType))))
    cat.append("scratch", "ord_rb", o.where(col("k") % 4 === 0)) // v1
    cat.append("scratch", "ord_rb", o.where(col("k") % 4 === 1)) // v2
    cat.append("scratch", "ord_rb", o.where(col("k") % 4 === 2)) // v3: bad
    cat.rollbackTo("scratch", "ord_rb", 2)
    cat.append("scratch", "ord_rb", o.where(col("k") % 4 === 3)) // v4
    val fin = cat.load("scratch", "ord_rb")
    val atBad = cat.loadSnapshot("scratch", "ord_rb", 3)
    fin.agg(
      count(lit(1)).as("n_final"),
      sum(col("k")).cast("long").as("k_sum"),
      (count(when(col("k") % 4 === 2, 1)) === 0).as("no_bad_rows"))
      .crossJoin(broadcast(atBad.agg(count(lit(1)).as("n_at_bad"))))
      .select(col("n_final"), col("k_sum"), col("n_at_bad"), col("no_bad_rows"))
  }

  val cRollbackSql: String =
    """SELECT
      |  (SELECT COUNT(*) FROM orders WHERE o_orderkey % 4 IN (0, 1, 3)) AS n_final,
      |  (SELECT CAST(SUM(o_orderkey) AS BIGINT) FROM orders
      |     WHERE o_orderkey % 4 IN (0, 1, 3)) AS k_sum,
      |  (SELECT COUNT(*) FROM orders WHERE o_orderkey % 4 IN (0, 1, 2)) AS n_at_bad,
      |  true AS no_bad_rows""".stripMargin

  /** Partition-spec evolution (Iceberg partition evolution): the table
    * starts UNPARTITIONED (even doc_ids committed as flat files), then the
    * spec evolves to partition-by-source and the odd doc_ids land under
    * `_p=<source>/` paths — old files are NEVER rewritten. A query for one
    * source then shows the documented Iceberg asymmetry, proven here at the
    * file-list level: every new-spec file for a DIFFERENT source is pruned
    * by pure metadata (path match — zero IO), while pre-evolution files
    * remain must-scan and are filtered row-wise. At 100 TB this is why
    * evolving a spec is free (no rewrite) but only NEW data gets the
    * pruning benefit — background compaction is what migrates history.
    * Correctness columns recompute from source; the prune booleans are
    * computed from the catalog's file-list split. */
  def cPartitionEvolution(spark: SparkSession, dir: String): DataFrame = {
    val cat = new LakeCatalog(spark, scratch)
    val d = Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    cat.dropTable("scratch", "docs_pe")
    cat.createTable("scratch", "docs_pe", StructType(Seq(
      StructField("doc_id", LongType), StructField("source", StringType),
      StructField("n_chars", LongType))))
    cat.append("scratch", "docs_pe", d.where(col("doc_id") % 2 === 0))
    cat.appendEvolved("scratch", "docs_pe", d.where(col("doc_id") % 2 === 1), "source")
    val (mustScan, kept) = cat.partitionFiles("scratch", "docs_pe", "src3")
    cat.loadPartition("scratch", "docs_pe", "src3")
      .where(col("source") === "src3")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("doc_id")).cast("long").as("id_sum"),
        sum(col("n_chars")).cast("long").as("chars_sum"))
      .select(col("n_rows"), col("id_sum"), col("chars_sum"),
        lit(mustScan.nonEmpty).as("old_spec_must_scan"),
        lit(kept.nonEmpty).as("new_spec_pruned_in"),
        lit(mustScan.size + kept.size <
          cat.snapshots("scratch", "docs_pe").last._2.size).as("files_pruned"))
  }

  val cPartitionEvolutionSql: String =
    """SELECT COUNT(*) AS n_rows,
      |  CAST(SUM(doc_id) AS BIGINT) AS id_sum,
      |  CAST(SUM(n_chars) AS BIGINT) AS chars_sum,
      |  true AS old_spec_must_scan,
      |  true AS new_spec_pruned_in,
      |  true AS files_pruned
      |FROM documents WHERE source = 'src3'""".stripMargin

  /** Optimistic-concurrency commit validation (the Iceberg commit
    * protocol): writer A plans a COW delete against snapshot v1; writer B's
    * append lands first; A's commit MUST fail — published blindly, A's
    * rewrite (computed from v1's file list) would silently erase B's rows,
    * the lost-update anomaly. A then retries against the new head and both
    * writers' effects compose. The failed commit's staged files are left
    * unreferenced and the orphan sweep reclaims them — the full Iceberg
    * failure lifecycle (CommitFailedException → retry; debris →
    * remove_orphan_files), at metadata cost only: validation is ONE head
    * comparison regardless of table size. */
  def cWriteConflict(spark: SparkSession, dir: String): DataFrame = {
    val cat = new LakeCatalog(spark, scratch)
    val o = Tables.table(spark, dir, "orders")
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("p"))
    cat.dropTable("scratch", "ord_cc")
    cat.createTable("scratch", "ord_cc", StructType(Seq(
      StructField("k", LongType), StructField("p", DoubleType))))
    cat.append("scratch", "ord_cc", o.where(col("k") <= 100))          // v1
    val base = cat.headVersion("scratch", "ord_cc")
    cat.append("scratch", "ord_cc", o.where(col("k").between(101, 120))) // v2: writer B wins
    val conflictDetected =
      try { cat.deleteWhereAt("scratch", "ord_cc", col("k") % 2 === 0, base); false }
      catch { case _: graft.catalog.CommitConflictException => true }
    // retry against the current head — the caller's recompute-and-retry loop
    cat.deleteWhere("scratch", "ord_cc", col("k") % 2 === 0)             // v3
    val orphansSwept = cat.removeOrphans("scratch", "ord_cc").nonEmpty
    cat.load("scratch", "ord_cc")
      .agg(count(lit(1)).as("n_final"),
        sum(col("k")).cast("long").as("k_sum"),
        (count(when(col("k").between(101, 120), 1)) === 10).as("b_rows_survived"))
      .select(col("n_final"), col("k_sum"),
        lit(conflictDetected).as("conflict_detected"),
        col("b_rows_survived"),
        lit(orphansSwept).as("orphans_swept"))
  }

  val cWriteConflictSql: String =
    """SELECT
      |  (SELECT COUNT(*) FROM orders WHERE o_orderkey <= 120 AND o_orderkey % 2 = 1) AS n_final,
      |  (SELECT CAST(SUM(o_orderkey) AS BIGINT) FROM orders
      |     WHERE o_orderkey <= 120 AND o_orderkey % 2 = 1) AS k_sum,
      |  true AS conflict_detected,
      |  true AS b_rows_survived,
      |  true AS orphans_swept""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c_rollback" -> (cRollback _),
    "c_partition_evolution" -> (cPartitionEvolution _),
    "c_write_conflict" -> (cWriteConflict _))

  val oracles: Map[String, String] = Map(
    "c_rollback" -> cRollbackSql,
    "c_partition_evolution" -> cPartitionEvolutionSql,
    "c_write_conflict" -> cWriteConflictSql)
}
