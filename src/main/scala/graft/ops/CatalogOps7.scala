package graft.ops

import graft.Tables
import graft.catalog.LakeCatalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.1 round-7b: multi-dimensional clustering — the Iceberg
  * `rewrite_data_files(strategy => 'sort', sort_order => 'zorder(...)')`
  * analog the catalog was still missing. One linear sort order serves ONE
  * access path; a fact table queried by both user and time (the classic
  * pair) needs a space-filling-curve layout so conjunctive range predicates
  * prune files on every dimension at once.
  *
  * Reference capability anchor: the reference's scan delegates all layout to
  * pyiceberg's file listing (IcebergConnection.py:99-131) — it has no
  * clustering verb at all; this is the 100 TB-side completion of that
  * surface, same family as c_zone_skip (r4) and c_hidden_partition (r7).
  */
object CatalogOps7 {

  private def scratch: String =
    s"${System.getProperty("java.io.tmpdir")}/graft_warehouse"

  /** Z-order clustering + 2-D zone-map pruning, proven against the linear
    * layout it replaces. Events (user_id, ts µs — both uniform, the
    * user×time pair every activity table is queried on) are written twice
    * with identical content: once z-ordered ([[LakeCatalog.appendZOrdered]]
    * — Morton-interleaved 16-bit codes, range-partitioned into 32 files),
    * once linearly clustered on user_id alone
    * ([[LakeCatalog.appendClustered]], same file count). Three
    * metadata-only prune probes tell the story:
    *
    *  - a range predicate on TIME alone reads >3/4 of the linear files
    *    (`linear_time_blind` — the second dimension is invisible to a
    *    user_id sort: every user band spans ~the full time range; expected
    *    ~32/32, threshold 3/4 absorbs small-file sampling noise at
    *    sf0.001) but prunes the z-ordered table below half
    *    (`zorder_time_prunes`). The probe slab is the [3/8, 4/8) eighth of
    *    the time range — ONE of the layout's 8 time strips (ts holds 3 of
    *    the top-5 curve bits), so the ideal read is 4/32 files and even
    *    with range-partition sampling bleed (file boundaries land a little
    *    off the exact curve marks, so curve-adjacent files leak into
    *    neighbouring strips) it stays ~8-12 of 32. A quarter-wide slab
    *    would span TWO strips and sit knife-edge at ~16/32 — observed
    *    flipping 15↔16 across runs at sf0.1 — so the probe is deliberately
    *    aligned to the layout's actual time resolution;
    *  - the 2-D box (central user quarter × the same time eighth, bounds
    *    derived from global min/max by integer arithmetic so the recipe is
    *    scale-free AND representation-exact) prunes the z-ordered table
    *    below half its files (`zorder_box_prunes`, expected ~2-8 of 32).
    *
    * The box aggregates (n / decimal sum of value / distinct users) are
    * computed from the PRUNED z-ordered scan plus the row predicate —
    * pruning soundness is therefore hash-gated against the oracle's
    * full-table scan, not just asserted. Driver-side data: one 4-scalar
    * min/max aggregate (the same model-scale exchange appendZOrdered itself
    * performs). At 100 TB the recipe is unchanged — curve codes come from
    * table-level bounds, the layout from one range partitioning, the prune
    * from manifest metadata only, and file count scales with data under
    * maxRecordsPerFile without touching the geometry argument (finer splits
    * only shrink each rectangle). */
  /** Build both layouts (z-ordered + linear, 32 files each) in the scratch
    * catalog and derive the probe-box bounds (central user quarter × one
    * time eighth) from global min/max by pure long arithmetic, so Spark and
    * DuckDB derive bit-identical bounds. ONE definition shared by the op,
    * Round7cSpec's margin guard, and the ZProbe tool — the probed geometry
    * can never drift between them (the 15↔16/32 knife-edge fix had to edit
    * the slab bound in several copies at once; this removes the copies). */
  private[graft] def zorderLayoutAndBounds(spark: SparkSession, dir: String)
      : (LakeCatalog, Long, Long, Long, Long) = {
    val cat = new LakeCatalog(spark, scratch)
    val src = Tables.table(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("value"),
        expr("ts div 1000").as("ts_us"))
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("value", DoubleType), StructField("ts_us", LongType)))
    cat.dropTable("scratch", "ev_zorder")
    cat.createTable("scratch", "ev_zorder", schema)
    cat.appendZOrdered("scratch", "ev_zorder", src, "user_id", "ts_us", 32)
    cat.dropTable("scratch", "ev_linear")
    cat.createTable("scratch", "ev_linear", schema)
    cat.appendClustered("scratch", "ev_linear", src, Seq("user_id"), 32)
    val r = src.agg(min("user_id"), max("user_id"), min("ts_us"), max("ts_us")).head()
    val (umn, umx) = (r.getLong(0), r.getLong(1))
    val (tmn, tmx) = (r.getLong(2), r.getLong(3))
    (cat,
      umn + (umx - umn) * 3 / 8, umn + (umx - umn) * 5 / 8,
      tmn + (tmx - tmn) * 3 / 8, tmn + (tmx - tmn) * 4 / 8)
  }

  def cZorder(spark: SparkSession, dir: String): DataFrame = {
    val (cat, uLo, uHi, tLo, tHi) = zorderLayoutAndBounds(spark, dir)
    val timeSlab = Seq(("ts_us", tLo.toDouble, tHi.toDouble))
    val box = Seq(("user_id", uLo.toDouble, uHi.toDouble),
      ("ts_us", tLo.toDouble, tHi.toDouble))
    val (linSlabRead, linSlabSkip) = cat.pruneFilesBox("scratch", "ev_linear", timeSlab)
    val (zSlabRead, zSlabSkip) = cat.pruneFilesBox("scratch", "ev_zorder", timeSlab)
    val (zBoxRead, zBoxSkip) = cat.pruneFilesBox("scratch", "ev_zorder", box)
    val linTotal = linSlabRead.size + linSlabSkip.size
    val zTotal = zSlabRead.size + zSlabSkip.size

    cat.loadPrunedBox("scratch", "ev_zorder", box)
      .where(col("user_id") >= uLo && col("user_id") < uHi &&
        col("ts_us") >= tLo && col("ts_us") < tHi)
      .agg(count(lit(1)).as("n"),
        Tables.dsum(col("value")).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .select(col("n"), col("sum_value"), col("n_users"),
        lit(linSlabRead.size * 4 > linTotal * 3).as("linear_time_blind"),
        lit(zSlabRead.size * 2 < zTotal).as("zorder_time_prunes"),
        lit(zBoxRead.size * 2 < zBoxRead.size + zBoxSkip.size).as("zorder_box_prunes"))
  }

  val cZorderSql: String =
    """WITH b AS (
      |  SELECT MIN(user_id) AS umn, MAX(user_id) AS umx,
      |         MIN(epoch_us(ts)) AS tmn, MAX(epoch_us(ts)) AS tmx
      |  FROM events),
      |e AS (
      |  SELECT umn + ((umx - umn) * 3) // 8 AS ulo,
      |         umn + ((umx - umn) * 5) // 8 AS uhi,
      |         tmn + ((tmx - tmn) * 3) // 8 AS tlo,
      |         tmn + ((tmx - tmn) * 4) // 8 AS thi FROM b)
      |SELECT COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  true AS linear_time_blind,
      |  true AS zorder_time_prunes,
      |  true AS zorder_box_prunes
      |FROM events, e
      |WHERE user_id >= ulo AND user_id < uhi
      |  AND epoch_us(ts) >= tlo AND epoch_us(ts) < thi""".stripMargin

  /** Iceberg `$history` metadata table with a rollback in the lineage —
    * the ancestry view that makes an undo legible. Recipe: create (v0,
    * empty) → three appends of lineitem modulo-slices (v1..v3) → rollback
    * to v1 (one atomic ref move) → append slice 3 (v4, whose PARENT is v1:
    * commitSnapshot records the head it based on, not the numerically
    * previous snapshot). The emitted rows are exactly what
    * `SHOW HISTORY IN scratch.li_hist` serves:
    * (version, parent, n_rows, is_current_ancestor) where ancestry is the
    * parent-pointer walk from the current head — {v4, v1, v0} survive,
    * the rolled-past {v2, v3} stay readable (time travel) but drop out of
    * the current line. n_rows comes from the manifest-stats sidecar (zero
    * data IO); the oracle recomputes every count from lineitem and pins
    * the lineage literals the recipe forces. */
  def cHistoryMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cat = new LakeCatalog(spark, scratch)
    val li = Tables.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"))
    cat.dropTable("scratch", "li_hist")
    cat.createTable("scratch", "li_hist", StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_extendedprice", DoubleType))))
    cat.append("scratch", "li_hist", li.where(col("l_orderkey") % 4 === 0))
    cat.append("scratch", "li_hist", li.where(col("l_orderkey") % 4 === 1))
    cat.append("scratch", "li_hist", li.where(col("l_orderkey") % 4 === 2))
    cat.rollbackTo("scratch", "li_hist", 1)
    cat.append("scratch", "li_hist", li.where(col("l_orderkey") % 4 === 3))
    cat.history("scratch", "li_hist")
      .toDF("version", "parent", "n_rows", "is_current_ancestor")
      .orderBy("version")
  }

  val cHistoryMetaSql: String =
    """WITH c AS (
      |  SELECT
      |    COUNT(*) FILTER (l_orderkey % 4 = 0) AS c0,
      |    COUNT(*) FILTER (l_orderkey % 4 = 1) AS c1,
      |    COUNT(*) FILTER (l_orderkey % 4 = 2) AS c2,
      |    COUNT(*) FILTER (l_orderkey % 4 = 3) AS c3
      |  FROM lineitem)
      |SELECT version, parent, n_rows, is_current_ancestor FROM (
      |  SELECT 0 AS version, -1 AS parent, CAST(0 AS BIGINT) AS n_rows,
      |         true AS is_current_ancestor FROM c
      |  UNION ALL SELECT 1, 0, c0, true FROM c
      |  UNION ALL SELECT 2, 1, c0 + c1, false FROM c
      |  UNION ALL SELECT 3, 2, c0 + c1 + c2, false FROM c
      |  UNION ALL SELECT 4, 1, c0 + c3, true FROM c)
      |ORDER BY version""".stripMargin

  /** Dynamic partition overwrite ([[LakeCatalog.overwritePartitions]]) —
    * the BACKFILL path: events land partitioned by event_type, then the
    * `click` partition alone is re-derived with corrected values (value×2,
    * an exact double op) and overwritten. The proof is two-sided and
    * file-granular: the untouched partition's file set is BYTE-IDENTICAL
    * before/after (`untouched_stable` — dynamic overwrite never staged it),
    * while the target partition's old files are all gone
    * (`target_replaced`). A static overwrite here would have truncated the
    * other four partitions — the classic backfill footgun. The per-type
    * aggregates are computed from the post-overwrite table, so the
    * correction's content (and the other partitions' survival) is
    * hash-gated against the oracle's CASE replay, not just asserted. At
    * 100 TB: rewrite cost ∝ corrected partitions, planning cost ∝ one
    * directory swap per partition at job commit. */
  def cOverwritePartitions(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val cat = new LakeCatalog(spark, scratch)
    cat.dropTable("scratch", "ev_backfill")
    cat.createTable("scratch", "ev_backfill", StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("value", DoubleType),
      StructField("event_type", StringType))))
    val src = Tables.table(spark, dir, "events")
      .select("event_id", "user_id", "value", "event_type")
    cat.appendPartitioned("scratch", "ev_backfill",
      src.repartition(col("event_type")), Seq("event_type"))
    def filesOf(t: String): Set[String] = {
      val d = Paths.get(s"$scratch/scratch/ev_backfill/event_type=$t")
      if (!Files.isDirectory(d)) Set.empty
      else Files.list(d).iterator.asScala
        .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSet
    }
    val viewBefore = filesOf("view")
    val clickBefore = filesOf("click")
    val corrected = src.where(col("event_type") === "click")
      .withColumn("value", col("value") * 2)
    cat.overwritePartitions("scratch", "ev_backfill",
      corrected.repartition(col("event_type")), Seq("event_type"))
    val untouchedStable = filesOf("view") == viewBefore && viewBefore.nonEmpty
    val targetReplaced = filesOf("click").intersect(clickBefore).isEmpty &&
      filesOf("click").nonEmpty
    cat.load("scratch", "ev_backfill")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), Tables.dsum(col("value")).as("sum_value"))
      .select(col("event_type"), col("n"), col("sum_value"),
        lit(untouchedStable).as("untouched_stable"),
        lit(targetReplaced).as("target_replaced"))
      .orderBy("event_type")
  }

  val cOverwritePartitionsSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(CASE WHEN event_type = 'click' THEN value * 2
      |                     ELSE value END AS DECIMAL(30,6))) AS DOUBLE)
      |    AS sum_value,
      |  true AS untouched_stable, true AS target_replaced
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Zero-copy clone + independent divergence ([[LakeCatalog.cloneTable]],
    * the Delta SHALLOW CLONE / Iceberg snapshot-ref pattern). Recipe:
    * source = two lineitem modulo slices (%4∈{0,1}); clone it; COW-delete
    * the odd half of slice 1 (%8=1) FROM THE CLONE. Structural proofs:
    *   zero_copy    — the clone directory contains NO parquet files at
    *                  clone time (its snapshot is pure `../` references);
    *   meta_count   — clone COUNT(*) answered from cloned manifest stats
    *                  alone (no scan) equals the source's;
    *   src_intact   — after the clone-side delete the SOURCE still counts
    *                  c0+c1 (its files are immutable; the clone's COW
    *                  rewrite landed in the clone's own directory).
    * The clone's post-delete rows (slice 0 still served by shared files +
    * the rewritten %8=5 remainder) are recomputed and hash-gated. Delta's
    * shallow-clone caveat is inherited and documented at cloneTable: source
    * expiry can break clones — clones don't pin source history. */
  def cCloneTable(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val cat = new LakeCatalog(spark, scratch)
    val li = Tables.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"))
    cat.dropTable("scratch", "li_cl_src")
    cat.dropTable("scratch", "li_cl_dst")
    cat.createTable("scratch", "li_cl_src", StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_extendedprice", DoubleType))))
    cat.append("scratch", "li_cl_src", li.where(col("l_orderkey") % 4 === 0))
    cat.append("scratch", "li_cl_src", li.where(col("l_orderkey") % 4 === 1))
    cat.cloneTable("scratch", "li_cl_src", "li_cl_dst")
    def parquetCount(t: String): Int = {
      val d = Paths.get(s"$scratch/scratch/$t")
      Files.list(d).iterator.asScala
        .count(_.getFileName.toString.endsWith(".parquet"))
    }
    val zeroCopy = parquetCount("li_cl_dst") == 0
    val metaCount = (cat.countStar("scratch", "li_cl_dst"),
      cat.countStar("scratch", "li_cl_src")) match {
      case (Some(d), Some(s)) => d == s
      case _ => false
    }
    cat.deleteWhere("scratch", "li_cl_dst", col("l_orderkey") % 8 === 1)
    val srcRows = cat.load("scratch", "li_cl_src").count()
    val cloneRows = cat.load("scratch", "li_cl_dst").count()
    cat.load("scratch", "li_cl_dst").agg(
      count(lit(1)).as("rows_clone"),
      Tables.dsum(col("l_extendedprice")).as("total_clone"),
      lit(srcRows).as("rows_src"),
      lit(zeroCopy).as("zero_copy"),
      lit(metaCount).as("meta_count"),
      lit(srcRows > cloneRows).as("src_intact"))
  }

  val cCloneTableSql: String =
    """SELECT
      |  (SELECT COUNT(*) FROM lineitem
      |   WHERE l_orderkey % 4 = 0 OR l_orderkey % 8 = 5) AS rows_clone,
      |  (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
      |     FROM lineitem
      |   WHERE l_orderkey % 4 = 0 OR l_orderkey % 8 = 5) AS total_clone,
      |  (SELECT COUNT(*) FROM lineitem
      |   WHERE l_orderkey % 4 IN (0, 1)) AS rows_src,
      |  true AS zero_copy, true AS meta_count, true AS src_intact""".stripMargin

  /** Cherry-pick ([[LakeCatalog.cherryPick]], Iceberg cherrypick_snapshot):
    * the WAP flow where main has MOVED PAST the branch point, so
    * fast-forward is impossible. Recipe: append slice A on main (v1), stage
    * slice B on an audit branch (v2, parented at v1), append slice C on
    * main (v3 — main and branch have diverged), then cherry-pick the
    * branch: its net-new files land on main's head as v4, BY NAME — one
    * metadata commit, zero data movement (`files_reused` pins that the
    * staged parquet file names appear verbatim in main's new head). The
    * branch stays readable (its audit trail survives); main counts all
    * three slices. Append-only validation is enforced in the API — a COW
    * snapshot has no well-defined file-level cherry-pick. */
  def cCherryPick(spark: SparkSession, dir: String): DataFrame = {
    val cat = new LakeCatalog(spark, scratch)
    val li = Tables.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"))
    cat.dropTable("scratch", "li_cherry")
    cat.createTable("scratch", "li_cherry", StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_extendedprice", DoubleType))))
    cat.append("scratch", "li_cherry", li.where(col("l_orderkey") % 3 === 0))
    cat.appendToBranch("scratch", "li_cherry",
      li.where(col("l_orderkey") % 3 === 1), "staging")
    cat.append("scratch", "li_cherry", li.where(col("l_orderkey") % 3 === 2))
    val branchFiles = cat.snapshots("scratch", "li_cherry")
      .find(_._1 == 2).get._2.toSet
    val v4 = cat.cherryPick("scratch", "li_cherry", "staging")
    val mainFiles = cat.snapshots("scratch", "li_cherry")
      .find(_._1 == v4).get._2.toSet
    val stagedAdded = branchFiles -- cat.snapshots("scratch", "li_cherry")
      .find(_._1 == 1).get._2.toSet
    val filesReused = stagedAdded.nonEmpty && stagedAdded.subsetOf(mainFiles)
    val branchRows = cat.loadBranch("scratch", "li_cherry", "staging").count()
    cat.load("scratch", "li_cherry").agg(
      count(lit(1)).as("rows_main"),
      Tables.dsum(col("l_extendedprice")).as("total_main"),
      lit(branchRows).as("rows_branch"),
      lit(cat.snapshots("scratch", "li_cherry").length).as("n_snapshots"),
      lit(filesReused).as("files_reused"))
  }

  val cCherryPickSql: String =
    """SELECT COUNT(*) AS rows_main,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
      |    AS total_main,
      |  (SELECT COUNT(*) FROM lineitem WHERE l_orderkey % 3 IN (0, 1))
      |    AS rows_branch,
      |  5 AS n_snapshots, true AS files_reused
      |FROM lineitem""".stripMargin

  /** Deep clone vs shallow clone under source expiry — the hazard case the
    * shallow-clone contract documents, EXECUTED: both clone flavors are
    * taken off a 2-append source, then the source COW-deletes one slice and
    * expires its history (keep 1), physically deleting the files only the
    * old snapshots referenced. The shallow clone now has dangling `../`
    * references (`shallow_dangling` — checked against the filesystem, no
    * read); the deep clone still owns every byte (`deep_intact`) and its
    * full recount + decimal sum are hash-gated. src_rows_after pins that
    * the source itself kept only the surviving slice. This is Delta's
    * deep/shallow clone trade executed end-to-end: zero-copy clones are
    * free but coupled to source retention; deep clones pay data-copy cost
    * once and share nothing. */
  def cDeepClone(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val cat = new LakeCatalog(spark, scratch)
    val li = Tables.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"))
    Seq("li_dc_src", "li_dc_sh", "li_dc_dp")
      .foreach(t => cat.dropTable("scratch", t))
    cat.createTable("scratch", "li_dc_src", StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_extendedprice", DoubleType))))
    cat.append("scratch", "li_dc_src", li.where(col("l_orderkey") % 4 === 0))
    cat.append("scratch", "li_dc_src", li.where(col("l_orderkey") % 4 === 1))
    cat.cloneTable("scratch", "li_dc_src", "li_dc_sh")
    cat.cloneTable("scratch", "li_dc_src", "li_dc_dp", deep = true)
    // source moves on: slice B COW-deleted, history expired → the files
    // only old snapshots referenced are physically gone
    cat.deleteWhere("scratch", "li_dc_src", col("l_orderkey") % 4 === 1)
    cat.expireSnapshots("scratch", "li_dc_src", keep = 1)
    def committedFiles(t: String): Seq[String] =
      cat.snapshots("scratch", t).lastOption.map(_._2).getOrElse(Seq.empty)
    def missing(t: String): Int = committedFiles(t).count(f =>
      !Files.exists(Paths.get(s"$scratch/scratch/$t").resolve(f)))
    val shallowDangling = missing("li_dc_sh") > 0
    val deepIntact = missing("li_dc_dp") == 0
    val srcRows = cat.load("scratch", "li_dc_src").count()
    cat.load("scratch", "li_dc_dp").agg(
      count(lit(1)).as("rows_deep"),
      Tables.dsum(col("l_extendedprice")).as("total_deep"),
      lit(srcRows).as("src_rows_after"),
      lit(shallowDangling).as("shallow_dangling"),
      lit(deepIntact).as("deep_intact"))
  }

  val cDeepCloneSql: String =
    """SELECT
      |  (SELECT COUNT(*) FROM lineitem WHERE l_orderkey % 4 IN (0, 1))
      |    AS rows_deep,
      |  (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
      |     FROM lineitem WHERE l_orderkey % 4 IN (0, 1)) AS total_deep,
      |  (SELECT COUNT(*) FROM lineitem WHERE l_orderkey % 4 = 0)
      |    AS src_rows_after,
      |  true AS shallow_dangling, true AS deep_intact""".stripMargin

  /** Equi-height histogram statistics ([[LakeCatalog.analyzeHistogram]]) —
    * the range-selectivity CBO input ANALYZE's min/max/ndv can't provide
    * (a skewed column's min/max says nothing about where the mass sits).
    * Construction is the scale-honest banded form: values band at $100
    * granularity (one bounded-fan aggregate), the cumulative runs over
    * BAND rows (never a global value sort), bands map to buckets by
    * 1+⌊(cum−1)·10/n⌋, and only the 10 bucket rows reach the driver for
    * the sidecar write. The emitted rows are the SIDECAR READ-BACK
    * ([[LakeCatalog.showHistogram]] / SHOW HISTOGRAM verb) — the
    * persistence path is inside the gate, not just the math. Bucket
    * bounds are exact multiples of the band width (no representation
    * risk); heights are n/10 up to band granularity. */
  def cStatsHistogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cat = new LakeCatalog(spark, scratch)
    cat.dropTable("scratch", "li_histo")
    cat.createTable("scratch", "li_histo", StructType(Seq(
      StructField("l_extendedprice", DoubleType))))
    cat.append("scratch", "li_histo",
      Tables.table(spark, dir, "lineitem").select(col("l_extendedprice")))
    cat.analyzeHistogram("scratch", "li_histo", "l_extendedprice",
      buckets = 10, bandW = 100.0)
    cat.showHistogram("scratch", "li_histo", "l_extendedprice")
      .toDF("bucket", "lo", "hi", "n_rows")
      .orderBy("bucket")
  }

  val cStatsHistogramSql: String =
    """WITH bands AS (
      |  SELECT CAST(floor(l_extendedprice / 100.0) AS BIGINT) AS band,
      |    COUNT(*) AS c
      |  FROM lineitem GROUP BY 1),
      |cum AS (SELECT band, c, SUM(c) OVER (ORDER BY band) AS cum FROM bands),
      |t AS (SELECT MAX(cum) AS n FROM cum)
      |SELECT bucket, MIN(band) * 100.0 AS lo, (MAX(band) + 1) * 100.0 AS hi,
      |  CAST(SUM(c) AS BIGINT) AS n_rows
      |FROM (
      |  SELECT band, c, CAST(1 + (cum - 1) * 10 // n AS INTEGER) AS bucket
      |  FROM cum, t)
      |GROUP BY bucket ORDER BY bucket""".stripMargin

  /** CHECK constraints on the write path ([[LakeCatalog.checkConstraints]],
    * Delta's `delta.constraints.*` analog): declared at CREATE as
    * `check.<name>` properties, validated against every incoming append
    * BEFORE anything is staged — a refused batch leaves no partial state,
    * no new snapshot, no orphan files (`atomic_refusal` pins the snapshot
    * count across the failed attempt). The valid batch's content is
    * hash-gated; the violating batch (the same events with negated values)
    * is proven refused. SQL CHECK NULL semantics (NULL passes) documented
    * at the API. */
  def cCheckConstraint(spark: SparkSession, dir: String): DataFrame = {
    val cat = new LakeCatalog(spark, scratch)
    cat.dropTable("scratch", "ev_checked")
    cat.createTable("scratch", "ev_checked", StructType(Seq(
      StructField("event_id", LongType),
      StructField("value", DoubleType))),
      properties = Map("check.nonneg" -> "value >= 0"))
    val src = Tables.table(spark, dir, "events")
      .select(col("event_id"), col("value"))
    cat.append("scratch", "ev_checked", src) // every event value is ≥ 0
    val snapsBefore = cat.snapshots("scratch", "ev_checked").length
    val rejected = try {
      cat.append("scratch", "ev_checked",
        src.limit(100).withColumn("value", -col("value")))
      false
    } catch { case _: graft.catalog.ConstraintViolationException => true }
    val atomic = cat.snapshots("scratch", "ev_checked").length == snapsBefore
    cat.load("scratch", "ev_checked").agg(
      count(lit(1)).as("n"),
      Tables.dsum(col("value")).as("total_value"),
      lit(snapsBefore).as("n_snapshots"),
      lit(rejected).as("rejected"),
      lit(atomic).as("atomic_refusal"))
  }

  val cCheckConstraintSql: String =
    """SELECT COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value,
      |  2 AS n_snapshots, true AS rejected, true AS atomic_refusal
      |FROM events""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c_check_constraint" -> (cCheckConstraint _),
    "c_stats_histogram" -> (cStatsHistogram _),
    "c_deep_clone" -> (cDeepClone _),
    "c_cherry_pick" -> (cCherryPick _),
    "c_zorder" -> (cZorder _),
    "c_history_meta" -> (cHistoryMeta _),
    "c_overwrite_partitions" -> (cOverwritePartitions _),
    "c_clone_table" -> (cCloneTable _))

  val oracles: Map[String, String] = Map(
    "c_check_constraint" -> cCheckConstraintSql,
    "c_stats_histogram" -> cStatsHistogramSql,
    "c_deep_clone" -> cDeepCloneSql,
    "c_cherry_pick" -> cCherryPickSql,
    "c_zorder" -> cZorderSql,
    "c_history_meta" -> cHistoryMetaSql,
    "c_overwrite_partitions" -> cOverwritePartitionsSql,
    "c_clone_table" -> cCloneTableSql)
}
