package graft.catalog

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Spark-native lake catalog — the reference's catalog surface
  * (list namespaces / list tables / describe / create / append,
  * IcebergConnection.py:41-77 and 133-216) over a parquet warehouse.
  *
  * Layout: `<root>/<namespace>/<table>/ *.parquet` plus a `_meta.json`
  * sidecar per table (schema echo + properties + partition spec), keeping an
  * Iceberg-shaped metadata surface so a real Iceberg catalog can be swapped
  * in where the runtime jars exist. A flat directory of `<name>.parquet`
  * files (the test data layout) is exposed as the single namespace `main`.
  *
  * Appends are whole parquet files added to the table directory — the same
  * commit granularity as Iceberg's append snapshots (files are immutable,
  * readers pick up new files on next scan), and unlike the reference's
  * one-arrow-row `table.append` (IcebergConnection.py:180-183) an append
  * here is a distributed write of any size.
  */
class LakeCatalog(spark: SparkSession, root: String) {

  private def rootPath: Path = Paths.get(root)

  /** List a directory with the stream properly closed — Files.list holds an
    * open directory descriptor until closed; a long-lived gateway process
    * leaking one per catalog call eventually hits EMFILE. */
  private def listDir(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toSeq finally s.close()
  }

  private def isFlatWarehouse: Boolean =
    Files.exists(rootPath) &&
      listDir(rootPath).exists(_.getFileName.toString.endsWith(".parquet"))

  /** Namespaces: subdirectories of the root; a flat dir of parquet files is
    * namespace `main` (reference: catalog.list_namespaces). */
  def listNamespaces(): Seq[String] =
    if (isFlatWarehouse) Seq("main")
    else if (!Files.exists(rootPath)) Seq.empty
    else listDir(rootPath)
      .filter(Files.isDirectory(_)).map(_.getFileName.toString).sorted

  /** (namespace, table) pairs (reference: catalog.list_tables per ns). */
  def listTables(): Seq[(String, String)] =
    if (isFlatWarehouse)
      listDir(rootPath)
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(p => ("main", p.getFileName.toString.stripSuffix(".parquet")))
        .sorted
    else listNamespaces().flatMap { ns =>
      listDir(rootPath.resolve(ns)).filter(Files.isDirectory(_))
        .map(p => (ns, p.getFileName.toString)).sorted
    }

  private def tablePath(ns: String, table: String): String =
    if (isFlatWarehouse && ns == "main") s"$root/$table.parquet"
    else s"$root/$ns/$table"

  def load(ns: String, table: String): DataFrame =
    spark.read.parquet(tablePath(ns, table))

  /** Normalized (column, type, nullable) schema rows
    * (reference: DESCRIBE TABLE, IcebergConnection.py:64-77). */
  def describe(ns: String, table: String): Seq[(String, String, Boolean)] =
    load(ns, table).schema.fields.toSeq.map(f =>
      (f.name, f.dataType.sql.toLowerCase, f.nullable))

  /** CREATE TABLE with a typed schema (reference maps STRING/INT/DOUBLE/
    * TIMESTAMP, IcebergConnection.py:189-216 — Spark's full type system
    * applies here). Writes an empty parquet dataset + metadata sidecar. */
  def createTable(ns: String, table: String, schema: StructType,
                  properties: Map[String, String] = Map.empty): Unit = {
    val dir = Paths.get(s"$root/$ns/$table")
    Files.createDirectories(dir)
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      .write.mode("overwrite").parquet(dir.toString)
    val meta = schema.fields.map(f =>
      s"""{"name":"${f.name}","type":"${f.dataType.sql.toLowerCase}","nullable":${f.nullable}}""")
      .mkString("[", ",", "]")
    val props = properties.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
    Files.writeString(dir.resolveSibling(s"${table}_meta.json"),
      s"""{"table":"$ns.$table","schema":$meta,"partition_spec":[],"properties":$props}""")
  }

  /** Distributed append — any-size DataFrame, immutable-file commit. */
  def append(ns: String, table: String, df: DataFrame): Unit =
    df.write.mode("append").parquet(s"$root/$ns/$table")

  /** Partitioned append (hive-style directories) — the Iceberg partition-spec
    * analog: scans with a predicate on the partition column prune whole
    * directories (PartitionFilters), the property that makes date/source
    * layouts work at 100 TB. */
  def appendPartitioned(ns: String, table: String, df: DataFrame,
                        partitionCols: Seq[String]): Unit =
    df.write.mode("append").partitionBy(partitionCols: _*)
      .parquet(s"$root/$ns/$table")

  /** Single typed-row INSERT (the reference's whole INSERT surface,
    * IcebergConnection.py:133-187) — a degenerate one-row append. */
  def insertRow(ns: String, table: String, values: Seq[Any]): Unit = {
    val schema = load(ns, table).schema
    append(ns, table, spark.createDataFrame(
      java.util.List.of(Row.fromSeq(values)), schema))
  }

  def dropTable(ns: String, table: String): Unit = {
    val dir = Paths.get(s"$root/$ns/$table")
    if (Files.exists(dir)) {
      val w = Files.walk(dir)
      try w.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      finally w.close()
      val meta = dir.resolveSibling(s"${table}_meta.json")
      if (Files.exists(meta)) Files.delete(meta)
    }
  }
}
