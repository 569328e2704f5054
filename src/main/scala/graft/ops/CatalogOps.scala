package graft.ops

import graft.Tables
import graft.catalog.LakeCatalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.1 Catalog / metadata operators — the reference's MCP command surface
  * (LIST NAMESPACES / LIST TABLES / DESCRIBE / CREATE+INSERT / append /
  * SELECT-passthrough) as driver-checkable queries. Catalog results are tiny
  * by construction (metadata, not data) — the scale story is that none of
  * them touch table *data* except the scan queries, which push down. */
object CatalogOps {

  /** LIST NAMESPACES (reference: IcebergConnection.py:41-49). */
  def cListNamespaces(spark: SparkSession, dir: String): DataFrame = {
    val cat = new LakeCatalog(spark, dir)
    val nss = cat.listNamespaces()
    val tables = cat.listTables()
    import spark.implicits._
    nss.map(ns => (ns, tables.count(_._1 == ns).toLong))
      .toDF("namespace", "n_tables").orderBy("namespace")
  }

  val cListNamespacesSql: String =
    "SELECT 'main' AS namespace, CAST(10 AS BIGINT) AS n_tables"

  /** LIST TABLES (reference: IcebergConnection.py:51-62). */
  def cListTables(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    new LakeCatalog(spark, dir).listTables()
      .toDF("namespace", "table_name").orderBy("namespace", "table_name")
  }

  val cListTablesSql: String = Tables.names.sorted
    .map(t => s"SELECT 'main' AS namespace, '$t' AS table_name")
    .mkString("", " UNION ALL ", " ORDER BY namespace, table_name")

  /** DESCRIBE TABLE, full reference parity (IcebergConnection.py:64-77
    * returns schema + partition_spec + sort_order + properties): the flat
    * lineitem table contributes its schema section; a catalog-created
    * scratch table with declared partition spec / sort order / properties
    * exercises all four sections. Normalized (table, section, name, value)
    * rows. */
  def cDescribeTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val cat = new LakeCatalog(spark, dir)
    val scratchRoot = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse"
    val c2 = new LakeCatalog(spark, scratchRoot)
    c2.dropTable("scratch", "desc_demo")
    c2.createTable("scratch", "desc_demo", StructType(Seq(
      StructField("id", LongType), StructField("ds", StringType),
      StructField("v", DoubleType))),
      properties = Map("owner" -> "graft", "write.format" -> "parquet"),
      partitionSpec = Seq("ds"), sortOrder = Seq("id asc"))
    val li = cat.describe("main", "lineitem")
      .map { case (c, t, _) => ("lineitem", "schema", c, t) }
    val dd = c2.describeFull("scratch", "desc_demo")
      .map { case (s, n, v) => ("desc_demo", s, n, v) }
    (li ++ dd).toDF("table_name", "section", "name", "value")
      .orderBy("table_name", "section", "name")
  }

  val cDescribeTableSql: String = (
    Seq(
      ("desc_demo", "partition_spec", "ds", "identity"),
      ("desc_demo", "properties", "owner", "graft"),
      ("desc_demo", "properties", "write.format", "parquet"),
      ("desc_demo", "schema", "id", "bigint"),
      ("desc_demo", "schema", "ds", "string"),
      ("desc_demo", "schema", "v", "double"),
      ("desc_demo", "sort_order", "id", "asc")) ++
    Seq(
      ("l_orderkey", "bigint"), ("l_partkey", "bigint"), ("l_suppkey", "bigint"),
      ("l_linenumber", "int"), ("l_quantity", "double"),
      ("l_extendedprice", "double"), ("l_discount", "double"), ("l_tax", "double"),
      ("l_returnflag", "string"), ("l_linestatus", "string"),
      ("l_shipdate", "timestamp_ntz"))
      .map { case (c, t) => ("lineitem", "schema", c, t) })
    .map { case (tb, s, n, v) =>
      s"SELECT '$tb' AS table_name, '$s' AS section, '$n' AS name, '$v' AS value" }
    .mkString("", " UNION ALL ", " ORDER BY table_name, section, name")

  /** CREATE TABLE + typed single-row INSERT + read back — the reference's
    * whole DDL/DML surface (IcebergConnection.py:133-216) in one round trip
    * against a scratch warehouse. Idempotent: drop/recreate each run. */
  def cCreateInsert(spark: SparkSession, dir: String): DataFrame = {
    val scratch = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse"
    val cat = new LakeCatalog(spark, scratch)
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType),
      StructField("flag", BooleanType), StructField("score", DoubleType),
      StructField("created", TimestampType)))
    cat.dropTable("scratch", "people")
    cat.createTable("scratch", "people", schema, Map("owner" -> "graft"))
    // parse the timestamp literal in UTC explicitly (Timestamp.valueOf uses
    // the JVM default zone → shifted instants on non-UTC hosts)
    val created = java.sql.Timestamp.from(
      java.time.LocalDateTime.parse("2024-06-01T12:00:00")
        .toInstant(java.time.ZoneOffset.UTC))
    cat.insertRow("scratch", "people", Seq(1, "alice", true, 9.5d, created))
    cat.load("scratch", "people")
      .select(col("id"), col("name"), col("flag"), col("score"),
        // render timestamp portably (UTC session both engines)
        date_format(col("created"), "yyyy-MM-dd HH:mm:ss").as("created_str"))
      .orderBy("id")
  }

  val cCreateInsertSql: String =
    """SELECT CAST(1 AS INTEGER) AS id, 'alice' AS name, true AS flag,
      |  CAST(9.5 AS DOUBLE) AS score, '2024-06-01 12:00:00' AS created_str""".stripMargin

  /** Bulk append: CREATE + distributed INSERT…SELECT of a 100-row slice of
    * `customer`, then a read-back aggregate. This is where the Spark design
    * departs from the reference's 1-row-per-arrow-table append — an append
    * here is a parallel parquet write of arbitrary size. */
  def cAppendBulk(spark: SparkSession, dir: String): DataFrame = {
    val scratch = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse"
    val cat = new LakeCatalog(spark, scratch)
    val src = Tables.table(spark, dir, "customer")
      .where(col("c_custkey") <= 100)
      .select(col("c_custkey"), col("c_acctbal"))
    cat.dropTable("scratch", "bal")
    cat.createTable("scratch", "bal", StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_acctbal", DoubleType))))
    cat.append("scratch", "bal", src)
    cat.load("scratch", "bal")
      .agg(count(lit(1)).as("n"),
        Tables.dsum(col("c_acctbal")).as("total_bal"),
        min(col("c_custkey")).as("min_key"), max(col("c_custkey")).as("max_key"))
  }

  val cAppendBulkSql: String =
    """SELECT COUNT(*) AS n,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE) AS total_bal,
      |  min(c_custkey) AS min_key, max(c_custkey) AS max_key
      |FROM customer WHERE c_custkey <= 100""".stripMargin

  /** The reference's SELECT passthrough (scan → SQL post-processing,
    * IcebergConnection.py:99-131) on Spark's parser, with the filter pushed
    * INTO the scan instead of scanning then filtering (CatalogSpec asserts
    * PushedFilters in the plan). */
  def cScanPushdown(spark: SparkSession, dir: String): DataFrame =
    Tables.sql(spark, dir,
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total
        |FROM orders WHERE o_totalprice > 150000
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)

  val cScanPushdownSql: String =
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total
      |FROM orders WHERE o_totalprice > 150000
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Partition-pruned scan: write events partitioned by event_type
    * (hive layout via LakeCatalog.appendPartitioned), read back with a
    * partition predicate — the scan touches ONE directory of five
    * (CatalogSpec asserts PartitionFilters). This is the layout/pruning
    * story that carries the engine at 100 TB (SURVEY.md §5). */
  def cPartitionPrune(spark: SparkSession, dir: String): DataFrame = {
    val scratch = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse"
    val cat = new LakeCatalog(spark, scratch)
    cat.dropTable("scratch", "events_by_type")
    cat.createTable("scratch", "events_by_type", StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("value", DoubleType), StructField("event_type", StringType))))
    cat.appendPartitioned("scratch", "events_by_type",
      Tables.table(spark, dir, "events")
        .select("event_id", "user_id", "value", "event_type"),
      Seq("event_type"))
    cat.load("scratch", "events_by_type")
      .where(col("event_type") === "purchase")
      .agg(count(lit(1)).as("n"), Tables.dsum(col("value")).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
  }

  val cPartitionPruneSql: String =
    """SELECT COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM events WHERE event_type = 'purchase'""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c_partition_prune" -> (cPartitionPrune _),
    "c_list_namespaces" -> (cListNamespaces _),
    "c_list_tables" -> (cListTables _),
    "c_describe_table" -> (cDescribeTable _),
    "c_create_insert" -> (cCreateInsert _),
    "c_append_bulk" -> (cAppendBulk _),
    "c_scan_pushdown" -> (cScanPushdown _))

  val oracles: Map[String, String] = Map(
    "c_partition_prune" -> cPartitionPruneSql,
    "c_list_namespaces" -> cListNamespacesSql,
    "c_list_tables" -> cListTablesSql,
    "c_describe_table" -> cDescribeTableSql,
    "c_create_insert" -> cCreateInsertSql,
    "c_append_bulk" -> cAppendBulkSql,
    "c_scan_pushdown" -> cScanPushdownSql)
}
