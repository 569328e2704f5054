package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator inventory.
  * Each ops object contributes its `queries` (Spark plans) and `oracles`
  * (equivalent DuckDB SQL); the driver cross-checks them at sf=0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1-style grouped aggregate — the reference's core capability
    * (scan → SQL post-processing) as one declarative Spark plan. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.Relational2.queries ++
      ops.Relational3.queries ++
      ops.TextOps.queries ++ ops.TextOps2.queries ++
      ops.TextOps3.queries ++ ops.TextOps4.queries ++ ops.Dedup.queries ++
      ops.Similarity.queries ++ ops.CatalogOps.queries ++
      ops.CatalogOps2.queries ++
      ops.Multimodal.queries ++ streaming.StreamOps.queries ++
      ops.Pipeline.queries ++ ops.ChunkOps.queries ++ ops.Events.queries ++
      ops.Graph.queries ++ ops.Graph2.queries ++
      ops.Pipeline2.queries ++ ops.Pipeline3.queries ++ ops.Cluster.queries ++
      ops.CatalogOps3.queries ++ ops.CatalogOps4.queries ++
      ops.CatalogOps5.queries ++ ops.Dedup2.queries ++
      ops.Similarity2.queries ++
      ops.ClassifyOps.queries ++ streaming.StreamOps2.queries ++
      ops.Multimodal2.queries ++ ops.CatalogOps6.queries ++
      ops.Relational4.queries ++ ops.TextOps5.queries ++
      streaming.StreamOps3.queries ++ ops.CatalogOps7.queries ++
      ops.StatsOps.queries ++ ops.TextOps6.queries ++
      ops.Pipeline4.queries ++ ops.Similarity3.queries ++ ops.Sketches.queries ++
      ops.CatalogOps8.queries ++ ops.Graph3.queries ++ ops.StatsOps2.queries ++
      ops.CatalogOps9.queries ++ streaming.StreamOps4.queries ++
      ops.CatalogOps10.queries ++ ops.CatalogOps11.queries ++ ops.Similarity4.queries ++
      streaming.StreamOps5.queries ++ ops.TextOps7.queries ++
      ops.Events2.queries ++ ops.Similarity5.queries ++
      ops.CatalogOps12.queries ++ ops.Pipeline5.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver rows-only check. */
  def oracleSql: Map[String, String] =
    ops.Relational.oracles ++ ops.Relational2.oracles ++
      ops.Relational3.oracles ++
      ops.TextOps.oracles ++ ops.TextOps2.oracles ++
      ops.TextOps3.oracles ++ ops.TextOps4.oracles ++ ops.Dedup.oracles ++
      ops.Similarity.oracles ++ ops.CatalogOps.oracles ++
      ops.CatalogOps2.oracles ++
      ops.Multimodal.oracles ++ streaming.StreamOps.oracles ++
      ops.Pipeline.oracles ++ ops.ChunkOps.oracles ++ ops.Events.oracles ++
      ops.Graph.oracles ++ ops.Graph2.oracles ++
      ops.Pipeline2.oracles ++ ops.Pipeline3.oracles ++ ops.Cluster.oracles ++
      ops.CatalogOps3.oracles ++ ops.CatalogOps4.oracles ++
      ops.CatalogOps5.oracles ++ ops.Dedup2.oracles ++
      ops.Similarity2.oracles ++
      ops.ClassifyOps.oracles ++ streaming.StreamOps2.oracles ++
      ops.Multimodal2.oracles ++ ops.CatalogOps6.oracles ++
      ops.Relational4.oracles ++ ops.TextOps5.oracles ++
      streaming.StreamOps3.oracles ++ ops.CatalogOps7.oracles ++
      ops.StatsOps.oracles ++ ops.TextOps6.oracles ++
      ops.Pipeline4.oracles ++ ops.Similarity3.oracles ++ ops.Sketches.oracles ++
      ops.CatalogOps8.oracles ++ ops.Graph3.oracles ++ ops.StatsOps2.oracles ++
      ops.CatalogOps9.oracles ++ streaming.StreamOps4.oracles ++
      ops.CatalogOps10.oracles ++ ops.CatalogOps11.oracles ++ ops.Similarity4.oracles ++
      streaming.StreamOps5.oracles ++ ops.TextOps7.oracles ++
      ops.Events2.oracles ++ ops.Similarity5.oracles ++
      ops.CatalogOps12.oracles ++ ops.Pipeline5.oracles
}
