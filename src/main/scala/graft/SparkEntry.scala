package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Q, Relational, Similarity, TextPipeline}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry: every operator from SURVEY.md §2 (and the
  * training-data pipeline extras) appears here; SQL-expressible ones
  * carry a DuckDB oracle in [[oracleSql]], the rest get the driver's
  * rows-only check and are covered by ScalaTest fixtures instead.
  */
object SparkEntry {

  def registry: Seq[Q] =
    Relational.all ++ TextPipeline.all ++ Similarity.all ++
      pipeline.ExtractQueries.all ++ pipeline.MultimodalQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    pipeline.ExtractQueries.qExtract.fn(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case Q(n, _, Some(sql)) => n -> sql }.toMap
}
