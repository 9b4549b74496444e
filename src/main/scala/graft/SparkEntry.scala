package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` has one entry per implemented operator from SURVEY.md §2;
  * `oracleSql` carries the DuckDB-equivalent SQL for the hash-compare gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.Connector.queries ++
      graft.queries.Pipeline.queries ++ graft.queries.Events.queries ++
      graft.queries.StreamBatch.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++ graft.queries.Connector.oracles ++
      graft.queries.Pipeline.oracles ++ graft.queries.Events.oracles ++
      graft.queries.StreamBatch.oracles

  /** Oracles that embed run-time artifacts (px13: the trained IVF centroid
    * matrix as double literals) — rendered against the same session + data
    * dir the queries ran on, and merged over [[oracleSql]] by Verify. */
  def dynamicOracleSql(spark: SparkSession, sfDir: String): Map[String, String] =
    graft.queries.Pipeline.dynamicOracles(spark, sfDir)
}
