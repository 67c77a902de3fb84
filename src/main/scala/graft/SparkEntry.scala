package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Dedup, Joins, Multimodal, PipelineOps, Pmr, Relational, Similarity, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator inventory.
  * Every implemented operator has a `queries` entry; SQL-expressible ones also
  * have an `oracleSql` entry with IDENTICAL output column names. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Pmr.queries ++ TextAnalysis.queries ++
      Dedup.queries ++ Similarity.queries ++ Multimodal.queries ++
      Joins.queries ++ PipelineOps.queries ++
      graft.sources.JsonBackend.queries ++ graft.streaming.Streams.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] = staticOracles ++ Similarity.oracles

  /** sfDir-aware form used by Verify: generated oracles whose literals depend
    * on what was trained for a dir (sim_ivf's centroids) bind to the dir the
    * queries just ran against, not to last-call global state. */
  def oracleSqlFor(sfDir: String): Map[String, String] =
    staticOracles ++ Similarity.oracles(sfDir)

  private def staticOracles: Map[String, String] =
    Relational.oracles ++ Pmr.oracles ++ TextAnalysis.oracles ++
      Dedup.oracles ++ Multimodal.oracles ++
      Joins.oracles ++ PipelineOps.oracles ++
      graft.sources.JsonBackend.oracles ++ graft.streaming.Streams.oracles
}
