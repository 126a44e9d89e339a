package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AuditOps, CorpusModels, CurationOps, DashboardQueries, Extended, Geo, Graph, IncrementalQueries, JdbcQueries, LakeIndexOps, Lifecycle, LlmPipeline, PipelineOps, Q, Quality, Relational, Similarity, SqlQueries, StreamingQueries, Temporal, TextCorpus, TypedOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full verifiable inventory (one entry per operator class
  * from SURVEY.md §2, plus the LLM-pipeline extensions); `oracleSql` carries
  * the DuckDB-equivalent ANSI SQL for each hash-checked entry.
  */
object SparkEntry {

  private def all: Vector[Q] =
    Relational.defs ++ LlmPipeline.defs ++ Similarity.defs ++ Temporal.defs ++
      Extended.defs ++ DashboardQueries.defs ++ IncrementalQueries.defs ++
      StreamingQueries.defs ++ TextCorpus.defs ++ Lifecycle.defs ++
      SqlQueries.defs ++ Quality.defs ++ Graph.defs ++ TypedOps.defs ++
      Geo.defs ++ JdbcQueries.defs ++ CurationOps.defs ++ CorpusModels.defs ++
      PipelineOps.defs ++ AuditOps.defs ++ LakeIndexOps.defs

  /** Flagship query (README.md:240-249 of the reference): daily revenue by
    * dimension over a broadcast join. Driver smoke-checks rows>0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    queries("q07_daily_revenue_by_supplier")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case Q(n, Some(sql), _) => n -> sql }.toMap
}
