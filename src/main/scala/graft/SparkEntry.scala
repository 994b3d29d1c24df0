package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the complete operator surface (SURVEY.md §2 coverage +
  * LLM-pipeline extensions); `oracleSql` carries the DuckDB-equivalent
  * SQL for every query the oracle can express.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.defs ++
      graft.queries.EventQueries.defs ++
      graft.queries.SourceQueries.defs ++
      graft.queries.QualityQueries.defs ++
      graft.llm.LlmQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.EventQueries.oracles ++
      graft.queries.SourceQueries.oracles ++
      graft.queries.QualityQueries.oracles ++
      graft.llm.LlmQueries.oracles
}
