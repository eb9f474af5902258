package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry and oracle SQL live in graft.queries.* (one object per
  * operator family); this object is the aggregation point the driver calls.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The E1 feature pipeline: activity recency/total aggregates + common
    * consumers + label window, end to end. */
  def entry(spark: SparkSession): DataFrame =
    PipelineQueries.e1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++
      ProfileQueries.queries ++
      FeatureQueries.queries ++
      EvalQueries.queries ++
      PipelineQueries.queries ++
      LlmQueries.queries ++
      AlignQueries.queries

  /** Bench-only lane: approximate ANN production configs. Not part of the
    * oracle-gated `queries` contract — approximate search has no hash
    * oracle by construction; its correctness contract is planted-truth
    * recall (RecallSpec / tools/Recall.scala). The bench times
    * `queries ++ benchQueries` so these keep their per-round series;
    * their exact-mode twins in `queries` hash-pin the shared machinery. */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    LlmQueries.benchQueries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++
      ProfileQueries.oracle ++
      FeatureQueries.oracle ++
      EvalQueries.oracle ++
      PipelineQueries.oracle ++
      LlmQueries.oracle ++
      AlignQueries.oracle
}
