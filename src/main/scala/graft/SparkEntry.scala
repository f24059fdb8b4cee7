package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AnalyticsOps, ClusterOps, CurationOps, LlmOps, PipelineOps, Relational, TrainingOps, WikiOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every engine capability is registered as a [[Q]] in a domain object
  * under `graft.queries`; this object only assembles the maps the driver
  * harness consumes (Verify.scala dumps results + oracle SQL,
  * Bench.scala times the same set).
  */
object SparkEntry {

  /** The full registry; order is the documentation order of SURVEY.md §2. */
  def registry: Seq[Q] =
    Relational.all ++ WikiOps.all ++ LlmOps.all ++ PipelineOps.all ++
      AnalyticsOps.all ++ TrainingOps.all ++ CurationOps.all ++ ClusterOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's headline analysis — "category distribution"
    * (/root/reference/README.md:23) — over the star schema.
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.q02CategoryDistribution.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops →
    * driver records a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    registry.collect { case Q(n, _, Some(sql), _) => n -> sql }.toMap
}
