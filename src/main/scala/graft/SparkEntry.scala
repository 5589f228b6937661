package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered as a named
  * query; where the semantics are ANSI-SQL-expressible the matching DuckDB
  * oracle SQL is registered too (same column names, same ORDER BY).
  */
object SparkEntry {

  private def registries: Seq[Registry] = Seq(
    RelationalQueries, TextQueries, VectorQueries, EventQueries,
    PipelineQueries, EvalQueries, IngestQueries, SketchQueries)

  private lazy val all: Seq[Q] = {
    val es = registries.flatMap(_.entries)
    require(es.map(_.name).distinct.size == es.size, "duplicate query names")
    es
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q07_region_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap

  /** Queries that drive an actual StreamingQuery — Bench reports their
    * times under a separate total (micro-batch harness setup dominates
    * their wall-clock; see Q.streaming).
    */
  def streamingQueries: Set[String] = all.filter(_.streaming).map(_.name).toSet
}
