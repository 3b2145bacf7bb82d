package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AdvancedQueries, AnalysisQueries, CoreQueries, FunctionQueries, JoinQueries, LlmQueries, MetricsQueries, OntologyCorpusQueries, PipelineQueries, StreamQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query batteries; each query runs one library
  * operator over `/root/testdata/<sf>` and has a DuckDB oracle with
  * identical column names (driver hash-compares values after sorting
  * columns by name).
  */
object SparkEntry {
  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] = Seq(
    (CoreQueries.queries, CoreQueries.oracles),
    (JoinQueries.queries, JoinQueries.oracles),
    (AnalysisQueries.queries, AnalysisQueries.oracles),
    (LlmQueries.queries, LlmQueries.oracles),
    (StreamQueries.queries, StreamQueries.oracles),
    (FunctionQueries.queries, FunctionQueries.oracles),
    (PipelineQueries.queries, PipelineQueries.oracles),
    (MetricsQueries.queries, MetricsQueries.oracles),
    (AdvancedQueries.queries, AdvancedQueries.oracles),
    (OntologyCorpusQueries.queries, OntologyCorpusQueries.oracles),
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.multihopRevenue(spark, "/root/testdata/sf0.001")

  private def dedupOrDie[A](kvs: Seq[(String, A)], what: String): Map[String, A] = {
    val dups = kvs.groupBy(_._1).filter(_._2.size > 1).keys
    require(dups.isEmpty,
      s"duplicate $what across query modules (a Map merge would silently " +
        s"clobber one of them): ${dups.toSeq.sorted.mkString(", ")}")
    kvs.toMap
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    dedupOrDie(modules.flatMap(_._1), "gate names")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] =
    dedupOrDie(modules.flatMap(_._2), "oracle keys")
}
