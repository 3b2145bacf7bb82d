package graft.rules

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Security rules engine: Facts grouped into Rules mapped to compliance
  * Frameworks, producing Finding rows
  * (reference: cartography/rules/spec/model.py:125-505,
  * runner cartography/rules/runners.py:72-186).
  *
  * A Fact's Cypher query becomes a DataFrame query over the graph tables;
  * the runner unions every fact's findings into one dataset keyed by
  * (framework, rule, fact, asset id). Facts stay declarative, so one
  * framework run is a single unioned Catalyst plan — the per-fact
  * `RETURN COUNT` variant of the reference is a groupBy on the same plan.
  */
final case class Fact(
    factId: String,
    name: String,
    assetLabel: String,
    // query returns one row per finding with an `asset_id` column (+detail)
    query: SparkSession => DataFrame)

object Fact {
  /** SQL-text fact over the registered graph views — the closest analog
    * of the reference's `cypher_query` strings (model.py:125-236): the
    * fact is data, not code, and Catalyst analysis validates it.
    * Register views first with [[RulesRunner.registerGraphViews]]. */
  def sql(factId: String, name: String, assetLabel: String, sqlText: String): Fact =
    Fact(factId, name, assetLabel, s => s.sql(sqlText))
}

final case class Rule(ruleId: String, name: String, facts: Seq[Fact])

final case class Framework(frameworkId: String, rules: Seq[Rule])

object RulesRunner {

  /** Expose the graph as SQL views: `node_<Label>` and
    * `edge_<Src>_<Rel>_<Dst>` — the query surface the reference gets from
    * Neo4j labels (SURVEY §2.9 "Facts become Spark SQL views over
    * node/edge tables"). */
  def registerGraphViews(graph: graft.graph.Graph): Unit = {
    graph.nodes.foreach { case (label, df) =>
      df.createOrReplaceTempView(s"node_$label")
    }
    graph.edges.foreach { case ((s, r, d), df) =>
      df.createOrReplaceTempView(s"edge_${s}_${r}_$d")
    }
  }

  /** Execute every fact of the framework → unioned findings dataset with
    * columns (framework_id, rule_id, fact_id, asset_label, asset_id,
    * detail). Reference runner: runners.py:72-186 (one pydantic Finding
    * per row, keyed by identity_fields). */
  def run(spark: SparkSession, framework: Framework): DataFrame = {
    val parts = for {
      rule <- framework.rules
      fact <- rule.facts
    } yield {
      val result = fact.query(spark)
      result.select(
        lit(framework.frameworkId).as("framework_id"),
        lit(rule.ruleId).as("rule_id"),
        lit(fact.factId).as("fact_id"),
        lit(fact.assetLabel).as("asset_label"),
        col("asset_id").cast("string").as("asset_id"),
        (if (result.columns.contains("detail")) col("detail").cast("string")
         else lit(null).cast("string")).as("detail"))
    }
    parts.reduce(_ unionByName _)
  }

  /** Per-fact finding counts (reference cypher_count_query analog). */
  def counts(findings: DataFrame): DataFrame =
    findings.groupBy(col("framework_id"), col("rule_id"), col("fact_id"))
      .agg(count(lit(1)).as("n_findings"))

  private val Reserved = Set("framework_id", "rule_id", "fact_id", "asset_label")

  /** Static fact validation (reference model.py:32-123 parses the final
    * RETURN projection and checks aliases against reserved fields; here
    * Catalyst's analyzed schema gives the projection for free). Returns
    * one error string per violation; empty = valid. */
  def validate(spark: SparkSession, framework: Framework): Seq[String] =
    for {
      rule <- framework.rules
      fact <- rule.facts
      err <- {
        val cols =
          try Right(fact.query(spark).schema.fieldNames.toSeq)
          catch { case e: Throwable => Left(s"analysis failed: ${e.getMessage}") }
        cols match {
          case Left(msg) => Seq(s"${fact.factId}: $msg")
          case Right(names) =>
            val missing =
              if (names.contains("asset_id")) Nil
              else Seq(s"${fact.factId}: query must project an asset_id column")
            val reserved = names.filter(Reserved)
              .map(n => s"${fact.factId}: projection uses reserved column '$n'")
            missing ++ reserved
        }
      }
    } yield err
}
