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

final case class Rule(ruleId: String, name: String, facts: Seq[Fact])

final case class Framework(frameworkId: String, rules: Seq[Rule])

object RulesRunner {

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
}
