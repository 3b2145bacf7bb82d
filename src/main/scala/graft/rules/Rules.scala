package graft.rules

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
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

/** Maturity levels for Facts (reference model.py Maturity enum). */
sealed trait Maturity
object Maturity {
  case object Experimental extends Maturity
  case object Stable extends Maturity
}

/** A reference document for a Rule (reference RuleReference). */
final case class RuleReference(text: String, url: String)

/** A compliance framework requirement/control mapping (reference
  * model.py:286-355 `Framework` dataclass — renamed here to avoid
  * clashing with the rule-collection [[Framework]]). Matching fields are
  * normalized to lowercase; controlTitle keeps display casing. */
final case class FrameworkControl(
    name: String, shortName: String, requirement: String,
    scope: Option[String] = None, revision: Option[String] = None,
    controlTitle: Option[String] = None) {
  private def norm(s: String) = s.toLowerCase
  /** Case-insensitive filter match (reference Framework.matches). */
  def matches(shortName: Option[String] = None, scope: Option[String] = None,
              revision: Option[String] = None): Boolean =
    shortName.forall(f => norm(this.shortName) == norm(f)) &&
      scope.forall(f => this.scope.exists(v => norm(v) == norm(f))) &&
      revision.forall(f => this.revision.exists(v => norm(v) == norm(f)))
}

final case class Fact(
    factId: String,
    name: String,
    assetLabel: String,
    // query returns one row per finding with an `asset_id` column (+detail)
    query: SparkSession => DataFrame,
    description: String = "",
    module: String = "core",
    maturity: Maturity = Maturity.Stable,
    /** Columns forming the stable logical identity of a finding across
      * syncs (reference identity_fields — required non-empty, must be
      * projected by the query). */
    identityFields: Seq[String] = Seq("asset_id"),
    /** The projected column holding the `.id` of the assetLabel node —
      * drives the distinct failing-asset count (reference asset_id_field). */
    assetIdField: String = "asset_id",
    /** Context-rich variant for visual/UI rendering (reference
      * cypher_visual_query — `RETURN *` with extra relationships). */
    visualQuery: Option[SparkSession => DataFrame] = None,
    /** Total count of assets of the evaluated type, matching or not
      * (reference cypher_count_query): one row, one `count` column. */
    countQuery: Option[SparkSession => DataFrame] = None) {
  require(identityFields.nonEmpty,
    s"Fact '$factId' must declare non-empty identityFields")
  require(assetLabel.nonEmpty, s"Fact '$factId' must declare an assetLabel")
}

object Fact {
  /** SQL-text fact over the registered graph views — the closest analog
    * of the reference's `cypher_query` strings (model.py:125-236): the
    * fact is data, not code, and Catalyst analysis validates it.
    * Register views first with [[RulesRunner.registerGraphViews]]. */
  def sql(factId: String, name: String, assetLabel: String, sqlText: String): Fact =
    Fact(factId, name, assetLabel, s => s.sql(sqlText))
}

final case class Rule(ruleId: String, name: String, facts: Seq[Fact],
                      tags: Seq[String] = Nil,
                      description: String = "",
                      version: String = "1",
                      references: Seq[RuleReference] = Nil,
                      /** Compliance control mappings: a rule can map to
                        * many controls and many rules to one control
                        * (reference Rule.frameworks). */
                      frameworks: Seq[FrameworkControl] = Nil) {
  /** True if any mapped control matches the filter
    * (reference Rule.has_framework). */
  def hasFramework(shortName: Option[String] = None, scope: Option[String] = None,
                   revision: Option[String] = None): Boolean =
    frameworks.exists(_.matches(shortName, scope, revision))
}

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

  /** Keep only the rules mapped to a matching framework control
    * (reference runners.py:259-287 filter_rules_by_framework). */
  def filterByFramework(framework: Framework, shortName: Option[String] = None,
                        scope: Option[String] = None,
                        revision: Option[String] = None): Framework =
    framework.copy(rules = framework.rules.filter(
      _.hasFramework(shortName, scope, revision)))

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

  /** Per-fact compliance summary: finding rows, distinct failing assets
    * (distinct assetIdField values — one asset can produce many finding
    * rows, reference asset_id_field doc), and the fact's total asset
    * count when it declares a countQuery (reference cypher_count_query).
    * One unioned plan, one pass. */
  def summary(spark: SparkSession, framework: Framework): DataFrame = {
    val parts = for {
      rule <- framework.rules
      fact <- rule.facts
    } yield {
      val result = fact.query(spark)
      val base = result.agg(
        count(lit(1)).as("n_findings"),
        count_distinct(col(fact.assetIdField)).as("n_failing_assets"))
      val total = fact.countQuery match {
        case Some(q) => q(spark).select(col("count").cast("long").as("n_total_assets"))
        case None => spark.range(1).select(lit(null).cast("long").as("n_total_assets"))
      }
      base.crossJoin(total).select(
        lit(rule.ruleId).as("rule_id"),
        lit(fact.factId).as("fact_id"),
        col("n_findings"), col("n_failing_assets"), col("n_total_assets"))
    }
    parts.reduce(_ unionByName _)
  }

  /** Per-control compliance coverage: one row per (rule, fact, mapped
    * framework control) with finding and distinct-failing-asset counts —
    * the "show me CIS 2.x / SOC 2 CC6.x / ISO A.8.x / NIST AI RMF status"
    * table `cartography rules run --framework` answers per framework,
    * here across every mapped framework in one pass. Each fact executes
    * once; its one-row aggregate fans out to the rule's control mappings
    * as literal columns. */
  def controlSummary(spark: SparkSession, framework: Framework): DataFrame = {
    // one aggregate branch per FACT — not per (fact, control): a fact
    // mapped to 4 controls used to contribute 4 copies of its aggregate
    // subtree to the unioned plan, and with the full 37-file library
    // (79 facts, 241 mappings) the 241-branch plan spent ~6x the r15
    // gate wall in planning/codegen alone. The per-fact aggregates fan
    // out to controls through one broadcast join against the local
    // (rule, fact, control) mapping instead.
    val factAggs = for {
      rule <- framework.rules
      fact <- rule.facts
      if rule.frameworks.nonEmpty
    } yield fact.query(spark)
      .agg(count(lit(1)).as("n_findings"),
        count_distinct(col(fact.assetIdField)).as("n_failing_assets"))
      .select(
        lit(rule.ruleId).cast("string").as("rule_id"),
        lit(fact.factId).cast("string").as("fact_id"),
        col("n_findings"), col("n_failing_assets"))
    val perFact = factAggs.reduce(_ unionByName _)
    val mapping = framework.rules.flatMap(r => r.facts.flatMap(f =>
      r.frameworks.map(c => Row(c.shortName, c.scope.orNull,
        c.revision.orNull, c.requirement, c.controlTitle.orNull,
        r.ruleId, f.factId))))
    val mappingSchema = org.apache.spark.sql.types.StructType(
      Seq("framework", "scope", "revision", "requirement", "control_title",
        "rule_id", "fact_id").map(n =>
        org.apache.spark.sql.types.StructField(n,
          org.apache.spark.sql.types.StringType)))
    val controls = spark.createDataFrame(
      new java.util.ArrayList[Row](mapping.asJava), mappingSchema)
    broadcast(controls).join(perFact, Seq("rule_id", "fact_id"))
      .select(col("framework"), col("scope"), col("revision"),
        col("requirement"), col("control_title"), col("rule_id"),
        col("fact_id"), col("n_findings"), col("n_failing_assets"))
  }

  private val Reserved = Set("framework_id", "rule_id", "fact_id", "asset_label")

  /** Static fact validation (reference model.py:32-123 parses the final
    * RETURN projection and checks aliases against reserved fields; here
    * Catalyst's analyzed schema gives the projection for free). Checks the
    * asset_id column, reserved aliases, and that identityFields and
    * assetIdField are actually projected (reference __post_init__ checks).
    * Returns one error string per violation; empty = valid. */
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
            val idMissing = fact.identityFields.filterNot(names.contains)
              .map(f => s"${fact.factId}: identity field '$f' not projected")
            val anchorMissing =
              if (names.contains(fact.assetIdField)) Nil
              else Seq(s"${fact.factId}: assetIdField '${fact.assetIdField}' not projected")
            missing ++ reserved ++ idMissing ++ anchorMissing
        }
      }
    } yield err
}
