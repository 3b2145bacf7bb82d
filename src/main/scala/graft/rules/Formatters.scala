package graft.rules

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._

/** Findings output formatters — the text and JSON renderings
  * `cartography rules run` prints (reference:
  * cartography/rules/formatters.py:122-184 for the execution summary,
  * cartography/rules/runners.py:96-186 for the per-fact blocks and the
  * FactResult/RuleResult shapes in cartography/rules/spec/result.py).
  *
  * Scale shape: rendering is a terminal read surface, so everything
  * collected is bounded by contract — per fact one 1-row aggregate for
  * the metrics and one `orderBy(identity).limit(maxFindings)` take for
  * the rows (TakeOrderedAndProject, never a full collect). The
  * reference prints findings in Neo4j return order; here samples sort
  * by the fact's identity fields so renderings are deterministic. */
object Formatters {

  /** One executed fact, reduced to what the renderers need (reference
    * FactResult, result.py:41-84). `findings` holds at most
    * `maxFindings` rows as (column → JSON-ready value) pairs in schema
    * order. */
  final case class FactRender(
      factId: String, factName: String, factDescription: String,
      factProvider: String, assetLabel: String, assetIdField: String,
      identityFields: Seq[String],
      nFindings: Long, failing: Long,
      totalAssets: Option[Long], passing: Option[Long],
      findings: Seq[Seq[(String, Any)]], truncated: Boolean)

  /** One executed rule (reference RuleResult, result.py:87-111). */
  final case class RuleRender(
      ruleId: String, ruleName: String, ruleDescription: String,
      tags: Seq[String], controls: Seq[FrameworkControl],
      facts: Seq[FactRender]) {
    def totalFindings: Long = facts.map(_.nFindings).sum
    def totalAssets: Long = facts.flatMap(_.totalAssets).sum
    def totalFailing: Long =
      facts.filter(f => f.totalAssets.isDefined && f.passing.isDefined)
        .map(_.failing).sum
    def totalPassing: Long = facts.flatMap(_.passing).sum
  }

  /** Execute a framework fact-by-fact into renderable results — the
    * runner loop of runners.py:188-257 without the printing. Each fact
    * costs one 1-row metric aggregate, one identity-ordered
    * `limit(maxFindings)` take, and (when declared) its 1-row count
    * query. */
  def execute(spark: SparkSession, framework: Framework,
              maxFindings: Int = 1000): Seq[RuleRender] =
    framework.rules.map { rule =>
      val facts = rule.facts.map { fact =>
        val q = fact.query(spark)
        val m = q.agg(count(lit(1)).as("n"),
            count_distinct(col(fact.assetIdField)).as("fail")).collect()(0)
        val (n, failing) = (m.getLong(0), m.getLong(1))
        val totalAssets = fact.countQuery.map(
          _(spark).select(col("count").cast("long")).collect()(0).getLong(0))
        val names = q.schema.fieldNames.toSeq
        // identity fields first, then every remaining column: a TOTAL
        // order, so the capped take and the 3-row samples are
        // deterministic even when identity values tie across rows
        val order = fact.identityFields ++
          names.filterNot(fact.identityFields.contains)
        val rows = q.orderBy(order.map(col): _*)
          .limit(maxFindings).collect()
        FactRender(fact.factId, fact.name, fact.description,
          fact.module, fact.assetLabel, fact.assetIdField,
          fact.identityFields, n, failing,
          totalAssets, totalAssets.map(_ - failing),
          rows.toSeq.map(r => names.map(c => c -> r.getAs[Any](c))),
          truncated = n > maxFindings)
      }
      RuleRender(rule.ruleId, rule.name, rule.description, rule.tags,
        rule.frameworks, facts)
    }

  private def c(color: Boolean, code: String, s: String): String =
    if (color) s"\u001b[${code}m$s\u001b[0m" else s

  private def truncate(v: Any): String = {
    val s = String.valueOf(v)
    if (s.length > 50) s.substring(0, 47) + "..." else s
  }

  /** Per-fact text blocks + the execution summary, mirroring the
    * reference byte-for-byte where it prints (runners.py:96-160 fact
    * blocks — minus the Neo4j browser link, which has no analog here —
    * and formatters.py:151-183 summary). `color=false` drops the ANSI
    * codes for plain terminals and golden tests. */
  def renderText(results: Seq[RuleRender], color: Boolean = true): String = {
    val sb = new StringBuilder
    // fact numbering is PER RULE: the reference creates a fresh
    // CounterResult in _run_single_rule (runners.py:213), so a framework
    // of single-fact rules prints "Fact 1/1" for each
    for (rule <- results; (f, i) <- rule.facts.zipWithIndex) {
      sb.append("\n").append(
        c(color, "1", s"Fact ${i + 1}/${rule.facts.size}: ${f.factName}")).append("\n")
      def kv(label: String, value: String): Unit =
        sb.append("  ").append(c(color, "36", label.padTo(12, ' ')))
          .append(" ").append(value).append("\n")
      kv("Rule:", s"${rule.ruleId} - ${rule.ruleName}")
      kv("Fact ID:", f.factId)
      kv("Description:", f.factDescription)
      kv("Provider:", f.factProvider)
      f.totalAssets match {
        case Some(total) =>
          kv("Total:", s"$total asset(s)")
          sb.append("  ").append(c(color, "32", "Passing:".padTo(12, ' ')))
            .append(s" ${f.passing.get} asset(s)").append("\n")
          sb.append("  ").append(c(color, "31", "Failing:".padTo(12, ' ')))
            .append(s" ${f.failing} asset(s)").append("\n")
        case None =>
          kv("Findings:", s"${f.nFindings} item(s) found")
      }
      if (f.nFindings > 0) {
        sb.append("    Sample results:\n")
        f.findings.take(3).zipWithIndex.foreach { case (row, i) =>
          val items = row.map { case (k, v) => s"$k=${truncate(v)}" }
          sb.append(s"      ${i + 1}. ${items.mkString(", ")}\n")
        }
        if (f.nFindings > 3)
          sb.append(s"      ... and ${f.nFindings - 3} more " +
            "(use --output json to see all)\n")
      }
    }
    sb.append(renderSummary(results, color))
    sb.toString
  }

  /** The trailing EXECUTION SUMMARY / OVERALL SUMMARY block
    * (formatters.py:151-183). */
  def renderSummary(results: Seq[RuleRender], color: Boolean = true): String = {
    val sb = new StringBuilder
    sb.append("\n").append("=" * 60).append("\n")
    if (results.size == 1)
      sb.append(s"EXECUTION SUMMARY - ${results.head.ruleName}\n")
    else sb.append("OVERALL SUMMARY\n")
    sb.append("=" * 60).append("\n")
    if (results.size > 1) sb.append(s"Rules executed: ${results.size}\n")
    val totalFacts = results.map(_.facts.size).sum
    val totalFindings = results.map(_.totalFindings).sum
    val totalAssets = results.map(_.totalAssets).sum
    val totalPassing = results.map(_.totalPassing).sum
    val totalFailing = results.map(_.totalFailing).sum
    sb.append(s"Total facts: $totalFacts\n")
    if (totalAssets > 0) {
      sb.append(s"Total assets: $totalAssets\n")
      sb.append(c(color, "32", s"Passing: $totalPassing")).append("\n")
      sb.append(c(color, "31", s"Failing: $totalFailing")).append("\n")
      // Locale.ROOT: Python's '{:.1f}' always prints a dot decimal
      sb.append(String.format(java.util.Locale.ROOT,
        "Compliance: %.1f%%\n", Double.box(totalPassing * 100.0 / totalAssets)))
    } else sb.append(s"Total findings: $totalFindings\n")
    // reference condition (formatters.py:176): failing OR findings — a
    // mix of 0-failing count-backed facts with a non-count fact that has
    // findings still prints the cyan "with 0 total findings" line
    if (totalFailing > 0 || totalFindings > 0) {
      val findingsCount = if (totalAssets > 0) totalFailing else totalFindings
      sb.append("\n").append(c(color, "36",
        s"Rule execution completed with $findingsCount total findings")).append("\n")
    } else
      sb.append("\n").append(c(color, "90",
        "Rule execution completed with no findings")).append("\n")
    sb.toString
  }

  // ---- JSON ---------------------------------------------------------

  private def jsonEscape(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case ch if ch < ' ' => sb.append(f"\\u${ch.toInt}%04x")
      case ch => sb.append(ch)
    }
    sb.append("\"").toString
  }

  private def jsonValue(v: Any): String = v match {
    case null => "null"
    case None => "null"
    case RawJson(s) => s
    case Some(x) => jsonValue(x)
    case b: Boolean => b.toString
    case n @ (_: Long | _: Int | _: Short | _: Byte) => n.toString
    case d: Double => if (d.isNaN || d.isInfinite) "null" else d.toString
    case f: Float => jsonValue(f.toDouble)
    case d: java.math.BigDecimal => d.toPlainString
    case d: BigDecimal => d.bigDecimal.toPlainString
    case r: Row => jsonObj(r.schema.fieldNames.toSeq.map(n => n -> r.getAs[Any](n)))
    case s: Seq[_] => s.map(jsonValue).mkString("[", ", ", "]")
    case m: Map[_, _] =>
      jsonObj(m.toSeq.map { case (k, x) => String.valueOf(k) -> x })
    case other => jsonEscape(String.valueOf(other))
  }

  private def jsonObj(fields: Seq[(String, Any)]): String =
    fields.map { case (k, v) => s"${jsonEscape(k)}: ${jsonValue(v)}" }
      .mkString("{", ", ", "}")

  /** JSON rendering of the rule results — the `--output json` branch
    * (formatters.py:148-150: `json.dumps([asdict(r) for r in results])`),
    * same field names as result.py's dataclasses. One JSON array, one
    * object per rule; findings capped upstream by [[execute]]'s
    * `maxFindings` (a `findings_truncated` marker is added where the cap
    * bit — the reference prints unbounded, which a terminal tolerates
    * and a 100-TB read surface must not). */
  def renderJson(results: Seq[RuleRender]): String = {
    val rules = results.map { r =>
      jsonObj(Seq(
        "rule_id" -> r.ruleId,
        "rule_name" -> r.ruleName,
        "rule_description" -> r.ruleDescription,
        "counter" -> RawJson(jsonObj(Seq(
          "current_fact" -> r.facts.size,
          "total_facts" -> r.facts.size,
          "total_findings" -> r.totalFindings,
          "total_assets" -> r.totalAssets,
          "total_failing" -> r.totalFailing,
          "total_passing" -> r.totalPassing))),
        "facts" -> RawJson(r.facts.map { f =>
          jsonObj(Seq(
            "fact_id" -> f.factId,
            "fact_name" -> f.factName,
            "fact_description" -> f.factDescription,
            "fact_provider" -> f.factProvider,
            "findings" -> RawJson(
              f.findings.map(jsonObj).mkString("[", ", ", "]")),
            "total_assets" -> f.totalAssets,
            "failing" -> f.failing,
            "passing" -> f.passing,
            "identity_fields" -> f.identityFields,
            "asset_label" -> f.assetLabel,
            "asset_id_field" -> f.assetIdField) ++
            (if (f.truncated) Seq("findings_truncated" -> true) else Nil))
        }.mkString("[", ", ", "]")),
        "rule_tags" -> r.tags,
        "rule_frameworks" -> RawJson(r.controls.map { fc =>
          jsonObj(Seq(
            "name" -> fc.name,
            "short_name" -> fc.shortName,
            "requirement" -> fc.requirement,
            "scope" -> fc.scope,
            "revision" -> fc.revision,
            "control_title" -> fc.controlTitle))
        }.mkString("[", ", ", "]"))))
    }
    rules.mkString("[", ", ", "]")
  }

  /** Pre-rendered JSON passthrough for [[jsonValue]]. */
  private final case class RawJson(s: String)
}
