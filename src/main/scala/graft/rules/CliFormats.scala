package graft.rules

/** Terminal renderings for the rules CLI's `list` and `frameworks`
  * subcommands (reference: cartography/rules/cli.py — `list_cmd` at
  * :236-326, `frameworks_cmd` at :182-234, `_format_framework_mapping`
  * at :143-153, the natural-sort helpers at :155-178, and
  * `get_all_frameworks`/`parse_framework_filter` in runners.py:24-69).
  *
  * Pure driver-side string rendering over the rule METADATA — no query
  * ever executes here, so there is nothing to distribute; the inputs
  * are the same bounded `Rule`/`Fact`/`FrameworkControl` values the
  * runner holds. `color=false` drops the ANSI codes (the golden-spec /
  * plain-terminal shape, matching [[Formatters.renderText]]). */
object CliFormats {

  private def c(color: Boolean, code: String, s: String): String =
    if (color) s"\u001b[${code}m$s\u001b[0m" else s

  /** `short[:scope[:revision]] (requirement) [title]`
    * (cli.py `_format_framework_mapping`). */
  def formatFrameworkMapping(fc: FrameworkControl): String = {
    val parts = Seq(Some(fc.shortName), fc.scope, fc.revision).flatten
    val base = s"${parts.mkString(":")} (${fc.requirement})"
    fc.controlTitle.fold(base)(t => s"$base $t")
  }

  // ---- natural sort (cli.py _natural_sort_key / _framework_sort_key) --

  /** Digit runs compare numerically and sort before text runs, text
    * runs compare case-folded — "2.9" < "2.10", exactly the reference's
    * (0, int) / (1, casefold) token tuples. */
  private[graft] def naturalTokens(v: Option[String]): Vector[Either[BigInt, String]] =
    v.fold(Vector.empty[Either[BigInt, String]]) { s =>
      "\\d+|\\D+".r.findAllIn(s).toVector.map { t =>
        if (t.head.isDigit) Left(BigInt(t)) else Right(t.toLowerCase)
      }
    }

  private implicit val tokenOrdering: Ordering[Either[BigInt, String]] =
    (a, b) => (a, b) match {
      case (Left(x), Left(y)) => x.compare(y)
      case (Right(x), Right(y)) => x.compareTo(y)
      case (Left(_), Right(_)) => -1 // numeric tokens sort first
      case (Right(_), Left(_)) => 1
    }
  private val natOrdering: Ordering[Vector[Either[BigInt, String]]] =
    Ordering.Implicits.seqOrdering

  private def frameworkSortKey(fc: FrameworkControl) =
    (naturalTokens(fc.scope), naturalTokens(fc.revision),
      naturalTokens(Some(fc.requirement)),
      fc.controlTitle.fold("")(_.toLowerCase))
  private val controlOrdering: Ordering[FrameworkControl] =
    Ordering.by(frameworkSortKey)(
      Ordering.Tuple4(natOrdering, natOrdering, natOrdering, Ordering.String))

  /** All unique controls across the library grouped by shortName,
    * shortNames sorted, controls sorted by (scope, revision,
    * requirement) (runners.py `get_all_frameworks`). */
  def allFrameworks(rules: Seq[Rule]): Seq[(String, Seq[FrameworkControl])] =
    rules.flatMap(_.frameworks).distinct
      .groupBy(_.shortName).toSeq.sortBy(_._1)
      .map { case (sn, fcs) =>
        sn -> fcs.sortBy(fc =>
          (fc.scope.getOrElse(""), fc.revision.getOrElse(""), fc.requirement))
      }

  /** `short[:scope[:revision]]` filter → parts (runners.py
    * `parse_framework_filter`). This library's controls carry the merged
    * short names ("iso27001", "nist-ai-rmf"), so those flat filters match
    * directly — the reference's legacy→scoped aliasing is unnecessary.
    * But the reference's CANONICAL scoped spellings (`iso:27001`,
    * `nist:ai-rmf`, bare `iso`) must keep working for users coming from
    * it, so they are aliased onto the merged names here (r12 ADVICE).
    * Bare `nist` stays the NIST CSF control set — only the explicit
    * `nist:ai-rmf` scope selects the AI RMF. */
  def parseFrameworkFilter(filter: String)
      : (Option[String], Option[String], Option[String]) = {
    val parts = filter.split(":", -1)
    val raw = (parts.headOption.filter(_.nonEmpty),
      parts.lift(1).filter(_.nonEmpty),
      parts.lift(2).filter(_.nonEmpty))
    (raw._1.map(_.toLowerCase(java.util.Locale.ROOT)), raw._2) match {
      case (Some("iso"), _)               => (Some("iso27001"), raw._2, raw._3)
      case (Some("nist"), Some("ai-rmf")) => (Some("nist-ai-rmf"), raw._2, raw._3)
      case _                              => raw
    }
  }

  /** The `frameworks` subcommand: every framework referenced by any
    * rule, with its scopes, revisions, rule count, and titled controls
    * (cli.py `frameworks_cmd`). */
  def renderFrameworks(rules: Seq[Rule], color: Boolean = false): String = {
    val fws = allFrameworks(rules)
    if (fws.isEmpty) return "No frameworks found in rules.\n"
    val sb = new StringBuilder
    sb.append(c(color, "1", "\nCompliance Frameworks\n")).append("\n")
    for ((shortName, fcs) <- fws) {
      sb.append(c(color, "36", shortName.toUpperCase)).append("\n")
      sb.append(s"  Name: ${fcs.head.name}\n")
      val scopes = fcs.groupBy(_.scope).view
        .mapValues(_.flatMap(_.revision).distinct.sorted).toSeq
        .sortBy(_._1.getOrElse(""))
      for ((scope, revs) <- scopes) scope match {
        case Some(s) if revs.nonEmpty =>
          sb.append(s"  Scope: $s (revisions: ${revs.mkString(", ")})\n")
        case Some(s) => sb.append(s"  Scope: $s\n")
        case None if revs.nonEmpty =>
          sb.append(s"  Revisions: ${revs.mkString(", ")}\n")
        case None => ()
      }
      val ruleCount = rules.count(_.hasFramework(Some(shortName)))
      sb.append(s"  Rules: $ruleCount\n")
      val titled = fcs.filter(_.controlTitle.isDefined).distinct
        .sorted(controlOrdering)
      if (titled.nonEmpty) {
        sb.append("  Controls:\n")
        titled.foreach(fc =>
          sb.append(s"    - ${formatFrameworkMapping(fc)}\n"))
      }
      sb.append("\n")
    }
    sb.toString
  }

  /** The `list` subcommand without a rule argument: the rule inventory,
    * optionally filtered by `short[:scope[:revision]]` (cli.py
    * `list_cmd`, no-rule branch). Throws when the filter matches
    * nothing (the reference echoes to stderr and exits 1). */
  def renderRulesList(rules: Seq[Rule], frameworkFilter: Option[String] = None,
                      color: Boolean = false): String = {
    val sb = new StringBuilder
    val parsed = frameworkFilter.map(parseFrameworkFilter)
    frameworkFilter match {
      case Some(f) =>
        sb.append(c(color, "1", s"\nRules matching framework: $f\n")).append("\n")
      case None => sb.append(c(color, "1", "\nAvailable Rules\n")).append("\n")
    }
    val selected = rules.filter(r => parsed.forall {
      case (sn, sc, rev) => r.hasFramework(sn, sc, rev)
    })
    if (selected.isEmpty)
      throw new IllegalArgumentException("No rules found matching the filter.")
    for (rule <- selected) {
      sb.append(c(color, "36", rule.ruleId)).append("\n")
      sb.append(s"  Name:         ${rule.name}\n")
      sb.append(s"  Version:      ${rule.version}\n")
      sb.append(s"  Facts:        ${rule.facts.size}\n")
      if (rule.frameworks.nonEmpty) {
        sb.append("  Frameworks:\n")
        rule.frameworks.foreach(fc =>
          sb.append(s"    - ${formatFrameworkMapping(fc)}\n"))
      }
      if (rule.references.nonEmpty) {
        sb.append("  References:\n")
        rule.references.foreach(ref =>
          sb.append(s"    - [${ref.text}](${ref.url})\n"))
      }
      sb.append("\n")
    }
    sb.toString
  }

  /** The `list <rule>` branch: one rule's fact inventory (cli.py
    * `list_cmd`, rule branch). Unknown rule → throw with the available
    * names, mirroring the reference's red error + exit 1. */
  def renderRuleDetail(rules: Seq[Rule], ruleId: String,
                       color: Boolean = false): String = {
    val rule = rules.find(_.ruleId == ruleId).getOrElse(
      throw new IllegalArgumentException(
        s"Error: Unknown rule '$ruleId'. Available: " +
          rules.map(_.ruleId).mkString(", ")))
    val sb = new StringBuilder
    sb.append(c(color, "1", s"\n${rule.name}")).append("\n")
    sb.append(s"ID:  ${rule.ruleId}\n")
    sb.append(c(color, "1", s"\nFacts (${rule.facts.size})\n")).append("\n")
    for (fact <- rule.facts) {
      sb.append(c(color, "36", fact.factId)).append("\n")
      sb.append(s"  Name:        ${fact.name}\n")
      sb.append(s"  Description: ${fact.description}\n")
      val maturity = fact.maturity match {
        case Maturity.Stable => "STABLE"
        case Maturity.Experimental => "EXPERIMENTAL"
      }
      sb.append(s"  Maturity:    $maturity\n")
      sb.append(s"  Provider:    ${fact.module}\n")
      sb.append("\n")
    }
    sb.toString
  }
}
