package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.rules._

/** `cartography-rules list` / `frameworks` renderings must mirror the
  * reference CLI (cartography/rules/cli.py list_cmd :236-326,
  * frameworks_cmd :182-234, _format_framework_mapping :143-153):
  * golden strings over a tiny deterministic library, natural-sort
  * ordering checks, and the SyncCli flag wiring over the packaged
  * reference library. Pure metadata — no SparkSession anywhere. */
class RulesCliFormatsSpec extends AnyFunSuite {

  private def fact(id: String, nm: String): Fact =
    Fact(id, nm, "Asset", _ => sys.error("metadata-only: query must not run"),
      description = s"$nm description", module = "storage")

  private val cis10 = FrameworkControl(
    name = "CIS Benchmark", shortName = "cis", requirement = "2.10",
    scope = Some("aws"), revision = Some("6.0.0"),
    controlTitle = Some("Tenth control"))
  private val cis9 = FrameworkControl(
    name = "CIS Benchmark", shortName = "cis", requirement = "2.9",
    scope = Some("aws"), revision = Some("6.0.0"),
    controlTitle = Some("Ninth control"))
  private val soc2 = FrameworkControl(
    name = "SOC 2 TSC", shortName = "soc2", requirement = "cc6.1",
    scope = None, revision = Some("2022"), controlTitle = None)

  private val tiny = Seq(
    Rule("open-buckets", "Public storage", Seq(fact("f1", "Open buckets")),
      description = "Publicly accessible storage",
      references = Seq(RuleReference("CIS docs", "https://example.test/cis")),
      frameworks = Seq(cis10, cis9)),
    Rule("stale-keys", "Credential hygiene",
      Seq(fact("f2", "Stale keys"),
        Fact("f3", "Unused keys", "Key",
          _ => sys.error("metadata-only"), description = "Unused 90d",
          module = "iam", maturity = Maturity.Experimental)),
      frameworks = Seq(soc2)))

  test("list rendering matches the reference layout byte-for-byte") {
    val got = CliFormats.renderRulesList(tiny)
    val want =
      """
        |Available Rules
        |
        |open-buckets
        |  Name:         Public storage
        |  Version:      1
        |  Facts:        1
        |  Frameworks:
        |    - cis:aws:6.0.0 (2.10) Tenth control
        |    - cis:aws:6.0.0 (2.9) Ninth control
        |  References:
        |    - [CIS docs](https://example.test/cis)
        |
        |stale-keys
        |  Name:         Credential hygiene
        |  Version:      1
        |  Facts:        2
        |  Frameworks:
        |    - soc2:2022 (cc6.1)
        |
        |""".stripMargin
    assert(got == want, s"---- got ----\n$got\n---- want ----\n$want")
  }

  test("list with a framework filter selects by short:scope:revision") {
    val got = CliFormats.renderRulesList(tiny, Some("cis:aws"))
    assert(got.contains("Rules matching framework: cis:aws"))
    assert(got.contains("open-buckets") && !got.contains("stale-keys"))
    val e = intercept[IllegalArgumentException] {
      CliFormats.renderRulesList(tiny, Some("cis:gcp"))
    }
    assert(e.getMessage.contains("No rules found"))
  }

  test("rule detail matches the reference layout byte-for-byte") {
    val got = CliFormats.renderRuleDetail(tiny, "stale-keys")
    val want =
      """
        |Credential hygiene
        |ID:  stale-keys
        |
        |Facts (2)
        |
        |f2
        |  Name:        Stale keys
        |  Description: Stale keys description
        |  Maturity:    STABLE
        |  Provider:    storage
        |
        |f3
        |  Name:        Unused keys
        |  Description: Unused 90d
        |  Maturity:    EXPERIMENTAL
        |  Provider:    iam
        |
        |""".stripMargin
    assert(got == want, s"---- got ----\n$got\n---- want ----\n$want")
    val e = intercept[IllegalArgumentException] {
      CliFormats.renderRuleDetail(tiny, "nope")
    }
    assert(e.getMessage.contains("Unknown rule") &&
      e.getMessage.contains("open-buckets"))
  }

  test("frameworks rendering matches the reference layout, controls " +
      "natural-sorted (2.9 before 2.10)") {
    val got = CliFormats.renderFrameworks(tiny)
    val want =
      """
        |Compliance Frameworks
        |
        |CIS
        |  Name: CIS Benchmark
        |  Scope: aws (revisions: 6.0.0)
        |  Rules: 1
        |  Controls:
        |    - cis:aws:6.0.0 (2.9) Ninth control
        |    - cis:aws:6.0.0 (2.10) Tenth control
        |
        |SOC2
        |  Name: SOC 2 TSC
        |  Revisions: 2022
        |  Rules: 1
        |
        |""".stripMargin
    assert(got == want, s"---- got ----\n$got\n---- want ----\n$want")
  }

  test("natural sort tokens: digits compare numerically and before text") {
    import scala.math.Ordering.Implicits._
    def k(s: String) = CliFormats.naturalTokens(Some(s))
    assert(k("2.9") != k("2.10"))
    // requirement ordering drives control order; verified via the golden
    // frameworks test above — here the token shapes themselves
    assert(k("10a") == Vector(Left(BigInt(10)), Right("a")))
    assert(k("A10") == Vector(Right("a"), Left(BigInt(10))))
  }

  test("SyncCli --rules-list / --rules-frameworks render the packaged library") {
    val listAll = SyncCli.rulesMetadataReport(
      SyncCli.parseArgs(Seq("--rules-list"))).get
    assert(listAll.contains("Available Rules"))
    assert(listAll.contains("cis-iam-root"))
    assert(listAll.contains("cis:aws:6.0.0"))

    val filtered = SyncCli.rulesMetadataReport(SyncCli.parseArgs(
      Seq("--rules-list", "--rules-framework", "nist-ai-rmf"))).get
    assert(filtered.contains("Rules matching framework: nist-ai-rmf"))
    assert(!filtered.contains("cis-iam-root"))

    val detail = SyncCli.rulesMetadataReport(
      SyncCli.parseArgs(Seq("--rules-list", "cis-iam-root"))).get
    assert(detail.contains("ID:  cis-iam-root") && detail.contains("Facts (2)"))

    val fws = SyncCli.rulesMetadataReport(
      SyncCli.parseArgs(Seq("--rules-frameworks"))).get
    assert(fws.contains("Compliance Frameworks"))
    assert(fws.contains("CIS") && fws.contains("NIST-AI-RMF"))
    assert(fws.contains("Rules: "))
  }

  test("edge cases mirror cli.py: empty set, zero facts, no-match filter") {
    // no frameworks anywhere → the exact no-frameworks echo (cli.py:192)
    val bare = Rule(ruleId = "bare", name = "Bare", description = "d",
      facts = Seq.empty, version = "1", frameworks = Seq.empty)
    assert(CliFormats.renderFrameworks(Seq(bare)) ==
      "No frameworks found in rules.\n")
    // zero-fact rule: list shows the 0 count, detail renders the empty
    // facts section without a fact block (cli.py loops over nothing)
    val listed = CliFormats.renderRulesList(Seq(bare))
    assert(listed.contains("  Facts:        0\n"))
    val detail = CliFormats.renderRuleDetail(Seq(bare), "bare")
    assert(detail.contains("\nFacts (0)\n"))
    assert(!detail.contains("  Name:        ")) // no fact body
    // filter matching nothing → the reference's stderr message, thrown
    val ex = intercept[IllegalArgumentException](
      CliFormats.renderRulesList(Seq(bare), Some("cis")))
    assert(ex.getMessage == "No rules found matching the filter.")
    // unknown rule detail → red-error shape with the available names
    val ex2 = intercept[IllegalArgumentException](
      CliFormats.renderRuleDetail(Seq(bare), "nope"))
    assert(ex2.getMessage.contains("Unknown rule 'nope'") &&
      ex2.getMessage.contains("bare"))
  }

  test("reference canonical scoped filters alias onto the merged names") {
    // the reference's canonical spellings (runners.py parse_framework_filter
    // short names "iso"/"nist" + scope) must select the same rule sets as
    // this library's merged flat names (r12 ADVICE)
    assert(CliFormats.parseFrameworkFilter("iso:27001") ==
      (Some("iso27001"), Some("27001"), None))
    assert(CliFormats.parseFrameworkFilter("iso") ==
      (Some("iso27001"), None, None))
    assert(CliFormats.parseFrameworkFilter("nist:ai-rmf") ==
      (Some("nist-ai-rmf"), Some("ai-rmf"), None))
    // bare nist stays the NIST CSF control set — aliasing it would hide
    // the packaged CSF framework behind the AI RMF
    assert(CliFormats.parseFrameworkFilter("nist") == (Some("nist"), None, None))
    assert(CliFormats.parseFrameworkFilter("nist:ai-rmf:1.0") ==
      (Some("nist-ai-rmf"), Some("ai-rmf"), Some("1.0")))
    // end-to-end: the scoped spelling renders the same filtered list the
    // flat name does (not "No rules found")
    val viaScoped = SyncCli.rulesMetadataReport(SyncCli.parseArgs(
      Seq("--rules-list", "--rules-framework", "nist:ai-rmf"))).get
    assert(viaScoped.contains("Rules matching framework: nist:ai-rmf"))
    assert(!viaScoped.contains("cis-iam-root"))
  }

  test("iso:27001 selects CoreFrameworks' iso control too (r13 ADVICE)") {
    // CoreFrameworks' Annex-A control previously carried scope "core",
    // so the aliased `iso:27001` (scope kept = "27001") silently dropped
    // every CoreFrameworks rule from the combined inventory while bare
    // `iso` included them — a user migrating the reference's canonical
    // scoped spelling got a silently partial rule set. The control now
    // carries the reference's canonical scope (ISO27001_SCOPE = "27001",
    // frameworks/iso27001.py), so scoped and bare spellings agree.
    val combined = graft.rules.ReferenceLibrary.framework.rules ++
      graft.rules.CoreFrameworks.threatExposure(5000L, 1700000000L).rules
    def ids(filter: String): Set[String] = {
      val (sn, sc, rev) = CliFormats.parseFrameworkFilter(filter)
      combined.filter(_.hasFramework(sn, sc, rev)).map(_.ruleId).toSet
    }
    val scoped = ids("iso:27001")
    assert(scoped.contains("software-lifecycle"), "CoreFrameworks iso rule")
    assert(scoped.contains("snapshot-exposure"))
    // scoped and bare spellings must select the SAME rule set: every iso
    // control in both libraries is the same Annex A 2022 scope
    assert(scoped == ids("iso"))
  }
}
