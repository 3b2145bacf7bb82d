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
}
