package graft.rules

/** The packaged multi-framework rule library: the four compliance
  * frameworks the reference ships (cartography/rules/data/frameworks/
  * cis.py, soc2.py, iso27001.py, nist_ai_rmf.py) with rule families from
  * its rule files (cis_aws_iam.py, cis_aws_networking.py,
  * cis_aws_logging.py, cis_aws_storage.py, nist_ai_rmf.py) re-expressed
  * as SQL-as-data facts over derived asset views.
  *
  * Everything here is STATIC STRINGS — the same view and fact SQL runs
  * verbatim on Spark (gate) and on DuckDB (oracle), so the library has a
  * single source of truth and the correctness gate compares the engine's
  * rule runner against an independent evaluation of the identical text.
  * Only engine-portable SQL is used (CASE, %, instr, left, ||).
  */
object ReferenceLibrary {

  /** Analysis clock, passed as data like the reference's update tags
    * (sync.py int(time.time()) parameterization) — never the wall clock. */
  val Now = 1700000000L
  private val Day = 86400L

  // ------------------------------------------------------------ frameworks

  /** One framework control mapping (reference Framework dataclass —
    * frameworks/cis.py:1-60 etc. declare (name, short_name, scope,
    * revision, requirement, control_title) exactly like this). */
  final case class Control(name: String, shortName: String, scope: String,
                           revision: String, requirement: String, title: String) {
    def toFrameworkControl: FrameworkControl = FrameworkControl(
      name, shortName, requirement, scope = Some(scope),
      revision = Some(revision), controlTitle = Some(title))
  }

  def cisAws(req: String, title: String): Control = Control(
    "cis aws foundations benchmark", "cis", "aws", "6.0.0", req, title)
  def cisK8s(req: String, title: String): Control = Control(
    "cis kubernetes benchmark", "cis", "kubernetes", "1.12", req, title)
  def soc2Tsc(req: String, title: String): Control = Control(
    "soc 2 trust services criteria", "soc2", "tsc", "2022", req, title)
  def iso27001(req: String, title: String): Control = Control(
    "iso/iec 27001 annex a", "iso27001", "27001", "2022", req, title)
  def nistAiRmf(req: String, title: String): Control = Control(
    "nist ai risk management framework", "nist-ai-rmf", "ai-rmf", "1.0", req, title)

  // ------------------------------------------------- derived asset views

  /** Derived asset views, deterministic from TPC-H (the gate registers
    * `rf_base_*` views over the parquet tables; the oracle CTEs them).
    * Shapes mirror the node schemas the reference rule files query. */
  val viewSql: Seq[(String, String)] = Seq(
    "rf_root_account" ->
      """SELECT CAST(r_regionkey AS BIGINT) AS id,
        |  r_regionkey % 2 = 0 AS has_access_key,
        |  r_regionkey % 3 = 0 AS mfa_enabled
        |FROM rf_base_region""".stripMargin,
    "rf_account" ->
      "SELECT CAST(r_regionkey AS BIGINT) AS id FROM rf_base_region",
    "rf_access_key" ->
      s"""SELECT CAST(s_suppkey AS BIGINT) AS id,
         |  CAST(s_nationkey AS BIGINT) AS user_id,
         |  s_suppkey % 3 <> 0 AS active,
         |  $Now - (s_suppkey % 90) * $Day AS last_used_epoch,
         |  $Now - (s_suppkey % 200) * $Day AS created_epoch
         |FROM rf_base_supplier""".stripMargin,
    "rf_policy" ->
      """SELECT CAST(p_partkey AS BIGINT) AS id,
        |  p_partkey % 25 = 0 AS admin_wildcard,
        |  p_partkey % 2 = 0 AS attached
        |FROM rf_base_part""".stripMargin,
    "rf_sg_rule" ->
      """SELECT CAST(s_suppkey AS BIGINT) AS id,
        |  CAST(s_nationkey AS BIGINT) AS sg_id,
        |  CASE WHEN s_suppkey % 5 = 0 THEN '0.0.0.0/0' ELSE '10.0.0.0/8' END AS cidr,
        |  (s_suppkey % 40) * 10 AS from_port,
        |  (s_suppkey % 40) * 10 + 15
        |    + CASE WHEN s_suppkey % 11 = 0 THEN 3400 ELSE 0 END AS to_port
        |FROM rf_base_supplier""".stripMargin,
    "rf_security_group" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS id,
        |  n_nationkey % 5 = 0 AS is_default
        |FROM rf_base_nation""".stripMargin,
    "rf_trail" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS id,
        |  CAST(n_regionkey AS BIGINT) AS account_id,
        |  n_nationkey % 7 = 0 AS multi_region,
        |  n_nationkey % 2 = 0 AS enabled,
        |  n_nationkey % 3 = 0 AS log_validation
        |FROM rf_base_nation""".stripMargin,
    "rf_s3_bucket" ->
      """SELECT CAST(p_partkey AS BIGINT) AS id,
        |  p_partkey % 9 <> 0 AS block_public_access
        |FROM rf_base_part""".stripMargin,
    "rf_rds_instance" ->
      """SELECT CAST(s_suppkey AS BIGINT) AS id,
        |  s_suppkey % 6 <> 0 AS encrypted
        |FROM rf_base_supplier""".stripMargin,
    "rf_iam_user" ->
      """SELECT CAST(c_custkey AS BIGINT) AS id,
        |  c_custkey % 50 = 0 AS is_admin
        |FROM rf_base_customer""".stripMargin,
    "rf_third_party_app" ->
      """SELECT CAST(p_partkey AS BIGINT) AS id,
        |  p_name || CASE p_partkey % 13
        |    WHEN 0 THEN ' chatgpt' WHEN 1 THEN ' claude assistant'
        |    WHEN 2 THEN ' llm copilot' WHEN 3 THEN ' genai notetaker'
        |    ELSE '' END AS app_name,
        |  'workspace' AS source
        |FROM rf_base_part""".stripMargin,
    "rf_app_scope" ->
      """SELECT CAST(p_partkey AS BIGINT) AS app_id,
        |  CASE p_partkey % 6
        |    WHEN 0 THEN 'https://mail.google.com/'
        |    WHEN 1 THEN 'https://www.googleapis.com/auth/drive.readonly'
        |    WHEN 2 THEN 'https://www.googleapis.com/auth/gmail.send'
        |    WHEN 3 THEN 'https://www.googleapis.com/auth/contacts'
        |    WHEN 4 THEN 'openid' ELSE 'profile' END AS scope
        |FROM rf_base_part""".stripMargin,
    "rf_app_auth" ->
      """SELECT CAST(o_custkey AS BIGINT) AS user_id,
        |  CAST(o_orderkey % 1000 + 1 AS BIGINT) AS app_id
        |FROM rf_base_orders""".stripMargin,
    "rf_role_binding" ->
      """SELECT CAST(s_suppkey AS BIGINT) AS id,
        |  'user-' || CAST(s_nationkey AS STRING) AS subject,
        |  CASE s_suppkey % 9 WHEN 0 THEN 'cluster-admin' WHEN 1 THEN 'admin'
        |    ELSE 'view' END AS role
        |FROM rf_base_supplier""".stripMargin,
    "rf_k8s_cluster" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS id,
        |  n_nationkey % 4 = 0 AS endpoint_public
        |FROM rf_base_nation""".stripMargin,
    "rf_workflow_step" ->
      """SELECT CAST(p_partkey AS BIGINT) AS id,
        |  CASE p_partkey % 4
        |    WHEN 0 THEN 'actions/checkout@v4'
        |    WHEN 1 THEN 'actions/checkout@8f6b0cfa7c2b28b0f0b0b1a0d1f7a9d3c4e5f6a7'
        |    WHEN 2 THEN 'internal/build@main'
        |    ELSE 'actions/cache@5a3ec84eff668545956fd18022155c47e93e2684' END
        |    AS uses_ref
        |FROM rf_base_part""".stripMargin,
    "rf_guardduty_finding" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS id,
        |  CAST(o_orderkey % 10 AS BIGINT) AS severity,
        |  o_orderkey % 3 = 0 AS archived
        |FROM rf_base_orders""".stripMargin,
    "rf_db_backup" ->
      """SELECT CAST(s_suppkey AS BIGINT) AS id,
        |  CAST(s_suppkey % 8 AS BIGINT) AS retention_days
        |FROM rf_base_supplier""".stripMargin,
    "rf_device" ->
      """SELECT CAST(c_custkey AS BIGINT) AS id,
        |  c_custkey % 6 <> 0 AS disk_encrypted,
        |  c_custkey % 9 <> 0 AS os_current
        |FROM rf_base_customer""".stripMargin,
    "rf_security_product" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS id,
        |  CASE n_nationkey % 3 WHEN 0 THEN 'edr' WHEN 1 THEN 'av'
        |    ELSE 'dlp' END AS product,
        |  n_nationkey % 4 <> 0 AS enabled
        |FROM rf_base_nation""".stripMargin,
    "rf_provider_api_key" ->
      s"""SELECT CAST(s_suppkey AS BIGINT) AS id,
         |  CASE s_suppkey % 6 WHEN 0 THEN 'openai' WHEN 1 THEN 'anthropic'
         |    WHEN 2 THEN 'cohere' WHEN 3 THEN 'internal' WHEN 4 THEN 'gemini'
         |    ELSE 'other' END AS provider,
         |  $Now - (s_suppkey % 365) * $Day AS last_rotated_epoch
         |FROM rf_base_supplier""".stripMargin)

  /** AI-name classification (reference nist_ai_rmf.py:35-55 allowlist
    * terms + heuristic regex, expressed as portable instr checks). */
  private def aiAllowlist(c: String) =
    s"(instr(lower($c), 'chatgpt') > 0 OR instr(lower($c), 'claude') > 0 OR " +
      s"instr(lower($c), 'gemini') > 0 OR instr(lower($c), 'anthropic') > 0 OR " +
      s"instr(lower($c), 'openai') > 0)"
  private def aiHeuristic(c: String) =
    s"(instr(lower($c), 'llm') > 0 OR instr(lower($c), 'genai') > 0 OR " +
      s"instr(lower($c), 'ai assistant') > 0)"
  private def aiMatch(c: String) =
    s"(${aiAllowlist(c)} OR ${aiHeuristic(c)})"

  // ------------------------------------------------------------ rule data

  final case class SqlFact(factId: String, name: String, assetLabel: String,
                           sql: String)
  final case class SqlRule(ruleId: String, name: String, description: String,
                           facts: Seq[SqlFact], controls: Seq[Control])

  val rules: Seq[SqlRule] = Seq(
    SqlRule("cis-iam-root", "Root account locked down",
      "Root credentials must not exist and root must carry MFA " +
        "(cis_aws_iam.py root rules).",
      facts = Seq(
        SqlFact("root-access-key", "Root account has an access key", "RootAccount",
          "SELECT id AS asset_id FROM rf_root_account WHERE has_access_key"),
        SqlFact("root-mfa-missing", "Root account without MFA", "RootAccount",
          "SELECT id AS asset_id FROM rf_root_account WHERE NOT mfa_enabled")),
      controls = Seq(
        cisAws("2.3", "No root user access keys"),
        cisAws("2.4", "MFA enabled for the root user"),
        iso27001("5.17", "Authentication information"),
        soc2Tsc("cc6.1", "Logical access security over protected assets"))),
    SqlRule("cis-iam-credentials", "Credential lifecycle enforced",
      "Unused credentials disabled, one active key per user, rotation " +
        "within 90 days (cis_aws_iam.py credential rules).",
      facts = Seq(
        SqlFact("credential-unused-45d", "Active key unused 45+ days", "AccessKey",
          s"""SELECT id AS asset_id, CAST(user_id AS STRING) AS detail
             |FROM rf_access_key
             |WHERE active AND last_used_epoch < $Now - 45 * $Day""".stripMargin),
        SqlFact("multiple-active-keys", "User with multiple active keys", "IamUser",
          """SELECT user_id AS asset_id, CAST(count(*) AS STRING) AS detail
            |FROM rf_access_key WHERE active
            |GROUP BY user_id HAVING count(*) > 1""".stripMargin),
        SqlFact("key-rotation-90d", "Active key older than 90 days", "AccessKey",
          s"""SELECT id AS asset_id FROM rf_access_key
             |WHERE active AND created_epoch < $Now - 90 * $Day""".stripMargin)),
      controls = Seq(
        cisAws("2.11", "Disable credentials unused for 45 days"),
        cisAws("2.12", "One active access key per user"),
        cisAws("2.13", "Rotate access keys within 90 days"),
        iso27001("5.16", "Identity management"),
        soc2Tsc("cc6.2", "Credential issuance and removal"))),
    SqlRule("cis-iam-least-privilege", "No full administrative policies",
      "Policies granting full *:* must not be attached (cis_aws_iam.py 2.15).",
      facts = Seq(
        SqlFact("full-admin-policy", "Attached full-admin policy", "Policy",
          "SELECT id AS asset_id FROM rf_policy WHERE admin_wildcard AND attached")),
      controls = Seq(
        cisAws("2.15", "No full administrative privilege policies"),
        iso27001("8.2", "Privileged access rights"),
        soc2Tsc("cc6.3", "Role-based access management"))),
    SqlRule("cis-networking", "Network boundaries restricted",
      "No world-open ingress to admin ports; default security groups " +
        "stay closed (cis_aws_networking.py).",
      facts = Seq(
        SqlFact("open-admin-ports", "World-open ingress to an admin port",
          "SecurityGroupRule",
          """SELECT id AS asset_id, CAST(from_port AS STRING) AS detail
            |FROM rf_sg_rule
            |WHERE cidr = '0.0.0.0/0'
            |  AND ((from_port <= 22 AND to_port >= 22)
            |    OR (from_port <= 3389 AND to_port >= 3389))""".stripMargin),
        SqlFact("default-sg-open", "Default security group with open rules",
          "SecurityGroup",
          """SELECT g.id AS asset_id, CAST(count(*) AS STRING) AS detail
            |FROM rf_security_group g
            |JOIN rf_sg_rule r ON r.sg_id = g.id
            |WHERE g.is_default AND r.cidr = '0.0.0.0/0'
            |GROUP BY g.id""".stripMargin)),
      controls = Seq(
        cisAws("6.3", "No ingress from 0.0.0.0/0 to admin ports"),
        cisAws("6.5", "Default security group restricts all traffic"),
        iso27001("8.20", "Network security"),
        soc2Tsc("cc6.6", "Network boundary protection"))),
    SqlRule("cis-logging", "Audit trails on and tamper-evident",
      "Every account carries a multi-region trail; file validation on " +
        "(cis_aws_logging.py).",
      facts = Seq(
        SqlFact("trail-coverage-gap", "Account without a multi-region trail",
          "Account",
          """SELECT a.id AS asset_id FROM rf_account a
            |LEFT JOIN (SELECT DISTINCT account_id FROM rf_trail
            |           WHERE multi_region AND enabled) t
            |  ON t.account_id = a.id
            |WHERE t.account_id IS NULL""".stripMargin),
        SqlFact("trail-no-validation", "Trail without log file validation",
          "Trail",
          "SELECT id AS asset_id FROM rf_trail WHERE enabled AND NOT log_validation")),
      controls = Seq(
        cisAws("4.1", "CloudTrail enabled in all regions"),
        cisAws("4.2", "CloudTrail log file validation enabled"),
        iso27001("8.15", "Logging"),
        soc2Tsc("cc7.2", "Monitoring for anomalies"))),
    SqlRule("cis-storage", "Data stores non-public and encrypted",
      "Block Public Access on object storage; encryption at rest on " +
        "databases (cis_aws_storage.py).",
      facts = Seq(
        SqlFact("s3-bpa-disabled", "Bucket without Block Public Access", "S3Bucket",
          "SELECT id AS asset_id FROM rf_s3_bucket WHERE NOT block_public_access"),
        SqlFact("rds-unencrypted", "Database without encryption at rest",
          "RdsInstance",
          "SELECT id AS asset_id FROM rf_rds_instance WHERE NOT encrypted")),
      controls = Seq(
        cisAws("3.1.4", "S3 Block Public Access enabled"),
        cisAws("3.2.1", "Encryption-at-rest for RDS instances"),
        iso27001("8.24", "Use of cryptography"),
        soc2Tsc("cc6.1", "Logical access security over protected assets"))),
    SqlRule("ai-app-governance", "AI third-party apps inventoried and scoped",
      "AI apps identified (allowlist + heuristic), sensitive OAuth scopes " +
        "flagged, admin authorizations reviewed (nist_ai_rmf.py rules).",
      facts = Seq(
        SqlFact("ai-app-inventory", "Third-party AI application", "ThirdPartyApp",
          s"""SELECT id AS asset_id,
             |  CASE WHEN ${aiAllowlist("app_name")} THEN 'allowlist'
             |    ELSE 'heuristic' END AS detail
             |FROM rf_third_party_app WHERE ${aiMatch("app_name")}""".stripMargin),
        SqlFact("ai-app-sensitive-scopes", "AI app holding a sensitive scope",
          "ThirdPartyApp",
          s"""SELECT a.id AS asset_id, s.scope AS detail
             |FROM rf_third_party_app a
             |JOIN rf_app_scope s ON s.app_id = a.id
             |WHERE ${aiMatch("a.app_name")}
             |  AND (s.scope IN ('https://mail.google.com/',
             |                   'https://www.googleapis.com/auth/gmail.send')
             |    OR left(s.scope, 37) = 'https://www.googleapis.com/auth/drive')""".stripMargin),
        SqlFact("ai-admin-authorizations", "Admin authorized an AI app", "IamUser",
          s"""SELECT u.id AS asset_id, CAST(a.id AS STRING) AS detail
             |FROM rf_iam_user u
             |JOIN rf_app_auth e ON e.user_id = u.id
             |JOIN rf_third_party_app a ON a.id = e.app_id
             |WHERE u.is_admin AND ${aiMatch("a.app_name")}""".stripMargin)),
      controls = Seq(
        nistAiRmf("map 1", "Context is established and understood"),
        nistAiRmf("measure 2", "AI systems evaluated for trustworthy characteristics"),
        nistAiRmf("govern 5", "Engagement with relevant AI actors"),
        iso27001("5.23", "Information security for use of cloud services"),
        soc2Tsc("cc6.3", "Role-based access management"))),
    SqlRule("k8s-rbac", "Cluster RBAC stays least-privilege",
      "cluster-admin bindings are the cluster blast-radius maximum " +
        "(cis_kubernetes_rbac.py).",
      facts = Seq(
        SqlFact("cluster-admin-binding", "Subject bound to cluster-admin",
          "RoleBinding",
          """SELECT id AS asset_id, subject AS detail
            |FROM rf_role_binding WHERE role = 'cluster-admin'""".stripMargin)),
      controls = Seq(
        cisK8s("5.1.1", "Cluster-admin role usage minimized"),
        iso27001("8.2", "Privileged access rights"),
        soc2Tsc("cc6.3", "Role-based access management"))),
    SqlRule("k8s-exposure", "Control planes stay private",
      "A public API endpoint exposes the cluster's full control surface " +
        "(kubernetes_control_plane_exposed.py).",
      facts = Seq(
        SqlFact("control-plane-public", "Cluster API endpoint public",
          "KubernetesCluster",
          "SELECT id AS asset_id FROM rf_k8s_cluster WHERE endpoint_public")),
      controls = Seq(
        cisK8s("5.4.2", "API server not publicly reachable"),
        iso27001("8.20", "Network security"))),
    SqlRule("supply-chain-pinning", "CI dependencies pinned by digest",
      "A workflow step referencing a mutable tag can be repointed by the " +
        "upstream at any time (unpinned_github_actions.py): pinned means " +
        "the ref after '@' is a full 40-hex commit SHA.",
      facts = Seq(
        SqlFact("unpinned-action", "Workflow step not pinned to a SHA",
          "WorkflowStep",
          """SELECT id AS asset_id, uses_ref AS detail
            |FROM rf_workflow_step
            |WHERE instr(uses_ref, '@') > 0
            |  AND length(substr(uses_ref, instr(uses_ref, '@') + 1)) <> 40""".stripMargin)),
      controls = Seq(
        iso27001("5.21", "ICT supply chain security"),
        soc2Tsc("cc8.1", "Change management"))),
    SqlRule("threat-response", "Active detections triaged",
      "Unarchived high-severity detections are live incidents " +
        "(guardduty_active_threat.py).",
      facts = Seq(
        SqlFact("active-high-severity-finding", "Unarchived finding, severity >= 7",
          "SecurityFinding",
          """SELECT id AS asset_id, CAST(severity AS STRING) AS detail
            |FROM rf_guardduty_finding
            |WHERE severity >= 7 AND NOT archived""".stripMargin)),
      controls = Seq(
        soc2Tsc("cc7.2", "Monitoring for anomalies"),
        iso27001("8.16", "Monitoring activities"))),
    SqlRule("backup-resilience", "Databases keep restorable backups",
      "Zero-retention databases cannot be restored (database_backup_gaps.py).",
      facts = Seq(
        SqlFact("db-backup-gap", "Database with zero backup retention",
          "DbInstance",
          "SELECT id AS asset_id FROM rf_db_backup WHERE retention_days = 0")),
      controls = Seq(
        soc2Tsc("a1.2", "Backup and recovery infrastructure"),
        iso27001("8.13", "Information backup"))),
    SqlRule("device-posture", "Endpoints encrypted and patched",
      "Unencrypted disks and stale OS builds are the endpoint loss/exploit " +
        "pair (device_security_posture_gaps.py).",
      facts = Seq(
        SqlFact("device-disk-unencrypted", "Device without disk encryption",
          "Device",
          "SELECT id AS asset_id FROM rf_device WHERE NOT disk_encrypted"),
        SqlFact("device-os-outdated", "Device on an outdated OS build",
          "Device",
          "SELECT id AS asset_id FROM rf_device WHERE NOT os_current")),
      controls = Seq(
        iso27001("8.1", "User endpoint devices"),
        soc2Tsc("cc6.1", "Logical access security over protected assets"))),
    SqlRule("security-product-coverage", "Protection products stay enabled",
      "A deactivated EDR/AV/DLP product is silent coverage loss " +
        "(cloud_security_product_deactivated.py).",
      facts = Seq(
        SqlFact("security-product-deactivated", "Security product disabled",
          "SecurityProduct",
          """SELECT id AS asset_id, product AS detail
            |FROM rf_security_product WHERE NOT enabled""".stripMargin)),
      controls = Seq(
        soc2Tsc("cc7.2", "Monitoring for anomalies"),
        iso27001("8.16", "Monitoring activities"))),
    SqlRule("ai-credential-hygiene", "AI provider keys rotated",
      "API keys for AI providers rotate within 180 days " +
        "(nist_ai_rmf.py ai_provider_api_key_hygiene).",
      facts = Seq(
        SqlFact("ai-api-key-rotation", "Stale AI provider API key", "ProviderApiKey",
          s"""SELECT id AS asset_id, provider AS detail
             |FROM rf_provider_api_key
             |WHERE provider IN ('openai', 'anthropic', 'cohere', 'gemini')
             |  AND last_rotated_epoch < $Now - 180 * $Day""".stripMargin)),
      controls = Seq(
        nistAiRmf("govern 1", "AI risk governance policies in place"),
        iso27001("5.17", "Authentication information"),
        soc2Tsc("cc6.1", "Logical access security over protected assets"))))

  /** The library as an engine [[Framework]]. */
  def framework: Framework = Framework("reference-compliance", rules.map(r =>
    Rule(r.ruleId, r.name,
      facts = r.facts.map(f => Fact.sql(f.factId, f.name, f.assetLabel, f.sql)),
      description = r.description,
      frameworks = r.controls.map(_.toFrameworkControl))))

  /** DuckDB oracle for the control-coverage summary: the SAME view and
    * fact SQL, independently evaluated — one scalar-subquery row per
    * (rule, fact, control) with finding and distinct-failing-asset
    * counts. */
  def oracleSql: String = {
    val bases = Seq("region", "supplier", "part", "nation", "customer", "orders")
      .map(t => s"rf_base_$t AS (SELECT * FROM $t)")
    val views = viewSql.map { case (n, sql) => s"$n AS ($sql)" }
    val blocks = for {
      r <- rules; f <- r.facts; c <- r.controls
    } yield {
      def q(s: String) = s.replace("'", "''")
      s"""SELECT '${q(c.shortName)}' AS framework, '${q(c.scope)}' AS scope,
         |  '${q(c.revision)}' AS revision, '${q(c.requirement)}' AS requirement,
         |  '${q(c.title)}' AS control_title, '${q(r.ruleId)}' AS rule_id,
         |  '${q(f.factId)}' AS fact_id,
         |  (SELECT count(*) FROM (${f.sql}) x) AS n_findings,
         |  (SELECT count(DISTINCT asset_id) FROM (${f.sql}) x) AS n_failing_assets""".stripMargin
    }
    (s"WITH ${(bases ++ views).mkString(",\n")}\n" +
      blocks.mkString("\nUNION ALL\n") +
      "\nORDER BY framework, requirement, rule_id, fact_id")
  }
}
