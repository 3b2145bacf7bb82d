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
  def cisGcp(req: String, title: String): Control = Control(
    "cis gcp foundations benchmark", "cis", "gcp", "4.0", req, title)
  def cisGw(req: String, title: String): Control = Control(
    "cis google workspace foundations benchmark", "cis", "googleworkspace",
    "1.3", req, title)

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
         |FROM rf_base_supplier""".stripMargin,
    // ---- round-16 extension: views for the remaining reference rule
    // files (cartography/rules/data/rules/ carries 37; the r15 library
    // covered ~16). Same dual-rail discipline: deterministic TPC-H
    // derivations, portable SQL only.
    "rf_user_account" ->
      """SELECT CAST(c_custkey AS BIGINT) AS id,
        |  'acct-' || CAST(c_custkey AS STRING) AS name,
        |  c_custkey % 4 <> 0 AS active,
        |  CASE WHEN c_custkey % 5 = 0 THEN false
        |       WHEN c_custkey % 5 = 1 THEN true ELSE NULL END AS has_mfa,
        |  CASE c_custkey % 6 WHEN 0 THEN 'aws' WHEN 1 THEN 'github'
        |    WHEN 2 THEN 'slack' WHEN 3 THEN 'gsuite' WHEN 4 THEN 'okta'
        |    ELSE 'keycloak' END AS source,
        |  CASE WHEN c_custkey % 7 = 0 THEN NULL
        |       ELSE CAST(c_custkey % 25 AS BIGINT) END AS user_id
        |FROM rf_base_customer""".stripMargin,
    "rf_identity_user" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS id,
        |  n_nationkey % 5 <> 0 AS active
        |FROM rf_base_nation""".stripMargin,
    "rf_aws_user_mfa" ->
      """SELECT CAST(s_suppkey AS BIGINT) AS id,
        |  s_suppkey % 4 = 0 AS has_mfa_device,
        |  s_suppkey % 3 = 0 AS console_active
        |FROM rf_base_supplier""".stripMargin,
    "rf_storage_container" ->
      """SELECT CAST(p_partkey AS BIGINT) AS id,
        |  CASE p_partkey % 3 WHEN 0 THEN 'aws' WHEN 1 THEN 'gcp'
        |    ELSE 'azure' END AS provider,
        |  p_partkey % 11 = 0 AS anonymous_access,
        |  p_partkey % 13 = 0 AS policy_allows_all,
        |  CASE WHEN p_partkey % 7 = 0 THEN 'enforced' ELSE '' END
        |    AS public_access_prevention,
        |  p_partkey % 17 = 0 AS binding_public,
        |  CASE p_partkey % 19 WHEN 0 THEN 'Container' WHEN 1 THEN 'Blob'
        |    ELSE 'None' END AS blob_public_access
        |FROM rf_base_part""".stripMargin,
    "rf_snapshot" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS id,
        |  CASE o_orderkey % 3 WHEN 0 THEN 'ebs' WHEN 1 THEN 'rds'
        |    ELSE 'ami' END AS kind,
        |  o_orderkey % 37 = 0 AS is_public,
        |  o_orderkey % 2 = 0 AS encrypted
        |FROM rf_base_orders""".stripMargin,
    "rf_instance" ->
      """SELECT CAST(s_suppkey AS BIGINT) AS id,
        |  CASE WHEN s_suppkey % 3 = 0
        |       THEN '203.0.113.' || CAST(s_suppkey % 250 AS STRING)
        |       ELSE NULL END AS public_ip,
        |  CASE s_suppkey % 23 WHEN 0 THEN 'terminated'
        |    WHEN 1 THEN 'shutting-down' ELSE 'running' END AS state,
        |  CASE WHEN s_suppkey % 4 = 0 THEN '0.0.0.0/0'
        |       ELSE '10.0.0.0/8' END AS cidr,
        |  CASE s_suppkey % 6 WHEN 0 THEN 'tcp' WHEN 1 THEN '-1'
        |    WHEN 2 THEN 'udp' ELSE 'all' END AS protocol,
        |  CAST((s_suppkey % 40) * 10 AS BIGINT) AS from_port,
        |  CAST((s_suppkey % 40) * 10 + 25 AS BIGINT) AS to_port,
        |  s_suppkey % 8 = 0 AS confidential_compute
        |FROM rf_base_supplier""".stripMargin,
    "rf_db_endpoint" ->
      """SELECT CAST(c_custkey AS BIGINT) AS id,
        |  CASE c_custkey % 3 WHEN 0 THEN 'sqlserver' WHEN 1 THEN 'cosmos'
        |    ELSE 'cloudsql' END AS engine,
        |  CASE WHEN c_custkey % 2 = 0 THEN 'Enabled'
        |       ELSE 'Disabled' END AS public_network_access,
        |  CASE WHEN c_custkey % 5 = 0 THEN '0.0.0.0'
        |       ELSE '10.0.0.1' END AS fw_start_ip,
        |  CASE WHEN c_custkey % 7 = 0 THEN '0.0.0.0'
        |       ELSE '255.255.255.255' END AS fw_end_ip,
        |  c_custkey % 11 = 0 AS vnet_filter,
        |  CAST(c_custkey % 4 AS BIGINT) AS ip_range_count,
        |  CASE c_custkey % 4 WHEN 0 THEN '1.0' WHEN 1 THEN '1.1'
        |    WHEN 2 THEN '1.2' ELSE '1.3' END AS min_tls,
        |  c_custkey % 9 = 0 AS has_public_ip
        |FROM rf_base_customer""".stripMargin,
    "rf_k8s_version" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS id,
        |  CASE n_nationkey % 2 WHEN 0 THEN 'eks' ELSE 'gke' END AS distro,
        |  CAST(26 + (n_nationkey % 10) AS BIGINT) AS k8s_minor
        |FROM rf_base_nation""".stripMargin,
    "rf_serverless" ->
      """SELECT CAST(p_partkey AS BIGINT) AS id,
        |  CASE p_partkey % 2 WHEN 0 THEN 'cloud-run'
        |    ELSE 'cloud-function' END AS kind,
        |  CASE WHEN p_partkey % 3 = 0 THEN 'INGRESS_TRAFFIC_ALL'
        |       ELSE 'INGRESS_TRAFFIC_INTERNAL_ONLY' END AS ingress,
        |  p_partkey % 5 = 0 AS binding_public,
        |  p_partkey % 7 = 0 AS binding_conditional,
        |  CASE p_partkey % 4 WHEN 0 THEN 'roles/run.invoker'
        |    WHEN 1 THEN 'roles/cloudfunctions.invoker'
        |    ELSE 'roles/viewer' END AS binding_role,
        |  p_partkey % 2 = 1 AS has_https_trigger
        |FROM rf_base_part""".stripMargin,
    "rf_role_trust" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS id,
        |  o_orderkey % 2 = 0 AS account_in_scope,
        |  o_orderkey % 5 = 0 AS trusts_external_account
        |FROM rf_base_orders""".stripMargin,
    "rf_idp_setting" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS id,
        |  CASE n_nationkey % 4 WHEN 0 THEN 'cloudflare' WHEN 1 THEN 'lastpass'
        |    WHEN 2 THEN 'jumpcloud' ELSE 'okta' END AS provider,
        |  n_nationkey % 3 = 0 AS enforce_mfa,
        |  n_nationkey % 5 = 0 AS principal_disabled
        |FROM rf_base_nation""".stripMargin,
    "rf_region_coverage" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS id,
        |  'region-' || CAST(n_regionkey AS STRING) AS region,
        |  n_nationkey % 3 = 0 AS has_security_hub,
        |  n_nationkey % 2 = 0 AS auto_enable_controls
        |FROM rf_base_nation""".stripMargin,
    "rf_npm_dependency" ->
      """SELECT CAST(p_partkey AS BIGINT) AS id,
        |  CASE p_partkey % 8 WHEN 0 THEN 'chalk' WHEN 1 THEN 'debug'
        |    WHEN 2 THEN 'ansi-regex' WHEN 3 THEN 'color-convert'
        |    WHEN 4 THEN 'backslash' ELSE 'left-pad' END AS dep_name,
        |  CASE p_partkey % 9 WHEN 0 THEN '5.6.1' WHEN 1 THEN '4.4.2'
        |    WHEN 2 THEN '6.2.1' WHEN 3 THEN '3.1.1' WHEN 4 THEN '0.2.1'
        |    ELSE '1.0.0' END AS dep_version
        |FROM rf_base_part""".stripMargin,
    "rf_subimage_module" ->
      """SELECT CAST(p_partkey AS BIGINT) AS id,
        |  'module-' || CAST(p_partkey % 40 AS STRING) AS module_name,
        |  p_partkey % 6 = 0 AS is_configured,
        |  p_partkey % 3 = 0 AS app_present
        |FROM rf_base_part""".stripMargin,
    "rf_tailnet" ->
      """SELECT CAST(r_regionkey AS BIGINT) AS id,
        |  r_regionkey % 2 = 0 AS devices_approval_on,
        |  r_regionkey % 5 = 0 AS log_streaming_on
        |FROM rf_base_region""".stripMargin,
    "rf_databricks_token" ->
      """SELECT CAST(s_suppkey AS BIGINT) AS id,
        |  s_suppkey % 5 <> 0 AS has_expiry
        |FROM rf_base_supplier""".stripMargin,
    "rf_databricks_workspace" ->
      """SELECT CAST(s_suppkey AS BIGINT) AS id,
        |  s_suppkey % 4 = 0 AS ip_acl_enabled
        |FROM rf_base_supplier""".stripMargin,
    "rf_iam_statement" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS id,
        |  CAST(o_custkey AS BIGINT) AS principal_id,
        |  CASE o_custkey % 31 WHEN 0 THEN 'AWSServiceRoleForSupport'
        |    WHEN 1 THEN 'QuickSetup-admin'
        |    WHEN 2 THEN 'OrganizationAccountAccessRole'
        |    ELSE 'principal-' || CAST(o_custkey AS STRING) END AS principal_name,
        |  CASE o_orderkey % 2 WHEN 0 THEN 'Allow' ELSE 'Deny' END AS effect,
        |  CASE o_orderkey % 12
        |    WHEN 0 THEN 'iam:CreateUser' WHEN 1 THEN 'iam:AttachRolePolicy'
        |    WHEN 2 THEN 'iam:PutUserPolicy'
        |    WHEN 3 THEN 'iam:UpdateAssumeRolePolicy'
        |    WHEN 4 THEN 'iam:CreateRole' WHEN 5 THEN 'iam:CreatePolicyVersion'
        |    WHEN 6 THEN 'iam:AddUserToGroup' WHEN 7 THEN 's3:GetObject'
        |    WHEN 8 THEN 'ec2:DescribeInstances' WHEN 9 THEN 'iam:CreatePolicy'
        |    WHEN 10 THEN 'sts:AssumeRole'
        |    ELSE 'logs:PutLogEvents' END AS action,
        |  o_orderkey % 7 = 0 AS on_workload
        |FROM rf_base_orders""".stripMargin,
    "rf_gcp_network" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS id,
        |  CASE WHEN n_nationkey % 6 = 0 THEN 'default'
        |       ELSE 'net-' || CAST(n_nationkey AS STRING) END AS network_name
        |FROM rf_base_nation""".stripMargin,
    "rf_dns_zone" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS id,
        |  CASE WHEN n_nationkey % 2 = 0 THEN 'public'
        |       ELSE 'private' END AS visibility,
        |  n_nationkey % 3 = 0 AS dnssec_enabled,
        |  CASE n_nationkey % 4 WHEN 0 THEN 'rsasha1' WHEN 1 THEN 'rsasha256'
        |    ELSE 'ecdsap256sha256' END AS ksk_algorithm,
        |  CASE n_nationkey % 5 WHEN 0 THEN 'rsasha1'
        |    ELSE 'rsasha256' END AS zsk_algorithm
        |FROM rf_base_nation""".stripMargin,
    "rf_gcp_subnet" ->
      """SELECT CAST(s_suppkey AS BIGINT) AS id,
        |  s_suppkey % 3 = 0 AS flow_logs_enabled
        |FROM rf_base_supplier""".stripMargin,
    "rf_k8s_pod" ->
      """SELECT CAST(c_custkey AS BIGINT) AS id,
        |  CASE c_custkey % 5 WHEN 0 THEN 'default' WHEN 1 THEN 'kube-system'
        |    ELSE 'app-' || CAST(c_custkey % 7 AS STRING) END AS namespace,
        |  c_custkey % 11 = 0 AS host_pid,
        |  c_custkey % 13 = 0 AS host_ipc,
        |  c_custkey % 17 = 0 AS host_network,
        |  c_custkey % 3 = 0 AS seccomp_runtime_default,
        |  c_custkey % 19 = 0 AS sa_token_mounted,
        |  c_custkey % 7 = 0 AS secret_env_ref,
        |  c_custkey % 23 = 0 AS privilege_escalation,
        |  c_custkey % 29 = 0 AS host_path_volume,
        |  c_custkey % 31 = 0 AS host_port_used
        |FROM rf_base_customer""".stripMargin,
    "rf_gw_user" ->
      """SELECT CAST(c_custkey AS BIGINT) AS id,
        |  c_custkey % 40 = 0 AS is_super_admin,
        |  c_custkey % 3 = 0 AS enforce_2sv,
        |  c_custkey % 50 = 0 AS delegated_admin_role
        |FROM rf_base_customer""".stripMargin)

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

  /** Shared principal exclusions of the admin-capability rule family
    * (identity_administration_privileges.py:10-13 and siblings repeat
    * them verbatim): service-linked roles, quick-setup scaffolding, and
    * the org cross-account role are expected to hold IAM powers. */
  private val PrincipalExcl =
    "instr(principal_name, 'AWSServiceRole') <> 1 AND " +
      "instr(principal_name, 'QuickSetup') = 0 AND " +
      "principal_name <> 'OrganizationAccountAccessRole'"

  /** The iam-modification action prefixes the reference matches with
    * STARTS WITH (identity_administration_privileges.py patterns list). */
  private val IamModifyPrefix =
    "(instr(action, 'iam:Create') = 1 OR instr(action, 'iam:Attach') = 1 OR " +
      "instr(action, 'iam:Put') = 1 OR instr(action, 'iam:Update') = 1 OR " +
      "instr(action, 'iam:Add') = 1)"

  /** The managed-port coverage disjunction both instance-exposure rules
    * UNWIND over (compute_instance_exposed.py managed_port list). */
  private val ManagedPortHit =
    Seq(22, 3389, 3306, 5432, 6379, 9200, 27017)
      .map(p => s"(from_port <= $p AND to_port >= $p)")
      .mkString("(", " OR ", ")")

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
        soc2Tsc("cc6.1", "Logical access security over protected assets"))),
    // ---- round-16 extension: the remaining 21 reference rule files,
    // one SqlRule per reference Rule, framework mappings copied from
    // each file's frameworks=(...) tuple.
    SqlRule("mfa-missing", "User accounts missing MFA",
      "Cross-cloud ontology accounts with MFA explicitly false, plus a " +
        "dedicated AWS fact for users without an MFA device (mfa_missing.py).",
      facts = Seq(
        SqlFact("missing-mfa-ontology", "UserAccount with MFA explicitly disabled",
          "UserAccount",
          """SELECT id AS asset_id, source AS detail
            |FROM rf_user_account
            |WHERE has_mfa = false AND source <> 'aws' AND active""".stripMargin),
        SqlFact("missing-mfa-aws", "AWS IAM user without an MFA device", "AWSUser",
          """SELECT id AS asset_id,
            |  CASE WHEN console_active THEN 'console-active'
            |       ELSE 'programmatic-only' END AS detail
            |FROM rf_aws_user_mfa WHERE NOT has_mfa_device""".stripMargin)),
      controls = Seq(
        iso27001("8.5", "Secure authentication"),
        soc2Tsc("cc6.1", "Logical access security over protected assets"))),
    SqlRule("inactive-user-active-accounts", "Active accounts linked to inactive users",
      "Accounts that stay active after their identity was deactivated " +
        "(inactive_user_active_accounts.py).",
      facts = Seq(
        SqlFact("inactive-user-active-account", "Active account of an inactive user",
          "UserAccount",
          """SELECT a.id AS asset_id, 'user-' || CAST(u.id AS STRING) AS detail
            |FROM rf_user_account a JOIN rf_identity_user u ON a.user_id = u.id
            |WHERE COALESCE(u.active, true) = false
            |  AND COALESCE(a.active, false) = true""".stripMargin)),
      controls = Seq(
        iso27001("5.18", "Access rights"),
        soc2Tsc("cc6.2", "User registration, authorization, deprovisioning"))),
    SqlRule("unmanaged-accounts", "User accounts not linked to a user identity",
      "Active accounts with no HAS_ACCOUNT identity link, service " +
        "principals excluded (unmanaged_accounts.py).",
      facts = Seq(
        SqlFact("unmanaged-account", "Account without an identity link", "UserAccount",
          """SELECT id AS asset_id, source AS detail
            |FROM rf_user_account
            |WHERE user_id IS NULL AND COALESCE(active, true)
            |  AND instr(name, 'eks:') <> 1
            |  AND instr(name, 'system:') <> 1""".stripMargin)),
      controls = Seq(
        iso27001("5.16", "Identity management"),
        iso27001("5.18", "Access rights"),
        soc2Tsc("cc6.2", "User registration, authorization, deprovisioning"))),
    SqlRule("object-storage-public", "Object storage open to the internet",
      "Publicly readable buckets/containers across AWS, GCP and Azure " +
        "(object_storage_public.py, one fact per provider).",
      facts = Seq(
        SqlFact("s3-bucket-public", "S3 bucket with anonymous access", "AWSS3Bucket",
          """SELECT id AS asset_id, 'anonymous' AS detail
            |FROM rf_storage_container
            |WHERE provider = 'aws'
            |  AND (anonymous_access OR policy_allows_all)""".stripMargin),
        SqlFact("gcp-bucket-public", "GCP bucket with a public binding", "GCPBucket",
          """SELECT id AS asset_id, 'public-binding' AS detail
            |FROM rf_storage_container
            |WHERE provider = 'gcp'
            |  AND COALESCE(public_access_prevention, '') <> 'enforced'
            |  AND binding_public""".stripMargin),
        SqlFact("azure-blob-public", "Azure blob container public",
          "AzureStorageBlobContainer",
          """SELECT id AS asset_id, blob_public_access AS detail
            |FROM rf_storage_container
            |WHERE provider = 'azure'
            |  AND blob_public_access IN ('Container', 'Blob')""".stripMargin)),
      controls = Seq(
        iso27001("8.3", "Information access restriction"),
        soc2Tsc("cc6.1", "Logical access security over protected assets"),
        soc2Tsc("cc6.6", "Boundary protection against external threats"))),
    SqlRule("public-snapshots", "Publicly shared machine/database snapshots",
      "EBS/RDS snapshots and AMIs marked public (public_snapshots.py).",
      facts = Seq(
        SqlFact("public-snapshot", "Snapshot or image shared publicly", "Snapshot",
          """SELECT id AS asset_id, kind AS detail
            |FROM rf_snapshot WHERE is_public""".stripMargin)),
      controls = Seq(
        iso27001("8.3", "Information access restriction"),
        soc2Tsc("cc6.1", "Logical access security over protected assets"),
        soc2Tsc("cc6.6", "Boundary protection against external threats"),
        soc2Tsc("cc6.7", "Transmission and movement of information"))),
    SqlRule("compute-instance-exposed", "Compute instances exposed to the internet",
      "Running instances behind a world-open rule covering a managed " +
        "port — ssh/rdp/db/cache/search (compute_instance_exposed.py; " +
        "the UNWIND port list becomes a coverage disjunction).",
      facts = Seq(
        SqlFact("instance-managed-port-open", "World-open managed port", "Instance",
          s"""SELECT id AS asset_id, cidr AS detail
             |FROM rf_instance
             |WHERE NOT COALESCE(state, 'running')
             |      IN ('terminated', 'shutting-down')
             |  AND cidr = '0.0.0.0/0'
             |  AND COALESCE(protocol, '') IN ('tcp', '-1', 'all')
             |  AND $ManagedPortHit""".stripMargin)),
      controls = Seq(
        iso27001("8.20", "Network security"),
        soc2Tsc("cc6.6", "Boundary protection against external threats"))),
    SqlRule("database-instance-exposed", "Database endpoints open to the internet",
      "SQL servers with 0.0.0.0 firewall starts and document stores " +
        "without any network restriction (database_instance_exposed.py).",
      facts = Seq(
        SqlFact("sql-server-open-to-world", "SQL server world-open firewall rule",
          "DatabaseServer",
          """SELECT id AS asset_id, engine AS detail
            |FROM rf_db_endpoint
            |WHERE engine = 'sqlserver'
            |  AND COALESCE(public_network_access, 'Enabled') = 'Enabled'
            |  AND fw_start_ip = '0.0.0.0'
            |  AND fw_end_ip IS NOT NULL AND fw_end_ip <> '0.0.0.0'""".stripMargin),
        SqlFact("document-db-unrestricted", "Document DB without network filter",
          "DatabaseAccount",
          """SELECT id AS asset_id, engine AS detail
            |FROM rf_db_endpoint
            |WHERE engine = 'cosmos'
            |  AND public_network_access = 'Enabled'
            |  AND COALESCE(vnet_filter, false) = false
            |  AND ip_range_count = 0""".stripMargin)),
      controls = Seq(
        iso27001("8.20", "Network security"),
        soc2Tsc("cc6.6", "Boundary protection against external threats"))),
    SqlRule("transport-encryption-gaps", "Weak transport encryption floors",
      "Endpoints accepting TLS 1.0/1.1 (transport_encryption_gaps.py).",
      facts = Seq(
        SqlFact("weak-minimum-tls", "Endpoint allowing TLS 1.0/1.1",
          "DatabaseServer",
          """SELECT id AS asset_id, min_tls AS detail
            |FROM rf_db_endpoint
            |WHERE min_tls IN ('1.0', '1.1')""".stripMargin)),
      controls = Seq(
        iso27001("8.24", "Use of cryptography"),
        soc2Tsc("cc6.7", "Transmission and movement of information"))),
    SqlRule("eol-software", "Kubernetes control planes past end of support",
      "EKS clusters below minor 30 and GKE clusters below minor 30 " +
        "(eol_software.py _OLDEST_SUPPORTED_*_KUBERNETES_MINOR).",
      facts = Seq(
        SqlFact("eks-cluster-eol", "EKS cluster on an EOL Kubernetes minor",
          "AWSEKSCluster",
          """SELECT id AS asset_id, '1.' || CAST(k8s_minor AS STRING) AS detail
            |FROM rf_k8s_version
            |WHERE distro = 'eks' AND k8s_minor < 30""".stripMargin),
        SqlFact("gke-cluster-eol", "GKE cluster on an EOL Kubernetes minor",
          "GKECluster",
          """SELECT id AS asset_id, '1.' || CAST(k8s_minor AS STRING) AS detail
            |FROM rf_k8s_version
            |WHERE distro = 'gke' AND k8s_minor < 30""".stripMargin)),
      controls = Seq(
        iso27001("8.8", "Management of technical vulnerabilities"),
        soc2Tsc("cc7.1", "Detection and monitoring of configuration changes"))),
    SqlRule("identity-mfa-gaps", "Tenant-level MFA enforcement disabled",
      "Identity providers whose account/tenant setting does not enforce " +
        "a second factor (identity_mfa_gaps.py).",
      facts = Seq(
        SqlFact("tenant-mfa-not-enforced", "Tenant without MFA enforcement",
          "IdentityTenant",
          """SELECT id AS asset_id, provider AS detail
            |FROM rf_idp_setting
            |WHERE COALESCE(principal_disabled, false) = false
            |  AND NOT enforce_mfa""".stripMargin)),
      controls = Seq(
        iso27001("8.5", "Secure authentication"),
        soc2Tsc("cc6.1", "Logical access security over protected assets"))),
    SqlRule("security-monitoring-gaps", "Security monitoring coverage gaps",
      "Regions with workloads but no Security Hub, and hubs without " +
        "auto-enabled controls (security_monitoring_gaps.py).",
      facts = Seq(
        SqlFact("hub-coverage-gap", "Workload region without Security Hub",
          "AWSAccount",
          """SELECT id AS asset_id, region AS detail
            |FROM rf_region_coverage WHERE NOT has_security_hub""".stripMargin),
        SqlFact("hub-controls-not-auto-enabled", "Hub without auto-enabled controls",
          "AWSSecurityHub",
          """SELECT id AS asset_id, region AS detail
            |FROM rf_region_coverage
            |WHERE has_security_hub
            |  AND COALESCE(auto_enable_controls, false) = false""".stripMargin)),
      controls = Seq(
        iso27001("8.16", "Monitoring activities"),
        iso27001("8.8", "Management of technical vulnerabilities"),
        soc2Tsc("cc7.1", "Detection and monitoring of configuration changes"),
        soc2Tsc("cc7.2", "Monitoring for anomalies"))),
    SqlRule("iam-role-external-account-trust", "Roles trusting external accounts",
      "In-scope roles whose trust policy names a principal owned by an " +
        "account outside the sync scope (iam_role_external_account_trust.py).",
      facts = Seq(
        SqlFact("role-trusts-external-account", "Role trusting an out-of-scope account",
          "AWSRole",
          """SELECT id AS asset_id, 'external-trust' AS detail
            |FROM rf_role_trust
            |WHERE account_in_scope
            |  AND trusts_external_account""".stripMargin)),
      controls = Seq(
        iso27001("5.18", "Access rights"),
        iso27001("8.2", "Privileged access rights"),
        soc2Tsc("cc6.3", "Role-based access and least privilege"),
        soc2Tsc("cc6.6", "Boundary protection against external threats"))),
    SqlRule("serverless-workload-exposed", "Serverless workloads publicly invokable",
      "Cloud Run services with all-traffic ingress plus a public invoker " +
        "binding, and HTTPS-triggered functions with public invoker roles " +
        "(serverless_workload_exposed.py).",
      facts = Seq(
        SqlFact("cloud-run-public-ingress", "Cloud Run service publicly invokable",
          "GCPCloudRunService",
          """SELECT id AS asset_id, ingress AS detail
            |FROM rf_serverless
            |WHERE kind = 'cloud-run' AND ingress = 'INGRESS_TRAFFIC_ALL'
            |  AND binding_public
            |  AND COALESCE(binding_conditional, false) = false
            |  AND binding_role = 'roles/run.invoker'""".stripMargin),
        SqlFact("cloud-function-public", "HTTPS function publicly invokable",
          "GCPCloudFunction",
          """SELECT id AS asset_id, binding_role AS detail
            |FROM rf_serverless
            |WHERE kind = 'cloud-function' AND has_https_trigger
            |  AND binding_public
            |  AND COALESCE(binding_conditional, false) = false
            |  AND binding_role IN ('roles/cloudfunctions.invoker',
            |    'roles/run.invoker')""".stripMargin)),
      controls = Seq(
        iso27001("8.20", "Network security"),
        soc2Tsc("cc6.6", "Boundary protection against external threats"))),
    SqlRule("malicious-npm-dependencies", "Known-malicious npm dependency versions",
      "Dependencies matching the shai-hulud compromised (name, version) " +
        "blocklist (malicious_npm_dependencies_shai_hulud.py).",
      facts = Seq(
        SqlFact("malicious-npm-version", "Dependency on a compromised version",
          "Dependency",
          """SELECT id AS asset_id, dep_name || '@' || dep_version AS detail
            |FROM rf_npm_dependency
            |WHERE (dep_name = 'chalk' AND dep_version = '5.6.1')
            |   OR (dep_name = 'debug' AND dep_version = '4.4.2')
            |   OR (dep_name = 'ansi-regex' AND dep_version = '6.2.1')
            |   OR (dep_name = 'color-convert' AND dep_version = '3.1.1')
            |   OR (dep_name = 'backslash' AND dep_version = '0.2.1')""".stripMargin)),
      controls = Seq(
        iso27001("5.21", "Managing information security in the ICT supply chain"),
        iso27001("8.8", "Management of technical vulnerabilities"),
        soc2Tsc("cc6.8", "Prevention and detection of unauthorized software"),
        soc2Tsc("cc7.1", "Detection and monitoring of configuration changes"))),
    SqlRule("subimage-coverage", "Security modules present but not configured",
      "Installed sub-modules left unconfigured while their app is in the " +
        "inventory (subimage_coverage.py; ships without framework mappings).",
      facts = Seq(
        SqlFact("module-unconfigured", "Module installed but not configured",
          "SubImageModule",
          """SELECT id AS asset_id, module_name AS detail
            |FROM rf_subimage_module
            |WHERE is_configured = false AND app_present""".stripMargin)),
      controls = Seq.empty),
    SqlRule("tailscale-security-gaps", "Tailnet security configuration gaps",
      "Tailnets without device approval and without network log streaming " +
        "(tailscale_security_configuration_gaps.py).",
      facts = Seq(
        SqlFact("tailnet-device-approval-off", "Device approval disabled",
          "TailscaleTailnet",
          """SELECT id AS asset_id, 'device-approval-off' AS detail
            |FROM rf_tailnet WHERE devices_approval_on = false""".stripMargin),
        SqlFact("tailnet-log-streaming-off", "Network log streaming disabled",
          "TailscaleTailnet",
          """SELECT id AS asset_id, 'log-streaming-off' AS detail
            |FROM rf_tailnet WHERE log_streaming_on = false""".stripMargin)),
      controls = Seq(
        iso27001("5.15", "Access control"),
        iso27001("8.15", "Logging"),
        soc2Tsc("cc6.1", "Logical access security over protected assets"),
        soc2Tsc("cc7.2", "Monitoring for anomalies"))),
    SqlRule("databricks-security", "Databricks workspace hardening gaps",
      "Personal access tokens without expiry and workspaces without an IP " +
        "access list (databricks_security.py).",
      facts = Seq(
        SqlFact("databricks-token-no-expiry", "Token that never expires",
          "DatabricksToken",
          """SELECT id AS asset_id, 'no-expiry' AS detail
            |FROM rf_databricks_token WHERE NOT has_expiry""".stripMargin),
        SqlFact("databricks-no-ip-acl", "Workspace without an IP access list",
          "DatabricksWorkspace",
          """SELECT id AS asset_id, 'ip-acl-off' AS detail
            |FROM rf_databricks_workspace WHERE NOT ip_acl_enabled""".stripMargin)),
      controls = Seq(
        iso27001("5.17", "Authentication information"),
        iso27001("8.20", "Network security"),
        iso27001("8.3", "Information access restriction"),
        soc2Tsc("cc6.1", "Logical access security over protected assets"),
        soc2Tsc("cc6.6", "Boundary protection against external threats"),
        soc2Tsc("cc6.7", "Transmission and movement of information"))),
    SqlRule("identity-administration-privileges", "Principals able to administer identities",
      "Allow statements whose actions start with the iam-modification " +
        "prefixes, expected admin principals excluded " +
        "(identity_administration_privileges.py).",
      facts = Seq(
        SqlFact("identity-admin-capability", "Principal with iam-modify actions",
          "AWSPrincipal",
          s"""SELECT principal_id AS asset_id, action AS detail
             |FROM rf_iam_statement
             |WHERE effect = 'Allow' AND $PrincipalExcl
             |  AND $IamModifyPrefix""".stripMargin)),
      controls = Seq(
        iso27001("5.18", "Access rights"),
        iso27001("8.2", "Privileged access rights"),
        soc2Tsc("cc6.3", "Role-based access and least privilege"))),
    SqlRule("policy-administration-privileges", "Principals able to administer policies",
      "Allow statements naming the policy-administration actions exactly " +
        "(policy_administration_privileges.py action list).",
      facts = Seq(
        SqlFact("policy-admin-capability", "Principal with policy-admin actions",
          "AWSPrincipal",
          s"""SELECT principal_id AS asset_id, action AS detail
             |FROM rf_iam_statement
             |WHERE effect = 'Allow' AND $PrincipalExcl
             |  AND action IN ('iam:CreatePolicy', 'iam:CreatePolicyVersion',
             |    'iam:AttachUserPolicy', 'iam:AttachRolePolicy',
             |    'iam:AttachGroupPolicy')""".stripMargin)),
      controls = Seq(
        iso27001("5.18", "Access rights"),
        iso27001("8.2", "Privileged access rights"),
        soc2Tsc("cc6.3", "Role-based access and least privilege"))),
    SqlRule("workload-identity-admin", "Workloads holding identity-admin capabilities",
      "Instance/function roles whose statements carry iam-modification " +
        "actions (workload_identity_admin_capabilities.py).",
      facts = Seq(
        SqlFact("workload-identity-admin-capability", "Workload role with iam-modify",
          "AWSRole",
          s"""SELECT principal_id AS asset_id, action AS detail
             |FROM rf_iam_statement
             |WHERE effect = 'Allow' AND on_workload
             |  AND $IamModifyPrefix""".stripMargin)),
      controls = Seq(
        iso27001("5.18", "Access rights"),
        iso27001("8.2", "Privileged access rights"),
        soc2Tsc("cc6.3", "Role-based access and least privilege"))),
    SqlRule("delegation-boundary-modifiable", "Principals able to move trust boundaries",
      "Allow statements naming iam:UpdateAssumeRolePolicy or " +
        "iam:CreateRole (delegation_boundary_modifiable.py).",
      facts = Seq(
        SqlFact("delegation-boundary-capability", "Principal able to rewrite trust",
          "AWSPrincipal",
          s"""SELECT principal_id AS asset_id, action AS detail
             |FROM rf_iam_statement
             |WHERE effect = 'Allow' AND $PrincipalExcl
             |  AND action IN ('iam:UpdateAssumeRolePolicy',
             |    'iam:CreateRole')""".stripMargin)),
      controls = Seq(
        iso27001("5.18", "Access rights"),
        iso27001("8.2", "Privileged access rights"),
        soc2Tsc("cc6.3", "Role-based access and least privilege"))),
    // cis_4_0_gcp.py: one reference Rule per check, each mapped to its
    // own CIS GCP 4.0 requirement.
    SqlRule("gcp-default-network", "Projects with the default network",
      "Default networks carry permissive pre-created rules (cis_4_0_gcp.py 3.1).",
      facts = Seq(
        SqlFact("gcp-default-network-exists", "Project default network", "GCPVpc",
          """SELECT id AS asset_id, network_name AS detail
            |FROM rf_gcp_network WHERE network_name = 'default'""".stripMargin)),
      controls = Seq(
        cisGcp("3.1", "Ensure the default network does not exist"),
        iso27001("8.20", "Network security"),
        soc2Tsc("cc6.6", "Boundary protection against external threats"))),
    SqlRule("gcp-unrestricted-ssh", "Firewalls allowing unrestricted SSH",
      "World-open ingress covering port 22 (cis_4_0_gcp.py 3.6).",
      facts = Seq(
        SqlFact("gcp-ssh-open", "World-open SSH ingress", "GCPFirewall",
          """SELECT id AS asset_id, cidr AS detail
            |FROM rf_sg_rule
            |WHERE cidr = '0.0.0.0/0'
            |  AND from_port <= 22 AND to_port >= 22""".stripMargin)),
      controls = Seq(
        cisGcp("3.6", "Ensure SSH access is restricted from the internet"),
        iso27001("8.20", "Network security"),
        soc2Tsc("cc6.6", "Boundary protection against external threats"))),
    SqlRule("gcp-unrestricted-rdp", "Firewalls allowing unrestricted RDP",
      "World-open ingress covering port 3389 (cis_4_0_gcp.py 3.7).",
      facts = Seq(
        SqlFact("gcp-rdp-open", "World-open RDP ingress", "GCPFirewall",
          """SELECT id AS asset_id, cidr AS detail
            |FROM rf_sg_rule
            |WHERE cidr = '0.0.0.0/0'
            |  AND from_port <= 3389 AND to_port >= 3389""".stripMargin)),
      controls = Seq(
        cisGcp("3.7", "Ensure RDP access is restricted from the internet"),
        iso27001("8.20", "Network security"),
        soc2Tsc("cc6.6", "Boundary protection against external threats"))),
    SqlRule("gcp-dnssec-disabled", "Public DNS zones without DNSSEC",
      "Public zones with DNSSEC off (cis_4_0_gcp.py 3.3).",
      facts = Seq(
        SqlFact("gcp-dnssec-off", "Public zone without DNSSEC", "GCPDnsZone",
          """SELECT id AS asset_id, 'dnssec-off' AS detail
            |FROM rf_dns_zone
            |WHERE visibility = 'public' AND NOT dnssec_enabled""".stripMargin)),
      controls = Seq(
        cisGcp("3.3", "Ensure DNSSEC is enabled for Cloud DNS"),
        iso27001("8.9", "Configuration management"),
        soc2Tsc("cc6.7", "Transmission and movement of information"))),
    SqlRule("gcp-dnssec-weak-ksk", "DNSSEC key-signing with RSASHA1",
      "Public zones signing keys with RSASHA1 (cis_4_0_gcp.py 3.4).",
      facts = Seq(
        SqlFact("gcp-weak-ksk", "RSASHA1 key-signing key", "GCPDnsZone",
          """SELECT id AS asset_id, ksk_algorithm AS detail
            |FROM rf_dns_zone
            |WHERE visibility = 'public' AND dnssec_enabled
            |  AND ksk_algorithm = 'rsasha1'""".stripMargin)),
      controls = Seq(
        cisGcp("3.4", "Ensure RSASHA1 is not used for the key-signing key"),
        iso27001("8.24", "Use of cryptography"))),
    SqlRule("gcp-dnssec-weak-zsk", "DNSSEC zone-signing with RSASHA1",
      "Public zones signing records with RSASHA1 (cis_4_0_gcp.py 3.5).",
      facts = Seq(
        SqlFact("gcp-weak-zsk", "RSASHA1 zone-signing key", "GCPDnsZone",
          """SELECT id AS asset_id, zsk_algorithm AS detail
            |FROM rf_dns_zone
            |WHERE visibility = 'public' AND dnssec_enabled
            |  AND zsk_algorithm = 'rsasha1'""".stripMargin)),
      controls = Seq(
        cisGcp("3.5", "Ensure RSASHA1 is not used for the zone-signing key"),
        iso27001("8.24", "Use of cryptography"))),
    SqlRule("gcp-subnet-flow-logs", "Subnets without VPC flow logs",
      "Subnets with flow logging disabled (cis_4_0_gcp.py 3.8).",
      facts = Seq(
        SqlFact("gcp-flow-logs-off", "Subnet without compliant flow logs", "GCPSubnet",
          """SELECT id AS asset_id, 'flow-logs-off' AS detail
            |FROM rf_gcp_subnet WHERE NOT flow_logs_enabled""".stripMargin)),
      controls = Seq(
        cisGcp("3.8", "Ensure VPC flow logs are enabled for every subnet"),
        iso27001("8.15", "Logging"),
        soc2Tsc("cc7.2", "Monitoring for anomalies"))),
    SqlRule("gcp-instance-public-ip", "Compute instances with public IPs",
      "Running instances holding an external address (cis_4_0_gcp.py 4.9).",
      facts = Seq(
        SqlFact("gcp-public-ip", "Instance with a public IP", "GCPInstance",
          """SELECT id AS asset_id, public_ip AS detail
            |FROM rf_instance
            |WHERE public_ip IS NOT NULL
            |  AND NOT COALESCE(state, 'running')
            |      IN ('terminated', 'shutting-down')""".stripMargin)),
      controls = Seq(
        cisGcp("4.9", "Ensure instances do not have public IP addresses"),
        iso27001("8.20", "Network security"),
        soc2Tsc("cc6.6", "Boundary protection against external threats"))),
    SqlRule("gcp-confidential-compute", "Instances without Confidential Computing",
      "Running instances without the confidential-compute flag " +
        "(cis_4_0_gcp.py 4.11).",
      facts = Seq(
        SqlFact("gcp-conf-compute-off", "Instance without confidential compute",
          "GCPInstance",
          """SELECT id AS asset_id, 'conf-compute-off' AS detail
            |FROM rf_instance
            |WHERE NOT confidential_compute
            |  AND NOT COALESCE(state, 'running')
            |      IN ('terminated', 'shutting-down')""".stripMargin)),
      controls = Seq(
        cisGcp("4.11", "Ensure Confidential Computing is enabled"),
        iso27001("8.24", "Use of cryptography"))),
    SqlRule("gcp-cloudsql-public-ip", "Cloud SQL instances with public IPs",
      "Database instances reachable on an external address " +
        "(cis_4_0_gcp.py 6.5).",
      facts = Seq(
        SqlFact("gcp-cloudsql-public", "Cloud SQL with a public IP", "GCPSqlInstance",
          """SELECT id AS asset_id, engine AS detail
            |FROM rf_db_endpoint
            |WHERE engine = 'cloudsql' AND has_public_ip""".stripMargin)),
      controls = Seq(
        cisGcp("6.5", "Ensure Cloud SQL instances do not have public IPs"),
        iso27001("8.20", "Network security"),
        soc2Tsc("cc6.6", "Boundary protection against external threats"))),
    // cis_google_workspace.py: five reference Rules over tenant users.
    SqlRule("gw-user-2sv-not-enforced", "Workspace users without enforced 2SV",
      "Non-admin users outside 2-step verification enforcement " +
        "(cis_google_workspace.py 4.1.1.3).",
      facts = Seq(
        SqlFact("gw-user-no-2sv", "User without enforced 2SV", "GoogleWorkspaceUser",
          """SELECT id AS asset_id, 'no-2sv' AS detail
            |FROM rf_gw_user
            |WHERE NOT enforce_2sv AND NOT is_super_admin""".stripMargin)),
      controls = Seq(
        cisGw("4.1.1.3", "Ensure 2-step verification is enforced for users"),
        iso27001("8.5", "Secure authentication"),
        soc2Tsc("cc6.1", "Logical access security over protected assets"))),
    SqlRule("gw-admin-2sv-not-enforced", "Workspace admins without enforced 2SV",
      "Super admins outside 2-step verification enforcement " +
        "(cis_google_workspace.py 4.1.1.1).",
      facts = Seq(
        SqlFact("gw-admin-no-2sv", "Admin without enforced 2SV", "GoogleWorkspaceUser",
          """SELECT id AS asset_id, 'no-2sv' AS detail
            |FROM rf_gw_user
            |WHERE NOT enforce_2sv AND is_super_admin""".stripMargin)),
      controls = Seq(
        cisGw("4.1.1.1", "Ensure 2-step verification is enforced for admins"),
        iso27001("8.5", "Secure authentication"),
        iso27001("8.2", "Privileged access rights"),
        soc2Tsc("cc6.1", "Logical access security over protected assets"))),
    SqlRule("gw-super-admin-count-low", "Too few super admin accounts",
      "Tenants with zero or one super admin (cis_google_workspace.py 1.1.1).",
      facts = Seq(
        SqlFact("gw-too-few-super-admins", "Tenant with <= 1 super admin",
          "GoogleWorkspaceTenant",
          """SELECT CAST(0 AS BIGINT) AS asset_id,
            |  'super-admins=' || CAST(count(*) AS STRING) AS detail
            |FROM rf_gw_user WHERE is_super_admin
            |HAVING count(*) <= 1""".stripMargin)),
      controls = Seq(
        cisGw("1.1.1", "Ensure at least 2 super admin accounts"),
        iso27001("8.2", "Privileged access rights"))),
    SqlRule("gw-super-admin-count-high", "Too many super admin accounts",
      "Tenants with more than four super admins (cis_google_workspace.py 1.1.2).",
      facts = Seq(
        SqlFact("gw-too-many-super-admins", "Tenant with > 4 super admins",
          "GoogleWorkspaceTenant",
          """SELECT CAST(0 AS BIGINT) AS asset_id,
            |  'super-admins=' || CAST(count(*) AS STRING) AS detail
            |FROM rf_gw_user WHERE is_super_admin
            |HAVING count(*) > 4""".stripMargin)),
      controls = Seq(
        cisGw("1.1.2", "Ensure no more than 4 super admin accounts"),
        iso27001("8.2", "Privileged access rights"),
        iso27001("5.18", "Access rights"),
        soc2Tsc("cc6.3", "Role-based access and least privilege"))),
    SqlRule("gw-super-admin-daily-use", "Super admins used for daily administration",
      "Super admin accounts also holding delegated day-to-day admin roles " +
        "(cis_google_workspace.py 1.1.3).",
      facts = Seq(
        SqlFact("gw-super-admin-delegated", "Super admin with a delegated role",
          "GoogleWorkspaceUser",
          """SELECT id AS asset_id, 'delegated-role' AS detail
            |FROM rf_gw_user
            |WHERE is_super_admin AND delegated_admin_role""".stripMargin)),
      controls = Seq(
        cisGw("1.1.3", "Ensure super admins are not used for daily tasks"),
        iso27001("8.2", "Privileged access rights"),
        soc2Tsc("cc6.3", "Role-based access and least privilege"))),
    // cis_kubernetes_workloads.py: one reference Rule per workload check.
    SqlRule("k8s-secrets-in-env", "Pods passing secrets via environment",
      "Secret refs in env vars leak through logs and child processes " +
        "(cis_kubernetes_workloads.py 5.4.1).",
      facts = Seq(
        SqlFact("k8s-secret-env-ref", "Pod with secret env refs", "KubernetesPod",
          """SELECT id AS asset_id, namespace AS detail
            |FROM rf_k8s_pod WHERE secret_env_ref""".stripMargin)),
      controls = Seq(
        cisK8s("5.4.1", "Prefer using secrets as files over env variables"),
        iso27001("5.17", "Authentication information"),
        soc2Tsc("cc6.1", "Logical access security over protected assets"))),
    SqlRule("k8s-sa-tokens-mounted", "Service account tokens auto-mounted",
      "Pods mounting SA tokens they do not need " +
        "(cis_kubernetes_workloads.py 5.1.6).",
      facts = Seq(
        SqlFact("k8s-sa-token-mounted", "Pod with a mounted SA token", "KubernetesPod",
          """SELECT id AS asset_id, namespace AS detail
            |FROM rf_k8s_pod WHERE sa_token_mounted""".stripMargin)),
      controls = Seq(
        cisK8s("5.1.6", "Ensure SA tokens are only mounted where necessary"),
        iso27001("8.2", "Privileged access rights"))),
    SqlRule("k8s-host-namespaces", "Pods sharing host namespaces",
      "Host PID/IPC/network sharing breaks workload isolation " +
        "(cis_kubernetes_workloads.py 5.2.3-5.2.5).",
      facts = Seq(
        SqlFact("k8s-host-pid", "Pod sharing host PID", "KubernetesPod",
          """SELECT id AS asset_id, namespace AS detail
            |FROM rf_k8s_pod WHERE host_pid""".stripMargin),
        SqlFact("k8s-host-ipc", "Pod sharing host IPC", "KubernetesPod",
          """SELECT id AS asset_id, namespace AS detail
            |FROM rf_k8s_pod WHERE host_ipc""".stripMargin),
        SqlFact("k8s-host-network", "Pod sharing host network", "KubernetesPod",
          """SELECT id AS asset_id, namespace AS detail
            |FROM rf_k8s_pod WHERE host_network""".stripMargin)),
      controls = Seq(
        cisK8s("5.2.3", "Minimize admission of pods sharing host namespaces"),
        iso27001("8.20", "Network security"),
        soc2Tsc("cc6.6", "Boundary protection against external threats"))),
    SqlRule("k8s-privilege-escalation", "Containers allowing privilege escalation",
      "allowPrivilegeEscalation=true containers " +
        "(cis_kubernetes_workloads.py 5.2.6).",
      facts = Seq(
        SqlFact("k8s-priv-escalation", "Container allowing escalation", "KubernetesPod",
          """SELECT id AS asset_id, namespace AS detail
            |FROM rf_k8s_pod WHERE privilege_escalation""".stripMargin)),
      controls = Seq(
        cisK8s("5.2.6", "Minimize admission of privilege-escalating containers"),
        iso27001("8.2", "Privileged access rights"),
        soc2Tsc("cc7.1", "Detection and monitoring of configuration changes"))),
    SqlRule("k8s-host-paths", "Pods using hostPath volumes and host ports",
      "Host filesystem mounts and host ports pierce the sandbox " +
        "(cis_kubernetes_workloads.py 5.2.11-5.2.12).",
      facts = Seq(
        SqlFact("k8s-hostpath-volume", "Pod with a hostPath volume", "KubernetesPod",
          """SELECT id AS asset_id, namespace AS detail
            |FROM rf_k8s_pod WHERE host_path_volume""".stripMargin),
        SqlFact("k8s-host-port", "Container binding a host port", "KubernetesPod",
          """SELECT id AS asset_id, namespace AS detail
            |FROM rf_k8s_pod WHERE host_port_used""".stripMargin)),
      controls = Seq(
        cisK8s("5.2.11", "Minimize admission of pods using hostPath volumes"),
        iso27001("8.20", "Network security"))),
    SqlRule("k8s-missing-seccomp", "Pods without RuntimeDefault seccomp",
      "Unconfined syscall surface (cis_kubernetes_workloads.py 5.6.2).",
      facts = Seq(
        SqlFact("k8s-no-seccomp", "Pod without RuntimeDefault seccomp", "KubernetesPod",
          """SELECT id AS asset_id, namespace AS detail
            |FROM rf_k8s_pod WHERE NOT seccomp_runtime_default""".stripMargin)),
      controls = Seq(
        cisK8s("5.6.2", "Ensure seccomp profile is set to RuntimeDefault"),
        iso27001("8.9", "Configuration management"))),
    SqlRule("k8s-default-namespace", "Pods running in the default namespace",
      "No isolation boundary, no scoped RBAC " +
        "(cis_kubernetes_workloads.py 5.6.4).",
      facts = Seq(
        SqlFact("k8s-default-ns-pod", "Pod in the default namespace", "KubernetesPod",
          """SELECT id AS asset_id, namespace AS detail
            |FROM rf_k8s_pod WHERE namespace = 'default'""".stripMargin)),
      controls = Seq(
        cisK8s("5.6.4", "Ensure the default namespace is not used"),
        iso27001("8.9", "Configuration management"))))

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
