package graft.rules

/** A packaged rule library over the standard graph views — the analog of
  * the reference's shipped rule files (the .py rule definitions under
  * cartography/rules/: 37 of them with metadata, references, and
  * framework mappings). Facts are SQL-as-data ([[Fact.sql]]) over the
  * `node_<Label>` / `edge_<Src>_<Rel>_<Dst>` views registered by
  * [[RulesRunner.registerGraphViews]], so the library is portable to any
  * graph loaded through the engine. Validate against a live graph with
  * [[RulesRunner.validate]] before running.
  */
object CoreFrameworks {

  private val cis = FrameworkControl("cis demo benchmark", "cis", "1.3",
    scope = Some("core"), revision = Some("5.0"))
  private val nist = FrameworkControl("nist cybersecurity framework", "nist",
    "pr.ac-4", scope = Some("core"), revision = Some("2.0"))
  private val soc2 = FrameworkControl("soc 2 trust services criteria", "soc2",
    "cc6.1", scope = Some("core"), revision = Some("2017"))

  /** Assets exposed to the internet AND stale in the current sync — the
    * reference's flagship exposure × hygiene intersection. Parameterize
    * `$UPDATE_TAG` via [[graft.analysis.JobRegistry.substitute]] or
    * inline the tag before running. */
  def exposedStaleAssets(assetLabel: String, tag: Long): Fact = Fact(
    factId = s"exposed-stale-${assetLabel.toLowerCase}",
    name = s"Exposed $assetLabel not seen by the current sync",
    assetLabel = assetLabel,
    query = s => s.sql(
      s"""SELECT id AS asset_id, CAST(lastupdated AS STRING) AS detail
         |FROM node_$assetLabel
         |WHERE exposed = true AND lastupdated <> $tag""".stripMargin),
    description = "An exposure-flagged asset whose last sync tag is stale " +
      "may already be deleted upstream while still reachable.",
    maturity = Maturity.Stable,
    identityFields = Seq("asset_id"),
    countQuery = Some(s => s.sql(
      s"SELECT count(*) AS count FROM node_$assetLabel")))

  /** Instances still allowing IMDSv1 (the canonical compute hygiene
    * rule; reference sample query, docs/usage/samplequeries). */
  val imdsV1Instances: Fact = Fact(
    factId = "imdsv1-enabled-instance",
    name = "Instance allows IMDSv1",
    assetLabel = "Instance",
    query = _.sql(
      """SELECT id AS asset_id, arn AS detail
        |FROM node_Instance WHERE allows_imdsv1 = true""".stripMargin),
    description = "IMDSv1 permits unauthenticated metadata access from the " +
      "instance network namespace; require tokens (IMDSv2).",
    maturity = Maturity.Stable,
    identityFields = Seq("asset_id"),
    countQuery = Some(_.sql("SELECT count(*) AS count FROM node_Instance")))

  /** Tenant-orphaned assets: nodes whose RESOURCE edge is missing — the
    * cross-tenant hygiene invariant scoped cleanup relies on. */
  def tenantOrphans(tenantLabel: String, assetLabel: String): Fact = Fact(
    factId = s"orphaned-${assetLabel.toLowerCase}",
    name = s"$assetLabel without a $tenantLabel attachment",
    assetLabel = assetLabel,
    query = s => s.sql(
      s"""SELECT n.id AS asset_id
         |FROM node_$assetLabel n
         |LEFT ANTI JOIN edge_${tenantLabel}_RESOURCE_$assetLabel e
         |  ON e.dst_id = n.id""".stripMargin),
    description = "Every asset must belong to exactly one sub-resource; an " +
      "orphan escapes scoped cleanup and billing attribution.",
    maturity = Maturity.Experimental,
    identityFields = Seq("asset_id"))

  /** Users without MFA (reference rules/data/rules/mfa_missing.py — the
    * canonical identity-hygiene fact; null counts as missing). */
  val mfaMissingUsers: Fact = Fact(
    factId = "mfa-missing-user",
    name = "User without MFA",
    assetLabel = "User",
    query = _.sql(
      """SELECT id AS asset_id, name AS detail
        |FROM node_User
        |WHERE mfa_enabled = false OR mfa_enabled IS NULL""".stripMargin),
    description = "Interactive identities without a second factor are the " +
      "highest-frequency initial-access path.",
    maturity = Maturity.Stable,
    identityFields = Seq("asset_id"),
    countQuery = Some(_.sql("SELECT count(*) AS count FROM node_User")))

  /** Unencrypted storage assets (reference unencrypted-storage rules,
    * e.g. RDS/S3 encryption facts in rules/data/rules/). */
  def unencryptedStorage(label: String): Fact = Fact(
    factId = s"unencrypted-${label.toLowerCase}",
    name = s"$label without encryption at rest",
    assetLabel = label,
    query = s => s.sql(
      s"""SELECT id AS asset_id
         |FROM node_$label
         |WHERE encrypted = false OR encrypted IS NULL""".stripMargin),
    description = "Storage without at-rest encryption fails most " +
      "compliance baselines; null means the flag was never asserted.",
    maturity = Maturity.Stable,
    identityFields = Seq("asset_id"),
    countQuery = Some(s => s.sql(s"SELECT count(*) AS count FROM node_$label")))

  /** Publicly accessible storage (reference public-exposure bucket facts). */
  def publicStorage(label: String): Fact = Fact(
    factId = s"public-${label.toLowerCase}",
    name = s"$label reachable anonymously",
    assetLabel = label,
    query = s => s.sql(
      s"SELECT id AS asset_id FROM node_$label WHERE public = true"),
    description = "Anonymous-read storage leaks by default; exposure " +
      "must be an explicit, reviewed decision.",
    maturity = Maturity.Stable,
    identityFields = Seq("asset_id"))

  /** Principals holding access edges to an outsized share of resources —
    * the admin-like / over-privilege read (reference
    * client/aws/iam.py get_aws_admin_like_principals; the permission
    * edges come from [[graft.permissions.Permissions.relationshipEdges]]). */
  def overPrivilegedPrincipals(edgeView: String, maxResources: Long): Fact = Fact(
    factId = "over-privileged-principal",
    name = s"Principal can access more than $maxResources resources",
    assetLabel = "Principal",
    query = s => s.sql(
      s"""SELECT src_id AS asset_id, CAST(count(*) AS STRING) AS detail
         |FROM $edgeView
         |GROUP BY src_id HAVING count(*) > $maxResources""".stripMargin),
    description = "Breadth of effective access is the blast-radius metric " +
      "least-privilege reviews start from.",
    maturity = Maturity.Experimental,
    identityFields = Seq("asset_id"))

  /** Credentials older than the rotation window (reference stale/unrotated
    * access-key rules). `nowEpoch` is passed in, never read from the
    * clock — determinism, and the reference parameterizes analysis time
    * the same way. */
  def staleCredentials(maxAgeDays: Long, nowEpoch: Long): Fact = Fact(
    factId = "stale-credential",
    name = s"Credential older than $maxAgeDays days",
    assetLabel = "AccessKey",
    query = s => s.sql(
      s"""SELECT id AS asset_id, CAST(owner AS STRING) AS detail
         |FROM node_AccessKey
         |WHERE created_epoch < ${nowEpoch - maxAgeDays * 86400L}""".stripMargin),
    description = "Keys beyond the rotation window raise the odds that a " +
      "leaked credential is still live.",
    maturity = Maturity.Stable,
    identityFields = Seq("asset_id"),
    countQuery = Some(_.sql("SELECT count(*) AS count FROM node_AccessKey")))

  /** Identities the current sync did not touch (reference inactive-user
    * hygiene; the identity analog of exposure×staleness). */
  def inactiveIdentities(tag: Long): Fact = Fact(
    factId = "inactive-identity",
    name = "Identity absent from the current sync",
    assetLabel = "User",
    query = s => s.sql(
      s"""SELECT id AS asset_id, name AS detail
         |FROM node_User WHERE lastupdated <> $tag""".stripMargin),
    description = "An identity no longer returned by the provider but " +
      "still present in the graph is likely deprovisioned upstream.",
    maturity = Maturity.Experimental,
    identityFields = Seq("asset_id"))

  /** Principals holding many access edges granted WITHOUT any policy
    * condition (reference wildcard/conditionless-grant review; condition
    * metadata comes from Permissions.relationshipEdges' has_condition). */
  def unconditionalBroadAccess(edgeView: String, threshold: Long): Fact = Fact(
    factId = "unconditional-broad-access",
    name = s"Principal with > $threshold unconditional grants",
    assetLabel = "Principal",
    query = s => s.sql(
      s"""SELECT src_id AS asset_id, CAST(count(*) AS STRING) AS detail
         |FROM $edgeView WHERE has_condition = false
         |GROUP BY src_id HAVING count(*) > $threshold""".stripMargin),
    description = "Condition-free grants bypass network/tag guardrails; " +
      "breadth without conditions is the first review target.",
    maturity = Maturity.Experimental,
    identityFields = Seq("asset_id"))

  /** Access edges whose endpoints live in different tenants — the
    * cross-account trust review (reference cross-account rules). */
  def crossTenantAccess(edgeView: String, srcView: String,
                        dstView: String): Fact = Fact(
    factId = "cross-tenant-access",
    name = "Access edge spans tenants",
    assetLabel = "Principal",
    query = s => s.sql(
      s"""SELECT e.src_id AS asset_id, e.dst_id AS detail
         |FROM $edgeView e
         |JOIN $srcView s ON e.src_id = s.id
         |JOIN $dstView d ON e.dst_id = d.id
         |WHERE s.tenant <> d.tenant""".stripMargin),
    description = "Cross-tenant access is legitimate only when explicitly " +
      "established; every edge here should map to a reviewed trust.",
    maturity = Maturity.Stable,
    identityFields = Seq("asset_id", "detail"))

  /** The packaged framework: hygiene + exposure rules with compliance
    * mappings and references. `tag` doubles as "now" for the rotation
    * window — update tags ARE epoch seconds in the reference
    * (sync.py:494-496 `int(time.time())`). */
  def coreSecurity(tag: Long): Framework = Framework("core-security", Seq(
    Rule("instance-metadata-hygiene", "Instance metadata service hygiene",
      facts = Seq(imdsV1Instances),
      tags = Seq("compute", "hygiene"),
      description = "Compute instances must require IMDSv2 tokens.",
      version = "1",
      references = Seq(RuleReference(
        "Instance metadata service docs",
        "https://docs.aws.amazon.com/AWSEC2/latest/UserGuide/ec2-instance-metadata.html")),
      frameworks = Seq(cis)),
    Rule("exposure-staleness", "Exposed assets must be fresh",
      facts = Seq(exposedStaleAssets("Instance", tag)),
      tags = Seq("exposure", "sync"),
      description = "Exposure-flagged assets missing from the current sync.",
      version = "1",
      frameworks = Seq(cis, nist)),
    Rule("tenancy-integrity", "Assets must attach to a tenant",
      facts = Seq(tenantOrphans("Account", "Instance")),
      tags = Seq("tenancy"),
      description = "Sub-resource attachment is the scoping key for cleanup.",
      version = "1",
      frameworks = Seq(nist)),
    Rule("identity-hygiene", "Interactive identities require MFA",
      facts = Seq(mfaMissingUsers),
      tags = Seq("identity", "hygiene"),
      description = "Second factor required on every interactive identity.",
      version = "1",
      references = Seq(RuleReference(
        "NIST SP 800-63B authenticator assurance",
        "https://pages.nist.gov/800-63-3/sp800-63b.html")),
      frameworks = Seq(cis, soc2)),
    Rule("storage-protection", "Storage encrypted and non-public",
      facts = Seq(unencryptedStorage("Bucket"), publicStorage("Bucket")),
      tags = Seq("storage", "exposure"),
      description = "At-rest encryption plus no anonymous reachability.",
      version = "1",
      frameworks = Seq(cis, soc2)),
    Rule("least-privilege", "Principal access breadth bounded",
      facts = Seq(overPrivilegedPrincipals(
        "edge_Principal_CAN_ACCESS_Resource", maxResources = 100L)),
      tags = Seq("iam"),
      description = "Flag principals whose effective access exceeds the " +
        "review threshold.",
      version = "1",
      frameworks = Seq(soc2, nist)),
    Rule("credential-hygiene", "Credentials rotated and identities live",
      facts = Seq(
        staleCredentials(maxAgeDays = 90L, nowEpoch = tag),
        inactiveIdentities(tag)),
      tags = Seq("identity", "credentials"),
      description = "Rotation windows enforced; deprovisioned identities " +
        "leave the graph promptly.",
      version = "1",
      frameworks = Seq(cis, soc2)),
    Rule("boundary-integrity", "Access stays conditional and in-tenant",
      facts = Seq(
        unconditionalBroadAccess("edge_Principal_CAN_ACCESS_Resource", 50L),
        crossTenantAccess("edge_Principal_CAN_ACCESS_Resource",
          "node_Principal", "node_Resource")),
      tags = Seq("iam", "tenancy"),
      description = "Broad condition-free grants and unreviewed " +
        "cross-tenant edges are boundary failures.",
      version = "1",
      frameworks = Seq(nist))))

  // scope "27001": this is an Annex-A 2022 control exactly like the
  // ReferenceLibrary's, so it must carry the reference's canonical iso
  // scope (frameworks/iso27001.py ISO27001_SCOPE) — under scope "core"
  // the aliased `iso:27001` filter silently excluded it (r13 ADVICE)
  private val iso = FrameworkControl("iso/iec 27001 annex a", "iso27001",
    "a.8.9", scope = Some("27001"), revision = Some("2022"))
  private val mitre = FrameworkControl("mitre att&ck cloud", "mitre",
    "t1530", scope = Some("cloud"), revision = Some("v15"))

  /** Publicly shared snapshots (reference rule file
    * public_snapshots.py: a shared block/database snapshot is an
    * exfiltration channel that bypasses every access policy on the
    * live resource). */
  def publicSnapshots(label: String = "Snapshot"): Fact = Fact(
    factId = s"public-${label.toLowerCase}",
    name = s"$label shared publicly",
    assetLabel = label,
    query = _.sql(s"SELECT id AS asset_id FROM node_$label WHERE public = true"),
    description = "A publicly shared snapshot exposes the full data of " +
      "its source volume or database regardless of the source's policy.",
    maturity = Maturity.Stable,
    identityFields = Seq("asset_id"),
    countQuery = Some(_.sql(s"SELECT count(*) AS count FROM node_$label")))

  /** Internet-reachable database endpoints
    * (database_instance_exposed.py). */
  val databaseExposed: Fact = Fact(
    factId = "database-exposed",
    name = "Database instance reachable from the internet",
    assetLabel = "Database",
    query = _.sql(
      """SELECT id AS asset_id, endpoint AS detail
        |FROM node_Database
        |WHERE publicly_accessible = true AND endpoint IS NOT NULL""".stripMargin),
    description = "A database with a public endpoint is one credential " +
      "leak away from full data exposure.",
    maturity = Maturity.Stable,
    identityFields = Seq("asset_id"),
    countQuery = Some(_.sql("SELECT count(*) AS count FROM node_Database")))

  /** Software past its end-of-life date (eol_software.py). */
  def eolSoftware(nowEpoch: Long): Fact = Fact(
    factId = "eol-software",
    name = "Software past end-of-life",
    assetLabel = "Software",
    query = _.sql(
      s"""SELECT id AS asset_id, CAST(eol_epoch AS STRING) AS detail
         |FROM node_Software WHERE eol_epoch < $nowEpoch""".stripMargin),
    description = "EOL software receives no security patches; every new " +
      "CVE is permanent.",
    maturity = Maturity.Stable,
    identityFields = Seq("asset_id"),
    countQuery = Some(_.sql("SELECT count(*) AS count FROM node_Software")))

  /** Users absent from the current sync who still own active accounts
    * (inactive_user_active_accounts.py). */
  def inactiveUserActiveAccounts(tag: Long): Fact = Fact(
    factId = "inactive-user-active-account",
    name = "Inactive user still owns an active account",
    assetLabel = "User",
    query = _.sql(
      s"""SELECT u.id AS asset_id, CAST(a.id AS STRING) AS detail
         |FROM node_User u
         |JOIN edge_User_OWNS_Account e ON u.id = e.src_id
         |JOIN node_Account a ON e.dst_id = a.id
         |WHERE u.lastupdated <> $tag AND a.active = true""".stripMargin),
    description = "An account owned by a deprovisioned user keeps its " +
      "access alive after the person is gone.",
    maturity = Maturity.Stable,
    identityFields = Seq("asset_id", "detail"),
    countQuery = Some(_.sql("SELECT count(*) AS count FROM node_User")))

  /** Accounts outside the management plane (unmanaged_accounts.py). */
  val unmanagedAccounts: Fact = Fact(
    factId = "unmanaged-account",
    name = "Account outside management",
    assetLabel = "Account",
    query = _.sql(
      "SELECT id AS asset_id FROM node_Account WHERE managed = false"),
    description = "Unmanaged accounts bypass central policy, rotation, " +
      "and offboarding.",
    maturity = Maturity.Stable,
    identityFields = Seq("asset_id"),
    countQuery = Some(_.sql("SELECT count(*) AS count FROM node_Account")))

  /** Plaintext transport listeners (transport_encryption_gaps.py). */
  val transportEncryptionGaps: Fact = Fact(
    factId = "plaintext-listener",
    name = "Listener accepts unencrypted transport",
    assetLabel = "Listener",
    query = _.sql(
      """SELECT id AS asset_id, protocol AS detail
        |FROM node_Listener WHERE protocol NOT IN ('HTTPS', 'TLS')""".stripMargin),
    description = "Traffic on a plaintext listener is readable and " +
      "modifiable on path.",
    maturity = Maturity.Stable,
    identityFields = Seq("asset_id"),
    countQuery = Some(_.sql("SELECT count(*) AS count FROM node_Listener")))

  /** Second packaged framework — the threat-and-exposure families of the
    * reference rule library (public_snapshots, database_instance_exposed,
    * eol_software, inactive_user_active_accounts, unmanaged_accounts,
    * transport_encryption_gaps), mapped to ISO 27001 / MITRE / SOC 2
    * controls like the reference's framework tables. */
  def threatExposure(tag: Long, nowEpoch: Long): Framework =
    Framework("threat-exposure", Seq(
      Rule("snapshot-exposure", "Snapshots stay private",
        facts = Seq(publicSnapshots()),
        tags = Seq("storage", "exposure"),
        description = "No snapshot may be shared publicly.",
        version = "1",
        frameworks = Seq(iso, mitre)),
      Rule("database-exposure", "Databases stay off the internet",
        facts = Seq(databaseExposed),
        tags = Seq("database", "exposure"),
        description = "Database endpoints must be private.",
        version = "1",
        frameworks = Seq(mitre)),
      Rule("software-lifecycle", "No end-of-life software",
        facts = Seq(eolSoftware(nowEpoch)),
        tags = Seq("vulnerability"),
        description = "EOL software must be upgraded or retired.",
        version = "1",
        frameworks = Seq(iso)),
      Rule("identity-lifecycle", "Accounts tied to live, managed identities",
        facts = Seq(inactiveUserActiveAccounts(tag), unmanagedAccounts),
        tags = Seq("identity"),
        description = "Active accounts require active owners under " +
          "management.",
        version = "1",
        frameworks = Seq(iso, soc2)),
      Rule("transport-encryption", "All transport encrypted",
        facts = Seq(transportEncryptionGaps),
        tags = Seq("network"),
        description = "Every listener terminates TLS.",
        version = "1",
        frameworks = Seq(iso))))
}
