package graft.ontology

import Mappings.{FieldMapping => F, ModuleMapping => M, NodeMapping => N}

/** The reference's semantic-category mapping corpora, ported as data
  * (cartography/models/ontology/mapping/data/{roles,groups,tenants,cves}.py
  * — every module, node label, field, strategy, required flag and
  * indexed flag). Roles (12 modules / 16 labels) and groups (20 / 22)
  * are the matcher-heaviest categories; tenants (30 modules / 38 node mappings) is the widest
  * and adds empty-field stamp-only mappings plus a label shared by two
  * modules; cves (8 / 8) keys on `cve_id` instead of `name` and carries
  * the 19-field NVD shape with per-provider severity/status value maps.
  * Interpreted by [[Mappings.project]]; density gates
  * `ontology_materialize_{roles,groups,tenants,cves}`.
  */
object MappingData {

  /** PermissionRole fields: name (REQUIRED), type (builtin|custom),
    * scope (org/project/namespace/account/cluster/compartment/global)
    * — roles.py:5-8. */
  val roles: Seq[M] = Seq(
    M("aws", Seq( // roles.py:11-55
      N("AWSRole", Seq(
        F("name", "name", required = true),
        F("type", specialHandling = Some("static_value"), extraValue = Some("custom")),
        F("scope", specialHandling = Some("static_value"), extraValue = Some("account")))),
      N("AWSPermissionSet", Seq(
        F("name", "name", required = true),
        F("type", specialHandling = Some("static_value"), extraValue = Some("custom")),
        F("scope", specialHandling = Some("static_value"), extraValue = Some("org")))))),
    M("azure", Seq( // roles.py:58-72 — type/scope not reliably available
      N("AzureRoleDefinition", Seq(
        F("name", "role_name", required = true))))),
    M("gcp", Seq( // roles.py:75-113
      N("GCPRole", Seq(
        F("name", "title", required = true),
        F("type", "role_type", specialHandling = Some("mapping"),
          extraMap = Map("BASIC" -> "builtin", "PREDEFINED" -> "builtin",
            "CUSTOM" -> "custom")),
        F("scope", "scope", specialHandling = Some("mapping"),
          extraMap = Map("GLOBAL" -> "global", "ORGANIZATION" -> "org",
            "PROJECT" -> "project")))))),
    M("keycloak", Seq( // roles.py:116-130
      N("KeycloakRole", Seq(
        F("name", "name", required = true))))),
    M("salesforce", Seq( // roles.py:316-348
      N("SalesforceProfile", Seq(
        F("name", "name", required = true),
        F("scope", specialHandling = Some("static_value"), extraValue = Some("org")))),
      N("SalesforcePermissionSet", Seq(
        F("name", "name", required = true),
        F("scope", specialHandling = Some("static_value"), extraValue = Some("org")))))),
    M("kubernetes", Seq( // roles.py:133-165
      N("KubernetesRole", Seq(
        F("name", "name", required = true),
        F("scope", specialHandling = Some("static_value"), extraValue = Some("namespace")))),
      N("KubernetesClusterRole", Seq(
        F("name", "name", required = true),
        F("scope", specialHandling = Some("static_value"), extraValue = Some("cluster")))))),
    M("cloudflare", Seq( // roles.py:168-192
      N("CloudflareRole", Seq(
        F("name", "name", required = true),
        F("type", specialHandling = Some("static_value"), extraValue = Some("builtin")),
        F("scope", specialHandling = Some("static_value"), extraValue = Some("account")))))),
    M("oci", Seq( // roles.py:195-215 — scope needs the parent relationship
      N("OCIPolicy", Seq(
        F("name", "name", required = true),
        F("type", specialHandling = Some("static_value"), extraValue = Some("custom")))))),
    M("okta", Seq( // roles.py:218-242
      N("OktaAdministrationRole", Seq(
        F("name", "label", required = true),
        F("type", specialHandling = Some("static_value"), extraValue = Some("builtin")),
        F("scope", specialHandling = Some("static_value"), extraValue = Some("org")))))),
    M("scaleway", Seq( // roles.py:246-276
      N("ScalewayPermissionSet", Seq(
        F("name", "name", required = true),
        F("type", specialHandling = Some("static_value"), extraValue = Some("builtin")),
        F("scope", "scope_type", specialHandling = Some("mapping"),
          extraMap = Map("projects" -> "project", "organization" -> "org",
            "account_root_user" -> "account")))))),
    M("workos", Seq( // roles.py:279-313 — BOTH type and scope map the same
      N("WorkOSRole", Seq( //   provider field through different value maps
        F("name", "name", required = true),
        F("type", "type", specialHandling = Some("mapping"),
          extraMap = Map("EnvironmentRole" -> "custom", "OrganizationRole" -> "custom")),
        F("scope", "type", specialHandling = Some("mapping"),
          extraMap = Map("EnvironmentRole" -> "global", "OrganizationRole" -> "org")))))),
    M("modal", Seq( // roles.py:350-396
      N("ModalWorkspaceRole", Seq(
        F("name", "name", required = true),
        F("type", specialHandling = Some("static_value"), extraValue = Some("builtin")),
        F("scope", specialHandling = Some("static_value"), extraValue = Some("org")))),
      N("ModalEnvironmentRole", Seq(
        F("name", "name", required = true),
        F("type", specialHandling = Some("static_value"), extraValue = Some("builtin")),
        F("scope", specialHandling = Some("static_value"), extraValue = Some("namespace")))))))

  /** UserGroup fields: name (REQUIRED), description (unindexed text),
    * email — groups.py:5-8. */
  val groups: Seq[M] = Seq(
    M("aws", Seq( // groups.py:11-39
      N("AWSGroup", Seq(
        F("name", "name", required = true))),
      N("AWSSSOGroup", Seq(
        F("name", "display_name", required = true),
        F("description", "description", indexed = false))))),
    M("circleci", Seq( // groups.py:357-372
      N("CircleCIGroup", Seq(
        F("name", "name", required = true),
        F("description", "description", indexed = false))))),
    M("salesforce", Seq( // groups.py:374-387
      N("SalesforceGroup", Seq(
        F("name", "name", required = true))))),
    M("duo", Seq( // groups.py:42-57 — provider spells it `desc`
      N("DuoGroup", Seq(
        F("name", "name", required = true),
        F("description", "desc", indexed = false))))),
    M("microsoft", Seq( // groups.py:60-78
      N("EntraGroup", Seq(
        F("name", "display_name", required = true),
        F("description", "description", indexed = false),
        F("email", "mail"))))),
    M("github", Seq( // groups.py:81-99
      N("GitHubTeam", Seq(
        F("name", "name", required = true),
        F("description", "description", indexed = false))))),
    M("gitlab", Seq( // groups.py:102-120
      N("GitLabGroup", Seq(
        F("name", "name", required = true),
        F("description", "description", indexed = false))))),
    M("googleworkspace", Seq( // groups.py:123-141
      N("GoogleWorkspaceGroup", Seq(
        F("name", "display_name", required = true),
        F("description", "description", indexed = false),
        F("email", "email"))))),
    M("gsuite", Seq( // groups.py:144-162
      N("GSuiteGroup", Seq(
        F("name", "name", required = true),
        F("description", "description", indexed = false),
        F("email", "email"))))),
    M("keycloak", Seq( // groups.py:165-183
      N("KeycloakGroup", Seq(
        F("name", "name", required = true),
        F("description", "description", indexed = false))))),
    M("oci", Seq( // groups.py:186-204
      N("OCIGroup", Seq(
        F("name", "name", required = true),
        F("description", "description", indexed = false))))),
    M("okta", Seq( // groups.py:207-226
      N("OktaGroup", Seq(
        F("name", "name", required = true),
        F("description", "description", indexed = false))))),
    M("pagerduty", Seq( // groups.py:229-247
      N("PagerDutyTeam", Seq(
        F("name", "name", required = true),
        F("description", "description", indexed = false))))),
    M("scaleway", Seq( // groups.py:266-285
      N("ScalewayGroup", Seq(
        F("name", "name", required = true),
        F("description", "description", indexed = false))))),
    M("sentry", Seq( // groups.py:250-262
      N("SentryTeam", Seq(
        F("name", "name", required = true))))),
    M("slack", Seq( // groups.py:288-306
      N("SlackGroup", Seq(
        F("name", "name", required = true),
        F("description", "description", indexed = false))))),
    M("tailscale", Seq( // groups.py:309-322
      N("TailscaleGroup", Seq(
        F("name", "name", required = true))))),
    M("kubernetes", Seq( // groups.py:325-340
      N("KubernetesGroup", Seq(
        F("name", "name", required = true))))),
    M("vercel", Seq( // groups.py:342-355
      N("VercelAccessGroup", Seq(
        F("name", "name", required = true))))),
    M("databricks", Seq( // groups.py:389-441 — two labels, one module
      N("DatabricksGroup", Seq(
        F("name", "display_name", required = true))),
      N("DatabricksAccountGroup", Seq(
        F("name", "display_name", required = true))))))

  // ---- Tenant status value maps (tenants.py:12-63,556-568,644-660) ----
  private val AwsAccountStatus = Map(
    "ACTIVE" -> "active", "PENDING_ACTIVATION" -> "unknown",
    "SUSPENDED" -> "suspended", "PENDING_CLOSURE" -> "pending_deletion",
    "CLOSED" -> "closed")
  private val AzureSubscriptionStatus = Map(
    "Enabled" -> "active", "Warned" -> "active", "PastDue" -> "suspended",
    "Disabled" -> "suspended", "Deleted" -> "closed")
  private val DoAccountStatus = Map(
    "active" -> "active", "warning" -> "active", "locked" -> "suspended")
  private val GcpLifecycleStatus = Map(
    "STATE_UNSPECIFIED" -> "unknown", "ACTIVE" -> "active",
    "DELETE_REQUESTED" -> "pending_deletion",
    "DELETE_IN_PROGRESS" -> "pending_deletion")
  private val S1AccountStatus = Map(
    "Active" -> "active", "active" -> "active", "Expired" -> "suspended",
    "Deleted" -> "closed")
  private val SentryOrgStatus = Map(
    "active" -> "active", "pending_deletion" -> "pending_deletion",
    "deletion_in_progress" -> "pending_deletion")
  private val OpenAiProjectStatus = Map(
    "active" -> "active", "archived" -> "closed")
  private val NetlifyAccountStatus = Map(
    "active" -> "active", "trial" -> "active", "trialing" -> "active",
    "frozen" -> "suspended", "suspended" -> "suspended",
    "deactivated" -> "suspended", "disabled" -> "suspended",
    "pending_deletion" -> "pending_deletion", "cancelled" -> "closed",
    "canceled" -> "closed", "closed" -> "closed")
  private val SupabaseProjectStatus = Map(
    "ACTIVE_HEALTHY" -> "active", "ACTIVE_UNHEALTHY" -> "active",
    "INACTIVE" -> "suspended", "PAUSING" -> "suspended",
    "PAUSE_FAILED" -> "suspended", "GOING_DOWN" -> "suspended",
    "REMOVED" -> "closed", "COMING_UP" -> "unknown",
    "INIT_FAILED" -> "unknown", "RESTORING" -> "unknown",
    "RESTORE_FAILED" -> "unknown", "RESTARTING" -> "unknown",
    "RESIZING" -> "unknown", "UPGRADING" -> "unknown",
    "UNKNOWN" -> "unknown")

  /** Tenant fields: name (REQUIRED everywhere it exists), status
    * (normalized to active/suspended/pending_deletion/closed/unknown via
    * per-provider value maps — the generated CASE has no ELSE, so
    * unmapped raw states land on a NULL status), domain — tenants.py:5-10.
    *
    * The widest corpus in the reference's mapping data: 30 modules / 38
    * node mappings over 37 labels in TENANTS_ONTOLOGY_MAPPING registration order
    * (tenants.py:723-776). Exercises two shapes the roles/groups ports
    * did not: EMPTY-FIELD node mappings (azure AzureTenant,
    * SubImageTenant, CrowdstrikeTenant — category membership stamps
    * only, no canonical key, so they can never create or link), and one
    * label mapped by TWO modules (AzureTenant: azure stamps it empty,
    * microsoft maps display_name). */
  val tenants: Seq[M] = Seq(
    M("airbyte", Seq( // tenants.py:67-81
      N("AirbyteOrganization", Seq(F("name", "name", required = true))))),
    M("aws", Seq( // tenants.py:86-115
      N("AWSAccount", Seq(
        F("name", "name", required = true),
        F("status", "state", specialHandling = Some("mapping"),
          extraMap = AwsAccountStatus))),
      N("AWSOrganization", Seq(F("name", "id", required = true))))),
    M("circleci", Seq( // tenants.py:630-648
      N("CircleCIOrganization", Seq(F("name", "name", required = true))))),
    M("azure", Seq( // tenants.py:118-143 — AzureTenant stamps only
      N("AzureTenant", Nil),
      N("AzureSubscription", Seq(
        F("name", "name", required = true),
        F("status", "state", specialHandling = Some("mapping"),
          extraMap = AzureSubscriptionStatus))))),
    M("cloudflare", Seq( // tenants.py:145-160
      N("CloudflareAccount", Seq(F("name", "name", required = true))))),
    M("crowdstrike", Seq( // tenants.py:504-509
      N("CrowdstrikeTenant", Nil))),
    M("digitalocean", Seq( // tenants.py:163-192
      N("DOAccount", Seq(
        F("name", "uuid", required = true),
        F("status", "status", specialHandling = Some("mapping"),
          extraMap = DoAccountStatus))),
      N("DOProject", Seq(F("name", "name", required = true))))),
    M("netlify", Seq( // tenants.py:579-601
      N("NetlifyAccount", Seq(
        F("name", "name", required = true),
        F("status", "lifecycle_state", specialHandling = Some("mapping"),
          extraMap = NetlifyAccountStatus))))),
    M("microsoft", Seq( // tenants.py:195-211 — 2nd module on AzureTenant
      N("AzureTenant", Seq(F("name", "display_name", required = true))))),
    M("gcp", Seq( // tenants.py:215-250
      N("GCPOrganization", Seq(
        F("name", "displayname", required = true),
        F("status", "lifecyclestate", specialHandling = Some("mapping"),
          extraMap = GcpLifecycleStatus))),
      N("GCPProject", Seq(
        F("name", "displayname", required = true),
        F("status", "lifecyclestate", specialHandling = Some("mapping"),
          extraMap = GcpLifecycleStatus))))),
    M("github", Seq( // tenants.py:252-267
      N("GitHubOrganization", Seq(F("name", "username", required = true))))),
    M("googleworkspace", Seq( // tenants.py:269-290
      N("GoogleWorkspaceTenant", Seq(
        F("name", "name", required = true),
        F("domain", "domain"))))),
    M("keycloak", Seq( // tenants.py:293-309
      N("KeycloakRealm", Seq(F("name", "name", required = true))))),
    M("salesforce", Seq( // tenants.py:529-544
      N("SalesforceOrganization", Seq(F("name", "name", required = true))))),
    M("okta", Seq( // tenants.py:313-328
      N("OktaOrganization", Seq(F("name", "name", required = true))))),
    M("openai", Seq( // tenants.py:331-351
      N("OpenAIProject", Seq(
        F("name", "name", required = true),
        F("status", "status", specialHandling = Some("mapping"),
          extraMap = OpenAiProjectStatus))))),
    M("scaleway", Seq( // tenants.py:354-369
      N("ScalewayProject", Seq(F("name", "name", required = true))))),
    M("sentry", Seq( // tenants.py:372-391
      N("SentryOrganization", Seq(
        F("name", "name", required = true),
        F("status", "status", specialHandling = Some("mapping"),
          extraMap = SentryOrgStatus))))),
    M("sentinelone", Seq( // tenants.py:394-415
      N("S1Account", Seq(
        F("name", "name", required = true),
        F("status", "state", specialHandling = Some("mapping"),
          extraMap = S1AccountStatus))))),
    M("jumpcloud", Seq( // tenants.py:456-472
      N("JumpCloudTenant", Seq(F("name", "id", required = true))))),
    M("slack", Seq( // tenants.py:436-453
      N("SlackTeam", Seq(
        F("name", "name", required = true),
        F("domain", "domain"))))),
    M("spacelift", Seq( // tenants.py:419-434
      N("SpaceliftAccount", Seq(F("name", "name", required = true))))),
    M("subimage", Seq( // tenants.py:495-500
      N("SubImageTenant", Nil))),
    M("socketdev", Seq( // tenants.py:512-527
      N("SocketDevOrganization", Seq(F("name", "name", required = true))))),
    M("workos", Seq( // tenants.py:476-492
      N("WorkOSOrganization", Seq(F("name", "name", required = true))))),
    M("vercel", Seq( // tenants.py:546-561
      N("VercelTeam", Seq(F("name", "name", required = true))))),
    M("railway", Seq( // tenants.py:604-628
      N("RailwayWorkspace", Seq(F("name", "name", required = true))),
      N("RailwayProject", Seq(F("name", "name", required = true))))),
    M("databricks", Seq( // tenants.py:749-771 — name AND domain off host
      N("DatabricksWorkspace", Seq(
        F("name", "host", required = true),
        F("domain", "host"))),
      N("DatabricksAccount", Seq(
        F("name", "account_id", required = true),
        F("domain", "host"))))),
    M("supabase", Seq( // tenants.py:663-695
      N("SupabaseOrganization", Seq(F("name", "name", required = true))),
      N("SupabaseProject", Seq(
        F("name", "name", required = true),
        F("status", "status", specialHandling = Some("mapping"),
          extraMap = SupabaseProjectStatus))))),
    M("modal", Seq( // tenants.py:698-720
      N("ModalWorkspace", Seq(F("name", "name", required = true))),
      N("ModalEnvironment", Seq(F("name", "name", required = true))))))

  // ---- CVE severity / status value maps (cves.py:18-84) ----
  private val CvssSeverity = Map(
    "NONE" -> "info", "LOW" -> "low", "MEDIUM" -> "medium",
    "HIGH" -> "high", "CRITICAL" -> "critical")
  private val InspectorSeverity = CvssSeverity + ("INFORMATIONAL" -> "info")
  private val GithubSeverity = Map(
    "LOW" -> "low", "MODERATE" -> "medium", "HIGH" -> "high",
    "CRITICAL" -> "critical", "low" -> "low", "moderate" -> "medium",
    "medium" -> "medium", "high" -> "high", "critical" -> "critical")
  private val S1Severity = Map(
    "None" -> "info", "Low" -> "low", "Medium" -> "medium",
    "High" -> "high", "Critical" -> "critical")
  private val NvdVulnStatus = Map(
    "Received" -> "open", "Awaiting Analysis" -> "open",
    "Undergoing Analysis" -> "open", "Analyzed" -> "open",
    "Modified" -> "open", "Deferred" -> "open", "Rejected" -> "rejected")
  private val TrivyVulnStatus = Map(
    "unknown" -> "unknown", "affected" -> "open", "fixed" -> "fixed",
    "under_investigation" -> "under_investigation",
    "will_not_fix" -> "not_affected", "fix_deferred" -> "open",
    "end_of_life" -> "open", "not_affected" -> "not_affected")
  private val UbuntuVulnStatus = Map(
    "active" -> "open", "rejected" -> "rejected",
    "not-in-ubuntu" -> "not_affected")

  /** CVE fields — cves.py:5-15: canonical key is `cve_id` (NOT `name`,
    * and NOT marked required: the SemgrepSCAFinding hybrid carries
    * advisory-only rows with a null cve_id by design, cves.py:384-391 —
    * rows without the canonical key can never create or link), base
    * severity normalized to info/low/medium/high/critical and resolution
    * state to open/fixed/rejected/under_investigation/not_affected/
    * unknown via per-provider maps; description/references/problem_types
    * are unindexed free text. 8 modules / 8 labels in
    * CVES_ONTOLOGY_MAPPING registration order (cves.py:469-478). */
  val cves: Seq[M] = Seq(
    M("cve", Seq( // cves.py:86-176 — the full 19-field NVD shape
      N("CVE", Seq(
        F("cve_id", "cve_id"),
        F("assigner", "assigner"),
        F("description", "description", indexed = false),
        F("references", "references", indexed = false),
        F("problem_types", "problem_types", indexed = false),
        F("vector_string", "vector_string"),
        F("attack_vector", "attack_vector"),
        F("attack_complexity", "attack_complexity"),
        F("privileges_required", "privileges_required"),
        F("user_interaction", "user_interaction"),
        F("scope", "scope"),
        F("confidentiality_impact", "confidentiality_impact"),
        F("integrity_impact", "integrity_impact"),
        F("availability_impact", "availability_impact"),
        F("base_score", "base_score"),
        F("base_severity", "base_severity",
          specialHandling = Some("mapping"), extraMap = CvssSeverity),
        F("exploitability_score", "exploitability_score"),
        F("impact_score", "impact_score"),
        F("published_date", "published_date"),
        F("last_modified_date", "last_modified_date"),
        F("vuln_status", "vuln_status",
          specialHandling = Some("mapping"), extraMap = NvdVulnStatus))))),
    M("trivy", Seq( // cves.py:179-231
      N("TrivyImageFinding", Seq(
        F("cve_id", "cve_id"),
        F("description", "description", indexed = false),
        F("references", "references", indexed = false),
        F("problem_types", "cwe_ids", indexed = false),
        F("vector_string", "cvss_nvd_v3_vector"),
        F("base_score", "cvss_nvd_v3_score"),
        F("base_severity", "severity",
          specialHandling = Some("mapping"), extraMap = CvssSeverity),
        F("published_date", "published_date"),
        F("last_modified_date", "last_modified_date"),
        F("vuln_status", "status",
          specialHandling = Some("mapping"), extraMap = TrivyVulnStatus))))),
    M("ubuntu", Seq( // cves.py:234-292
      N("UbuntuCVE", Seq(
        F("cve_id", "cve_id"),
        F("description", "description", indexed = false),
        F("attack_vector", "attack_vector"),
        F("attack_complexity", "attack_complexity"),
        F("confidentiality_impact", "confidentiality_impact"),
        F("integrity_impact", "integrity_impact"),
        F("availability_impact", "availability_impact"),
        F("base_score", "base_score"),
        F("base_severity", "base_severity",
          specialHandling = Some("mapping"), extraMap = CvssSeverity),
        F("published_date", "published"),
        F("last_modified_date", "updated_at"),
        F("vuln_status", "status",
          specialHandling = Some("mapping"), extraMap = UbuntuVulnStatus))))),
    M("crowdstrike", Seq( // cves.py:295-314
      N("CrowdstrikeFinding", Seq(
        F("cve_id", "cve_id"),
        F("base_score", "base_score"),
        F("base_severity", "base_severity",
          specialHandling = Some("mapping"), extraMap = CvssSeverity))))),
    M("github", Seq( // cves.py:317-361
      N("GitHubDependabotAlert", Seq(
        F("cve_id", "cve_id"),
        F("description", "advisory_description", indexed = false),
        F("references", "references", indexed = false),
        F("problem_types", "cwe_ids", indexed = false),
        F("vector_string", "cvss_vector_string"),
        F("base_score", "cvss_score"),
        F("base_severity", "severity",
          specialHandling = Some("mapping"), extraMap = GithubSeverity),
        F("published_date", "advisory_published_at"),
        F("last_modified_date", "advisory_updated_at"))))),
    M("sentinelone", Seq( // cves.py:364-380
      N("S1AppFinding", Seq(
        F("cve_id", "cve_id"),
        F("base_severity", "severity",
          specialHandling = Some("mapping"), extraMap = S1Severity))))),
    M("semgrep", Seq( // cves.py:384-436 — hybrid CVE/SecurityIssue row
      N("SemgrepSCAFinding", Seq(
        F("cve_id", "cve_id"),
        F("description", "description", indexed = false),
        F("references", "ref_urls", indexed = false),
        F("base_severity", "severity",
          specialHandling = Some("mapping"), extraMap = CvssSeverity),
        F("title", "summary", required = true),
        F("severity", "severity"),
        F("status", "triage_status"),
        F("first_seen", "scan_time"))))),
    M("aws", Seq( // cves.py:439-467
      N("AWSInspectorFinding", Seq(
        F("cve_id", "cve_id"),
        F("description", "description", indexed = false),
        F("references", "referenceurls", indexed = false),
        F("base_score", "cvssscore"),
        F("base_severity", "severity",
          specialHandling = Some("mapping"), extraMap = InspectorSeverity))))))
}
