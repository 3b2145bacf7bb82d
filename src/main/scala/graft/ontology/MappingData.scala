package graft.ontology

import Mappings.{FieldMapping => F, ModuleMapping => M, NodeMapping => N}

/** The reference's roles and groups semantic-category mapping corpora,
  * ported as data (cartography/models/ontology/mapping/data/roles.py:1-411
  * and groups.py:1-442 — every module, node label, field, strategy,
  * required flag and indexed flag). These are the two matcher-heaviest
  * categories in the reference's 41-file mapping corpus: 12 role modules
  * over 16 provider labels (static_value + value-mapping + per-provider
  * field renames) and 20 group modules over 21 labels (required name,
  * unindexed description text, email present on 4 providers only).
  * Interpreted by [[Mappings.project]]; density gates
  * `ontology_materialize_roles` / `ontology_materialize_groups`.
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
    M("salesforce", Seq( // roles.py:316-348
      N("SalesforceProfile", Seq(
        F("name", "name", required = true),
        F("scope", specialHandling = Some("static_value"), extraValue = Some("org")))),
      N("SalesforcePermissionSet", Seq(
        F("name", "name", required = true),
        F("scope", specialHandling = Some("static_value"), extraValue = Some("org")))))),
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
    M("sentry", Seq( // groups.py:250-262
      N("SentryTeam", Seq(
        F("name", "name", required = true))))),
    M("scaleway", Seq( // groups.py:266-285
      N("ScalewayGroup", Seq(
        F("name", "name", required = true),
        F("description", "description", indexed = false))))),
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
    M("circleci", Seq( // groups.py:357-372
      N("CircleCIGroup", Seq(
        F("name", "name", required = true),
        F("description", "description", indexed = false))))),
    M("salesforce", Seq( // groups.py:374-387
      N("SalesforceGroup", Seq(
        F("name", "name", required = true))))),
    M("databricks", Seq( // groups.py:389-441 — two labels, one module
      N("DatabricksGroup", Seq(
        F("name", "display_name", required = true))),
      N("DatabricksAccountGroup", Seq(
        F("name", "display_name", required = true))))))
}
