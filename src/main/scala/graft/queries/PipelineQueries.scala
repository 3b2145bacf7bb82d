package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.analysis._
import graft.graph.{Graph, GraphLoader, GraphStore}
import graft.ontology.Materialize
import graft.ontology.Materialize.ProviderMapping
import graft.rules.{Fact, Framework, Rule, RulesRunner}
import graft.schema._
import graft.Lineage._

/** Whole-pipeline composition queries: ontology materialization and an
  * end-to-end sync (schema load → analysis effects → rules) driven through
  * every layer of the engine in one gate entry.
  */
object PipelineQueries {

  private val TAG = 5000L

  /** Canonical-node materialization (intel/ontology/users.py analog):
    * customers and suppliers project onto canonical Market nodes keyed by
    * nation; the highest-priority source wins the display fields; every
    * canonical node links back to its sources. Output: winners + source
    * count. */
  def ontologyMaterialize(spark: SparkSession, dir: String): DataFrame = {
    def nodes(df: DataFrame, id: String, cols: (String, String)*) = {
      val b = df.select((col(id).as("id") +: cols.map { case (f, t) => col(f).as(t) }): _*)
      GraphStore.initialLoad(b, Seq(GraphStore.ID), TAG)
    }
    val g0 = Graph()
      .withNodes("Customer", nodes(Tables.customer(spark, dir), "c_custkey",
        "c_name" -> "name", "c_nationkey" -> "nationkey"))
      .withNodes("Supplier", nodes(Tables.supplier(spark, dir), "s_suppkey",
        "s_name" -> "name", "s_nationkey" -> "nationkey"))
    val g = Materialize.materialize(g0, "Market", Seq(
      ProviderMapping("Customer", priority = 1, df => df.select(
        col("nationkey").cast("long").as("id"), col("id").as("_src_id"),
        col("name").as("display"))),
      ProviderMapping("Supplier", priority = 2, df => df.select(
        col("nationkey").cast("long").as("id"), col("id").as("_src_id"),
        col("name").as("display")))), TAG)
    val sources = g.edgeTable("Market", "HAS_SOURCE", "Customer")
      .select(col("src_id")).unionByName(
        g.edgeTable("Market", "HAS_SOURCE", "Supplier").select(col("src_id")))
      .groupBy(col("src_id").as("id")).agg(count(lit(1)).as("n_sources"))
    g.nodeTable("Market")
      .join(sources, Seq("id"))
      .select(col("id"), col("display"), col("_ont_source"), col("n_sources"))
  }

  /** Second canonical label end-to-end (reference maps Device across the
    * Bigfix/Crowdstrike/Duo/Kandji feeds, mapping/data/devices.py): a
    * Device canon from two synthetic feeds over TPC-H —
    * EndpointAgent (customers; serial_number REQUIRED, null for every
    * 7th key, so those rows cannot create canon nodes) and MdmDevice
    * (suppliers; eligible_for_source = false, so it NEVER creates canon
    * nodes — it only links HAS_SOURCE to devices the agent feed
    * created). Output: each device with its winning fields + per-feed
    * source counts; devices whose every agent row lacked a serial never
    * materialize, and MDM rows pointing at them link nothing. */
  def ontologyMaterializeDevice(spark: SparkSession, dir: String): DataFrame = {
    def nodes(df: DataFrame, id: String, cols: (String, String)*) = {
      val b = df.select((col(id).as("id") +: cols.map { case (f, t) => col(f).as(t) }): _*)
      GraphStore.initialLoad(b, Seq(GraphStore.ID), TAG)
    }
    val g0 = Graph()
      .withNodes("EndpointAgent", nodes(Tables.customer(spark, dir), "c_custkey",
        "c_name" -> "name", "c_mktsegment" -> "segment"))
      .withNodes("MdmDevice", nodes(Tables.supplier(spark, dir), "s_suppkey",
        "s_name" -> "name"))
    val g = Materialize.materialize(g0, "Device", Seq(
      ProviderMapping("EndpointAgent", priority = 1, df => df.select(
        (col("id").cast("long") % 500L).as("id"), col("id").as("_src_id"),
        concat(lit("host-"), (col("id").cast("long") % 500L).cast("string"))
          .as("hostname"),
        col("segment").as("os"),
        when(col("id").cast("long") % 7L === 0L, lit(null).cast("long"))
          .otherwise(col("id").cast("long")).as("serial_number")),
        requiredFields = Seq("serial_number")),
      ProviderMapping("MdmDevice", priority = 2, df => df.select(
        (col("id").cast("long") % 500L).as("id"), col("id").as("_src_id"),
        concat(lit("host-"), (col("id").cast("long") % 500L).cast("string"))
          .as("hostname"),
        upper(col("name")).as("os"),
        col("id").cast("long").as("serial_number")),
        eligibleForSource = false)), TAG)
    def srcCount(provider: String, as: String) =
      g.edgeTable("Device", "HAS_SOURCE", provider)
        .groupBy(col("src_id").as("id")).agg(count(lit(1)).as(as))
    g.nodeTable("Device")
      .join(srcCount("EndpointAgent", "n_agent_sources"), Seq("id"))
      .join(srcCount("MdmDevice", "n_mdm_sources"), Seq("id"), "left")
      .select(col("id"), col("hostname"), col("os"), col("serial_number"),
        col("n_agent_sources"),
        coalesce(col("n_mdm_sources"), lit(0L)).as("n_mdm_sources"))
  }

  /** AWS EC2 InstanceState.Name → canonical lifecycle state
    * (mapping/data/computeinstance.py:12-19 _AWS_EC2_STATE). */
  private val AwsEc2State = Map(
    "pending" -> "pending", "running" -> "running",
    "shutting-down" -> "stopping", "stopping" -> "stopping",
    "stopped" -> "stopped", "terminated" -> "terminated")

  /** GCP Instance.status → canonical state (computeinstance.py:22-33
    * _GCP_INSTANCE_STATE; GCP TERMINATED means powered off). */
  private val GcpInstanceState = Map(
    "PROVISIONING" -> "pending", "STAGING" -> "starting",
    "RUNNING" -> "running", "STOPPING" -> "stopping",
    "SUSPENDING" -> "stopping", "SUSPENDED" -> "suspended",
    "REPAIRING" -> "error", "TERMINATED" -> "stopped",
    "DEPROVISIONING" -> "stopping")

  /** Third canonical label end-to-end: ComputeInstance across an EC2-style
    * and a GCP-style feed plus an ENRICH-ONLY monitoring feed
    * (mapping/data/computeinstance.py maps 6 provider modules with
    * heterogeneous state vocabularies onto one canonical label). The gate
    * exercises every mapping strategy the label uses: per-provider `mapping`
    * state normalization (unmapped provider values become NULL — both feeds
    * emit one unmapped vocab value), a REQUIRED name field (every 11th EC2
    * row lacks it and cannot create canon nodes), priority field resolution
    * (EC2 wins over the VM feed on shared ids), and
    * `eligible_for_source = false` (the monitoring feed only links
    * HAS_SOURCE to canon others created). */
  def ontologyMaterializeCompute(spark: SparkSession, dir: String): DataFrame = {
    import graft.ontology.Ontology
    def nodes(df: DataFrame, id: String, cols: (String, String)*) = {
      val b = df.select((col(id).as("id") +: cols.map { case (f, t) => col(f).as(t) }): _*)
      GraphStore.initialLoad(b, Seq(GraphStore.ID), TAG)
    }
    val g0 = Graph()
      .withNodes("Ec2Instance", nodes(Tables.customer(spark, dir), "c_custkey",
        "c_nationkey" -> "nationkey"))
      .withNodes("CloudVm", nodes(Tables.supplier(spark, dir), "s_suppkey",
        "s_nationkey" -> "nationkey"))
      .withNodes("MonitoringAgent", nodes(Tables.nation(spark, dir), "n_nationkey"))
    val awsRaw = element_at(
      array(lit("pending"), lit("running"), lit("shutting-down"), lit("stopping"),
        lit("stopped"), lit("terminated"), lit("impaired")),
      (col("id").cast("long") % 7 + 1).cast("int"))
    val gcpRaw = element_at(
      array(lit("PROVISIONING"), lit("STAGING"), lit("RUNNING"), lit("STOPPING"),
        lit("SUSPENDING"), lit("SUSPENDED"), lit("REPAIRING"), lit("TERMINATED"),
        lit("DEPROVISIONING"), lit("UNKNOWN_STATE"), lit("UNKNOWN_STATE")),
      (col("id").cast("long") % 11 + 1).cast("int"))
    val g = Materialize.materialize(g0, "ComputeInstance", Seq(
      ProviderMapping("Ec2Instance", priority = 1, df => df.select(
        (col("id").cast("long") % 400L).as("id"), col("id").as("_src_id"),
        when(col("id").cast("long") % 11L === 0L, lit(null).cast("string"))
          .otherwise(concat(lit("i-"), (col("id").cast("long") % 400L).cast("string")))
          .as("name"),
        Ontology.valueMapping(awsRaw, AwsEc2State).as("state"),
        element_at(array(lit("t3.micro"), lit("t3.large"), lit("t3.xlarge")),
          (col("id").cast("long") % 3 + 1).cast("int")).as("vm_type"),
        concat(lit("r"), (col("nationkey").cast("long") % 5).cast("string"))
          .as("region")),
        requiredFields = Seq("name")),
      ProviderMapping("CloudVm", priority = 2, df => df.select(
        (col("id").cast("long") % 400L).as("id"), col("id").as("_src_id"),
        concat(lit("vm-"), (col("id").cast("long") % 400L).cast("string")).as("name"),
        Ontology.valueMapping(gcpRaw, GcpInstanceState).as("state"),
        concat(lit("n2-standard-"), (col("id").cast("long") % 4).cast("string"))
          .as("vm_type"),
        concat(lit("zone-"), (col("nationkey").cast("long") % 5).cast("string"))
          .as("region"))),
      ProviderMapping("MonitoringAgent", priority = 3, df => df.select(
        (col("id").cast("long") % 400L).as("id"), col("id").as("_src_id")),
        eligibleForSource = false)), TAG)
    def srcCount(provider: String, as: String) =
      g.edgeTable("ComputeInstance", "HAS_SOURCE", provider)
        .groupBy(col("src_id").as("id")).agg(count(lit(1)).as(as))
    g.nodeTable("ComputeInstance")
      .join(srcCount("Ec2Instance", "n_ec2_sources"), Seq("id"), "left")
      .join(srcCount("CloudVm", "n_vm_sources"), Seq("id"), "left")
      .join(srcCount("MonitoringAgent", "n_monitor_sources"), Seq("id"), "left")
      .select(col("id"), col("name"), col("state"), col("vm_type"), col("region"),
        col("_ont_source"),
        coalesce(col("n_ec2_sources"), lit(0L)).as("n_ec2_sources"),
        coalesce(col("n_vm_sources"), lit(0L)).as("n_vm_sources"),
        coalesce(col("n_monitor_sources"), lit(0L)).as("n_monitor_sources"))
  }

  /** Fourth canonical label, driven entirely by PORTED MAPPING DATA:
    * the reference's full PermissionRole corpus (mapping/data/roles.py —
    * 12 modules, 16 provider labels) flows through the declarative
    * [[graft.ontology.Mappings]] interpreter instead of hand-written
    * projections. Exercises per-provider field renames (role_name /
    * title / label), static_value, value `mapping` with unmapped → NULL
    * (GCP LEGACY type, REGIONAL/ZONE scopes, WorkOS LegacyRole), the
    * SAME provider field feeding two ontology fields through different
    * maps (WorkOS type), modules mapping NO type/scope at all (Azure,
    * Keycloak — union fills nulls), required-name creation gating
    * (every 13th GCP title is null), and a cross-provider name
    * collision resolved by module priority (Keycloak vs Cloudflare on
    * region names). */
  def ontologyMaterializeRoles(spark: SparkSession, dir: String): DataFrame = {
    import graft.ontology.MappingData
    val nation = Tables.nation(spark, dir)
      .select(col("n_nationkey").cast("long").as("id"), col("n_name").as("nn"))
    val region = Tables.region(spark, dir)
      .select(col("r_regionkey").cast("long").as("id"), col("r_name").as("rn"))
    // provider node tables spelled with each provider's OWN field names —
    // the ported mapping data must translate them, not the gate
    val provider: Map[String, DataFrame] = Map(
      "AWSRole" -> Tables.customer(spark, dir).select(
        col("c_custkey").cast("long").as("id"), col("c_name").as("name")),
      "AWSPermissionSet" -> Tables.supplier(spark, dir).select(
        col("s_suppkey").cast("long").as("id"), col("s_name").as("name")),
      "AzureRoleDefinition" -> nation.select(col("id"), col("nn").as("role_name")),
      "GCPRole" -> Tables.part(spark, dir).select(
        col("p_partkey").cast("long").as("id"),
        when(col("p_partkey") % 13 === 0, lit(null).cast("string"))
          .otherwise(col("p_name")).as("title"),
        element_at(array(lit("BASIC"), lit("PREDEFINED"), lit("CUSTOM"),
          lit("LEGACY")), (col("p_partkey") % 4 + 1).cast("int")).as("role_type"),
        element_at(array(lit("GLOBAL"), lit("ORGANIZATION"), lit("PROJECT"),
          lit("REGIONAL"), lit("ZONE")),
          (col("p_partkey") % 5 + 1).cast("int")).as("scope")),
      "KeycloakRole" -> region.select(col("id"), col("rn").as("name")),
      "KubernetesRole" -> nation.select(col("id"),
        concat(lit("k8s-"), lower(col("nn"))).as("name")),
      "KubernetesClusterRole" -> region.select(col("id"),
        concat(lit("k8s-"), lower(col("rn"))).as("name")),
      // same names as KeycloakRole: the canonical collision — keycloak
      // (earlier module) must win field resolution
      "CloudflareRole" -> region.select(col("id"), col("rn").as("name")),
      "OCIPolicy" -> nation.select(col("id"),
        concat(lit("policy-"), col("nn")).as("name")),
      "OktaAdministrationRole" -> region.select(col("id"),
        concat(lit("okta-"), col("rn")).as("label")),
      "ScalewayPermissionSet" -> nation.select(col("id"),
        concat(lit("sw-"), col("nn")).as("name"),
        element_at(array(lit("projects"), lit("organization"),
          lit("account_root_user"), lit("legacy")),
          (col("id") % 4 + 1).cast("int")).as("scope_type")),
      "WorkOSRole" -> nation.select(col("id"),
        concat(lit("wos-"), col("nn")).as("name"),
        element_at(array(lit("EnvironmentRole"), lit("OrganizationRole"),
          lit("LegacyRole")), (col("id") % 3 + 1).cast("int")).as("type")),
      "SalesforceProfile" -> region.select(col("id"),
        concat(lit("sfp-"), col("rn")).as("name")),
      "SalesforcePermissionSet" -> region.select(col("id"),
        concat(lit("sfps-"), col("rn")).as("name")),
      "ModalWorkspaceRole" -> nation.select(col("id"),
        concat(lit("modal-ws-"), col("nn")).as("name")),
      "ModalEnvironmentRole" -> nation.select(col("id"),
        concat(lit("modal-env-"), col("nn")).as("name")))
    materializeFromMappingData(spark, "PermissionRole", MappingData.roles,
      provider, Seq("type", "scope"))
  }

  /** Fifth canonical label from ported mapping data: the full UserGroup
    * corpus (mapping/data/groups.py — 20 modules, 22 provider labels).
    * Exercises the widest multi-provider union in the reference
    * (display_name/name/desc renames; description mapped but UNINDEXED
    * on 14 providers; email mapped on 4 only — absent columns null-fill
    * through the union), a module contributing two labels (aws SSO,
    * databricks account), required-name gating (every 9th Entra
    * display_name is null), and the row-winner contract under collision
    * (AWSGroup and SentryTeam share bare nation names; aws wins and its
    * null description/email ride the winning row — no cross-provider
    * field coalesce). */
  def ontologyMaterializeGroups(spark: SparkSession, dir: String): DataFrame = {
    import graft.ontology.MappingData
    val nation = Tables.nation(spark, dir).select(
      col("n_nationkey").cast("long").as("id"), col("n_name").as("nn"),
      concat(lit("Directory of "), col("n_name")).as("nc"))
    val region = Tables.region(spark, dir).select(
      col("r_regionkey").cast("long").as("id"), col("r_name").as("rn"),
      concat(lit("Teams for "), col("r_name")).as("rc"))
    val provider: Map[String, DataFrame] = Map(
      "AWSGroup" -> nation.select(col("id"), col("nn").as("name")),
      "AWSSSOGroup" -> region.select(col("id"),
        concat(lit("sso-"), col("rn")).as("display_name"), col("rc").as("description")),
      "DuoGroup" -> region.select(col("id"),
        concat(lit("duo-"), col("rn")).as("name"), col("rc").as("desc")),
      "EntraGroup" -> Tables.customer(spark, dir).select(
        col("c_custkey").cast("long").as("id"),
        when(col("c_custkey") % 9 === 0, lit(null).cast("string"))
          .otherwise(col("c_name")).as("display_name"),
        col("c_mktsegment").as("description"),
        concat(lit("g"), col("c_custkey").cast("string"), lit("@example.com")).as("mail")),
      "GitHubTeam" -> Tables.supplier(spark, dir).select(
        col("s_suppkey").cast("long").as("id"), col("s_name").as("name"),
        concat(lit("Team "), col("s_name")).as("description")),
      "GitLabGroup" -> nation.select(col("id"),
        concat(lit("gl-"), col("nn")).as("name"), col("nc").as("description")),
      "GoogleWorkspaceGroup" -> region.select(col("id"),
        concat(lit("gw-"), col("rn")).as("display_name"), col("rc").as("description"),
        concat(lit("gw"), col("id").cast("string"), lit("@example.com")).as("email")),
      "GSuiteGroup" -> region.select(col("id"),
        concat(lit("gs-"), col("rn")).as("name"), col("rc").as("description"),
        concat(lit("gs"), col("id").cast("string"), lit("@example.com")).as("email")),
      "KeycloakGroup" -> nation.select(col("id"),
        concat(lit("kc-"), col("nn")).as("name"), col("nc").as("description")),
      "OCIGroup" -> nation.select(col("id"),
        concat(lit("oci-"), col("nn")).as("name"), col("nc").as("description")),
      "OktaGroup" -> region.select(col("id"),
        concat(lit("okta-"), col("rn")).as("name"), col("rc").as("description")),
      "PagerDutyTeam" -> region.select(col("id"),
        concat(lit("pd-"), col("rn")).as("name"), col("rc").as("description")),
      // bare nation names again: collides with AWSGroup, aws must win
      "SentryTeam" -> nation.select(col("id"), col("nn").as("name")),
      "ScalewayGroup" -> region.select(col("id"),
        concat(lit("sw-"), col("rn")).as("name"), col("rc").as("description")),
      "SlackGroup" -> nation.select(col("id"),
        concat(lit("slack-"), col("nn")).as("name"), col("nc").as("description")),
      "TailscaleGroup" -> region.select(col("id"),
        concat(lit("ts-"), col("rn")).as("name")),
      "KubernetesGroup" -> nation.select(col("id"),
        concat(lit("k8s-"), lower(col("nn"))).as("name")),
      "VercelAccessGroup" -> region.select(col("id"),
        concat(lit("vc-"), col("rn")).as("name")),
      "CircleCIGroup" -> region.select(col("id"),
        concat(lit("cc-"), col("rn")).as("name"), col("rc").as("description")),
      "SalesforceGroup" -> nation.select(col("id"),
        concat(lit("sf-"), col("nn")).as("name")),
      "DatabricksGroup" -> nation.select(col("id"),
        concat(lit("db-"), col("nn")).as("display_name")),
      "DatabricksAccountGroup" -> region.select(col("id"),
        concat(lit("dba-"), col("rn")).as("display_name")))
    materializeFromMappingData(spark, "UserGroup", MappingData.groups,
      provider, Seq("description", "email"))
  }

  /** Sixth canonical label from ported mapping data: the FULL Tenant
    * corpus (mapping/data/tenants.py — 30 modules / 38 node mappings over 37 provider labels,
    * the widest file in the reference's mapping data). Beyond the
    * roles/groups shapes it exercises: EMPTY-FIELD stamp-only mappings
    * (azure AzureTenant, SubImageTenant, CrowdstrikeTenant — they flow
    * through the interpreter but can neither create nor link), ONE label
    * mapped by TWO modules (AzureTenant: azure empty at priority 30,
    * microsoft display_name at 80 — the HAS_SOURCE edge table is single
    * and must not double-count), 9 per-provider status value maps with
    * deliberate unmapped raw states (→ NULL status, the no-ELSE CASE
    * contract), name drawn from id/uuid/username/host fields, and the
    * same host field feeding BOTH name and domain (databricks). */
  def ontologyMaterializeTenants(spark: SparkSession, dir: String): DataFrame = {
    import graft.ontology.MappingData
    // Provider node ids are STRINGS here: two reference mappings
    // (AWSOrganization, JumpCloudTenant) read the node's own `id` column
    // as the tenant NAME, so `id` must union as a string across the
    // whole corpus. Each provider prefixes its ids to keep them unique.
    val nation = Tables.nation(spark, dir)
      .select(col("n_nationkey").cast("long").as("k"), col("n_name").as("nn"))
    val region = Tables.region(spark, dir)
      .select(col("r_regionkey").cast("long").as("k"), col("r_name").as("rn"))
    def sid(pfx: String): Column = concat(lit(pfx), col("k").cast("string")).as("id")
    def pick(c: Column, vals: String*): Column =
      element_at(array(vals.map(lit): _*), (c % vals.length + 1).cast("int"))
    val provider: Map[String, DataFrame] = Map(
      "AirbyteOrganization" -> region.select(sid("ab"),
        concat(lit("ab-"), col("rn")).as("name")),
      // bare nation names: collision group with GCPProject; aws wins
      "AWSAccount" -> nation.select(sid("awsa"), col("nn").as("name"),
        pick(col("k"), "ACTIVE", "PENDING_ACTIVATION", "SUSPENDED",
          "PENDING_CLOSURE", "CLOSED", "BOGUS").as("state")),
      // name ← the node's own id column (tenants.py:108)
      "AWSOrganization" -> region.select(concat(lit("o-"), col("rn")).as("id")),
      "CircleCIOrganization" -> region.select(sid("cc"),
        concat(lit("cc-"), col("rn")).as("name")),
      // shared by azure (empty mapping) and microsoft (display_name)
      "AzureTenant" -> nation.select(sid("az"),
        concat(lit("ms-"), col("nn")).as("display_name")),
      "AzureSubscription" -> Tables.customer(spark, dir).select(
        concat(lit("sub"), col("c_custkey").cast("string")).as("id"),
        when(col("c_custkey") % 7 === 0, lit(null).cast("string"))
          .otherwise(col("c_name")).as("name"),
        pick(col("c_custkey"), "Enabled", "Warned", "PastDue", "Disabled",
          "Deleted", "Junk").as("state")),
      "CloudflareAccount" -> region.select(sid("cf"),
        concat(lit("cf-"), col("rn")).as("name")),
      "CrowdstrikeTenant" -> region.select(sid("cs"), col("rn")),
      "DOAccount" -> nation.select(sid("do"),
        concat(lit("do-"), col("k").cast("string")).as("uuid"),
        pick(col("k"), "active", "warning", "locked", "frozen").as("status")),
      "DOProject" -> region.select(sid("dop"),
        concat(lit("dop-"), col("rn")).as("name")),
      "NetlifyAccount" -> nation.select(sid("nl"),
        concat(lit("nl-"), col("nn")).as("name"),
        pick(col("k"), "active", "trial", "trialing", "frozen", "suspended",
          "deactivated", "disabled", "pending_deletion", "cancelled",
          "canceled", "closed", "limbo").as("lifecycle_state")),
      "GCPOrganization" -> region.select(sid("gcpo"),
        concat(lit("gcp-"), col("rn")).as("displayname"),
        pick(col("k"), "STATE_UNSPECIFIED", "ACTIVE", "DELETE_REQUESTED",
          "DELETE_IN_PROGRESS", "WEIRD").as("lifecyclestate")),
      // bare nation names again — loses to AWSAccount (priority)
      "GCPProject" -> nation.select(sid("gcpp"), col("nn").as("displayname"),
        pick(col("k"), "STATE_UNSPECIFIED", "ACTIVE", "DELETE_REQUESTED",
          "DELETE_IN_PROGRESS", "WEIRD").as("lifecyclestate")),
      "GitHubOrganization" -> Tables.supplier(spark, dir).select(
        concat(lit("gh"), col("s_suppkey").cast("string")).as("id"),
        col("s_name").as("username")),
      "GoogleWorkspaceTenant" -> region.select(sid("gw"),
        concat(lit("gw-"), col("rn")).as("name"),
        concat(lit("gw"), col("k").cast("string"), lit(".example.com")).as("domain")),
      "KeycloakRealm" -> nation.select(sid("kc"),
        concat(lit("kc-"), col("nn")).as("name")),
      "SalesforceOrganization" -> region.select(sid("sf"),
        concat(lit("sf-"), col("rn")).as("name")),
      "OktaOrganization" -> region.select(sid("ok"),
        concat(lit("ok-"), col("rn")).as("name")),
      "OpenAIProject" -> nation.select(sid("oa"),
        concat(lit("oa-"), col("nn")).as("name"),
        pick(col("k"), "active", "archived", "limbo").as("status")),
      "ScalewayProject" -> region.select(sid("swp"),
        concat(lit("swp-"), col("rn")).as("name")),
      "SentryOrganization" -> nation.select(sid("sn"),
        concat(lit("sn-"), col("nn")).as("name"),
        pick(col("k"), "active", "pending_deletion", "deletion_in_progress",
          "zombie").as("status")),
      "S1Account" -> region.select(sid("s1"),
        concat(lit("s1-"), col("rn")).as("name"),
        pick(col("k"), "Active", "active", "Expired", "Deleted", "Weird").as("state")),
      // name ← the node's own id column (tenants.py:463)
      "JumpCloudTenant" -> nation.select(
        concat(lit("jc-"), col("k").cast("string")).as("id")),
      "SlackTeam" -> nation.select(sid("sl"),
        concat(lit("sl-"), col("nn")).as("name"),
        concat(lit("sl"), col("k").cast("string"), lit(".example.com")).as("domain")),
      "SpaceliftAccount" -> region.select(sid("sp"),
        concat(lit("sp-"), col("rn")).as("name")),
      "SubImageTenant" -> region.select(sid("si"), col("rn")),
      "SocketDevOrganization" -> region.select(sid("sd"),
        concat(lit("sd-"), col("rn")).as("name")),
      "WorkOSOrganization" -> nation.select(sid("wo"),
        concat(lit("wo-"), col("nn")).as("name")),
      "VercelTeam" -> region.select(sid("vc"),
        concat(lit("vc-"), col("rn")).as("name")),
      "RailwayWorkspace" -> nation.select(sid("rw"),
        concat(lit("rw-"), col("nn")).as("name")),
      "RailwayProject" -> region.select(sid("rwp"),
        concat(lit("rwp-"), col("rn")).as("name")),
      "DatabricksWorkspace" -> nation.select(sid("dbw"),
        concat(lit("db"), col("k").cast("string"), lit(".cloud.example.com")).as("host")),
      "DatabricksAccount" -> region.select(sid("dba"),
        concat(lit("dba-"), col("k").cast("string")).as("account_id"),
        concat(lit("dba"), col("k").cast("string"), lit(".cloud.example.com")).as("host")),
      "SupabaseOrganization" -> region.select(sid("su"),
        concat(lit("su-"), col("rn")).as("name")),
      "SupabaseProject" -> nation.select(sid("sup"),
        concat(lit("sup-"), col("nn")).as("name"),
        pick(col("k"), "ACTIVE_HEALTHY", "ACTIVE_UNHEALTHY", "INACTIVE",
          "PAUSING", "PAUSE_FAILED", "GOING_DOWN", "REMOVED", "COMING_UP",
          "INIT_FAILED", "RESTORING", "RESTORE_FAILED", "RESTARTING",
          "RESIZING", "UPGRADING", "UNKNOWN", "MYSTERY").as("status")),
      "ModalWorkspace" -> region.select(sid("mw"),
        concat(lit("mw-"), col("rn")).as("name")),
      "ModalEnvironment" -> nation.select(sid("me"),
        concat(lit("me-"), col("nn")).as("name")))
    materializeFromMappingData(spark, "Tenant", MappingData.tenants,
      provider, Seq("status", "domain"))
  }

  /** Seventh canonical label from ported mapping data: the CVE corpus
    * (mapping/data/cves.py — 8 modules / 8 labels). Unlike every other
    * category its canonical key is `cve_id`, NOT `name` — and the key is
    * NOT required in the corpus: the SemgrepSCAFinding hybrid carries
    * advisory-only rows whose cve_id is null by design (they are
    * :SecurityIssue material, cves.py:384-391) — such rows flow through
    * the interpreter but never create or link. Also exercises 4 distinct
    * severity maps over the same ontology field (CVSS / Inspector /
    * GitHub upper+lowercase / S1 title-case) and 3 vuln-status maps. */
  def ontologyMaterializeCves(spark: SparkSession, dir: String): DataFrame = {
    import graft.ontology.MappingData
    // Distinct year namespaces steer the winner variety: 2024 keys are
    // dominated by the NVD feed (priority 0); 2023 keys exist only on
    // ubuntu/sentinelone (ubuntu wins overlaps); 2025 only on
    // semgrep/aws-inspector (semgrep wins overlaps).
    def cve(year: String, k: Column): Column =
      concat(lit(s"CVE-$year-"), lpad((k % 1000).cast("string"), 4, "0"))
    def pick(c: Column, vals: String*): Column =
      element_at(array(vals.map(lit): _*), (c % vals.length + 1).cast("int"))
    val part = Tables.part(spark, dir)
      .select(col("p_partkey").cast("long").as("id"), col("p_name"))
    val nation = Tables.nation(spark, dir)
      .select(col("n_nationkey").cast("long").as("id"), col("n_name").as("nn"))
    val region = Tables.region(spark, dir)
      .select(col("r_regionkey").cast("long").as("id"), col("r_name").as("rn"))
    val supplier = Tables.supplier(spark, dir)
      .select(col("s_suppkey").cast("long").as("id"), col("s_name").as("sn"))
    val customer = Tables.customer(spark, dir)
      .select(col("c_custkey").cast("long").as("id"), col("c_name").as("cn"))
    val provider: Map[String, DataFrame] = Map(
      // NVD feed: one row per CVE id (authoritative, priority 0)
      "CVE" -> part.select(col("id"), cve("2024", col("id")).as("cve_id"),
        lit("cve@mitre.org").as("assigner"),
        concat(lit("desc "), col("p_name")).as("description"),
        pick(col("id"), "NONE", "LOW", "MEDIUM", "HIGH", "CRITICAL").as("base_severity"),
        (col("id") % 100).cast("double").as("base_score"),
        pick(col("id"), "Received", "Awaiting Analysis", "Undergoing Analysis",
          "Analyzed", "Modified", "Deferred", "Rejected", "Mystery").as("vuln_status")),
      "TrivyImageFinding" -> supplier.select(col("id"),
        cve("2024", col("id") * 7).as("cve_id"),
        concat(lit("trivy "), col("sn")).as("description"),
        pick(col("id"), "LOW", "MEDIUM", "HIGH", "CRITICAL", "weird").as("severity"),
        pick(col("id"), "unknown", "affected", "fixed", "under_investigation",
          "will_not_fix", "fix_deferred", "end_of_life", "not_affected").as("status")),
      "UbuntuCVE" -> nation.select(col("id"), cve("2023", col("id") * 11).as("cve_id"),
        concat(lit("ubuntu "), col("nn")).as("description"),
        (col("id") % 10).cast("double").as("base_score"),
        pick(col("id"), "LOW", "MEDIUM", "HIGH").as("base_severity"),
        pick(col("id"), "active", "rejected", "not-in-ubuntu").as("status")),
      "CrowdstrikeFinding" -> region.select(col("id"),
        cve("2024", col("id") * 13).as("cve_id"),
        (col("id") % 10).cast("double").as("base_score"),
        pick(col("id"), "NONE", "LOW", "MEDIUM", "HIGH", "CRITICAL").as("base_severity")),
      "GitHubDependabotAlert" -> supplier.select(col("id"),
        cve("2024", col("id") * 3).as("cve_id"),
        concat(lit("ghsa "), col("sn")).as("advisory_description"),
        pick(col("id"), "LOW", "MODERATE", "HIGH", "CRITICAL", "low",
          "moderate", "medium", "high", "critical", "UNRATED").as("severity"),
        (col("id") % 10).cast("double").as("cvss_score")),
      "S1AppFinding" -> region.select(col("id"), cve("2023", col("id") * 17).as("cve_id"),
        pick(col("id"), "None", "Low", "Medium", "High", "Critical").as("severity")),
      // hybrid: every 3rd row is advisory-only (null cve_id) — flows,
      // never creates, never links
      "SemgrepSCAFinding" -> customer.select(col("id"),
        when(col("id") % 3 === 0, lit(null).cast("string"))
          .otherwise(cve("2025", col("id") * 5)).as("cve_id"),
        concat(lit("semgrep "), col("cn")).as("description"),
        pick(col("id"), "LOW", "MEDIUM", "HIGH", "CRITICAL").as("severity"),
        concat(lit("finding "), col("cn")).as("summary"),
        pick(col("id"), "open", "ignored", "fixed").as("triage_status")),
      "AWSInspectorFinding" -> customer.select(col("id"),
        cve("2025", col("id") * 2).as("cve_id"),
        concat(lit("inspector "), col("cn")).as("description"),
        (col("id") % 10).cast("double").as("cvssscore"),
        pick(col("id"), "INFORMATIONAL", "LOW", "MEDIUM", "HIGH", "CRITICAL",
          "UNTRIAGED").as("severity")))
    // canonical label must differ from the NVD provider label "CVE" —
    // they are distinct node tables (provider ids are longs, canonical
    // ids are the cve_id strings)
    materializeFromMappingData(spark, "Vulnerability", MappingData.cves,
      provider, Seq("base_severity", "base_score", "vuln_status", "description"),
      keyField = "cve_id")
  }

  /** Shared driver for mapping-data-defined canonical labels: interpret
    * every (module, node) of `modules` against its provider table via
    * [[graft.ontology.Mappings.project]], materialize the canon keyed by
    * `_ont_name`, and report winners + cross-provider source counts.
    * Priority = corpus order (module index × 10 + node index) — the
    * reference resolves collisions by module registration order. */
  private[queries] def materializeFromMappingData(
      spark: SparkSession, canonicalLabel: String,
      modules: Seq[graft.ontology.Mappings.ModuleMapping],
      provider: Map[String, DataFrame],
      extraFields: Seq[String],
      keyField: String = "name"): DataFrame = {
    import graft.ontology.Mappings
    // gate provider tables derive ids from table keys — unique by
    // construction, so the per-provider dedup shuffle (38 exchanges on
    // the tenants corpus) is skipped
    def nodes(df: DataFrame) =
      GraphStore.initialLoad(df, Seq(GraphStore.ID), TAG, dedupBatch = false)
    val flat = for {
      (m, mi) <- modules.zipWithIndex
      (n, ni) <- m.nodes.zipWithIndex
    } yield (m, n, mi * 10 + ni)
    val g0 = flat.foldLeft(Graph()) { case (g, (_, n, _)) =>
      g.withNodes(n.nodeLabel, nodes(provider(n.nodeLabel)))
    }
    val mappings = flat.map { case (m, n, prio) =>
      // A mapping that never emits the canonical key — an empty-field
      // stamp-only node (tenants.py AzureTenant/SubImageTenant/
      // CrowdstrikeTenant) or one whose key column the provider frame
      // lacks — can neither create canon nor link HAS_SOURCE (a null
      // key matches nothing); it still flows through the interpreter.
      val emitsKey = n.fields.exists(_.ontologyField == keyField)
      // required NON-key fields (semgrep's title) must ride the
      // projection so Materialize's creation filter can see them
      val reqOnt = n.fields.filter(_.required).map(_.ontologyField)
        .filterNot(f => f == keyField || extraFields.contains(f))
      ProviderMapping(n.nodeLabel, priority = prio, df => {
        val p = Mappings.project(df, m.moduleName, n)
        val have = p.columns.toSet
        val extras = extraFields.filter(f => have(s"_ont_$f"))
          .map(f => col(s"_ont_$f").as(f))
        // always emit _req_* (null when the provider lacks the column:
        // an unset required field blocks creation, same as a null one)
        val reqs = reqOnt.map(f =>
          (if (have(s"_ont_$f")) col(s"_ont_$f") else lit(null)).as(s"_req_$f"))
        val key = if (emitsKey && have(s"_ont_$keyField")) col(s"_ont_$keyField")
                  else lit(null).cast("string")
        p.select(Seq(key.as("id"), col("id").as("_src_id")) ++ extras ++ reqs: _*)
      }, eligibleForSource = emitsKey && n.eligibleForSource,
        // the canonical key is always creation-required: a null-key row
        // (unset required name, advisory-only semgrep finding with no
        // cve_id) can never create a canonical node
        requiredFields = ("id" +: Mappings.requiredFields(n).map(_.stripPrefix("_ont_")).map {
          case k if k == keyField            => "id"
          case f if extraFields.contains(f)  => f
          case f                             => s"_req_$f"
        }).distinct)
    }
    val g = Materialize.materialize(g0, canonicalLabel, mappings, TAG)
    // distinct labels: a label mapped by two modules (AzureTenant) has
    // ONE edge table — unioning it once per mapping would double-count
    val srcCounts = flat.map(_._2.nodeLabel).distinct.map { lbl =>
      g.edgeTable(canonicalLabel, "HAS_SOURCE", lbl)
        .select(col(GraphStore.SRC))
    }.reduce(_ unionByName _)
      .groupBy(col(GraphStore.SRC).as("id")).agg(count(lit(1)).as("n_sources"))
    g.nodeTable(canonicalLabel)
      .join(srcCounts, Seq("id"))
      .select(Seq(col("id").as(keyField)) ++ extraFields.map(col) :+
        col("_ont_source") :+ col("n_sources"): _*)
  }

  /** End-to-end sync composition: tenant-scoped schema load → analysis
    * effect flags exposed customers → rules framework emits findings —
    * the full reference lifecycle assembled through
    * [[graft.intel.SyncAssembly.buildSync]] (sync.py:500-539). The
    * selection deliberately lists `analysis` first: the assembler must
    * reorder it last (with a warning) for the exposure flags to exist
    * when rules read them, so the gate exercises the ordering invariant,
    * not just the stages. */
  def e2eFullSync(spark: SparkSession, dir: String): DataFrame = {
    import graft.intel.{SyncAssembly, SyncStage}
    val tenants = Tables.nation(spark, dir).select(col("n_nationkey").cast("long").as("id"))
    val g0 = Graph().withNodes("Nation",
      GraphStore.initialLoad(tenants, Seq(GraphStore.ID), TAG))
    val custSchema = NodeSchema(
      label = "Customer",
      id = Field("c_custkey"),
      properties = Map("name" -> Field("c_name"), "acctbal" -> Field("c_acctbal")),
      subResource = Some(SubResourceRel("Nation", "id", Derived(col("c_nationkey").cast("long")))))
    val registry = Seq(
      // index DDL is an at-rest layout concern here (Layout.writeBucketedTable);
      // the stage slot keeps the reference's shape and pins the ordering
      SyncStage(SyncAssembly.IndexStage, (g, _, _) => g),
      SyncStage("customer-load",
        (g, s, t) => GraphLoader.load(g, custSchema, Tables.customer(s, dir), t)),
      SyncStage(SyncAssembly.AnalysisStage,
        (g, _, t) => AnalysisRunner.run(g, AnalysisJob(
          "exposure",
          pattern = _ => Tables.orders(spark, dir)
            .filter(col("o_orderstatus") === "O" && col("o_orderpriority") === "1-URGENT")
            .select(col("o_custkey").as("id"), lit(true).as("exposed")),
          effects = Seq(SetProperty("Customer", "exposed", "exposed"))), t),
        wants = Seq("customer-load")))
    val plan = SyncAssembly.buildSync(
      Seq(SyncAssembly.AnalysisStage, SyncAssembly.IndexStage, "customer-load"),
      registry)
    assert(plan.stageNames ==
      Seq(SyncAssembly.IndexStage, "customer-load", SyncAssembly.AnalysisStage))
    val g2 = plan.run(g0, spark, TAG)

    // read surface: rules over the synced graph
    RulesRunner.run(spark, Framework("e2e", Seq(
      Rule("exposure-risk", "Exposed with low balance", Seq(
        Fact("exposed-low-balance", "Exposed customer below 1000", "Customer",
          _ => g2.nodeTable("Customer")
            .filter(col("exposed") === true && col("acctbal") < 1000.0)
            .select(col("id").as("asset_id"))))))))
  }

  /** Motif path matching (analysis/aws/analysis.py:10-29 pattern):
    * Customer -[BUYS_FROM]-> Supplier -[LOCATED_IN]-> Nation, as a
    * declarative 2-hop chain, aggregated to distinct buyers per nation. */
  def motifTwoHop(spark: SparkSession, dir: String): DataFrame = {
    val buys = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("src_id"), col("l_suppkey").as("dst_id"))
      .dropDuplicates("src_id" :: "dst_id" :: Nil)
    val located = Tables.supplier(spark, dir)
      .select(col("s_suppkey").as("src_id"), col("s_nationkey").cast("long").as("dst_id"))
    val nationNodes = Tables.nation(spark, dir)
      .select(col("n_nationkey").cast("long").as("id"), col("n_name").as("name"))
    val g = Graph()
      .withNodes("Nation", GraphStore.initialLoad(nationNodes, Seq("id"), TAG))
      .withEdges(("Customer", "BUYS_FROM", "Supplier"),
        GraphStore.initialLoad(buys, Seq("src_id", "dst_id"), TAG))
      .withEdges(("Supplier", "LOCATED_IN", "Nation"),
        GraphStore.initialLoad(located, Seq("src_id", "dst_id"), TAG))
    val matched = graft.graph.Motif.path(g, Seq(
      ("Customer", "BUYS_FROM", "Supplier"),
      ("Supplier", "LOCATED_IN", "Nation")))
    graft.graph.Motif.withNodeProps(g, matched, "n2", "Nation", "name" -> "nation_name")
      .groupBy(col("n2").as("nation_id"), col("nation_name"))
      .agg(countDistinct(col("n0")).as("n_buyers"),
        count(lit(1)).as("n_paths"))
  }

  /** End-to-end entity resolution: canonical part-name records plus two
    * progressively-truncated "vendor feed" copies, blocked edit-distance
    * matching (first-token block, k=2), connected components over the
    * match pairs, and a canonical-id + cluster-size assignment — the
    * identity-resolution workload (reference: MatchLinks over fuzzy
    * name joins) as one composed pipeline. Records whose names collide
    * ACROSS distinct parts merge too — components, not pairwise match,
    * decide the entity. */
  def e2eEntityResolution(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.part(spark, dir).groupBy(col("p_name"))
      .agg(min(col("p_partkey")).cast("long").as("id"))
    // Feed ids live in their own namespace: offset = next power of 10
    // above max(id), so they can never collide with canonical ids at any
    // scale factor (a fixed +100000 collides once part exceeds 100k
    // rows and silently merges unrelated records). Broadcast the 1-row
    // scalar, never collect.
    val off = n.agg(pow(lit(10.0), ceil(log10(max(col("id")) + 1)))
      .cast("long").as("_off"))
    val canon = n.select(col("id"), col("p_name").as("name"))
    val feedA = n.crossJoin(broadcast(off))
      .select((col("id") + col("_off")).as("id"),
        expr("substring(p_name, 1, length(p_name) - 1)").as("name"))
    val feedB = n.crossJoin(broadcast(off))
      .select((col("id") + lit(2L) * col("_off")).as("id"),
        expr("substring(p_name, 1, length(p_name) - 2)").as("name"))
    val recs = canon.unionByName(feedA).unionByName(feedB).pin
    val pairs = graft.operators.StringJoin
      .editDistanceJoin(recs, recs, "id", "name", k = 2)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a").as("a"), col("id_b").as("b"))
    val comp = graft.graph.Fixpoint.connectedComponents(pairs)
    val lab = recs.select(col("id").as("record_id"))
      .join(comp.select(col("node").as("record_id"), col("component")),
        Seq("record_id"), "left")
      .select(col("record_id"),
        coalesce(col("component"), col("record_id")).as("canonical_id"))
    val sz = lab.groupBy(col("canonical_id"))
      .agg(count(lit(1)).as("cluster_size"))
    lab.join(sz, Seq("canonical_id"))
      .select(col("record_id"), col("canonical_id"), col("cluster_size"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ontology_materialize" -> (ontologyMaterialize _),
    "ontology_materialize_device" -> (ontologyMaterializeDevice _),
    "ontology_materialize_compute" -> (ontologyMaterializeCompute _),
    "ontology_materialize_roles" -> (ontologyMaterializeRoles _),
    "ontology_materialize_groups" -> (ontologyMaterializeGroups _),
    "ontology_materialize_tenants" -> (ontologyMaterializeTenants _),
    "ontology_materialize_cves" -> (ontologyMaterializeCves _),
    "e2e_full_sync" -> (e2eFullSync _),
    "e2e_entity_resolution" -> (e2eEntityResolution _),
    "motif_two_hop" -> (motifTwoHop _),
  )

  val oracles: Map[String, String] = Map(
    "ontology_materialize_tenants" ->
      """WITH src AS (
        |  SELECT 'ab-' || r_name AS name, CAST(NULL AS VARCHAR) AS status,
        |         CAST(NULL AS VARCHAR) AS domain, 0 AS prio,
        |         'ab' || CAST(r_regionkey AS VARCHAR) AS sid,
        |         'AirbyteOrganization' AS lbl FROM region
        |  UNION ALL
        |  SELECT n_name, CASE n_nationkey % 6 WHEN 0 THEN 'active'
        |           WHEN 1 THEN 'unknown' WHEN 2 THEN 'suspended'
        |           WHEN 3 THEN 'pending_deletion' WHEN 4 THEN 'closed' END,
        |         NULL, 10, 'awsa' || CAST(n_nationkey AS VARCHAR),
        |         'AWSAccount' FROM nation
        |  UNION ALL
        |  SELECT 'o-' || r_name, NULL, NULL, 11, 'o-' || r_name,
        |         'AWSOrganization' FROM region
        |  UNION ALL
        |  SELECT 'cc-' || r_name, NULL, NULL, 20,
        |         'cc' || CAST(r_regionkey AS VARCHAR),
        |         'CircleCIOrganization' FROM region
        |  UNION ALL
        |  SELECT CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_name END,
        |         CASE c_custkey % 6 WHEN 0 THEN 'active' WHEN 1 THEN 'active'
        |           WHEN 2 THEN 'suspended' WHEN 3 THEN 'suspended'
        |           WHEN 4 THEN 'closed' END,
        |         NULL, 31, 'sub' || CAST(c_custkey AS VARCHAR),
        |         'AzureSubscription' FROM customer
        |  UNION ALL
        |  SELECT 'cf-' || r_name, NULL, NULL, 40,
        |         'cf' || CAST(r_regionkey AS VARCHAR),
        |         'CloudflareAccount' FROM region
        |  UNION ALL
        |  SELECT 'do-' || CAST(n_nationkey AS VARCHAR),
        |         CASE n_nationkey % 4 WHEN 0 THEN 'active' WHEN 1 THEN 'active'
        |           WHEN 2 THEN 'suspended' END,
        |         NULL, 60, 'do' || CAST(n_nationkey AS VARCHAR),
        |         'DOAccount' FROM nation
        |  UNION ALL
        |  SELECT 'dop-' || r_name, NULL, NULL, 61,
        |         'dop' || CAST(r_regionkey AS VARCHAR), 'DOProject' FROM region
        |  UNION ALL
        |  SELECT 'nl-' || n_name, CASE n_nationkey % 12
        |           WHEN 0 THEN 'active' WHEN 1 THEN 'active' WHEN 2 THEN 'active'
        |           WHEN 3 THEN 'suspended' WHEN 4 THEN 'suspended'
        |           WHEN 5 THEN 'suspended' WHEN 6 THEN 'suspended'
        |           WHEN 7 THEN 'pending_deletion' WHEN 8 THEN 'closed'
        |           WHEN 9 THEN 'closed' WHEN 10 THEN 'closed' END,
        |         NULL, 70, 'nl' || CAST(n_nationkey AS VARCHAR),
        |         'NetlifyAccount' FROM nation
        |  UNION ALL
        |  SELECT 'ms-' || n_name, NULL, NULL, 80,
        |         'az' || CAST(n_nationkey AS VARCHAR), 'AzureTenant' FROM nation
        |  UNION ALL
        |  SELECT 'gcp-' || r_name, CASE r_regionkey % 5 WHEN 0 THEN 'unknown'
        |           WHEN 1 THEN 'active' WHEN 2 THEN 'pending_deletion'
        |           WHEN 3 THEN 'pending_deletion' END,
        |         NULL, 90, 'gcpo' || CAST(r_regionkey AS VARCHAR),
        |         'GCPOrganization' FROM region
        |  UNION ALL
        |  SELECT n_name, CASE n_nationkey % 5 WHEN 0 THEN 'unknown'
        |           WHEN 1 THEN 'active' WHEN 2 THEN 'pending_deletion'
        |           WHEN 3 THEN 'pending_deletion' END,
        |         NULL, 91, 'gcpp' || CAST(n_nationkey AS VARCHAR),
        |         'GCPProject' FROM nation
        |  UNION ALL
        |  SELECT s_name, NULL, NULL, 100, 'gh' || CAST(s_suppkey AS VARCHAR),
        |         'GitHubOrganization' FROM supplier
        |  UNION ALL
        |  SELECT 'gw-' || r_name, NULL,
        |         'gw' || CAST(r_regionkey AS VARCHAR) || '.example.com', 110,
        |         'gw' || CAST(r_regionkey AS VARCHAR),
        |         'GoogleWorkspaceTenant' FROM region
        |  UNION ALL
        |  SELECT 'kc-' || n_name, NULL, NULL, 120,
        |         'kc' || CAST(n_nationkey AS VARCHAR), 'KeycloakRealm' FROM nation
        |  UNION ALL
        |  SELECT 'sf-' || r_name, NULL, NULL, 130,
        |         'sf' || CAST(r_regionkey AS VARCHAR),
        |         'SalesforceOrganization' FROM region
        |  UNION ALL
        |  SELECT 'ok-' || r_name, NULL, NULL, 140,
        |         'ok' || CAST(r_regionkey AS VARCHAR),
        |         'OktaOrganization' FROM region
        |  UNION ALL
        |  SELECT 'oa-' || n_name, CASE n_nationkey % 3 WHEN 0 THEN 'active'
        |           WHEN 1 THEN 'closed' END,
        |         NULL, 150, 'oa' || CAST(n_nationkey AS VARCHAR),
        |         'OpenAIProject' FROM nation
        |  UNION ALL
        |  SELECT 'swp-' || r_name, NULL, NULL, 160,
        |         'swp' || CAST(r_regionkey AS VARCHAR),
        |         'ScalewayProject' FROM region
        |  UNION ALL
        |  SELECT 'sn-' || n_name, CASE n_nationkey % 4 WHEN 0 THEN 'active'
        |           WHEN 1 THEN 'pending_deletion'
        |           WHEN 2 THEN 'pending_deletion' END,
        |         NULL, 170, 'sn' || CAST(n_nationkey AS VARCHAR),
        |         'SentryOrganization' FROM nation
        |  UNION ALL
        |  SELECT 's1-' || r_name, CASE r_regionkey % 5 WHEN 0 THEN 'active'
        |           WHEN 1 THEN 'active' WHEN 2 THEN 'suspended'
        |           WHEN 3 THEN 'closed' END,
        |         NULL, 180, 's1' || CAST(r_regionkey AS VARCHAR),
        |         'S1Account' FROM region
        |  UNION ALL
        |  SELECT 'jc-' || CAST(n_nationkey AS VARCHAR), NULL, NULL, 190,
        |         'jc-' || CAST(n_nationkey AS VARCHAR),
        |         'JumpCloudTenant' FROM nation
        |  UNION ALL
        |  SELECT 'sl-' || n_name, NULL,
        |         'sl' || CAST(n_nationkey AS VARCHAR) || '.example.com', 200,
        |         'sl' || CAST(n_nationkey AS VARCHAR), 'SlackTeam' FROM nation
        |  UNION ALL
        |  SELECT 'sp-' || r_name, NULL, NULL, 210,
        |         'sp' || CAST(r_regionkey AS VARCHAR),
        |         'SpaceliftAccount' FROM region
        |  UNION ALL
        |  SELECT 'sd-' || r_name, NULL, NULL, 230,
        |         'sd' || CAST(r_regionkey AS VARCHAR),
        |         'SocketDevOrganization' FROM region
        |  UNION ALL
        |  SELECT 'wo-' || n_name, NULL, NULL, 240,
        |         'wo' || CAST(n_nationkey AS VARCHAR),
        |         'WorkOSOrganization' FROM nation
        |  UNION ALL
        |  SELECT 'vc-' || r_name, NULL, NULL, 250,
        |         'vc' || CAST(r_regionkey AS VARCHAR), 'VercelTeam' FROM region
        |  UNION ALL
        |  SELECT 'rw-' || n_name, NULL, NULL, 260,
        |         'rw' || CAST(n_nationkey AS VARCHAR),
        |         'RailwayWorkspace' FROM nation
        |  UNION ALL
        |  SELECT 'rwp-' || r_name, NULL, NULL, 261,
        |         'rwp' || CAST(r_regionkey AS VARCHAR),
        |         'RailwayProject' FROM region
        |  UNION ALL
        |  SELECT 'db' || CAST(n_nationkey AS VARCHAR) || '.cloud.example.com',
        |         NULL,
        |         'db' || CAST(n_nationkey AS VARCHAR) || '.cloud.example.com',
        |         270, 'dbw' || CAST(n_nationkey AS VARCHAR),
        |         'DatabricksWorkspace' FROM nation
        |  UNION ALL
        |  SELECT 'dba-' || CAST(r_regionkey AS VARCHAR), NULL,
        |         'dba' || CAST(r_regionkey AS VARCHAR) || '.cloud.example.com',
        |         271, 'dba' || CAST(r_regionkey AS VARCHAR),
        |         'DatabricksAccount' FROM region
        |  UNION ALL
        |  SELECT 'su-' || r_name, NULL, NULL, 280,
        |         'su' || CAST(r_regionkey AS VARCHAR),
        |         'SupabaseOrganization' FROM region
        |  UNION ALL
        |  SELECT 'sup-' || n_name, CASE n_nationkey % 16
        |           WHEN 0 THEN 'active' WHEN 1 THEN 'active'
        |           WHEN 2 THEN 'suspended' WHEN 3 THEN 'suspended'
        |           WHEN 4 THEN 'suspended' WHEN 5 THEN 'suspended'
        |           WHEN 6 THEN 'closed' WHEN 7 THEN 'unknown'
        |           WHEN 8 THEN 'unknown' WHEN 9 THEN 'unknown'
        |           WHEN 10 THEN 'unknown' WHEN 11 THEN 'unknown'
        |           WHEN 12 THEN 'unknown' WHEN 13 THEN 'unknown'
        |           WHEN 14 THEN 'unknown' END,
        |         NULL, 281, 'sup' || CAST(n_nationkey AS VARCHAR),
        |         'SupabaseProject' FROM nation
        |  UNION ALL
        |  SELECT 'mw-' || r_name, NULL, NULL, 290,
        |         'mw' || CAST(r_regionkey AS VARCHAR),
        |         'ModalWorkspace' FROM region
        |  UNION ALL
        |  SELECT 'me-' || n_name, NULL, NULL, 291,
        |         'me' || CAST(n_nationkey AS VARCHAR),
        |         'ModalEnvironment' FROM nation),
        |winners AS MATERIALIZED (
        |  SELECT name, status, domain, lbl FROM (
        |    SELECT *, row_number() OVER (PARTITION BY name ORDER BY prio, sid) AS rk
        |    FROM src WHERE name IS NOT NULL) WHERE rk = 1),
        |links AS (SELECT s.name, count(*) AS n FROM src s
        |          JOIN winners w ON s.name = w.name GROUP BY s.name)
        |SELECT w.name, w.status, w.domain, w.lbl AS _ont_source,
        |  CAST(l.n AS BIGINT) AS n_sources
        |FROM winners w JOIN links l ON w.name = l.name""".stripMargin,
    "ontology_materialize_cves" ->
      """WITH src AS (
        |  SELECT 'CVE-2024-' || lpad(CAST(p_partkey % 1000 AS VARCHAR), 4, '0') AS cve_id,
        |         CASE p_partkey % 5 WHEN 0 THEN 'info' WHEN 1 THEN 'low'
        |           WHEN 2 THEN 'medium' WHEN 3 THEN 'high'
        |           WHEN 4 THEN 'critical' END AS base_severity,
        |         CAST(p_partkey % 100 AS DOUBLE) AS base_score,
        |         CASE p_partkey % 8 WHEN 0 THEN 'open' WHEN 1 THEN 'open'
        |           WHEN 2 THEN 'open' WHEN 3 THEN 'open' WHEN 4 THEN 'open'
        |           WHEN 5 THEN 'open' WHEN 6 THEN 'rejected' END AS vuln_status,
        |         'desc ' || p_name AS description, 0 AS prio,
        |         CAST(p_partkey AS BIGINT) AS sid, 'CVE' AS lbl FROM part
        |  UNION ALL
        |  SELECT 'CVE-2024-' || lpad(CAST((s_suppkey * 7) % 1000 AS VARCHAR), 4, '0'),
        |         CASE s_suppkey % 5 WHEN 0 THEN 'low' WHEN 1 THEN 'medium'
        |           WHEN 2 THEN 'high' WHEN 3 THEN 'critical' END,
        |         NULL,
        |         CASE s_suppkey % 8 WHEN 0 THEN 'unknown' WHEN 1 THEN 'open'
        |           WHEN 2 THEN 'fixed' WHEN 3 THEN 'under_investigation'
        |           WHEN 4 THEN 'not_affected' WHEN 5 THEN 'open'
        |           WHEN 6 THEN 'open' WHEN 7 THEN 'not_affected' END,
        |         'trivy ' || s_name, 10, CAST(s_suppkey AS BIGINT),
        |         'TrivyImageFinding' FROM supplier
        |  UNION ALL
        |  SELECT 'CVE-2023-' || lpad(CAST((n_nationkey * 11) % 1000 AS VARCHAR), 4, '0'),
        |         CASE n_nationkey % 3 WHEN 0 THEN 'low' WHEN 1 THEN 'medium'
        |           WHEN 2 THEN 'high' END,
        |         CAST(n_nationkey % 10 AS DOUBLE),
        |         CASE n_nationkey % 3 WHEN 0 THEN 'open' WHEN 1 THEN 'rejected'
        |           WHEN 2 THEN 'not_affected' END,
        |         'ubuntu ' || n_name, 20, CAST(n_nationkey AS BIGINT),
        |         'UbuntuCVE' FROM nation
        |  UNION ALL
        |  SELECT 'CVE-2024-' || lpad(CAST((r_regionkey * 13) % 1000 AS VARCHAR), 4, '0'),
        |         CASE r_regionkey % 5 WHEN 0 THEN 'info' WHEN 1 THEN 'low'
        |           WHEN 2 THEN 'medium' WHEN 3 THEN 'high'
        |           WHEN 4 THEN 'critical' END,
        |         CAST(r_regionkey % 10 AS DOUBLE), NULL, NULL, 30,
        |         CAST(r_regionkey AS BIGINT), 'CrowdstrikeFinding' FROM region
        |  UNION ALL
        |  SELECT 'CVE-2024-' || lpad(CAST((s_suppkey * 3) % 1000 AS VARCHAR), 4, '0'),
        |         CASE s_suppkey % 10 WHEN 0 THEN 'low' WHEN 1 THEN 'medium'
        |           WHEN 2 THEN 'high' WHEN 3 THEN 'critical' WHEN 4 THEN 'low'
        |           WHEN 5 THEN 'medium' WHEN 6 THEN 'medium' WHEN 7 THEN 'high'
        |           WHEN 8 THEN 'critical' END,
        |         CAST(s_suppkey % 10 AS DOUBLE), NULL,
        |         'ghsa ' || s_name, 40, CAST(s_suppkey AS BIGINT),
        |         'GitHubDependabotAlert' FROM supplier
        |  UNION ALL
        |  SELECT 'CVE-2023-' || lpad(CAST((r_regionkey * 17) % 1000 AS VARCHAR), 4, '0'),
        |         CASE r_regionkey % 5 WHEN 0 THEN 'info' WHEN 1 THEN 'low'
        |           WHEN 2 THEN 'medium' WHEN 3 THEN 'high'
        |           WHEN 4 THEN 'critical' END,
        |         NULL, NULL, NULL, 50, CAST(r_regionkey AS BIGINT),
        |         'S1AppFinding' FROM region
        |  UNION ALL
        |  SELECT CASE WHEN c_custkey % 3 = 0 THEN NULL
        |           ELSE 'CVE-2025-' || lpad(CAST((c_custkey * 5) % 1000 AS VARCHAR), 4, '0') END,
        |         CASE c_custkey % 4 WHEN 0 THEN 'low' WHEN 1 THEN 'medium'
        |           WHEN 2 THEN 'high' WHEN 3 THEN 'critical' END,
        |         NULL, NULL, 'semgrep ' || c_name, 60, CAST(c_custkey AS BIGINT),
        |         'SemgrepSCAFinding' FROM customer
        |  UNION ALL
        |  SELECT 'CVE-2025-' || lpad(CAST((c_custkey * 2) % 1000 AS VARCHAR), 4, '0'),
        |         CASE c_custkey % 6 WHEN 0 THEN 'info' WHEN 1 THEN 'low'
        |           WHEN 2 THEN 'medium' WHEN 3 THEN 'high'
        |           WHEN 4 THEN 'critical' END,
        |         CAST(c_custkey % 10 AS DOUBLE), NULL,
        |         'inspector ' || c_name, 70, CAST(c_custkey AS BIGINT),
        |         'AWSInspectorFinding' FROM customer),
        |winners AS MATERIALIZED (
        |  SELECT cve_id, base_severity, base_score, vuln_status, description,
        |         lbl FROM (
        |    SELECT *, row_number() OVER (PARTITION BY cve_id ORDER BY prio, sid) AS rk
        |    FROM src WHERE cve_id IS NOT NULL) WHERE rk = 1),
        |links AS (SELECT s.cve_id, count(*) AS n FROM src s
        |          JOIN winners w ON s.cve_id = w.cve_id GROUP BY s.cve_id)
        |SELECT w.cve_id, w.base_severity, w.base_score, w.vuln_status,
        |  w.description, w.lbl AS _ont_source, CAST(l.n AS BIGINT) AS n_sources
        |FROM winners w JOIN links l ON w.cve_id = l.cve_id""".stripMargin,
    "ontology_materialize_roles" ->
      """WITH src AS (
        |  SELECT c_name AS name, 'custom' AS type, 'account' AS scope,
        |         0 AS prio, CAST(c_custkey AS BIGINT) AS sid, 'AWSRole' AS lbl
        |  FROM customer
        |  UNION ALL
        |  SELECT s_name, 'custom', 'org', 1, CAST(s_suppkey AS BIGINT),
        |         'AWSPermissionSet' FROM supplier
        |  UNION ALL
        |  SELECT n_name, NULL, NULL, 10, CAST(n_nationkey AS BIGINT),
        |         'AzureRoleDefinition' FROM nation
        |  UNION ALL
        |  SELECT CASE WHEN p_partkey % 13 = 0 THEN NULL ELSE p_name END,
        |         CASE p_partkey % 4 WHEN 0 THEN 'builtin' WHEN 1 THEN 'builtin'
        |              WHEN 2 THEN 'custom' ELSE NULL END,
        |         CASE p_partkey % 5 WHEN 0 THEN 'global' WHEN 1 THEN 'org'
        |              WHEN 2 THEN 'project' ELSE NULL END,
        |         20, CAST(p_partkey AS BIGINT), 'GCPRole' FROM part
        |  UNION ALL
        |  SELECT r_name, NULL, NULL, 30, CAST(r_regionkey AS BIGINT),
        |         'KeycloakRole' FROM region
        |  UNION ALL
        |  SELECT 'k8s-' || lower(n_name), NULL, 'namespace', 40,
        |         CAST(n_nationkey AS BIGINT), 'KubernetesRole' FROM nation
        |  UNION ALL
        |  SELECT 'k8s-' || lower(r_name), NULL, 'cluster', 41,
        |         CAST(r_regionkey AS BIGINT), 'KubernetesClusterRole' FROM region
        |  UNION ALL
        |  SELECT r_name, 'builtin', 'account', 50, CAST(r_regionkey AS BIGINT),
        |         'CloudflareRole' FROM region
        |  UNION ALL
        |  SELECT 'policy-' || n_name, 'custom', NULL, 60,
        |         CAST(n_nationkey AS BIGINT), 'OCIPolicy' FROM nation
        |  UNION ALL
        |  SELECT 'okta-' || r_name, 'builtin', 'org', 70,
        |         CAST(r_regionkey AS BIGINT), 'OktaAdministrationRole' FROM region
        |  UNION ALL
        |  SELECT 'sw-' || n_name, 'builtin',
        |         CASE n_nationkey % 4 WHEN 0 THEN 'project' WHEN 1 THEN 'org'
        |              WHEN 2 THEN 'account' ELSE NULL END,
        |         80, CAST(n_nationkey AS BIGINT), 'ScalewayPermissionSet' FROM nation
        |  UNION ALL
        |  SELECT 'wos-' || n_name,
        |         CASE n_nationkey % 3 WHEN 0 THEN 'custom' WHEN 1 THEN 'custom'
        |              ELSE NULL END,
        |         CASE n_nationkey % 3 WHEN 0 THEN 'global' WHEN 1 THEN 'org'
        |              ELSE NULL END,
        |         90, CAST(n_nationkey AS BIGINT), 'WorkOSRole' FROM nation
        |  UNION ALL
        |  SELECT 'sfp-' || r_name, NULL, 'org', 100, CAST(r_regionkey AS BIGINT),
        |         'SalesforceProfile' FROM region
        |  UNION ALL
        |  SELECT 'sfps-' || r_name, NULL, 'org', 101, CAST(r_regionkey AS BIGINT),
        |         'SalesforcePermissionSet' FROM region
        |  UNION ALL
        |  SELECT 'modal-ws-' || n_name, 'builtin', 'org', 110,
        |         CAST(n_nationkey AS BIGINT), 'ModalWorkspaceRole' FROM nation
        |  UNION ALL
        |  SELECT 'modal-env-' || n_name, 'builtin', 'namespace', 111,
        |         CAST(n_nationkey AS BIGINT), 'ModalEnvironmentRole' FROM nation),
        |winners AS MATERIALIZED (
        |  SELECT name, type, scope, lbl FROM (
        |    SELECT *, row_number() OVER (PARTITION BY name ORDER BY prio, sid) AS rk
        |    FROM src WHERE name IS NOT NULL) WHERE rk = 1),
        |links AS (SELECT s.name, count(*) AS n FROM src s
        |          JOIN winners w ON s.name = w.name GROUP BY s.name)
        |SELECT w.name, w.type, w.scope, w.lbl AS _ont_source,
        |  CAST(l.n AS BIGINT) AS n_sources
        |FROM winners w JOIN links l ON w.name = l.name""".stripMargin,
    "ontology_materialize_groups" ->
      """WITH src AS (
        |  SELECT n_name AS name, CAST(NULL AS VARCHAR) AS description,
        |         CAST(NULL AS VARCHAR) AS email, 0 AS prio,
        |         CAST(n_nationkey AS BIGINT) AS sid, 'AWSGroup' AS lbl FROM nation
        |  UNION ALL
        |  SELECT 'sso-' || r_name, 'Teams for ' || r_name, NULL, 1, CAST(r_regionkey AS BIGINT),
        |         'AWSSSOGroup' FROM region
        |  UNION ALL
        |  SELECT 'duo-' || r_name, 'Teams for ' || r_name, NULL, 10, CAST(r_regionkey AS BIGINT),
        |         'DuoGroup' FROM region
        |  UNION ALL
        |  SELECT CASE WHEN c_custkey % 9 = 0 THEN NULL ELSE c_name END,
        |         c_mktsegment, 'g' || CAST(c_custkey AS VARCHAR) || '@example.com',
        |         20, CAST(c_custkey AS BIGINT), 'EntraGroup' FROM customer
        |  UNION ALL
        |  SELECT s_name, 'Team ' || s_name, NULL, 30, CAST(s_suppkey AS BIGINT),
        |         'GitHubTeam' FROM supplier
        |  UNION ALL
        |  SELECT 'gl-' || n_name, 'Directory of ' || n_name, NULL, 40, CAST(n_nationkey AS BIGINT),
        |         'GitLabGroup' FROM nation
        |  UNION ALL
        |  SELECT 'gw-' || r_name, 'Teams for ' || r_name,
        |         'gw' || CAST(r_regionkey AS VARCHAR) || '@example.com', 50,
        |         CAST(r_regionkey AS BIGINT), 'GoogleWorkspaceGroup' FROM region
        |  UNION ALL
        |  SELECT 'gs-' || r_name, 'Teams for ' || r_name,
        |         'gs' || CAST(r_regionkey AS VARCHAR) || '@example.com', 60,
        |         CAST(r_regionkey AS BIGINT), 'GSuiteGroup' FROM region
        |  UNION ALL
        |  SELECT 'kc-' || n_name, 'Directory of ' || n_name, NULL, 70, CAST(n_nationkey AS BIGINT),
        |         'KeycloakGroup' FROM nation
        |  UNION ALL
        |  SELECT 'oci-' || n_name, 'Directory of ' || n_name, NULL, 80, CAST(n_nationkey AS BIGINT),
        |         'OCIGroup' FROM nation
        |  UNION ALL
        |  SELECT 'okta-' || r_name, 'Teams for ' || r_name, NULL, 90, CAST(r_regionkey AS BIGINT),
        |         'OktaGroup' FROM region
        |  UNION ALL
        |  SELECT 'pd-' || r_name, 'Teams for ' || r_name, NULL, 100, CAST(r_regionkey AS BIGINT),
        |         'PagerDutyTeam' FROM region
        |  UNION ALL
        |  SELECT n_name, NULL, NULL, 110, CAST(n_nationkey AS BIGINT),
        |         'SentryTeam' FROM nation
        |  UNION ALL
        |  SELECT 'sw-' || r_name, 'Teams for ' || r_name, NULL, 120, CAST(r_regionkey AS BIGINT),
        |         'ScalewayGroup' FROM region
        |  UNION ALL
        |  SELECT 'slack-' || n_name, 'Directory of ' || n_name, NULL, 130,
        |         CAST(n_nationkey AS BIGINT), 'SlackGroup' FROM nation
        |  UNION ALL
        |  SELECT 'ts-' || r_name, NULL, NULL, 140, CAST(r_regionkey AS BIGINT),
        |         'TailscaleGroup' FROM region
        |  UNION ALL
        |  SELECT 'k8s-' || lower(n_name), NULL, NULL, 150,
        |         CAST(n_nationkey AS BIGINT), 'KubernetesGroup' FROM nation
        |  UNION ALL
        |  SELECT 'vc-' || r_name, NULL, NULL, 160, CAST(r_regionkey AS BIGINT),
        |         'VercelAccessGroup' FROM region
        |  UNION ALL
        |  SELECT 'cc-' || r_name, 'Teams for ' || r_name, NULL, 170, CAST(r_regionkey AS BIGINT),
        |         'CircleCIGroup' FROM region
        |  UNION ALL
        |  SELECT 'sf-' || n_name, NULL, NULL, 180, CAST(n_nationkey AS BIGINT),
        |         'SalesforceGroup' FROM nation
        |  UNION ALL
        |  SELECT 'db-' || n_name, NULL, NULL, 190, CAST(n_nationkey AS BIGINT),
        |         'DatabricksGroup' FROM nation
        |  UNION ALL
        |  SELECT 'dba-' || r_name, NULL, NULL, 191, CAST(r_regionkey AS BIGINT),
        |         'DatabricksAccountGroup' FROM region),
        |winners AS MATERIALIZED (
        |  SELECT name, description, email, lbl FROM (
        |    SELECT *, row_number() OVER (PARTITION BY name ORDER BY prio, sid) AS rk
        |    FROM src WHERE name IS NOT NULL) WHERE rk = 1),
        |links AS (SELECT s.name, count(*) AS n FROM src s
        |          JOIN winners w ON s.name = w.name GROUP BY s.name)
        |SELECT w.name, w.description, w.email, w.lbl AS _ont_source,
        |  CAST(l.n AS BIGINT) AS n_sources
        |FROM winners w JOIN links l ON w.name = l.name""".stripMargin,
    "ontology_materialize_compute" ->
      """WITH ec2 AS (
        |  SELECT CAST(c_custkey % 400 AS BIGINT) AS id,
        |         CAST(c_custkey AS BIGINT) AS srcid,
        |         CASE WHEN c_custkey % 11 = 0 THEN NULL
        |              ELSE 'i-' || CAST(c_custkey % 400 AS VARCHAR) END AS name,
        |         CASE c_custkey % 7 WHEN 0 THEN 'pending' WHEN 1 THEN 'running'
        |              WHEN 2 THEN 'stopping' WHEN 3 THEN 'stopping'
        |              WHEN 4 THEN 'stopped' WHEN 5 THEN 'terminated'
        |              ELSE NULL END AS state,
        |         CASE c_custkey % 3 WHEN 0 THEN 't3.micro' WHEN 1 THEN 't3.large'
        |              ELSE 't3.xlarge' END AS vm_type,
        |         'r' || CAST(c_nationkey % 5 AS VARCHAR) AS region
        |  FROM customer),
        |vm AS (
        |  SELECT CAST(s_suppkey % 400 AS BIGINT) AS id,
        |         CAST(s_suppkey AS BIGINT) AS srcid,
        |         'vm-' || CAST(s_suppkey % 400 AS VARCHAR) AS name,
        |         CASE s_suppkey % 11 WHEN 0 THEN 'pending' WHEN 1 THEN 'starting'
        |              WHEN 2 THEN 'running' WHEN 3 THEN 'stopping'
        |              WHEN 4 THEN 'stopping' WHEN 5 THEN 'suspended'
        |              WHEN 6 THEN 'error' WHEN 7 THEN 'stopped'
        |              WHEN 8 THEN 'stopping' ELSE NULL END AS state,
        |         'n2-standard-' || CAST(s_suppkey % 4 AS VARCHAR) AS vm_type,
        |         'zone-' || CAST(s_nationkey % 5 AS VARCHAR) AS region
        |  FROM supplier),
        |uni AS (
        |  SELECT *, 1 AS prio, 'Ec2Instance' AS src FROM ec2 WHERE name IS NOT NULL
        |  UNION ALL
        |  SELECT *, 2 AS prio, 'CloudVm' AS src FROM vm),
        |winners AS MATERIALIZED (
        |  SELECT id, name, state, vm_type, region, src FROM (
        |    SELECT *, row_number() OVER (PARTITION BY id ORDER BY prio, srcid) AS rk
        |    FROM uni) WHERE rk = 1),
        |ec2_links AS (SELECT e.id, count(*) AS n FROM ec2 e
        |              JOIN winners w ON e.id = w.id GROUP BY e.id),
        |vm_links AS (SELECT v.id, count(*) AS n FROM vm v
        |             JOIN winners w ON v.id = w.id GROUP BY v.id),
        |mon AS (SELECT CAST(n_nationkey % 400 AS BIGINT) AS id FROM nation),
        |mon_links AS (SELECT m.id, count(*) AS n FROM mon m
        |              JOIN winners w ON m.id = w.id GROUP BY m.id)
        |SELECT w.id, w.name, w.state, w.vm_type, w.region, w.src AS _ont_source,
        |  CAST(coalesce(e.n, 0) AS BIGINT) AS n_ec2_sources,
        |  CAST(coalesce(v.n, 0) AS BIGINT) AS n_vm_sources,
        |  CAST(coalesce(m.n, 0) AS BIGINT) AS n_monitor_sources
        |FROM winners w
        |LEFT JOIN ec2_links e ON w.id = e.id
        |LEFT JOIN vm_links v ON w.id = v.id
        |LEFT JOIN mon_links m ON w.id = m.id""".stripMargin,
    "ontology_materialize_device" ->
      """WITH ep AS (
        |  SELECT CAST(c_custkey % 500 AS BIGINT) AS id,
        |         CAST(c_custkey AS BIGINT) AS srcid,
        |         'host-' || CAST(c_custkey % 500 AS VARCHAR) AS hostname,
        |         c_mktsegment AS os,
        |         CASE WHEN c_custkey % 7 = 0 THEN NULL
        |              ELSE CAST(c_custkey AS BIGINT) END AS serial_number
        |  FROM customer),
        |winners AS MATERIALIZED (
        |  SELECT id, hostname, os, serial_number FROM (
        |    SELECT *, row_number() OVER (PARTITION BY id ORDER BY srcid) AS rk
        |    FROM ep WHERE serial_number IS NOT NULL) WHERE rk = 1),
        |agent_links AS (
        |  SELECT e.id, count(*) AS n_agent
        |  FROM ep e JOIN winners w ON e.id = w.id GROUP BY e.id),
        |md AS (SELECT CAST(s_suppkey % 500 AS BIGINT) AS id FROM supplier),
        |mdm_links AS (
        |  SELECT m.id, count(*) AS n_mdm
        |  FROM md m JOIN winners w ON m.id = w.id GROUP BY m.id)
        |SELECT w.id, w.hostname, w.os, w.serial_number,
        |  CAST(a.n_agent AS BIGINT) AS n_agent_sources,
        |  CAST(coalesce(l.n_mdm, 0) AS BIGINT) AS n_mdm_sources
        |FROM winners w
        |JOIN agent_links a ON w.id = a.id
        |LEFT JOIN mdm_links l ON w.id = l.id""".stripMargin,
    "e2e_entity_resolution" ->
      """WITH RECURSIVE n AS (
        |  SELECT p_name AS name, CAST(min(p_partkey) AS BIGINT) AS id
        |  FROM part GROUP BY p_name),
        |off AS (SELECT CAST(power(10, ceil(log10(max(id) + 1))) AS BIGINT) AS o
        |        FROM n),
        |recs AS MATERIALIZED (
        |  SELECT id, name FROM n
        |  UNION ALL
        |  SELECT id + o, substr(name, 1, length(name) - 1) FROM n, off
        |  UNION ALL
        |  SELECT id + 2 * o, substr(name, 1, length(name) - 2) FROM n, off),
        |blocked AS MATERIALIZED (
        |  SELECT id, name, string_split(name, ' ')[1] AS blk FROM recs),
        |pairs AS MATERIALIZED (
        |  SELECT a.id AS a, b.id AS b
        |  FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.id < b.id
        |  WHERE abs(length(a.name) - length(b.name)) <= 2
        |    AND levenshtein(a.name, b.name) <= 2),
        |und AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
        |reach AS (
        |  SELECT a AS node, b AS reachable FROM und
        |  UNION
        |  SELECT r.node, u.b FROM reach r JOIN und u ON r.reachable = u.a),
        |comp AS (
        |  SELECT node, least(node, min(reachable)) AS component
        |  FROM reach GROUP BY node),
        |lab AS MATERIALIZED (
        |  SELECT recs.id AS record_id,
        |    coalesce(c.component, recs.id) AS canonical_id
        |  FROM recs LEFT JOIN comp c ON recs.id = c.node),
        |sz AS (SELECT canonical_id, count(*) AS cluster_size
        |       FROM lab GROUP BY canonical_id)
        |SELECT CAST(record_id AS BIGINT) AS record_id,
        |  CAST(l.canonical_id AS BIGINT) AS canonical_id,
        |  CAST(sz.cluster_size AS BIGINT) AS cluster_size
        |FROM lab l JOIN sz USING (canonical_id)""".stripMargin,
    "ontology_materialize" ->
      """WITH src AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS id, 1 AS priority,
        |         CAST(c_custkey AS BIGINT) AS sid, c_name AS display,
        |         'Customer' AS _ont_source
        |  FROM customer
        |  UNION ALL
        |  SELECT CAST(s_nationkey AS BIGINT), 2, CAST(s_suppkey AS BIGINT),
        |         s_name, 'Supplier'
        |  FROM supplier),
        |win AS (
        |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY priority, sid) AS rk
        |  FROM src),
        |counts AS (SELECT id, count(*) AS n_sources FROM src GROUP BY id)
        |SELECT w.id, w.display, w._ont_source, c.n_sources
        |FROM win w JOIN counts c ON w.id = c.id WHERE w.rk = 1""".stripMargin,
    "motif_two_hop" ->
      """WITH buys AS (
        |  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT CAST(n_nationkey AS BIGINT) AS nation_id, n_name AS nation_name,
        |  count(DISTINCT c) AS n_buyers, count(*) AS n_paths
        |FROM buys
        |JOIN supplier ON s = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_nationkey, n_name""".stripMargin,
    "e2e_full_sync" ->
      """SELECT 'e2e' AS framework_id, 'exposure-risk' AS rule_id,
        |  'exposed-low-balance' AS fact_id, 'Customer' AS asset_label,
        |  CAST(c_custkey AS VARCHAR) AS asset_id, CAST(NULL AS VARCHAR) AS detail
        |FROM customer
        |WHERE c_acctbal < 1000.0 AND EXISTS (
        |  SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderstatus = 'O' AND o_orderpriority = '1-URGENT')""".stripMargin,
  )
}
