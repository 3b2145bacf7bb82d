package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ontology.MappingCorpus

/** Density gates over the GENERATED mapping corpus ([[graft.ontology
  * .MappingCorpus]]): the two widest category files flow end-to-end
  * through the declarative interpreter + [[graft.ontology.Materialize]],
  * exercising every field strategy the roles/groups/tenants/cves gates
  * do not — equal_boolean value lists, nor_boolean over paired flags,
  * invert_boolean / to_boolean null fallbacks, coalesce endpoint chains,
  * enrich-only (eligible_for_source=false) mappings, and a canonical key
  * (email) that is not `name`.
  *
  * Reference: cartography/models/ontology/mapping/data/useraccounts.py
  * (33 modules / 36 node mappings — the largest mapping file) and
  * databases.py (7 modules / 22 node mappings), consumed by
  * cartography/graph/querybuilder.py:24-415 and the ontology users sync
  * (cartography/intel/ontology/users.py:19-65).
  */
object OntologyCorpusQueries {

  private val TAG = 5000L

  /** email pool: `u<k>@corp.ex` — shared across providers so canonical
    * ids collide and module priority resolves the winner. */
  private def mail(k: Column): Column =
    concat(lit("u"), k.cast("string"), lit("@corp.ex"))

  private def pick(c: Column, vals: String*): Column =
    element_at(array(vals.map(lit): _*), (c % vals.length + 1).cast("int"))

  /** nullable boolean: null every `nth`, else k % 2 == 0. */
  private def nbool(k: Column, nth: Int): Column =
    when(k % nth === 0, lit(null).cast("boolean")).otherwise(k % 2 === 0)

  /** The full UserAccount corpus end-to-end: 33 modules / 36 provider
    * labels through the generated mapping data. Shapes beyond the
    * hand-ported four categories: canonical key `email` (required on 32
    * mappings, OPTIONAL on slack — null-email Slack rows flow but never
    * create), equal_boolean value LISTS (cloudflare accepted; duo
    * active+bypass; gitlab/workos-directory active; oci ACTIVE;
    * tailscale active+idle), nor_boolean over suspended+archived
    * (gsuite, googleworkspace), invert_boolean with null→true (lastpass
    * disabled, scaleway locked, sentry pending, jumpcloud suspended),
    * to_boolean with unparseable→true / null→false (lastpass multifactor
    * 'duo', supabase mfa_enabled 'totp'), three ENRICH-ONLY mappings
    * (AWSUser, AWSSSOUser, KubernetesUser — they flow through the
    * interpreter but have no email and can neither create nor link),
    * one provider field feeding two ontology fields (modal
    * display_name → username AND fullname), and the composite-node skip
    * (absent provider columns drop their clause silently). */
  def ontologyMaterializeUserAccounts(spark: SparkSession, dir: String): DataFrame =
    PipelineQueries.materializeFromMappingData(spark, "User",
      MappingCorpus.all("useraccounts"), userProviderFrames(spark, dir),
      Seq("fullname", "active", "has_mfa"), keyField = "email")

  /** The 36 provider node tables for the useraccounts corpus, spelled
    * with each provider's OWN field names — shared by the Materialize
    * gate and the source-merge gate. */
  private def userProviderFrames(spark: SparkSession, dir: String): Map[String, DataFrame] = {
    val nation = Tables.nation(spark, dir)
      .select(col("n_nationkey").cast("long").as("k"), col("n_name").as("nn"))
    val region = Tables.region(spark, dir)
      .select(col("r_regionkey").cast("long").as("k"), col("r_name").as("rn"))
    val customer = Tables.customer(spark, dir)
      .select(col("c_custkey").cast("long").as("k"), col("c_name").as("cn"))
    val supplier = Tables.supplier(spark, dir)
      .select(col("s_suppkey").cast("long").as("k"), col("s_name").as("sn"))
    def sid(pfx: String): Column = concat(lit(pfx), col("k").cast("string")).as("id")

    Map(
      // microsoft, priority 0 — wins every collision; every 9th email null
      "EntraUser" -> customer.select(sid("ms"),
        when(col("k") % 9 === 0, lit(null).cast("string"))
          .otherwise(mail(col("k") % 700)).as("email"),
        col("cn").as("display_name"),
        (col("k") % 3 === 0).as("account_enabled")),
      // to_boolean over an UNPARSEABLE string + invert_boolean over a
      // nullable boolean; supplier keys overlap customer's k%700 pool
      "LastpassUser" -> supplier.select(sid("lp"),
        mail(col("k") % 700).as("email"), col("sn").as("name"),
        when(col("k") % 4 === 0, lit(null).cast("string"))
          .otherwise(pick(col("k"), "duo", "google-auth")).as("multifactor"),
        nbool(col("k"), 5).as("disabled")),
      "GSuiteUser" -> nation.select(sid("gs"),
        mail(col("k")).as("email"), col("nn").as("name"),
        nbool(col("k"), 7).as("suspended"), nbool(col("k") + 1, 6).as("archived")),
      "AnthropicUser" -> region.select(sid("an"),
        mail(col("k")).as("email"), concat(lit("anth "), col("rn")).as("name")),
      "AirbyteUser" -> region.select(sid("ab"),
        mail(col("k") + 5).as("email"), concat(lit("ab "), col("rn")).as("name")),
      "CloudflareMember" -> nation.select(sid("cf"),
        mail(col("k")).as("email"),
        pick(col("k"), "accepted", "pending", "rejected").as("status"),
        (col("k") % 2 === 1).as("two_factor_authentication_enabled")),
      "DuoUser" -> nation.select(sid("duo"),
        mail(col("k") + 10).as("email"), col("nn").as("realname"),
        pick(col("k"), "active", "bypass", "disabled", "locked out").as("status")),
      "GitHubUser" -> supplier.select(sid("gh"),
        mail(col("k") % 300).as("email"),
        concat(lit("gh "), col("sn")).as("fullname"),
        (col("k") % 2 === 0).as("has_2fa_enabled")),
      "GitLabUser" -> nation.select(sid("gl"),
        mail(col("k")).as("email"), concat(lit("gl "), col("nn")).as("name"),
        pick(col("k"), "active", "blocked", "deactivated").as("state")),
      "KeycloakUser" -> region.select(sid("kc"),
        mail(col("k")).as("email"),
        (col("k") % 2 === 0).as("enabled"), (col("k") % 3 === 0).as("totp")),
      "SalesforceUser" -> customer.select(sid("sf"),
        mail((col("k") + 350) % 700).as("email"), col("cn").as("name"),
        (col("k") % 5 =!= 0).as("is_active")),
      "OCIUser" -> nation.select(sid("oci"),
        mail(col("k") + 3).as("email"), concat(lit("oci "), col("nn")).as("name"),
        pick(col("k"), "ACTIVE", "INACTIVE", "DELETED").as("lifecycle_state"),
        (col("k") % 4 === 0).as("is_mfa_activated")),
      "OpenAIUser" -> region.select(sid("oa"),
        mail(col("k") + 2).as("email"), concat(lit("oa "), col("rn")).as("name")),
      "ScalewayUser" -> nation.select(sid("sw"),
        mail(col("k") + 6).as("email"), nbool(col("k"), 3).as("locked"),
        (col("k") % 2 === 1).as("mfa")),
      "SnipeitUser" -> region.select(sid("si"), mail(col("k") + 1).as("email")),
      "TailscaleUser" -> nation.select(sid("ts"),
        mail(col("k") + 4).as("email"), concat(lit("ts "), col("nn")).as("display_name"),
        pick(col("k"), "active", "idle", "offline", "needs-approval").as("status")),
      "OktaUser" -> region.select(sid("ok"), mail(col("k") + 3).as("email")),
      // ENRICH-ONLY: no email field mapped — flows, never creates/links
      "AWSUser" -> nation.select(sid("aws"), col("nn").as("name")),
      "AWSSSOUser" -> region.select(sid("sso"), col("rn").as("user_name")),
      "GoogleWorkspaceUser" -> region.select(sid("gw"),
        mail(col("k")).as("email"), concat(lit("gw "), col("rn")).as("name"),
        nbool(col("k"), 4).as("suspended"), nbool(col("k") + 1, 3).as("archived")),
      // key present but NOT required in the corpus: null emails flow
      "SlackUser" -> nation.select(sid("sl"),
        when(col("k") % 5 === 0, lit(null).cast("string"))
          .otherwise(mail(col("k") + 8)).as("email"),
        concat(lit("sl "), col("nn")).as("real_name"),
        (col("k") % 2 === 0).as("has_mfa")),
      "SpaceliftUser" -> region.select(sid("sp"),
        mail(col("k") + 7).as("email"), concat(lit("sp "), col("rn")).as("name")),
      "PagerDutyUser" -> region.select(sid("pd"),
        mail(col("k") + 9).as("email"), concat(lit("pd "), col("rn")).as("name")),
      "WorkOSUser" -> nation.select(sid("wo"), mail(col("k") + 11).as("email")),
      "WorkOSDirectoryUser" -> region.select(sid("wod"),
        mail(col("k") + 11).as("email"),
        pick(col("k"), "active", "inactive").as("state")),
      "SentryUser" -> nation.select(sid("sn"),
        mail(col("k") + 12).as("email"), concat(lit("sn "), col("nn")).as("name"),
        nbool(col("k"), 6).as("pending"), (col("k") % 3 === 1).as("has_2fa")),
      "SubImageTeamMember" -> region.select(sid("sub"), mail(col("k") + 13).as("email")),
      // ENRICH-ONLY
      "KubernetesUser" -> nation.select(sid("k8s"), col("nn").as("name")),
      "JumpCloudUser" -> nation.select(sid("jc"),
        mail(col("k") + 14).as("email"), nbool(col("k"), 8).as("suspended"),
        (col("k") % 2 === 0).as("mfa_configured")),
      "VercelUser" -> region.select(sid("vc"),
        mail(col("k") + 15).as("email"), concat(lit("vc "), col("rn")).as("name"),
        (col("k") % 2 === 1).as("confirmed")),
      "RailwayUser" -> nation.select(sid("rw"),
        mail(col("k") + 16).as("email"), concat(lit("rw "), col("nn")).as("name"),
        (col("k") % 3 === 2).as("two_factor_auth_enabled")),
      "NetlifyUser" -> region.select(sid("nl"),
        mail(col("k") + 17).as("email"), concat(lit("nl "), col("rn")).as("full_name"),
        (col("k") % 2 === 0).as("mfa_enabled")),
      "DatabricksUser" -> nation.select(sid("db"),
        mail(col("k") + 18).as("email"), concat(lit("db "), col("nn")).as("display_name"),
        (col("k") % 4 =!= 0).as("active")),
      "DatabricksAccountUser" -> region.select(sid("dba"),
        mail(col("k") + 18).as("email"), concat(lit("dba "), col("rn")).as("display_name"),
        (col("k") % 2 === 0).as("active")),
      // to_boolean over 'true'/'false'/'totp'/null — parse + fallback
      "SupabaseOrganizationMember" -> nation.select(sid("su"),
        mail(col("k") + 19).as("email"),
        when(col("k") % 5 === 4, lit(null).cast("string"))
          .otherwise(pick(col("k"), "true", "false", "totp")).as("mfa_enabled")),
      // one provider field feeds BOTH username and fullname
      "ModalUser" -> region.select(sid("mo"),
        mail(col("k") + 20).as("email"),
        concat(lit("mo "), col("rn")).as("display_name")))
  }

  /** The full Database corpus end-to-end: 7 modules / 21 provider labels
    * through the generated mapping data. New shapes vs the other corpus
    * gates: COALESCE endpoint/port chains (scaleway RDB walks
    * public_hostname → public_ip → private_ip; every provider's public
    * side goes null on a stride so the fallback actually fires), extras
    * MISSING from the provider frame dropping silently mid-chain
    * (ScalewayMongoDB lacks private_endpoint_dns, ScalewayRedis lacks
    * private_endpoint_port — the coalesce degrades to the primary, the
    * reference's composite-node pattern), a BOOLEAN static_value
    * (netlify encrypted=true), eleven static type stamps, and 6-way
    * cross-module name collisions resolved by registration priority
    * (aws RDS beats everything; azure cosmos beats gcp cloudsql). */
  def ontologyMaterializeDatabases(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.nation(spark, dir)
      .select(col("n_nationkey").cast("long").as("k"))
    val region = Tables.region(spark, dir)
      .select(col("r_regionkey").cast("long").as("k"))
    val customer = Tables.customer(spark, dir)
      .select(col("c_custkey").cast("long").as("k"))
    val supplier = Tables.supplier(spark, dir)
      .select(col("s_suppkey").cast("long").as("k"))
    def sid(pfx: String): Column = concat(lit(pfx), col("k").cast("string")).as("id")
    def dbname(off: Column): Column = concat(lit("db-"), off.cast("string"))

    val provider: Map[String, DataFrame] = Map(
      "AWSRDSInstance" -> customer.select(sid("rds"),
        dbname(col("k") % 500).as("db_instance_identifier"),
        pick(col("k"), "postgres", "mysql", "aurora").as("engine"),
        concat(lit("rds-"), col("k").cast("string"), lit(".ex")).as("endpoint_address"),
        (lit(5432L) + col("k") % 3).as("endpoint_port"),
        (col("k") % 2 === 0).as("storage_encrypted")),
      "AWSESDomain" -> region.select(sid("es"),
        dbname(col("k") + 2).as("name"), lit("es").as("engine"),
        concat(lit("es-"), col("k").cast("string"), lit(".ex")).as("endpoint"),
        (col("k") % 2 === 1).as("encryption_at_rest_options_enabled")),
      "AWSDynamoDBTable" -> nation.select(sid("dyn"), dbname(col("k")).as("name")),
      "AzureSQLDatabase" -> supplier.select(sid("asql"),
        dbname(col("k") % 400).as("name"),
        pick(col("k"), "v12.0,user", "GP_Gen5").as("kind")),
      "AzureCosmosDBSqlDatabase" -> region.select(sid("acs"),
        dbname(col("k") + 1).as("name")),
      "AzureCosmosDBMongoDBDatabase" -> region.select(sid("acm"),
        dbname(col("k") + 3).as("name")),
      "AzureCosmosDBCassandraKeyspace" -> nation.select(sid("acc"),
        dbname(col("k") + 5).as("name")),
      "GCPBigtableInstance" -> region.select(sid("bt"),
        dbname(col("k") + 4).as("display_name")),
      "GCPCloudSQLInstance" -> nation.select(sid("csql"),
        dbname(col("k") + 1).as("name"),
        pick(col("k"), "POSTGRES_15", "MYSQL_8").as("database_engine")),
      "GCPBigQueryDataset" -> nation.select(sid("bq"),
        dbname(col("k") + 2).as("dataset_id")),
      // full 3-member endpoint chain + 2-member port chain
      "ScalewayRdbInstance" -> nation.select(sid("rdb"),
        dbname(col("k") + 3).as("name"),
        pick(col("k"), "PostgreSQL-15", "MySQL-8").as("engine"),
        when(col("k") % 3 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("rdb-"), col("k").cast("string"), lit(".ex")))
          .as("public_endpoint_hostname"),
        when(col("k") % 3 =!= 1, lit(null).cast("string"))
          .otherwise(concat(lit("10.0.0."), col("k").cast("string")))
          .as("public_endpoint_ip"),
        concat(lit("192.168.0."), col("k").cast("string")).as("private_endpoint_ip"),
        when(col("k") % 2 === 0, lit(null).cast("long"))
          .otherwise(lit(5432L)).as("public_endpoint_port"),
        (lit(54320L) + col("k")).as("private_endpoint_port"),
        (col("k") % 2 === 1).as("encryption_at_rest_enabled")),
      // frame LACKS private_endpoint_port: the coalesce extra drops
      "ScalewayRedisCluster" -> region.select(sid("red"),
        concat(lit("db-r-"), col("k").cast("string")).as("name"),
        when(col("k") % 2 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("163.0.0."), col("k").cast("string")))
          .as("public_endpoint_ip"),
        concat(lit("172.16.0."), col("k").cast("string")).as("private_endpoint_ip"),
        when(col("k") % 2 === 1, lit(null).cast("long"))
          .otherwise(lit(6379L)).as("public_endpoint_port")),
      // frame LACKS private_endpoint_dns: endpoint degrades to primary
      "ScalewayMongoDBInstance" -> region.select(sid("mgo"),
        concat(lit("db-m-"), col("k").cast("string")).as("name"),
        when(col("k") % 3 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("mgo-"), col("k").cast("string"), lit(".ex")))
          .as("public_endpoint_dns"),
        lit(27017L).as("public_endpoint_port"),
        (lit(27018L) + col("k")).as("private_endpoint_port")),
      "ScalewayDataWarehouseDeployment" -> region.select(sid("dwh"),
        concat(lit("db-w-"), col("k").cast("string")).as("name")),
      "ScalewayServerlessSQLDatabase" -> region.select(sid("sls"),
        concat(lit("db-s-"), col("k").cast("string")).as("name"),
        concat(lit("sls-"), col("k").cast("string"), lit(".ex")).as("endpoint")),
      "ScalewaySearchDeployment" -> region.select(sid("srch"),
        concat(lit("db-q-"), col("k").cast("string")).as("name")),
      "DatabricksCatalog" -> nation.select(sid("cat"),
        concat(lit("db-c-"), col("k").cast("string")).as("full_name"),
        pick(col("k"), "MANAGED", "DELTASHARING").as("catalog_type")),
      "DatabricksSchema" -> nation.select(sid("sch"),
        concat(lit("db-c-"), col("k").cast("string"), lit(".s")).as("full_name")),
      "DatabricksTable" -> nation.select(sid("tbl"),
        concat(lit("db-c-"), col("k").cast("string"), lit(".s.t")).as("full_name")),
      "SupabaseDatabase" -> region.select(sid("sup"),
        dbname(col("k")).as("name"),
        concat(lit("sup-"), col("k").cast("string"), lit(".ex")).as("host")),
      "NetlifyDatabaseBranch" -> region.select(sid("nlb"),
        concat(lit("db-n-"), col("k").cast("string")).as("name")))

    PipelineQueries.materializeFromMappingData(spark, "Database",
      MappingCorpus.all("databases"), provider,
      Seq("type", "endpoint", "port", "encrypted"))
  }

  /** PURL parsing + cross-tool package id normalization
    * ([[graft.ontology.Packages]]; trivy/util.py:13-141). One row per
    * part with a purl shape chosen by key stride: PEP-503 dotted pypi
    * names, a percent-encoded npm scope (%40types → @types), a deb
    * namespace, a version-less golang purl, an invalid non-purl string
    * (parse → nulls, ids fall back to bare name/type/version), and a
    * null purl exercising the fallback-only path with case-folding
    * (PyPI → pypi, Lib.X → lib-x). */
  def funcPurlParse(spark: SparkSession, dir: String): DataFrame = {
    import graft.ontology.Packages
    val p = Tables.part(spark, dir).select(
      col("p_partkey").cast("long").as("k"),
      regexp_replace(col("p_name"), " ", ".").as("nm"))
    val w = substring_index(col("nm"), ".", 1)
    val ver = concat(lit("1."), (col("k") % 9).cast("string"), lit(".0"))
    val purl = when(col("k") % 6 === 0,
        concat(lit("pkg:pypi/"), col("nm"), lit("@"), ver))
      .when(col("k") % 6 === 1,
        concat(lit("pkg:npm/%40types/"), w, lit("@"), ver))
      .when(col("k") % 6 === 2,
        concat(lit("pkg:deb/debian/"), w, lit("@"), ver))
      .when(col("k") % 6 === 3, concat(lit("pkg:golang/github.com/"), w))
      .when(col("k") % 6 === 4, concat(lit("oci://"), w))
    val rows = p.select(col("k"), purl.as("purl"),
      initcap(w).as("raw_name"),
      element_at(array(lit("PyPI"), lit("npm"), lit("deb")),
        (col("k") % 3 + 1).cast("int")).as("raw_type"),
      when(col("k") % 5 =!= 0, ver).as("raw_version"))
    val parsed = Packages.parsePurl(col("purl"))
    rows.select(col("k").as("id"),
      parsed.getField("ptype").as("ptype"),
      parsed.getField("namespace").as("namespace"),
      parsed.getField("name").as("pname"),
      parsed.getField("version").as("version"),
      Packages.normalizedPackageId(col("purl"), col("raw_name"),
        col("raw_version"), col("raw_type")).as("vid"),
      Packages.normalizedPackageNameId(col("purl"), col("raw_name"),
        col("raw_type")).as("pid"))
  }

  /** Canonical Package derivation from PackageVersion rows
    * ([[graft.ontology.Packages.packagesFromVersions]];
    * intel/ontology/packages.py:55-102): purl-keyed rows and bare
    * name+type fallback rows MERGE into one package when they normalize
    * to the same versionless key (the cross-tool Trivy↔Syft match),
    * npm scoped rows split off by namespace, rows with no derivable key
    * are skipped, and version_ids is the sorted distinct member set. */
  def ontologyPackages(spark: SparkSession, dir: String): DataFrame = {
    import graft.ontology.Packages
    val p = Tables.part(spark, dir).select(col("p_partkey").cast("long").as("k"))
    val ptype = when(col("k") % 2 === 0, lit("pypi")).otherwise(lit("npm"))
    val ver = concat(lit("1."), (col("k") % 7).cast("string"), lit(".0"))
    val dotted = concat(lit("Lib."), (col("k") % 50).cast("string"))
    val purl = when(col("k") % 3 =!= 2, concat(lit("pkg:"), ptype, lit("/"),
      when(col("k") % 2 === 1, lit("%40acme/")).otherwise(lit("")),
      lower(dotted), lit("@"), ver))
    // every 11th fallback row loses its type → no key → skipped
    val rows = p.select(col("k"), purl.as("purl"), dotted.as("name"),
      when(col("k") % 11 =!= 0, ptype).as("type"), ver.as("version"))
      .withColumn("normalized_id", Packages.normalizedPackageId(
        col("purl"), col("name"), col("version"), col("type")))
      .filter(col("normalized_id").isNotNull)
    Packages.packagesFromVersions(rows)
      .select(col("id"), col("type"), col("name"), col("namespace"),
        size(col("version_ids")).cast("long").as("n_versions"),
        array_join(col("version_ids"), ";").as("vids"))
  }

  /** The reference's OTHER canonical merge
    * ([[graft.ontology.CanonicalSync.sourceNodes]] =
    * get_source_nodes_from_graph, utils.py:85-153): source-of-truth
    * selection with the legacy `entra`→`microsoft` alias, field-NAME
    * translation over the RAW provider columns (strategies do NOT apply
    * on this path — gsuite's `suspended` rides into `active` as-is, the
    * reference's load-time `_ont_*` stamping is where nor_boolean
    * lives), required-field truthiness gating, and per-FIELD
    * first-non-null backfill across sources in sot order — NOT
    * Materialize's whole-row winner: a slack row can fill has_mfa on a
    * user whose fullname came from entra. */
  def ontologyUsersSourceMerge(spark: SparkSession, dir: String): DataFrame = {
    import graft.ontology.CanonicalSync
    val out = CanonicalSync.sourceNodes(
      MappingCorpus.all("useraccounts"),
      userProviderFrames(spark, dir),
      idField = "email",
      sourceOfTruth = Seq("entra", "gsuite", "salesforce", "slack"))
    out.select(col("email"), col("fullname"),
      col("active").cast("boolean").as("active"),
      col("has_mfa").cast("boolean").as("has_mfa"))
  }

  /** Pre-materialized canonical UserAccount rows — the shape load-time
    * semantic projection leaves in the graph: one block per provider,
    * each stamped `_ont_source` = module name plus the five `_ont_*`
    * user fields (querybuilder.py:331-332). The okta block carries
    * EMPTY-string emails (falsy, not null — the required gate must drop
    * them) and the slack block is bait: its source is outside the gate's
    * source-of-truth selection, so every slack row must be excluded by
    * the `_ont_source` filter, not merged. */
  private def canonicalUserAccountFrame(spark: SparkSession, dir: String): DataFrame = {
    val nullStr = lit(null).cast("string")
    val nullBool = lit(null).cast("boolean")
    val ms = Tables.customer(spark, dir)
      .select(col("c_custkey").cast("long").as("k"), col("c_name").as("nm"))
      .select(concat(lit("ms"), col("k").cast("string")).as("id"),
        lit("microsoft").as("_ont_source"),
        when(col("k") % 9 === 0, nullStr).otherwise(mail(col("k") % 700))
          .as("_ont_email"),
        col("nm").as("_ont_fullname"), nullStr.as("_ont_firstname"),
        nullStr.as("_ont_lastname"), (col("k") % 3 === 0).as("_ont_inactive"))
    val gs = Tables.nation(spark, dir)
      .select(col("n_nationkey").cast("long").as("k"), col("n_name").as("nm"))
      .select(concat(lit("gs"), col("k").cast("string")).as("id"),
        lit("gsuite").as("_ont_source"), mail(col("k")).as("_ont_email"),
        nullStr.as("_ont_fullname"),
        concat(lit("fn-"), col("nm")).as("_ont_firstname"),
        concat(lit("ln-"), col("nm")).as("_ont_lastname"),
        when(col("k") % 7 === 0, nullBool).otherwise(col("k") % 2 === 0)
          .as("_ont_inactive"))
    val ok = Tables.supplier(spark, dir)
      .select(col("s_suppkey").cast("long").as("k"), col("s_name").as("nm"))
      .select(concat(lit("ok"), col("k").cast("string")).as("id"),
        lit("okta").as("_ont_source"),
        when(col("k") % 11 === 0, lit("")).otherwise(mail(col("k") % 300))
          .as("_ont_email"),
        concat(lit("ok "), col("nm")).as("_ont_fullname"),
        nullStr.as("_ont_firstname"),
        concat(lit("okl-"), col("nm")).as("_ont_lastname"),
        (col("k") % 4 === 0).as("_ont_inactive"))
    val sl = Tables.nation(spark, dir)
      .select(col("n_nationkey").cast("long").as("k"), col("n_name").as("nm"))
      .select(concat(lit("sl"), col("k").cast("string")).as("id"),
        lit("slack").as("_ont_source"), mail(col("k")).as("_ont_email"),
        concat(lit("SLACK "), col("nm")).as("_ont_fullname"),
        lit("SL").as("_ont_firstname"), lit("ACK").as("_ont_lastname"),
        lit(true).as("_ont_inactive"))
    ms.unionByName(gs).unionByName(ok).unionByName(sl)
  }

  /** The `_has_ontology` branch of the canonical source read
    * (utils.py:112-135 + users.py:6-33): the `users` category's ONLY
    * module is the `"ontology"` pseudo-module, so
    * [[graft.ontology.CanonicalSync.sourceNodes]] reads the
    * already-materialized UserAccount nodes — one `_ont_source = s`
    * filtered read per selected source, in source order (entra
    * normalizes to microsoft first), required-email truthiness gating
    * (okta's empty-string emails drop), per-FIELD first-non-null
    * backfill across sources — and skips the provider loop silently
    * because no selected source has a provider module. The slack block
    * in the canonical frame is outside the selection and must not
    * contribute a single field. */
  def ontologySourceRead(spark: SparkSession, dir: String): DataFrame = {
    import graft.ontology.CanonicalSync
    val out = CanonicalSync.sourceNodes(
      MappingCorpus.all("users"),
      provider = Map.empty,
      idField = "email",
      sourceOfTruth = Seq("entra", "gsuite", "okta"),
      canonical = Map("UserAccount" -> canonicalUserAccountFrame(spark, dir)))
    out.select(col("email"), col("fullname"), col("firstname"),
      col("lastname"), col("inactive").cast("boolean").as("inactive"))
  }

  /** Mutual-unique candidate linking
    * ([[graft.ontology.CanonicalSync.mutualUniqueLink]] — the
    * device↔instance contract of analysis.py:398-460): candidates match
    * on ANY of (full hostname, first dot-segment), lower-cased, with a
    * pair reachable through BOTH keys deduped to one; `lb-*` hostnames
    * form many-to-many ambiguity groups that must produce NO edge; the
    * survivors are exactly the one-to-one node-N pairs. */
  def ontologyUniqueLink(spark: SparkSession, dir: String): DataFrame = {
    import graft.ontology.CanonicalSync
    val instances = Tables.supplier(spark, dir).select(
      col("s_suppkey").cast("long").as("k"))
      .select(concat(lit("i"), col("k").cast("string")).as("inst_id"),
        when(col("k") % 5 =!= 0,
          concat(lit("node-"), col("k").cast("string"), lit(".corp.example.com")))
          .otherwise(concat(lit("lb-"), (col("k") % 7).cast("string"),
            lit(".corp.example.com"))).as("hostname"))
    val devices = Tables.customer(spark, dir).select(
      col("c_custkey").cast("long").as("k")).filter(col("k") <= 400)
      .select(concat(lit("d"), col("k").cast("string")).as("dev_id"),
        when(col("k") % 3 === 1,
          concat(lit("NODE-"), col("k").cast("string"), lit(".local")))
          .when(col("k") % 3 === 2,
            concat(lit("node-"), col("k").cast("string"), lit(".corp.example.com")))
          .otherwise(concat(lit("lb-"), (col("k") % 7).cast("string"),
            lit(".local"))).as("name"))
    def keys(c: Column): Column =
      array(lower(trim(c)), substring_index(lower(trim(c)), ".", 1))
    val iKeys = instances.select(col("inst_id"),
      explode(keys(col("hostname"))).as("key"))
    val dKeys = devices.select(col("dev_id"),
      explode(keys(col("name"))).as("key"))
    val candidates = dKeys.join(iKeys, "key").select("dev_id", "inst_id")
    CanonicalSync.mutualUniqueLink(candidates, "dev_id", "inst_id")
  }

  /** The reference's full users ontology sync, composed end-to-end
    * (cartography/intel/ontology/users.py:19-65 + the USER_LINKING_JOBS
    * of analysis/ontology/analysis.py:462-550): canonical User nodes
    * from [[graft.ontology.CanonicalSync.sourceNodes]] over a
    * source-of-truth selection, HAS_ACCOUNT edges back to every
    * provider account matched by email (user.py:47-54 — the
    * TargetNodeMatcher is an email equi-join), then two linking jobs
    * run through the Analysis DSL exactly like the reference's: User
    * OWNS APIKey via the 2-hop HAS_ACCOUNT → OWNED_BY walk
    * (USER_OWNS_API_KEY), and User HAS_ACCOUNT GitHubUser via
    * ARRAY-MEMBERSHIP on the org-verified email list
    * (USER_HAS_GITHUB_ACCOUNT — `u.email IN
    * g.organization_verified_domain_emails`). Output: per-user link
    * census over the resulting edge tables.
    *
    * r16: the User derivation now runs the reference's ACTUAL re-sync
    * flow — providers are load-time projected into `_ont_*`-stamped
    * UserAccount rows first ([[graft.ontology.Mappings.project]], the
    * ingest-time stamping), and [[graft.ontology.CanonicalSync
    * .sourceNodes]] reads those back through the `users` category's
    * `"ontology"` pseudo-module (users.py:6-33 + utils.py:112-135), not
    * the raw provider frames. The user id set is unchanged (email maps
    * 1:1 on every selected module), so the gate's oracle is untouched —
    * what changed is WHICH engine path derives it end-to-end. */
  def e2eOntologyUsersSync(spark: SparkSession, dir: String): DataFrame = {
    import graft.ontology.CanonicalSync
    import graft.analysis.{AddRelationship, AnalysisJob, AnalysisRunner}
    import graft.graph.{Graph, GraphStore}
    import graft.Lineage.CutOps
    val frames = userProviderFrames(spark, dir)
    val sot = Seq("entra", "gsuite", "slack")
    // load-time semantic projection: one _ont_*-stamped UserAccount
    // block per selected provider module (what a real sync leaves in
    // the graph before users.py runs)
    val projected = CanonicalSync.normalizeSources(sot).flatMap { src =>
      MappingCorpus.all("useraccounts").filter(_.key == src).flatMap(m =>
        m.nodes.filter(_.eligibleForSource).map(n =>
          graft.ontology.Mappings.project(frames(n.nodeLabel), m.key, n)))
    }
    val canonicalUA = projected
      .map(d => d.select(col("id") +:
        d.columns.filter(_.startsWith("_ont_")).sorted.map(col): _*))
      .reduce(_.unionByName(_, allowMissingColumns = true))
    // pinned: consumed by three link-job patterns + the node load
    val users = CanonicalSync.sourceNodes(MappingCorpus.all("users"),
      provider = Map.empty, idField = "email", sourceOfTruth = sot,
      canonical = Map("UserAccount" -> canonicalUA))
      .select(col("email").as("id")).pin
    val accountLabels = Seq("EntraUser", "GSuiteUser", "SlackUser")
    // APIKey nodes OWNED_BY Entra accounts (supplier keys → 'ms<k>' ids)
    val keys = Tables.supplier(spark, dir)
      .select(col("s_suppkey").cast("long").as("k"))
      .select(concat(lit("key"), col("k").cast("string")).as("id"),
        concat(lit("ms"), col("k").cast("string")).as("owner"))
    // GitHubUser nodes with a 2-email verified-domain list
    val gh = Tables.supplier(spark, dir)
      .select(col("s_suppkey").cast("long").as("k"))
      .select(concat(lit("gh"), col("k").cast("string")).as("id"),
        array(mail(col("k") % 40), mail((col("k") + 1) % 40))
          .as("organization_verified_domain_emails"))
    var g = Graph()
      .withNodes("User", GraphStore.initialLoad(users, Seq(GraphStore.ID), TAG,
        dedupBatch = false))
    // HAS_ACCOUNT per provider label: User.email = account.email
    val linkJobs = accountLabels.map { lbl =>
      AnalysisJob(
        name = s"has-account-$lbl",
        pattern = _ => users.join(
          frames(lbl).select(col("id").as("acct"), col("email")),
          col("id") === col("email"))
          .select(col("id").as("src"), col("acct").as("dst")),
        effects = Seq(AddRelationship("User", "HAS_ACCOUNT", lbl, "src", "dst")))
    }
    val ownsKeys = AnalysisJob(
      name = "user-owns-apikey",
      pattern = gr => gr.edgeTable("User", "HAS_ACCOUNT", "EntraUser")
        .select(col("src_id").as("src"), col("dst_id").as("acct"))
        .join(keys.select(col("id").as("key"), col("owner").as("acct")), "acct")
        .select(col("src"), col("key").as("dst")),
      effects = Seq(AddRelationship("User", "OWNS", "APIKey", "src", "dst")))
    val ghAccounts = AnalysisJob(
      name = "user-has-github-account",
      pattern = _ => users.join(
        gh.select(col("id").as("ghid"),
          explode(col("organization_verified_domain_emails")).as("email")),
        col("id") === col("email"))
        .select(col("id").as("src"), col("ghid").as("dst")),
      effects = Seq(AddRelationship("User", "HAS_ACCOUNT", "GitHubUser", "src", "dst")))
    (linkJobs :+ ownsKeys :+ ghAccounts).foreach { j => g = AnalysisRunner.run(g, j, TAG) }
    def cnt(lbl: String, rel: String, as: String) =
      g.edgeTable("User", rel, lbl)
        .groupBy(col("src_id").as("id")).agg(count(lit(1)).as(as))
    val acctCnt = accountLabels.map(cnt(_, "HAS_ACCOUNT", "n"))
      .reduce(_ unionByName _).groupBy("id").agg(sum("n").as("n_accounts"))
    g.nodeTable("User")
      .join(acctCnt, Seq("id"), "left")
      .join(cnt("APIKey", "OWNS", "n_keys"), Seq("id"), "left")
      .join(cnt("GitHubUser", "HAS_ACCOUNT", "n_gh"), Seq("id"), "left")
      .select(col("id").as("email"),
        coalesce(col("n_accounts"), lit(0L)).as("n_accounts"),
        coalesce(col("n_keys"), lit(0L)).as("n_keys"),
        coalesce(col("n_gh"), lit(0L)).as("n_gh"))
  }

  /** Guarded hostname matchlinks
    * ([[graft.ontology.CanonicalSync.guardedHostnameLinks]];
    * devices.py:55-141): linking devices to provider nodes by hostname
    * is a FALLBACK matcher, so it runs per target label only when
    * hostnames are unique on BOTH sides — the AwsInstance frame is
    * unique and links, the JamfComputer frame carries duplicated
    * hostnames and its ENTIRE matchlink is skipped (0 links, not a
    * row-wise filter). Output: per-label guard verdict + link count. */
  def ontologyHostnameMatchlink(spark: SparkSession, dir: String): DataFrame = {
    import graft.ontology.CanonicalSync
    import spark.implicits._
    val devices = Tables.nation(spark, dir)
      .select(concat(lit("h"), col("n_nationkey").cast("string")).as("hostname"))
    val aws = Tables.region(spark, dir).select(
      concat(lit("i"), col("r_regionkey").cast("string")).as("id"),
      concat(lit("h"), col("r_regionkey").cast("string")).as("dns_hostname"))
    val jamf = Tables.supplier(spark, dir).select(
      concat(lit("j"), col("s_suppkey").cast("string")).as("id"),
      concat(lit("h"), (col("s_suppkey") % 3).cast("string")).as("computer_name"))
    val out = CanonicalSync.guardedHostnameLinks(devices, "hostname",
      Seq(("AwsInstance", aws, "dns_hostname"),
        ("JamfComputer", jamf, "computer_name")))
    out.map { case (label, ok, links) =>
      val n = if (ok) links.count() else 0L
      (label, ok, n)
    }.toDF("label", "guard_passed", "n_links")
  }

  /** The workload runtime-image inventory
    * (WORKLOAD_HAS_RUNTIME_IMAGE, analysis.py:614-665): collapse running
    * containers up the bounded WORKLOAD_PARENT chain (`*0..6` —
    * [[graft.graph.Fixpoint.reachWithin]] plus the depth-0 identity for
    * serverless nodes that carry service and container at once) to their
    * owning ComputeService, dedupe per (service, image), and denormalize
    * internet exposure onto the edge as service-level OR any running
    * replica's flag. Containers whose lowercased state is not
    * running/ready are excluded; orphan containers with no parent chain
    * never reach a service. */
  def ontologyRuntimeImages(spark: SparkSession, dir: String): DataFrame = {
    import graft.graph.Fixpoint
    val services = Tables.region(spark, dir).select(
      concat(lit("svc"), col("r_regionkey").cast("string")).as("id"),
      (col("r_regionkey") % 2 === 0).as("exposed_internet"))
    val deployments = Tables.nation(spark, dir).select(
      concat(lit("dep"), col("n_nationkey").cast("string")).as("id"),
      concat(lit("svc"), (col("n_nationkey") % 5).cast("string")).as("parent"))
    val k = col("c_custkey").cast("long")
    val containers = Tables.customer(spark, dir).select(
      concat(lit("c"), k.cast("string")).as("id"),
      element_at(array(lit("RUNNING"), lit("running"), lit("ready"),
        lit("Stopped")), (k % 4 + 1).cast("int")).as("state"),
      (k % 7 === 0).as("exposed_internet"),
      concat(lit("img"), (k % 30).cast("string")).as("image"),
      when(k % 3 === 0, concat(lit("svc"), (k % 5).cast("string")))
        .when(k % 3 === 1, concat(lit("dep"), (k % 25).cast("string")))
        .as("parent"))
    // serverless: the service node is ALSO the running container (depth 0)
    val serverless = services.select(col("id"), lit("ready").as("state"),
      lit(false).as("exposed_internet"),
      concat(lit("img"), (col("id").substr(lit(4), lit(10)).cast("long") % 30)
        .cast("string")).as("image"))
    val parentEdges = containers.filter(col("parent").isNotNull)
      .select(col("id").as("src"), col("parent").as("dst"))
      .unionByName(deployments.select(col("id").as("src"), col("parent").as("dst")))
    val toSvc = Fixpoint.reachWithin(parentEdges, 6)
      .join(services.select(col("id").as("dst")), Seq("dst"), "left_semi")
      .unionByName(services.select(col("id").as("src"), col("id").as("dst")))
    val rts = containers.select("id", "state", "exposed_internet", "image")
      .unionByName(serverless)
      .filter(lower(col("state")).isin("running", "ready"))
    val pairs = rts.select(col("id").as("src"), col("exposed_internet").as("rt_exposed"),
        col("image"))
      .join(toSvc, Seq("src"))
      .groupBy(col("dst").as("svc"), col("image").as("img"))
      .agg(bool_or(col("rt_exposed")).as("any_rt"))
    pairs.join(services.select(col("id").as("svc"),
        col("exposed_internet").as("svc_exposed")), Seq("svc"))
      .select(col("svc"), col("img"),
        (col("svc_exposed") || col("any_rt")).as("exposed_internet"))
  }

  /** The ontology run's deprecated-data migrations
    * ([[graft.graph.Migrations.relabelWhere]] / [[graft.graph.Migrations
    * .stripProperty]]; intel/ontology/__init__.py:33,69-75,110-117 and
    * the three ontology_*.json jobs): the guarded Package →
    * PackageVersion relabel moves ONLY `:Ontology` rows with a non-null
    * version (legacy non-ontology rows belong to a different migration
    * and stay; version-less rows are already the new shape), merging
    * into the pre-existing PackageVersion table; the stale
    * `_ont_status` strip removes the de-scoped property from every
    * SpaceliftStack row. Output: per-label census of rows and surviving
    * flagged values. */
  def ontologyMigrations(spark: SparkSession, dir: String): DataFrame = {
    import graft.graph.{Graph, Migrations}
    val k = col("p_partkey").cast("long")
    val packages = Tables.part(spark, dir).select(
      concat(lit("p"), k.cast("string")).as("id"),
      when(k % 4 =!= 0, concat(lit("1."), (k % 5).cast("string"))).as("version"),
      (k % 4 === 1 || k % 4 === 3).as("is_ontology"))
    val existingPv = Tables.region(spark, dir).select(
      concat(lit("pv"), col("r_regionkey").cast("string")).as("id"),
      lit("2.0").as("version"), lit(true).as("is_ontology"))
    val stacks = Tables.nation(spark, dir).select(
      concat(lit("st"), col("n_nationkey").cast("string")).as("id"),
      pick(col("n_nationkey"), "FINISHED", "UNCONFIRMED", "QUEUED").as("_ont_status"))
    val g0 = Graph()
      .withNodes("Package", packages)
      .withNodes("PackageVersion", existingPv)
      .withNodes("SpaceliftStack", stacks)
    val g1 = Migrations.relabelWhere(g0, "Package", "PackageVersion",
      col("version").isNotNull && col("is_ontology"))
    val g2 = Migrations.stripProperty(g1, "SpaceliftStack", "_ont_status")
    // idempotence: a second run must move nothing and change nothing
    val g3 = Migrations.stripProperty(
      Migrations.relabelWhere(g2, "Package", "PackageVersion",
        col("version").isNotNull && col("is_ontology")),
      "SpaceliftStack", "_ont_status")
    def census(label: String, flaggedCol: String) = {
      val t = g3.nodeTable(label)
      val flagged = if (t.columns.contains(flaggedCol))
        count(when(col(flaggedCol).isNotNull, lit(1)))
      else count(when(lit(false), lit(1))) // stripped column → 0 survivors
      t.agg(count(lit(1)).as("n_nodes"), flagged.as("n_flagged"))
        .select(lit(label).as("label"), col("n_nodes"), col("n_flagged"))
    }
    census("Package", "version")
      .unionByName(census("PackageVersion", "version"))
      .unionByName(census("SpaceliftStack", "_ont_status"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ontology_materialize_useraccounts" -> (ontologyMaterializeUserAccounts _),
    "ontology_materialize_databases" -> (ontologyMaterializeDatabases _),
    "func_purl_parse" -> (funcPurlParse _),
    "ontology_packages" -> (ontologyPackages _),
    "ontology_users_source_merge" -> (ontologyUsersSourceMerge _),
    "ontology_source_read" -> (ontologySourceRead _),
    "ontology_unique_link" -> (ontologyUniqueLink _),
    "e2e_ontology_users_sync" -> (e2eOntologyUsersSync _),
    "ontology_hostname_matchlink" -> (ontologyHostnameMatchlink _),
    "ontology_runtime_images" -> (ontologyRuntimeImages _),
    "ontology_migrations" -> (ontologyMigrations _))

  val oracles: Map[String, String] = Map(
    "ontology_materialize_useraccounts" -> UserAccountsOracle.sql,
    "ontology_materialize_databases" -> DatabasesOracle.sql,
    "func_purl_parse" -> OntologySyncOracles.purlParse,
    "ontology_packages" -> OntologySyncOracles.packages,
    "ontology_users_source_merge" -> OntologySyncOracles.usersSourceMerge,
    "ontology_source_read" -> OntologySyncOracles.ontologySourceRead,
    "ontology_unique_link" -> OntologySyncOracles.uniqueLink,
    "e2e_ontology_users_sync" -> OntologySyncOracles.usersSync,
    "ontology_hostname_matchlink" -> OntologySyncOracles.hostnameMatchlink,
    "ontology_runtime_images" -> OntologySyncOracles.runtimeImages,
    "ontology_migrations" -> OntologySyncOracles.migrations)
}
