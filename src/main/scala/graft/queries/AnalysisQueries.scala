package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.analysis._
import graft.drift.Drift
import graft.graph.{Graph, GraphStore}
import graft.permissions.Permissions
import graft.permissions.Permissions.PolicyStatement
import graft.rules.{CoreFrameworks, Fact, Framework, FrameworkControl, Maturity, ReferenceLibrary, Rule, RulesRunner}

/** Analysis-job / rules / drift / permission operator battery
  * (SURVEY §2.8-2.9), driven through the typed DSLs.
  */
object AnalysisQueries {

  private val TAG = 4000L

  private def customerNodes(spark: SparkSession, dir: String): DataFrame = {
    val b = Tables.customer(spark, dir).select(
      col("c_custkey").as("id"), col("c_name").as("name"))
    GraphStore.initialLoad(b, Seq(GraphStore.ID), TAG)
  }

  /** SetProperty effect (analysis.py:70-87): flag customers that have an
    * open urgent order — the internet-exposure-flag pattern
    * (reference: analysis/aws/analysis.py:95-120). */
  def analysisSetProperty(spark: SparkSession, dir: String): DataFrame = {
    val g0 = Graph().withNodes("Customer", customerNodes(spark, dir))
    val job = AnalysisJob(
      name = "urgent-open-exposure",
      pattern = _ => Tables.orders(spark, dir)
        .filter(col("o_orderstatus") === "O" && col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("id"), lit(true).as("exposed")),
      effects = Seq(SetProperty("Customer", "exposed", "exposed")))
    AnalysisRunner.run(g0, job, TAG)
      .nodeTable("Customer").select(col("id"), col("exposed"))
  }

  /** AddToSet effect (analysis.py:113-130): accumulate the distinct order
    * priorities seen per customer into a list property. */
  def analysisAddToSet(spark: SparkSession, dir: String): DataFrame = {
    val g0 = Graph().withNodes("Customer", customerNodes(spark, dir))
    val job = AnalysisJob(
      name = "order-priorities",
      pattern = _ => Tables.orders(spark, dir)
        .select(col("o_custkey").as("id"), col("o_orderpriority").as("pri")),
      effects = Seq(AddToSet("Customer", "order_priorities", "pri")))
    AnalysisRunner.run(g0, job, TAG)
      .nodeTable("Customer")
      .select(col("id"), array_join(col("order_priorities"), "|").as("priorities"))
  }

  /** AddRelationship effect (analysis.py:133-148): derive BUYS_FROM edges
    * customer→supplier from the order/lineitem pattern — the
    * derive-then-matchlink idiom (reference: route53.py:470-505). */
  def analysisDeriveEdges(spark: SparkSession, dir: String): DataFrame = {
    val g0 = Graph().withNodes("Customer", customerNodes(spark, dir))
    val job = AnalysisJob(
      name = "buys-from",
      pattern = _ => Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("src"), col("l_suppkey").as("dst")),
      effects = Seq(AddRelationship("Customer", "BUYS_FROM", "Supplier", "src", "dst")))
    AnalysisRunner.run(g0, job, TAG)
      .edgeTable("Customer", "BUYS_FROM", "Supplier")
      .select(col("src_id"), col("dst_id"), col("lastupdated"))
  }

  /** Edge-property effects (analysis.py:90-111, analysisbuilder.py:275-283):
    * derive BUYS_FROM edges, stamp total_qty via SetRelationshipProperty,
    * then two SetRelationshipPropertyIfMissing passes — the second must NOT
    * overwrite what the first set (heavy pairs keep 'heavy'). */
  def analysisSetRelProperty(spark: SparkSession, dir: String): DataFrame = {
    val g0 = Graph().withNodes("Customer", customerNodes(spark, dir))
    val pairQty = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("src_id"), col("l_suppkey").as("dst_id"))
      .agg(sum(col("l_quantity").cast("long")).cast("long").as("qty"))
    val derive = AnalysisJob(
      name = "buys-from",
      pattern = _ => pairQty.select(col("src_id").as("src"), col("dst_id").as("dst")),
      effects = Seq(AddRelationship("Customer", "BUYS_FROM", "Supplier", "src", "dst")))
    val stamp = AnalysisJob(
      name = "stamp-total-qty",
      pattern = _ => pairQty,
      effects = Seq(SetRelationshipProperty("Customer", "BUYS_FROM", "Supplier",
        "total_qty", "qty")))
    val flagHeavy = AnalysisJob(
      name = "flag-heavy",
      pattern = _ => pairQty.filter(col("qty") >= 50).withColumn("f", lit("heavy")),
      effects = Seq(SetRelationshipPropertyIfMissing("Customer", "BUYS_FROM", "Supplier",
        "flag", "f")))
    val flagRest = AnalysisJob(
      name = "flag-rest",
      pattern = _ => pairQty.withColumn("f", lit("light")),
      effects = Seq(SetRelationshipPropertyIfMissing("Customer", "BUYS_FROM", "Supplier",
        "flag", "f")))
    Seq(derive, stamp, flagHeavy, flagRest)
      .foldLeft(g0)((g, j) => AnalysisRunner.run(g, j, TAG))
      .edgeTable("Customer", "BUYS_FROM", "Supplier")
      .select(col("src_id").cast("long").as("src_id"),
        col("dst_id").cast("long").as("dst_id"), col("total_qty"), col("flag"))
  }

  /** Incremental + scoped analysis (analysis.py:243-264,
    * analysisbuilder.py:195-254): epoch 1 flags every customer; epoch 2
    * re-syncs only custkey%3=0 rows and runs the flag job with
    * `incrementalOn` plus an even-id tenant scope — so only rows that are
    * BOTH fresh and in scope flip to 'epoch2'; everything else must be
    * untouched. */
  def analysisIncremental(spark: SparkSession, dir: String): DataFrame = {
    val batch = Tables.customer(spark, dir)
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    def flagJob(value: String, incremental: Boolean, scopes: Map[String, org.apache.spark.sql.Column]) =
      AnalysisJob(
        name = s"flag-$value",
        pattern = g => g.nodeTable("Customer").select(col("id"), lit(value).as("flag")),
        effects = Seq(SetProperty("Customer", "flag", "flag")),
        incrementalOn = incremental, scopes = scopes)
    val g1 = Graph().withNodes("Customer",
      GraphStore.initialLoad(batch, Seq(GraphStore.ID), 4000L))
    val g2 = AnalysisRunner.run(g1, flagJob("epoch1", incremental = false, Map.empty), 4000L)
    val g3 = g2.withNodes("Customer",
      GraphStore.upsertNodes(g2.nodeTable("Customer"), batch.filter(col("id") % 3 === 0), 5000L))
    AnalysisRunner.run(g3,
        flagJob("epoch2", incremental = true, Map("Customer" -> (col("id") % 2 === 0))), 5000L)
      .nodeTable("Customer")
      .select(col("id").cast("long").as("id"), col("flag"))
  }

  /** Rules engine (rules/spec/model.py, runners.py:72-186): a 2-rule
    * framework over the asset tables; findings = union of fact results. */
  def rulesFindings(spark: SparkSession, dir: String): DataFrame = {
    val framework = Framework("cis-demo", Seq(
      Rule("acct-hygiene", "Account hygiene", Seq(
        Fact("negative-balance", "Customer has negative balance", "Customer",
          s => Tables.customer(s, dir).filter(col("c_acctbal") < 0)
            .select(col("c_custkey").as("asset_id"),
              format_string("balance=%.2f", col("c_acctbal")).as("detail"))),
        Fact("no-open-orders", "Customer has no open orders", "Customer",
          s => Tables.customer(s, dir)
            .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "O"),
              col("c_custkey") === col("o_custkey"), "left_anti")
            .select(col("c_custkey").as("asset_id"))))),
      Rule("order-risk", "Order risk", Seq(
        Fact("urgent-open", "Urgent order still open", "Order",
          s => Tables.orders(s, dir)
            .filter(col("o_orderstatus") === "O" && col("o_orderpriority") === "1-URGENT")
            .select(col("o_orderkey").as("asset_id"),
              col("o_orderpriority").as("detail")))))))
    RulesRunner.run(spark, framework)
  }

  /** Job-directory registry (intel/analysis.py:12-45, data/jobs/cleanup):
    * two JSON job files written to a temp dir at run time — a derive job
    * flagging negative balances and a cleanup job keeping only
    * `lastupdated = $UPDATE_TAG` rows — discovered in path order and run
    * as SQL-as-data over the registered graph views. */
  def analysisJobRegistry(spark: SparkSession, dir: String): DataFrame = {
    val batch = Tables.customer(spark, dir)
      .select(col("c_custkey").as("id"), col("c_acctbal").as("acctbal"))
    val nodes0 = GraphStore.initialLoad(batch, Seq(GraphStore.ID), 4000L)
    val nodes = GraphStore.upsertNodes(nodes0, batch.filter(col("id") % 3 === 0), 5000L)
    RulesRunner.registerGraphViews(Graph().withNodes("Customer", nodes))
    val jobDir = java.nio.file.Files.createTempDirectory("graft_jobs")
    def write(fname: String, body: String): Unit =
      java.nio.file.Files.writeString(jobDir.resolve(fname), body)
    write("10_flag_negative.json",
      """{"name": "flag negative balances", "statements": [
        |  {"query": "SELECT *, acctbal < 0 AS negative FROM node_Customer",
        |   "materialize": "node_Customer",
        |   "__comment__": "derive a negative-balance flag"}]}""".stripMargin)
    write("20_cleanup.json",
      """{"name": "stale customer cleanup", "statements": [
        |  {"query": "SELECT * FROM node_Customer WHERE lastupdated = $UPDATE_TAG",
        |   "materialize": "node_Customer",
        |   "iterative": true, "iterationsize": 100,
        |   "__comment__": "survivors-only SELECT replaces the LIMIT-loop delete"}]}""".stripMargin)
    JobRegistry.runDirectory(spark, jobDir.toString, Map("UPDATE_TAG" -> 5000L))
    spark.table("node_Customer")
      .select(col("id").cast("long").as("id"), col("negative"), col("lastupdated"))
  }

  /** Framework-control mapping + compliance summary (model.py:286-355
    * Framework dataclass, Fact cypher_count_query, runners.py:259-287
    * filter): rules map to CIS-style controls; filtering by framework
    * short-name drops unmapped rules; the summary counts finding rows,
    * distinct failing assets (one order yields many violating lines), and
    * total assets per fact. */
  def rulesFrameworkSummary(spark: SparkSession, dir: String): DataFrame = {
    val framework = Framework("sec-demo", Seq(
      Rule("acct-hygiene", "Account hygiene",
        facts = Seq(Fact("negative-balance", "Customer has negative balance", "Customer",
          s => Tables.customer(s, dir).filter(col("c_acctbal") < 0)
            .select(col("c_custkey").as("asset_id")),
          countQuery = Some(s => Tables.customer(s, dir).agg(count(lit(1)).as("count"))))),
        tags = Seq("hygiene"),
        frameworks = Seq(FrameworkControl("cis demo benchmark", "cis", "1.1",
          scope = Some("core"), revision = Some("5.0"),
          controlTitle = Some("Maintain account hygiene")))),
      Rule("order-risk", "Order risk",
        facts = Seq(Fact("urgent-open-lines", "Line item of an open urgent order", "Order",
          s => Tables.lineitem(s, dir)
            .join(Tables.orders(s, dir)
              .filter(col("o_orderstatus") === "O" && col("o_orderpriority") === "1-URGENT"),
              col("l_orderkey") === col("o_orderkey"))
            .select(col("o_orderkey").as("asset_id"), col("l_linenumber").as("line_no")),
          maturity = Maturity.Experimental,
          identityFields = Seq("asset_id", "line_no"),
          countQuery = Some(s => Tables.orders(s, dir).agg(count(lit(1)).as("count"))))),
        frameworks = Seq(FrameworkControl("cis demo benchmark", "cis", "2.3"))),
      Rule("unmapped-rule", "Not mapped to any framework",
        facts = Seq(Fact("never-runs", "filtered out before execution", "Customer",
          s => sys.error("filtered rule must not execute"))))))
    RulesRunner.summary(spark,
      RulesRunner.filterByFramework(framework, shortName = Some("CIS")))
  }

  /** The PACKAGED rule library end-to-end (reference ships 37 rule files
    * under cartography/rules/data/rules/; this gate runs the
    * threat-exposure framework — public snapshots, exposed databases,
    * EOL software, inactive-user/active-account, unmanaged accounts,
    * plaintext listeners — over graph VIEWS registered from node/edge
    * tables, the same surface `cartography rules run` queries). Node
    * properties derive deterministically from TPC-H so every fact has a
    * non-trivial hit set. */
  def rulesLibraryFindings(spark: SparkSession, dir: String): DataFrame = {
    val tag = 7000L
    val now = 1500000000L
    val g = Graph()
      .withNodes("Snapshot", Tables.part(spark, dir)
        .select(col("p_partkey").as("id"), (col("p_size") % 13 === 0).as("public")))
      .withNodes("Database", Tables.supplier(spark, dir)
        .select(col("s_suppkey").as("id"),
          (col("s_acctbal") < 0).as("publicly_accessible"),
          when(col("s_suppkey") % 5 === 0, lit(null).cast("string"))
            .otherwise(concat(lit("db-"), col("s_suppkey").cast("string"),
              lit(".internal:5432"))).as("endpoint")))
      .withNodes("Software", Tables.part(spark, dir)
        .select(col("p_partkey").as("id"),
          ((col("p_partkey") % 30) * 100000000L).as("eol_epoch")))
      .withNodes("User", Tables.customer(spark, dir)
        .select(col("c_custkey").as("id"),
          when(col("c_custkey") % 4 === 0, lit(6999L)).otherwise(lit(tag))
            .as("lastupdated")))
      .withNodes("Account", Tables.nation(spark, dir)
        .select(col("n_nationkey").cast("long").as("id"),
          (col("n_regionkey") < 3).as("active"),
          (col("n_nationkey") % 2 === 0).as("managed")))
      .withNodes("Listener", Tables.supplier(spark, dir)
        .select(col("s_suppkey").as("id"),
          element_at(array(lit("HTTP"), lit("HTTPS"), lit("TLS")),
            (col("s_suppkey") % 3 + 1).cast("int")).as("protocol")))
      .withEdges(("User", "OWNS", "Account"), Tables.customer(spark, dir)
        .select(col("c_custkey").as("src_id"),
          col("c_nationkey").cast("long").as("dst_id")))
    RulesRunner.registerGraphViews(g)
    RulesRunner.run(spark, CoreFrameworks.threatExposure(tag, now))
  }

  /** The four reference compliance frameworks end-to-end
    * ([[graft.rules.ReferenceLibrary]]: CIS AWS 6.0.0, SOC 2 TSC 2022,
    * ISO/IEC 27001:2022, NIST AI RMF 1.0 — frameworks/cis.py, soc2.py,
    * iso27001.py, nist_ai_rmf.py — plus the CIS Kubernetes, CIS GCP 4.0
    * and CIS Google Workspace 1.3 scopes): 79 SQL-as-data facts in 58
    * rules covering all 37 reference rule files (data/rules/), over
    * asset views derived from TPC-H, fanned out to every mapped control
    * by [[graft.rules.RulesRunner.controlSummary]]. The oracle runs the
    * IDENTICAL view + fact SQL text in DuckDB. */
  def rulesControlCoverage(spark: SparkSession, dir: String): DataFrame = {
    Seq("region" -> Tables.region _, "supplier" -> Tables.supplier _,
      "part" -> Tables.part _, "nation" -> Tables.nation _,
      "customer" -> Tables.customer _, "orders" -> Tables.orders _)
      .foreach { case (n, t) => t(spark, dir).createOrReplaceTempView(s"rf_base_$n") }
    ReferenceLibrary.viewSql.foreach { case (n, sql) =>
      spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW $n AS $sql") }
    val fw = ReferenceLibrary.framework
    val problems = RulesRunner.validate(spark, fw)
    require(problems.isEmpty, s"reference library invalid: ${problems.mkString("; ")}")
    RulesRunner.controlSummary(spark, fw)
      .orderBy(col("framework"), col("requirement"), col("rule_id"), col("fact_id"))
  }


  /** CDC feed integrity audit ([[graft.operators.Changelog.sequenceAudit]]):
    * per order, version gaps and out-of-order arrivals of a synthetic
    * line-item changelog (every 4th supplier's lines shifted +3 versions
    * → gaps and collisions; part key as arrival order). */
  def cdcSequenceAudit(spark: SparkSession, dir: String): DataFrame = {
    val changes = Tables.lineitem(spark, dir).select(
      col("l_orderkey").cast("long").as("order_id"),
      (col("l_linenumber").cast("long") +
        when(col("l_suppkey") % 4 === 0, 3L).otherwise(0L)).as("version"),
      col("l_partkey").cast("long").as("arrival"))
    graft.operators.Changelog
      .sequenceAudit(changes, Seq("order_id"), "version", "arrival")
      .orderBy(col("order_id"))
  }

  /** Retention marks over a synthetic state registry: one state per
    * (event_type, epoch day with any event) - keep the 5 most recent
    * per query plus the newest of every epoch week, drop the rest. */
  def driftRetention(spark: SparkSession, dir: String): DataFrame =
    Drift.retentionPolicy(
      Tables.events(spark, dir)
        .select(col("event_type").as("query"),
          expr("unix_micros(ts) div 86400000000 * 86400").as("tag"))
        .distinct(),
      keepLast = 5)
      .orderBy(col("query"), col("tag"))

  /** Drift detection (driftdetect): states = (user, event_type) pairs with
    * ≥3 events in each half of the month; diff both directions. */
  def driftDetect(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def state(cond: org.apache.spark.sql.Column): DataFrame = ev.filter(cond)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n")).filter(col("n") >= 3)
      .select(col("user_id"), col("event_type"))
    val older = state(col("ts") < lit("2024-01-16").cast("timestamp"))
    val newer = state(col("ts") >= lit("2024-01-16").cast("timestamp"))
    // drive the full registry lifecycle (reference get_states.py:111-141):
    // record both epochs as named states, then diff the two most recent —
    // same result as Drift.diff(older, newer), via the persisted path
    val registry = java.nio.file.Files.createTempDirectory("graft_drift").toString
    Drift.addState(older, registry, "active_users", tag = 100L)
    Drift.addState(newer, registry, "active_users", tag = 200L)
    Drift.diffLatest(spark, registry, "active_users")
  }

  /** The gate's policy: 123 statements (3 hand-written + 120 generated —
    * spans 2 mask blocks, exercising the chunked evaluator), a third of
    * them carrying Condition blobs. Shared between the Spark query and the
    * generated oracle so the two cannot drift. */
  private val PolicyStatements: Seq[PolicyStatement] = Seq(
    PolicyStatement("s1", "Allow", "Supplier#*", "arn:part:Brand#1?:*"),
    PolicyStatement("s2", "Allow", "Supplier#0000000?1", "arn:part:*:PROMO:*",
      condition = Some("""[{"IpAddress": {"aws:SourceIp": "10.0.0.0/8"}}]""")),
    PolicyStatement("s3", "Deny", "*", "*:ECONOMY:*")) ++
    (0 until 120).map { i =>
      val cond =
        if (i % 3 == 0)
          Some(s"""[{"StringEquals": {"aws:RequestTag/env": "env$i"}},""" +
            s""" {"IpAddress": {"aws:SourceIp": "10.$i.0.0/16"}}]""")
        else None
      PolicyStatement(s"g$i", "Allow",
        s"Supplier#*${i % 10}", s"arn:part:Brand#${10 + i % 45}:*", cond)
    }

  private def supplierPrincipals(spark: SparkSession, dir: String): DataFrame =
    Tables.supplier(spark, dir)
      .select(col("s_suppkey").as("id"), col("s_name").as("name"))

  private def partResources(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_partkey").as("id"),
        concat(lit("arn:part:"), col("p_brand"), lit(":"), col("p_type"),
          lit(":"), col("p_partkey")).as("arn"))

  /** Permission relationships (permission_relationships.py): wildcard
    * policy statements evaluated over supplier principals × part ARNs,
    * deny-overrides + condition annotation, without materializing the
    * cross product. 123 statements → two 62-bit mask blocks. */
  def permissionRelationships(spark: SparkSession, dir: String): DataFrame =
    Permissions.evaluate(supplierPrincipals(spark, dir), partResources(spark, dir),
      PolicyStatements)

  private val SyncStatementsEpoch1: Seq[PolicyStatement] = Seq(
    PolicyStatement("s1", "Allow", "Supplier#*1", "arn:part:*"),
    PolicyStatement("s2", "Allow", "Supplier#*2", "*:PROMO*"),
    PolicyStatement("d1", "Deny", "*", "*:ECONOMY*"))
  private val SyncStatementsEpoch2: Seq[PolicyStatement] = Seq(
    PolicyStatement("s1", "Allow", "Supplier#*1", "arn:part:*"),
    PolicyStatement("s3", "Allow", "Supplier#*3", "*:STANDARD*"),
    PolicyStatement("d1", "Deny", "*", "*:ECONOMY*"))

  /** The FULL reference sync loop for permission relationships
    * (permission_relationships.py:630-694): principals and resource ARNs
    * are READ BACK from graph node tables (get_principals_for_account /
    * get_resource_arns), the evaluator runs, allowed pairs LOAD as
    * CAN_ACCESS edges under the epoch tag (load_principal_mappings), and
    * cleanup_rpr deletes every edge of the relationship not touched this
    * epoch. Two epochs with a policy change between them: epoch 2
    * revokes the PROMO grant and adds a STANDARD grant, so PROMO-only
    * edges must be DELETED by the scoped cleanup, pairs granted in both
    * epochs keep firstseen = epoch 1, and new STANDARD pairs appear with
    * firstseen = epoch 2 — the stale-edge deletion is what the oracle
    * pins. */
  def permissionRelationshipsSync(spark: SparkSession, dir: String): DataFrame = {
    val g0 = Graph()
      .withNodes("Supplier", GraphStore.initialLoad(
        supplierPrincipals(spark, dir), Seq(GraphStore.ID), 100L))
      .withNodes("Part", GraphStore.initialLoad(
        partResources(spark, dir), Seq(GraphStore.ID), 100L))
    val key = ("Supplier", "CAN_ACCESS", "Part")
    def epoch(g: Graph, stmts: Seq[PolicyStatement], tag: Long): Graph = {
      val principals = g.nodeTable("Supplier").select(col("id"), col("name"))
      val resources = g.nodeTable("Part").select(col("id"), col("arn"))
      val allowed = Permissions.evaluate(principals, resources, stmts)
        .select(col("principal_id").as(GraphStore.SRC),
          col("resource_id").as(GraphStore.DST))
      val ex = g.edges.getOrElse(key,
        GraphStore.emptyLike(allowed, Seq(GraphStore.SRC, GraphStore.DST)))
      val upserted = GraphStore.upsertEdges(ex, allowed, tag)
      g.withEdges(key, GraphStore.cleanup(upserted, tag))
    }
    val g2 = epoch(epoch(g0, SyncStatementsEpoch1, 100L), SyncStatementsEpoch2, 200L)
    g2.edgeTable("Supplier", "CAN_ACCESS", "Part")
      .select(col(GraphStore.SRC).as("principal_id"),
        col(GraphStore.DST).as("resource_id"),
        col(GraphStore.FIRSTSEEN).as("firstseen"),
        col(GraphStore.LASTUPDATED).as("lastupdated"))
  }

  /** Action-tagged statements for the mapping-file gate: which statements
    * apply to a mapping is decided by IAM action wildcards
    * (statement_applies_to_permission). */
  private val ActionStatements: Seq[PolicyStatement] = Seq(
    PolicyStatement("a1", "Allow", "Supplier#*1", "arn:part:*",
      actionPattern = "part:Read*"),
    PolicyStatement("a2", "Allow", "Supplier#*2", "arn:part:Brand#2?:*",
      actionPattern = "part:Write",
      condition = Some("""[{"IpAddress": {"aws:SourceIp": "10.1.0.0/16"}}]""")),
    PolicyStatement("a3", "Allow", "Supplier#*3", "*:PROMO:*",
      actionPattern = "part:*"),
    PolicyStatement("d1", "Deny", "*", "*:ECONOMY:*"))

  /** The YAML mapping document (reference
    * cartography/data/permission_relationships.yaml shape) — includes an
    * invalid entry that must be skipped like is_valid_rpr does. */
  private val MappingYaml =
    """- target_label: Part
      |  permissions:
      |  - part:ReadItem
      |  relationship_name: CAN_READ
      |- target_label: Part
      |  permissions:
      |  - part:Write
      |  relationship_name: CAN_WRITE
      |- target_label: Broken
      |  permissions:
      |  - part:Nope
      |""".stripMargin

  /** Mapping-file-driven permission relationships: the YAML config is
    * written to disk and parsed back (the reference's
    * --permission-relationships-file source), statements pre-filter by
    * action wildcard per mapping, and each mapping's evaluation unions
    * with its relationship metadata. */
  def permissionMappingFile(spark: SparkSession, dir: String): DataFrame = {
    val f = java.nio.file.Files.createTempFile("perm_mappings", ".yaml")
    java.nio.file.Files.writeString(f, MappingYaml)
    val mappings = Permissions.parseRelationshipMappingsFile(f.toString)
    Permissions.relationshipEdges(supplierPrincipals(spark, dir),
      partResources(spark, dir), ActionStatements, mappings)
  }

  private def stmtValuesRows(stmts: Seq[PolicyStatement]): String =
    stmts.zipWithIndex.map { case (s, i) =>
      val isAllow = s.effect.toLowerCase == "allow"
      val keys = s.condition.map(Permissions.conditionContextKeys)
        .getOrElse(Nil).mkString(",")
      s"($i, ${isAllow}, ${s.condition.isDefined}, " +
        s"'${Permissions.wildcardToRegex(s.principalPattern)}', " +
        s"'${Permissions.wildcardToRegex(s.resourcePattern)}', '$keys')"
    }.mkString(",\n      ")

  /** The granted-pairs subquery for a statement set. Mirrors the
    * engine's two-sided design: each side regex-matches against the
    * statements INDEPENDENTLY (|P|×|S| + |R|×|S| regex evals), the
    * halves meet on the statement index — never |P|×|R|×|S| regex work
    * (the naive triple cross join takes ~30s at sf0.01; this takes
    * ~1s). */
  private def grantedSubquery(stmts: Seq[PolicyStatement]): String =
    s"""(SELECT pid, rid,
       |    NOT bool_or(is_allow AND NOT has_cond) AS has_condition,
       |    array_to_string(list_sort(list_distinct(flatten(
       |      list(CASE WHEN is_allow AND has_cond
       |           THEN string_split(keys, ',') ELSE [] END)))), ',') AS cond_keys_all
       |  FROM (
       |    SELECT pm.pid, rm.rid, s.is_allow, s.has_cond, s.keys
       |    FROM (SELECT * FROM (VALUES
       |      ${stmtValuesRows(stmts)}) AS t(i, is_allow, has_cond, pre, rre, keys)) s
       |    JOIN (SELECT p.pid, t.i FROM
       |            (SELECT s_suppkey AS pid, s_name AS name FROM supplier) p
       |          CROSS JOIN (VALUES ${stmtValuesRows(stmts)})
       |            AS t(i, is_allow, has_cond, pre, rre, keys)
       |          WHERE regexp_matches(p.name, t.pre)) pm ON pm.i = s.i
       |    JOIN (SELECT r.rid, t.i FROM
       |            (SELECT p_partkey AS rid,
       |              'arn:part:' || p_brand || ':' || p_type || ':' || CAST(p_partkey AS VARCHAR) AS arn
       |             FROM part) r
       |          CROSS JOIN (VALUES ${stmtValuesRows(stmts)})
       |            AS t(i, is_allow, has_cond, pre, rre, keys)
       |          WHERE regexp_matches(r.arn, t.rre)) rm ON rm.i = s.i)
       |  GROUP BY pid, rid
       |  HAVING bool_or(is_allow) AND NOT bool_or(NOT is_allow))""".stripMargin

  private def mappingGrantSql(stmts: Seq[PolicyStatement], relName: String,
                              targetLabel: String): String =
    s"""SELECT CAST(pid AS BIGINT) AS principal_id,
       |  CAST(rid AS BIGINT) AS resource_id,
       |  '$relName' AS relationship_name, '$targetLabel' AS target_label,
       |  has_condition,
       |  CASE WHEN has_condition THEN cond_keys_all ELSE '' END AS condition_keys
       |FROM ${grantedSubquery(stmts)}""".stripMargin

  /** DNS sub-zone derivation through the full DnsZones module sync
    * (route53.py:470-505 link_sub_zones): NS-record equi-join chain +
    * ENDS WITH filter → matchlinks with account-scoped cleanup. The
    * stray per-nation delegations in the feed are equi-matches the
    * suffix filter must reject. */
  def intelDnsSubzones(spark: SparkSession, dir: String): DataFrame =
    graft.intel.DnsZones.sync(Graph(), spark, dir, TAG)
      .edgeTable("DNSZone", "SUBZONE", "DNSZone")
      .select(col("src_id"), col("dst_id"), col("lastupdated"))

  /** Deequ-style declarative validation over orders, every check in ONE
    * aggregation pass: row count, key uniqueness (o_orderkey is a true
    * key, o_custkey is 10:1), completeness, domain compliance, bounds
    * compliance (the price-band check actually discriminates on this
    * corpus), and an exact numeric profile in cents. */
  def qualitySuite(spark: SparkSession, dir: String): DataFrame = {
    import graft.stats.DataQuality._
    val o = Tables.orders(spark, dir).withColumn("price_cents",
      (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
    report(o, Seq(
      Uniqueness(Seq("o_orderkey")),
      Uniqueness(Seq("o_custkey")),
      Completeness("o_orderstatus"),
      Compliance("status_known", col("o_orderstatus").isin("F", "O", "P")),
      Compliance("price_band", col("o_totalprice").between(2000.0, 400000.0)),
      Compliance("urgent", col("o_orderpriority") === "1-URGENT"),
      NumericProfile("price_cents")))
  }

  /** CDC changelog compaction ([[graft.operators.Changelog]]): the base
    * snapshot is orders NOT divisible by 5 (so divisible-by-5 keys arrive
    * as pure inserts), the changelog is one change per (order, line
    * number) — line numbers divisible by 3 are delete tombstones, the
    * rest upsert the line's max price — and the argmax must replay them
    * in version order: a delete at 3 or 6 resurrects under a later
    * upsert at 4/5/7, a trailing delete removes the key. */
  def cdcApply(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 5 =!= 0)
      .select(col("o_orderkey").as("order_id"),
        (col("o_totalprice").cast("decimal(18,4)") * 10000).cast("long")
          .as("price_x1e4"))
    val changes = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey").as("order_id"),
        col("l_linenumber").cast("long").as("version"))
      .agg(max((col("l_extendedprice").cast("decimal(18,4)") * 10000)
        .cast("long")).as("price_x1e4"))
      .withColumn("op",
        when(col("version") % 3 === 0, lit("D")).otherwise(lit("U")))
    graft.operators.Changelog.apply(base, changes, Seq("order_id"),
      "version", "op", Seq("price_x1e4"))
  }

  /** Incremental view maintenance: the per-customer (order count, spend
    * cents) snapshot over epoch-1 orders updated from a delta — every
    * 10th order inserted, every 7th epoch-1 order deleted — via
    * [[graft.operators.Changelog.maintainAgg]]; the result must equal a
    * full recompute over the final fact set, but the plan only touches
    * the delta plus the touched groups. */
  def incrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Changelog
    val cents = (col("o_totalprice").cast("decimal(18,4)") * 100).cast("long")
    val all = Tables.orders(spark, dir)
      .select(col("o_custkey").cast("long").as("cust"), cents.as("spend"),
        col("o_orderkey"))
    val epoch1 = all.filter(col("o_orderkey") % 10 =!= 0)
    val snapshot = Changelog.aggregate(epoch1.select(col("cust"), col("spend")),
      Seq("cust"), Seq("spend"))
    val delta = all.filter(col("o_orderkey") % 10 === 0)
      .select(col("cust"), col("spend"), lit(1L).as("mult"))
      .unionByName(epoch1.filter(col("o_orderkey") % 7 === 0)
        .select(col("cust"), col("spend"), lit(-1L).as("mult")))
    Changelog.maintainAgg(snapshot, delta, Seq("cust"), "mult", Seq("spend"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "incremental_agg" -> (incrementalAgg _),
    "cdc_apply" -> (cdcApply _),
    "quality_suite" -> (qualitySuite _),
    "intel_dns_subzones" -> (intelDnsSubzones _),
    "analysis_set_property" -> (analysisSetProperty _),
    "analysis_add_to_set" -> (analysisAddToSet _),
    "analysis_derive_edges" -> (analysisDeriveEdges _),
    "analysis_set_rel_property" -> (analysisSetRelProperty _),
    "analysis_incremental" -> (analysisIncremental _),
    "rules_findings" -> (rulesFindings _),
    "rules_framework_summary" -> (rulesFrameworkSummary _),
    "rules_control_coverage" -> (rulesControlCoverage _),
    "cdc_sequence_audit" -> (cdcSequenceAudit _),
    "rules_library_findings" -> (rulesLibraryFindings _),
    "analysis_job_registry" -> (analysisJobRegistry _),
    "drift_detect" -> (driftDetect _),
    "drift_retention" -> (driftRetention _),
    "permission_relationships" -> (permissionRelationships _),
    "permission_relationships_sync" -> (permissionRelationshipsSync _),
    "permission_mapping_file" -> (permissionMappingFile _),
  )

  val oracles: Map[String, String] = Map(
    // full recompute over the final fact set: epoch-1 survivors
    // (not deleted) plus the inserted rows — what the incremental
    // merge must equal without ever rescanning the base
    "incremental_agg" ->
      """WITH o AS (
        |  SELECT CAST(o_custkey AS BIGINT) AS cust,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT) AS spend,
        |    o_orderkey AS k
        |  FROM orders),
        |final AS (
        |  SELECT cust, spend FROM o
        |  WHERE k % 10 <> 0 AND k % 7 <> 0
        |  UNION ALL
        |  SELECT cust, spend FROM o WHERE k % 10 = 0)
        |SELECT cust, count(*) AS n_rows,
        |  CAST(sum(spend) AS BIGINT) AS sum_spend
        |FROM final GROUP BY cust""".stripMargin,
    "cdc_apply" ->
      """WITH base AS (
        |  SELECT o_orderkey AS order_id, CAST(0 AS BIGINT) AS version,
        |    'U' AS op,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
        |      AS price_x1e4
        |  FROM orders WHERE o_orderkey % 5 <> 0),
        |ch AS (
        |  SELECT l_orderkey AS order_id, CAST(l_linenumber AS BIGINT) AS version,
        |    CASE WHEN l_linenumber % 3 = 0 THEN 'D' ELSE 'U' END AS op,
        |    max(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT))
        |      AS price_x1e4
        |  FROM lineitem GROUP BY 1, 2, 3),
        |u AS (SELECT * FROM base UNION ALL SELECT * FROM ch),
        |last AS (
        |  SELECT order_id, version, op, price_x1e4,
        |    row_number() OVER (PARTITION BY order_id ORDER BY version DESC) AS rk
        |  FROM u)
        |SELECT order_id, version, price_x1e4
        |FROM last WHERE rk = 1 AND op <> 'D'""".stripMargin,
    "quality_suite" ->
      """WITH o AS (
        |  SELECT *, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    AS price_cents FROM orders),
        |a AS (
        |  SELECT count(*) AS n,
        |    count(DISTINCT o_orderkey) AS dk,
        |    count(DISTINCT o_custkey) AS dc,
        |    count(o_orderstatus) AS nn,
        |    sum(CASE WHEN o_orderstatus IN ('F','O','P') THEN 1 ELSE 0 END) AS sk,
        |    sum(CASE WHEN o_totalprice BETWEEN 2000.0 AND 400000.0
        |             THEN 1 ELSE 0 END) AS pb,
        |    sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS ur,
        |    min(price_cents) AS mn, max(price_cents) AS mx,
        |    sum(price_cents) AS sm
        |  FROM o)
        |SELECT 'rows' AS check_name, 'count' AS metric, CAST(n AS BIGINT) AS value FROM a
        |UNION ALL SELECT 'uniqueness:o_orderkey', 'distinct_x1e6', CAST(dk * 1000000 // n AS BIGINT) FROM a
        |UNION ALL SELECT 'uniqueness:o_custkey', 'distinct_x1e6', CAST(dc * 1000000 // n AS BIGINT) FROM a
        |UNION ALL SELECT 'completeness:o_orderstatus', 'non_null_x1e6', CAST(nn * 1000000 // n AS BIGINT) FROM a
        |UNION ALL SELECT 'compliance:status_known', 'satisfied_x1e6', CAST(sk * 1000000 // n AS BIGINT) FROM a
        |UNION ALL SELECT 'compliance:price_band', 'satisfied_x1e6', CAST(pb * 1000000 // n AS BIGINT) FROM a
        |UNION ALL SELECT 'compliance:urgent', 'satisfied_x1e6', CAST(ur * 1000000 // n AS BIGINT) FROM a
        |UNION ALL SELECT 'profile:price_cents', 'min', CAST(mn AS BIGINT) FROM a
        |UNION ALL SELECT 'profile:price_cents', 'max', CAST(mx AS BIGINT) FROM a
        |UNION ALL SELECT 'profile:price_cents', 'sum', CAST(sm AS BIGINT) FROM a""".stripMargin,
    "intel_dns_subzones" ->
      s"""WITH rz AS (
         |  SELECT 'zone-r' || CAST(r_regionkey AS VARCHAR) AS zone_id,
         |         lower(replace(r_name, ' ', '-')) || '.corp' AS name,
         |         r_regionkey
         |  FROM region),
         |nz AS (
         |  SELECT 'zone-n' || CAST(n_nationkey AS VARCHAR) AS zone_id,
         |         lower(replace(n_name, ' ', '-')) || '.' || rz.name AS name,
         |         n_nationkey
         |  FROM nation JOIN rz ON n_regionkey = rz.r_regionkey),
         |zones AS (
         |  SELECT zone_id, name FROM rz UNION ALL SELECT zone_id, name FROM nz),
         |ns AS (
         |  SELECT 'ns-' || CAST(n_nationkey AS VARCHAR) AS ns_id,
         |         zone_id AS owner_zone
         |  FROM nz),
         |recs AS (
         |  SELECT rz.zone_id AS rec_zone,
         |         lower(rtrim(upper(nz.name) || '.', '.')) AS name,
         |         'ns-' || CAST(nz.n_nationkey AS VARCHAR) AS ns_ref
         |  FROM nation JOIN rz ON n_regionkey = rz.r_regionkey
         |              JOIN nz ON nz.n_nationkey = nation.n_nationkey
         |  UNION ALL
         |  SELECT a.zone_id,
         |         lower(rtrim(upper(b.name) || '.', '.')),
         |         'ns-' || CAST(b.n_nationkey AS VARCHAR)
         |  FROM nz a JOIN nz b ON b.n_nationkey = (a.n_nationkey + 1) % 25)
         |SELECT z.zone_id AS src_id, z2.zone_id AS dst_id,
         |       CAST($TAG AS BIGINT) AS lastupdated
         |FROM recs r
         |JOIN zones z ON r.rec_zone = z.zone_id
         |JOIN ns ON r.ns_ref = ns.ns_id
         |JOIN nz z2 ON ns.owner_zone = z2.zone_id
         |WHERE r.name = z2.name
         |  AND z2.name LIKE '%.' || z.name
         |  AND z.zone_id <> z2.zone_id""".stripMargin,
    "analysis_set_property" ->
      """SELECT CAST(c_custkey AS BIGINT) AS id,
        |  CASE WHEN EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                    AND o_orderstatus = 'O' AND o_orderpriority = '1-URGENT')
        |       THEN TRUE ELSE NULL END AS exposed
        |FROM customer""".stripMargin,
    "analysis_add_to_set" ->
      """SELECT CAST(c_custkey AS BIGINT) AS id,
        |  coalesce((SELECT string_agg(pri, '|' ORDER BY pri) FROM
        |            (SELECT DISTINCT o_orderpriority AS pri FROM orders
        |             WHERE o_custkey = c_custkey) t), '') AS priorities
        |FROM customer""".stripMargin,
    "analysis_derive_edges" ->
      """SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src_id,
        |  CAST(l_suppkey AS BIGINT) AS dst_id,
        |  CAST(4000 AS BIGINT) AS lastupdated
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin,
    "analysis_set_rel_property" ->
      """WITH pairs AS (
        |  SELECT CAST(o_custkey AS BIGINT) AS src_id,
        |    CAST(l_suppkey AS BIGINT) AS dst_id,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2)
        |SELECT src_id, dst_id, total_qty,
        |  CASE WHEN total_qty >= 50 THEN 'heavy' ELSE 'light' END AS flag
        |FROM pairs""".stripMargin,
    "analysis_incremental" ->
      """SELECT CAST(c_custkey AS BIGINT) AS id,
        |  CASE WHEN c_custkey % 3 = 0 AND c_custkey % 2 = 0
        |       THEN 'epoch2' ELSE 'epoch1' END AS flag
        |FROM customer""".stripMargin,
    "rules_findings" ->
      """SELECT 'cis-demo' AS framework_id, 'acct-hygiene' AS rule_id,
        |  'negative-balance' AS fact_id, 'Customer' AS asset_label,
        |  CAST(c_custkey AS VARCHAR) AS asset_id,
        |  printf('balance=%.2f', c_acctbal) AS detail
        |FROM customer WHERE c_acctbal < 0
        |UNION ALL
        |SELECT 'cis-demo', 'acct-hygiene', 'no-open-orders', 'Customer',
        |  CAST(c_custkey AS VARCHAR), NULL
        |FROM customer WHERE NOT EXISTS
        |  (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |UNION ALL
        |SELECT 'cis-demo', 'order-risk', 'urgent-open', 'Order',
        |  CAST(o_orderkey AS VARCHAR), o_orderpriority
        |FROM orders WHERE o_orderstatus = 'O' AND o_orderpriority = '1-URGENT'""".stripMargin,
    "rules_library_findings" ->
      """SELECT 'threat-exposure' AS framework_id, 'snapshot-exposure' AS rule_id,
        |  'public-snapshot' AS fact_id, 'Snapshot' AS asset_label,
        |  CAST(p_partkey AS VARCHAR) AS asset_id, CAST(NULL AS VARCHAR) AS detail
        |FROM part WHERE p_size % 13 = 0
        |UNION ALL
        |SELECT 'threat-exposure', 'database-exposure', 'database-exposed',
        |  'Database', CAST(s_suppkey AS VARCHAR),
        |  'db-' || CAST(s_suppkey AS VARCHAR) || '.internal:5432'
        |FROM supplier WHERE s_acctbal < 0 AND s_suppkey % 5 <> 0
        |UNION ALL
        |SELECT 'threat-exposure', 'software-lifecycle', 'eol-software',
        |  'Software', CAST(p_partkey AS VARCHAR),
        |  CAST((p_partkey % 30) * 100000000 AS VARCHAR)
        |FROM part WHERE (p_partkey % 30) * 100000000 < 1500000000
        |UNION ALL
        |SELECT 'threat-exposure', 'identity-lifecycle',
        |  'inactive-user-active-account', 'User', CAST(c_custkey AS VARCHAR),
        |  CAST(c_nationkey AS VARCHAR)
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_custkey % 4 = 0 AND n_regionkey < 3
        |UNION ALL
        |SELECT 'threat-exposure', 'identity-lifecycle', 'unmanaged-account',
        |  'Account', CAST(n_nationkey AS VARCHAR), CAST(NULL AS VARCHAR)
        |FROM nation WHERE n_nationkey % 2 <> 0
        |UNION ALL
        |SELECT 'threat-exposure', 'transport-encryption', 'plaintext-listener',
        |  'Listener', CAST(s_suppkey AS VARCHAR), 'HTTP'
        |FROM supplier WHERE s_suppkey % 3 = 0""".stripMargin,
    "analysis_job_registry" ->
      """SELECT CAST(c_custkey AS BIGINT) AS id,
        |  c_acctbal < 0 AS negative,
        |  CAST(5000 AS BIGINT) AS lastupdated
        |FROM customer WHERE c_custkey % 3 = 0""".stripMargin,
    "rules_framework_summary" ->
      """SELECT 'acct-hygiene' AS rule_id, 'negative-balance' AS fact_id,
        |  (SELECT count(*) FROM customer WHERE c_acctbal < 0) AS n_findings,
        |  (SELECT count(DISTINCT c_custkey) FROM customer WHERE c_acctbal < 0) AS n_failing_assets,
        |  (SELECT count(*) FROM customer) AS n_total_assets
        |UNION ALL
        |SELECT 'order-risk', 'urgent-open-lines',
        |  (SELECT count(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |   WHERE o_orderstatus = 'O' AND o_orderpriority = '1-URGENT'),
        |  (SELECT count(DISTINCT o_orderkey) FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |   WHERE o_orderstatus = 'O' AND o_orderpriority = '1-URGENT'),
        |  (SELECT count(*) FROM orders)""".stripMargin,
    "cdc_sequence_audit" ->
      """WITH ch AS (SELECT CAST(l_orderkey AS BIGINT) AS k,
        |  CAST(l_linenumber + CASE WHEN l_suppkey % 4 = 0 THEN 3 ELSE 0 END
        |    AS BIGINT) AS v,
        |  CAST(l_partkey AS BIGINT) AS a FROM lineitem),
        |dv AS (SELECT DISTINCT k, v FROM ch),
        |g AS (SELECT k, v,
        |  v - lag(v) OVER (PARTITION BY k ORDER BY v) - 1 AS gap FROM dv),
        |gs AS (SELECT k, CAST(count(*) AS BIGINT) AS n_versions,
        |  min(v) AS version_lo, max(v) AS version_hi,
        |  CAST(sum(CASE WHEN gap > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
        |  CAST(coalesce(max(CASE WHEN gap > 0 THEN gap END), 0) AS BIGINT)
        |    AS max_gap_len
        |  FROM g GROUP BY k),
        |om AS (SELECT k, v, max(v) OVER (PARTITION BY k ORDER BY a, v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm FROM ch),
        |os AS (SELECT k, CAST(count(*) AS BIGINT) AS n_changes,
        |  CAST(sum(CASE WHEN v < pm THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_out_of_order FROM om GROUP BY k)
        |SELECT os.k AS order_id, os.n_changes, gs.n_versions,
        |  gs.version_lo, gs.version_hi, gs.n_gaps, gs.max_gap_len,
        |  os.n_out_of_order
        |FROM os JOIN gs ON os.k = gs.k ORDER BY order_id""".stripMargin,
    "rules_control_coverage" -> ReferenceLibrary.oracleSql,
    "drift_retention" ->
      """WITH st AS (SELECT DISTINCT event_type AS query,
        |    (epoch_us(ts) // 86400000000) * 86400 AS tag FROM events),
        |r AS (SELECT query, tag,
        |    row_number() OVER (PARTITION BY query ORDER BY tag DESC) AS rn,
        |    row_number() OVER (PARTITION BY query, tag // 604800
        |      ORDER BY tag DESC) AS wn
        |  FROM st),
        |m AS (SELECT query, CAST(tag AS BIGINT) AS tag,
        |    CASE WHEN rn <= 5 THEN 'recent'
        |         WHEN wn = 1 THEN 'weekly' ELSE 'drop' END AS reason
        |  FROM r)
        |SELECT query, tag, reason <> 'drop' AS keep, reason
        |FROM m ORDER BY query, tag""".stripMargin,
    "drift_detect" ->
      """WITH older AS (
        |  SELECT CAST(user_id AS VARCHAR) AS user_id, event_type
        |  FROM events WHERE ts < TIMESTAMP '2024-01-16'
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |newer AS (
        |  SELECT CAST(user_id AS VARCHAR) AS user_id, event_type
        |  FROM events WHERE ts >= TIMESTAMP '2024-01-16'
        |  GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT user_id, event_type, 'added' AS direction
        |FROM (SELECT * FROM newer EXCEPT ALL SELECT * FROM older)
        |UNION ALL
        |SELECT user_id, event_type, 'removed' AS direction
        |FROM (SELECT * FROM older EXCEPT ALL SELECT * FROM newer)""".stripMargin,
    "permission_mapping_file" -> {
      val canRead = ActionStatements.filter(s =>
        Seq("part:ReadItem").exists(s.appliesToPermission))
      val canWrite = ActionStatements.filter(s =>
        Seq("part:Write").exists(s.appliesToPermission))
      mappingGrantSql(canRead, "CAN_READ", "Part") + "\nUNION ALL\n" +
        mappingGrantSql(canWrite, "CAN_WRITE", "Part")
    },
    "permission_relationships" ->
      s"""SELECT CAST(pid AS BIGINT) AS principal_id,
         |  CAST(rid AS BIGINT) AS resource_id,
         |  has_condition,
         |  CASE WHEN has_condition THEN cond_keys_all ELSE '' END AS condition_keys
         |FROM ${grantedSubquery(PolicyStatements)}""".stripMargin,
    "permission_relationships_sync" ->
      s"""SELECT CAST(e2.pid AS BIGINT) AS principal_id,
         |  CAST(e2.rid AS BIGINT) AS resource_id,
         |  CAST(CASE WHEN e1.pid IS NOT NULL THEN 100 ELSE 200 END AS BIGINT)
         |    AS firstseen,
         |  CAST(200 AS BIGINT) AS lastupdated
         |FROM ${grantedSubquery(SyncStatementsEpoch2)} e2
         |LEFT JOIN ${grantedSubquery(SyncStatementsEpoch1)} e1
         |  ON e2.pid = e1.pid AND e2.rid = e1.rid""".stripMargin,
  )
}
