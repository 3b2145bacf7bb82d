package graft.intel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.StringFunctions
import graft.graph.{Graph, GraphLoader, GraphStore}
import graft.schema._

/** DNS-zone intel module — the derive-then-matchlink exemplar
  * (reference: cartography/intel/aws/route53.py — record-id synthesis
  * :44-45, DNS normalization :48-84, NS/zone/nameserver loads :430-467,
  * sub-zone matchlink :470-505, scoped cleanup :508-530).
  *
  * The reference discovers the zone hierarchy AFTER loading, because the
  * hierarchy isn't known ahead of time: a zone B is a sub-zone of A iff A
  * holds an NS record whose (normalized) name equals B's name, that record
  * points at a nameserver, and that nameserver serves B — with the
  * sanity filter `B.name ENDS WITH '.' + A.name`. Here the whole chain is
  * equi-joins over the loaded node/edge tables (record→zone membership,
  * record→nameserver, zone→nameserver) with the ENDS WITH check as a
  * post-join filter — no theta join anywhere, so the plan shuffles on ids
  * only and survives zone counts that would break a suffix cross-join.
  *
  * The synthetic feed derives a two-level hierarchy from the region/nation
  * tables: one zone per region (`<region>.corp`), one per nation
  * (`<nation>.<region>.corp`), an NS delegation record in each region
  * zone per member nation, and a deterministic "stray" NS record per
  * nation zone naming the next nation's zone — an equi-match that MUST be
  * rejected by the ENDS WITH filter (wrong branch of the tree), so the
  * filter is load-bearing in the gate, not decorative.
  */
object DnsZones extends IntelModule {
  val name = "dns-zones"
  val account = "A1"

  override val labels: Seq[String] = Seq("DNSZone", "NameServer", "DNSRecord")

  val SubzoneKey: (String, String, String) = ("DNSZone", "SUBZONE", "DNSZone")

  /** Get: one row per nation with its region and the "next" nation (the
    * stray-delegation target) — the flattened describe-zones feed. */
  def extract(spark: SparkSession, source: String): DataFrame = {
    val region = spark.read.parquet(s"$source/region.parquet")
      .select(col("r_regionkey"), col("r_name"))
    val nation = spark.read.parquet(s"$source/nation.parquet")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val base = nation.join(region, col("n_regionkey") === col("r_regionkey"))
    val next = base.select(
      col("n_nationkey").as("t_nationkey"), col("n_name").as("t_name"),
      col("r_name").as("t_rname"))
    // left join: a nation whose "next" neighbor is absent from the feed
    // still syncs — it just emits no stray delegation
    base.join(next, (col("n_nationkey") + 1) % 25 === col("t_nationkey"), "left")
      .withColumn("account", lit(account))
  }

  private def dnsLabel(c: org.apache.spark.sql.Column) =
    lower(regexp_replace(c, " ", "-"))

  def transform(raw: DataFrame): Seq[(NodeSchema, DataFrame)] = {
    val regionZoneName = concat(dnsLabel(col("r_name")), lit(".corp"))
    val nationZoneName =
      concat(dnsLabel(col("n_name")), lit("."), regionZoneName)
    val targetZoneName = concat(dnsLabel(col("t_name")), lit("."),
      dnsLabel(col("t_rname")), lit(".corp"))

    val accounts = raw.select(col("account")).distinct()

    val regionZones = raw.select(
      concat(lit("zone-r"), col("r_regionkey")).as("zone_id"),
      regionZoneName.as("zone_name"), col("account")).distinct()
    val nationZones = raw.select(
      concat(lit("zone-n"), col("n_nationkey")).as("zone_id"),
      nationZoneName.as("zone_name"), col("account"))
    val zones = regionZones.unionByName(nationZones)

    val nameServers = raw.select(
      concat(lit("ns-"), col("n_nationkey")).as("ns_id"),
      concat(lit("ns"), col("n_nationkey"), lit(".dns.corp")).as("ns_name"),
      concat(lit("zone-n"), col("n_nationkey")).as("zone_ref"),
      col("account"))

    // Raw record names arrive denormalized (uppercase, trailing root dot —
    // what Route53-style APIs return); normalizeDns is the load-bearing
    // derive that makes the later name equi-join match (route53.py:48-64).
    def record(zoneRef: org.apache.spark.sql.Column,
               rawName: org.apache.spark.sql.Column,
               nsRef: org.apache.spark.sql.Column)(df: DataFrame) = {
      val normalized = StringFunctions.normalizeDns(rawName)
      df.select(
        StringFunctions.compositeId(zoneRef, normalized, lit("NS")).as("record_id"),
        normalized.as("record_name"), lit("NS").as("record_type"),
        zoneRef.as("zone_ref"), nsRef.as("ns_ref"), col("account"))
    }
    val delegations = record(
      concat(lit("zone-r"), col("r_regionkey")),
      concat(upper(nationZoneName), lit(".")),
      concat(lit("ns-"), col("n_nationkey")))(raw)
    val strays = record(
      concat(lit("zone-n"), col("n_nationkey")),
      concat(upper(targetZoneName), lit(".")),
      concat(lit("ns-"), col("t_nationkey")))(
      raw.filter(col("t_nationkey").isNotNull))
    val records = delegations.unionByName(strays)

    val sub = Some(SubResourceRel("Account", "id", Field("account")))
    Seq(
      NodeSchema(label = "Account", id = Field("account")) -> accounts,
      NodeSchema(label = "DNSZone", id = Field("zone_id"),
        properties = Map("name" -> Field("zone_name")),
        subResource = sub) -> zones,
      NodeSchema(label = "NameServer", id = Field("ns_id"),
        properties = Map("name" -> Field("ns_name")),
        subResource = sub,
        otherRels = Seq(RelSchema("NAMESERVER", "DNSZone", targetKey = "id",
          sourceRef = Field("zone_ref"), direction = Inward))) -> nameServers,
      NodeSchema(label = "DNSRecord", id = Field("record_id"),
        properties = Map("name" -> Field("record_name"),
          "type" -> Field("record_type")),
        subResource = sub,
        otherRels = Seq(
          RelSchema("MEMBER_OF_DNS_ZONE", "DNSZone", targetKey = "id",
            sourceRef = Field("zone_ref")),
          RelSchema("DNS_POINTS_TO", "NameServer", targetKey = "id",
            sourceRef = Field("ns_ref")))) -> records)
  }

  /** The sub-zone derivation (route53.py:470-505): NS record in zone z,
    * naming zone z2, pointing at a nameserver that serves z2, with
    * z2.name a strict child of z.name. Four equi-joins on ids + one
    * equi-filter on the normalized name + the suffix filter; the suffix
    * check never drives a join. Result pairs feed [[GraphLoader.matchLinks]]
    * stamped with the owning account for scoped cleanup. */
  def linkSubZones(g: Graph, tag: Long): Graph = {
    val records = g.nodeTable("DNSRecord")
      .filter(col("type") === "NS")
      .select(col(GraphStore.ID).as("rec_id"), col("name").as("rec_name"))
    val member = g.edgeTable("DNSRecord", "MEMBER_OF_DNS_ZONE", "DNSZone")
      .select(col(GraphStore.SRC).as("rec_id"), col(GraphStore.DST).as("zone_id"))
    val points = g.edgeTable("DNSRecord", "DNS_POINTS_TO", "NameServer")
      .select(col(GraphStore.SRC).as("rec_id"), col(GraphStore.DST).as("ns_id"))
    val serves = g.edgeTable("DNSZone", "NAMESERVER", "NameServer")
      .select(col(GraphStore.SRC).as("subzone_id"), col(GraphStore.DST).as("ns_id"))
    val zones = g.nodeTable("DNSZone")
      .select(col(GraphStore.ID), col("name"))

    val pairs = records
      .join(member, Seq("rec_id"))
      .join(points, Seq("rec_id"))
      .join(serves, Seq("ns_id"))
      .join(zones.select(col(GraphStore.ID).as("zone_id"),
        col("name").as("zone_name")), Seq("zone_id"))
      .join(zones.select(col(GraphStore.ID).as("subzone_id"),
        col("name").as("subzone_name")), Seq("subzone_id"))
      .filter(col("rec_name") === col("subzone_name") &&
        col("subzone_name").endsWith(concat(lit("."), col("zone_name"))) &&
        col("zone_id") =!= col("subzone_id"))
      .select(col("zone_id"), col("subzone_id"))

    GraphLoader.matchLinks(g, pairs, "DNSZone", "SUBZONE", "DNSZone",
      "zone_id", "subzone_id", tag,
      subResource = Some(("Account", lit(account))))
  }

  /** Full sync: load → node/edge cleanup → derive sub-zones → matchlink
    * cleanup scoped to this account (route53.py:508-530 +
    * cleanupbuilder.py:603-667). The reference links BEFORE cleanup and
    * relies on Cypher DETACH DELETE to drop links re-derived through
    * stale records when the stale zone node dies; without that implicit
    * detach, cleaning first and deriving over the surviving graph reaches
    * the same end state with one pass. */
  override def sync(graph: Graph, spark: SparkSession, source: String,
                    tag: Long): Graph = {
    val batches = transform(extract(spark, source))
    val loaded = batches.foldLeft(graph) {
      case (g, (schema, batch)) => GraphLoader.load(g, schema, batch, tag)
    }
    val scope = col(GraphLoader.SubResourceIdCol).cast("string") === account
    val cleaned = cleanup(loaded, tag, labels.map(_ -> scope).toMap)
    val linked = linkSubZones(cleaned, tag)
    linked.withEdges(SubzoneKey, GraphStore.cleanup(
      linked.edgeTable("DNSZone", "SUBZONE", "DNSZone"), tag,
      scope = col(GraphLoader.SubResourceLabelCol) === "Account" &&
        col(GraphLoader.SubResourceIdCol) === account))
  }
}
