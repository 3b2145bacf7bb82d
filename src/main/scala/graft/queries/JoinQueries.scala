package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.graph.{Graph, GraphLoader, GraphStore}
import graft.ontology.Ontology
import graft.schema._

/** Join-mode / matchlink / projection operator battery (SURVEY §2.2-2.4),
  * all driven through the schema DSL + GraphLoader so the gate exercises
  * the real load path.
  */
object JoinQueries {

  private val TAG = 3000L

  /** Case-insensitive link mode (querybuilder.py:710-727): parts link to
    * distinct part-name nodes via upper-cased refs — only a
    * lower()=lower() join matches. Stays hash-joinable. */
  def joinIgnoreCase(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    val nameNodes = p.select(col("p_name").as("id")).distinct()
    val g0 = Graph()
      .withNodes("PartName", GraphStore.initialLoad(nameNodes, Seq(GraphStore.ID), TAG))
    val schema = NodeSchema(
      label = "Part",
      id = Field("p_partkey"),
      otherRels = Seq(RelSchema("NAMED", "PartName", targetKey = "id",
        sourceRef = Derived(upper(col("p_name"))), mode = IgnoreCase)))
    GraphLoader.load(g0, schema, p, TAG)
      .edgeTable("Part", "NAMED", "PartName")
      .select(col("src_id"), col("dst_id"), col("lastupdated"))
  }

  /** Fuzzy containment link mode (querybuilder.py:712-731): keyword nodes
    * link to every part name that CONTAINS them — a theta join executed as
    * BroadcastNestedLoopJoin with the small side broadcast. */
  def joinFuzzyContains(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = Tables.part(spark, dir)
    val nameNodes = p.select(col("p_name").as("id")).distinct()
    val keywords = Seq("widget", "bolt", "rod", "gear").toDF("kw")
    val g0 = Graph().withNodes("PartName",
      GraphStore.initialLoad(nameNodes, Seq(GraphStore.ID), TAG))
    val schema = NodeSchema(
      label = "Keyword",
      id = Field("kw"),
      otherRels = Seq(RelSchema("MENTIONED_IN", "PartName", targetKey = "id",
        sourceRef = Field("kw"), mode = FuzzyContains)))
    GraphLoader.load(g0, schema, keywords, TAG)
      .edgeTable("Keyword", "MENTIONED_IN", "PartName")
      .select(col("src_id"), col("dst_id"))
  }

  /** One-to-many link mode (querybuilder.py:716, 732-736): documents carry
    * a token list; keyword nodes with key IN that list get an edge.
    * Explode → equi join → distinct (IN is membership). */
  def joinOneToMany(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val kwNodes = Seq("join", "scan", "merge", "window", "hash").toDF("id")
    val g0 = Graph().withNodes("Keyword",
      GraphStore.initialLoad(kwNodes, Seq(GraphStore.ID), TAG))
    val schema = NodeSchema(
      label = "Document",
      id = Field("doc_id"),
      otherRels = Seq(RelSchema("MENTIONS", "Keyword", targetKey = "id",
        sourceRef = Derived(split(col("text"), " ")), mode = OneToMany)))
    GraphLoader.load(g0, schema, docs, TAG)
      .edgeTable("Document", "MENTIONS", "Keyword")
      .select(col("src_id"), col("dst_id"))
  }

  /** Salted skew join (graph/Skew): the explicit fix for a join key that
    * exceeds one executor — left side salted by a deterministic row
    * hash, build side exploded across the salt range. The oracle is the
    * PLAIN join: salting must be invisible in the results, which is
    * exactly what this gate proves. */
  def joinSaltedSkew(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("okey"), col("l_quantity"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
    graft.graph.Skew.saltedJoin(li, ord, "okey", salt = 8)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("long")).cast("long").as("sum_qty"))
  }

  /** MatchLink (querybuilder.py:1755-1924): SUPPLIES edges between
    * already-loaded order and supplier nodes from aggregated lineitem
    * pairs; order nodes restricted to open orders so the endpoint
    * existence check actually filters. */
  def matchlinkSupplies(spark: SparkSession, dir: String): DataFrame = {
    val orderNodes = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "O")
      .select(col("o_orderkey").as("id"))
    val suppNodes = Tables.supplier(spark, dir).select(col("s_suppkey").as("id"))
    val pairs = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey").as("oref"), col("l_suppkey").as("sref"))
      .agg(sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("total_qty"))
    val g0 = Graph()
      .withNodes("Order", GraphStore.initialLoad(orderNodes, Seq(GraphStore.ID), TAG))
      .withNodes("Supplier", GraphStore.initialLoad(suppNodes, Seq(GraphStore.ID), TAG))
    GraphLoader.matchLinks(g0, pairs, "Order", "SUPPLIES", "Supplier", "oref", "sref", TAG)
      .edgeTable("Order", "SUPPLIES", "Supplier")
      .select(col("src_id"), col("dst_id"), col("total_qty"), col("lastupdated"))
  }

  /** Scoped matchlink cleanup (querybuilder.py:1755-1924 sub-resource
    * stamping + cleanupbuilder.py:603-667 scoped delete): epoch 1 links
    * every customer to its nation stamped with the nation as owning
    * sub-resource; epoch 2 re-links only nations < 12 (and only
    * non-negative balances). Cleanup scoped to nations < 12 deletes that
    * scope's stale links while other nations' stale links survive. */
  def matchlinkScopedCleanup(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val custNodes = c.select(col("c_custkey").as("id"))
    val natNodes = Tables.nation(spark, dir).select(col("n_nationkey").as("id"))
    def pairsOf(df: DataFrame) =
      df.select(col("c_custkey").as("cref"), col("c_nationkey").as("nref"))
    var g = Graph()
      .withNodes("Customer", GraphStore.initialLoad(custNodes, Seq(GraphStore.ID), TAG))
      .withNodes("Nation", GraphStore.initialLoad(natNodes, Seq(GraphStore.ID), TAG))
    g = GraphLoader.matchLinks(g, pairsOf(c), "Customer", "LOCATED_IN", "Nation",
      "cref", "nref", TAG, subResource = Some(("Nation", col("nref"))))
    g = GraphLoader.matchLinks(g,
      pairsOf(c.filter(col("c_nationkey") < 12 && col("c_acctbal") >= 0)),
      "Customer", "LOCATED_IN", "Nation", "cref", "nref", TAG + 1,
      subResource = Some(("Nation", col("nref"))))
    val edges = g.edgeTable("Customer", "LOCATED_IN", "Nation")
    GraphStore.cleanup(edges, TAG + 1,
        scope = col(GraphLoader.SubResourceLabelCol) === "Nation" &&
          col(GraphLoader.SubResourceIdCol) < 12)
      .select(col("src_id").cast("long").as("src_id"),
        col("dst_id").cast("long").as("dst_id"), col("lastupdated"),
        col(GraphLoader.SubResourceIdCol).cast("long").as("sub_resource_id"))
  }

  /** Cartesian matchlink (tx.py:923-1030): all nation × region pairs. */
  def crosslinkPairs(spark: SparkSession, dir: String): DataFrame = {
    val nationNodes = Tables.nation(spark, dir).select(col("n_nationkey").as("id"))
    val regionNodes = Tables.region(spark, dir).select(col("r_regionkey").as("id"))
    val g0 = Graph()
      .withNodes("Nation", GraphStore.initialLoad(nationNodes, Seq(GraphStore.ID), TAG))
      .withNodes("Region", GraphStore.initialLoad(regionNodes, Seq(GraphStore.ID), TAG))
    GraphLoader.crossLinks(g0, "Nation", "PEER_OF", "Region", TAG)
      .edgeTable("Nation", "PEER_OF", "Region")
      .select(col("src_id").cast("long").as("src_id"),
        col("dst_id").cast("long").as("dst_id"), col("lastupdated"))
  }

  /** Conditional extra labels (nodes.py:73-147, querybuilder.py:486-575):
    * customers get HighValue / EUCustomer labels from row predicates; the
    * labels array is built in the same projection as the upsert. */
  def conditionalLabels(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val schema = NodeSchema(
      label = "Customer",
      id = Field("c_custkey"),
      properties = Map("acctbal" -> Field("c_acctbal")),
      extraLabels = Seq(
        ExtraLabel.when("HighValue", col("c_acctbal") > 5000.0),
        ExtraLabel.when("EUCustomer", col("c_nationkey") < 5)))
    GraphLoader.load(Graph(), schema, c, TAG)
      .nodeTable("Customer")
      .select(col("id"), array_join(col("labels"), ",").as("label_str"))
  }

  /** Ontology projection (querybuilder.py:24-415): provider fields →
    * canonical `_ont_*` fields via value mapping, coalesce-first-non-null,
    * and boolean coercion strategies. */
  def ontologyProject(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.select(
      col("o_orderkey").as("id"),
      Ontology.valueMapping(col("o_orderpriority"),
        Map("1-URGENT" -> "urgent", "2-HIGH" -> "high", "3-MEDIUM" -> "medium"),
        default = Some("low")).as("_ont_priority"),
      Ontology.coalesceFirst(
        when(col("o_orderstatus") =!= "P", col("o_orderstatus")),
        lit("pending")).as("_ont_status"),
      Ontology.equalBool(col("o_orderpriority"), Seq("1-URGENT")).as("_ont_urgent"),
      Ontology.orBool(
        col("o_orderstatus") === "F",
        col("o_totalprice") > 100000.0).as("_ont_closed_or_large"))
  }

  /** As-of join: each purchase event picks up the user's most recent
    * click at or before it (union-merge + one window pass — no range
    * cross-product; see [[graft.operators.Temporal.asofJoin]]). */
  def joinAsof(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("click_id"), col("ts").as("click_ts"))
    graft.operators.Temporal.asofJoin(purchases, clicks, Seq("user_id"),
      leftTime = "ts", rightTime = "ts", payload = Seq("click_id", "click_ts"))
  }

  /** As-of join with a 1-hour staleness bound: purchases take the latest
    * same-user click ONLY if it is at most an hour old — stale matches
    * blank and `match_age` reports the fresh ones
    * ([[graft.operators.Temporal.asofJoinWithin]]). */
  def joinAsofTolerance(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("tus"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("cus"),
        col("event_id").as("click_id"))
    graft.operators.Temporal.asofJoinWithin(purchases, clicks, Seq("user_id"),
      leftTime = "tus", rightTime = "cus", payload = Seq("click_id"),
      tolerance = 3600000000L)
  }

  /** Nearest-direction temporal join: each purchase aligned to its
    * CLOSEST same-user click in either direction, within 2 hours —
    * the measurement-alignment shape [[graft.operators.Temporal
    * .nearestJoin]] adds over the backward-only as-of. */
  def joinAsofNearest(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("tus"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("cus"),
        col("event_id").as("click_id"))
    graft.operators.Temporal.nearestJoin(purchases, clicks, Seq("user_id"),
      leftTime = "tus", rightTime = "cus", payload = Seq("click_id"),
      tolerance = 7200000000L)
  }

  /** Bucketed range join: 45-minute attribution windows (anchored at every
    * 200th event) counting the events they contain — bucket equi-join +
    * residual filter, never |L|×|R|. */
  def joinRangeBucketed(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), floor(unix_timestamp(col("ts"))).cast("long").as("es"))
    val windows = ev.filter(col("event_id") % 200 === 0)
      .select(col("event_id").as("window_id"), col("es").as("ws"),
        (col("es") + 2700L).as("we"))
    graft.operators.Temporal.rangeJoinBucketed(ev, "es", windows, "ws", "we",
        bucketSeconds = 1800L)
      .groupBy(col("window_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event_id"),
        max(col("event_id")).as("last_event_id"))
  }

  /** Bloom-prefiltered join: orders Bloom-pruned by high-balance
    * customers' keys before the exact join — the shuffle ships only the
    * possibly-matching fraction of the fact table
    * ([[graft.operators.BloomJoin]]); result identical to the plain
    * join, which is exactly what the oracle checks. */
  def joinBloomPrefilter(spark: SparkSession, dir: String): DataFrame = {
    val vip = Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 9000.0)
      .select(col("c_custkey"), col("c_name"))
    graft.operators.BloomJoin.prefilteredJoin(
        Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_custkey")),
        "o_custkey", vip, "c_custkey", expectedItems = 100000L)
      .select(col("o_orderkey").cast("long").as("o_orderkey"),
        col("o_custkey").cast("long").as("o_custkey"), col("c_name"))
  }

  /** SCD2 history: each user's event-type stream collapsed into validity
    * intervals ([[graft.operators.Temporal.scd2]]) — the asset-history
    * view of an incremental sync. */
  def scd2History(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Temporal.scd2(
      Tables.events(spark, dir).select(col("user_id"), col("ts"), col("event_type")),
      keys = Seq("user_id"), timeCol = "ts", stateCols = Seq("event_type"))

  /** Point-in-time dimension read over the SCD2 history: three probe
    * instants per user answered from the interval table — the
    * time-travel lookup that pairs with [[scd2History]]. */
  def scd2AsofRead(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"), col("ts"), col("event_type"))
    val hist = graft.operators.Temporal.scd2(ev,
      keys = Seq("user_id"), timeCol = "ts", stateCols = Seq("event_type"))
    val probes = ev.select(col("user_id")).distinct()
      .select(col("user_id"), explode(array(
        lit("2024-01-08 00:00:00").cast("timestamp"),
        lit("2024-01-16 12:00:00").cast("timestamp"),
        lit("2024-01-24 06:30:00").cast("timestamp"))).as("probe_ts"))
    graft.operators.Temporal.asofRead(hist, probes, Seq("user_id"), "probe_ts")
      .select(col("user_id"), col("probe_ts"), col("event_type"),
        col("valid_from"), col("valid_to"))
  }

  /** Z-order layout values: Morton interleave of (p_size, p_partkey mod
    * 2^16) plus the coarse file range each row lands in when clustered by
    * it ([[graft.graph.Layout.zValue]]) — the multi-dimensional
    * data-skipping sort key, checked bit-for-bit against the oracle's own
    * interleave arithmetic. */
  def layoutZorder(spark: SparkSession, dir: String): DataFrame = {
    val z = graft.graph.Layout.zValue(
      col("p_size").cast("long"), (col("p_partkey") % 65536L).cast("long"))
    Tables.part(spark, dir).select(
      col("p_partkey").cast("long").as("p_partkey"),
      z.as("zvalue"),
      shiftright(z, 24).cast("long").as("file_id"))
  }

  /** Bounded edit-distance join: canonical part names vs a typo'd twin
    * set (last char dropped — the corrupted-twin pattern the phash gate
    * uses), blocked on the first token so the levenshtein DP only runs
    * inside blocks. */
  def joinEditDistance(spark: SparkSession, dir: String): DataFrame = {
    val names = Tables.part(spark, dir).groupBy(col("p_name"))
      .agg(min(col("p_partkey")).as("id"))
    val canon = names.select(col("id"), col("p_name").as("name"))
    val dirty = names.select((col("id") + 100000L).as("id"),
      expr("substring(p_name, 1, length(p_name) - 1)").as("name"))
    graft.operators.StringJoin.editDistanceJoin(canon, dirty, "id", "name", k = 2)
  }

  /** Per-customer order "activity windows" — [orderdate, orderdate +
    * (orderkey % 30 + 1) days] — merged into maximal overlapping-or-
    * touching islands: the interval-union / gaps-and-islands read over
    * validity ranges. The deterministic duration mix (1..30 days
    * against a multi-year date span) produces real multi-interval
    * islands AND real gaps at every SF. */
  def intervalsCoalesce(spark: SparkSession, dir: String): DataFrame = {
    val iv = Tables.orders(spark, dir).select(
      col("o_custkey").cast("long").as("custkey"),
      col("o_orderkey").cast("long").as("okey"),
      col("o_orderdate").as("s"),
      expr("timestampadd(DAY, CAST(o_orderkey % 30 + 1 AS INT), o_orderdate)").as("e"))
    graft.operators.Temporal.coalesceIntervals(
        iv, Seq("custkey"), "s", "e", tieCols = Seq("okey"))
      .select(col("custkey"), col("island_start"), col("island_end"),
        col("n_intervals"))
  }

  /** Per-nation overlap join between even-customer and odd-customer
    * order activity windows (half-open, 1..20 days): the
    * conflict-detection shape. Bucketed at 30 days; each overlapping
    * pair is claimed once in the bucket of max(start, start) — no
    * output dedup shuffle. */
  def joinIntervalOverlap(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").cast("long").as("nk"),
        col("o_custkey").cast("long").as("ck"),
        col("o_orderkey").cast("long").as("okey"),
        unix_timestamp(col("o_orderdate")).as("s"))
      .withColumn("e", col("s") + (col("okey") % 20 + 1) * 86400L)
    val l = base.filter(col("ck") % 2 === 0)
      .select(col("nk"), col("okey").as("l_okey"), col("s").as("l_s"), col("e").as("l_e"))
    val r = base.filter(col("ck") % 2 === 1)
      .select(col("nk"), col("okey").as("r_okey"), col("s").as("r_s"), col("e").as("r_e"))
    graft.operators.Temporal.intervalOverlapJoin(
        l, "l_s", "l_e", r, "r_s", "r_e",
        bucketSeconds = 30L * 86400L, keys = Seq("nk"))
      .select(col("nk"), col("l_okey"), col("r_okey"),
        (least(col("l_e"), col("r_e")) - greatest(col("l_s"), col("r_s")))
          .as("overlap_secs"))
  }

  /** Skew advisor over the geometrically-skewed lowbit key (value 2^t
    * carries n/2^(t+1) of the mass): the 8 heaviest keys with exact ppm
    * share and the salt factor that spreads each across 32 tasks —
    * the measurement that decides when saltedJoin earns its cost. */
  def joinSkewAdvisor(spark: SparkSession, dir: String): DataFrame =
    graft.graph.Skew.skewReport(
      Tables.events(spark, dir)
        .select(col("event_id").bitwiseAND(expr("-event_id")).as("lowbit")),
      col("lowbit"), parallelism = 32, topK = 8)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_skew_advisor" -> (joinSkewAdvisor _),
    "join_interval_overlap" -> (joinIntervalOverlap _),
    "intervals_coalesce" -> (intervalsCoalesce _),
    "join_edit_distance" -> (joinEditDistance _),
    "join_bloom_prefilter" -> (joinBloomPrefilter _),
    "scd2_history" -> (scd2History _),
    "scd2_asof_read" -> (scd2AsofRead _),
    "layout_zorder" -> (layoutZorder _),
    "join_ignorecase" -> (joinIgnoreCase _),
    "join_fuzzy_contains" -> (joinFuzzyContains _),
    "join_one_to_many" -> (joinOneToMany _),
    "join_salted_skew" -> (joinSaltedSkew _),
    "join_asof" -> (joinAsof _),
    "join_asof_nearest" -> (joinAsofNearest _),
    "join_asof_tolerance" -> (joinAsofTolerance _),
    "join_range_bucketed" -> (joinRangeBucketed _),
    "matchlink_supplies" -> (matchlinkSupplies _),
    "crosslink_pairs" -> (crosslinkPairs _),
    "matchlink_scoped_cleanup" -> (matchlinkScopedCleanup _),
    "conditional_labels" -> (conditionalLabels _),
    "ontology_project" -> (ontologyProject _),
  )

  val oracles: Map[String, String] = Map(
    "join_skew_advisor" ->
      """WITH t AS (
        |  SELECT CAST(event_id & (-event_id) AS VARCHAR) AS key FROM events),
        |c AS (SELECT key, count(*) AS cnt FROM t GROUP BY key),
        |tot AS (SELECT sum(cnt) AS total FROM c)
        |SELECT key, cnt, CAST(cnt * 1000000 // total AS BIGINT) AS share_ppm,
        |  CAST(greatest(1, (cnt * 32 + total - 1) // total) AS BIGINT) AS salt
        |FROM c CROSS JOIN tot
        |ORDER BY cnt DESC, key LIMIT 8""".stripMargin,
    "join_interval_overlap" ->
      """WITH base AS (
        |  SELECT c_nationkey AS nk, o_custkey AS ck, o_orderkey AS okey,
        |    CAST(epoch(o_orderdate) AS BIGINT) AS s,
        |    CAST(epoch(o_orderdate) AS BIGINT)
        |      + (o_orderkey % 20 + 1) * 86400 AS e
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |l AS (SELECT nk, okey AS l_okey, s AS l_s, e AS l_e
        |      FROM base WHERE ck % 2 = 0),
        |r AS (SELECT nk, okey AS r_okey, s AS r_s, e AS r_e
        |      FROM base WHERE ck % 2 = 1)
        |SELECT CAST(l.nk AS BIGINT) AS nk, CAST(l_okey AS BIGINT) AS l_okey,
        |  CAST(r_okey AS BIGINT) AS r_okey,
        |  CAST(least(l_e, r_e) - greatest(l_s, r_s) AS BIGINT) AS overlap_secs
        |FROM l JOIN r ON l.nk = r.nk AND l_s < r_e AND r_s < l_e""".stripMargin,
    "intervals_coalesce" ->
      """WITH iv AS (
        |  SELECT CAST(o_custkey AS BIGINT) AS custkey,
        |    o_orderkey AS okey, o_orderdate AS s,
        |    o_orderdate + ((o_orderkey % 30 + 1) * INTERVAL 1 DAY) AS e
        |  FROM orders),
        |m AS (
        |  SELECT custkey, okey, s, e,
        |    CASE WHEN max(e) OVER w IS NULL OR s > max(e) OVER w
        |         THEN 1 ELSE 0 END AS ni
        |  FROM iv
        |  WINDOW w AS (PARTITION BY custkey ORDER BY s, e, okey
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |isl AS (
        |  SELECT custkey, s, e,
        |    SUM(ni) OVER (PARTITION BY custkey ORDER BY s, e, okey
        |                  ROWS UNBOUNDED PRECEDING) AS g
        |  FROM m)
        |SELECT custkey, min(s) AS island_start, max(e) AS island_end,
        |  CAST(count(*) AS BIGINT) AS n_intervals
        |FROM isl GROUP BY custkey, g""".stripMargin,
    "join_edit_distance" ->
      """WITH n AS (
        |  SELECT p_name, CAST(min(p_partkey) AS BIGINT) AS id
        |  FROM part GROUP BY p_name),
        |a AS (SELECT id AS id_a, p_name AS name_a,
        |        string_split(p_name, ' ')[1] AS blk FROM n),
        |b AS (SELECT id + 100000 AS id_b,
        |        substr(p_name, 1, length(p_name) - 1) AS name_b,
        |        string_split(substr(p_name, 1, length(p_name) - 1), ' ')[1] AS blk
        |      FROM n)
        |SELECT id_a, name_a, id_b, name_b,
        |  CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
        |FROM a JOIN b USING (blk)
        |WHERE abs(length(name_a) - length(name_b)) <= 2
        |  AND levenshtein(name_a, name_b) <= 2""".stripMargin,
    "join_bloom_prefilter" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
        |  CAST(o_custkey AS BIGINT) AS o_custkey, c_name
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_acctbal > 9000.0""".stripMargin,
    "scd2_asof_read" ->
      """WITH o AS (
        |  SELECT user_id, event_type, ts,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_type) AS prev
        |  FROM events),
        |chg AS (
        |  SELECT user_id, event_type, ts FROM o
        |  WHERE prev IS NULL OR prev <> event_type),
        |hist AS (
        |  SELECT user_id, event_type, ts AS valid_from,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_type)
        |      AS valid_to
        |  FROM chg),
        |probes AS (
        |  SELECT user_id, unnest([
        |    TIMESTAMP '2024-01-08 00:00:00',
        |    TIMESTAMP '2024-01-16 12:00:00',
        |    TIMESTAMP '2024-01-24 06:30:00']) AS probe_ts
        |  FROM (SELECT DISTINCT user_id FROM events))
        |SELECT p.user_id, p.probe_ts, h.event_type, h.valid_from, h.valid_to
        |FROM probes p JOIN hist h ON p.user_id = h.user_id
        |WHERE h.valid_from <= p.probe_ts
        |  AND (h.valid_to IS NULL OR p.probe_ts < h.valid_to)""".stripMargin,
    "scd2_history" ->
      """WITH o AS (
        |  SELECT user_id, event_type, ts,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_type) AS prev
        |  FROM events),
        |chg AS (
        |  SELECT user_id, event_type, ts FROM o
        |  WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id, event_type, ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_type) AS valid_to,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_type) IS NULL
        |    AS is_current
        |FROM chg""".stripMargin,
    "layout_zorder" ->
      """WITH t AS (
        |  SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
        |    CAST(p_size AS BIGINT) & 65535 AS x,
        |    (CAST(p_partkey AS BIGINT) % 65536) & 65535 AS y
        |  FROM part),
        |s1 AS (SELECT p_partkey, (x | (x << 8)) & 16711935 AS xa,
        |              (y | (y << 8)) & 16711935 AS ya FROM t),
        |s2 AS (SELECT p_partkey, (xa | (xa << 4)) & 252645135 AS xb,
        |              (ya | (ya << 4)) & 252645135 AS yb FROM s1),
        |s3 AS (SELECT p_partkey, (xb | (xb << 2)) & 858993459 AS xc,
        |              (yb | (yb << 2)) & 858993459 AS yc FROM s2),
        |s4 AS (SELECT p_partkey, (xc | (xc << 1)) & 1431655765 AS xd,
        |              (yc | (yc << 1)) & 1431655765 AS yd FROM s3)
        |SELECT p_partkey,
        |  CAST(xd | (yd << 1) AS BIGINT) AS zvalue,
        |  CAST((xd | (yd << 1)) >> 24 AS BIGINT) AS file_id
        |FROM s4""".stripMargin,
    "join_asof_tolerance" ->
      """WITH l AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS tus
        |  FROM events WHERE event_type = 'purchase'),
        |r AS (
        |  SELECT user_id, epoch_us(ts) AS cus, event_id AS click_id
        |  FROM events WHERE event_type = 'click'),
        |cand AS (
        |  SELECT l.event_id, r.click_id, r.cus,
        |    row_number() OVER (PARTITION BY l.event_id
        |      ORDER BY r.cus DESC, r.click_id DESC) AS rk
        |  FROM l JOIN r ON l.user_id = r.user_id AND r.cus <= l.tus)
        |SELECT l.event_id, l.user_id, l.tus,
        |  CASE WHEN c.cus >= l.tus - 3600000000 THEN c.click_id END AS click_id,
        |  CASE WHEN c.cus >= l.tus - 3600000000 THEN l.tus - c.cus END AS match_age
        |FROM l LEFT JOIN (SELECT event_id, click_id, cus FROM cand WHERE rk = 1) c
        |  USING (event_id)""".stripMargin,
    "join_asof_nearest" ->
      """WITH l AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS tus
        |  FROM events WHERE event_type = 'purchase'),
        |r AS (
        |  SELECT user_id, epoch_us(ts) AS cus, event_id AS click_id
        |  FROM events WHERE event_type = 'click'),
        |cand AS (
        |  SELECT l.event_id, r.click_id, abs(l.tus - r.cus) AS dist,
        |    row_number() OVER (PARTITION BY l.event_id
        |      ORDER BY abs(l.tus - r.cus) ASC,
        |               CASE WHEN r.cus <= l.tus THEN 0 ELSE 1 END ASC,
        |               r.click_id DESC) AS rk
        |  FROM l JOIN r ON l.user_id = r.user_id
        |    AND abs(l.tus - r.cus) <= 7200000000)
        |SELECT l.event_id, l.user_id, l.tus, c.click_id, c.dist AS match_dist
        |FROM l LEFT JOIN (SELECT event_id, click_id, dist FROM cand WHERE rk = 1) c
        |  USING (event_id)""".stripMargin,
    "join_asof" ->
      """WITH l AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |r AS (
        |  SELECT user_id, event_id AS click_id, ts AS click_ts
        |  FROM events WHERE event_type = 'click'),
        |cand AS (
        |  SELECT l.event_id, r.click_id, r.click_ts,
        |    row_number() OVER (PARTITION BY l.event_id
        |      ORDER BY r.click_ts DESC, r.click_id DESC) AS rk
        |  FROM l JOIN r ON l.user_id = r.user_id AND r.click_ts <= l.ts)
        |SELECT l.event_id, l.user_id, l.ts, c.click_id, c.click_ts
        |FROM l LEFT JOIN (SELECT event_id, click_id, click_ts FROM cand WHERE rk = 1) c
        |  USING (event_id)""".stripMargin,
    "join_range_bucketed" ->
      """WITH ev AS (
        |  SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events),
        |win AS (
        |  SELECT event_id AS window_id, es AS ws, es + 2700 AS we
        |  FROM ev WHERE event_id % 200 = 0)
        |SELECT w.window_id, count(*) AS n_events,
        |  min(e.event_id) AS first_event_id,
        |  max(e.event_id) AS last_event_id
        |FROM win w JOIN ev e ON e.es >= w.ws AND e.es < w.we
        |GROUP BY w.window_id""".stripMargin,
    "join_salted_skew" ->
      """SELECT o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    "join_ignorecase" ->
      """SELECT CAST(a.p_partkey AS BIGINT) AS src_id, b.p_name AS dst_id,
        |  CAST(3000 AS BIGINT) AS lastupdated
        |FROM part a JOIN (SELECT DISTINCT p_name FROM part) b
        |  ON lower(upper(a.p_name)) = lower(b.p_name)""".stripMargin,
    "join_fuzzy_contains" ->
      """SELECT kw AS src_id, p_name AS dst_id
        |FROM (VALUES ('widget'), ('bolt'), ('rod'), ('gear')) t(kw)
        |JOIN (SELECT DISTINCT p_name FROM part) p
        |  ON lower(p.p_name) LIKE '%' || lower(kw) || '%'""".stripMargin,
    "join_one_to_many" ->
      """SELECT DISTINCT CAST(doc_id AS BIGINT) AS src_id, kw AS dst_id
        |FROM documents
        |JOIN (VALUES ('join'), ('scan'), ('merge'), ('window'), ('hash')) t(kw)
        |  ON list_contains(string_split(text, ' '), kw)""".stripMargin,
    "matchlink_supplies" ->
      """SELECT CAST(l_orderkey AS BIGINT) AS src_id,
        |  CAST(l_suppkey AS BIGINT) AS dst_id,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty,
        |  CAST(3000 AS BIGINT) AS lastupdated
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey AND o_orderstatus = 'O'
        |JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY l_orderkey, l_suppkey""".stripMargin,
    "matchlink_scoped_cleanup" ->
      """SELECT CAST(c_custkey AS BIGINT) AS src_id,
        |  CAST(c_nationkey AS BIGINT) AS dst_id,
        |  CAST(CASE WHEN c_nationkey < 12 THEN 3001 ELSE 3000 END AS BIGINT) AS lastupdated,
        |  CAST(c_nationkey AS BIGINT) AS sub_resource_id
        |FROM customer
        |WHERE c_nationkey >= 12 OR c_acctbal >= 0""".stripMargin,
    "crosslink_pairs" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS src_id,
        |  CAST(r_regionkey AS BIGINT) AS dst_id,
        |  CAST(3000 AS BIGINT) AS lastupdated
        |FROM nation CROSS JOIN region""".stripMargin,
    "conditional_labels" ->
      """SELECT CAST(c_custkey AS BIGINT) AS id,
        |  concat('Customer',
        |    CASE WHEN c_nationkey < 5 THEN ',EUCustomer' ELSE '' END,
        |    CASE WHEN c_acctbal > 5000.0 THEN ',HighValue' ELSE '' END) AS label_str
        |FROM customer""".stripMargin,
    "ontology_project" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS id,
        |  CASE o_orderpriority WHEN '1-URGENT' THEN 'urgent'
        |    WHEN '2-HIGH' THEN 'high' WHEN '3-MEDIUM' THEN 'medium'
        |    ELSE 'low' END AS _ont_priority,
        |  CASE WHEN o_orderstatus <> 'P' THEN o_orderstatus ELSE 'pending' END AS _ont_status,
        |  (o_orderpriority = '1-URGENT') AS _ont_urgent,
        |  (o_orderstatus = 'F' OR o_totalprice > 100000.0) AS _ont_closed_or_large
        |FROM orders""".stripMargin,
  )
}
