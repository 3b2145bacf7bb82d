package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.graph.{Graph, GraphStore}

/** Core graph-ETL operator battery over the driver's synthetic tables.
  *
  * Each query exercises one operator from SURVEY.md §2 through the real
  * library code (GraphStore et al.), and has a DuckDB oracle in
  * [[oracles]] with identical column names and exact-deterministic values
  * (integer/decimal arithmetic; doubles only where bit-reproducible).
  */
object CoreQueries {

  private val TAG1 = 1000L
  private val TAG2 = 2000L

  /** Two-epoch node upsert: create + update + null-overwrite + untouched.
    * Reference semantics: querybuilder.py:1266-1279 (MERGE on id,
    * firstseen ON CREATE, lastupdated every touch, null overwrites). */
  def upsertNodes(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val batch1 = c.select(
      col("c_custkey").as("id"),
      col("c_name").as("name"),
      col("c_acctbal").as("acctbal"))
    val batch2 = c.filter(col("c_custkey") % 10 =!= 0).select(
      col("c_custkey").as("id"),
      col("c_name").as("name"),
      when(col("c_custkey") % 3 === 0, lit(null).cast("double"))
        .otherwise(col("c_acctbal") + lit(10.0)).as("acctbal"))
    val t0 = GraphStore.emptyLike(batch1)
    val t1 = GraphStore.upsertNodes(t0, batch1, TAG1)
    GraphStore.upsertNodes(t1, batch2, TAG2)
  }

  /** Scoped incremental cleanup on top of the two-epoch upsert: stale rows
    * (lastupdated <> TAG2) are deleted, but only inside the tenant scope
    * (nationkey < 13). Reference: cleanupbuilder.py:244-383. */
  def cleanupStale(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val batch1 = c.select(
      col("c_custkey").as("id"),
      col("c_nationkey").cast("long").as("nationkey"))
    val batch2 = c.filter(col("c_custkey") % 10 =!= 0).select(
      col("c_custkey").as("id"),
      col("c_nationkey").cast("long").as("nationkey"))
    val t1 = GraphStore.upsertNodes(GraphStore.emptyLike(batch1), batch1, TAG1)
    val t2 = GraphStore.upsertNodes(t1, batch2, TAG2)
    GraphStore.cleanup(t2, TAG2, scope = col("nationkey") < 13)
      .select(col("id"), col("nationkey"), col("firstseen"), col("lastupdated"))
  }

  /** Sub-resource (tenant) edge attach: node batch joined to its tenant
    * nodes, producing a RESOURCE edge table. Reference:
    * querybuilder.py:816-902 (OPTIONAL MATCH tenant ... WHERE j IS NOT NULL
    * MERGE (i)<-[:RESOURCE]-(j)) — the null-filtered optional match is an
    * inner join. Tenant set restricted to custkey % 7 <> 0 so the join
    * actually filters. */
  def edgeAttachSubresource(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val tenants = Tables.customer(spark, dir)
      .filter(col("c_custkey") % 7 =!= 0)
      .select(col("c_custkey").as("id"))
    val batch = o.select(col("o_orderkey").as("src_id"), col("o_custkey").as("tenant_ref"))
    val edges = batch
      .join(broadcast(tenants), batch("tenant_ref") === tenants("id"), "inner")
      .select(col("src_id"), col("id").as("dst_id"))
    GraphStore.upsertEdges(GraphStore.emptyLike(edges, Seq("src_id", "dst_id")), edges, TAG2)
      .select(col("src_id"), col("dst_id"), col("lastupdated"))
  }

  /** Time-windowed event aggregation (CloudTrail AssumeRole analog):
    * group events by (actor, type) → times_used / first_seen / last_used.
    * Reference: cloudtrail_management_events.py:234-310. */
  def aggEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(
        count(lit(1)).as("times_used"),
        min(col("ts")).as("first_seen_in_time_window"),
        max(col("ts")).as("last_used"))

  /** Multi-hop graph-pattern join (analysis-job analog): revenue per region
    * through lineitem→orders→customer→nation→region. Decimal arithmetic so
    * the aggregate is exact and order-independent; final cast to double.
    * Reference pattern: analysis/aws/analysis.py:10-29 (chained equi-joins). */
  def multihopRevenue(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        // exact integer arithmetic end-to-end: quantize each factor to a
        // BIGINT (x1e4), multiply, sum — a decimal→double cast of the
        // TOTAL would double-round once the scaled value exceeds 2^53
        // (DuckDB's int128 conversion disagrees with the correctly-rounded
        // BigDecimal cast; bit us at sf0.1)
        sum((col("l_extendedprice").cast("decimal(18,4)") * lit(10000)).cast("long") *
          (lit(10000L) - (col("l_discount").cast("decimal(18,4)") * lit(10000)).cast("long")))
          .as("revenue_x1e8"),
        count(lit(1)).as("n_items"))
      .select(col("r_name").as("region"), col("revenue_x1e8"), col("n_items"))
  }

  /** Rules-engine Fact analog ("node lacking required edge", like
    * mfa_missing): customers with no orders, via anti-join.
    * Reference: rules/data/rules/mfa_missing.py + cleanup anti-join
    * semantics (cleanupbuilder.py:279-288). */
  def factCustomersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_orderstatus") === "O")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
  }

  /** Window functions over the event stream: per-user sequence number and
    * exact running sum (decimal) ordered by (ts, event_id). */
  def windowFuncs(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("running_value",
        sum(col("value").cast("decimal(18,6)"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double"))
      .select(col("event_id"), col("user_id"), col("rn"), col("running_value"))
  }

  /** Batch tumbling-window aggregation (Structured Streaming analog —
    * SURVEY §2.10): 1-hour tumbling windows over event time. */
  def tumblingWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding (hopping) windows — 2h length, 1h slide: each event lands in
    * two overlapping windows. The rolling-feature variant of
    * [[tumblingWindow]]; identical aggregation semantics, window
    * membership duplicated by the slide ratio. */
  def slidingWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** Endpoint-scoped REL cleanup (cleanupbuilder.py:244-383 scoped rel
    * delete; the rel-only shape of case 3 :91-103): stale Order→Customer
    * edges die when their customer endpoint is in the synced scope
    * (nation < 13); stale edges whose endpoint provably belongs to
    * another scope survive; dangling stale edges (endpoint id −1, never
    * loaded) always die. */
  def cleanupRelScoped(spark: SparkSession, dir: String): DataFrame = {
    val custNodes = GraphStore.initialLoad(
      Tables.customer(spark, dir).select(
        col("c_custkey").as("id"), col("c_nationkey").cast("long").as("nationkey")),
      Seq(GraphStore.ID), TAG1)
    val o = Tables.orders(spark, dir)
    val live = o.select(col("o_orderkey").as("src_id"), col("o_custkey").as("dst_id"))
    val dangling = o.filter(col("o_orderkey") % 5 === 0)
      .select(col("o_orderkey").as("src_id"), lit(-1L).as("dst_id"))
    val t1 = GraphStore.upsertEdges(
      GraphStore.emptyLike(live, Seq("src_id", "dst_id")),
      live.unionByName(dangling), TAG1)
    val t2 = GraphStore.upsertEdges(t1, live.filter(col("src_id") % 3 =!= 0), TAG2)
    GraphStore.cleanupEdgesByEndpoint(t2, TAG2, custNodes, GraphStore.DST,
        scope = col("nationkey") < 13)
      .select(col("src_id").cast("long").as("src_id"),
        col("dst_id").cast("long").as("dst_id"), col("lastupdated"))
  }

  /** Cascade cleanup (cleanupbuilder.py:309-334): stale scoped Orders
    * die; their stale Item children cascade; CONTAINS edges detach from
    * both deleted sides. Stale items under fresh or out-of-scope parents
    * survive (the re-parent protection `child.lastupdated <> $TAG`). One
    * result set with a kind column over orders / items / edges. */
  def cleanupCascade(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val orders1 = o.select(col("o_orderkey").as("id"),
      col("o_custkey").cast("long").as("cust"))
    val orders2 = orders1.filter(col("id") % 3 =!= 0)
    val items1 = li.select(
      (col("l_orderkey") * 10 + col("l_linenumber")).cast("long").as("id"),
      col("l_orderkey").as("parent"), col("l_linenumber").as("ln"))
    val items2 = items1.filter(col("parent") % 3 =!= 0 && col("ln") % 2 === 1)
    def edgesOf(items: DataFrame) =
      items.select(col("parent").as("src_id"), col("id").as("dst_id"))
    val g0 = Graph()
      .withNodes("Order", GraphStore.upsertNodes(
        GraphStore.upsertNodes(GraphStore.emptyLike(orders1), orders1, TAG1),
        orders2, TAG2))
      .withNodes("Item", GraphStore.upsertNodes(
        GraphStore.upsertNodes(GraphStore.emptyLike(items1.drop("parent", "ln")),
          items1.drop("parent", "ln"), TAG1),
        items2.drop("parent", "ln"), TAG2))
      .withEdges(("Order", "CONTAINS", "Item"), GraphStore.upsertEdges(
        GraphStore.upsertEdges(GraphStore.emptyLike(edgesOf(items1),
          Seq("src_id", "dst_id")), edgesOf(items1), TAG1),
        edgesOf(items2), TAG2))
    val g = GraphStore.cleanupWithCascade(g0, "Order",
      Seq(("Order", "CONTAINS", "Item")), TAG2, scope = col("cust") % 2 === 0)
    g.nodeTable("Order")
      .select(lit("order").as("kind"), col("id").cast("long").as("a"),
        lit(null).cast("long").as("b"), col("lastupdated"))
      .unionByName(g.nodeTable("Item")
        .select(lit("item").as("kind"), col("id").cast("long").as("a"),
          lit(null).cast("long").as("b"), col("lastupdated")))
      .unionByName(g.edgeTable("Order", "CONTAINS", "Item")
        .select(lit("edge").as("kind"), col("src_id").cast("long").as("a"),
          col("dst_id").cast("long").as("b"), col("lastupdated")))
  }

  /** Unscoped cleanup pair (cleanupbuilder.py:105-118 case 4): plain
    * stale-tag delete on nodes AND on the relationship table, no tenant
    * scope anywhere. */
  def cleanupUnscoped(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.supplier(spark, dir)
    val nodes1 = s.select(col("s_suppkey").as("id"))
    val nodes2 = nodes1.filter(col("id") % 4 =!= 0)
    val edges1 = s.select(col("s_suppkey").as("src_id"),
      col("s_nationkey").cast("long").as("dst_id"))
    val edges2 = edges1.filter(col("src_id") % 4 =!= 0)
    val nodeTable = GraphStore.upsertNodes(
      GraphStore.upsertNodes(GraphStore.emptyLike(nodes1), nodes1, TAG1), nodes2, TAG2)
    val edgeTable = GraphStore.upsertEdges(
      GraphStore.upsertEdges(GraphStore.emptyLike(edges1, Seq("src_id", "dst_id")),
        edges1, TAG1), edges2, TAG2)
    GraphStore.cleanup(nodeTable, TAG2)
      .select(lit("node").as("kind"), col("id").cast("long").as("a"),
        lit(null).cast("long").as("b"), col("lastupdated"))
      .unionByName(GraphStore.cleanup(edgeTable, TAG2)
        .select(lit("edge").as("kind"), col("src_id").cast("long").as("a"),
          col("dst_id").cast("long").as("b"), col("lastupdated")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "core_cleanup_rel_scoped" -> (cleanupRelScoped _),
    "core_cleanup_cascade" -> (cleanupCascade _),
    "core_cleanup_unscoped" -> (cleanupUnscoped _),
    "core_sliding_window" -> (slidingWindow _),
    "core_upsert_nodes" -> (upsertNodes _),
    "core_cleanup_stale" -> (cleanupStale _),
    "core_edge_attach_subresource" -> (edgeAttachSubresource _),
    "core_agg_events" -> (aggEvents _),
    "core_multihop_revenue" -> (multihopRevenue _),
    "core_fact_customers_without_orders" -> (factCustomersWithoutOrders _),
    "core_window_funcs" -> (windowFuncs _),
    "core_tumbling_window" -> (tumblingWindow _),
  )

  val oracles: Map[String, String] = Map(
    "core_cleanup_rel_scoped" ->
      """WITH e AS (
        |  SELECT CAST(o_orderkey AS BIGINT) AS src_id,
        |         CAST(o_custkey AS BIGINT) AS dst_id,
        |         CAST(CASE WHEN o_orderkey % 3 <> 0 THEN 2000 ELSE 1000 END AS BIGINT)
        |           AS lastupdated
        |  FROM orders
        |  UNION ALL
        |  SELECT CAST(o_orderkey AS BIGINT), CAST(-1 AS BIGINT), CAST(1000 AS BIGINT)
        |  FROM orders WHERE o_orderkey % 5 = 0)
        |SELECT e.src_id, e.dst_id, e.lastupdated
        |FROM e LEFT JOIN customer c ON e.dst_id = c.c_custkey
        |WHERE e.lastupdated = 2000
        |   OR (c.c_custkey IS NOT NULL AND c.c_nationkey >= 13)""".stripMargin,
    "core_cleanup_cascade" ->
      """WITH survivors AS (
        |  SELECT o_orderkey, o_custkey FROM orders
        |  WHERE NOT (o_orderkey % 3 = 0 AND o_custkey % 2 = 0))
        |SELECT 'order' AS kind, CAST(o_orderkey AS BIGINT) AS a,
        |       CAST(NULL AS BIGINT) AS b,
        |       CAST(CASE WHEN o_orderkey % 3 <> 0 THEN 2000 ELSE 1000 END AS BIGINT)
        |         AS lastupdated
        |FROM survivors
        |UNION ALL
        |SELECT DISTINCT 'item', CAST(l_orderkey * 10 + l_linenumber AS BIGINT),
        |       CAST(NULL AS BIGINT),
        |       CAST(CASE WHEN l_orderkey % 3 <> 0 AND l_linenumber % 2 = 1
        |            THEN 2000 ELSE 1000 END AS BIGINT)
        |FROM lineitem JOIN survivors ON l_orderkey = o_orderkey
        |UNION ALL
        |SELECT DISTINCT 'edge', CAST(l_orderkey AS BIGINT),
        |       CAST(l_orderkey * 10 + l_linenumber AS BIGINT),
        |       CAST(CASE WHEN l_orderkey % 3 <> 0 AND l_linenumber % 2 = 1
        |            THEN 2000 ELSE 1000 END AS BIGINT)
        |FROM lineitem JOIN survivors ON l_orderkey = o_orderkey""".stripMargin,
    "core_cleanup_unscoped" ->
      """SELECT 'node' AS kind, CAST(s_suppkey AS BIGINT) AS a,
        |       CAST(NULL AS BIGINT) AS b, CAST(2000 AS BIGINT) AS lastupdated
        |FROM supplier WHERE s_suppkey % 4 <> 0
        |UNION ALL
        |SELECT 'edge', CAST(s_suppkey AS BIGINT), CAST(s_nationkey AS BIGINT),
        |       CAST(2000 AS BIGINT)
        |FROM supplier WHERE s_suppkey % 4 <> 0""".stripMargin,
    "core_upsert_nodes" ->
      """SELECT CAST(c_custkey AS BIGINT) AS id,
        |  CAST(1000 AS BIGINT) AS firstseen,
        |  CAST(CASE WHEN c_custkey % 10 <> 0 THEN 2000 ELSE 1000 END AS BIGINT) AS lastupdated,
        |  c_name AS name,
        |  CASE WHEN c_custkey % 10 <> 0
        |       THEN (CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_acctbal + 10.0 END)
        |       ELSE c_acctbal END AS acctbal
        |FROM customer""".stripMargin,
    "core_cleanup_stale" ->
      """SELECT CAST(c_custkey AS BIGINT) AS id,
        |  CAST(c_nationkey AS BIGINT) AS nationkey,
        |  CAST(1000 AS BIGINT) AS firstseen,
        |  CAST(CASE WHEN c_custkey % 10 <> 0 THEN 2000 ELSE 1000 END AS BIGINT) AS lastupdated
        |FROM customer
        |WHERE c_custkey % 10 <> 0 OR c_nationkey >= 13""".stripMargin,
    "core_edge_attach_subresource" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS src_id,
        |  CAST(c_custkey AS BIGINT) AS dst_id,
        |  CAST(2000 AS BIGINT) AS lastupdated
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_custkey % 7 <> 0""".stripMargin,
    "core_agg_events" ->
      """SELECT user_id, event_type,
        |  count(*) AS times_used,
        |  min(ts) AS first_seen_in_time_window,
        |  max(ts) AS last_used
        |FROM events GROUP BY user_id, event_type""".stripMargin,
    "core_multihop_revenue" ->
      """SELECT r_name AS region,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT) *
        |      (10000 - CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT))) AS BIGINT) AS revenue_x1e8,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,
    "core_fact_customers_without_orders" ->
      """SELECT CAST(c_custkey AS BIGINT) AS id, c_name AS name
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')""".stripMargin,
    "core_sliding_window" ->
      """WITH w AS (
        |  SELECT event_type, value,
        |    date_trunc('hour', ts) - to_hours(i) AS window_start
        |  FROM events CROSS JOIN (SELECT unnest(range(0, 2)) AS i) s)
        |SELECT window_start, event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM w GROUP BY window_start, event_type""".stripMargin,
    "core_window_funcs" ->
      """SELECT event_id, user_id,
        |  CAST(row_number() OVER w AS INTEGER) AS rn,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS running_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,
    "core_tumbling_window" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
  )
}
