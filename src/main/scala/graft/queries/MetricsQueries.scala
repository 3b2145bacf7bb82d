package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Analytics

/** Oracle gates for the [[graft.operators.Analytics]] battery — the
  * read-side cohort/drift/feature-prep reports (SURVEY §2.9 read
  * surface, generalized the way a training-data lake consumes a synced
  * table: reference drift/rules queries are the same point-in-time
  * report shape).
  *
  * Every gate uses exact integer arithmetic (cents, ppm, integer div)
  * so DuckDB reproduces the numbers bit-for-bit.
  */
object MetricsQueries {

  /** Event value in exact cents — the shared integral target column
    * (double → DECIMAL(18,2) → ×100, the [[StreamQueries]] acctbal
    * idiom; a float×100 floor would be off-by-one on .x5 values). */
  private def cents: org.apache.spark.sql.Column =
    (col("value").cast("decimal(18,2)") * 100).cast("long")

  /** Cohort retention triangle over events: users bucketed by first
    * active epoch-day, distinct-user counts per (cohort, day-offset). */
  def analyticsRetention(spark: SparkSession, dir: String): DataFrame =
    Analytics.retentionCohorts(Tables.events(spark, dir), "user_id",
        datediff(to_date(col("ts")), lit("2024-01-01")))
      .select(col("cohort_pd"), col("offset_pd"), col("n_users"))

  /** Leakage-safe out-of-fold target encoding of event_type against the
    * cents value, 5 folds keyed on user id. */
  def analyticsTargetEncode(spark: SparkSession, dir: String): DataFrame =
    Analytics.targetEncodeOof(Tables.events(spark, dir), "event_type",
        col("user_id") % 5, cents)
      .select(col("cat"), col("fold"), col("fold_n"), col("oof_enc"))

  /** Trailing-window anomaly flags per user series: 20-point lookback,
    * 5-point minimum baseline, k = 3 sigmas — all cleared-denominator
    * long arithmetic, current row excluded from its own baseline. */
  def analyticsRollingAnomaly(spark: SparkSession, dir: String): DataFrame =
    Analytics.rollingAnomaly(Tables.events(spark, dir),
        partCols = Seq(col("user_id")),
        orderCols = Seq(col("ts"), col("event_id")),
        valueCol = cents, lookback = 20, minBaseline = 5, k = 3)
      .select(col("event_id"), col("user_id"), col("_v").as("v_cents"),
        col("is_anomaly"))

  /** Equal-frequency binning summary: event cents dealt into 8 ntile
    * bins per event type under a total order, (count, lo, hi) per bin. */
  def analyticsQuantileBins(spark: SparkSession, dir: String): DataFrame =
    Analytics.quantileBinSummary(Tables.events(spark, dir), "event_type",
        cents, orderCols = Seq(cents, col("event_id")), nBins = 8)
      .select(col("g"), col("bin").cast("long").as("bin"), col("n"),
        col("lo"), col("hi"))

  /** Total-variation drift between even- and odd-numbered sources over
    * the doc-length distribution (bin = n_chars div 100): the "did this
    * week's corpus mix move" monitoring metric, exact ppm. */
  def analyticsTvdDrift(spark: SparkSession, dir: String): DataFrame =
    Analytics.tvdDrift(Tables.documents(spark, dir),
      binCol = expr("n_chars div 100"),
      sideCol = substring(col("source"), 4, 10).cast("int") % 2 === 0)

  /** Token-budget allocation plan across sources: 1M-token budget split
    * by temperature-flattened (α = 0.5) per-source token mass. */
  def analyticsTokenBudget(spark: SparkSession, dir: String): DataFrame =
    Analytics.tokenBudget(Tables.documents(spark, dir), "source",
      size(split(col("text"), " ")), budget = 1000000L)

  /** Guaranteed heavy hitters over a geometrically-skewed key (lowest
    * set bit of event_id: value 2^t carries n/2^(t+1) of the mass — the
    * skew shape is SF-invariant), k = 6 counters: output is exactly the
    * keys whose true frequency clears n/7, independently of which extra
    * candidates the partitioning leaves in the sketch. */
  def sketchHeavyHitters(spark: SparkSession, dir: String): DataFrame =
    graft.text.Sketches.heavyHitters(
      Tables.events(spark, dir)
        .select(col("event_id").bitwiseAND(expr("-event_id")).as("lowbit")),
      "lowbit", k = 6)

  /** Gap-based batch sessionization of the event stream (30-minute
    * inactivity gap), rolled up per session: the backfill twin of the
    * streaming session-window gate. */
  def sessionizeGaps(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Temporal.sessionizeGaps(Tables.events(spark, dir),
        keys = Seq("user_id"), tsCol = "ts", tieCols = Seq("event_id"),
        gapMicros = 1800L * 1000000L)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))

  /** 2-D Pareto frontier over documents — length (n_chars) vs token
    * density (tokens·1000 div chars), both maximized: the longest doc
    * at each density level, a genuine selection tradeoff curve. */
  def paretoFrontier(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.paretoFrontier2d(
        Tables.documents(spark, dir)
          .select(col("doc_id"), col("text"), col("n_chars")),
        col("n_chars"),
        expr("CAST(size(split(text, ' ')) AS BIGINT) * 1000 div n_chars"))
      .select(col("doc_id"), col("frontier_x"), col("frontier_y"))

  /** Merkle-style block-pruned snapshot diff over two customer epochs:
    * epoch B drops every 101st key, bumps every 97th balance, and adds
    * shifted keys for every 500th — the replication anti-entropy check,
    * resolved through 256 bucket checksums instead of a full rescan. */
  def driftBlockDiff(spark: SparkSession, dir: String): DataFrame = {
    val cents = (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long")
    val base = Tables.customer(spark, dir)
      .select(col("c_custkey").cast("long").as("c_custkey"),
        col("c_name"), cents.as("bal"))
    val b = base.filter(col("c_custkey") % 101 =!= 0)
      .select(col("c_custkey"), col("c_name"),
        (col("bal") + when(col("c_custkey") % 97 === 0, 100L).otherwise(0L)).as("bal"))
      .unionByName(base.filter(col("c_custkey") % 500 === 0)
        .select((col("c_custkey") + 10000000L).as("c_custkey"),
          col("c_name"), col("bal")))
    graft.drift.Drift.blockDiff(base, b, "c_custkey", Seq("c_name", "bal"),
      nBuckets = 256)
  }

  /** CMS join-cardinality estimate: even- and odd-doc token multisets
    * sketched separately (4×64), inner-product estimate vs the true
    * word-join size — the planner's broadcast-vs-shuffle signal read
    * from two KB summaries. */
  def sketchJoinSize(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.Sketches
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    def cnt(side: Int) = toks.filter(col("doc_id") % 2 === side)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
    val est = Sketches.cmsJoinCardinality(
      Sketches.countMinSketch(cnt(0), "word", "n", depth = 4, width = 64),
      Sketches.countMinSketch(cnt(1), "word", "n", depth = 4, width = 64))
    val truth = cnt(0).withColumnRenamed("n", "na")
      .join(cnt(1).withColumnRenamed("n", "nb"), Seq("word"))
      .agg(sum(col("na").cast("decimal(38,0)") * col("nb")).cast("long")
        .as("true_pairs"))
    est.crossJoin(broadcast(truth))
  }

  /** Exact α = ½ EWMA over each user's event-value series (16-point
    * lookback): scaled-integer smoothing next to the anomaly gate. */
  def windowEwma(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.ewmaHalf(Tables.events(spark, dir),
        partCols = Seq(col("user_id")),
        orderCols = Seq(col("ts"), col("event_id")),
        valueCol = cents, lookback = 16)
      .select(col("event_id"), col("user_id"), cents.as("v_cents"),
        col("ewma_n"), col("ewma_num"))

  /** Referential-integrity audit across the warehouse's FK edges in one
    * report: per relation, child row count + orphan count (child keys
    * with no parent). Each check is one scan + one broadcastable
    * distinct-parent-key left join — the multi-table data-quality sweep
    * a sync pipeline runs after load. The synthetic warehouse is intact
    * (all zeros); any missing parent key flips its relation's
    * n_orphans and fails the oracle hash. */
  def qualityReferential(spark: SparkSession, dir: String): DataFrame = {
    def check(name: String, child: DataFrame, ck: String,
              parent: DataFrame, pk: String): DataFrame =
      child.select(col(ck).cast("long").as("k"))
        .join(parent.select(col(pk).cast("long").as("k")).distinct()
          .withColumn("_hit", lit(1)), Seq("k"), "left")
        .agg(count(lit(1)).as("n_child"),
          sum(when(col("_hit").isNull, 1L).otherwise(0L)).as("n_orphans"))
        .select(lit(name).as("relation"), col("n_child"), col("n_orphans"))
    Seq(
      check("lineitem_orders", Tables.lineitem(spark, dir), "l_orderkey",
        Tables.orders(spark, dir), "o_orderkey"),
      check("lineitem_part", Tables.lineitem(spark, dir), "l_partkey",
        Tables.part(spark, dir), "p_partkey"),
      check("lineitem_supplier", Tables.lineitem(spark, dir), "l_suppkey",
        Tables.supplier(spark, dir), "s_suppkey"),
      check("orders_customer", Tables.orders(spark, dir), "o_custkey",
        Tables.customer(spark, dir), "c_custkey"),
      check("customer_nation", Tables.customer(spark, dir), "c_nationkey",
        Tables.nation(spark, dir), "n_nationkey"),
      check("supplier_nation", Tables.supplier(spark, dir), "s_nationkey",
        Tables.nation(spark, dir), "n_nationkey"),
      check("nation_region", Tables.nation(spark, dir), "n_regionkey",
        Tables.region(spark, dir), "r_regionkey"),
      check("events_customer", Tables.events(spark, dir), "user_id",
        Tables.customer(spark, dir), "c_custkey"),
    ).reduce(_ unionByName _)
  }

  /** Peak concurrent 30-minute activity windows per event type: each
    * event holds [ts, ts+30min); the max simultaneous count is the
    * occupancy metric behind capacity planning. */
  def intervalsPeak(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Temporal.intervalMaxConcurrency(
      Tables.events(spark, dir)
        .select(col("event_type"), col("ts").as("s"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("e")),
      Seq("event_type"), "s", "e")

  /** First-order event-type transition census per user journey: counts
    * and exact-ppm probabilities of each consecutive (from → to) pair —
    * the Markov-chain estimate behind next-action modeling. */
  def eventsTransitions(spark: SparkSession, dir: String): DataFrame =
    Analytics.transitionCensus(Tables.events(spark, dir),
      keyCols = Seq(col("user_id")),
      orderCols = Seq(col("ts"), col("event_id")),
      stateCol = col("event_type"))

  /** Linear multi-touch attribution: every purchase event's cents value
    * split exactly over the same user's click/view/signup touches in the
    * preceding 24 h (remainder cents to the earliest touches), rolled up
    * per channel — the credit column re-sums to precisely the attributed
    * purchase total. */
  def attributionLinear(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val conv = ev.filter(col("event_type") === "purchase")
    val touch = ev.filter(col("event_type").isin("click", "view", "signup"))
    Analytics.linearAttribution(
        conv, col("user_id"), col("event_id"), cents, unix_micros(col("ts")),
        touch, col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")), lookbackMicros = 86400L * 1000000L)
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_touches"), sum(col("credit")).as("total_credit"))
  }

  /** Per-column profile of the orders table: rows, nulls, exact distinct
    * count, stringified min/max — the post-load data-quality sweep. */
  def qualityProfile(spark: SparkSession, dir: String): DataFrame =
    Analytics.columnProfile(Tables.orders(spark, dir),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))

  /** Market-basket association rules over orders × part brands: support,
    * exact-ppm confidence and ×1e6 lift for brand pairs co-ordered in at
    * least 20 orders. */
  def basketRules(spark: SparkSession, dir: String): DataFrame =
    Analytics.associationRules(
      Tables.lineitem(spark, dir)
        .join(Tables.part(spark, dir),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("p_brand")),
      col("l_orderkey"), col("p_brand"), minSupport = 20L)

  /** Exact two-sample Kolmogorov–Smirnov: purchase vs click cents
    * distributions as the exact fraction (d_num, d_den) — binning-free
    * drift detection next to the TVD gate. */
  def analyticsKsStat(spark: SparkSession, dir: String): DataFrame =
    Analytics.ksStatistic(
      Tables.events(spark, dir)
        .filter(col("event_type").isin("purchase", "click")),
      cents, col("event_type") === "purchase")

  /** Per-user time-weighted average of the event value (cents·µs exact
    * fraction): each value holds until the user's next event — the
    * sampled-state mean the plain row average gets wrong. */
  def analyticsTwa(spark: SparkSession, dir: String): DataFrame =
    Analytics.timeWeightedAverage(Tables.events(spark, dir),
      Seq(col("user_id")), unix_micros(col("ts")), cents,
      Seq(col("event_id")))

  /** One-sided CUSUM drift alarm per event type (threshold 5000 cents
    * of cumulative positive deviation from the type's floor-mean): the
    * closed-form window pass — running sum minus running min — so no
    * sequential recursion. */
  def analyticsCusum(spark: SparkSession, dir: String): DataFrame =
    Analytics.cusumAlarm(Tables.events(spark, dir), Seq("event_type"),
        Seq(col("ts"), col("event_id")), cents, threshold = 5000L)
      .select(col("event_id"), col("event_type"), col("cusum"), col("is_alarm"))

  /** k-anonymity / l-diversity audit over customers: quasi-identifier
    * (nation, market segment), sensitive account balance — lists the
    * equivalence classes under k = 8 members or l = 3 distinct values. */
  def qualityKAnon(spark: SparkSession, dir: String): DataFrame =
    graft.stats.DataQuality.kAnonymityViolations(
      Tables.customer(spark, dir)
        .select(col("c_nationkey").cast("long").as("c_nationkey"),
          col("c_mktsegment"),
          (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long").as("bal")),
      Seq("c_nationkey", "c_mktsegment"), "bal", k = 8L, l = 3L)

  /** Parallel-LTTB downsampling of each event-type series into 16
    * equal-time buckets: per bucket the spike-preserving point by exact
    * decimal triangle area against neighbor centroids, endpoints kept. */
  def analyticsDownsample(spark: SparkSession, dir: String): DataFrame =
    Analytics.downsampleLttb(Tables.events(spark, dir)
        .select(col("event_type"), col("ts"), col("value")),
      Seq("event_type"), unix_micros(col("ts")), cents, nBuckets = 16)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "analytics_downsample" -> (analyticsDownsample _),
    "analytics_cusum" -> (analyticsCusum _),
    "quality_k_anon" -> (qualityKAnon _),
    "analytics_twa" -> (analyticsTwa _),
    "analytics_ks_stat" -> (analyticsKsStat _),
    "events_transitions" -> (eventsTransitions _),
    "attribution_linear" -> (attributionLinear _),
    "quality_profile" -> (qualityProfile _),
    "basket_rules" -> (basketRules _),
    "sketch_heavy_hitters" -> (sketchHeavyHitters _),
    "sketch_join_size" -> (sketchJoinSize _),
    "window_ewma" -> (windowEwma _),
    "quality_referential" -> (qualityReferential _),
    "intervals_peak" -> (intervalsPeak _),
    "sessionize_gaps" -> (sessionizeGaps _),
    "pareto_frontier" -> (paretoFrontier _),
    "drift_block_diff" -> (driftBlockDiff _),
    "analytics_retention" -> (analyticsRetention _),
    "analytics_target_encode" -> (analyticsTargetEncode _),
    "analytics_rolling_anomaly" -> (analyticsRollingAnomaly _),
    "analytics_quantile_bins" -> (analyticsQuantileBins _),
    "analytics_tvd_drift" -> (analyticsTvdDrift _),
    "analytics_token_budget" -> (analyticsTokenBudget _),
  )

  private val IntervalsPeakOracleSql: String =
    """WITH iv AS (
      |  SELECT event_type, ts AS s, ts + INTERVAL 30 MINUTE AS e FROM events),
      |ev AS (
      |  SELECT event_type, s AS t, 1 AS side, 1 AS d FROM iv
      |  UNION ALL
      |  SELECT event_type, e, 0, -1 FROM iv),
      |run AS (
      |  SELECT event_type,
      |    sum(d) OVER (PARTITION BY event_type ORDER BY t, side
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r
      |  FROM ev)
      |SELECT event_type, CAST(max(r) AS BIGINT) AS peak_concurrency
      |FROM run GROUP BY event_type""".stripMargin

  private val ReferentialOracleSql: String = {
    val checks = Seq(
      ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
      ("lineitem_supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
      ("customer_nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      ("supplier_nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
      ("nation_region", "nation", "n_regionkey", "region", "r_regionkey"),
      ("events_customer", "events", "user_id", "customer", "c_custkey"),
    )
    checks.map { case (name, child, ck, parent, pk) =>
      s"""SELECT '$name' AS relation, count(*) AS n_child,
         |  CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_orphans
         |FROM (SELECT CAST($ck AS BIGINT) AS k FROM $child) c
         |LEFT JOIN (SELECT DISTINCT CAST($pk AS BIGINT) AS k FROM $parent) p
         |  ON c.k = p.k""".stripMargin
    }.mkString("\nUNION ALL\n")
  }

  val oracles: Map[String, String] = Map(
    "analytics_downsample" ->
      """WITH pts AS (
        |  SELECT event_type AS k, epoch_us(ts) AS t,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        |  FROM events),
        |span AS (SELECT k, min(t) AS mn, max(t) AS mx FROM pts GROUP BY k),
        |b AS (
        |  SELECT p.k, p.t, p.v,
        |    (p.t - s.mn) * 16 // (s.mx - s.mn + 1) AS bucket
        |  FROM pts p JOIN span s ON p.k = s.k),
        |cent AS (
        |  SELECT k, bucket, sum(t) // count(t) AS cx, sum(v) // count(v) AS cy
        |  FROM b GROUP BY k, bucket),
        |n AS (
        |  SELECT b.k, b.bucket, b.t, b.v,
        |    p.cx AS pcx, p.cy AS pcy, x.cx AS ncx, x.cy AS ncy
        |  FROM b
        |  LEFT JOIN cent p ON b.k = p.k AND b.bucket = p.bucket + 1
        |  LEFT JOIN cent x ON b.k = x.k AND b.bucket = x.bucket - 1),
        |ranked AS (
        |  SELECT k, bucket, t, v, row_number() OVER (
        |    PARTITION BY k, bucket ORDER BY
        |      (CASE WHEN pcx IS NULL THEN CAST(-t AS HUGEINT)
        |            WHEN ncx IS NULL THEN CAST(t AS HUGEINT)
        |            ELSE abs(CAST(pcx - t AS HUGEINT) * (ncy - v)
        |                   - CAST(ncx - t AS HUGEINT) * (pcy - v)) END) DESC,
        |      (CASE WHEN pcx IS NULL OR ncx IS NULL THEN 0 ELSE -t END) DESC,
        |      t DESC, v DESC) AS rn
        |  FROM n)
        |SELECT k AS event_type, CAST(bucket AS BIGINT) AS bucket,
        |  CAST(t AS BIGINT) AS t, v
        |FROM ranked WHERE rn = 1""".stripMargin,
    "analytics_cusum" ->
      """WITH v AS (
        |  SELECT event_id, event_type, ts,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        |  FROM events),
        |mu AS (
        |  SELECT event_type, sum(v) // count(v) AS mu FROM v GROUP BY event_type),
        |p1 AS (
        |  SELECT v.event_id, v.event_type, v.ts,
        |    sum(v.v - mu.mu) OVER tw AS p
        |  FROM v JOIN mu ON v.event_type = mu.event_type
        |  WINDOW tw AS (PARTITION BY v.event_type ORDER BY v.ts, v.event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |p2 AS (
        |  SELECT event_id, event_type, p,
        |    min(p) OVER (PARTITION BY event_type ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS minp
        |  FROM p1)
        |SELECT event_id, event_type,
        |  CAST(p - least(0, minp) AS BIGINT) AS cusum,
        |  p - least(0, minp) > 5000 AS is_alarm
        |FROM p2""".stripMargin,
    "quality_k_anon" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_mktsegment,
        |  count(*) AS class_size,
        |  count(DISTINCT CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT))
        |    AS n_sensitive
        |FROM customer
        |GROUP BY c_nationkey, c_mktsegment
        |HAVING count(*) < 8
        |  OR count(DISTINCT CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
        |       AS BIGINT)) < 3""".stripMargin,
    "analytics_twa" ->
      """WITH v AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS t,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        |  FROM events),
        |w AS (
        |  SELECT user_id, v,
        |    lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) - t AS gap
        |  FROM v)
        |SELECT user_id,
        |  CAST(sum(CASE WHEN gap IS NOT NULL THEN v * gap ELSE 0 END)
        |    AS BIGINT) AS twa_num,
        |  CAST(sum(coalesce(gap, 0)) AS BIGINT) AS twa_den
        |FROM w GROUP BY user_id""".stripMargin,
    "analytics_ks_stat" ->
      """WITH v AS (
        |  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
        |    event_type = 'purchase' AS is_a
        |  FROM events WHERE event_type IN ('purchase', 'click')),
        |c AS (
        |  SELECT v,
        |    sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS cb
        |  FROM v GROUP BY v),
        |t AS (SELECT sum(ca) AS n_a, sum(cb) AS n_b FROM c),
        |r AS (
        |  SELECT
        |    sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS cuma,
        |    sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS cumb
        |  FROM c)
        |SELECT CAST(t.n_a AS BIGINT) AS n_a, CAST(t.n_b AS BIGINT) AS n_b,
        |  CAST(max(abs(r.cuma * t.n_b - r.cumb * t.n_a)) AS BIGINT) AS d_num,
        |  CAST(max(t.n_a * t.n_b) AS BIGINT) AS d_den
        |FROM r CROSS JOIN t GROUP BY t.n_a, t.n_b""".stripMargin,
    "events_transitions" ->
      """WITH p AS (
        |  SELECT event_type AS from_state,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS to_state
        |  FROM events),
        |census AS (
        |  SELECT from_state, to_state, count(*) AS n FROM p
        |  WHERE to_state IS NOT NULL GROUP BY from_state, to_state)
        |SELECT from_state, to_state, n,
        |  CAST(n * 1000000 // sum(n) OVER (PARTITION BY from_state) AS BIGINT)
        |    AS p_ppm
        |FROM census""".stripMargin,
    "attribution_linear" ->
      """WITH conv AS (
        |  SELECT user_id, event_id AS conv_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
        |    epoch_us(ts) AS cts
        |  FROM events WHERE event_type = 'purchase'),
        |touch AS (
        |  SELECT user_id, event_id AS touch_id, event_type AS channel,
        |    epoch_us(ts) AS tts
        |  FROM events WHERE event_type IN ('click', 'view', 'signup')),
        |j AS (
        |  SELECT c.conv_id, t.touch_id, t.channel, c.v, t.tts
        |  FROM conv c JOIN touch t ON c.user_id = t.user_id
        |  WHERE t.tts < c.cts AND t.tts >= c.cts - 86400000000),
        |w AS (
        |  SELECT conv_id, touch_id, channel, v,
        |    count(*) OVER (PARTITION BY conv_id) AS n,
        |    row_number() OVER (PARTITION BY conv_id ORDER BY tts, touch_id) AS r
        |  FROM j)
        |SELECT channel, count(*) AS n_touches,
        |  CAST(sum(v // n + CASE WHEN r <= v % n THEN 1 ELSE 0 END) AS BIGINT)
        |    AS total_credit
        |FROM w GROUP BY channel""".stripMargin,
    "quality_profile" -> Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_orderpriority").map { c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_null,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS min_str,
           |  CAST(max($c) AS VARCHAR) AS max_str
           |FROM orders""".stripMargin
      }.mkString("\nUNION ALL\n"),
    "basket_rules" ->
      """WITH ti AS (
        |  SELECT DISTINCT l.l_orderkey AS t, p.p_brand AS i
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |ntxn AS (SELECT count(DISTINCT t) AS n FROM ti),
        |ic AS (SELECT i, count(*) AS n_item FROM ti GROUP BY i),
        |pairs AS (
        |  SELECT x.i AS a, y.i AS b, count(*) AS n_ab
        |  FROM ti x JOIN ti y ON x.t = y.t AND x.i < y.i
        |  GROUP BY x.i, y.i HAVING count(*) >= 20),
        |bo AS (
        |  SELECT a, b, n_ab FROM pairs
        |  UNION ALL SELECT b, a, n_ab FROM pairs)
        |SELECT bo.a, bo.b, n_ab, ia.n_item AS n_a, ib.n_item AS n_b,
        |  CAST(n_ab * 1000000 // ia.n_item AS BIGINT) AS conf_ppm,
        |  CAST(CAST(n_ab AS HUGEINT) * ntxn.n * 1000000
        |    // (CAST(ia.n_item AS HUGEINT) * ib.n_item) AS BIGINT) AS lift_x1e6
        |FROM bo
        |JOIN ic ia ON bo.a = ia.i
        |JOIN ic ib ON bo.b = ib.i
        |CROSS JOIN ntxn""".stripMargin,
    "quality_referential" -> ReferentialOracleSql,
    "intervals_peak" -> IntervalsPeakOracleSql,
    "sketch_join_size" -> {
      val P = graft.text.TextFunctions.P
      val rows = (0 until 4).map(j =>
        s"($j, ${graft.text.TextFunctions.MinhashA(j)}, ${graft.text.TextFunctions.MinhashB(j)})")
        .mkString(", ")
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split(text,' ')) AS word FROM documents),
         |ca AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM toks
         |       WHERE doc_id % 2 = 0 GROUP BY word),
         |cb AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM toks
         |       WHERE doc_id % 2 = 1 GROUP BY word),
         |ha AS (SELECT word, n,
         |  CAST(('0x' || substr(md5(word),1,14)) AS BIGINT) % $P AS h FROM ca),
         |hb AS (SELECT word, n,
         |  CAST(('0x' || substr(md5(word),1,14)) AS BIGINT) % $P AS h FROM cb),
         |sa AS (SELECT t.j, ((t.a * h + t.b) % $P) % 64 AS bucket, sum(n) AS c
         |       FROM ha CROSS JOIN (VALUES $rows) t(j, a, b) GROUP BY 1, 2),
         |sb AS (SELECT t.j, ((t.a * h + t.b) % $P) % 64 AS bucket, sum(n) AS c
         |       FROM hb CROSS JOIN (VALUES $rows) t(j, a, b) GROUP BY 1, 2),
         |ip AS (SELECT sa.j, sum(sa.c * sb.c) AS ip
         |       FROM sa JOIN sb ON sa.j = sb.j AND sa.bucket = sb.bucket
         |       GROUP BY sa.j),
         |est AS (SELECT CAST(min(ip) AS BIGINT) AS est_pairs FROM ip),
         |tr AS (SELECT CAST(sum(ca.n * cb.n) AS BIGINT) AS true_pairs
         |       FROM ca JOIN cb ON ca.word = cb.word)
         |SELECT est_pairs, true_pairs FROM est CROSS JOIN tr""".stripMargin
    },
    "window_ewma" -> {
      val terms = (0 until 16).map(j =>
        s"coalesce(lag(vc, $j) OVER tw, 0) * ${1L << (15 - j)}").mkString("\n        |    + ")
      s"""WITH v AS (
         |  SELECT event_id, user_id, ts,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
         |  FROM events),
         |w AS (
         |  SELECT event_id, user_id, vc,
         |    ($terms) AS x,
         |    count(vc) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS n
         |  FROM v
         |  WINDOW tw AS (PARTITION BY user_id ORDER BY ts, event_id))
         |SELECT event_id, user_id, vc AS v_cents, CAST(n AS BIGINT) AS ewma_n,
         |  CAST(x // (1 << (16 - n)) AS BIGINT) AS ewma_num
         |FROM w""".stripMargin
    },
    "sessionize_gaps" ->
      """WITH w AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER tw IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER tw) > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW tw AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM w)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, session_idx""".stripMargin,
    "pareto_frontier" ->
      """WITH t AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) AS x,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) * 1000 // n_chars AS y
        |  FROM documents)
        |SELECT doc_id, x AS frontier_x, y AS frontier_y FROM t r
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM t s
        |  WHERE s.x >= r.x AND s.y >= r.y AND (s.x > r.x OR s.y > r.y))""".stripMargin,
    "drift_block_diff" ->
      """WITH a AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS k, c_name,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal
        |  FROM customer),
        |b AS (
        |  SELECT k, c_name,
        |    bal + CASE WHEN k % 97 = 0 THEN 100 ELSE 0 END AS bal
        |  FROM a WHERE k % 101 <> 0
        |  UNION ALL
        |  SELECT k + 10000000, c_name, bal FROM a WHERE k % 500 = 0),
        |added AS (SELECT k, c_name, bal FROM b EXCEPT SELECT k, c_name, bal FROM a),
        |removed AS (SELECT k, c_name, bal FROM a EXCEPT SELECT k, c_name, bal FROM b)
        |SELECT CAST(k AS VARCHAR) AS key, 'added' AS direction FROM added
        |UNION ALL
        |SELECT CAST(k AS VARCHAR) AS key, 'removed' AS direction FROM removed""".stripMargin,
    "sketch_heavy_hitters" ->
      """WITH t AS (
        |  SELECT CAST(event_id & (-event_id) AS VARCHAR) AS lowbit FROM events),
        |c AS (SELECT lowbit, count(*) AS n_key FROM t GROUP BY lowbit),
        |tot AS (SELECT count(*) AS n_total FROM t)
        |SELECT lowbit, n_key, CAST(n_total AS BIGINT) AS n_total
        |FROM c CROSS JOIN tot WHERE n_key * 7 > n_total""".stripMargin,
    "analytics_retention" ->
      """WITH up AS (
        |  SELECT DISTINCT user_id AS u,
        |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS pd
        |  FROM events),
        |cohort AS (SELECT u, min(pd) AS cohort_pd FROM up GROUP BY u)
        |SELECT c.cohort_pd, up.pd - c.cohort_pd AS offset_pd,
        |  count(DISTINCT up.u) AS n_users
        |FROM up JOIN cohort c ON up.u = c.u
        |GROUP BY c.cohort_pd, up.pd - c.cohort_pd""".stripMargin,
    "analytics_target_encode" ->
      """WITH g AS (
        |  SELECT event_type AS cat, user_id % 5 AS fold,
        |    sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS fold_sum,
        |    count(*) AS fold_n
        |  FROM events GROUP BY event_type, user_id % 5),
        |t AS (
        |  SELECT cat, fold, fold_n, fold_sum,
        |    sum(fold_sum) OVER (PARTITION BY cat) AS tot_sum,
        |    sum(fold_n) OVER (PARTITION BY cat) AS tot_n
        |  FROM g)
        |SELECT cat, CAST(fold AS BIGINT) AS fold, fold_n,
        |  CAST(CASE WHEN tot_n > fold_n
        |       THEN (tot_sum - fold_sum) // (tot_n - fold_n) END AS BIGINT) AS oof_enc
        |FROM t""".stripMargin,
    "analytics_rolling_anomaly" ->
      """WITH v AS (
        |  SELECT event_id, user_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_cents, ts
        |  FROM events),
        |w AS (
        |  SELECT event_id, user_id, v_cents,
        |    sum(v_cents) OVER tw AS s,
        |    sum(v_cents * v_cents) OVER tw AS q,
        |    count(v_cents) OVER tw AS c
        |  FROM v
        |  WINDOW tw AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id, v_cents,
        |  CASE WHEN c < 5 THEN NULL
        |       ELSE (c * v_cents - s) * (c * v_cents - s) >
        |            9 * (c * q - s * s) END AS is_anomaly
        |FROM w""".stripMargin,
    "analytics_quantile_bins" ->
      """WITH v AS (
        |  SELECT event_type AS g,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
        |    event_id
        |  FROM events),
        |b AS (
        |  SELECT g, v,
        |    CAST(ntile(8) OVER (PARTITION BY g ORDER BY v, event_id) AS BIGINT) AS bin
        |  FROM v)
        |SELECT g, bin, count(*) AS n, min(v) AS lo, max(v) AS hi
        |FROM b GROUP BY g, bin""".stripMargin,
    "analytics_tvd_drift" ->
      """WITH binned AS (
        |  SELECT n_chars // 100 AS bin,
        |    CAST(substr(source, 4) AS INT) % 2 = 0 AS is_a
        |  FROM documents),
        |totals AS (SELECT is_a, count(*) AS n FROM binned GROUP BY is_a),
        |masses AS (
        |  SELECT b.bin,
        |    CASE WHEN b.is_a THEN c * 1000000 // n ELSE 0 END AS pa,
        |    CASE WHEN NOT b.is_a THEN c * 1000000 // n ELSE 0 END AS pb,
        |    CASE WHEN b.is_a THEN 1 ELSE 0 END AS na_bin,
        |    CASE WHEN NOT b.is_a THEN 1 ELSE 0 END AS nb_bin
        |  FROM (SELECT bin, is_a, count(*) AS c FROM binned GROUP BY bin, is_a) b
        |  JOIN totals t ON b.is_a = t.is_a),
        |perbin AS (
        |  SELECT bin, sum(pa) AS pa, sum(pb) AS pb,
        |    max(na_bin) AS na_bin, max(nb_bin) AS nb_bin
        |  FROM masses GROUP BY bin)
        |SELECT CAST(sum(na_bin) AS BIGINT) AS n_bins_a,
        |  CAST(sum(nb_bin) AS BIGINT) AS n_bins_b,
        |  CAST(sum(abs(pa - pb)) // 2 AS BIGINT) AS tvd_ppm
        |FROM perbin""".stripMargin,
    "analytics_token_budget" ->
      """WITH s AS (
        |  SELECT source, sum(len(string_split(text, ' '))) AS tokens
        |  FROM documents GROUP BY source),
        |w AS (SELECT source, tokens,
        |        CAST(floor(sqrt(tokens)) AS BIGINT) AS w FROM s),
        |tot AS (SELECT sum(w) AS total_w FROM w)
        |SELECT source, CAST(tokens AS BIGINT) AS tokens,
        |  CAST(1000000 * w // total_w AS BIGINT) AS alloc_tokens,
        |  CAST((1000000 * w // total_w) * 1000000 // tokens AS BIGINT) AS epochs_ppm
        |FROM w CROSS JOIN tot""".stripMargin,
  )
}
