package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.StringFunctions
import graft.similarity.Similarity

/** Scalar-function / extra window / vector-aggregation battery
  * (SURVEY §2.3 transforms, §2.6 windows; vector agg is an LLM-pipeline
  * extension).
  */
object FunctionQueries {

  /** ARN synthesis + parse-back + DNS normalization + composite ids
    * (reference: resourcegroupstaggingapi.py:32-130, route53.py:44-240). */
  def funcArnParse(spark: SparkSession, dir: String): DataFrame = {
    val arn = concat(lit("arn:aws:compute:eu-1:acct"), col("p_partkey") % 5,
      lit(":instance/i-"), col("p_partkey"))
    Tables.part(spark, dir).select(
      col("p_partkey").as("id"),
      arn.as("arn"),
      StringFunctions.arnService(arn).as("service"),
      StringFunctions.arnAccount(arn).as("account"),
      StringFunctions.arnResourceType(arn).as("resource_type"),
      StringFunctions.arnShortId(arn).as("short_id"),
      StringFunctions.normalizeDns(
        concat(upper(col("p_name")), lit(".Example.COM."))).as("dns"),
      StringFunctions.compositeId(col("p_brand"), col("p_type"),
        col("p_partkey")).as("composite_id"))
  }

  /** Date/time casts (reference util.py:855-907, 1130-1174): epoch
    * seconds, parts, formatted strings. */
  def funcDateCasts(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_orderkey").as("id"),
      StringFunctions.toEpoch(col("o_orderdate")).as("epoch_s"),
      year(col("o_orderdate")).cast("long").as("y"),
      month(col("o_orderdate")).cast("long").as("m"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("day_str"))

  /** lag/lead/rank windows over the event stream (free in Spark; the
    * reference has none — SURVEY §2.6). */
  def windowLagLead(spark: SparkSession, dir: String): DataFrame = {
    val wSeq = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wVal = Window.partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id"))
    Tables.events(spark, dir).select(
      col("event_id"), col("user_id"), col("value"),
      lag(col("value"), 1).over(wSeq).as("prev_value"),
      lead(col("value"), 1).over(wSeq).as("next_value"),
      rank().over(wVal).cast("long").as("value_rank"))
  }

  /** Corpus term statistics: term frequency + document frequency — the
    * vocabulary profile a quality/dedup pipeline starts from. */
  def textTermFreq(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))

  /** Per-label centroid of quantized embeddings, per dimension — the
    * vector aggregation under IVF-style clustering. posexplode keeps the
    * aggregation integer-exact and fully distributed. */
  def embedLabelCentroid(spark: SparkSession, dir: String): DataFrame =
    Similarity.quantized(Tables.embeddings(spark, dir))
      .join(Tables.embeddings(spark, dir).select(col("vec_id"), col("label")), "vec_id")
      .select(col("label"), posexplode(col("q")).as(Seq("pos", "qx")))
      .groupBy(col("label"), (col("pos") + 1).as("dim"))
      .agg(floor(lit(1000000.0) * sum(col("qx")) / count(lit(1))).cast("long")
        .as("centroid_x1e6"))
      .select(col("label").cast("long").as("label"), col("dim").cast("long").as("dim"),
        col("centroid_x1e6"))

  /** Gap filling: per-user hourly grid over the first 3 days, hourly
    * value sums forward-filled across empty hours
    * ([[graft.operators.Temporal.forwardFill]] — the time-series
    * resampling step of feature preparation). */
  def windowForwardFill(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val users = ev.select(col("user_id")).distinct()
    // .limit(72) is a no-op (3 days x 24 h) that bakes the constant grid
    // bound into maxRows so the plan sweep can prove the cross side tiny
    val grid = users.crossJoin(
      spark.range(1).select(explode(expr(
        "sequence(timestamp'2024-01-01 00:00:00', " +
          "timestamp'2024-01-03 23:00:00', interval 1 hour)")).as("hour"))
        .limit(72))
    val obs = ev.groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .agg(sum(col("value").cast("decimal(18,6)")).cast("double").as("value_filled"))
    graft.operators.Temporal.forwardFill(grid, obs, Seq("user_id"), "hour",
      Seq("value_filled"))
  }

  /** Per-group global rank + running sum where the groups are FEW and
    * data-sized (5 order priorities over every order) — the degenerate
    * case where a plain per-group window serializes 1/5th of the data
    * through one task. Runs through the GROUPED
    * [[graft.operators.GlobalOrder]] prefix-sum: per-group exact-min/max
    * bucketing, every window in the plan no wider than one bucket of
    * one group. Every 500th rank keeps the output bounded. */
  def windowGroupRank(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      col("o_orderpriority").as("grp"),
      col("o_orderkey").cast("long").as("okey"),
      floor(col("o_totalprice") * 100).cast("long").as("cents"))
    // skew note: the key (total price in cents) spans ~10^7 distinct
    // values near-uniformly — no single price concentrates a bucket;
    // this gate intentionally exercises the grouped UNIFORM path (the
    // skew-prebinned path has its own gate below)
    graft.operators.GlobalOrder.withRunningAggs(o,
        col("cents"), Seq(col("okey").asc),
        sums = Seq((col("cents"), "run_cents")), rankName = Some("rk"),
        groupCols = Seq(col("grp")))
      .filter(col("rk") % 500 === 0)
      .orderBy(col("grp"), col("rk"))
  }

  /** Global rank + running sum over a 50-distinct-value key (l_quantity
    * — every key a data-sized tie run, the equal-width bucketing's
    * worst case) through the SKEW-prebinned
    * [[graft.operators.GlobalOrder.withRunningAggsSkew]]: exact
    * equal-count buckets from the key census, each hot key split
    * across buckets by its line-id tie ranges. Every 20000th rank
    * keeps the output bounded. */
  def windowSkewRank(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(
      col("l_quantity").cast("long").as("qty"),
      (col("l_orderkey").cast("long") * 10 + col("l_linenumber")).as("lid"),
      floor(col("l_extendedprice") * 100).cast("long").as("cents"))
    graft.operators.GlobalOrder.withRunningAggsSkew(li,
        col("qty"), col("lid"),
        sums = Seq((col("cents"), "run_cents")), rankName = Some("rk"))
      .filter(col("rk") % 20000 === 0)
      .orderBy(col("rk"))
  }

  /** Super-aggregate breadth: ROLLUP over (lang, source) — per-slice,
    * per-lang, and grand-total rows in one pass. */
  def corpusRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .rollup(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars").cast("long")).as("n_chars_sum"))

  /** Crosstab: doc counts per lang pivoted over the source columns (an
    * explicit value list keeps the output schema deterministic). */
  def corpusPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("lang"))
      .pivot("source", (0 until 20).map("src" + _))
      .agg(count(lit(1)))
      .na.fill(0L)

  /** GROUPING SETS breadth: independent per-lang and per-source rollups
    * plus the grand total in one pass, with grouping() flags to tell the
    * strata apart (the third super-aggregate shape next to ROLLUP and
    * pivot). */
  def corpusGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir).createOrReplaceTempView("documents_gsets")
    spark.sql(
      """SELECT lang, source, count(*) AS n_docs,
        |  CAST(grouping(lang) AS BIGINT) AS g_lang,
        |  CAST(grouping(source) AS BIGINT) AS g_source
        |FROM documents_gsets
        |GROUP BY GROUPING SETS ((lang), (source), ())""".stripMargin)
  }

  /** Ordered conversion funnel over the event stream: first view, first
    * click at-or-after it, first purchase at-or-after that
    * ([[graft.operators.Funnel]] — per-stage filtered scans joined on the
    * key, no global window). */
  def funnel3Step(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.funnel(
      Tables.events(spark, dir), "user_id", "ts",
      Seq("first_view" -> (col("event_type") === "view"),
        "first_click" -> (col("event_type") === "click"),
        "first_purchase" -> (col("event_type") === "purchase")))

  /** Time-to-convert quantiles: exact p25/p50/p90 of the view->purchase
    * delay (microseconds) over completed funnels - the conversion-SLA
    * read, on the distributed exact-quantile pass. */
  def funnelTimeQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val f = graft.operators.Funnel.funnel(
      Tables.events(spark, dir), "user_id", "ts",
      Seq("first_view" -> (col("event_type") === "view"),
        "first_purchase" -> (col("event_type") === "purchase")))
      .filter(col("first_purchase").isNotNull)
      .select((expr("unix_micros(first_purchase)") -
        expr("unix_micros(first_view)")).as("delay_us"))
    graft.operators.Analytics.exactQuantiles(f, col("delay_us"),
      Seq(250000L, 500000L, 900000L)).orderBy(col("q_ppm"))
  }

  /** Degree histogram of the part co-purchase graph — the degree
    * distribution census of webgraph curation (spam farms and hubs both
    * announce themselves here before any expensive centrality pass). */
  def graphDegreeStats(spark: SparkSession, dir: String): DataFrame = {
    val e = graft.graph.Centrality.coOccurrenceEdges(
      Tables.lineitem(spark, dir), "l_orderkey", "l_partkey")
    // explode both endpoints in-row: one scan of the edge build instead
    // of a union that evaluates the co-occurrence plan twice
    e.select(explode(array(col("src"), col("dst"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
  }

  /** Degree-assortativity moments over the same co-occurrence graph:
    * the exact integer Pearson components (the one float division is
    * the consumer's); gate casts the decimal sums to BIGINT — they fit
    * comfortably at any tested SF. */
  def graphAssortativity(spark: SparkSession, dir: String): DataFrame = {
    val e = graft.graph.Centrality.coOccurrenceEdges(
      Tables.lineitem(spark, dir), "l_orderkey", "l_partkey")
    graft.graph.Centrality.degreeAssortativityMoments(e)
      .select(col("m"),
        col("sum_x").cast("long").as("sum_x"),
        col("sum_y").cast("long").as("sum_y"),
        col("sum_xy").cast("long").as("sum_xy"),
        col("sum_x2").cast("long").as("sum_x2"),
        col("sum_y2").cast("long").as("sum_y2"))
  }

  /** CUBE over (lang, source): all four grouping combinations in one
    * pass — completes the super-aggregate quartet (rollup, pivot,
    * grouping sets, cube). */
  def corpusCube(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .cube(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars").cast("long")).as("n_chars_sum"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_grouping_sets" -> (corpusGroupingSets _),
    "corpus_cube" -> (corpusCube _),
    "funnel_3step" -> (funnel3Step _),
    "funnel_time_quantiles" -> (funnelTimeQuantiles _),
    "graph_degree_stats" -> (graphDegreeStats _),
    "graph_assortativity" -> (graphAssortativity _),
    "func_arn_parse" -> (funcArnParse _),
    "func_date_casts" -> (funcDateCasts _),
    "window_lag_lead" -> (windowLagLead _),
    "window_forward_fill" -> (windowForwardFill _),
    "window_group_rank" -> (windowGroupRank _),
    "window_skew_rank" -> (windowSkewRank _),
    "corpus_rollup" -> (corpusRollup _),
    "corpus_pivot" -> (corpusPivot _),
    "text_term_freq" -> (textTermFreq _),
    "embed_label_centroid" -> (embedLabelCentroid _),
  )

  val oracles: Map[String, String] = Map(
    "corpus_cube" ->
      """SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars_sum
        |FROM documents GROUP BY CUBE (lang, source)""".stripMargin,
    "funnel_time_quantiles" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS first_view FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS first_purchase
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= v.first_view
        |  GROUP BY e.user_id),
        |d AS (SELECT epoch_us(p.first_purchase) - epoch_us(v.first_view)
        |    AS delay_us
        |  FROM v JOIN p ON v.user_id = p.user_id),
        |r AS (SELECT delay_us AS value,
        |    CAST(row_number() OVER (ORDER BY delay_us) AS BIGINT) AS rank
        |  FROM d),
        |n AS (SELECT count(*) AS n_rows FROM d),
        |q(q_ppm) AS (VALUES (250000), (500000), (900000))
        |SELECT CAST(q.q_ppm AS BIGINT) AS q_ppm, r.value, r.rank,
        |  CAST(n.n_rows AS BIGINT) AS n_rows
        |FROM r, n, q
        |WHERE r.rank = greatest(1, (q.q_ppm * n.n_rows + 999999) // 1000000)
        |ORDER BY q_ppm""".stripMargin,
    "funnel_3step" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS first_view FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS first_click
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= v.first_view
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS first_purchase
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= c.first_click
        |  GROUP BY e.user_id)
        |SELECT v.user_id, v.first_view, c.first_click, p.first_purchase
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |       LEFT JOIN p ON v.user_id = p.user_id""".stripMargin,
    "graph_degree_stats" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (
        |  SELECT DISTINCT x.p AS a, y.p AS b
        |  FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
        |deg AS (
        |  SELECT node, count(*) AS degree FROM (
        |    SELECT a AS node FROM e UNION ALL SELECT b FROM e) u
        |  GROUP BY node)
        |SELECT CAST(degree AS BIGINT) AS degree, count(*) AS n_nodes
        |FROM deg GROUP BY degree""".stripMargin,
    "graph_assortativity" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (
        |  SELECT DISTINCT x.p AS a, y.p AS b
        |  FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
        |sym AS (SELECT a AS src, b AS dst FROM e
        |        UNION ALL SELECT b, a FROM e),
        |deg AS (SELECT src AS node, count(*) AS d FROM sym GROUP BY src)
        |SELECT count(*) AS m,
        |  CAST(SUM(dx.d) AS BIGINT) AS sum_x,
        |  CAST(SUM(dy.d) AS BIGINT) AS sum_y,
        |  CAST(SUM(dx.d * dy.d) AS BIGINT) AS sum_xy,
        |  CAST(SUM(dx.d * dx.d) AS BIGINT) AS sum_x2,
        |  CAST(SUM(dy.d * dy.d) AS BIGINT) AS sum_y2
        |FROM sym s
        |JOIN deg dx ON s.src = dx.node
        |JOIN deg dy ON s.dst = dy.node""".stripMargin,
    "corpus_grouping_sets" ->
      """SELECT lang, source, count(*) AS n_docs,
        |  CAST(grouping(lang) AS BIGINT) AS g_lang,
        |  CAST(grouping(source) AS BIGINT) AS g_source
        |FROM documents
        |GROUP BY GROUPING SETS ((lang), (source), ())""".stripMargin,
    "window_group_rank" ->
      """WITH o AS (SELECT o_orderpriority AS grp,
        |    CAST(o_orderkey AS BIGINT) AS okey,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |w AS (SELECT grp, okey, cents,
        |    CAST(row_number() OVER (PARTITION BY grp ORDER BY cents, okey)
        |      AS BIGINT) AS rk,
        |    sum(cents) OVER (PARTITION BY grp ORDER BY cents, okey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_cents
        |  FROM o)
        |SELECT grp, okey, cents, CAST(run_cents AS BIGINT) AS run_cents, rk
        |FROM w WHERE rk % 500 = 0 ORDER BY grp, rk""".stripMargin,
    "window_skew_rank" ->
      """WITH li AS (SELECT CAST(l_quantity AS BIGINT) AS qty,
        |    CAST(l_orderkey AS BIGINT) * 10 + l_linenumber AS lid,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem),
        |w AS (SELECT qty, lid, cents,
        |    CAST(row_number() OVER (ORDER BY qty, lid) AS BIGINT) AS rk,
        |    sum(cents) OVER (ORDER BY qty, lid
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_cents
        |  FROM li)
        |SELECT qty, lid, cents, CAST(run_cents AS BIGINT) AS run_cents, rk
        |FROM w WHERE rk % 20000 = 0 ORDER BY rk""".stripMargin,
    "window_forward_fill" ->
      """WITH hours AS (
        |  SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
        |    TIMESTAMP '2024-01-03 23:00:00', INTERVAL 1 HOUR)) AS hour),
        |users AS (SELECT DISTINCT user_id FROM events),
        |grid AS (SELECT u.user_id, h.hour FROM users u CROSS JOIN hours h),
        |obs AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hour,
        |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
        |  FROM events GROUP BY 1, 2)
        |SELECT g.user_id, g.hour,
        |  last_value(o.v IGNORE NULLS) OVER (PARTITION BY g.user_id
        |    ORDER BY g.hour
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled
        |FROM grid g LEFT JOIN obs o
        |  ON g.user_id = o.user_id AND g.hour = o.hour""".stripMargin,
    "corpus_rollup" ->
      """SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars_sum
        |FROM documents GROUP BY ROLLUP (lang, source)""".stripMargin,
    "corpus_pivot" -> {
      val cols = (0 until 20).map(i =>
        s"CAST(count(CASE WHEN source = 'src$i' THEN 1 END) AS BIGINT) AS src$i")
        .mkString(",\n|  ")
      s"""SELECT lang,
         |  $cols
         |FROM documents GROUP BY lang""".stripMargin
    },
    "func_arn_parse" ->
      """WITH t AS (
        |  SELECT p_partkey, p_name, p_brand, p_type,
        |    'arn:aws:compute:eu-1:acct' || CAST(p_partkey % 5 AS VARCHAR)
        |      || ':instance/i-' || CAST(p_partkey AS VARCHAR) AS arn
        |  FROM part)
        |SELECT CAST(p_partkey AS BIGINT) AS id, arn,
        |  string_split(arn, ':')[3] AS service,
        |  string_split(arn, ':')[5] AS account,
        |  regexp_extract(arn, '^arn:[^:]*:[^:]*:[^:]*:[^:]*:([^:/]+)[:/]', 1) AS resource_type,
        |  CASE WHEN contains(string_split(arn, ':')[-1], '/')
        |       THEN string_split(string_split(arn, ':')[-1], '/')[-1]
        |       ELSE string_split(arn, ':')[-1] END AS short_id,
        |  lower(regexp_replace(upper(p_name) || '.Example.COM.', '\.$', '')) AS dns,
        |  p_brand || '/' || p_type || '/' || CAST(p_partkey AS VARCHAR) AS composite_id
        |FROM t""".stripMargin,
    "func_date_casts" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS id,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        |  CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  strftime(o_orderdate, '%Y-%m-%d') AS day_str
        |FROM orders""".stripMargin,
    "window_lag_lead" ->
      """SELECT event_id, user_id, value,
        |  lag(value, 1) OVER ws AS prev_value,
        |  lead(value, 1) OVER ws AS next_value,
        |  CAST(rank() OVER wv AS BIGINT) AS value_rank
        |FROM events
        |WINDOW ws AS (PARTITION BY user_id ORDER BY ts, event_id),
        |       wv AS (PARTITION BY user_id ORDER BY value DESC, event_id)""".stripMargin,
    "text_term_freq" ->
      """SELECT word, count(*) AS tf, count(DISTINCT doc_id) AS df
        |FROM (SELECT doc_id, unnest(string_split(text,' ')) AS word FROM documents)
        |GROUP BY word""".stripMargin,
    "embed_label_centroid" ->
      """WITH q AS (
        |  SELECT CAST(label AS BIGINT) AS label,
        |    CAST(floor(CAST(unnest(embedding) AS DOUBLE)*1000) AS BIGINT) AS qx,
        |    CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim
        |  FROM embeddings)
        |SELECT label, dim,
        |  CAST(floor(1000000.0 * sum(qx) / count(*)) AS BIGINT) AS centroid_x1e6
        |FROM q GROUP BY label, dim""".stripMargin,
  )
}
