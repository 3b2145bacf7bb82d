package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.graph.{Centrality, Paths}
import graft.operators.{Analytics, Changelog, Spatial, Temporal}
import graft.similarity.Similarity
import graft.text.{Sketches, TextFunctions}
import graft.Lineage._

/** Round-7 fourth-session battery: path structure (s–t betweenness,
  * DAG layering, bipartite projection), exact-integer statistics
  * (chi², Gini), KMV set-operation estimates, postings-join cosine,
  * Heaps-law vocabulary growth, and grid-bucketed spatial nearest.
  *
  * Graph gates run on the deterministic binary-ancestry graph the
  * path_counts/WL gates established: customers are nodes, `k div 2 → k`
  * and `k div 4 → k` are edges (every edge goes binary-prefix ancestor
  * → descendant, so the graph doubles as a DAG for the layering gate).
  */
object AdvancedQueries {

  /** The shared ancestor graph: k div 2 → k (k ≥ 2) ∪ k div 4 → k (k ≥ 4). */
  private def ancestryEdges(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey").cast("long").as("k"))
    c.filter(col("k") >= 2L)
      .select(expr("k div 2").as("src"), col("k").as("dst"))
      .unionByName(c.filter(col("k") >= 4L)
        .select(expr("k div 4").as("src"), col("k").as("dst")))
  }

  private val AncestryEdgesSql =
    """c AS (SELECT CAST(c_custkey AS BIGINT) AS k FROM customer),
      |e AS MATERIALIZED (
      |  SELECT k // 2 AS src, k AS dst FROM c WHERE k >= 2
      |  UNION ALL
      |  SELECT k // 4, k FROM c WHERE k >= 4)""".stripMargin

  /** 3-gram shingle occurrences (doc_id, term) — zip_with over shifted
    * slices (linear; never element_at over a recomputed array). */
  private def shingleTerms(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id").cast("long").as("doc_id"),
        TextFunctions.tokens(col("text")).as("a"))
      .select(col("doc_id"), explode(expr(
        """zip_with(
          |  zip_with(slice(a, 1, greatest(size(a) - 2, 0)),
          |           slice(a, 2, greatest(size(a) - 2, 0)),
          |           (x, y) -> concat(x, '_', y)),
          |  slice(a, 3, greatest(size(a) - 2, 0)),
          |  (xy, z) -> concat(xy, '_', z))""".stripMargin)).as("term"))

  private val ShingleTermsSql =
    """t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |dt AS MATERIALIZED (
      |  SELECT doc_id, unnest(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
      |    i -> toks[i] || '_' || toks[i+1] || '_' || toks[i+2])) AS term
      |  FROM t)""".stripMargin

  // ---------------------------------------------------------------- graph

  /** Count of shortest 1→1000 paths through each node of the ancestry
    * graph — Brandes' pair-dependency numerator, exact integers. */
  def betweennessSt(spark: SparkSession, dir: String): DataFrame =
    Paths.stBetweenness(ancestryEdges(spark, dir), s = 1L, t = 1000L, maxDepth = 12)
      .orderBy(col("node"))

  /** Critical-path layering of the ancestry DAG. */
  def topoLevels(spark: SparkSession, dir: String): DataFrame =
    Paths.topoLevelsLifted(ancestryEdges(spark, dir), maxDepth = 25)
      .orderBy(col("node"))

  /** Part co-purchase graph: parts sharing >= 2 orders. */
  def bipartitePartPairs(spark: SparkSession, dir: String): DataFrame =
    Paths.bipartiteProject(
      Tables.lineitem(spark, dir).select(col("l_orderkey").as("l"),
        col("l_partkey").cast("long").as("r")),
      leftCol = "l", rightCol = "r", minShared = 2L, maxDegree = 32)
      .orderBy(col("r_a"), col("r_b"))

  // ------------------------------------------------------------ analytics

  /** Chi² independence cells: market segment × (nationkey mod 5). */
  def chi2Segments(spark: SparkSession, dir: String): DataFrame =
    Analytics.chiSquareCells(Tables.customer(spark, dir),
        col("c_mktsegment"), pmod(col("c_nationkey"), lit(5)).cast("long"))
      .orderBy(col("rk"), col("ck"))

  /** Order-value concentration per priority class (Gini, exact ppm). */
  def giniOrderValue(spark: SparkSession, dir: String): DataFrame =
    Analytics.giniByGroup(Tables.orders(spark, dir),
        col("o_orderpriority"),
        floor(col("o_totalprice") * 100).cast("long"),
        col("o_orderkey"))
      .orderBy(col("g"))

  /** KMV union/intersection estimate: customer keys vs ordering keys. */
  def kmvSetOps(spark: SparkSession, dir: String): DataFrame =
    Sketches.kmvSetOps(
      Tables.customer(spark, dir).select(col("c_custkey").as("v")),
      Tables.orders(spark, dir).select(col("o_custkey").as("v")),
      valueCol = "v", k = 64)

  // --------------------------------------------------- privacy / linkage

  /** t-closeness release audit over customers: quasi-identifier classes
    * (segment, nation mod 4) whose phone-country-code distribution sits
    * > 25% total-variation from the table-wide one. */
  def privacyTCloseness(spark: SparkSession, dir: String): DataFrame =
    graft.stats.DataQuality.tClosenessViolations(
      Tables.customer(spark, dir).select(
        col("c_mktsegment").as("seg"),
        (col("c_nationkey") % 4).cast("long").as("nk"),
        (floor(col("c_acctbal") * 100).cast("long") % 25).as("cc")),
      Seq("seg", "nk"), "cc", tPpm = 250000L)
      .orderBy(col("seg"), col("nk"))

  /** Labeled record-linkage pairs from the customer table: each record
    * paired with a perturbed duplicate (match — every 4th name truncated
    * past the edit-distance gate, every 5th segment swapped) and with its
    * neighbor record (non-match). Agreement vector = (name edit distance
    * ≤ 2, segment equal, balance-derived code equal); balance-cent strings
    * stand in for names because this corpus's names differ only in
    * digits. */
  private def fsLabeledPairs(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(
      col("c_custkey").cast("long").as("k"),
      floor(col("c_acctbal") * 100).cast("long").cast("string").as("name"),
      col("c_mktsegment").as("seg"),
      (floor(col("c_acctbal") * 100).cast("long") % 25).as("cc"))
    val dup = c.select(col("k"),
      when(col("k") % 4 === 0,
          substring(col("name"), 1, 3))
        .otherwise(col("name")).as("name2"),
      when(col("k") % 5 === 0, lit("OTHER")).otherwise(col("seg")).as("seg2"),
      col("cc").as("cc2"))
    val matches = c.join(dup, Seq("k")).withColumn("is_match", lit(true))
    val next = c.select((col("k") - 1).as("k"), col("name").as("name2"),
      col("seg").as("seg2"), col("cc").as("cc2"))
    val unmatches = c.join(next, Seq("k")).withColumn("is_match", lit(false))
    matches.unionByName(unmatches)
      .select(col("k"), col("is_match"),
        (levenshtein(col("name"), col("name2")) <= 2).as("name_agree"),
        (col("seg") === col("seg2")).as("seg_agree"),
        (col("cc") === col("cc2")).as("cc_agree"))
  }

  private val FsAgree = Seq("name_agree", "seg_agree", "cc_agree")

  /** Fellegi–Sunter agreement-pattern table with exact ppm likelihood
    * ratios ([[graft.operators.EntityResolution.patternTable]]). */
  def erFellegiSunter(spark: SparkSession, dir: String): DataFrame =
    graft.operators.EntityResolution
      .patternTable(fsLabeledPairs(spark, dir), FsAgree, "is_match")
      .orderBy(FsAgree.map(col): _*)

  /** Three-way FS decisions over the same candidate pairs: per decision,
    * pair count and how many are true matches (the clerical-review
    * queue's precision read-out). */
  def erFsClassify(spark: SparkSession, dir: String): DataFrame = {
    val pairs = fsLabeledPairs(spark, dir)
    val table = graft.operators.EntityResolution
      .patternTable(pairs, FsAgree, "is_match")
    graft.operators.EntityResolution
      .classify(pairs, table, FsAgree, lowerPpm = 100000L, upperPpm = 10000000L)
      .groupBy(col("decision"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("is_match"), 1L).otherwise(0L)).as("n_true_match"))
      .orderBy(col("decision"))
  }

  /** K4 census over 5-clique blocks of customers plus a cross-block
    * chain (which adds no K4): blocks of five contribute C(5,4) each. */
  def graphK4(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_custkey").cast("long").as("k"))
    val blockPairs = c.as("a").join(c.as("b"),
        expr("(a.k div 5) = (b.k div 5)") && col("a.k") < col("b.k"))
      .select(col("a.k").as("src"), col("b.k").as("dst"))
    val chain = c.select(col("k").as("src"), (col("k") + 5).as("dst"))
      .join(c.select(col("k").as("dst")), Seq("dst"), "left_semi")
    graft.graph.Centrality.cliqueCensusK4(blockPairs.unionByName(chain))
  }


  /** Multi-touch attribution over the events stream: click/view/signup
    * touches credit their next purchase within 3 days under all four
    * standard models at once, exact ppm shares
    * ([[graft.operators.Attribution.multiTouch]]). */
  def attributionMultiTouch(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val touches = ev.filter(col("event_type").isin("click", "view", "signup"))
      .select(col("user_id"), col("event_id").as("touch_id"),
        col("event_type").as("channel"), expr("unix_micros(ts)").as("ts"))
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("conv_id"),
        expr("unix_micros(ts)").as("ts"),
        coalesce(floor(col("value") * 100).cast("long"), lit(0L)).as("value_cents"))
    graft.operators.Attribution
      .multiTouch(touches, conv, lookbackSec = 3L * 86400L * 1000000L)
      .orderBy(col("model"), col("channel"))
  }

  /** Allen interval-relation census between two order-interval samples
    * ([[graft.operators.Temporal.allenCensus]]): disjoint relations by
    * order statistics, contact relations by the bucketed join. */
  def allenCensusGate(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      col("o_orderkey").cast("long").as("k"),
      datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))
        .cast("long").as("d"))
    def iv(df: DataFrame) = df.select(col("d").as("s"),
      (col("d") + col("k") % 20 + 1).as("e"))
    Temporal.allenCensus(
      iv(o.filter(col("k") % 40 === 1)), iv(o.filter(col("k") % 40 === 2)),
      bucketSeconds = 32L)
      .orderBy(col("relation"))
  }

  // ------------------------------------------------------------------ text

  /** Top-50 most cosine-similar document pairs via the shingle postings
    * join (exact cos² in ppm, df-capped index). */
  def cosinePostings(spark: SparkSession, dir: String): DataFrame = {
    val tf = shingleTerms(spark, dir)
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    TextFunctions.cosinePostingsTopK(tf, dfCap = 25L, k = 50)
  }

  /** Heaps-law shingle-vocabulary growth over hash-ordered deciles. */
  def vocabGrowth(spark: SparkSession, dir: String): DataFrame =
    TextFunctions.vocabGrowth(shingleTerms(spark, dir))
      .orderBy(col("decile"))

  // ------------------------------------------------------------------ join

  /** Nearest supplier within Euclidean radius 64 for every customer, on
    * deterministic key-derived coordinates in a 4096² grid. */
  def spatialGridNearest(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.customer(spark, dir).select(
      col("c_custkey").as("id"),
      expr("(c_custkey * 2654435761) % 4096").as("x"),
      expr("(c_custkey * 972663749) % 4096").as("y"))
    val r = Tables.supplier(spark, dir).select(
      col("s_suppkey").as("id"),
      expr("(s_suppkey * 1914874583) % 4096").as("x"),
      expr("(s_suppkey * 517419103) % 4096").as("y"))
    Spatial.gridNearest(l, r, radius = 64L, cell = 64L).orderBy(col("lid"))
  }

  /** Incremental equi-join maintenance: the orders⋈customer view updated
    * with order adds/removals and late customer arrivals via the
    * bilinear delta rule — result must equal the final-state join. */
  def incrementalJoin(spark: SparkSession, dir: String): DataFrame = {
    val ords = Tables.orders(spark, dir).select(
      col("o_custkey").as("custkey"), col("o_orderkey"), col("o_orderpriority"))
    val cust = Tables.customer(spark, dir).select(
      col("c_custkey").as("custkey"), col("c_mktsegment"))
    val aOld = ords.filter(col("o_orderkey") % 7 =!= 0)
    val bOld = cust.filter(col("custkey") % 10 =!= 0)
    val dA = ords.filter(col("o_orderkey") % 7 === 0).withColumn("mult", lit(1L))
      .unionByName(ords.filter(col("o_orderkey") % 7 =!= 0 &&
        col("o_orderkey") % 5 === 0).withColumn("mult", lit(-1L)))
    val dB = cust.filter(col("custkey") % 10 === 0).withColumn("mult", lit(1L))
    val view = aOld.join(bOld, Seq("custkey")).withColumn("mult", lit(1L))
    Changelog.maintainJoin(view, aOld, bOld, dA, dB, Seq("custkey"))
      .orderBy(col("o_orderkey"))
  }

  /** Subtree account-balance rollup over the binary customer forest. */
  def subtreeAgg(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey").cast("long").as("k"),
        floor(col("c_acctbal") * 100).cast("long").as("v"))
    val tree = c.filter(col("k") >= 2L)
      .select(expr("k div 2").as("src"), col("k").as("dst"))
    Paths.subtreeAggregateLifted(tree,
      c.select(col("k").as("node"), col("v").as("value")), maxDepth = 25)
      .orderBy(col("node"))
  }

  /** Reciprocity of the customer tree with back-edges planted on every
    * third child. */
  def reciprocityGate(spark: SparkSession, dir: String): DataFrame = {
    val tree = Tables.customer(spark, dir)
      .select(col("c_custkey").cast("long").as("k"))
      .filter(col("k") >= 2L)
      .select(expr("k div 2").as("src"), col("k").as("dst"))
    val back = tree.filter(col("dst") % 3 === 0)
      .select(col("dst").as("src"), col("src").as("dst"))
    Paths.reciprocity(tree.unionByName(back))
  }

  /** Zipf rank–frequency curve of the top-30 words. */
  def textZipf(spark: SparkSession, dir: String): DataFrame =
    TextFunctions.zipfRanks(
      Tables.documents(spark, dir).select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("term")), k = 30)

  /** Good–Turing frequency-of-frequencies over the 3-gram shingles
    * (the word vocabulary is synthetic-dense — every word repeats past
    * any small r — while shingles keep the singleton tail the estimator
    * reads): the r = 1 row's mass_ppm is the unseen-mass (coverage)
    * estimate p₀ × 10⁶. */
  def goodTuringGate(spark: SparkSession, dir: String): DataFrame =
    TextFunctions.goodTuring(shingleTerms(spark, dir), maxR = 12)
      .orderBy(col("r"))

  /** Newman modularity of the octal customer ancestry tree under the
    * div-64 block partition — blocks align with subtrees, so Q is
    * positive; the "is this clustering better than chance" read for
    * any community assignment, exact ppm. */
  def graphModularity(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey").cast("long").as("k"))
    val edges = c.filter(col("k") >= 8L)
      .select(expr("k div 8").as("src"), col("k").as("dst"))
    val asg = c.select(col("k").as("node"), expr("k div 64").as("community"))
    Centrality.modularity(edges, asg)
  }

  /** Rich-club curve of the octal tree + K5 ornaments at thresholds
    * 0/2/4/8 - do the high-degree nodes wire to each other. */
  def richClubGate(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey").cast("long").as("k"))
    val mx = c.agg(max(col("k")).as("mx"))
    val tree = c.filter(col("k") >= 8L)
      .select(expr("k div 8").as("src"), col("k").as("dst"))
    val offs = for (i <- 0 to 4; j <- (i + 1) to 4) yield (i, j)
    val clique = c.filter(col("k") % 100 === 0).crossJoin(broadcast(mx))
      .filter(col("k") + 4 <= col("mx"))
      .select(explode(array(offs.map { case (i, j) =>
        struct((col("k") + i).as("src"), (col("k") + j).as("dst"))
      }: _*)).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    Centrality.richClub(tree.unionByName(clique), Seq(0L, 2L, 4L, 8L))
      .orderBy(col("k"))
  }

  /** Weighted modularity of the octal tree under the div-64 partition,
    * edge weight = 1 + child mod 3 - the co-occurrence-count reading. */
  def modularityWeightedGate(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey").cast("long").as("k"))
    val edges = c.filter(col("k") >= 8L)
      .select(expr("k div 8").as("src"), col("k").as("dst"),
        (col("k") % 3 + 1).as("w"))
    val asg = c.select(col("k").as("node"), expr("k div 64").as("community"))
    Centrality.modularityWeighted(edges, asg, "w")
  }

  /** Per-community conductance of the octal tree's div-64 blocks —
    * which blocks leak edges across their boundary, exact ppm. */
  def graphConductance(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey").cast("long").as("k"))
    val edges = c.filter(col("k") >= 8L)
      .select(expr("k div 8").as("src"), col("k").as("dst"))
    val asg = c.select(col("k").as("node"), expr("k div 64").as("community"))
    Centrality.conductance(edges, asg).orderBy(col("community"))
  }

  /** Weighted per-community conductance of the octal tree's div-64
    * blocks, edge weight = 1 + child mod 3 — pairs the weighted cut
    * read with `graph_modularity_weighted`'s weighted cohesion read. */
  def conductanceWeightedGate(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey").cast("long").as("k"))
    val edges = c.filter(col("k") >= 8L)
      .select(expr("k div 8").as("src"), col("k").as("dst"),
        (col("k") % 3 + 1).as("w"))
    val asg = c.select(col("k").as("node"), expr("k div 64").as("community"))
    Centrality.conductanceWeighted(edges, asg, "w").orderBy(col("community"))
  }

  /** Exact global quantiles of line-item price cents — the data-sized
    * exact baseline for the quantile-histogram sketch, distributed via
    * GlobalOrder (no single-task sort). */
  def exactQuantilesGate(spark: SparkSession, dir: String): DataFrame =
    Analytics.exactQuantiles(Tables.lineitem(spark, dir),
      floor(col("l_extendedprice") * 100).cast("long"),
      Seq(10000L, 250000L, 500000L, 750000L, 990000L))
      .orderBy(col("q_ppm"))

  /** Hour-of-day seasonal index + residual noise per event type. */
  def seasonalDecompose(spark: SparkSession, dir: String): DataFrame =
    Analytics.seasonalDecompose(Tables.events(spark, dir),
        col("event_type"), hour(col("ts")),
        floor(col("value") * 100).cast("long"))
      .orderBy(col("g"), col("season"))

  /** Robust MAD outlier census of event values per type. */
  def madRobust(spark: SparkSession, dir: String): DataFrame =
    Analytics.madOutliers(Tables.events(spark, dir),
        col("event_type"), floor(col("value") * 100).cast("long"))
      .orderBy(col("g"))

  /** Benford first-digit screen over order totals (cents). */
  def benford(spark: SparkSession, dir: String): DataFrame =
    Analytics.benfordDeviation(Tables.orders(spark, dir),
        floor(col("o_totalprice") * 100).cast("long"))
      .orderBy(col("digit"))

  /** Per-document shingle novelty under the deterministic hash order —
    * the marginal-contribution dedup-prioritization signal. */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame =
    TextFunctions.ngramNovelty(shingleTerms(spark, dir))
      .orderBy(col("doc_id"))

  /** Matryoshka-truncation recall: brute-force top-3 on the first 32
    * quantized dims vs the full-dimension ground truth. */
  def matryoshkaRecall(spark: SparkSession, dir: String): DataFrame = {
    val full = Similarity.quantized(Tables.embeddings(spark, dir))
    val queries = full.filter(col("vec_id") < 10)
    val truth = Similarity.bruteForceTopK(queries, full, k = 3)
      .select(col("query_id"), col("neighbor_id")).pin
    val half = Similarity.truncated(full, dims = 32)
    val got = Similarity.bruteForceTopK(
        half.filter(col("vec_id") < 10), half, k = 3)
      .select(col("query_id"), col("neighbor_id"))
    val hit = truth.join(got, Seq("query_id", "neighbor_id"), "left_semi")
    truth.agg(count(lit(1)).as("n_truth"))
      .crossJoin(broadcast(hit.agg(count(lit(1)).as("n_hit"))))
      .select(col("n_truth"), col("n_hit"),
        expr("(1000000 * n_hit) div n_truth").as("recall_x1e6"))
  }

  /** Hourly OHLC value bars per event type. */
  def ohlc(spark: SparkSession, dir: String): DataFrame =
    Analytics.ohlcBars(Tables.events(spark, dir),
        col("event_type"), expr("unix_micros(ts) div 3600000000"),
        unix_micros(col("ts")), col("event_id"),
        floor(col("value") * 100).cast("long"))
      .orderBy(col("g"), col("bucket"))

  /** Percent-rank normalization of event values per type (exact ppm). */
  def rankNormalize(spark: SparkSession, dir: String): DataFrame =
    Analytics.rankNormalize(Tables.events(spark, dir),
        col("event_type"), floor(col("value") * 100).cast("long"),
        col("event_id"))
      .orderBy(col("g"), col("tie"))

  /** One-sided CUSUM burst detection over the hourly event-rate series:
    * target = global mean hourly count, S = P − runningMin(P) via two
    * GlobalOrder passes (the reset recurrence's closed form — no
    * sequential scan). The change-point read for feed monitoring. */
  def cusumGate(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
      .withColumn("hour_us", unix_micros(col("hour")))
    val tot = hourly.agg(sum(col("n")).as("_tot"), count(lit(1)).as("_nh"))
    val withTarget = hourly.crossJoin(broadcast(tot))
      .withColumn("target", expr("_tot div _nh")).drop("_tot", "_nh")
    Analytics.cusum(withTarget, col("hour_us"), Nil, col("n"), col("target"))
      .select(col("hour"), col("n"), col("cum_dev"), col("cusum"))
      .orderBy(col("hour"))
  }

  /** Seasonal-baseline CUSUM — the composition a monitoring deploy
    * actually runs: per-hour event counts, an hour-of-day baseline
    * census (24-row broadcast), then the GLOBAL-series CUSUM of the
    * residual against that per-row target. A diurnal corpus stays flat
    * under this detector where the global-mean CUSUM alarms every
    * evening peak. */
  def seasonalCusumGate(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
      .withColumn("hod", hour(col("hour")))
      .withColumn("hour_us", unix_micros(col("hour")))
    val seasonal = hourly.groupBy(col("hod"))
      .agg(expr("sum(n) div count(n)").as("baseline"))
    val joined = hourly.join(broadcast(seasonal), "hod")
    Analytics.cusum(joined, col("hour_us"), Nil, col("n"), col("baseline"))
      .select(col("hour"), col("n"), col("baseline"), col("cum_dev"),
        col("cusum"))
      .orderBy(col("hour"))
  }

  /** Per-source exact length quantiles (p25/p50/p90/p99) of document
    * char counts — per-tenant percentile reads with data-sized groups,
    * grouped-GlobalOrder-ranked (no per-group single-task sort). */
  def groupQuantilesGate(spark: SparkSession, dir: String): DataFrame =
    Analytics.exactQuantilesByGroup(Tables.documents(spark, dir),
        col("source"), col("n_chars"),
        Seq(250000L, 500000L, 900000L, 990000L))
      .orderBy(col("g"), col("q_ppm"))

  /** Chance-corrected agreement between each document's own language
    * label and its source's MODAL language (argmax by count desc, lang
    * asc) — "do per-doc labels agree with source-level majority beyond
    * chance", the annotator-agreement read in exact ppm. */
  def cohensKappaGate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("lang"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("c").desc, col("lang").asc)
    val modal = docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("source"), col("lang").as("modal_lang"))
    Analytics.cohensKappa(docs.join(modal, "source"),
      col("lang"), col("modal_lang"))
  }

  /** Kish effective sample size of a deterministic per-doc weighting,
    * per language — the collapsed-weights diagnostic that importance
    * weighting needs next to it. */
  def essGate(spark: SparkSession, dir: String): DataFrame =
    graft.text.Sampling.effectiveSampleSize(Tables.documents(spark, dir),
        col("lang"), col("doc_id") % 7 + 1)
      .orderBy(col("g"))

  /** Exact shingle-set Jaccard between document sources. */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val terms = Tables.documents(spark, dir)
      .select(col("source").as("g"), TextFunctions.tokens(col("text")).as("a"))
      .select(col("g"), explode(expr(
        """zip_with(
          |  zip_with(slice(a, 1, greatest(size(a) - 2, 0)),
          |           slice(a, 2, greatest(size(a) - 2, 0)),
          |           (x, y) -> concat(x, '_', y)),
          |  slice(a, 3, greatest(size(a) - 2, 0)),
          |  (xy, z) -> concat(xy, '_', z))""".stripMargin)).as("term"))
    TextFunctions.setOverlapPairs(terms).orderBy(col("g_a"), col("g_b"))
  }

  /** Pairwise Pearson corr² (ppm, signed) over small-scaled lineitem
    * measures — one scan builds the whole moment matrix. */
  def corrMatrix(spark: SparkSession, dir: String): DataFrame =
    Analytics.corrMatrix(Tables.lineitem(spark, dir), Seq(
        ("qty", col("l_quantity").cast("long")),
        ("disc_x1e3", floor(col("l_discount") * 1000).cast("long")),
        ("tax_x1e3", floor(col("l_tax") * 1000).cast("long"))))
      .orderBy(col("m_a"), col("m_b"))

  /** Validity-chain audit of per-user 30-minute activity leases (every
    * 97th lease left open to exercise the open-mid detector). */
  def scd2Audit(spark: SparkSession, dir: String): DataFrame = {
    val iv = Tables.events(spark, dir).select(col("user_id"),
        expr("unix_micros(ts) div 1000000").as("s"), col("event_id"))
      .withColumn("e", when(col("event_id") % 97 === 0, lit(null).cast("long"))
        .otherwise(col("s") + 1800L))
    Temporal.scd2Audit(iv.select(col("user_id"), col("s"), col("e")),
      Seq("user_id"), "s", "e").orderBy(col("user_id"))
  }

  /** Smooth weighted round-robin epoch schedule over document sources
    * (weights derived deterministically from the source name). */
  def mixtureSchedule(spark: SparkSession, dir: String): DataFrame =
    graft.text.Sampling.mixtureSchedule(
        Tables.documents(spark, dir).select(col("source").as("g"),
          col("doc_id").as("id"),
          (pmod(ascii(expr("right(source, 1)")), lit(3)) + 1).cast("long").as("w")))
      .orderBy(col("epoch_rank"))

  /** 10%-each-end trimmed mean of event value cents per event type -
    * the robust location estimate beside the MAD gate. */
  def trimmedMeanGate(spark: SparkSession, dir: String): DataFrame =
    Analytics.trimmedMean(Tables.events(spark, dir), col("event_type"),
      floor(col("value") * 100).cast("long"), trimPpm = 100000L)
      .orderBy(col("g"))

  /** Top-20 word leaderboard drift between the even- and odd-doc
    * halves of the corpus - entered/dropped/up/down/steady movement. */
  def topKDriftGate(spark: SparkSession, dir: String): DataFrame = {
    def words(parity: Int) = Tables.documents(spark, dir)
      .filter(col("doc_id") % 2 === parity)
      .select(explode(TextFunctions.tokens(col("text"))).as("w"))
    Analytics.topKDrift(words(0), words(1), col("w"), k = 20)
      .orderBy(col("cat"))
  }

  /** Inter-arrival burstiness per event type: CV-squared of the gap
    * series in exact ppm - 1e6 is the Poisson baseline. */
  def burstinessGate(spark: SparkSession, dir: String): DataFrame =
    Analytics.burstiness(Tables.events(spark, dir), Seq("event_type"),
      expr("unix_micros(ts)"), Seq(col("event_id").asc))
      .orderBy(col("event_type"))

  /** Token-budget packing census: documents packed contiguously into
    * 512-token bins under the canonical hash order; per-bin doc count,
    * token total, and fill ppm (oversized docs overfill visibly). */
  def tokenPacking(spark: SparkSession, dir: String): DataFrame =
    graft.text.Sampling.tokenPack(Tables.documents(spark, dir),
        "doc_id", "text", budgetTokens = 512L)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .withColumn("fill_ppm", expr("(n_tokens * 1000000) div 512"))
      .orderBy(col("bin"))

  /** Exact Mann-Whitney U (doubled) between odd- and even-user event
    * values - the rank-based shift test beside the KS gate; u2/u2_max
    * is the common-language effect size. */
  def mannWhitney(spark: SparkSession, dir: String): DataFrame =
    Analytics.mannWhitneyU2(Tables.events(spark, dir),
      floor(col("value") * 100).cast("long"), col("user_id") % 2 === 1)

  /** Difference-in-differences over event values: odd users treated,
    * afternoon hours post. */
  def did(spark: SparkSession, dir: String): DataFrame =
    Analytics.diffInDiff(Tables.events(spark, dir),
      col("user_id") % 2 === 1, hour(col("ts")) >= 12,
      floor(col("value") * 100).cast("long"))

  /** RFM quintile segmentation census over orders. */
  def rfm(spark: SparkSession, dir: String): DataFrame =
    Analytics.rfmSegments(Tables.orders(spark, dir), col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")),
        floor(col("o_totalprice") * 100).cast("long"))
      .orderBy(col("r_q"), col("f_q"), col("m_q"))

  /** Time-respecting earliest arrival from node 1 over the ancestry
    * graph with deterministic edge times — static reachability finds
    * all 1499 nodes; the temporal constraint prunes the chains whose
    * edge times run backwards. */
  def temporalReach(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = ancestryEdges(spark, dir)
      .withColumn("t", (col("dst") * 37) % 100)
    graft.graph.Fixpoint.temporalReach(e, Seq(1L).toDF("node"), maxRounds = 40)
      .orderBy(col("node"))
  }

  /** Percolation curve of the k<800 ancestry graph at 40% / 70% edge
    * survival. */
  def robustness(spark: SparkSession, dir: String): DataFrame =
    Paths.robustnessSweep(
        ancestryEdges(spark, dir).filter(col("dst") < 800),
        Seq(400000L, 700000L))
      .orderBy(col("rate_ppm"))

  /** Regular path query over the labeled ancestry graph: nodes
    * reachable from 1 along paths with AT LEAST ONE quarter edge
    * (NFA product-automaton reachability). */
  def rpq(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir).select(col("c_custkey").cast("long").as("k"))
    val labeled = c.filter(col("k") >= 2L)
      .select(expr("k div 2").as("src"), col("k").as("dst"), lit("half").as("label"))
      .unionByName(c.filter(col("k") >= 4L)
        .select(expr("k div 4").as("src"), col("k").as("dst"),
          lit("quarter").as("label")))
    val nfa = Seq((0L, "half", 0L), (0L, "quarter", 1L),
      (1L, "half", 1L), (1L, "quarter", 1L)).toDF("s_from", "label", "s_to")
    graft.graph.Fixpoint.regularPathQuery(labeled, nfa, Seq(1L).toDF("node"),
        maxRounds = 30)
      .filter(col("state") === 1L).select(col("node")).distinct()
      .orderBy(col("node"))
  }

  /** Trigram-pruned substring search for "merge hash". */
  def trigram(spark: SparkSession, dir: String): DataFrame =
    TextFunctions.trigramSearch(Tables.documents(spark, dir),
      "doc_id", "text", "merge hash").orderBy(col("doc_id"))

  /** Per-dimension embedding drift between even- and odd-label vectors. */
  def dimDrift(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.dimDrift(
        Similarity.quantized(emb.filter(pmod(col("label"), lit(2)) === 0)),
        Similarity.quantized(emb.filter(pmod(col("label"), lit(2)) === 1)))
      .orderBy(col("dim"))
  }

  /** Hashed linear quality-classifier inference over the corpus. */
  def linearClassifier(spark: SparkSession, dir: String): DataFrame =
    TextFunctions.linearClassifierScore(Tables.documents(spark, dir),
        "doc_id", "text", dims = 4096, threshold = 0L)
      .orderBy(col("doc_id"))

  /** Bitemporal as-of read over corrected order assertions: as known on
    * 1995-06-01, in effect on 1995-06-01 (every third order carries a
    * later-transaction correction with a longer validity). */
  def bitemporalRead(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_orderkey"),
      expr("unix_micros(cast(o_orderdate as timestamp)) div 1000000").as("vs"),
      floor(col("o_totalprice") * 100).cast("long").as("p"))
    val v1 = o.select(col("o_orderkey"), col("vs").as("valid_from"),
      (col("vs") + 2592000L).as("valid_to"), col("vs").as("tx_from"),
      col("p").as("price_x100"))
    val v2 = o.filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey"), col("vs").as("valid_from"),
        (col("vs") + 5184000L).as("valid_to"), (col("vs") + 864000L).as("tx_from"),
        (col("p") + 500L).as("price_x100"))
    Temporal.bitemporalAsOf(v1.unionByName(v2), Seq("o_orderkey"),
        "tx_from", "valid_from", "valid_to", lit(801964800L), lit(801964800L))
      .orderBy(col("o_orderkey"))
  }

  /** Trailing-3-hour distinct-user estimates per event type, every hour,
    * from time-bucketed HLL registers merged by max. */
  def hllWindowed(spark: SparkSession, dir: String): DataFrame =
    Sketches.hllWindowed(Tables.events(spark, dir), "event_type", "user_id",
        expr("unix_micros(ts) div 3600000000"), windowBuckets = 3)
      .orderBy(col("g"), col("bucket"))

  /** Widest (bottleneck) path widths from node 1 over the ancestry graph
    * with deterministic edge capacities. */
  def widestPath(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = ancestryEdges(spark, dir)
      .withColumn("cap", (col("dst") * 7) % 20 + 1)
    graft.graph.Fixpoint.widestPath(e, Seq(1L).toDF("node"),
        sourceWidth = 1000000L, maxRounds = 40)
      .orderBy(col("node"))
  }

  /** Greedy 5-document maximum-coverage selection over shingles. */
  def coverageSelect(spark: SparkSession, dir: String): DataFrame =
    TextFunctions.greedyCoverage(shingleTerms(spark, dir), k = 5)
      .orderBy(col("round"))

  /** Weekly-cohort cumulative LTV triangle over event values. */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame =
    Analytics.cohortLtv(Tables.events(spark, dir), "user_id",
        expr("unix_micros(ts) div 604800000000"),
        floor(col("value") * 100).cast("long"))
      .orderBy(col("cohort_pd"), col("offset_pd"))

  /** Importance weights bending the full corpus's language mix toward
    * the doc_id%3 subsample's mix. */
  def importanceWeights(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    graft.text.Sampling.importanceWeights(docs,
        docs.filter(col("doc_id") % 3 === 0), "lang")
      .orderBy(col("cat"))
  }

  /** ViT-style 32-byte patch plan over document payload lengths. */
  def patchGrid(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.patchPlan(Tables.documents(spark, dir),
        "doc_id", "n_chars", patchBytes = 32)
      .orderBy(col("doc_id"), col("patch_idx"))

  /** Incremental CC maintenance: components of the fragmented k<1000
    * ancestry forest (every fifth child edge dropped), then bridge edges
    * folded in through the quotient-graph fixpoint — must equal the full
    * recompute over old ∪ new. */
  def incrementalCc(spark: SparkSession, dir: String): DataFrame = {
    val base = ancestryEdges(spark, dir)
      .filter(col("dst") < 1000 && col("dst") % 5 =!= 0)
      .select(col("src").as("a"), col("dst").as("b"))
    val labels = graft.graph.Fixpoint.connectedComponents(base)
    val newEdges = Tables.customer(spark, dir)
      .select(col("c_custkey").cast("long").as("k"))
      .filter(col("k") % 97 === 0 && col("k") + 1 < 1000 && col("k") > 0)
      .select(col("k").as("a"), (col("k") + 1).as("b"))
    graft.graph.Fixpoint.incrementalComponents(labels, newEdges)
      .orderBy(col("node"))
  }

  /** IP-in-CIDR containment join on key-derived addresses and networks. */
  def cidrContain(spark: SparkSession, dir: String): DataFrame = {
    val ips = Tables.customer(spark, dir).select(col("c_custkey").as("id"),
      expr("(c_custkey * 2654435761) % 4294967296").as("ip"))
    val nets = Tables.supplier(spark, dir).select(col("s_suppkey").as("net_id"),
      expr("((s_suppkey * 40503) % 65536) * 65536").as("base"),
      (lit(8) + col("s_suppkey") % 9).as("prefix_len"))
    graft.operators.Network.cidrContainJoin(ips, nets)
      .withColumn("prefix_len", col("prefix_len").cast("long"))
      .orderBy(col("id"), col("net_id"))
  }

  /** Pareto concentration: how many customers carry 80% of order value. */
  def paretoPoint(spark: SparkSession, dir: String): DataFrame =
    Analytics.paretoPoint(Tables.orders(spark, dir), col("o_custkey"),
      floor(col("o_totalprice") * 100).cast("long"), thresholdPpm = 800000L)

  // -------------------------------------------------------------- registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_betweenness_st" -> (betweennessSt _),
    "graph_topo_levels" -> (topoLevels _),
    "graph_bipartite" -> (bipartitePartPairs _),
    "analytics_chi2" -> (chi2Segments _),
    "analytics_gini" -> (giniOrderValue _),
    "sketch_kmv_setops" -> (kmvSetOps _),
    "privacy_t_closeness" -> (privacyTCloseness _),
    "er_fellegi_sunter" -> (erFellegiSunter _),
    "er_fs_classify" -> (erFsClassify _),
    "graph_k4_census" -> (graphK4 _),
    "attribution_multi_touch" -> (attributionMultiTouch _),
    "temporal_allen_census" -> (allenCensusGate _),
    "text_cosine_postings" -> (cosinePostings _),
    "text_vocab_growth" -> (vocabGrowth _),
    "join_spatial_grid" -> (spatialGridNearest _),
    "incremental_join" -> (incrementalJoin _),
    "graph_subtree_agg" -> (subtreeAgg _),
    "graph_reciprocity" -> (reciprocityGate _),
    "text_zipf" -> (textZipf _),
    "text_good_turing" -> (goodTuringGate _),
    "analytics_exact_quantiles" -> (exactQuantilesGate _),
    "analytics_cusum_global" -> (cusumGate _),
    "analytics_group_quantiles" -> (groupQuantilesGate _),
    "analytics_cohens_kappa" -> (cohensKappaGate _),
    "sample_ess" -> (essGate _),
    "e2e_seasonal_cusum" -> (seasonalCusumGate _),
    "graph_modularity" -> (graphModularity _),
    "graph_modularity_weighted" -> (modularityWeightedGate _),
    "graph_conductance" -> (graphConductance _),
    "graph_conductance_weighted" -> (conductanceWeightedGate _),
    "graph_rich_club" -> (richClubGate _),
    "analytics_seasonal" -> (seasonalDecompose _),
    "analytics_mad_robust" -> (madRobust _),
    "quality_benford" -> (benford _),
    "sim_matryoshka_recall" -> (matryoshkaRecall _),
    "text_ngram_novelty" -> (ngramNovelty _),
    "analytics_ohlc" -> (ohlc _),
    "analytics_rank_normalize" -> (rankNormalize _),
    "corpus_source_overlap" -> (sourceOverlap _),
    "analytics_corr_matrix" -> (corrMatrix _),
    "scd2_audit" -> (scd2Audit _),
    "sample_mixture_schedule" -> (mixtureSchedule _),
    "sample_token_packing" -> (tokenPacking _),
    "analytics_burstiness" -> (burstinessGate _),
    "analytics_topk_drift" -> (topKDriftGate _),
    "analytics_trimmed_mean" -> (trimmedMeanGate _),
    "analytics_did" -> (did _),
    "analytics_mann_whitney" -> (mannWhitney _),
    "analytics_rfm" -> (rfm _),
    "graph_temporal_reach" -> (temporalReach _),
    "text_linear_classifier" -> (linearClassifier _),
    "graph_robustness_sweep" -> (robustness _),
    "graph_rpq" -> (rpq _),
    "text_trigram_search" -> (trigram _),
    "embed_dim_drift" -> (dimDrift _),
    "bitemporal_read" -> (bitemporalRead _),
    "sketch_hll_windowed" -> (hllWindowed _),
    "graph_widest_path" -> (widestPath _),
    "e2e_coverage_select" -> (coverageSelect _),
    "analytics_cohort_ltv" -> (cohortLtv _),
    "sample_importance_weights" -> (importanceWeights _),
    "multimodal_patch_grid" -> (patchGrid _),
    "graph_incremental_cc" -> (incrementalCc _),
    "join_cidr_contain" -> (cidrContain _),
    "analytics_pareto_point" -> (paretoPoint _),
  )

  /** Unrolled BFS-with-path-counts rounds (sigma sums, frontier =
    * unvisited) — the PathCountsOracleSql shape, parameterized. */
  private def bfsSigmaRounds(p: String, edgeRel: String, rounds: Int): String =
    (1 to rounds).map { i =>
      s"""${p}f$i AS MATERIALIZED (
         |  SELECT e.dst AS node, sum(v.sigma) AS sigma
         |  FROM ${p}v${i - 1} v JOIN $edgeRel e ON v.node = e.src
         |  WHERE v.dist = ${i - 1}
         |    AND e.dst NOT IN (SELECT node FROM ${p}v${i - 1})
         |  GROUP BY e.dst),
         |${p}v$i AS MATERIALIZED (SELECT node, dist, sigma FROM ${p}v${i - 1}
         |  UNION ALL SELECT node, $i, sigma FROM ${p}f$i)""".stripMargin
    }.mkString(",\n")

  /** One percolation rate's sampled-CC summary block (recursive closure
    * over the sampled undirected edges; singletons from the n8 node
    * universe). */
  private def percolationBlock(r: Long): String =
    s"""k$r AS MATERIALIZED (SELECT src, dst FROM e8
       |  WHERE CAST(('0x' || substr(md5(CAST(src AS VARCHAR) || ':' || CAST(dst AS VARCHAR)), 1, 14)) AS BIGINT) % 1000000 < $r),
       |u$r AS MATERIALIZED (SELECT DISTINCT a, b FROM (
       |  SELECT src AS a, dst AS b FROM k$r UNION ALL SELECT dst, src FROM k$r)),
       |re$r AS (
       |  SELECT a AS node, b AS reachable FROM u$r
       |  UNION
       |  SELECT rr.node, u.b FROM re$r rr JOIN u$r u ON rr.reachable = u.a),
       |cp$r AS (SELECT n.node,
       |    least(n.node, coalesce(min(rr.reachable), n.node)) AS component
       |  FROM n8 n LEFT JOIN re$r rr ON rr.node = n.node GROUP BY n.node),
       |sz$r AS (SELECT component, count(*) AS sz FROM cp$r GROUP BY component),
       |sm$r AS (SELECT CAST($r AS BIGINT) AS rate_ppm,
       |  CAST(sum(sz) AS BIGINT) AS n_nodes,
       |  CAST(count(*) AS BIGINT) AS n_components,
       |  CAST(max(sz) AS BIGINT) AS max_component FROM sz$r)""".stripMargin

  /** Five unrolled greedy max-coverage rounds (e2e_coverage_select
    * oracle): winner = (count of uncovered terms DESC, doc_id ASC),
    * covered set accumulated per round. */
  private val GreedyCoverageOracle: String = {
    val rounds = (2 to 5).map { i =>
      s"""s$i AS (SELECT d.doc_id, count(*) AS n
         |  FROM d0 d ANTI JOIN c${i - 1} USING (term) GROUP BY d.doc_id),
         |w$i AS MATERIALIZED (SELECT doc_id, n FROM s$i
         |  ORDER BY n DESC, doc_id LIMIT 1),
         |c$i AS MATERIALIZED (SELECT term FROM c${i - 1}
         |  UNION SELECT term FROM d0 JOIN w$i USING (doc_id))""".stripMargin
    }.mkString(",\n")
    val out = (1 to 5).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS round, CAST(doc_id AS BIGINT) AS doc_id,
         |  CAST(n AS BIGINT) AS n_new,
         |  (SELECT CAST(count(*) AS BIGINT) FROM c$i) AS n_covered FROM w$i"""
        .stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $ShingleTermsSql,
       |d0 AS MATERIALIZED (SELECT DISTINCT doc_id, term FROM dt),
       |s1 AS (SELECT doc_id, count(*) AS n FROM d0 GROUP BY doc_id),
       |w1 AS MATERIALIZED (SELECT doc_id, n FROM s1 ORDER BY n DESC, doc_id LIMIT 1),
       |c1 AS MATERIALIZED (SELECT DISTINCT term FROM d0 JOIN w1 USING (doc_id)),
       |$rounds
       |$out
       |ORDER BY round""".stripMargin
  }

  private val BetweennessStOracle: String =
    s"""WITH $AncestryEdgesSql,
       |er AS MATERIALIZED (SELECT dst AS src, src AS dst FROM e),
       |fv0 AS MATERIALIZED (SELECT 1 AS node, 0 AS dist, 1 AS sigma),
       |${bfsSigmaRounds("f", "e", 12)},
       |bv0 AS MATERIALIZED (SELECT 1000 AS node, 0 AS dist, 1 AS sigma),
       |${bfsSigmaRounds("b", "er", 12)},
       |dst AS (SELECT dist AS d_st FROM fv12 WHERE node = 1000)
       |SELECT CAST(f.node AS BIGINT) AS node,
       |  CAST(f.dist AS BIGINT) AS dist_s,
       |  CAST(f.sigma * b.sigma AS BIGINT) AS through_paths
       |FROM fv12 f JOIN bv12 b ON f.node = b.node CROSS JOIN dst
       |WHERE f.dist + b.dist = dst.d_st
       |ORDER BY node""".stripMargin

  val oracles: Map[String, String] = Map(
    "graph_betweenness_st" -> BetweennessStOracle,
    "graph_topo_levels" ->
      s"""WITH RECURSIVE $AncestryEdgesSql,
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |lv AS (
         |  SELECT node, CAST(0 AS BIGINT) AS l FROM nodes
         |  UNION
         |  SELECT e.dst, lv.l + 1 FROM lv JOIN e ON lv.node = e.src
         |)
         |SELECT CAST(node AS BIGINT) AS node, CAST(max(l) AS BIGINT) AS level
         |FROM lv GROUP BY node ORDER BY node""".stripMargin,
    "graph_bipartite" ->
      """WITH a AS (SELECT DISTINCT l_orderkey AS l, CAST(l_partkey AS BIGINT) AS r
        |  FROM lineitem)
        |SELECT x.r AS r_a, y.r AS r_b, count(*) AS n_shared
        |FROM a x JOIN a y ON x.l = y.l AND x.r < y.r
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY r_a, r_b""".stripMargin,
    "analytics_chi2" ->
      """WITH obs AS (SELECT c_mktsegment AS rk, CAST(c_nationkey % 5 AS BIGINT) AS ck,
        |    count(*) AS observed FROM customer GROUP BY 1, 2),
        |rt AS (SELECT rk, sum(observed) AS rtot FROM obs GROUP BY rk),
        |ct AS (SELECT ck, sum(observed) AS ctot FROM obs GROUP BY ck),
        |n AS (SELECT sum(observed) AS n FROM obs)
        |SELECT o.rk, o.ck, o.observed,
        |  CAST((CAST(o.observed * n.n - rt.rtot * ct.ctot AS HUGEINT)
        |        * (o.observed * n.n - rt.rtot * ct.ctot) * 1000000)
        |       // (CAST(rt.rtot AS HUGEINT) * ct.ctot * n.n) AS BIGINT) AS contrib_ppm
        |FROM obs o JOIN rt USING (rk) JOIN ct USING (ck) CROSS JOIN n
        |ORDER BY rk, ck""".stripMargin,
    "analytics_gini" ->
      """WITH v AS (SELECT o_orderpriority AS g,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS v, o_orderkey AS tie
        |  FROM orders),
        |r AS (SELECT g, v, CAST(row_number() OVER
        |    (PARTITION BY g ORDER BY v, tie) AS BIGINT) AS i FROM v),
        |a AS (SELECT g, count(*) AS n, sum(v) AS total, sum(i * v) AS s1
        |  FROM r GROUP BY g)
        |SELECT g, CAST(n AS BIGINT) AS n, CAST(total AS BIGINT) AS total,
        |  CAST(CASE WHEN total = 0 THEN 0 ELSE
        |    (CAST(2 * s1 - (n + 1) * total AS HUGEINT) * 1000000)
        |      // (CAST(n AS HUGEINT) * total) END AS BIGINT) AS gini_ppm
        |FROM a ORDER BY g""".stripMargin,
    "attribution_multi_touch" ->
      """WITH t AS (SELECT user_id, event_id AS touch_id,
        |    event_type AS channel, epoch_us(ts) AS t_ts
        |  FROM events WHERE event_type IN ('click', 'view', 'signup')),
        |c AS (SELECT user_id, event_id AS conv_id, epoch_us(ts) AS c_ts,
        |    CAST(coalesce(floor(value * 100), 0) AS BIGINT) AS value_cents
        |  FROM events WHERE event_type = 'purchase'),
        |asg AS MATERIALIZED (SELECT * FROM (
        |  SELECT t.*, c.conv_id, c.c_ts, c.value_cents,
        |    row_number() OVER (PARTITION BY t.user_id, t.touch_id
        |      ORDER BY c.c_ts, c.conv_id) AS rk
        |  FROM t JOIN c ON t.user_id = c.user_id AND t.t_ts <= c.c_ts
        |    AND c.c_ts - t.t_ts <= 259200000000) WHERE rk = 1),
        |pos AS MATERIALIZED (SELECT *,
        |  row_number() OVER (PARTITION BY conv_id ORDER BY t_ts, touch_id) AS pos,
        |  count(*) OVER (PARTITION BY conv_id) AS n FROM asg),
        |sh AS (
        |  SELECT channel, value_cents, 'first_touch' AS model,
        |    CASE WHEN pos = 1 THEN 1000000 ELSE 0 END AS share FROM pos
        |  UNION ALL SELECT channel, value_cents, 'last_touch',
        |    CASE WHEN pos = n THEN 1000000 ELSE 0 END FROM pos
        |  UNION ALL SELECT channel, value_cents, 'linear',
        |    CASE WHEN pos = n THEN 1000000 - (1000000 // n) * (n - 1)
        |      ELSE 1000000 // n END FROM pos
        |  UNION ALL SELECT channel, value_cents, 'u_shaped',
        |    CASE WHEN n = 1 THEN 1000000 WHEN n = 2 THEN 500000
        |      WHEN pos = 1 THEN 400000
        |      WHEN pos = n THEN 600000 - (200000 // (n - 2)) * (n - 2)
        |      ELSE 200000 // greatest(n - 2, 1) END FROM pos)
        |SELECT model, channel, CAST(count(*) AS BIGINT) AS n_touches,
        |  CAST(sum(CAST(share AS HUGEINT) * value_cents) AS BIGINT)
        |    AS credit_ppm_cents
        |FROM sh WHERE share > 0 GROUP BY model, channel
        |ORDER BY model, channel""".stripMargin,
    "temporal_allen_census" ->
      """WITH o AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
        |  CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS d FROM orders),
        |a AS (SELECT d AS as_, d + k % 20 + 1 AS ae FROM o WHERE k % 40 = 1),
        |b AS (SELECT d AS bs, d + k % 20 + 1 AS be FROM o WHERE k % 40 = 2),
        |p AS (SELECT CASE
        |    WHEN ae < bs THEN 'before' WHEN as_ > be THEN 'after'
        |    WHEN as_ = bs AND ae = be THEN 'equals'
        |    WHEN ae = bs THEN 'meets' WHEN be = as_ THEN 'met_by'
        |    WHEN as_ = bs AND ae < be THEN 'starts'
        |    WHEN as_ = bs THEN 'started_by'
        |    WHEN ae = be AND as_ > bs THEN 'finishes'
        |    WHEN ae = be THEN 'finished_by'
        |    WHEN as_ > bs AND ae < be THEN 'during'
        |    WHEN as_ < bs AND ae > be THEN 'contains'
        |    WHEN as_ < bs THEN 'overlaps' ELSE 'overlapped_by' END AS relation
        |  FROM a CROSS JOIN b),
        |r AS (SELECT relation, count(*) AS n FROM p GROUP BY 1),
        |rels AS (SELECT unnest(['before', 'after', 'meets', 'met_by',
        |  'overlaps', 'overlapped_by', 'starts', 'started_by', 'during',
        |  'contains', 'finishes', 'finished_by', 'equals']) AS relation)
        |SELECT rels.relation, CAST(coalesce(r.n, 0) AS BIGINT) AS n_pairs
        |FROM rels LEFT JOIN r ON rels.relation = r.relation
        |ORDER BY rels.relation""".stripMargin,
    "privacy_t_closeness" ->
      """WITH d AS (SELECT c_mktsegment AS seg,
        |  CAST(c_nationkey % 4 AS BIGINT) AS nk,
        |  CAST(floor(c_acctbal * 100) AS BIGINT) % 25 AS cc
        |  FROM customer),
        |cls AS (SELECT seg, nk, count(*) AS class_size FROM d GROUP BY 1, 2),
        |cell AS (SELECT seg, nk, cc, count(*) AS n_cs FROM d GROUP BY 1, 2, 3),
        |gdist AS (SELECT cc, count(*) AS g_s FROM d GROUP BY 1),
        |tot AS (SELECT count(*) AS n_total FROM d),
        |dev AS (SELECT cls.seg, cls.nk, cls.class_size, tot.n_total,
        |    abs(CAST(coalesce(cell.n_cs, 0) AS HUGEINT) * tot.n_total
        |      - CAST(gdist.g_s AS HUGEINT) * cls.class_size) AS dv
        |  FROM cls CROSS JOIN gdist CROSS JOIN tot
        |  LEFT JOIN cell ON cell.seg = cls.seg AND cell.nk = cls.nk
        |    AND cell.cc = gdist.cc),
        |s AS (SELECT seg, nk, CAST(class_size AS BIGINT) AS class_size,
        |  CAST((sum(dv) * 1000000)
        |    // (2 * CAST(class_size AS HUGEINT) * n_total) AS BIGINT)
        |    AS tvd_ppm
        |  FROM dev GROUP BY seg, nk, class_size, n_total)
        |SELECT seg, nk, class_size, tvd_ppm FROM s
        |WHERE tvd_ppm > 250000 ORDER BY seg, nk""".stripMargin,
    "er_fellegi_sunter" ->
      """WITH c AS (SELECT CAST(c_custkey AS BIGINT) AS k,
        |  CAST(CAST(floor(c_acctbal * 100) AS BIGINT) AS VARCHAR) AS name,
        |  c_mktsegment AS seg,
        |  CAST(floor(c_acctbal * 100) AS BIGINT) % 25 AS cc FROM customer),
        |dup AS (SELECT k, CASE WHEN k % 4 = 0 THEN substr(name, 1, 3) ELSE name END AS name2,
        |  CASE WHEN k % 5 = 0 THEN 'OTHER' ELSE seg END AS seg2, cc AS cc2 FROM c),
        |mm AS (SELECT c.k, TRUE AS is_match,
        |  levenshtein(c.name, d.name2) <= 2 AS name_agree,
        |  c.seg = d.seg2 AS seg_agree, c.cc = d.cc2 AS cc_agree
        |  FROM c JOIN dup d ON c.k = d.k),
        |nx AS (SELECT k - 1 AS k, name AS name2, seg AS seg2, cc AS cc2 FROM c),
        |uu AS (SELECT c.k, FALSE AS is_match,
        |  levenshtein(c.name, nx.name2) <= 2 AS name_agree,
        |  c.seg = nx.seg2 AS seg_agree, c.cc = nx.cc2 AS cc_agree
        |  FROM c JOIN nx ON c.k = nx.k),
        |lab AS MATERIALIZED (SELECT * FROM mm UNION ALL SELECT * FROM uu),
        |pat AS MATERIALIZED (SELECT name_agree, seg_agree, cc_agree,
        |  sum(CASE WHEN is_match THEN 1 ELSE 0 END) AS n_match,
        |  sum(CASE WHEN is_match THEN 0 ELSE 1 END) AS n_unmatch
        |  FROM lab GROUP BY 1, 2, 3),
        |tot AS (SELECT sum(n_match) AS tm, sum(n_unmatch) AS tu FROM pat),
        |lr AS (SELECT p.name_agree, p.seg_agree, p.cc_agree,
        |  CAST(p.n_match AS BIGINT) AS n_match,
        |  CAST(p.n_unmatch AS BIGINT) AS n_unmatch,
        |  CASE WHEN tot.tm = 0 OR p.n_unmatch = 0 THEN NULL
        |    ELSE CAST((CAST(p.n_match AS HUGEINT) * tot.tu * 1000000)
        |      // (CAST(p.n_unmatch AS HUGEINT) * tot.tm) AS BIGINT)
        |  END AS lr_ppm FROM pat p CROSS JOIN tot)
        |SELECT * FROM lr ORDER BY name_agree, seg_agree, cc_agree""".stripMargin,
    "er_fs_classify" ->
      """WITH c AS (SELECT CAST(c_custkey AS BIGINT) AS k,
        |  CAST(CAST(floor(c_acctbal * 100) AS BIGINT) AS VARCHAR) AS name,
        |  c_mktsegment AS seg,
        |  CAST(floor(c_acctbal * 100) AS BIGINT) % 25 AS cc FROM customer),
        |dup AS (SELECT k, CASE WHEN k % 4 = 0 THEN substr(name, 1, 3) ELSE name END AS name2,
        |  CASE WHEN k % 5 = 0 THEN 'OTHER' ELSE seg END AS seg2, cc AS cc2 FROM c),
        |mm AS (SELECT c.k, TRUE AS is_match,
        |  levenshtein(c.name, d.name2) <= 2 AS name_agree,
        |  c.seg = d.seg2 AS seg_agree, c.cc = d.cc2 AS cc_agree
        |  FROM c JOIN dup d ON c.k = d.k),
        |nx AS (SELECT k - 1 AS k, name AS name2, seg AS seg2, cc AS cc2 FROM c),
        |uu AS (SELECT c.k, FALSE AS is_match,
        |  levenshtein(c.name, nx.name2) <= 2 AS name_agree,
        |  c.seg = nx.seg2 AS seg_agree, c.cc = nx.cc2 AS cc_agree
        |  FROM c JOIN nx ON c.k = nx.k),
        |lab AS MATERIALIZED (SELECT * FROM mm UNION ALL SELECT * FROM uu),
        |pat AS MATERIALIZED (SELECT name_agree, seg_agree, cc_agree,
        |  sum(CASE WHEN is_match THEN 1 ELSE 0 END) AS n_match,
        |  sum(CASE WHEN is_match THEN 0 ELSE 1 END) AS n_unmatch
        |  FROM lab GROUP BY 1, 2, 3),
        |tot AS (SELECT sum(n_match) AS tm, sum(n_unmatch) AS tu FROM pat),
        |lr AS (SELECT p.name_agree, p.seg_agree, p.cc_agree,
        |  CAST(p.n_match AS BIGINT) AS n_match,
        |  CAST(p.n_unmatch AS BIGINT) AS n_unmatch,
        |  CASE WHEN tot.tm = 0 OR p.n_unmatch = 0 THEN NULL
        |    ELSE CAST((CAST(p.n_match AS HUGEINT) * tot.tu * 1000000)
        |      // (CAST(p.n_unmatch AS HUGEINT) * tot.tm) AS BIGINT)
        |  END AS lr_ppm FROM pat p CROSS JOIN tot)
        |SELECT CASE WHEN lr.lr_ppm IS NULL OR lr.lr_ppm >= 10000000 THEN 'link'
        |    WHEN lr.lr_ppm < 100000 THEN 'non-link' ELSE 'possible' END AS decision,
        |  CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(CASE WHEN lab.is_match THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_true_match
        |FROM lab JOIN lr ON lab.name_agree = lr.name_agree
        |  AND lab.seg_agree = lr.seg_agree AND lab.cc_agree = lr.cc_agree
        |GROUP BY 1 ORDER BY decision""".stripMargin,
    "graph_k4_census" ->
      """WITH n AS (SELECT CAST(c_custkey AS BIGINT) AS k FROM customer),
        |e0 AS (SELECT a.k AS u, b.k AS v FROM n a JOIN n b
        |    ON a.k // 5 = b.k // 5 AND a.k < b.k
        |  UNION SELECT n.k AS u, n.k + 5 AS v FROM n
        |    WHERE EXISTS (SELECT 1 FROM n m WHERE m.k = n.k + 5)),
        |e AS MATERIALIZED (SELECT DISTINCT u, v FROM e0)
        |SELECT CAST(count(*) AS BIGINT) AS n_k4
        |FROM e ab JOIN e ac ON ab.u = ac.u AND ab.v < ac.v
        |  JOIN e ad ON ab.u = ad.u AND ac.v < ad.v
        |  JOIN e bc ON bc.u = ab.v AND bc.v = ac.v
        |  JOIN e bd ON bd.u = ab.v AND bd.v = ad.v
        |  JOIN e cd ON cd.u = ac.v AND cd.v = ad.v""".stripMargin,
    "sketch_kmv_setops" ->
      """WITH ha AS (SELECT DISTINCT CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 14)) AS BIGINT) AS h FROM customer),
        |hb AS (SELECT DISTINCT CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 14)) AS BIGINT) AS h FROM orders),
        |sa AS (SELECT h FROM ha ORDER BY h LIMIT 64),
        |sb AS (SELECT h FROM hb ORDER BY h LIMIT 64),
        |m AS (SELECT h, count(*) AS n_sides
        |  FROM (SELECT h FROM sa UNION ALL SELECT h FROM sb)
        |  GROUP BY h ORDER BY h LIMIT 64),
        |ag AS (SELECT count(*) AS n_seen, max(h) AS kth,
        |    sum(CASE WHEN n_sides = 2 THEN 1 ELSE 0 END) AS n_both FROM m)
        |SELECT CAST(64 AS BIGINT) AS k,
        |  CAST(CASE WHEN n_seen < 64 THEN n_seen
        |    ELSE 4539628424389459968 // greatest(kth, 1) END AS BIGINT) AS est_union,
        |  CAST(CASE WHEN n_seen < 64 THEN n_both
        |    ELSE (n_both * (4539628424389459968 // greatest(kth, 1))) // 64
        |  END AS BIGINT) AS est_inter
        |FROM ag""".stripMargin,
    "text_cosine_postings" ->
      s"""WITH $ShingleTermsSql,
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM dt GROUP BY doc_id, term),
         |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term
         |  HAVING count(*) <= 25),
         |nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
         |w AS (SELECT t.doc_id, t.term, t.tf * ((100 * nd.n_docs) // d.df) AS w
         |  FROM tf t JOIN dfq d USING (term) CROSS JOIN nd),
         |nrm AS (SELECT doc_id, sum(w * w) AS n2 FROM w GROUP BY doc_id),
         |dots AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |    sum(x.w * y.w) AS dot
         |  FROM w x JOIN w y ON x.term = y.term AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, CAST(dot AS BIGINT) AS dot,
         |  CAST((CAST(dot AS HUGEINT) * dot * 1000000)
         |       // (CAST(na.n2 AS HUGEINT) * nb.n2) AS BIGINT) AS cos2_ppm
         |FROM dots JOIN nrm na ON na.doc_id = dots.doc_a
         |          JOIN nrm nb ON nb.doc_id = dots.doc_b
         |ORDER BY cos2_ppm DESC, doc_a, doc_b LIMIT 50""".stripMargin,
    "text_vocab_growth" ->
      s"""WITH $ShingleTermsSql,
         |pd AS (SELECT doc_id, count(*) AS toks FROM dt GROUP BY doc_id),
         |rk AS (SELECT doc_id, toks, CAST(row_number() OVER (ORDER BY
         |    CAST(('0x' || substr(md5('vg:' || CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT),
         |    doc_id) AS BIGINT) AS rank FROM pd),
         |nn AS (SELECT count(*) AS n FROM pd),
         |dec AS (SELECT CAST(g.d AS BIGINT) AS decile, (nn.n * g.d) // 10 AS cutoff
         |  FROM generate_series(1, 10) g(d), nn),
         |fs AS (SELECT dt.term, min(rk.rank) AS first_rank
         |  FROM dt JOIN rk USING (doc_id) GROUP BY dt.term),
         |voc AS (SELECT decile, count(*) AS vocab FROM fs, dec
         |  WHERE first_rank <= cutoff GROUP BY decile),
         |mass AS (SELECT decile, count(*) AS n_docs, sum(toks) AS n_tokens
         |  FROM rk, dec WHERE rank <= cutoff GROUP BY decile)
         |SELECT m.decile, CAST(m.n_docs AS BIGINT) AS n_docs,
         |  CAST(m.n_tokens AS BIGINT) AS n_tokens,
         |  CAST(coalesce(v.vocab, 0) AS BIGINT) AS vocab
         |FROM mass m LEFT JOIN voc v ON v.decile = m.decile
         |ORDER BY m.decile""".stripMargin,
    "join_spatial_grid" ->
      """WITH l AS (SELECT c_custkey AS lid,
        |    (c_custkey * 2654435761) % 4096 AS lx,
        |    (c_custkey * 972663749) % 4096 AS ly FROM customer),
        |r AS (SELECT s_suppkey AS rid,
        |    (s_suppkey * 1914874583) % 4096 AS rx,
        |    (s_suppkey * 517419103) % 4096 AS ry FROM supplier),
        |cand AS (SELECT lid, rid,
        |    (lx - rx) * (lx - rx) + (ly - ry) * (ly - ry) AS d2
        |  FROM l, r
        |  WHERE (lx - rx) * (lx - rx) + (ly - ry) * (ly - ry) <= 4096),
        |best AS (SELECT lid, rid, d2, row_number() OVER
        |    (PARTITION BY lid ORDER BY d2, rid) AS rn FROM cand)
        |SELECT lid, rid, CAST(d2 AS BIGINT) AS d2 FROM best WHERE rn = 1
        |ORDER BY lid""".stripMargin,
    "incremental_join" ->
      """WITH a AS (SELECT o_custkey AS custkey, o_orderkey, o_orderpriority
        |  FROM orders
        |  WHERE (o_orderkey % 7 <> 0 AND o_orderkey % 5 <> 0) OR o_orderkey % 7 = 0),
        |b AS (SELECT c_custkey AS custkey, c_mktsegment FROM customer)
        |SELECT a.custkey, o_orderkey, o_orderpriority, c_mktsegment,
        |  CAST(1 AS BIGINT) AS mult
        |FROM a JOIN b ON a.custkey = b.custkey
        |ORDER BY o_orderkey""".stripMargin,
    "graph_subtree_agg" ->
      """WITH RECURSIVE c AS (SELECT CAST(c_custkey AS BIGINT) AS k,
        |    CAST(floor(c_acctbal * 100) AS BIGINT) AS v FROM customer),
        |e AS (SELECT k // 2 AS src, k AS dst FROM c WHERE k >= 2),
        |nodes AS (SELECT DISTINCT n FROM (
        |  SELECT src AS n FROM e UNION ALL SELECT dst AS n FROM e)),
        |anc AS (
        |  SELECT n AS anc, n AS node FROM nodes
        |  UNION ALL
        |  SELECT e.src, a.node FROM anc a JOIN e ON a.anc = e.dst
        |)
        |SELECT a.anc AS node, CAST(length(bin(a.anc)) - 1 AS BIGINT) AS level,
        |  CAST(sum(c.v) AS BIGINT) AS subtree_sum,
        |  CAST(count(*) AS BIGINT) AS n_nodes
        |FROM anc a JOIN c ON c.k = a.node
        |GROUP BY a.anc ORDER BY node""".stripMargin,
    "graph_reciprocity" ->
      """WITH c AS (SELECT CAST(c_custkey AS BIGINT) AS k FROM customer),
        |t AS (SELECT k // 2 AS src, k AS dst FROM c WHERE k >= 2),
        |e AS (SELECT DISTINCT src, dst FROM (
        |  SELECT src, dst FROM t
        |  UNION ALL SELECT dst, src FROM t WHERE dst % 3 = 0)
        |  WHERE src <> dst),
        |r AS (SELECT count(*) AS n FROM e x
        |  WHERE EXISTS (SELECT 1 FROM e y WHERE y.src = x.dst AND y.dst = x.src)),
        |n AS (SELECT count(*) AS n FROM e)
        |SELECT CAST(n.n AS BIGINT) AS n_edges, CAST(r.n AS BIGINT) AS n_reciprocal,
        |  CAST((r.n * 1000000) // n.n AS BIGINT) AS reciprocity_ppm
        |FROM n, r""".stripMargin,
    "text_zipf" ->
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |cnt AS (SELECT term, count(*) AS freq FROM w GROUP BY term
        |  ORDER BY freq DESC, term LIMIT 30),
        |rk AS (SELECT term, freq, CAST(row_number() OVER
        |    (ORDER BY freq DESC, term) AS BIGINT) AS rank FROM cnt)
        |SELECT rank, term, freq, CAST(rank * freq AS BIGINT) AS rank_x_freq
        |FROM rk""".stripMargin,
    "text_good_turing" ->
      s"""WITH $ShingleTermsSql,
        |c AS (SELECT term, count(*) AS r FROM dt GROUP BY term),
        |ff AS (SELECT r, count(*) AS n_r FROM c GROUP BY r),
        |tot AS (SELECT sum(r * n_r) AS n_tok FROM ff)
        |SELECT CAST(ff.r AS BIGINT) AS r, CAST(ff.n_r AS BIGINT) AS n_r,
        |  CAST((ff.r + 1) * f2.n_r * 1000000 // ff.n_r AS BIGINT) AS r_star_x1e6,
        |  CAST(ff.r * ff.n_r * 1000000 // tot.n_tok AS BIGINT) AS mass_ppm
        |FROM ff LEFT JOIN ff f2 ON f2.r = ff.r + 1, tot
        |WHERE ff.r <= 12 ORDER BY ff.r""".stripMargin,
    "analytics_trimmed_mean" ->
      """WITH b AS (SELECT event_type AS g,
        |    CAST(floor(value * 100) AS BIGINT) AS v FROM events),
        |r AS (SELECT g, v,
        |    CAST(row_number() OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS rn,
        |    count(*) OVER (PARTITION BY g) AS n FROM b),
        |kept AS (SELECT g, count(*) AS n_kept, sum(v) AS sum_kept
        |  FROM r WHERE rn > (n * 100000) // 1000000
        |    AND rn <= n - (n * 100000) // 1000000
        |  GROUP BY g),
        |tot AS (SELECT g, count(*) AS n_rows FROM b GROUP BY g)
        |SELECT tot.g, CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept,
        |  CAST(coalesce(sum_kept, 0) AS BIGINT) AS sum_kept,
        |  CASE WHEN coalesce(n_kept, 0) = 0 THEN NULL
        |    WHEN sum_kept < 0 THEN CAST(-((-sum_kept) // n_kept) AS BIGINT)
        |    ELSE CAST(sum_kept // n_kept AS BIGINT) END AS trimmed_mean
        |FROM tot LEFT JOIN kept ON tot.g = kept.g
        |ORDER BY tot.g""".stripMargin,
    "analytics_topk_drift" ->
      """WITH w AS (SELECT doc_id % 2 AS par,
        |    unnest(string_split(text, ' ')) AS cat FROM documents),
        |o AS (SELECT cat, count(*) AS n_old FROM w WHERE par = 0
        |  GROUP BY cat ORDER BY n_old DESC, cat LIMIT 20),
        |orank AS (SELECT cat, n_old, CAST(row_number() OVER
        |  (ORDER BY n_old DESC, cat) AS BIGINT) AS rank_old FROM o),
        |nn AS (SELECT cat, count(*) AS n_new FROM w WHERE par = 1
        |  GROUP BY cat ORDER BY n_new DESC, cat LIMIT 20),
        |nrank AS (SELECT cat, n_new, CAST(row_number() OVER
        |  (ORDER BY n_new DESC, cat) AS BIGINT) AS rank_new FROM nn)
        |SELECT cat, CAST(n_old AS BIGINT) AS n_old, rank_old,
        |  CAST(n_new AS BIGINT) AS n_new, rank_new,
        |  CASE WHEN rank_old IS NULL THEN 'entered'
        |       WHEN rank_new IS NULL THEN 'dropped'
        |       WHEN rank_new < rank_old THEN 'up'
        |       WHEN rank_new > rank_old THEN 'down'
        |       ELSE 'steady' END AS status
        |FROM orank FULL OUTER JOIN nrank USING (cat)
        |ORDER BY cat""".stripMargin,
    "analytics_burstiness" ->
      """WITH g AS (SELECT event_type,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY event_type
        |      ORDER BY epoch_us(ts) ASC, event_id ASC) AS gap
        |  FROM events),
        |a AS (SELECT event_type, count(*) AS n_gaps, sum(gap) AS sum_gap,
        |    sum(CAST(gap AS HUGEINT) * gap) AS q
        |  FROM g WHERE gap IS NOT NULL GROUP BY event_type)
        |SELECT event_type, CAST(n_gaps AS BIGINT) AS n_gaps,
        |  CAST(sum_gap AS BIGINT) AS sum_gap,
        |  CASE WHEN n_gaps < 2 OR sum_gap = 0 THEN NULL
        |    ELSE CAST((1000000 * n_gaps *
        |      (n_gaps * q - CAST(sum_gap AS HUGEINT) * sum_gap)) //
        |      ((n_gaps - 1) * CAST(sum_gap AS HUGEINT) * sum_gap) AS BIGINT)
        |  END AS cv2_ppm
        |FROM a ORDER BY event_type""".stripMargin,
    "sample_token_packing" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(('0x' || substr(md5('pk:' || CAST(doc_id AS VARCHAR)), 1, 14))
        |      AS BIGINT) AS h
        |  FROM documents),
        |r AS (SELECT doc_id, n_tokens,
        |    sum(n_tokens) OVER (ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
        |      AS bfr
        |  FROM d),
        |bb AS (SELECT doc_id, n_tokens, bfr // 512 AS bin FROM r)
        |SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST((sum(n_tokens) * 1000000) // 512 AS BIGINT) AS fill_ppm
        |FROM bb GROUP BY bin ORDER BY bin""".stripMargin,
    "analytics_mann_whitney" ->
      """WITH b AS (SELECT CAST(floor(value * 100) AS BIGINT) AS v,
        |    user_id % 2 = 1 AS is_a FROM events),
        |c AS (SELECT v,
        |    sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS cb
        |  FROM b GROUP BY v),
        |w AS (SELECT v, ca, cb,
        |    coalesce(sum(cb) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
        |  FROM c)
        |SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b,
        |  CAST(sum(ca * (2 * below + cb)) AS BIGINT) AS u2,
        |  CAST(2 * sum(ca) * sum(cb) AS BIGINT) AS u2_max
        |FROM w""".stripMargin,
    "graph_modularity_weighted" ->
      """WITH k AS (SELECT CAST(c_custkey AS BIGINT) AS k FROM customer),
        |e0 AS (SELECT k // 8 AS src, k AS dst, k % 3 + 1 AS w
        |  FROM k WHERE k >= 8),
        |und AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b,
        |    sum(w) AS w
        |  FROM e0 WHERE src <> dst GROUP BY 1, 2),
        |lab AS (SELECT a, b, w, a // 64 AS ca, b // 64 AS cb FROM und),
        |wt AS (SELECT sum(w) AS wtot FROM und),
        |intra AS (SELECT ca AS c, sum(w) AS w_c FROM lab
        |  WHERE ca = cb GROUP BY 1),
        |st AS (SELECT c, sum(w) AS s_c FROM (
        |  SELECT ca AS c, w FROM lab UNION ALL SELECT cb AS c, w FROM lab)
        |  GROUP BY 1),
        |agg AS (SELECT count(*) AS n_communities,
        |  sum(coalesce(w_c, 0)) AS sw, sum(CAST(s_c AS HUGEINT) * s_c) AS ss2
        |  FROM st LEFT JOIN intra USING (c)),
        |q AS (SELECT n_communities,
        |  1000000 * (4 * wt.wtot * sw - ss2) AS num,
        |  4 * CAST(wt.wtot AS HUGEINT) * wt.wtot AS den,
        |  wt.wtot AS total_weight FROM agg, wt)
        |SELECT CAST(n_communities AS BIGINT) AS n_communities,
        |  CAST(total_weight AS BIGINT) AS total_weight,
        |  CAST(CASE WHEN num < 0 THEN -((-num) // den)
        |            ELSE num // den END AS BIGINT) AS q_ppm
        |FROM q""".stripMargin,
    "graph_rich_club" ->
      """WITH c AS (SELECT CAST(c_custkey AS BIGINT) AS k FROM customer),
        |mx AS (SELECT max(k) AS mx FROM c),
        |e0 AS (
        |  SELECT k // 8 AS src, k AS dst FROM c WHERE k >= 8
        |  UNION ALL
        |  SELECT k + i.i AS src, k + j.j AS dst
        |  FROM c, mx, generate_series(0, 4) i(i), generate_series(0, 4) j(j)
        |  WHERE k % 100 = 0 AND k + 4 <= mx AND i.i < j.j),
        |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM e0 WHERE src <> dst),
        |deg AS (SELECT node, count(*) AS deg FROM (
        |  SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und)
        |  GROUP BY node),
        |ks AS (SELECT unnest([0, 2, 4, 8]) AS k),
        |nn AS (SELECT ks.k, count(*) AS n_nodes FROM ks JOIN deg
        |  ON deg.deg > ks.k GROUP BY ks.k),
        |ee AS (SELECT ks.k, count(*) AS n_edges FROM ks
        |  JOIN (SELECT u.a, u.b, da.deg AS d1, db.deg AS d2 FROM und u
        |        JOIN deg da ON da.node = u.a JOIN deg db ON db.node = u.b) x
        |  ON x.d1 > ks.k AND x.d2 > ks.k GROUP BY ks.k)
        |SELECT CAST(ks.k AS BIGINT) AS k,
        |  CAST(coalesce(nn.n_nodes, 0) AS BIGINT) AS n_nodes,
        |  CAST(coalesce(ee.n_edges, 0) AS BIGINT) AS n_edges,
        |  CASE WHEN coalesce(nn.n_nodes, 0) < 2 THEN NULL
        |    ELSE CAST((2 * coalesce(ee.n_edges, 0) * 1000000) //
        |      (nn.n_nodes * (nn.n_nodes - 1)) AS BIGINT) END AS phi_ppm
        |FROM ks LEFT JOIN nn ON nn.k = ks.k LEFT JOIN ee ON ee.k = ks.k
        |ORDER BY k""".stripMargin,
    "graph_conductance" ->
      """WITH k AS (SELECT CAST(c_custkey AS BIGINT) AS k FROM customer),
        |e0 AS (SELECT k // 8 AS src, k AS dst FROM k WHERE k >= 8),
        |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM e0 WHERE src <> dst),
        |lab AS (SELECT a, b, a // 64 AS ca, b // 64 AS cb FROM und),
        |mm AS (SELECT 2 * count(*) AS m2 FROM und),
        |vol AS (SELECT c, count(*) AS volume, count(DISTINCT node) AS n_nodes
        |  FROM (SELECT ca AS c, a AS node FROM lab
        |        UNION ALL SELECT cb AS c, b AS node FROM lab) GROUP BY c),
        |cut AS (SELECT c, count(*) AS cut_edges FROM (
        |  SELECT ca AS c FROM lab WHERE ca <> cb
        |  UNION ALL SELECT cb AS c FROM lab WHERE ca <> cb) GROUP BY c)
        |SELECT vol.c AS community, CAST(n_nodes AS BIGINT) AS n_nodes,
        |  CAST(volume AS BIGINT) AS volume,
        |  CAST(coalesce(cut_edges, 0) AS BIGINT) AS cut_edges,
        |  CASE WHEN least(volume, mm.m2 - volume) = 0 THEN NULL
        |    ELSE CAST((coalesce(cut_edges, 0) * 1000000) //
        |      least(volume, mm.m2 - volume) AS BIGINT) END AS conductance_ppm
        |FROM vol LEFT JOIN cut ON vol.c = cut.c, mm
        |ORDER BY community""".stripMargin,
    "graph_conductance_weighted" ->
      """WITH k AS (SELECT CAST(c_custkey AS BIGINT) AS k FROM customer),
        |e0 AS (SELECT k // 8 AS src, k AS dst, k % 3 + 1 AS w
        |  FROM k WHERE k >= 8),
        |und AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b,
        |    sum(w) AS w
        |  FROM e0 WHERE src <> dst GROUP BY 1, 2),
        |lab AS (SELECT a, b, w, a // 64 AS ca, b // 64 AS cb FROM und),
        |mm AS (SELECT 2 * sum(w) AS w2 FROM und),
        |vol AS (SELECT c, sum(w) AS volume, count(DISTINCT node) AS n_nodes
        |  FROM (SELECT ca AS c, a AS node, w FROM lab
        |        UNION ALL SELECT cb AS c, b AS node, w FROM lab) GROUP BY c),
        |cut AS (SELECT c, sum(w) AS cut_weight FROM (
        |  SELECT ca AS c, w FROM lab WHERE ca <> cb
        |  UNION ALL SELECT cb AS c, w FROM lab WHERE ca <> cb) GROUP BY c)
        |SELECT vol.c AS community, CAST(n_nodes AS BIGINT) AS n_nodes,
        |  CAST(volume AS BIGINT) AS volume,
        |  CAST(coalesce(cut_weight, 0) AS BIGINT) AS cut_weight,
        |  CASE WHEN least(volume, mm.w2 - volume) = 0 THEN NULL
        |    ELSE CAST((coalesce(cut_weight, 0) * 1000000) //
        |      least(volume, mm.w2 - volume) AS BIGINT) END AS conductance_ppm
        |FROM vol LEFT JOIN cut ON vol.c = cut.c, mm
        |ORDER BY community""".stripMargin,
    "graph_modularity" ->
      """WITH k AS (SELECT CAST(c_custkey AS BIGINT) AS k FROM customer),
        |e0 AS (SELECT k // 8 AS src, k AS dst FROM k WHERE k >= 8),
        |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM e0 WHERE src <> dst),
        |lab AS (SELECT a, b, a // 64 AS ca, b // 64 AS cb FROM und),
        |mm AS (SELECT count(*) AS m FROM und),
        |intra AS (SELECT ca AS c, count(*) AS e_c FROM lab
        |  WHERE ca = cb GROUP BY 1),
        |deg AS (SELECT c, count(*) AS d_c FROM (
        |  SELECT ca AS c FROM lab UNION ALL SELECT cb AS c FROM lab) GROUP BY 1),
        |agg AS (SELECT count(*) AS n_communities,
        |  sum(coalesce(e_c, 0)) AS se, sum(d_c * d_c) AS sd2
        |  FROM deg LEFT JOIN intra USING (c)),
        |q AS (SELECT n_communities,
        |  1000000 * (4 * mm.m * se - sd2) AS num, 4 * mm.m * mm.m AS den,
        |  mm.m AS m_edges FROM agg, mm)
        |SELECT CAST(n_communities AS BIGINT) AS n_communities,
        |  CAST(m_edges AS BIGINT) AS m_edges,
        |  CAST(CASE WHEN num < 0 THEN -((-num) // den)
        |            ELSE num // den END AS BIGINT) AS q_ppm
        |FROM q""".stripMargin,
    "analytics_exact_quantiles" ->
      """WITH v AS (SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS v
        |  FROM lineitem),
        |r AS (SELECT v, CAST(row_number() OVER (ORDER BY v) AS BIGINT) AS rank
        |  FROM v),
        |n AS (SELECT count(*) AS n_rows FROM v),
        |q(q_ppm) AS (VALUES (10000), (250000), (500000), (750000), (990000))
        |SELECT CAST(q.q_ppm AS BIGINT) AS q_ppm, r.v AS value, r.rank AS rank,
        |  CAST(n.n_rows AS BIGINT) AS n_rows
        |FROM r, n, q
        |WHERE r.rank = greatest(1, (q.q_ppm * n.n_rows + 999999) // 1000000)
        |ORDER BY q_ppm""".stripMargin,
    "analytics_cusum_global" ->
      """WITH h AS (SELECT date_trunc('hour', ts) AS hour, count(*) AS n
        |  FROM events GROUP BY 1),
        |t AS (SELECT sum(n) // count(*) AS target FROM h),
        |p AS (SELECT hour, n,
        |    sum(n - t.target) OVER (ORDER BY hour
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_dev
        |  FROM h, t),
        |m AS (SELECT hour, n, cum_dev,
        |    min(cum_dev) OVER (ORDER BY hour
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mn
        |  FROM p)
        |SELECT hour, CAST(n AS BIGINT) AS n, CAST(cum_dev AS BIGINT) AS cum_dev,
        |  CAST(cum_dev - least(mn, 0) AS BIGINT) AS cusum
        |FROM m ORDER BY hour""".stripMargin,
    "e2e_seasonal_cusum" ->
      """WITH h AS (SELECT date_trunc('hour', ts) AS hour, count(*) AS n
        |  FROM events GROUP BY 1),
        |hh AS (SELECT hour, n, CAST(hour(hour) AS BIGINT) AS hod FROM h),
        |s AS (SELECT hod, sum(n) // count(n) AS baseline FROM hh GROUP BY 1),
        |j AS (SELECT hh.hour, hh.n, s.baseline FROM hh JOIN s USING (hod)),
        |p AS (SELECT hour, n, baseline,
        |    sum(n - baseline) OVER (ORDER BY hour
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_dev
        |  FROM j),
        |m AS (SELECT hour, n, baseline, cum_dev,
        |    min(cum_dev) OVER (ORDER BY hour
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mn
        |  FROM p)
        |SELECT hour, CAST(n AS BIGINT) AS n, CAST(baseline AS BIGINT) AS baseline,
        |  CAST(cum_dev AS BIGINT) AS cum_dev,
        |  CAST(cum_dev - least(mn, 0) AS BIGINT) AS cusum
        |FROM m ORDER BY hour""".stripMargin,
    "analytics_cohens_kappa" ->
      """WITH d AS (SELECT doc_id, source, lang FROM documents),
        |cen AS (SELECT source, lang, count(*) AS c FROM d GROUP BY 1, 2),
        |modal AS (SELECT source, lang AS modal_lang FROM (
        |  SELECT source, lang, row_number() OVER (PARTITION BY source
        |    ORDER BY c DESC, lang) AS rn FROM cen) WHERE rn = 1),
        |j AS (SELECT d.lang AS a, m.modal_lang AS b
        |  FROM d JOIN modal m USING (source)),
        |t AS (SELECT count(*) AS n,
        |  sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS agree FROM j),
        |ma AS (SELECT a AS l, count(*) AS na FROM j GROUP BY 1),
        |mb AS (SELECT b AS l, count(*) AS nb FROM j GROUP BY 1),
        |ch AS (SELECT sum(CAST(na AS HUGEINT) * nb) AS sab
        |  FROM ma JOIN mb USING (l)),
        |pp AS (SELECT n, (agree * 1000000) // n AS po_ppm,
        |  CAST((coalesce(sab, 0) * 1000000) // (CAST(n AS HUGEINT) * n)
        |    AS BIGINT) AS pe_ppm FROM t, ch)
        |SELECT CAST(n AS BIGINT) AS n, CAST(po_ppm AS BIGINT) AS po_ppm,
        |  pe_ppm,
        |  CASE WHEN pe_ppm >= 1000000 THEN NULL
        |    WHEN po_ppm >= pe_ppm THEN
        |      CAST(((po_ppm - pe_ppm) * 1000000) // (1000000 - pe_ppm) AS BIGINT)
        |    ELSE CAST(-(((pe_ppm - po_ppm) * 1000000) // (1000000 - pe_ppm))
        |      AS BIGINT) END AS kappa_x1e6
        |FROM pp""".stripMargin,
    "sample_ess" ->
      """WITH w AS (SELECT lang AS g, doc_id % 7 + 1 AS w FROM documents
        |  WHERE doc_id % 7 + 1 > 0),
        |a AS (SELECT g, count(*) AS n, sum(w) AS sum_w,
        |    sum(CAST(w AS HUGEINT) * w) AS sw2 FROM w GROUP BY g)
        |SELECT g, CAST(n AS BIGINT) AS n, CAST(sum_w AS BIGINT) AS sum_w,
        |  CAST((CAST(sum_w AS HUGEINT) * sum_w) // sw2 AS BIGINT) AS ess,
        |  CAST((((CAST(sum_w AS HUGEINT) * sum_w) // sw2) * 1000000) // n
        |    AS BIGINT) AS efficiency_ppm
        |FROM a ORDER BY g""".stripMargin,
    "analytics_group_quantiles" ->
      """WITH v AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v
        |  FROM documents),
        |r AS (SELECT g, v,
        |    CAST(row_number() OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS rank
        |  FROM v),
        |n AS (SELECT g, count(*) AS n_rows FROM v GROUP BY g),
        |q(q_ppm) AS (VALUES (250000), (500000), (900000), (990000))
        |SELECT r.g, CAST(q.q_ppm AS BIGINT) AS q_ppm, r.v AS value,
        |  r.rank AS rank, CAST(n.n_rows AS BIGINT) AS n_rows
        |FROM r JOIN n ON r.g = n.g, q
        |WHERE r.rank = greatest(1, (q.q_ppm * n.n_rows + 999999) // 1000000)
        |ORDER BY r.g, q_ppm""".stripMargin,
    "analytics_seasonal" ->
      """WITH b AS (SELECT event_type AS g, CAST(hour(ts) AS BIGINT) AS season,
        |    CAST(floor(value * 100) AS BIGINT) AS v FROM events),
        |idx AS (SELECT g, season, count(*) AS n, sum(v) AS s FROM b GROUP BY 1, 2),
        |ix AS (SELECT g, season, n, CAST(s // n AS BIGINT) AS seasonal FROM idx)
        |SELECT b.g, b.season, CAST(ix.n AS BIGINT) AS n, ix.seasonal,
        |  CAST(sum(abs(b.v - ix.seasonal)) // ix.n AS BIGINT) AS mean_abs_resid
        |FROM b JOIN ix ON b.g = ix.g AND b.season = ix.season
        |GROUP BY b.g, b.season, ix.n, ix.seasonal
        |ORDER BY b.g, b.season""".stripMargin,
    "analytics_mad_robust" ->
      """WITH b AS (SELECT event_type AS g,
        |    CAST(floor(value * 100) AS BIGINT) AS v FROM events),
        |r1 AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
        |    count(*) OVER (PARTITION BY g) AS n FROM b),
        |med AS (SELECT g, v AS median FROM r1 WHERE rn = (n + 1) // 2),
        |dev AS (SELECT b.g, abs(b.v - med.median) AS d, med.median
        |  FROM b JOIN med ON b.g = med.g),
        |r2 AS (SELECT g, d, row_number() OVER (PARTITION BY g ORDER BY d) AS rn,
        |    count(*) OVER (PARTITION BY g) AS n FROM dev),
        |mad AS (SELECT g, d AS mad FROM r2 WHERE rn = (n + 1) // 2)
        |SELECT dev.g, CAST(count(*) AS BIGINT) AS n,
        |  CAST(max(dev.median) AS BIGINT) AS median,
        |  CAST(max(mad.mad) AS BIGINT) AS mad,
        |  CAST(sum(CASE WHEN dev.d > 3 * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers
        |FROM dev JOIN mad ON dev.g = mad.g
        |GROUP BY dev.g ORDER BY dev.g""".stripMargin,
    "quality_benford" ->
      """WITH v AS (SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS v
        |  FROM orders WHERE floor(o_totalprice * 100) > 0),
        |d AS (SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS digit,
        |    count(*) AS n FROM v GROUP BY 1),
        |t AS (SELECT sum(n) AS t FROM d),
        |exp AS (SELECT * FROM (VALUES (1, 301030), (2, 176091), (3, 124939),
        |  (4, 96910), (5, 79181), (6, 66947), (7, 57992), (8, 51153),
        |  (9, 45757)) e(digit, expected_ppm))
        |SELECT d.digit, CAST(d.n AS BIGINT) AS n,
        |  CAST((d.n * 1000000) // t.t AS BIGINT) AS observed_ppm,
        |  CAST(exp.expected_ppm AS BIGINT) AS expected_ppm,
        |  CAST(abs((d.n * 1000000) // t.t - exp.expected_ppm) AS BIGINT) AS dev_ppm
        |FROM d CROSS JOIN t JOIN exp ON exp.digit = d.digit
        |ORDER BY d.digit""".stripMargin,
    "analytics_ohlc" ->
      """WITH b AS (SELECT event_type AS g, epoch_us(ts) // 3600000000 AS bucket,
        |    epoch_us(ts) AS t, event_id AS tie,
        |    CAST(floor(value * 100) AS BIGINT) AS v FROM events),
        |o AS (SELECT g, bucket, v,
        |    row_number() OVER (PARTITION BY g, bucket ORDER BY t, tie) AS rn_o,
        |    row_number() OVER (PARTITION BY g, bucket ORDER BY t DESC, tie DESC) AS rn_c
        |  FROM b),
        |ag AS (SELECT g, bucket, count(*) AS n, max(v) AS high, min(v) AS low
        |  FROM b GROUP BY 1, 2)
        |SELECT ag.g, CAST(ag.bucket AS BIGINT) AS bucket, CAST(ag.n AS BIGINT) AS n,
        |  oo.v AS open, ag.high, ag.low, cc.v AS close
        |FROM ag
        |JOIN (SELECT g, bucket, v FROM o WHERE rn_o = 1) oo USING (g, bucket)
        |JOIN (SELECT g, bucket, v FROM o WHERE rn_c = 1) cc USING (g, bucket)
        |ORDER BY ag.g, ag.bucket""".stripMargin,
    "analytics_rank_normalize" ->
      """WITH b AS (SELECT event_type AS g, event_id AS tie,
        |    CAST(floor(value * 100) AS BIGINT) AS v FROM events),
        |r AS (SELECT g, tie, v,
        |    CAST(row_number() OVER (PARTITION BY g ORDER BY v, tie) AS BIGINT) AS rank,
        |    count(*) OVER (PARTITION BY g) AS n FROM b)
        |SELECT g, tie, v, rank,
        |  CAST(CASE WHEN n = 1 THEN 0
        |    ELSE ((rank - 1) * 1000000) // (n - 1) END AS BIGINT) AS pct_ppm
        |FROM r ORDER BY g, tie""".stripMargin,
    "corpus_source_overlap" ->
      s"""WITH $ShingleTermsSql,
         |gt AS (SELECT DISTINCT d.source AS g, dt.term
         |  FROM dt JOIN documents d USING (doc_id)),
         |sizes AS (SELECT g, count(*) AS sz FROM gt GROUP BY g),
         |inter AS (SELECT x.g AS g_a, y.g AS g_b, count(*) AS n_shared
         |  FROM gt x JOIN gt y ON x.term = y.term AND x.g < y.g GROUP BY 1, 2)
         |SELECT g_a, g_b, CAST(a.sz AS BIGINT) AS n_a, CAST(b.sz AS BIGINT) AS n_b,
         |  CAST(n_shared AS BIGINT) AS n_shared,
         |  CAST((n_shared * 1000000) // (a.sz + b.sz - n_shared) AS BIGINT)
         |    AS jaccard_ppm
         |FROM inter JOIN sizes a ON a.g = inter.g_a
         |           JOIN sizes b ON b.g = inter.g_b
         |ORDER BY g_a, g_b""".stripMargin,
    "analytics_corr_matrix" ->
      """WITH b AS (SELECT CAST(l_quantity AS BIGINT) AS q,
        |    CAST(floor(l_discount * 1000) AS BIGINT) AS d,
        |    CAST(floor(l_tax * 1000) AS BIGINT) AS x FROM lineitem),
        |mom AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(q) AS HUGEINT) AS sq, CAST(sum(d) AS HUGEINT) AS sd,
        |    CAST(sum(x) AS HUGEINT) AS sx,
        |    CAST(sum(q*q) AS HUGEINT) AS pqq, CAST(sum(q*d) AS HUGEINT) AS pqd,
        |    CAST(sum(q*x) AS HUGEINT) AS pqx, CAST(sum(d*d) AS HUGEINT) AS pdd,
        |    CAST(sum(d*x) AS HUGEINT) AS pdx, CAST(sum(x*x) AS HUGEINT) AS pxx
        |  FROM b),
        |p AS (
        |  SELECT 'qty' AS m_a, 'disc_x1e3' AS m_b, n,
        |    n*pqd - sq*sd AS num, n*pqq - sq*sq AS d1, n*pdd - sd*sd AS d2 FROM mom
        |  UNION ALL SELECT 'qty', 'tax_x1e3', n,
        |    n*pqx - sq*sx, n*pqq - sq*sq, n*pxx - sx*sx FROM mom
        |  UNION ALL SELECT 'disc_x1e3', 'tax_x1e3', n,
        |    n*pdx - sd*sx, n*pdd - sd*sd, n*pxx - sx*sx FROM mom)
        |SELECT m_a, m_b, CAST(n AS BIGINT) AS n,
        |  CAST(CASE WHEN d1 * d2 = 0 THEN 0
        |    ELSE (num * num * 1000000) // (d1 * d2) END AS BIGINT) AS corr2_ppm,
        |  CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END AS BIGINT)
        |    AS corr_sign
        |FROM p ORDER BY m_a, m_b""".stripMargin,
    "scd2_audit" ->
      """WITH iv AS (SELECT user_id, epoch_us(ts) // 1000000 AS s,
        |    CASE WHEN event_id % 97 = 0 THEN NULL
        |         ELSE epoch_us(ts) // 1000000 + 1800 END AS e
        |  FROM events),
        |led AS (SELECT user_id, s, e,
        |    lead(s, 1) OVER (PARTITION BY user_id
        |      ORDER BY s, e NULLS LAST) AS nf
        |  FROM iv)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN nf IS NOT NULL AND e IS NOT NULL AND nf < e
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_overlaps,
        |  CAST(sum(CASE WHEN nf IS NOT NULL AND e IS NOT NULL AND nf > e
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
        |  CAST(sum(CASE WHEN nf IS NOT NULL AND e IS NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_open_mid
        |FROM led GROUP BY user_id ORDER BY user_id""".stripMargin,
    "sample_mixture_schedule" ->
      """WITH d AS (SELECT source AS g, doc_id AS id,
        |    CAST((ascii(right(source, 1)) % 3) + 1 AS BIGINT) AS w FROM documents),
        |wg AS (SELECT g, max(w) AS w FROM d GROUP BY g),
        |tw AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM wg),
        |p AS (SELECT d.g, d.id, CAST(row_number() OVER (PARTITION BY d.g
        |    ORDER BY CAST(('0x' || substr(md5(CAST(d.id AS VARCHAR)), 1, 14)) AS BIGINT),
        |    d.id) AS BIGINT) AS pos_in_group FROM d),
        |v AS (SELECT p.g, p.id, p.pos_in_group,
        |    CAST(((2 * p.pos_in_group - 1) * tw.tw) // (2 * wg.w) AS BIGINT)
        |      AS virtual_pos
        |  FROM p JOIN wg ON wg.g = p.g CROSS JOIN tw)
        |SELECT g, id, pos_in_group, virtual_pos,
        |  CAST(row_number() OVER (ORDER BY virtual_pos, g, pos_in_group)
        |    AS BIGINT) AS epoch_rank
        |FROM v ORDER BY epoch_rank""".stripMargin,
    "analytics_did" ->
      """WITH b AS (SELECT CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS tr,
        |    CASE WHEN hour(ts) >= 12 THEN 1 ELSE 0 END AS po,
        |    CAST(floor(value * 100) AS BIGINT) AS v FROM events),
        |a AS (SELECT
        |  sum(CASE WHEN tr=0 AND po=0 THEN 1 ELSE 0 END) AS n00,
        |  sum(CASE WHEN tr=0 AND po=0 THEN v ELSE 0 END) AS s00,
        |  sum(CASE WHEN tr=0 AND po=1 THEN 1 ELSE 0 END) AS n01,
        |  sum(CASE WHEN tr=0 AND po=1 THEN v ELSE 0 END) AS s01,
        |  sum(CASE WHEN tr=1 AND po=0 THEN 1 ELSE 0 END) AS n10,
        |  sum(CASE WHEN tr=1 AND po=0 THEN v ELSE 0 END) AS s10,
        |  sum(CASE WHEN tr=1 AND po=1 THEN 1 ELSE 0 END) AS n11,
        |  sum(CASE WHEN tr=1 AND po=1 THEN v ELSE 0 END) AS s11 FROM b),
        |m AS (SELECT CAST(n00 AS BIGINT) AS n00, CAST(n01 AS BIGINT) AS n01,
        |  CAST(n10 AS BIGINT) AS n10, CAST(n11 AS BIGINT) AS n11,
        |  CAST(CASE WHEN n00=0 THEN 0 ELSE (s00*10000)//n00 END AS BIGINT) AS m00_x1e4,
        |  CAST(CASE WHEN n01=0 THEN 0 ELSE (s01*10000)//n01 END AS BIGINT) AS m01_x1e4,
        |  CAST(CASE WHEN n10=0 THEN 0 ELSE (s10*10000)//n10 END AS BIGINT) AS m10_x1e4,
        |  CAST(CASE WHEN n11=0 THEN 0 ELSE (s11*10000)//n11 END AS BIGINT) AS m11_x1e4
        |  FROM a)
        |SELECT *, CAST((m11_x1e4 - m10_x1e4) - (m01_x1e4 - m00_x1e4) AS BIGINT)
        |  AS did_x1e4 FROM m""".stripMargin,
    "analytics_rfm" ->
      """WITH per AS (SELECT o_custkey AS c, max(epoch_us(o_orderdate)) AS r,
        |    count(*) AS f, sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS m
        |  FROM orders GROUP BY 1),
        |w AS (SELECT c, count(*) OVER () AS n,
        |    CAST(row_number() OVER (ORDER BY r, c) AS BIGINT) AS rank_r,
        |    CAST(row_number() OVER (ORDER BY f, c) AS BIGINT) AS rank_f,
        |    CAST(row_number() OVER (ORDER BY m, c) AS BIGINT) AS rank_m
        |  FROM per)
        |SELECT CAST(((rank_r - 1) * 5) // n + 1 AS BIGINT) AS r_q,
        |  CAST(((rank_f - 1) * 5) // n + 1 AS BIGINT) AS f_q,
        |  CAST(((rank_m - 1) * 5) // n + 1 AS BIGINT) AS m_q,
        |  CAST(count(*) AS BIGINT) AS n_customers
        |FROM w GROUP BY 1, 2, 3 ORDER BY r_q, f_q, m_q""".stripMargin,
    "graph_robustness_sweep" ->
      s"""WITH RECURSIVE $AncestryEdgesSql,
         |e8 AS MATERIALIZED (SELECT src, dst FROM e WHERE dst < 800),
         |n8 AS MATERIALIZED (SELECT DISTINCT n AS node FROM (
         |  SELECT src AS n FROM e8 UNION ALL SELECT dst AS n FROM e8)),
         |${percolationBlock(400000L)},
         |${percolationBlock(700000L)}
         |SELECT * FROM sm400000 UNION ALL SELECT * FROM sm700000
         |ORDER BY rate_ppm""".stripMargin,
    "join_cidr_contain" ->
      """WITH i AS (SELECT c_custkey AS id,
        |    (c_custkey * 2654435761) % 4294967296 AS ip FROM customer),
        |n AS (SELECT s_suppkey AS net_id,
        |    ((s_suppkey * 40503) % 65536) * 65536 AS base,
        |    8 + (s_suppkey % 9) AS prefix_len FROM supplier)
        |SELECT id, CAST(ip AS BIGINT) AS ip, net_id, CAST(base AS BIGINT) AS base,
        |  CAST(prefix_len AS BIGINT) AS prefix_len
        |FROM i, n
        |WHERE ip >= base AND ip < base + (CAST(1 AS BIGINT) << (32 - prefix_len))
        |ORDER BY id, net_id""".stripMargin,
    "analytics_pareto_point" ->
      """WITH per AS (SELECT o_custkey AS e,
        |    sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS v
        |  FROM orders GROUP BY 1),
        |r AS (SELECT e, v,
        |    sum(v) OVER () AS total,
        |    sum(v) OVER (ORDER BY v DESC, e ASC ROWS UNBOUNDED PRECEDING) AS cum,
        |    CAST(row_number() OVER (ORDER BY v DESC, e ASC) AS BIGINT) AS k
        |  FROM per)
        |SELECT CAST(count(*) AS BIGINT) AS n_entities,
        |  CAST(max(total) AS BIGINT) AS total,
        |  CAST(coalesce(min(CASE WHEN cum * 1000000 >= 800000 * total
        |    THEN k END), 0) AS BIGINT) AS k_threshold,
        |  CAST((coalesce(min(CASE WHEN cum * 1000000 >= 800000 * total
        |    THEN k END), 0) * 1000000) // count(*) AS BIGINT) AS k_share_ppm
        |FROM r""".stripMargin,
    "graph_incremental_cc" ->
      """WITH RECURSIVE c AS (SELECT CAST(c_custkey AS BIGINT) AS k FROM customer),
        |be AS MATERIALIZED (
        |  SELECT k // 2 AS a, k AS b FROM c WHERE k >= 2 AND k < 1000 AND k % 5 <> 0
        |  UNION ALL
        |  SELECT k // 4, k FROM c WHERE k >= 4 AND k < 1000 AND k % 5 <> 0),
        |ne AS MATERIALIZED (SELECT k AS a, k + 1 AS b FROM c
        |  WHERE k % 97 = 0 AND k + 1 < 1000 AND k > 0),
        |ae AS MATERIALIZED (SELECT a, b FROM be UNION ALL SELECT a, b FROM ne),
        |nodes AS MATERIALIZED (SELECT DISTINCT n FROM (
        |  SELECT a AS n FROM ae UNION ALL SELECT b AS n FROM ae)),
        |und AS MATERIALIZED (SELECT DISTINCT a, b FROM (
        |  SELECT a, b FROM ae UNION ALL SELECT b, a FROM ae) WHERE a <> b),
        |reach AS (
        |  SELECT a AS node, b AS reachable FROM und
        |  UNION
        |  SELECT rr.node, u.b FROM reach rr JOIN und u ON rr.reachable = u.a)
        |SELECT n.n AS node,
        |  CAST(least(n.n, coalesce(min(rr.reachable), n.n)) AS BIGINT) AS component
        |FROM nodes n LEFT JOIN reach rr ON rr.node = n.n
        |GROUP BY n.n ORDER BY node""".stripMargin,
    "analytics_cohort_ltv" ->
      """WITH up AS (SELECT user_id AS u, epoch_us(ts) // 604800000000 AS pd,
        |    CAST(floor(value * 100) AS BIGINT) AS v FROM events),
        |co AS (SELECT u, min(pd) AS cohort_pd FROM up GROUP BY u),
        |sz AS (SELECT cohort_pd, count(*) AS n_users_cohort FROM co GROUP BY 1),
        |cells AS (SELECT co.cohort_pd, up.pd - co.cohort_pd AS offset_pd,
        |    sum(v) AS cell_v FROM up JOIN co USING (u) GROUP BY 1, 2),
        |cum AS (SELECT cohort_pd, offset_pd,
        |    sum(cell_v) OVER (PARTITION BY cohort_pd ORDER BY offset_pd
        |      ROWS UNBOUNDED PRECEDING) AS cum_value FROM cells)
        |SELECT CAST(c.cohort_pd AS BIGINT) AS cohort_pd,
        |  CAST(c.offset_pd AS BIGINT) AS offset_pd,
        |  CAST(s.n_users_cohort AS BIGINT) AS n_users_cohort,
        |  CAST(c.cum_value AS BIGINT) AS cum_value,
        |  CAST(c.cum_value // s.n_users_cohort AS BIGINT) AS ltv_per_user
        |FROM cum c JOIN sz s USING (cohort_pd)
        |ORDER BY cohort_pd, offset_pd""".stripMargin,
    "sample_importance_weights" ->
      """WITH s AS (SELECT lang AS cat, count(*) AS n_source FROM documents GROUP BY 1),
        |t AS (SELECT lang AS cat, count(*) AS n_target FROM documents
        |  WHERE doc_id % 3 = 0 GROUP BY 1),
        |tot AS (SELECT (SELECT sum(n_source) FROM s) AS ns,
        |  (SELECT sum(n_target) FROM t) AS nt)
        |SELECT coalesce(s.cat, t.cat) AS cat,
        |  CAST(coalesce(s.n_source, 0) AS BIGINT) AS n_source,
        |  CAST(coalesce(t.n_target, 0) AS BIGINT) AS n_target,
        |  CAST(CASE WHEN s.n_source IS NULL THEN NULL
        |    ELSE (coalesce(t.n_target, 0) * tot.ns * 1000000)
        |         // (s.n_source * tot.nt) END AS BIGINT) AS weight_x1e6
        |FROM s FULL OUTER JOIN t ON s.cat = t.cat CROSS JOIN tot
        |ORDER BY cat""".stripMargin,
    "multimodal_patch_grid" ->
      """WITH m AS (SELECT doc_id, n_chars FROM documents WHERE n_chars > 0),
        |p AS (SELECT doc_id, n_chars,
        |  unnest(range(0, (n_chars - 1) // 32 + 1)) AS patch_idx FROM m)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(patch_idx AS BIGINT) AS patch_idx,
        |  CAST(patch_idx * 32 AS BIGINT) AS byte_offset,
        |  CAST(least(32, n_chars - patch_idx * 32) AS BIGINT) AS len
        |FROM p ORDER BY doc_id, patch_idx""".stripMargin,
    "graph_widest_path" ->
      s"""WITH RECURSIVE $AncestryEdgesSql,
         |ec AS MATERIALIZED (SELECT src, dst, (dst * 7) % 20 + 1 AS cap FROM e),
         |w AS (
         |  SELECT CAST(1 AS BIGINT) AS node, CAST(1000000 AS BIGINT) AS wd
         |  UNION
         |  SELECT ec.dst, CAST(least(w.wd, ec.cap) AS BIGINT)
         |  FROM w JOIN ec ON w.node = ec.src
         |)
         |SELECT node, CAST(max(wd) AS BIGINT) AS width
         |FROM w GROUP BY node ORDER BY node""".stripMargin,
    "e2e_coverage_select" -> GreedyCoverageOracle,
    "bitemporal_read" ->
      """WITH o AS (SELECT o_orderkey, epoch_us(o_orderdate) // 1000000 AS vs,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS p FROM orders),
        |h AS (SELECT o_orderkey, vs AS valid_from, vs + 2592000 AS valid_to,
        |    vs AS tx_from, p AS price_x100 FROM o
        |  UNION ALL
        |  SELECT o_orderkey, vs, vs + 5184000, vs + 864000, p + 500
        |  FROM o WHERE o_orderkey % 3 = 0),
        |f AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey, valid_from
        |    ORDER BY tx_from DESC) AS rn
        |  FROM h WHERE tx_from <= 801964800)
        |SELECT o_orderkey, CAST(valid_from AS BIGINT) AS valid_from,
        |  CAST(valid_to AS BIGINT) AS valid_to, CAST(tx_from AS BIGINT) AS tx_from,
        |  price_x100
        |FROM f WHERE rn = 1 AND valid_from <= 801964800 AND 801964800 < valid_to
        |ORDER BY o_orderkey""".stripMargin,
    "sketch_hll_windowed" ->
      """WITH parts AS (SELECT event_type AS g, epoch_us(ts) // 3600000000 AS b,
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 14)) AS BIGINT) % 64 AS bucket,
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 14)) AS BIGINT) // 64 AS rem
        |  FROM events),
        |anchors AS (SELECT DISTINCT g, b FROM parts),
        |regs AS (SELECT a.g, a.b, p.bucket,
        |    max(51 - CASE WHEN p.rem = 0 THEN 0 ELSE length(bin(p.rem)) END) AS r
        |  FROM anchors a JOIN parts p ON p.g = a.g AND p.b BETWEEN a.b - 2 AND a.b
        |  GROUP BY a.g, a.b, p.bucket),
        |grid AS (SELECT a.g, a.b, gb.bucket FROM anchors a
        |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS bucket) gb),
        |filled AS (SELECT g2.g, g2.b, coalesce(regs.r, 0) AS r
        |  FROM grid g2 LEFT JOIN regs
        |    ON regs.g = g2.g AND regs.b = g2.b AND regs.bucket = g2.bucket),
        |sums AS (SELECT g, b,
        |    CAST(sum(CAST(1 AS BIGINT) << (51 - r)) AS BIGINT) AS hs
        |  FROM filled GROUP BY g, b)
        |SELECT g, CAST(b AS BIGINT) AS bucket,
        |  CAST(floor(CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE)
        |             * CAST(2251799813685248 AS DOUBLE) / hs) AS BIGINT)
        |    AS est_distinct
        |FROM sums ORDER BY g, bucket""".stripMargin,
    "graph_rpq" ->
      """WITH RECURSIVE c AS (SELECT CAST(c_custkey AS BIGINT) AS k FROM customer),
        |le AS MATERIALIZED (
        |  SELECT k // 2 AS src, k AS dst, 'half' AS label FROM c WHERE k >= 2
        |  UNION ALL
        |  SELECT k // 4, k, 'quarter' FROM c WHERE k >= 4),
        |nfa(s_from, label, s_to) AS (VALUES (0, 'half', 0), (0, 'quarter', 1),
        |  (1, 'half', 1), (1, 'quarter', 1)),
        |v AS (
        |  SELECT CAST(1 AS BIGINT) AS node, CAST(0 AS BIGINT) AS state
        |  UNION
        |  SELECT le.dst, CAST(t.s_to AS BIGINT)
        |  FROM v JOIN le ON v.node = le.src
        |         JOIN nfa t ON t.s_from = v.state AND t.label = le.label
        |)
        |SELECT DISTINCT node FROM v WHERE state = 1 ORDER BY node""".stripMargin,
    "text_trigram_search" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(strpos(text, 'merge hash') AS BIGINT) AS pos
        |FROM documents WHERE strpos(text, 'merge hash') > 0
        |ORDER BY doc_id""".stripMargin,
    "embed_dim_drift" ->
      """WITH q AS (SELECT CAST(label AS BIGINT) % 2 AS par,
        |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS qx,
        |    CAST(generate_subscripts(embedding, 1) AS BIGINT) - 1 AS dim
        |  FROM embeddings),
        |a AS (SELECT dim, CAST(count(*) AS BIGINT) AS n_a,
        |    CAST(floor(1000000.0 * sum(qx) / count(*)) AS BIGINT) AS mean_a_x1e6
        |  FROM q WHERE par = 0 GROUP BY dim),
        |b AS (SELECT dim, CAST(count(*) AS BIGINT) AS n_b,
        |    CAST(floor(1000000.0 * sum(qx) / count(*)) AS BIGINT) AS mean_b_x1e6
        |  FROM q WHERE par = 1 GROUP BY dim)
        |SELECT a.dim, a.n_a, b.n_b, a.mean_a_x1e6, b.mean_b_x1e6,
        |  CAST(abs(a.mean_a_x1e6 - b.mean_b_x1e6) AS BIGINT) AS delta_x1e6
        |FROM a JOIN b ON a.dim = b.dim ORDER BY a.dim""".stripMargin,
    "graph_temporal_reach" ->
      s"""WITH RECURSIVE $AncestryEdgesSql,
         |et AS MATERIALIZED (SELECT src, dst, (dst * 37) % 100 AS t FROM e),
         |r AS (
         |  SELECT CAST(1 AS BIGINT) AS node, CAST(0 AS BIGINT) AS a
         |  UNION
         |  SELECT et.dst, CAST(et.t AS BIGINT)
         |  FROM r JOIN et ON r.node = et.src AND et.t >= r.a
         |)
         |SELECT node, CAST(min(a) AS BIGINT) AS arrival
         |FROM r GROUP BY node ORDER BY node""".stripMargin,
    "text_linear_classifier" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |s AS (SELECT doc_id,
        |    ((CAST(('0x' || substr(md5(tok), 1, 14)) AS BIGINT) % 4096)
        |     * 2654435761) % 2001 - 1000 AS wt
        |  FROM w WHERE tok <> '')
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(wt) AS BIGINT) AS margin, sum(wt) > 0 AS keep
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_ngram_novelty" ->
      s"""WITH $ShingleTermsSql,
         |dd AS (SELECT DISTINCT doc_id, term FROM dt),
         |rk AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY
         |    CAST(('0x' || substr(md5('nv:' || CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT),
         |    doc_id) AS BIGINT) AS rank
         |  FROM (SELECT DISTINCT doc_id FROM dd)),
         |wr AS (SELECT dd.doc_id, dd.term, rk.rank FROM dd JOIN rk USING (doc_id)),
         |fs AS (SELECT term, min(rank) AS fr FROM wr GROUP BY term)
         |SELECT CAST(wr.doc_id AS BIGINT) AS doc_id, wr.rank,
         |  CAST(count(*) AS BIGINT) AS n_terms,
         |  CAST(sum(CASE WHEN fs.fr = wr.rank THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         |  CAST((sum(CASE WHEN fs.fr = wr.rank THEN 1 ELSE 0 END) * 1000000)
         |       // count(*) AS BIGINT) AS novelty_ppm
         |FROM wr JOIN fs USING (term)
         |GROUP BY wr.doc_id, wr.rank ORDER BY wr.doc_id""".stripMargin,
    "sim_matryoshka_recall" ->
      """WITH qv AS (
        |  SELECT CAST(vec_id AS BIGINT) AS vec_id,
        |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS q
        |  FROM embeddings),
        |qn AS (SELECT vec_id, q,
        |  CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS norm2 FROM qv),
        |qh AS (SELECT vec_id, list_slice(q, 1, 32) AS q FROM qv),
        |qhn AS (SELECT vec_id, q,
        |  CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS norm2 FROM qh),
        |bscored AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    CAST(floor(1000000.0 *
        |      CAST(list_sum(list_transform(list_zip(a.q, b.q), p -> p[1]*p[2])) AS BIGINT)
        |      / sqrt(CAST(a.norm2 * b.norm2 AS DOUBLE))) AS BIGINT) AS cos_x1e6
        |  FROM qn a JOIN qn b ON a.vec_id < 10 AND a.vec_id <> b.vec_id),
        |truth AS (SELECT query_id, neighbor_id FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos_x1e6 DESC, neighbor_id ASC) AS rank FROM bscored)
        |  WHERE rank <= 3),
        |hscored AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    CAST(floor(1000000.0 *
        |      CAST(list_sum(list_transform(list_zip(a.q, b.q), p -> p[1]*p[2])) AS BIGINT)
        |      / sqrt(CAST(a.norm2 * b.norm2 AS DOUBLE))) AS BIGINT) AS cos_x1e6
        |  FROM qhn a JOIN qhn b ON a.vec_id < 10 AND a.vec_id <> b.vec_id),
        |got AS (SELECT query_id, neighbor_id FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos_x1e6 DESC, neighbor_id ASC) AS rank FROM hscored)
        |  WHERE rank <= 3),
        |hit AS (SELECT t.query_id, t.neighbor_id
        |  FROM truth t JOIN got USING (query_id, neighbor_id))
        |SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
        |  CAST((SELECT count(*) FROM hit) AS BIGINT) AS n_hit,
        |  CAST((1000000 * (SELECT count(*) FROM hit)) //
        |       (SELECT count(*) FROM truth) AS BIGINT) AS recall_x1e6""".stripMargin,
  )
}
