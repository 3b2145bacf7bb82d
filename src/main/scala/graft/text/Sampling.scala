package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions.md5_prefix64
import graft.Lineage._

/** Deterministic sampling for training-data curation: membership is a
  * pure function of the row key (56-bit content hash mod 1e6 against a
  * parts-per-million rate), so samples are reproducible across runs,
  * partitionings, and engines — no RNG state, no seed plumbing, and a
  * row keeps or loses membership only if its key changes. The standard
  * corpus-mixing primitive (sample per quality band / language / source
  * at different rates) as one codegen'd filter, no shuffle. */
object Sampling {

  /** keep(key) iff hash(key) mod 1e6 < ratePpm. */
  def keyInSample(key: Column, ratePpm: Column): Column =
    md5_prefix64(key.cast("string")) % 1000000L < ratePpm

  /** Uniform deterministic sample at ratePpm parts-per-million. */
  def deterministic(df: DataFrame, keyCol: String, ratePpm: Long): DataFrame =
    df.filter(keyInSample(col(keyCol), lit(ratePpm)))

  /** Stratified deterministic sample: each row's stratum looks up its
    * own rate; strata missing from `ratesPpm` default to 0 (dropped) —
    * an explicit allowlist, mirroring how corpus mixing specs name every
    * source they keep. One broadcastable CASE expression, no shuffle. */
  def stratified(df: DataFrame, keyCol: String, stratumCol: Column,
                 ratesPpm: Map[String, Long]): DataFrame = {
    val rate = ratesPpm.foldLeft(lit(0L)) { case (acc, (stratum, ppm)) =>
      when(stratumCol === stratum, lit(ppm)).otherwise(acc)
    }
    df.filter(keyInSample(col(keyCol), rate))
  }

  /** Temperature-flattened corpus mixing at α = 0.5: each stratum keeps
    * rows at a rate proportional to 1/sqrt(its count), scaled so the
    * rarest stratum keeps everything — the standard low-resource
    * upweighting move (p_s ∝ n_s^α) with the exponent fixed at the sqrt
    * point because sqrt and division are correctly-rounded IEEE ops
    * (identical in any engine), where a general pow() is not. Rates are
    * derived from the data in the same plan (one count agg broadcast
    * back); membership is the usual hash of the key — deterministic,
    * no RNG. */
  def temperatureResample(df: DataFrame, keyCol: String,
                          stratumCol: Column): DataFrame = {
    val counts = df.groupBy(stratumCol.as("_stratum")).agg(count(lit(1)).as("_n"))
    val minN = counts.agg(min(col("_n")).as("_minn"))
    val rates = counts.crossJoin(broadcast(minN))
      .select(col("_stratum"),
        floor(lit(1000000.0) * sqrt(col("_minn").cast("double")) /
          sqrt(col("_n").cast("double"))).cast("long").as("_rate"))
    df.join(broadcast(rates), stratumCol === col("_stratum"))
      .filter(md5_prefix64(col(keyCol).cast("string")) % 1000000L < col("_rate"))
      .drop("_stratum", "_rate")
  }

  /** Deterministic weighted top-n sample (priority sampling in the
    * Efraimidis–Spirakis shape with the RNG replaced by the key hash):
    * each row draws a reproducible uniform u = hash(key) mod 1e6 and is
    * ranked by priority = u·1e6 div weight — smaller wins, so a row's
    * keep probability scales with its weight, and the chosen subset is a
    * pure function of (keys, weights). Exact integer arithmetic
    * (u·1e6 ≤ 1e12 ≪ 2^63); ties break on the key for a strict total
    * order.
    *
    * Scale: orderBy+limit plans as TakeOrderedAndProject — per-partition
    * top-n heaps merged on the driver, no global sort materialization. */
  def weightedTopK(df: DataFrame, keyCol: String, weightCol: Column,
                   n: Int): DataFrame = {
    df.withColumn("_u", md5_prefix64(col(keyCol).cast("string")) % 1000000L)
      .withColumn("_w", weightCol.cast("long"))
      // zero/negative weight = zero selection probability; dropping the
      // row (rather than ANSI-erroring on `div 0`) matches that reading
      .filter(col("_w") > 0L)
      .withColumn("_prio", expr("_u * 1000000 div _w"))
      .orderBy(col("_prio").asc, col(keyCol).asc)
      .limit(n)
      .drop("_u", "_w", "_prio")
  }

  /** Per-group deterministic weighted sample: [[weightedTopK]]'s
    * Efraimidis–Spirakis priority draw, but the top-k is taken WITHIN
    * each group — "keep the k best-weighted docs per source/language",
    * the stratified curation move (a global weighted top-k would let
    * one hot source crowd out the rest). Priorities are a pure function
    * of (key, weight); ranking runs through the GROUPED
    * [[graft.operators.GlobalOrder]] prefix-sum (bucketed within each
    * group by the priority's exact per-group min/max), so groups
    * distribute AND a single dominant group cannot degenerate to a
    * one-task sort the way a plain per-group window would;
    * zero/negative weights drop (zero selection probability). Output:
    * input columns + `sample_rank` (1-based within group). */
  def weightedTopKPerGroup(df: DataFrame, keyCol: String,
                           groupCol: Column, weightCol: Column,
                           k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val prioritized = df
      .withColumn("_u", md5_prefix64(col(keyCol).cast("string")) % 1000000L)
      .withColumn("_w", weightCol.cast("long"))
      .filter(col("_w") > 0L)
      .withColumn("_prio", expr("_u * 1000000 div _w"))
    // skew note: `_prio` = hash(key)·10⁶ div w — hash-spread for any
    // realistic weight range; concentration (many rows collapsing to
    // prio 0) needs weights ≳ 10¹², far past token-count/byte-size
    // weights. Documented bound, not a reachable hot key.
    graft.operators.GlobalOrder.withRunningAggs(prioritized,
        col("_prio"), Seq(col(keyCol).asc),
        rankName = Some("sample_rank"), groupCols = Seq(groupCol))
      .filter(col("sample_rank") <= k)
      .drop("_u", "_w", "_prio")
  }

  /** Deterministic train/validation/test split: the key's hash draw
    * u = hash(key) mod 1e6 is cut against cumulative ppm widths, so every
    * row lands in exactly one named split, assignment is a pure function
    * of the key (stable under reshuffles, re-runs, corpus growth — a doc
    * never migrates between splits unless its key changes, the property
    * that keeps eval sets uncontaminated across corpus versions), and
    * expected proportions match the widths. Zero shuffles — one codegen'd
    * CASE per row. Widths must sum to exactly 1e6 (every row must have a
    * home). */
  def hashSplit(df: DataFrame, keyCol: String,
                splits: Seq[(String, Long)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "hashSplit needs at least one split with positive ppm width")
    require(splits.map(_._2).sum == 1000000L,
      s"split widths must sum to 1000000 ppm, got ${splits.map(_._2).sum}")
    val u = md5_prefix64(col(keyCol).cast("string")) % 1000000L
    val cuts = splits.scanLeft(0L)(_ + _._2).tail.zip(splits.map(_._1))
    // the last threshold is exactly 1e6, so the fold's base case is
    // unreachable; name it after the last split to keep the CASE total
    val assigned = cuts.init.foldRight(lit(cuts.last._2): org.apache.spark.sql.Column) {
      case ((cut, name), acc) => when(u < cut, lit(name)).otherwise(acc)
    }
    df.withColumn("split", assigned)
  }

  /** Leakage-safe train/eval split: the hash key is the document's
    * near-dup COMPONENT (canonical id), not the document itself — every
    * near-duplicate cluster lands in ONE split by construction, so the
    * eval set can never contain a near-copy of a training document (the
    * contamination mode a per-document hash split cannot prevent).
    * `pairs` is any near-dup pair set (MinHash-LSH, SimHash, semantic);
    * documents in no pair key by their own id. Assignment keeps
    * [[hashSplit]]'s stability (pure function of the canonical id), with
    * one caveat the caller owns: corpus growth that MERGES two clusters
    * can move the merged cluster's members to the surviving canonical
    * id's split. Cost over [[hashSplit]]: the pair→component fixpoint
    * (O(log diameter) rounds) + one join — no all-pairs anything. */
  def componentSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
                     splits: Seq[(String, Long)]): DataFrame = {
    val comp = graft.graph.Fixpoint.connectedComponents(pairs)
    val keyed = docs
      .join(comp.select(col("node").as(idCol), col("component").as("_cmp")),
        Seq(idCol), "left")
      .withColumn("_grp", coalesce(col("_cmp"), col(idCol).cast("long")))
      .drop("_cmp")
    hashSplit(keyed, "_grp", splits).drop("_grp")
  }

  /** Deterministic contrastive negative sampling: for every anchor row,
    * `k` negatives drawn from OTHER label strata — the pair-generation
    * step of contrastive embedding training, reproducible anywhere (no
    * RNG, no global ordering). Draw j of an anchor targets the label
    * (anchor's label index + j) mod nLabels and, within that stratum,
    * the row whose hash-rank equals hash(anchor, j) mod stratum size.
    *
    * Scale shape: ranks come from label-PARTITIONED windows (never a
    * global single-partition sort); the label directory is a tiny
    * broadcast; selection is one equi-join on (label, rank). Requires
    * 1 <= k < number of labels so a draw can never land on the anchor's
    * own stratum; rows with a null label are excluded (they could never
    * match the stratum joins). */
  def negativePairs(df: DataFrame, idCol: String, labelCol: String,
                    k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k=$k: need at least one negative per anchor " +
      "(sequence(1, 0) would count DOWN and emit same-stratum draws)")
    // null labels are excluded outright: they would inflate the label
    // directory but never match the equi-joins, silently shorting
    // non-null anchors of draws that target the null stratum
    val items = df.select(col(idCol).cast("long").as("anchor_id"),
        col(labelCol).as("label"))
      .filter(col("label").isNotNull)
    val ranked = items.withColumn("rk",
        row_number().over(Window.partitionBy(col("label"))
          .orderBy(md5_prefix64(col("anchor_id").cast("string")).asc,
            col("anchor_id").asc)) - 1)
      .pin
    // label directory: index + size per label — label-cardinality rows,
    // the one table small enough for an unpartitioned window
    val labels = ranked.groupBy(col("label")).agg(count(lit(1)).as("n"))
      .withColumn("lidx",
        row_number().over(graft.operators.GlobalOrder.boundedWindow(
          col("label"), col("label"))) - 1)
      .pin
    val nLabels = labels.count()
    require(k < nLabels,
      s"k=$k needs at least ${k + 1} labels (got $nLabels) so negatives " +
        "never land in the anchor's own stratum")
    val draws = ranked.join(broadcast(labels.select(col("label"), col("lidx"))),
        Seq("label"))
      .select(col("anchor_id"), col("lidx"),
        explode(sequence(lit(1), lit(k))).as("j"))
      .withColumn("_tlidx", (col("lidx") + col("j")) % nLabels)
      .join(broadcast(labels.select(col("lidx").as("_tlidx"),
        col("label").as("negative_label"), col("n"))), Seq("_tlidx"))
      .withColumn("_trk",
        md5_prefix64(concat(col("anchor_id").cast("string"), lit(":"),
          col("j").cast("string"))) % col("n"))
    draws.join(ranked.select(col("label").as("negative_label"),
        col("rk").as("_trk"), col("anchor_id").as("negative_id")),
        Seq("negative_label", "_trk"))
      .select(col("anchor_id"), col("j").cast("long").as("j"),
        col("negative_id"), col("negative_label"))
  }

  /** Keep at most `cap` rows per group, chosen by hash order of the row
    * key — the per-source/per-domain downsampling cap every web-corpus
    * mix applies (no single crawl domain may dominate the mix). Hash
    * order makes the kept subset an unbiased, reproducible sample of the
    * group rather than "whatever sorted first"; ties (hash collisions)
    * break on the key itself. One shuffle on the group column; a group
    * far exceeding the cap is exactly the skew case — the window only
    * ranks, so AQE skew splitting or pre-filtering by a per-partition
    * count both compose with it. */
  def capPerGroup(df: DataFrame, keyCol: String, groupCol: Column,
                  cap: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
      .orderBy(md5_prefix64(col(keyCol).cast("string")).asc, col(keyCol).asc)
    df.withColumn("_cap_rk", row_number().over(w))
      .filter(col("_cap_rk") <= cap)
      .drop("_cap_rk")
  }

  /** Importance-resampling weights: per category the ratio of the
    * TARGET distribution's share to the SOURCE's, as an exact ×10^6
    * integer — `w_c = (n_target_c · N_source · 10^6) div
    * (n_source_c · N_target)` — the domain-reweighting table that bends
    * a source corpus toward a reference mix (weights multiply into
    * sampling rates or loss weights downstream; the apply is one
    * broadcast join). Categories absent from the target weigh 0;
    * categories absent from the source are REPORTED with weight NULL
    * (unreachable mass — silently dropping them would hide the gap).
    * Output: (cat, n_source, n_target, weight_x1e6). */
  def importanceWeights(source: DataFrame, target: DataFrame,
                        catCol: String): DataFrame = {
    def counts(df: DataFrame, n: String) = df
      .select(col(catCol).as("cat")).groupBy(col("cat"))
      .agg(count(lit(1)).as(n))
    val s = counts(source, "n_source")
    val t = counts(target, "n_target")
    val totals = s.agg(sum(col("n_source")).as("ns"))
      .crossJoin(t.agg(sum(col("n_target")).as("nt")))
    s.join(t, Seq("cat"), "full_outer").crossJoin(broadcast(totals))
      .select(col("cat"),
        coalesce(col("n_source"), lit(0L)).as("n_source"),
        coalesce(col("n_target"), lit(0L)).as("n_target"),
        when(col("n_source").isNull, lit(null).cast("long"))
          .otherwise(expr(
            "(coalesce(n_target, 0) * ns * 1000000) div (n_source * nt)"))
          .as("weight_x1e6"))
  }

  /** Effective sample size of a weighted sample — Kish's
    * ESS = (Σw)² / Σw², the diagnostic that tells whether a set of
    * importance weights ([[importanceWeights]]) or sampling weights has
    * quietly collapsed onto a few rows (ESS ≪ n ⇒ the reweighted
    * estimate rides on a handful of documents and its variance
    * explodes). Per group, one aggregation pass; decimal(38,0) squares
    * so 10¹²-scale weights cannot wrap. Zero/negative weights are
    * excluded (they carry no sampling mass). Output: (g, n, sum_w,
    * ess, efficiency_ppm = ess·10⁶ div n). */
  def effectiveSampleSize(df: DataFrame, groupCol: Column,
                          weightCol: Column): DataFrame =
    df.select(groupCol.as("g"), weightCol.cast("long").as("_w"))
      .filter(col("_w") > 0L)
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("_w")).as("sum_w"),
        sum(col("_w").cast("decimal(38,0)") * col("_w")).as("_sw2"))
      .select(col("g"), col("n"), col("sum_w"),
        expr("""cast((cast(sum_w as decimal(38,0)) * sum_w) div _sw2
               as bigint)""").as("ess"))
      .withColumn("efficiency_ppm", expr("(ess * 1000000) div n"))

  /** Deterministic token-budget sequence packing: documents in the
    * canonical hash order are packed CONTIGUOUSLY into fixed-budget
    * bins — bin(doc) = (cumulative tokens BEFORE doc) div budget — the
    * offline approximation of first-fit every training-batch packer
    * uses at scale (contiguous fill in a canonical order wastes at most
    * one document's tail per bin; a true first-fit is sequential and
    * cannot distribute). The order and the running token sum are
    * [[graft.operators.GlobalOrder]] passes, so packing 10¹⁰ documents
    * never funnels through one sort task, and the hash order makes the
    * packing a property of the corpus, not of the partitioning.
    *
    * A document LONGER than the budget overfills the bin it starts in
    * (fill_ppm > 10⁶ — visible, never silently split); chunk oversized
    * docs upstream. Output: (doc_id, n_tokens, bin, offset_in_bin). */
  def tokenPack(docs: DataFrame, idCol: String, textCol: String,
                budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 1, "budgetTokens must be positive")
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .withColumn("_h", md5_prefix64(concat(lit("pk:"),
        col("doc_id").cast("string"))))
    // skew-safe: order key `_h` is a 64-bit hash of the doc id —
    // hash-uniform by construction
    graft.operators.GlobalOrder.withRunningAggs(base, col("_h"),
        Seq(col("doc_id").asc), Seq((col("n_tokens"), "_cum")))
      .withColumn("_before", col("_cum") - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        expr(s"_before div $budgetTokens").as("bin"),
        expr(s"_before - (_before div $budgetTokens) * $budgetTokens")
          .as("offset_in_bin"))
  }

  /** Deterministic mixture schedule: interleave groups into ONE epoch
    * stream so that after any prefix each group's share tracks its
    * weight — smooth weighted round-robin (the SMT/WRR position rule:
    * item i of a weight-w group lands at virtual position
    * ((2i−1)·W) div (2w), W = Σ weights), the exact-integer epoch
    * scheduler training-data mixing needs instead of random draws
    * (reproducible, no variance, no seed bookkeeping).
    *
    * Input: (g, id, w) with one weight per group (enforced by taking
    * max(w) per group; within-group order = the [[capPerGroup]] hash
    * order). The final epoch rank is THE operator whose whole job is to
    * order the corpus — computed with
    * [[graft.operators.GlobalOrder.rank]]'s range-partitioned two-pass
    * prefix-sum, so the rank is distributed across the cluster instead
    * of funneling every row through one sort task (the round-8 review's
    * clearest 100×-scale chokepoint, now removed). Output: (g, id,
    * pos_in_group, virtual_pos, epoch_rank). */
  def mixtureSchedule(df: DataFrame): DataFrame = {
    val wg = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
      .orderBy(md5_prefix64(col("id").cast("string")).asc, col("id").asc)
    val weights = df.groupBy(col("g")).agg(max(col("w")).as("w"))
      .withColumn("w", when(col("w") <= 0, expr(
        "raise_error('mixtureSchedule: non-positive group weight - " +
          "drop zero-weight groups upstream')")).otherwise(col("w")))
    val totalW = weights.agg(sum(col("w")).as("tw"))
    val positioned = df.select(col("g"), col("id"))
      .withColumn("pos_in_group", row_number().over(wg).cast("long"))
      .join(broadcast(weights), Seq("g"))
      .crossJoin(broadcast(totalW))
      .withColumn("virtual_pos",
        expr("((2 * pos_in_group - 1) * tw) div (2 * w)"))
    // skew-safe: within a group, virtual positions are strictly
    // increasing (the WRR step is W/w ≥ 1), so a virtual_pos value
    // repeats at most once PER GROUP — key multiplicity is bounded by
    // the group count (broadcast-sized by contract), never data-sized
    graft.operators.GlobalOrder.rank(positioned, col("virtual_pos"),
        Seq(col("g").asc, col("pos_in_group").asc), "epoch_rank")
      .select(col("g"), col("id"), col("pos_in_group"), col("virtual_pos"),
        col("epoch_rank"))
  }
}
