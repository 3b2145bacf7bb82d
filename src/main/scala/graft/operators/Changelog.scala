package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Changelog (CDC) compaction: apply an ordered stream of upsert/delete
  * records to a base snapshot and produce the next snapshot — the batch
  * core of incremental materialization (Debezium/Hudi/Delta `MERGE`
  * shape). The reference's closest analog is its per-sync node upsert +
  * stale-cleanup pair (`cartography/graph/statement.py` merge +
  * `cleanupbuilder.py` delete); this operator is the general
  * last-writer-wins form a 100 TB pipeline compacts event logs with.
  *
  * Plan shape: ONE map-side-combinable aggregation — the base is unioned
  * in as version-`baseVersion` upserts and the latest record per key is
  * `max(struct(version, op, values…))`, so partial aggregates collapse
  * on the map side and nothing is ever sorted per key (no window, no
  * row_number). Delete tombstones participate in the max like any other
  * record and are dropped AFTER the argmax, which gives the full CDC
  * semantics for free: a delete followed by a later upsert resurrects
  * the key, a trailing delete removes it, a delete for an absent key is
  * a no-op.
  */
object Changelog {

  /** Apply `changes` to `base`, last writer wins.
    *
    * `base`: the previous snapshot — key columns + `valueCols` (no
    * version/op columns needed; it is treated as a batch of upserts at
    * `baseVersion`). May be empty (pure changelog compaction).
    *
    * `changes`: key columns + `versionCol` (total order per key, all
    * strictly greater than `baseVersion`) + `opCol` (`deleteOp` marks a
    * tombstone, anything else is an upsert) + `valueCols`.
    *
    * (key, version) pairs must be unique — with equal versions the
    * argmax falls back to (op, values…) lexicographic order, which is
    * deterministic but not meaningful CDC order.
    *
    * Output: keys ++ versionCol ++ valueCols — surviving keys with the
    * version that last wrote them. */
  def apply(base: DataFrame, changes: DataFrame, keys: Seq[String],
            versionCol: String, opCol: String, valueCols: Seq[String],
            deleteOp: String = "D", baseVersion: Long = 0L): DataFrame = {
    val vType = changes.schema(versionCol).dataType
    val b = base.select(
      keys.map(col) ++
        Seq(lit(baseVersion).cast(vType).as(versionCol), lit("U").as(opCol)) ++
        valueCols.map(col): _*)
    val c = changes.select(
      keys.map(col) ++ Seq(col(versionCol), col(opCol)) ++ valueCols.map(col): _*)
    b.unionByName(c)
      .groupBy(keys.map(col): _*)
      .agg(max(struct(
        (col(versionCol) +: col(opCol) +: valueCols.map(col)): _*)).as("_last"))
      .filter(col(s"_last.$opCol") =!= deleteOp)
      .select(keys.map(col) ++
        (versionCol +: valueCols).map(c0 => col(s"_last.$c0").as(c0)): _*)
  }

  /** Build the additive-aggregate snapshot [[maintainAgg]] maintains:
    * per key, `n_rows` + one `sum_<m>` per measure. */
  def aggregate(df: DataFrame, keys: Seq[String],
                measures: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        measures.map(m => sum(col(m).cast("long")).as(s"sum_$m")): _*)

  /** Incremental view maintenance for additive aggregates (Gupta &
    * Mumick's self-maintainable views): update a (count, sums) groupBy
    * snapshot from a row-level delta — `multCol` = +1 insert / −1
    * delete — WITHOUT rescanning the base table. The whole update is
    * one map-side-combinable aggregation over |delta| rows plus a merge
    * on |touched groups|; at 100 TB that is the difference between a
    * nightly full groupBy over the fact table and a minutes-long merge
    * of the day's changes. Groups whose count reaches zero drop out.
    *
    * Additive only by design: count/sum (and avg = sum div count at
    * read) are self-maintainable; min/max under deletes are NOT (a
    * deleted extremum needs the base — recompute or keep a sketch).
    * Deletes must refer to rows present in the base; a phantom delete
    * drives a group count negative, which the zero-filter then hides —
    * validate upstream ([[graft.drift.Drift.blockDiff]] is the audit). */
  def maintainAgg(snapshot: DataFrame, delta: DataFrame, keys: Seq[String],
                  multCol: String, measures: Seq[String]): DataFrame = {
    val d = delta.groupBy(keys.map(col): _*)
      .agg(sum(col(multCol).cast("long")).as("n_rows"),
        measures.map(m =>
          sum(col(multCol).cast("long") * col(m).cast("long")).as(s"sum_$m")): _*)
    snapshot.unionByName(d)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"),
        measures.map(m => sum(col(s"sum_$m")).as(s"sum_$m")): _*)
      .filter(col("n_rows") =!= 0L)
  }

  /** Incremental equi-join view maintenance — the bilinear delta rule
    * Δ(A ⋈ B) = ΔA ⋈ B ∪ A ⋈ ΔB ∪ ΔA ⋈ ΔB (bag algebra with signed
    * multiplicities; Griffin & Libkin 1995) — so a materialized join of
    * two 100 TB tables updates by joining the DELTAS against the bases,
    * never recomputing |A ⋈ B|.
    *
    * `view` is the maintained join with a signed `mult` column; `aOld`/
    * `bOld` the pre-delta snapshots (multiplicity-collapsed: duplicate
    * rows pre-aggregated upstream); `dA`/`dB` carry `mult` = +k / −k.
    * Non-key column names must be disjoint across the two sides.
    *
    * Scale shape: the two base⋈delta joins broadcast the (small) delta
    * side — one scan of each base, no |A⋈B|-sized shuffle; the final
    * merge is one full-outer join of the view against the aggregated
    * delta on the view's payload — shuffle-free when the stored view is
    * bucketed on those columns (the layout [[graft.graph.Layout]]
    * provides). Rows whose multiplicity reaches 0 drop out. */
  def maintainJoin(view: DataFrame, aOld: DataFrame, bOld: DataFrame,
                   dA: DataFrame, dB: DataFrame, keys: Seq[String]): DataFrame = {
    val payload = view.columns.filterNot(_ == "mult").toSeq
    val t1 = dA.join(bOld, keys)
    val t2 = aOld.join(dB, keys)
    val t3 = dA.withColumnRenamed("mult", "_ma")
      .join(dB.withColumnRenamed("mult", "_mb"), keys)
      .withColumn("mult", col("_ma") * col("_mb")).drop("_ma", "_mb")
    val delta = t1.select(view.columns.map(col): _*)
      .unionByName(t2.select(view.columns.map(col): _*))
      .unionByName(t3.select(view.columns.map(col): _*))
      .groupBy(payload.map(col): _*).agg(sum(col("mult")).as("_dm"))
    view.join(delta, payload, "full_outer")
      .select(payload.map(col) :+
        (coalesce(col("mult"), lit(0L)) + coalesce(col("_dm"), lit(0L)))
          .as("mult"): _*)
      .filter(col("mult") =!= 0L)
  }
  /** Changelog health audit: per key, the integrity signals a CDC
    * consumer checks BEFORE applying a feed — version gaps (a missing
    * range means lost changes; applying around a gap silently diverges
    * the replica) and out-of-order arrivals (fine for the argmax
    * compaction above, fatal for append-only consumers). The audit the
    * reference's sync loop implicitly trusts its update tags to make
    * unnecessary, surfaced as data.
    *
    * One shuffle on the key: gap statistics ride a lag window over the
    * DISTINCT versions, arrival statistics a running max over arrival
    * order — both windows share the key partitioning, one exchange.
    * `n_gaps` counts missing RUNS (not missing versions),
    * `max_gap_len` the longest missing run, `n_out_of_order` the rows
    * whose version is below a strictly earlier arrival's running max.
    * Output: keys ++ (n_changes, n_versions, version_lo, version_hi,
    * n_gaps, max_gap_len, n_out_of_order). */
  def sequenceAudit(changes: DataFrame, keys: Seq[String],
                    versionCol: String, arrivalCol: String): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    val k = keys.map(col)
    val distinctV = changes
      .select((k :+ col(versionCol).cast("long").as("_v")): _*).distinct()
      .withColumn("_gap",
        col("_v") - lag(col("_v"), 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(k: _*).orderBy(col("_v").asc)) - 1L)
    val gaps = distinctV.groupBy(k: _*)
      .agg(count(lit(1)).as("n_versions"),
        min(col("_v")).as("version_lo"), max(col("_v")).as("version_hi"),
        sum(when(col("_gap") > 0, 1L).otherwise(0L)).as("n_gaps"),
        coalesce(max(when(col("_gap") > 0, col("_gap"))), lit(0L))
          .as("max_gap_len"))
    val wa = org.apache.spark.sql.expressions.Window
      .partitionBy(k: _*)
      .orderBy(col("_a").asc, col("_v").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val ooo = changes
      .select((k :+ col(versionCol).cast("long").as("_v") :+
        col(arrivalCol).as("_a")): _*)
      .withColumn("_prevmax", max(col("_v")).over(wa))
      .groupBy(k: _*)
      .agg(count(lit(1)).as("n_changes"),
        sum(when(col("_v") < col("_prevmax"), 1L).otherwise(0L))
          .as("n_out_of_order"))
    ooo.join(gaps, keys)
      .select((k :+ col("n_changes") :+ col("n_versions") :+
        col("version_lo") :+ col("version_hi") :+ col("n_gaps") :+
        col("max_gap_len") :+ col("n_out_of_order")): _*)
  }

}
