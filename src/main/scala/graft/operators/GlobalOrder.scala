package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global order statistics — rank and running sums under a
  * total order without ever moving the data to one task.
  *
  * `row_number().over(Window.orderBy(...))` (no partition spec) is the
  * one Spark shape that cannot scale: WindowExec warns "Moving all data
  * to a single partition" and at 100× every row funnels through a
  * single sort task. The fix is the classic two-pass distributed
  * prefix-sum, expressed declaratively:
  *
  *  1. '''Deterministic bucketing.''' Each row's bucket is an
  *     equal-width slice of the numeric order key computed from the
  *     key's exact (min, max) — a pure function of the DATA, monotone
  *     in the key, so rows in bucket b all precede rows in bucket b+1
  *     under the total order. Pure-function matters: the local pass and
  *     the totals pass are separate plan branches, and Catalyst's
  *     column pruning makes their subtrees canonically unequal, so
  *     exchange reuse can NOT be relied on to keep them consistent — a
  *     sampled RangePartitioner would let the branches see different
  *     partition boundaries and silently corrupt every offset (observed
  *     in round 9 before this design: off-by-two ranks whenever the two
  *     range exchanges sampled differently). min/max are order-
  *     insensitive aggregates, so every branch derives byte-identical
  *     buckets no matter how many times the subplan evaluates.
  *  2. '''Local pass''': per-bucket rank / running sums via a window
  *     PARTITIONED by the bucket — one hash shuffle, all buckets in
  *     parallel.
  *  3. '''Offsets''': per-bucket totals (≤ #buckets rows — a config
  *     constant, never data-sized), prefix-summed in bucket order and
  *     broadcast back; `global = offset(bucket) + local`.
  *
  * Cost: one data-sized hash shuffle plus one min/max scan — strictly
  * less motion than a global sort even before scale. The offsets
  * table's own prefix window partitions by a non-foldable constant
  * (`pmod(bucket, 1)`): one task over ≤ #buckets rows by construction —
  * the documented "bounded domain" window shape, not the data-sized
  * anti-pattern this object removes.
  *
  * Skew: equal-width buckets inherit the KEY's distribution — a heavy
  * single value or a far outlier concentrates rows in one bucket
  * (correctness unaffected; that bucket's task just runs long). The
  * call sites here order by hash-derived or near-uniform keys
  * (md5-prefix doc hashes, WRR virtual positions, value censuses);
  * pathologically clustered keys should be hashed or pre-binned by the
  * caller, exactly like any range-partitioned sort.
  *
  * Results are IDENTICAL to the single-partition window under a total
  * order, so swapping call sites onto this helper is hash-invariant
  * (gate-verified for the operators rewritten in round 9). */
object GlobalOrder {

  /** Append global order statistics under the total order
    * `(keyCol ASC, tieCols ASC)`: `rankName` = the 1-based global
    * row_number, one inclusive running sum per `(value, name)` in
    * `sums`, and one EXCLUSIVE running max (over strictly preceding
    * rows; null when none — the Pareto-sweep shape) per `(value, name)`
    * in `exclMaxes`. `keyCol` must cast to long (hash prefixes, epoch micros,
    * integer censuses — every graft order key does); `tieCols` must
    * complete a TOTAL order or ranks are nondeterministic. Input
    * columns pass through untouched. */
  def withRunningAggs(df: DataFrame, keyCol: Column, tieCols: Seq[Column],
                      sums: Seq[(Column, String)] = Nil,
                      rankName: Option[String] = None,
                      exclMaxes: Seq[(Column, String)] = Nil): DataFrame = {
    require(sums.nonEmpty || rankName.nonEmpty || exclMaxes.nonEmpty,
      "nothing to compute")
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val keyed = df.withColumn("_go_key", keyCol.cast("long"))
    val stats = keyed.agg(min(col("_go_key")).as("_go_min"),
      max(col("_go_key")).as("_go_max"))
    // decimal(38,0) arithmetic: hash keys span the full ±2^63 range, so
    // max-min (and key-min) overflow a bare long subtraction
    val bucketed = keyed.crossJoin(broadcast(stats))
      .withColumn("_go_bkt",
        when(col("_go_key").isNull, lit(-1L))
          .otherwise(expr(
            s"""cast((cast(_go_key as decimal(38,0)) - cast(_go_min as decimal(38,0)))
                div (((cast(_go_max as decimal(38,0)) - cast(_go_min as decimal(38,0)))
                div $n) + 1) as bigint)""")))
      .drop("_go_min", "_go_max")
    val order = col("_go_key").asc +: tieCols
    val localW = Window.partitionBy(col("_go_bkt")).orderBy(order: _*)
    val localFrame =
      localW.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var local = bucketed
    sums.zipWithIndex.foreach { case ((v, _), i) =>
      local = local.withColumn(s"_go_s$i", sum(v).over(localFrame))
    }
    rankName.foreach { _ =>
      local = local.withColumn("_go_rk", row_number().over(localW).cast("long"))
    }
    // exclusive running max: max over STRICTLY preceding rows — local
    // part from a to-(-1) frame (null on each bucket's first row),
    // global part from the strictly-preceding-bucket max; `greatest`
    // skips nulls, so the combine needs no special-casing
    val exclFrame = localW.rowsBetween(Window.unboundedPreceding, -1)
    exclMaxes.zipWithIndex.foreach { case ((v, _), i) =>
      local = local.withColumn(s"_go_m$i", max(v).over(exclFrame))
    }
    // per-bucket totals: ≤ #buckets rows. The prefix window partitions
    // by a non-foldable constant so the plan carries a partition spec
    // (no partition-less WindowExec anywhere) while still —
    // intentionally — running as one task over the config-constant-
    // sized table.
    val totals = bucketed.groupBy(col("_go_bkt")).agg(
      count(lit(1)).as("_go_cnt"),
      (sums.zipWithIndex.map { case ((v, _), i) => sum(v).as(s"_go_t$i") } ++
        exclMaxes.zipWithIndex.map { case ((v, _), i) =>
          max(v).as(s"_go_mt$i") }): _*)
    val prefixW = Window.partitionBy(pmod(col("_go_bkt"), lit(1)))
      .orderBy(col("_go_bkt").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    var offsets = totals
      .withColumn("_go_rk_off",
        coalesce(sum(col("_go_cnt")).over(prefixW), lit(0L)))
    sums.zipWithIndex.foreach { case ((_, _), i) =>
      offsets = offsets.withColumn(s"_go_off$i",
        sum(col(s"_go_t$i")).over(prefixW))
    }
    exclMaxes.zipWithIndex.foreach { case ((_, _), i) =>
      offsets = offsets.withColumn(s"_go_moff$i",
        max(col(s"_go_mt$i")).over(prefixW))
    }
    val offSel = offsets.select(
      col("_go_bkt") +: col("_go_rk_off") +:
        (sums.indices.map(i => col(s"_go_off$i")) ++
          exclMaxes.indices.map(i => col(s"_go_moff$i"))): _*)
    var out = local.join(broadcast(offSel), Seq("_go_bkt"))
    sums.zipWithIndex.foreach { case ((_, name), i) =>
      // null-safe combine matching the single-partition window: a null
      // LOCAL prefix (all-null values so far in this bucket) must fall
      // back to the prior buckets' total, not poison it — sum-over-
      // nulls is null only until the first non-null anywhere before
      out = out.withColumn(name,
        when(col(s"_go_s$i").isNull, col(s"_go_off$i"))
          .when(col(s"_go_off$i").isNull, col(s"_go_s$i"))
          .otherwise(col(s"_go_off$i") + col(s"_go_s$i")))
        .drop(s"_go_s$i", s"_go_off$i")
    }
    rankName.foreach { name =>
      out = out.withColumn(name, col("_go_rk_off") + col("_go_rk"))
        .drop("_go_rk")
    }
    exclMaxes.zipWithIndex.foreach { case ((_, name), i) =>
      out = out.withColumn(name, greatest(col(s"_go_moff$i"), col(s"_go_m$i")))
        .drop(s"_go_m$i", s"_go_moff$i")
    }
    out.drop("_go_bkt", "_go_key", "_go_rk_off")
  }

  /** Single-group WindowSpec for PROVABLY BOUNDED domains — k-row
    * top-lists, label directories, per-partition offset tables: the
    * same semantics as a partition-less `Window.orderBy(...)`, but the
    * constant (non-foldable, so the optimizer can't strip it) partition
    * key makes the boundedness an explicit, greppable declaration and
    * keeps WindowExec's "moving all data to a single partition" warning
    * out of every run log. Use ONLY where the domain is bounded by
    * construction (a LIMIT upstream, a config-sized directory) — the
    * battery plan sweep enforces that partition-less windows never
    * appear, so reaching for this helper is the declaration that the
    * bound was checked. `anchor` is any input column — hashed (never
    * cast, so ANSI sessions can't throw on non-numeric values) then
    * collapsed to the constant single group. */
  def boundedWindow(anchor: Column,
                    order: Column*): org.apache.spark.sql.expressions.WindowSpec =
    Window.partitionBy(pmod(xxhash64(anchor), lit(1L))).orderBy(order: _*)

  /** Global 1-based rank (row_number) under `(keyCol ASC, tieCols ASC)`. */
  def rank(df: DataFrame, keyCol: Column, tieCols: Seq[Column],
           name: String): DataFrame =
    withRunningAggs(df, keyCol, tieCols, Nil, Some(name))

  /** Global inclusive running sum of `value` under `(keyCol ASC,
    * tieCols ASC)`. */
  def runningSum(df: DataFrame, keyCol: Column, tieCols: Seq[Column],
                 value: Column, name: String): DataFrame =
    withRunningAggs(df, keyCol, tieCols, Seq((value, name)), None)
}
