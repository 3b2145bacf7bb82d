package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Lineage._

/** Temporal join operators Spark lacks as built-ins: as-of join and
  * range(interval) join. The reference has no such operators
  * (SURVEY §2.4 "No as-of/interval/range joins exist in the reference");
  * a training-data/eventlog pipeline needs both constantly (latest
  * feature value per example, events-in-window attribution).
  *
  * Both are built from a plan shape that survives 100 TB:
  *  - as-of = union-merge + ONE window pass per key — O(|L|+|R|) rows
  *    shuffled once, no range cross-product, no BroadcastNestedLoopJoin;
  *  - range = coarse time-bucket equi-join + residual filter — the
  *    interval side explodes only over its covered buckets, so candidate
  *    volume is |R| × (span/bucket) instead of |L| × |R|.
  */
object Temporal {

  /** As-of join: for every left row, the single most recent right row with
    * the same key and `rightTime <= leftTime` (`<` when `strict`). Left
    * rows with no prior right row keep null payloads (left-outer
    * semantics).
    *
    * Implementation: tag both sides, union by name, and take a running
    * `last(payload, ignoreNulls)` over (key) ordered by (time, side,
    * payload); left rows then read the latest right payload at or before
    * their own timestamp. One shuffle on the key, no join at all. At equal
    * timestamps the right row sorts before the left row (inclusive
    * semantics) unless `strict`; several right rows on the same timestamp
    * resolve to the greatest payload tuple (lexicographic over `payload`
    * order) — deterministic under any partitioning.
    *
    * `payload` columns must exist on `right` and not collide with left
    * columns (rename before calling). */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String, payload: Seq[String],
               strict: Boolean = false): DataFrame = {
    require(!left.columns.exists(Set("_t", "_m")),
      "asofJoin reserves column names _t and _m; rename them on the left input")
    require(!(payload ++ keys).exists(Set("_t", "_m")),
      "asofJoin reserves column names _t and _m among key/payload columns; " +
        "rename them on the right input")
    require(payload.forall(right.columns.contains),
      s"payload columns ${payload.filterNot(right.columns.contains).mkString(",")} " +
        "missing on the right input")
    require(!payload.exists(left.columns.contains),
      "payload column names collide with left columns; rename before joining")
    val rightMarker = if (strict) 2 else 0
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_m", lit(1))
    val r = right.select(
      (keys.map(col) :+ col(rightTime).as("_t") :+ lit(rightMarker).as("_m")) ++
        payload.map(col): _*)
    val merged = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc +: col("_m").asc +: payload.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(merged)((df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w)))
    filled.filter(col("_m") === 1)
      .select(left.columns.map(col).toSeq ++ payload.map(col): _*)
  }

  /** As-of join with a staleness bound: like [[asofJoin]] but a match
    * older than `tolerance` (in the time columns' own units) is treated
    * as NO match — the feature-store read rule "use the latest feature
    * value, unless it is too stale to trust" (and the guard against the
    * silent antiquity bug where a key's last update was months ago).
    *
    * Same single-shuffle sort-merge shape: the matched right TIMESTAMP
    * rides along as one more carried column, and payload columns blank
    * where `leftTime − matchedTime > tolerance`. Output adds `match_age`
    * (= that difference, null when no fresh match). Time columns must be
    * numeric (epoch micros/seconds) so the age arithmetic is exact. */
  def asofJoinWithin(left: DataFrame, right: DataFrame, keys: Seq[String],
                     leftTime: String, rightTime: String, payload: Seq[String],
                     tolerance: Long): DataFrame = {
    require(tolerance >= 0, "tolerance must be non-negative")
    require(!left.columns.exists(Set("_t", "_m", "_rt", "match_age")),
      "asofJoinWithin reserves _t/_m/_rt/match_age; rename them on the left input")
    require(!(payload ++ keys).exists(Set("_t", "_m", "_rt", "match_age")),
      "asofJoinWithin reserves _t/_m/_rt/match_age among key/payload " +
        "columns; rename them on the right input")
    require(payload.forall(right.columns.contains),
      "payload columns missing on the right input")
    require(!payload.exists(left.columns.contains),
      "payload column names collide with left columns; rename before joining")
    val l = left.withColumn("_t", col(leftTime)).withColumn("_m", lit(1))
    val r = right.select(
      (keys.map(col) :+ col(rightTime).as("_t") :+ lit(0).as("_m") :+
        col(rightTime).as("_rt")) ++ payload.map(col): _*)
    val merged = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc +: col("_m").asc +: payload.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = (payload :+ "_rt").foldLeft(merged)((df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w)))
    val fresh = col("_rt").isNotNull && col("_t") - col("_rt") <= tolerance
    filled.filter(col("_m") === 1)
      .select(left.columns.map(col).toSeq ++
        payload.map(p => when(fresh, col(p)).as(p)) :+
        when(fresh, col("_t") - col("_rt")).as("match_age"): _*)
  }

  /** Nearest-neighbor temporal join: for every left row, the right row
    * with the same key minimizing |rightTime − leftTime|, looking BOTH
    * directions — the sensor-fusion / measurement-alignment variant of
    * [[asofJoin]] (which only looks back). Backward wins distance ties;
    * several right rows on the chosen timestamp resolve to the greatest
    * payload tuple (the [[asofJoin]] rule). `tolerance` bounds the
    * accepted distance: a nearest match farther than it blanks to the
    * no-match shape. Output: left columns + payload + `match_dist`
    * (null when no match). Time columns must be numeric (epoch
    * micros/seconds) so the distance arithmetic is exact.
    *
    * Scale shape: ONE union + one hash shuffle on the key feeding BOTH
    * window passes (ascending last-seen = latest at-or-before,
    * descending last-seen = earliest at-or-after — the two sorts share
    * the partitioning, so Catalyst plans a single Exchange), then an
    * in-row distance pick. No join, no per-left-row candidate
    * explosion. Each pass carries ONE struct of (matched time, payload)
    * so every carried field provably comes from the same right row even
    * when payload fields are null. */
  def nearestJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTime: String, rightTime: String, payload: Seq[String],
                  tolerance: Long = Long.MaxValue): DataFrame = {
    require(tolerance >= 0, "tolerance must be non-negative")
    val reserved = Set("_t", "_m", "_b", "_f", "_rt", "match_dist")
    require(!left.columns.exists(reserved),
      "nearestJoin reserves _t/_m/_b/_f/_rt/match_dist; rename them on the left input")
    // payload names are struct fields alongside the internal _rt and ride
    // through the union/select — a payload named _rt makes getField("_rt")
    // ambiguous, _t/_m/_b/_f break the merge with opaque analysis errors;
    // keys ride the union the same way (r13 ADVICE: guard both sides)
    require(!(payload ++ keys).exists(reserved),
      "nearestJoin reserves _t/_m/_b/_f/_rt/match_dist among key/payload " +
        "columns; rename them on the right input")
    require(payload.forall(right.columns.contains),
      "payload columns missing on the right input")
    require(!payload.exists(left.columns.contains),
      "payload column names collide with left columns; rename before joining")
    val l = left.withColumn("_t", col(leftTime).cast("long"))
      .withColumn("_m", lit(1))
    val r = right.select(
      (keys.map(col) :+ col(rightTime).cast("long").as("_t") :+
        lit(0).as("_m")) ++ payload.map(col): _*)
    val merged = l.unionByName(r, allowMissingColumns = true)
    def w(timeOrd: Column) = Window.partitionBy(keys.map(col): _*)
      .orderBy(timeOrd +: col("_m").asc +: payload.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // non-null on every right row, null on left rows → last(ignoreNulls)
    // is "the nearest right row seen so far in scan order"
    val rstruct = when(col("_m") === 0,
      struct(col("_t").as("_rt") +: payload.map(col): _*))
    val filled = merged
      .withColumn("_b", last(rstruct, ignoreNulls = true).over(w(col("_t").asc)))
      .withColumn("_f", last(rstruct, ignoreNulls = true).over(w(col("_t").desc)))
    val db = col("_t") - col("_b").getField("_rt")
    val df = col("_f").getField("_rt") - col("_t")
    val useB = col("_b").isNotNull && (col("_f").isNull || db <= df)
    val dist = when(useB, db).otherwise(df)
    val chosen = when(useB, col("_b")).otherwise(col("_f"))
    val ok = chosen.isNotNull && dist <= tolerance
    filled.filter(col("_m") === 1)
      .select(left.columns.map(col).toSeq ++
        payload.map(p => when(ok, chosen.getField(p)).as(p)) :+
        when(ok, dist).as("match_dist"): _*)
  }

  /** Validity-chain audit over interval histories (SCD2 tables, lease
    * ledgers): per key the counts of OVERLAPS (next interval starts
    * before this one ends), GAPS (next starts after this one ends) and
    * OPEN-MID rows (a null `to` that is not the chain's last row) — the
    * three ways a temporal table silently lies to its as-of readers.
    * One lead window per key; every key reports (zeros = clean chain),
    * so the result doubles as the denominator for violation rates.
    * Output: (keys..., n_rows, n_overlaps, n_gaps, n_open_mid). */
  def scd2Audit(hist: DataFrame, keys: Seq[String],
                fromCol: String, toCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(fromCol).asc, col(toCol).asc_nulls_last)
    hist
      .withColumn("_nf", lead(col(fromCol), 1).over(w))
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("_nf").isNotNull && col(toCol).isNotNull &&
          col("_nf") < col(toCol), 1L).otherwise(0L)).as("n_overlaps"),
        sum(when(col("_nf").isNotNull && col(toCol).isNotNull &&
          col("_nf") > col(toCol), 1L).otherwise(0L)).as("n_gaps"),
        sum(when(col("_nf").isNotNull && col(toCol).isNull, 1L)
          .otherwise(0L)).as("n_open_mid"))
  }

  /** Bitemporal as-of read: the state of a (valid time × transaction
    * time) table as it was KNOWN at `txAsOf`, for facts IN EFFECT at
    * `validAsOf` — "what did we believe on June 1 about the May
    * contract" (Snodgrass's two-dimensional time; the audit-proof read
    * SCD2 alone can't answer because corrections overwrite knowledge).
    *
    * Contract: a row is one assertion (keys, valid_from, valid_to,
    * tx_from, payload…); a correction re-asserts the SAME (keys,
    * valid_from) with a later tx_from, which replaces it; (keys,
    * valid_from, tx_from) must be unique or the winner is ambiguous.
    * One window per (keys, valid_from) picks the latest assertion known
    * at txAsOf, then the valid-interval containment filter (null
    * valid_to = open) keeps the in-effect fact. */
  def bitemporalAsOf(hist: DataFrame, keys: Seq[String], txFromCol: String,
                     validFromCol: String, validToCol: String,
                     txAsOf: Column, validAsOf: Column): DataFrame = {
    val w = Window.partitionBy((keys :+ validFromCol).map(col): _*)
      .orderBy(col(txFromCol).desc)
    hist.filter(col(txFromCol) <= txAsOf)
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .drop("_rn")
      .filter(col(validFromCol) <= validAsOf &&
        (col(validToCol).isNull || validAsOf < col(validToCol)))
  }

  /** Forward fill over a dense grid: left-join observations onto the
    * (key, time) grid, then carry the last non-null value forward within
    * each key — the gap-filling/resampling step of time-series feature
    * preparation. One shuffle on the key; rows before a key's first
    * observation stay null. `valueCols` must exist on `obs` and not on
    * `grid`. */
  def forwardFill(grid: DataFrame, obs: DataFrame, keys: Seq[String],
                  timeCol: String, valueCols: Seq[String]): DataFrame = {
    require(!valueCols.exists(grid.columns.contains),
      "value columns must not exist on the grid (they come from obs)")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = grid.join(obs, keys :+ timeCol, "left")
    valueCols.foldLeft(joined)((df, v) =>
      df.withColumn(v, last(col(v), ignoreNulls = true).over(w)))
  }

  /** SCD2 history build: collapse a per-key event/observation stream into
    * slowly-changing-dimension type-2 validity intervals — one row per
    * state RUN (consecutive observations with identical `stateCols`),
    * with `valid_from` = first observation of the run, `valid_to` = start
    * of the next run (half-open, null while current), `is_current` on the
    * open interval. The asset-history view an incremental sync pipeline
    * derives from its firstseen/lastupdated stream.
    *
    * One shuffle total: the change-detection lag window and the
    * interval-close lead window share the same (keys, time) partitioning,
    * so Catalyst plans a single exchange. At equal timestamps the state
    * columns break the tie deterministically. */
  def scd2(df: DataFrame, keys: Seq[String], timeCol: String,
           stateCols: Seq[String]): DataFrame = {
    require(stateCols.nonEmpty, "scd2 needs at least one state column")
    require((keys ++ stateCols :+ timeCol).forall(df.columns.contains),
      "scd2 keys/time/state columns must exist on the input")
    val reserved = Seq("valid_from", "valid_to", "is_current")
    require(!df.columns.contains("_same") &&
      !(keys ++ stateCols :+ timeCol).exists(reserved.contains),
      "scd2 reserves _same/valid_from/valid_to/is_current; rename the inputs")
    val order = col(timeCol).asc +: stateCols.map(col(_).asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    // a key's first row ALWAYS opens an interval — detected via a
    // constant-marker lag, not via state comparison, so a leading
    // null-state run is kept (null <=> lag-of-nothing would read "same")
    val changed = df.select((keys ++ Seq(timeCol) ++ stateCols).map(col): _*)
      .withColumn("_same",
        lag(lit(1), 1).over(w).isNotNull &&
          stateCols.map(c => col(c) <=> lag(col(c), 1).over(w)).reduce(_ && _))
      .filter(!col("_same"))
    changed.select(
      (keys ++ stateCols).map(col) ++ Seq(
        col(timeCol).as("valid_from"),
        lead(col(timeCol), 1).over(
          Window.partitionBy(keys.map(col): _*).orderBy(order: _*))
          .as("valid_to")): _*)
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Point-in-time (as-of) read against an [[scd2]] history: for each
    * probe row, the single interval with `valid_from <= ts < valid_to`
    * (open intervals have null `valid_to`). Intervals of one key are
    * contiguous and half-open, so exactly one matches any probe at or
    * after the key's first version; earlier probes drop (inner join).
    *
    * One equi-join on the keys + a residual containment filter — per-key
    * interval counts are version counts (small by construction), so the
    * join fans out by versions-per-key, never by history size; no window,
    * no sort, probe side streams. The time-travel read every warehouse
    * dimension lookup ("what was this entity's state when the event
    * happened") compiles to. */
  def asofRead(history: DataFrame, probes: DataFrame, keys: Seq[String],
               tsCol: String): DataFrame = {
    require(probes.columns.contains(tsCol), s"probes must carry $tsCol")
    require(keys.forall(history.columns.contains) &&
      keys.forall(probes.columns.contains), "join keys must exist on both sides")
    // a shared non-key column (e.g. probing the history with the event
    // stream it was built from) would duplicate in the output and make
    // every later reference AMBIGUOUS — reject it like scd2's own guards
    val overlap = probes.columns.filterNot(keys.contains)
      .intersect(history.columns.filterNot(keys.contains))
    require(overlap.isEmpty,
      s"probe columns collide with history columns: ${overlap.mkString(", ")}; " +
        "rename or drop them on the probe side")
    probes.join(history, keys)
      .filter(col("valid_from") <= col(tsCol) &&
        (col("valid_to").isNull || col(tsCol) < col("valid_to")))
  }

  /** Range (interval) join: every left row paired with every right
    * interval `[startEpoch, endEpoch)` containing its `leftEpoch`. All
    * three are epoch-seconds long columns.
    *
    * The interval side explodes into the coarse buckets it covers; the
    * point side computes its single bucket; candidates meet in a plain
    * equi-join on the bucket id and a residual containment filter
    * finishes. A (row, interval) pair can only meet in the row's one
    * bucket, so no post-join dedup is needed. Pick `bucketSeconds` near
    * the typical interval span: shorter → more explode rows, longer →
    * more residual-filter waste. */
  def rangeJoinBucketed(left: DataFrame, leftEpoch: String,
                        right: DataFrame, startEpoch: String, endEpoch: String,
                        bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val lb = left.withColumn("_bkt",
      floor(col(leftEpoch) / bucketSeconds).cast("long"))
    val rb = right.withColumn("_bkt",
      explode(sequence(
        floor(col(startEpoch) / bucketSeconds).cast("long"),
        floor((col(endEpoch) - 1) / bucketSeconds).cast("long"))))
    lb.join(rb, Seq("_bkt"))
      .filter(col(leftEpoch) >= col(startEpoch) && col(leftEpoch) < col(endEpoch))
      .drop("_bkt")
  }

  /** Interval × interval overlap join: every (left, right) pair of
    * half-open intervals `[s, e)` (epoch-seconds longs) that overlap —
    * `ls < re AND rs < le` — optionally under equi-`keys` (per-tenant /
    * per-entity overlap detection). The conflict-detection primitive
    * over bookings, leases, validity windows.
    *
    * Both sides explode onto the coarse time buckets they cover and
    * candidates meet in an equi-join on (keys..., bucket) + residual
    * overlap filter — candidate volume is overlap-local, never
    * |L| × |R|. A pair overlapping several buckets would match in each;
    * instead of a post-join dedup (an extra shuffle over the OUTPUT,
    * the biggest table in the plan), each pair is claimed exactly once
    * in the bucket of `max(ls, rs)` — the first bucket where both are
    * present, a constant-time filter. Pick `bucketSeconds` near the
    * typical interval span: shorter → more explode rows, longer → more
    * residual waste. */
  def intervalOverlapJoin(left: DataFrame, ls: String, le: String,
                          right: DataFrame, rs: String, re: String,
                          bucketSeconds: Long,
                          keys: Seq[String] = Nil): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    def buckets(s: String, e: String) = sequence(
      floor(col(s) / bucketSeconds).cast("long"),
      floor((col(e) - 1) / bucketSeconds).cast("long"))
    // Empty/inverted half-open intervals (e <= s) must match nothing —
    // without this filter, sequence() counts DOWN when stop < start and
    // the residual filters can still pass (e.g. empty [10,10) vs [5,20)),
    // emitting false matches. Drop them before the explode.
    val lb = left.filter(col(ls) < col(le))
      .withColumn("_bkt", explode(buckets(ls, le)))
    val rb = right.filter(col(rs) < col(re))
      .withColumn("_bkt", explode(buckets(rs, re)))
    lb.join(rb, keys :+ "_bkt")
      .filter(col(ls) < col(re) && col(rs) < col(le))
      .filter(col("_bkt") ===
        floor(greatest(col(ls), col(rs)) / bucketSeconds).cast("long"))
      .drop("_bkt")
  }

  /** Coalesce overlapping-or-touching closed intervals per key into
    * maximal islands (gaps-and-islands): availability windows, session
    * spans, validity ranges — the interval-union primitive behind
    * "total covered time" and conflict detection.
    *
    * One window pass: order each key's intervals by (start, end), take
    * the running max of `end` over the strict prefix, and start a new
    * island exactly when `start` exceeds it (touching intervals —
    * start == previous max end — merge). A second running sum turns the
    * flags into island ids, and one aggregation emits
    * (keys..., island_start, island_end, n_intervals).
    *
    * The flag pass and the island-id pass are two window operators over
    * the same sort; rows tying on the full ordering key could permute
    * between the passes and carry their flags with them, splitting an
    * island mid-tie — so the ordering must be TOTAL. Pass `tieCols`
    * (e.g. the row's primary key) whenever (keys, start, end) does not
    * uniquely identify a row. ONE shuffle on the key set (both windows
    * and the groupBy share it); per-key state is a sort, never a
    * cross-product — the skew knob is a single hot key's interval
    * count, same as any per-key window. */
  def coalesceIntervals(df: DataFrame, keys: Seq[String],
                        startCol: String, endCol: String,
                        tieCols: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "coalesceIntervals needs at least one key column")
    val part = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(startCol) +: col(endCol) +: tieCols.map(col): _*)
    val prevMax = max(col(endCol))
      .over(part.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = df.withColumn("_new_island",
      when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
    val islands = flagged.withColumn("_island",
      sum(col("_new_island")).over(part.rowsBetween(Window.unboundedPreceding, 0)))
    islands.groupBy(keys.map(col) :+ col("_island"): _*)
      .agg(min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_intervals"))
      .drop("_island")
  }

  /** Peak concurrency over half-open intervals [start, end) per key —
    * the capacity/occupancy read (max simultaneous sessions, held
    * leases, active connections): +1 at each start, −1 at each end,
    * running sum in time order, max per key. Ends sort BEFORE starts
    * at the same instant (the half-open contract: an interval ending
    * at t does not overlap one starting at t). Ties within the same
    * (instant, side) carry the same sign, so the running max is
    * order-independent — deterministic without a full tiebreak.
    * One shuffle (the per-key window sort); at 100 TB partition keys
    * by (key, day) like the other window operators. */
  def intervalMaxConcurrency(df: DataFrame, keys: Seq[String],
                             startCol: String, endCol: String): DataFrame = {
    require(keys.nonEmpty, "intervalMaxConcurrency needs at least one key")
    val starts = df.select(keys.map(col) :+ col(startCol).as("_t") :+
      lit(1L).as("_side") :+ lit(1L).as("_d"): _*)
    val ends = df.select(keys.map(col) :+ col(endCol).as("_t") :+
      lit(0L).as("_side") :+ lit(-1L).as("_d"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    starts.unionByName(ends)
      .withColumn("_run", sum(col("_d")).over(w))
      .groupBy(keys.map(col): _*)
      .agg(max(col("_run")).as("peak_concurrency"))
  }

  /** Gap-based batch sessionization: within each key, events ordered by
    * (timestamp, tiebreak) start a new session whenever the gap to the
    * previous event exceeds `gapMicros` — the batch analogue of the
    * streaming session window ([[graft.queries.StreamQueries]]'s
    * session_window_agg gate), for the backfill/replay path a lakehouse
    * pipeline runs next to its live stream. Emits every input row plus
    * a per-key `session_idx` (1-based, in time order).
    *
    * One shuffle (the window sort). At 100 TB partition by (key, day)
    * like [[graft.operators.Analytics.rollingAnomaly]] — sessions
    * spanning a partition seam split at the boundary, the standard
    * trade; keys are independent so nothing else crosses partitions.
    * Comparisons run on exact epoch micros (no float time math). */
  def sessionizeGaps(df: DataFrame, keys: Seq[String], tsCol: String,
                     tieCols: Seq[String], gapMicros: Long): DataFrame = {
    require(keys.nonEmpty, "sessionizeGaps needs at least one key column")
    require(gapMicros > 0, "gapMicros must be positive")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol) +: tieCols.map(col): _*)
    val us = unix_micros(col(tsCol))
    val prev = lag(us, 1).over(w)
    df.withColumn("_new_sess",
        when(prev.isNull || us - prev > gapMicros, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("_new_sess")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("_new_sess")
  }
  /** Allen interval-relation census between two interval sets (Allen
    * 1983, CACM 26: the 13 mutually exclusive, jointly exhaustive
    * relations two intervals can stand in) — the temporal-reasoning
    * fingerprint of a schedule: how many (a, b) ordered pairs are
    * BEFORE / MEETS / OVERLAPS / STARTS / DURING / FINISHES / EQUALS
    * and the six inverses.
    *
    * The scale design splits by contact: the two DISJOINT relations
    * (before, after) are O(|A|·|B|)-sized pair sets that are never
    * enumerated — each is ONE order-statistic pass (union endpoints,
    * sort, running count: for every b.start the number of a.end
    * strictly below it, ties ordered so boundary equality lands in
    * MEETS, not BEFORE). Every relation with boundary contact or
    * overlap requires a candidate pair, generated by the same bucketed
    * interval join as [[intervalOverlapJoin]] (bucket span bounds the
    * fan-out) and classified in-row with one CASE. Intervals are
    * closed-start open-thought-of as (s, e) with s < e; pairs, not
    * intervals, are counted, and the 13 counts partition |A|·|B|
    * exactly (property-tested). Output: (relation, n_pairs), all 13
    * rows present. */
  def allenCensus(a: DataFrame, b: DataFrame, bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val spark = a.sparkSession
    val av = a.select(col("s").cast("long").as("as_"), col("e").cast("long").as("ae"))
      .filter(col("as_") < col("ae")).pin
    val bv = b.select(col("s").cast("long").as("bs"), col("e").cast("long").as("be"))
      .filter(col("bs") < col("be")).pin
    // ---- disjoint relations by order statistics (never enumerated) ----
    // before-count = Σ_v nb(v) · |{a.e < v}|: aggregate endpoint counts
    // per DISTINCT value first (map-side combinable), then one running
    // sum over the distinct-value axis — distributed via
    // [[graft.operators.GlobalOrder]]'s range-partitioned two-pass
    // prefix-sum, because with real timestamps the distinct-endpoint
    // axis is ~O(rows) and must never land on one sort task. The merged
    // census has one row per distinct v, so "strictly below v"
    // (excluding the a.e == b.s MEETS boundary) = inclusive running sum
    // minus the value's own na. Products and the final sum are
    // decimal(38,0) so |A|·|B|-sized counts cannot wrap.
    def disjointCount(ends: DataFrame, starts: DataFrame): DataFrame = {
      val na = ends.groupBy(col("v")).agg(count(lit(1)).as("na"))
      val nb = starts.groupBy(col("v")).agg(count(lit(1)).as("nb"))
      val merged = na.join(nb, Seq("v"), "full_outer")
        .select(col("v"), coalesce(col("na"), lit(0L)).as("na"),
          coalesce(col("nb"), lit(0L)).as("nb"))
      // skew-safe: `merged` is the full-outer join of two endpoint
      // censuses — one row per distinct v, keys unique by construction
      graft.operators.GlobalOrder
        .runningSum(merged, col("v"), Nil, col("na"), "_cumincl")
        .withColumn("_cum", col("_cumincl") - col("na"))
        .agg(coalesce(sum(col("nb").cast("decimal(38,0)") * col("_cum")),
          lit(0)).cast("bigint").as("n"))
    }
    val beforeN = disjointCount(av.select(col("ae").as("v")),
      bv.select(col("bs").as("v")))
    val afterN = disjointCount(bv.select(col("be").as("v")),
      av.select(col("as_").as("v")))
    // ---- contact relations via the bucketed candidate join ----
    def buckets(s: Column, e: Column) = sequence(
      floor(s / bucketSeconds).cast("long"), floor(e / bucketSeconds).cast("long"))
    val ab = av.withColumn("_bkt", explode(buckets(col("as_"), col("ae"))))
    val bb = bv.withColumn("_bkt", explode(buckets(col("bs"), col("be"))))
    val contact = ab.join(bb, Seq("_bkt"))
      // touching or overlapping: a.s <= b.e AND b.s <= a.e
      .filter(col("as_") <= col("be") && col("bs") <= col("ae"))
      .filter(col("_bkt") ===
        floor(greatest(col("as_"), col("bs")) / bucketSeconds).cast("long"))
      .select(col("as_"), col("ae"), col("bs"), col("be"))
    val classified = contact.select(
      when(col("as_") === col("bs") && col("ae") === col("be"), "equals")
        .when(col("ae") === col("bs"), "meets")
        .when(col("be") === col("as_"), "met_by")
        .when(col("as_") === col("bs") && col("ae") < col("be"), "starts")
        .when(col("as_") === col("bs"), "started_by")
        .when(col("ae") === col("be") && col("as_") > col("bs"), "finishes")
        .when(col("ae") === col("be"), "finished_by")
        .when(col("as_") > col("bs") && col("ae") < col("be"), "during")
        .when(col("as_") < col("bs") && col("ae") > col("be"), "contains")
        .when(col("as_") < col("bs"), "overlaps")
        .otherwise("overlapped_by").as("relation"))
      .groupBy(col("relation")).agg(count(lit(1)).as("n_pairs"))
    import spark.implicits._
    val all = (Seq("before", "after") ++ Seq("meets", "met_by", "overlaps",
      "overlapped_by", "starts", "started_by", "during", "contains",
      "finishes", "finished_by", "equals")).toDF("relation")
    val disjoint = beforeN.select(lit("before").as("relation"), col("n").as("n_pairs"))
      .unionByName(afterN.select(lit("after").as("relation"), col("n").as("n_pairs")))
    all.join(classified.unionByName(disjoint), Seq("relation"), "left")
      .select(col("relation"), coalesce(col("n_pairs"), lit(0L)).as("n_pairs"))
  }

}
