package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions.md5_prefix64
import graft.Lineage._

/** Mergeable approximate-aggregation sketches — the cardinality and
  * frequency summaries a 100 TB pipeline computes instead of exact
  * distincts (an exact `COUNT(DISTINCT token)` over a web corpus is one
  * giant shuffle; a sketch is a few KB per partition merged by
  * sum/max/min). Three classics, each built from the same 56-bit md5
  * content hash ([[graft.functions.Md5Prefix64]], codegen'd) so every
  * number is a pure function of the data — deterministic across engines,
  * partitionings, and retries, which is what lets DuckDB replicate them
  * bit-for-bit as oracles:
  *
  *   - KMV (k minimum values): keep the k smallest distinct hash values;
  *     the k-th smallest estimates the cardinality (Bar-Yossef et al.
  *     2002). Mergeable by "union then re-take k smallest".
  *   - Count-Min: a depth×width counter grid; point frequency estimate =
  *     min over rows (Cormode & Muthukrishnan 2005). Mergeable by
  *     element-wise sum — the canonical distributed-combine shape.
  *   - HyperLogLog: per-bucket max leading-zero rank, harmonic-mean
  *     estimate (Flajolet et al. 2007). Mergeable by element-wise max.
  *
  * All arithmetic is integer except the final HLL estimate, which is a
  * fixed chain of correctly-rounded IEEE ops (see the repo determinism
  * rules — mul/div/floor on doubles are bit-identical everywhere).
  */
object Sketches {

  /** Hash width of [[md5_prefix64]]: values are uniform on [0, 2^56). */
  val HashBits: Int = 56
  val MaxHash: Long = 1L << HashBits

  /** KMV distinct-count sketch per group: the `k` smallest DISTINCT
    * hashes of `valueCol`; when a group has at least `k` distinct values
    * the k-th smallest hash `h_k` estimates the cardinality as
    * `(k-1) * 2^56 div h_k` (the k-1 estimator is unbiased); below k the
    * sketch holds every hash and the count is exact.
    *
    * Output: (group, n_seen, kth_hash, est_distinct, n_true) — n_true is
    * the exact distinct count, joined in so the gate doubles as an
    * accuracy report.
    *
    * Scale shape: one distinct on (group, hash), then a per-group
    * row_number window that only RANKS — at 100 TB pre-prune with a
    * per-partition k-smallest pass (filter h < per-group threshold from a
    * previous epoch, or a bounded-heap partial aggregate) so the window
    * sees ~k·partitions rows, not the full vocabulary. The exact-truth
    * join is for the gate only; production emits the sketch alone. */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
                  k: Int): DataFrame = {
    require(k >= 2 && k <= 128,
      "KMV needs 2 <= k <= 128 ((k-1) * 2^56 must stay below 2^63)")
    val estNumerator = (k - 1).toLong * MaxHash
    val hashed = df.select(col(groupCol).as("g"),
        md5_prefix64(col(valueCol).cast("string")).as("h"))
      .distinct()
    val w = Window.partitionBy(col("g")).orderBy(col("h").asc)
    val kept = hashed.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_seen"), max(col("h")).as("kth_hash"))
    val truth = df.select(col(groupCol).as("g"), col(valueCol).as("v"))
      .distinct().groupBy(col("g")).agg(count(lit(1)).as("n_true"))
    kept.join(truth, Seq("g"))
      .select(col("g").as(groupCol), col("n_seen"), col("kth_hash"),
        when(col("n_seen") < k, col("n_seen"))
          .otherwise(expr(s"$estNumerator div greatest(kth_hash, 1)"))
          .as("est_distinct"),
        col("n_true"))
  }

  /** Count-Min sketch from keyed counts: `depth` hash rows (the MinHash
    * permutation family of [[TextFunctions]]) × `width` buckets, each
    * cell the sum of counts hashing into it. The sketch is depth·width
    * rows regardless of key cardinality — broadcastable, and mergeable
    * across partitions/epochs by cell-wise sum. */
  def countMinSketch(counts: DataFrame, keyCol: String, cntCol: String,
                     depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= TextFunctions.MinhashA.size,
      s"depth must be in [1, ${TextFunctions.MinhashA.size}]")
    require(width >= 2, "width must be >= 2")
    counts.select(explode(array(bucketCols(col(keyCol), depth, width): _*)).as("r"),
        col(cntCol).as("_c"))
      .groupBy(col("r.j").as("j"), col("r.bucket").as("bucket"))
      .agg(sum(col("_c")).as("c"))
  }

  /** Point-frequency estimates for `keys` against a [[countMinSketch]]:
    * est = min over the depth rows of the cell the key hashes into —
    * an overestimate by construction (collisions only add; a key absent
    * from the data reads an empty or colliding cell). The sketch side is
    * depth·width rows, so the join broadcasts. Reserves column names
    * j/bucket/c for the sketch join. */
  def countMinLookup(sketch: DataFrame, keys: DataFrame, keyCol: String,
                     depth: Int, width: Int): DataFrame = {
    require(Seq("j", "bucket", "c").forall(!keys.columns.contains(_)),
      "countMinLookup reserves the j/bucket/c column names; rename the inputs")
    keys.withColumn("r", explode(array(bucketCols(col(keyCol), depth, width): _*)))
      .withColumn("j", col("r.j")).withColumn("bucket", col("r.bucket")).drop("r")
      .join(broadcast(sketch), Seq("j", "bucket"), "left")
      .groupBy(keys.columns.map(col).toSeq: _*)
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }

  /** (j, bucket) pairs for one key under the depth affine hash rows:
    * bucket_j = ((a_j * (h mod P) + b_j) mod P) mod width. */
  private def bucketCols(key: org.apache.spark.sql.Column, depth: Int,
                         width: Int): Seq[org.apache.spark.sql.Column] = {
    val P = TextFunctions.P
    val h = md5_prefix64(key.cast("string")) % P
    (0 until depth).map { j =>
      struct(lit(j.toLong).as("j"),
        (((lit(TextFunctions.MinhashA(j)) * h + lit(TextFunctions.MinhashB(j))) % P)
          % width).as("bucket"))
    }
  }

  /** HLL bucket count (2^6): small enough that the register table for
    * every group is trivially broadcastable, large enough for ~13% raw
    * standard error — the gate checks determinism and mechanics, not
    * tuned accuracy (production raises p). */
  val HllBuckets: Int = 64
  private val HllBucketBits = 6
  /** Rank ceiling: rho ranges 1..51 over the 50 suffix bits; empty
    * buckets contribute rank 0 = harmonic term 2^51. */
  private val HllR = HashBits - HllBucketBits + 1 // 51

  /** HyperLogLog distinct estimate per group: bucket = h mod 64, rank =
    * leading zeros of the remaining 50 hash bits + 1, register = max
    * rank per bucket, raw estimate = α·m²·2^51 / Σ 2^(51 − register)
    * (the harmonic sum is computed in exact integer arithmetic; only the
    * final constant multiply + divide are doubles, both correctly
    * rounded). No small/large-range correction — this is the raw
    * Flajolet estimator; the gate reports the exact count alongside.
    *
    * Output: (group, n_zero_registers, harmonic_sum, est_distinct,
    * n_true).
    *
    * Scale shape: ONE aggregation on (group, bucket) with map-side
    * combine (max is algebraic), then a 64-row-per-group fill + reduce —
    * there is no distinct anywhere: duplicate values land in the same
    * bucket with the same rank and max() absorbs them. This is the
    * estimator to reach for when even the KMV distinct is too heavy. */
  def hllEstimate(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val m = HllBuckets
    val regs = hllRegisters(df, groupCol, valueCol)
    val grid = df.select(col(groupCol).as("g")).distinct()
      .select(col("g"), explode(sequence(lit(0L), lit(m - 1L))).as("bucket"))
    val filled = grid.join(regs, Seq("g", "bucket"), "left")
      .select(col("g"), coalesce(col("r"), lit(0)).as("r"))
    val sums = filled.groupBy(col("g")).agg(
      sum(when(col("r") === 0, 1L).otherwise(0L)).as("n_zero_registers"),
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($HllR - r AS INT))")).as("harmonic_sum"))
    val truth = df.select(col(groupCol).as("g"), col(valueCol).as("v"))
      .distinct().groupBy(col("g")).agg(count(lit(1)).as("n_true"))
    sums.join(truth, Seq("g"))
      .select(col("g").as(groupCol), col("n_zero_registers"), col("harmonic_sum"),
        floor(lit(0.709) * lit(m.toDouble * m) * lit(math.pow(2.0, HllR)) /
          col("harmonic_sum")).cast("long").as("est_distinct"),
        col("n_true"))
  }

  /** Mergeable HLL state: (g, bucket, r) — the per-shard registers a
    * distributed count-distinct ships instead of raw values. Bit length
    * via conv-to-binary string length (rem = 0 has none); rank =
    * 51 - bitlen(rem), so rem with all 50 bits set gives rank 1. */
  def hllRegisters(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val h = md5_prefix64(col(valueCol).cast("string"))
    val parts = df.select(col(groupCol).as("g"),
      (h % HllBuckets).as("bucket"), shiftright(h, HllBucketBits).as("rem"))
    val bitlen = when(col("rem") === 0L, lit(0))
      .otherwise(length(conv(col("rem"), 10, 2)))
    parts.withColumn("rho", lit(HllR) - bitlen)
      .groupBy(col("g"), col("bucket")).agg(max(col("rho")).as("r"))
  }

  /** Sub-bucket resolution of the log-linear histogram: 16 sub-buckets
    * per power of two → worst-case relative error 1/16 = 6.25% on any
    * quantile estimate (the HdrHistogram / DDSketch bucketing shape —
    * Masson et al. 2019 use log-gamma buckets; the power-of-two variant
    * keeps every bucket id and bound in exact integer arithmetic). */
  val HistSubBuckets: Int = 16

  /** Log-linear histogram sketch per group over positive longs:
    * bucket = the value's top 5 bits positioned by its magnitude
    * (values < 16 get exact unit buckets). The sketch is at most
    * 16·log2(max) rows per group — KBs regardless of row count — and
    * mergeable by bucket-wise sum ([[histMerge]]), which is what makes
    * it the 100 TB percentile answer: one map-side-combined aggregation
    * per shard, no global sort, no full-data window, constant-size state
    * shipped to the merger.
    *
    * Values < 1 are dropped (log buckets need a positive domain —
    * callers shift or scale first, e.g. prices to integer cents). */
  def histBuckets(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val pre = df.select(col(groupCol).as("g"), col(valueCol).cast("long").as("_v"))
      .filter(col("_v") >= 1L)
    // msb = floor(log2 v) via binary-string length: exact integer math
    pre.withColumn("_msb", (length(conv(col("_v"), 10, 2)) - 1).cast("long"))
      .withColumn("bucket",
        when(col("_v") < HistSubBuckets.toLong, col("_v"))
          .otherwise(col("_msb") * HistSubBuckets +
            expr("shiftright(_v, CAST(_msb - 4 AS INT))") - HistSubBuckets))
      .groupBy(col("g"), col("bucket")).agg(count(lit(1)).as("c"))
  }

  /** Bucket-wise sum merge: histograms of any two data shards, merged,
    * equal the histogram of their union — the distributed-aggregate
    * property ([[hllMerge]]'s analog for quantiles). */
  def histMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("g"), col("bucket")).agg(sum(col("c")).as("c"))

  /** Lower bound of a bucket id — the quantile estimate read out of the
    * sketch (guaranteed within 1/16 relative error of the true value). */
  private def bucketLowerBound(bucket: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    when(bucket < HistSubBuckets.toLong, bucket)
      .otherwise(expr(
        s"shiftleft(CAST(bucket % $HistSubBuckets + $HistSubBuckets AS BIGINT), " +
          s"CAST(bucket div $HistSubBuckets - 4 AS INT))"))

  /** Quantile read-out from a [[histBuckets]] sketch: for each per-mille
    * rank q, the lower bound of the first bucket whose cumulative count
    * reaches ceil(q·n/1000). Runs entirely on the sketch (≤ ~16·63
    * buckets per group): the window and join below never see data rows.
    * Output: (g, q_permille, n, est). */
  def histQuantiles(buckets: DataFrame, qsPerMille: Seq[Int]): DataFrame = {
    require(qsPerMille.nonEmpty && qsPerMille.forall(q => q >= 1 && q <= 1000),
      "quantiles are per-mille ranks in [1, 1000]")
    // materialize the sketch before the read-out: cum and qs both consume
    // it, and without the checkpoint the (data-sized) bucket aggregation
    // plan is embedded — and scanned — twice. This is also the production
    // shape: the KB sketch persists once, read-outs touch only it.
    val b = buckets.pin
    val w = Window.partitionBy(col("g")).orderBy(col("bucket").asc)
    val cum = b.withColumn("cum", sum(col("c")).over(w))
    val qs = b.groupBy(col("g")).agg(sum(col("c")).as("n"))
      .select(col("g"), col("n"),
        explode(array(qsPerMille.map(q => lit(q.toLong)): _*)).as("q_permille"))
      .withColumn("target", expr("(q_permille * n + 999) div 1000"))
    qs.join(cum, Seq("g")).filter(col("cum") >= col("target"))
      .groupBy(col("g"), col("q_permille"), col("n"))
      .agg(min(col("bucket")).as("bucket"))
      .select(col("g"), col("q_permille"), col("n"),
        bucketLowerBound(col("bucket")).as("est"))
  }

  /** Register-wise max merge: registers of any data partition, merged,
    * equal the registers of the whole — THE property that makes the
    * sketch a sub-linear distributed aggregate (each shard ships 64
    * small ints, never values). */
  def hllMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("g"), col("bucket")).agg(max(col("r")).as("r"))

  /** Cardinality estimate from a register set; `groups` supplies the
    * group universe so empty groups fill rank-0 registers. */
  def hllEstimateFromRegisters(regs: DataFrame, groups: DataFrame,
                               outCol: String): DataFrame = {
    val m = HllBuckets
    val grid = groups.select(col("g")).distinct()
      .select(col("g"), explode(sequence(lit(0L), lit(m - 1L))).as("bucket"))
    grid.join(regs, Seq("g", "bucket"), "left")
      .select(col("g"), coalesce(col("r"), lit(0)).as("r"))
      .groupBy(col("g"))
      .agg(sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($HllR - r AS INT))"))
        .as("_hs"))
      .select(col("g"),
        floor(lit(0.709) * lit(m.toDouble * m) * lit(math.pow(2.0, HllR)) /
          col("_hs")).cast("long").as(outCol))
  }

  /** Equi-join cardinality estimate from two [[countMinSketch]]s over
    * the join key (Cormode & Muthukrishnan 2005, the CM inner-product
    * estimator): |A ⋈_k B| = Σ_k fA(k)·fB(k), and for every depth row
    * Σ_buckets aC·bC equals that sum plus non-negative collision terms
    * — so the MIN over depth rows is a certified OVERestimate of the
    * true join size, computed from two KB-sized summaries without
    * scanning either table. This is the planner's broadcast-vs-shuffle
    * (and skew-alarm) signal at 100 TB: sketches are mergeable across
    * shards and epochs, the estimate is a depth·width-row reduce.
    * Decimal products keep the cell arithmetic exact under ANSI.
    * Output: one row (est_pairs). */
  def cmsJoinCardinality(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("j"), col("bucket"), col("c").as("ca"))
      .join(b.select(col("j"), col("bucket"), col("c").as("cb")),
        Seq("j", "bucket"))
      .groupBy(col("j"))
      .agg(sum(col("ca").cast("decimal(38,0)") * col("cb")).as("ip"))
      .agg(min(col("ip")).cast("long").as("est_pairs"))

  /** Per-partition Misra–Gries frequency summaries: at most `k` (key,
    * weight) counters per partition, built in one bounded-memory
    * streaming pass (Misra & Gries 1982) — the per-partition imperative
    * loop is the one shape Columns cannot express, hence the repo's rare
    * `mapPartitions`. When a new key arrives with all k counters busy,
    * every counter decrements by one (zeros evicted): each decrement
    * pays for one increment, so the total decrement work is bounded by
    * the increments — amortized O(1) per row, O(k) memory, regardless
    * of key cardinality. Guarantee: any key with partition frequency
    * > n_p/(k+1) holds a counter when the pass ends.
    *
    * Output: (k: string key, w: long residual weight), ≤ k rows per
    * partition. The residuals UNDERCOUNT by at most n_p/(k+1). */
  def mgSummaries(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 100000, "Misra-Gries needs 1 <= k <= 100000")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string").as("k")).as[String]
      .mapPartitions { it =>
        val m = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach { s =>
          m.get(s) match {
            case Some(c)              => m.update(s, c + 1L)
            case None if m.size < k   => m.update(s, 1L)
            case None =>
              // decrement-all over a key snapshot (no removal mid-iteration)
              val ks = m.keysIterator.toArray
              var i = 0
              while (i < ks.length) {
                val c = m(ks(i))
                if (c == 1L) m.remove(ks(i)) else m.update(ks(i), c - 1L)
                i += 1
              }
          }
        }
        m.iterator
      }.toDF("k", "w")
  }

  /** Guaranteed heavy hitters via a mergeable Misra–Gries reduction
    * (Agarwal, Cormode, Huang, Phillips, Wei & Yi, "Mergeable
    * Summaries", PODS 2012): per-partition summaries are key-summed,
    * then cut back to ≤ k counters by subtracting the (k+1)-th largest
    * merged weight — the reduced summary keeps the global MG guarantee,
    * so every key with true frequency > n/(k+1) survives as a
    * candidate. The ≤ k candidates broadcast into one exact re-count
    * scan, and the final filter keeps exactly the keys whose TRUE count
    * clears n/(k+1) — a deterministic output (partitioning moves which
    * extra candidates appear, never which guaranteed-heavy rows pass),
    * which is what lets a SQL oracle replicate it bit-for-bit.
    *
    * Scale shape: one narrow mapPartitions (k counters/partition), one
    * ≤ k·partitions-row merge agg, a k+1-row TakeOrdered, one broadcast
    * semi-join re-count scan. The full-cardinality groupBy this
    * replaces is the thing that doesn't fit at 100 TB; candidates ≤ k
    * always fit. Output: (keyCol, n_key, n_total). */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val cand = mgSummaries(df, keyCol, k)
      .groupBy(col("k")).agg(sum(col("w")).as("w"))
    val kth = cand.select(col("w"))
      .orderBy(col("w").desc).limit(k + 1)
      .agg(when(count(lit(1)) > k, min(col("w"))).otherwise(lit(0L)).as("cut"))
    val kept = cand.crossJoin(broadcast(kth)).filter(col("w") > col("cut"))
    val exact = df.select(col(keyCol).cast("string").as("k"))
      .join(broadcast(kept.select(col("k"))), Seq("k"), "left_semi")
      .groupBy(col("k")).agg(count(lit(1)).as("n_key"))
    val total = df.select(col(keyCol)).agg(count(lit(1)).as("n_total"))
    exact.crossJoin(broadcast(total))
      .filter(col("n_key") * (k + 1) > col("n_total"))
      .select(col("k").as(keyCol), col("n_key"), col("n_total"))
  }

  /** Trailing-window distinct estimate from time-bucketed HLL registers:
    * registers are built once per (group, time bucket) — the KB-sized
    * mergeable state a streaming/warehouse pipeline stores per hour —
    * and every trailing window of `windowBuckets` buckets is answered by
    * register-max MERGE, never by touching raw rows again ("distinct
    * users in the trailing 3 h, every hour" over arbitrary history).
    *
    * The window merge is a constant explode of each register row to the
    * `windowBuckets` target anchors plus one max-combine — shuffle keys
    * (g, anchor, register) stay uniform; no range join, no re-scan.
    * Anchors emitted are the bucket values present in the data. Output:
    * (g, bucket, est_distinct). */
  def hllWindowed(df: DataFrame, groupCol: String, valueCol: String,
                  bucketCol: Column, windowBuckets: Int): DataFrame = {
    require(windowBuckets >= 1 && windowBuckets <= 1024,
      "need 1 <= windowBuckets <= 1024")
    val h = md5_prefix64(col(valueCol).cast("string"))
    val parts = df.select(col(groupCol).as("g"), bucketCol.cast("long").as("b"),
      (h % HllBuckets).as("bucket"), shiftright(h, HllBucketBits).as("rem"))
    val bitlen = when(col("rem") === 0L, lit(0))
      .otherwise(length(conv(col("rem"), 10, 2)))
    val regs = parts.withColumn("rho", lit(HllR) - bitlen)
      .groupBy(col("g"), col("b"), col("bucket")).agg(max(col("rho")).as("r"))
    val anchors = parts.select(col("g"), col("b")).distinct()
    val shifted = regs
      .withColumn("_off", explode(sequence(lit(0), lit(windowBuckets - 1))))
      .select(col("g"), (col("b") + col("_off")).as("b"), col("bucket"), col("r"))
      .join(anchors, Seq("g", "b"), "left_semi")
      .groupBy(col("g"), col("b"), col("bucket")).agg(max(col("r")).as("r"))
    hllEstimateFromRegisters(
        shifted.select(struct(col("g"), col("b")).as("g"), col("bucket"), col("r")),
        anchors.select(struct(col("g"), col("b")).as("g")), "est_distinct")
      .select(col("g.g").as("g"), col("g.b").as("bucket"), col("est_distinct"))
  }

  /** KMV set-operation estimates: union AND intersection cardinality of
    * two key sets from two k-sized hash samples (Beyer et al. 2007 —
    * the "distinct-value synopses" the KMV family exists for). The
    * anti-entropy question ("how much do these two epochs/sources
    * overlap") answered from two KB-sized summaries instead of a
    * distinct-join over both tables.
    *
    *   - each side keeps its k smallest distinct hashes (one sort-limit
    *     each — TakeOrderedAndProject, no global shuffle of the data);
    *   - the union KMV = k smallest of the merged samples, giving
    *     `est_union = (k-1)·2^56 div h_k` exactly as [[kmvDistinct]];
    *   - intersection via the Jaccard of the union sample:
    *     `est_inter = |union-sample ∩ both sides| · est_union div k`.
    *
    * Everything after the two per-side scans runs on ≤ 2k rows on the
    * driver-free plan; deterministic because the hash is. When the
    * merged sample holds fewer than k hashes both sides were sampled
    * exhaustively and the estimates ARE the exact counts. Output one
    * row: (k, est_union, est_inter). */
  def kmvSetOps(a: DataFrame, b: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 2 && k <= 4096, "KMV set ops need 2 <= k <= 4096")
    // (k-1)·2^56 overflows signed 64-bit for k >= 129, so the estimator is
    // computed exactly driver-side as BigInt and carried into the plan as a
    // decimal(38,0) literal; `div` (integral divide) still yields a long.
    val estNumerator = BigInt(k - 1) * BigInt(MaxHash)
    val estNum = s"cast('$estNumerator' as decimal(38,0))"
    def sample(df: DataFrame, side: String) = df
      .select(md5_prefix64(col(valueCol).cast("string")).as("h")).distinct()
      .orderBy(col("h").asc).limit(k)
      .withColumn("side", lit(side))
    val merged = sample(a, "a").unionByName(sample(b, "b"))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n_sides"))
      .orderBy(col("h").asc).limit(k)
    merged.agg(
        count(lit(1)).as("n_seen"), max(col("h")).as("kth_hash"),
        sum(when(col("n_sides") === 2, 1L).otherwise(0L)).as("n_both"))
      .select(lit(k.toLong).as("k"),
        when(col("n_seen") < k, col("n_seen"))
          .otherwise(expr(s"$estNum div greatest(kth_hash, 1)"))
          .as("est_union"),
        when(col("n_seen") < k, col("n_both"))
          .otherwise(expr(
            s"(cast(n_both as decimal(38,0)) * ($estNum div greatest(kth_hash, 1))) div $k"))
          .as("est_inter"))
  }
}
