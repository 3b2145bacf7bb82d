package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter join pruning — the explicit form of the semi-join
  * pushdown Spark's own InjectRuntimeFilter applies only when statistics
  * justify it. A large fact side is pre-filtered by a compact Bloom
  * filter built from the dim side's join keys BEFORE the shuffle, so the
  * exchange ships only rows that can possibly match (plus the filter's
  * false-positive rate); the exact join afterwards removes false
  * positives, so results are byte-identical to the plain join.
  *
  * At 100 TB this is the difference between shuffling the whole fact
  * table and shuffling the ~matching fraction: a 1M-key filter at 8
  * bits/key is ~1 MB — driver-buildable and task-shippable — while the
  * rows it prunes never leave the scan stage. Uses Spark's own
  * `BloomFilterAggregate` / `BloomFilterMightContain` expressions (the
  * machinery behind spark.sql.optimizer.runtime.bloomFilter), keyed by
  * `xxhash64` exactly as the built-in runtime filter is.
  */
object BloomJoin {

  /** Build a Bloom filter over a key column; returns the serialized
    * sketch. The single aggregated row collected here IS the filter —
    * the same bytes a broadcast would ship (BloomFilterMightContain
    * requires a literal/scalar-subquery filter, so it rides along as a
    * task-serialized literal). */
  def buildBloom(keys: DataFrame, keyCol: String, expectedItems: Long): Array[Byte] = {
    val agg = Bridge.column(
      new BloomFilterAggregate(Bridge.expression(xxhash64(col(keyCol))), expectedItems)
        .toAggregateExpression())
    keys.select(col(keyCol)).agg(agg.as("bloom")).head.getAs[Array[Byte]](0)
  }

  /** Membership test against a built filter (false positives possible,
    * false negatives impossible) — codegen'd, evaluated in the scan
    * stage so pruning happens before any exchange. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    Bridge.column(BloomFilterMightContain(Literal(bloom, BinaryType),
      Bridge.expression(xxhash64(key))))

  /** Exact inner join with the big side Bloom-pruned first. Key columns
    * must have distinct names (rename before calling). Result is
    * identical to `big.join(small, bigKey === smallKey)` — the filter
    * only reduces shuffled volume. */
  def prefilteredJoin(big: DataFrame, bigKey: String,
                      small: DataFrame, smallKey: String,
                      expectedItems: Long): DataFrame = {
    require(bigKey != smallKey,
      "bloom prefilteredJoin needs distinct key names; rename one side")
    val bloom = buildBloom(small, smallKey, expectedItems)
    big.filter(mightContain(bloom, col(bigKey)))
      .join(small, col(bigKey) === col(smallKey))
  }
}
