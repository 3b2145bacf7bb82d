package graft

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GlobalOrder

/** [[GlobalOrder]] must be a drop-in for the single-partition global
  * window: identical ranks and running sums under a total order, with
  * zero partition-less Window nodes anywhere in its plan. */
class GlobalOrderSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "7")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def partitionlessWindows(df: DataFrame): Seq[logical.Window] =
    df.queryExecution.optimizedPlan.collect {
      case w: logical.Window if w.partitionSpec.isEmpty => w
    }

  test("rank equals the single-partition row_number under a total order") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      // heavy ties on k force the tie-break column to carry the order
      val rows = (1 to 500).map(i => (rnd.nextInt(20).toLong, i.toLong))
      val df = rows.toDF("k", "id")
      val want = df.withColumn("r", row_number().over(
          Window.orderBy(col("k").asc, col("id").asc)).cast("long"))
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
      val gotDf = GlobalOrder.rank(df, col("k"), Seq(col("id").asc), "r")
      val got = gotDf.collect().map(r => (r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"seed $seed")
      assert(partitionlessWindows(gotDf).isEmpty,
        "GlobalOrder must not plan any partition-less Window")
    }
  }

  test("running sums equal the inclusive window sums, negatives included") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed + 10)
      val rows = (1 to 400).map(i =>
        (i.toLong, (rnd.nextInt(200) - 100).toLong, rnd.nextInt(50).toLong))
      val df = rows.toDF("v", "a", "b")
      val w = Window.orderBy(col("v").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val want = df.withColumn("ca", sum(col("a")).over(w))
        .withColumn("cb", sum(col("b")).over(w))
        .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSet
      val gotDf = GlobalOrder.withRunningAggs(df, col("v"), Nil,
        Seq((col("a"), "ca"), (col("b"), "cb")), rankName = Some("rk"))
      val got = gotDf.collect().map(r =>
        (r.getLong(0), r.getLong(3), r.getLong(4))).toSet
      assert(got == want, s"seed $seed")
      // the rank rides along consistently: row with rank r has v = r
      val ranks = gotDf.collect().map(r => (r.getAs[Long]("rk"), r.getLong(0)))
      assert(ranks.forall { case (rk, v) => rk == v }, s"seed $seed ranks")
    }
  }

  test("null values in a running sum match the window's null semantics") {
    // nulls at the head: the sum stays null until the first non-null,
    // then nulls pass the prior total through untouched
    val rows = Seq((1L, None), (2L, None), (3L, Some(5L)), (4L, None),
      (5L, Some(2L)), (6L, None))
    val df = rows.map { case (v, x) => (v, x.map(java.lang.Long.valueOf).orNull) }
      .toDF("v", "x")
    val w = Window.orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("cx", sum(col("x")).over(w))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    val got = GlobalOrder.runningSum(df, col("v"), Nil, col("x"), "cx")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got == want)
    assert(want(2L).isEmpty && want(4L).contains(5L) && want(6L).contains(7L))
  }

  test("decimal running sums keep the decimal type") {
    val df = Seq((1L, BigDecimal(3)), (2L, BigDecimal(5)), (3L, BigDecimal(7)))
      .toDF("v", "x")
      .select(col("v"), col("x").cast("decimal(38,0)").as("x"))
    val out = GlobalOrder.runningSum(df, col("v"), Nil, col("x"), "cx")
    assert(out.schema("cx").dataType.typeName.startsWith("decimal"))
    val got = out.collect().map(r =>
      (r.getLong(0), r.getDecimal(2).longValueExact())).toSet
    assert(got == Set((1L, 3L), (2L, 8L), (3L, 15L)))
  }

  test("exclusive running max equals the strictly-preceding window max") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed + 20)
      val rows = (1 to 300).map(i => (i.toLong, rnd.nextInt(100).toLong))
      val df = rows.toDF("v", "y")
      val w = Window.orderBy(col("v").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val want = df.withColumn("m", max(col("y")).over(w))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
      val got = GlobalOrder.withRunningAggs(df, col("v"), Nil,
          exclMaxes = Seq((col("y"), "m")))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
      assert(got == want, s"seed $seed")
    }
  }

  test("empty and single-row inputs") {
    val empty = Seq.empty[(Long, Long)].toDF("v", "x")
    assert(GlobalOrder.withRunningAggs(empty, col("v"), Nil,
      Seq((col("x"), "cx")), Some("r")).count() == 0)
    val one = Seq((5L, 9L)).toDF("v", "x")
    val got = GlobalOrder.withRunningAggs(one, col("v"), Nil,
      Seq((col("x"), "cx")), Some("r")).collect().head
    assert(got.getAs[Long]("r") == 1L && got.getAs[Long]("cx") == 9L)
  }

  test("a far outlier collapsing the equal-width buckets stays correct") {
    // one key near Long.MaxValue squeezes every other key into bucket 0:
    // performance degrades (documented), correctness must not
    val rows = (1 to 500).map(i => (i.toLong, i.toLong)) :+
      (Long.MaxValue / 2, 9999L)
    val df = rows.toDF("k", "id")
    val want = df.withColumn("r", row_number().over(
        Window.orderBy(col("k").asc, col("id").asc)).cast("long"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val got = GlobalOrder.rank(df, col("k"), Seq(col("id").asc), "r")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    // negative-to-positive span (hash-key shape): max-min would overflow
    // a bare long subtraction — the decimal path must hold
    val rows2 = Seq((Long.MinValue / 2 + 1, 1L), (-5L, 2L), (0L, 3L),
      (7L, 4L), (Long.MaxValue / 2, 5L))
    val got2 = GlobalOrder.rank(rows2.toDF("k", "id"), col("k"),
        Seq(col("id").asc), "r")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got2 == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 5L))
  }

  test("skewed key distribution still ranks correctly") {
    // 90% of rows share one order key: range partitioning puts all of
    // them in one partition (the contract: equal keys co-locate), the
    // tie-break id keeps the order total
    val rows = (1 to 1000).map(i =>
      (if (i <= 900) 7L else i.toLong, i.toLong))
    val df = rows.toDF("k", "id")
    val want = df.withColumn("r", row_number().over(
        Window.orderBy(col("k").asc, col("id").asc)).cast("long"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val got = GlobalOrder.rank(df, col("k"), Seq(col("id").asc), "r")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }
}
