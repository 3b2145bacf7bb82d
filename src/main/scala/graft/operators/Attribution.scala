package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch marketing attribution over touch/conversion event
  * streams — the four standard credit models (last-touch, first-touch,
  * linear, U-shaped/position-based) computed together in ONE pass with
  * exact ppm shares (no floats: each conversion's shares sum to exactly
  * 1,000,000 with the integer-division remainder assigned to the final
  * touch, documented and deterministic).
  *
  * Assignment contract: a touch credits the EARLIEST conversion at or
  * after it within `lookbackSec` for the same user (the standard
  * conversion-window rule). Both joins shuffle on the user key — the
  * per-user touch×conversion candidate volume is the scale knob, and a
  * bot-grade hot user is the documented skew (cap touches per user
  * upstream, the `Sampling.capPerGroup` guard). Credit totals are
  * decimal(38,0) sums of share_ppm × value_cents, so petabyte-scale
  * credit cannot wrap silently; the BIGINT step is guarded in-plan
  * (raise_error past ±(2^63−1) — a bare cast under non-ANSI mode would
  * return NULL silently, which is exactly the failure this guard
  * forbids).
  *
  * Output: (model, channel, n_touches, credit_ppm_cents) — divide by
  * 1e6 for cents; one row per model×channel that received any credit.
  */
object Attribution {

  val Models: Seq[String] = Seq("first_touch", "last_touch", "linear", "u_shaped")

  /** `touches`: (user_id, touch_id, channel, ts). `conversions`:
    * (user_id, conv_id, ts, value_cents). Timestamps are epoch longs in
    * ANY consistent unit — `lookbackSec` is interpreted in the same unit
    * as `ts` (the gates pass microseconds). */
  def multiTouch(touches: DataFrame, conversions: DataFrame,
                 lookbackSec: Long): DataFrame = {
    require(lookbackSec > 0, "lookbackSec must be positive")
    val t = touches.select(col("user_id"), col("touch_id"), col("channel"),
      col("ts").cast("long").as("t_ts"))
    val c = conversions.select(col("user_id"), col("conv_id"),
      col("ts").cast("long").as("c_ts"), col("value_cents").cast("long"))
    // earliest conversion at/after each touch inside the lookback window
    val assigned = t.join(c, Seq("user_id"))
      .filter(col("t_ts") <= col("c_ts") &&
        col("c_ts") - col("t_ts") <= lookbackSec)
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col("user_id"), col("touch_id"), col("channel"),
            col("t_ts"))
          .orderBy(col("c_ts").asc, col("conv_id").asc)))
      .filter(col("_rk") === 1).drop("_rk")
    // position of each credited touch within its conversion's path
    val w = Window.partitionBy(col("conv_id"))
      .orderBy(col("t_ts").asc, col("touch_id").asc)
    val positioned = assigned
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("conv_id"))).cast("long"))
    // exact ppm shares per model; remainders go to the LAST touch so
    // every conversion's shares sum to exactly 1e6
    val linBase = expr("1000000 div n")
    val linShare = when(col("pos") === col("n"),
      lit(1000000L) - linBase * (col("n") - 1)).otherwise(linBase)
    val midBase = expr("200000 div greatest(n - 2, 1)")
    val uShare = when(col("n") === 1, lit(1000000L))
      .when(col("n") === 2,
        when(col("pos") === 1, lit(500000L)).otherwise(lit(500000L)))
      .when(col("pos") === 1, lit(400000L))
      .when(col("pos") === col("n"),
        lit(600000L) - midBase * (col("n") - 2))
      .otherwise(midBase)
    val shares = positioned.select(col("channel"), col("value_cents"),
      explode(array(
        struct(lit("first_touch").as("model"),
          when(col("pos") === 1, lit(1000000L)).otherwise(lit(0L)).as("share")),
        struct(lit("last_touch").as("model"),
          when(col("pos") === col("n"), lit(1000000L)).otherwise(lit(0L)).as("share")),
        struct(lit("linear").as("model"), linShare.as("share")),
        struct(lit("u_shaped").as("model"), uShare.as("share")))).as("m"))
      .select(col("m.model").as("model"), col("channel"),
        col("m.share").as("share"), col("value_cents"))
      .filter(col("share") > 0)
    shares.groupBy(col("model"), col("channel"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("share").cast("decimal(38,0)") * col("value_cents"))
          .as("_credit"))
      .select(col("model"), col("channel"), col("n_touches"),
        // non-ANSI decimal→bigint overflow is a silent NULL; guard so an
        // overflowed credit total raises instead
        when(abs(col("_credit")) > lit(Long.MaxValue).cast("decimal(38,0)"),
          expr("raise_error('Attribution.multiTouch: credit total " +
            "overflows bigint - report in larger units upstream')"))
          .otherwise(col("_credit").cast("bigint")).as("credit_ppm_cents"))
  }
}
