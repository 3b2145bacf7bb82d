package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered funnel analysis: for each key, the earliest time each stage
  * was reached given that it happened at-or-after the key's previous
  * stage — the view→click→purchase conversion shape of behavioral
  * analytics, and (on a sync pipeline) discover→ingest→link progression
  * tracking. Keys that never reach a stage carry nulls from there on.
  *
  * Each stage is one filtered scan + an equi-join on the key against the
  * previous stage's (key, time) table + a min-aggregate: stage tables
  * only shrink monotonically, every join/aggregate shares the same key
  * partitioning (one co-partitioned shuffle chain, AQE broadcasts the
  * later tiny stages), and nothing is ever windowed globally.
  */
object Funnel {

  /** `stages` = (outputColumn, rowPredicate) in funnel order. Output: one
    * row per key reaching stage 1, with the first-reach time per stage
    * (null once the funnel is abandoned). */
  def funnel(df: DataFrame, keyCol: String, timeCol: String,
             stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.map(_._1).distinct.size == stages.size,
      "funnel stage output names must be distinct")
    require(!stages.map(_._1).exists(df.columns.contains),
      "stage output names must not collide with input columns")
    val head = df.filter(stages.head._2)
      .groupBy(col(keyCol)).agg(min(col(timeCol)).as(stages.head._1))
    val stageTables = stages.tail.scanLeft(head -> stages.head._1) {
      case ((prev, prevName), (name, pred)) =>
        val next = df.filter(pred)
          .join(prev.select(col(keyCol), col(prevName)), keyCol)
          .filter(col(timeCol) >= col(prevName))
          .groupBy(col(keyCol)).agg(min(col(timeCol)).as(name))
        next -> name
    }.map(_._1)
    stageTables.reduceLeft((acc, next) => acc.join(next, Seq(keyCol), "left"))
  }
}
