package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-bucketed spatial joins over integer point coordinates.
  *
  * The same bucket-claim design as [[Temporal.intervalOverlapJoin]] and
  * the LSH band joins: candidates come from an EQUI-join on coarse grid
  * cells (shuffle-partitionable, AQE-skew-splittable), exactness from a
  * residual distance filter — never a cross join. The reference's graph
  * has no geometry, but `nearest X within radius` is the spatial twin of
  * its `nearest seed` asset queries and the standard geo-enrichment step
  * of a training-data pipeline (tile joins over lat/lon metadata).
  */
object Spatial {

  /** Nearest right-point within `radius` (Euclidean) for every left
    * point, via grid-cell bucketing: the RIGHT side is exploded to its
    * own cell plus the 8 neighbors (9 rows — constant fan-out on the
    * smaller/dimension side), the left keyed by its single cell, then
    * one equi-join on the cell id and an exact squared-distance filter.
    * `cell >= radius` guarantees every true neighbor shares one of the 9
    * cells, so the result is exact, not approximate.
    *
    * Ties break to the smallest right id via one min(struct) aggregate —
    * no window over the candidate fan-out. Lefts with no right inside
    * the radius are absent (inner semantics; left-join in the caller if
    * misses must surface). Inputs: (id, x, y) with integral coords.
    * Output: (lid, rid, d2).
    *
    * Scale: candidates per left = points in 9 cells, so pick `cell` near
    * `radius` (larger cells → more residual waste; the 9-cell claim is
    * what keeps the join equi and the shuffle balanced). */
  def gridNearest(left: DataFrame, right: DataFrame,
                  radius: Long, cell: Long): DataFrame = {
    require(cell >= radius && radius > 0,
      "need cell >= radius > 0 for the 9-cell claim to be exact")
    val l = left.select(col("id").as("lid"), col("x").as("lx"), col("y").as("ly"))
      .withColumn("cx", expr(s"lx div $cell")).withColumn("cy", expr(s"ly div $cell"))
    val r = right.select(col("id").as("rid"), col("x").as("rx"), col("y").as("ry"))
      .withColumn("d", explode(expr("sequence(-1, 1)")))
      .withColumn("e", explode(expr("sequence(-1, 1)")))
      .select(col("rid"), col("rx"), col("ry"),
        (expr(s"rx div $cell") + col("d")).as("cx"),
        (expr(s"ry div $cell") + col("e")).as("cy"))
    l.join(r, Seq("cx", "cy"))
      .withColumn("d2",
        (col("lx") - col("rx")) * (col("lx") - col("rx")) +
          (col("ly") - col("ry")) * (col("ly") - col("ry")))
      .filter(col("d2") <= radius * radius)
      .groupBy(col("lid"))
      .agg(min(struct(col("d2"), col("rid"))).as("m"))
      .select(col("lid"), col("m.rid").as("rid"), col("m.d2").as("d2"))
  }
}
