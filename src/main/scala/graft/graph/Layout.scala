package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, shiftleft, shiftright}

/** Physical layout for graph tables at rest — the engine's replacement
  * for the reference's index DDL (cartography/graph/querybuilder.py:
  * 1319-1557, create_indexes.py): Neo4j needs secondary indexes on
  * id/lastupdated/matcher keys; a columnar store instead needs partition
  * columns (tenant scope → partition pruning on cleanup), bucketing on
  * the merge key (co-located joins), and in-file ordering (min/max page
  * skipping on the id).
  */
object Layout {

  /** Per-label layout: tenant partition columns + merge-key sort.
    * `buckets` maps to bucketed tables on a real catalog; path-based
    * parquet approximates it with a keyed repartition before write. */
  final case class TableLayout(partitionCols: Seq[String] = Nil,
                               sortCols: Seq[String] = Seq(GraphStore.ID),
                               buckets: Int = 0)

  /** Write a node/edge table in its layout; cleanup/merge reads that
    * filter on the partition columns then prune to the touched tenant
    * directories only. */
  def writeTable(df: DataFrame, path: String, layout: TableLayout): Unit = {
    val bucketed =
      if (layout.buckets > 0)
        df.repartition(layout.buckets, layout.sortCols.map(col): _*)
      else df
    val sorted = bucketed.sortWithinPartitions(layout.sortCols.map(col): _*)
    val writer = sorted.write.mode("overwrite")
    (if (layout.partitionCols.nonEmpty) writer.partitionBy(layout.partitionCols: _*)
     else writer).parquet(path)
  }

  def readTable(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Spread the low 16 bits of x to the even bit positions of a 32-bit
    * value (classic magic-number bit interleave — public-domain "Bit
    * Twiddling Hacks" construction). Pure long arithmetic, codegen'd. */
  private def spread16(x: Column): Column = {
    val a = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Inverse of [[spread16]]: collapse the even bit positions of a 32-bit
    * value back to 16 contiguous bits. */
  private def compact16(z: Column): Column = {
    val a = z.bitwiseAND(lit(0x55555555L))
    val b = a.bitwiseOR(shiftright(a, 1)).bitwiseAND(lit(0x33333333L))
    val c = b.bitwiseOR(shiftright(b, 2)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = c.bitwiseOR(shiftright(c, 4)).bitwiseAND(lit(0x00FF00FFL))
    d.bitwiseOR(shiftright(d, 8)).bitwiseAND(lit(0x0000FFFFL))
  }

  /** 32-bit Morton (Z-order) value interleaving the low 16 bits of two
    * dimensions: bit i of x lands at position 2i, bit i of y at 2i+1.
    * Sorting by this value clusters rows that are close in BOTH
    * dimensions, so per-file min/max statistics become selective on
    * either column — the multi-dimensional data-skipping layout
    * (Delta/Iceberg OPTIMIZE ZORDER) expressed as plain columnar
    * arithmetic. Quantize wider domains into 16 bits first (rank, bucket
    * id, epoch-hour). */
  def zValue(x: Column, y: Column): Column =
    spread16(x.bitwiseAND(lit(0xFFFFL)))
      .bitwiseOR(shiftleft(spread16(y.bitwiseAND(lit(0xFFFFL))), 1))

  /** Recover (x, y) from a [[zValue]] — the round-trip proof used by the
    * layout spec. */
  def zInverse(z: Column): (Column, Column) =
    (compact16(z), compact16(shiftright(z, 1)))

  /** Write z-order-clustered: range-partition on the interleaved value
    * (so files hold contiguous z ranges → disjoint min/max envelopes on
    * both source columns), sort within each file, drop the helper
    * column. Readers filtering on EITHER dimension prune files via
    * ordinary parquet column stats — no index structure to maintain. */
  def writeZOrdered(df: DataFrame, path: String, x: Column, y: Column,
                    numFiles: Int): Unit =
    df.withColumn("_z", zValue(x, y))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)

  /** Register a bucketed, sorted table in the session catalog — REAL
    * bucket metadata (path-based parquet cannot carry it), so a merge or
    * join on the bucket key between two same-bucketed tables runs with
    * ZERO shuffle exchanges: the co-located layout the 100 TB store
    * uses for its node tables (bucket on `id`, partition by tenant). */
  def writeBucketedTable(df: DataFrame, table: String, layout: TableLayout): Unit = {
    require(layout.buckets > 0, "bucketed table needs buckets > 0")
    val w = df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(layout.buckets, layout.sortCols.head, layout.sortCols.tail: _*)
      .sortBy(layout.sortCols.head, layout.sortCols.tail: _*)
    (if (layout.partitionCols.nonEmpty) w.partitionBy(layout.partitionCols: _*)
     else w).saveAsTable(table)
  }
}
