package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

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
