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
}
