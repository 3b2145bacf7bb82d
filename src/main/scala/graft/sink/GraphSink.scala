package graft.sink

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.graph.{Graph, GraphStore}

/** Neo4j load path — per BASELINE.json the graph can be bulk-loaded into
  * Neo4j after the Spark ETL. Two writer shapes, both network-free here:
  *
  * 1. **Bulk-import CSV** ([[bulkImportCsv]]): neo4j-admin database-import
  *    format — per-label node CSVs with `:ID`/`:LABEL` headers and
  *    per-relationship CSVs with `:START_ID`/`:END_ID`/`:TYPE` — written
  *    distributed (one part file per partition; the importer accepts
  *    many data files per header). This is the 100 TB path: no Bolt
  *    round-trips at all.
  *
  * 2. **Batched transactional writer** ([[foreachBatched]] +
  *    [[nodeUpsertCypher]]): the incremental path — per-partition
  *    connections, rows grouped into bounded parameter batches (the
  *    reference's 10k rows/tx, tx.py:641), one generated UNWIND+MERGE
  *    statement per label (querybuilder.py:1266-1279). A Bolt
  *    [[RowWriter]] plugs in where the tests plug a collector.
  */
object GraphSink {

  val DefaultBatchSize = 10000 // reference: load_graph_data batch_size (tx.py:641)

  /** Per-partition writer contract (open once per partition, bounded
    * batches, close in finally — connection lifecycle at the executor). */
  trait RowWriter extends Serializable {
    def open(partitionId: Int): Unit = {}
    def writeBatch(rows: Seq[Row]): Unit
    def close(): Unit = {}
  }

  /** Stream a DataFrame through per-partition writers in bounded batches.
    * Batching/retry beyond this is the writer's concern (Spark retries
    * the task; the writer must be idempotent — MERGE is). */
  def foreachBatched(df: DataFrame, batchSize: Int = DefaultBatchSize)
                    (factory: () => RowWriter): Unit =
    df.foreachPartition { it: Iterator[Row] =>
      val w = factory()
      w.open(TaskContext.getPartitionId())
      try it.grouped(batchSize).foreach(b => w.writeBatch(b))
      finally w.close()
    }

  /** The generated per-label upsert statement the batched writer executes
    * (reference template querybuilder.py:1266-1279; `$batch` is one
    * parameter batch from [[foreachBatched]]). */
  def nodeUpsertCypher(label: String, props: Seq[String]): String = {
    val sets = ("i.lastupdated = $tag" +: props.map(p => s"i.$p = item.$p")).mkString(", ")
    s"""UNWIND $$batch AS item
       |MERGE (i:$label{id: item.id})
       |ON CREATE SET i.firstseen = timestamp()
       |SET $sets""".stripMargin
  }

  def edgeUpsertCypher(srcLabel: String, relLabel: String, dstLabel: String,
                       props: Seq[String]): String = {
    val sets = ("r.lastupdated = $tag" +: props.map(p => s"r.$p = item.$p")).mkString(", ")
    s"""UNWIND $$batch AS item
       |MATCH (a:$srcLabel{id: item.src_id})
       |MATCH (b:$dstLabel{id: item.dst_id})
       |MERGE (a)-[r:$relLabel]->(b)
       |ON CREATE SET r.firstseen = timestamp()
       |SET $sets""".stripMargin
  }

  private def csvReady(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: org.apache.spark.sql.types.ArrayType =>
          // neo4j-admin array delimiter is ';'
          array_join(col(f.name).cast("array<string>"), ";").as(f.name)
        case _ => col(f.name).cast("string").as(f.name)
      }
    }
    df.select(cols.toSeq: _*)
  }

  /** Write the whole graph in neo4j-admin bulk-import layout:
    * `<dir>/nodes_<label>/header.csv` + `part-*.csv` data files, and
    * `<dir>/rels_<src>_<rel>_<dst>/...` for every edge table. Returns the
    * `--nodes`/`--relationships` argument pairs for the import command. */
  def bulkImportCsv(graph: Graph, outDir: String): Seq[String] = {
    val nodeArgs = graph.nodes.toSeq.sortBy(_._1).map { case (label, df0) =>
      val hasLabels = df0.columns.contains("labels")
      val df = csvReady(if (hasLabels) df0 else df0.withColumn("labels", lit(label)))
        .withColumn("labels",
          when(col("labels").isNull || col("labels") === "", lit(label))
            .otherwise(col("labels")))
      val props = df.columns.filterNot(c => c == "id" || c == "labels")
      val header = (s"id:ID($label)" +: props.toSeq :+ ":LABEL").mkString(",")
      val dir = s"$outDir/nodes_$label"
      df.select(("id" +: props.toSeq :+ "labels").map(col): _*)
        .write.mode("overwrite").option("header", "false").option("quoteAll", "true")
        .csv(s"$dir/data")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/header.csv"), header)
      s"--nodes=$dir/header.csv,$dir/data/part-.*"
    }
    val relArgs = graph.edges.toSeq.sortBy(_._1.toString).map { case ((s, r, d), df0) =>
      val df = csvReady(df0)
      val props = df.columns.filterNot(c => c == "src_id" || c == "dst_id")
      val header = (s":START_ID($s)" +: props.toSeq :+ s":END_ID($d)" :+ ":TYPE").mkString(",")
      val dir = s"$outDir/rels_${s}_${r}_$d"
      df.select((col("src_id") +: props.map(col).toSeq :+ col("dst_id") :+ lit(r).as("type")): _*)
        .write.mode("overwrite").option("header", "false").option("quoteAll", "true")
        .csv(s"$dir/data")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/header.csv"), header)
      s"--relationships=$dir/header.csv,$dir/data/part-.*"
    }
    nodeArgs ++ relArgs
  }
}

/** Sync bookkeeping: one control row per (group type, group id, synced
  * type) stamped with the sync tag (reference util.py:362-430
  * ModuleSyncMetadata). */
object SyncMetadata {
  def record(graph: Graph, groupType: String, groupId: String, syncedType: String,
             tag: Long): Graph = {
    val spark = graph.nodes.headOption.map(_._2.sparkSession)
      .getOrElse(org.apache.spark.sql.SparkSession.active)
    import spark.implicits._
    val batch = Seq((s"$groupType:$groupId:$syncedType", groupType, groupId, syncedType))
      .toDF("id", "grouptype", "groupid", "syncedtype")
    val existing = graph.nodes.getOrElse("ModuleSyncMetadata", GraphStore.emptyLike(batch))
    graph.withNodes("ModuleSyncMetadata", GraphStore.upsertNodes(existing, batch, tag))
  }
}
