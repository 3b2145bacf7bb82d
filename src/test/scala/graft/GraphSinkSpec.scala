package graft

import java.nio.file.Files

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.{Graph, GraphStore}
import graft.sink.{GraphSink, SyncMetadata}

/** Collector used in place of a Bolt connection by the batched-writer
  * test (local mode: executors share the JVM, so a static map observes
  * the writes). */
object CollectingWriter {
  val batches = new TrieMap[(Int, Int), Int]() // (partition, batchIdx) -> size
  def clear(): Unit = batches.clear()
}

class GraphSinkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("foreachBatched bounds batch sizes and writes every row") {
    CollectingWriter.clear()
    val df = spark.range(25).toDF("id")
    GraphSink.foreachBatched(df.repartition(2), batchSize = 10) { () =>
      new GraphSink.RowWriter {
        private var pid = -1
        private var idx = 0
        override def open(partitionId: Int): Unit = pid = partitionId
        def writeBatch(rows: Seq[Row]): Unit = {
          CollectingWriter.batches.put((pid, idx), rows.size)
          idx += 1
        }
      }
    }
    val sizes = CollectingWriter.batches.values.toSeq
    assert(sizes.sum == 25)
    assert(sizes.forall(_ <= 10))
  }

  test("generated upsert cypher matches the reference template shape") {
    val got = GraphSink.nodeUpsertCypher("Instance", Seq("state", "arn"))
    assert(got ==
      """UNWIND $batch AS item
        |MERGE (i:Instance{id: item.id})
        |ON CREATE SET i.firstseen = timestamp()
        |SET i.lastupdated = $tag, i.state = item.state, i.arn = item.arn""".stripMargin)
    val edge = GraphSink.edgeUpsertCypher("A", "REL", "B", Nil)
    assert(edge.contains("MERGE (a)-[r:REL]->(b)"))
    assert(edge.contains("MATCH (a:A{id: item.src_id})"))
  }

  test("bulkImportCsv writes neo4j-admin headers and data for nodes and rels") {
    val nodes = Seq((1L, "x"), (2L, "y")).toDF("nid", "name")
      .select($"nid".as("id"), $"name")
    val nodeTable = GraphStore.upsertNodes(GraphStore.emptyLike(nodes), nodes, 100L)
    val edges = Seq((1L, 2L)).toDF("src_id", "dst_id")
    val edgeTable = GraphStore.upsertEdges(
      GraphStore.emptyLike(edges, Seq("src_id", "dst_id")), edges, 100L)
    val g = Graph().withNodes("Thing", nodeTable)
      .withEdges(("Thing", "LINKS", "Thing"), edgeTable)

    val out = Files.createTempDirectory("sink").toString
    val args = GraphSink.bulkImportCsv(g, out)
    assert(args.exists(_.startsWith(s"--nodes=$out/nodes_Thing/header.csv")))
    assert(args.exists(_.startsWith(s"--relationships=$out/rels_Thing_LINKS_Thing/header.csv")))

    val nodeHeader = Files.readString(java.nio.file.Paths.get(s"$out/nodes_Thing/header.csv"))
    assert(nodeHeader == "id:ID(Thing),firstseen,lastupdated,name,:LABEL")
    val nodeData = spark.read.option("header", "false")
      .csv(s"$out/nodes_Thing/data").collect()
      .map(r => (r.getString(0), r.getString(3), r.getString(4))).toSet
    assert(nodeData == Set(("1", "x", "Thing"), ("2", "y", "Thing")))

    val relHeader = Files.readString(
      java.nio.file.Paths.get(s"$out/rels_Thing_LINKS_Thing/header.csv"))
    assert(relHeader == ":START_ID(Thing),firstseen,lastupdated,:END_ID(Thing),:TYPE")
    val relData = spark.read.option("header", "false")
      .csv(s"$out/rels_Thing_LINKS_Thing/data").collect()
      .map(r => (r.getString(0), r.getString(3), r.getString(4))).toSet
    assert(relData == Set(("1", "2", "LINKS")))
  }

  test("sync metadata control row is upserted with the tag") {
    val g = SyncMetadata.record(Graph(), "AWSAccount", "acct-1", "Instance", 500L)
    val rows = g.nodeTable("ModuleSyncMetadata")
      .select($"id", $"lastupdated").as[(String, Long)].collect().toSet
    assert(rows == Set(("AWSAccount:acct-1:Instance", 500L)))
    val g2 = SyncMetadata.record(g, "AWSAccount", "acct-1", "Instance", 600L)
    val rows2 = g2.nodeTable("ModuleSyncMetadata")
      .select($"id", $"firstseen", $"lastupdated").as[(String, Long, Long)].collect().toSet
    assert(rows2 == Set(("AWSAccount:acct-1:Instance", 500L, 600L)))
  }
}
