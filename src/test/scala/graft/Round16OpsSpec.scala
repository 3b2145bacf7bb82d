package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.Fixpoint

/** Round-16 additions: SCC artifact reuse and the condensation-from-
  * labels quotient overload. */
class Round16OpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  // ---- condensationEdges(labels, edges) ----

  test("condensationEdges from precomputed labels matches the from-scratch run") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (4L, 5L), (5L, 4L), (3L, 4L), (3L, 5L), (5L, 6L)).toDF("src", "dst")
    val labels = Fixpoint.stronglyConnectedComponents(edges)
    val fromLabels = Fixpoint.condensationEdges(labels, edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fromScratch = Fixpoint.condensationEdges(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromLabels == fromScratch)
    assert(fromLabels == Set((3L, 5L), (5L, 6L)))
  }

  // ---- sccArtifact ----

  test("sccArtifact builds once and reads back byte-identical labels") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L), (4L, 3L))
      .toDF("src", "dst")
    val dir = java.nio.file.Files.createTempDirectory("graft_scc_spec")
      .resolve("art").toString
    val first = Fixpoint.sccArtifact(spark, edges, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fresh = Fixpoint.stronglyConnectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(first == fresh)
    // second call must LOAD, not rebuild: poison the input and verify the
    // cached assignment still comes back
    val poisoned = Seq((9L, 9L)).toDF("src", "dst")
    val second = Fixpoint.sccArtifact(spark, poisoned, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(second == first)
  }
}
