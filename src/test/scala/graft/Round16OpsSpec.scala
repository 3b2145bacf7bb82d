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

  // ---- Readers.iterateDicts ----

  test("iterateDicts streams all rows without a cap") {
    val df = spark.range(0, 150000).selectExpr("id", "id * 2 AS dbl")
    // over the list readers' DefaultMaxRows (100k) — the capped reader
    // refuses, the iterator streams
    intercept[IllegalArgumentException] { graft.client.Readers.listOfDicts(df) }
    val it = graft.client.Readers.iterateDicts(df)
    var n = 0L
    var sum = 0L
    it.foreach { m => n += 1; sum += m("dbl").asInstanceOf[Long] }
    assert(n == 150000L)
    assert(sum == 149999L * 150000L)
  }

  // ---- ReferenceLibrary ----

  test("reference library spans all four frameworks with titled controls") {
    import graft.rules.ReferenceLibrary
    val shortNames = ReferenceLibrary.rules.flatMap(_.controls).map(_.shortName).toSet
    assert(shortNames == Set("cis", "soc2", "iso27001", "nist-ai-rmf"))
    ReferenceLibrary.rules.foreach { r =>
      assert(r.facts.nonEmpty && r.controls.nonEmpty)
      r.controls.foreach(c => assert(c.title.nonEmpty && c.revision.nonEmpty))
    }
    assert(ReferenceLibrary.rules.flatMap(_.facts).map(_.factId).distinct.size >= 14)
  }

  test("controlSummary fans each fact out to every mapped control") {
    import graft.rules._
    val fw = Framework("t", Seq(Rule("r1", "r1",
      facts = Seq(
        Fact("f1", "f1", "A", s => { import s.implicits._
          Seq(1L, 1L, 2L).toDF("asset_id") }),
        Fact("f2", "f2", "A", s => { import s.implicits._
          Seq.empty[Long].toDF("asset_id") })),
      frameworks = Seq(
        FrameworkControl("cis x", "cis", "1.1", Some("aws"), Some("6.0.0"), Some("t1")),
        FrameworkControl("soc 2", "soc2", "cc6.1", Some("tsc"), Some("2022"), Some("t2"))))))
    val rows = RulesRunner.controlSummary(spark, fw).collect()
      .map(r => (r.getString(0), r.getString(3), r.getString(6),
        r.getLong(7), r.getLong(8))).toSet
    assert(rows == Set(
      ("cis", "1.1", "f1", 3L, 2L), ("soc2", "cc6.1", "f1", 3L, 2L),
      ("cis", "1.1", "f2", 0L, 0L), ("soc2", "cc6.1", "f2", 0L, 0L)))
  }

  test("valueMapping leaves unmapped provider vocab NULL") {
    import graft.ontology.Ontology
    val df = Seq("running", "impaired", "stopped").toDF("raw")
      .select(col("raw"), Ontology.valueMapping(col("raw"),
        Map("running" -> "running", "stopped" -> "stopped")).as("state"))
    val got = df.collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("running").contains("running"))
    assert(got("impaired").isEmpty)
    assert(got("stopped").contains("stopped"))
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
