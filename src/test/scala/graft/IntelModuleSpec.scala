package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.{Graph, GraphStore}
import graft.intel.ComputeInstances

/** End-to-end intel-module test: canned JSON feed → transform → load →
  * assert graph content as sets of tuples → re-sync with a shrunken feed →
  * scoped cleanup removes the stale asset (the reference's integration
  * pattern: tests/integration/.../test_ec2_instances.py + check_nodes /
  * check_rels set assertions, tests/integration/util.py:11-72). Fixture
  * values are original. */
class IntelModuleSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
  import spark.implicits._

  private def writeFixture(lines: String*): String = {
    val f = Files.createTempFile("instances", ".json")
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  private val epoch1 = writeFixture(
    """{"ReservationId":"r-100","OwnerId":"acct-1","Instances":[
      |{"InstanceId":"i-aa","Type":"m1.small","State":"running","LaunchTime":"2026-01-05T10:00:00Z",
      | "MetadataOptions":{"HttpTokens":"optional"},"Tags":[{"Key":"team","Value":"core"}],
      | "Nics":[{"NicId":"eni-1","SubnetId":"sub-1"},{"NicId":"eni-2","SubnetId":"sub-2"}]},
      |{"InstanceId":"i-bb","Type":"m1.large","State":"stopped","LaunchTime":"2026-01-06T11:00:00Z",
      | "MetadataOptions":{"HttpTokens":"required"},"Tags":[],
      | "Nics":[{"NicId":"eni-3","SubnetId":"sub-1"}]}]}""".stripMargin.replaceAll("\n", ""),
    """{"ReservationId":"r-200","OwnerId":"acct-2","Instances":[
      |{"InstanceId":"i-cc","Type":"t2.micro","State":"running","LaunchTime":"2026-01-07T12:00:00Z",
      | "MetadataOptions":{"HttpTokens":"optional"},"Tags":[{"Key":"env","Value":"prod"}],
      | "Nics":[]}]}""".stripMargin.replaceAll("\n", ""))

  private val epoch2 = writeFixture( // i-bb is gone
    """{"ReservationId":"r-100","OwnerId":"acct-1","Instances":[
      |{"InstanceId":"i-aa","Type":"m1.small","State":"running","LaunchTime":"2026-01-05T10:00:00Z",
      | "MetadataOptions":{"HttpTokens":"optional"},"Tags":[{"Key":"team","Value":"core"}],
      | "Nics":[{"NicId":"eni-1","SubnetId":"sub-1"},{"NicId":"eni-2","SubnetId":"sub-2"}]}]}""".stripMargin.replaceAll("\n", ""))

  private def accountNodes = {
    val b = Seq("acct-1", "acct-2").toDF("id")
    GraphStore.upsertNodes(GraphStore.emptyLike(b), b, 100L)
  }

  test("sync loads instances, nics, labels, tenancy edges from the JSON feed") {
    val g = ComputeInstances.sync(Graph().withNodes("Account", accountNodes),
      spark, epoch1, tag = 200L)

    val inst = g.nodeTable("Instance")
      .select($"id", $"instance_type", $"allows_imdsv1", $"team", $"arn")
      .as[(String, String, Boolean, Option[String], String)].collect().toSet
    assert(inst == Set(
      ("i-aa", "m1.small", true, Some("core"), "arn:compute:acct-1:instance/i-aa"),
      ("i-bb", "m1.large", false, None, "arn:compute:acct-1:instance/i-bb"),
      ("i-cc", "t2.micro", true, None, "arn:compute:acct-2:instance/i-cc")))

    val labels = g.nodeTable("Instance")
      .select($"id", org.apache.spark.sql.functions.array_join($"labels", ","))
      .as[(String, String)].collect().toMap
    assert(labels("i-aa") == "ComputeInstance,Imdsv1Risk,Instance")
    assert(labels("i-bb") == "ComputeInstance,Instance")

    val tenancy = g.edgeTable("Account", "RESOURCE", "Instance")
      .select($"src_id", $"dst_id").as[(String, String)].collect().toSet
    assert(tenancy == Set(("acct-1", "i-aa"), ("acct-1", "i-bb"), ("acct-2", "i-cc")))

    val attached = g.edgeTable("Nic", "ATTACHED_TO", "Instance")
      .select($"src_id", $"dst_id").as[(String, String)].collect().toSet
    assert(attached == Set(("eni-1", "i-aa"), ("eni-2", "i-aa"), ("eni-3", "i-bb")))
  }

  test("best-effort sync isolates a failing module and suppresses its cleanup") {
    val g0 = Graph().withNodes("Account", accountNodes)
    val broken = new graft.intel.IntelModule {
      val name = "broken"
      val labels = Seq("Instance")
      def extract(s: SparkSession, src: String) = s.read.json("/nonexistent/path")
      def transform(raw: org.apache.spark.sql.DataFrame) = Seq.empty
    }
    val (g, failures) = graft.intel.SyncRunner.runBestEffort(g0, spark,
      Seq(broken -> "ignored", graft.intel.ComputeInstances -> epoch1), tag = 200L)
    assert(failures.map(_._1) == Seq("broken"))
    assert(g.nodeTable("Instance").count() == 3) // later module still synced
  }

  test("re-sync with shrunken feed cleans the synced tenant, spares others") {
    val g1 = ComputeInstances.sync(Graph().withNodes("Account", accountNodes),
      spark, epoch1, tag = 200L)
    // epoch2 only contains acct-1: i-bb (acct-1, stale) must be deleted,
    // i-cc (acct-2, stale but OUT of the synced tenant scope) must survive
    // — the reference always scopes cleanup to the sub-resource being
    // synced; deleting acct-2's rows here would be cross-tenant data loss.
    val g2 = ComputeInstances.sync(g1, spark, epoch2, tag = 300L)
    val ids = g2.nodeTable("Instance").select($"id").as[String].collect().toSet
    assert(ids == Set("i-aa", "i-cc"))
    // Nic has no sub-resource → its cleanup is unscoped: stale eni-3 goes
    val nics = g2.nodeTable("Nic").select($"id").as[String].collect().toSet
    assert(nics == Set("eni-1", "eni-2"))
    // edge hygiene: stale in-scope edges gone, edges to deleted nodes detached
    val attached = g2.edgeTable("Nic", "ATTACHED_TO", "Instance")
      .select($"src_id", $"dst_id").as[(String, String)].collect().toSet
    assert(attached == Set(("eni-1", "i-aa"), ("eni-2", "i-aa")))
    val tenancy = g2.edgeTable("Account", "RESOURCE", "Instance")
      .select($"dst_id").as[String].collect().toSet
    assert(tenancy == Set("i-aa", "i-cc"))
    // the spared tenant's rows are byte-untouched (still epoch-1 tagged)
    val spared = g2.nodeTable("Instance").filter($"id" === "i-cc")
      .select($"lastupdated").as[Long].collect().toSeq
    assert(spared == Seq(200L))
  }
}
