package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.{Graph, GraphStore}

/** ×N end-to-end sync scale smoke (r11 verdict item 4): the full
  * reference lifecycle — extract → transform → upsert → edge attach →
  * cleanup → analysis → ontology → rules — run as TWO sync epochs over
  * multiplied TPC-H inputs with PER-STAGE wall times, proving no stage
  * goes super-linear when stages hand off shared state. The reference
  * runs these stages serially per module (cartography/sync.py:282-295
  * `Sync.run` looping `stage.run`); here each stage is the library's
  * own operator (GraphStore merge/cleanup, AnalysisRunner, Materialize,
  * RulesRunner-style read) and the handoff is an EAGER pin so a stage's
  * wall time is its own computation, not a replay of upstream laziness.
  *
  * Epoch 2 is the measured one: it exercises the real incremental shapes
  * (full-outer merge against an existing table, stale-tag cleanup,
  * re-analysis over changed rows) instead of first-load fast paths.
  *
  * Usage: `runMain graft.SyncSmoke [mult ...]` (default 1 4 10); prints
  * one JSON line per (mult, stage) and a per-mult total. */
object SyncSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mults = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 4, 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def multiply(df: DataFrame, idCol: String, m: Int): DataFrame = {
      val n = 10000000L
      (0 until m).map(i => df.withColumn(idCol, col(idCol) + lit(i * n)))
        .reduce(_ unionByName _)
    }

    val T1 = 9000L; val T2 = 9001L

    mults.foreach { m =>
      val stages = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
      def stage[A](name: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        val dt = (System.nanoTime() - t0) / 1e9
        stages += name -> dt
        println(f"""{"mult":$m,"stage":"$name","sec":$dt%.2f}""")
        r
      }
      // eager handoff: a stage's output is MATERIALIZED inside its own
      // timing window, so the next stage never replays it
      def force(df: DataFrame): DataFrame = df.localCheckpoint(true)

      val custRaw = multiply(Tables.customer(spark, sfDir), "c_custkey", m)
      val ordRaw = multiply(Tables.orders(spark, sfDir), "o_custkey", m)

      // ---- extract + transform (the intel-module shape: rename,
      // derive, type-coerce into the schema's record layout)
      val records = stage("extract_transform") {
        force(custRaw.select(
          col("c_custkey").cast("long").as("id"),
          col("c_name").as("name"),
          col("c_acctbal").cast("double").as("acctbal"),
          (col("c_nationkey").cast("long") % 25L).as("nationkey"),
          upper(col("c_mktsegment")).as("segment")))
      }

      // epoch 1 (built OUTSIDE the measured stages): 95% of records
      // loaded at T1 — the pre-existing graph an incremental sync meets
      val epoch1 = force(GraphStore.initialLoad(
        records.filter(col("id") % 20L =!= 0L), Seq(GraphStore.ID), T1))
      val epoch1Edges = force(GraphStore.initialLoad(
        records.filter(col("id") % 20L =!= 0L)
          .select(col("id").as("src_id"), col("nationkey").as("dst_id")),
        Seq(GraphStore.SRC, GraphStore.DST), T1))

      // ---- epoch-2 sync: 90% of the batch (some rows vanish → stale),
      // every surviving row's acctbal drifts (a real property update)
      val batch2 = records.filter(col("id") % 10L =!= 3L)
        .withColumn("acctbal", col("acctbal") + 1.0)

      val nodes2 = stage("upsert_nodes") {
        force(GraphStore.upsertNodes(epoch1, batch2, T2))
      }
      val edges2 = stage("edge_attach") {
        force(GraphStore.upsertEdges(epoch1Edges,
          batch2.select(col("id").as("src_id"), col("nationkey").as("dst_id")),
          T2))
      }
      val (nodesClean, edgesClean) = stage("cleanup") {
        val nc = force(GraphStore.cleanup(nodes2, T2))
        val ec = force(GraphStore.detachDelete(
          GraphStore.cleanup(edges2, T2),
          nodes2.filter(col(GraphStore.LASTUPDATED) =!= lit(T2))
            .select(col(GraphStore.ID))))
        (nc, ec)
      }

      // ---- analysis: exposure flag from urgent open orders (the
      // AnalysisJob SetProperty shape, joined not collected)
      val analyzed = stage("analysis") {
        val exposedIds = ordRaw
          .filter(col("o_orderstatus") === "O" &&
            col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").cast("long").as("id")).distinct()
        force(nodesClean.join(exposedIds.withColumn("exposed", lit(true)),
          Seq("id"), "left")
          .withColumn("exposed", coalesce(col("exposed"), lit(false))))
      }

      // ---- ontology: canonical Market nodes keyed by nation, customer
      // source wins display fields (the Materialize shape)
      val g = Graph().withNodes("Customer", analyzed)
        .withEdges(("Customer", "IN_NATION", "Nation"), edgesClean)
      val market = stage("ontology") {
        val canon = graft.ontology.Materialize.materialize(g, "Market", Seq(
          graft.ontology.Materialize.ProviderMapping("Customer", priority = 1,
            df => df.select(col("nationkey").as("id"), col("id").as("_src_id"),
              col("name").as("display")))), T2)
        force(canon.nodeTable("Market"))
      }

      // ---- rules: the read surface — one metric aggregate per fact
      // (exposed below-balance customers), 1-row collects by contract
      val findings = stage("rules") {
        analyzed.filter(col("exposed") && col("acctbal") < 1000.0)
          .agg(count(lit(1)).as("n"),
            count_distinct(col("id")).as("assets")).collect()(0).getLong(0)
      }

      val total = stages.map(_._2).sum
      val counts = Seq(nodesClean, edgesClean, market).map(_.count())
      println(f"""{"mult":$m,"stage":"TOTAL","sec":$total%.2f,""" +
        s""""nodes":${counts(0)},"edges":${counts(1)},""" +
        s""""market":${counts(2)},"findings":$findings}""")
      spark.sharedState.cacheManager.clearCache()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
