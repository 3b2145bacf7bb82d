package graft.intel

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.graph.{Graph, GraphLoader, GraphStore}
import graft.schema.NodeSchema
import org.apache.spark.sql.functions.col

/** The module contract every provider integration implements — the
  * reference's Get → Transform → Load → Cleanup lifecycle
  * (reference: docs/root/dev/writing-intel-modules.md:103-167, canonical
  * implementation cartography/intel/aws/ec2/instances.py:576-615).
  *
  * `extract` is the process boundary (API paginator / file read →
  * DataFrame); `transform` is pure declarative column logic; `load` is the
  * schema-driven upsert; cleanup is the standard stale-tag delete scoped
  * to the module's tenant.
  */
trait IntelModule {
  def name: String

  /** Get: produce the raw batch (one row per API object). */
  def extract(spark: SparkSession, source: String): DataFrame

  /** Transform: raw batch → one projected batch per node schema, in load
    * order (tenants before assets). */
  def transform(raw: DataFrame): Seq[(NodeSchema, DataFrame)]

  /** Full sync: extract → transform → load each schema → cleanup of nodes
    * this sync did not touch, scoped by default to the sub-resources
    * (tenants) actually present in this run's batches — syncing one
    * tenant can never delete another tenant's rows (the reference always
    * scopes cleanup to the sub-resource; an unscoped default would be the
    * unsafe path). */
  def sync(graph: Graph, spark: SparkSession, source: String, tag: Long): Graph = {
    val batches = transform(extract(spark, source))
    val loaded = batches.foldLeft(graph) {
      case (g, (schema, batch)) => GraphLoader.load(g, schema, batch, tag)
    }
    // Tenant scope per label, derived from each schema's SubResourceRel:
    // the handful of tenant ids in the batch (the reference syncs one
    // sub-resource per run) become an isin predicate over the
    // _sub_resource_id column the loader stamps. Labels without a
    // sub-resource stay unscoped (reference rel-only/global cleanups).
    val scopes: Map[String, org.apache.spark.sql.Column] =
      batches.flatMap { case (schema, batch) =>
        schema.subResource.map { sub =>
          val tenants = batch.select(sub.sourceRef.toCol.cast("string"))
            .distinct().collect().map(_.getString(0)).toSeq
          schema.label ->
            col(GraphLoader.SubResourceIdCol).cast("string").isin(tenants: _*)
        }
      }.toMap
    cleanup(loaded, tag, scopes)
  }

  /** Cleanup: stale-tag delete on every label this module loads (scoped
    * per label when a scope is given), stale-tag delete on edges whose
    * endpoint belongs to the scoped node set, and DETACH of edges
    * pointing at deleted nodes. Mirrors the reference's scoped node + rel
    * cleanup pair (cleanupbuilder.py:244-383). */
  def labels: Seq[String]
  def cleanup(graph: Graph, tag: Long,
              scopes: Map[String, org.apache.spark.sql.Column] = Map.empty): Graph = {
    import org.apache.spark.sql.functions.{coalesce, lit}
    def scopeOf(label: String) = scopes.getOrElse(label, lit(true))
    val afterNodes = labels.foldLeft(graph) { (g, label) =>
      g.withNodes(label, GraphStore.cleanup(g.nodeTable(label), tag, scopeOf(label)))
    }
    labels.foldLeft(afterNodes) { (g, label) =>
      val inScope = coalesce(scopeOf(label), lit(false))
      val deleted = graph.nodeTable(label)
        .filter(org.apache.spark.sql.functions.col(GraphStore.LASTUPDATED) =!= tag && inScope)
        .select(col(GraphStore.ID))
      g.edges.foldLeft(g) {
        case (acc, (key @ (src, _, dst), _)) if src == label || dst == label =>
          val side = if (src == label) GraphStore.SRC else GraphStore.DST
          val staleCleaned = GraphStore.cleanupEdgesByEndpoint(
            acc.edgeTable(key._1, key._2, key._3), tag,
            graph.nodeTable(label), side, scopeOf(label))
          // DETACH on every side the label occupies: a self-referencing
          // edge table (e.g. zone SUBZONE zone) must also drop edges whose
          // DST endpoint was deleted, exactly like Cypher DETACH DELETE
          val sides = Seq(GraphStore.SRC -> src, GraphStore.DST -> dst)
            .collect { case (s, l) if l == label => s }
          acc.withEdges(key, sides.foldLeft(staleCleaned)(
            (e, s) => GraphStore.detachDelete(e, deleted, s)))
        case (acc, _) => acc
      }
    }
  }
}

/** Registry + serial runner — the reference's sync-stage loop
  * (cartography/sync.py:240-297): stages run serially, a stage failure
  * aborts (best-effort per-tenant isolation is the caller's try/catch). */
object SyncRunner {
  def run(graph: Graph, spark: SparkSession, modules: Seq[(IntelModule, String)],
          tag: Long): Graph =
    modules.foldLeft(graph) { case (g, (m, source)) => m.sync(g, spark, source, tag) }

  /** Serial stage execution for assembled plans ([[SyncAssembly]]). */
  def runStages(graph: Graph, spark: SparkSession, stages: Seq[SyncStage],
                tag: Long): Graph =
    stages.foldLeft(graph)((g, s) => s.run(g, spark, tag))

  /** Best-effort stage execution: same isolation contract as
    * [[runBestEffort]] — a failing stage keeps the pre-stage graph and
    * is reported; later stages still run. */
  def runStagesBestEffort(graph: Graph, spark: SparkSession,
                          stages: Seq[SyncStage],
                          tag: Long): (Graph, Seq[(String, Throwable)]) =
    stages.foldLeft((graph, Seq.empty[(String, Throwable)])) {
      case ((g, failures), s) =>
        try (s.run(g, spark, tag), failures)
        catch { case scala.util.control.NonFatal(e) => (g, failures :+ (s.name -> e)) }
    }

  /** Best-effort variant (reference: per-account isolation,
    * cartography/intel/aws/__init__.py:649-670): a failing module keeps
    * the graph state from before it ran and is reported; the remaining
    * modules still sync. Cleanup for a failed module never runs, so its
    * entities are not falsely expired (the reference aborts the stage for
    * the same reason — partial syncs must not trigger cleanup). */
  def runBestEffort(graph: Graph, spark: SparkSession,
                    modules: Seq[(IntelModule, String)],
                    tag: Long): (Graph, Seq[(String, Throwable)]) =
    modules.foldLeft((graph, Seq.empty[(String, Throwable)])) {
      case ((g, failures), (m, source)) =>
        try (m.sync(g, spark, source, tag), failures)
        catch { case scala.util.control.NonFatal(e) => (g, failures :+ (m.name -> e)) }
    }
}
