package graft.ontology

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.graph.{Graph, GraphStore}

/** Canonical-node materialization: project provider-specific node tables
  * onto a cross-provider canonical entity, resolve collisions by provider
  * priority, and link every canonical node back to its sources
  * (reference: cartography/intel/ontology/users.py:19-65,
  * utils.py:85-130, mapping specs models/ontology/mapping/specs.py:7-80).
  */
object Materialize {

  /** One provider's contribution: its label, priority (lower wins field
    * resolution), and a projection producing
    * (id = canonical key, _src_id = provider node id, canonical fields...).
    *
    * `eligibleForSource = false` marks an ENRICH-ONLY mapping (reference:
    * `OntologyNodeMapping.eligible_for_source`, e.g. the Bigfix/Duo device
    * feeds): it never creates canonical nodes — it only links HAS_SOURCE to
    * canonical nodes someone else created. `requiredFields` lists canonical
    * fields a row must carry to CREATE a node (reference:
    * `OntologyFieldMapping.required`): rows missing one are excluded from
    * creation/field resolution but still link to existing canon. */
  final case class ProviderMapping(providerLabel: String, priority: Int,
                                   project: DataFrame => DataFrame,
                                   eligibleForSource: Boolean = true,
                                   requiredFields: Seq[String] = Nil)

  /** Union all provider projections, resolve each canonical id's fields
    * from its highest-priority source ((priority, _src_id) order —
    * deterministic), upsert the canonical node table, and upsert
    * (canonical)-[:HAS_SOURCE]->(provider node) edges per provider —
    * edges only ever point at canonical nodes that exist (this batch's
    * winners or a previous epoch's survivors).
    *
    * Plan shape (the 30-provider tenants corpus made this load-bearing):
    * every mapping used to get its own pin plus its own semi-join
    * against canonIds — 38 checkpoint jobs and 38 joins of tiny frames,
    * all fixed stage cost. Now the projections are tagged per-mapping
    * (`_midx` — NOT per-label: one label can carry two modules'
    * mappings), creation eligibility is computed map-side BEFORE the
    * union (`_creatable` — requiredFields resolve against each
    * mapping's own projection, exactly the old per-frame filter), and
    * the whole corpus unions ONCE: one pin for the union, one window
    * pass for the winners, ONE semi-join for every provider's
    * HAS_SOURCE pairs, then per-mapping filters over the pinned result.
    * 4 pins total, independent of provider count. */
  def materialize(graph: Graph, canonicalLabel: String,
                  mappings: Seq[ProviderMapping], tag: Long): Graph = {
    import graft.Lineage._
    require(mappings.exists(_.eligibleForSource),
      s"ontology $canonicalLabel: at least one mapping must be eligibleForSource")
    val projected = mappings.zipWithIndex.map { case (m, i) =>
      val df = m.project(graph.nodeTable(m.providerLabel))
        .withColumn("_ont_source", lit(m.providerLabel))
        .withColumn("_priority", lit(m.priority))
        .withColumn("_midx", lit(i))
      val creatable =
        if (!m.eligibleForSource) lit(false)
        else m.requiredFields.map(col(_).isNotNull)
          .reduceOption(_ && _).getOrElse(lit(true))
      df.withColumn("_creatable", creatable)
    }
    val all = projected
      .reduce(_ unionByName (_, allowMissingColumns = true))
      .pin
    val w = Window.partitionBy(col("id")).orderBy(col("_priority"), col("_src_id"))
    val winners = all.filter(col("_creatable"))
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .drop("_rk", "_priority", "_src_id", "_creatable", "_midx")
      .pin
    // First-epoch fast paths: merging into a table that does not exist
    // yet is initialLoad (key-dedup + stamp), NOT a full-outer join
    // against an empty side — 37 absent edge tables used to cost 37
    // AQE join stages of fixed latency. winners is already unique by
    // id (rk=1) and pairs is deduped once below, so the loads skip
    // their per-table dedup shuffle too.
    var g = graph.nodes.get(canonicalLabel) match {
      case Some(existing) => graph.withNodes(canonicalLabel,
        GraphStore.upsertNodes(existing, winners, tag))
      case None => graph.withNodes(canonicalLabel,
        GraphStore.initialLoad(winners, Seq(GraphStore.ID), tag, dedupBatch = false))
    }
    val canonIds = (graph.nodes.get(canonicalLabel) match {
      case Some(ex) => winners.select(col("id"))
        .unionByName(ex.select(col(GraphStore.ID).as("id"))).distinct()
      case None => winners.select(col("id")) // already unique (rk=1)
    }).pin
    val pairs = all
      .select(col("_midx"), col("id").as(GraphStore.SRC),
        col("_src_id").as(GraphStore.DST))
      .dropDuplicates("_midx", GraphStore.SRC, GraphStore.DST)
      .join(canonIds.select(col("id").as(GraphStore.SRC)), Seq(GraphStore.SRC),
        "left_semi")
      .pin
    mappings.zipWithIndex.foreach { case (m, i) =>
      val mine = pairs.filter(col("_midx") === i).drop("_midx")
      val key = (canonicalLabel, "HAS_SOURCE", m.providerLabel)
      g = g.edges.get(key) match {
        case Some(ex) => g.withEdges(key,
          GraphStore.upsertEdges(ex, mine, tag, dedupBatch = false))
        case None => g.withEdges(key, GraphStore.initialLoad(mine,
          Seq(GraphStore.SRC, GraphStore.DST), tag, dedupBatch = false))
      }
    }
    g
  }
}
