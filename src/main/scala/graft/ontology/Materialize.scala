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
    * winners or a previous epoch's survivors). */
  def materialize(graph: Graph, canonicalLabel: String,
                  mappings: Seq[ProviderMapping], tag: Long): Graph = {
    import graft.Lineage._
    // Every provider projection feeds TWO consumers (the creation union
    // and its HAS_SOURCE edge pairs), and winners/canonIds feed one
    // consumer PER PROVIDER — left unpinned, a 20-provider corpus
    // re-executes the full union+window once per edge join (the chained
    // multi-branch k× replay; measured 14-62s on row-counts that
    // compute in ~2s pinned). Pin each shared frame once; all pins
    // materialize inside the caller's first action.
    val projected = mappings.map { m =>
      m -> m.project(graph.nodeTable(m.providerLabel))
        .withColumn("_ont_source", lit(m.providerLabel))
        .withColumn("_priority", lit(m.priority))
        .pin
    }
    val creators = projected.collect { case (m, df) if m.eligibleForSource =>
      m.requiredFields.foldLeft(df)((d, f) => d.filter(col(f).isNotNull))
    }
    require(creators.nonEmpty,
      s"ontology $canonicalLabel: at least one mapping must be eligibleForSource")
    val unioned = creators.reduce(_ unionByName (_, allowMissingColumns = true))
    val w = Window.partitionBy(col("id")).orderBy(col("_priority"), col("_src_id"))
    val winners = unioned
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .drop("_rk", "_priority", "_src_id")
      .pin
    val existing = graph.nodes.getOrElse(canonicalLabel, GraphStore.emptyLike(winners))
    var g = graph.withNodes(canonicalLabel,
      GraphStore.upsertNodes(existing, winners, tag))
    val canonIds = winners.select(col("id"))
      .unionByName(existing.select(col(GraphStore.ID).as("id")))
      .distinct()
      .pin
    projected.foreach { case (m, df) =>
      val pairs = df
        .select(col("id").as(GraphStore.SRC), col("_src_id").as(GraphStore.DST))
        .join(canonIds.select(col("id").as(GraphStore.SRC)), Seq(GraphStore.SRC),
          "left_semi")
      val key = (canonicalLabel, "HAS_SOURCE", m.providerLabel)
      val ex = g.edges.getOrElse(key,
        GraphStore.emptyLike(pairs, Seq(GraphStore.SRC, GraphStore.DST)))
      g = g.withEdges(key, GraphStore.upsertEdges(ex, pairs, tag))
    }
    g
  }
}
