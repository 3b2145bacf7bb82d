package graft.graph

import org.apache.spark.sql.functions._

/** One-shot schema migrations between engine versions — label/edge
  * renames (reference: the JSON jobs under cartography/data/jobs/analysis,
  * e.g. aws_ip_node_label_migration.json, run from
  * cartography/intel/aws/__init__.py:722-728).
  */
object Migrations {

  /** Rename a node label: moves the node table, rewrites the `labels`
    * array column if present, and re-keys every edge table that touches
    * the label. */
  def renameNodeLabel(graph: Graph, from: String, to: String): Graph = {
    val table = graph.nodeTable(from)
    val rewritten =
      if (table.columns.contains("labels"))
        table.withColumn("labels",
          array_sort(transform(col("labels"), l => when(l === from, to).otherwise(l))))
      else table
    val withNode = Graph(
      nodes = graph.nodes - from + (to -> rewritten),
      edges = graph.edges)
    val rekeyed = withNode.edges.map { case ((s, r, d), df) =>
      (if (s == from) to else s, r, if (d == from) to else d) -> df
    }
    withNode.copy(edges = rekeyed)
  }

  /** Drop a label value from a node table's `labels` array — the
    * end-of-life step for COMPATIBILITY labels kept through a rename
    * migration (reference ExtraNodeLabelKind.COMPATIBILITY,
    * models/core/nodes.py:73-147). */
  def dropLabelValue(graph: Graph, nodeLabel: String, labelToDrop: String): Graph = {
    val table = graph.nodeTable(nodeLabel)
    if (!table.columns.contains("labels")) graph
    else graph.withNodes(nodeLabel, table.withColumn("labels",
      filter(col("labels"), l => l =!= labelToDrop)))
  }

  /** Strip every COMPATIBILITY extra label a schema declares from its
    * node table (run once consumers have migrated off the old names). */
  def stripCompatibilityLabels(graph: Graph,
                               schema: graft.schema.NodeSchema): Graph =
    schema.extraLabels.collect {
      case graft.schema.ExtraLabel(l, _, graft.schema.CompatibilityLabel) => l
    }.foldLeft(graph)((g, l) => dropLabelValue(g, schema.label, l))

  /** Rename a relationship type. */
  def renameEdgeLabel(graph: Graph, key: (String, String, String),
                      newRel: String): Graph = {
    val df = graph.edgeTable(key._1, key._2, key._3)
    graph.copy(edges = graph.edges - key + ((key._1, newRel, key._3) -> df))
  }

  /** Predicate-guarded PARTIAL relabel — the reference's in-place
    * `REMOVE n:A SET n:B` migration shape (e.g.
    * ontology_package_version_rename_migration.json: only
    * `:Package:Ontology` rows with a non-null version move to
    * `:PackageVersion`; legacy non-ontology rows stay put). Matching
    * rows move to `to` (merged by name into an existing table — node
    * identity and attached edge tables are untouched, exactly like an
    * in-place relabel); the rest remain under `from`. A null predicate
    * reads false (a row Cypher would not MATCH does not move). */
  def relabelWhere(graph: Graph, from: String, to: String,
                   where: org.apache.spark.sql.Column): Graph = {
    val src = graph.nodeTable(from)
    val cond = coalesce(where, lit(false))
    val moving = src.filter(cond)
    val staying = src.filter(!cond)
    val target = graph.nodes.get(to) match {
      case Some(existing) => existing.unionByName(moving, allowMissingColumns = true)
      case None           => moving
    }
    Graph(nodes = graph.nodes + (from -> staying) + (to -> target),
      edges = graph.edges)
  }

  /** Strip a property from every node of a label — the reference's
    * `MATCH (n:L) WHERE n.p IS NOT NULL REMOVE n.p` stale-value cleanup
    * (ontology_removed_status_cleanup.json, the de-scoped
    * SpaceliftStack/AzureTenant status mappings). Removing the value
    * from every row that has one is dropping the column; absent columns
    * are a no-op, like a MATCH with no rows. */
  def stripProperty(graph: Graph, nodeLabel: String, prop: String): Graph = {
    val table = graph.nodeTable(nodeLabel)
    if (!table.columns.contains(prop)) graph
    else graph.withNodes(nodeLabel, table.drop(prop))
  }
}
