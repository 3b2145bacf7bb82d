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

  /** Rename a relationship type. */
  def renameEdgeLabel(graph: Graph, key: (String, String, String),
                      newRel: String): Graph = {
    val df = graph.edgeTable(key._1, key._2, key._3)
    graph.copy(edges = graph.edges - key + ((key._1, newRel, key._3) -> df))
  }
}
