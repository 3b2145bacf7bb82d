package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative graph-pattern matching over the node/edge tables — the
  * DataFrame form of a Cypher MATCH chain
  * (reference: analysis patterns like
  * `MATCH (i:Instance)-[:INSTANCE_PROFILE]->(p)-[:ASSOCIATED_WITH]->(r:Role)`,
  * cartography/analysis/aws/analysis.py:10-29). A path is a chain of edge
  * tables joined dst→src; node property columns join in per step on
  * demand. Output columns: `n0, n1, ... nK` (node ids along the path),
  * so AnalysisJob effects can consume any pair of endpoints.
  *
  * Each hop is one equi join — Catalyst picks broadcast vs shuffle per
  * side, and chains of hops pipeline without barriers.
  */
object Motif {

  /** Match a fixed path: `steps` are edge-table keys (srcLabel, rel,
    * dstLabel); consecutive steps must share the intermediate label. */
  def path(graph: Graph, steps: Seq[(String, String, String)]): DataFrame = {
    require(steps.nonEmpty, "path needs at least one step")
    steps.sliding(2).foreach {
      case Seq((_, _, d), (s, _, _)) =>
        require(d == s, s"path steps must chain: ...->$d then $s->...")
      case _ =>
    }
    val first = graph.edgeTable(steps.head._1, steps.head._2, steps.head._3)
      .select(col(GraphStore.SRC).as("n0"), col(GraphStore.DST).as("n1"))
    steps.tail.zipWithIndex.foldLeft(first) { case (acc, (key, i)) =>
      val hop = graph.edgeTable(key._1, key._2, key._3)
        .select(col(GraphStore.SRC).as(s"n${i + 1}"), col(GraphStore.DST).as(s"n${i + 2}"))
      acc.join(hop, s"n${i + 1}")
    }
  }

  /** Join node properties onto a matched path position: `nodeVar` is one
    * of the `nK` output columns; `props` are (tableColumn → outputColumn). */
  def withNodeProps(graph: Graph, matched: DataFrame, nodeVar: String,
                    label: String, props: (String, String)*): DataFrame = {
    val nodeCols = graph.nodeTable(label)
      .select((col(GraphStore.ID).as(nodeVar) +:
        props.map { case (f, t) => col(f).as(t) }): _*)
    matched.join(nodeCols, nodeVar)
  }
}
