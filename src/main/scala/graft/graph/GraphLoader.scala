package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.schema._

/** The in-engine property graph: one node table per label, one edge table
  * per (srcLabel, relLabel, dstLabel). Immutable value — loads return an
  * updated graph. At rest these are partitioned parquet/Delta tables; here
  * they are DataFrames threaded through a sync run.
  */
case class Graph(
    nodes: Map[String, DataFrame] = Map.empty,
    edges: Map[(String, String, String), DataFrame] = Map.empty) {

  def nodeTable(label: String): DataFrame = nodes(label)
  def edgeTable(src: String, rel: String, dst: String): DataFrame = edges((src, rel, dst))

  def withNodes(label: String, df: DataFrame): Graph = copy(nodes = nodes + (label -> df))
  def withEdges(key: (String, String, String), df: DataFrame): Graph =
    copy(edges = edges + (key -> df))
}

/** Schema-driven load — the Spark re-expression of the reference's
  * `load()` + `build_ingestion_query()` hot path
  * (reference: cartography/client/core/tx.py:783-843,
  * cartography/graph/querybuilder.py:1219-1316).
  *
  * One call projects the batch through the schema (renames, params, derived
  * columns, conditional labels), upserts the node table, attaches the
  * tenant edge, and resolves every additional relationship by its join
  * mode. All of it is declarative: Catalyst prunes the batch columns to
  * what the schema references and pushes filters into the scans.
  */
object GraphLoader {
  import GraphStore.{DST, ID, SRC}

  /** Project a raw batch through a node schema: id + properties + labels
    * array (primary + unconditional + satisfied conditional labels).
    * Nodes with a sub-resource also carry `_sub_resource_id` — the tenant
    * key that makes scoped cleanup (and tenant partition pruning at rest)
    * a plain column predicate. */
  def projectBatch(schema: NodeSchema, batch: DataFrame): DataFrame = {
    val labelCols: Seq[Column] =
      array(lit(schema.label)) +: schema.extraLabels.map {
        case ExtraLabel(l, None, _) => array(lit(l))
        case ExtraLabel(l, Some(cond), _) => when(cond, array(lit(l))).otherwise(array())
      }
    val labels = array_sort(concat(labelCols: _*))
    val props = schema.properties.toSeq.sortBy(_._1).map { case (n, ref) => ref.toCol.as(n) }
    val subCol = schema.subResource.toSeq.map(sub =>
      sub.sourceRef.toCol.as(SubResourceIdCol))
    batch.select((schema.id.toCol.as(ID) +: props :+ labels.as("labels")) ++ subCol: _*)
  }

  /** Load a batch: node upsert + sub-resource edge + additional links.
    * Missing target nodes drop the edge, never the node (the reference's
    * OPTIONAL MATCH ... WHERE j IS NOT NULL → inner join on the edge
    * build only; querybuilder.py:866-867, 960-963). */
  def load(graph: Graph, schema: NodeSchema, batch: DataFrame, tag: Long): Graph = {
    val projected = projectBatch(schema, batch)
    val merged = graph.nodes.get(schema.label) match {
      case Some(existing) => GraphStore.upsertNodes(existing, projected, tag)
      case None => GraphStore.initialLoad(projected, Seq(GraphStore.ID), tag)
    }
    var g = graph.withNodes(schema.label, merged)

    schema.subResource.foreach { sub =>
      val pairs = batch.select(schema.id.toCol.as(SRC), sub.sourceRef.toCol.as("_ref"))
      val tenants = g.nodes(sub.targetLabel)
      // tenant tables are small relative to asset batches — broadcast
      val joined = pairs
        .join(broadcast(tenants.select(col(ID).as(DST), col(ID).as("_tkey"))),
          pairs("_ref") === col("_tkey"), "inner")
        .select(col(SRC), col(DST))
      // direction in the reference is (i)<-[:RESOURCE]-(tenant): tenant is src
      val key = (sub.targetLabel, sub.relLabel, schema.label)
      g = upsertEdgeBatch(g, key, joined.select(col(DST).as(SRC), col(SRC).as(DST)), tag)
    }

    schema.otherRels.foldLeft(g) { (acc, rel) =>
      val relProps = rel.properties.toSeq.sortBy(_._1)
      val pairs = batch.select(
        (schema.id.toCol.as(SRC) +: rel.sourceRef.toCol.as("_ref") +:
          relProps.map { case (n, r) => r.toCol.as(n) }): _*)
      val target = acc.nodes(rel.targetLabel)
        .select(col(ID).as(DST), col(rel.targetKey).as("_tkey"))
      val (joined: DataFrame, preDeduped: Boolean) = rel.mode match {
        case EquiMatch =>
          (pairs.join(target, pairs("_ref") === col("_tkey"), "inner"), false)
        case IgnoreCase =>
          (pairs.join(target, lower(pairs("_ref")) === lower(col("_tkey")), "inner"), false)
        case FuzzyContains =>
          // theta join: only a nested-loop strategy can run it — broadcast
          // whichever side Catalyst estimates smaller so it is a
          // BroadcastNestedLoopJoin, not a cartesian shuffle, and the
          // broadcast still fits when the node table outgrows the batch
          // refs (reference semantics querybuilder.py:712-731; inner theta
          // join is symmetric so either build side is correct)
          val cond = lower(col("_tkey")).contains(lower(pairs("_ref")))
          val df =
            if (pairs.queryExecution.optimizedPlan.stats.sizeInBytes <=
                target.queryExecution.optimizedPlan.stats.sizeInBytes)
              broadcast(pairs).join(target, cond, "inner")
            else pairs.join(broadcast(target), cond, "inner")
          (df, false)
        case OneToMany =>
          // n.key IN item.list (querybuilder.py:716, 732-736): explode the
          // list into an equi join; IN is membership → distinct pairs.
          // This dedup doubles as the merge's key dedup (preDeduped=true
          // below) so the pair set shuffles exactly once.
          (pairs.withColumn("_ref_elem", explode(col("_ref")))
            .drop("_ref")
            .join(target, col("_ref_elem") === col("_tkey"), "inner")
            .dropDuplicates(SRC :: DST :: Nil), true)
      }
      val edgeCols = (col(SRC) +: col(DST) +: relProps.map { case (n, _) => col(n) })
      val batchDf = joined.select(edgeCols: _*)
      val oriented = rel.direction match {
        case Outward => (schema.label, rel.relLabel, rel.targetLabel) -> batchDf
        case Inward =>
          (rel.targetLabel, rel.relLabel, schema.label) ->
            batchDf.withColumnRenamed(SRC, "_s").withColumnRenamed(DST, SRC)
              .withColumnRenamed("_s", DST)
      }
      upsertEdgeBatch(acc, oriented._1, oriented._2, tag, dedupBatch = !preDeduped)
    }
  }

  private def upsertEdgeBatch(g: Graph, key: (String, String, String),
                              batch: DataFrame, tag: Long,
                              dedupBatch: Boolean = true): Graph =
    g.edges.get(key) match {
      case Some(existing) =>
        g.withEdges(key, GraphStore.upsertEdges(existing, batch, tag, dedupBatch))
      case None =>
        g.withEdges(key, GraphStore.initialLoad(batch, Seq(SRC, DST), tag, dedupBatch))
    }

  /** Column names stamping a matchlink edge's owning sub-resource — the
    * scoping key for [[GraphStore.cleanup]] so a tenant's sync can delete
    * its own stale links without touching other tenants' rows
    * (reference: querybuilder.py:1755-1924 `_sub_resource_label` /
    * `_sub_resource_id`, cleanup filter cleanupbuilder.py:603-667). */
  val SubResourceLabelCol = "_sub_resource_label"
  val SubResourceIdCol = "_sub_resource_id"

  /** MatchLink: create edges between two sets of already-loaded nodes from
    * a DataFrame of (src ref, dst ref [, props]) pairs — both endpoints
    * must exist or the pair is dropped
    * (reference: querybuilder.py:1755-1924, tx.py:846-920).
    *
    * When `subResource` is given, each edge is stamped with
    * `_sub_resource_label`/`_sub_resource_id` (label, id-expression over
    * the pairs batch) so scoped cleanup can be driven from the loader's
    * own output: `GraphStore.cleanup(edges, tag, scope =
    * col("_sub_resource_label") === l && col("_sub_resource_id") === id)`. */
  def matchLinks(graph: Graph, pairs: DataFrame, srcLabel: String, relLabel: String,
                 dstLabel: String, srcRef: String, dstRef: String, tag: Long,
                 subResource: Option[(String, Column)] = None): Graph = {
    val src = graph.nodes(srcLabel).select(col(ID).as("_src_match"))
    val dst = graph.nodes(dstLabel).select(col(ID).as("_dst_match"))
    val props = pairs.columns.filterNot(c => c == srcRef || c == dstRef).map(col)
    val scopeCols = subResource.toSeq.flatMap { case (label, idCol) =>
      Seq(lit(label).as(SubResourceLabelCol), idCol.as(SubResourceIdCol))
    }
    // Dedup on the key BEFORE attaching scope columns: the constant
    // label string would push the key dedup from HashAggregate to
    // SortAggregate (var-length agg buffers aren't hash-aggregable), and
    // the merge downstream can then skip its own dedup entirely.
    val matched = pairs
      .join(src, pairs(srcRef) === col("_src_match"), "inner")
      .join(dst, pairs(dstRef) === col("_dst_match"), "inner")
      .drop("_src_match", "_dst_match")
      .dropDuplicates(srcRef :: dstRef :: Nil)
      .select((col(srcRef).as(SRC) +: col(dstRef).as(DST) +: props.toSeq) ++ scopeCols: _*)
    upsertEdgeBatch(graph, (srcLabel, relLabel, dstLabel), matched, tag,
      dedupBatch = false)
  }

  /** Cartesian matchlink: all-pairs edges between two node sets. The
    * reference chunks this 100×1000 per transaction to bound memory
    * (tx.py:923-1030); Spark partitions the cross join natively, so the
    * operator is a single `crossJoin` with dedup applied first
    * (tx.py:974-975 `dict.fromkeys`). */
  def crossLinks(graph: Graph, srcLabel: String, relLabel: String, dstLabel: String,
                 tag: Long): Graph = {
    val src = graph.nodes(srcLabel).select(col(ID).as(SRC)).dropDuplicates(SRC :: Nil)
    val dst = graph.nodes(dstLabel).select(col(ID).as(DST)).dropDuplicates(DST :: Nil)
    // distinct × distinct is key-unique by construction → no re-dedup
    upsertEdgeBatch(graph, (srcLabel, relLabel, dstLabel), src.crossJoin(broadcast(dst)),
      tag, dedupBatch = false)
  }
}
