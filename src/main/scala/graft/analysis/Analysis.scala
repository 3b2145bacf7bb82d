package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.graph.{Graph, GraphStore}

/** Typed analysis-job DSL: derive new properties/edges from graph patterns
  * (reference: cartography/graph/analysis.py:38-148, compiler
  * cartography/graph/analysisbuilder.py:36-328).
  *
  * A job is a match pattern — here an arbitrary `Graph => DataFrame` join
  * chain, the Spark analog of the Cypher MATCH — plus typed effects applied
  * to node/edge tables. Effects are DataFrame merges, not per-row writes:
  * one shuffle per effect, partition-prunable when tables are
  * tenant-partitioned.
  */
sealed trait Effect

/** SET node.prop = value for every node matched by the pattern
  * (reference: analysis.py:70-87). Pattern output must carry `id` and the
  * value column. Unmatched nodes keep their old value. */
case class SetProperty(label: String, prop: String, valueCol: String) extends Effect

/** SET node.prop = value only where the current value is null
  * (reference SetRelationshipPropertyIfMissing analog, analysis.py:90-111). */
case class SetPropertyIfMissing(label: String, prop: String, valueCol: String) extends Effect

/** Append pattern values to a list property treated as a set
  * (reference AddToSet/AddValuesToSet: analysis.py:113-130,
  * analysisbuilder.py:285-307 → array_union). */
case class AddToSet(label: String, prop: String, valueCol: String) extends Effect

/** MERGE an edge for every (srcCol, dstCol) row of the pattern
  * (reference AddRelationship: analysis.py:133-148). Derived edges carry
  * the update tag, so the generated cleanup (analysisbuilder.py:80-166) is
  * the standard stale-tag cleanup on the edge table. */
case class AddRelationship(srcLabel: String, relLabel: String, dstLabel: String,
                           srcCol: String, dstCol: String,
                           propCols: Seq[String] = Nil) extends Effect

/** SET rel.prop = value for every edge matched by the pattern
  * (reference SetRelationshipProperty: analysis.py:90-111, compiled at
  * analysisbuilder.py:275-283). Pattern output must carry `src_id`,
  * `dst_id` and the value column; unmatched edges keep their old value. */
case class SetRelationshipProperty(srcLabel: String, relLabel: String, dstLabel: String,
                                   prop: String, valueCol: String) extends Effect

/** SET rel.prop = value only where the current value is null
  * (reference SetRelationshipPropertyIfMissing: analysis.py:90-111). */
case class SetRelationshipPropertyIfMissing(srcLabel: String, relLabel: String,
                                            dstLabel: String, prop: String,
                                            valueCol: String) extends Effect

/** An analysis job: a match pattern + effects.
  *
  * `incrementalOn = true` gates the pattern to rows the current sync
  * touched (`lastupdated = tag`) — the reference's `incremental_on`
  * (analysis.py:243-264): a re-run after a partial sync only derives from
  * fresh rows, and at 100 TB the pass reads only the fresh partitions
  * instead of the whole graph. `scopes` restricts named node tables to a
  * tenant predicate before the pattern sees them (the reference's
  * sub-resource scope parameter, analysisbuilder.py:195-254). Effects
  * always apply to the full graph tables — only the MATCH is narrowed,
  * exactly like the generated Cypher's WHERE clauses. */
case class AnalysisJob(name: String, pattern: Graph => DataFrame, effects: Seq[Effect],
                       incrementalOn: Boolean = false,
                       scopes: Map[String, Column] = Map.empty)

object AnalysisRunner {
  import GraphStore.{DST, ID, LASTUPDATED, SRC}

  /** Run a job: evaluate the pattern once over the scoped view of the
    * graph, apply each effect as a merge against the full graph. */
  def run(graph: Graph, job: AnalysisJob, tag: Long): Graph = {
    val matched = job.pattern(scopedView(graph, job, tag))
    job.effects.foldLeft(graph)((g, e) => applyEffect(g, matched, e, tag))
  }

  /** The view of the graph the pattern matches against: per-label tenant
    * scopes, then (if incremental) only rows stamped by this sync. Plain
    * filters — partition-prunable, pushed into the scans by Catalyst. */
  private def scopedView(graph: Graph, job: AnalysisJob, tag: Long): Graph = {
    val scoped = job.scopes.foldLeft(graph) { case (g, (label, pred)) =>
      if (g.nodes.contains(label)) g.withNodes(label, g.nodeTable(label).filter(pred))
      else g
    }
    if (!job.incrementalOn) scoped
    else Graph(
      scoped.nodes.map { case (k, df) => k -> df.filter(col(LASTUPDATED) === tag) },
      scoped.edges.map { case (k, df) => k -> df.filter(col(LASTUPDATED) === tag) })
  }

  /** Auto-generated cleanup for derived edges: every AddRelationship
    * effect declares its cleanup — stale rows (lastupdated <> tag) of the
    * derived edge table are deleted after the run (reference:
    * analysisbuilder.py:80-166, 385-490). */
  def cleanupDerived(graph: Graph, job: AnalysisJob, tag: Long): Graph =
    job.effects.foldLeft(graph) {
      case (g, AddRelationship(s, r, d, _, _, _)) if g.edges.contains((s, r, d)) =>
        g.withEdges((s, r, d), GraphStore.cleanup(g.edgeTable(s, r, d), tag))
      case (g, _) => g
    }

  /** One update row per key. A pattern may legally emit the same key
    * several times (multi-hop matches); if it emits *different* values the
    * reference's SET would keep whichever Cypher row ran last — but this
    * repo's contract is byte determinism, so conflicts reduce with max()
    * (orderable for every primitive and array type we stamp) instead of
    * dropDuplicates' partition-order-dependent arbitrary row. With several
    * value columns the max is taken over ONE struct (lexicographic field
    * order), so the winning values all come from a single coherent matched
    * row — independent per-column maxes could stamp a combination no row
    * actually produced. */
  private def reduceUpdates(matched: DataFrame, keys: Seq[String],
                            valueCols: Seq[String]): DataFrame =
    if (valueCols.size == 1)
      matched.groupBy(keys.map(col): _*)
        .agg(max(col(valueCols.head)).as(valueCols.head))
    else {
      val packed = matched.groupBy(keys.map(col): _*)
        .agg(max(struct(valueCols.map(col): _*)).as("_packed"))
      valueCols.foldLeft(packed)((df, c) => df.withColumn(c, col("_packed")(c)))
        .drop("_packed")
    }

  private def applyEffect(g: Graph, matched: DataFrame, effect: Effect, tag: Long): Graph =
    effect match {
      case SetProperty(label, prop, valueCol) =>
        val updates = reduceUpdates(matched.select(col(ID), col(valueCol).as("_new")),
          Seq(ID), Seq("_new"))
        val nodes = g.nodeTable(label)
        val merged = nodes.join(updates, Seq(ID), "left")
          .select(nodes.columns.filterNot(_ == prop).map(col).toSeq :+
            when(col("_new").isNotNull, col("_new"))
              .otherwise(if (nodes.columns.contains(prop)) col(prop) else lit(null))
              .as(prop): _*)
        g.withNodes(label, merged)

      case SetPropertyIfMissing(label, prop, valueCol) =>
        val updates = reduceUpdates(matched.select(col(ID), col(valueCol).as("_new")),
          Seq(ID), Seq("_new"))
        val nodes = g.nodeTable(label)
        val old = if (nodes.columns.contains(prop)) col(prop) else lit(null)
        val merged = nodes.join(updates, Seq(ID), "left")
          .select(nodes.columns.filterNot(_ == prop).map(col).toSeq :+
            coalesce(old, col("_new")).as(prop): _*)
        g.withNodes(label, merged)

      case AddToSet(label, prop, valueCol) =>
        val adds = matched.groupBy(col(ID))
          .agg(array_sort(collect_set(col(valueCol))).as("_adds"))
        val nodes = g.nodeTable(label)
        val old = if (nodes.columns.contains(prop)) col(prop)
                  else lit(null).cast("array<string>")
        val merged = nodes.join(adds, Seq(ID), "left")
          .select(nodes.columns.filterNot(_ == prop).map(col).toSeq :+
            array_sort(array_union(coalesce(old, array()), coalesce(col("_adds"), array())))
              .as(prop): _*)
        g.withNodes(label, merged)

      case SetRelationshipProperty(srcLabel, relLabel, dstLabel, prop, valueCol) =>
        val key = (srcLabel, relLabel, dstLabel)
        val updates = reduceUpdates(
          matched.select(col(SRC), col(DST), col(valueCol).as("_new")),
          Seq(SRC, DST), Seq("_new"))
        val edges = g.edgeTable(srcLabel, relLabel, dstLabel)
        val merged = edges.join(updates, Seq(SRC, DST), "left")
          .select(edges.columns.filterNot(_ == prop).map(col).toSeq :+
            when(col("_new").isNotNull, col("_new"))
              .otherwise(if (edges.columns.contains(prop)) col(prop) else lit(null))
              .as(prop): _*)
        g.withEdges(key, merged)

      case SetRelationshipPropertyIfMissing(srcLabel, relLabel, dstLabel, prop, valueCol) =>
        val key = (srcLabel, relLabel, dstLabel)
        val updates = reduceUpdates(
          matched.select(col(SRC), col(DST), col(valueCol).as("_new")),
          Seq(SRC, DST), Seq("_new"))
        val edges = g.edgeTable(srcLabel, relLabel, dstLabel)
        val old = if (edges.columns.contains(prop)) col(prop) else lit(null)
        val merged = edges.join(updates, Seq(SRC, DST), "left")
          .select(edges.columns.filterNot(_ == prop).map(col).toSeq :+
            coalesce(old, col("_new")).as(prop): _*)
        g.withEdges(key, merged)

      case AddRelationship(srcLabel, relLabel, dstLabel, srcCol, dstCol, propCols) =>
        val projected = matched.select(
          (col(srcCol).as(SRC) +: col(dstCol).as(DST) +: propCols.map(col)): _*)
        val batch =
          if (propCols.isEmpty) projected.dropDuplicates(SRC :: DST :: Nil)
          else reduceUpdates(projected, Seq(SRC, DST), propCols)
        val key = (srcLabel, relLabel, dstLabel)
        g.edges.get(key) match {
          case Some(existing) => g.withEdges(key, GraphStore.upsertEdges(existing, batch, tag))
          case None => g.withEdges(key, GraphStore.initialLoad(batch, Seq(SRC, DST), tag))
        }
    }
}
