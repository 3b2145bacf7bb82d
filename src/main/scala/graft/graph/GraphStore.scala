package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Core property-graph table operations, re-expressed Spark-first.
  *
  * The reference (cartography) stores a property graph in Neo4j and upserts
  * batches of flat dicts with generated `UNWIND ... MERGE` Cypher
  * (reference: cartography/graph/querybuilder.py:1219-1316, template at
  * 1266-1279). Here the graph is a set of columnar tables — one node table
  * per label (`id`, `firstseen`, `lastupdated`, props...) and one edge table
  * per (srcLabel, relLabel, dstLabel) (`src_id`, `dst_id`, `lastupdated`,
  * props...) — and every reference operator becomes a declarative DataFrame
  * plan that Catalyst optimizes.
  *
  * Merge semantics preserved exactly (reference querybuilder.py:1266-1279):
  *   - MERGE keyed on `id` (nodes) / (`src_id`,`dst_id`) (edges)
  *   - `firstseen` set only ON CREATE
  *   - `lastupdated` stamped on every touch (the sync epoch / update tag)
  *   - `SET n.prop = item.prop` overwrites with null when the batch value is
  *     null (the reference does NOT coalesce — we keep that semantic)
  *
  * Scale design (100 TB): the merge is a single full-outer shuffle join on
  * the key. On a real cluster the node tables are partitioned by tenant
  * (sub-resource id) and bucketed by `id`, so the join co-locates without a
  * shuffle of the big side and cleanup prunes to one tenant partition; on
  * Delta this whole operator is `MERGE INTO`. Nothing here collects to the
  * driver and no operation is O(table) per batch row.
  */
object GraphStore {
  val ID = "id"
  val SRC = "src_id"
  val DST = "dst_id"
  val FIRSTSEEN = "firstseen"
  val LASTUPDATED = "lastupdated"

  private val SYS: Set[String] = Set(FIRSTSEEN, LASTUPDATED)

  /** Generic keyed merge implementing the reference's UNWIND+MERGE upsert.
    *
    * `existing` must carry key cols + firstseen + lastupdated (+ props);
    * `batch` carries key cols + props. Props present in only one side are
    * carried through (schema evolution: new props are null for untouched
    * rows; dropped props survive on untouched rows).
    */
  def merge(existing: DataFrame, batch: DataFrame, keys: Seq[String], tag: Long,
            dedupBatch: Boolean = true): DataFrame = {
    val e = existing.alias("e")
    // APIs can return the same resource twice across pages: collapse the
    // batch to one row per key (the reference's UNWIND+MERGE re-matches the
    // same node and last-write-wins; either surviving row is valid — what
    // must hold is key uniqueness downstream, like initialLoad guarantees).
    // Null-key batch rows are dropped — the reference's MERGE on a null
    // property is a Cypher error, and a plain `===` join (vs null-safe
    // `<=>`) lets the join reuse the dedup aggregate's hash partitioning
    // instead of re-shuffling both sides on (coalesce(key), isnull(key)).
    // Callers that guarantee key-unique batches (e.g. a bucketed staging
    // table) pass dedupBatch=false: against a same-bucketed node table
    // the merge then runs with zero shuffles (see Layout.writeBucketedTable).
    val filtered = batch.filter(keys.map(col(_).isNotNull).reduce(_ && _))
    val b = (if (dedupBatch) filtered.dropDuplicates(keys) else filtered).alias("b")
    val cond = keys.map(k => col(s"e.$k") === col(s"b.$k")).reduce(_ && _)
    val touched = col(s"b.${keys.head}").isNotNull
    val created = touched && col(s"e.${keys.head}").isNull

    val eProps = existing.columns.filterNot(c => keys.contains(c) || SYS(c))
    val bProps = batch.columns.filterNot(c => keys.contains(c) || SYS(c))
    val allProps = (eProps ++ bProps.filterNot(eProps.contains)).toSeq

    val keyCols = keys.map(k => coalesce(col(s"e.$k"), col(s"b.$k")).as(k))
    val sysCols = Seq(
      when(created, lit(tag)).otherwise(col(s"e.$FIRSTSEEN")).as(FIRSTSEEN),
      when(touched, lit(tag)).otherwise(col(s"e.$LASTUPDATED")).as(LASTUPDATED),
    )
    val propCols = allProps.map { p =>
      val inE = eProps.contains(p)
      val inB = bProps.contains(p)
      if (inE && inB) when(touched, col(s"b.$p")).otherwise(col(s"e.$p")).as(p)
      else if (inB) when(touched, col(s"b.$p")).otherwise(lit(null)).as(p)
      else col(s"e.$p").as(p)
    }
    e.join(b, cond, "full_outer").select(keyCols ++ sysCols ++ propCols: _*)
  }

  /** Upsert a node batch into a node table (reference tx.py:783-843 load()). */
  def upsertNodes(existing: DataFrame, batch: DataFrame, tag: Long): DataFrame =
    merge(existing, batch, Seq(ID), tag)

  /** Upsert an edge batch keyed on (src_id, dst_id). `dedupBatch = false`
    * when the caller already guarantees key-unique rows (see [[merge]]). */
  def upsertEdges(existing: DataFrame, batch: DataFrame, tag: Long,
                  dedupBatch: Boolean = true): DataFrame =
    merge(existing, batch, Seq(SRC, DST), tag, dedupBatch)

  /** First-load fast path: merging into a table known to be empty is just
    * key-dedup + system-column stamping — no full-outer join, no shuffle
    * of an empty side. Semantically identical to `merge(emptyLike(batch),
    * batch, keys, tag)` (last duplicate wins either way is undefined in
    * the reference too; we keep an arbitrary-but-deterministic first). */
  def initialLoad(batch: DataFrame, keys: Seq[String], tag: Long,
                  dedupBatch: Boolean = true): DataFrame = {
    val props = batch.columns.filterNot(c => keys.contains(c) || SYS(c)).toSeq
    (if (dedupBatch) batch.dropDuplicates(keys) else batch)
      .select(keys.map(col) ++
        Seq(lit(tag).as(FIRSTSEEN), lit(tag).as(LASTUPDATED)) ++ props.map(col): _*)
  }

  /** Bootstrap an empty node/edge table with the batch's prop schema. */
  def emptyLike(batch: DataFrame, keys: Seq[String] = Seq(ID)): DataFrame = {
    val withSys = batch
      .withColumn(FIRSTSEEN, lit(null).cast("long"))
      .withColumn(LASTUPDATED, lit(null).cast("long"))
    val ordered = keys ++ Seq(FIRSTSEEN, LASTUPDATED) ++
      batch.columns.filterNot(c => keys.contains(c) || SYS(c))
    withSys.select(ordered.map(col): _*).limit(0)
  }

  /** Incremental-sync cleanup: delete rows this sync did not touch
    * (reference cleanupbuilder.py:279-288 `lastupdated <> $UPDATE_TAG ...
    * DETACH DELETE`). `scope` limits the delete to one tenant/sub-resource
    * — rows outside the scope are kept regardless of staleness
    * (reference: scoped cleanup, cleanupbuilder.py:244-383).
    *
    * The reference loops `LIMIT 10000` deletes to bound transaction memory
    * (statement.py:303-328); in Spark a single distributed filter/anti-join
    * replaces the loop. With tenant-partitioned tables this prunes to the
    * tenant's partitions only.
    */
  def cleanup(table: DataFrame, tag: Long, scope: Column = lit(true)): DataFrame =
    // null scope = row not matched by the tenant pattern → OUT of scope,
    // kept (the reference's scoped MATCH simply never binds such nodes);
    // a raw `!scope` would be null and silently delete stale null-scope rows
    table.filter(col(LASTUPDATED) === lit(tag) || !coalesce(scope, lit(false)))

  /** The same cleanup as an explicit anti-join against the fresh id set —
    * for callers that track "what this sync produced" as a DataFrame instead
    * of a tag column (Delta `WHEN NOT MATCHED BY SOURCE THEN DELETE`). */
  def cleanupAntiJoin(existing: DataFrame, fresh: DataFrame, keys: Seq[String] = Seq(ID),
                      scope: Column = lit(true)): DataFrame = {
    val inScope = coalesce(scope, lit(false)) // null scope → out of scope, kept
    val survivorsInScope = existing.filter(inScope)
      .join(fresh.select(keys.map(col): _*).dropDuplicates(keys), keys, "left_semi")
    existing.filter(!inScope).unionByName(survivorsInScope)
  }

  /** Edge cleanup scoped by endpoint membership: delete stale edges on the
    * `side` endpoint's tenant scope. A stale edge survives only when its
    * endpoint row EXISTS in `nodes` and is out of `scope` — i.e. it is
    * provably another tenant's row (reference: rel cleanup is scoped
    * through the sub-resource MATCH, cleanupbuilder.py:244-383, which
    * never binds — and so never spares — an edge without a live endpoint).
    * Dangling stale edges (endpoint absent from the node table) are always
    * deleted; with the default unscoped `scope = lit(true)` this reduces
    * to the plain stale-tag cleanup. */
  def cleanupEdgesByEndpoint(edges: DataFrame, tag: Long, nodes: DataFrame,
                             side: String, scope: Column = lit(true)): DataFrame = {
    val outOfScope = nodes.filter(!coalesce(scope, lit(false)))
      .select(col(ID).as(side)).dropDuplicates(side :: Nil)
    edges.filter(col(LASTUPDATED) === lit(tag)).unionByName(
      edges.filter(col(LASTUPDATED) =!= lit(tag))
        .join(outOfScope, Seq(side), "left_semi")
        .select(edges.columns.map(col).toSeq: _*))
  }

  /** DETACH DELETE semantics: removing nodes cascades into every edge table
    * that references the label (reference: implicit in Cypher DETACH DELETE;
    * here an explicit FK-style cascade over the edge tables). */
  def detachDelete(edges: DataFrame, deletedNodeIds: DataFrame,
                   side: String = SRC): DataFrame =
    edges.join(deletedNodeIds.select(col(ID).as(side)), Seq(side), "left_anti")
      .select(edges.columns.map(col).toSeq: _*)

  /** Cleanup with child cascade (reference cleanupbuilder.py:309-334:
    * `MATCH stale-scoped n CALL { OPTIONAL MATCH (n)-[:REL]->(child)
    * WHERE child.lastupdated <> $TAG DETACH DELETE child } DETACH DELETE n`):
    * delete stale parents in scope, and for each declared child edge
    * table, delete the stale children they point at; both node deletions
    * cascade into the edge table.
    *
    * Every step is an anti-/semi-join on ids — partition-prunable on the
    * tenant scope, no iteration. */
  def cleanupWithCascade(graph: Graph, label: String,
                         childRels: Seq[(String, String, String)], tag: Long,
                         scope: Column = lit(true)): Graph = {
    val nodes = graph.nodeTable(label)
    val staleParentIds = nodes.filter(col(LASTUPDATED) =!= lit(tag) && scope).select(col(ID))
    var g = graph.withNodes(label, cleanup(nodes, tag, scope))
    childRels.foreach { case key @ (src, rel, dst) =>
      val parentIsSrc = src == label
      val childLabel = if (parentIsSrc) dst else src
      val parentSide = if (parentIsSrc) SRC else DST
      val childSide = if (parentIsSrc) DST else SRC
      val edges = graph.edgeTable(src, rel, dst)
      // children referenced by a stale parent, themselves stale → deleted
      val cascadeIds = edges
        .join(staleParentIds.select(col(ID).as(parentSide)), Seq(parentSide), "left_semi")
        .select(col(childSide).as(ID)).distinct()
      val children = g.nodeTable(childLabel)
      val survivors = children.filter(col(LASTUPDATED) === lit(tag)).unionByName(
        children.filter(col(LASTUPDATED) =!= lit(tag))
          .join(cascadeIds, Seq(ID), "left_anti"))
      g = g.withNodes(childLabel, survivors)
      // DETACH: drop edges touching any deleted endpoint
      val deletedChildren = children.join(cascadeIds, Seq(ID), "left_semi")
        .filter(col(LASTUPDATED) =!= lit(tag)).select(col(ID))
      val prunedEdges = detachDelete(
        detachDelete(edges, staleParentIds, parentSide), deletedChildren, childSide)
      g = g.withEdges(key, prunedEdges)
    }
    g
  }
}
