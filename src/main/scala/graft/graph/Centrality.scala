package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-centrality over an edge set (src, dst) — the PageRank-style
  * quality signal a web-corpus curation pipeline attaches to documents
  * (pages linked from many well-linked pages rank higher than orphan
  * spam). The reference has no graph-analytic operators; this extends the
  * iterative family ([[Fixpoint]]) with a weighted numeric fixpoint.
  *
  * All arithmetic is scaled integer (ranks in millionths): contributions
  * are `r div outdeg`, the damping step is `150000 + (85 * Σ) div 100` —
  * exact long math, summation-order-independent, so results are
  * bit-identical under any partitioning and reproducible in the SQL
  * oracle (which unrolls the same iterations as chained CTEs). Dangling
  * nodes (no outlinks) leak their mass — the standard simplification;
  * add a dangling-sum redistribution term if mass conservation matters.
  *
  * Scale shape per iteration: one join edges⋈ranks on src (co-partitioned
  * with the outdegree join), one groupBy dst (map-side combinable sum),
  * one left join back to the node set. O(E) work per round, no closure
  * materialization; lineage truncated per round with a lazy
  * localCheckpoint exactly like [[Fixpoint]].
  */
object Centrality {

  /** Ranks in millionths after `iterations` damped rounds (d = 0.85).
    * Output: (node, rank_x1e6). */
  def pagerank(edges: DataFrame, iterations: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct().localCheckpoint(false)
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    var r = nodes.withColumn("r", lit(1000000L))
    (1 to iterations).foreach { _ =>
      val contrib = e.join(r.withColumnRenamed("node", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("node"), expr("r div deg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("m"))
      r = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          expr("CAST(150000 AS BIGINT) + (85 * coalesce(m, CAST(0 AS BIGINT))) div 100")
            .as("r"))
        .localCheckpoint(false)
    }
    r.select(col("node"), col("r").as("rank_x1e6"))
  }
}
