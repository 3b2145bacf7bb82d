package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Variable-length path evaluation — the reference's `[:REL*1..]` Cypher
  * patterns (ECR layer ancestry cartography/client/aws/ecr.py:46, Route53
  * sub-zone chains route53.py:470-505) — as an iterative DataFrame
  * fixpoint.
  *
  * Uses path doubling: after k rounds every path of length ≤ 2^k is
  * present, so the loop runs O(log diameter) rounds, not O(diameter) —
  * the difference between 14 and 16k joins on a 100 TB graph with long
  * chains. Each round localCheckpoints to truncate lineage (otherwise the
  * logical plan doubles every round and Catalyst analysis time explodes)
  * and the loop exits when the pair count stops growing.
  */
object Fixpoint {

  /** All (src, dst) pairs with a directed path src→dst. */
  def transitiveClosure(edges: DataFrame, maxRounds: Int = 20): DataFrame = {
    // lazy checkpoints: the count() right after is the materializing action,
    // so each round runs ONE job instead of checkpoint-job + count-job
    var paths = edges.select(col("src"), col("dst")).distinct()
      .localCheckpoint(false)
    var n = paths.count()
    var round = 0
    var grown = true
    while (grown && round < maxRounds) {
      val doubled = paths.alias("a")
        .join(paths.alias("b"), col("a.dst") === col("b.src"))
        .select(col("a.src").as("src"), col("b.dst").as("dst"))
      val next = paths.unionByName(doubled).distinct().localCheckpoint(false)
      val m = next.count()
      grown = m > n
      paths = next
      n = m
      round += 1
    }
    // A final permitted round that still grew may nonetheless have REACHED
    // the fixpoint (growth in round maxRounds, zero growth after) — one
    // confirmation join distinguishes that from genuine non-convergence
    // instead of throwing a spurious failure at the boundary.
    if (grown) {
      val doubled = paths.alias("a")
        .join(paths.alias("b"), col("a.dst") === col("b.src"))
        .select(col("a.src").as("src"), col("b.dst").as("dst"))
      val m = paths.unionByName(doubled).distinct().count()
      if (m > n)
        throw new IllegalStateException(
          s"transitiveClosure did not converge in $maxRounds rounds " +
            s"(paths of length > 2^$maxRounds exist); raise maxRounds")
    }
    paths
  }

  /** Connected components over an undirected pair set (a, b) → (node,
    * component) with component = the smallest node id reachable. The
    * clustering step a dedup pipeline needs after near-dup PAIR detection
    * (pairs → clusters → one canonical doc per cluster).
    *
    * Min-label propagation with pointer jumping: each round every node
    * takes the min of its own label and its neighbors' labels, then
    * shortcuts through its label's label (path halving). The label's
    * reach roughly doubles per round, so convergence is O(log diameter)
    * — a 2M-hop chain closes in ~20 rounds — while each round stays one
    * groupBy + one self-join over the label table (O(E) work, no closure
    * materialization, no O(cluster²) pair space). localCheckpoint
    * truncates lineage per round like the closure above. Non-convergence
    * within maxRounds throws instead of silently returning split
    * components. */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 20): DataFrame = {
    // checkpoint the PAIR input before symmetrizing: the union otherwise
    // embeds the caller's (possibly huge) pair-generation plan twice, and
    // the lazy checkpoint's toRdd pays planning + codegen for both copies
    // on the driver — measured 3.4s of pure driver time on the minhash
    // pipeline before this split
    val p = pairs.select(col("a"), col("b")).localCheckpoint(false)
    val edges = p
      .unionByName(p.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint(false)
    edges.count() // materialize once; reused every round
    // init fuses the first min-propagation: label = min(self, neighbors) —
    // one round fewer than starting from label = self (every node appears
    // as `a` in the symmetrized edge set, so the groupBy covers all nodes)
    var labels = edges.groupBy(col("a").as("node"))
      .agg(min(col("b")).as("_nbr"))
      .select(col("node"), least(col("node"), col("_nbr")).as("component"))
      .localCheckpoint(false)
    // labels only ever DECREASE, so the label sum strictly decreases
    // until convergence — a single decimal aggregate replaces a
    // join-and-count change detector (decimal: a 10^12-node graph's id
    // sum overflows int64)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("component").cast("decimal(38,0)"))).head.getDecimal(0)
    var prevSum = labelSum(labels)
    // empty pair set (e.g. a corpus with no near-dup pairs at all):
    // sum-of-nothing is null and there is nothing to propagate — the
    // empty (node, component) frame IS the fixpoint
    if (prevSum == null) return labels
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("node", "b")
          .withColumnRenamed("component", "nbr_component"), Seq("b"))
        .groupBy(col("a").as("node"))
        .agg(min(col("nbr_component")).as("nbr_component"))
      // lazy checkpoint: propagated is BOTH sides of the pointer-jump
      // self-join below — without it the edges-join + groupBy run twice
      // per round
      val propagated = labels.join(neighborMin, Seq("node"), "left")
        .select(col("node"),
          least(col("component"), coalesce(col("nbr_component"), col("component")))
            .as("component"))
        .localCheckpoint(false)
      // pointer jump (path halving): component := component's component.
      // Every label value is itself a node id (mins over node ids), so the
      // self-join resolves; coalesce is belt-and-braces for the root.
      val next = propagated
        .join(propagated
          .select(col("node").as("component"), col("component").as("_jumped")),
          Seq("component"), "left")
        .select(col("node"), coalesce(col("_jumped"), col("component")).as("component"))
        .localCheckpoint(false)
      val s = labelSum(next)
      labels = next
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      round += 1
    }
    // Same boundary case as transitiveClosure: the last permitted round may
    // have landed exactly on the fixpoint. Confirm with one more
    // propagation before declaring failure.
    if (!converged) {
      val confirm = edges
        .join(labels.withColumnRenamed("node", "b")
          .withColumnRenamed("component", "nbr_component"), Seq("b"))
        .groupBy(col("a").as("node"))
        .agg(min(col("nbr_component")).as("nbr_component"))
      val confirmed = labels.join(confirm, Seq("node"), "left")
        .select(col("node"),
          least(col("component"), coalesce(col("nbr_component"), col("component")))
            .as("component"))
      if (labelSum(confirmed).compareTo(prevSum) != 0)
        throw new IllegalStateException(
          s"connectedComponents did not converge in $maxRounds rounds; " +
            "raise maxRounds (labels would be silently wrong otherwise)")
    }
    labels
  }

  /** Single-source (or multi-seed) shortest paths over positively
    * weighted edges (src, dst, w) — Bellman-Ford rounds as DataFrame
    * joins: each round relaxes every edge whose source is labeled and
    * keeps the min distance per node. Rounds needed = the hop count of
    * the longest shortest path, so this is the right tool for shallow
    * weighted graphs (dependency DAGs, containment hierarchies with
    * costs); convergence = an empty improvement frontier. Per round:
    * one equi-join of the frontier against the edge set + one min
    * aggregation + one full-outer distance update — work proportional
    * to the relaxations that actually happen, lineage truncated by lazy
    * localCheckpoints exactly like the other fixpoints here. Weights
    * must be non-negative (Bellman-Ford with a round budget would
    * silently miss longer negative-cost paths). Throws on
    * non-convergence after a confirmation round. */
  def sssp(edges: DataFrame, seeds: DataFrame, maxRounds: Int = 30): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("w")).localCheckpoint(false)
    var dist = seeds.select(col("node")).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint(false)
    var frontier = dist
    // frontier-based relaxation (the SPFA/delta-stepping shape): only
    // edges leaving nodes IMPROVED last round are re-examined, so total
    // work is proportional to the relaxations that actually happen, not
    // rounds × O(E + V) — the difference between a settled 100 TB graph
    // coasting through late rounds and re-shuffling every edge each round.
    def improvements(front: DataFrame): DataFrame =
      e.join(front.select(col("node").as("src"), col("dist").as("_sd")), Seq("src"))
        .groupBy(col("dst").as("node")).agg(min(col("_sd") + col("w")).as("_cand"))
        .join(dist.withColumnRenamed("dist", "_old"), Seq("node"), "left")
        .filter(col("_old").isNull || col("_cand") < col("_old"))
        .select(col("node"), col("_cand").as("dist"))
    var round = 0
    var settled = false
    while (!settled && round < maxRounds) {
      val improved = improvements(frontier).localCheckpoint(false)
      if (improved.isEmpty) settled = true
      else {
        dist = dist
          .join(improved.withColumnRenamed("dist", "_new"), Seq("node"), "full")
          .select(col("node"), coalesce(col("_new"), col("dist")).as("dist"))
          .localCheckpoint(false)
        frontier = improved
      }
      round += 1
    }
    // budget exhausted with a live frontier: one confirmation pass
    // distinguishes "last round landed exactly on the fixpoint" (its
    // improvements are empty) from genuinely truncated paths
    if (!settled && !improvements(frontier).isEmpty)
      throw new IllegalStateException(
        s"sssp did not converge in $maxRounds rounds; raise maxRounds " +
          "(distances would be silently non-minimal otherwise)")
    dist
  }

  /** Hop-distance labeling from a seed set: level-synchronous BFS
    * (the Pregel shape) — each round expands the current frontier one
    * hop, anti-joins away everything already labeled, and stamps the
    * round number as the distance. Returns (node, dist) for every node
    * within `maxDepth` hops of a seed; distances are exact minima
    * because a node is labeled the FIRST round it appears.
    *
    * Cost is O(E) per level with one join + one anti-join + one distinct
    * — the right tool for small diameters / bounded neighborhoods
    * (blast-radius queries, k-hop enrichment). For full reachability
    * over long chains use [[transitiveClosure]]'s path doubling instead:
    * BFS pays a round per hop, doubling pays log₂. localCheckpoint per
    * round truncates lineage exactly like the other fixpoints here. */
  def bfsDistances(edges: DataFrame, seeds: DataFrame, maxDepth: Int): DataFrame = {
    require(maxDepth >= 0, "maxDepth must be non-negative")
    val e = edges.select(col("src"), col("dst"))
    var visited = seeds.select(col("node")).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint(false)
    visited.count() // materialize the checkpoint before reuse
    var frontier = visited.select(col("node"))
    var d = 1L
    var done = maxDepth == 0
    while (!done) {
      val next = frontier.join(e, frontier("node") === e("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .localCheckpoint(false)
      val grew = next.count() > 0
      if (grew) {
        // lazy checkpoint: next round's anti-join (or the final read)
        // materializes it — no separate per-level job needed
        visited = visited.unionByName(next.withColumn("dist", lit(d)))
          .localCheckpoint(false)
        frontier = next.select(col("node"))
      }
      d += 1
      done = !grew || d > maxDepth
    }
    visited
  }

  /** Nearest-seed labeling: multi-source BFS that assigns every node
    * within `maxDepth` hops of a seed the LABEL of its nearest seed
    * (ties → smallest label). The propagation step of label spreading
    * over a link graph — stamping crawl documents with the topic/quality
    * label of the closest curated hub, blast-radius ownership attribution
    * in the asset graph, etc.
    *
    * Level-synchronous like [[bfsDistances]] (distances are exact minima
    * because a node is labeled the first round it appears), with the
    * frontier carrying (node, label) and a per-round min(label) aggregate
    * resolving same-distance ties deterministically. One join + one
    * map-side-combinable min + one anti-join per level, lineage truncated
    * by lazy localCheckpoints. Seeds listed twice keep their smallest
    * label; a seed's own label always wins at distance 0. */
  def nearestSeed(edges: DataFrame, seeds: DataFrame, maxDepth: Int): DataFrame = {
    require(maxDepth >= 0, "maxDepth must be non-negative")
    val e = edges.select(col("src"), col("dst"))
    var visited = seeds.select(col("node"), col("label"))
      .groupBy(col("node")).agg(min(col("label")).as("label"))
      .withColumn("dist", lit(0L)).localCheckpoint(false)
    visited.count() // materialize the checkpoint before reuse
    var frontier = visited.select(col("node"), col("label"))
    var d = 1L
    var done = maxDepth == 0
    while (!done) {
      val next = frontier.join(e, frontier("node") === e("src"))
        .groupBy(col("dst").as("node")).agg(min(col("label")).as("label"))
        .join(visited, Seq("node"), "left_anti")
        .localCheckpoint(false)
      val grew = next.count() > 0
      if (grew) {
        visited = visited.unionByName(next.withColumn("dist", lit(d)))
          .localCheckpoint(false)
        frontier = next.select(col("node"), col("label"))
      }
      d += 1
      done = !grew || d > maxDepth
    }
    visited
  }

  /** Synchronous label propagation (Raghavan et al. 2007) for community
    * detection over an undirected edge set, made DETERMINISTIC: every
    * node starts labeled with its own id, and each round adopts the
    * label most frequent among its neighbors, ties to the SMALLEST
    * label (the classic formulation breaks ties randomly, which is
    * neither reproducible nor oracle-checkable; min-label ties converge
    * to the same partition families in practice). Each node's OWN label
    * joins the vote: pure synchronous LPA label-swaps forever on
    * bipartite structure (a single edge oscillates 1↔2), and the
    * self-vote is the standard damping that lets it settle — it also
    * makes "no neighbors" a non-case, every node has at least one vote.
    * Fixed `rounds` — LPA has no monotone convergence measure, so a
    * bounded round count IS the standard stopping rule.
    *
    * Scale shape per round: one edges⋈labels equi-join, one
    * (node, label) count — map-side combinable — and one argmax via
    * `max(struct(count, -label))` (no window, no sort), then a left
    * join back to the node set. O(E) per round; lineage truncated per
    * round like every fixpoint here. */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 8,
      s"labelPropagation wants 1..8 synchronous rounds, got $rounds")
    val p = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
    val und = p.unionByName(p.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(false)
    val nodes = und.select(col("src").as("node")).distinct().localCheckpoint(false)
    var labels = nodes.select(col("node"), col("node").as("label"))
    for (_ <- 1 to rounds) {
      val votes = und
        .join(labels.select(col("node").as("src"), col("label")), Seq("src"))
        .select(col("dst").as("node"), col("label"))
        .unionByName(labels)
        .groupBy(col("node"), col("label")).agg(count(lit(1)).as("c"))
      labels = votes
        .groupBy(col("node"))
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("w"))
        .select(col("node"), (-col("w.nl")).as("label"))
        .localCheckpoint(false)
    }
    labels
  }

  /** Strongly connected components of a directed edge set (src, dst) —
    * the FW-BW coloring scheme (Orzan 2004 / Hong et al. 2013) with a
    * trim pass, entirely as DataFrame fixpoints:
    *
    * per outer round,
    *  1. TRIM: any remaining node with no in-edge or no out-edge is a
    *     singleton SCC — assigned immediately (one degree semi-join, no
    *     fixpoint). Kills tree/chain regions fast.
    *  2. COLOR: propagate color(v) = max(id(u) : u →* v) to fixpoint
    *     (one edges⋈colors join + max-agg per round; colors only grow,
    *     so a decimal color-sum is the convergence test, exactly like
    *     [[connectedComponents]]'s label sum). Every color class
    *     contains its root c (nothing higher reaches c, else c's own
    *     color would exceed c), and c is the MAX member of its SCC.
    *  3. EXTRACT: SCC(c) = backward closure of c inside its color class
    *     — a frontier BFS over same-colored edges, component id = c.
    *     Sound because color(v) = c already proves c →* v, and a
    *     backward path through class-c nodes proves v →* c.
    *
    * Extracted nodes leave the graph; the remainder (nodes whose max
    * ancestor was outside their own SCC) recolors next round. Outer
    * rounds needed = depth of the condensation chain of color roots —
    * small on real graphs once trim eats the acyclic fringe, but Θ(n)
    * adversarial (a reverse-ordered chain), hence the budget + throw
    * rather than a silent partial answer.
    *
    * Output: (node, component) with component = the max member id of
    * the node's SCC — canonical regardless of extraction order. Nodes
    * are the edge endpoints; supply isolated nodes yourself if needed.
    *
    * Scale shape: every step is an equi-join + aggregation on (src) or
    * (dst) — no closure table, no per-node adjacency state; pair volume
    * never exceeds |E|. Lineage truncated per round via localCheckpoint
    * like every fixpoint here. */
  def stronglyConnectedComponents(edges: DataFrame, maxOuterRounds: Int = 12,
                                  maxInnerRounds: Int = 60): DataFrame = {
    val e0 = edges.select(col("src"), col("dst")).distinct().localCheckpoint(false)
    val emptyAssign = e0.select(col("src").as("node"), col("src").as("component")).limit(0)
    var assigned = emptyAssign
    var remaining = e0.select(col("src").as("node"))
      .unionByName(e0.select(col("dst").as("node"))).distinct().localCheckpoint(false)
    var remainingEdges = e0
    var remainingCount = remaining.count()
    def colorSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("color").cast("decimal(38,0)"))).head.getDecimal(0)
    var outer = 0
    while (remainingCount > 0 && outer < maxOuterRounds) {
      // ---- 1. trim (one pass per outer round): chain ENDS go straight
      // to singleton SCCs; interior chain nodes either fall to a later
      // trim or come out as color roots of the same color fixpoint the
      // cyclic nodes already pay for — measured on the gate graph, a
      // trim-to-fixpoint variant only added driver rounds (11.0s vs
      // 8.2s at sf0.1) because no outer round was actually saved
      val noIn = remaining.join(
        remainingEdges.select(col("dst").as("node")), Seq("node"), "left_anti")
      val noOut = remaining.join(
        remainingEdges.select(col("src").as("node")), Seq("node"), "left_anti")
      val trimmed = noIn.unionByName(noOut).distinct()
        .select(col("node"), col("node").as("component"))
        .localCheckpoint(false)
      if (trimmed.count() > 0) {
        assigned = assigned.unionByName(trimmed).localCheckpoint(false)
        remaining = remaining.join(trimmed, Seq("node"), "left_anti").localCheckpoint(false)
        remainingEdges = remainingEdges
          .join(remaining.select(col("node").as("src")), Seq("src"), "left_semi")
          .join(remaining.select(col("node").as("dst")), Seq("dst"), "left_semi")
          .localCheckpoint(false)
        remainingCount = remaining.count()
      }
      if (remainingCount > 0) {
        // ---- 2. color to fixpoint
        var colors = remaining.select(col("node"), col("node").as("color"))
          .localCheckpoint(false)
        var prevSum = colorSum(colors)
        var converged = false
        var round = 0
        while (!converged && round < maxInnerRounds) {
          val inMax = remainingEdges
            .join(colors.select(col("node").as("src"), col("color").as("_c")), Seq("src"))
            .groupBy(col("dst").as("node")).agg(max(col("_c")).as("_inmax"))
          // plain synchronous propagation — a max-color pointer-jump
          // variant (color(v) := max(color(v), color(color(v))), the
          // connectedComponents trick flipped to max) was measured SLOWER
          // on the gate graph (11.5s vs 8.2s at sf0.1): one extra join +
          // checkpoint per round buys nothing when propagation depth is
          // already ~10; revisit only for chain-shaped inputs
          colors = colors.join(inMax, Seq("node"), "left")
            .select(col("node"),
              greatest(col("color"), coalesce(col("_inmax"), col("color"))).as("color"))
            .localCheckpoint(false)
          val s = colorSum(colors)
          converged = s.compareTo(prevSum) == 0
          prevSum = s
          round += 1
        }
        if (!converged) throw new IllegalStateException(
          s"SCC coloring did not converge in $maxInnerRounds rounds; raise maxInnerRounds")
        // ---- 3. extract: backward closure from each color root in its class
        val ce = remainingEdges
          .join(colors.select(col("node").as("src"), col("color").as("_cs")), Seq("src"))
          .join(colors.select(col("node").as("dst"), col("color").as("_cd")), Seq("dst"))
          .filter(col("_cs") === col("_cd"))
          .select(col("src"), col("dst"), col("_cs").as("color"))
          .localCheckpoint(false)
        var marked = colors.filter(col("node") === col("color"))
          .select(col("node"), col("color").as("component")).localCheckpoint(false)
        var frontier = marked
        var frontierCount = frontier.count()
        round = 0
        while (frontierCount > 0 && round < maxInnerRounds) {
          frontier = ce
            .join(frontier.select(col("node").as("dst"), col("component")), Seq("dst"))
            .select(col("src").as("node"), col("component")).distinct()
            .join(marked, Seq("node"), "left_anti")
            .localCheckpoint(false)
          frontierCount = frontier.count()
          if (frontierCount > 0)
            marked = marked.unionByName(frontier).localCheckpoint(false)
          round += 1
        }
        if (frontierCount > 0) throw new IllegalStateException(
          s"SCC extraction did not converge in $maxInnerRounds rounds; raise maxInnerRounds")
        assigned = assigned.unionByName(marked).localCheckpoint(false)
        remaining = remaining.join(marked, Seq("node"), "left_anti").localCheckpoint(false)
        remainingEdges = remainingEdges
          .join(remaining.select(col("node").as("src")), Seq("src"), "left_semi")
          .join(remaining.select(col("node").as("dst")), Seq("dst"), "left_semi")
          .localCheckpoint(false)
        remainingCount = remaining.count()
      }
      outer += 1
    }
    if (remainingCount > 0) throw new IllegalStateException(
      s"SCC did not settle in $maxOuterRounds outer rounds (condensation chain " +
        "deeper than the budget); raise maxOuterRounds")
    assigned
  }

  /** Bounded-depth reachability (the `*1..k` form): plain frontier
    * expansion, k rounds, no closure materialization. */
  def reachWithin(edges: DataFrame, depth: Int): DataFrame = {
    val base = edges.select(col("src"), col("dst")).distinct()
    var acc = base.localCheckpoint()
    var frontier = base
    (2 to depth).foreach { _ =>
      frontier = frontier.alias("f")
        .join(base.alias("e"), col("f.dst") === col("e.src"))
        .select(col("f.src").as("src"), col("e.dst").as("dst"))
        .distinct()
      acc = acc.unionByName(frontier).distinct().localCheckpoint()
    }
    acc
  }
}
