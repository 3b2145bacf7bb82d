package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VecFunctions.vec_dot
import graft.operators.BloomJoin
import graft.similarity.Similarity
import graft.text.TextFunctions

/** Deduplication operators for training-data pipelines: exact, blocked
  * n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine.
  *
  * Scale design: none of these materialize the full O(n²) pair space —
  * exact dedup is one hash aggregation; Jaccard is blocked; MinHash
  * generates candidates through band-bucket equi-joins (shuffle on band
  * signature, skew-safe because signatures are near-uniform); SimHash
  * pairs by exact sketch equality; cosine near-dup is quantized so results
  * are deterministic and can be LSH-bucketed.
  */
object Dedup {

  /** Exact dedup by key: one hash aggregation keeping the smallest id as
    * canonical (map-side partial agg → tiny shuffle). */
  def exact(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.groupBy(col(keyCol).as("dedup_key"))
      .agg(min(col(idCol)).cast("long").as("canonical_id"),
        count(lit(1)).as("n_docs"))

  /** (doc_id, block, shingles) prep: dictionary-encode in place (inline
    * hash ids — zero shuffles), shingle, and block by the first two tokens
    * — candidates are only generated within a block. */
  def shingleTable(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val wids = TextFunctions.widArrays(docs, idCol, textCol)
    wids.select(col("doc_id"),
      concat_ws(" ", element_at(col("wids"), 1), element_at(col("wids"), 2)).as("block"),
      TextFunctions.shingleIds(col("wids")).as("shingles"))
  }

  /** Blocked pairwise n-gram Jaccard: self-join within blocks, then an
    * in-row array_intersect — the per-pair work is a fused codegen'd
    * array op, not an explode+shuffle. Returns pairs ≥ minJaccX1e6.
    *
    * Skew note: a boilerplate-heavy corpus can concentrate a prefix
    * block; AQE's skew-join split (on by default with AQE) re-partitions
    * oversized blocks at runtime, and [[minhashLsh]] is the principled
    * scale path when block-local O(b²) is unacceptable — this operator
    * is the exact-Jaccard baseline. */
  def blockedJaccard(shingled: DataFrame, minJaccX1e6: Long): DataFrame = {
    // both sides of the self-join re-run the shingle prep otherwise
    val mat = shingled.localCheckpoint(false)
    val a = mat.select(col("block"), col("doc_id").as("doc_a"),
      col("shingles").as("sh_a"))
    val b = mat.select(col("block"), col("doc_id").as("doc_b"),
      col("shingles").as("sh_b"))
    a.join(b, Seq("block")).filter(col("doc_a") < col("doc_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("uni",
        size(col("sh_a")).cast("long") + size(col("sh_b")) - col("inter"))
      .withColumn("jacc_x1e6",
        floor(lit(1000000.0) * col("inter") / col("uni")).cast("long"))
      .filter(col("jacc_x1e6") >= minJaccX1e6)
      .select(col("doc_a"), col("doc_b"), col("jacc_x1e6"))
  }

  /** MinHash + LSH near-dup detection: 8 minhashes → 4 bands of 2 → band
    * equi-join candidates → exact Jaccard verification ≥ minJaccX1e6.
    * Candidate generation cost is one shuffle on (band, h1, h2); the full
    * pair space is never built (shingle→minhash→band→bucket-join). */
  def minhashLsh(shingled: DataFrame, minJaccX1e6: Long): DataFrame =
    lshCandidatePairs(shingled)
      .withColumn("uni",
        size(col("sh_a")).cast("long") + size(col("sh_b")) - col("inter"))
      .withColumn("jacc_x1e6",
        floor(lit(1000000.0) * col("inter") / col("uni")).cast("long"))
      .filter(col("jacc_x1e6") >= minJaccX1e6)
      .select(col("doc_a"), col("doc_b"), col("jacc_x1e6"))

  /** MinHash-LSH candidates scored by one-sided shingle CONTAINMENT
    * (Broder's resemblance vs containment distinction):
    * floor(1e6 * |A∩B| / min(|A|,|B|)). Catches subset duplication —
    * a short doc embedded verbatim in a longer one scores near 1e6 here
    * while its Jaccard stays low — the quote/excerpt case a training-data
    * dedup pass wants flagged. Same band-bucket candidate generation as
    * [[minhashLsh]] (never O(n²)). */
  def minhashContainment(shingled: DataFrame, minContX1e6: Long): DataFrame =
    lshCandidatePairs(shingled)
      .withColumn("containment_x1e6",
        floor(lit(1000000.0) * col("inter") /
          least(size(col("sh_a")), size(col("sh_b"))).cast("long")).cast("long"))
      .filter(col("containment_x1e6") >= minContX1e6)
      .select(col("doc_a"), col("doc_b"), col("containment_x1e6"))

  /** Cross-corpus decontamination — training-set hygiene: flag every
    * training doc sharing at least one n-gram shingle with the eval set
    * (the benchmark-overlap rule GPT-3/PaLM-style pipelines apply before
    * training). Returns every training doc with its shared-shingle count
    * and a contaminated flag.
    *
    * Scale: the eval side reduces to a DISTINCT shingle-id set —
    * benchmark-sized, usually broadcastable — and the training corpus is
    * scanned once and equi-joined on the shingle id; the two corpora are
    * never cross-joined. */
  def decontaminate(train: DataFrame, evalSet: DataFrame,
                    idCol: String, textCol: String): DataFrame = {
    val evalShingles = docShingles(evalSet, idCol, textCol)
      .select(col("sid")).distinct()
    val hits = docShingles(train, idCol, textCol).join(evalShingles, Seq("sid"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared_grams"))
    contaminationReport(train, idCol, hits)
  }

  /** [[decontaminate]] with a Bloom prefilter on the training side: the
    * eval corpus's distinct shingle set builds a compact Bloom filter
    * (8 bits/key — a 10M-shingle eval suite is ~10 MB, task-shippable),
    * and the train shingle table is pruned by `might_contain` IN THE
    * SCAN STAGE before anything shuffles. The exact equi-join then
    * removes Bloom false positives, so the result is byte-identical to
    * [[decontaminate]] — the filter only cuts shuffled volume.
    *
    * This is the 100 TB decontamination path: the train side's
    * non-candidate shingles (the overwhelming majority — eval overlap
    * is rare by construction) never leave their scan tasks, where the
    * plain join ships the full exploded shingle table through an
    * exchange. `expectedItems` sizes the filter; at the default 3% FP
    * rate an overestimate only wastes bytes, never correctness. */
  def decontaminateBloom(train: DataFrame, evalSet: DataFrame,
                         idCol: String, textCol: String,
                         expectedItems: Long): DataFrame = {
    val evalShingles = docShingles(evalSet, idCol, textCol)
      .select(col("sid")).distinct().localCheckpoint(false)
    val bloom = BloomJoin.buildBloom(evalShingles, "sid", expectedItems)
    val candidates = docShingles(train, idCol, textCol)
      .filter(BloomJoin.mightContain(bloom, col("sid")))
    val hits = candidates.join(evalShingles, Seq("sid"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared_grams"))
    contaminationReport(train, idCol, hits)
  }

  /** Exploded (doc_id, shingle-id) table shared by the decontamination
    * variants. */
  private def docShingles(df: DataFrame, idCol: String, textCol: String): DataFrame =
    TextFunctions.widArrays(df, idCol, textCol)
      .select(col("doc_id"),
        explode(TextFunctions.shingleIds(col("wids"))).as("sid"))

  /** Left-join per-doc hit counts back onto the full train id set. */
  private def contaminationReport(train: DataFrame, idCol: String,
                                  hits: DataFrame): DataFrame =
    train.select(col(idCol).cast("long").as("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared_grams"), lit(0L)).as("n_shared_grams"),
        (coalesce(col("n_shared_grams"), lit(0L)) > 0).as("contaminated"))

  /** Near-dup cluster canonicalization — the APPLY step after near-dup
    * detection: group documents into clusters (connected components over
    * the verified near-dup pairs), then keep exactly one representative
    * per cluster by policy (longest document, ties to the smallest id —
    * the "keep the richest copy" rule a curation pipeline applies before
    * training). Returns every doc with its cluster id, the chosen
    * representative, and a keep flag.
    *
    * Scale: pairs come from band-bucketed LSH (never O(n²)); components
    * converge in O(log diameter) rounds and near-dup clusters are
    * shallow; the per-cluster argmax is one aggregation on the cluster
    * key (no window over the corpus), and singleton docs never enter the
    * pair machinery — they join back as their own representative. */
  def representatives(docs: DataFrame, idCol: String, textCol: String,
                      minJaccX1e6: Long): DataFrame = {
    val pairs = minhashLsh(shingleTable(docs, idCol, textCol), minJaccX1e6)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val comps = graft.graph.Fixpoint.connectedComponents(pairs)
      .withColumnRenamed("node", "doc_id")
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
        size(TextFunctions.tokens(col(textCol))).cast("long").as("n_tokens"))
      .join(comps, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("component"), col("doc_id")).as("cluster_id"))
    // representative = max n_tokens, tie → min doc_id: a single
    // max(struct) aggregation per cluster, merged map-side
    val reps = base.groupBy(col("cluster_id"))
      .agg(max(struct(col("n_tokens"), (-col("doc_id")).as("neg_id"))).as("best"))
      .select(col("cluster_id"), (-col("best.neg_id")).as("rep_id"))
    base.join(reps, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("rep_id"),
        (col("doc_id") === col("rep_id")).as("keep"))
  }

  /** The raw LSH candidate pair set (band-bucket matches, BEFORE exact
    * verification) — exposed so candidate-generation RECALL can be
    * measured against an exact ground truth ([[blockedJaccard]]):
    * tuning bands/rows is a measurement problem, not a guess. Stops at
    * the band join — none of the verification machinery runs. */
  def lshCandidates(shingled: DataFrame): DataFrame =
    bandCandidates(shingled.localCheckpoint(false))

  /** Band-bucket candidate generation: 8 minhashes → 4 bands of 2 →
    * band equi-join → distinct (doc_a < doc_b) pairs. One shuffle on
    * (band, h1, h2); the full pair space is never built. `mat` should
    * already be materialized — the band self-join consumes it twice. */
  private def bandCandidates(mat: DataFrame): DataFrame = {
    val sigs = mat.select(
      (col("doc_id") +: col("shingles") +:
        TextFunctions.minhashCols(col("shingles"))): _*)
    val bands = sigs.select(col("doc_id"),
      explode(array((0 until 4).map(j =>
        struct(lit(j).as("band"), col(s"h${2 * j}").as("h1"),
          col(s"h${2 * j + 1}").as("h2"))): _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"),
        col("b.h1").as("h1"), col("b.h2").as("h2"))
    bands.alias("x")
      .join(bands.alias("y"),
        col("x.band") === col("y.band") && col("x.h1") === col("y.h1") &&
          col("x.h2") === col("y.h2") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .dropDuplicates("doc_a" :: "doc_b" :: Nil)
  }

  /** [[bandCandidates]] joined back to both shingle sets with the
    * intersection size precomputed — the verification input shared by
    * [[minhashLsh]] and [[minhashContainment]]. The shingle prep
    * (tokenize + hash + shingle) is consumed by the band self-join AND
    * both verification joins — materialize it once; the shingled table
    * is corpus-sized rows but only (id, block, shingles) wide, far
    * cheaper to store than to recompute per consumer. */
  private def lshCandidatePairs(shingled: DataFrame): DataFrame = {
    val mat = shingled.localCheckpoint(false)
    val sh = mat.select(col("doc_id"), col("shingles"))
    bandCandidates(mat)
      .join(sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
  }

  /** SimHash near-dup pairs: docs with identical 32-bit tf-weighted
    * sketches. Exact-match pairing is a single equi-join on the sketch;
    * hamming-distance-k pairing would union the k bit-flip probes. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sh = TextFunctions.simhash(TextFunctions.termFreq(docs, idCol, textCol))
    sh.alias("a").join(sh.alias("b"),
        col("a.simhash") === col("b.simhash") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("simhash"))
  }

  /** SimHash near-dup pairs within hamming distance k: split the 32-bit
    * sketch into k+1 chunks — any pair within distance k shares at least
    * one exact chunk (pigeonhole), so candidates come from k+1 chunk-value
    * equi-joins, then `bit_count(xor) <= k` verifies. No n² pair space;
    * the standard scale path for hamming-radius search. */
  def simhashPairsWithin(docs: DataFrame, idCol: String, textCol: String,
                         k: Int): DataFrame = {
    require(k >= 1 && k <= 7, "chunk width must stay useful: k in 1..7 for 32 bits")
    val sh = TextFunctions.simhash(TextFunctions.termFreq(docs, idCol, textCol))
    val chunks = TextFunctions.chunkBounds(TextFunctions.SimhashBits, k + 1)
    val buckets = sh.select(col("doc_id"), col("simhash"),
      explode(array(chunks.zipWithIndex.map { case ((lo, width), i) =>
        struct(lit(i).as("ci"),
          shiftright(col("simhash"), lo).bitwiseAND(lit((1L << width) - 1)).as("cv"))
      }: _*)).as("b"))
      .select(col("doc_id"), col("simhash"), col("b.ci"), col("b.cv"))
    buckets.alias("a")
      .join(buckets.alias("b"),
        col("a.ci") === col("b.ci") && col("a.cv") === col("b.cv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long")
          .as("hamming"))
      .dropDuplicates("doc_a" :: "doc_b" :: Nil)
      .filter(col("hamming") <= k)
  }

  /** Embedding-cosine near-dup pairs over quantized vectors (see
    * [[graft.similarity.Similarity.quantized]]): all pairs ≥ minCosX1e6.
    * Quantization makes every dot product exact integer math. For corpora
    * where n² is too large, bucket with [[graft.similarity.Similarity]]'s
    * sign-LSH first. */
  /** The scale path for embedding near-dup: bucket by the 8-bit sign-LSH
    * signature ([[graft.similarity.Similarity.signLsh]]) and score pairs
    * only within a bucket — an equi-join on the signature, so the corpus
    * is scanned once and the pair space never exceeds the bucket-local
    * products (vs [[cosineNearDup]]'s all-pairs nested loop, which stays
    * as the exactness baseline). Near-identical vectors land in the same
    * bucket with high probability; recall tightens with more bits or
    * multi-probe unioning. */
  def cosineNearDupBucketed(quantized: DataFrame, minCosX1e6: Long): DataFrame = {
    val sigs = Similarity.signLsh(quantized)
    val a = sigs.select(col("sig"), col("vec_id").as("vec_a"), col("q").as("qa"),
      col("norm2").as("na"))
    val b = sigs.select(col("sig"), col("vec_id").as("vec_b"), col("q").as("qb"),
      col("norm2").as("nb"))
    a.join(b, Seq("sig")).filter(col("vec_a") < col("vec_b"))
      .withColumn("dot", vec_dot(col("qa"), col("qb")))
      .withColumn("cos_x1e6",
        floor(lit(1000000.0) * col("dot") /
          sqrt((col("na") * col("nb")).cast("double"))).cast("long"))
      .filter(col("cos_x1e6") >= minCosX1e6)
      .select(col("vec_a"), col("vec_b"), col("cos_x1e6"))
  }

  /** SemDeDup (Abbas et al. 2023): semantic dedup scoped by a k-means
    * clustering — train a coarse quantizer ([[graft.similarity.Similarity
    * .kmeansAssign]], one Lloyd round, deterministic), score cosine pairs
    * ONLY within a cluster, and collapse the resulting near-dup graph to
    * canonical ids via [[graft.graph.Fixpoint.connectedComponents]].
    *
    * The cluster equi-join is what survives 100 TB: pair volume is
    * Σ clusterᵢ² instead of n², and the centroid count is the knob that
    * bounds cluster size (SemDeDup uses 50k clusters at web scale). The
    * price, as in the paper, is recall at cluster boundaries — a pair
    * split across centroids is never scored; [[cosineNearDup]] stays the
    * exactness baseline.
    *
    * Output: one row per vector — (vec_id, cid, canonical_id) with
    * canonical_id = min vec_id of its within-cluster near-dup component
    * (itself when nothing merged). */
  def semanticDedup(quantized: DataFrame, nCentroids: Int,
                    minCosX1e6: Long): DataFrame =
    semanticDedup(quantized,
      Similarity.kmeansAssign(quantized, nCentroids, iterations = 1),
      minCosX1e6)

  /** [[semanticDedup]] over a PRECOMPUTED cluster assignment (vec_id,
    * cid) — the [[graft.similarity.Similarity.kmeansArtifact]] pattern:
    * the coarse clustering is trained once per corpus version and every
    * consumer (this dedup, IVF routing, sampling strata) reads the same
    * artifact instead of re-running Lloyd. */
  def semanticDedup(quantized: DataFrame, assignment: DataFrame,
                    minCosX1e6: Long): DataFrame = {
    val assign = assignment.select(col("vec_id"), col("cid"))
    val clustered = quantized.join(assign, Seq("vec_id"))
    val a = clustered.select(col("cid"), col("vec_id").as("vec_a"),
      col("q").as("qa"), col("norm2").as("na"))
    val b = clustered.select(col("cid"), col("vec_id").as("vec_b"),
      col("q").as("qb"), col("norm2").as("nb"))
    val pairs = a.join(b, Seq("cid")).filter(col("vec_a") < col("vec_b"))
      .withColumn("dot", vec_dot(col("qa"), col("qb")))
      .withColumn("cos_x1e6",
        floor(lit(1000000.0) * col("dot") /
          sqrt((col("na") * col("nb")).cast("double"))).cast("long"))
      .filter(col("cos_x1e6") >= minCosX1e6)
      .select(col("vec_a").as("a"), col("vec_b").as("b"))
    val comp = graft.graph.Fixpoint.connectedComponents(pairs)
      .select(col("node").as("vec_id"), col("component"))
    assign.join(comp, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"),
        coalesce(col("component"), col("vec_id")).as("canonical_id"))
  }

  def cosineNearDup(quantized: DataFrame, minCosX1e6: Long): DataFrame = {
    val a = quantized.select(col("vec_id").as("vec_a"), col("q").as("qa"),
      col("norm2").as("na"))
    val b = quantized.select(col("vec_id").as("vec_b"), col("q").as("qb"),
      col("norm2").as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("dot", vec_dot(col("qa"), col("qb")))
      .withColumn("cos_x1e6",
        floor(lit(1000000.0) * col("dot") /
          sqrt((col("na") * col("nb")).cast("double"))).cast("long"))
      .filter(col("cos_x1e6") >= minCosX1e6)
      .select(col("vec_a"), col("vec_b"), col("cos_x1e6"))
  }
}
