package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Lineage._

import graft.functions.VecFunctions.{vec_dot, vec_norm2}
import graft.text.TextFunctions.Mix

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exactness baseline, and a sign-LSH
  * bucketed variant as the scale path.
  *
  * All scores are computed over milli-quantized integer vectors
  * (q_i = floor(1000 * x_i)), so dot products and norms are exact integers
  * — deterministic under any partitioning and reproducible in the DuckDB
  * oracle — and ranking ties break on vec_id. The final cosine is
  * floor(1e6 * dot / sqrt(na*nb)).
  */
object Similarity {

  /** Pairwise-similarity histogram over deterministic hash pairs — the
    * embedding-space health check (anisotropy / collapse shows as mass
    * piling into the high-cosine buckets): each vector pairs with the
    * vector whose id is md5₅₆(own id) mod N, and the SIGNED squared
    * cosine in exact ppm (`sign(dot)·dot²·1e6 div (‖a‖²‖b‖²)` — no
    * square root, so any engine reproduces it) buckets into
    * `1e6/width`-ppm cells. O(N) pairs — the diagnostic cost of one
    * extra scan, not an all-pairs join. Input = [[quantized]] output.
    * Output: (bucket, n_pairs). */
  def similarityHistogram(q: DataFrame, widthPpm: Long = 100000L): DataFrame = {
    require(widthPpm >= 1000 && widthPpm <= 1000000, "widthPpm in [1e3, 1e6]")
    val n = q.count()
    require(n >= 2, "need at least 2 vectors")
    val pairs = q
      .withColumn("partner",
        graft.functions.HashFunctions.md5_prefix64(
          col("vec_id").cast("string")) % n)
      .filter(col("partner") =!= col("vec_id"))
      .join(q.select(col("vec_id").as("partner"), col("q").as("qb"),
        col("norm2").as("nb")), Seq("partner"))
      .filter(col("norm2") > 0 && col("nb") > 0)
      .withColumn("dot", vec_dot(col("q"), col("qb")))
    pairs
      .withColumn("_c2", expr(
        "CAST(dot AS DECIMAL(38,0)) * dot * 1000000 div " +
          "(CAST(norm2 AS DECIMAL(38,0)) * nb)"))
      .withColumn("bucket",
        when(col("dot") < 0, -expr(s"_c2 div $widthPpm"))
          .otherwise(expr(s"_c2 div $widthPpm")))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_pairs"))
  }

  /** Quantize: (vec_id, q array<long>, norm2) — fused array expressions,
    * no shuffle. */
  def quantized(embeddings: DataFrame, idCol: String = "vec_id",
                embCol: String = "embedding"): DataFrame =
    embeddings.select(
      col(idCol).cast("long").as("vec_id"),
      transform(col(embCol), x => floor(x.cast("double") * 1000).cast("long")).as("q"))
      .withColumn("norm2", vec_norm2(col("q")))

  /** Matryoshka truncation: keep the first `dims` quantized components
    * and recompute the norm — the "use a prefix of the embedding" trick
    * (Kusupati et al. 2022) that trades recall for a dims-fold cut in
    * dot-product and storage cost. Measure the trade with the
    * [[bruteForceTopK]]-vs-truncated recall gate, never assume it. */
  def truncated(quantized: DataFrame, dims: Int): DataFrame = {
    require(dims >= 1, "dims must be positive")
    quantized.select(col("vec_id"), expr(s"slice(q, 1, $dims)").as("q"))
      .withColumn("norm2", vec_norm2(col("q")))
  }

  /** Per-dimension embedding drift between two vector populations (two
    * epochs, two encoder versions, two sources): component means in
    * exact-chain ×10^6 (floor of a double division — the
    * embed_label_centroid determinism contract) and their absolute
    * delta — the cheap first-line monitor that catches an encoder
    * regression or a source shift before any ANN index is rebuilt. One
    * posexplode + one agg per side. Output: (dim, n_a, n_b, mean_a_x1e6,
    * mean_b_x1e6, delta_x1e6). */
  def dimDrift(a: DataFrame, b: DataFrame): DataFrame = {
    def stats(df: DataFrame, suffix: String) = df
      .select(posexplode(col("q")).as(Seq("dim", "x")))
      .groupBy(col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as(s"n_$suffix"),
        floor(lit(1000000.0) * sum(col("x")) / count(lit(1)))
          .cast("long").as(s"mean_${suffix}_x1e6"))
    stats(a, "a").join(stats(b, "b"), Seq("dim"))
      .select(col("dim"), col("n_a"), col("n_b"),
        col("mean_a_x1e6"), col("mean_b_x1e6"),
        abs(col("mean_a_x1e6") - col("mean_b_x1e6")).as("delta_x1e6"))
  }

  private def cosX1e6 = floor(lit(1000000.0) * col("dot") /
    sqrt((col("na") * col("nb")).cast("double"))).cast("long")

  /** Brute-force top-k: queries × corpus with a fused zip_with dot product
    * per pair (no per-dimension row blowup), ranked per query. This is
    * the EXACTNESS BASELINE — the candidate-generation paths (IVF / LSH /
    * multi-probe / IVF-PQ) are the scale architecture.
    *
    * The query side broadcasts by default; past the broadcast ceiling
    * (driver memory / 8 GB) pass `broadcastQueries = false` and the pair
    * space becomes a shuffled cartesian join — same results, corpus
    * scanned once per query partition instead of once total, which is the
    * honest cost of an exact all-pairs scan at that size. A query side
    * whose plan-time size estimate already exceeds the hard ceiling fails
    * fast with that guidance instead of dying mid-broadcast. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     broadcastQueries: Boolean = true): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("q").as("qq"),
      col("norm2").as("na"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("q").as("qc"),
      col("norm2").as("nb"))
    if (broadcastQueries) {
      val est = q.queryExecution.optimizedPlan.stats.sizeInBytes
      require(est <= 8L * 1024 * 1024 * 1024,
        s"query side estimates ${est} bytes, past the 8 GB broadcast ceiling; " +
          "pass broadcastQueries = false for the shuffled exact scan " +
          "or use an ANN path (ivfTopK / lshTopKMultiProbe / ivfPqTopK)")
    }
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_x1e6").desc, col("neighbor_id").asc)
    c.join(if (broadcastQueries) broadcast(q) else q,
        col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", vec_dot(col("qq"), col("qc")))
      .withColumn("cos_x1e6", cosX1e6)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_x1e6"))
  }

  /** 8-bit sign-LSH signature: bit j = sign of the projection of q onto a
    * deterministic ±1 hyperplane (w_ji = ±1 from bit 13 of
    * (j*64+i)*Knuth). The hyperplanes are precomputed literal arrays, so
    * each projection is one codegen'd vec_dot. */
  def signLsh(quantized: DataFrame, dims: Int = 64, bits: Int = 8): DataFrame = {
    val planes: Seq[Column] = (0 until bits).map { j =>
      typedLit((1 to dims).map { i =>
        if ((((j.toLong * dims + i) * Mix) >> 13 & 1L) == 1L) 1L else -1L
      })
    }
    val sig = (0 until bits).map(j =>
      when(vec_dot(col("q"), planes(j)) > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    quantized.withColumn("sig", sig)
  }

  /** Multi-probe LSH top-k: each query probes its own bucket plus every
    * 1-bit-flip neighbor bucket (9 probes for 8 bits) — recall rises
    * sharply for a 9× candidate cost that is still nowhere near the
    * brute-force n². Probes explode on the (small, broadcast) query side;
    * the corpus is scanned once. A query side whose plan-time estimate
    * (× the probe fan-out) exceeds the broadcast ceiling fails fast with
    * guidance — same guard as [[bruteForceTopK]]; pass
    * `broadcastQueries = false` for a shuffled bucket equi-join. */
  def lshTopKMultiProbe(queries: DataFrame, corpus: DataFrame, k: Int,
                        bits: Int = 8, broadcastQueries: Boolean = true): DataFrame = {
    val q0 = signLsh(queries, bits = bits)
    if (broadcastQueries) {
      val est = q0.queryExecution.optimizedPlan.stats.sizeInBytes * (bits + 1)
      require(est <= 8L * 1024 * 1024 * 1024,
        s"probe side estimates ${est} bytes ((bits+1) x query side), past the " +
          "8 GB broadcast ceiling; pass broadcastQueries = false for a " +
          "shuffled bucket join, or cut the query batch size")
    }
    val probes = q0.select(col("vec_id").as("query_id"), col("q").as("qq"),
        col("norm2").as("na"),
        explode(array((lit(0L) +: (0 until bits).map(j => lit(1L << j))).map(m =>
          col("sig").bitwiseXOR(m)): _*)).as("sig"))
    val c = signLsh(corpus, bits = bits).select(col("vec_id").as("neighbor_id"),
      col("q").as("qc"), col("norm2").as("nb"), col("sig"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_x1e6").desc, col("neighbor_id").asc)
    c.join(if (broadcastQueries) broadcast(probes) else probes, Seq("sig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id" :: "neighbor_id" :: Nil)
      .withColumn("dot", vec_dot(col("qq"), col("qc")))
      .withColumn("cos_x1e6", cosX1e6)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_x1e6"))
  }

  /** IVF (inverted-file) approximate top-k: a coarse quantizer assigns
    * every corpus vector to its nearest centroid cell; each query probes
    * its `nProbe` nearest cells and ranks exactly within them. Centroids
    * here are the first `nCentroids` corpus vectors — deterministic and
    * oracle-reproducible; at real scale you'd train them with sampled
    * k-means and the plan shape is unchanged. Cost: corpus × centroids is
    * one broadcast nested pass (centroid set is tiny), cell assignment is
    * an argmax window over K rows per vector, and candidate generation is
    * an equi-join on cell id — the corpus is never self-joined. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nCentroids: Int = 16, nProbe: Int = 2): DataFrame = {
    // .limit is a no-op (vec_id unique => <= nCentroids rows) that bakes
    // the K-row bound into the plan's maxRows, so the broadcast pass is
    // PROVABLY tiny - the battery plan sweep keys on it
    val cents = corpus.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cid"), col("q").as("qc"), col("norm2").as("nc"))
      .limit(nCentroids)
    def centCos(qCol: String, nCol: String) =
      floor(lit(1000000.0) * vec_dot(col(qCol), col("qc")) /
        sqrt((col(nCol) * col("nc")).cast("double"))).cast("long")
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("_ccos").desc, col("cid").asc)
    val assign = corpus.crossJoin(broadcast(cents))
      .withColumn("_ccos", centCos("q", "norm2"))
      .withColumn("rk", row_number().over(wAssign)).filter(col("rk") === 1)
      .select(col("vec_id"), col("cid"))
    val cells = corpus.join(assign, Seq("vec_id"))
      .select(col("cid"), col("vec_id").as("neighbor_id"),
        col("q").as("qb"), col("norm2").as("nb"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("_ccos").desc, col("cid").asc)
    val probes = queries.select(col("vec_id").as("query_id"), col("q"), col("norm2"))
      .crossJoin(broadcast(cents))
      .withColumn("_ccos", centCos("q", "norm2"))
      .withColumn("rk", row_number().over(wProbe)).filter(col("rk") <= nProbe)
      .select(col("query_id"), col("cid"), col("q").as("qq"), col("norm2").as("na"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_x1e6").desc, col("neighbor_id").asc)
    cells.join(broadcast(probes), Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", vec_dot(col("qq"), col("qb")))
      .withColumn("cos_x1e6", cosX1e6)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_x1e6"))
  }

  /** Lloyd k-means over quantized vectors — the coarse-quantizer TRAINING
    * step [[ivfTopK]]'s scaladoc defers to. Deterministic end to end:
    * centroids init from the first `nCentroids` vectors by id, assignment
    * is argmax integer cosine with (cos desc, cid asc) tiebreak, and the
    * centroid update is the per-dimension floor(mean) — exact-integer
    * sums, floor of a < 2^53 double ratio — so every iteration is
    * bit-reproducible (no RNG, no float accumulation order).
    *
    * Returns the assignment after `iterations` update rounds:
    * (vec_id, cid, cos_x1e6).
    *
    * Scale: per iteration, assignment is one broadcast pass of the tiny
    * centroid set over the corpus + an argmax window partitioned by
    * vec_id, and the update is a posexplode → (cid, dim) aggregation —
    * map-side-combinable, K×dims output rows. The corpus is scanned, never
    * self-joined; lineage is truncated per round with a localCheckpoint of
    * the K-row centroid table only.
    *
    * Standard Lloyd caveat: a centroid that loses every member drops out
    * of the next round (no re-seeding) — with data-point init each
    * centroid starts with at least its own seed vector, so this only
    * occurs when a later update strands it. */
  def kmeansAssign(corpus: DataFrame, nCentroids: Int = 16,
                   iterations: Int = 1): DataFrame = {
    def withNorm(c: DataFrame): DataFrame = c.withColumn("nc", vec_norm2(col("qc")))
    // no-op K-row bound stamp (see ivfTopK): proves the broadcast side
    var cents = corpus.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cid"), col("q").as("qc"), col("norm2").as("nc"))
      .limit(nCentroids)
    def assign(c: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("cos_x1e6").desc, col("cid").asc)
      corpus.crossJoin(broadcast(c))
        .withColumn("cos_x1e6",
          floor(lit(1000000.0) * vec_dot(col("q"), col("qc")) /
            sqrt((col("norm2") * col("nc")).cast("double"))).cast("long"))
        .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select(col("vec_id"), col("cid"), col("cos_x1e6"))
    }
    (1 to iterations).foreach { _ =>
      val a = assign(cents)
      cents = withNorm(
        corpus.join(a.select(col("vec_id"), col("cid")), Seq("vec_id"))
          .select(col("cid"), posexplode(col("q")).as(Seq("dim", "x")))
          .groupBy(col("cid"), col("dim"))
          .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
          .withColumn("v", floor(col("sx").cast("double") / col("n")).cast("long"))
          .groupBy(col("cid"))
          .agg(transform(array_sort(collect_list(struct(col("dim"), col("v")))),
            s => s.getField("v")).as("qc"))
          .limit(nCentroids))
        .cutEager
        // the checkpoint erases maxRows; re-stamp the (no-op) K-row
        // bound so the next round's broadcast pass stays provably tiny
        .limit(nCentroids)
    }
    assign(cents)
  }

  /** Persist a k-means assignment as a parquet artifact — clustering is
    * TRAINED ONCE per corpus version and READ by every consumer
    * (SemDeDup scoping, IVF cell routing, stratified sampling), exactly
    * like [[ivfPqSave]] persists the PQ index. */
  def kmeansSave(assign: DataFrame, dir: String): Unit =
    assign.write.mode("overwrite").parquet(dir)

  /** Read a persisted assignment — serving never re-runs Lloyd. */
  def kmeansLoad(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Build-or-load: run [[kmeansAssign]] and [[kmeansSave]] it only when
    * the artifact for this (corpus version, K, iterations) is absent;
    * otherwise read it back. [[kmeansAssign]] is deterministic end to
    * end, so a cached artifact is byte-identical to a fresh build.
    * Probe + publish ride [[graft.sources.Artifacts]] (scheme-aware
    * `_SUCCESS` check, staged atomic rename). */
  def kmeansArtifact(spark: org.apache.spark.sql.SparkSession, corpus: DataFrame,
                     artifactDir: String, nCentroids: Int = 16,
                     iterations: Int = 1): DataFrame =
    graft.sources.Artifacts.buildOrLoad(spark, artifactDir) { staging =>
      kmeansSave(kmeansAssign(corpus, nCentroids, iterations), staging)
    }

  /** Corpus-wide k-NN JOIN: every vector's top-k neighbors, searched only
    * within its block (an IVF cell id, an LSH signature, a cluster label —
    * any coarse partition column on the quantized input). The whole-corpus
    * analog of the query-set searches above: output is O(n·k), work is
    * partition-local quadratic (Σ blockᵢ²) instead of the global n² a
    * naive self-join pays — the standard scale shape for "give every
    * document its neighbor list" (dedup clustering, diversity scoring).
    * One shuffle on the block id; block size controls the quadratic term,
    * so at 100 TB pick the coarse quantizer so blocks fit an executor. */
  def knnJoin(corpus: DataFrame, blockCol: String, k: Int): DataFrame = {
    val a = corpus.select(col(blockCol).as("_blk"), col("vec_id"),
      col("q").as("qa"), col("norm2").as("na"))
    val b = corpus.select(col(blockCol).as("_blk"), col("vec_id").as("neighbor_id"),
      col("q").as("qb"), col("norm2").as("nb"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos_x1e6").desc, col("neighbor_id").asc)
    a.join(b, Seq("_blk"))
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("dot", vec_dot(col("qa"), col("qb")))
      .withColumn("cos_x1e6", cosX1e6)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("rank"), col("neighbor_id"), col("cos_x1e6"))
  }

  /** Product-quantization encoder — the compression step of a PQ/IVF-PQ
    * ANN index: each quantized vector splits into `nSub` contiguous
    * subvectors and each subvector is replaced by the id of its nearest
    * codebook entry (exact integer squared-L2 argmin, ties to the lowest
    * code id). The codebook is data-initialized from the first `nCodes`
    * corpus vectors' subvectors — same deterministic convention as
    * [[ivfTopK]]/[[kmeansAssign]]; train it with [[kmeansAssign]] per
    * subspace at real scale, the encode plan is unchanged.
    *
    * Output is one row per (vec_id, sub, code): a 64-dim float vector
    * compresses to nSub bytes of codes, and distance queries become
    * table lookups. Cost: the corpus is scanned once, subvectors explode
    * ×nSub, the (nSub×nCodes)-row codebook broadcasts, and the argmin is
    * a window per (vec_id, sub) — no corpus self-join anywhere. */
  def pqEncode(corpus: DataFrame, nSub: Int, nCodes: Int, dims: Int): DataFrame = {
    val subs = subTable(corpus, nSub, dims)
    pqCodes(subs, pqCodebook(subs, nCodes))
  }

  /** Codebook from a sub table: the first `nCodes` vectors' subvectors. */
  private def pqCodebook(subs: DataFrame, nCodes: Int): DataFrame =
    subs.filter(col("vec_id") < nCodes)
      .select(col("vec_id").as("code"), col("sub"), col("sq").as("cq"))

  /** Nearest-code assignment per (vec_id, sub) — exact integer squared-L2
    * argmin against the broadcast codebook. */
  private def pqCodes(subs: DataFrame, codebook: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"), col("sub"))
      .orderBy(col("d2").asc, col("code").asc)
    subs.join(broadcast(codebook), Seq("sub"))
      .withColumn("d2", vec_norm2(zip_with(col("sq"), col("cq"), (a, b) => a - b)))
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("vec_id"), col("sub"), col("code"))
  }

  /** (vec_id, sub, sq): each quantized vector split into `nSub`
    * contiguous subvectors — shared by [[pqEncode]] and [[ivfPqTopK]]. */
  private def subTable(corpus: DataFrame, nSub: Int, dims: Int): DataFrame = {
    val subLen = dims / nSub
    require(subLen * nSub == dims, s"dims=$dims not divisible by nSub=$nSub")
    val subsExpr = array((0 until nSub).map(s =>
      struct(lit(s.toLong).as("sub"),
        slice(col("q"), s * subLen + 1, subLen).as("sq"))): _*)
    corpus.select(col("vec_id"), explode(subsExpr).as("e"))
      .select(col("vec_id"), col("e.sub").as("sub"), col("e.sq").as("sq"))
  }

  /** IVF-PQ approximate top-k with asymmetric distance computation — the
    * full architecture of a production ANN index, composed from the
    * pieces gated individually ([[ivfTopK]] coarse cells, [[pqEncode]]
    * codes):
    *
    *  1. corpus vectors land in coarse cells (argmax cosine against the
    *     centroid set) and are PQ-compressed to `nSub` code bytes;
    *  2. a query probes its `nProbe` nearest cells, and every candidate
    *     in them is scored from the CODES ALONE: the query precomputes a
    *     (sub, code) → dot lookup table (ADC), so a candidate's
    *     approximate dot is Σ_sub lut(sub, code) — no full vector is
    *     touched;
    *  3. the top `rerank` candidates per query by ADC are re-scored
    *     exactly against their true vectors and the top `k` emitted.
    *
    * All integer arithmetic; every cut has a total order (score desc,
    * id asc) — bit-reproducible and oracle-checkable.
    *
    * Scale shape: the LUT is queries × nSub × nCodes rows — broadcast;
    * candidate scoring joins the code table (the compressed index — the
    * only corpus-sized thing shuffled, at nSub longs per vector instead
    * of the full embedding) and aggregates nSub rows per candidate; only
    * `rerank` full vectors per query are ever read back. That read-back
    * ratio (rerank·dims vs corpus·dims) is the whole point of IVF-PQ at
    * 100 TB. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                nCentroids: Int = 16, nProbe: Int = 2,
                nSub: Int = 8, nCodes: Int = 16, dims: Int = 64,
                rerank: Int = 10): DataFrame =
    ivfPqSearch(queries, corpus,
      ivfPqBuild(corpus, nCentroids, nSub, nCodes, dims),
      k, nProbe, nSub, dims, rerank)

  /** Trained IVF-PQ index tables — everything serving needs except the
    * raw vectors read back for the final exact rerank. At 100 TB these
    * are built ONCE per corpus version and persisted ([[ivfPqSave]] /
    * [[ivfPqLoad]]); a query batch only ever reads the compressed
    * tables plus `rerank` full vectors per query. */
  final case class IvfPqIndex(cents: DataFrame, codebook: DataFrame,
                              assign: DataFrame, codes: DataFrame)

  private def centCosExpr = floor(lit(1000000.0) * vec_dot(col("q"), col("qc")) /
    sqrt((col("norm2") * col("nc")).cast("double"))).cast("long")

  /** Train the IVF-PQ index: coarse-cell assignment + PQ codebook +
    * per-vector codes. The corpus-wide subvector explode is shared by
    * the code assignment and the codebook (a second subTable call would
    * explode the corpus twice). */
  def ivfPqBuild(corpus: DataFrame, nCentroids: Int = 16, nSub: Int = 8,
                 nCodes: Int = 16, dims: Int = 64): IvfPqIndex = {
    // no-op K-row bound stamp (see ivfTopK): proves the broadcast side
    val cents = corpus.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cid"), col("q").as("qc"), col("norm2").as("nc"))
      .limit(nCentroids)
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("_ccos").desc, col("cid").asc)
    val assign = corpus.crossJoin(broadcast(cents))
      .withColumn("_ccos", centCosExpr)
      .withColumn("rk", row_number().over(wAssign)).filter(col("rk") === 1)
      .select(col("vec_id").as("neighbor_id"), col("cid"))
    val subs = subTable(corpus, nSub, dims)
    // lazy checkpoints: the four tables are consumed by up to four
    // independent actions (ivfPqSave's writes, ivfPqSearch's joins) —
    // without them each action re-derives the corpus scan, the subvector
    // explode, and the codebook aggregation from scratch
    val codebook = pqCodebook(subs, nCodes).pin
    val codes = pqCodes(subs, codebook)
      .withColumnRenamed("vec_id", "neighbor_id")
      .pin
    IvfPqIndex(cents.pin, codebook,
      assign.pin, codes)
  }

  /** Persist a trained index as four parquet tables. */
  def ivfPqSave(index: IvfPqIndex, dir: String): Unit = {
    index.cents.write.mode("overwrite").parquet(s"$dir/cents")
    index.codebook.write.mode("overwrite").parquet(s"$dir/codebook")
    index.assign.write.mode("overwrite").parquet(s"$dir/assign")
    index.codes.write.mode("overwrite").parquet(s"$dir/codes")
  }

  /** Load a persisted index — serving never re-derives the training. */
  def ivfPqLoad(spark: org.apache.spark.sql.SparkSession, dir: String): IvfPqIndex =
    IvfPqIndex(spark.read.parquet(s"$dir/cents"),
      spark.read.parquet(s"$dir/codebook"),
      spark.read.parquet(s"$dir/assign"),
      spark.read.parquet(s"$dir/codes"))

  /** Serve a query batch against a (possibly loaded) index; `corpus`
    * supplies only the full vectors for the exact rerank read-back. */
  def ivfPqSearch(queries: DataFrame, corpus: DataFrame, index: IvfPqIndex,
                  k: Int, nProbe: Int = 2, nSub: Int = 8, dims: Int = 64,
                  rerank: Int = 10): DataFrame = {
    require(rerank >= k, "rerank depth must be at least k")
    val cents = index.cents
    val codebook = index.codebook
    val assign = index.assign
    val codes = index.codes
    // per-query ADC lookup table: (query_id, sub, code) -> subvector dot
    val lut = subTable(queries, nSub, dims)
      .select(col("vec_id").as("query_id"), col("sub"), col("sq"))
      .join(broadcast(codebook), Seq("sub"))
      .select(col("query_id"), col("sub"), col("code"),
        vec_dot(col("sq"), col("cq")).as("d"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("_ccos").desc, col("cid").asc)
    val probes = queries.select(col("vec_id").as("query_id"), col("q"), col("norm2"))
      .crossJoin(broadcast(cents))
      .withColumn("_ccos", centCosExpr)
      .withColumn("rk", row_number().over(wProbe)).filter(col("rk") <= nProbe)
      .select(col("query_id"), col("cid"))
    val candidates = assign.join(broadcast(probes), Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("neighbor_id").asc)
    val shortlist = candidates.join(codes, Seq("neighbor_id"))
      .join(broadcast(lut), Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("d")).as("adc"))
      .withColumn("rk", row_number().over(wAdc)).filter(col("rk") <= rerank)
      .select(col("query_id"), col("neighbor_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_x1e6").desc, col("neighbor_id").asc)
    shortlist
      .join(corpus.select(col("vec_id").as("neighbor_id"), col("q").as("qb"),
        col("norm2").as("nb")), Seq("neighbor_id"))
      .join(broadcast(queries.select(col("vec_id").as("query_id"),
        col("q").as("qq"), col("norm2").as("na"))), Seq("query_id"))
      .withColumn("dot", vec_dot(col("qq"), col("qb")))
      .withColumn("cos_x1e6", cosX1e6)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_x1e6"))
  }

  /** LSH-bucketed approximate top-k: candidates share the query's bucket
    * (an equi-join on the signature — no cross product), then exact rank
    * within the bucket. Recall trades off against bucket count; multi-probe
    * = union over neighboring signatures. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = signLsh(queries).select(col("vec_id").as("query_id"), col("q").as("qq"),
      col("norm2").as("na"), col("sig"))
    val c = signLsh(corpus).select(col("vec_id").as("neighbor_id"), col("q").as("qc"),
      col("norm2").as("nb"), col("sig"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_x1e6").desc, col("neighbor_id").asc)
    c.join(broadcast(q), Seq("sig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", vec_dot(col("qq"), col("qc")))
      .withColumn("cos_x1e6", cosX1e6)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_x1e6"))
  }
}
