package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Lineage._

/** Text-analysis building blocks for large-scale training-data pipelines:
  * tokenization, dictionary encoding, shingling, MinHash, SimHash,
  * fingerprinting, quality metrics, language ID.
  *
  * Everything is built from codegen'd `org.apache.spark.sql.functions`
  * higher-order array expressions — no UDFs — so the whole pipeline stays
  * inside whole-stage codegen and all arithmetic is exact integer math
  * (deterministic under any partitioning / summation order, which is what
  * makes the DuckDB oracles hash-match).
  *
  * Scale design: word ids are content hashes (56 bits of md5), computed
  * inline per token. There is no dictionary materialization, no dictionary
  * join, and no global window anywhere on the hot path — encoding a corpus
  * is a pure per-row map, so it parallelizes perfectly at any data size.
  * All downstream arithmetic reduces ids mod [[P]] before multiplying so
  * every intermediate stays below 2^63 (Spark runs in ANSI mode: a silent
  * wraparound would instead be a runtime error).
  */
object TextFunctions {

  /** Large Mersenne prime (2^31-1): modulus for MinHash permutations and
    * for reducing 56-bit word ids before multiplicative mixing. */
  val P: Long = 2147483647L
  /** MinHash permutation parameters (h_j(s) = (a_j*s + b_j) mod P). */
  val MinhashA: Seq[Long] = Seq(7L, 11L, 13L, 17L, 19L, 23L, 29L, 31L)
  val MinhashB: Seq[Long] = Seq(3L, 5L, 7L, 9L, 11L, 13L, 15L, 17L)
  /** Knuth multiplicative constant for SimHash/LSH/shingle bit mixing. */
  val Mix: Long = 2654435761L
  /** Second mixing constant (xxhash prime 2) — the independent chain that
    * widens shingle ids to ~62 bits. */
  val MixB: Long = 2246822519L
  /** Modulus for the positional fingerprint's reduced word id (prime, so
    * sums stay far below 2^63 for any realistic document length). */
  val FpMod: Long = 1000003L

  def tokens(text: Column): Column = split(text, " ")

  /** 56-bit content-hash word id: the first 14 hex digits of md5(word),
    * computed by the codegen'd [[graft.functions.Md5Prefix64]] kernel
    * (digest bytes → long, no hex-string round trip on the per-token hot
    * path). Deterministic across engines (DuckDB:
    * `CAST('0x'||substr(md5(w),1,14) AS BIGINT)`; equivalence pinned by
    * spec), collision probability ~n²/2^57 (≈7e-4 for a 10M-word
    * vocabulary). Downstream ops only need ids distinct + deterministic. */
  def wordId(word: Column): Column =
    graft.functions.HashFunctions.md5_prefix64(word)

  /** Deterministic word dictionary: distinct (word, wid). A reporting /
    * collision-audit surface only — the encoding pipeline computes
    * [[wordId]] inline and never joins against this. Use
    * [[assertInjective]] in tests to audit a corpus's collision-freeness. */
  def dictionary(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(tokens(col(textCol))).as("word"))
      .distinct()
      .select(col("word"), wordId(col("word")).as("wid"))

  /** True iff no two distinct words share a wid (two counts, no window). */
  def assertInjective(dict: DataFrame): Boolean =
    dict.select(col("wid")).distinct().count() == dict.count()

  /** (doc_id, wids): token sequence dictionary-encoded in place, order
    * preserved. Zero shuffles — a per-row array transform. */
  def widArrays(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
      transform(tokens(col(textCol)), w => wordId(w)).as("wids"))

  /** Non-distinct n-gram id array (one id per position). Two independent
    * mix chains ([[Mix]], [[MixB]]) over the mod-P-reduced wids are
    * combined as gid = chainA*P + chainB — a ~62-bit id,
    * collision-negligible for real corpora (replaces the round-1 base-37
    * packing that was only injective for vocabularies under 37 words).
    * All intermediates < 2^63. */
  def gramIds(wids: Column, n: Int): Column =
    when(size(wids) >= n,
      transform(sequence(lit(0), size(wids) - n), i => {
        val us = (1 to n).map(j => element_at(wids, i + j) % P)
        def chainN(m: Long) = us.reduce((a, b) => (a * m + b) % P)
        chainN(Mix) * P + chainN(MixB)
      }))
      .otherwise(array().cast("array<bigint>"))

  /** Distinct 3-gram shingle ids from a wid array (the dedup-family
    * shingle set). */
  def shingleIds(wids: Column): Column = array_distinct(gramIds(wids, 3))

  /** Per-doc repetition metrics — the Gopher-style repetition quality
    * filters (Rae et al. 2021, "Scaling Language Models", table A1):
    * the fraction of word bigrams covered by the single most frequent
    * bigram, and the fraction of trigram occurrences whose trigram
    * appears more than once in the document. High values flag boilerplate
    * and degenerate repetition for corpus filtering. Fractions are exact
    * floor(1e6 * a / b) integers; n-gram identity is the hashed ~62-bit
    * [[gramIds]] (identical hashing on the oracle side, so collisions —
    * already negligible — can never diverge the two engines).
    *
    * Scale: one shuffle per n-gram order on (doc_id, gram_id) — a
    * near-uniform composite key — then a per-doc reduce; no global
    * structure, no self-join. */
  def repetitionMetrics(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val wids = widArrays(docs, idCol, textCol)
    def gramCounts(n: Int) = wids
      .select(col("doc_id"), explode(gramIds(col("wids"), n)).as("gid"))
      .groupBy(col("doc_id"), col("gid")).agg(count(lit(1)).as("c"))
    val big = gramCounts(2).groupBy(col("doc_id")).agg(
      sum(col("c")).as("n_bigrams"), max(col("c")).as("top_bigram_n"))
    val tri = gramCounts(3).groupBy(col("doc_id")).agg(
      sum(col("c")).as("n_trigrams"),
      sum(when(col("c") >= 2, col("c")).otherwise(lit(0L))).as("dup_trigram_n"))
    docs.select(col(idCol).cast("long").as("doc_id"))
      .join(big, Seq("doc_id"), "left").join(tri, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("top_bigram_n"), lit(0L)).as("top_bigram_n"),
        floor(lit(1000000.0) * coalesce(col("top_bigram_n"), lit(0L)) /
          greatest(coalesce(col("n_bigrams"), lit(0L)), lit(1L)))
          .cast("long").as("top_bigram_frac_x1e6"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("dup_trigram_n"), lit(0L)).as("dup_trigram_n"),
        floor(lit(1000000.0) * coalesce(col("dup_trigram_n"), lit(0L)) /
          greatest(coalesce(col("n_trigrams"), lit(0L)), lit(1L)))
          .cast("long").as("dup_trigram_frac_x1e6"))
  }

  /** Bigram language-model scoring — the KenLM-perplexity quality filter
    * of CCNet-style pipelines as an exact-integer surrogate: a bigram
    * model is trained on the corpus itself (c2(w1,w2) / c1(w1) transition
    * frequencies), and each doc scores the mean transition probability of
    * its adjacent word pairs, floor-scaled to ppm. Degenerate/templated
    * text scores near 1e6 (its transitions dominate the model), natural
    * prose sits lower, and word-salad scores near zero — the
    * low-resource-safe ordering a perplexity filter sorts by. No floats:
    * per-pair p = floor(1e6·c2/c1), per-doc mean = sum div count.
    *
    * Scale shape: the model IS two aggregations of the corpus (map-side
    * combined); scoring is two equi-joins on near-uniform hashed keys
    * (pair id, word id) and one per-doc reduce. Nothing is broadcast by
    * assumption — the bigram table of a 100 TB corpus shuffles like any
    * fact-fact join. */
  def lmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val wids = widArrays(docs, idCol, textCol).pin
    def pairs = wids.select(col("doc_id"), explode(
        when(size(col("wids")) >= 2,
          transform(sequence(lit(0), size(col("wids")) - 2), i =>
            struct(element_at(col("wids"), i + 1).as("w1"),
              element_at(col("wids"), i + 2).as("w2"))))
          .otherwise(array().cast("array<struct<w1:bigint,w2:bigint>>"))).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val c2 = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val c1 = wids.select(explode(col("wids")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val perDoc = pairs
      .join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      .select(col("doc_id"),
        floor(lit(1000000.0) * col("c2") / col("c1")).cast("long").as("p"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p")).as("_s"))
    docs.select(col(idCol).cast("long").as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(expr("_s div n_bigrams"), lit(0L)).as("mean_p_x1e6"))
  }

  /** BPE-style subword vocabulary training, fully in-plan: the corpus
    * reduces to a (word, freq) vocabulary, each word becomes a space-
    * joined character sequence, and `merges` rounds each (1) census
    * adjacent symbol pairs weighted by word frequency, (2) pick the top
    * pair under the total order (count desc, pair asc), and (3) apply
    * the merge to every word. No driver-side loop state: the winning
    * pair stays a 1-row broadcast table and the merge is a string
    * `replace`, so each round is census-shuffle + broadcast-map — the
    * shape that holds when the vocabulary is billions of words.
    *
    * Merge application is bounded replace-to-fixpoint: `passes` literal
    * replaces per round. Each pass rewrites left-to-right non-
    * overlapping occurrences; occurrences blocked by a shared delimiter
    * land in a later pass. For self-overlapping runs (`a a a a` merging
    * `(a,a)`) the residue can differ from single-pass greedy BPE —
    * deterministic and engine-portable either way (the oracle applies
    * the identical algorithm), and immaterial on natural text. `passes`
    * must be at least half the longest same-symbol run; 8 covers runs
    * of 16.
    *
    * Returns the trained symbol census: (symbol, n_weighted) after all
    * merges. */
  def bpeTrain(docs: DataFrame, idCol: String, textCol: String,
               merges: Int, passes: Int = 8): DataFrame = {
    val trained = bpeVocab(docs, textCol, merges, passes)
    trained.select(col("freq"), explode(split(col("seq"), " ")).as("symbol"))
      .filter(length(col("symbol")) > 0)
      .groupBy(col("symbol")).agg(sum(col("freq")).as("n_weighted"))
  }

  /** The trained (word, freq, seq) vocabulary after `merges` BPE rounds —
    * the table [[bpeTrain]] censuses and [[bpeEncode]] applies. */
  def bpeVocab(docs: DataFrame, textCol: String,
               merges: Int, passes: Int = 8): DataFrame = {
    require(merges >= 1 && passes >= 1, "need merges >= 1 and passes >= 1")
    val vocab0 = docs.select(explode(tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      // Spark's empty-regex split keeps a trailing "" (limit -1
      // semantics) where DuckDB's string_split does not — filter it, or
      // every word contributes a phantom (lastChar, "") pair to the
      // round-1 census that the oracle engine never sees
      .select(col("word"), col("freq"),
        array_join(filter(split(col("word"), ""), s => length(s) > 0), " ")
          .as("seq"))
      .pin
    def round(v: DataFrame): DataFrame = {
      val toks = split(col("seq"), " ")
      val census = v.select(col("freq"), explode(
          when(size(toks) >= 2,
            transform(sequence(lit(0), size(toks) - 2), i =>
              struct(element_at(toks, i + 1).as("a"),
                element_at(toks, i + 2).as("b"))))
            .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("n"))
      val top = census.orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(1).select(col("a"), col("b"))
      // left join against the 1-row top table: when fewer than `merges`
      // distinct pairs exist the census dries up, replace() of a null
      // pattern is null, and coalesce keeps the sequence unchanged
      val pat = concat(lit(" "), col("a"), lit(" "), col("b"), lit(" "))
      val rep = concat(lit(" "), col("a"), col("b"), lit(" "))
      val padded = concat(lit(" "), col("seq"), lit(" "))
      val merged = (1 to passes).foldLeft(padded)((s, _) =>
        call_function("replace", s, pat, rep))
      v.join(broadcast(top), lit(true), "left")
        .select(col("word"), col("freq"),
          coalesce(trim(merged), col("seq")).as("seq"))
        .cut
    }
    (1 to merges).foldLeft(vocab0)((v, _) => round(v))
  }

  /** Apply a trained BPE vocabulary to the corpus: every document's words
    * are looked up in the merged (word → seq) table and reassembled in
    * order as subword tokens. Returns (doc_id, n_subwords,
    * encoded_text). Encoding is one equi-join on the word (the vocab is
    * NOT assumed broadcastable — a 100 TB corpus's vocabulary shuffles
    * like any dimension) plus one per-doc ordered reassembly. */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
                merges: Int, passes: Int = 8): DataFrame = {
    val vocab = bpeVocab(docs, textCol, merges, passes)
      .select(col("word"), col("seq"))
    val toksTable = docs.select(col(idCol).cast("long").as("doc_id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "word")))
      .filter(length(col("word")) > 0)
    val perDoc = toksTable.join(vocab, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(sum(size(split(col("seq"), " ")).cast("long")).as("n_subwords"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("seq")))),
          x => x("seq")), " ").as("encoded_text"))
    docs.select(col(idCol).cast("long").as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_subwords"), lit(0L)).as("n_subwords"),
        coalesce(col("encoded_text"), lit("")).as("encoded_text"))
  }

  /** Cross-document repeated-span census — the exact-substring dedup
    * signal (Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better"): every `w`-token window is hashed to a
    * [[gramIds]] two-chain id, a corpus-wide census finds windows
    * occurring in at least `minDocs` DISTINCT documents, and each doc
    * reports how many of its windows are such shared spans. High
    * fractions flag licensing/boilerplate text duplicated across pages
    * that document-level near-dup metrics dilute away (within-doc
    * repetition intentionally does not count — [[repetitionMetrics]]
    * covers that axis).
    *
    * Scale shape: one explode shuffle on the window id (near-uniform
    * key) for the census; the census is filtered to the shared tail
    * BEFORE joining back (repeated spans are a small fraction of all
    * windows — usually broadcastable), then one per-doc aggregation.
    * The window table is re-derived from the checkpointed wid table for
    * the join-back rather than cached: it is corpus-sized, and a narrow
    * re-explode is cheaper than storing it. */
  def repeatedSpans(docs: DataFrame, idCol: String, textCol: String,
                    w: Int, minDocs: Long): DataFrame = {
    require(w >= 2, "a repeated-span window needs at least 2 tokens")
    val wids = widArrays(docs, idCol, textCol).pin
    def spans = wids.select(col("doc_id"),
      explode(gramIds(col("wids"), w)).as("gid"))
    val shared = spans.groupBy(col("gid"))
      .agg(countDistinct(col("doc_id")).as("_nd"))
      .filter(col("_nd") >= minDocs)
      .select(col("gid"), lit(1L).as("_shared"))
    val perDoc = spans.join(shared, Seq("gid"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        sum(coalesce(col("_shared"), lit(0L))).as("n_shared_windows"))
    docs.select(col(idCol).cast("long").as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_shared_windows"), lit(0L)).as("n_shared_windows"),
        floor(lit(1000000.0) * coalesce(col("n_shared_windows"), lit(0L)) /
          greatest(coalesce(col("n_windows"), lit(0L)), lit(1L)))
          .cast("long").as("shared_frac_x1e6"))
  }

  /** Repeated-span REMOVAL — the transform half of [[repeatedSpans]]
    * (Lee et al. 2022 apply step): tokens covered by any w-token window
    * occurring in ≥ `minDocs` distinct documents are deleted from every
    * document, and the survivors are reassembled in order. Returns
    * (doc_id, n_tokens, n_removed, cleaned_text).
    *
    * Scale shape: the census and the hot-window filter are the same two
    * shuffles as the census op; coverage explodes w positions per hot
    * window occurrence (bounded by w × hot occurrences, not corpus
    * size); reassembly is a positional anti-join of the token table
    * against covered positions plus one per-doc ordered collect —
    * linear in tokens, where an in-row membership scan would be
    * O(tokens × covered) on a boilerplate-saturated document. */
  def removeRepeatedSpans(docs: DataFrame, idCol: String, textCol: String,
                          w: Int, minDocs: Long): DataFrame = {
    require(w >= 2, "a repeated-span window needs at least 2 tokens")
    val wids = widArrays(docs, idCol, textCol).pin
    def spans = wids.select(col("doc_id"),
      posexplode(gramIds(col("wids"), w)).as(Seq("pos0", "gid")))
    val hot = spans.groupBy(col("gid"))
      .agg(countDistinct(col("doc_id")).as("_nd"))
      .filter(col("_nd") >= minDocs)
      .select(col("gid"))
    // 1-based covered token positions per doc, deduped across
    // overlapping hot windows
    val covered = spans.join(hot, Seq("gid"))
      .select(col("doc_id"),
        explode(sequence(col("pos0") + 1, col("pos0") + w)).as("tp"))
      .distinct()
      .pin
    val nRemoved = covered.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_removed"))
    val kept = docs.select(col(idCol).cast("long").as("doc_id"),
        posexplode(tokens(col(textCol))).as(Seq("pos0", "word")))
      .select(col("doc_id"), (col("pos0") + 1).as("tp"), col("word"))
      .join(covered, Seq("doc_id", "tp"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("tp"), col("word")))),
        x => x("word")), " ").as("cleaned_text"))
    docs.select(col(idCol).cast("long").as("doc_id"),
        size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .join(nRemoved, Seq("doc_id"), "left")
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
  }

  /** Fixed-size token-window chunking with overlap — the context-window
    * preprocessing primitive (pretraining sequence packing prep, RAG
    * passage splitting): each doc becomes ceil(n/stride) chunks of up to
    * `window` tokens starting every `stride` tokens. Entirely in-row
    * (sequence + slice + posexplode) — zero shuffles, embarrassingly
    * parallel at any corpus size. */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
                  window: Int, stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      "need window >= stride >= 1 (stride > window would drop tokens)")
    val toks = tokens(col(textCol))
    docs.select(col(idCol).cast("long").as("doc_id"), toks.as("_toks"))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), size(col("_toks")) - 1, lit(stride)),
          s => slice(col("_toks"), s + 1, lit(window)))))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        size(col("col")).cast("long").as("n_chunk_tokens"),
        concat_ws(" ", col("col")).as("chunk_text"))
  }

  /** Corpus-wide boilerplate census: the `k` most widespread 3-gram
    * shingles by document frequency (shingle sets are per-doc distinct,
    * so the count IS the doc frequency), total order (n_docs desc, sid
    * asc) for a deterministic cut. The corpus-level view of what
    * [[repetitionMetrics]] measures per document — headers, disclaimers,
    * templated fragments that repeat across documents.
    *
    * Scale: one (sid) aggregation with map-side partial combine, then a
    * global top-k — Spark executes orderBy+limit as TakeOrderedAndProject
    * (per-partition heaps, no global sort materialization). */
  def gramCensus(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    widArrays(docs, idCol, textCol)
      .select(col("doc_id"), explode(shingleIds(col("wids"))).as("sid"))
      .groupBy(col("sid")).agg(count(lit(1)).as("n_docs"))
      .orderBy(col("n_docs").desc, col("sid").asc)
      .limit(k)

  /** Per-doc out-of-vocabulary rate against the corpus top-`vocabSize`
    * vocabulary — the tokenizer-prep metric that drives vocab-size and
    * coverage decisions before training a tokenizer. Vocabulary is the
    * top words by corpus term count under a total order (count desc, wid
    * asc) so the cut is deterministic; per-doc rate is the exact
    * floor(1e6 · oov / tokens) integer.
    *
    * Scale: one (wid) count aggregation, a top-k, then the corpus is
    * scanned once with the vocab broadcast into a left join — the vocab
    * is `vocabSize` rows by construction, always broadcastable. */
  def oovRate(docs: DataFrame, idCol: String, textCol: String,
              vocabSize: Int): DataFrame = {
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
        explode(tokens(col(textCol))).as("word"))
      .select(col("doc_id"), wordId(col("word")).as("wid"))
    val vocab = toks.groupBy(col("wid")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("wid").asc).limit(vocabSize)
      .select(col("wid"), lit(1L).as("_in_vocab"))
    toks.join(broadcast(vocab), Seq("wid"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("_in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate_x1e6",
        floor(lit(1000000.0) * col("n_oov") / col("n_tokens")).cast("long"))
  }

  /** Per-doc top-k terms by a log-free integer tf-idf:
    * score = floor(1e6 * tf * N / df). Monotone in tf·(N/df), so the
    * ranking matches classic tf-idf without the log damping — chosen
    * because ln() is not bit-reproducible across engines while integer
    * products are (see the repo's determinism rules). Bound: 1e6·tf·N
    * must stay < 2^53 for the double product to be exact; at corpus
    * sizes beyond ~1e9·tf, quantize idf to an integer first.
    *
    * Scale: tf is one (doc_id, wid) shuffle, df one (wid) shuffle, the
    * doc count broadcasts as a 1-row cross join, and the top-k window
    * partitions by doc_id — nothing global, nothing skewed. */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tf = termFreq(docs, idCol, textCol)
    val dfreq = tf.groupBy(col("wid")).agg(count(lit(1)).as("df"))
    val nDocs = docs.select(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf_x1e6").desc, col("wid").asc)
    tf.join(dfreq, Seq("wid"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf_x1e6",
        floor(lit(1000000.0) * col("tf") * col("n_docs") / col("df")).cast("long"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("wid"), col("tf"), col("df"),
        col("tfidf_x1e6"))
  }

  /** MinHash signature columns h0..h{k-1} over a shingle-id array column.
    * Shingle ids are reduced mod P before the affine permutation so the
    * products stay well under 2^63. */
  def minhashCols(shingles: Column): Seq[Column] =
    MinhashA.zip(MinhashB).zipWithIndex.map { case ((a, b), j) =>
      array_min(transform(shingles, s => (lit(a) * (s % P) + lit(b)) % lit(P)))
        .as(s"h$j")
    }

  /** Even-ish chunking of `bits` into `n` (lo, width) pieces — pigeonhole
    * buckets for hamming-radius candidate generation. */
  def chunkBounds(bits: Int, n: Int): Seq[(Int, Int)] = {
    val base = bits / n
    val extra = bits % n
    val widths = (0 until n).map(i => base + (if (i < extra) 1 else 0))
    widths.scanLeft(0)(_ + _).zip(widths).map { case (lo, w) => (lo, w) }
  }

  /** Sketch width for [[simhash]]. 32 bits: wide enough that pigeonhole
    * chunk buckets (3 chunks of ~11 bits for hamming ≤ 2) have ~2048
    * values each — candidate pairs stay near the true near-dup set
    * instead of the O(n²/buckets) blowup a 16-bit sketch hits once the
    * corpus outgrows 2^16. */
  val SimhashBits: Int = 32

  /** Term-frequency-weighted [[SimhashBits]]-bit SimHash from
    * (doc_id, wid, tf) rows: bit k of mix(wid) contributes +tf / -tf;
    * sign of the per-bit sum sets the output bit. Pure integer math, one
    * aggregation. */
  def simhash(tokenTf: DataFrame): DataFrame = {
    val h = col("wid") % P * lit(Mix)
    val bitSums = (0 until SimhashBits).map { k =>
      sum(when(shiftright(h, k).bitwiseAND(lit(1L)) === 1L, col("tf"))
        .otherwise(-col("tf"))).as(s"s$k")
    }
    val sig = (0 until SimhashBits).map { k =>
      when(col(s"s$k") > 0, lit(1L << k)).otherwise(lit(0L))
    }.reduce(_ + _)
    tokenTf.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), sig.as("simhash"))
  }

  /** (doc_id, wid, tf) term-frequency table, ids computed inline (one
    * shuffle on (doc_id, wid), no dictionary join). */
  def termFreq(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        explode(tokens(col(textCol))).as("word"))
      .select(col("doc_id"), wordId(col("word")).as("wid"))
      .groupBy(col("doc_id"), col("wid"))
      .agg(count(lit(1)).as("tf"))

  /** BM25 relevance scores per (doc, term) — Robertson et al.'s Okapi
    * ranking (k1 = 1.2, b = 0.75) as a log-free exact-integer surrogate,
    * the same monotone-surrogate reasoning as [[tfidfTopK]] (ln() is not
    * bit-reproducible across engines; integer ratios are):
    *
    *   idf_x1e3  = (1000·N) div df
    *   tfn_x1e6  = (10^6·44·T·tf) div (20·T·tf + 6·T + 18·len·N)
    *   bm25_x1e6 = (tfn_x1e6 · idf_x1e3) div 1000
    *
    * where T = total corpus tokens and len the doc length — the exact
    * k1/b constants multiplied through by 20·T so every step is long
    * arithmetic. Bound: 10^6·44·T·tf must stay below 2^63 — holds through
    * T·tf ≈ 2·10^11 (a ~10^11-token corpus); past that move the ratio to
    * decimal(38,0).
    *
    * Scale shape: the tf aggregation is the corpus-sized shuffle; doc
    * lengths and document frequencies are derived aggregations of it, and
    * the corpus totals ride as a 1-row broadcast. */
  def bm25Scores(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = termFreq(docs, idCol, textCol)
    val lens = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("len"))
    val dfreq = tf.groupBy(col("wid")).agg(count(lit(1)).as("df"))
    val totals = lens.agg(sum(col("len")).as("t_total"), count(lit(1)).as("n_docs"))
    tf.join(lens, Seq("doc_id")).join(dfreq, Seq("wid"))
      .crossJoin(broadcast(totals))
      .withColumn("idf_x1e3", expr("(1000 * n_docs) div df"))
      .withColumn("tfn_x1e6", expr(
        "(1000000 * 44 * t_total * tf) div " +
          "(20 * t_total * tf + 6 * t_total + 18 * len * n_docs)"))
      .withColumn("bm25_x1e6", expr("(tfn_x1e6 * idf_x1e3) div 1000"))
      .select(col("doc_id"), col("wid"), col("tf"), col("len"), col("df"),
        col("idf_x1e3"), col("bm25_x1e6"))
  }

  /** Top-k BM25 terms per document (keyword extraction under length
    * normalization — long docs no longer win on raw tf). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("bm25_x1e6").desc, col("wid").asc)
    bm25Scores(docs, idCol, textCol)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("wid"), col("tf"), col("df"),
        col("bm25_x1e6"))
  }

  /** Ranked conjunctive retrieval: documents containing ALL query terms,
    * ranked by summed BM25 — the read path the [[invertedIndex]] serves,
    * run straight off the scored term table. The query side is a literal
    * in-row membership test (no join against a query table), the
    * conjunctive filter is a count over ≤ |terms| rows per doc, and the
    * top-k is a TakeOrderedAndProject under the (score desc, doc_id)
    * total order — deterministic, never a global sort materialization. */
  def searchRanked(docs: DataFrame, idCol: String, textCol: String,
                   terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "searchRanked needs at least one query term")
    // scores carry one row per (doc, wid): a duplicated query term would
    // make the conjunctive count unreachable — dedup the query first
    val qterms = terms.distinct
    val qwids = array(qterms.map(t => wordId(lit(t))): _*)
    bm25Scores(docs, idCol, textCol)
      .filter(array_contains(qwids, col("wid")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms_hit"), sum(col("bm25_x1e6")).as("score_x1e6"))
      .filter(col("n_terms_hit") === qterms.size)
      .orderBy(col("score_x1e6").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("score_x1e6"))
  }

  /** Disjunctive tf·idf retrieval — documents containing ANY query
    * term, scored Σ_matched tf · idf_x1e3 with idf_x1e3 =
    * (1000·N) div df: the RECALL leg of a two-ranker stack (a
    * conjunctive BM25 list is precision-heavy and misses docs lacking
    * one term), built to be fused with [[searchRanked]] under
    * [[rankFusion]]. Same monotone-integer-surrogate contract as the
    * BM25 family; the top-k is a TakeOrderedAndProject. Output:
    * (doc_id, score_x1e3, n_terms_hit). */
  def searchRankedAny(docs: DataFrame, idCol: String, textCol: String,
                      terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "searchRankedAny needs at least one query term")
    val qwids = array(terms.distinct.map(t => wordId(lit(t))): _*)
    val tf = termFreq(docs, idCol, textCol)
    val dfreq = tf.groupBy(col("wid")).agg(count(lit(1)).as("df"))
    val nDocs = tf.select(col("doc_id")).distinct()
      .agg(count(lit(1)).as("n_docs"))
    tf.filter(array_contains(qwids, col("wid")))
      .join(dfreq, Seq("wid"))
      .crossJoin(broadcast(nDocs))
      .withColumn("_s", expr("tf * ((1000 * n_docs) div df)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms_hit"), sum(col("_s")).as("score_x1e3"))
      .orderBy(col("score_x1e3").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("score_x1e3"), col("n_terms_hit"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    * fuse K ranked lists into one by rank alone —
    * rrf(d) = Σ_lists 10⁶ div (k0 + rank_d) — the standard way to
    * combine retrievers whose SCORES are incomparable (BM25 sums vs
    * tf·idf vs embedding cosine) without normalization heuristics;
    * k0 = 60 is the paper's constant. Exact integers, so any engine
    * reproduces the fused order bit-for-bit.
    *
    * Inputs are (doc_id, rank) TOP-N lists — bounded by construction
    * (every ranker here ends in a LIMIT), which is what licenses the
    * single-group [[graft.operators.GlobalOrder.boundedWindow]] final
    * rank. Output: (rank, doc_id, rrf_x1e6, n_lists), top `k` under
    * (rrf desc, doc_id asc). */
  def rankFusion(lists: Seq[DataFrame], k0: Long, k: Int): DataFrame = {
    require(lists.size >= 2, "rank fusion needs at least two lists")
    require(k0 >= 1, "k0 must be positive")
    val u = lists.map(_.select(col("doc_id").cast("long").as("doc_id"),
      col("rank").cast("long").as("rank"))).reduce(_ unionByName _)
    u.withColumn("_c", expr(s"1000000 div ($k0 + rank)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("_c")).as("rrf_x1e6"), count(lit(1)).as("n_lists"))
      .orderBy(col("rrf_x1e6").desc, col("doc_id").asc)
      .limit(k)
      .withColumn("rank", row_number().over(
        graft.operators.GlobalOrder.boundedWindow(col("doc_id"),
          col("rrf_x1e6").desc, col("doc_id").asc)).cast("long"))
      .select(col("rank"), col("doc_id"), col("rrf_x1e6"), col("n_lists"))
  }

  /** Per-document Simpson concentration and its inverse (effective
    * vocabulary): λ = Σ tf·(tf−1) / (n·(n−1)) in exact ppm — the
    * probability two tokens drawn without replacement are the SAME
    * term, the log-free diversity read (Shannon entropy needs ln;
    * Simpson is a rational in the counts, so any engine reproduces
    * it). λ → 0 diverse, → 10⁶ degenerate repetition; inv_simpson_x1e3
    * = 10⁹ div λ_ppm ≈ the effective number of equally-common terms —
    * the per-doc vocabulary-collapse detector beside the Gopher
    * repetition fractions. One (doc, term) count agg, map-side
    * combinable. Docs with < 2 tokens emit NULL λ. Output: (doc_id,
    * n_tokens, n_terms, simpson_ppm, inv_simpson_x1e3). */
  def simpsonDiversity(docs: DataFrame, idCol: String,
                       textCol: String): DataFrame =
    termFreq(docs, idCol, textCol)
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        count(lit(1)).as("n_terms"),
        sum(col("tf").cast("decimal(38,0)") * (col("tf") - 1)).as("_rep"))
      .select(col("doc_id"), col("n_tokens"), col("n_terms"),
        when(col("n_tokens") < 2, lit(null).cast("long"))
          .otherwise(expr(
            "cast((_rep * 1000000) div (cast(n_tokens as decimal(38,0)) * (n_tokens - 1)) as bigint)"))
          .as("simpson_ppm"))
      .withColumn("inv_simpson_x1e3",
        when(col("simpson_ppm").isNull || col("simpson_ppm") === 0,
          lit(null).cast("long"))
          .otherwise(expr("1000000000 div simpson_ppm")))

  /** ROUGE-N between document pairs (Lin 2004): clipped n-gram overlap
    * o = Σ_gram min(tf_cand, tf_ref), recall o/ref, precision o/cand,
    * and F1 — which for shared-numerator P and R collapses EXACTLY to
    * 2o/(cand+ref), so every score is an integer ppm with no float
    * harmonic mean. The reference-based eval metric for summaries /
    * generations, and a sharper near-dup similarity than set Jaccard
    * (clipping sees repetition).
    *
    * `pairs` is any (cand_id, ref_id) candidate set — at scale the
    * LSH/blocked generators, never all pairs. Grams are the hashed
    * positional [[gramIds]]; per-pair work is one equi-join fan-out of
    * the two docs' gram tables (bounded by doc length), no windows.
    * Output: (cand_id, ref_id, n_overlap, cand_grams, ref_grams,
    * recall_ppm, precision_ppm, f1_ppm); empty-gram sides emit NULL
    * ratios. */
  def rougeN(pairs: DataFrame, docs: DataFrame, idCol: String,
             textCol: String, n: Int): DataFrame = {
    require(n >= 1 && n <= 8, "need 1 <= n <= 8")
    val tf = widArrays(docs, idCol, textCol)
      .select(col("doc_id"), explode(gramIds(col("wids"), n)).as("gid"))
      .groupBy(col("doc_id"), col("gid")).agg(count(lit(1)).as("tf"))
      .pin
    val totals = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("n_grams"))
    val p = pairs.select(col("cand_id").cast("long").as("cand_id"),
      col("ref_id").cast("long").as("ref_id"))
    val overlap = p
      .join(tf.select(col("doc_id").as("cand_id"), col("gid"),
        col("tf").as("_tc")), Seq("cand_id"))
      .join(tf.select(col("doc_id").as("ref_id"), col("gid"),
        col("tf").as("_tr")), Seq("ref_id", "gid"))
      .groupBy(col("cand_id"), col("ref_id"))
      .agg(sum(least(col("_tc"), col("_tr"))).as("n_overlap"))
    p.join(overlap, Seq("cand_id", "ref_id"), "left")
      .join(totals.select(col("doc_id").as("cand_id"),
        col("n_grams").as("cand_grams")), Seq("cand_id"), "left")
      .join(totals.select(col("doc_id").as("ref_id"),
        col("n_grams").as("ref_grams")), Seq("ref_id"), "left")
      .select(col("cand_id"), col("ref_id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        coalesce(col("cand_grams"), lit(0L)).as("cand_grams"),
        coalesce(col("ref_grams"), lit(0L)).as("ref_grams"))
      .withColumn("recall_ppm", when(col("ref_grams") === 0,
          lit(null).cast("long"))
        .otherwise(expr("(n_overlap * 1000000) div ref_grams")))
      .withColumn("precision_ppm", when(col("cand_grams") === 0,
          lit(null).cast("long"))
        .otherwise(expr("(n_overlap * 1000000) div cand_grams")))
      .withColumn("f1_ppm", when(col("cand_grams") + col("ref_grams") === 0,
          lit(null).cast("long"))
        .otherwise(expr("(2 * n_overlap * 1000000) div (cand_grams + ref_grams)")))
  }

  /** Positional fingerprint: sum over tokens of (wid mod [[FpMod]]) *
    * (1-based position) — a deterministic rolling-hash document signature.
    * Computed entirely in-row (no explode, no shuffle). */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val terms = transform(tokens(col(textCol)),
      (w, i) => wordId(w) % FpMod * (i.cast("long") + 1L))
    docs.select(col(idCol).cast("long").as("doc_id"),
      aggregate(terms, lit(0L), (acc, x) => acc + x).as("fingerprint"))
  }

  /** Quality metrics: token/char/distinct counts, stopword ratio as an
    * exact floor(1e6 * ratio) integer score. */
  def qualityMetrics(docs: DataFrame, idCol: String, textCol: String,
                     stopwords: Seq[String]): DataFrame = {
    val toks = tokens(col(textCol))
    val stopArr = array(stopwords.map(lit): _*)
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      length(col(textCol)).cast("long").as("n_chars"),
      size(array_distinct(toks)).cast("long").as("n_distinct_tokens"),
      size(filter(toks, t => array_contains(stopArr, t))).cast("long").as("n_stopwords"))
      .withColumn("stopword_score_x1e6",
        floor(lit(1000000.0) * col("n_stopwords") / col("n_tokens")).cast("long"))
  }

  /** Composite document-quality filter in the Gopher-rules shape (Rae et
    * al. 2021, "Scaling Language Models" appendix A — public): hard
    * keep/drop from cheap per-document statistics. The signals that vary
    * on a whitespace-tokenized corpus: word count bounds, mean word
    * length bounds, distinct-token ratio floor (repetition proxy), and a
    * minimum stopword hit count (gibberish proxy).
    *
    * All ratios are exact floor(1e6 * x / y) integers and every signal is
    * a per-row expression over the token array — a pure scan-side map
    * with zero shuffles, so the filter runs at parquet-read speed at any
    * corpus size and Catalyst can push `keep` into a scan predicate when
    * the caller filters on it. */
  def qualityFilter(docs: DataFrame, idCol: String, textCol: String,
                    stopwords: Seq[String],
                    minWords: Long = 30L, maxWords: Long = 1000L,
                    minMeanLenX1e6: Long = 2000000L, maxMeanLenX1e6: Long = 8000000L,
                    minDistinctX1e6: Long = 300000L,
                    minStopwords: Long = 1L): DataFrame = {
    val toks = tokens(col(textCol))
    val stopArr = array(stopwords.map(lit): _*)
    val nWords = size(toks).cast("long")
    // mean word length without a per-token aggregate: the text is
    // single-space separated, so total word chars = chars - (n-1) spaces
    val wordChars = (length(col(textCol)).cast("long") - nWords + 1L)
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      nWords.as("n_words"),
      floor(lit(1000000.0) * wordChars / nWords).cast("long").as("mean_word_len_x1e6"),
      floor(lit(1000000.0) * size(array_distinct(toks)) / nWords).cast("long")
        .as("distinct_ratio_x1e6"),
      size(filter(toks, t => array_contains(stopArr, t))).cast("long").as("n_stopwords"))
      .withColumn("keep",
        col("n_words").between(minWords, maxWords) &&
        col("mean_word_len_x1e6").between(minMeanLenX1e6, maxMeanLenX1e6) &&
        col("distinct_ratio_x1e6") >= minDistinctX1e6 &&
        col("n_stopwords") >= minStopwords)
  }

  /** Marker-based language ID: count marker-word hits per candidate
    * language, argmax with (count desc, lang asc) tiebreak, 'unknown' when
    * nothing matches. The n-gram-profile analog at vocabulary level. */
  def langId(docs: DataFrame, idCol: String, textCol: String,
             markers: Map[String, Seq[String]]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val markerDf = markers.toSeq.flatMap { case (l, ws) => ws.map(w => (l, w)) }
      .toDF("lang", "word")
    val hits = docs
      .select(col(idCol).cast("long").as("doc_id"),
        explode(tokens(col(textCol))).as("word"))
      .join(broadcast(markerDf), "word")
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("n").desc, col("lang").asc)
    val best = hits.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("doc_id"), col("lang"))
    docs.select(col(idCol).cast("long").as("doc_id"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("lang"), lit("unknown")).as("pred_lang"))
  }

  /** PII patterns for [[scrubPii]]: deliberately simple expressions that
    * parse identically under Java regex (Spark) and RE2 (DuckDB oracle) —
    * no backrefs, no lookaround. Emails must be scrubbed FIRST: their
    * local/domain parts contain digits and dots that the IP/number
    * patterns would otherwise half-match. */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val LongNumRe = "\\b\\d{9,}\\b"

  /** Redact emails, IPv4 addresses, and long digit runs (account/phone
    * numbers) with typed placeholder tokens — the pre-training scrub pass
    * run before any text leaves the curation pipeline. Pure per-row
    * codegen'd regexp chain: no shuffle, no UDF, scales linearly. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      LongNumRe, "<NUM>")

  /** Per-row PII hit counts (reported alongside the scrub so a pipeline
    * can quarantine PII-dense documents instead of just redacting them). */
  def piiCounts(text: Column): Seq[Column] = Seq(
    size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("long").as("n_email"),
    size(regexp_extract_all(regexp_replace(text, EmailRe, "<EMAIL>"),
      lit(Ipv4Re), lit(0))).cast("long").as("n_ip"),
    size(regexp_extract_all(
      regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), Ipv4Re, "<IP>"),
      lit(LongNumRe), lit(0))).cast("long").as("n_num"))

  /** Line-level dedup (the CCNet/RefinedWeb pass): drop every line whose
    * content occurs in at least `maxDocFreq` distinct documents — nav
    * bars, cookie banners, boilerplate footers — and reassemble each
    * document from its surviving lines in order. Line identity is the
    * 56-bit md5 content hash ([[wordId]] kernel), computed inline.
    *
    * Output: (doc_id, kept_text, n_lines, n_kept); documents losing every
    * line stay present with kept_text = '' so the corpus row count is
    * stable for downstream joins.
    *
    * Scale shape: one (lid) doc-frequency aggregation (map-side partial
    * combine over a near-uniform hash key), then a left-ANTI join of the
    * line table against only the HOT lines (df >= threshold) — the
    * boilerplate set is tiny by construction, so AQE turns the anti join
    * into a broadcast; the full line-frequency table is never joined.
    * Reassembly is one groupBy(doc_id) with an in-row sort — no global
    * order anywhere. */
  def lineDedup(docs: DataFrame, idCol: String, textCol: String,
                delim: String, maxDocFreq: Long): DataFrame = {
    require(maxDocFreq >= 2, "maxDocFreq < 2 would drop every non-unique line")
    // delim is a LITERAL separator: split() takes a regex, so quote it —
    // an unquoted "|" or "." would split between every character
    val delimRe = java.util.regex.Pattern.quote(delim)
    val lines = docs.select(col(idCol).cast("long").as("doc_id"),
        posexplode(split(col(textCol), delimRe)).as(Seq("pos", "line")))
      .withColumn("lid", wordId(col("line")))
    val hot = lines.select(col("lid"), col("doc_id")).distinct()
      .groupBy(col("lid")).agg(count(lit(1)).as("line_df"))
      .filter(col("line_df") >= maxDocFreq)
      .select(col("lid"))
    val kept = lines.join(hot, Seq("lid"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(concat_ws(delim,
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            s => s("line"))).as("kept_text"),
        count(lit(1)).as("n_kept"))
    docs.select(col(idCol).cast("long").as("doc_id"),
        size(split(col(textCol), delimRe)).cast("long").as("n_lines"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("kept_text"), lit("")).as("kept_text"),
        col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** URL pattern for [[extractUrls]]: one character class for domain and
    * path so there is no capture group to disagree over — parses the same
    * under Java regex (Spark) and RE2 (DuckDB). */
  val UrlRe = "https?://[a-z0-9./_-]+"

  /** All URLs in a text column (full matches, document order). */
  def extractUrls(text: Column): Column =
    regexp_extract_all(text, lit(UrlRe), lit(0))

  /** URL canonicalization — the pre-crawl/pre-fetch dedup key: strip the
    * fragment, lowercase scheme+host (path case preserved), remove
    * tracking parameters (utm_*, fbclid, gclid — up to three
    * consecutive, bounded like the BPE replace-to-fixpoint), and drop a
    * trailing slash. Pure per-row regexp chain (codegen'd, zero
    * shuffles); every regex is RE2-safe so the oracle engine runs the
    * identical chain. Deliberately conservative: no default-port or
    * percent-encoding normalization (document those as out of scope
    * rather than half-normalize). */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    // (?i): an uppercase scheme ("HTTP://...") must still anchor, or the
    // prefix extract returns "" and the whole URL escapes lowercasing
    val prefix = regexp_extract(noFrag, "^((?i)https?://[^/?#]+)", 1)
    val lowered = concat(lower(prefix),
      noFrag.substr(length(prefix) + 1, length(noFrag)))
    val track = "(?:utm_[a-z]+|fbclid|gclid)=[^&#]*"
    val midStripped = (1 to 3).foldLeft(lowered)((u, _) =>
      regexp_replace(u, s"([?&])$track&", "$1"))
    val tailStripped = regexp_replace(midStripped, s"[?&]$track$$", "")
    regexp_replace(tailStripped, "/$", "")
  }

  /** Registrable domain of a URL (the host part before the first '/'). */
  def urlDomain(url: Column): Column =
    regexp_extract(url, "https?://([a-z0-9.-]+)", 1)

  /** Per-domain census over a corpus: URL mentions and distinct citing
    * documents per domain — the link-graph profile (domain allow/deny
    * listing, source weighting) a web-corpus pipeline starts from.
    * Extraction is per-row codegen'd regexp; the census is one (domain)
    * aggregation with map-side combine. */
  def domainCensus(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        explode(extractUrls(col(textCol))).as("url"))
      .select(col("doc_id"), urlDomain(col("url")).as("domain"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("doc_id")).as("n_docs"))

  /** Feature hashing (the hashing trick, Weinberger et al. 2009): each
    * token maps to dimension `md5₅₆(token) mod dims` with a ±1 sign from
    * an independent hash, occurrences sum per (doc, dim) — unbiased
    * fixed-width bag-of-words features with NO vocabulary pass, the
    * dictionary-free vectorizer linear models and dedup-sketch inputs
    * want at corpus scale. Exactly-canceled dimensions (weight 0) are
    * dropped: the sparse triple contract is "absent = 0".
    *
    * One explode + one map-side-combinable agg; both hashes are the
    * codegen'd [[graft.functions.Md5Prefix64]] kernel. Output:
    * (doc_id, dim, weight) triples. */
  def featureHash(docs: DataFrame, idCol: String, textCol: String,
                  dims: Int): DataFrame = {
    require(dims >= 2 && dims <= (1 << 24), "need 2 <= dims <= 2^24")
    import graft.functions.HashFunctions.md5_prefix64
    docs.select(col(idCol).cast("long").as("doc_id"),
        explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("doc_id"),
        (md5_prefix64(col("tok")) % dims).as("dim"),
        when(md5_prefix64(concat(lit("s:"), col("tok"))) % 2 === 0, 1L)
          .otherwise(-1L).as("s"))
      .groupBy(col("doc_id"), col("dim"))
      .agg(sum(col("s")).as("weight"))
      .filter(col("weight") =!= 0)
  }

  /** RAKE keyword extraction (Rose, Engel, Cramer & Cowley 2010):
    * candidate phrases are maximal stopword-free token runs; each
    * word's score is degree/frequency (degree = Σ lengths of the
    * phrases it appears in — co-occurrence credit), a phrase scores the
    * sum of its words, and the corpus's top-k phrases come out. All
    * ratios are ×1e6 integer div — engine-exact.
    *
    * Phrase runs are the classic gaps-and-islands
    * (pos − row_number over content tokens), fully relational — no
    * per-row recursion; word stats are corpus-global aggs over the
    * phrase-token table; the final top-k is one TakeOrderedAndProject
    * under the total order (score desc, phrase asc). Output:
    * (phrase, n_occurrences, n_words, score_x1e6). */
  def rakeKeywords(docs: DataFrame, idCol: String, textCol: String,
                   stopwords: Seq[String], topK: Int): DataFrame = {
    require(topK >= 1 && stopwords.nonEmpty, "need topK >= 1 and stopwords")
    val toks = docs
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
      .filter(col("tok") =!= "")
      .select(col("doc_id"), col("pos"), lower(col("tok")).as("w"))
    val content = toks.filter(!col("w").isInCollection(stopwords))
    val wIsland = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val runs = content
      .withColumn("island", col("pos") - row_number().over(wIsland))
      .pin
    val wPhrase = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"), col("island"))
    val phraseToks = runs.withColumn("plen", count(lit(1)).over(wPhrase))
    val wordStats = phraseToks.groupBy(col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("degree"))
      .withColumn("wscore", expr("degree * 1000000 div freq"))
    val phrases = phraseToks
      .join(wordStats.select(col("w"), col("wscore")), Seq("w"))
      .groupBy(col("doc_id"), col("island"))
      .agg(
        concat_ws(" ", transform(array_sort(collect_list(
          struct(col("pos"), col("w")))), x => x.getField("w"))).as("phrase"),
        count(lit(1)).as("n_words"),
        sum(col("wscore")).as("score_x1e6"))
    phrases.groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occurrences"), max(col("n_words")).as("n_words"),
        max(col("score_x1e6")).as("score_x1e6"))
      .orderBy(col("score_x1e6").desc, col("phrase"))
      .limit(topK)
  }

  /** Content-defined chunking at word granularity (the rolling-hash cut
    * rule of LBFS/rsync applied to token streams): a chunk boundary
    * falls after any word where the rolling hash of the last 4 word
    * hashes is ≡ 0 (mod `cutMod`) — so chunk boundaries move WITH the
    * content, and an insertion early in a document re-chunks only its
    * neighborhood instead of shifting every downstream chunk the way
    * fixed-width windows do. THE substring-level dedup primitive:
    * identical passages yield identical chunk signatures wherever they
    * sit.
    *
    * The rolling hash is a positional closed form over 4 shared-sort
    * lag terms (the [[graft.operators.Analytics.ewmaHalf]] idiom) — one
    * window pass, no per-row recursion; chunk ids are a running cut-flag
    * sum; signatures are md5-prefix56 of the chunk's words. Output: one
    * row per (doc_id, chunk_idx) with n_words and sig. */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
                cutMod: Int = 8): DataFrame = {
    require(cutMod >= 2 && cutMod <= 4096, "need 2 <= cutMod <= 4096")
    import graft.functions.HashFunctions.md5_prefix64
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
      .filter(col("tok") =!= "")
      .withColumn("wh", md5_prefix64(col("tok")) % 256)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val rolling = (0 until 4)
      .map(j => coalesce(lag(col("wh"), j).over(w), lit(0L)) *
        lit(1L << (8 * j)))
      .reduce(_ + _)
    val flagged = toks
      .withColumn("cut", (rolling % cutMod === 0).cast("long"))
      .withColumn("chunk_idx",
        coalesce(sum(col("cut")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    flagged.groupBy(col("doc_id"), col("chunk_idx"))
      .agg(count(lit(1)).as("n_words"),
        concat_ws(" ", transform(array_sort(collect_list(
          struct(col("pos"), col("tok")))), x => x.getField("tok"))).as("_c"))
      .select(col("doc_id"), col("chunk_idx"), col("n_words"),
        md5_prefix64(col("_c")).as("sig"))
  }

  /** Sequence packing: assign token chunks to fixed-capacity bins the
    * way a pretraining pipeline packs documents into context windows —
    * concatenate the stream in a deterministic order and split every
    * `targetTokens` tokens. Each chunk gets `bin = floor(tokens_before /
    * target)` from a running sum over its stream; a chunk straddling a
    * boundary stays in the bin it started in (the overflow shrinks the
    * next bin — split-on-write semantics, matching concat-then-slice
    * packing up to chunk granularity).
    *
    * One shuffle on the stream column. At 100 TB the stream key must be
    * finer than "language" (a window over one giant partition is the
    * round-1 dictionary mistake): packing only needs SOME deterministic
    * local order, so salt the stream (e.g. lang + doc_id bucket) and
    * pack each salt shard independently — bins never cross shards. */
  def packSequences(chunks: DataFrame, streamCol: String, orderCols: Seq[String],
                    tokenCol: String, targetTokens: Long): DataFrame = {
    require(targetTokens >= 1, "targetTokens must be positive")
    require((streamCol +: tokenCol +: orderCols).forall(chunks.columns.contains),
      "packSequences stream/order/token columns must exist on the input")
    require(!chunks.columns.contains("bin") && !chunks.columns.contains("_before"),
      "packSequences reserves the bin/_before column names; rename the inputs")
    val w = Window.partitionBy(col(streamCol))
      .orderBy(orderCols.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    chunks.withColumn("_before", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("bin", floor(col("_before") / targetTokens).cast("long"))
      .drop("_before")
  }

  /** Exact per-group discrete percentiles of an integer column: for each
    * requested p, the smallest value whose 1-based rank reaches
    * ceil(p * group_count) — SQL `percentile_disc` semantics, written out
    * as window arithmetic so the oracle can replicate it bit-for-bit
    * (different engines disagree on quantile index conventions).
    *
    * The length-threshold selection step of a curation pipeline (pick the
    * p99 cutoff per language, then filter). Cost: one shuffle on the group
    * key serving both windows (rank + count reuse the same exchange).
    * Exact percentiles inherently sort each group; at 100 TB run this on
    * the (group, value) projection only — the two-column sort is cheap
    * next to the corpus scan — or switch to approx_percentile when the
    * threshold doesn't need to be exact. */
  def groupPercentilesDisc(df: DataFrame, groupCol: String, valueCol: String,
                           ps: Seq[(String, Double)]): DataFrame = {
    val byGroup = Window.partitionBy(col(groupCol))
    val ranked = df.select(col(groupCol), col(valueCol))
      .withColumn("_rn", row_number().over(byGroup.orderBy(col(valueCol))))
      .withColumn("_n", count(lit(1)).over(byGroup))
    val aggs = count(lit(1)).as("n_rows") +: ps.map { case (name, p) =>
      min(when(col("_rn") >= ceil(lit(p) * col("_n")), col(valueCol))).as(name)
    }
    ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Winsorization — the outlier APPLY step pairing with
    * [[groupOutliers]]/[[groupPercentilesDisc]]: clamp each value into
    * its group's [pLow, pHigh] percentile band (Tukey's trimming without
    * dropping rows — the length-normalization a metrics pipeline runs
    * before averaging heavy-tailed per-doc statistics).
    *
    * The cutoffs come from the one-shuffle exact-percentile window
    * ([[groupPercentilesDisc]]), broadcast back as a groups-sized table;
    * the clamp itself is a per-row greatest/least — the data is scanned
    * once for cutoffs and once for the apply, with no second shuffle. */
  def winsorize(df: DataFrame, idCol: String, groupCol: String, valueCol: String,
                pLow: Double, pHigh: Double): DataFrame = {
    require(pLow > 0.0 && pHigh < 1.0 && pLow < pHigh,
      "winsorize needs 0 < pLow < pHigh < 1")
    val cuts = groupPercentilesDisc(df.select(col(groupCol), col(valueCol)),
      groupCol, valueCol, Seq("_lo" -> pLow, "_hi" -> pHigh))
    df.select(col(idCol).cast("long").as(idCol), col(groupCol), col(valueCol))
      .join(broadcast(cuts.select(col(groupCol), col("_lo"), col("_hi"))),
        Seq(groupCol))
      .withColumn("winsorized",
        greatest(col("_lo"), least(col("_hi"), col(valueCol))))
      .select(col(idCol), col(groupCol), col(valueCol), col("winsorized"),
        (col("winsorized") =!= col(valueCol)).as("clamped"))
  }

  /** Inverted index over a corpus: term → document frequency + the
    * sorted posting list of citing doc ids (comma-joined — a string
    * column hashes identically everywhere; switch to the array form when
    * feeding a search layer). Terms outside [minDf, maxDf] are dropped:
    * hapax noise below, stop-terms above — the same hot-set reasoning as
    * [[lineDedup]], and what keeps any single posting list bounded.
    *
    * Scale shape: one distinct on (term, doc), one (term) aggregation
    * with map-side combine; the in-row sort is per-term. Posting lists
    * for terms near maxDf dominate — pick maxDf from the tolerable list
    * size, or shard wide terms by `doc_id mod s` into (term, shard)
    * rows. */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    minDf: Long, maxDf: Long): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        explode(tokens(col(textCol))).as("word"))
      .distinct()
      .groupBy(col("word"))
      .agg(count(lit(1)).as("df"),
        concat_ws(",",
          transform(array_sort(collect_list(col("doc_id"))),
            d => d.cast("string"))).as("postings"))
      .filter(col("df").between(minDf, maxDf))

  /** Collocation mining: adjacent word pairs ranked by a log-free PMI
    * surrogate, lift = P(a,b) / (P(a)·P(b)) over the bigram table —
    * reported as the exact integer floor(1000 · c_ab · T / (c_a· · c_·b))
    * where c_a· / c_·b are the pair counts with that word first / second
    * and T the total bigram count (same monotone-surrogate reasoning as
    * [[tfidfTopK]]: ln() is not bit-reproducible across engines, integer
    * products are). `minCount` floors the pair support (PMI is noisy on
    * rare pairs); top-`k` under a (lift desc, wa, wb) total order.
    *
    * Bound: 1000·c_ab·T < 2^63 holds through T ≈ 3e9 bigrams; past that
    * drop the 1000 scale or move the ratio to decimal(38,0).
    *
    * Scale shape: one (wa, wb) count with map-side combine, two derived
    * margin aggregations, a 1-row broadcast total, TakeOrderedAndProject
    * for the cut — no self-join, nothing quadratic. */
  def collocations(docs: DataFrame, idCol: String, textCol: String,
                   minCount: Long, k: Int): DataFrame = {
    val toks = tokens(col(textCol))
    // pairs feeds FOUR consumers (both margins, the total, the final
    // join) — materialize the corpus-wide bigram aggregation once instead
    // of re-running the explode+shuffle per consumer
    val pairs = docs.select(explode(
        when(size(toks) >= 2,
          transform(sequence(lit(0), size(toks) - 2), i =>
            struct(element_at(toks, i + 1).as("wa"),
              element_at(toks, i + 2).as("wb"))))
          .otherwise(array().cast("array<struct<wa:string,wb:string>>"))).as("p"))
      .select(col("p.wa").as("wa"), col("p.wb").as("wb"))
      .groupBy(col("wa"), col("wb")).agg(count(lit(1)).as("n_pair"))
      .pin
    val ca = pairs.groupBy(col("wa")).agg(sum(col("n_pair")).as("n_first"))
    val cb = pairs.groupBy(col("wb")).agg(sum(col("n_pair")).as("n_second"))
    val total = pairs.agg(sum(col("n_pair")).as("n_total"))
    pairs.filter(col("n_pair") >= minCount)
      .join(ca, Seq("wa")).join(cb, Seq("wb"))
      .crossJoin(broadcast(total))
      .withColumn("lift_x1e3",
        expr("(1000 * n_pair * n_total) div (n_first * n_second)"))
      .select(col("wa"), col("wb"), col("n_pair"), col("n_first"),
        col("n_second"), col("lift_x1e3"))
      .orderBy(col("lift_x1e3").desc, col("wa").asc, col("wb").asc)
      .limit(k)
  }

  /** Backoff LM coverage census (the stupid-backoff shape — Brants et
    * al. 2007, "Large Language Models in Machine Translation"): for
    * every test token at position ≥ 3, the highest model level that
    * covers it — trigram context seen in training, else bigram, else
    * unigram (word in vocab), else OOV. CCNet-style perplexity
    * filtering reads this census next to the score: a slice scoring at
    * unigram strength is noise no matter how good its number looks.
    * Counts are exact; the 0.4^k backoff WEIGHTS are the consumer's
    * (irrational products don't survive engine round-trips).
    *
    * Scale shape: the three models are DISTINCT hashed-id sets (one
    * aggregation each over the training corpus); scoring is one
    * position explode + three equi-joins on those ids + a per-doc
    * count — no vocabulary broadcast assumed, no UDFs.
    * Output: (doc_id, n_scored, n_tri, n_bi, n_uni, n_oov) per TEST
    * doc; docs under 3 tokens score zero everywhere. */
  def backoffCoverage(train: DataFrame, test: DataFrame,
                      idCol: String, textCol: String): DataFrame = {
    val trainW = widArrays(train, idCol, textCol).pin
    val tri = trainW.select(explode(gramIds(col("wids"), 3)).as("tid")).distinct()
    val bi = trainW.select(explode(gramIds(col("wids"), 2)).as("bid")).distinct()
    val uni = trainW.select(explode(col("wids")).as("uid")).distinct()
    val testW = widArrays(test, idCol, textCol)
      .withColumn("tids", gramIds(col("wids"), 3))
      .withColumn("bids", gramIds(col("wids"), 2))
    val pos = testW.select(col("doc_id"), explode(
        when(size(col("wids")) >= 3,
          transform(sequence(lit(2), size(col("wids")) - 1), i =>
            struct(element_at(col("tids"), i - 1).as("tid"),
              element_at(col("bids"), i).as("bid"),
              element_at(col("wids"), i + 1).as("uid"))))
          .otherwise(array().cast("array<struct<tid:bigint,bid:bigint,uid:bigint>>")))
        .as("t"))
      .select(col("doc_id"), col("t.tid").as("tid"), col("t.bid").as("bid"),
        col("t.uid").as("uid"))
    val leveled = pos
      .join(tri.withColumn("_t", lit(1)), Seq("tid"), "left")
      .join(bi.withColumn("_b", lit(1)), Seq("bid"), "left")
      .join(uni.withColumn("_u", lit(1)), Seq("uid"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_scored"),
        sum(when(col("_t") === 1, 1L).otherwise(0L)).as("n_tri"),
        sum(when(col("_t").isNull && col("_b") === 1, 1L).otherwise(0L)).as("n_bi"),
        sum(when(col("_t").isNull && col("_b").isNull && col("_u") === 1, 1L)
          .otherwise(0L)).as("n_uni"),
        sum(when(col("_t").isNull && col("_b").isNull && col("_u").isNull, 1L)
          .otherwise(0L)).as("n_oov"))
    test.select(col(idCol).cast("long").as("doc_id"))
      .join(leveled, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_scored"), lit(0L)).as("n_scored"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        coalesce(col("n_bi"), lit(0L)).as("n_bi"),
        coalesce(col("n_uni"), lit(0L)).as("n_uni"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"))
  }

  /** Windowed co-occurrence PMI matrix — the word-embedding prep step
    * (Church & Hanks 1990 pointwise mutual information; Levy & Goldberg
    * 2014: SGNS implicitly factorizes the shifted PMI matrix, so this
    * table IS the classical stand-in for word2vec training data).
    * Unordered token pairs within `window` positions of each other,
    * margins and total taken over the pair table itself, association
    * emitted as the exact scaled ratio
    * `pmi_ratio_x1e6 = n_pair·N·10⁶ div (n_a·n_b)` — the log is the
    * consumer's (ratio > 1e6 ⟺ PMI > 0). [[collocations]] is the
    * adjacent-only lift variant; this is the windowed matrix.
    *
    * Scale shape: the pair explode is O(tokens·window) rows into ONE
    * map-side-combinable count; margins reuse the aggregated pair
    * table (explode of 2 per pair row), the total is a 1-row
    * broadcast. Top-k under a total order bounds the output. The pair
    * build zips the token array against its d-shifted self per
    * distance d — linear work; an element_at(i)/element_at(j) nested
    * enumeration re-evaluates the split per access and goes quadratic
    * (measured 23s → 2s at sf0.1 on this rewrite). */
  def cooccurrencePmi(docs: DataFrame, idCol: String, textCol: String,
                      window: Int, minPair: Long, k: Int): DataFrame = {
    require(window >= 1 && window <= 16, "need 1 <= window <= 16")
    val t = col("_t")
    val pairs = docs.select(tokens(col(textCol)).as("_t"))
      .select(explode(
        when(size(t) >= 2,
          flatten(transform(sequence(lit(1), least(lit(window), size(t) - 1)), d =>
            zip_with(slice(t, lit(1), size(t) - d), slice(t, d + 1, size(t) - d),
              (x, y) => struct(least(x, y).as("wa"), greatest(x, y).as("wb"))))))
          .otherwise(array().cast("array<struct<wa:string,wb:string>>"))).as("p"))
      .select(col("p.wa").as("wa"), col("p.wb").as("wb"))
      .groupBy(col("wa"), col("wb")).agg(count(lit(1)).as("n_pair"))
      .pin
    val margins = pairs.select(explode(array(col("wa"), col("wb"))).as("w"),
        col("n_pair"))
      .groupBy(col("w")).agg(sum(col("n_pair")).as("n_w"))
    val total = pairs.agg(sum(col("n_pair")).as("n_total"))
    pairs.filter(col("n_pair") >= minPair)
      .join(margins.select(col("w").as("wa"), col("n_w").as("n_a")), Seq("wa"))
      .join(margins.select(col("w").as("wb"), col("n_w").as("n_b")), Seq("wb"))
      .crossJoin(broadcast(total))
      .withColumn("pmi_ratio_x1e6",
        expr("(1000000 * n_pair * n_total) div (n_a * n_b)"))
      .select(col("wa"), col("wb"), col("n_pair"), col("pmi_ratio_x1e6"))
      .orderBy(col("pmi_ratio_x1e6").desc, col("wa").asc, col("wb").asc)
      .limit(k)
  }

  /** Per-group z-score outlier flags without a single inexact operation:
    * |x − μ| > z·σ  ⟺  (n·x − S₁)² > z²·(n·S₂ − S₁²), with S₁ = Σx,
    * S₂ = Σx² — the whole test cross-multiplied into integer arithmetic
    * (decimal(38,0), exact in Spark and as HUGEINT in the oracle), so
    * the flag can never drift on summation order the way a float
    * stddev_pop would. The curation use: flag documents whose length is
    * pathological for their language before the percentile cutoffs are
    * fitted.
    *
    * Scale shape: one (group) moment aggregation (map-side combine),
    * broadcast back over the corpus scan — two passes over the column,
    * no window, no sort. */
  def groupOutliers(df: DataFrame, idCol: String, groupCol: String,
                    valueCol: String, z: Int): DataFrame = {
    val dec = "decimal(38,0)"
    val v = col(valueCol).cast(dec)
    val stats = df.groupBy(col(groupCol)).agg(
      count(lit(1)).cast(dec).as("_n"),
      sum(v).as("_s1"),
      sum(v * v).as("_s2"))
    df.select(col(idCol).cast("long").as(idCol), col(groupCol), col(valueCol))
      .join(broadcast(stats), Seq(groupCol))
      .withColumn("is_outlier", {
        val dev = col("_n") * col(valueCol).cast(dec) - col("_s1")
        dev * dev > lit(z.toLong * z).cast(dec) *
          (col("_n") * col("_s2") - col("_s1") * col("_s1"))
      })
      .select(col(idCol), col(groupCol), col(valueCol), col("is_outlier"))
  }

  /** Exact per-group INTERPOLATED percentiles (`percentile_cont`
    * semantics): with the group sorted 1..n, the p-quantile sits at
    * h = p·(n−1) + 1; the result linearly interpolates between the values
    * at ranks ⌊h⌋ and ⌊h⌋+1, reported as floor(1e6 · value). Written as
    * the same one-shuffle window arithmetic as [[groupPercentilesDisc]]
    * (built-in quantile functions disagree across engines on index
    * conventions; spelling the formula out makes both engines compute the
    * identical IEEE expression — multiply/add/floor are all
    * correctly-rounded, so the integers can't drift).
    *
    * Same scale note as the discrete variant: run on the (group, value)
    * projection; switch to approx_percentile when the cutoff needn't be
    * exact. */
  def groupPercentilesCont(df: DataFrame, groupCol: String, valueCol: String,
                           ps: Seq[(String, Double)]): DataFrame = {
    val byGroup = Window.partitionBy(col(groupCol))
    val ranked = df.select(col(groupCol), col(valueCol).cast("double").as("_v"))
      .withColumn("_rn", row_number().over(byGroup.orderBy(col("_v"))))
      .withColumn("_n", count(lit(1)).over(byGroup))
    val aggs = count(lit(1)).as("n_rows") +: ps.map { case (name, p) =>
      val h = lit(p) * (col("_n") - 1) + 1
      val lo = floor(h)
      val vLo = min(when(col("_rn") === lo, col("_v")))
      val vHi = min(when(col("_rn") === lo + 1, col("_v")))
      floor(lit(1000000.0) *
        (vLo + (max(h) - max(lo)) * (coalesce(vHi, vLo) - vLo)))
        .cast("long").as(name)
    }
    ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Sparse tf-idf document-pair similarity via the inverted index —
    * the postings-join ("DISCO" / Elsayed et al. 2008) alternative to
    * the dense-embedding paths in `similarity/Similarity`: dot products
    * decompose over terms, so pairs materialize ONLY through shared
    * terms, never a doc×doc join.
    *
    * Input is a generic (doc_id, term, tf) table — words, shingles,
    * hashed features, whatever the caller indexes. Weights are the
    * exact-integer tf·idf surrogate `tf · ((100·N) div df)`
    * ([[tfidfTopK]]'s reasoning). `dfCap` is THE scale knob: a term in
    * df docs contributes df² candidate pairs, so hot terms (df > dfCap)
    * are dropped from the index — the standard stop-postings prune;
    * they carry ~zero idf weight anyway. Per-pair dots then
    * length-normalize WITHOUT sqrt: cos² in ppm =
    * (dot²·10^6) div (Σw_a²·Σw_b²), exact in decimal(38,0) with the
    * remainder-subtract division (bound: dot < ~10^16, documented, far
    * above the dfCap'd weights here).
    *
    * Output: top-k pairs (doc_a, doc_b, dot, cos2_ppm) under the total
    * order (cos2_ppm desc, doc_a, doc_b). */
  def cosinePostingsTopK(termTf: DataFrame, dfCap: Long, k: Int): DataFrame = {
    val tf = termTf.select(col("doc_id"), col("term"), col("tf").cast("long").as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap)
    val nDocs = tf.select(countDistinct(col("doc_id")).as("n_docs"))
    // materialize the weighted postings ONCE: the self-join and the norm
    // aggregation would otherwise each re-run the tf/df subtree (4 scans
    // of the corpus in the physical plan); at 100 TB this is the persisted
    // postings table the index serves from
    val wts = tf.join(dfreq, Seq("term")).crossJoin(broadcast(nDocs))
      .select(col("term"), col("doc_id"),
        expr("tf * ((100 * n_docs) div df)").as("w"))
      .cut
    val norms = wts.groupBy(col("doc_id"))
      .agg(sum(col("w") * col("w")).as("n2"))
    val dots = wts.as("x").join(wts.as("y"),
        col("x.term") === col("y.term") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(sum(col("x.w") * col("y.w")).as("dot"))
    dots
      .join(norms.select(col("doc_id").as("doc_a"), col("n2").as("na")), Seq("doc_a"))
      .join(norms.select(col("doc_id").as("doc_b"), col("n2").as("nb")), Seq("doc_b"))
      .withColumn("num", expr("cast(dot as decimal(38,0)) * dot * 1000000"))
      .withColumn("den", expr("cast(na as decimal(38,0)) * nb"))
      .select(col("doc_a"), col("doc_b"), col("dot"),
        // integral decimal division in ONE operator: `div` on decimals
        // IS floor-toward-zero of the exact quotient (both operands
        // non-negative here), value-identical to the remainder-subtract
        // form but one BigDecimal op per candidate pair instead of three
        expr("cast(num div den as bigint)").as("cos2_ppm"))
      .orderBy(col("cos2_ppm").desc, col("doc_a").asc, col("doc_b").asc)
      .limit(k)
  }

  /** Heaps-law vocabulary growth curve: distinct-vocabulary size at 10%,
    * 20%, … 100% of the corpus under a DETERMINISTIC hash order of the
    * documents — "is the vocabulary saturating or still growing", the
    * measure-don't-guess input to tokenizer-vocab sizing and
    * more-data-vs-more-epochs decisions. A random order would make the
    * curve a property of the shuffle; the [[wordId]]-style hash order
    * makes it a property of the corpus.
    *
    * Input is a generic (doc_id, term) occurrence table WITH repetition
    * (a "token" here = one term occurrence — words, shingles, subwords).
    * One global rank over |docs| rows — distributed via
    * [[graft.operators.GlobalOrder]]'s range-partitioned two-pass
    * prefix-sum, so even 10^10 doc ids never funnel through one sort
    * task (the TOKENS never sort at all) — one min-rank agg per term
    * (first occurrence), then both curves read off with a 10-row
    * broadcast threshold join. Output: (decile, n_docs, n_tokens,
    * vocab), cumulative. */
  def vocabGrowth(docTerms: DataFrame): DataFrame = {
    val spark = docTerms.sparkSession
    import spark.implicits._
    // skew-safe: rank key `h` is a 64-bit hash of the per-doc id (one
    // row per doc after the groupBy) — hash-uniform, no value can
    // concentrate a bucket
    val perDoc = graft.operators.GlobalOrder.rank(
      docTerms
        .groupBy(col("doc_id").cast("long").as("doc_id"))
        .agg(count(lit(1)).as("toks"))
        .withColumn("h", wordId(concat(lit("vg:"), col("doc_id").cast("string")))),
      col("h"), Seq(col("doc_id").asc), "rank")
      .cut
    val nDocs = perDoc.agg(count(lit(1)).as("n"))
    val deciles = (1 to 10).toDF("decile")
      .crossJoin(broadcast(nDocs))
      .select(col("decile").cast("long").as("decile"),
        expr("(n * decile) div 10").as("cutoff"))
    val firstSeen = docTerms
      .select(col("doc_id").cast("long").as("doc_id"), col("term"))
      .join(perDoc.select(col("doc_id"), col("rank")), Seq("doc_id"))
      .groupBy(col("term")).agg(min(col("rank")).as("first_rank"))
    val vocab = firstSeen.crossJoin(broadcast(deciles))
      .filter(col("first_rank") <= col("cutoff"))
      .groupBy(col("decile")).agg(count(lit(1)).as("vocab"))
    val mass = perDoc.crossJoin(broadcast(deciles))
      .filter(col("rank") <= col("cutoff"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
    mass.join(vocab, Seq("decile"), "left")
      .select(col("decile"), col("n_docs"), col("n_tokens"),
        coalesce(col("vocab"), lit(0L)).as("vocab"))
  }

  /** Good–Turing frequency-of-frequencies diagnostic (Good 1953; the
    * unsmoothed simple estimator of Gale & Sampson 1995): N_r = the
    * number of distinct terms occurring exactly r times, the smoothed
    * expected count r* = (r+1)·N_{r+1}/N_r as an exact ×10⁶ integer,
    * and each count class's share of corpus mass in ppm. The singleton
    * row (r = 1) IS the unseen-mass estimate — mass_ppm at r = 1 is
    * Good–Turing's p₀·10⁶, the standard "how much of the distribution
    * has this corpus not seen yet" coverage read-out that decides
    * more-data-vs-more-epochs alongside [[vocabGrowth]]'s curve.
    *
    * Classes where N_{r+1} = 0 emit NULL r* (the raw estimator is
    * undefined there; smoothing choices belong to the caller, and a
    * fake 0 would read as "vanishing mass"). Shape: one term-count agg,
    * one frequency-of-frequencies agg (|distinct counts| rows — the
    * windowless census the whole estimator runs on), one broadcast
    * total; decimal(38,0) intermediates so 10¹⁰-term vocabularies
    * cannot wrap. Output: (r, n_r, r_star_x1e6, mass_ppm), r ≤ maxR. */
  def goodTuring(docTerms: DataFrame, maxR: Int): DataFrame = {
    require(maxR >= 1, "maxR must be positive")
    val ff = docTerms.groupBy(col("term")).agg(count(lit(1)).as("r"))
      .groupBy(col("r")).agg(count(lit(1)).as("n_r"))
      .pin
    val tot = ff.agg(sum(col("r").cast("decimal(38,0)") * col("n_r"))
      .as("n_tok"))
    ff.filter(col("r") <= maxR)
      .join(ff.select((col("r") - 1).as("r"), col("n_r").as("_n_r1")),
        Seq("r"), "left")
      .crossJoin(broadcast(tot))
      .select(col("r"), col("n_r"),
        when(col("_n_r1").isNull, lit(null).cast("long"))
          .otherwise(expr(
            "cast(((r + 1) * cast(_n_r1 as decimal(38,0)) * 1000000) div n_r as bigint)"))
          .as("r_star_x1e6"),
        expr("cast((r * cast(n_r as decimal(38,0)) * 1000000) div n_tok as bigint)")
          .as("mass_ppm"))
  }

  /** Pairwise set overlap between groups of terms — Jaccard of the
    * DISTINCT term sets of each (source, corpus slice, epoch): "how much
    * does source A's content overlap source B's", the corpus-composition
    * sibling of [[graft.text.Sketches.kmvSetOps]] when groups are few
    * enough for the exact answer.
    *
    * One distinct collapse, then a postings-style self-join on the term
    * (per-term fan-out ≤ |groups|², never |docs|²) and one count per
    * pair. Pairs sharing nothing are absent (their Jaccard is 0).
    * Output: (g_a, g_b, n_a, n_b, n_shared, jaccard_ppm), g_a < g_b. */
  def setOverlapPairs(groupTerms: DataFrame): DataFrame = {
    val gt = groupTerms.select(col("g"), col("term")).distinct()
    val sizes = gt.groupBy(col("g")).agg(count(lit(1)).as("sz"))
    val inter = gt.as("x").join(gt.as("y"),
        col("x.term") === col("y.term") && col("x.g") < col("y.g"))
      .groupBy(col("x.g").as("g_a"), col("y.g").as("g_b"))
      .agg(count(lit(1)).as("n_shared"))
    inter
      .join(broadcast(sizes.select(col("g").as("g_a"), col("sz").as("n_a"))), Seq("g_a"))
      .join(broadcast(sizes.select(col("g").as("g_b"), col("sz").as("n_b"))), Seq("g_b"))
      .select(col("g_a"), col("g_b"), col("n_a"), col("n_b"), col("n_shared"),
        expr("(n_shared * 1000000) div (n_a + n_b - n_shared)").as("jaccard_ppm"))
  }

  /** Linear text-classifier inference — the fastText/DCLM-style quality
    * filter applied at corpus scale: every token hashes into a `dims`-
    * sized weight table and the document margin is the plain sum
    * `Σ w[h(token)]`. The weight table here is a deterministic
    * hash-derived stand-in (`((h·Knuth) mod 2001) − 1000`, uniform on
    * [−1000, 1000]) so the oracle reproduces it bit-for-bit; swap
    * `weightOf` for a broadcast-joined trained table and the plan shape
    * is identical — one explode, one combinable sum, zero shuffles
    * beyond the per-doc reduce, the margin monotone in the real model's
    * logit so thresholding semantics carry over. Output: (doc_id,
    * n_tokens, margin, keep). */
  def linearClassifierScore(docs: DataFrame, idCol: String, textCol: String,
                            dims: Int, threshold: Long): DataFrame = {
    require(dims >= 2 && dims <= (1 << 24), "need 2 <= dims <= 2^24")
    val h = pmod(wordId(col("tok")), lit(dims.toLong))
    val weight = pmod(h * lit(Mix), lit(2001L)) - lit(1000L)
    docs.select(col(idCol).cast("long").as("doc_id"),
        explode(tokens(col(textCol))).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("doc_id"), weight.as("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("w")).as("margin"))
      .withColumn("keep", col("margin") > threshold)
  }

  /** Trigram-accelerated substring search (the pg_trgm shape): a
    * `LIKE '%pattern%'` over 100 TB of text must not scan every
    * document — candidates come from the conjunctive intersection of
    * the pattern's character trigrams against the per-doc trigram set
    * (an equi-joinable inverted index at scale; computed inline here),
    * and only candidates pay the exact `instr` verify. A document
    * missing ANY pattern trigram cannot contain the pattern, so the
    * prune is lossless. Patterns shorter than 3 chars have no trigram
    * to prune on — rejected loudly rather than silently scanning.
    * Output: (doc_id, pos) — 1-based first occurrence, matches only. */
  def trigramSearch(docs: DataFrame, idCol: String, textCol: String,
                    pattern: String): DataFrame = {
    require(pattern.length >= 3,
      "trigramSearch needs a pattern of at least 3 chars (no trigram to prune on)")
    val pats = pattern.sliding(3).toSeq.distinct
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("t"))
    val cand = base
      .select(col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(1, greatest(length(t) - 2, 0)), " +
          "i -> substr(t, i, 3)))")).as("tri"))
      .filter(col("tri").isin(pats: _*))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("nt"))
      .filter(col("nt") === pats.size)
    base.join(cand.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), instr(col("t"), pattern).cast("long").as("pos"))
      .filter(col("pos") > 0)
  }

  /** Greedy maximum-coverage selection: pick `k` documents one at a
    * time, each maximizing the count of terms no earlier pick covers —
    * the classic (1 − 1/e)-approximate diverse-subset selection
    * (Nemhauser et al. 1978; facility-location data pruning picks
    * training subsets exactly this way). Ties break to the smallest
    * doc id.
    *
    * k driver rounds, each one anti-join of the term table against the
    * covered set + one combinable count + a 1-row argmax — the covered
    * set grows by one doc's terms per round and rides as a checkpointed
    * table, so round cost is O(|docTerms|) scans with the anti-join's
    * pushable hash lookup, never O(k·|docs|²). Output one row per
    * round: (round, doc_id, n_new, n_covered). */
  def greedyCoverage(docTerms: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, "need 1 <= k <= 1000 greedy rounds")
    val dt = docTerms
      .select(col("doc_id").cast("long").as("doc_id"), col("term"))
      .distinct().cut
    var covered = dt.select(col("term")).limit(0).cut
    var total = 0L
    val picks = Seq.newBuilder[(Long, Long, Long, Long)]
    var r = 1
    var exhausted = false
    while (r <= k && !exhausted) {
      val best = dt.join(covered, Seq("term"), "left_anti")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        .agg(max(struct(col("n"), (-col("doc_id")).as("nid"))).as("m"))
        .select(col("m.n").as("n"), (-col("m.nid")).as("doc_id"))
        .collect()
      if (best.isEmpty || best.head.isNullAt(0)) exhausted = true
      else {
        val (n, id) = (best.head.getLong(0), best.head.getLong(1))
        total += n
        picks += ((r.toLong, id, n, total))
        covered = covered.unionByName(
          dt.filter(col("doc_id") === id).select(col("term"))).cut
        r += 1
      }
    }
    val spark = docTerms.sparkSession
    import spark.implicits._
    picks.result().toDF("round", "doc_id", "n_new", "n_covered")
  }

  /** Per-document n-gram novelty under the deterministic hash order of
    * [[vocabGrowth]]: the fraction of a document's DISTINCT terms that
    * no earlier-ranked document contains — the marginal-contribution
    * signal dedup prioritization ranks by (a doc whose shingles are all
    * already covered adds nothing; Lee et al. 2022's dedup-improves-LMs
    * argument, measured per document).
    *
    * One global doc rank (ids only, distributed via
    * [[graft.operators.GlobalOrder]] — no single-partition sort), one
    * min-rank agg per term, one join-back + per-doc reduce. A term first seen at rank r counts as
    * novel for the rank-r document ONLY. Output: (doc_id, rank,
    * n_terms, n_novel, novelty_ppm). */
  def ngramNovelty(docTerms: DataFrame): DataFrame = {
    val dt = docTerms
      .select(col("doc_id").cast("long").as("doc_id"), col("term"))
      .distinct()
    // skew-safe: rank key `h` is a 64-bit hash of the distinct doc id —
    // hash-uniform, no value can concentrate a bucket
    val ranked = graft.operators.GlobalOrder.rank(
      dt.select(col("doc_id")).distinct()
        .withColumn("h", wordId(concat(lit("nv:"), col("doc_id").cast("string")))),
      col("h"), Seq(col("doc_id").asc), "rank")
      .drop("h").cut
    val withRank = dt.join(ranked, Seq("doc_id"))
    val firstSeen = withRank.groupBy(col("term"))
      .agg(min(col("rank")).as("fr"))
    withRank.join(firstSeen, Seq("term"))
      .groupBy(col("doc_id"), col("rank"))
      .agg(count(lit(1)).as("n_terms"),
        sum(when(col("fr") === col("rank"), 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("rank"), col("n_terms"), col("n_novel"),
        expr("(n_novel * 1000000) div n_terms").as("novelty_ppm"))
  }

  /** Zipf rank–frequency diagnostic: the top-k terms with their rank and
    * the rank·frequency product — flat products ≈ Zipfian corpus, a
    * product collapsing at low ranks flags boilerplate domination (the
    * scalar twin of [[vocabGrowth]]'s curve; Zipf 1949). Input is a
    * (doc_id, term) occurrence table with repetition.
    *
    * One corpus count shuffle, then TakeOrderedAndProject keeps k rows
    * before the single-partition rank window ever runs — the window
    * touches k rows, not the vocabulary. Total order (freq desc, term
    * asc) makes ranks deterministic. Output: (rank, term, freq,
    * rank_x_freq). */
  def zipfRanks(docTerms: DataFrame, k: Int): DataFrame = {
    val counts = docTerms.groupBy(col("term")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("term").asc).limit(k)
    counts
      .withColumn("rank", row_number().over(
        graft.operators.GlobalOrder.boundedWindow(col("freq"),
          col("freq").desc, col("term").asc)).cast("long"))
      .select(col("rank"), col("term"), col("freq"),
        (col("rank") * col("freq")).as("rank_x_freq"))
  }
}
