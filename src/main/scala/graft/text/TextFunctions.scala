package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale training-data pipelines:
  * tokenization, dictionary encoding, shingling, MinHash, SimHash,
  * fingerprinting, quality metrics, language ID.
  *
  * Everything is built from codegen'd `org.apache.spark.sql.functions`
  * higher-order array expressions — no UDFs — so the whole pipeline stays
  * inside whole-stage codegen and all arithmetic is exact integer math
  * (deterministic under any partitioning / summation order, which is what
  * makes the DuckDB oracles hash-match).
  */
object TextFunctions {

  /** Large Mersenne prime used by the MinHash permutations. */
  val P: Long = 2147483647L
  /** Dictionary base for packing word-id 3-grams into a shingle id. */
  val B: Int = 37
  /** MinHash permutation parameters (h_j(s) = (a_j*s + b_j) mod P). */
  val MinhashA: Seq[Long] = Seq(7L, 11L, 13L, 17L, 19L, 23L, 29L, 31L)
  val MinhashB: Seq[Long] = Seq(3L, 5L, 7L, 9L, 11L, 13L, 15L, 17L)
  /** Knuth multiplicative constant for SimHash/LSH bit mixing. */
  val Mix: Long = 2654435761L

  def tokens(text: Column): Column = split(text, " ")

  /** Deterministic word dictionary: (word, wid) with ids assigned by sort
    * rank. The global-sort row_number is the oracle-reproducible variant;
    * at 100 TB swap the id assignment for xxhash64(word) (collision-checked)
    * so no single-partition window is needed — every downstream op only
    * requires ids to be distinct and deterministic. */
  def dictionary(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(tokens(col(textCol))).as("word"))
      .distinct()
      .select(col("word"),
        row_number().over(Window.orderBy("word")).cast("long").as("wid"))

  /** (doc_id, wids): token sequence dictionary-encoded, order preserved.
    * One shuffle (groupBy doc) after a broadcast join with the dictionary. */
  def widArrays(docs: DataFrame, idCol: String, textCol: String,
                dict: DataFrame): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "word")))
      .join(broadcast(dict), "word")
      .groupBy("doc_id")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("wid")))),
        s => s.getField("wid")).as("wids"))

  /** Distinct 3-gram shingle ids from a wid array:
    * sid = ((w1*B + w2)*B + w3 — injective while the vocabulary is < B. */
  def shingleIds(wids: Column): Column =
    when(size(wids) >= 3,
      array_distinct(transform(sequence(lit(0), size(wids) - 3), i =>
        (element_at(wids, i + 1) * B + element_at(wids, i + 2)) * B +
          element_at(wids, i + 3))))
      .otherwise(array().cast("array<bigint>"))

  /** MinHash signature columns h0..h{k-1} over a shingle-id array column. */
  def minhashCols(shingles: Column): Seq[Column] =
    MinhashA.zip(MinhashB).zipWithIndex.map { case ((a, b), j) =>
      array_min(transform(shingles, s => (lit(a) * s + lit(b)) % lit(P))).as(s"h$j")
    }

  /** Even-ish chunking of `bits` into `n` (lo, width) pieces — pigeonhole
    * buckets for hamming-radius candidate generation. */
  def chunkBounds(bits: Int, n: Int): Seq[(Int, Int)] = {
    val base = bits / n
    val extra = bits % n
    val widths = (0 until n).map(i => base + (if (i < extra) 1 else 0))
    widths.scanLeft(0)(_ + _).zip(widths).map { case (lo, w) => (lo, w) }
  }

  /** Term-frequency-weighted 16-bit SimHash from (doc_id, wid, tf) rows:
    * bit k of hash(wid) contributes +tf / -tf; sign of the per-bit sum sets
    * the output bit. Pure integer math, one aggregation. */
  def simhash16(tokenTf: DataFrame): DataFrame = {
    val h = col("wid") * lit(Mix)
    val bitSums = (0 until 16).map { k =>
      sum(when(shiftright(h, k).bitwiseAND(lit(1L)) === 1L, col("tf"))
        .otherwise(-col("tf"))).as(s"s$k")
    }
    val sig = (0 until 16).map { k =>
      when(col(s"s$k") > 0, lit(1L << k)).otherwise(lit(0L))
    }.reduce(_ + _)
    tokenTf.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), sig.as("simhash"))
  }

  /** Positional fingerprint: sum over tokens of wid * (1-based position) —
    * a deterministic rolling-hash document signature. */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String,
                  dict: DataFrame): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "word")))
      .join(broadcast(dict), "word")
      .groupBy("doc_id")
      .agg(sum(col("wid") * (col("pos") + 1)).as("fingerprint"))

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
}
