package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.Lineage._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata; decode / feature-extraction runs
  * as a batched per-partition pass (the Scala analog of a Pandas UDF over
  * `mapInPandas`).
  *
  * Image decoding is a real pure-JVM container-header parse — PNG / GIF /
  * BMP / JPEG dimensions read straight from the payload bytes, no external
  * library. Full pixel decode (and audio/video) would plug a codec into
  * the same bytes-in/features-out contract; payloads no header parser
  * recognizes fall back to a deterministic byte-derived stub so the
  * pipeline shape stays total.
  */
object Multimodal {

  /** A media row: opaque payload + source metadata. */
  final case class MediaRecord(media_id: Long, payload: Array[Byte], source: String)

  /** Decoded features: container format (or "stub"), dimensions (header
    * truth for recognized formats, byte-derived fake otherwise),
    * first-byte magic, checksum. */
  final case class MediaFeatures(media_id: Long, n_bytes: Long, format: String,
                                 fake_width: Long, fake_height: Long,
                                 first_byte: Long, checksum: Long)

  private def u8(b: Byte): Int = b & 0xff
  private def be16(p: Array[Byte], i: Int): Long = (u8(p(i)) << 8 | u8(p(i + 1))).toLong
  private def be32(p: Array[Byte], i: Int): Long =
    (u8(p(i)).toLong << 24) | (u8(p(i + 1)) << 16) | (u8(p(i + 2)) << 8) | u8(p(i + 3))
  private def le16(p: Array[Byte], i: Int): Long = (u8(p(i + 1)) << 8 | u8(p(i))).toLong
  private def le32(p: Array[Byte], i: Int): Long =
    (u8(p(i + 3)).toLong << 24) | (u8(p(i + 2)) << 16) | (u8(p(i + 1)) << 8) | u8(p(i))

  /** Parse (format, width, height) from a real image container header:
    * PNG IHDR (big-endian at offset 16/20), GIF logical screen
    * (little-endian at 6/8), BMP BITMAPINFOHEADER (little-endian at
    * 18/22), JPEG SOF0/1/2 marker scan. None if no signature matches. */
  def decodeImageHeader(p: Array[Byte]): Option[(String, Long, Long)] = {
    if (p.length >= 24 && u8(p(0)) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G')
      Some(("png", be32(p, 16), be32(p, 20)))
    else if (p.length >= 10 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F')
      Some(("gif", le16(p, 6), le16(p, 8)))
    else if (p.length >= 26 && p(0) == 'B' && p(1) == 'M')
      Some(("bmp", le32(p, 18), math.abs(le32(p, 22).toInt).toLong))
    else if (p.length >= 4 && u8(p(0)) == 0xff && u8(p(1)) == 0xd8) {
      // JPEG: walk the marker segments to the first start-of-frame
      var i = 2
      while (i + 9 < p.length) {
        if (u8(p(i)) != 0xff) return None // desynced — not a valid stream
        val marker = u8(p(i + 1))
        if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2)
          return Some(("jpeg", be16(p, i + 7), be16(p, i + 5)))
        if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) i += 2 // bare markers
        else i += 2 + be16(p, i + 2).toInt // segment length includes itself
      }
      None
    } else None
  }

  /** Decode one payload: real header parse when a signature matches, the
    * deterministic byte-derived stub otherwise. Bytes in, features out,
    * executed per partition batch — the contract a pixel-level codec
    * would plug into. */
  def decode(payload: Array[Byte]): MediaFeatures = {
    val n = payload.length.toLong
    var checksum = 0L
    var i = 0
    while (i < payload.length) { checksum += payload(i) & 0xffL; i += 1 }
    val (format, w, h) = decodeImageHeader(payload)
      .getOrElse(("stub", n % 640 + 1, n / 7 % 480 + 1))
    MediaFeatures(
      media_id = -1L, // filled by caller
      n_bytes = n,
      format = format,
      fake_width = w,
      fake_height = h,
      first_byte = if (payload.isEmpty) -1L else (payload(0) & 0xffL),
      checksum = checksum % 65536L)
  }

  /** Batched decode pass: one iterator per partition (amortizes any
    * per-batch decoder init, exactly like mapInPandas batches). */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would happen here
      it.map(r => decode(r.payload).copy(media_id = r.media_id))
    }
  }

  /** One sampled "frame" of a media payload. */
  final case class Frame(media_id: Long, frame_idx: Int, payload: Array[Byte])

  /** Frame-sampling plumbing: fixed-size byte windows stand in for
    * decoded video frames (no codecs in this sandbox); every `stride`-th
    * window is kept. The contract is the real one — one media row fans
    * out to many frame rows, executed as a per-partition iterator pass
    * (mapInPandas batch shape) — only the frame extraction itself is the
    * deterministic stand-in a real demuxer would replace. */
  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int,
                   stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be positive")
    media.mapPartitions { it =>
      it.flatMap { r =>
        r.payload.grouped(frameBytes).zipWithIndex.collect {
          case (chunk, i) if i % stride == 0 => Frame(r.media_id, i, chunk)
        }
      }
    }
  }

  /** Resize plumbing: deterministic byte decimation (keep every
    * `factor`-th byte) standing in for image resampling — binary in,
    * binary out, same per-partition execution shape a real resizer
    * plugs into. */
  def resizeStub(payload: Array[Byte], factor: Int): Array[Byte] = {
    require(factor > 0, "factor must be positive")
    val out = new Array[Byte]((payload.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = payload(i * factor); i += 1 }
    out
  }

  /** Batched resize pass over media records. */
  def resizeAll(media: Dataset[MediaRecord], factor: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r => r.copy(payload = resizeStub(r.payload, factor))))
  }

  /** 32-bit average-hash perceptual signature over a (string-typed)
    * payload: 32 evenly-strided sample bytes, each emitting a 1 bit iff
    * it exceeds the sample mean (compared as byte·32 > Σ — no division),
    * folded MSB-first. The aHash construction real image-dedup pipelines
    * run on decoded luma grids, applied here to the payload bytes the
    * sandbox stands in for pixels; swapping a pixel decoder in front
    * changes nothing downstream. Pure per-row array expressions, zero
    * shuffle.
    *
    * The byte array and its sum are LET-BOUND as single-element-array
    * lambda variables: Catalyst performs no common-subexpression
    * elimination across higher-order-function lambdas, so naively
    * referencing `total` inside the per-bit lambda re-evaluates the
    * 32-substring aggregate per BIT (~1000 substr calls per row — a
    * measured 30× slowdown of the whole pairing pass). */
  def aHash32(payload: Column): Column = {
    val stride = greatest(floor(length(payload) / 32).cast("int"), lit(1))
    val bytes = transform(sequence(lit(0), lit(31)),
      j => ascii(payload.substr(lit(1) + j * stride, lit(1))).cast("long"))
    element_at(transform(array(bytes), bs =>
      element_at(transform(array(aggregate(bs, lit(0L), (a, x) => a + x)), t =>
        aggregate(
          transform(bs, b => when(b * 32L > t, lit(1L)).otherwise(lit(0L))),
          lit(0L), (a, b) => a * 2L + b)), 1)), 1)
  }

  /** Perceptual near-duplicate pairs: payloads whose [[aHash32]] differ
    * in at most `k` bits. Candidates come from pigeonhole chunk buckets
    * (k+1 chunks of the 32-bit hash — a pair within hamming k MUST agree
    * on at least one whole chunk), so the corpus is never self-joined:
    * one equi-join per chunk on (chunk id, chunk value), distinct, then
    * the exact popcount filter. Same scale shape as the SimHash pass. */
  def phashPairs(df: DataFrame, idCol: String, payloadCol: String,
                 k: Int): DataFrame = {
    require(k >= 0 && k < 32, "hamming radius must be in [0, 32)")
    require(df.schema(payloadCol).dataType ==
      org.apache.spark.sql.types.StringType,
      s"phashPairs samples string payloads; cast $payloadCol to string first")
    // materialize the sketches once: both sides of the self-join (and the
    // join-key non-null constraint filter) would otherwise re-evaluate
    // the full hash expression against their own corpus scan
    val sigs = df.select(col(idCol).cast("long").as("id"),
        aHash32(col(payloadCol)).as("phash"))
      .pin
    val chunks = graft.text.TextFunctions.chunkBounds(32, k + 1)
    val keyed = sigs.select(col("id"), col("phash"),
      posexplode(array(chunks.map { case (lo, w) =>
        shiftright(col("phash"), lo).bitwiseAND(lit((1L << w) - 1))
      }: _*)).as(Seq("chunk", "ckey")))
    val cand = keyed.as("x").join(keyed.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.ckey") === col("y.ckey") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("doc_a"), col("y.id").as("doc_b"),
        col("x.phash").as("ha"), col("y.phash").as("hb"))
      .distinct()
    cand.select(col("doc_a"), col("doc_b"),
        expr("bit_count(ha ^ hb)").cast("long").as("hamming"))
      .filter(col("hamming") <= k)
  }

  /** Lift a text table into media records (payload = utf-8 bytes) — the
    * test harness for the binary plumbing. */
  final case class AudioFeatures(media_id: Long, n_samples: Long, sum_abs: Long,
                                 n_sign_changes: Long, peak_abs: Long)

  /** Audio feature extraction over opaque payloads: the payload is read
    * as centered 8-bit PCM (sample = unsigned byte − 96 — the
    * deterministic STUB standing in for a real codec, like
    * [[decodeImageHeader]]'s fake dims; a production build swaps the
    * sample decode and keeps this plumbing). Per clip: sample count,
    * Σ|s| (energy surrogate), sign changes (zero-crossing rate
    * numerator — the classic voiced/unvoiced discriminator), peak.
    * All exact integers; one mapPartitions pass over the bytes (the
    * right tool here — this is byte slicing, not Column algebra). */
  def audioFeatures(media: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.map { m =>
      var n = 0L; var sumAbs = 0L; var changes = 0L; var peak = 0L
      var prevNonNeg = true; var first = true
      m.payload.foreach { b =>
        val s = (b & 0xff) - 96
        n += 1
        val a = math.abs(s).toLong
        sumAbs += a
        if (a > peak) peak = a
        val nonNeg = s >= 0
        if (!first && nonNeg != prevNonNeg) changes += 1
        prevNonNeg = nonNeg
        first = false
      }
      AudioFeatures(m.media_id, n, sumAbs, changes, peak)
    }
  }

  /** ViT-style patch plan over opaque byte payloads: for each media row
    * the (patch_idx, offset, len) grid that a patch-embedding stage
    * would read — the partitioning/plumbing half of image tokenization
    * (the decode itself stays a stub per the repo's multimodal
    * contract). The last patch is short when the payload length is not
    * a multiple of `patchBytes`; empty payloads produce no patches.
    * Pure in-row sequence explode — no shuffle, linear scan. Output:
    * (doc_id, patch_idx, byte_offset, len). */
  def patchPlan(media: DataFrame, idCol: String, lenCol: String,
                patchBytes: Int): DataFrame = {
    require(patchBytes >= 1, "patchBytes must be positive")
    media.select(col(idCol).cast("long").as("doc_id"),
        col(lenCol).cast("long").as("_n"))
      .filter(col("_n") > 0)
      .select(col("doc_id"), col("_n"),
        explode(expr(s"sequence(0L, (_n - 1) div $patchBytes)")).as("patch_idx"))
      .select(col("doc_id"), col("patch_idx"),
        (col("patch_idx") * patchBytes).as("byte_offset"),
        least(lit(patchBytes.toLong), col("_n") - col("patch_idx") * patchBytes)
          .as("len"))
  }

  def fromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long").as("media_id"),
        col("text").cast("binary").as("payload"),
        col("source"))
      .as[MediaRecord]
  }
}
