package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata; decode / feature-extraction runs
  * as a batched per-partition pass (the Scala analog of a Pandas UDF over
  * `mapInPandas`).
  *
  * The actual media decode is STUBBED — this container has no image/audio
  * libraries — with a deterministic fake that derives "decoded" metadata
  * from the raw bytes. The Spark-side plumbing is real: binary column
  * handling, typed Dataset schema, partition-batched execution, and the
  * feature schema a real decoder would emit.
  */
object Multimodal {

  /** A media row: opaque payload + source metadata. */
  final case class MediaRecord(media_id: Long, payload: Array[Byte], source: String)

  /** Features a decoder would emit (dimensions, first-byte magic,
    * checksum). */
  final case class MediaFeatures(media_id: Long, n_bytes: Long, fake_width: Long,
                                 fake_height: Long, first_byte: Long, checksum: Long)

  /** DECODE STUB: deterministic fake decoder over raw bytes. A real
    * implementation would JNI/subprocess into an image library here; the
    * signature — bytes in, features out, executed per partition batch —
    * is the real contract. */
  def decodeStub(payload: Array[Byte]): MediaFeatures = {
    val n = payload.length.toLong
    var checksum = 0L
    var i = 0
    while (i < payload.length) { checksum += payload(i) & 0xffL; i += 1 }
    MediaFeatures(
      media_id = -1L, // filled by caller
      n_bytes = n,
      fake_width = n % 640 + 1,
      fake_height = n / 7 % 480 + 1,
      first_byte = if (payload.isEmpty) -1L else (payload(0) & 0xffL),
      checksum = checksum % 65536L)
  }

  /** Batched decode pass: one iterator per partition (amortizes any
    * per-batch decoder init, exactly like mapInPandas batches). */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would happen here
      it.map(r => decodeStub(r.payload).copy(media_id = r.media_id))
    }
  }

  /** Lift a text table into media records (payload = utf-8 bytes) — the
    * test harness for the binary plumbing. */
  def fromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long").as("media_id"),
        col("text").cast("binary").as("payload"),
        col("source"))
      .as[MediaRecord]
  }
}
