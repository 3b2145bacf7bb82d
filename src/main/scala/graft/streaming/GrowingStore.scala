package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** On-disk, append-only per-micro-batch state for the self-growing
  * streaming dedup sinks — the persisted-artifact form of what r15 kept
  * as `pinEager`'d in-memory frames.
  *
  * Layout: `dir/epoch=<E>/batch=<N>/` parquet, one hive-style partition
  * per (query lifetime, micro-batch). Three properties the in-memory
  * fold lacked:
  *
  *  - '''O(batch) folds.''' A micro-batch WRITES only its own rows —
  *    no `unionByName + dropDuplicates` shuffle over the accumulated
  *    state, no fresh full-copy pin. Dedup of replay duplicates is
  *    deferred to probe/read time, where the probe's candidate and
  *    pair-key dedups (batch-proportional) already absorb them.
  *  - '''Replay idempotence by construction.''' A replayed batchId
  *    lands on the SAME partition dir and overwrites it byte-identically
  *    (staged write + atomic rename, the [[graft.sources.Artifacts]]
  *    protocol), so at-least-once delivery needs no transactional sink.
  *    A crash between the pair write and the signature write is also
  *    safe: the replay either probes an index without the batch (normal
  *    shape) or one that already holds it (the overlap shape
  *    [[graft.dedup.Dedup.incrementalMinhashComplete]] dedups).
  *  - '''Cross-session resume.''' State outlives the streaming query: a
  *    new session points a state handle at the same root with a FRESH
  *    epoch (its batchIds restart at 0, so the epoch keys them apart)
  *    and continues growing the same index — spec'd equal to the
  *    one-shot full-corpus pipeline.
  *
  * Scale notes: the stores are append-only, so a long-running stream
  * accumulates one small dir per batch — compact offline by rewriting
  * `epoch=*` into one coarse epoch (reads tolerate duplicate doc ids, so
  * compaction needs no coordination with the stream beyond single-writer
  * ownership). Label snapshots are the classic state-store snapshot
  * shape (full write per batch, linear scan + write, NO shuffle of
  * accumulated state); only the latest two are kept. */
object BatchStore {

  def batchDir(dir: String, epoch: String, batchId: Long): String =
    s"$dir/epoch=$epoch/batch=$batchId"

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  /** Idempotent per-micro-batch append: stage, then atomically publish
    * as this (epoch, batch)'s own partition dir. A replayed batch
    * overwrites its prior (possibly partial) attempt. */
  def append(df: DataFrame, dir: String, epoch: String, batchId: Long): Unit = {
    val spark = df.sparkSession
    val target = new Path(batchDir(dir, epoch, batchId))
    val f = fs(spark, dir)
    val staging = new Path(target.getParent,
      s".${target.getName}._staging_${java.util.UUID.randomUUID()}")
    df.write.parquet(staging.toString)
    if (f.exists(target)) f.delete(target, true)
    if (!f.rename(staging, target))
      throw new IllegalStateException(
        s"BatchStore.append: publish to $target failed")
  }

  /** True iff the store holds at least one published batch. Keyed on
    * the published partition DIRS, not `_SUCCESS` markers: the staged
    * write + atomic rename protocol means a visible (non-hidden) batch
    * dir is complete by construction, so the store stays readable even
    * where the committer's success markers are disabled
    * (mapreduce.fileoutputcommitter.marksuccessfuljobs=false — a silent
    * everything-is-empty failure mode otherwise). */
  def nonEmpty(spark: SparkSession, dir: String): Boolean =
    fs(spark, dir).globStatus(new Path(dir, "epoch=*/batch=*")) match {
      case null => false
      case arr  => arr.exists(_.isDirectory)
    }

  /** Every published batch's rows, epoch/batch partition columns
    * dropped. Duplicate rows across epochs (a resumed session replaying
    * a crashed batch under a fresh epoch) are the CALLER's contract to
    * tolerate — the LSH probe and pair readers here all dedup on their
    * natural keys. None when the store is empty. */
  def read(spark: SparkSession, dir: String): Option[DataFrame] =
    if (!nonEmpty(spark, dir)) None
    else Some(spark.read.parquet(dir).drop("epoch", "batch"))

  /** Offline compaction of an append-only store: rewrite every published
    * batch partition into ONE partition under a fresh epoch, dedup rows
    * on `keyCols` while at it (replay/resume duplicates die here instead
    * of at read time), then drop the originals. Single-writer contract:
    * run between streaming sessions — the same ownership the stream's
    * own appends already assume. Crash-ordered so the store is readable
    * at every step: the compacted partition PUBLISHES before any
    * original is deleted, and the transient duplicate window that
    * creates is exactly the duplicate shape every reader/probe here
    * already tolerates. A long-running stream calls this every K
    * sessions to keep the per-batch listing cost flat. */
  def compact(spark: SparkSession, dir: String, keyCols: Seq[String],
              epoch: String = s"compact-${java.util.UUID.randomUUID()}"): Unit =
    read(spark, dir).foreach { df =>
      val f = fs(spark, dir)
      val old = Option(f.globStatus(new Path(dir, "epoch=*"))).toSeq.flatten
        .map(_.getPath)
      require(!old.exists(_.getName == s"epoch=$epoch"),
        s"BatchStore.compact: epoch '$epoch' already exists in $dir")
      val deduped =
        if (keyCols.isEmpty) df else df.dropDuplicates(keyCols)
      append(deduped, dir, epoch, 0L)
      old.foreach(p => f.delete(p, true))
    }

  private val ManifestName = "MANIFEST"

  /** Publish `df` as the store's CURRENT snapshot: write it as this
    * (epoch, batch)'s dir, repoint the manifest at it (staged rename —
    * readers always see a complete snapshot), then prune every snapshot
    * except the new and previous targets. The kept previous snapshot is
    * the crash margin: a manifest that never got repointed still names a
    * fully-written state, and a replayed batch folds idempotently on top
    * of it. */
  def publishSnapshot(df: DataFrame, dir: String, epoch: String,
                      batchId: Long): Unit = {
    val spark = df.sparkSession
    val f = fs(spark, dir)
    val prev = manifestTarget(spark, dir)
    append(df, dir, epoch, batchId)
    val rel = s"epoch=$epoch/batch=$batchId"
    val manifest = new Path(dir, ManifestName)
    val fallback = new Path(dir, s"_$ManifestName.prev")
    val staging = new Path(dir, s"_$ManifestName._staging_${java.util.UUID.randomUUID()}")
    val out = f.create(staging, true)
    try out.write(rel.getBytes("UTF-8")) finally out.close()
    // the repoint cannot leave the store manifest-less at any crash
    // point: the old manifest steps ASIDE (to the fallback name readers
    // also check) before the new one renames in, never into the void
    if (f.exists(fallback)) f.delete(fallback, false)
    if (f.exists(manifest) && !f.rename(manifest, fallback))
      throw new IllegalStateException(
        s"BatchStore.publishSnapshot: manifest step-aside in $dir failed")
    if (!f.rename(staging, manifest))
      throw new IllegalStateException(
        s"BatchStore.publishSnapshot: manifest update in $dir failed")
    f.delete(fallback, false)
    // prune: keep the new target and the previous one, drop the rest
    val keep = Set(Some(rel), prev).flatten
    Option(f.globStatus(new Path(dir, "epoch=*/batch=*"))).toSeq.flatten
      .map(_.getPath)
      .filterNot(p => keep.exists(k => p.toString.endsWith(k)))
      .foreach(p => f.delete(p, true))
  }

  private def manifestTarget(spark: SparkSession, dir: String): Option[String] = {
    val f = fs(spark, dir)
    def readFile(p: Path): String = {
      val in = f.open(p)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](256)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        bytes.toString("UTF-8").trim
      } finally in.close()
    }
    val manifest = new Path(dir, ManifestName)
    val fallback = new Path(dir, s"_$ManifestName.prev")
    // the fallback covers the one crash window where the old manifest
    // has stepped aside but the new one has not renamed in yet
    if (f.exists(manifest)) Some(readFile(manifest))
    else if (f.exists(fallback)) Some(readFile(fallback))
    else None
  }

  /** The manifest's current snapshot, or None before the first publish. */
  def readSnapshot(spark: SparkSession, dir: String): Option[DataFrame] =
    manifestTarget(spark, dir).map(rel => spark.read.parquet(s"$dir/$rel"))
}

/** Handle on the growing dedup sinks' persisted state: an LSH signature
  * store, the accumulated near-dup pair store (both append-only,
  * per-batch partitions), and the component-labeling snapshot store —
  * all under one root. Create with a fresh `epoch` per streaming-query
  * lifetime (a restart FROM CHECKPOINT reuses the epoch — replayed
  * batchIds overwrite in place; a NEW query over accumulated state, with
  * batchIds restarting at 0, takes a new epoch so nothing clobbers). */
final case class GrowingDedupState(root: String, epoch: String = "0") {
  val sigDir: String = s"$root/sigs"
  val pairDir: String = s"$root/pairs"
  val labelDir: String = s"$root/labels"

  def withEpoch(e: String): GrowingDedupState = copy(epoch = e)

  /** The raw signature store — may hold duplicate doc ids after a
    * cross-epoch replay; the probe's pair-level dedups tolerate them. */
  private[streaming] def indexRaw(spark: SparkSession): Option[DataFrame] =
    BatchStore.read(spark, sigDir)

  /** One signature row per doc (read-time id dedup — signatures are
    * deterministic functions of the text, so any copy is the row). */
  def index(spark: SparkSession): DataFrame =
    indexRaw(spark).map(_.dropDuplicates("doc_id" :: Nil))
      .getOrElse(throw new IllegalStateException(
        s"GrowingDedupState: no signatures published under $sigDir yet"))

  /** The accumulated near-dup pair set, pair-key deduped at read (the
    * per-batch stores are disjoint in a clean run; replays overwrite in
    * place, so duplicates only survive a cross-epoch resume replay). */
  def matches(spark: SparkSession): DataFrame =
    BatchStore.read(spark, pairDir)
      .map(_.dropDuplicates("doc_a" :: "doc_b" :: Nil))
      .getOrElse(throw new IllegalStateException(
        s"GrowingDedupState: no matches published under $pairDir yet"))

  /** The current component labeling snapshot, None before the first
    * fold ([[graft.streaming.Streaming.growingComponentsSink]]). */
  def labels(spark: SparkSession): Option[DataFrame] =
    BatchStore.readSnapshot(spark, labelDir)

  /** Compact the signature and pair stores into one partition each
    * (id- and pair-key-deduped), dropping the per-batch dirs — run
    * between streaming sessions to keep listing cost flat on a
    * long-running feed. Results are unchanged by contract: the probe
    * and readers dedup on the same keys ([[BatchStore.compact]]).
    * Label snapshots self-prune (latest two) and need no compaction. */
  def compact(spark: SparkSession): Unit = {
    BatchStore.compact(spark, sigDir, Seq("doc_id"))
    BatchStore.compact(spark, pairDir, Seq("doc_a", "doc_b"))
  }
}
