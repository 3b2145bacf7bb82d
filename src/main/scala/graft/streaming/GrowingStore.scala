package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** On-disk, append-only per-micro-batch state for the self-growing
  * streaming dedup sinks — the persisted-artifact form of what r15 kept
  * as `pinEager`'d in-memory frames.
  *
  * Layout: `dir/epoch=<E>/batch=<N>/` parquet, one hive-style partition
  * per (query lifetime, micro-batch); stores that declare partition
  * columns nest them UNDER the batch dir (`batch=<N>/bk=<B>/`), so a
  * probe can read only the hash buckets a batch actually touches.
  * Three properties the in-memory fold lacked:
  *
  *  - '''O(batch) folds.''' A micro-batch WRITES only its own rows —
  *    no `unionByName + dropDuplicates` shuffle over the accumulated
  *    state, no fresh full-copy pin. Dedup of replay duplicates is
  *    deferred to probe/read time, where the probe's candidate and
  *    pair-key dedups (batch-proportional) already absorb them.
  *  - '''Replay idempotence by construction.''' A replayed batchId
  *    lands on the SAME partition dir and overwrites it byte-identically
  *    (staged write + step-aside + atomic rename), so at-least-once
  *    delivery needs no transactional sink. A crash between the pair
  *    write and the signature write is also safe: the replay either
  *    probes an index without the batch (normal shape) or one that
  *    already holds it (the overlap shape
  *    [[graft.dedup.Dedup.incrementalMinhashComplete]] dedups).
  *  - '''Cross-session resume.''' State outlives the streaming query: a
  *    new session points a state handle at the same root with a FRESH
  *    epoch (its batchIds restart at 0, so the epoch keys them apart)
  *    and continues growing the same index — spec'd equal to the
  *    one-shot full-corpus pipeline.
  *
  * Scale notes: the stores are append-only, so a long-running stream
  * accumulates one small dir per batch — compaction (manual
  * [[GrowingDedupState.compact]], or the automatic session-start policy
  * [[GrowingDedupState.maybeAutoCompact]]) rewrites `epoch=*` into one
  * coarse epoch to keep listing cost flat. Label snapshots are the
  * classic state-store snapshot shape (full write per batch, linear
  * scan + write, NO shuffle of accumulated state); only the latest two
  * are kept.
  *
  * Single-writer contract: at most one stream owns a store root at a
  * time, and EXTERNAL readers must not run concurrently with an
  * actively REPLAYING stream — a replay overwrite steps the old batch
  * partition aside before renaming the new one in, so a concurrent
  * reader could observe that batch absent for the two-rename window
  * (clean appends create brand-new dirs and are safe to read through).
  */
object BatchStore {

  def batchDir(dir: String, epoch: String, batchId: Long): String =
    s"$dir/epoch=$epoch/batch=$batchId"

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  /** Idempotent per-micro-batch append: stage, then atomically publish
    * as this (epoch, batch)'s own partition dir. A replayed batch
    * overwrites its prior (possibly partial) attempt: the old dir steps
    * ASIDE (hidden name) rather than being deleted in place — the
    * unavailability window is two O(1) renames, not a recursive delete,
    * and a crash between them leaves the prior data recoverable under
    * the aside name until the next attempt sweeps it. Crashed attempts'
    * staging/aside leftovers for THIS batch are swept on entry.
    * `partitionBy` nests hive partition dirs under the batch dir (the
    * band/payload hash buckets a pruned probe pushes filters into). */
  def append(df: DataFrame, dir: String, epoch: String, batchId: Long,
             partitionBy: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    val target = new Path(batchDir(dir, epoch, batchId))
    val f = fs(spark, dir)
    Option(f.globStatus(new Path(target.getParent,
        s".${target.getName}._{staging,replaced}_*"))).toSeq.flatten
      .foreach(s => f.delete(s.getPath, true))
    val staging = new Path(target.getParent,
      s".${target.getName}._staging_${java.util.UUID.randomUUID()}")
    val w = df.write
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(staging.toString)
    val aside = new Path(target.getParent,
      s".${target.getName}._replaced_${java.util.UUID.randomUUID()}")
    if (partitionBy.nonEmpty && !hasDataFiles(f, staging)) {
      // a partitioned write of ZERO rows emits no part files at all
      // (plain writes emit one empty file with a schema footer):
      // publishing the fileless dir would make nonEmpty() true while
      // read()/compact() cannot infer a schema — a crash-loop once it
      // is the store's only batch. Publish NOTHING instead: an empty
      // batch is invisible by construction, and a replay-to-empty
      // removes the prior attempt's content like any other overwrite.
      f.delete(staging, true)
      if (f.exists(target)) {
        if (!f.rename(target, aside))
          throw new IllegalStateException(
            s"BatchStore.append: step-aside of $target failed")
        f.delete(aside, true)
      }
      return
    }
    if (f.exists(target) && !f.rename(target, aside))
      throw new IllegalStateException(
        s"BatchStore.append: step-aside of $target failed")
    if (!f.rename(staging, target))
      throw new IllegalStateException(
        s"BatchStore.append: publish to $target failed")
    f.delete(aside, true)
  }

  /** Any non-hidden file under `p`, reached through non-hidden dirs
    * only — i.e. the dir holds data a parquet read will actually see
    * (Spark skips `_`/`.`-prefixed entries at EVERY level, so a part
    * file inside a crashed `._staging_*` dir must not count). */
  private[streaming] def hasDataFiles(f: org.apache.hadoop.fs.FileSystem,
                                      p: Path): Boolean =
    f.exists(p) && f.listStatus(p).exists { s =>
      val n = s.getPath.getName
      !n.startsWith("_") && !n.startsWith(".") &&
        (!s.isDirectory || hasDataFiles(f, s.getPath))
    }

  /** Delete the given batch partition dirs, then any epoch dir they
    * leave without a single published batch. */
  private[streaming] def deleteBatches(f: org.apache.hadoop.fs.FileSystem,
                                       batches: Seq[Path]): Unit = {
    batches.foreach(p => f.delete(p, true))
    batches.map(_.getParent).distinct.foreach { e =>
      if (Option(f.globStatus(new Path(e, "batch=*"))).forall(_.isEmpty))
        f.delete(e, true)
    }
  }

  /** The numeric id of a `batch=N` partition dir; unparseable names map
    * to MaxValue so exclusion predicates keyed on "id below the replay
    * frontier" conservatively spare them. */
  private[streaming] def batchIdOf(p: Path): Long =
    p.getName.stripPrefix("batch=").toLongOption.getOrElse(Long.MaxValue)

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
    * dropped (deeper store partition columns like `bk`/`pb` ride along
    * as data columns). Duplicate rows across epochs (a resumed session
    * replaying a crashed batch under a fresh epoch) are the CALLER's
    * contract to tolerate — the LSH probe and pair readers here all
    * dedup on their natural keys. None when the store is empty. */
  def read(spark: SparkSession, dir: String): Option[DataFrame] =
    if (!nonEmpty(spark, dir)) None
    else Some(spark.read.parquet(dir).drop("epoch", "batch"))

  /** Deterministic key-dedup for store read-back: one survivor per key,
    * chosen as the MAX of the non-key payload struct (column order
    * as-read) — never an arbitrary dropDuplicates race winner, matching
    * [[graft.dedup.Dedup.incrementalMinhashComplete]]'s deterministic
    * max-across-versions contract when a doc id was re-ingested with
    * changed text across epochs. One hash aggregation, map-side
    * combinable. */
  def dedupByMaxStruct(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val others = df.columns.filterNot(keyCols.contains).toSeq
    if (others.isEmpty) df.dropDuplicates(keyCols)
    else df.groupBy(keyCols.map(col): _*)
      .agg(max(struct(others.map(col): _*)).as("_payload"))
      .select(keyCols.map(col) ++ others.map(c => col("_payload." + c).as(c)): _*)
  }

  /** Offline compaction of an append-only store: rewrite every published
    * batch partition into ONE partition under a fresh epoch, dedup rows
    * on `keyCols` while at it — deterministically, via
    * [[dedupByMaxStruct]], so replay/resume duplicates AND re-ingested
    * versions die here with the same survivor every run. Bucketed stores
    * pass `partitionBy` so the compacted partition keeps the hash-bucket
    * layout the pruned probe depends on. Single-writer contract: run
    * between streaming sessions or at session start BEFORE the first
    * batch — the same ownership the stream's own appends already assume.
    * Crash-ordered so the store is readable at every step: the compacted
    * partition PUBLISHES before any original is deleted, and the
    * transient duplicate window that creates is exactly the duplicate
    * shape every reader/probe here already tolerates.
    *
    * `spareBatch` (on batch partition dirs) leaves matching partitions
    * untouched — not read, not deleted. A stream restarting FROM
    * CHECKPOINT re-delivers its last uncommitted batches under their
    * ORIGINAL (epoch, batchId) keys, and a replay whose partition a
    * compaction just swallowed would re-append rows the compact epoch
    * already holds — permanent duplicates where the protocol promises
    * overwrite-idempotence (inflating the hot-bucket occupancy census,
    * which counts rows). The sinks spare their live epoch's partitions
    * at or above the replay frontier ([[GrowingDedupState.compact]]). */
  def compact(spark: SparkSession, dir: String, keyCols: Seq[String],
              partitionBy: Seq[String] = Nil,
              epoch: String = s"compact-${java.util.UUID.randomUUID()}",
              spareBatch: Path => Boolean = _ => false): Unit = {
    val f = fs(spark, dir)
    require(Option(f.globStatus(new Path(dir, s"epoch=$epoch/batch=*")))
        .forall(_.isEmpty),
      s"BatchStore.compact: epoch '$epoch' already exists in $dir")
    val batches = Option(f.globStatus(new Path(dir, "epoch=*/batch=*")))
      .toSeq.flatten.filter(_.isDirectory).map(_.getPath)
      .filterNot(spareBatch)
    if (batches.nonEmpty) {
      if (!batches.exists(hasDataFiles(f, _))) deleteBatches(f, batches)
      else {
        val df = spark.read.option("basePath", dir)
          .parquet(batches.map(_.toString): _*).drop("epoch", "batch")
        val deduped =
          if (keyCols.isEmpty) df else dedupByMaxStruct(df, keyCols)
        val arranged =
          if (partitionBy.isEmpty) deduped
          else deduped.repartition(partitionBy.map(col): _*)
        append(arranged, dir, epoch, 0L, partitionBy)
        deleteBatches(f, batches)
      }
    }
    sweepEmptyEpochs(f, dir, keepEpoch = epoch)
  }

  /** Drop epoch dirs with no published batch left — crashed-append
    * skeletons (hidden staging leftovers under an abandoned epoch)
    * would otherwise accumulate forever, invisible to the per-batch
    * compaction globs. */
  private[streaming] def sweepEmptyEpochs(f: org.apache.hadoop.fs.FileSystem,
                                          dir: String, keepEpoch: String): Unit =
    Option(f.globStatus(new Path(dir, "epoch=*"))).toSeq.flatten
      .map(_.getPath).filterNot(_.getName == s"epoch=$keepEpoch")
      .filter(e => Option(f.globStatus(new Path(e, "batch=*"))).forall(_.isEmpty))
      .foreach(p => f.delete(p, true))

  private val ManifestName = "MANIFEST"

  /** Publish `df` as the store's CURRENT snapshot: write it as this
    * (epoch, batch)'s dir, repoint the manifest at it (staged rename —
    * readers always see a complete snapshot), then prune every snapshot
    * except the new and previous targets. The kept previous snapshot is
    * the crash margin: a manifest that never got repointed still names a
    * fully-written state, and a replayed batch folds idempotently on top
    * of it.
    *
    * `covered` (relative partition names, e.g. `epoch=0/batch=3`) names
    * the WAL partitions whose content this snapshot already folds —
    * recovery then replays only the tail written after it
    * ([[snapshotCovered]]). Safe to UNDER-state (extra folds of
    * already-contracted pairs are no-ops by the fold's idempotence
    * contract); a manifest without the listing simply makes recovery
    * fold the whole WAL, the pre-listing behavior. */
  def publishSnapshot(df: DataFrame, dir: String, epoch: String,
                      batchId: Long, covered: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    val f = fs(spark, dir)
    val prev = manifestTarget(spark, dir)
    append(df, dir, epoch, batchId)
    val rel = s"epoch=$epoch/batch=$batchId"
    repointManifest(f, dir, (rel +: covered).mkString("\n"))
    // prune: keep the new target and the previous one, drop the rest
    val keep = Set(Some(rel), prev).flatten
    Option(f.globStatus(new Path(dir, "epoch=*/batch=*"))).toSeq.flatten
      .map(_.getPath)
      .filterNot(p => keep.exists(k => p.toString.endsWith(k)))
      .foreach(p => f.delete(p, true))
  }

  /** Atomically replace the manifest's covered listing while keeping
    * its snapshot target — used after a pair-store compaction rewrote
    * the partitions the listing names. No-op when no manifest exists. */
  def rewriteCovered(spark: SparkSession, dir: String,
                     covered: Seq[String]): Unit =
    manifestTarget(spark, dir).foreach { rel =>
      repointManifest(fs(spark, dir), dir, (rel +: covered).mkString("\n"))
    }

  /** The crash-safe manifest repoint: stage the new content, step the
    * old manifest ASIDE (to the fallback name readers also check)
    * before the new one renames in — the store is never manifest-less
    * at any crash point. */
  private def repointManifest(f: org.apache.hadoop.fs.FileSystem,
                              dir: String, content: String): Unit = {
    val manifest = new Path(dir, ManifestName)
    val fallback = new Path(dir, s"_$ManifestName.prev")
    val staging = new Path(dir, s"_$ManifestName._staging_${java.util.UUID.randomUUID()}")
    val out = f.create(staging, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    if (f.exists(fallback)) f.delete(fallback, false)
    if (f.exists(manifest) && !f.rename(manifest, fallback))
      throw new IllegalStateException(
        s"BatchStore: manifest step-aside in $dir failed")
    if (!f.rename(staging, manifest))
      throw new IllegalStateException(
        s"BatchStore: manifest update in $dir failed")
    f.delete(fallback, false)
  }

  private def manifestLines(spark: SparkSession, dir: String): Seq[String] = {
    val f = fs(spark, dir)
    def readFile(p: Path): Seq[String] = {
      val in = f.open(p)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](256)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        bytes.toString("UTF-8").linesIterator.map(_.trim)
          .filter(_.nonEmpty).toSeq
      } finally in.close()
    }
    val manifest = new Path(dir, ManifestName)
    val fallback = new Path(dir, s"_$ManifestName.prev")
    // the fallback covers the one crash window where the old manifest
    // has stepped aside but the new one has not renamed in yet
    if (f.exists(manifest)) readFile(manifest)
    else if (f.exists(fallback)) readFile(fallback)
    else Seq.empty
  }

  private def manifestTarget(spark: SparkSession, dir: String): Option[String] =
    manifestLines(spark, dir).headOption

  /** The manifest's current snapshot, or None before the first publish. */
  def readSnapshot(spark: SparkSession, dir: String): Option[DataFrame] =
    manifestTarget(spark, dir).map(rel => spark.read.parquet(s"$dir/$rel"))

  /** The WAL partitions the current snapshot declares itself to cover
    * (see [[publishSnapshot]]); empty before the first publish or for
    * manifests written without the listing. */
  def snapshotCovered(spark: SparkSession, dir: String): Seq[String] =
    manifestLines(spark, dir).drop(1)
}

/** IO selection of one [[GrowingDedupState.probeComplete]] call:
  * files/bytes the pruned band and payload reads SELECTED vs each
  * store's totals — the probe's sublinearity contract, measured from
  * the store layout itself (independent of task-metrics accounting).
  * Recorded only when `graft.growing.probeIoDiagnostics=true` (the
  * content summaries walk the store — diagnostics, not a hot-path
  * cost). */
final case class ProbeIo(bandFiles: Long, bandBytes: Long,
                         bandStoreFiles: Long, bandStoreBytes: Long,
                         payFiles: Long, payBytes: Long,
                         payStoreFiles: Long, payStoreBytes: Long)

/** Handle on the growing dedup sinks' persisted state: a hash-bucketed
  * BAND store (one row per doc per band, hive-partitioned by
  * `bk = hash(band, h1, h2) % bandBuckets` — the probe side), a
  * hash-bucketed signature PAYLOAD store (one row per doc, carrying the
  * shingle set, partitioned by `pb = hash(doc_id) % payloadBuckets` —
  * the verification side), the accumulated near-dup pair store, and the
  * component-labeling snapshot store — all under one root.
  *
  * The split + bucketing is the 100 TB probe contract: a micro-batch
  * collects the ≤ 4·|batch| band buckets it hashes into (driver-bounded
  * by `bandBuckets`) and reads ONLY those partitions of the band store;
  * verification then reads only the payload buckets its CANDIDATES'
  * old ids hash into. Bytes-read per batch is O(batch · occupancy ·
  * history/buckets), not O(history) — size `bandBuckets` to the target
  * partition size exactly like any hash-partitioned table (the r16
  * design scanned the whole signature store per batch). Bucket counts
  * are pinned at store creation in `root/_BUCKETS`; later sessions read
  * the pinned counts, so constructor values only matter for the first
  * write.
  *
  * Create with a fresh `epoch` per streaming-query lifetime (a restart
  * FROM CHECKPOINT reuses the epoch — replayed batchIds overwrite in
  * place; a NEW query over accumulated state, with batchIds restarting
  * at 0, takes a new epoch so nothing clobbers). `autoCompactAfter` > 0
  * lets the sinks compact automatically at session start once any store
  * holds more than that many batch dirs (bounds the per-batch listing
  * cost of a long-lived feed); 0 disables. */
final case class GrowingDedupState(root: String, epoch: String = "0",
                                   bandBuckets: Int = 16,
                                   payloadBuckets: Int = 16,
                                   autoCompactAfter: Int = 64) {
  require(bandBuckets >= 1 && payloadBuckets >= 1,
    "GrowingDedupState: bucket counts must be >= 1")
  val sigDir: String = s"$root/sigs"
  val bandDir: String = s"$root/bands"
  val pairDir: String = s"$root/pairs"
  val labelDir: String = s"$root/labels"

  def withEpoch(e: String): GrowingDedupState = copy(epoch = e)

  private def fs(spark: SparkSession) =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  @transient private var bucketMemo: Option[(Int, Int)] = None
  @transient private var probeIoMemo: Option[ProbeIo] = None

  /** Diagnostics of the last [[probeComplete]] on this handle (see
    * [[ProbeIo]]); None unless `graft.growing.probeIoDiagnostics=true`
    * was set on the session. */
  def lastProbeIo: Option[ProbeIo] = probeIoMemo

  /** The store's pinned (bandBuckets, payloadBuckets) — read from
    * `root/_BUCKETS` when it exists, else pinned from this handle's
    * constructor values on first use. Pinning matters: bucket membership
    * is baked into the on-disk partition values, so every later session
    * MUST hash with the same counts or the pruned probe would read the
    * wrong partitions. */
  private def effectiveBuckets(spark: SparkSession): (Int, Int) =
    bucketMemo.getOrElse {
      val f = fs(spark)
      val p = new Path(root, "_BUCKETS")
      val got =
        if (f.exists(p)) {
          val in = f.open(p)
          val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                  finally in.close()
          val m = s.trim.split("\\s+").map(_.split("=", 2))
            .map(a => a(0) -> a(1).toInt).toMap
          (m("bandBuckets"), m("payloadBuckets"))
        } else {
          val out = f.create(p, false) // single-writer: fail over clobber
          try out.write(
            s"bandBuckets=$bandBuckets\npayloadBuckets=$payloadBuckets"
              .getBytes("UTF-8"))
          finally out.close()
          (bandBuckets, payloadBuckets)
        }
      bucketMemo = Some(got)
      got
    }

  private def bandBucketExpr(n: Int) =
    pmod(xxhash64(col("band"), col("h1"), col("h2")), lit(n.toLong)).cast("int")
  private def payloadBucketExpr(n: Int, id: org.apache.spark.sql.Column) =
    pmod(xxhash64(id), lit(n.toLong)).cast("int")

  /** Fold one batch's signature table into the store: the payload rows
    * (doc_id, shingles, h0..h7) bucketed by doc-id hash, THEN the band
    * rows bucketed by band hash — in that order, so a band row never
    * exists without the payload its verification join needs (a crash
    * between the writes leaves the batch invisible to probes; its
    * replay overwrites both). Both writes are O(batch). */
  def appendSignatures(sigs: DataFrame, batchId: Long): Unit = {
    val spark = sigs.sparkSession
    val (bB, pB) = effectiveBuckets(spark)
    // one minhash projection for BOTH writes: the payload write
    // materializes the lazy pin, the band write re-reads the pinned
    // blocks instead of recomputing the 8-hash projection from scratch
    val s = graft.Lineage.pinned(sigs, eager = false)
    val payload = s.withColumn("pb", payloadBucketExpr(pB, col("doc_id")))
    graft.Jobs.described(spark, "grow: payload append") {
      BatchStore.append(payload.repartition(col("pb")), sigDir, epoch, batchId,
        partitionBy = Seq("pb"))
    }
    val bands = graft.dedup.Dedup.bandsOf(s)
      .withColumn("bk", bandBucketExpr(bB))
    graft.Jobs.described(spark, "grow: band append") {
      BatchStore.append(bands.repartition(col("bk")), bandDir, epoch, batchId,
        partitionBy = Seq("bk"))
    }
  }

  /** Partition dirs of `dir` holding the given bucket values — the
    * static partition filter of the pruned probe, resolved to explicit
    * paths so neither the LISTING nor the scan ever touches untouched
    * buckets. Exposed for the probe's files-read contract spec. */
  private[graft] def prunedPaths(spark: SparkSession, dir: String,
                                 pcol: String, vals: Seq[Int]): Seq[String] =
    if (vals.isEmpty) Seq.empty
    else {
      val pattern = new Path(dir,
        s"epoch=*/batch=*/$pcol={${vals.distinct.sorted.mkString(",")}}")
      Option(fs(spark).globStatus(pattern)).toSeq.flatten
        .filter(_.isDirectory).map(_.getPath.toString)
    }

  private def prunedRead(spark: SparkSession, dir: String, pcol: String,
                         vals: Seq[Int]): Option[DataFrame] = {
    val paths = prunedPaths(spark, dir, pcol, vals)
    if (paths.isEmpty) None
    else Some(spark.read.option("basePath", dir).parquet(paths: _*))
  }

  /** The COMPLETE per-batch near-dup pair set against the accumulated
    * store — [[graft.dedup.Dedup.incrementalMinhashComplete]] semantics
    * (index probe ∪ within-batch self-LSH, pair-distinct, deterministic
    * MAX across re-ingested versions, same hot-bucket guard on both
    * legs) with the history reads PARTITION-PRUNED:
    *
    *  1. the batch's band table collects its distinct `bk` buckets
    *     (≤ min(4·|batch|, bandBuckets) values, driver-bounded) and the
    *     band store is read at exactly those partition paths;
    *  2. candidate (new_id, old_id) pairs then collect their old ids'
    *     distinct `pb` buckets and the payload store is read at exactly
    *     those paths for the verification join.
    *
    * Equality with the full-scan probe is structural: a band bucket's
    * rows all live in one `bk` partition (the partition key is a hash of
    * the band join key), so unread partitions cannot hold matching
    * bands, and unread payload buckets cannot hold candidate old ids.
    * An empty or untouched store degrades to the guarded self-LSH (the
    * first-batch shape). */
  def probeComplete(newShingled: DataFrame, minJaccX1e6: Long,
                    maxBucketOccupancy: Long = Long.MaxValue,
                    failOnHotBucket: Boolean = false): DataFrame = {
    import graft.dedup.Dedup
    val newMat = Dedup.pinned(newShingled)
    val within = Dedup.minhashLshGuarded(newMat, minJaccX1e6,
      maxBucketOccupancy, failOnHotBucket)
    prunedCross(newMat, minJaccX1e6, maxBucketOccupancy,
        failOnHotBucket) match {
      case None        => within
      case Some(cross) => Dedup.completeFrom(cross, within)
    }
  }

  /** The probe-ONLY pruned read — [[graft.dedup.Dedup
    * .incrementalMinhashIndexed]] semantics against this store's
    * bucketed layout (no within-batch term, no fold): the serving path
    * when the store is a FIXED corpus index probed by a stream of
    * batches too large to pin ([[graft.dedup.Dedup
    * .incrementalMinhashPrebuilt]] is the pin-once path for indexes
    * that fit). Same partition pruning and guard semantics as
    * [[probeComplete]]'s cross leg; byte-identical output to the
    * full-scan probe. */
  def probeIndexed(newShingled: DataFrame, minJaccX1e6: Long,
                   maxBucketOccupancy: Long = Long.MaxValue,
                   failOnHotBucket: Boolean = false): DataFrame = {
    val newMat = graft.dedup.Dedup.pinned(newShingled)
    prunedCross(newMat, minJaccX1e6, maxBucketOccupancy, failOnHotBucket)
      .getOrElse(newMat.select(col("doc_id").as("new_id"),
        col("doc_id").as("old_id"), lit(0L).as("jacc_x1e6")).limit(0))
  }

  /** The pruned cross-probe core shared by [[probeComplete]] and
    * [[probeIndexed]]: (new_id, old_id, jacc_x1e6) of `newMat` against
    * the store, None when the store holds no batch partitions or no
    * bucket the batch hashes into. `newMat` must already be
    * materialized. */
  private def prunedCross(newMat: DataFrame, minJaccX1e6: Long,
      maxBucketOccupancy: Long,
      failOnHotBucket: Boolean): Option[DataFrame] = {
    import graft.dedup.Dedup
    val spark = newMat.sparkSession
    probeIoMemo = None // never report a previous probe's IO as this one's
    if (!BatchStore.nonEmpty(spark, bandDir)) {
      // signatures without bands is EITHER the documented first-batch
      // crash window (payload published, crash before the band write —
      // the batch is invisible and its replay overwrites both) or a
      // store written by the pre-bucketed layout. Tell them apart by
      // the payload partitioning: bucketed payloads nest pb=* dirs; a
      // legacy store has none, and silently degrading to self-LSH
      // would un-probe its ENTIRE accumulated history.
      if (legacyLayout(spark))
        throw new IllegalStateException(
          s"GrowingDedupState: $sigDir holds signatures but no band " +
            "partitions and no pb buckets — a store written by the " +
            "pre-bucketed layout. Run compact()/maybeAutoCompact to " +
            "migrate it (the sinks do this at session start) before " +
            "probing.")
      None
    } else {
      val (bB, pB) = effectiveBuckets(spark)
      val newBands = graft.Lineage.pinned(Dedup.bandTable(newMat), eager = false)
      val bks = graft.Jobs.described(spark, "probe: bk collect") {
        newBands.select(bandBucketExpr(bB).as("bk"))
          .distinct().collect().map(_.getInt(0)).toSeq
      }
      prunedRead(spark, bandDir, "bk", bks) match {
        case None => None
        case Some(hist) =>
          val cand = graft.Lineage.pinned(
            Dedup.probeCandidates(
              hist.select(col("doc_id"), col("band"), col("h1"), col("h2")),
              newBands, maxBucketOccupancy, failOnHotBucket),
            eager = false)
          val pbs = graft.Jobs.described(spark, "probe: pb collect") {
            cand.select(payloadBucketExpr(pB, col("old_id")).as("pb"))
              .distinct().collect().map(_.getInt(0)).toSeq
          }
          if (spark.conf.getOption("graft.growing.probeIoDiagnostics")
              .contains("true")) {
            val f = fs(spark)
            def sum(paths: Seq[String]): (Long, Long) =
              paths.foldLeft((0L, 0L)) { case ((nf, nb), p) =>
                val s = f.getContentSummary(new Path(p))
                (nf + s.getFileCount, nb + s.getLength)
              }
            val (bf, bb) = sum(prunedPaths(spark, bandDir, "bk", bks))
            val (bsf, bsb) = sum(Seq(bandDir))
            val (pf, pbb) = sum(prunedPaths(spark, sigDir, "pb", pbs))
            val (psf, psb) = sum(Seq(sigDir))
            probeIoMemo = Some(ProbeIo(bf, bb, bsf, bsb, pf, pbb, psf, psb))
          }
          prunedRead(spark, sigDir, "pb", pbs) match {
            case None if pbs.isEmpty => None // no candidates at all
            case None => throw new IllegalStateException(
              s"GrowingDedupState: payload partitions missing under $sigDir " +
                s"for probed candidate buckets ${pbs.mkString(",")} — " +
                "store corrupted (bands published without their payload?)")
            case Some(pay) =>
              Some(Dedup.verifyJaccard(cand, "new_id", "old_id", newMat,
                pay.select(col("doc_id"), col("shingles")), minJaccX1e6))
          }
      }
    }
  }

  /** The raw signature store — may hold duplicate doc ids after a
    * cross-epoch replay; the probe's pair-level dedups tolerate them. */
  private[streaming] def indexRaw(spark: SparkSession): Option[DataFrame] =
    BatchStore.read(spark, sigDir).map(_.drop("pb"))

  /** One signature row per doc. Read-time id dedup is DETERMINISTIC
    * (max payload struct per id — [[BatchStore.dedupByMaxStruct]]): for
    * the normal replay shape any copy is byte-identical, and a doc id
    * re-ingested with changed text across epochs resolves to the same
    * survivor every read, matching the probe's max-across-versions
    * contract instead of a dropDuplicates race. */
  def index(spark: SparkSession): DataFrame =
    indexRaw(spark).map(BatchStore.dedupByMaxStruct(_, Seq("doc_id")))
      .getOrElse(throw new IllegalStateException(
        s"GrowingDedupState: no signatures published under $sigDir yet"))

  /** The accumulated near-dup pair set, deterministically deduped on the
    * pair key at read (max jacc across duplicates — clean per-batch
    * stores are disjoint; duplicates only survive a cross-epoch resume
    * replay). */
  def matches(spark: SparkSession): DataFrame =
    BatchStore.read(spark, pairDir)
      .map(BatchStore.dedupByMaxStruct(_, Seq("doc_a", "doc_b")))
      .getOrElse(throw new IllegalStateException(
        s"GrowingDedupState: no matches published under $pairDir yet"))

  /** The current component labeling snapshot, None before the first
    * fold ([[graft.streaming.Streaming.growingComponentsSink]]). */
  def labels(spark: SparkSession): Option[DataFrame] =
    BatchStore.readSnapshot(spark, labelDir)

  /** The pair store's published partition names (`epoch=E/batch=N`) —
    * what a label snapshot publishing NOW can declare covered. */
  private[graft] def pairPartitions(spark: SparkSession): Seq[String] =
    Option(fs(spark).globStatus(new Path(pairDir, "epoch=*/batch=*")))
      .toSeq.flatten.filter(_.isDirectory).map(_.getPath)
      .map(p => s"${p.getParent.getName}/${p.getName}")

  /** The pair-store WAL tail the current label snapshot does NOT cover
    * — the only pairs session-start recovery must fold on top of the
    * snapshot (O(tail since last snapshot), not O(history); the fold's
    * idempotence makes any over-read merely wasteful, never wrong).
    * None when every published partition is covered, or the store is
    * empty. A store without a snapshot manifest returns the WHOLE pair
    * set — the fold-everything recovery shape. */
  private[graft] def unfoldedPairs(spark: SparkSession): Option[DataFrame] = {
    val covered = BatchStore.snapshotCovered(spark, labelDir).toSet
    val uncovered = pairPartitions(spark).filterNot(covered)
      .map(rel => s"$pairDir/$rel")
    if (uncovered.isEmpty) None
    else Some(spark.read.option("basePath", pairDir)
      .parquet(uncovered: _*).drop("epoch", "batch"))
  }

  /** Compact the signature, band, and pair stores into one partition
    * each, dropping the per-batch dirs — run between streaming sessions,
    * or let the sinks run it automatically at session start via
    * [[maybeAutoCompact]], to keep listing cost flat on a long-running
    * feed. Results are unchanged by contract: the probe and readers
    * dedup on the same keys. Label snapshots self-prune (latest two)
    * and need no compaction.
    *
    * Three contracts beyond [[BatchStore.compact]]'s:
    *
    *  - '''One version, consistently.''' The payload store dedups to
    *    ONE deterministic survivor per doc id (max payload struct) and
    *    the band store is then REBUILT as exactly the bands of those
    *    survivors — never compacted independently, because a per-band
    *    max(h1, h2) can pick a DIFFERENT re-ingested version than the
    *    payload's max-struct survivor, leaving a chimera store whose
    *    band rows advertise one version while verification reads
    *    another (near-dups of the surviving version would then probe
    *    into deleted band rows and silently miss).
    *  - '''Replayable partitions are spared.''' A checkpoint restart
    *    re-delivers its uncommitted batches under their original
    *    (epoch, batchId) keys, which must keep overwriting IN PLACE —
    *    so live-epoch batch dirs at or above `liveEpochSafeBelow` are
    *    never compacted. The sinks pass the FIRST batch id a session
    *    delivers as the frontier: everything below it is committed in
    *    the checkpoint log and can never be re-delivered, so a
    *    long-lived query that only ever restarts from checkpoint still
    *    gets its history compacted. The default (0) spares the whole
    *    live epoch — right for offline callers that cannot know the
    *    frontier.
    *  - '''Legacy migration.''' Payload rows written by the
    *    pre-bucketed layout (no `pb` column, no band store) gain their
    *    bucket column here and the band rebuild creates the band store
    *    from scratch — compaction IS the migration path the probe's
    *    legacy-store error names. Flat batches are migrated even in
    *    the live epoch (a bucketed replay overwrites them WHOLESALE,
    *    and sparing them would permanently wedge an upgraded store
    *    whose checkpoint restart reuses the legacy epoch); the bounded
    *    cost is one batch's worth of duplicate rows if the upgrade
    *    restart does replay, which every reader/probe tolerates.
    *
    * Crash-ordered like [[BatchStore.compact]]: each store's compacted
    * partition publishes before its originals are deleted, and the band
    * rebuild runs strictly after the payload compact so a crash between
    * them leaves band rows that are a superset of the survivors' —
    * extra candidates that verification (against the surviving
    * payloads) simply rejects. */
  def compact(spark: SparkSession, liveEpochSafeBelow: Long = 0L): Unit = {
    val f = fs(spark)
    val (bB, pB) = effectiveBuckets(spark)
    val ce = s"compact-${java.util.UUID.randomUUID()}"
    def replayable(p: Path): Boolean =
      p.getParent.getName == s"epoch=$epoch" &&
        BatchStore.batchIdOf(p) >= liveEpochSafeBelow
    def batchDirs(dir: String): Seq[Path] =
      Option(f.globStatus(new Path(dir, "epoch=*/batch=*"))).toSeq.flatten
        .filter(_.isDirectory).map(_.getPath)
    // classify per BATCH dir: flat (pre-bucketed) batches are read
    // separately from bucketed ones — one mixed-depth read would fail
    // partition discovery — and compact regardless of epoch (see above)
    val (flat, bucketedAll) = batchDirs(sigDir).partition(p =>
      Option(f.globStatus(new Path(p, "pb=*"))).forall(_.isEmpty))
    val bucketedOld = bucketedAll.filterNot(replayable)
    val sigOld = flat ++ bucketedOld
    if (sigOld.exists(BatchStore.hasDataFiles(f, _))) {
      def readGroup(dirs: Seq[Path]): Option[DataFrame] =
        if (!dirs.exists(BatchStore.hasDataFiles(f, _))) None
        else Some(spark.read.option("basePath", sigDir)
          .parquet(dirs.map(_.toString): _*).drop("epoch", "batch"))
      val withPb = (readGroup(bucketedOld) ++
          readGroup(flat).map(
            _.withColumn("pb", payloadBucketExpr(pB, col("doc_id")))))
        .reduce(_.unionByName(_))
      val survivors = BatchStore.dedupByMaxStruct(withPb, Seq("doc_id"))
      BatchStore.append(survivors.repartition(col("pb")), sigDir, ce, 0L,
        partitionBy = Seq("pb"))
      val bandOld = batchDirs(bandDir).filterNot(replayable)
      val ceDir = new Path(BatchStore.batchDir(sigDir, ce, 0L))
      // zero survivors publish nothing (empty partitioned writes are
      // fileless by contract) — then there is nothing to band either
      if (f.exists(ceDir)) {
        val bands = graft.dedup.Dedup.bandsOf(
            spark.read.parquet(ceDir.toString))
          .withColumn("bk", bandBucketExpr(bB))
        BatchStore.append(bands.repartition(col("bk")), bandDir, ce, 0L,
          partitionBy = Seq("bk"))
      }
      BatchStore.deleteBatches(f, bandOld)
      BatchStore.deleteBatches(f, sigOld)
    } else BatchStore.deleteBatches(f, sigOld) // fileless skeletons
    BatchStore.sweepEmptyEpochs(f, sigDir, keepEpoch = ce)
    BatchStore.sweepEmptyEpochs(f, bandDir, keepEpoch = ce)
    // pair-store compaction must keep the label snapshot's covered
    // listing meaningful: with a manifest present, compact ONLY the
    // partitions it declares covered (the uncovered tail is small by
    // construction — pairs since the last snapshot — and must stay
    // individually addressable so recovery keeps reading O(tail)),
    // then repoint the listing at the compact partition plus whatever
    // covered partitions compaction spared. Label-less stores (the
    // dedup sink) have no manifest and compact everything.
    val covered = BatchStore.snapshotCovered(spark, labelDir).toSet
    if (covered.isEmpty)
      BatchStore.compact(spark, pairDir, Seq("doc_a", "doc_b"), epoch = ce,
        spareBatch = replayable)
    else {
      def relOf(p: Path) = s"${p.getParent.getName}/${p.getName}"
      BatchStore.compact(spark, pairDir, Seq("doc_a", "doc_b"), epoch = ce,
        spareBatch = p => replayable(p) || !covered.contains(relOf(p)))
      val stillThere = covered.toSeq.sorted
        .filter(rel => f.exists(new Path(s"$pairDir/$rel")))
      BatchStore.rewriteCovered(spark, labelDir,
        s"epoch=$ce/batch=0" +: stillThere)
    }
  }

  /** Some published signature batch holds rows OUTSIDE the bucketed
    * (`pb=*`) layout: the store was written (at least partly) by the
    * pre-bucketed code and needs [[compact]]'s migration before its
    * history is fully probeable. Checked per batch dir, so a migration
    * that crashed after publishing its bucketed compact partition (but
    * before deleting the flat originals) still reads as needing the
    * retry — while the first-batch band-write crash window (whose one
    * payload batch IS bucketed) does not. */
  private def legacyLayout(spark: SparkSession): Boolean = {
    val f = fs(spark)
    val batches = Option(f.globStatus(new Path(sigDir, "epoch=*/batch=*")))
      .toSeq.flatten.filter(_.isDirectory).map(_.getPath)
    batches.nonEmpty && {
      val bucketed = Option(f.globStatus(
          new Path(sigDir, "epoch=*/batch=*/pb=*"))).toSeq.flatten
        .map(_.getPath.getParent.toString).toSet
      batches.exists(p => !bucketed.contains(p.toString) &&
        BatchStore.hasDataFiles(f, p))
    }
  }

  /** Session-start compaction policy: compact when any store holds more
    * than `autoCompactAfter` COMPACTABLE batch dirs (0 = disabled;
    * replay-spared live-epoch dirs don't count — a threshold they
    * could trip would fire a compaction that cannot touch them), or
    * ALWAYS when the store was written by the pre-bucketed layout
    * ([[legacyLayout]]) — [[compact]] doubles as that migration, and an
    * unmigrated store's history is unprobeable. The sinks call this
    * BEFORE the first batch of a session with that batch's id as
    * `liveEpochSafeBelow` — the replay frontier: every earlier batch is
    * committed in the checkpoint log, so even a query that only ever
    * restarts from checkpoint (one epoch forever) gets its history
    * compacted. Session start is the one point where the single-writer
    * contract makes compaction free of coordination (no batch is
    * mid-flight, no recovered labeling holds lazy references yet).
    * Returns whether a compaction ran. */
  def maybeAutoCompact(spark: SparkSession,
                       liveEpochSafeBelow: Long = 0L): Boolean = {
    val f = fs(spark)
    val legacy = legacyLayout(spark)
    val over = autoCompactAfter > 0 && {
      val worst = Seq(sigDir, bandDir, pairDir).map { d =>
        Option(f.globStatus(new Path(d, "epoch=*/batch=*"))).toSeq.flatten
          .count(s => s.isDirectory &&
            !(s.getPath.getParent.getName == s"epoch=$epoch" &&
              BatchStore.batchIdOf(s.getPath) >= liveEpochSafeBelow))
      }.max
      worst > autoCompactAfter
    }
    (legacy || over) && { compact(spark, liveEpochSafeBelow); true }
  }
}
