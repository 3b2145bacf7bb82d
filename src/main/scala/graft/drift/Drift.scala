package graft.drift

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Drift detection: snapshot a query's result set, diff two snapshots in
  * both directions (reference: cartography/driftdetect/model.py:7-33,
  * get_states.py:142-173, detect_deviations.py:70-117).
  *
  * The reference stringifies rows, canonicalizes list fields with
  * `"|".join(sorted(...))`, sorts, and takes Python set differences; here
  * snapshots are DataFrames (persisted as parquet between runs) and the
  * two set differences are `exceptAll` — distributed, no driver collect.
  */
object Drift {

  /** Canonicalize a snapshot the way the reference does: array columns
    * become sorted "|"-joined strings (get_states.py:164-173), everything
    * else cast to string. */
  def canonicalize(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: org.apache.spark.sql.types.ArrayType =>
          array_join(array_sort(col(f.name).cast("array<string>")), "|").as(f.name)
        case _ => col(f.name).cast("string").as(f.name)
      }
    }
    df.select(cols.toSeq: _*)
  }

  /** Both-direction diff: rows only in `newer` tagged "added", rows only
    * in `older` tagged "removed" (detect_deviations.py:70-117). */
  def diff(older: DataFrame, newer: DataFrame): DataFrame = {
    val o = canonicalize(older)
    val n = canonicalize(newer)
    n.exceptAll(o).withColumn("direction", lit("added"))
      .unionByName(o.exceptAll(n).withColumn("direction", lit("removed")))
  }

  /** Persist a named snapshot (the reference's JSON state files,
    * get_states.py:111-141 — parquet here; the canonical string form
    * makes snapshots schema-stable across engine versions). */
  def saveState(df: DataFrame, stateDir: String, name: String): Unit =
    canonicalize(df).write.mode("overwrite").parquet(s"$stateDir/$name")

  def loadState(spark: org.apache.spark.sql.SparkSession, stateDir: String,
                name: String): DataFrame =
    spark.read.parquet(s"$stateDir/$name")

  /** Diff two persisted snapshots of the same query (detect_deviations
    * CLI path). */
  def diffStates(spark: org.apache.spark.sql.SparkSession, stateDir: String,
                 olderName: String, newerName: String): DataFrame =
    diff(loadState(spark, stateDir, olderName), loadState(spark, stateDir, newerName))

  // --- state registry lifecycle (reference get_states.py:111-141: one
  // directory per detector/query, one timestamp-named state file per
  // sync; listing orders states so "diff the two most recent" needs no
  // extra bookkeeping) ---

  /** Record a new state for `query` under the registry, named by the sync
    * tag (reference add_state: state files named by timestamp). */
  def addState(df: DataFrame, registryDir: String, query: String, tag: Long): Unit =
    saveState(df, s"$registryDir/$query", tag.toString)

  /** Tags of the recorded states for `query`, ascending. Uses the Hadoop
    * FS API so the registry can live on any cluster filesystem. */
  def listStates(spark: org.apache.spark.sql.SparkSession, registryDir: String,
                 query: String): Seq[Long] = {
    val path = new org.apache.hadoop.fs.Path(s"$registryDir/$query")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Nil
    else fs.listStatus(path).toSeq.filter(_.isDirectory)
      .flatMap(s => scala.util.Try(s.getPath.getName.toLong).toOption)
      .sorted
  }

  /** Drift between the two most recent recorded states of `query`
    * (reference detect_deviations default: latest pair). Requires ≥2
    * states. */
  def diffLatest(spark: org.apache.spark.sql.SparkSession, registryDir: String,
                 query: String): DataFrame = {
    val tags = listStates(spark, registryDir, query)
    require(tags.size >= 2,
      s"drift for '$query' needs at least two recorded states, found ${tags.size}")
    diffStates(spark, s"$registryDir/$query",
      tags(tags.size - 2).toString, tags.last.toString)
  }

  /** Per-bucket content checksums of a snapshot — the Merkle-style
    * summary two replicas exchange to find WHERE they diverge without
    * shipping rows (the anti-entropy pattern: at 100 TB a replication
    * check that compares tables row-by-row moves the whole table; one
    * that compares `nBuckets` (hash-sum, count) pairs moves kilobytes,
    * then drills into only the differing buckets). Bucket = content
    * hash of the key mod nBuckets; checksum = SUM of 56-bit row-content
    * hashes — commutative and associative, so it is partitioning- and
    * order-independent, mergeable across shards, and exact for
    * detecting ANY row difference up to hash collision (two differing
    * buckets whose hash SUMS collide — 2^-56-grade, same failure class
    * every checksum-based sync accepts). */
  def blockSummary(df: DataFrame, keyCol: String, contentCols: Seq[String],
                   nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, "nBuckets must be positive")
    import graft.functions.HashFunctions.md5_prefix64
    // "|" separator prevents field-boundary aliasing; decimal sum keeps
    // the 56-bit-hash checksum exact (an ANSI long sum would overflow at
    // ~128 rows per bucket)
    val sig = md5_prefix64(concat_ws("|",
      (keyCol +: contentCols).map(c => col(c).cast("string")): _*))
    df.select(pmod(md5_prefix64(col(keyCol).cast("string")), lit(nBuckets.toLong))
        .as("bucket"), sig.as("sig"))
      .groupBy(col("bucket"))
      .agg(sum(col("sig").cast("decimal(38,0)")).as("checksum"),
        count(lit(1)).as("n_rows"))
  }

  /** Block-pruned snapshot diff: compare [[blockSummary]] checksums,
    * then resolve ONLY the differing buckets row-by-row — rows whose
    * (key, content) signature has no counterpart on the other side,
    * tagged by direction like [[diff]]. Semantically identical to the
    * full diff (bucket pruning only skips provably-equal buckets), so a
    * plain set-difference oracle checks it; the plan only ever rescans
    * the diverged fraction of each snapshot. */
  def blockDiff(a: DataFrame, b: DataFrame, keyCol: String,
                contentCols: Seq[String], nBuckets: Int): DataFrame = {
    import graft.functions.HashFunctions.md5_prefix64
    val sa = blockSummary(a, keyCol, contentCols, nBuckets)
    val sb = blockSummary(b, keyCol, contentCols, nBuckets)
    val diverged = sa.join(sb, Seq("bucket"), "full_outer")
      .filter(sa("checksum").isNull || sb("checksum").isNull ||
        sa("checksum") =!= sb("checksum") || sa("n_rows") =!= sb("n_rows"))
      .select(col("bucket"))
    def rows(df: DataFrame) = df.select(
      pmod(md5_prefix64(col(keyCol).cast("string")), lit(nBuckets.toLong)).as("bucket"),
      col(keyCol).cast("string").as("key"),
      md5_prefix64(concat_ws("|",
        (keyCol +: contentCols).map(c => col(c).cast("string")): _*)).as("sig"))
      .join(diverged, Seq("bucket"), "left_semi")
    rows(b).join(rows(a), Seq("key", "sig"), "left_anti")
      .select(col("key"), lit("added").as("direction"))
      .unionByName(rows(a).join(rows(b), Seq("key", "sig"), "left_anti")
        .select(col("key"), lit("removed").as("direction")))
  }
}
