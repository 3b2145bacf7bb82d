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
    * in `older` tagged "removed" (detect_deviations.py:70-117).
    *
    * States whose property sets differ refuse with the reference's
    * wording (detect_deviations.py:85-86 raises ValueError "State
    * properties do not match." before comparing) — without the guard a
    * schema-evolved state pair dies in exceptAll with an opaque
    * analysis error instead of naming the real problem. */
  def diff(older: DataFrame, newer: DataFrame): DataFrame = {
    require(older.columns.sorted.sameElements(newer.columns.sorted),
      "State properties do not match. (older: " +
        s"${older.columns.sorted.mkString(",")}; newer: " +
        s"${newer.columns.sorted.mkString(",")})")
    // exceptAll matches columns by POSITION — align both sides to the
    // older state's column order so a reordered-but-equal state pair
    // compares the right fields against each other
    val order = older.columns.toSeq
    val o = canonicalize(older)
    val n = canonicalize(newer.select(order.map(col): _*))
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

  // --- shortcuts: named aliases for recorded states (reference
  // driftdetect/add_shortcut.py + shortcut.py: a per-query shortcut
  // file maps alias -> state filename; adding resolves the target
  // through existing shortcuts ONE level, rejects an alias that names a
  // real state file, and replaces an existing alias) ---

  private def shortcutsPath(registryDir: String, query: String) =
    s"$registryDir/$query/_shortcuts"

  /** The alias → tag map recorded for `query` (empty when none). Stored
    * as a two-column parquet beside the states; the leading underscore
    * keeps it out of [[listStates]]' numeric-tag listing. */
  def shortcuts(spark: org.apache.spark.sql.SparkSession, registryDir: String,
                query: String): Map[String, String] = {
    val path = new org.apache.hadoop.fs.Path(shortcutsPath(registryDir, query))
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Map.empty
    else spark.read.parquet(path.toString).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
  }

  /** Register `alias` for `target` on `query`'s state registry. `target`
    * is a recorded tag or an existing alias (resolved one level at write
    * time, like the reference's `shortcuts.get(filename, filename)` —
    * chains never form, so reads are a single map lookup). Fails loudly
    * when the alias shadows a real state tag or the resolved target
    * doesn't exist; re-adding an alias replaces it. */
  def addShortcut(spark: org.apache.spark.sql.SparkSession, registryDir: String,
                  query: String, alias: String, target: String): Unit = {
    require(scala.util.Try(alias.toLong).isFailure,
      s"alias '$alias' would shadow a numeric state tag")
    val existing = shortcuts(spark, registryDir, query)
    val resolved = existing.getOrElse(target, target)
    val tags = listStates(spark, registryDir, query).map(_.toString).toSet
    require(tags.contains(resolved),
      s"state '$resolved' not found for query '$query' (have: ${tags.toSeq.sorted.mkString(", ")})")
    val merged = (existing + (alias -> resolved)).toSeq
    import spark.implicits._
    merged.toDF("alias", "tag").coalesce(1)
      .write.mode("overwrite").parquet(shortcutsPath(registryDir, query))
  }

  /** Resolve a state name through the shortcut map: aliases map to their
    * tag, anything else passes through untouched. */
  def resolveState(spark: org.apache.spark.sql.SparkSession, registryDir: String,
                   query: String, name: String): String =
    shortcuts(spark, registryDir, query).getOrElse(name, name)

  /** Diff two recorded states of `query` BY NAME, aliases welcome on
    * either side — the reference get-drift path once shortcuts exist. */
  def diffNamed(spark: org.apache.spark.sql.SparkSession, registryDir: String,
                query: String, older: String, newer: String): DataFrame =
    diffStates(spark, s"$registryDir/$query",
      resolveState(spark, registryDir, query, older),
      resolveState(spark, registryDir, query, newer))

  // --- retention policy over recorded states ---

  /** Snapshot retention marks for a state registry: per query keep the
    * `keepLast` most recent tags ("recent") plus the newest tag of
    * every epoch week ("weekly"), drop the rest — the standard
    * recent-fine/older-coarse GC ladder a drift registry needs once
    * every sync appends a state (the reference keeps state files
    * forever; at one state per sync per query that is unbounded
    * storage). Tags are epoch seconds. Pure function of the input —
    * marks are advisory; the caller deletes.
    *
    * All windows are PARTITIONED (by query / by (query, week)):
    * nothing data-sized crosses a single task. Output: (query, tag,
    * keep, reason ∈ recent | weekly | drop), reason priority
    * recent > weekly. */
  def retentionPolicy(states: DataFrame, keepLast: Int): DataFrame = {
    require(keepLast >= 1, "keepLast must be positive")
    val wRecent = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query")).orderBy(col("tag").desc)
    val wWeek = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query"), expr("tag div 604800"))
      .orderBy(col("tag").desc)
    states.select(col("query"), col("tag").cast("long").as("tag"))
      .withColumn("_rn", row_number().over(wRecent))
      .withColumn("_wn", row_number().over(wWeek))
      .select(col("query"), col("tag"),
        when(col("_rn") <= keepLast, lit("recent"))
          .when(col("_wn") === 1, lit("weekly"))
          .otherwise(lit("drop")).as("reason"))
      .withColumn("keep", col("reason") =!= "drop")
      .select(col("query"), col("tag"), col("keep"), col("reason"))
  }

  // --- reporter (reference driftdetect/reporter.py: the human-readable
  // drift summary — query name, then each deviation as "field : value"
  // lines, additions under "New Query Results:", removals under
  // "Missing Query Results:") ---

  /** Render a [[diff]] result in the reference reporter's format. The
    * collect is BOUNDED: at most `maxRows` deviations per direction are
    * rendered (a drift report is for humans; the full set stays in the
    * DataFrame), with a truncation line when the cap bites. */
  def report(diffed: DataFrame, stateName: String, maxRows: Int = 1000): String = {
    require(maxRows >= 1, "maxRows must be positive")
    val props = diffed.columns.filterNot(_ == "direction")
    def section(direction: String, title: String): Seq[String] = {
      val rows = diffed.filter(col("direction") === direction)
        .select(props.map(col).toSeq: _*)
        .orderBy(props.map(col).toSeq: _*)
        .limit(maxRows + 1).collect()
      if (rows.isEmpty) Nil
      else {
        val shown = rows.take(maxRows).toSeq.flatMap { r =>
          props.zipWithIndex.map { case (p, i) =>
            s"$p :  ${Option(r.get(i)).map(_.toString).getOrElse("null")}"
          } :+ ""
        }
        val trunc = if (rows.length > maxRows)
          Seq(s"... (truncated at $maxRows results)") else Nil
        (title +: "" +: shown) ++ trunc
      }
    }
    ((s"Query Name:  $stateName" +: "" +:
      section("added", "New Query Results:")) ++
      section("removed", "Missing Query Results:")).mkString("\n")
  }
}
