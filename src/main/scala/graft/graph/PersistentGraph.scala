package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Lineage._

/** Durable graph tables: one partitioned parquet table per label under a
  * store directory, synced incrementally.
  *
  * This is the at-rest shape the in-memory [[Graph]] flows into at 100 TB:
  * node tables partitioned by the tenant column (the sub-resource scope),
  * so that
  *   - a sync of one tenant merges against ONLY that tenant's partitions
  *     (partition pruning on read), and
  *   - the write rewrites ONLY the touched partitions
  *     (`spark.sql.sources.partitionOverwriteMode=dynamic`) — a 1000-tenant
  *     store syncing one tenant touches 1/1000th of the files.
  * Cleanup is the same stale-tag filter, applied within the synced
  * partitions during the rewrite — no separate delete pass at all.
  *
  * On Delta the same operator is `MERGE INTO ... WHEN NOT MATCHED BY
  * SOURCE AND t.tenant = :id THEN DELETE`; this is the plain-parquet
  * equivalent with identical semantics.
  */
class PersistentGraph(spark: SparkSession, storeDir: String) {

  private def path(label: String): String = s"$storeDir/nodes_$label"

  def exists(label: String): Boolean =
    new java.io.File(path(label)).exists()

  def readNodes(label: String): DataFrame = spark.read.parquet(path(label))

  /** Sync one tenant's batch into the label's table:
    * read only the tenant's partitions → merge (firstseen/lastupdated/
    * null-overwrite semantics) → stale-tag cleanup → dynamic-overwrite the
    * touched partitions. Batch rows must all belong to `tenantValue`. */
  def syncTenant(label: String, tenantCol: String, tenantValue: String,
                 batch: DataFrame, tag: Long): Unit = {
    val withTenant = batch.withColumn(tenantCol, lit(tenantValue))
    val merged =
      if (!exists(label)) GraphStore.initialLoad(withTenant, Seq(GraphStore.ID), tag)
      else {
        val current = readNodes(label).filter(col(tenantCol) === tenantValue)
        GraphStore.cleanup(
          GraphStore.merge(current, withTenant, Seq(GraphStore.ID), tag), tag)
      }
    val ordered = merged.select(
      (merged.columns.filterNot(_ == tenantCol).map(col) :+ col(tenantCol)).toSeq: _*)
    // The merged plan READS the same path it is about to overwrite: an
    // eager localCheckpoint materializes the result before the first file
    // is touched, so a mid-write failure can no longer combine with lazy
    // re-reads to lose the tenant's partition. (On Delta this whole method
    // is a transactional MERGE; this is the plain-parquet mitigation.
    // Concurrent external readers still need table-format isolation.)
    val materialized =
      if (exists(label)) ordered.pinEager else ordered
    val writer = materialized.write.mode("overwrite").partitionBy(tenantCol)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    writer.parquet(path(label))
  }

  /** Crash-safe variant of [[syncTenant]]: the tenant's new partition is
    * fully written to a dot-prefixed STAGING directory inside the table
    * (invisible to Spark's file index), then swapped in with two
    * same-filesystem renames — old partition aside, staging into place —
    * and the old data deleted last. A failure at any point leaves a
    * complete copy of either the old or the new partition on disk
    * (the in-place overwrite of [[syncTenant]] can lose the partition if
    * the job dies mid-write). On entry the method REPAIRS a previous
    * crash: if the live dir is absent but a recovery copy from an earlier
    * run exists, the copy is restored before the current rows are read, so
    * a re-run merges against the old data instead of an empty partition
    * (a crash in the swap window would otherwise silently drop the
    * tenant's firstseen/stale-cleanup lineage). Leftover recovery dirs
    * from prior tags are swept after a successful swap. The swap window
    * where the live dir is momentarily absent is the residual read-
    * isolation gap only a transactional table format (Delta/Iceberg)
    * closes completely.
    *
    * Tenant values must be partition-path-safe (no characters Hive-style
    * layouts escape). */
  def syncTenantAtomic(label: String, tenantCol: String, tenantValue: String,
                       batch: DataFrame, tag: Long): Unit = {
    if (!exists(label)) { syncTenant(label, tenantCol, tenantValue, batch, tag); return }
    recoverPartition(label, tenantCol, tenantValue)
    val withTenant = batch.withColumn(tenantCol, lit(tenantValue))
    val current = readNodes(label).filter(col(tenantCol) === tenantValue)
    val merged = GraphStore.cleanup(
      GraphStore.merge(current, withTenant, Seq(GraphStore.ID), tag), tag)
    import org.apache.hadoop.fs.{Path => HPath}
    val table = new HPath(path(label))
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new HPath(table, s"$tenantCol=$tenantValue")
    val staging = new HPath(table, s".staging-$tag-$tenantValue")
    val retired = new HPath(table, s".retired-$tag-$tenantValue")
    // partitioned layout stores the tenant column in the dir name, not
    // the files — drop it before writing the staging copy
    merged.drop(tenantCol).pinEager
      .write.mode("overwrite").parquet(staging.toString)
    if (fs.exists(live) && !fs.rename(live, retired))
      throw new java.io.IOException(s"could not retire $live")
    if (!fs.rename(staging, live))
      throw new java.io.IOException(s"could not activate $staging")
    fs.delete(retired, true)
    // the staging write leaves a _SUCCESS marker inside the live dir;
    // harmless to parquet readers, deleted for cleanliness
    fs.delete(new HPath(live, "_SUCCESS"), false)
    sweepRecoveryDirs(fs, table, tenantValue, keepTag = tag)
  }

  /** Crash repair for [[syncTenantAtomic]]: if the live partition dir is
    * absent but a dot-prefixed recovery copy exists, restore it. A
    * `.retired-*` copy (crash between retire and activate) holds the old
    * rows and is preferred — the re-run re-merges the batch on top; with
    * only a `.staging-*` copy left the staged merge result itself is the
    * most complete data available and is activated as-is. Newest tag wins
    * when several crashes stacked up. */
  private def recoverPartition(label: String, tenantCol: String,
                               tenantValue: String): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    val table = new HPath(path(label))
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new HPath(table, s"$tenantCol=$tenantValue")
    if (fs.exists(live)) return
    def candidates(prefix: String): Seq[(Long, HPath)] =
      fs.globStatus(new HPath(table, s".$prefix-*-$tenantValue")).toSeq
        .flatMap { st =>
          val name = st.getPath.getName.stripPrefix(s".$prefix-")
            .stripSuffix(s"-$tenantValue")
          scala.util.Try(name.toLong).toOption.map(_ -> st.getPath)
        }
    val pick = (candidates("retired") ++ candidates("staging"))
      .sortBy { case (t, p) => (!p.getName.startsWith(".retired"), -t) }
      .headOption
    pick.foreach { case (_, from) =>
      if (!fs.rename(from, live))
        throw new java.io.IOException(s"could not restore recovery copy $from")
      fs.delete(new HPath(live, "_SUCCESS"), false)
    }
  }

  /** Delete leftover `.retired-*`/`.staging-*` recovery dirs of this tenant
    * from earlier (crashed) tags, keeping any from the current tag. */
  private def sweepRecoveryDirs(fs: org.apache.hadoop.fs.FileSystem,
                                table: org.apache.hadoop.fs.Path,
                                tenantValue: String, keepTag: Long): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    Seq("retired", "staging").foreach { prefix =>
      fs.globStatus(new HPath(table, s".$prefix-*-$tenantValue")).foreach { st =>
        if (st.getPath.getName != s".$prefix-$keepTag-$tenantValue")
          fs.delete(st.getPath, true)
      }
    }
  }
}

/** Skew handling for joins whose key distribution is pathological (one
  * tenant owning half the assets): salt the skewed side into `salt`
  * sub-keys and explode the build side across them, restoring uniform
  * partition sizes. AQE's skew-join handles moderate cases at runtime;
  * salting is the explicit fix when a single key exceeds one executor.
  */
object Skew {
  /** Inner equi-join `left.key = right.key` with the left side salted.
    * The salt is `xxhash64(saltBy) mod salt` — `saltBy` should be a
    * (near-)unique column of the left side (a row id), giving uniform
    * sub-keys WITHOUT rand(): a hash of row content is deterministic
    * under any partitioning/re-execution, where a seeded rand() silently
    * changes with the partition layout and breaks byte reproducibility.
    * Defaults to hashing every left column (rows are near-unique →
    * near-uniform salts even when the join key is pathologically hot). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salt: Int, saltBy: Option[Column] = None): DataFrame = {
    val saltExpr = saltBy.getOrElse(xxhash64(left.columns.map(col).toSeq: _*))
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(saltExpr), lit(salt.toLong)).cast("int"))
    val explodedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedLeft.join(explodedRight, Seq(key, "_salt"), "inner").drop("_salt")
  }

  /** Skew diagnosis report — the measurement that DECIDES when
    * [[saltedJoin]] is worth its replication cost: the `topK` heaviest
    * join-key values with exact ppm share and the salt factor that
    * would spread each across `parallelism` tasks
    * (`ceil(cnt · parallelism / total)`, floor 1 — a key under 1/Pth
    * of the table needs no salt). One census agg + a top-k under the
    * total order (count desc, key asc); run it on the key census, not
    * the advice of a sampled guess. */
  def skewReport(df: DataFrame, keyCol: Column, parallelism: Int,
                 topK: Int): DataFrame = {
    require(parallelism >= 1 && topK >= 1, "need parallelism, topK >= 1")
    val census = df.groupBy(keyCol.cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
      .pin
    val total = census.agg(sum(col("cnt")).as("_total"))
    census.crossJoin(broadcast(total))
      .select(col("key"), col("cnt"),
        expr("cnt * 1000000 div _total").as("share_ppm"),
        greatest(lit(1L),
          expr(s"(cnt * $parallelism + _total - 1) div _total")).as("salt"))
      .orderBy(col("cnt").desc, col("key"))
      .limit(topK)
  }
}
