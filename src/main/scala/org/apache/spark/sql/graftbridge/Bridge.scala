package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to spark-sql's package-private Column ↔ Expression converters
  * (org.apache.spark.sql.classic.ExpressionUtils is private[sql] in
  * Spark 4) — the supported pattern for libraries that ship custom
  * Catalyst expressions without going through the SQL function registry.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a custom Expression as a SQL temp function on a LIVE
    * session (sessionState is private[sql] — hence this bridge). The
    * config-time path is `spark.sql.extensions=graft.GraftExtensions`;
    * this is the equivalent for sessions that already exist. */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")

  /** All cut/pin block storage defaults to SERIALIZED
    * (MEMORY_AND_DISK_SER), not the deserialized default: a deserialized
    * block rides MemoryStore's `DeserializedValuesHolder`, whose
    * `SizeTracker` re-estimates the unroll vector by SAMPLING THE OBJECT
    * GRAPH (`SizeEstimator.estimate` → `sampleArray`, pointer-chasing per
    * sampled row) — JFR execution samples of a blown-up bench pass put
    * ~85% of the victim query's task CPU inside exactly that machinery,
    * and pointer-chasing is hypersensitive to memory-bandwidth contention
    * (stall cycles bill as thread CPU). A serialized block streams rows
    * into chunked byte buffers with an EXACT byte count — no estimator,
    * smaller footprint, cheaper spill — and UnsafeRow's Externalizable
    * form is a plain length+bytes copy.
    *
    * The trade is a per-RE-READ deserialization: read-many fixpoints
    * (rpq/anf/scan_clusters and the ReliableBattery's hash-aggregate
    * consumers) pay a bounded premium (+0.3-0.7s at sf0.1, measured in
    * PROGRESS round-14). `graft.lineage.pinStorage=deser` (Spark conf,
    * or the same-named JVM system property for runmain.sh-launched
    * mains) flips the whole engine back to deserialized blocks for
    * storm-free environments where re-read latency dominates. */
  def pinStorageLevel(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.storage.StorageLevel = {
    val v = spark.conf.getOption("graft.lineage.pinStorage")
      .orElse(sys.props.get("graft.lineage.pinStorage")).getOrElse("ser")
    v match {
      case "ser"   => org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
      case "deser" => org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      case other => throw new IllegalArgumentException(
        s"graft.lineage.pinStorage must be 'ser' or 'deser', got '$other'")
    }
  }

  /** Local checkpoint that does NOT inherit the parent plan's statistics.
    *
    * `Dataset.localCheckpoint` in Spark 4 rewrites the parent plan's
    * stats onto the new `LogicalRDD` (`LogicalRDD.rewriteStatsAndConstraints`,
    * sql/core ExistingRDD.scala). Inside an iterative fixpoint that is a
    * DRIVER-SIDE TIME BOMB: round N's sizeInBytes is a BigInt *product*
    * over round N−1's already-inherited stats, so the bit length roughly
    * doubles per round and by round ~25 the driver spends minutes in
    * BigInteger.multiplyToomCook3 per checkpoint (measured: 18s → 188s
    * inter-round gaps on a 600-row graph) — independent of data size.
    * Building the frame back from the raw RDD resets the stats to
    * `spark.sql.defaultSizeInBytes`, which is the honest estimate for a
    * fixpoint frontier anyway (its size is unknowable at plan time).
    * Same laziness as `localCheckpoint(eager = false)`: the RDD is
    * checkpoint-marked now and materialized by the round's first action.
    */
  def localCheckpointNoStats(df: org.apache.spark.sql.DataFrame,
                             eager: Boolean = false)
      : org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val spark = ds.sparkSession
    val rdd = ds.queryExecution.toRdd.map(_.copy())
    // persist first: RDD.localCheckpoint keeps a pre-set level's
    // serialized flag (LocalRDDCheckpointData.transformStorageLevel only
    // forces useDisk), whereas unset falls back to deserialized
    rdd.persist(pinStorageLevel(spark))
    rdd.localCheckpoint()
    if (eager) rdd.count()
    spark.internalCreateDataFrame(rdd, ds.schema)
  }

  /** Reliable (checkpoint-dir-backed) variant of [[localCheckpointNoStats]]:
    * same stats reset, same lazy semantics, but the materialized partitions
    * are written to `SparkContext.checkpointDir` (HDFS/S3 on a cluster), so
    * losing an executor mid-fixpoint re-reads the durable files instead of
    * dying on "lineage truncated and cannot be recomputed". Persisted
    * MEMORY_AND_DISK first per the RDD.checkpoint contract (otherwise the
    * checkpoint write recomputes the whole plan a second time). */
  def reliableCheckpointNoStats(df: org.apache.spark.sql.DataFrame,
                                eager: Boolean = false)
      : org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val spark = ds.sparkSession
    val rdd = ds.queryExecution.toRdd.map(_.copy())
    rdd.persist(pinStorageLevel(spark))
    rdd.checkpoint()
    if (eager) rdd.count()
    spark.internalCreateDataFrame(rdd, ds.schema)
  }

  /** Storage level for HOT pins — frames a fixpoint re-reads many times
    * per round (k-truss' peel table, coreness' live/edge state, the
    * basket table of the rules miner). Serialized blocks pay a full
    * deserialization per RE-READ; for these sites the r15 paired runs
    * measured +0.5-0.7s per query at sf0.1 under SER vs deser, while
    * the storm class SER protects against (MemoryStore SizeEstimator
    * sampling on UNROLL) bills per write, which hot read-many frames do
    * once. So: hot pins default to deserialized; an EXPLICIT global
    * `graft.lineage.pinStorage` (either value) still wins, so one knob
    * can force the whole engine storm-safe ('ser') or fast ('deser')
    * for artifact comparability. */
  def hotPinStorageLevel(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.storage.StorageLevel = {
    val explicit = spark.conf.getOption("graft.lineage.pinStorage")
      .orElse(sys.props.get("graft.lineage.pinStorage"))
    explicit match {
      case Some("ser")   => org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
      case Some("deser") => org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      case Some(other) => throw new IllegalArgumentException(
        s"graft.lineage.pinStorage must be 'ser' or 'deser', got '$other'")
      case None => org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    }
  }

  /** True when the frame is already a materialized leaf — a
    * checkpoint/pin scan (`LogicalRDD`), possibly under trivial
    * Project/SubqueryAlias wrappers. Lets loop bodies that defensively
    * `.cut` their inputs skip the redundant re-materialization when the
    * caller hands them an already-pinned frame: re-reading a pinned
    * block N times is a cheap block scan, re-CUTTING it per call writes
    * a whole fresh copy (the stream_incremental_components per-batch
    * tax, measured in PROGRESS round 15). Only DETERMINISTIC
    * Project/alias wrappers are stripped (Spark's own CollapseProject
    * guard): a projection carrying rand/uuid/
    * monotonically_increasing_id over a pinned leaf is NOT "already
    * materialized" — multi-read consumers would observe different
    * values per read, which is exactly what the pin exists to prevent.
    * Anything with a filter, join, or aggregate on top still cuts.
    *
    * CONTRACT — "materialized" means CHEAP TO RE-SCAN, not immutable:
    * a file-source leaf qualifies because re-reading its files is as
    * cheap as re-reading checkpoint blocks, but the files themselves
    * can be deleted out from under a live frame by directory mutation
    * (BatchStore.append's replay step-aside, compact, publishSnapshot's
    * snapshot prune). A caller pinning SPECIFICALLY to isolate a frame
    * from an upcoming mutation of the same directory must therefore NOT
    * route through an isTruncated skip — use an explicit eager
    * checkpoint (`Lineage.pinned(df, eager = true)` / `.cutEager`, which
    * never consult this) the way the growing-components recovery path
    * does before its replay can overwrite the pair store it recovered
    * from (StreamingSpec "replay overwrite" pins that). The skip sites
    * here (Dedup.pinned, the incremental-CC fold) all consume their
    * input within the same step that produced it, before any mutation
    * of the backing directory can run. */
  def isTruncated(df: org.apache.spark.sql.DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias}
    @annotation.tailrec
    def strip(p: LogicalPlan): LogicalPlan = p match {
      case Project(projectList, child) if projectList.forall(_.deterministic) =>
        strip(child)
      case SubqueryAlias(_, child) => strip(child)
      case other                   => other
    }
    strip(df.queryExecution.analyzed) match {
      case _: org.apache.spark.sql.execution.LogicalRDD => true
      // a bare FILE-source scan is materialized BY DEFINITION — the
      // files are the checkpoint. The persisted growing sinks hand the
      // incremental-CC fold parquet-backed labelings every micro-batch;
      // re-cutting those wrote a full localCheckpoint copy of the
      // labeling per batch for nothing (re-reading a parquet leaf per
      // consumer is a cheap scan). Only FILE relations qualify: a JDBC
      // or other external LogicalRelation re-executes its source query
      // per read and can observe different rows across the multi-read
      // consumers the pin protects — those still cut. Any
      // filter/join/agg above still cuts too (deterministic projections
      // are stripped above, same as for pinned leaves).
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation.isInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation]
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        r.table.isInstanceOf[
          org.apache.spark.sql.execution.datasources.v2.FileTable]
      case _ => false
    }
  }

  /** Drain the async listener bus (private[spark]) — snapshotting
    * listener-accumulated task metrics right after an action otherwise
    * races the bus and attributes late task-end events to the NEXT
    * query's window. */
  def waitListenerBus(spark: org.apache.spark.sql.SparkSession,
                      timeoutMs: Long = 10000L): Unit =
    try spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }

  /** Plan-only cut: rebuilds the frame as a `LogicalRDD` leaf (small SQL
    * plan, stats reset to the default prior — the compounding-BigInt stat
    * bomb is defused) WITHOUT truncating RDD lineage. The RDD chain stays
    * recomputable back to the last durable checkpoint, which is what the
    * intermediate rounds of an interval-checkpointed fixpoint need: cut the
    * plan every round, pay the durable write every Nth. Persisted so the
    * round's multiple consumers don't recompute it. */
  def planCutNoStats(df: org.apache.spark.sql.DataFrame,
                     eager: Boolean = false)
      : org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val spark = ds.sparkSession
    val rdd = ds.queryExecution.toRdd.map(_.copy())
    rdd.persist(pinStorageLevel(spark))
    if (eager) rdd.count()
    spark.internalCreateDataFrame(rdd, ds.schema)
  }
}
