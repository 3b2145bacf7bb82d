package graft

import org.apache.spark.sql.SparkSession

/** Shared inter-query hygiene for the long-lived driver mains
  * (Bench/Verify/ScaleSmoke): drop blocks a query left persisted (lazy
  * localCheckpoints in the iterative operators) and optionally force a
  * GC so the ContextCleaner releases dead shuffles/broadcasts NOW
  * instead of pausing inside a later query's timed section (the
  * round-5 bench-spike root cause — see PROGRESS.md). */
object DriverHygiene {
  def releasePersisted(spark: SparkSession, gc: Boolean = true): Unit = {
    // blocking=true: async block removal otherwise races into the NEXT
    // query's timed section and shows up as phantom per-query drift.
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    if (gc) System.gc()
  }
}
