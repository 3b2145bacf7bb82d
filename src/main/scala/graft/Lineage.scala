package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graftbridge.Bridge

/** Lineage truncation for iterative fixpoints.
  *
  * `Dataset.localCheckpoint` rewrites the parent plan's STATISTICS onto
  * the checkpointed frame (Spark 4 `LogicalRDD.rewriteStatsAndConstraints`).
  * Fine once; inside a loop it compounds: round N's join-product
  * sizeInBytes is a BigInt product over round N−1's inherited stats, so
  * the bit length ~doubles per round and past ~20 rounds the DRIVER
  * stalls for minutes in BigInteger multiplication per checkpoint —
  * regardless of data size (measured 18s → 188s inter-round gaps on a
  * 600-row graph; every pre-round-7 fixpoint here survived only because
  * it converged in ≲15 rounds). `cut` checkpoints WITHOUT inheriting
  * stats: the frame re-enters the plan at `spark.sql.defaultSizeInBytes`,
  * the honest prior for a frontier whose size is unknowable at plan
  * time; AQE re-plans joins from the REAL runtime sizes anyway, which is
  * where broadcast decisions belong in a loop. Use inside every
  * per-round checkpoint; loop-INIT frames can keep `localCheckpoint`
  * (one bounded inheritance, no compounding).
  */
object Lineage {
  implicit final class CutOps(private val df: DataFrame) extends AnyVal {
    /** Lazy lineage+stats cut — drop-in for `.localCheckpoint(false)`. */
    def cut: DataFrame = Bridge.localCheckpointNoStats(df)
    /** Eager variant — drop-in for `.localCheckpoint()` / `(true)`. */
    def cutEager: DataFrame = Bridge.localCheckpointNoStats(df, eager = true)
  }
}
