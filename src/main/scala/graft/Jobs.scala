package graft

import org.apache.spark.sql.SparkSession

/** Job labeling (guide §1.5): multi-job operators (streaming sinks,
  * iterative fixpoints) set a description per phase so a job census can
  * attribute wall time to operator phases instead of one opaque
  * `start at ...` call site. Descriptions are thread-local; the restore
  * keeps nesting safe (outer description survives an inner block).
  */
object Jobs {
  def described[T](spark: SparkSession, d: String)(body: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(d)
    try body finally sc.setJobDescription(prev)
  }
}
