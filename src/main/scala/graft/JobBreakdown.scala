package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Diagnostic main: run one named SparkEntry query and print every Spark
  * job's wall time with its call site, so a micro-batch-heavy gate's
  * fixed overhead can be attributed job by job (guide §1.5/§7.1 — the
  * UI is disabled in this harness, so this is the stage/job census).
  * Usage: runmain graft.JobBreakdown <queryName> [passes]
  */
object JobBreakdown {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val passes = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "16384")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class J(id: Int, t0: Long, site: String, var wall: Double = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[J]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short")))).getOrElse("?")
        val j = J(e.jobId, System.nanoTime(), site)
        jobs.put(e.jobId, j); order.add(j); ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId)
        if (j != null) j.wall = (System.nanoTime() - j.t0) / 1e9
      }
    })

    val fn = SparkEntry.queries(name)
    (1 to passes).foreach { p =>
      order.clear(); jobs.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graftbridge.Bridge.waitListenerBus(spark)
      import scala.jdk.CollectionConverters._
      val js = order.asScala.toSeq
      println(f"== pass $p%d  wall=$dt%.2f s  jobs=${js.size}%d  jobwall=${js.map(_.wall).sum}%.2f")
      if (p == passes) {
        js.foreach(j => println(f"  job ${j.id}%4d ${j.wall}%7.3f  ${j.site}%s"))
        // aggregate by site
        println("-- by site:")
        js.groupBy(_.site).view.mapValues(v => (v.size, v.map(_.wall).sum)).toSeq
          .sortBy(-_._2._2)
          .foreach { case (s, (n, w)) => println(f"  $w%7.2f s  n=$n%3d  $s%s") }
      }
      DriverHygiene.releasePersisted(spark)
    }
    spark.stop()
  }
}
