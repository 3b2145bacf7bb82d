package graft.sources

import scala.annotation.tailrec
import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Extraction-side resilience — the reference's retry / region-skip /
  * page-cap machinery, re-expressed for connector code that runs on the
  * driver or inside `mapPartitions` tasks.
  *
  * (reference: cartography/client/core/tx.py:164-275 `_run_with_retry`,
  * cartography/util.py:652-762 `aws_handle_regions`,
  * cartography/util.py:519-614 paginator with DEFAULT_MAX_PAGES.)
  */
object Resilience {

  /** Exceptions the reference classifies as transient and retries with
    * exponential backoff (tx.py:44-163: TransientError,
    * ServiceUnavailable, throttling). Pluggable here. */
  def defaultTransient(e: Throwable): Boolean = {
    val m = Option(e.getMessage).getOrElse("")
    m.contains("Throttl") || m.contains("transient") || m.contains("unavailable") ||
      m.contains("429") || m.contains("503")
  }

  /** Retry with exponential backoff; non-transient errors propagate
    * immediately (tx.py:164-275). `sleep` injectable for tests. */
  def retryWithBackoff[T](maxAttempts: Int = 5, baseDelayMs: Long = 100,
                          isTransient: Throwable => Boolean = defaultTransient,
                          sleep: Long => Unit = Thread.sleep)(f: () => T): T = {
    @tailrec def go(attempt: Int): T = {
      val r = try Right(f()) catch {
        case NonFatal(e) if isTransient(e) && attempt < maxAttempts => Left(e)
      }
      r match {
        case Right(v) => v
        case Left(_) =>
          sleep(baseDelayMs * (1L << (attempt - 1)))
          go(attempt + 1)
      }
    }
    go(1)
  }

  /** Per-region fan-out with skip-on-access-error: fetch each region,
    * drop regions whose fetch fails the `skippable` test (AccessDenied /
    * unsupported region), fail hard otherwise (util.py:652-762). Returns
    * (region, rows) for the regions that answered. */
  def fetchRegions[T](regions: Seq[String],
                      skippable: Throwable => Boolean =
                        e => Option(e.getMessage).exists(_.contains("AccessDenied")))
                     (fetch: String => Seq[T]): Seq[(String, Seq[T])] =
    regions.flatMap { region =>
      try Some(region -> fetch(region))
      catch {
        case NonFatal(e) if skippable(e) => None
      }
    }

  /** Page-capped pagination: pull pages until the token runs out or the
    * cap is hit — the runaway-pagination bound (util.py:64
    * DEFAULT_MAX_PAGES=10000). Returns (rows, truncated). */
  def paginate[T](maxPages: Int = 10000)
                 (fetchPage: Option[String] => (Seq[T], Option[String])): (Seq[T], Boolean) = {
    val out = Seq.newBuilder[T]
    var token: Option[String] = None
    var pages = 0
    var more = true
    while (more && pages < maxPages) {
      val (rows, next) = fetchPage(token)
      out ++= rows
      token = next
      pages += 1
      more = next.isDefined
    }
    (out.result(), more)
  }

  /** Distributed fan-out fetch: one fetch per work item, executed inside
    * `mapPartitions` with the retry wrapper — the Spark form of the
    * reference's asyncio/thread-pool extraction (SURVEY §2.1:
    * ecr_image_layers.py aioboto3 fan-out, GCP ThreadPoolExecutor).
    * Parallelism = partition count of the work-item Dataset; repartition
    * it to bound concurrent connections against the upstream API. */
  def fetchDistributed[I, O : org.apache.spark.sql.Encoder](
      items: org.apache.spark.sql.Dataset[I], maxAttempts: Int = 5,
      baseDelayMs: Long = 100)(fetch: I => Seq[O]): org.apache.spark.sql.Dataset[O] =
    items.mapPartitions { it =>
      it.flatMap { i =>
        retryWithBackoff(maxAttempts, baseDelayMs)(() => fetch(i))
      }
    }

  /** Lift driver-fetched records into a DataFrame — the boundary where
    * connector output enters the distributed plan. For high-volume APIs
    * the fetch itself moves into `mapPartitions` over a work-item
    * DataFrame (SURVEY §2.1 async fan-out) with the same retry wrapper. */
  def toDataFrame[T <: Product : reflect.runtime.universe.TypeTag](
      spark: SparkSession, rows: Seq[T]): DataFrame = {
    import spark.implicits._
    spark.createDataset(rows)(org.apache.spark.sql.Encoders.product[T]).toDF()
  }
}
