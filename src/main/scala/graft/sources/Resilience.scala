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

  /** Structured provider client error — the (code, message) pair the
    * reference's classification reads off `botocore ClientError.response
    * ["Error"]`. Connector code throws these so classification does not
    * have to string-scrape arbitrary exceptions. */
  final case class ClientError(code: String, message: String)
    extends RuntimeException(s"$code: $message")

  /** Error codes that degrade a regional failure to a regional skip
    * (util.py:595-606 AWS_REGION_ACCESS_DENIED_ERROR_CODES). */
  val RegionAccessDeniedCodes: Set[String] = Set(
    "AccessDenied", "AccessDeniedException", "AuthFailure",
    "AuthorizationError", "AuthorizationErrorException",
    "InvalidClientTokenId", "UnauthorizedOperation",
    "UnrecognizedClientException", "InternalServerErrorException",
    "SubscriptionRequiredException")

  /** Message snippets that mark an UnknownOperationException as
    * regional unavailability (util.py:608-612). */
  val RegionUnsupportedOperationSnippets: Seq[String] = Seq(
    "not supported in the called region",
    "not supported in this region",
    "unsupported in this region")

  /** UnknownOperationException + an explicit regional-unavailability
    * message (util.py:615-628 `_is_region_unsupported_unknown_operation`
    * — code must match exactly and the message must carry one of the
    * snippets, case-insensitively). */
  def isRegionUnsupportedUnknownOperation(code: Option[String],
                                          message: Option[String]): Boolean =
    code.contains("UnknownOperationException") &&
      message.filter(_.nonEmpty).exists { m =>
        val lowered = m.toLowerCase
        RegionUnsupportedOperationSnippets.exists(lowered.contains)
      }

  /** The shared skip classification (util.py:630-649
    * `is_aws_region_skippable_client_error`): regional unavailability or
    * regional access denial — the cases where an account-level sync
    * degrades to a regional skip instead of failing. */
  def isRegionSkippableClientError(e: Throwable): Boolean = e match {
    case ClientError(code, message) =>
      isRegionUnsupportedUnknownOperation(Some(code), Option(message)) ||
        RegionAccessDeniedCodes.contains(code)
    case _ => false
  }

  /** Explicit service-control-policy deny (util.py:46-66
    * `is_service_control_policy_explicit_deny`): an AccessDenied[Exception]
    * whose message names BOTH "explicit deny" and "service control
    * policy" (case-insensitive). Consumers log the SCP wording instead of
    * the generic region skip (util.py:732, intel/aws/inspector.py:436)
    * but still skip — it is a sub-classification of skippable, never a
    * hard failure. */
  def isServiceControlPolicyExplicitDeny(e: Throwable): Boolean = e match {
    case ClientError(code, message) =>
      (code == "AccessDenied" || code == "AccessDeniedException") &&
        Option(message).filter(_.nonEmpty).exists { m =>
          val lowered = m.toLowerCase
          lowered.contains("explicit deny") &&
            lowered.contains("service control policy")
        }
    case _ => false
  }

  /** Per-region fan-out with skip-on-access-error: fetch each region,
    * drop regions whose fetch fails the `skippable` test (AccessDenied /
    * unsupported region), fail hard otherwise (util.py:652-762). Returns
    * (region, rows) for the regions that answered. */
  def fetchRegions[T](regions: Seq[String],
                      skippable: Throwable => Boolean = e =>
                        Resilience.isRegionSkippableClientError(e) ||
                          Option(e.getMessage).exists(_.contains("AccessDenied")))
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
