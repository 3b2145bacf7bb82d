package graft.sink

import org.apache.spark.sql.Row

/** Concrete transactional writer for the incremental Bolt path — the
  * executor-side client lifecycle + retry/backoff classification of the
  * reference's session wrapper (cartography/client/core/tx.py:33-275,
  * load_graph_data :641-700), expressed against a minimal driver facade
  * so the classification logic is testable in-process (the sandbox has no
  * network; a production deployment implements [[BoltWriter.BoltClient]]
  * with the Neo4j Java driver's `Session.run` in ~10 lines).
  */
object BoltWriter {

  /** The slice of a Bolt driver session the writer needs: run one
    * parameterized statement and eventually close. Implementations must
    * be constructible ON THE EXECUTOR (the factory is shipped to the
    * task, never a live connection). */
  trait BoltClient extends AutoCloseable {
    def run(query: String, params: Map[String, Any]): Unit
  }

  /** Driver-exception classification, mirrored from the reference:
    *   - network class (tx.py:265-274 backoff decorator set):
    *     ConnectionReset / ServiceUnavailable / SessionExpired /
    *     TransientError — always retryable, up to
    *     [[MaxNetworkRetries]] attempts with exponential backoff;
    *   - client class (tx.py:44-75): ONLY
    *     `Neo.ClientError.Statement.EntityNotFound` is retryable (a known
    *     transient under concurrent MERGE/DELETE, neo4j/neo4j#6823);
    *     every other ClientError is a permanent failure and propagates;
    *   - Python's BufferError("cannot be re-sized") case (tx.py:77-92) is
    *     a CPython artifact with no JVM analog — deliberately absent.
    */
  final case class ClientException(code: String, message: String)
    extends RuntimeException(s"$code: $message")
  final case class TransientException(message: String)
    extends RuntimeException(message)
  final case class ServiceUnavailableException(message: String)
    extends RuntimeException(message)
  final case class SessionExpiredException(message: String)
    extends RuntimeException(message)

  val MaxNetworkRetries = 5 // tx.py:33
  val MaxEntityNotFoundRetries = 5 // tx.py:34
  val EntityNotFoundCode = "Neo.ClientError.Statement.EntityNotFound"

  def isRetryableNetwork(e: Throwable): Boolean = e match {
    case _: TransientException | _: ServiceUnavailableException |
         _: SessionExpiredException => true
    case _: java.net.SocketException => true // ConnectionResetError analog
    case _ => false
  }

  def isRetryableClient(e: Throwable): Boolean = e match {
    case ClientException(code, _) => code == EntityNotFoundCode
    case _ => false
  }

  /** tx.py:164-262 _run_with_retry: independent attempt counters and
    * backoff schedules per error class, so a sync that hits three
    * transient network blips and one EntityNotFound doesn't burn the
    * other class's budget. `sleep` is injectable so specs assert the
    * schedule without waiting on wall-clock. */
  def runWithRetry[T](op: () => T,
                      maxNetwork: Int = MaxNetworkRetries,
                      maxEntity: Int = MaxEntityNotFoundRetries,
                      sleep: Double => Unit = s =>
                        Thread.sleep((s * 1000).toLong)): T = {
    var networkAttempts = 0
    var entityAttempts = 0
    while (true) {
      try return op()
      catch {
        case e: Throwable if isRetryableNetwork(e) =>
          if (networkAttempts >= maxNetwork - 1) throw e
          networkAttempts += 1
          sleep(math.pow(2.0, networkAttempts - 1.0)) // backoff.expo: 1,2,4,...
        case e: Throwable if isRetryableClient(e) =>
          if (entityAttempts >= maxEntity - 1) throw e
          entityAttempts += 1
          sleep(math.pow(2.0, entityAttempts - 1.0))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Per-partition transactional writer: opens one client per partition,
    * sends each bounded batch as the UNWIND parameter of the generated
    * statement ([[GraphSink.nodeUpsertCypher]] /
    * [[GraphSink.edgeUpsertCypher]]), retries each batch through
    * [[runWithRetry]], closes in the [[GraphSink.foreachBatched]]
    * finally. MERGE makes a replayed batch idempotent, which is what
    * makes Spark task retry + this retry safe to stack
    * (tx.py load_graph_data :641-700).
    */
  final class BoltRowWriter(clientFactory: () => BoltClient, cypher: String,
                            tag: Long,
                            maxNetwork: Int = MaxNetworkRetries,
                            maxEntity: Int = MaxEntityNotFoundRetries,
                            sleep: Double => Unit = s =>
                              Thread.sleep((s * 1000).toLong))
    extends GraphSink.RowWriter {
    @transient private var client: BoltClient = _

    override def open(partitionId: Int): Unit = client = clientFactory()

    def writeBatch(rows: Seq[Row]): Unit = {
      val batch = rows.map { r =>
        r.schema.fieldNames.iterator.zipWithIndex
          .map { case (n, i) => n -> r.get(i) }.toMap
      }
      runWithRetry(
        () => client.run(cypher, Map("batch" -> batch, "tag" -> tag)),
        maxNetwork, maxEntity, sleep)
    }

    override def close(): Unit = if (client != null) client.close()
  }

  /** Ship a node table to Bolt: generated UNWIND+MERGE for the label,
    * bounded batches, per-partition client — the whole incremental path
    * in one call. */
  def writeNodes(df: org.apache.spark.sql.DataFrame, label: String, tag: Long,
                 clientFactory: () => BoltClient,
                 batchSize: Int = GraphSink.DefaultBatchSize): Unit = {
    val props = df.columns.filterNot(c => c == "id" || c == "firstseen" ||
      c == "lastupdated" || c == "labels").toSeq
    val cypher = GraphSink.nodeUpsertCypher(label, props)
    GraphSink.foreachBatched(df, batchSize)(() =>
      new BoltRowWriter(clientFactory, cypher, tag))
  }

  /** Ship an edge table to Bolt with the generated MATCH/MATCH/MERGE. */
  def writeEdges(df: org.apache.spark.sql.DataFrame,
                 key: (String, String, String), tag: Long,
                 clientFactory: () => BoltClient,
                 batchSize: Int = GraphSink.DefaultBatchSize): Unit = {
    val props = df.columns.filterNot(c => c == "src_id" || c == "dst_id" ||
      c == "firstseen" || c == "lastupdated").toSeq
    val cypher = GraphSink.edgeUpsertCypher(key._1, key._2, key._3, props)
    GraphSink.foreachBatched(df, batchSize)(() =>
      new BoltRowWriter(clientFactory, cypher, tag))
  }
}
