package graft.analysis

import org.apache.spark.sql.SparkSession

/** User-supplied analysis/cleanup jobs as data: a directory of JSON job
  * files executed post-sync (reference: cartography/intel/analysis.py:12-45
  * discovers `.json` files recursively under the configured job directory
  * and runs each through GraphJob; job format: the JSON files under
  * cartography/data/jobs/cleanup/, runner cartography/util.py:297-361).
  *
  * A statement's `query` is Spark SQL over the registered graph views
  * (`node_<Label>` / `edge_<Src>_<Rel>_<Dst>`, see
  * [[graft.rules.RulesRunner.registerGraphViews]]) with `$PARAM`
  * placeholders substituted from the common job parameters — the analog of
  * the reference's `$UPDATE_TAG` Neo4j parameters. A statement with
  * `materialize` re-points that view at the statement's result — this is
  * how a cleanup job "deletes": it SELECTs the survivors, replacing the
  * reference's iterative `WITH n LIMIT $LIMIT_SIZE DETACH DELETE` loop
  * with one declarative plan (`iterative`/`iterationsize` keys are
  * accepted and ignored — chunked deletes exist to bound a transaction,
  * which Spark doesn't need).
  */
object JobRegistry {

  final case class JobStatement(query: String, materialize: Option[String],
                                comment: Option[String])
  final case class GraphJob(name: String, statements: Seq[JobStatement])

  /** Parse one job file (reference GraphJob.from_json). Unknown keys are
    * ignored for forward compatibility with reference job files. */
  def parseJob(json: String): GraphJob = {
    import scala.jdk.CollectionConverters._
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val name = Option(root.get("name")).map(_.asText).getOrElse("unnamed")
    val stmts = Option(root.get("statements")).toSeq
      .flatMap(_.elements().asScala)
      .zipWithIndex.map { case (s, i) =>
        // malformed job files get a descriptive parse error (the reference
        // raises on bad job JSON too), not an opaque NPE; JSON-null values
        // are treated as absent, never as the string "null"
        val query = Option(s.get("query")).filterNot(_.isNull).map(_.asText)
          .getOrElse(throw new IllegalArgumentException(
            s"job '$name': statement #$i is missing required key 'query'"))
        JobStatement(
          query = query,
          materialize = Option(s.get("materialize")).filterNot(_.isNull).map(_.asText),
          comment = Option(s.get("__comment__")).filterNot(_.isNull).map(_.asText))
      }
    GraphJob(name, stmts)
  }

  /** `$PARAM` substitution: longs/ints inline as numerals, everything else
    * as escaped single-quoted SQL strings (the Neo4j-parameter analog).
    * Longest names first so $UPDATE_TAG_2 never matches $UPDATE_TAG. */
  def substitute(query: String, params: Map[String, Any]): String =
    params.toSeq.sortBy(-_._1.length).foldLeft(query) { case (q, (k, v)) =>
      val literal = v match {
        case n: Long => n.toString
        case n: Int => n.toString
        case other => "'" + other.toString.replace("'", "''") + "'"
      }
      q.replace("$" + k, literal)
    }

  /** Run one job: statements in file order; a `materialize` statement
    * re-points its view at the result. */
  def runJob(spark: SparkSession, job: GraphJob, params: Map[String, Any]): Unit =
    job.statements.foreach { stmt =>
      val result = spark.sql(substitute(stmt.query, params))
      stmt.materialize.foreach(result.createOrReplaceTempView)
    }

  /** Discover and run every `*.json` job under `dir` (recursive), sorted
    * by path for deterministic order. A missing/empty directory is a
    * no-op, mirroring the reference's skip-with-log. Returns the names of
    * the jobs run. */
  def runDirectory(spark: SparkSession, dir: String,
                   params: Map[String, Any]): Seq[String] = {
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(root)) return Nil
    val files = {
      val s = java.nio.file.Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(_.toString.endsWith(".json")).toList.sortBy(_.toString)
      } finally s.close()
    }
    files.map { path =>
      val job = parseJob(new String(java.nio.file.Files.readAllBytes(path), "UTF-8"))
      runJob(spark, job, params)
      job.name
    }
  }
}
