package graft.intel

import org.apache.spark.sql.SparkSession

import graft.graph.Graph

/** One named stage of a composed sync run — the Spark analog of an entry
  * in the reference's TOP_LEVEL_MODULES ordered dict
  * (reference: cartography/sync.py:45-149; Sync.add_stage :196-215).
  *
  * `wants` declares soft dependencies: stages whose absence doesn't make
  * this stage fail, but does make its results incomplete (e.g. permission
  * relationships without a principals load produce zero edges). The
  * reference surfaces these as log warnings, not errors — so does
  * [[SyncAssembly.buildSync]].
  */
final case class SyncStage(
    name: String,
    run: (Graph, SparkSession, Long) => Graph,
    wants: Seq[String] = Nil)

/** A validated, ordered sync plan plus the warnings its assembly raised.
  * Execution delegates to [[SyncRunner]] so composed syncs share the
  * serial / best-effort semantics of hand-built module lists. */
final case class SyncPlan(stages: Seq[SyncStage], warnings: Seq[String]) {
  def stageNames: Seq[String] = stages.map(_.name)
  def run(graph: Graph, spark: SparkSession, tag: Long): Graph =
    SyncRunner.runStages(graph, spark, stages, tag)
  def runBestEffort(graph: Graph, spark: SparkSession,
                    tag: Long): (Graph, Seq[(String, Throwable)]) =
    SyncRunner.runStagesBestEffort(graph, spark, stages, tag)
}

/** Declarative sync assembly — the reference's build_sync /
  * parse_and_validate_selected_modules re-expressed
  * (reference: cartography/sync.py:500-539 build_default_sync,
  * :545-631 parse/validate + build_sync; CLI entry cartography/cli.py:328).
  *
  * Rules preserved from the reference:
  *   - unknown module names abort with the full list of valid values
  *     (sync.py:575-584);
  *   - duplicates collapse to the first occurrence (sync.py:573-574);
  *   - legacy aliases resolve before validation (sync.py:566-567);
  *   - `create-indexes` runs first, `ontology` after every intel module,
  *     `analysis` dead last — the invariant the reference maintains by
  *     dict order and docstring convention (sync.py:46, 147-148) is
  *     ENFORCED here: a selection listing them elsewhere is reordered
  *     with a warning instead of silently producing a sync whose
  *     analysis ran before its data arrived.
  */
object SyncAssembly {
  /** Structural slots (sync.py:46 "create-indexes" first; :147-148
    * ontology then analysis last). */
  val IndexStage = "create-indexes"
  val OntologyStage = "ontology"
  val AnalysisStage = "analysis"
  private val Pinned = Seq(IndexStage, OntologyStage, AnalysisStage)

  /** Legacy module-name aliases (sync.py:566-567 _MODULE_ALIASES). */
  val DefaultAliases: Map[String, String] = Map("entra" -> "microsoft")

  /** Wrap an [[IntelModule]] + source as a stage. */
  def stageFor(m: IntelModule, source: String,
               wants: Seq[String] = Nil): SyncStage =
    SyncStage(m.name, (g, s, t) => m.sync(g, s, source, t), wants)

  /** Comma-separated selection → trimmed names
    * (sync.py:545-584 input shape, e.g. "aws, gcp ,analysis"). */
  def parseSelected(selected: String): Seq[String] =
    selected.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  def buildSync(selected: String, registry: Seq[SyncStage]): SyncPlan =
    buildSync(parseSelected(selected), registry, DefaultAliases)

  def buildSync(selected: Seq[String], registry: Seq[SyncStage],
                aliases: Map[String, String] = DefaultAliases): SyncPlan = {
    require(selected.nonEmpty, "at least one sync module must be selected")
    val byName = registry.map(s => s.name -> s).toMap
    require(byName.size == registry.size,
      s"registry has duplicate stage names: ${registry.map(_.name).diff(byName.keys.toSeq).distinct.mkString(", ")}")
    val resolved = selected.map(n => aliases.getOrElse(n, n))
    val unknown = resolved.filterNot(byName.contains).distinct
    if (unknown.nonEmpty)
      throw new IllegalArgumentException(
        s"unknown sync module(s): ${unknown.mkString(", ")}. " +
          s"Valid values are: ${registry.map(_.name).mkString(", ")}")
    val dedup = resolved.distinct

    val ordered =
      dedup.filter(_ == IndexStage) ++
        dedup.filterNot(Pinned.contains) ++
        dedup.filter(_ == OntologyStage) ++
        dedup.filter(_ == AnalysisStage)
    val reorderWarnings =
      if (ordered != dedup)
        Seq(s"stage order adjusted from (${dedup.mkString(", ")}) to " +
          s"(${ordered.mkString(", ")}): '$IndexStage' must run first, " +
          s"'$OntologyStage' after every intel module, '$AnalysisStage' last")
      else Nil

    val depWarnings = ordered.flatMap { n =>
      byName(n).wants.filterNot(ordered.contains).map(w =>
        s"stage '$n' expects '$w' to run in the same sync; " +
          "its results may be empty or incomplete")
    }
    SyncPlan(ordered.map(byName), reorderWarnings ++ depWarnings)
  }
}
