package graft.ontology

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative ontology mapping data + its interpreter — the engine-side
  * analog of the reference's mapping corpus
  * (cartography/models/ontology/mapping/specs.py:7-80 dataclasses,
  * consumed by cartography/graph/querybuilder.py:320-415 which turns a
  * module's mapping into `SET i._ont_<field> = …` clauses at load time).
  *
  * Prior rounds implemented the eight field strategies as raw Column
  * functions ([[Ontology]]); this file adds the DATA layer: the same
  * frozen-dataclass shape as the reference, plus [[Mappings.project]],
  * which interprets a node mapping against a provider DataFrame —
  * so the reference's 41 mapping-data files can be ported as data and
  * flow through one tested interpreter instead of hand-written
  * projections per label. All `_ont_*` columns ride inside the upsert's
  * whole-stage-codegen projection: the interpreter only composes
  * built-in Column expressions, no UDFs.
  */
object Mappings {

  /** One ontology field ← provider field mapping
    * (specs.py `OntologyFieldMapping`). `indexed=false` marks unbounded
    * text/list fields that must NOT get a range index
    * (specs.py:16-18) — honored by [[indexedFields]]. */
  final case class FieldMapping(
      ontologyField: String,
      nodeField: String = "",
      required: Boolean = false,
      specialHandling: Option[String] = None,
      extraValue: Option[Any] = None,
      extraValues: Seq[String] = Nil,
      extraMap: Map[String, String] = Map.empty,
      extraFields: Seq[String] = Nil,
      indexed: Boolean = true)

  /** One provider node label's mapping (specs.py `OntologyNodeMapping`).
    * `eligibleForSource=false` = enrich-only: stamps `_ont_*` fields but
    * never CREATES canonical nodes (specs.py:54-60). */
  final case class NodeMapping(
      nodeLabel: String,
      fields: Seq[FieldMapping],
      eligibleForSource: Boolean = true)

  /** One module's contribution to a semantic category
    * (specs.py `OntologyMapping`). `registryKey` is the category
    * registration-dict key when it differs from the module name — one
    * module can register several mappings under distinct keys
    * (clusters.py aws_eks/aws_ecs/aws_emr all carry module_name "aws");
    * the STAMPED `_ont_source` is always the module name. */
  final case class ModuleMapping(moduleName: String, nodes: Seq[NodeMapping],
                                 registryKey: String = "") {
    def key: String = if (registryKey.isEmpty) moduleName else registryKey
  }

  /** Interpret one node mapping against its provider node table: returns
    * `df` plus `_ont_source` (the module name — querybuilder.py:331-332)
    * and one `_ont_<field>` column per applicable field mapping.
    *
    * Fidelity notes (querybuilder.py:320-415):
    *  - `static_value` needs no node_field and always applies;
    *  - any other strategy whose node_field is MISSING from the frame is
    *    skipped silently — the reference's composite-node pattern, where
    *    several schemas share a label and each carries a field subset
    *    (querybuilder.py:346-357);
    *  - or/nor/coalesce lead with node_field and read their extra field
    *    lists; absent EXTRA members are dropped silently, but a missing
    *    PRIMARY skips the clause (querybuilder.py:295-310);
    *  - `mapping` leaves unmapped provider values NULL (specs.py:30-31).
    */
  def project(df: DataFrame, moduleName: String, node: NodeMapping): DataFrame = {
    val cols = df.columns.toSet
    val stamped = node.fields.foldLeft(df) { (d, f) =>
      val out = s"_ont_${f.ontologyField}"
      def fieldPresent = cols.contains(f.nodeField)
      val value: Option[Column] = f.specialHandling match {
        case Some("static_value") => Some(Ontology.staticValue(f.extraValue.orNull))
        case _ if !fieldPresent   => None
        case None                   => Some(col(f.nodeField))
        case Some("invert_boolean") => Some(Ontology.invertBool(col(f.nodeField)))
        case Some("to_boolean")     => Some(Ontology.toBool(col(f.nodeField)))
        case Some("equal_boolean") =>
          Some(Ontology.equalBool(col(f.nodeField), f.extraValues))
        case Some("mapping") => Some(Ontology.valueMapping(col(f.nodeField), f.extraMap))
        case Some("or_boolean") | Some("nor_boolean") | Some("coalesce") =>
          // the primary node_field leads; absent extras are dropped
          // (querybuilder.py:165-180,215-230,295-310 — the reference
          // skips the whole clause when the PRIMARY is missing, logged
          // at debug, and silently drops missing extras)
          val members = (f.nodeField +: f.extraFields.filter(cols.contains)).distinct
          f.specialHandling.get match {
            case "or_boolean"  => Some(Ontology.orBool(members.map(col): _*))
            case "nor_boolean" => Some(Ontology.norBool(members.map(col): _*))
            case _             => Some(Ontology.coalesceFirst(members.map(col): _*))
          }
        case Some(other) =>
          throw new IllegalArgumentException(
            s"unknown special_handling '$other' for ${node.nodeLabel}.${f.ontologyField}")
      }
      value.fold(d)(v => d.withColumn(out, v))
    }
    stamped.withColumn("_ont_source", lit(moduleName))
  }

  /** The `_ont_*` columns that must get a range index for a semantic
    * category — every mapped field across every module EXCEPT those
    * marked `indexed=false` anywhere (unbounded text exceeds the index
    * value limit regardless of which provider wrote it; specs.py:16-18).
    * Sorted, deduped; feed to [[graft.graph.Layout]] DDL. */
  def indexedFields(modules: Seq[ModuleMapping]): Seq[String] = {
    val all = modules.flatMap(_.nodes).flatMap(_.fields)
    val blocked = all.filter(!_.indexed).map(_.ontologyField).toSet
    all.map(_.ontologyField).distinct.filterNot(blocked)
      .sorted.map(f => s"_ont_$f")
  }

  /** Required ontology fields of a node mapping, as `_ont_*` names —
    * rows missing one cannot CREATE a canonical node
    * (specs.py `required`, enforced by
    * [[Materialize.ProviderMapping.requiredFields]]). */
  def requiredFields(node: NodeMapping): Seq[String] =
    node.fields.filter(_.required).map(f => s"_ont_${f.ontologyField}")
}
