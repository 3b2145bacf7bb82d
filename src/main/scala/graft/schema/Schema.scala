package graft.schema

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit}

/** Declarative node/relationship schema DSL — the Spark-first re-expression
  * of the reference's frozen-dataclass model layer
  * (reference: cartography/models/core/nodes.py:175-284,
  * cartography/models/core/relationships.py:262-427).
  *
  * A schema binds graph properties to batch columns ([[Field]]), per-batch
  * constants ([[Param]], the reference's `set_in_kwargs=True` PropertyRef,
  * common.py:38-172), or arbitrary Spark expressions ([[Derived]] — the
  * Spark-native generalization: transforms stay declarative/codegen'd
  * instead of per-row Python).
  */
sealed trait PropertyRef { def toCol: Column }
case class Field(name: String) extends PropertyRef { def toCol: Column = col(name) }
case class Param(value: Any) extends PropertyRef { def toCol: Column = lit(value) }
case class Derived(c: Column) extends PropertyRef { def toCol: Column = c }

/** Why an extra label exists (reference ExtraNodeLabelKind,
  * nodes.py:73-147): STANDARD is a plain additional label; ONTOLOGY marks
  * labels the ontology layer owns; COMPATIBILITY marks temporary aliases
  * kept through a rename migration — they can be stripped wholesale once
  * consumers migrate ([[graft.graph.Migrations.stripCompatibilityLabels]]). */
sealed trait LabelKind
case object StandardLabel extends LabelKind
case object OntologyLabel extends LabelKind
case object CompatibilityLabel extends LabelKind

/** Unconditional or conditional extra node label
  * (reference: nodes.py:73-147, ExtraNodeLabel.when(...)). Conditional
  * labels become a `when(cond)` element of the node's `labels` array
  * column — no second pass over the table
  * (reference FOREACH-CASE trick: querybuilder.py:486-575). */
case class ExtraLabel(label: String, condition: Option[Column] = None,
                      kind: LabelKind = StandardLabel)
object ExtraLabel {
  def when(label: String, cond: Column): ExtraLabel = ExtraLabel(label, Some(cond))
  def compatibility(label: String): ExtraLabel =
    ExtraLabel(label, None, CompatibilityLabel)
  def ontology(label: String): ExtraLabel = ExtraLabel(label, None, OntologyLabel)
}

/** Join mode for attaching a relationship to existing target nodes
  * (reference: querybuilder.py:710-736). Each maps to a Spark join shape:
  *   - [[EquiMatch]]      exact key match           → shuffled/broadcast hash join
  *   - [[IgnoreCase]]     toLower(a)=toLower(b)     → normalize-then-equi (stays hash-joinable)
  *   - [[FuzzyContains]]  target.key CONTAINS ref   → broadcast-nested-loop theta join
  *   - [[OneToMany]]      target.key IN ref_list    → explode(list) then equi join
  */
sealed trait LinkMode
case object EquiMatch extends LinkMode
case object IgnoreCase extends LinkMode
case object FuzzyContains extends LinkMode
case object OneToMany extends LinkMode

/** Edge direction relative to the schema's node
  * (reference: LinkDirection, relationships.py:236-259). */
sealed trait Direction
case object Outward extends Direction
case object Inward extends Direction

/** Relationship to existing target nodes, resolved at load time
  * (reference: CartographyRelSchema + TargetNodeMatcher,
  * relationships.py:96-229). */
case class RelSchema(
    relLabel: String,
    targetLabel: String,
    targetKey: String,
    sourceRef: PropertyRef,
    direction: Direction = Outward,
    mode: LinkMode = EquiMatch,
    properties: Map[String, PropertyRef] = Map.empty)

/** Sub-resource (tenant) attachment — every node optionally belongs to a
  * billing/org scope node; the scoping key for cleanup
  * (reference: nodes.py:216-235, attach querybuilder.py:816-902). */
case class SubResourceRel(
    targetLabel: String,
    targetKey: String,
    sourceRef: PropertyRef,
    relLabel: String = "RESOURCE")

/** Node schema: primary label, id binding, property bindings, extra labels,
  * optional tenant, additional relationships
  * (reference: CartographyNodeSchema, nodes.py:175-284). */
case class NodeSchema(
    label: String,
    id: PropertyRef,
    properties: Map[String, PropertyRef] = Map.empty,
    extraLabels: Seq[ExtraLabel] = Nil,
    subResource: Option[SubResourceRel] = None,
    otherRels: Seq[RelSchema] = Nil)

object NodeSchema {
  /** Reserved system columns the load path manages itself (reference:
    * firstseen is reserved and id/lastupdated are required system fields,
    * nodes.py:14-70). */
  val Reserved: Set[String] = Set("id", "firstseen", "lastupdated", "labels")

  /** Static schema validation (the reference enforces this with frozen
    * dataclass post-init checks). Empty result = valid. */
  def validate(schema: NodeSchema): Seq[String] = {
    val labelErr =
      if (schema.label.trim.isEmpty) Seq("label must be non-empty") else Nil
    val propErrs = schema.properties.keys.toSeq.filter(Reserved)
      .map(p => s"property '$p' collides with a reserved system column")
    val relErrs = schema.otherRels.filter(_.targetKey.trim.isEmpty)
      .map(r => s"rel ${r.relLabel}: targetKey must be non-empty")
    val dupRels = schema.otherRels
      .groupBy(r => (r.relLabel, r.targetLabel)).collect {
        case (k, rs) if rs.size > 1 => s"duplicate rel declaration ${k._1}->${k._2}"
      }.toSeq
    labelErr ++ propErrs ++ relErrs ++ dupRels
  }
}
