package graft.ontology

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Ontology field-projection strategies: provider-specific columns are
  * projected onto cross-provider semantic `_ont_*` fields at load time.
  * The reference emits these as generated Cypher SET clauses
  * (reference: cartography/graph/querybuilder.py:24-415, strategies named
  * in cartography/models/ontology/mapping/specs.py:20-31); here each
  * strategy is a pure `Column` function, so it rides inside the node
  * upsert's whole-stage-codegen projection.
  */
object Ontology {

  /** Coalesce-first-non-null across candidate provider fields
    * (reference: querybuilder.py:271-318). */
  def coalesceFirst(cols: Column*): Column = coalesce(cols: _*)

  /** Static value (reference: querybuilder.py:88-133). */
  def staticValue(v: Any): Column = lit(v)

  /** CASE value mapping with optional default
    * (reference: querybuilder.py:238-268). */
  def valueMapping(c: Column, mapping: Map[String, String],
                   default: Option[String] = None): Column = {
    val base = default.map(lit(_: String)).getOrElse(lit(null))
    mapping.toSeq.sortBy(_._1).foldLeft(base) { case (acc, (k, v)) =>
      when(c === lit(k), lit(v)).otherwise(acc)
    }
  }

  /** toBooleanOrNull coercion (reference: querybuilder.py:24-57). */
  def toBool(c: Column): Column = c.cast("boolean")

  /** Inverted boolean with null-passthrough (reference: querybuilder.py:59-85). */
  def invertBool(c: Column): Column = !c.cast("boolean")

  /** equal-boolean: col == value, null-safe false (reference: querybuilder.py:136-235). */
  def equalBool(c: Column, v: Any): Column = coalesce(c === lit(v), lit(false))

  /** or / nor across boolean-coercible fields (reference: querybuilder.py:136-235). */
  def orBool(cols: Column*): Column = cols.map(c => coalesce(c.cast("boolean"), lit(false))).reduce(_ || _)
  def norBool(cols: Column*): Column = !orBool(cols: _*)
}
