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

  /** Cypher `toBooleanOrNull` for the value kinds the mapping corpus
    * carries: booleans (a Spark boolean casts to the string
    * "true"/"false" and round-trips), strings "true"/"false"
    * case-insensitive, and integers (0 → false, any other → true —
    * Cypher's integer rule); every other non-null value → null.
    * Floats and unparseable strings land on null, matching Cypher. */
  def toBoolOrNull(c: Column): Column = {
    val s = c.cast("string")
    when(lower(s) === "true", lit(true))
      .when(lower(s) === "false", lit(false))
      .when(s.rlike("^-?\\d+$"), s.cast("long") =!= 0L)
      .otherwise(lit(null).cast("boolean"))
  }

  /** to_boolean: `coalesce(toBooleanOrNull(x), x IS NOT NULL)` —
    * parseable values keep their parse, any other NON-NULL value reads
    * true, null/absent reads false (reference: querybuilder.py:40-56). */
  def toBool(c: Column): Column = coalesce(toBoolOrNull(c), c.isNotNull)

  /** invert_boolean: `NOT(coalesce(toBooleanOrNull(x), false))` —
    * null/unparseable count as false BEFORE the inversion, so they read
    * true (reference: querybuilder.py:24-37). */
  def invertBool(c: Column): Column = !coalesce(toBoolOrNull(c), lit(false))

  /** equal_boolean: membership in the expected-values list,
    * `x IN [values]` — a null input yields null (the reference's Cypher
    * IN on null is null, which SETs the property to null), a non-null
    * miss yields false (reference: querybuilder.py:59-85). */
  def equalBool(c: Column, values: Seq[Any]): Column = c.isin(values: _*)

  /** or_boolean / nor_boolean across boolean-coercible fields: each
    * member is `coalesce(toBooleanOrNull(f), false)`, OR-joined; nor is
    * the AND of the negations = the negated OR
    * (reference: querybuilder.py:135-236). */
  def orBool(cols: Column*): Column =
    cols.map(c => coalesce(toBoolOrNull(c), lit(false))).reduce(_ || _)
  def norBool(cols: Column*): Column = !orBool(cols: _*)
}
