package graft.schema

/** Schema catalog / introspection: walk registered node schemas into a
  * documentation model (reference: cartography/models/introspection.py:
  * 116-320 DataModel reflection API + schema_docs.py generated docs).
  */
object Catalog {

  final case class PropertyDoc(name: String, source: String)
  final case class RelDoc(relLabel: String, targetLabel: String, direction: String,
                          mode: String)
  final case class NodeDoc(label: String, extraLabels: Seq[String],
                           conditionalLabels: Seq[String],
                           properties: Seq[PropertyDoc], subResource: Option[String],
                           rels: Seq[RelDoc])

  private def describeRef(r: PropertyRef): String = r match {
    case Field(n) => s"field:$n"
    case Param(v) => s"param:$v"
    case Derived(_) => "derived"
  }

  def describe(schema: NodeSchema): NodeDoc = NodeDoc(
    label = schema.label,
    extraLabels = schema.extraLabels.collect { case ExtraLabel(l, None, _) => l },
    conditionalLabels = schema.extraLabels.collect { case ExtraLabel(l, Some(_), _) => l },
    properties = PropertyDoc("id", describeRef(schema.id)) +:
      schema.properties.toSeq.sortBy(_._1).map { case (n, r) =>
        PropertyDoc(n, describeRef(r))
      },
    subResource = schema.subResource.map(s => s"${s.targetLabel}.${s.targetKey}"),
    rels = schema.otherRels.map(r => RelDoc(r.relLabel, r.targetLabel,
      r.direction.toString, r.mode.toString)))

  /** Markdown rendering of a schema registry (schema_docs.py analog). */
  def markdown(schemas: Seq[NodeSchema]): String =
    schemas.map(describe).map { d =>
      val labels = (d.label +: d.extraLabels).mkString(", ") +
        (if (d.conditionalLabels.nonEmpty)
          d.conditionalLabels.mkString(" (+conditional: ", ", ", ")") else "")
      val props = d.properties.map(p => s"| ${p.name} | ${p.source} |").mkString("\n")
      val rels = if (d.rels.isEmpty) "" else "\n\nRelationships:\n" +
        d.rels.map(r => s"- `(:${d.label})-[:${r.relLabel}]->(:${r.targetLabel})` " +
          s"(${r.direction}, ${r.mode})").mkString("\n")
      val tenant = d.subResource.map(t => s"\n\nSub-resource: `$t`").getOrElse("")
      s"## $labels\n\n| property | source |\n|---|---|\n$props$tenant$rels"
    }.mkString("\n\n")
}
