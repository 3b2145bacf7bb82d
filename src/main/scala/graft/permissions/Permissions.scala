package graft.permissions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Lineage._

/** IAM-style permission-relationship computation: evaluate wildcard
  * policies over principals × resources and emit the allowed edges
  * (reference: cartography/intel/aws/permission_relationships.py —
  * wildcard→regex compile :395-440, evaluation :178-252, nested-loop
  * pairing :354-392, condition annotation :294-352).
  *
  * Wildcard semantics preserved exactly: `*` → `.*`, `?` → `.?`,
  * case-insensitive, full-string anchored, deny-overrides. Condition
  * semantics preserved exactly (reference collect_edge_conditions): AWS
  * evaluates Conditions at request time, so a grant whose every matching
  * Allow path carries a Condition is annotated `has_condition = true`
  * with the union of its context keys; one unconditional Allow path makes
  * the edge unconditional.
  *
  * Scale design: the reference nested-loops every (principal, resource)
  * pair in Python. Here we never materialize the cross product — each
  * (small, broadcast) statement joins principals and resources
  * independently by regex match, the two halves meet on statement id, and
  * the allow/deny/condition decision is made once per distinct mask
  * combination with pure bit arithmetic. Statements beyond 62 chunk into
  * additional 62-bit mask blocks (one extra long column per block, OR-ing
  * allow bits and unioning denies across blocks), so the statement count
  * is unbounded. Cost is O(|statements| × (|principals| + |resources|)) +
  * the size of the matched pairs, not O(|principals| × |resources|).
  */
object Permissions {

  final case class PolicyStatement(stmtId: String, effect: String,
                                   principalPattern: String, resourcePattern: String,
                                   condition: Option[String] = None,
                                   /** IAM action wildcard (e.g. `s3:Get*`)
                                     * matched against a permission string —
                                     * statement_applies_to_permission,
                                     * permission_relationships.py:145-175. */
                                   actionPattern: String = "*") {
    def appliesToPermission(permission: String): Boolean =
      permission.matches(wildcardToRegex(actionPattern))
  }

  /** One entry of the reference's permission-relationships mapping file
    * (cartography/data/permission_relationships.yaml; validity rules
    * is_valid_rpr, permission_relationships.py:614-629): principals
    * holding ANY of `permissions` on a `targetLabel` resource get a
    * `relationshipName` edge. */
  final case class RelationshipMapping(targetLabel: String, permissions: Seq[String],
                                       relationshipName: String)

  /** Parse the YAML mapping document (a list of maps). Entries missing a
    * required field are skipped, mirroring is_valid_rpr. */
  def parseRelationshipMappings(yamlText: String): Seq[RelationshipMapping] = {
    import scala.jdk.CollectionConverters._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper(
      new com.fasterxml.jackson.dataformat.yaml.YAMLFactory())
    val root = mapper.readTree(yamlText)
    if (root == null || !root.isArray) Nil
    else root.elements().asScala.toSeq.flatMap { n =>
      val label = Option(n.get("target_label")).map(_.asText)
      val rel = Option(n.get("relationship_name")).map(_.asText)
      val perms = Option(n.get("permissions")).filter(_.isArray)
        .map(_.elements().asScala.map(_.asText).toSeq)
      (label, perms, rel) match {
        case (Some(l), Some(p), Some(r)) => Some(RelationshipMapping(l, p, r))
        case _ => None // invalid entry → skipped (reference logs + skips)
      }
    }
  }

  /** Load the mapping file; a missing file is an explicit skip (empty),
    * matching the reference's warn-and-skip
    * (parse_permission_relationships_file, :597-611). */
  def parseRelationshipMappingsFile(path: String): Seq[RelationshipMapping] = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) Nil
    else parseRelationshipMappings(new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
  }

  /** Evaluate every mapping: statements are pre-filtered (driver-side —
    * config-sized) to those whose action pattern matches any of the
    * mapping's permissions, then the chunked bitmask evaluation runs per
    * mapping and results union with the mapping's relationship metadata
    * (reference sync loop permission_relationships.py:631-700). */
  def relationshipEdges(principals: DataFrame, resources: DataFrame,
                        statements: Seq[PolicyStatement],
                        mappings: Seq[RelationshipMapping]): DataFrame = {
    val parts = mappings.flatMap { m =>
      val applicable = statements.filter(s =>
        m.permissions.exists(s.appliesToPermission))
      if (applicable.forall(_.effect.toLowerCase != "allow")) None
      else Some(evaluate(principals, resources, applicable)
        .select(col("principal_id"), col("resource_id"),
          lit(m.relationshipName).as("relationship_name"),
          lit(m.targetLabel).as("target_label"),
          col("has_condition"), col("condition_keys")))
    }
    // No mapping had an applicable Allow statement — a legitimate
    // configuration state (patterns overlapping nothing): the reference
    // warn-and-skips and emits no edges, so return an empty typed result
    // instead of failing the sync.
    if (parts.isEmpty)
      principals.select(col("id").as("principal_id")).limit(0)
        .crossJoin(resources.select(col("id").as("resource_id")).limit(0))
        .withColumn("relationship_name", lit(null).cast("string"))
        .withColumn("target_label", lit(null).cast("string"))
        .withColumn("has_condition", lit(null).cast("boolean"))
        .withColumn("condition_keys", lit(null).cast("string"))
    else parts.reduce(_ unionByName _)
  }

  /** Compile an IAM-style wildcard pattern to an anchored case-insensitive
    * regex (reference: permission_relationships.py:423-440 — note the
    * reference maps `?` to `.?`, optional-char, and we keep that). */
  def wildcardToRegex(pattern: String): String = {
    val sb = new StringBuilder("(?i)^")
    pattern.foreach {
      case '*' => sb.append(".*")
      case '?' => sb.append(".?")
      case c if "\\.[]{}()<>+-=!$^|,#&;".indexOf(c) >= 0 => sb.append('\\').append(c)
      case c => sb.append(c)
    }
    sb.append('$').toString
  }

  /** Context keys referenced by a stored Condition blob — a JSON list of
    * operator maps, e.g. `[{"IpAddress": {"aws:SourceIp": "10.0.0.0/8"}}]`
    * → `aws:SourceIp` (reference parse_condition_blob /
    * extract_condition_context_keys, permission_relationships.py:255-291).
    * Malformed blobs yield no keys but the statement stays conditional —
    * the reference fails safe toward "conditional" too. */
  def conditionContextKeys(blob: String): Seq[String] = {
    import com.fasterxml.jackson.databind.JsonNode
    import scala.jdk.CollectionConverters._
    try {
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(blob)
      val ops: Seq[JsonNode] =
        if (root == null) Nil
        else if (root.isArray) root.elements().asScala.toSeq
        else if (root.isObject) Seq(root)
        else Nil
      ops.filter(_.isObject).flatMap { op =>
        op.fields().asScala.toSeq.flatMap { e =>
          if (e.getValue.isObject) e.getValue.fieldNames().asScala.toSeq else Nil
        }
      }.distinct.sorted
    } catch { case _: Exception => Nil }
  }

  /** Per-block compiled statement metadata: local bit j within the block's
    * 62-bit mask. */
  private case class Block(allowBits: Long, denyBits: Long, uncondAllowBits: Long,
                           principalRegexes: Seq[String], resourceRegexes: Seq[String],
                           condAllowKeys: Seq[(Int, Seq[String])])

  private def compile(statements: Seq[PolicyStatement]): Seq[Block] =
    statements.grouped(62).map { blk =>
      val rows = blk.zipWithIndex.map { case (s, j) =>
        (j, s.effect.toLowerCase == "allow", s.condition,
          wildcardToRegex(s.principalPattern), wildcardToRegex(s.resourcePattern))
      }
      Block(
        allowBits = rows.collect { case (j, true, _, _, _) => 1L << j }.sum,
        denyBits = rows.collect { case (j, false, _, _, _) => 1L << j }.sum,
        uncondAllowBits = rows.collect { case (j, true, None, _, _) => 1L << j }.sum,
        principalRegexes = rows.map(_._4),
        resourceRegexes = rows.map(_._5),
        condAllowKeys = rows.collect { case (j, true, Some(c), _, _) =>
          (j, conditionContextKeys(c))
        })
    }.toSeq

  /** Evaluate statements over principals(id, name) and resources(id, arn):
    * a pair is allowed iff some Allow statement matches both sides and no
    * Deny statement matches both sides (deny-overrides,
    * permission_relationships.py:221-252). Returns (principal_id,
    * resource_id, has_condition, condition_keys) edges — `condition_keys`
    * is the sorted comma-joined context-key union when every matching
    * Allow path is conditional, else ''.
    *
    * Algorithm: each side gets one statement-match bitmask column per
    * 62-statement block (one literal compiled regex per statement —
    * codegen'd RLike), the distinct (p_masks, r_masks) combinations are
    * decided once with pure bit arithmetic, and the allowed pairs expand
    * by joining the decision table back to both sides. Only `decisions`
    * (K distinct mask combos — config-sized, independent of corpus size)
    * is broadcast; the final principal × resource expansion is a shuffle
    * join on the mask columns, so neither corpus-sized side ever crosses
    * the driver or the 8 GB broadcast ceiling. Mask-column cardinality is
    * low, so that shuffle can skew — AQE skew-join splits it at runtime.
    * No DISTINCT pass over pairs; the pair space is only materialized as
    * the output itself. */
  def evaluate(principals: DataFrame, resources: DataFrame,
               statements: Seq[PolicyStatement]): DataFrame = {
    require(statements.nonEmpty, "at least one statement required")
    val blocks = compile(statements)
    val nb = blocks.size

    def maskCol(target: Column, regexes: Seq[String]): Column =
      regexes.zipWithIndex.map { case (re, j) =>
        when(target.rlike(re), lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _) // bits are disjoint → sum == bitwise or

    val pmNames = (0 until nb).map(b => s"pm$b")
    val rmNames = (0 until nb).map(b => s"rm$b")
    // pin the masked tables: each side is consumed TWICE (the decision
    // table's distinct AND the final expansion join), and the mask
    // columns are one compiled-regex RLike per statement per row — the
    // expensive part of the whole evaluator. Unpinned, the physical plan
    // holds two copies of each mask subtree and every row pays the full
    // regex battery twice (guide §2.3/§5: don't recompute what you can
    // re-read; the pinned rows are just id + nb longs).
    val p = principals.select(col("id").as("principal_id") +:
      blocks.zipWithIndex.map { case (m, b) =>
        maskCol(col("name"), m.principalRegexes).as(s"pm$b") }: _*)
      .pin
    val r = resources.select(col("id").as("resource_id") +:
      blocks.zipWithIndex.map { case (m, b) =>
        maskCol(col("arn"), m.resourceRegexes).as(s"rm$b") }: _*)
      .pin

    def shared(b: Int) = col(s"pm$b").bitwiseAND(col(s"rm$b"))
    def anyBit(bits: Seq[(Block, Int)], f: Block => Long): Column =
      bits.map { case (m, b) => shared(b).bitwiseAND(lit(f(m))) =!= 0L }
        .reduce(_ || _)
    val zb = blocks.zipWithIndex
    val anyAllow = anyBit(zb, _.allowBits)
    val anyDeny = anyBit(zb, _.denyBits)
    val anyUncondAllow = anyBit(zb, _.uncondAllowBits)
    val keyArrays = zb.flatMap { case (m, b) =>
      m.condAllowKeys.map { case (j, keys) =>
        when(shared(b).bitwiseAND(lit(1L << j)) =!= 0L,
          array(keys.map(lit): _*).cast("array<string>"))
          .otherwise(array().cast("array<string>"))
      }
    }
    val keysUnion =
      if (keyArrays.isEmpty) array().cast("array<string>")
      else array_sort(array_distinct(concat(keyArrays: _*)))

    val decisions = p.select(pmNames.map(col): _*).distinct()
      .crossJoin(r.select(rmNames.map(col): _*).distinct())
      .filter(anyAllow && !anyDeny)
      .select((pmNames ++ rmNames).map(col) :+
        (!anyUncondAllow).as("has_condition") :+
        when(anyUncondAllow, lit("")).otherwise(array_join(keysUnion, ","))
          .as("condition_keys"): _*)

    val allowedResources = r.join(broadcast(decisions), rmNames)
    allowedResources.join(p, pmNames)
      .select(col("principal_id"), col("resource_id"),
        col("has_condition"), col("condition_keys"))
  }
}
