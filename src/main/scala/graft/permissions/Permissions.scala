package graft.permissions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IAM-style permission-relationship computation: evaluate wildcard
  * policies over principals × resources and emit the allowed edges
  * (reference: cartography/intel/aws/permission_relationships.py —
  * wildcard→regex compile :395-440, evaluation :178-252, nested-loop
  * pairing :354-392).
  *
  * Wildcard semantics preserved exactly: `*` → `.*`, `?` → `.?`,
  * case-insensitive, full-string anchored, deny-overrides.
  *
  * Scale design: the reference nested-loops every (principal, resource)
  * pair in Python. Here we never materialize the cross product — each
  * (small, broadcast) statement joins principals and resources
  * independently by regex match, the two halves meet on statement id, and
  * deny pairs are removed with an anti-join. Cost is
  * O(|statements| × (|principals| + |resources|)) + the size of the
  * matched pairs, not O(|principals| × |resources|).
  */
object Permissions {

  final case class PolicyStatement(stmtId: String, effect: String,
                                   principalPattern: String, resourcePattern: String)

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

  /** Evaluate statements over principals(id, name) and resources(id, arn):
    * a pair is allowed iff some Allow statement matches both sides and no
    * Deny statement matches both sides (deny-overrides,
    * permission_relationships.py:221-252). Returns (principal_id,
    * resource_id) edges. */
  def evaluate(principals: DataFrame, resources: DataFrame,
               statements: Seq[PolicyStatement]): DataFrame = {
    val spark = principals.sparkSession
    import spark.implicits._
    val stmts = statements
      .map(s => (s.stmtId, s.effect.toLowerCase,
        wildcardToRegex(s.principalPattern), wildcardToRegex(s.resourcePattern)))
      .toDF("stmt_id", "effect", "p_regex", "r_regex")

    // statements are small: broadcast both halves of the match
    // (rlike with a column-valued pattern requires the expr form)
    val principalHits = principals.crossJoin(broadcast(stmts))
      .filter(expr("name rlike p_regex"))
      .select(col("id").as("principal_id"), col("stmt_id"), col("effect"))
    val resourceHits = resources.crossJoin(broadcast(stmts))
      .filter(expr("arn rlike r_regex"))
      .select(col("id").as("resource_id"), col("stmt_id").as("r_stmt_id"))

    val pairsFor = (eff: String) => principalHits.filter(col("effect") === eff)
      .join(resourceHits, col("stmt_id") === col("r_stmt_id"))
      .select(col("principal_id"), col("resource_id"))
      .dropDuplicates("principal_id" :: "resource_id" :: Nil)

    pairsFor("allow").join(pairsFor("deny"),
      Seq("principal_id", "resource_id"), "left_anti")
  }
}
