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
    * resource_id) edges.
    *
    * Algorithm: each side gets a statement-match bitmask (one literal
    * compiled regex per statement — codegen'd RLike), the ≤ 2^|stmts|
    * distinct (p_mask, r_mask) combinations are decided once with pure bit
    * arithmetic, and the allowed pairs expand through two broadcast hash
    * joins. Zero shuffles, no DISTINCT pass, and the pair space is only
    * materialized as the output itself. */
  def evaluate(principals: DataFrame, resources: DataFrame,
               statements: Seq[PolicyStatement]): DataFrame = {
    require(statements.size <= 62, "bitmask evaluation supports ≤62 statements")
    val compiled = statements.zipWithIndex.map { case (s, i) =>
      (i, s.effect.toLowerCase == "allow",
        wildcardToRegex(s.principalPattern), wildcardToRegex(s.resourcePattern))
    }
    val allowBits = compiled.collect { case (i, true, _, _) => 1L << i }.sum
    val denyBits = compiled.collect { case (i, false, _, _) => 1L << i }.sum

    def maskCol(target: Column, pat: (Int, Boolean, String, String) => String): Column =
      compiled.map { c =>
        when(target.rlike(pat.tupled(c)), lit(1L << c._1)).otherwise(lit(0L))
      }.reduce(_ + _) // bits are disjoint → sum == bitwise or

    val p = principals.select(col("id").as("principal_id"),
      maskCol(col("name"), (_, _, pre, _) => pre).as("p_mask"))
    val r = resources.select(col("id").as("resource_id"),
      maskCol(col("arn"), (_, _, _, rre) => rre).as("r_mask"))

    val shared = col("p_mask").bitwiseAND(col("r_mask"))
    val decisions = p.select("p_mask").distinct()
      .crossJoin(r.select("r_mask").distinct())
      .filter(shared.bitwiseAND(lit(allowBits)) =!= 0L &&
        shared.bitwiseAND(lit(denyBits)) === 0L)

    val allowedPrincipals = p.join(broadcast(decisions), Seq("p_mask"))
    r.join(broadcast(allowedPrincipals), Seq("r_mask"))
      .select(col("principal_id"), col("resource_id"))
  }
}
