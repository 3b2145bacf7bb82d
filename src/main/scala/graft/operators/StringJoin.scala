package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate string matching as a JOIN — the fuzzy-identity problem
  * the reference solves with `CONTAINS` theta joins for DNS/resource
  * names (cartography/graph/querybuilder.py fuzzy_and_ignore_case
  * matchers), generalized to bounded edit distance for typo'd /
  * re-keyed identifiers.
  *
  * A naive edit-distance join is an O(n·m) nested loop with an O(len²)
  * scalar per pair — never viable at scale. This operator makes the
  * standard trade: a cheap EQUI-join on a blocking key prunes the pair
  * space first, and two exact filters run only inside blocks:
  *
  *   - block key: the first token of the name. Two strings that already
  *     differ in their leading token are out of scope (documented recall
  *     contract, same shape as [[graft.dedup.Dedup.blockedJaccard]]).
  *   - length band: |len(a) − len(b)| ≤ k is a necessary condition for
  *     edit distance ≤ k — a codegen'd filter evaluated before the
  *     DP-quadratic levenshtein ever runs.
  *
  * The result is exact WITHIN blocks: levenshtein (built-in, codegen'd,
  * unit-cost insert/delete/substitute) decides membership.
  */
object StringJoin {

  /** All (left, right) pairs whose `nameCol` values share a first token,
    * sit within the k length band, and have levenshtein distance ≤ k.
    * Output: (id_a, name_a, id_b, name_b, dist).
    *
    * Scale shape: shuffle on the block key only; block sizes are the
    * skew knob (a corpus where half the names share a first token needs
    * a composite block key — first token + length bucket — which this
    * accepts via any pre-computed name transform). */
  def editDistanceJoin(left: DataFrame, right: DataFrame,
                       idCol: String, nameCol: String, k: Int): DataFrame = {
    require(k >= 0, "edit-distance bound must be non-negative")
    def keyed(df: DataFrame, side: String) =
      df.select(col(idCol).cast("long").as(s"id_$side"),
        col(nameCol).as(s"name_$side"),
        element_at(split(col(nameCol), " "), 1).as("_block"))
    keyed(left, "a").join(keyed(right, "b"), Seq("_block"))
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <= k)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= k)
      .select(col("id_a"), col("name_a"), col("id_b"), col("name_b"), col("dist"))
  }
}
