package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation computed in ONE pass over the
  * table (the Deequ/Great-Expectations shape): the caller lists checks,
  * every check contributes aggregate expressions to a single `agg`, and
  * the one-row result is unpivoted in-plan to (check, metric, value)
  * rows. The reference validates ingested assets ad hoc per module
  * (required-field presence, id non-emptiness — e.g.
  * cartography/intel/aws/ec2/instances.py asserts on required keys
  * before load); this is that concern made a first-class operator a
  * 100 TB pipeline can afford: N checks cost one table scan, not N.
  *
  * All fractions are exact floor-millionths (long arithmetic over two
  * counts), so results are partition-invariant and oracle-reproducible.
  *
  * Scale shape: a single scan + one aggregation. [[Uniqueness]] checks
  * add `count(DISTINCT ...)` which Catalyst plans via Expand — still one
  * scan of the source, with data duplicated once per distinct-group in
  * the exchange (the documented cost of exact uniqueness; swap to HLL
  * sketches in `text.Sketches` when approximate suffices). Everything
  * else is a plain map-side-combinable count/sum/min/max.
  */
object DataQuality {

  /** One validation rule; contributes (metric-name → long value) pairs. */
  sealed trait Check

  /** Fraction of rows with `column` non-null, in millionths. */
  final case class Completeness(column: String) extends Check

  /** distinct(columns) / rows, in millionths — 1e6 means a true key. */
  final case class Uniqueness(columns: Seq[String]) extends Check

  /** Fraction of rows satisfying `predicate`, in millionths. Nulls count
    * as unsatisfied (predicate is coalesced to false). */
  final case class Compliance(label: String, predicate: Column) extends Check

  /** min / max / sum of a long-valued column (pre-scale floats to exact
    * integers — cents, micros — before calling). */
  final case class NumericProfile(column: String) extends Check

  private val Ppm = 1000000L

  /** Run every check in one aggregation pass; returns
    * (check_name STRING, metric STRING, value BIGINT) rows, one per metric,
    * plus a ("rows", "count", n) row. Fractions divide AFTER the
    * aggregate with integer `div` (never float), so every value is
    * exact at any row count. */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    // (check, metric, raw aggregate, divide-by-n?) rows
    val metrics: Seq[(String, String, Column, Boolean)] =
      ("rows", "count", count(lit(1)).cast("long"), false) +: checks.flatMap {
        case Completeness(c) =>
          Seq((s"completeness:$c", "non_null_x1e6",
            count(col(c)).cast("long"), true))
        case Uniqueness(cs) =>
          Seq((s"uniqueness:${cs.mkString(",")}", "distinct_x1e6",
            count_distinct(col(cs.head), cs.tail.map(col): _*).cast("long"), true))
        case Compliance(label, p) =>
          Seq((s"compliance:$label", "satisfied_x1e6",
            sum(when(coalesce(p, lit(false)), 1L).otherwise(0L)).cast("long"), true))
        case NumericProfile(c) =>
          Seq((s"profile:$c", "min", min(col(c)).cast("long"), false),
            (s"profile:$c", "max", max(col(c)).cast("long"), false),
            (s"profile:$c", "sum", sum(col(c)).cast("long"), false))
      }
    val named = metrics.zipWithIndex.map { case ((_, _, c, _), i) => c.as(s"_m$i") }
    val row = df.agg(named.head, named.tail: _*)
    // unpivot the 1-row aggregate in-plan: no collect, stays a DataFrame
    row.select(explode(array(metrics.zipWithIndex.map { case ((chk, met, _, frac), i) =>
        // `div 0` yields NULL, not an error — on an empty table every
        // fraction must still be a concrete BIGINT (vacuous checks pass:
        // 1e6), or the "exact at any row count" contract breaks and typed
        // readers NPE on getLong.
        val value =
          if (frac) expr(s"if(_m0 = 0, ${Ppm}L, (_m$i * $Ppm) div _m0)")
          else col(s"_m$i")
        struct(lit(chk).as("check_name"), lit(met).as("metric"), value.as("value"))
      }: _*)).as("r"))
      .select(col("r.check_name").as("check_name"), col("r.metric").as("metric"),
        col("r.value").as("value"))
  }

  /** k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala
    * 2007): one row per quasi-identifier equivalence class that
    * VIOLATES either floor — fewer than `k` members, or fewer than `l`
    * distinct sensitive values. An empty result certifies the release;
    * a non-empty one lists exactly the classes to suppress or
    * generalize. One aggregation over the quasi-identifier tuple
    * (map-side combinable; the class census is tiny next to the
    * table). */
  def kAnonymityViolations(df: DataFrame, quasiCols: Seq[String],
                           sensitiveCol: String, k: Long,
                           l: Long = 1L): DataFrame = {
    require(k >= 2 && l >= 1, "need k >= 2 and l >= 1")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .filter(col("class_size") < k || col("n_sensitive") < l)
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007): one row per
    * quasi-identifier class whose sensitive-value distribution sits
    * farther than `tPpm` from the table-wide distribution — the release
    * gate l-diversity can't provide when values are distinct but skewed
    * (a class that is 90% one diagnosis "has 3 distinct values" and
    * still leaks). Distance = total variation (the categorical EMD
    * under unit ground distance), exact in ppm:
    * tvd = Σ_s |n_cs·N − g_s·n_c| · 1e6 div (2·n_c·N), decimal(38,0)
    * throughout so petabyte-count products can't wrap.
    *
    * Plan shape: one class census + one cell census + one global census,
    * then classes × sensitive-domain (the domain is the SMALL dimension
    * — broadcast) with absent cells counted at zero. Output:
    * (quasi..., class_size, tvd_ppm) for violators only, empty =
    * certified. */
  def tClosenessViolations(df: DataFrame, quasiCols: Seq[String],
                           sensitiveCol: String, tPpm: Long): DataFrame = {
    require(tPpm >= 0 && tPpm <= 1000000, "tPpm must be in [0, 1e6]")
    val cls = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
    val cell = df.groupBy((quasiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("n_cs"))
    val glob = df.groupBy(col(sensitiveCol))
      .agg(count(lit(1)).as("g_s"))
    val total = df.agg(count(lit(1)).as("n_total"))
    cls.crossJoin(broadcast(glob)).crossJoin(broadcast(total))
      .join(cell, quasiCols :+ sensitiveCol, "left")
      .select((quasiCols.map(col) :+ col("class_size") :+ col("n_total") :+
        abs(coalesce(col("n_cs"), lit(0L)).cast("decimal(38,0)") * col("n_total")
          - col("g_s").cast("decimal(38,0)") * col("class_size")).as("_dev")): _*)
      .groupBy((quasiCols.map(col) :+ col("class_size") :+ col("n_total")): _*)
      .agg(sum(col("_dev")).as("_sumdev"))
      .select((quasiCols.map(col) :+ col("class_size") :+
        expr("CAST((_sumdev * 1000000) div " +
          "(2 * CAST(class_size AS DECIMAL(38,0)) * n_total) AS BIGINT)")
          .as("tvd_ppm")): _*)
      .filter(col("tvd_ppm") > tPpm)
  }
}
