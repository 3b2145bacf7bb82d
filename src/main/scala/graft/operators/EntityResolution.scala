package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Probabilistic record linkage in the Fellegi–Sunter frame
  * (Fellegi & Sunter 1969, JASA 64: the optimal linkage rule orders
  * candidate pairs by the likelihood ratio of their field-agreement
  * pattern and thresholds into link / possible-link / non-link), via the
  * supervised agreement-PATTERN table: with labeled pairs the ratio
  * P(pattern|M) / P(pattern|U) is two exact counts — no EM, no
  * conditional-independence assumption (the per-field m/u product form
  * needs independence; the pattern table doesn't).
  *
  * Everything is exact integer/decimal arithmetic in ppm — no log-space
  * floats, so results hash-match any engine. The pattern table is tiny
  * (≤ 2^|fields| rows) and broadcasts; classification of a 100 TB
  * candidate set is one broadcast-join over the agreement columns the
  * blocking stage already computed.
  */
object EntityResolution {

  /** Agreement-pattern statistics from labeled pairs: one row per
    * distinct boolean agreement vector with match/non-match counts and
    * the exact likelihood ratio in ppm,
    * `lr_ppm = (n_match · total_unmatch · 1e6) div (n_unmatch · total_match)`
    * (decimal(38,0) product — petabyte-scale pair counts can't wrap).
    * A pattern never seen among non-matches has unbounded evidence:
    * lr_ppm is null there (classify treats null as +inf). */
  def patternTable(labeled: DataFrame, agreeCols: Seq[String],
                   labelCol: String): DataFrame = {
    require(agreeCols.nonEmpty && agreeCols.size <= 20,
      "need 1..20 agreement columns")
    val isM = col(labelCol).cast("boolean")
    val byPat = labeled
      .groupBy(agreeCols.map(c => col(c).cast("boolean").as(c)): _*)
      .agg(sum(when(isM, 1L).otherwise(0L)).as("n_match"),
        sum(when(isM, 0L).otherwise(1L)).as("n_unmatch"))
    val totals = byPat.agg(sum(col("n_match")).as("_tm"),
      sum(col("n_unmatch")).as("_tu"))
    byPat.crossJoin(broadcast(totals))
      .select((agreeCols.map(col) :+ col("n_match") :+ col("n_unmatch") :+
        when(col("_tm") === 0 || col("n_unmatch") === 0,
          lit(null).cast("long"))
          .otherwise(expr(
            "CAST((CAST(n_match AS DECIMAL(38,0)) * _tu * 1000000) div " +
              "(CAST(n_unmatch AS DECIMAL(38,0)) * _tm) AS BIGINT)"))
          .as("lr_ppm")): _*)
  }

  /** Three-way Fellegi–Sunter decision for candidate pairs: join each
    * pair's agreement vector to its pattern's likelihood ratio and
    * threshold — `lr_ppm >= upperPpm` → link, `< lowerPpm` → non-link,
    * between → possible (clerical review); null lr (match-only pattern)
    * → link; a pattern absent from the training table → possible.
    * The table side broadcasts (≤ 2^|fields| rows); the pair side never
    * shuffles. Output columns: the agreement columns first (the join
    * key), then the pair's remaining columns, `lr_ppm`, `decision`. */
  def classify(pairs: DataFrame, table: DataFrame, agreeCols: Seq[String],
               lowerPpm: Long, upperPpm: Long): DataFrame = {
    require(lowerPpm <= upperPpm, "need lowerPpm <= upperPpm")
    val casted = pairs.withColumns(
      agreeCols.map(c => c -> col(c).cast("boolean")).toMap)
    casted.join(broadcast(table.select(
        (agreeCols.map(col) :+ col("lr_ppm") :+ lit(true).as("_known")): _*)),
        agreeCols, "left")
      .withColumn("decision",
        when(col("_known").isNull, lit("possible"))
          .when(col("lr_ppm").isNull || col("lr_ppm") >= upperPpm, lit("link"))
          .when(col("lr_ppm") < lowerPpm, lit("non-link"))
          .otherwise(lit("possible")))
      .drop("_known")
  }
}
