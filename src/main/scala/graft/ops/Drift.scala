package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-slice term-distribution drift — the distribution-shift alarm
  * between two corpus slices (old crawl vs new delivery, train vs
  * validation): symmetric KL divergence of add-1-smoothed unigram
  * distributions over the union vocabulary (the declared q97 surface).
  *
  * Float discipline: each term's KL contribution is computed in a
  * PINNED double op order, rounded to integer NANO-units and summed as
  * BIGINT — the exact-integer-scaling recipe, so the total is
  * order-independent at any parallelism and identical on any engine
  * evaluating the same formula.
  *
  * Scale shape: one combinable per-(term, slice) count pivoted inside
  * the same aggregation, union-vocabulary totals as a broadcast 1-row
  * aggregate, one combinable BIGINT sum — the term table (the model)
  * never leaves the cluster.
  */
object Drift {

  /** `sliceCol` must evaluate to 0 (slice a) or 1 (slice b). */
  def termDrift(df: DataFrame, textCol: String, sliceCol: Column): DataFrame = {
    val tc = df
      .select(sliceCol.as("__s"), explode(filter(split(lower(col(textCol)),
        "\\s+"), t => t =!= "")).as("term"))
      .groupBy(col("term"))
      .agg(sum(when(col("__s") === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("__s") === 1, 1L).otherwise(0L)).as("cb"))
    val tot = broadcast(tc.agg(count(lit(1)).as("__v"),
      sum(col("ca")).as("__na"), sum(col("cb")).as("__nb")))
    val pa = (col("ca") + lit(1L)).cast("double") /
      (col("__na") + col("__v")).cast("double")
    val pb = (col("cb") + lit(1L)).cast("double") /
      (col("__nb") + col("__v")).cast("double")
    tc.crossJoin(tot)
      .select(col("__v"), col("__na"), col("__nb"),
        round(pa * log(pa / pb) * lit(1e9)).cast("long").as("__tab"),
        round(pb * log(pb / pa) * lit(1e9)).cast("long").as("__tba"))
      .groupBy(col("__v"), col("__na"), col("__nb"))
      .agg(sum(col("__tab")).as("__sab"), sum(col("__tba")).as("__sba"))
      .select(col("__v").as("vocab_size"),
        col("__na").as("n_tokens_a"), col("__nb").as("n_tokens_b"),
        round(col("__sab").cast("double") / lit(1e9), 6).as("kl_ab"),
        round(col("__sba").cast("double") / lit(1e9), 6).as("kl_ba"))
  }
}
