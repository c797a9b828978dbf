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

  /** Pearson chi-square independence test + Cramér's V over a
    * two-attribute contingency table (source × language is the corpus-
    * balance check: V near 0 = languages spread evenly across sources,
    * V near 1 = each source is monolingual — a mixture-weighting alarm
    * before training). Uses the algebraic identity
    * `chi2 = N * (sum_cells O^2 / (rowTotal * colTotal) - 1)`, which
    * needs NO expected-count row for empty cells — only observed cells
    * contribute. Each cell's term (≤ 1 by construction) is rounded to
    * integer PICO-units and summed as BIGINT (the [[termDrift]] float
    * discipline), so the statistic is order-independent at any
    * parallelism.
    *
    * Scale shape: one map-side-combinable groupBy(row, col) count — the
    * only corpus-sized pass; marginals and the scalar reduce over the
    * (tiny) cell table with broadcast join-backs. Output is one row:
    * (n, n_rows, n_cols, dof, chi2, cramers_v).
    */
  def balanceChi2(df: DataFrame, rowCol: Column, colCol: Column): DataFrame = {
    // rows with a NULL attribute are excluded UP FRONT: a null-keyed
    // cell would be counted in n (groupBy keeps a null group) but
    // silently dropped from the O²/(rt·ct) sum by the null-equality
    // joins below — chi2 = n·(sum−1) then understates, and can even go
    // negative. Excluding nulls from the table entirely (the standard
    // contingency-table convention, matching countDistinct) keeps every
    // term and n consistent.
    val obs = df.filter(rowCol.isNotNull && colCol.isNotNull)
      .groupBy(rowCol.as("__r"), colCol.as("__c"))
      .agg(count(lit(1)).as("__o"))
    val rt = obs.groupBy(col("__r")).agg(sum(col("__o")).as("__rt"))
    val ct = obs.groupBy(col("__c")).agg(sum(col("__o")).as("__ct"))
    val tot = broadcast(obs.agg(sum(col("__o")).as("__n"),
      countDistinct(col("__r")).as("__nr"),
      countDistinct(col("__c")).as("__nc")))
    val term = (col("__o") * col("__o")).cast("double") /
      (col("__rt") * col("__ct")).cast("double")
    val s = obs
      .join(broadcast(rt), Seq("__r")).join(broadcast(ct), Seq("__c"))
      .select(round(term * lit(1e12)).cast("long").as("__pico"))
      .agg(sum(col("__pico")).as("__s"))
    val chi2 = col("__n").cast("double") *
      (col("__s").cast("double") / lit(1e12) - lit(1.0))
    val vDen = col("__n").cast("double") *
      (least(col("__nr"), col("__nc")) - lit(1L)).cast("double")
    s.crossJoin(tot)
      .select(col("__n").as("n"),
        col("__nr").as("n_rows"), col("__nc").as("n_cols"),
        ((col("__nr") - 1) * (col("__nc") - 1)).as("dof"),
        round(chi2, 6).as("chi2"),
        when(least(col("__nr"), col("__nc")) > 1,
            round(sqrt(greatest(chi2, lit(0.0)) / vDen), 6))
          .otherwise(lit(0.0)).as("cramers_v"))
  }
}
