package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.SketchExpressions

/** Vocabulary coverage curve — the tokenizer-sizing question: how small
  * a frequency-ranked vocabulary still covers p% of corpus token mass?
  *
  * Scale shape: term counts come off the `term_counts` codegen kernel
  * (one map-side-combinable aggregation, vocab-sized output); the
  * frequency rank, the cumulative mass AND the grand total all come
  * from ONE [[DistWindow.withGlobalRankAndBefore]] machinery on the
  * monotone (-count, term) key — no unpartitioned window, one full
  * exchange, one broadcast (the previous rank → running-before →
  * total-aggregate stack paid three). Coverage tests are exact integer
  * cross-multiplication ((cum)*100 >= total*p); one prefix relation
  * serves every requested level.
  */
object Vocab {

  /** One row per coverage level: (coverage_pct, vocab_size,
    * tokens_covered, total_tokens).
    */
  def coverageCurve(docs: DataFrame, textCol: String,
      levels: Seq[Int] = Seq(80, 90, 95, 99)): DataFrame = {
    val tc = docs
      .select(explode(SketchExpressions
        .term_counts(coalesce(col(textCol), lit("")))).as("t"))
      .groupBy(col("t.term").as("term")).agg(sum(col("t.tf")).as("cnt"))
    val keyed = tc.withColumn("__negc", -col("cnt"))
    val pre = DistWindow.withGlobalRankAndBefore(keyed,
      floor(col("__negc") / 64L), Seq(col("__negc"), col("term")),
      col("cnt"), "r", "__before", "__t")
    pre
      .select(col("r"), col("cnt"), col("__before"), col("__t"),
        explode(array(levels.map(lit): _*)).as("p"))
      .filter((col("__before") + col("cnt")) * 100 >= col("__t") * col("p"))
      .groupBy(col("p"))
      .agg(min(col("r")).as("vocab_size"),
        min(col("__before") + col("cnt")).as("tokens_covered"),
        max(col("__t")).as("total_tokens"))
      .select(col("p").as("coverage_pct"), col("vocab_size"),
        col("tokens_covered"), col("total_tokens"))
      // bounded percent grid: 1-partition sort skips the sampling job
      .coalesce(1).sortWithinPartitions(col("coverage_pct"))
  }
}
