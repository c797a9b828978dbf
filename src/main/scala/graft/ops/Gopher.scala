package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher/MassiveText rule-based document quality gate (Rae et al.
  * 2021, public): per-document boolean verdicts for the five rule
  * families this corpus can express. Every decision is cross-multiplied
  * integer arithmetic (`wl >= 3n`, never `wl/n >= 3.0`), so the
  * verdicts are bit-identical across engines and across row orders —
  * the property q103's oracle certifies.
  *
  * Pure projection (zero shuffle, codegen end-to-end): usable unchanged
  * as a batch stage or a stateless streaming twin.
  */
object Gopher {

  /** Required-stopword lexicon. Gopher's canonical English list is
    * {the, be, to, of, and, that, have, with}; a real pipeline swaps the
    * lexicon per language/domain (the rule is "contains >= 2 distinct
    * high-frequency function words", the list is a parameter). The
    * default here is the engine's English function-word list — on the
    * driver corpus the canonical list is degenerate (only "the" occurs
    * in its vocabulary, so no document could ever pass).
    */
  val stopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "that")

  /** Add the five rule columns plus the combined `pass` verdict. */
  def withRules(df: DataFrame, textCol: String,
      stops: Seq[String] = stopwords): DataFrame = {
    val text: Column = coalesce(col(textCol), lit(""))
    val toks = filter(split(lower(text), "\\s+"), t => t =!= "")
    val n = size(toks).cast("long")
    // sum of word lengths == count of non-whitespace chars
    val wl = length(regexp_replace(text, "\\s+", "")).cast("long")
    val nAlpha = size(filter(toks, t => t.rlike("[a-z]"))).cast("long")
    val nStop = size(array_intersect(array_distinct(toks),
      array(stops.map(lit): _*))).cast("long")
    val nSym = (size(split(text, "#", -1)) - 1 +
      size(split(text, "\\.\\.\\.", -1)) - 1).cast("long")
    df
      .withColumn("r_wordcount", n >= lit(50L) && n <= lit(100000L))
      .withColumn("r_meanlen", wl >= n * 3L && wl <= n * 10L)
      .withColumn("r_alpha", nAlpha * 5L >= n * 4L)
      .withColumn("r_stop", nStop >= lit(2L))
      .withColumn("r_symbol", nSym * 10L <= n)
      .withColumn("pass", col("r_wordcount") && col("r_meanlen") &&
        col("r_alpha") && col("r_stop") && col("r_symbol"))
  }
}
