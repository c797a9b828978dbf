package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** In-corpus bigram language model with add-1/2 smoothing over the
  * bigram-successor vocabulary: p(w2|w1) = (c(w1,w2) + 0.5) /
  * (c(w1·) + 0.5·V), each document scored by its average bigram
  * surprisal (q92; the n-gram upgrade of the q57 unigram filter).
  *
  * Scale shape (round 10) — model-side aggregation + shuffled hash
  * join, replacing the round-8 single-exchange window. The window
  * formulation partitioned the full per-doc (doc, w1, w2, c) relation
  * by `w1` alone, which serializes every bigram headed by a stopword
  * ("the …") through ONE task and sorts the whole relation — the
  * classic Zipf-head skew, measured as the dominant cost at sf0.1 and
  * fatal at 100 TB. Here the corpus model c(w1,w2)/c(w1·) is built by
  * a COMBINABLE groupBy(w1,w2) (map-side partials collapse each
  * partition's duplicate pairs before the wire, so the exchange
  * carries distinct-pairs-per-partition, not occurrences), c(w1·) is
  * a window over that already-tiny pair relation, and per-doc rows
  * ride ONE exchange keyed by (w1,w2) — Zipf heads spread over the
  * full w2 fan-out — into a SHUFFLE_HASH join (no probe-side sort; a
  * sort-merge join would re-sort the full relation and forfeit the
  * win). The model is never driver-materialized (a 100 TB bigram
  * vocabulary is fine — it stays partitioned). V rides as a broadcast
  * 1-row distinct-successor count.
  */
object BigramLm {

  /** Per-document average bigram surprisal. Returns one row per
    * document with >= 2 tokens: (docId, carry..., n_bigrams,
    * avg_neg_logp rounded to 6dp).
    */
  def scoreDocs(docs: DataFrame, textCol: String, docId: String,
      carry: Seq[String] = Nil): DataFrame = {
    val toks = filter(split(lower(col(textCol)), "\\s+"), t => t =!= "")
    val carryCols: Seq[Column] = carry.map(col)
    val keyCols: Seq[Column] = col(docId) +: carryCols
    // per-doc pair counts come straight off the scan via the
    // bigram_counts kernel — ZERO shuffle (round 8; the previous
    // explode → groupBy(doc, w1, w2) exchange only ever combined rows
    // that were already partition-local, since doc was part of the key)
    val bg = docs
      .select((keyCols :+ explode(graft.functions.SketchExpressions
        .bigram_counts(col(textCol))).as("b")): _*)
      .select((keyCols :+ col("b.w1").as("w1") :+ col("b.w2").as("w2")
        :+ col("b.c").as("c")): _*)
    // corpus model: combinable pair counts, then heads over the pair
    // relation (rows per w1 partition = distinct successors of that
    // head — vocab-bounded, NOT occurrence-bounded, so the window is
    // skew-safe where the old per-doc-row w1 window was not)
    val pairCounts = bg.groupBy(col("w1"), col("w2"))
      .agg(sum(col("c")).as("c2"))
    val pairStats = pairCounts
      .withColumn("c1", sum(col("c2")).over(Window.partitionBy(col("w1"))))
    // V = distinct successor tokens = distinct w2 of the PAIR relation:
    // deriving it from pairCounts (not a third token-slice projection
    // over the corpus) lets ReuseExchange serve both this branch and
    // the model build side from ONE scan + kernel + pair exchange
    val vBr = broadcast(pairCounts
      .select(col("w2")).distinct().agg(count(lit(1)).as("__V")))
    // No join-strategy hint (round 12): an explicit shuffle_hash hint
    // wins over runtime stats in JoinSelection, so it also FORCES the
    // full per-doc bigram relation through a (w1,w2) exchange when the
    // pair model is tiny (synthetic corpora measure ~1k pairs; the
    // probe side is 250x larger). Unhinted, AQE sizes the built model
    // at runtime: small model -> broadcast hash join, probe side never
    // shuffles; big model (the 100 TB case) -> shuffled join on
    // (w1,w2), Zipf heads spread over the w2 fan-out as before.
    bg.join(pairStats, Seq("w1", "w2"))
      .crossJoin(vBr)
      .groupBy(keyCols: _*)
      .agg(sum(col("c")).as("n_bigrams"),
        round(-sum(col("c").cast("double") *
            log((col("c2").cast("double") + 0.5) /
              (col("c1").cast("double") + lit(0.5) * col("__V").cast("double"))))
          / sum(col("c")).cast("double"), 6).as("avg_neg_logp"))
  }
}
