package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** In-corpus bigram language model with add-1/2 smoothing over the
  * bigram-successor vocabulary: p(w2|w1) = (c(w1,w2) + 0.5) /
  * (c(w1·) + 0.5·V), each document scored by its average bigram
  * surprisal (q92; the n-gram upgrade of the q57 unigram filter).
  *
  * Scale shape — the q57 window discipline, one key deeper, now on ONE
  * exchange: the distinct (doc, w1, w2, c) relation is partitioned by
  * `w1` once; the head count c(w1·) is a plain partition sum and the
  * bigram count c(w1,w2) is a sum over the ORDER BY w2 range frame of
  * its ties (peers with equal w2 ≡ the (w1,w2) group), so BOTH model
  * counts ride the same shuffle — no second exchange, no model join,
  * and the model is never driver-materialized (a 100 TB bigram
  * vocabulary is fine). V rides as a broadcast 1-row
  * distinct-successor count.
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
    // V = distinct successor tokens, from a token-slice projection
    // (positions 2..n of docs with >= 2 tokens) — the same set bg's w2
    // column holds, without re-deriving the pair relation for a scalar
    val vBr = broadcast(docs
      .select(toks.as("toks")).filter(size(col("toks")) >= 2)
      .select(explode(slice(col("toks"), lit(2), size(col("toks")) - 1))
        .as("w2"))
      .distinct().agg(count(lit(1)).as("__V")))
    val wHead = Window.partitionBy(col("w1"))
    // peers under ORDER BY w2 = the (w1, w2) group: same exchange as wHead
    val wTie = Window.partitionBy(col("w1")).orderBy(col("w2"))
      .rangeBetween(Window.currentRow, Window.currentRow)
    bg.withColumn("c2", sum(col("c")).over(wTie))
      .withColumn("c1", sum(col("c")).over(wHead))
      .crossJoin(vBr)
      .groupBy(keyCols: _*)
      .agg(sum(col("c")).as("n_bigrams"),
        round(-sum(col("c").cast("double") *
            log((col("c2").cast("double") + 0.5) /
              (col("c1").cast("double") + lit(0.5) * col("__V").cast("double"))))
          / sum(col("c")).cast("double"), 6).as("avg_neg_logp"))
  }
}
