package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.SketchExpressions

/** Cross-document repeated-span detection — the exact-substring screen
  * of the dedup family (cf. the suffix-array "exact substring
  * deduplication" of Lee et al. 2022, re-expressed relationally): match
  * positional k-token gram hashes between documents and chain
  * consecutive matches along each alignment diagonal (ia − ib) into
  * maximal runs with the rank-islands trick.
  *
  * Scale posture: grams ship as 60-bit md5 slices from one codegen
  * kernel pass ([[SketchExpressions.gram_hash_seq]]); the
  * document-frequency cap `dfCap` bounds the gram equi-join fanout
  * (hotter grams are boilerplate — [[Dedup.stripBoilerplateBlocks]]'s
  * territory); the islands window partitions by (pair, diagonal), whose
  * group size is bounded by one document's token count, never corpus
  * size.
  */
object Spans {

  /** Maximal shared token spans of ≥ `minSpan` tokens between document
    * pairs. Returns (doc_a, doc_b, max_span_tokens, n_spans,
    * first_pos_a) with doc_a < doc_b, one row per pair.
    *
    * @param k       gram width in tokens (span resolution: two spans
    *                closer than k tokens merge into one run).
    * @param minSpan minimum span length in tokens to report (≥ k).
    * @param dfCap   ignore grams present in more than this many docs.
    */
  def repeatedSpans(docs: DataFrame, textCol: String, idCol: String,
      k: Int = 8, minSpan: Int = 12, dfCap: Int = 16): DataFrame =
    matchedRuns(docs, textCol, idCol, k, minSpan, dfCap)
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(max(col("span_tokens")).as("max_span_tokens"),
        count(lit(1)).as("n_spans"), min(col("start_a")).as("first_pos_a"))

  /** Maximal matched runs with both-side positions — the internal stage
    * [[repeatedSpans]] aggregates and [[scrubSpans]] applies. One row
    * per (doc_a < doc_b, diagonal, run): run length in grams and the
    * 0-based start token of the span in each document.
    */
  def matchedRuns(docs: DataFrame, textCol: String, idCol: String,
      k: Int, minSpan: Int, dfCap: Int): DataFrame = {
    require(minSpan >= k, s"minSpan ($minSpan) must be >= k ($k)")
    val minRun = minSpan - k + 1
    val g = docs
      .select(col(idCol).as("doc_id"),
        posexplode(SketchExpressions.gram_hash_seq(col(textCol), k)))
      .toDF("doc_id", "pos0", "g")
      .select(col("doc_id"), col("pos0").cast("long").as("pos"), col("g"))
    val dfc = g.select(col("g"), col("doc_id")).distinct()
      .groupBy(col("g")).agg(count(lit(1)).as("nd"))
      .filter(col("nd").between(2, dfCap)).select(col("g"))
    val gk = g.join(dfc, Seq("g"))
    val m = gk.select(col("g"), col("doc_id").as("doc_a"), col("pos").as("ia"))
      .join(gk.select(col("g"), col("doc_id").as("doc_b"),
        col("pos").as("ib")), Seq("g"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (col("ia") - col("ib")).as("diag"), col("ia"))
      .distinct()
    val w = Window.partitionBy(col("doc_a"), col("doc_b"), col("diag"))
      .orderBy(col("ia"))
    m.withColumn("grp", col("ia") - row_number().over(w))
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("grp"))
      .agg(count(lit(1)).as("run"), min(col("ia")).as("start_a"))
      .filter(col("run") >= minRun)
      .select(col("doc_a"), col("doc_b"), col("run"),
        col("start_a"), (col("start_a") - col("diag")).as("start_b"),
        (col("run") + (k - 1)).as("span_tokens"))
  }

  /** APPLY the screen: remove every ≥ `minSpan`-token span from the
    * HIGHER-id document of each matching pair (first-occurrence-wins,
    * the q20/q60 id contract), rebuilding the text from the surviving
    * tokens with canonical single-space joins. Covered token indices
    * union across pairs and overlapping runs; per-victim state is
    * bounded by the document's own token count. Returns every document
    * with (n_tokens_before, n_tokens_removed, text_out).
    */
  def scrubSpans(docs: DataFrame, textCol: String, idCol: String,
      k: Int = 8, minSpan: Int = 12, dfCap: Int = 16): DataFrame = {
    val runs = matchedRuns(docs, textCol, idCol, k, minSpan, dfCap)
    val covered = runs
      .select(col("doc_b").as("__vid"),
        explode(sequence(col("start_b"),
          col("start_b") + col("span_tokens") - 1)).as("idx"))
      .groupBy(col("__vid")).agg(collect_set(col("idx")).as("cov"))
    docs
      .select(col(idCol), col(textCol),
        filter(split(col(textCol), "\\s+"), t => t =!= "").as("__toks"))
      .join(covered, col(idCol) === col("__vid"), "left")
      .select(col(idCol),
        size(col("__toks")).cast("long").as("n_tokens_before"),
        coalesce(size(col("cov")), lit(0)).cast("long")
          .as("n_tokens_removed"),
        concat_ws(" ", expr(
          """transform(filter(
               transform(__toks, (t, i) ->
                 named_struct('t', t, 'i', CAST(i AS BIGINT))),
               s -> cov IS NULL OR NOT array_contains(cov, s.i)),
             s -> s.t)""")).as("text_out"))
  }
}
