package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed BPE tokenizer training (merge learning), the word-dict
  * formulation every industrial trainer uses (SentencePiece / HF
  * tokenizers): the corpus collapses ONCE into a (word, count) frequency
  * table, and all merge rounds run over that vocabulary-sized table —
  * never over the corpus again.
  *
  * Scale shape at 100 TB:
  *  - one corpus-wide shuffle total (the word-count groupBy, map-side
  *    combinable; distinct words cross the wire, never documents);
  *  - each merge round is a map-side-combinable pair-count over the
  *    CACHED word dict plus a 1-row TakeOrdered — no corpus rescan;
  *  - the learned model (the merge list) is R driver-side rows, folded
  *    back into the plan as literal `replace` rewrites, so the per-round
  *    plan holds exactly r string replacements — growth is bounded by
  *    `rounds`, not by data.
  *
  * Symbol sequences ride as delimited strings ("␟l␟␟o␟␟w␟") rather than
  * arrays: applying a merge is then ONE codegen `StringReplace`
  * (leftmost, non-overlapping — the greedy BPE application order), and
  * wrapping every symbol in its own delimiter pair makes adjacent merges
  * self-delimiting ("␟a␟␟b␟␟a␟␟b␟" → "␟ab␟␟ab␟" in a single pass).
  *
  * Training is restricted to `[a-z0-9]+` words after lowercasing, so a
  * "symbol" is always a whole ASCII char — no multi-byte splitting
  * ambiguity — and the delimiter (U+241F) can never occur inside one.
  */
object Bpe {

  /** Symbol delimiter — U+241F SYMBOL FOR UNIT SEPARATOR. */
  val Delim = "␟"

  final case class Merge(
      merge_rank: Int, lhs: String, rhs: String, merged: String, weight: Long)

  /** Learn `rounds` BPE merges from the corpus; returns one row per merge
    * in learned order: (merge_rank, lhs, rhs, merged, weight) where
    * weight is the occurrence-weighted adjacent-pair count at the time
    * the merge was chosen. Ties break on (lhs, rhs) ascending, so the
    * result is deterministic.
    */
  def trainMerges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val D2 = Delim + Delim
    val words = docs
      .select(explode(filter(split(lower(col(textCol)), "\\s+"), t => t =!= ""))
        .as("w"))
      .filter($"w".rlike("^[a-z0-9]+$"))
      .groupBy($"w").agg(count(lit(1)).as("cnt"))
      .withColumn("seq", concat(lit(Delim),
        array_join(filter(split($"w", ""), c => c =!= ""), D2), lit(Delim)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
      // the working symbol sequence = cached base seq + the merges so far,
      // applied as literal codegen replaces. The chain is re-materialized
      // every 16 rounds (localCheckpoint, the connectedComponents
      // convention): without it, round r replays r replaces per row
      // (O(R²) total) and a 64-deep nested replace expression risks
      // blowing codegen method limits — with it, plan depth and per-round
      // work stay bounded regardless of `rounds`.
      var working = words
      var seqCol = col("seq")
      var r = 1
      var exhausted = false
      while (r <= rounds && !exhausted) {
        if ((r - 1) % 16 == 0 && r > 1) {
          working = working.withColumn("seq", seqCol).localCheckpoint(false)
          seqCol = col("seq")
        }
        val syms = split(trim(seqCol, Delim), D2)
        val best = working
          .select($"cnt", syms.as("syms"))
          .filter(size($"syms") >= 2)
          .select($"cnt", explode(zip_with(
            slice($"syms", lit(1), size($"syms") - 1),
            slice($"syms", lit(2), size($"syms") - 1),
            (a, b) => struct(a.as("lhs"), b.as("rhs")))).as("p"))
          .groupBy($"p.lhs".as("lhs"), $"p.rhs".as("rhs"))
          .agg(sum($"cnt").as("weight"))
          .orderBy($"weight".desc, $"lhs", $"rhs")
          .limit(1)
          .collect()
        best match {
          case Array(Row(l: String, rt: String, w: Long)) =>
            merges += Merge(r, l, rt, l + rt, w)
            seqCol = replace(seqCol,
              lit(Delim + l + Delim + Delim + rt + Delim),
              lit(Delim + l + rt + Delim))
            r += 1
          case _ => exhausted = true // no adjacent pairs left to merge
        }
      }
      spark.createDataFrame(merges.toSeq)
        .select($"merge_rank", $"lhs", $"rhs", $"merged", $"weight")
    } finally { words.unpersist(); () }
  }

  /** Tokenizer APPLY at corpus scale: count BPE tokens per document
    * under a learned merge list. The model rides into the plan as
    * `merges.size` literal codegen string replaces inside a `transform`
    * lambda — zero shuffle, zero joins; the corpus is scanned once and
    * the per-word merge replay is whole-stage-codegen'd. Words outside
    * `[a-z0-9]+` are excluded, mirroring [[trainMerges]].
    *
    * Adds `n_words` (qualifying words) and `n_bpe_tokens` (symbols after
    * applying every merge in learned order).
    */
  def tokenizeCount(docs: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val st = graft.functions.SketchExpressions.bpe_stats(
      coalesce(col(textCol), lit("")), merges)
    // two-step select: CollapseProject keeps the non-cheap kernel alias
    // single-evaluation (the q29 double-eval lesson)
    docs
      .withColumn("__bpe", st)
      .withColumn("n_words", element_at(col("__bpe"), 1))
      .withColumn("n_bpe_tokens", element_at(col("__bpe"), 2))
      .drop("__bpe")
  }

  /** Segment a word with a learned merge list (greedy, in merge order) —
    * the tokenizer-apply side, used by tests to pin that training and
    * application agree on the string-replace semantics.
    */
  def segment(word: String, merges: Seq[(String, String)]): Seq[String] = {
    val D2 = Delim + Delim
    var seq = word.toCharArray.map(c => Delim + c + Delim).mkString
    merges.foreach { case (l, rt) =>
      seq = seq.replace(Delim + l + Delim + Delim + rt + Delim,
        Delim + l + rt + Delim)
    }
    if (seq.isEmpty) Seq.empty
    else seq.stripPrefix(Delim).stripSuffix(Delim).split(D2).toSeq
  }
}
