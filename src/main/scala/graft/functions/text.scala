package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import graft.functions.SketchExpressions._

/** SQL registration for the text/sketch kernel surface — the corpus
  * counterpart of [[geo.register]]: after `text.register(spark)`, every
  * per-document kernel the DataFrame operators use is callable from
  * `spark.sql` (`SELECT simhash64(text), term_counts(text) ...`), so a
  * SQL-only consumer gets the same codegen path (no UDF wrapping, no
  * serialization) the fluent API gets.
  */
object text {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def one(name: String, b: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, b, "built-in")
    def intArg(es: Seq[Expression], i: Int): Int =
      es(i).eval().asInstanceOf[Number].intValue

    one("norm_text", es => NormText(es.head))
    one("term_counts", es => TermCounts(es.head))
    one("bigram_counts", es => BigramCounts(es.head))
    one("topgram_stats", es => TopgramStats(es.head))
    one("rep_stats", es => RepStats(es.head))
    one("char_entropy", es => CharEntropy(es.head))
    one("nfc_normalize", es => NfcNormalize(es.head))
    one("pii_redact", es => PiiRedact(es.head))
    one("simhash64", es => Simhash64(es.head))
    one("sorted_pairs", es => SortedPairs(es.head))
    one("word_shingles", es => WordShingles(es.head, intArg(es, 1)))
    one("gram_hash_seq", es => GramHashSeq(es.head, intArg(es, 1)))
    one("char_ngrams", es => CharNgrams(es.head, intArg(es, 1)))
    one("char_ngram_codes", es => CharNgramCodes(es.head, intArg(es, 1)))
    one("token_blocks", es => TokenBlocks(es.head, intArg(es, 1)))
    one("window_digests", es => WindowDigests(es.head, intArg(es, 1)))
    one("lsh_signature", es => LshSignature(es.head, intArg(es, 1)))
    one("rand_project", es => RandProject(es.head, intArg(es, 1)))
    one("token_hash_counts", es => TokenHashCounts(es.head, intArg(es, 1)))
    one("minhash_signature", es =>
      MinhashSignature(es.head, intArg(es, 1), intArg(es, 2)))
    one("jaccard_sim", es => JaccardSim(es(0), es(1), intArg(es, 2)))
    // same argument order as the Scala builder — span_stats(starts, k,
    // nTokens) — so a transliterated call works in both surfaces
    one("span_stats", es => SpanStats(es(0), es(2), intArg(es, 1)))
    one("scrub_spans", es => ScrubSpans(es(0), es(1), intArg(es, 2)))
    one("winnow", es => Winnow(es.head, intArg(es, 1), intArg(es, 2)))
    one("md5_minhash_sigs", es => Md5MinhashSigs(es.head, intArg(es, 1)))
    one("array_match_count", es => ArrayMatchCount(es(0), es(1)))
    one("sorted_intersect_count", es => SortedIntersectCount(es(0), es(1)))
    one("lsh_probes", es => LshProbes(es(0), intArg(es, 1)))
  }
}
