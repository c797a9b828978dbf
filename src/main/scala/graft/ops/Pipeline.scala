package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.SketchExpressions

/** End-to-end training-data curation: the individual operators of the
  * builder-prompt surface composed into ONE lazy chain —
  *
  *   quality gate (Gopher repetition rules + min length, q48/q22)
  *   → PII scrub (codegen redaction scanners, q49)
  *   → exact dedup (normalized-digest keeper, q20)
  *   → MinHash near-dup pairs + cluster resolution (q28/q39)
  *   → benchmark decontamination (eval-shingle probe, q50)
  *   → sequence packing (distributed prefix sum, q52)
  *
  * Scale shape: the raw corpus is scanned ONCE. Stage 1+2 are a single
  * projection (codegen rep-stats + redaction kernels, zero shuffle)
  * whose output is checkpointed; every later consumer — the digest
  * group-by, both minhash text joins, the shingle probe, the packing
  * prefix sum — reads the cleaned corpus from that materialization
  * instead of re-scanning and re-scrubbing the input. Everything
  * downstream shuffles ids, digests and sketches, never documents,
  * exactly as in the constituent operators; the eval side of the
  * decontamination probe stays broadcast-sized by construction
  * (benchmark suites are tiny next to a training corpus).
  */
object Pipeline {

  /** Tunables, with the declared-query (q55) constants as defaults. */
  case class Config(
      minTokens: Int = 5,
      maxDupWordFrac: Double = 0.6,
      maxTopBigramFrac: Double = 0.05,
      numHashes: Int = 128,
      bands: Int = 32,
      shingleK: Int = 3,
      nearDupThreshold: Double = 0.8,
      evalMod: Long = 50L,
      decontShingleWords: Int = 4,
      packCapacity: Long = 256L)

  /** Run the full chain. Returns the surviving documents as
    * (doc_id, n_tokens, pack_id), doc_id-ordered packing.
    *
    * Documents with `id % evalMod == 0` stand in for the held-out
    * benchmark suite (the q50 convention): they are excluded from the
    * corpus and their raw-text shingles form the contamination probe.
    */
  def curate(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", cfg: Config = Config()): DataFrame = {
    val train3 = survivors(docs, idCol, textCol, cfg)
    // ---- stage 6: sequence packing (q52 rule) ------------------------
    val toks = train3.select(col("doc_id"),
      regexp_count(col("text"), lit("\\S+"))
        .cast("long").as("n_tokens"))
    Packing.packBySize(toks, "doc_id", "n_tokens", cfg.packCapacity)
      .select(col("doc_id"), col("n_tokens"), col("pack_id"))
  }

  /** Tokenizer-aware curation: stages 1–5 as [[curate]], then a BPE
    * tokenizer TRAINED ON THE SURVIVORS (the q72 machinery — the merges
    * a production run would actually ship, learned after cleaning so
    * boilerplate and near-dups don't dominate pair counts), and packing
    * by `n_bpe_tokens` from the q77 one-pass apply kernel instead of
    * whitespace token counts — sequences are packed by what the model
    * will actually consume.
    *
    * Scale shape: everything [[curate]] does, plus ONE more shuffle
    * (the BPE word-dict build over survivors — merge rounds then run on
    * the cached vocab-sized dict) and one zero-shuffle apply scan with
    * the merge list riding as codegen literals. The survivor projection
    * is persisted lazily: the trainer's first job populates it, the
    * apply scan rereads it. That cache's lifecycle is CALLER-MANAGED
    * (the LogReg.trainScore contract): the returned plan still reads
    * it, so this method cannot unpersist — release it with
    * `spark.catalog.clearCache()` (or unpersist) once the packing
    * result is materialized, or repeated curation runs in one session
    * accrue one cached survivor projection each.
    *
    * Returns (doc_id, n_bpe_tokens, pack_id), doc_id-ordered packing.
    */
  def curateBpePack(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", rounds: Int = 8,
      cfg: Config = Config()): DataFrame = {
    val surv = survivors(docs, idCol, textCol, cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = graft.util.CollectCapped(
      Bpe.trainMerges(surv, "text", rounds), math.max(rounds, 1),
      "BPE merge table")
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val counts = Bpe.tokenizeCount(surv, "text", merges)
      .select(col("doc_id"), col("n_bpe_tokens"))
    Packing.packBySize(counts, "doc_id", "n_bpe_tokens", cfg.packCapacity)
      .select(col("doc_id"), col("n_bpe_tokens"), col("pack_id"))
  }

  /** Stages 1–5 (quality gate → PII scrub → exact dedup → minhash+CC
    * near-dup drop → decontamination): the cleaned surviving corpus as
    * (doc_id, text), the input both packing variants and the tokenizer
    * trainer consume.
    */
  def survivors(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", cfg: Config = Config()): DataFrame = {
    // ---- stages 1+2: quality gate + scrub, one scan, zero shuffle ----
    val base = docs
      .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .withColumn("__st", SketchExpressions.rep_stats(col("text")))
      .withColumn("__is_eval", col("doc_id") % cfg.evalMod === 0)
    val n = col("__st")(0)
    val dw = lit(1.0) - col("__st")(1).cast("double") / n.cast("double")
    val tb = col("__st")(2).cast("double") / (n - 1).cast("double")
    val flagged = dw > cfg.maxDupWordFrac ||
      (n >= 2 && tb > cfg.maxTopBigramFrac)
    val cleaned = base
      .filter(col("__is_eval") || (n >= cfg.minTokens && !flagged))
      .select(col("doc_id"), col("__is_eval").as("is_eval"),
        // the benchmark stand-in keeps raw text (it is the probe, not
        // training data); surviving training docs are scrubbed here so
        // every downstream stage sees redacted text only
        when(col("__is_eval"), col("text"))
          .otherwise(SketchExpressions.pii_redact(col("text"))).as("text"))
      // LAZY checkpoint (r17 optimization round): the eager variant paid
      // a synchronous materialization job before any downstream stage
      // could start; lazily the first consumer (the exact-dedup digest
      // aggregation) materializes the same blocks inside its own job —
      // q55 2.97 → 2.47 s, q80 3.47 → 2.63 s same-window best-of-3,
      // stage semantics unchanged (still computed exactly once)
      .localCheckpoint(false)

    val train0 = cleaned.filter(!col("is_eval")).select("doc_id", "text")

    // ---- stage 3: exact dedup (q20 rule: min id per digest) ----------
    val keeper = train0
      .withColumn("__h", md5(Dedup.normalize(col("text"))))
      .groupBy(col("__h")).agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val train1 = train0.join(keeper, Seq("doc_id"), "left_semi")

    // ---- stage 4: minhash near-dup + cluster resolution --------------
    val pairs = Dedup.minhashNearDups(train1, "text", "doc_id",
      cfg.numHashes, cfg.bands, cfg.shingleK, cfg.nearDupThreshold)
    val dupDrop = Dedup.connectedComponents(pairs)
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as("doc_id"))
    val train2 = train1.join(dupDrop, Seq("doc_id"), "left_anti")

    // ---- stage 5: decontamination (q50 rule, eval side broadcast) ----
    def shingles(c: org.apache.spark.sql.Column) =
      SketchExpressions.word_shingles(c, cfg.decontShingleWords)
    val evalSh = cleaned.filter(col("is_eval"))
      .select(explode(shingles(col("text"))).as("__sh")).distinct()
    val contam = train2
      .select(col("doc_id"), explode(shingles(col("text"))).as("__sh"))
      .join(broadcast(evalSh), Seq("__sh"))
      .select("doc_id").distinct()
    train2.join(contam, Seq("doc_id"), "left_anti")
  }
}
