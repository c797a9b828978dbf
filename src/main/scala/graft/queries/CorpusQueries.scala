package graft.queries

import org.apache.spark.sql.functions._
import QueryDef.{table, BoundedSort}

/** Corpus-curation operators beyond the round-4 surface: duplicated-
  * passage detection (exact substring-level overlap), unigram-LM quality
  * scoring (the CCNet/KenLM perplexity-filter shape with an in-corpus
  * unigram model), temperature-weighted domain mixture sampling (the
  * GPT-3/Pile data-mixing recipe), incremental cross-corpus dedup (the
  * continuous-ingestion shape), bigram-PMI collocation scoring (the
  * BPE/WordPiece pair-scoring step), and DSIR-style importance weights
  * (target-vs-source unigram log-likelihood ratio). All formulated
  * identically in Spark and DuckDB so the oracle hash-checks them.
  */
object CorpusQueries {

  /** DuckDB replay of [[graft.ops.NaiveBayes.trainScore]] up to the raw
    * per-doc score relation `sc(doc_id, s)` — the q81-certified CTE
    * chain, shared with the q119 calibration report so both certify the
    * SAME model and score.
    */
  private[queries] val nbScoreCtes: String = raw"""terms AS (
          SELECT doc_id,
            unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
              t -> t <> '')) AS term
          FROM documents),
        fx AS (SELECT doc_id,
            CAST(('0x' || substr(md5(term), 1, 6)) AS BIGINT) % 256 AS f,
            CAST(COUNT(*) AS BIGINT) AS x
          FROM terms GROUP BY 1, 2),
        feats AS (SELECT doc_id, f, x FROM fx
          UNION ALL SELECT doc_id, 256, CAST(1 AS BIGINT) FROM documents),
        lab AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
          FROM documents),
        cc AS (SELECT f,
            SUM(CASE WHEN y = 1 THEN x ELSE 0 END) AS c1,
            SUM(CASE WHEN y = 0 THEN x ELSE 0 END) AS c0
          FROM feats JOIN lab USING (doc_id) GROUP BY f),
        tots AS (SELECT
            SUM(CASE WHEN f < 256 THEN c1 ELSE 0 END) AS t1,
            SUM(CASE WHEN f < 256 THEN c0 ELSE 0 END) AS t0,
            SUM(CASE WHEN f = 256 THEN c1 ELSE 0 END) AS n1,
            SUM(CASE WHEN f = 256 THEN c0 ELSE 0 END) AS n0
          FROM cc),
        w AS (SELECT f,
            CASE WHEN f = 256 THEN LN(CAST(n1 AS DOUBLE) / n0)
              ELSE LN((c1 + 1.0) / (t1 + 256.0)) -
                LN((c0 + 1.0) / (t0 + 256.0)) END AS wf
          FROM cc CROSS JOIN tots),
        sc AS (SELECT feats.doc_id, SUM(feats.x * w.wf) AS s
          FROM feats JOIN w USING (f) GROUP BY feats.doc_id)"""

  /** DuckDB replay of [[graft.ops.Bpe.trainMerges]]: the word dict, the
    * delimited symbol strings, and `rounds` chained (pair-count → argmax
    * → replace) CTE blocks — certifying every learned merge, not just
    * the final table. DuckDB's `replace` and Java's `String.replace`
    * share leftmost-non-overlapping semantics, which is exactly the
    * greedy BPE application order both sides use.
    */
  /** The training CTE chain (w0 … s`rounds`) reading words from `src`
    * — a table name or a prior CTE — WITHOUT the leading WITH, so the
    * chain splices after other CTE blocks (q80 runs it over the q55
    * survivor set).
    */
  private[queries] def bpeTrainCtes(rounds: Int, src: String): String = {
    val D = graft.ops.Bpe.Delim
    val head = s"""w0 AS (
      SELECT w, COUNT(*) AS cnt FROM (
        SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
          x -> x <> '')) AS w FROM $src)
      WHERE regexp_matches(w, '^[a-z0-9]+$$') GROUP BY w),
    s0 AS (SELECT cnt,
      '$D' || array_to_string(string_split(w, ''), '$D$D') || '$D' AS seq
      FROM w0)"""
    val roundCtes = (1 to rounds).map { r =>
      val p = r - 1
      s""",
    p$r AS (
      SELECT pr[1] AS lhs, pr[2] AS rhs, CAST(SUM(cnt) AS BIGINT) AS weight
      FROM (
        SELECT cnt, unnest(list_transform(range(1, len(syms)),
          i -> [syms[i], syms[i+1]])) AS pr
        FROM (SELECT cnt, string_split(trim(seq, '$D'), '$D$D') AS syms
          FROM s$p))
      GROUP BY 1, 2),
    b$r AS (SELECT lhs, rhs, weight FROM p$r
      ORDER BY weight DESC, lhs, rhs LIMIT 1),
    s$r AS (SELECT cnt, replace(seq, '$D' || lhs || '$D$D' || rhs || '$D',
        '$D' || lhs || rhs || '$D') AS seq
      FROM s$p CROSS JOIN b$r)"""
    }.mkString
    head + roundCtes
  }

  private def bpeOracleSql(rounds: Int): String = {
    val tail = (1 to rounds).map(r =>
      s"SELECT $r AS merge_rank, lhs, rhs, lhs || rhs AS merged, weight FROM b$r")
      .mkString("\n    ", "\n    UNION ALL ", "\n    ORDER BY merge_rank")
    "WITH " + bpeTrainCtes(rounds, "documents") + tail
  }

  /** [[bpeOracleSql]]'s CTE chain, finished with a tokenizer-APPLY pass:
    * every document's qualifying words replayed through the learned
    * merges (the same nested-replace chain, b1 innermost) and counted.
    *
    * Exhaustion-robust: if training runs out of learnable merges before
    * `rounds`, the empty b-CTEs would make a direct CROSS JOIN chain
    * return ZERO rows (oracle reporting 0 tokens for every document
    * while the engine tokenizes with the shorter merge list). Each
    * round therefore goes through a never-empty one-row e-CTE whose
    * pattern/replacement COALESCE to the identity replace
    * ('$D' → '$D') when that round learned nothing.
    */
  /** The apply CTE chain (e1 … cnt): replays the learned merges over
    * every document of `src` and counts per-doc words / BPE tokens.
    * Splices after [[bpeTrainCtes]] (same rounds, same src). Ends with
    * the `cnt` CTE — (doc_id, n_words, n_bpe_tokens) for documents
    * with ≥1 qualifying word; callers LEFT JOIN back to `src` for the
    * zero rows.
    */
  private[queries] def bpeApplyCtes(rounds: Int, src: String): String = {
    val D = graft.ops.Bpe.Delim
    val eCtes = (1 to rounds).map { r =>
      s""",
    e$r AS (SELECT
        COALESCE((SELECT '$D' || lhs || '$D$D' || rhs || '$D' FROM b$r),
          '$D') AS pat,
        COALESCE((SELECT '$D' || lhs || rhs || '$D' FROM b$r), '$D') AS rep)"""
    }.mkString
    val applied = (1 to rounds).foldLeft("seq") { (acc, r) =>
      s"replace($acc, e$r.pat, e$r.rep)"
    }
    val crossJoins = (1 to rounds).map(r => s"CROSS JOIN e$r").mkString(" ")
    eCtes + s""",
    docw AS (SELECT doc_id,
        unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
          x -> x <> '')) AS w
      FROM $src),
    dv AS (SELECT doc_id, w FROM docw
      WHERE regexp_matches(w, '^[a-z0-9]+$$')),
    sq AS (SELECT doc_id,
        '$D' || array_to_string(string_split(w, ''), '$D$D') || '$D' AS seq
      FROM dv),
    ap AS (SELECT doc_id, $applied AS seq FROM sq $crossJoins),
    cnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
        CAST(SUM(len(string_split(trim(seq, '$D'), '$D$D'))) AS BIGINT)
          AS n_bpe_tokens
      FROM ap GROUP BY doc_id)"""
  }

  private def bpeTokenizeOracleSql(rounds: Int): String =
    "WITH " + bpeTrainCtes(rounds, "documents") +
      bpeApplyCtes(rounds, "documents") + s"""
    SELECT d.doc_id, COALESCE(cnt.n_words, 0) AS n_words,
      COALESCE(cnt.n_bpe_tokens, 0) AS n_bpe_tokens
    FROM documents d LEFT JOIN cnt ON d.doc_id = cnt.doc_id
    ORDER BY d.doc_id"""

  /** DuckDB replay of [[graft.ops.LogReg.train]]: hashed features, then
    * `iters` chained (margin → residual → quantized gradient → update)
    * CTE blocks. Bit-reproducible because every step is integer or
    * IEEE-exact rational arithmetic (see the LogReg scaladoc) — no exp,
    * no order-sensitive float sums.
    */
  private def logregOracleSql(dims: Int, iters: Int): String = {
    val head = s"""WITH terms AS (
      SELECT doc_id,
        unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
          t -> t <> '')) AS term
      FROM documents),
    fx AS (SELECT doc_id,
        CAST(('0x' || substr(md5(term), 1, 6)) AS BIGINT) % $dims AS f,
        COUNT(*) AS x
      FROM terms GROUP BY 1, 2),
    feats AS (SELECT doc_id, f, CAST(x AS BIGINT) AS x FROM fx
      UNION ALL SELECT doc_id, $dims AS f, CAST(1 AS BIGINT) FROM documents),
    lab AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
      FROM documents),
    nn AS (SELECT COUNT(*) AS n FROM documents),
    w0 AS (SELECT unnest(range(${dims + 1})) AS f, CAST(0 AS BIGINT) AS micro)"""
    val iterCtes = (1 to iters).map { i =>
      val p = i - 1
      s""",
    d$i AS (SELECT feats.doc_id, CAST(SUM(w.micro * feats.x) AS BIGINT) AS dm
      FROM feats JOIN w$p w ON feats.f = w.f GROUP BY feats.doc_id),
    r$i AS (SELECT lab.doc_id,
        (0.5 + (CAST(dm AS DOUBLE) / 1000000.0) /
          (2.0 * (1.0 + ABS(CAST(dm AS DOUBLE) / 1000000.0)))) - lab.y AS r
      FROM lab JOIN d$i ON lab.doc_id = d$i.doc_id),
    g$i AS (SELECT feats.f,
        CAST(SUM(CAST(FLOOR((r.r * CAST(feats.x AS DOUBLE)) * 1000000.0)
          AS BIGINT)) AS BIGINT) AS grad
      FROM feats JOIN r$i r ON feats.doc_id = r.doc_id GROUP BY feats.f),
    w$i AS (SELECT w.f, w.micro - CAST(FLOOR(
        CAST(COALESCE(g.grad, 0) AS DOUBLE) / (2.0 * nn.n)) AS BIGINT) AS micro
      FROM w$p w LEFT JOIN g$i g ON w.f = g.f CROSS JOIN nn)"""
    }.mkString
    head + iterCtes +
      s"\n    SELECT f, micro AS weight_micro FROM w$iters ORDER BY f"
  }

  /** [[logregOracleSql]]'s training CTEs, finished with a scoring pass:
    * every document's margin against the final weights, through the
    * same rational sigmoid, at the round-6 contract.
    */
  private def logregScoreOracleSql(dims: Int, iters: Int): String = {
    val base = logregOracleSql(dims, iters)
    val ctes = base.substring(0, base.lastIndexOf("\n    SELECT f, micro"))
    ctes + s""",
    sc AS (SELECT feats.doc_id, CAST(SUM(w.micro * feats.x) AS BIGINT) AS dm
      FROM feats JOIN w$iters w ON feats.f = w.f GROUP BY feats.doc_id)
    SELECT doc_id, ROUND(0.5 + (CAST(dm AS DOUBLE) / 1000000.0) /
        (2.0 * (1.0 + ABS(CAST(dm AS DOUBLE) / 1000000.0))), 6) AS score
    FROM sc ORDER BY doc_id"""
  }

  val defs: Seq[QueryDef] = Seq(
    // ---- hashed-feature logistic-regression training -------------------
    // The fastText/CCNet quality-classifier shape, trained in-engine:
    // full-batch GD over md5-hashed bag-of-words features, label =
    // (lang = 'en'). One corpus shuffle builds the cached sparse rows;
    // each iteration is ONE feature-keyed map-side-combinable gradient
    // job with the model riding in as a 257-long literal (codegen
    // element_at dot product, no join). The q51 fixed-point recipe makes
    // all 3 iterations bit-reproducible (integer dot products, rational
    // sigmoid, floor-quantized gradients), so the oracle replays the
    // whole training run, not just its output shape.
    QueryDef(
      "q75_logreg",
      (s, dir) => {
        import s.implicits._
        graft.ops.LogReg.train(table(s, dir, "documents"), "text",
          when($"lang" === "en", 1.0).otherwise(0.0), dims = 256, iters = 3)
      },
      Some(logregOracleSql(256, 3))),

    // ---- BPE tokenizer APPLY (model-as-literal corpus pass) ------------
    // The other half of q72: the learned merge table folds back into the
    // plan as 8 literal codegen replaces inside a transform lambda, and
    // the whole corpus is re-tokenized in ONE zero-shuffle scan — the
    // 100 TB shape for "apply the tokenizer you just trained" (model on
    // the driver, apply cost linear, no join against a merges table).
    // The oracle replays training AND the per-word merge application.
    QueryDef(
      "q77_bpe_tokenize",
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
        val m = graft.util.CollectCapped(
          graft.ops.Bpe.trainMerges(docs, "text", 8), 8, "BPE merge table")
          .map(r => (r.getString(1), r.getString(2))).toSeq
        graft.ops.Bpe.tokenizeCount(docs, "text", m)
          .select($"doc_id", $"n_words", $"n_bpe_tokens")
          .orderBy($"doc_id")
      },
      Some(bpeTokenizeOracleSql(8))),

    // ---- logreg quality-score APPLY ------------------------------------
    // q75's other half: the trained 257-long model scores every document
    // in one more row-wise pass over the SAME cached sparse rows the
    // gradient jobs read (per-token hashing paid once for the whole
    // train+apply cycle; codegen element_at dot + rational sigmoid).
    // The oracle replays the full training run and the scoring margin,
    // so the score column is certified end-to-end — train AND apply.
    QueryDef(
      "q78_logreg_score",
      (s, dir) => {
        import s.implicits._
        graft.ops.LogReg.trainScore(table(s, dir, "documents"), "text",
            when($"lang" === "en", 1.0).otherwise(0.0), dims = 256, iters = 3)
          .orderBy($"doc_id")
      },
      Some(logregScoreOracleSql(256, 3))),

    // ---- Naive Bayes quality classifier (train + score) ----------------
    // The counts-based sibling of q75/q78: same hashed bag-of-words
    // features, but the model is ONE map-side-combinable counting
    // aggregation (add-1 smoothed per-class token counts) — no
    // iterations. Scoring is one zero-shuffle codegen sparse-dot with
    // the 257-double log-likelihood-ratio model as a reference object;
    // the kernel's bias entry carries the class counts in training and
    // the prior in scoring. The oracle rebuilds the exact integer
    // counts, the smoothed ln weights, and every document's rounded
    // score (the q57 ln + round-6 discipline).
    QueryDef(
      "q81_nb_score",
      (s, dir) => {
        import s.implicits._
        graft.ops.NaiveBayes.trainScore(table(s, dir, "documents"), "text",
          when($"lang" === "en", 1.0).otherwise(0.0), dims = 256)
      },
      Some(raw"""WITH $nbScoreCtes
        SELECT doc_id, ROUND(s, 6) AS nb_score,
          ROUND(s, 6) > 0 AS pred_en
        FROM sc""")),

    // ---- KMV sketch corpus-overlap estimation --------------------------
    // Bottom-k (k-minimum-values) distinct sketches per corpus half:
    // unlike HLL these MERGE under union and therefore estimate
    // Jaccard/intersection — the "how much of delivery B have we
    // already got?" measurement run before committing to a full
    // cross-dedup. Sketch = one bounded-heap TopK aggregation per side
    // over once-distinct digests; the estimator arithmetic runs over
    // ≤ 2k rows. The oracle rebuilds both sketches (ROW_NUMBER over
    // the same 60-bit md5-prefix integers), the union bottom-k, both
    // estimators, and the exact counts certifying them.
    QueryDef(
      "q84_kmv_overlap",
      (s, dir) => {
        import s.implicits._
        graft.ops.Kmv.corpusOverlap(table(s, dir, "documents"),
          when($"doc_id" % 2 === 0, "a").otherwise("b"), "text", k = 128)
      },
      Some(raw"""WITH dh AS (SELECT DISTINCT
            CASE WHEN doc_id % 2 = 0 THEN 'a' ELSE 'b' END AS c,
            CAST(('0x' || substr(md5(trim(regexp_replace(
              regexp_replace(lower(coalesce(text, '')), '[^a-z0-9 ]', ' ', 'g'),
              ' +', ' ', 'g'))), 1, 15)) AS BIGINT) AS h
          FROM documents),
        rk AS (SELECT c, h, ROW_NUMBER() OVER (PARTITION BY c ORDER BY h)
            AS r FROM dh),
        sk AS (SELECT c, h FROM rk WHERE r <= 128),
        ubm AS (SELECT h,
            MAX(CASE WHEN c = 'a' THEN 1 ELSE 0 END) AS inA,
            MAX(CASE WHEN c = 'b' THEN 1 ELSE 0 END) AS inB
          FROM sk GROUP BY h ORDER BY h LIMIT 128),
        stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS m, MAX(h) AS th,
            CAST(SUM(CASE WHEN inA = 1 AND inB = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS shared
          FROM ubm),
        ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_union,
            CAST(SUM(CASE WHEN nc = 2 THEN 1 ELSE 0 END) AS BIGINT)
              AS exact_inter
          FROM (SELECT h, COUNT(DISTINCT c) AS nc FROM dh GROUP BY h))
        SELECT 128 AS k, m AS sketch_size,
          ROUND(CASE WHEN m < 128 THEN CAST(m AS DOUBLE)
            ELSE 127.0 * 1152921504606846976.0 / th END, 6) AS est_union,
          ROUND(CAST(shared AS DOUBLE) / m, 6) AS est_jaccard,
          exact_union,
          ROUND(CAST(exact_inter AS DOUBLE) / exact_union, 6)
            AS exact_jaccard
        FROM stats CROSS JOIN ex""")),

    // ---- sub-document block dedup with reconstruction ------------------
    // The CCNet line-dedup shape on fixed 10-token blocks: boilerplate
    // shared across documents is removed everywhere but its first
    // occurrence, and every document is reassembled from its surviving
    // blocks — dedup at sub-document granularity WITHOUT dropping
    // documents. Survival is a combinable min(struct(doc,idx)) per
    // block digest + a composite-key join-back (skew-safe: no digest
    // window — round-7), one doc-keyed aggregation rebuilds; the
    // oracle re-derives every block, the global first-occurrence
    // rank, and the reassembled text's digest.
    QueryDef(
      "q79_block_scrub",
      (s, dir) => {
        import s.implicits._
        graft.ops.Dedup.scrubDuplicateBlocks(
            table(s, dir, "documents"), "text", "doc_id", blockTokens = 10)
          .orderBy($"doc_id")
      },
      Some(raw"""WITH t AS (SELECT doc_id,
            list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')
              AS toks
          FROM documents),
        nb AS (SELECT doc_id, toks,
            CASE WHEN len(toks) = 0 THEN 0
              ELSE CAST(FLOOR((len(toks) - 1) / 10.0) AS INT) + 1 END
              AS n_blocks
          FROM t),
        blk AS (SELECT doc_id, i AS idx,
            array_to_string(toks[i*10+1 : i*10+10], ' ') AS blk
          FROM (SELECT doc_id, toks,
              unnest(range(0, n_blocks)) AS i FROM nb)),
        hh AS (SELECT doc_id, idx, blk, md5(blk) AS bh FROM blk),
        kept AS (SELECT doc_id, idx, blk,
            ROW_NUMBER() OVER (PARTITION BY bh ORDER BY doc_id, idx) AS rn
          FROM hh),
        reb AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
            md5(string_agg(blk, ' ' ORDER BY idx)) AS sd
          FROM kept WHERE rn = 1 GROUP BY doc_id)
        SELECT nb.doc_id, CAST(nb.n_blocks AS BIGINT) AS n_blocks,
          COALESCE(reb.n_kept, 0) AS n_kept,
          COALESCE(reb.sd, md5('')) AS scrubbed_digest
        FROM nb LEFT JOIN reb ON nb.doc_id = reb.doc_id
        ORDER BY nb.doc_id""")),

    // ---- boilerplate strip (frequency-threshold block removal) ---------
    // The C4/RefinedWeb rule at fixed-block granularity: a block seen in
    // >= 3 DISTINCT documents is boilerplate and is removed everywhere —
    // including its first occurrence — whereas q79 keeps one survivor.
    // Document frequency is a two-level combinable aggregation
    // (distinct (digest,doc) pairs → partial counts per digest), the
    // small boilerplate set joins back (skew-safe: no digest window —
    // round-7), one doc-keyed reassembly; the oracle recomputes every
    // block's document frequency and the reassembled digests
    // independently.
    QueryDef(
      "q87_boilerplate",
      (s, dir) => {
        import s.implicits._
        graft.ops.Dedup.stripBoilerplateBlocks(
          table(s, dir, "documents"), "text", "doc_id",
          blockTokens = 10, minDf = 3)
      },
      Some(raw"""WITH t AS (SELECT doc_id,
            list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')
              AS toks
          FROM documents),
        nb AS (SELECT doc_id, toks,
            CASE WHEN len(toks) = 0 THEN 0
              ELSE CAST(FLOOR((len(toks) - 1) / 10.0) AS INT) + 1 END
              AS n_blocks
          FROM t),
        blk AS (SELECT doc_id, i AS idx,
            array_to_string(toks[i*10+1 : i*10+10], ' ') AS blk
          FROM (SELECT doc_id, toks,
              unnest(range(0, n_blocks)) AS i FROM nb)),
        hh AS (SELECT doc_id, idx, blk, md5(blk) AS bh FROM blk),
        dfq AS (SELECT bh, COUNT(DISTINCT doc_id) AS df FROM hh
          GROUP BY bh),
        reb AS (SELECT doc_id,
            CAST(SUM(CASE WHEN df < 3 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_kept,
            md5(COALESCE(string_agg(CASE WHEN df < 3 THEN blk END,
              ' ' ORDER BY idx), '')) AS sd
          FROM hh JOIN dfq USING (bh) GROUP BY doc_id)
        SELECT nb.doc_id, CAST(nb.n_blocks AS BIGINT) AS n_blocks,
          COALESCE(reb.n_kept, 0) AS n_kept,
          COALESCE(reb.sd, md5('')) AS scrubbed_digest
        FROM nb LEFT JOIN reb ON nb.doc_id = reb.doc_id""")),

    // ---- exact-substring span scrub (round 7) --------------------------
    // The ExactSubstr policy (Lee et al. 2022) at token-window
    // granularity: every OVERLAPPING 8-token window is hashed, windows
    // present in >= 2 DISTINCT documents are flagged, flagged windows
    // merge into maximal covered spans, covered tokens are removed from
    // EVERY copy. Unlike q79/q87's aligned disjoint blocks this catches
    // shared passages at any offset. Df is a two-level combinable
    // aggregation, the flagged set joins back on the digest (AQE-skew
    // splittable), span merge is a bounded collect_list + codegen
    // kernel — no Window node (PlanAuditSpec). The oracle re-derives
    // every window by string (not digest), the covered-index union, the
    // LAG-based span count and the reassembled clean-text digests.
    QueryDef(
      "q99_span_scrub",
      (s, dir) => {
        import s.implicits._
        graft.ops.Dedup.scrubRepeatedSpans(
            table(s, dir, "documents"), "text", "doc_id",
            windowTokens = 8, minDf = 2)
          .orderBy($"doc_id")
      },
      Some(raw"""WITH tk AS (SELECT doc_id,
            list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')
              AS toks
          FROM documents),
        wd0 AS (SELECT doc_id,
            unnest(range(0, greatest(len(toks) - 7, 0))) AS pos, toks
          FROM tk),
        wd AS (SELECT doc_id, CAST(pos AS INT) AS pos,
            array_to_string(toks[pos+1:pos+8], ' ') AS w
          FROM wd0),
        dup AS (SELECT w FROM (SELECT w, COUNT(DISTINCT doc_id) AS df
            FROM wd GROUP BY w) WHERE df >= 2),
        flag AS (SELECT wd.doc_id, wd.pos FROM wd JOIN dup USING (w)),
        cov AS (SELECT DISTINCT doc_id, unnest(range(pos, pos + 8)) AS ti
          FROM flag),
        spans AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_removed,
            CAST(SUM(CASE WHEN prev IS NULL OR ti - prev > 1 THEN 1 ELSE 0
              END) AS BIGINT) AS n_spans
          FROM (SELECT doc_id, ti,
              LAG(ti) OVER (PARTITION BY doc_id ORDER BY ti) AS prev
            FROM cov)
          GROUP BY doc_id),
        te AS (SELECT doc_id, unnest(toks) AS tok,
            unnest(range(0, len(toks))) AS ti
          FROM tk),
        clean AS (SELECT t.doc_id,
            md5(string_agg(t.tok, ' ' ORDER BY t.ti)) AS clean_digest
          FROM te t LEFT JOIN cov c
            ON t.doc_id = c.doc_id AND t.ti = c.ti
          WHERE c.ti IS NULL GROUP BY t.doc_id)
        SELECT d.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
          COALESCE(s.n_removed, 0) AS n_removed,
          COALESCE(s.n_spans, 0) AS n_spans,
          COALESCE(c.clean_digest, md5('')) AS clean_digest
        FROM documents d JOIN tk t USING (doc_id)
        LEFT JOIN spans s USING (doc_id) LEFT JOIN clean c USING (doc_id)
        ORDER BY d.doc_id""")),

    // ---- corpus composition report (ROLLUP) ----------------------------
    // The per-source × per-language curation dashboard: doc/token/char
    // totals at (source, lang), per-source subtotal, and grand-total
    // granularity in ONE pass — Spark's Expand + a single map-side-
    // combinable aggregation (3 grouping sets never rescan the corpus).
    // Totals are integer sums; the only float (mean tokens/doc) is one
    // deterministic division at round-6.
    QueryDef(
      "q76_corpus_report",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "documents")
          .select($"source", $"lang",
            regexp_count(lower($"text"), lit("\\S+"))
              .cast("long").as("ntok"),
            $"n_chars")
          .rollup($"source", $"lang")
          .agg(count(lit(1)).as("n_docs"),
            sum($"ntok").as("total_tokens"),
            sum($"n_chars").as("total_chars"))
          .select(
            coalesce($"source", lit("(all)")).as("source"),
            coalesce($"lang", lit("(all)")).as("lang"),
            $"n_docs", $"total_tokens", $"total_chars",
            round($"total_tokens".cast("double") / $"n_docs", 6)
              .as("mean_tokens"))
          .sortBounded($"source", $"lang")
      },
      Some(raw"""WITH t AS (SELECT source, lang,
            len(list_filter(regexp_split_to_array(lower(text), '\s+'),
              x -> x <> '')) AS ntok,
            n_chars
          FROM documents),
        g AS (SELECT COALESCE(source, '(all)') AS source,
            COALESCE(lang, '(all)') AS lang,
            COUNT(*) AS n_docs,
            CAST(SUM(ntok) AS BIGINT) AS total_tokens,
            CAST(SUM(n_chars) AS BIGINT) AS total_chars
          FROM t GROUP BY ROLLUP(source, lang))
        SELECT source, lang, n_docs, total_tokens, total_chars,
          ROUND(CAST(total_tokens AS DOUBLE) / n_docs, 6) AS mean_tokens
        FROM g ORDER BY source, lang""")),

    // ---- BPE tokenizer training (distributed merge learning) -----------
    // The actual BPE training loop (Sennrich et al. 2016), word-dict
    // formulation: one corpus shuffle builds the (word, count) table;
    // every merge round is then a map-side-combinable pair count over
    // that cached vocabulary-sized table plus a 1-row TakeOrdered, and
    // the chosen merge folds back in as a literal codegen replace. The
    // corpus is never rescanned; the model (merge list) is R driver rows.
    // The oracle replays all 8 rounds CTE-by-CTE — pair counts, argmax
    // tie-breaks, and greedy replace application are all certified.
    QueryDef(
      "q72_bpe_merges",
      (s, dir) =>
        graft.ops.Bpe.trainMerges(table(s, dir, "documents"), "text", 8),
      Some(bpeOracleSql(8))),

    // ---- Bloom-prefiltered cross-corpus dedup ---------------------------
    // q60's continuous-ingestion shape at "everything ever trained on"
    // base-corpus scale: the accepted corpus is summarized into a
    // 2^18-bit Bloom bitmap (k=4 positions = independent 32-bit slices
    // of the md5 digest, codegen membership test), so only
    // bloom-positive batch rows pay the exact digest join — bloom
    // misses short-circuit shuffle-free, and at mostly-novel-ingest
    // scale that is nearly every row. Output stays EXACT (no false
    // negatives; false positives resolved by the join they trigger).
    // Both sides come from one corpus here, so the query digests it
    // ONCE behind a shared lazy cache (the oracle's single `h` CTE) —
    // the bitmap job populates the cache, the inc branch reads it. The
    // oracle rebuilds the bitmap bit-for-bit from the same digest
    // slices, so bloom_hit itself is certified, not just the final
    // status.
    QueryDef(
      "q73_bloom_dedup",
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
        val h = docs.select($"doc_id",
            md5(graft.ops.Dedup.normalize(coalesce($"text", lit(""))))
              .as("__h"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // no ORDER BY: the result is a row set (the correctness compare
        // sorts before hashing), and a global sort costs a range-sample
        // pass plus a sort exchange on the delivery path
        graft.ops.Dedup.bloomCrossDedupByDigest(
            h.filter($"doc_id" % 5 =!= 0),
            h.filter($"doc_id" % 5 === 0),
            "doc_id", "__h", mBits = 1 << 18, k = 4)
      },
      Some(raw"""WITH h AS (SELECT doc_id,
            md5(trim(regexp_replace(
              regexp_replace(lower(coalesce(text, '')), '[^a-z0-9 ]', ' ', 'g'),
              ' +', ' ', 'g'))) AS hh
          FROM documents),
        base AS (SELECT DISTINCT hh FROM h WHERE doc_id % 5 <> 0),
        ii AS (SELECT unnest(range(4)) AS i),
        pos AS (SELECT DISTINCT
            CAST(('0x' || substr(hh, 1 + 8 * i, 8)) AS BIGINT)
              % 262144 AS p
          FROM base CROSS JOIN ii),
        inc AS (SELECT doc_id, hh FROM h WHERE doc_id % 5 = 0),
        ipos AS (SELECT doc_id, hh,
            CAST(('0x' || substr(hh, 1 + 8 * i, 8)) AS BIGINT)
              % 262144 AS p
          FROM inc CROSS JOIN ii),
        hits AS (SELECT ipos.doc_id, ipos.hh,
            SUM(CASE WHEN pos.p IS NULL THEN 1 ELSE 0 END) = 0 AS bloom_hit
          FROM ipos LEFT JOIN pos ON ipos.p = pos.p
          GROUP BY ipos.doc_id, ipos.hh)
        SELECT hits.doc_id, hits.bloom_hit,
          CASE WHEN base.hh IS NOT NULL THEN 'dup_of_base' ELSE 'new' END
            AS status
        FROM hits LEFT JOIN base ON hits.hh = base.hh""")),
    // ---- duplicated-passage detection (corpus self-overlap) ------------
    // Exact substring-level dedup approximated at 6-word granularity
    // (Lee et al. 2021 "Deduplicating Training Data Makes Language
    // Models Better" — fixed-length window variant): every distinct
    // 6-word shingle is hashed, shingles appearing in ≥2 documents are
    // "shared passages", and each document reports how much of it is
    // duplicated elsewhere. Scale shape: the shuffle carries (16-byte
    // digest, doc_id) pairs — never shingle text — and the shared-set
    // side is produced by a map-side-combinable count, then joined back
    // digest-keyed. No per-shingle doc-list is ever collected (a
    // stop-shingle would make that state unbounded); the join-back is
    // the bounded-state formulation. Two corpus scans (one per side of
    // the join) is the standard trade against materializing the
    // exploded shingle set.
    QueryDef(
      "q56_passage_dedup",
      (s, dir) => {
        import s.implicits._
        def shingled = graft.ops.Par
          .spread(table(s, dir, "documents"), $"doc_id")
          .select($"doc_id",
            graft.functions.SketchExpressions.word_shingles($"text", 6)
              .as("shs"))
          .select($"doc_id", size($"shs").cast("long").as("n_shingles"),
            explode($"shs").as("sh"))
          .select($"doc_id", $"n_shingles",
            substring(md5($"sh"), 1, 16).as("h"))
        val shared = shingled
          .groupBy($"h").agg(count(lit(1)).as("n_docs"))
          .filter($"n_docs" >= 2)
          .select($"h")
        shingled.join(shared, "h")
          .groupBy($"doc_id", $"n_shingles")
          .agg(count(lit(1)).as("n_dup"))
          .select($"doc_id", $"n_shingles", $"n_dup",
            round($"n_dup".cast("double") / $"n_shingles", 6).as("dup_frac"))
          .orderBy($"doc_id")
      },
      Some(raw"""WITH t AS (SELECT doc_id,
            list_filter(regexp_split_to_array(lower(text), '\s+'),
              x -> x <> '') AS toks
          FROM documents),
        d AS (SELECT doc_id,
            list_distinct(list_transform(range(1, len(toks) - 4),
              i -> array_to_string(toks[i:i+5], ' '))) AS shs
          FROM t WHERE len(toks) >= 6),
        sh AS (SELECT doc_id, len(shs) AS n_shingles, unnest(shs) AS sg
          FROM d),
        hh AS (SELECT doc_id, n_shingles, substr(md5(sg), 1, 16) AS h
          FROM sh),
        shared AS (SELECT h FROM hh GROUP BY h HAVING COUNT(*) >= 2)
        SELECT doc_id, n_shingles, COUNT(*) AS n_dup,
          ROUND(CAST(COUNT(*) AS DOUBLE) / n_shingles, 6) AS dup_frac
        FROM hh JOIN shared USING (h)
        GROUP BY doc_id, n_shingles ORDER BY doc_id""")),

    // ---- unigram-LM quality scoring (perplexity-filter shape) ----------
    // CCNet (Wenzek et al. 2020) filters on KenLM perplexity; the
    // within-engine analogue is an in-corpus unigram LM: global term
    // frequencies are the model, and each document scores its average
    // token surprisal -1/n Σ ln p(t). Scale shape (round 7, the q54
    // discipline): the term_counts kernel emits one (doc, term, c) row
    // per DISTINCT (doc, term) straight off the scan — token
    // occurrences never cross a shuffle — and the global term
    // frequency is a term-partitioned window SUM over that same
    // relation, so ONE term-keyed exchange serves both the LM build
    // and the scoring (no tf⋈lm join, no second term shuffle). The
    // corpus token total rides as a broadcast 1-row kernel aggregate
    // (the q14 trick, no driver action); per-doc folding is the only
    // other exchange. Score = -Σ c·ln(tf/T) / Σ c, identical grouped
    // formulation on both engines (round-6 float-ln + round-6
    // convention).
    QueryDef(
      "q57_unigram_lm",
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
        // ONE corpus scan (round-16, VERDICT r15 #1): the previous shape
        // re-ran the term_counts explode for the broadcast total — a
        // second full corpus pass that was ~half of q57's wall. The
        // checkpoint (the q151/q181 pattern) holds only the distinct
        // (doc, term, c) rows; the corpus token total is Σc over that
        // same relation, identical to Σtf over a fresh explode.
        val tc = docs.select($"doc_id",
            explode(graft.functions.SketchExpressions
              .term_counts(coalesce($"text", lit("")))).as("tc"))
          .select($"doc_id", $"tc.term".as("term"), $"tc.tf".cast("long").as("c"))
          .localCheckpoint(false)
        val total = broadcast(tc.agg(sum($"c").as("__T")))
        tc.withColumn("tf", sum($"c").over(
            org.apache.spark.sql.expressions.Window.partitionBy($"term")))
          .crossJoin(total)
          .groupBy($"doc_id")
          .agg(sum($"c").as("n_tokens"),
            round(-sum($"c".cast("double") *
                log($"tf".cast("double") / $"__T".cast("double")))
              / sum($"c").cast("double"), 6).as("avg_neg_logp"))
          .orderBy($"doc_id")
      },
      Some(raw"""WITH terms AS (
          SELECT doc_id,
            unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
              t -> t <> '')) AS term
          FROM documents),
        tc AS (SELECT doc_id, term, COUNT(*) AS c FROM terms
          GROUP BY doc_id, term),
        lm AS (SELECT term, CAST(SUM(c) AS BIGINT) AS tf FROM tc
          GROUP BY term),
        tot AS (SELECT CAST(SUM(tf) AS BIGINT) AS T FROM lm)
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
          ROUND(-SUM(c * LN(CAST(tf AS DOUBLE) / CAST(T AS DOUBLE)))
            / CAST(SUM(c) AS DOUBLE), 6) AS avg_neg_logp
        FROM tc JOIN lm USING (term) CROSS JOIN tot
        GROUP BY doc_id ORDER BY doc_id""")),

    // ---- temperature-weighted domain mixture sampling ------------------
    // The GPT-3/Pile data-mixing recipe: per-source weights n_s^α
    // (α = 0.5 here) normalized across sources, then an exact
    // per-source quota selected deterministically by md5 rank. Weights
    // are computed in integer fixed-point (⌊√n·2^20⌋) so the quota
    // arithmetic is exact integer division in BOTH engines — no
    // floating-point sum whose ordering could flip a ⌊·⌋ at an integer
    // boundary. Scale shape: the quota table is a per-source aggregate
    // (tiny — one row per source) broadcast back; selection is
    // TopK.perGroup's bounded heap (≤ m rows per source per map task,
    // heaps shuffle, not documents) — the same machinery as q42, so no
    // window ever crosses the corpus.
    QueryDef(
      "q58_mixture_sample",
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents").select($"source", $"doc_id")
        val counts = docs.groupBy($"source").agg(count(lit(1)).as("n"))
          .withColumn("wfix",
            floor(sqrt($"n".cast("double")) * 1048576.0).cast("long"))
        val denom = broadcast(counts.agg(sum($"wfix").as("__d")))
        val quotas = counts.crossJoin(denom)
          .select($"source", $"n",
            expr("(200 * wfix) div __d").cast("long").as("quota"))
        val ranked = graft.ops.TopK.perGroup(docs, Seq("source"),
          Seq((md5($"doc_id".cast("string")), false), ($"doc_id", false)),
          200, "rk")
        ranked.join(broadcast(quotas), "source")
          .filter($"rk" <= $"quota")
          .select($"source", $"n", $"quota", $"doc_id", $"rk")
          .orderBy($"source", $"rk")
      },
      Some(raw"""WITH c AS (SELECT source, COUNT(*) AS n
          FROM documents GROUP BY source),
        w AS (SELECT source, n,
            CAST(FLOOR(SQRT(CAST(n AS DOUBLE)) * 1048576.0) AS BIGINT)
              AS wfix
          FROM c),
        d AS (SELECT SUM(wfix) AS dd FROM w),
        q AS (SELECT source, n,
            CAST((200 * wfix) // dd AS BIGINT) AS quota
          FROM w CROSS JOIN d),
        r AS (SELECT source, doc_id,
            CAST(ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS rk
          FROM documents)
        SELECT r.source, q.n, q.quota, r.doc_id, r.rk
        FROM r JOIN q USING (source) WHERE r.rk <= q.quota
        ORDER BY source, rk""")),

    // ---- incremental (cross-corpus) exact dedup -------------------------
    // Continuous-ingestion dedup: a new delivery (here doc_id % 5 = 0)
    // is classified against the already-accepted corpus (the rest) and
    // against itself. Scale shape (see Dedup.crossDedup): the accepted
    // corpus contributes ONLY its distinct 16-byte digest set — its text
    // never re-shuffles on re-ingestion — and within-batch
    // first-occurrence is a combinable min(id) per digest + composite
    // (digest,id) join-back (skew-safe: no digest window — round-7).
    // The streaming twin (stream-static join + watermarked
    // within-stream dedup) is parity-tested in StreamingSpec.
    QueryDef(
      "q60_cross_dedup",
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
        graft.ops.Dedup.crossDedup(
            docs.filter($"doc_id" % 5 =!= 0),
            docs.filter($"doc_id" % 5 === 0),
            "text", "doc_id")
          .orderBy($"doc_id")
      },
      Some(raw"""WITH h AS (SELECT doc_id,
            md5(trim(regexp_replace(
              regexp_replace(lower(coalesce(text, '')), '[^a-z0-9 ]', ' ', 'g'),
              ' +', ' ', 'g'))) AS hh
          FROM documents),
        base AS (SELECT DISTINCT hh FROM h WHERE doc_id % 5 <> 0),
        inc AS (SELECT doc_id, hh,
            ROW_NUMBER() OVER (PARTITION BY hh ORDER BY doc_id) AS rn
          FROM h WHERE doc_id % 5 = 0)
        SELECT inc.doc_id, inc.hh AS digest,
          CASE WHEN base.hh IS NOT NULL THEN 'dup_of_base'
               WHEN inc.rn > 1 THEN 'dup_in_batch'
               ELSE 'kept' END AS status
        FROM inc LEFT JOIN base ON inc.hh = base.hh
        ORDER BY inc.doc_id""")),

    // ---- bigram PMI collocations (tokenizer pair-scoring shape) ---------
    // The BPE/WordPiece merge-scoring step: adjacent-pair counts vs
    // unigram counts, scored by pointwise mutual information
    // ln( p(xy) / (p(x)p(y)) ), min count 5, top 40. Scale shape: bigram
    // and unigram counts are both map-side-combinable groupBys (pairs
    // cross the shuffle, never documents); the two totals ride as
    // broadcast 1-row aggregates; the count joins are term-keyed (the
    // unigram table is corpus-vocabulary-sized — never driver-side); the
    // final top-40 is a bounded TakeOrdered on the ROUNDED score, so the
    // ordering the hash check sees is float-robust.
    QueryDef(
      "q61_bigram_pmi",
      (s, dir) => {
        import s.implicits._
        val toks = filter(split(lower($"text"), "\\s+"), t => t =!= "")
        val base = table(s, dir, "documents")
          .select(toks.as("toks")).filter(size($"toks") >= 2)
        val bc = base.select(explode(zip_with(
              slice($"toks", lit(1), size($"toks") - 1),
              slice($"toks", lit(2), size($"toks") - 1),
              (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
          .select($"bg.w1", $"bg.w2")
          .groupBy($"w1", $"w2").agg(count(lit(1)).as("c_xy"))
        val uni = base.select(explode($"toks").as("w"))
          .groupBy($"w").agg(count(lit(1)).as("c"))
        val tot = broadcast(uni.agg(sum($"c").as("__N")))
        val btot = broadcast(bc.agg(sum($"c_xy").as("__B")))
        bc.join(uni.select($"w".as("w1"), $"c".as("c_x")), Seq("w1"))
          .join(uni.select($"w".as("w2"), $"c".as("c_y")), Seq("w2"))
          .crossJoin(tot).crossJoin(btot)
          .filter($"c_xy" >= 5)
          .select($"w1", $"w2", $"c_xy", $"c_x", $"c_y",
            round(log(($"c_xy".cast("double") / $"__B".cast("double")) /
              (($"c_x".cast("double") / $"__N".cast("double")) *
                ($"c_y".cast("double") / $"__N".cast("double")))), 6)
              .as("pmi"))
          .orderBy($"pmi".desc, $"w1", $"w2")
          .limit(40)
      },
      Some(raw"""WITH t AS (SELECT
            list_filter(regexp_split_to_array(lower(text), '\s+'),
              x -> x <> '') AS toks
          FROM documents),
        f AS (SELECT toks FROM t WHERE len(toks) >= 2),
        bg AS (SELECT unnest(list_transform(range(1, len(toks)),
            i -> [toks[i], toks[i+1]])) AS p FROM f),
        bc AS (SELECT p[1] AS w1, p[2] AS w2, COUNT(*) AS c_xy
          FROM bg GROUP BY 1, 2),
        uc AS (SELECT w, COUNT(*) AS c
          FROM (SELECT unnest(toks) AS w FROM f) GROUP BY w),
        nn AS (SELECT SUM(c) AS n FROM uc),
        bb AS (SELECT SUM(c_xy) AS b FROM bc)
        SELECT w1, w2, c_xy, ux.c AS c_x, uy.c AS c_y,
          ROUND(LN((CAST(c_xy AS DOUBLE) / CAST(b AS DOUBLE)) /
            ((CAST(ux.c AS DOUBLE) / CAST(n AS DOUBLE)) *
             (CAST(uy.c AS DOUBLE) / CAST(n AS DOUBLE)))), 6) AS pmi
        FROM bc JOIN uc ux ON bc.w1 = ux.w JOIN uc uy ON bc.w2 = uy.w
        CROSS JOIN nn CROSS JOIN bb
        WHERE c_xy >= 5
        ORDER BY pmi DESC, w1, w2 LIMIT 40""")),

    // ---- DSIR-style importance weights ---------------------------------
    // Data Selection via Importance Resampling (Xie et al. 2023): score
    // every document by the average log-likelihood ratio of a target-
    // domain unigram LM vs a source LM — here target = lang 'en', source
    // = the rest, add-1 smoothing over the union vocabulary. Scale
    // shape (round 7, the q54/q57 discipline): the term_counts kernel
    // emits distinct (doc, lang, term, c) rows straight off the scan —
    // token occurrences never cross a shuffle — and BOTH conditional
    // LMs are term-partitioned window sums over that same relation
    // (two window functions, one partitioning): ONE term exchange
    // serves model and score, no token-level model join. The totals
    // and vocab size ride as a broadcast 1-row aggregate off a
    // column-pruned term aggregation (partial-agged — one row per
    // (task, term) crosses that side's wire); the model is never
    // driver-materialized, so a 100 TB-corpus vocabulary is fine.
    QueryDef(
      "q62_dsir_weights",
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
        val tc = docs.select($"doc_id", $"lang",
            explode(graft.functions.SketchExpressions
              .term_counts(coalesce($"text", lit("")))).as("tc"))
          .select($"doc_id", $"lang", $"tc.term".as("term"),
            $"tc.tf".cast("long").as("c"))
        val lm = tc.groupBy($"term").agg(
          sum(when($"lang" === "en", $"c").otherwise(0L)).as("ct"),
          sum(when($"lang" =!= "en", $"c").otherwise(0L)).as("cs"))
        val tot = broadcast(lm.agg(sum($"ct").as("__Tt"),
          sum($"cs").as("__Ts"), count(lit(1)).as("__V")))
        val w = org.apache.spark.sql.expressions.Window.partitionBy($"term")
        tc.withColumn("ct",
            sum(when($"lang" === "en", $"c").otherwise(0L)).over(w))
          .withColumn("cs",
            sum(when($"lang" =!= "en", $"c").otherwise(0L)).over(w))
          .crossJoin(tot)
          .groupBy($"doc_id")
          .agg(sum($"c").as("n_tokens"),
            round(sum($"c".cast("double") * (
              log(($"ct" + 1).cast("double") / ($"__Tt" + $"__V").cast("double")) -
                log(($"cs" + 1).cast("double") / ($"__Ts" + $"__V").cast("double"))))
              / sum($"c").cast("double"), 6).as("dsir_weight"))
          .orderBy($"doc_id")
      },
      Some(raw"""WITH terms AS (
          SELECT doc_id,
            unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
              t -> t <> '')) AS term,
            lang
          FROM documents),
        tc AS (SELECT doc_id, lang, term, COUNT(*) AS c FROM terms
          GROUP BY doc_id, lang, term),
        lm AS (SELECT term,
            CAST(SUM(CASE WHEN lang = 'en' THEN c ELSE 0 END) AS BIGINT)
              AS ct,
            CAST(SUM(CASE WHEN lang <> 'en' THEN c ELSE 0 END) AS BIGINT)
              AS cs
          FROM tc GROUP BY term),
        tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS tt,
            CAST(SUM(cs) AS BIGINT) AS ts, COUNT(*) AS v FROM lm)
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
          ROUND(SUM(c * (
            LN(CAST(ct + 1 AS DOUBLE) / CAST(tt + v AS DOUBLE)) -
            LN(CAST(cs + 1 AS DOUBLE) / CAST(ts + v AS DOUBLE))))
            / CAST(SUM(c) AS DOUBLE), 6) AS dsir_weight
        FROM tc JOIN lm USING (term) CROSS JOIN tot
        GROUP BY doc_id ORDER BY doc_id""")),

    // ---- count-min sketch heavy hitters (round 7) ----------------------
    // The streaming-frequency workhorse (Cormode & Muthukrishnan 2005):
    // a depth×width counter table where every term adds its count at
    // slot h_d(term) per row d, and est(term) = min over rows — always
    // ≥ the true count. Hashing is the bloomPos discipline: the four
    // independent 32-bit slices of md5(term), no re-hash, so a SQL
    // oracle rebuilds the sketch hex-for-hex. Scale shape: the sketch
    // is a TABLE (depth·width partial-agged counter rows — never a
    // driver array), built by map-side-combinable aggregations off the
    // term_counts kernel; the report certifies the estimator on the
    // exact top-20 (overcount = est − exact ≥ 0 by construction, and
    // the oracle hash-checks every estimate).
    QueryDef(
      "q90_cms_heavy",
      (s, dir) => {
        graft.ops.Cms.heavyHitters(table(s, dir, "documents"), "text",
          width = 1024, depth = 4, topK = 20)
      },
      Some(raw"""WITH terms AS (
          SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
            t -> t <> '')) AS term
          FROM documents),
        gc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM terms
          GROUP BY term),
        dd AS (SELECT unnest(range(0, 4)) AS d),
        sl AS (SELECT term, cnt, d,
            CAST(('0x' || substr(md5(term), 1 + 8 * CAST(d AS INT), 8))
              AS BIGINT) % 1024 AS slot
          FROM gc CROSS JOIN dd),
        counters AS (SELECT d, slot, CAST(SUM(cnt) AS BIGINT) AS cell
          FROM sl GROUP BY d, slot),
        top AS (SELECT term, cnt FROM gc ORDER BY cnt DESC, term LIMIT 20),
        tsl AS (SELECT term, cnt, d,
            CAST(('0x' || substr(md5(term), 1 + 8 * CAST(d AS INT), 8))
              AS BIGINT) % 1024 AS slot
          FROM top CROSS JOIN dd)
        SELECT t.term, MAX(t.cnt) AS exact_cnt, MIN(c.cell) AS cms_est,
          MIN(c.cell) - MAX(t.cnt) AS overcount
        FROM tsl t JOIN counters c ON t.d = c.d AND t.slot = c.slot
        GROUP BY t.term ORDER BY exact_cnt DESC, term""")),

    // ---- bigram-LM perplexity scoring (round 7) ------------------------
    // The n-gram upgrade of q57's unigram filter: an in-corpus bigram
    // LM with add-1/2 smoothing over the bigram-successor vocabulary,
    // p(w2|w1) = (c(w1,w2) + 0.5) / (c(w1·) + 0.5·V), each document
    // scored by its average bigram surprisal. Scale shape: see
    // ops/BigramLm — both model counts ride ONE w1-keyed exchange
    // (c(w1,w2) is the sum over the ORDER BY w2 range frame's ties,
    // c(w1·) the plain partition sum), zero model joins, model never
    // driver-materialized (round 8; was two exchanges in round 7).
    QueryDef(
      "q92_bigram_lm",
      (s, dir) => {
        import s.implicits._
        graft.ops.BigramLm
          .scoreDocs(table(s, dir, "documents"), "text", "doc_id")
          .orderBy($"doc_id")
      },
      Some(raw"""WITH t AS (SELECT doc_id,
            list_filter(regexp_split_to_array(lower(text), '\s+'),
              x -> x <> '') AS toks
          FROM documents),
        f AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 2),
        bg0 AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
            i -> [toks[i], toks[i+1]])) AS p FROM f),
        bg AS (SELECT doc_id, p[1] AS w1, p[2] AS w2, COUNT(*) AS c
          FROM bg0 GROUP BY doc_id, w1, w2),
        m2 AS (SELECT w1, w2, CAST(SUM(c) AS BIGINT) AS c2 FROM bg
          GROUP BY w1, w2),
        m1 AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS c1 FROM bg
          GROUP BY w1),
        vv AS (SELECT CAST(COUNT(DISTINCT w2) AS BIGINT) AS v FROM bg)
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
          ROUND(-SUM(c * LN((CAST(c2 AS DOUBLE) + 0.5) /
              (CAST(c1 AS DOUBLE) + 0.5 * CAST(v AS DOUBLE))))
            / CAST(SUM(c) AS DOUBLE), 6) AS avg_neg_logp
        FROM bg JOIN m2 USING (w1, w2) JOIN m1 USING (w1) CROSS JOIN vv
        GROUP BY doc_id ORDER BY doc_id""")),

    // ---- per-source curation gate (round 7) -----------------------------
    // The C4/RefinedWeb domain-level decision: aggregate per-source
    // quality signals and derive a keep/drop verdict per source (a
    // polluted domain is dropped WHOLESALE — cheaper and more robust
    // than per-document rules against template farms). Signals here:
    // language purity (en fraction), short-document fraction, mean
    // token length. Every number derives from exact integer counts, so
    // the verdict is float-safe by construction (no float-sum ordering
    // anywhere). Scale shape: ONE map-side-combinable groupBy(source) —
    // the domain key is the natural partition; a hot domain costs
    // per-task partials only.
    QueryDef(
      "q96_source_gate",
      (s, dir) => {
        import s.implicits._
        graft.ops.SourceGate.gate(table(s, dir, "documents"),
          "source", "text", "lang", $"n_chars")
      },
      Some(raw"""SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
          ROUND(CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE), 6) AS en_frac,
          ROUND(CAST(SUM(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE), 6) AS short_frac,
          ROUND(CAST(SUM(len(list_filter(regexp_split_to_array(text, '\s+'),
              t -> t <> ''))) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE), 6) AS mean_tokens,
          (SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) * 10
              >= COUNT(*) * 4
            AND SUM(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END) * 10
              <= COUNT(*) * 3) AS kept
        FROM documents GROUP BY source ORDER BY source""")),

    // ---- cross-slice term-distribution drift (round 7) ------------------
    // The distribution-shift alarm between two corpus slices (old crawl
    // vs new delivery, train vs validation): symmetric KL divergence of
    // add-1-smoothed unigram distributions over the union vocabulary.
    // Float discipline: each term's KL contribution is computed in a
    // PINNED double op order, rounded to integer NANO-units, and summed
    // as BIGINT — the exact-integer-scaling recipe (CoreQueries
    // .exactSum), so the total is order-independent on any engine and
    // at any parallelism. Scale shape: one combinable per-(term, slice)
    // count pivoted in the same aggregation, union-vocabulary totals as
    // a broadcast 1-row aggregate, one combinable BIGINT sum — the
    // model (term table) never leaves the cluster.
    QueryDef(
      "q97_term_drift",
      (s, dir) => {
        import s.implicits._
        graft.ops.Drift.termDrift(table(s, dir, "documents"), "text",
          conv(substring(md5($"doc_id".cast("string")), 1, 4), 16, 10)
            .cast("int") % 2)
      },
      Some(raw"""WITH t AS (SELECT
            CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
              AS BIGINT) % 2 AS s,
            unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
              x -> x <> '')) AS term
          FROM documents),
        tc AS (SELECT term,
            CAST(SUM(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
            CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
          FROM t GROUP BY term),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS v,
            CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
          FROM tc),
        c AS (SELECT v, na, nb,
            CAST(ROUND(CAST(ca + 1 AS DOUBLE) / CAST(na + v AS DOUBLE)
              * LN((CAST(ca + 1 AS DOUBLE) / CAST(na + v AS DOUBLE))
                / (CAST(cb + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE)))
              * 1000000000.0) AS BIGINT) AS tab,
            CAST(ROUND(CAST(cb + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE)
              * LN((CAST(cb + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE))
                / (CAST(ca + 1 AS DOUBLE) / CAST(na + v AS DOUBLE)))
              * 1000000000.0) AS BIGINT) AS tba
          FROM tc CROSS JOIN tot)
        SELECT v AS vocab_size, na AS n_tokens_a, nb AS n_tokens_b,
          ROUND(CAST(SUM(tab) AS DOUBLE) / 1000000000.0, 6) AS kl_ab,
          ROUND(CAST(SUM(tba) AS DOUBLE) / 1000000000.0, 6) AS kl_ba
        FROM c GROUP BY v, na, nb""")),

    // ---- corpus balance chi-square (round 7) ---------------------------
    // Source × language independence: Pearson chi2 via the identity
    // N*(sum O^2/(rt*ct) - 1) — no expected-count rows for empty cells —
    // plus Cramér's V effect size. Per-cell terms round to integer
    // pico-units and sum as BIGINT (the q97 float discipline), so the
    // statistic is order-independent at any parallelism; the only
    // corpus-sized pass is one combinable groupBy(source, lang) count.
    QueryDef(
      "q101_balance_chi2",
      (s, dir) => {
        import s.implicits._
        graft.ops.Drift.balanceChi2(
          table(s, dir, "documents"), $"source", $"lang")
      },
      Some(raw"""WITH obs AS (SELECT source AS r, lang AS c,
            CAST(COUNT(*) AS BIGINT) AS o
          FROM documents GROUP BY source, lang),
        rt AS (SELECT r, CAST(SUM(o) AS BIGINT) AS rt FROM obs GROUP BY r),
        ct AS (SELECT c, CAST(SUM(o) AS BIGINT) AS ct FROM obs GROUP BY c),
        tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
            CAST(COUNT(DISTINCT r) AS BIGINT) AS nr,
            CAST(COUNT(DISTINCT c) AS BIGINT) AS nc
          FROM obs),
        cell AS (SELECT CAST(ROUND(
            CAST(o * o AS DOUBLE) / CAST(rt.rt * ct.ct AS DOUBLE)
              * 1000000000000.0) AS BIGINT) AS pico
          FROM obs JOIN rt USING (r) JOIN ct USING (c)),
        sm AS (SELECT CAST(SUM(pico) AS BIGINT) AS s FROM cell)
        SELECT n, nr AS n_rows, nc AS n_cols,
          (nr - 1) * (nc - 1) AS dof,
          ROUND(CAST(n AS DOUBLE)
            * (CAST(s AS DOUBLE) / 1000000000000.0 - 1.0), 6) AS chi2,
          CASE WHEN LEAST(nr, nc) > 1 THEN
            ROUND(SQRT(GREATEST(CAST(n AS DOUBLE)
              * (CAST(s AS DOUBLE) / 1000000000000.0 - 1.0), 0.0)
              / (CAST(n AS DOUBLE) * CAST(LEAST(nr, nc) - 1 AS DOUBLE))), 6)
          ELSE 0.0 END AS cramers_v
        FROM sm CROSS JOIN tot""")),

    // ---- HLL distinct-per-source (round 7) -----------------------------
    // The cardinality member of the certified sketch family (q90 CMS
    // frequency / q84 KMV overlap / q73 Bloom membership): per-source
    // vocabulary size by 256-register HyperLogLog, certified against
    // the exact distinct count riding the SAME distinct-(source, term)
    // exchange. Register index/rho are hex-string arithmetic on
    // md5(term) and the harmonic sum is an exact BIGINT sum of powers
    // of two — the oracle rebuilds every register and both estimator
    // branches bit-for-bit. No driver arrays: the sketch is a
    // 256-row-per-source TABLE of combinable MAXes.
    QueryDef(
      "q102_hll_distinct",
      (s, dir) => {
        import s.implicits._
        val terms = table(s, dir, "documents")
          .select($"source", explode(filter(split(lower($"text"), "\\s+"),
            t => t =!= "")).as("term"))
        graft.ops.Hll.distinctPerGroup(terms, $"source", $"term", "source")
          .sortBounded($"source")
      },
      Some(raw"""WITH pairs AS (SELECT DISTINCT source,
            unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
              t -> t <> '')) AS v
          FROM documents),
        hx AS (SELECT source, md5(v) AS h FROM pairs),
        reg AS (SELECT source,
            CAST(('0x' || substr(h, 1, 2)) AS BIGINT) AS b,
            CASE WHEN length(regexp_extract(substr(h, 3, 13), '^0*')) = 13
              THEN 53
              ELSE length(regexp_extract(substr(h, 3, 13), '^0*')) * 4
                + (CASE WHEN substr(substr(h, 3, 13),
                    length(regexp_extract(substr(h, 3, 13), '^0*')) + 1, 1)
                    IN ('8','9','a','b','c','d','e','f') THEN 0
                  WHEN substr(substr(h, 3, 13),
                    length(regexp_extract(substr(h, 3, 13), '^0*')) + 1, 1)
                    IN ('4','5','6','7') THEN 1
                  WHEN substr(substr(h, 3, 13),
                    length(regexp_extract(substr(h, 3, 13), '^0*')) + 1, 1)
                    IN ('2','3') THEN 2
                  ELSE 3 END) + 1 END AS rho
          FROM hx),
        regs AS (SELECT source, b, MAX(rho) AS mj,
            CAST(COUNT(*) AS BIGINT) AS nt
          FROM reg GROUP BY source, b),
        pg AS (SELECT source, CAST(SUM(nt) AS BIGINT) AS ex,
            CAST(SUM(CAST(POW(2, 53 - mj) AS BIGINT)) AS BIGINT) AS snon,
            CAST(COUNT(*) AS BIGINT) AS nb
          FROM regs GROUP BY source),
        est AS (SELECT source, ex, nb,
            (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
              * 9007199254740992.0
              / CAST(snon + (256 - nb) * 9007199254740992 AS DOUBLE) AS raw
          FROM pg),
        fin AS (SELECT source, ex,
            CASE WHEN raw <= 640.0 AND nb < 256
              THEN 256.0 * LN(256.0 / CAST(256 - nb AS DOUBLE))
              ELSE raw END AS e
          FROM est)
        SELECT source, ex AS n_distinct, ROUND(e, 6) AS hll_est,
          ROUND((e - CAST(ex AS DOUBLE)) / CAST(ex AS DOUBLE), 6) AS rel_err
        FROM fin ORDER BY source""")),

    // ---- per-source tokenizer efficiency (round 7) ----------------------
    // The tokenizer-fit report a pipeline checks before committing to a
    // vocabulary: chars-per-BPE-token and tokens-per-word PER SOURCE
    // under the corpus-trained merges — a domain whose compression is
    // far off the corpus mean is under-represented in the tokenizer
    // (costly to train on) or is junk. Composes the certified q72
    // trainer and the q77 zero-shuffle apply kernel; aggregation is one
    // combinable groupBy(source) over the kernel's per-doc counts, and
    // the oracle replays training + application + the report from the
    // SAME CTE fragments q72/q77 certify.
    QueryDef(
      "q98_bpe_efficiency",
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
        val m = graft.util.CollectCapped(
          graft.ops.Bpe.trainMerges(docs, "text", 8), 8, "BPE merge table")
          .map(r => (r.getString(1), r.getString(2))).toSeq
        graft.ops.Bpe.tokenizeCount(docs, "text", m)
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            sum(length($"text")).as("n_chars"),
            sum($"n_words").as("n_words"),
            sum($"n_bpe_tokens").as("n_bpe_tokens"))
          .select($"source", $"n_docs", $"n_chars", $"n_words",
            $"n_bpe_tokens",
            round($"n_chars".cast("double") / $"n_bpe_tokens".cast("double"), 6)
              .as("chars_per_token"),
            round($"n_bpe_tokens".cast("double") / $"n_words".cast("double"), 6)
              .as("tokens_per_word"))
          .sortBounded($"source")
      },
      Some("WITH " + bpeTrainCtes(8, "documents") +
        bpeApplyCtes(8, "documents") + raw""",
    pd AS (SELECT d.source, length(d.text) AS ch,
        COALESCE(cnt.n_words, 0) AS w, COALESCE(cnt.n_bpe_tokens, 0) AS t
      FROM documents d LEFT JOIN cnt ON d.doc_id = cnt.doc_id)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(ch) AS BIGINT) AS n_chars,
      CAST(SUM(w) AS BIGINT) AS n_words,
      CAST(SUM(t) AS BIGINT) AS n_bpe_tokens,
      ROUND(CAST(SUM(ch) AS DOUBLE) / CAST(SUM(t) AS DOUBLE), 6)
        AS chars_per_token,
      ROUND(CAST(SUM(t) AS DOUBLE) / CAST(SUM(w) AS DOUBLE), 6)
        AS tokens_per_word
    FROM pd GROUP BY source ORDER BY source""")),

    // ---- Heaps' law vocabulary-growth fit (round 8; q94's companion) ---
    // V(N) ≈ K·N^β over power-of-two document-prefix checkpoints:
    // per-term first-occurrence doc (one combinable min off the
    // term_counts relation), new-terms-per-doc and token counts prefix-
    // summed by the TWO-PHASE distributed recipe (no unpartitioned
    // window over the doc table), checkpoints selected by the bitwise
    // power-of-two test, and the log-log least-squares slope computed
    // in closed form over the ≤⌈log₂ n⌉ checkpoint rows. The corpus
    // sizing read: β well under 1 means vocabulary saturates — the
    // tokenizer/vocab budget planner's counterpart to Zipf's rank law.
    QueryDef(
      "q161_heaps",
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
        val base = docs.select($"doc_id",
          regexp_count($"text", lit("\\S+"))
            .cast("long").as("len"))
        // the vocabulary SPACE is 3-word shingle types (the q114/q143
        // gram space): corpus word types saturate in dozens on this
        // synthetic data, gram types keep growing — the regime Heaps
        // describes; grams travel as 60-bit hashes
        // gram_hash_seq emits the 60-bit md5 slice as a LONG in one
        // codegen pass (md5Long60 ≡ the oracle's first-15-hex-chars
        // parse) — no per-gram string materialization, and the
        // first-occurrence exchange carries (long, long) rows only;
        // per-doc duplicate hashes are harmless under groupBy(g).min
        val firstDoc = graft.ops.Par.spread(docs, $"doc_id")
          .select($"doc_id",
            explode(graft.functions.SketchExpressions
              .gram_hash_seq(coalesce($"text", lit("")), 3)).as("g"))
          .groupBy($"g").agg(min($"doc_id").as("doc_id"))
          .groupBy($"doc_id").agg(count(lit(1)).as("new_terms"))
        // rank + both exclusive running sums in ONE fused two-phase
        // machinery (r17: the rank-then-running-before stack paid a
        // second exchange + count + broadcast for the same doc order;
        // joining firstDoc BEFORE the window keeps the row set and the
        // doc_id total order identical)
        val joined = base.join(firstDoc, Seq("doc_id"), "left")
          .select($"doc_id", $"len",
            coalesce($"new_terms", lit(0L)).as("new_terms"))
        val c2 = graft.ops.DistWindow.withGlobalRankAndBeforeMulti(joined,
          floor($"doc_id" / 256.0).cast("long"), Seq($"doc_id"),
          Seq("len" -> "tok_before", "new_terms" -> "v_before"), "rk")
        val n = base.agg(count(lit(1)).as("n_total"))
        val cps = c2.crossJoin(broadcast(n))
          .filter((expr("(rk & (rk - 1)) = 0") && $"rk" >= 16) ||
            $"rk" === $"n_total")
          .select($"rk".as("n_docs_prefix"),
            ($"tok_before" + $"len").as("n_tokens_prefix"),
            ($"v_before" + $"new_terms").as("vocabulary"))
          .localCheckpoint(false)
        val fit = cps.select(
            log($"n_tokens_prefix".cast("double")).as("x"),
            log($"vocabulary".cast("double")).as("y"))
          .agg(count(lit(1)).as("k"), sum($"x").as("sx"), sum($"y").as("sy"),
            sum($"x" * $"x").as("sxx"), sum($"x" * $"y").as("sxy"))
          .select(
            (($"k" * $"sxy" - $"sx" * $"sy") /
              ($"k" * $"sxx" - $"sx" * $"sx")).as("b"),
            $"sx", $"sy", $"k")
          .select((round($"b", 6) + 0.0).as("heaps_beta"),
            round(exp(($"sy" - $"b" * $"sx") / $"k"), 6).as("heaps_k"))
        cps.crossJoin(broadcast(fit))
          .sortBounded($"n_docs_prefix")
      },
      Some(raw"""WITH base AS (SELECT doc_id,
            CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
              t -> t <> '')) AS BIGINT) AS len
          FROM documents),
        rk AS (SELECT doc_id, len,
            ROW_NUMBER() OVER (ORDER BY doc_id) AS rk
          FROM base),
        toks AS (SELECT doc_id,
            list_filter(regexp_split_to_array(lower(text), '\s+'),
              t -> t <> '') AS tk
          FROM documents),
        terms AS (SELECT doc_id,
            CAST(('0x' || substr(md5(unnest(CASE WHEN len(tk) < 3 THEN []
              ELSE list_distinct(list_transform(range(len(tk) - 2),
                i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3])) END)),
              1, 15)) AS BIGINT) AS g
          FROM toks),
        fd AS (SELECT MIN(doc_id) AS doc_id FROM terms GROUP BY g),
        nt AS (SELECT doc_id, COUNT(*) AS new_terms FROM fd
          GROUP BY doc_id),
        cum AS (SELECT rk.rk,
            SUM(rk.len) OVER (ORDER BY rk.rk ROWS UNBOUNDED PRECEDING)
              AS n_tokens_prefix,
            SUM(COALESCE(nt.new_terms, 0)) OVER (ORDER BY rk.rk
              ROWS UNBOUNDED PRECEDING) AS vocabulary
          FROM rk LEFT JOIN nt USING (doc_id)),
        tot AS (SELECT COUNT(*) AS n_total FROM base),
        cps AS (SELECT rk AS n_docs_prefix,
            CAST(n_tokens_prefix AS BIGINT) AS n_tokens_prefix,
            CAST(vocabulary AS BIGINT) AS vocabulary
          FROM cum CROSS JOIN tot
          WHERE ((rk & (rk - 1)) = 0 AND rk >= 16) OR rk = n_total),
        fit AS (SELECT COUNT(*) AS k, SUM(LN(n_tokens_prefix)) AS sx,
            SUM(LN(vocabulary)) AS sy,
            SUM(LN(n_tokens_prefix) * LN(n_tokens_prefix)) AS sxx,
            SUM(LN(n_tokens_prefix) * LN(vocabulary)) AS sxy
          FROM cps),
        b AS (SELECT (k * sxy - sx * sy) / (k * sxx - sx * sx) AS b,
            sx, sy, k FROM fit)
        SELECT c.n_docs_prefix, c.n_tokens_prefix, c.vocabulary,
          ROUND(b.b, 6) + 0.0 AS heaps_beta,
          ROUND(EXP((b.sy - b.b * b.sx) / b.k), 6) AS heaps_k
        FROM cps c CROSS JOIN b ORDER BY c.n_docs_prefix""")),

    // ---- term burstiness (variance-to-mean ratio; round 8) -------------
    // Church & Gale: content words arrive in BURSTS (a doc that says
    // "llama" once says it again), function words arrive uniformly.
    // Per term over ALL documents (zeros included): VMR =
    // (E[c²] − μ²)/μ from three exact integer sums (Σc, Σc², N) — the
    // term_counts relation never expands to token occurrences, absent
    // docs contribute algebraically. Top 20 burstiest among terms in
    // ≥ 20 docs, deterministically ordered on the rounded score.
    QueryDef(
      "q162_burstiness",
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
        val tc = docs.select($"doc_id",
            explode(graft.functions.SketchExpressions
              .term_counts(coalesce($"text", lit("")))).as("tc"))
          .select($"tc.term".as("term"), $"tc.tf".cast("long").as("c"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        tc.groupBy($"term")
          .agg(count(lit(1)).as("df"), sum($"c").as("total_tf"),
            sum($"c" * $"c").as("__s2"))
          .filter($"df" >= 20)
          .crossJoin(broadcast(n))
          .withColumn("vmr", round(
            ($"__s2".cast("double") / $"n_docs" -
              ($"total_tf".cast("double") / $"n_docs") *
              ($"total_tf".cast("double") / $"n_docs")) /
            ($"total_tf".cast("double") / $"n_docs"), 6))
          .select($"term", $"df", $"total_tf", $"vmr")
          .orderBy($"vmr".desc, $"term")
          .limit(20)
      },
      Some(raw"""WITH terms AS (SELECT doc_id,
            unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
              t -> t <> '')) AS term
          FROM documents),
        tc AS (SELECT doc_id, term, COUNT(*) AS c FROM terms
          GROUP BY doc_id, term),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        st AS (SELECT term, COUNT(*) AS df,
            CAST(SUM(c) AS BIGINT) AS total_tf,
            CAST(SUM(c * c) AS BIGINT) AS s2
          FROM tc GROUP BY term HAVING COUNT(*) >= 20)
        SELECT term, df, total_tf,
          ROUND((CAST(s2 AS DOUBLE) / n_docs -
            (CAST(total_tf AS DOUBLE) / n_docs) *
            (CAST(total_tf AS DOUBLE) / n_docs)) /
            (CAST(total_tf AS DOUBLE) / n_docs), 6) AS vmr
        FROM st CROSS JOIN n ORDER BY vmr DESC, term LIMIT 20"""))
  )
}
