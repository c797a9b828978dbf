package graft.queries

import org.apache.spark.sql.functions._
import QueryDef.{table, BoundedSort}

/** Round-8 corpus-governance operators: the policy layer a pipeline
  * runs between curation and training — per-domain quota caps,
  * semantic eval-set decontamination, LSH parameter auto-tuning,
  * behavioral funnels over the event stream, n-gram diversity
  * diagnostics, and the composed delta-ingest chain. Float outputs
  * follow the integer-scaling discipline (rank and threshold on exact
  * integers, round once at the edge) so Spark-vs-DuckDB summation and
  * row order can never break the hash.
  */
object GovernanceQueries {

  private def sqlList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString("[", ", ", "]")

  /** The (bands, rows) splits of a 32-hash minhash signature, widest
    * banding first. All six are powers of two, so every S-curve power
    * is an explicit squaring chain — identical IEEE multiply sequences
    * in both engines, no libm pow anywhere.
    */
  private val lshSplits = Seq((32, 1), (16, 2), (8, 4), (4, 8), (2, 16), (1, 32))

  /** DuckDB CTE chain computing, per pair, the candidate probability
    * p = 1 - (1 - j^r)^b for every split — staged exactly like the
    * Spark side (j^r by squaring, then (1-j^r)^b by squaring), so both
    * engines execute the same IEEE op sequence bit-for-bit.
    */
  private def sCurveCtes: String = {
    val sb = new StringBuilder
    sb ++= raw"""sq1 AS (SELECT above,
            CAST(inter AS DOUBLE) / CAST(un AS DOUBLE) AS j1 FROM pr)"""
    for (e <- Seq(2, 4, 8, 16, 32))
      sb ++= s",\n        sq$e AS (SELECT *, j${e / 2}*j${e / 2} AS j$e FROM sq${e / 2})"
    sb ++= ",\n        qc AS (SELECT *, " +
      lshSplits.map { case (_, r) => s"1.0 - j$r AS q${r}_1" }.mkString(", ") +
      " FROM sq32)"
    var prev = "qc"
    for ((b, r) <- lshSplits if b > 1) {
      var cur = 1
      while (cur < b) {
        val nxt = s"t${r}_${cur * 2}"
        sb ++= s",\n        $nxt AS (SELECT *, q${r}_$cur*q${r}_$cur AS q${r}_${cur * 2} FROM $prev)"
        prev = nxt; cur *= 2
      }
    }
    sb ++= s",\n        pp AS (SELECT above, " + lshSplits.map { case (b, r) =>
      s"CAST(ROUND((1.0 - q${r}_$b) * 1000000000.0) AS BIGINT) AS pn_$r"
    }.mkString(", ") + s" FROM $prev)"
    sb.toString
  }

  /** q85's char-entropy CTE chain (printable-ASCII Shannon entropy per
    * doc, round-6): the corpus quality score several governance ops
    * rank on. Kept verbatim so every consumer certifies the SAME
    * number the q74/q82/q85 family already certifies.
    */
  private[queries] val entropyCtes = raw"""ch AS (SELECT doc_id,
            unnest(string_split(lower(coalesce(text, '')), '')) AS c
          FROM documents),
        f AS (SELECT doc_id, c, COUNT(*) AS n FROM ch
          WHERE ascii(c) BETWEEN 32 AND 126 GROUP BY doc_id, c),
        tt AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS t
          FROM f GROUP BY doc_id),
        e0 AS (SELECT f.doc_id,
            ROUND(-SUM((CAST(n AS DOUBLE) / t) * LN(CAST(n AS DOUBLE) / t)), 6)
              AS ent
          FROM f JOIN tt ON f.doc_id = tt.doc_id GROUP BY f.doc_id)"""

  val defs: Seq[QueryDef] = Seq(
    // ---- per-domain quota cap (round 8) --------------------------------
    // The C4/Dolma-style domain cap: no single source may contribute
    // more than K documents, and when it would, keep its BEST K by a
    // quality score (char entropy, the certified q74/q85 signal) — a
    // hot domain is down-sampled, not truncated arbitrarily. Ranking
    // uses TopK.perGroup (bounded-heap aggregate, O(K) state per source
    // per task): a source with a billion rows costs each task a K-row
    // partial, never a source-serializing window. The quality key is an
    // exact micro-unit BIGINT so the cut is engine-deterministic.
    QueryDef(
      "q110_domain_cap",
      (s, dir) => {
        import s.implicits._
        val ent = round(element_at(graft.functions.SketchExpressions
          .char_entropy(lower(coalesce($"text", lit("")))), 2), 6)
        val base = table(s, dir, "documents")
          .select($"doc_id", $"source", $"n_chars",
            round(ent * 1e6).cast("long").as("em"))
        val kept = graft.ops.TopK.perGroup(base, Seq("source"),
          Seq((col("em"), true), (col("doc_id"), false)), 15, "rk")
        val kAgg = kept.groupBy($"source")
          .agg(count(lit(1)).as("n_kept"), sum($"n_chars").as("kept_chars"),
            min($"em").as("cutm"))
        val tot = base.groupBy($"source").agg(count(lit(1)).as("n_docs"))
        tot.join(broadcast(kAgg), Seq("source"))
          .select($"source", $"n_docs", $"n_kept",
            ($"n_docs" - $"n_kept").as("n_dropped"), $"kept_chars",
            round($"cutm" / 1e6, 6).as("cut_entropy"))
          .sortBounded($"source")
      },
      Some(raw"""WITH $entropyCtes,
        base AS (SELECT d.doc_id, d.source, d.n_chars,
            CAST(ROUND(COALESCE(e0.ent, 0.0) * 1000000.0) AS BIGINT) AS em
          FROM documents d LEFT JOIN e0 ON d.doc_id = e0.doc_id),
        rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
            ORDER BY em DESC, doc_id) AS r FROM base),
        k AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
            CAST(SUM(n_chars) AS BIGINT) AS kept_chars,
            MIN(em) AS cutm
          FROM rk WHERE r <= 15 GROUP BY source),
        t AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
          FROM base GROUP BY source)
        SELECT source, n_docs, n_kept, n_docs - n_kept AS n_dropped,
          kept_chars, ROUND(cutm / 1000000.0, 6) AS cut_entropy
        FROM t JOIN k USING (source) ORDER BY source""")),

    // ---- semantic eval-set decontamination (round 8) -------------------
    // The embedding-space twin of q50's n-gram decontamination: drop
    // training vectors whose max cosine to a held-out eval embedding
    // set crosses the contamination ceiling (the PaLM/Llama-style guard
    // against eval neighbors leaking into training). The eval set
    // collapses to ONE broadcast 1-row aggregate; the max-cosine fold
    // runs inside the corpus scan (zero shuffle — see
    // ops/Ann.semanticDecontam); each pair cosine is rounded once to
    // 1e-5 units so the integer max and the integer threshold are
    // engine-deterministic.
    QueryDef(
      "q111_embed_decontam",
      (s, dir) => {
        import s.implicits._
        val emb = table(s, dir, "embeddings")
        val scored = graft.ops.Ann.semanticDecontam(
          emb.filter($"vec_id" % 50 =!= 0),
          emb.filter($"vec_id" % 50 === 0), "embedding")
        scored.groupBy($"label")
          .agg(count(lit(1)).as("n_vecs"),
            sum(when($"max_sim_u" >= 30000L, 1L).otherwise(0L))
              .as("n_flagged"),
            max($"max_sim_u").as("__mx"))
          .select($"label", $"n_vecs", $"n_flagged",
            ($"n_vecs" - $"n_flagged").as("n_kept"),
            round($"__mx" / 1e5, 5).as("max_sim"))
          .sortBounded($"label")
      },
      Some(raw"""WITH q AS (SELECT vec_id AS qid, embedding AS qv
          FROM embeddings WHERE vec_id % 50 = 0),
        c AS (SELECT vec_id, label, embedding AS v FROM embeddings
          WHERE vec_id % 50 <> 0),
        sims AS (SELECT c.vec_id, c.label, q.qid,
            SUM(CAST(c.v[t.i] AS DOUBLE) * CAST(q.qv[t.i] AS DOUBLE)) /
              (SQRT(SUM(CAST(c.v[t.i] AS DOUBLE) * CAST(c.v[t.i] AS DOUBLE))) *
               SQRT(SUM(CAST(q.qv[t.i] AS DOUBLE) * CAST(q.qv[t.i] AS DOUBLE))))
              AS sim
          FROM c CROSS JOIN q CROSS JOIN generate_series(1, 64) t(i)
          GROUP BY c.vec_id, c.label, q.qid),
        p AS (SELECT vec_id, label,
            MAX(CAST(ROUND(sim * 100000.0) AS BIGINT)) AS su
          FROM sims GROUP BY vec_id, label)
        SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
          CAST(SUM(CASE WHEN su >= 30000 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_flagged,
          CAST(COUNT(*) - SUM(CASE WHEN su >= 30000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
          ROUND(MAX(su) / 100000.0, 5) AS max_sim
        FROM p GROUP BY label ORDER BY label""")),

    // ---- n-gram diversity diagnostics (round 8) ------------------------
    // Template/spam detection per source: the distinct-3gram fraction
    // (low = boilerplate-heavy, the "diversity" knob self-BLEU probes)
    // and the hottest shingle's document frequency. Scale shape: one
    // word_shingles kernel pass, a (source, gram) pre-aggregation
    // (map-side combinable — per-doc-distinct shingles make count = df)
    // feeding a per-source combinable rollup, plus a zero-shuffle
    // occurrence count; only grams and counts cross the wire, never
    // documents.
    QueryDef(
      "q114_ngram_diversity",
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
        // grams cross the wire as 60-bit md5 slices, not strings: the
        // (source, gram) exchange carries 8-byte longs whatever the
        // shingle text length, and both engines hash identically so the
        // distinct/df counts stay exactly replayable (round 8)
        val pre = graft.ops.Par.spread(docs, $"doc_id")
          .select($"source",
            explode(graft.functions.SketchExpressions
              .word_shingles($"text", 3)).as("g0"))
          .select($"source",
            conv(substring(md5($"g0"), 1, 15), 16, 10).cast("long").as("g"))
          .groupBy($"source", $"g").agg(count(lit(1)).as("df"))
        val per = pre.groupBy($"source")
          .agg(count(lit(1)).as("n_distinct"), max($"df").as("top_df"))
        val tot = docs.select($"source",
            greatest(regexp_count(lower($"text"), lit("\\S+")) - 2, lit(0)).cast("long").as("occ"))
          .groupBy($"source").agg(sum($"occ").as("n_occurrences"))
        tot.join(broadcast(per), Seq("source"))
          .select($"source", $"n_occurrences", $"n_distinct", $"top_df",
            round($"n_distinct".cast("double") / $"n_occurrences", 6)
              .as("diversity"))
          .sortBounded($"source")
      },
      Some(raw"""WITH d0 AS (SELECT doc_id, source,
            list_filter(regexp_split_to_array(lower(text), '\s+'),
              t -> t <> '') AS toks
          FROM documents),
        sh AS (SELECT doc_id, source,
            CASE WHEN len(toks) < 3 THEN []
            ELSE list_distinct(list_transform(range(len(toks) - 2),
              i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))
            END AS sset,
            CASE WHEN len(toks) < 3 THEN 0 ELSE len(toks) - 2 END AS occ
          FROM d0),
        ex AS (SELECT source,
            CAST(('0x' || substr(md5(unnest(sset)), 1, 15)) AS BIGINT) AS g
          FROM sh),
        pre AS (SELECT source, g, COUNT(*) AS df FROM ex GROUP BY source, g),
        per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_distinct,
            CAST(MAX(df) AS BIGINT) AS top_df FROM pre GROUP BY source),
        tot AS (SELECT source, CAST(SUM(occ) AS BIGINT) AS n_occurrences
          FROM sh GROUP BY source)
        SELECT source, n_occurrences, n_distinct, top_df,
          ROUND(CAST(n_distinct AS DOUBLE) / n_occurrences, 6) AS diversity
        FROM tot JOIN per USING (source) ORDER BY source""")),

    // ---- LSH banding auto-tune (round 8) -------------------------------
    // Pick the (bands, rows) split of a 32-hash minhash signature that
    // minimizes expected candidate error at the Jaccard threshold 0.5,
    // integrating the S-curve P(candidate|j) = 1-(1-j^r)^b over a
    // measured pair distribution — the MMDS-textbook tuning step, run
    // on data instead of a guessed curve. Sampling independent IDS
    // loses pair structure QUADRATICALLY (the corpus's j≈0.99 planted
    // dups never have both endpoints in a 10% id sample), so the
    // calibration set is the union of (a) the bounded random-pair
    // background and (b) seed-0 minhash COLLISION pairs — the
    // positive-rich candidate mass a real tuner labels, rebuilt
    // bit-for-bit by both engines from the q105 md5 family. Every
    // power is an explicit squaring chain (all six splits are powers
    // of two), so both engines execute the same IEEE multiply
    // sequence; each pair's probability is nano-rounded ONCE and
    // error masses sum as exact BIGINTs. Doc ids are hard-capped, so
    // the harness cost is fixed at any corpus size.
    QueryDef(
      "q112_lsh_tune",
      (s, dir) => {
        import s.implicits._
        val sample = graft.ops.Par
          .spread(table(s, dir, "documents"), $"doc_id")
          .filter($"doc_id" < 10000)
          .select($"doc_id",
            graft.functions.SketchExpressions.word_shingles($"text", 3)
              .as("sset"))
          .filter(size($"sset") > 0)
        // seed-0 of the q105 one-pass kernel (identical md5("0:"+sh)
        // min); ss = the (hash, shingle)-sorted set for the per-pair
        // EXACT intersection merge below — the xxhash64 prefix only
        // accelerates the merge (strings are compared on hash ties, so
        // the count is the exact string-set intersection; r17: the
        // UTF8String-driven merge was ~85% of the pair stage).
        // Checkpointed because the kernels are codegen-able and the
        // pair joins below would otherwise fuse their computation into
        // the pair loops (the q105 lesson)
        val meta = sample.select($"doc_id",
          size($"sset").cast("long").as("sz"),
          expr("array_sort(transform(sset, x -> named_struct('h', xxhash64(x), 's', x)))")
            .as("ss"),
          element_at(graft.functions.SketchExpressions
            .md5_minhash_sigs($"sset", 1), 1).as("m0"))
          .localCheckpoint(false)
        val rnd = meta.filter($"doc_id" % 10 === 0)
        val randPairs = rnd.select($"doc_id".as("id_a"))
          .join(broadcast(rnd.select($"doc_id".as("id_b"))), $"id_a" < $"id_b")
        val candPairs = meta.as("p").join(broadcast(meta.as("q")),
            col("p.m0") === col("q.m0") &&
              col("p.doc_id") < col("q.doc_id"))
          .select(col("p.doc_id").as("id_a"), col("q.doc_id").as("id_b"))
        // exact intersections ONLY for the calibration pairs, as one
        // merge pass per pair over the broadcast sorted shingle sets —
        // the previous shingle-keyed self-join computed intersections
        // for EVERY overlapping pair in the corpus (hot shingles fan
        // out quadratically) and then discarded most of them in a left
        // join; this is per-pair work proportional to the pair list,
        // whose size the doc-id hard cap fixes at any corpus scale
        val pairSet = randPairs.select($"id_a", $"id_b").union(candPairs)
          .distinct()
        val szs = meta.select($"doc_id", $"sz", $"ss")
        var df = pairSet
          .join(broadcast(szs.select($"doc_id".as("id_a"), $"sz".as("sza"),
            $"ss".as("ssa"))), Seq("id_a"))
          .join(broadcast(szs.select($"doc_id".as("id_b"), $"sz".as("szb"),
            $"ss".as("ssb"))), Seq("id_b"))
          .select($"sza", $"szb", graft.functions.SketchExpressions
            .hashed_intersect_count($"ssa", $"ssb").as("inter"))
          .select($"inter", ($"sza" + $"szb" - $"inter").as("un"))
          .withColumn("above", $"inter" * 2 >= $"un")
          .withColumn("j1", $"inter".cast("double") / $"un".cast("double"))
        for (e <- Seq(2, 4, 8, 16, 32))
          df = df.withColumn(s"j$e", col(s"j${e / 2}") * col(s"j${e / 2}"))
        for ((b, r) <- lshSplits) {
          df = df.withColumn(s"q${r}_1", lit(1.0) - col(s"j$r"))
          var cur = 1
          while (cur < b) {
            df = df.withColumn(s"q${r}_${cur * 2}",
              col(s"q${r}_$cur") * col(s"q${r}_$cur"))
            cur *= 2
          }
          df = df.withColumn(s"pn_$r",
            round((lit(1.0) - col(s"q${r}_$b")) * 1e9).cast("long"))
        }
        val stackArgs = lshSplits
          .map { case (b, r) => s"$b, $r, pn_$r" }.mkString(", ")
        val ag = df
          .select($"above",
            expr(s"stack(${lshSplits.size}, $stackArgs) as (b, r, pn)"))
          .groupBy($"b", $"r")
          .agg(sum(when($"above", 1L).otherwise(0L)).as("n_above"),
            sum(when($"above", 0L).otherwise(1L)).as("n_below"),
            sum(when($"above", 0L).otherwise($"pn")).as("fp_nano"),
            sum(when($"above", lit(1000000000L) - $"pn").otherwise(0L))
              .as("fn_nano"))
          .withColumn("err_nano", $"fp_nano" + $"fn_nano")
        ag.crossJoin(broadcast(ag.agg(min($"err_nano").as("__m"))))
          .select($"b", $"r", $"n_above", $"n_below", $"fp_nano",
            $"fn_nano", $"err_nano", ($"err_nano" === $"__m").as("chosen"))
          .sortBounded($"b".desc)
      },
      Some(raw"""WITH d0 AS (SELECT doc_id,
            list_filter(regexp_split_to_array(lower(text), '\s+'),
              t -> t <> '') AS toks
          FROM documents WHERE doc_id < 10000),
        sh AS (SELECT doc_id,
            CASE WHEN len(toks) < 3 THEN []
            ELSE list_distinct(list_transform(range(len(toks) - 2),
              i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))
            END AS sset
          FROM d0),
        shn AS (SELECT doc_id, sset FROM sh WHERE len(sset) > 0),
        m0 AS (SELECT doc_id, CAST(len(sset) AS BIGINT) AS sz,
            list_min(list_transform(sset, sg ->
              CAST(('0x' || substr(md5('0:' || sg), 1, 15)) AS BIGINT)))
              AS m0
          FROM shn),
        ex AS (SELECT doc_id, unnest(sset) AS sg FROM shn),
        iv AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            CAST(COUNT(*) AS BIGINT) AS inter
          FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        pk AS (SELECT DISTINCT id_a, id_b FROM (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM m0 a JOIN m0 b
            ON a.doc_id < b.doc_id
            AND a.doc_id % 10 = 0 AND b.doc_id % 10 = 0
          UNION ALL
          SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM m0 a JOIN m0 b
            ON a.m0 = b.m0 AND a.doc_id < b.doc_id)),
        pr AS (SELECT COALESCE(iv.inter, 0) AS inter,
            sa.sz + sb.sz - COALESCE(iv.inter, 0) AS un,
            COALESCE(iv.inter, 0) * 2
              >= sa.sz + sb.sz - COALESCE(iv.inter, 0) AS above
          FROM pk
          JOIN m0 sa ON pk.id_a = sa.doc_id
          JOIN m0 sb ON pk.id_b = sb.doc_id
          LEFT JOIN iv ON pk.id_a = iv.id_a AND pk.id_b = iv.id_b),
        $sCurveCtes,
        st AS (${lshSplits.map { case (b, r) =>
          s"SELECT $b AS b, $r AS r, above, pn_$r AS pn FROM pp"
        }.mkString("\n          UNION ALL ")}),
        ag AS (SELECT b, r,
            CAST(SUM(CASE WHEN above THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
            CAST(SUM(CASE WHEN above THEN 0 ELSE 1 END) AS BIGINT) AS n_below,
            CAST(SUM(CASE WHEN above THEN 0 ELSE pn END) AS BIGINT) AS fp_nano,
            CAST(SUM(CASE WHEN above THEN 1000000000 - pn ELSE 0 END)
              AS BIGINT) AS fn_nano
          FROM st GROUP BY b, r),
        e2 AS (SELECT *, fp_nano + fn_nano AS err_nano FROM ag),
        mn AS (SELECT MIN(err_nano) AS m FROM e2)
        SELECT b, r, n_above, n_below, fp_nano, fn_nano, err_nano,
          err_nano = m AS chosen
        FROM e2 CROSS JOIN mn ORDER BY b DESC""")),

    // ---- composed delta-ingest chain (round 8) -------------------------
    // The production shape for a new data delivery landing next to an
    // already-trained base corpus: exact cross-dedup against the base
    // (the base contributes ONLY its distinct digest set — q60's
    // contract), within-delivery first-occurrence dedup (combinable
    // min + digest-keyed join-back, the skew-safe q20 shape), the
    // Gopher rule gate over the survivors, and the q93 shard manifest
    // of what's left — one lazy plan end-to-end, certified by ONE
    // oracle replaying every stage from the same fragments q20/q60/
    // q103/q93 certify individually.
    QueryDef(
      "q115_delta_ingest",
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
        // null-safe digest (the q60/q73 convention): NULL text hashes
        // as empty instead of propagating a NULL key
        val withH = docs.withColumn("h",
          md5(graft.ops.Dedup.normalize(coalesce($"text", lit("")))))
        val baseD = withH.filter($"doc_id" % 3 === 0)
          .select($"h").distinct()
        val dd = withH.filter($"doc_id" % 3 =!= 0)
          .join(baseD, Seq("h"), "left_anti")
        val firsts = dd.groupBy($"h").agg(min($"doc_id").as("__keep"))
        val survivors = dd.join(firsts, Seq("h"))
          .filter($"doc_id" === $"__keep")
        val gated = graft.ops.Gopher.withRules(survivors, "text")
          .filter($"pass")
        graft.ops.Shards.manifest(gated, "text", "doc_id", nShards = 8)
      },
      Some(raw"""WITH nm AS (SELECT doc_id, text,
            md5(trim(regexp_replace(regexp_replace(lower(coalesce(text, '')),
              '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS h
          FROM documents),
        bd AS (SELECT DISTINCT h FROM nm WHERE doc_id % 3 = 0),
        dd AS (SELECT nm.* FROM nm WHERE doc_id % 3 <> 0
          AND NOT EXISTS (SELECT 1 FROM bd WHERE bd.h = nm.h)),
        fo AS (SELECT h, MIN(doc_id) AS keep_id FROM dd GROUP BY h),
        sv AS (SELECT dd.doc_id, dd.text FROM dd
          JOIN fo ON dd.h = fo.h AND dd.doc_id = fo.keep_id),
        gr AS (SELECT doc_id, text,
            list_filter(regexp_split_to_array(lower(text), '\s+'),
              t -> t <> '') AS toks,
            CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT) AS wl,
            CAST(length(text) - length(replace(text, '#', ''))
              + (length(text) - length(replace(text, '...', ''))) / 3
              AS BIGINT) AS nsym
          FROM sv),
        gv AS (SELECT doc_id, text,
            CAST(len(toks) AS BIGINT) AS n, wl, nsym,
            CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
              AS BIGINT) AS nalpha,
            CAST(len(list_intersect(list_distinct(toks),
              ${sqlList(graft.ops.Gopher.stopwords)})) AS BIGINT) AS nstop
          FROM gr),
        g AS (SELECT doc_id, text FROM gv
          WHERE n >= 50 AND n <= 100000
            AND wl >= 3 * n AND wl <= 10 * n
            AND nalpha * 5 >= n * 4
            AND nstop >= 2
            AND nsym * 10 <= n),
        d AS (SELECT
            CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 8 AS shard,
            doc_id,
            CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
              t -> t <> '')) AS BIGINT) AS tok,
            CAST(length(text) AS BIGINT) AS ch,
            CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS sig
          FROM g)
        SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
          MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id,
          CAST(SUM(tok) AS BIGINT) AS n_tokens,
          CAST(SUM(ch) AS BIGINT) AS n_chars,
          bit_xor(sig) AS content_sig
        FROM d GROUP BY shard ORDER BY shard""")),

    // ---- token-budget selection curve (round 8) ------------------------
    // The data-constrained-scaling question: with a token budget of
    // 20/40/60/80% of the corpus, how many documents survive
    // quality-first selection and where does the quality cut land?
    // Selection = greedy prefix in (entropy DESC, doc_id) order; the
    // cumulative-tokens-before column comes from the two-phase
    // distributed prefix sum (Packing.withRunningBefore over a monotone
    // integer sort key — NO unpartitioned window), the budget test is
    // exact integer cross-multiplication (before*10 < total*f), and the
    // corpus total rides as a broadcast 1-row aggregate. One prefix
    // relation serves all four budgets via an explode + combinable agg.
    QueryDef(
      "q116_budget_curve",
      (s, dir) => {
        import s.implicits._
        val ent = round(element_at(graft.functions.SketchExpressions
          .char_entropy(lower(coalesce($"text", lit("")))), 2), 6)
        val base = table(s, dir, "documents")
          .select($"doc_id",
            regexp_count($"text", lit("\\S+"))
              .cast("long").as("tok"),
            round(ent * 1e6).cast("long").as("em"))
        // sort key monotone with (em DESC, doc_id ASC); headroom contract:
        // em <= 1e7 (entropy <= 10), doc_id < 1e9 — both hold by
        // construction (printable-ASCII entropy < ln(95)≈4.55) and are
        // the documented id-width bound of the q66 shuffle family
        val keyed = base.withColumn("__key",
          (lit(10000000L) - $"em") * 1000000000L + $"doc_id")
        val pre = graft.ops.Packing.withRunningBefore(keyed, "__key",
          "tok", "__before", chunk = 4096L * 1000000000L)
        val tot = base.agg(sum($"tok").as("__tot"))
        pre.crossJoin(broadcast(tot))
          .select($"tok", $"em", $"__before", $"__tot",
            explode(array(lit(2), lit(4), lit(6), lit(8))).as("f10"))
          .filter($"__before" * 10 < $"__tot" * $"f10")
          .groupBy($"f10")
          .agg(count(lit(1)).as("n_selected"),
            sum($"tok").as("tokens_selected"),
            min($"em").as("__cutm"))
          .select(($"f10" * 10).as("budget_pct"), $"n_selected",
            $"tokens_selected", round($"__cutm" / 1e6, 6).as("cut_entropy"))
          .sortBounded($"budget_pct")
      },
      Some(raw"""WITH $entropyCtes,
        base AS (SELECT d.doc_id,
            CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
              t -> t <> '')) AS BIGINT) AS tok,
            CAST(ROUND(COALESCE(e0.ent, 0.0) * 1000000.0) AS BIGINT) AS em
          FROM documents d LEFT JOIN e0 ON d.doc_id = e0.doc_id),
        tb AS (SELECT CAST(SUM(tok) AS BIGINT) AS total FROM base),
        pre AS (SELECT em, tok,
            COALESCE(SUM(tok) OVER (ORDER BY em DESC, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
          FROM base),
        x AS (SELECT f.f10, em, tok
          FROM pre CROSS JOIN tb
          CROSS JOIN (SELECT unnest([2, 4, 6, 8]) AS f10) f
          WHERE bef * 10 < total * f10)
        SELECT CAST(f10 * 10 AS INT) AS budget_pct,
          CAST(COUNT(*) AS BIGINT) AS n_selected,
          CAST(SUM(tok) AS BIGINT) AS tokens_selected,
          ROUND(MIN(em) / 1000000.0, 6) AS cut_entropy
        FROM x GROUP BY f10 ORDER BY budget_pct""")),

    // ---- behavioral funnel over the event stream (round 8) -------------
    // view -> click -> purchase completion per user with a 7-day step
    // horizon: the classic ordered-sequence funnel. ONE user-keyed
    // aggregation collects the first view plus the per-type timestamp
    // lists (combinable; per-user state bounded by that user's events),
    // the chained "first click after the view, first purchase after
    // that click" steps are array folds in the projection, and the
    // report is a single global combinable aggregate. No self-join,
    // no per-user window, timestamps compared as exact epoch-micro
    // BIGINTs in both engines.
    QueryDef(
      "q113_funnel",
      (s, dir) => {
        import s.implicits._
        val ev = JoinQueries.events(s, dir)
          .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
        graft.ops.Funnel.stageTimes(ev, "user_id", "event_type", "us",
            Seq("view", "click", "purchase"),
            horizonMicros = 604800000000L) // 7 days
          .agg(count(lit(1)).as("n_users"),
            count($"t0").as("n_viewed"),
            count($"t1").as("n_clicked"),
            count($"t2").as("n_purchased"),
            sum($"t2" - $"t0").as("__sum"))
          .select($"n_users", $"n_viewed", $"n_clicked", $"n_purchased",
            round($"__sum".cast("double") / $"n_purchased" / 1e6, 3)
              .as("avg_complete_sec"))
      },
      Some(raw"""WITH e AS (SELECT user_id, event_type,
            epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        u AS (SELECT user_id,
            MIN(us) FILTER (WHERE event_type = 'view') AS t1,
            list(us) FILTER (WHERE event_type = 'click') AS bs,
            list(us) FILTER (WHERE event_type = 'purchase') AS cs
          FROM e GROUP BY user_id),
        s2 AS (SELECT user_id, t1, cs,
            list_min(list_filter(bs,
              x -> x > t1 AND x <= t1 + 604800000000)) AS t2 FROM u),
        s3 AS (SELECT user_id, t1, t2,
            list_min(list_filter(cs,
              x -> x > t2 AND x <= t2 + 604800000000)) AS t3 FROM s2)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
          CAST(COUNT(t1) AS BIGINT) AS n_viewed,
          CAST(COUNT(t2) AS BIGINT) AS n_clicked,
          CAST(COUNT(t3) AS BIGINT) AS n_purchased,
          ROUND(CAST(SUM(t3 - t1) AS DOUBLE) / COUNT(t3) / 1000000.0, 3)
            AS avg_complete_sec
        FROM s3"""))
  )
}
