package graft.queries

import org.apache.spark.sql.functions._
import QueryDef.table

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

  /** q85's char-entropy CTE chain (printable-ASCII Shannon entropy per
    * doc, round-6): the corpus quality score several governance ops
    * rank on. Kept verbatim so every consumer certifies the SAME
    * number the q74/q82/q85 family already certifies.
    */
  private val entropyCtes = raw"""ch AS (SELECT doc_id,
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
          .orderBy($"source")
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
          .orderBy($"label")
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
        val pre = docs.select($"source",
            explode(graft.functions.SketchExpressions
              .word_shingles($"text", 3)).as("g"))
          .groupBy($"source", $"g").agg(count(lit(1)).as("df"))
        val per = pre.groupBy($"source")
          .agg(count(lit(1)).as("n_distinct"), max($"df").as("top_df"))
        val tot = docs.select($"source",
            greatest(size(filter(split(lower($"text"), "\\s+"),
              t => t =!= "")) - 2, lit(0)).cast("long").as("occ"))
          .groupBy($"source").agg(sum($"occ").as("n_occurrences"))
        tot.join(broadcast(per), Seq("source"))
          .select($"source", $"n_occurrences", $"n_distinct", $"top_df",
            round($"n_distinct".cast("double") / $"n_occurrences", 6)
              .as("diversity"))
          .orderBy($"source")
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
        ex AS (SELECT source, unnest(sset) AS g FROM sh),
        pre AS (SELECT source, g, COUNT(*) AS df FROM ex GROUP BY source, g),
        per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_distinct,
            CAST(MAX(df) AS BIGINT) AS top_df FROM pre GROUP BY source),
        tot AS (SELECT source, CAST(SUM(occ) AS BIGINT) AS n_occurrences
          FROM sh GROUP BY source)
        SELECT source, n_occurrences, n_distinct, top_df,
          ROUND(CAST(n_distinct AS DOUBLE) / n_occurrences, 6) AS diversity
        FROM tot JOIN per USING (source) ORDER BY source""")),

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
        val H = 604800000000L // 7 days in microseconds
        val ev = JoinQueries.events(s, dir)
          .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
        ev.groupBy($"user_id")
          .agg(min(when($"event_type" === "view", $"us")).as("t1"),
            collect_list(when($"event_type" === "click", $"us")).as("bs"),
            collect_list(when($"event_type" === "purchase", $"us")).as("cs"))
          .withColumn("t2",
            array_min(filter($"bs", x => x > $"t1" && x <= $"t1" + lit(H))))
          .withColumn("t3",
            array_min(filter($"cs", x => x > $"t2" && x <= $"t2" + lit(H))))
          .agg(count(lit(1)).as("n_users"),
            count($"t1").as("n_viewed"),
            count($"t2").as("n_clicked"),
            count($"t3").as("n_purchased"),
            sum($"t3" - $"t1").as("__sum"))
          .select($"n_users", $"n_viewed", $"n_clicked", $"n_purchased",
            round($"__sum".cast("double") / $"n_purchased" / 1e6, 3)
              .as("avg_complete_sec"))
      },
      Some(raw"""WITH e AS (SELECT user_id, event_type,
            epoch_us(ts) AS us FROM events),
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
