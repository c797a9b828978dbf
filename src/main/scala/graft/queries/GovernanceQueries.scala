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
