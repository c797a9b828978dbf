package graft.queries

import org.apache.spark.sql.functions._
import QueryDef.table

/** Round-8 curation/report operators over `documents`: the rule-based
  * document gate (Gopher), training-batch padding economics, sketch
  * calibration, and perplexity bucketing a pipeline runs before
  * committing a corpus to training. All float outputs follow the
  * integer-scaling discipline (compare integers, round only at the
  * edge) so Spark-vs-DuckDB summation order can never break the hash.
  */
object CurationQueries {

  /** Gopher's required-stopword list (Rae et al. 2021, public). */
  private val gopherStops =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private def sqlList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString("[", ", ", "]")

  val defs: Seq[QueryDef] = Seq(
    // ---- Gopher rule gate (round 8) ------------------------------------
    // The full rule-based document filter of the Gopher/MassiveText
    // pipeline, adapted to this corpus: word-count bounds [50, 100k],
    // mean word length in [3, 10], >=80% of words contain a letter,
    // >=2 distinct required stopwords, symbol-to-word ratio ('#'/'...')
    // <= 0.1. EVERY rule decision is integer arithmetic (cross-
    // multiplied thresholds: s >= 3n rather than s/n >= 3.0), so the
    // verdicts are exact in both engines. Scale shape: one projection
    // pass + one map-side-combinable groupBy(source) — no shuffle
    // carries text, a hot source costs per-task partials only.
    QueryDef(
      "q103_gopher_rules",
      (s, dir) => {
        import s.implicits._
        val toks = filter(split(lower($"text"), "\\s+"), t => t =!= "")
        val n = size(toks).cast("long")
        // sum of word lengths == count of non-whitespace chars
        val wl = length(regexp_replace($"text", "\\s+", "")).cast("long")
        val nAlpha = size(filter(toks, t => t.rlike("[a-z]"))).cast("long")
        val nStop = size(array_intersect(array_distinct(toks),
          array(gopherStops.map(lit): _*))).cast("long")
        val nSym = (size(split($"text", "#", -1)) - 1 +
          size(split($"text", "\\.\\.\\.", -1)) - 1).cast("long")
        val rules = table(s, dir, "documents")
          .select($"source",
            (n >= lit(50L) && n <= lit(100000L)).as("r_wordcount"),
            (wl >= n * 3L && wl <= n * 10L).as("r_meanlen"),
            (nAlpha * 5L >= n * 4L).as("r_alpha"),
            (nStop >= lit(2L)).as("r_stop"),
            (nSym * 10L <= n).as("r_symbol"))
        rules.groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(!$"r_wordcount", 1L).otherwise(0L)).as("f_wordcount"),
            sum(when(!$"r_meanlen", 1L).otherwise(0L)).as("f_meanlen"),
            sum(when(!$"r_alpha", 1L).otherwise(0L)).as("f_alpha"),
            sum(when(!$"r_stop", 1L).otherwise(0L)).as("f_stop"),
            sum(when(!$"r_symbol", 1L).otherwise(0L)).as("f_symbol"),
            sum(when($"r_wordcount" && $"r_meanlen" && $"r_alpha" &&
              $"r_stop" && $"r_symbol", 1L).otherwise(0L)).as("n_pass"))
          .orderBy($"source")
      },
      Some(raw"""WITH d AS (SELECT source,
            list_filter(regexp_split_to_array(lower(text), '\s+'),
              t -> t <> '') AS toks,
            CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT) AS wl,
            CAST(length(text) - length(replace(text, '#', ''))
              + (length(text) - length(replace(text, '...', ''))) / 3
              AS BIGINT) AS nsym
          FROM documents),
        r AS (SELECT source,
            CAST(len(toks) AS BIGINT) AS n,
            wl, nsym,
            CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
              AS BIGINT) AS nalpha,
            CAST(len(list_intersect(list_distinct(toks),
              ${sqlList(gopherStops)})) AS BIGINT) AS nstop
          FROM d),
        v AS (SELECT source,
            (n >= 50 AND n <= 100000) AS r_wordcount,
            (wl >= 3 * n AND wl <= 10 * n) AS r_meanlen,
            (nalpha * 5 >= n * 4) AS r_alpha,
            (nstop >= 2) AS r_stop,
            (nsym * 10 <= n) AS r_symbol
          FROM r)
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(CASE WHEN NOT r_wordcount THEN 1 ELSE 0 END) AS BIGINT) AS f_wordcount,
          CAST(SUM(CASE WHEN NOT r_meanlen THEN 1 ELSE 0 END) AS BIGINT) AS f_meanlen,
          CAST(SUM(CASE WHEN NOT r_alpha THEN 1 ELSE 0 END) AS BIGINT) AS f_alpha,
          CAST(SUM(CASE WHEN NOT r_stop THEN 1 ELSE 0 END) AS BIGINT) AS f_stop,
          CAST(SUM(CASE WHEN NOT r_symbol THEN 1 ELSE 0 END) AS BIGINT) AS f_symbol,
          CAST(SUM(CASE WHEN r_wordcount AND r_meanlen AND r_alpha
            AND r_stop AND r_symbol THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
        FROM v GROUP BY source ORDER BY source""")),

    // ---- padding-waste batching report (round 8) -----------------------
    // The batching-economics question a trainer asks before fixing a
    // data-loader policy: at batch size B=16, how many pad tokens does
    // arrival-order batching burn vs length-sorted batching? Each
    // strategy assigns a global position (DistWindow.withGlobalRank —
    // two-phase bucketed rank, NO unpartitioned window), groups rows of
    // 16, and pays n_in_batch * max(n_tokens) padded slots. Outputs one
    // row per strategy; waste_frac is the only float and is a ratio of
    // two exact BIGINTs. Scale shape: rank is bucket-local + broadcast
    // offsets; batch agg is a combinable groupBy(batch).
    QueryDef(
      "q104_padding_waste",
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
          .select($"doc_id",
            size(filter(split($"text", "\\s+"), t => t =!= ""))
              .cast("long").as("n_tokens"))
        def report(tagged: org.apache.spark.sql.DataFrame, name: String) =
          tagged
            .withColumn("batch", floor(($"pos" - 1L) / 16L))
            .groupBy($"batch")
            .agg(count(lit(1)).as("bn"), max($"n_tokens").as("bmax"),
              sum($"n_tokens").as("btok"))
            .agg(count(lit(1)).as("n_batches"),
              sum($"btok").as("sum_tokens"),
              sum($"bn" * $"bmax").as("padded_tokens"))
            .select(lit(name).as("strategy"), $"n_batches", $"sum_tokens",
              $"padded_tokens",
              round(lit(1.0) - $"sum_tokens".cast("double") /
                $"padded_tokens".cast("double"), 6).as("waste_frac"))
        val arrival = graft.ops.DistWindow.withGlobalRank(docs,
          floor($"doc_id" / 65536L).cast("long"), Seq($"doc_id"), "pos")
        // length-sorted: bucket = -n_tokens (monotone with the DESC
        // order); ties stay inside one bucket and break by doc_id
        val sorted = graft.ops.DistWindow.withGlobalRank(docs,
          -$"n_tokens", Seq(-$"n_tokens", $"doc_id"), "pos")
        report(arrival, "arrival").unionAll(report(sorted, "length_sorted"))
          .orderBy($"strategy")
      },
      Some(raw"""WITH toks AS (SELECT doc_id,
            CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
              t -> t <> '')) AS BIGINT) AS n_tokens
          FROM documents),
        a AS (SELECT n_tokens, (ROW_NUMBER() OVER (ORDER BY doc_id) - 1)
            // 16 AS batch FROM toks),
        sA AS (SELECT batch, COUNT(*) AS bn, MAX(n_tokens) AS bmax,
            SUM(n_tokens) AS btok FROM a GROUP BY batch),
        b AS (SELECT n_tokens, (ROW_NUMBER() OVER
              (ORDER BY n_tokens DESC, doc_id) - 1) // 16 AS batch
          FROM toks),
        sB AS (SELECT batch, COUNT(*) AS bn, MAX(n_tokens) AS bmax,
            SUM(n_tokens) AS btok FROM b GROUP BY batch),
        rA AS (SELECT 'arrival' AS strategy,
            CAST(COUNT(*) AS BIGINT) AS n_batches,
            CAST(SUM(btok) AS BIGINT) AS sum_tokens,
            CAST(SUM(bn * bmax) AS BIGINT) AS padded_tokens FROM sA),
        rB AS (SELECT 'length_sorted' AS strategy,
            CAST(COUNT(*) AS BIGINT) AS n_batches,
            CAST(SUM(btok) AS BIGINT) AS sum_tokens,
            CAST(SUM(bn * bmax) AS BIGINT) AS padded_tokens FROM sB),
        u AS (SELECT * FROM rA UNION ALL SELECT * FROM rB)
        SELECT strategy, n_batches, sum_tokens, padded_tokens,
          ROUND(1.0 - CAST(sum_tokens AS DOUBLE)
            / CAST(padded_tokens AS DOUBLE), 6) AS waste_frac
        FROM u ORDER BY strategy"""))
  )
}
