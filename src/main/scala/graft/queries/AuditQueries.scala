package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QueryDef.{table, BoundedSort}
import graft.functions.SketchExpressions

/** Round-8 corpus-audit operators: the measurement layer a pipeline
  * runs around its curation decisions — quality-aware dedup, exact
  * stratified splits, classifier calibration, distribution drift,
  * mixture planning, cross-corpus containment, and the vocabulary /
  * duplicate-structure telemetry reports. Same discipline as the
  * governance group: rank and threshold on exact integers, round
  * floats once at the edge, keep every aggregation map-side
  * combinable, and broadcast nothing but 1-row or sources-sized
  * tables.
  */
object AuditQueries {

  private def sqlList(ws: Seq[String]) =
    ws.map(w => s"'$w'").mkString("[", ", ", "]")

  /** Token count under the corpus tokenization (q116/q93 fragment). */
  private def tokLen(c: org.apache.spark.sql.Column) =
    regexp_count(c, lit("\\S+")).cast("long")

  private val tokLenSql = raw"""len(list_filter(
    regexp_split_to_array(text, '\s+'), t -> t <> ''))"""

  /** Winnowing fingerprint CTE chain (q70's certified fragments) with
    * `source` carried through for per-source rollups.
    */
  private val winnowCtes = raw"""t AS (SELECT doc_id, source,
            list_filter(regexp_split_to_array(lower(text), '\s+'),
              x -> x <> '') AS toks
          FROM documents),
        hsrc AS (SELECT doc_id, source,
            list_transform(range(1, len(toks) - 1),
              i -> substr(md5(array_to_string(
                list_slice(toks, i, i + 2), ' ')), 1, 16)) AS hs
          FROM t WHERE len(toks) >= 3),
        fpt AS (SELECT doc_id, source,
            unnest(list_distinct(list_transform(
              range(1, GREATEST(1, len(hs) - 3) + 1),
              i -> list_min(list_slice(hs, i, i + 3))))) AS fp
          FROM hsrc)"""

  val defs: Seq[QueryDef] = Seq(
    // ---- quality-aware exact dedup (round 8) ---------------------------
    // q20 keeps the FIRST occurrence per normalized digest; a curation
    // pipeline usually wants the BEST one (highest quality score, here
    // the certified q74/q85 char entropy). Same skew-safe shape as the
    // r7 dedup family: ONE corpus scan feeding ONE map-side-combinable
    // max_by aggregation keyed on (entropy-micro, -doc_id) — a digest
    // duplicated a million times costs each task one partial row, never
    // a digest-partitioned window. The quality key is an exact BIGINT
    // so the winner is engine-deterministic.
    QueryDef(
      "q117_dedup_best",
      (s, dir) => {
        import s.implicits._
        val ent = round(element_at(SketchExpressions
          .char_entropy(lower(coalesce($"text", lit("")))), 2), 6)
        val base = table(s, dir, "documents")
          .select($"doc_id", $"source", $"text",
            round(ent * 1e6).cast("long").as("em"))
        graft.ops.Dedup.exactBest(base, "text", "doc_id", "em",
            countCol = Some("n_dups"))
          .select($"doc_id", $"source", round($"em" / 1e6, 6).as("entropy"),
            $"n_dups")
          .orderBy($"doc_id")
      },
      Some(raw"""WITH ${GovernanceQueries.entropyCtes},
        base AS (SELECT d.doc_id, d.source,
            md5(trim(regexp_replace(regexp_replace(lower(coalesce(text, '')),
              '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS h,
            CAST(ROUND(COALESCE(e0.ent, 0.0) * 1000000.0) AS BIGINT) AS em
          FROM documents d LEFT JOIN e0 ON d.doc_id = e0.doc_id),
        rk AS (SELECT *,
            ROW_NUMBER() OVER (PARTITION BY h ORDER BY em DESC, doc_id)
              AS r,
            COUNT(*) OVER (PARTITION BY h) AS c
          FROM base)
        SELECT doc_id, source, ROUND(em / 1000000.0, 6) AS entropy,
          CAST(c AS BIGINT) AS n_dups
        FROM rk WHERE r = 1 ORDER BY doc_id""")),

    // ---- exact stratified train/val/test split (round 8) ---------------
    // Per (lang, source) stratum: 80/10/10 by deterministic hash order,
    // EXACT proportions (rank inequalities in integer arithmetic, no
    // float rates — a 9-doc stratum gets 7/1/1, reproducibly). Ranking
    // is DistWindow.withGroupedRank partitioned by (stratum, hash
    // bucket): no task serializes a whole stratum, the per-bucket
    // offsets ride a broadcast prefix sum over the tiny count table.
    QueryDef(
      "q118_strat_split",
      (s, dir) => {
        import s.implicits._
        graft.ops.Splits.stratified(
            table(s, dir, "documents")
              .select($"doc_id", $"lang", $"source", $"n_chars"),
            Seq("lang", "source"), "doc_id")
          .groupBy($"lang", $"source", $"split")
          .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"))
          .sortBounded($"lang", $"source", $"split")
      },
      Some(raw"""WITH b AS (SELECT doc_id, lang, source, n_chars,
            md5(CAST(doc_id AS VARCHAR)) AS hk
          FROM documents),
        rk AS (SELECT *,
            ROW_NUMBER() OVER (PARTITION BY lang, source
              ORDER BY hk, doc_id) AS r,
            COUNT(*) OVER (PARTITION BY lang, source) AS n
          FROM b),
        s AS (SELECT lang, source,
            CASE WHEN r * 100 <= n * 80 THEN 'train'
              WHEN r * 100 <= n * 90 THEN 'validation'
              ELSE 'test' END AS split,
            n_chars
          FROM rk)
        SELECT lang, source, split, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM s GROUP BY lang, source, split
        ORDER BY lang, source, split""")),

    // ---- classifier calibration report (round 8) -----------------------
    // Reliability diagram over the certified q81 Naive Bayes quality
    // scores: bucket the log-likelihood ratio into integer bins, report
    // per-bin count, positive count, prediction accuracy and mean score
    // — the "is the filter's confidence honest" audit run before a
    // score threshold is turned into a keep/drop policy. Scores are the
    // round-6 fixed-point values, so sums ride exact micro-unit BIGINTs
    // and the only floats are the two per-bin edge divisions.
    QueryDef(
      "q119_calibration",
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
        // the label rides the cached scoring projection (carry) — no
        // corpus-sized self-join on doc_id
        val scored = graft.ops.NaiveBayes.trainScore(docs, "text",
          when($"lang" === "en", 1.0).otherwise(0.0), dims = 256,
          carry = Seq("lang"))
        scored.withColumn("y", $"lang" === "en")
          .select(
            least(greatest(floor($"nb_score").cast("long"), lit(-5L)),
              lit(5L)).as("bin"),
            round($"nb_score" * 1e6).cast("long").as("sm"),
            $"y", $"pred_en")
          .groupBy($"bin")
          .agg(count(lit(1)).as("n"),
            sum(when($"y", 1L).otherwise(0L)).as("n_pos"),
            sum(when($"pred_en" === $"y", 1L).otherwise(0L))
              .as("n_correct"),
            sum($"sm").as("__sm"))
          .select($"bin", $"n", $"n_pos", $"n_correct",
            round($"__sm".cast("double") / $"n" / 1e6, 6).as("mean_score"),
            round($"n_correct".cast("double") / $"n", 6).as("accuracy"))
          .sortBounded($"bin")
      },
      Some(raw"""WITH ${CorpusQueries.nbScoreCtes},
        j AS (SELECT sc.doc_id, ROUND(s, 6) AS sco, ROUND(s, 6) > 0 AS p,
            lang = 'en' AS y
          FROM sc JOIN documents USING (doc_id)),
        b AS (SELECT
            LEAST(GREATEST(CAST(FLOOR(sco) AS BIGINT), -5), 5) AS bin,
            CAST(ROUND(sco * 1000000.0) AS BIGINT) AS sm, y, p
          FROM j),
        ag AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
            CAST(SUM(CASE WHEN p = y THEN 1 ELSE 0 END) AS BIGINT)
              AS n_correct,
            CAST(SUM(sm) AS BIGINT) AS smt
          FROM b GROUP BY bin)
        SELECT bin, n, n_pos, n_correct,
          ROUND(CAST(smt AS DOUBLE) / n / 1000000.0, 6) AS mean_score,
          ROUND(CAST(n_correct AS DOUBLE) / n, 6) AS accuracy
        FROM ag ORDER BY bin""")),

    // ---- two-sample KS drift over token lengths (round 8) --------------
    // The distribution-shift alarm on a SHAPE statistic (q97 compares
    // term distributions; this compares the length distribution): exact
    // two-sample Kolmogorov–Smirnov between slice A (doc_id%3=0, "the
    // old crawl") and slice B. The corpus collapses to a length
    // histogram by ONE combinable aggregation; the CDF prefix runs over
    // that tiny histogram only (bounded by max document length, never
    // corpus-sized), and the KS sup is an exact cross-multiplied BIGINT
    // — the single float division happens once in the report row.
    QueryDef(
      "q120_ks_drift",
      (s, dir) => {
        import s.implicits._
        val base = table(s, dir, "documents")
          .select(($"doc_id" % 3 === 0).as("a"), tokLen($"text").as("len"))
        val hist = base.groupBy($"len")
          .agg(sum(when($"a", 1L).otherwise(0L)).as("na"),
            sum(when($"a", 0L).otherwise(1L)).as("nb"))
        // histogram-sized table: the pmod partition is the point (one
        // group), matching the DistWindow offset-table idiom
        val w = Window.partitionBy(pmod($"len", lit(1))).orderBy($"len")
        val cum = hist
          .withColumn("ca", sum($"na").over(w))
          .withColumn("cb", sum($"nb").over(w))
        val tot = base.agg(
          sum(when($"a", 1L).otherwise(0L)).as("__na"),
          sum(when($"a", 0L).otherwise(1L)).as("__nb"))
        val d = cum.crossJoin(broadcast(tot))
          .withColumn("d", abs($"ca" * $"__nb" - $"cb" * $"__na"))
        val mx = d.agg(max($"d").as("__mx"))
        d.crossJoin(broadcast(mx)).filter($"d" === $"__mx")
          .agg(max($"__na").as("n_a"), max($"__nb").as("n_b"),
            max($"d").as("__d"), min($"len").as("ks_at_len"))
          .select($"n_a", $"n_b",
            round($"__d".cast("double") / $"n_a" / $"n_b", 6).as("ks_stat"),
            $"ks_at_len")
      },
      Some(raw"""WITH base AS (SELECT doc_id % 3 = 0 AS a,
            CAST($tokLenSql AS BIGINT) AS len
          FROM documents),
        hist AS (SELECT len,
            CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS na,
            CAST(SUM(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS nb
          FROM base GROUP BY len),
        cum AS (SELECT len,
            SUM(na) OVER (ORDER BY len) AS ca,
            SUM(nb) OVER (ORDER BY len) AS cb
          FROM hist),
        tot AS (SELECT
            CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS tna,
            CAST(SUM(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS tnb
          FROM base),
        d AS (SELECT len, ABS(ca * tnb - cb * tna) AS d, tna, tnb
          FROM cum CROSS JOIN tot),
        mx AS (SELECT MAX(d) AS m FROM d)
        SELECT MAX(tna) AS n_a, MAX(tnb) AS n_b,
          ROUND(CAST(MAX(d) AS DOUBLE) / MAX(tna) / MAX(tnb), 6) AS ks_stat,
          MIN(len) AS ks_at_len
        FROM d CROSS JOIN mx WHERE d = m""")),

    // ---- mixture-weighted sampling plan (round 8) ----------------------
    // The Dolma/Pile mixing step made concrete: given per-source
    // available tokens, a 50%-of-corpus token budget, and a 30% cap on
    // any single source's weight, emit each source's target tokens,
    // sampling rate and upsample flag. Weights stay exact BIGINT
    // deci-tokens (LEAST(avail*10, total*3)); the only floats are the
    // target projection and the rate, each a single pinned-order op
    // chain both engines execute identically. Everything rides 1-row /
    // sources-sized broadcasts off ONE combinable corpus aggregation.
    QueryDef(
      "q121_mix_plan",
      (s, dir) => {
        import s.implicits._
        val avail = table(s, dir, "documents")
          .select($"source", tokLen($"text").as("tok"))
          .groupBy($"source").agg(sum($"tok").as("avail_tokens"))
        val tot = avail.agg(sum($"avail_tokens").as("__t"))
        val w = avail.crossJoin(broadcast(tot))
          .withColumn("w", least($"avail_tokens" * 10, $"__t" * 3))
        val sw = w.agg(sum($"w").as("__w"))
        w.crossJoin(broadcast(sw))
          .withColumn("target_tokens",
            round($"__t".cast("double") * 0.5 * $"w" / $"__w").cast("long"))
          .select($"source", $"avail_tokens", $"target_tokens",
            round(least(lit(1.0),
              $"target_tokens".cast("double") / $"avail_tokens"), 6)
              .as("rate"),
            ($"target_tokens" > $"avail_tokens").as("upsample"))
          .sortBounded($"source")
      },
      Some(raw"""WITH a AS (SELECT source,
            CAST(SUM($tokLenSql) AS BIGINT) AS avail
          FROM documents GROUP BY source),
        t AS (SELECT CAST(SUM(avail) AS BIGINT) AS tt FROM a),
        w AS (SELECT source, avail, LEAST(avail * 10, tt * 3) AS w, tt
          FROM a CROSS JOIN t),
        sw AS (SELECT CAST(SUM(w) AS BIGINT) AS ww FROM w),
        x AS (SELECT source, avail,
            CAST(ROUND(CAST(tt AS DOUBLE) * 0.5 * w / ww) AS BIGINT)
              AS target
          FROM w CROSS JOIN sw)
        SELECT source, avail AS avail_tokens, target AS target_tokens,
          ROUND(LEAST(1.0, CAST(target AS DOUBLE) / avail), 6) AS rate,
          target > avail AS upsample
        FROM x ORDER BY source""")),

    // ---- cross-corpus winnowing containment (round 8) ------------------
    // MOSS-style containment screening: what fraction of each new
    // document's winnowing fingerprints (the certified q70 kernel)
    // already exist in the base corpus' fingerprint set? The base
    // contributes ONLY its distinct fingerprints (the q60 contract);
    // the membership probe is one hash equi-join on the fingerprint
    // digest, flagging is integer cross-multiplication (hits*2 >= fps),
    // and only fingerprints — never documents — cross the wire.
    QueryDef(
      "q122_winnow_contain",
      (s, dir) => {
        import s.implicits._
        // kernel-stage parallelism (r17): the winnow fingerprint kernel
        // would otherwise run on the single-row-group scan's one core
        val fps = graft.ops.Par.spread(table(s, dir, "documents"), $"doc_id")
          .select($"doc_id", $"source",
            explode(SketchExpressions.winnow($"text", 3, 4)).as("fp"))
        val aset = fps.filter($"doc_id" % 3 === 0)
          .select($"fp".as("afp")).distinct()
        val perDoc = fps.filter($"doc_id" % 3 =!= 0)
          .join(aset, $"fp" === $"afp", "left")
          .groupBy($"doc_id", $"source")
          .agg(count(lit(1)).as("n_fp"),
            sum(when($"afp".isNotNull, 1L).otherwise(0L)).as("n_hit"))
        perDoc.groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when($"n_hit" * 2 >= $"n_fp", 1L).otherwise(0L))
              .as("n_flagged"),
            sum($"n_hit").as("__h"), sum($"n_fp").as("__f"))
          .select($"source", $"n_docs", $"n_flagged",
            round($"__h".cast("double") / $"__f", 6).as("containment"))
          .sortBounded($"source")
      },
      Some(raw"""WITH $winnowCtes,
        aset AS (SELECT DISTINCT fp FROM fpt WHERE doc_id % 3 = 0),
        pd AS (SELECT f.doc_id, f.source, COUNT(*) AS n_fp,
            COUNT(a.fp) AS n_hit
          FROM fpt f LEFT JOIN aset a ON f.fp = a.fp
          WHERE f.doc_id % 3 <> 0
          GROUP BY f.doc_id, f.source)
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(CASE WHEN n_hit * 2 >= n_fp THEN 1 ELSE 0 END)
            AS BIGINT) AS n_flagged,
          ROUND(CAST(SUM(n_hit) AS DOUBLE) / SUM(n_fp), 6) AS containment
        FROM pd GROUP BY source ORDER BY source""")),

    // ---- character-class profile (round 8) -----------------------------
    // Per-source letter/digit/whitespace/other fractions — the cheap
    // encoding-junk detector (mojibake, binary spill, markup floods
    // show up as an "other" spike long before a model-based quality
    // score runs). Pure projection + ONE combinable aggregation; class
    // counts via codegen regexp length-deltas with explicit character
    // classes so both engines count the same bytes.
    QueryDef(
      "q123_charclass",
      (s, dir) => {
        import s.implicits._
        val lt = lower(coalesce($"text", lit("")))
        val base = table(s, dir, "documents").select($"source",
          length(lt).cast("long").as("nt"),
          (length(lt) - length(regexp_replace(lt, "[a-z]", "")))
            .cast("long").as("nl"),
          (length(lt) - length(regexp_replace(lt, "[0-9]", "")))
            .cast("long").as("nd"),
          (length(lt) - length(regexp_replace(lt, "[ \\t\\n\\r]", "")))
            .cast("long").as("ns"))
        base.groupBy($"source")
          .agg(sum($"nt").as("n_chars"), sum($"nl").as("__l"),
            sum($"nd").as("__d"), sum($"ns").as("__s"))
          .select($"source", $"n_chars",
            round($"__l".cast("double") / $"n_chars", 6).as("letter_frac"),
            round($"__d".cast("double") / $"n_chars", 6).as("digit_frac"),
            round($"__s".cast("double") / $"n_chars", 6).as("space_frac"),
            round(($"n_chars" - $"__l" - $"__d" - $"__s").cast("double")
              / $"n_chars", 6).as("other_frac"))
          .sortBounded($"source")
      },
      Some(raw"""WITH b AS (SELECT source,
            CAST(length(lt) AS BIGINT) AS nt,
            CAST(length(lt) - length(regexp_replace(lt, '[a-z]', '', 'g'))
              AS BIGINT) AS nl,
            CAST(length(lt) - length(regexp_replace(lt, '[0-9]', '', 'g'))
              AS BIGINT) AS nd,
            CAST(length(lt) - length(regexp_replace(lt, '[ \t\n\r]', '', 'g'))
              AS BIGINT) AS ns
          FROM (SELECT source, lower(COALESCE(text, '')) AS lt
            FROM documents)),
        ag AS (SELECT source, CAST(SUM(nt) AS BIGINT) AS n_chars,
            CAST(SUM(nl) AS BIGINT) AS l, CAST(SUM(nd) AS BIGINT) AS d,
            CAST(SUM(ns) AS BIGINT) AS sp
          FROM b GROUP BY source)
        SELECT source, n_chars,
          ROUND(CAST(l AS DOUBLE) / n_chars, 6) AS letter_frac,
          ROUND(CAST(d AS DOUBLE) / n_chars, 6) AS digit_frac,
          ROUND(CAST(sp AS DOUBLE) / n_chars, 6) AS space_frac,
          ROUND(CAST(n_chars - l - d - sp AS DOUBLE) / n_chars, 6)
            AS other_frac
        FROM ag ORDER BY source""")),

    // ---- exact grouped length percentiles (round 8) --------------------
    // Per-language p50/p90/p99 token length, EXACT (the SLO numbers a
    // context-window decision is made on — approx quantiles drift
    // exactly where the tail matters). Lengths collapse to a
    // (lang, len) COUNT HISTOGRAM with one combinable aggregation —
    // token length is domain-bounded, so the histogram doesn't grow
    // with corpus size — and DistWindow.histCeilRanks picks all three
    // percentiles from one per-language window over it, at the same
    // ceil-rank position r = ceil(n*p/100) the oracle's
    // r*100 >= n*p AND (r-1)*100 < n*p inequality selects (an id
    // tie-break never changes which VALUE sits at a position).
    QueryDef(
      "q124_len_pcts",
      (s, dir) => {
        import s.implicits._
        val lh = table(s, dir, "documents")
          .select($"lang", tokLen($"text").as("len"))
          .groupBy($"lang", $"len").agg(count(lit(1)).as("c"))
        graft.ops.DistWindow.histCeilRanks(lh, $"lang", $"len", $"c",
            Seq(50, 90, 99), "lang", "p", "len_at", "n_docs")
          .select($"lang", $"p", $"n_docs", $"len_at")
          .sortBounded($"lang", $"p")
      },
      Some(raw"""WITH base AS (SELECT lang, doc_id,
            CAST($tokLenSql AS BIGINT) AS len
          FROM documents),
        rk AS (SELECT lang, len,
            ROW_NUMBER() OVER (PARTITION BY lang ORDER BY len, doc_id)
              AS r,
            COUNT(*) OVER (PARTITION BY lang) AS n
          FROM base),
        x AS (SELECT lang, r, len, n, p.p
          FROM rk CROSS JOIN (SELECT unnest([50, 90, 99]) AS p) p
          WHERE r * 100 >= n * p.p AND (r - 1) * 100 < n * p.p)
        SELECT lang, p, CAST(MAX(n) AS BIGINT) AS n_docs,
          MIN(len) AS len_at
        FROM x GROUP BY lang, p ORDER BY lang, p""")),

    // ---- vocabulary coverage curve (round 8) ---------------------------
    // Tokenizer sizing: the smallest frequency-ranked vocabulary
    // covering 80/90/95/99% of corpus token mass. Term counts off the
    // term_counts kernel (one combinable aggregation, vocab-sized
    // output); the frequency rank is the two-phase global rank on the
    // monotone (-count, term) key and the cumulative mass is the
    // distributed exclusive prefix sum over that rank — no
    // unpartitioned window anywhere, while the oracle replays both
    // with textbook global windows. Coverage tests are exact integer
    // cross-multiplication; one prefix relation serves all four
    // levels.
    QueryDef(
      "q125_vocab_curve",
      (s, dir) =>
        graft.ops.Vocab.coverageCurve(table(s, dir, "documents"), "text"),
      Some(raw"""WITH terms AS (SELECT
            unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
              t -> t <> '')) AS term
          FROM documents),
        tc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM terms GROUP BY term),
        rk AS (SELECT term, cnt,
            ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS r,
            COALESCE(SUM(cnt) OVER (ORDER BY cnt DESC, term
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS bef
          FROM tc),
        t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tt FROM tc),
        x AS (SELECT p.p, r, bef + cnt AS cum, tt
          FROM rk CROSS JOIN t
          CROSS JOIN (SELECT unnest([80, 90, 95, 99]) AS p) p
          WHERE (bef + cnt) * 100 >= tt * p.p)
        SELECT CAST(p AS INT) AS coverage_pct,
          CAST(MIN(r) AS BIGINT) AS vocab_size,
          CAST(MIN(cum) AS BIGINT) AS tokens_covered,
          CAST(MAX(tt) AS BIGINT) AS total_tokens
        FROM x GROUP BY p ORDER BY coverage_pct""")),

    // ---- duplicate-cluster size histogram (round 8) --------------------
    // Dedup telemetry: the size distribution of exact-duplicate groups
    // (how much of the corpus is singletons vs a few mega-clusters —
    // the number that decides whether dedup is worth a pass and which
    // strategy survives the skew). Two chained combinable aggregations;
    // buckets are integer CASE ranges so both engines bin identically.
    QueryDef(
      "q126_dupsize_hist",
      (s, dir) => {
        import s.implicits._
        val sizes = table(s, dir, "documents")
          .groupBy(md5(graft.ops.Dedup.normalize($"text")).as("h"))
          .agg(count(lit(1)).as("c"))
        sizes.select(
            when($"c" === 1, 0).when($"c" === 2, 1).when($"c" <= 4, 2)
              .when($"c" <= 8, 3).when($"c" <= 16, 4).otherwise(5)
              .as("bucket_id"),
            $"c")
          .groupBy($"bucket_id")
          .agg(count(lit(1)).as("n_groups"), sum($"c").as("n_docs"))
          .withColumn("bucket",
            element_at(array(lit("1"), lit("2"), lit("3-4"), lit("5-8"),
              lit("9-16"), lit("17+")), $"bucket_id" + 1))
          .select($"bucket_id", $"bucket", $"n_groups", $"n_docs")
          .sortBounded($"bucket_id")
      },
      Some(raw"""WITH g AS (SELECT
            md5(trim(regexp_replace(regexp_replace(lower(text),
              '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS h,
            CAST(COUNT(*) AS BIGINT) AS c
          FROM documents GROUP BY 1),
        b AS (SELECT CASE WHEN c = 1 THEN 0 WHEN c = 2 THEN 1
            WHEN c <= 4 THEN 2 WHEN c <= 8 THEN 3 WHEN c <= 16 THEN 4
            ELSE 5 END AS bucket_id, c
          FROM g)
        SELECT bucket_id,
          ['1', '2', '3-4', '5-8', '9-16', '17+'][bucket_id + 1] AS bucket,
          CAST(COUNT(*) AS BIGINT) AS n_groups,
          CAST(SUM(c) AS BIGINT) AS n_docs
        FROM b GROUP BY bucket_id ORDER BY bucket_id""")),

    // ---- context-window truncation loss curve (round 8) ----------------
    // What fraction of corpus tokens is lost truncating every document
    // at L ∈ {32, 64, 128, 256}? The counterpart of q104's padding
    // waste: padding argues for SHORTER windows, truncation loss for
    // LONGER — this pair is the context-length decision. One projection
    // + explode(limits) + ONE combinable aggregation; the loss fraction
    // is the single float division, rounded once.
    QueryDef(
      "q127_trunc_loss",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "documents")
          .select(tokLen($"text").as("tok"))
          .select($"tok", explode(array(lit(32L), lit(64L), lit(128L),
            lit(256L))).as("limit"))
          .groupBy($"limit")
          .agg(count(lit(1)).as("n_docs"),
            sum(when($"tok" > $"limit", 1L).otherwise(0L))
              .as("n_truncated"),
            sum($"tok").as("tokens_total"),
            sum(least($"tok", $"limit")).as("tokens_kept"))
          .select($"limit", $"n_docs", $"n_truncated", $"tokens_total",
            $"tokens_kept",
            round(($"tokens_total" - $"tokens_kept").cast("double")
              / $"tokens_total", 6).as("loss_frac"))
          .sortBounded($"limit")
      },
      Some(raw"""WITH base AS (SELECT CAST($tokLenSql AS BIGINT) AS tok
          FROM documents),
        x AS (SELECT tok, l.l AS lim
          FROM base CROSS JOIN (SELECT unnest([32, 64, 128, 256]) AS l) l),
        ag AS (SELECT lim, CAST(COUNT(*) AS BIGINT) AS n_docs,
            CAST(SUM(CASE WHEN tok > lim THEN 1 ELSE 0 END) AS BIGINT)
              AS n_truncated,
            CAST(SUM(tok) AS BIGINT) AS tokens_total,
            CAST(SUM(LEAST(tok, lim)) AS BIGINT) AS tokens_kept
          FROM x GROUP BY lim)
        SELECT CAST(lim AS BIGINT) AS "limit", n_docs, n_truncated,
          tokens_total, tokens_kept,
          ROUND(CAST(tokens_total - tokens_kept AS DOUBLE) / tokens_total,
            6) AS loss_frac
        FROM ag ORDER BY "limit" """)),

    // ---- pairwise source fingerprint overlap (round 8) -----------------
    // Which sources share content? The q122 containment screen asks
    // "is this NEW doc already in the base"; this asks the governance
    // question "which pairs of my sources overlap and how much" —
    // mirror-site detection before mixture weights are set. Distinct
    // (source, fp) pairs off the certified q70 winnowing kernel, a
    // fingerprint-keyed self-join whose per-key blowup is bounded by
    // #sources² (never doc-count), and per-source totals ride a
    // broadcast sources-sized table. Jaccard rounds once.
    QueryDef(
      "q128_source_overlap",
      (s, dir) => {
        import s.implicits._
        val fps = graft.ops.Par.spread(table(s, dir, "documents"), $"doc_id")
          .select($"source",
            explode(SketchExpressions.winnow($"text", 3, 4)).as("fp"))
          .distinct()
        val shared = fps.as("x").join(fps.as("y"),
            col("x.fp") === col("y.fp") &&
              col("x.source") < col("y.source"))
          .groupBy(col("x.source").as("src_a"),
            col("y.source").as("src_b"))
          .agg(count(lit(1)).as("shared"))
        val totals = fps.groupBy($"source").agg(count(lit(1)).as("nf"))
        shared
          .join(broadcast(totals.select($"source".as("src_a"),
            $"nf".as("na"))), Seq("src_a"))
          .join(broadcast(totals.select($"source".as("src_b"),
            $"nf".as("nb"))), Seq("src_b"))
          .select($"src_a", $"src_b", $"shared", $"na", $"nb",
            round($"shared".cast("double") / ($"na" + $"nb" - $"shared"),
              6).as("jaccard"))
          .sortBounded($"src_a", $"src_b")
      },
      Some(raw"""WITH $winnowCtes,
        sf AS (SELECT DISTINCT source, fp FROM fpt),
        sh AS (SELECT x.source AS src_a, y.source AS src_b,
            CAST(COUNT(*) AS BIGINT) AS shared
          FROM sf x JOIN sf y ON x.fp = y.fp AND x.source < y.source
          GROUP BY 1, 2),
        tots AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS nf
          FROM sf GROUP BY source)
        SELECT src_a, src_b, shared, ta.nf AS na, tb.nf AS nb,
          ROUND(CAST(shared AS DOUBLE) / (ta.nf + tb.nf - shared), 6)
            AS jaccard
        FROM sh JOIN tots ta ON sh.src_a = ta.source
        JOIN tots tb ON sh.src_b = tb.source
        ORDER BY src_a, src_b""")),

    // ---- embedding sanity report (round 8) -----------------------------
    // The cheap pre-flight before any vector op: per label — count,
    // zero-norm vectors (dead encoder outputs), and the norm
    // distribution (min/mean/max). Each vector's L2 norm is computed by
    // the same left-fold sum both engines execute in array order and
    // rounded ONCE to micro units, so min/max/mean all ride exact
    // BIGINTs. One zero-shuffle projection + ONE combinable agg.
    QueryDef(
      "q129_embed_sanity",
      (s, dir) => {
        import s.implicits._
        val nu = round(sqrt(aggregate(
            transform($"embedding", x => x.cast("double") * x.cast("double")),
            lit(0.0), (acc, x) => acc + x)) * 1e6).cast("long")
        table(s, dir, "embeddings")
          .select($"label", nu.as("nu"))
          .groupBy($"label")
          .agg(count(lit(1)).as("n_vecs"),
            sum(when($"nu" === 0L, 1L).otherwise(0L)).as("n_zero"),
            min($"nu").as("__mn"), max($"nu").as("__mx"),
            sum($"nu").as("__sm"))
          .select($"label", $"n_vecs", $"n_zero",
            round($"__mn" / 1e6, 6).as("min_norm"),
            round($"__sm".cast("double") / $"n_vecs" / 1e6, 6)
              .as("mean_norm"),
            round($"__mx" / 1e6, 6).as("max_norm"))
          .sortBounded($"label")
      },
      Some(raw"""WITH v AS (SELECT label,
            CAST(ROUND(SQRT(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * 1000000.0)
              AS BIGINT) AS nu
          FROM embeddings),
        ag AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
            CAST(SUM(CASE WHEN nu = 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_zero,
            MIN(nu) AS mn, MAX(nu) AS mx, CAST(SUM(nu) AS BIGINT) AS sm
          FROM v GROUP BY label)
        SELECT label, n_vecs, n_zero,
          ROUND(mn / 1000000.0, 6) AS min_norm,
          ROUND(CAST(sm AS DOUBLE) / n_vecs / 1000000.0, 6) AS mean_norm,
          ROUND(mx / 1000000.0, 6) AS max_norm
        FROM ag ORDER BY label""")),

    // ---- feature-hash collision audit (round 8) ------------------------
    // The q75/q78/q81 trainers hash terms into 256 feature buckets; a
    // pathologically loaded bucket silently degrades every model built
    // on it. Report the 10 most-loaded buckets (distinct terms + total
    // occurrences) under the exact q81 hash formula. Vocab-sized
    // combinable count (the q125 shape) → 256-row bucket agg → bounded
    // TakeOrdered: nothing corpus-sized crosses the wire.
    QueryDef(
      "q130_hash_audit",
      (s, dir) => {
        import s.implicits._
        val tc = table(s, dir, "documents")
          .select(explode(SketchExpressions
            .term_counts(coalesce($"text", lit("")))).as("t"))
          .groupBy($"t.term".as("term")).agg(sum($"t.tf").as("cnt"))
        tc.select(
            (conv(substring(md5($"term"), 1, 6), 16, 10).cast("long")
              % 256).as("f"), $"cnt")
          .groupBy($"f")
          .agg(count(lit(1)).as("n_terms"), sum($"cnt").as("total_tf"))
          .orderBy($"n_terms".desc, $"f")
          .limit(10)
      },
      Some(raw"""WITH terms AS (SELECT
            unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
              t -> t <> '')) AS term
          FROM documents),
        tc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM terms GROUP BY term),
        fx AS (SELECT
            CAST(('0x' || substr(md5(term), 1, 6)) AS BIGINT) % 256 AS f,
            cnt
          FROM tc),
        ag AS (SELECT f, CAST(COUNT(*) AS BIGINT) AS n_terms,
            CAST(SUM(cnt) AS BIGINT) AS total_tf
          FROM fx GROUP BY f)
        SELECT f, n_terms, total_tf FROM ag
        ORDER BY n_terms DESC, f LIMIT 10""")),

    // ---- shard-manifest rollup certification (round 8) -----------------
    // The operational promise behind q93: per-delivery manifests roll
    // up to the corpus manifest WITHOUT rescanning documents, because
    // every manifest column combines associatively (sum/min/max/
    // bit_xor) and md5%32 refines md5%8. Certify it end-to-end: build
    // 32-shard manifests, merge them into 8 super-shards, and compare
    // against the direct 8-shard manifest — both engines run BOTH
    // paths and emit the per-shard equality verdict.
    QueryDef(
      "q131_manifest_rollup",
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
        val rolled = graft.ops.Shards.manifest(docs, "text", "doc_id", 32)
          .groupBy(($"shard" % 8).as("shard"))
          .agg(sum($"n_docs").as("n_docs"),
            min($"min_doc_id").as("min_doc_id"),
            max($"max_doc_id").as("max_doc_id"),
            sum($"n_tokens").as("n_tokens"),
            sum($"n_chars").as("n_chars"),
            expr("bit_xor(content_sig)").as("content_sig"))
        val direct = graft.ops.Shards.manifest(docs, "text", "doc_id", 8)
          .select($"shard", $"n_docs".as("d_docs"),
            $"min_doc_id".as("d_min"), $"max_doc_id".as("d_max"),
            $"n_tokens".as("d_tok"), $"n_chars".as("d_ch"),
            $"content_sig".as("d_sig"))
        rolled.join(direct, Seq("shard"))
          .select($"shard", $"n_docs", $"min_doc_id", $"max_doc_id",
            $"n_tokens", $"n_chars", $"content_sig",
            ($"n_docs" === $"d_docs" && $"min_doc_id" === $"d_min" &&
              $"max_doc_id" === $"d_max" && $"n_tokens" === $"d_tok" &&
              $"n_chars" === $"d_ch" && $"content_sig" === $"d_sig")
              .as("consistent"))
          .orderBy($"shard")
      },
      Some(raw"""WITH d AS (SELECT
            CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 32 AS shard32,
            doc_id,
            CAST($tokLenSql AS BIGINT) AS tok,
            CAST(length(text) AS BIGINT) AS ch,
            CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS sig
          FROM documents),
        m32 AS (SELECT shard32, CAST(COUNT(*) AS BIGINT) AS n_docs,
            MIN(doc_id) AS mn, MAX(doc_id) AS mx,
            CAST(SUM(tok) AS BIGINT) AS tk, CAST(SUM(ch) AS BIGINT) AS c,
            bit_xor(sig) AS sg
          FROM d GROUP BY shard32),
        rolled AS (SELECT shard32 % 8 AS shard,
            CAST(SUM(n_docs) AS BIGINT) AS n_docs,
            MIN(mn) AS min_doc_id, MAX(mx) AS max_doc_id,
            CAST(SUM(tk) AS BIGINT) AS n_tokens,
            CAST(SUM(c) AS BIGINT) AS n_chars,
            bit_xor(sg) AS content_sig
          FROM m32 GROUP BY 1),
        direct AS (SELECT shard32 % 8 AS shard,
            CAST(COUNT(*) AS BIGINT) AS n_docs,
            MIN(doc_id) AS mn, MAX(doc_id) AS mx,
            CAST(SUM(tok) AS BIGINT) AS tk, CAST(SUM(ch) AS BIGINT) AS c,
            bit_xor(sig) AS sg
          FROM d GROUP BY 1)
        SELECT r.shard, r.n_docs, r.min_doc_id, r.max_doc_id, r.n_tokens,
          r.n_chars, r.content_sig,
          (r.n_docs = dd.n_docs AND r.min_doc_id = dd.mn
            AND r.max_doc_id = dd.mx AND r.n_tokens = dd.tk
            AND r.n_chars = dd.c AND r.content_sig = dd.sg) AS consistent
        FROM rolled r JOIN direct dd ON r.shard = dd.shard
        ORDER BY r.shard""")),

    // ---- composed audit chain (round 8) --------------------------------
    // The round-8 operators as ONE production pipeline: quality-aware
    // dedup (q117's best-copy winner) → Gopher gate (q103) → exact
    // stratified split (q118) → per-split training manifest (q93's
    // totals + order-independent content signature). One lazy plan end
    // to end; a single oracle replays every stage from the fragments
    // q117/q103/q118/q93 certify individually — the q115 pattern for
    // the audit layer.
    QueryDef(
      "q132_audit_chain",
      (s, dir) => {
        import s.implicits._
        val ent = round(element_at(SketchExpressions
          .char_entropy(lower(coalesce($"text", lit("")))), 2), 6)
        val base = table(s, dir, "documents")
          .select($"doc_id", $"lang", $"source", $"text",
            round(ent * 1e6).cast("long").as("em"))
        val surv = graft.ops.Dedup.exactBest(base, "text", "doc_id", "em")
        val gated = graft.ops.Gopher.withRules(surv, "text")
          .filter($"pass")
          .select($"doc_id", $"lang", $"source", $"text")
        val split = graft.ops.Splits.stratified(gated,
          Seq("lang", "source"), "doc_id")
        split.select($"split", $"doc_id", tokLen($"text").as("tok"),
            length($"text").cast("long").as("ch"),
            conv(substring(md5($"text"), 1, 15), 16, 10).cast("long")
              .as("sig"))
          .groupBy($"split")
          .agg(count(lit(1)).as("n_docs"),
            min($"doc_id").as("min_doc_id"),
            max($"doc_id").as("max_doc_id"),
            sum($"tok").as("n_tokens"), sum($"ch").as("n_chars"),
            expr("bit_xor(sig)").as("content_sig"))
          .sortBounded($"split")
      },
      Some(raw"""WITH ${GovernanceQueries.entropyCtes},
        base AS (SELECT d.doc_id, d.lang, d.source, d.text,
            md5(trim(regexp_replace(regexp_replace(lower(coalesce(text, '')),
              '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS h,
            CAST(ROUND(COALESCE(e0.ent, 0.0) * 1000000.0) AS BIGINT) AS em
          FROM documents d LEFT JOIN e0 ON d.doc_id = e0.doc_id),
        win AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY h
            ORDER BY em DESC, doc_id) AS dr FROM base),
        sv AS (SELECT doc_id, lang, source, text FROM win WHERE dr = 1),
        gr AS (SELECT doc_id, lang, source, text,
            list_filter(regexp_split_to_array(lower(text), '\s+'),
              t -> t <> '') AS toks,
            CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT)
              AS wl,
            CAST(length(text) - length(replace(text, '#', ''))
              + (length(text) - length(replace(text, '...', ''))) / 3
              AS BIGINT) AS nsym
          FROM sv),
        gv AS (SELECT doc_id, lang, source, text,
            CAST(len(toks) AS BIGINT) AS n, wl, nsym,
            CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
              AS BIGINT) AS nalpha,
            CAST(len(list_intersect(list_distinct(toks),
              ${sqlList(graft.ops.Gopher.stopwords)})) AS BIGINT) AS nstop
          FROM gr),
        g AS (SELECT doc_id, lang, source, text FROM gv
          WHERE n >= 50 AND n <= 100000
            AND wl >= 3 * n AND wl <= 10 * n
            AND nalpha * 5 >= n * 4
            AND nstop >= 2
            AND nsym * 10 <= n),
        rk AS (SELECT *,
            ROW_NUMBER() OVER (PARTITION BY lang, source
              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS r,
            COUNT(*) OVER (PARTITION BY lang, source) AS nn
          FROM g),
        sp AS (SELECT doc_id, text,
            CASE WHEN r * 100 <= nn * 80 THEN 'train'
              WHEN r * 100 <= nn * 90 THEN 'validation'
              ELSE 'test' END AS split
          FROM rk),
        m AS (SELECT split, doc_id,
            CAST($tokLenSql AS BIGINT) AS tok,
            CAST(length(text) AS BIGINT) AS ch,
            CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS sig
          FROM sp)
        SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
          MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id,
          CAST(SUM(tok) AS BIGINT) AS n_tokens,
          CAST(SUM(ch) AS BIGINT) AS n_chars,
          bit_xor(sig) AS content_sig
        FROM m GROUP BY split ORDER BY split""")),

    // ---- delivery OOV rate vs base vocabulary (round 8) ----------------
    // Tokenizer health on delta ingest: what fraction of the new
    // delivery's token occurrences (and distinct terms) is absent from
    // the base corpus' vocabulary, per source? High OOV = the delivery
    // is off-distribution for the trained tokenizer/embedding table.
    // Shape: vocab-sized (source, term) pre-aggregation off the
    // term_counts kernel, one hash join against the base's distinct
    // terms, sources-sized rollup — terms cross the wire, documents
    // never do.
    QueryDef(
      "q133_oov_rate",
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
        def termsOf(d: org.apache.spark.sql.DataFrame) = d
          .select($"source", explode(SketchExpressions
            .term_counts(coalesce($"text", lit("")))).as("t"))
          .select($"source", $"t.term".as("term"), $"t.tf".as("tf"))
        val baseVocab = termsOf(docs.filter($"doc_id" % 3 === 0))
          .select($"term".as("bterm")).distinct()
        val del = termsOf(docs.filter($"doc_id" % 3 =!= 0))
          .groupBy($"source", $"term").agg(sum($"tf").as("tf"))
        del.join(baseVocab, $"term" === $"bterm", "left")
          .groupBy($"source")
          .agg(sum($"tf").as("n_tokens"),
            sum(when($"bterm".isNull, $"tf").otherwise(0L))
              .as("n_oov_tokens"),
            count(lit(1)).as("n_terms"),
            sum(when($"bterm".isNull, 1L).otherwise(0L)).as("n_oov_terms"))
          .select($"source", $"n_tokens", $"n_oov_tokens", $"n_terms",
            $"n_oov_terms",
            round($"n_oov_tokens".cast("double") / $"n_tokens", 6)
              .as("oov_rate"))
          .sortBounded($"source")
      },
      Some(raw"""WITH tm AS (SELECT doc_id, source,
            unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
              t -> t <> '')) AS term
          FROM documents),
        bv AS (SELECT DISTINCT term FROM tm WHERE doc_id % 3 = 0),
        del AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS tf
          FROM tm WHERE doc_id % 3 <> 0 GROUP BY source, term),
        j AS (SELECT del.source, del.term, del.tf,
            bv.term IS NOT NULL AS known
          FROM del LEFT JOIN bv ON del.term = bv.term)
        SELECT source, CAST(SUM(tf) AS BIGINT) AS n_tokens,
          CAST(SUM(CASE WHEN known THEN 0 ELSE tf END) AS BIGINT)
            AS n_oov_tokens,
          CAST(COUNT(*) AS BIGINT) AS n_terms,
          CAST(SUM(CASE WHEN known THEN 0 ELSE 1 END) AS BIGINT)
            AS n_oov_terms,
          ROUND(CAST(SUM(CASE WHEN known THEN 0 ELSE tf END) AS DOUBLE)
            / SUM(tf), 6) AS oov_rate
        FROM j GROUP BY source ORDER BY source""")),

    // ---- rank-fusion quality blend (round 8) ---------------------------
    // Borda-count fusion of two quality signals — entropy rank and
    // length rank — into one selection order (rank fusion sidesteps the
    // scale-mismatch of averaging raw scores; reciprocal-rank and Borda
    // are the standard text-retrieval recipes). Both ranks come from
    // the two-phase global rank applied SEQUENTIALLY on one relation
    // (each pass adds a column — no corpus self-join), the fused key is
    // an exact integer sum, and the top-20 delivery is a bounded
    // TakeOrdered.
    QueryDef(
      "q134_rank_fusion",
      (s, dir) => {
        import s.implicits._
        val ent = round(element_at(SketchExpressions
          .char_entropy(lower(coalesce($"text", lit("")))), 2), 6)
        // lazy checkpoint: the two rank recipes fork their input (rank
        // join + count branch each), which without it replays the
        // entropy kernel scan four times (measured 4 scans in the final
        // plan); materialized, consumers read a 24-byte row
        val base = table(s, dir, "documents")
          .select($"doc_id", round(ent * 1e6).cast("long").as("em"),
            tokLen($"text").as("len"))
          .localCheckpoint(false)
        val r1 = graft.ops.DistWindow.withGlobalRank(
          base.withColumn("__k1", -$"em"),
          floor($"__k1" / 4096L), Seq($"__k1", $"doc_id"), "r_ent")
        val r2 = graft.ops.DistWindow.withGlobalRank(
          r1.withColumn("__k2", -$"len"),
          floor($"__k2" / 64L), Seq($"__k2", $"doc_id"), "r_len")
        r2.select($"doc_id", $"r_ent", $"r_len",
            ($"r_ent" + $"r_len").as("borda"))
          .orderBy($"borda", $"doc_id")
          .limit(20)
      },
      Some(raw"""WITH ${GovernanceQueries.entropyCtes},
        base AS (SELECT d.doc_id,
            CAST(ROUND(COALESCE(e0.ent, 0.0) * 1000000.0) AS BIGINT) AS em,
            CAST($tokLenSql AS BIGINT) AS len
          FROM documents d LEFT JOIN e0 ON d.doc_id = e0.doc_id),
        rk AS (SELECT doc_id,
            ROW_NUMBER() OVER (ORDER BY em DESC, doc_id) AS r_ent,
            ROW_NUMBER() OVER (ORDER BY len DESC, doc_id) AS r_len
          FROM base)
        SELECT doc_id, r_ent, r_len, r_ent + r_len AS borda
        FROM rk ORDER BY borda, doc_id LIMIT 20""")),

    // ---- eval-contamination evidence report (round 8) ------------------
    // q50 decides "how contaminated is each training doc"; an auditor
    // also needs the EVIDENCE: for each eval doc, which training doc
    // matches it hardest and by how much. Shingle match via one hash
    // equi-join against the (small, broadcast) eval shingle set, then
    // ONE combinable max_by per eval doc — no per-eval window, no
    // quadratic stage; only eval docs with at least one match appear.
    QueryDef(
      "q135_eval_nearest",
      (s, dir) => {
        import s.implicits._
        val docs = graft.ops.Par.spread(table(s, dir, "documents"), $"doc_id")
        val sh = SketchExpressions.word_shingles($"text", 4)
        val evalSh = docs.filter($"doc_id" % 50 === 0)
          .select($"doc_id".as("eval_id"), explode(sh).as("sg"))
        val trainSh = docs.filter($"doc_id" % 50 =!= 0)
          .select($"doc_id".as("train_id"), explode(sh).as("sg"))
        trainSh.join(broadcast(evalSh), Seq("sg"))
          .groupBy($"eval_id", $"train_id")
          .agg(count(lit(1)).as("n_shared"))
          .groupBy($"eval_id")
          .agg(max_by(struct($"train_id", $"n_shared"),
            struct($"n_shared", -$"train_id")).as("w"))
          .select($"eval_id", $"w.train_id".as("best_train_id"),
            $"w.n_shared".as("n_shared"))
          .orderBy($"eval_id")
      },
      Some(raw"""WITH t AS (SELECT doc_id,
            list_filter(regexp_split_to_array(lower(text), '\s+'),
              x -> x <> '') AS toks
          FROM documents),
        sh AS (SELECT doc_id,
            unnest(CASE WHEN len(toks) < 4 THEN []
              ELSE list_distinct(list_transform(range(len(toks) - 3),
                i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
                  || ' ' || toks[i+4])) END) AS sg
          FROM t),
        ev AS (SELECT doc_id AS eval_id, sg FROM sh WHERE doc_id % 50 = 0),
        tr AS (SELECT doc_id AS train_id, sg FROM sh
          WHERE doc_id % 50 <> 0),
        pairs AS (SELECT eval_id, train_id, CAST(COUNT(*) AS BIGINT)
            AS n_shared
          FROM tr JOIN ev ON tr.sg = ev.sg GROUP BY eval_id, train_id),
        best AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY eval_id
            ORDER BY n_shared DESC, train_id) AS r FROM pairs)
        SELECT eval_id, train_id AS best_train_id, n_shared
        FROM best WHERE r = 1 ORDER BY eval_id""")),

    // ---- cross-source n-gram novelty curve (round 8) -------------------
    // "Does the next source add anything?" — per source (in
    // lexicographic ingestion order): distinct 3-gram count, the count
    // of grams FIRST seen in that source (min(source) attribution, the
    // q60 first-occurrence contract applied to sources), and novelty in
    // basis points. ONE distinct (source, gram) exchange feeds both the
    // per-gram min(source) (combinable) and the per-source totals; grams
    // cross the wire as 60-bit md5 slices (the q114 discipline), the
    // final join is sources-sized.
    QueryDef(
      "q143_ngram_novelty",
      (s, dir) => {
        import s.implicits._
        val dg = graft.ops.Par.spread(table(s, dir, "documents"), $"doc_id")
          .select($"source",
            explode(graft.functions.SketchExpressions
              .word_shingles($"text", 3)).as("g0"))
          .select($"source",
            conv(substring(md5($"g0"), 1, 15), 16, 10).cast("long").as("g"))
          .distinct()
        val first = dg.groupBy($"g").agg(min($"source").as("source"))
          .groupBy($"source").agg(count(lit(1)).as("n_new_grams"))
        val tot = dg.groupBy($"source")
          .agg(count(lit(1)).as("n_distinct_grams"))
        tot.join(first, Seq("source"), "left")
          .select($"source", $"n_distinct_grams",
            coalesce($"n_new_grams", lit(0L)).as("n_new_grams"))
          .withColumn("novelty_bp",
            expr("n_new_grams * 10000 DIV n_distinct_grams"))
          .sortBounded($"source")
      },
      Some(raw"""WITH d0 AS (SELECT source,
            list_filter(regexp_split_to_array(lower(text), '\s+'),
              t -> t <> '') AS toks
          FROM documents),
        sh AS (SELECT source,
            unnest(CASE WHEN len(toks) < 3 THEN []
              ELSE list_distinct(list_transform(range(len(toks) - 2),
                i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))
              END) AS sg
          FROM d0),
        dg AS (SELECT DISTINCT source,
            CAST(('0x' || substr(md5(sg), 1, 15)) AS BIGINT) AS g
          FROM sh),
        first AS (SELECT MIN(source) AS source, g FROM dg GROUP BY g),
        nw AS (SELECT source, COUNT(*) AS n_new_grams FROM first
          GROUP BY source),
        tot AS (SELECT source, COUNT(*) AS n_distinct_grams FROM dg
          GROUP BY source)
        SELECT t.source, t.n_distinct_grams,
          COALESCE(n.n_new_grams, 0) AS n_new_grams,
          CAST(COALESCE(n.n_new_grams, 0) * 10000 // t.n_distinct_grams
            AS BIGINT) AS novelty_bp
        FROM tot t LEFT JOIN nw n USING (source) ORDER BY t.source""")),

    // ---- greedy dedup-order gain audit (round 8) -----------------------
    // Plan the dedup pass: processing sources in lexicographic order,
    // how many of each source's documents die as CROSS-source dupes
    // (digest first seen in an earlier source — the q60/q143
    // first-occurrence contract) vs WITHIN-source dupes (first in this
    // source, but not this source's first copy)? Everything derives
    // from one combinable (digest, source) count plus a digest-keyed
    // min(source) — digests shuffle, documents never — and the final
    // rollup is sources-sized.
    QueryDef(
      "q156_dedup_order",
      (s, dir) => {
        import s.implicits._
        val d = table(s, dir, "documents")
          .select($"source", md5(graft.ops.Dedup.normalize($"text")).as("h"))
        val ds = d.groupBy($"h", $"source").agg(count(lit(1)).as("n"))
        val firstSrc = ds.groupBy($"h").agg(min($"source").as("first_source"))
        ds.join(firstSrc, Seq("h"))
          .select($"source", $"n",
            when($"source" === $"first_source", 0L).otherwise($"n")
              .as("cross"),
            when($"source" === $"first_source", $"n" - 1).otherwise(0L)
              .as("within"))
          .groupBy($"source")
          .agg(sum($"n").as("n_docs"),
            sum($"cross").as("n_cross_dupes"),
            sum($"within").as("n_within_dupes"),
            (sum($"n") - sum($"cross") - sum($"within")).as("n_kept"))
          .sortBounded($"source")
      },
      Some("""WITH d AS (SELECT source,
            md5(trim(regexp_replace(
              regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
              ' +', ' ', 'g'))) AS h
          FROM documents),
        ds AS (SELECT h, source, COUNT(*) AS n FROM d GROUP BY h, source),
        f AS (SELECT h, MIN(source) AS first_source FROM ds GROUP BY h)
        SELECT source, CAST(SUM(n) AS BIGINT) AS n_docs,
          CAST(SUM(CASE WHEN source = first_source THEN 0 ELSE n END)
            AS BIGINT) AS n_cross_dupes,
          CAST(SUM(CASE WHEN source = first_source THEN n - 1 ELSE 0 END)
            AS BIGINT) AS n_within_dupes,
          CAST(SUM(n) - SUM(CASE WHEN source = first_source THEN 0
              ELSE n END)
            - SUM(CASE WHEN source = first_source THEN n - 1 ELSE 0 END)
            AS BIGINT) AS n_kept
        FROM ds JOIN f USING (h) GROUP BY source ORDER BY source""")),

    // ---- conformal score intervals for the NB classifier (round 8) -----
    // Split-conformal-style calibration read: per class, the exact
    // [p05, p95] interval of the q81-certified NB score (micro ints,
    // ceil-rank inequalities — the q124 recipe via
    // DistWindow.withGroupedRank) and the achieved coverage in basis
    // points. The oracle replays model, scores, both quantiles and the
    // coverage count from the shared nbScoreCtes fragment.
    QueryDef(
      "q157_conformal_nb",
      (s, dir) => {
        import s.implicits._
        val scored = graft.ops.NaiveBayes.trainScore(
            table(s, dir, "documents"), "text",
            when($"lang" === "en", 1.0).otherwise(0.0),
            dims = 256, carry = Seq("lang"))
          .select($"doc_id",
            when($"lang" === "en", "en").otherwise("other").as("label"),
            round($"nb_score" * 1e6).cast("long").as("sm"))
          .localCheckpoint(false)
        val ranked = graft.ops.DistWindow.withGroupedRank(scored,
          col("label"), floor(col("sm") / 1000000.0).cast("long"),
          Seq(col("sm"), col("doc_id")), "r", Some("n"))
        val qs = ranked
          .select($"label", $"r", $"sm", $"n",
            explode(array(lit(5), lit(95))).as("p"))
          .filter($"r" * 100 >= $"n" * $"p" &&
            ($"r" - 1) * 100 < $"n" * $"p")
          .groupBy($"label")
          .agg(max($"n").as("n_docs"),
            min(when($"p" === 5, $"sm")).as("q05_micro"),
            min(when($"p" === 95, $"sm")).as("q95_micro"))
        scored.join(broadcast(qs), Seq("label"))
          .withColumn("inb",
            when($"sm" >= $"q05_micro" && $"sm" <= $"q95_micro", 1L)
              .otherwise(0L))
          .groupBy($"label")
          .agg(max($"n_docs").as("n_docs"), max($"q05_micro").as("q05_micro"),
            max($"q95_micro").as("q95_micro"),
            sum($"inb").as("n_in_interval"))
          .withColumn("coverage_bp",
            expr("n_in_interval * 10000 DIV n_docs"))
          .sortBounded($"label")
      },
      Some(raw"""WITH ${CorpusQueries.nbScoreCtes},
        j AS (SELECT sc.doc_id,
            CASE WHEN lang = 'en' THEN 'en' ELSE 'other' END AS label,
            CAST(ROUND(ROUND(s, 6) * 1000000) AS BIGINT) AS sm
          FROM sc JOIN documents USING (doc_id)),
        rk AS (SELECT label, doc_id, sm,
            ROW_NUMBER() OVER (PARTITION BY label ORDER BY sm, doc_id)
              AS r,
            COUNT(*) OVER (PARTITION BY label) AS n
          FROM j),
        x AS (SELECT label, r, sm, n, p.p
          FROM rk CROSS JOIN (SELECT unnest([5, 95]) AS p) p
          WHERE r * 100 >= n * p.p AND (r - 1) * 100 < n * p.p),
        qs AS (SELECT label, CAST(MAX(n) AS BIGINT) AS n_docs,
            MIN(CASE WHEN p = 5 THEN sm END) AS q05_micro,
            MIN(CASE WHEN p = 95 THEN sm END) AS q95_micro
          FROM x GROUP BY label)
        SELECT j.label, MAX(q.n_docs) AS n_docs,
          MAX(q.q05_micro) AS q05_micro, MAX(q.q95_micro) AS q95_micro,
          CAST(SUM(CASE WHEN j.sm BETWEEN q.q05_micro AND q.q95_micro
            THEN 1 ELSE 0 END) AS BIGINT) AS n_in_interval,
          CAST(SUM(CASE WHEN j.sm BETWEEN q.q05_micro AND q.q95_micro
            THEN 1 ELSE 0 END) * 10000 // MAX(q.n_docs) AS BIGINT)
            AS coverage_bp
        FROM j JOIN qs q USING (label) GROUP BY j.label
        ORDER BY j.label""")),

    // ---- exact Spearman: length-vs-quality bias audit (round 8) --------
    // Does the quality signal just reward length? Per source, the
    // Spearman rank correlation between token count and char entropy —
    // computed EXACTLY: two PARALLEL grouped two-phase ranks off one
    // checkpointed projection (ties broken by doc_id — the same
    // deterministic-total-order contract every rank op here uses;
    // chaining the ranks serialized the second machinery behind the
    // first, 1.15→0.82 s), then ρ = 1 − 6·Σd²/(n(n²−1)) with every
    // term an exact integer until the one closing division.
    QueryDef(
      "q158_spearman",
      (s, dir) => {
        import s.implicits._
        val base = graft.ops.Par.spread(table(s, dir, "documents"), $"doc_id")
          .select($"source", $"doc_id",
            regexp_count($"text", lit("\\S+"))
              .cast("long").as("len"),
            // two-step round(round(x,6)*1e6) — the file-wide fixed-point
            // discipline; a one-step round(x*1e6) can differ by 1 micro
            // at a 5e-7 boundary and flip the entropy rank
            round(round(element_at(graft.functions.SketchExpressions
              .char_entropy(lower(coalesce($"text", lit("")))), 2), 6) * 1e6)
              .cast("long").as("em"))
        // PARALLEL ranks off one checkpointed projection (the q138
        // recipe): chaining them serialized the second rank machinery
        // behind the first, and the checkpoint keeps the char_entropy
        // kernel scan out of both branches' broadcast subtrees
        val snap = base.localCheckpoint(false)
        val r1 = graft.ops.DistWindow.withGroupedRank(snap, col("source"),
          floor(col("len") / 64.0).cast("long"),
          Seq(col("len"), col("doc_id")), "rl")
          .select($"source", $"doc_id", $"rl")
        val r2 = graft.ops.DistWindow.withGroupedRank(snap, col("source"),
          floor(col("em") / 1000000.0).cast("long"),
          Seq(col("em"), col("doc_id")), "re")
          .select($"doc_id", $"re")
        r1.join(r2, Seq("doc_id"))
          .select($"source", (($"rl" - $"re") * ($"rl" - $"re")).as("d2"))
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"), sum($"d2").as("sum_d2"))
          .withColumn("spearman", round(lit(1.0) -
            lit(6.0) * $"sum_d2" /
              ($"n_docs" * ($"n_docs" * $"n_docs" - 1)), 6))
          .sortBounded($"source")
      },
      Some(raw"""WITH ch AS (SELECT doc_id,
            unnest(string_split(lower(coalesce(text, '')), '')) AS c
          FROM documents),
        f AS (SELECT doc_id, c, COUNT(*) AS n FROM ch
          WHERE ascii(c) BETWEEN 32 AND 126 GROUP BY doc_id, c),
        tt AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS t
          FROM f GROUP BY doc_id),
        ent AS (SELECT f.doc_id, CAST(ROUND(ROUND(-SUM(
              (CAST(n AS DOUBLE) / t) * LN(CAST(n AS DOUBLE) / t)), 6)
              * 1000000) AS BIGINT) AS em
          FROM f JOIN tt ON f.doc_id = tt.doc_id GROUP BY f.doc_id),
        base AS (SELECT d.doc_id, d.source,
            CAST(len(list_filter(regexp_split_to_array(d.text, '\s+'),
              x -> x <> '')) AS BIGINT) AS len,
            COALESCE(ent.em, 0) AS em
          FROM documents d LEFT JOIN ent USING (doc_id)),
        rk AS (SELECT source,
            ROW_NUMBER() OVER (PARTITION BY source ORDER BY len, doc_id)
              AS rl,
            ROW_NUMBER() OVER (PARTITION BY source ORDER BY em, doc_id)
              AS re
          FROM base)
        SELECT source, COUNT(*) AS n_docs,
          CAST(SUM((rl - re) * (rl - re)) AS BIGINT) AS sum_d2,
          ROUND(1.0 - 6.0 * SUM((rl - re) * (rl - re)) /
            (COUNT(*) * (COUNT(*) * COUNT(*) - 1.0)), 6) AS spearman
        FROM rk GROUP BY source ORDER BY source""")),

    // ---- Gini concentration of token mass (round 8) --------------------
    // How unequal are document sizes within a source? The exact Gini
    // coefficient of the per-document token counts: one grouped
    // two-phase rank (ascending by (len, doc_id)) plus one combinable
    // aggregation — G = (2·Σ(i·xᵢ) − (n+1)·Σx)/(n·Σx), every term an
    // exact integer until the closing division. The q146 Pareto share
    // tells you the head; Gini summarizes the whole curve.
    QueryDef(
      "q159_gini",
      (s, dir) => {
        import s.implicits._
        val base = table(s, dir, "documents")
          .select($"source", $"doc_id",
            regexp_count($"text", lit("\\S+"))
              .cast("long").as("len"))
        val r = graft.ops.DistWindow.withGroupedRank(base, col("source"),
          floor(col("len") / 64.0).cast("long"),
          Seq(col("len"), col("doc_id")), "i")
        r.groupBy($"source")
          .agg(count(lit(1)).as("n_docs"), sum($"len").as("sum_tokens"),
            sum($"i" * $"len").as("__s1"))
          .withColumn("gini", round(
            (lit(2.0) * $"__s1" - ($"n_docs" + 1) * $"sum_tokens") /
              ($"n_docs" * $"sum_tokens"), 6))
          .drop("__s1")
          .sortBounded($"source")
      },
      Some(raw"""WITH base AS (SELECT source, doc_id,
            CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
              x -> x <> '')) AS BIGINT) AS len
          FROM documents),
        rk AS (SELECT source, len,
            ROW_NUMBER() OVER (PARTITION BY source ORDER BY len, doc_id)
              AS i
          FROM base)
        SELECT source, COUNT(*) AS n_docs,
          CAST(SUM(len) AS BIGINT) AS sum_tokens,
          ROUND((2.0 * SUM(i * len) - (COUNT(*) + 1) * SUM(len)) /
            (COUNT(*) * 1.0 * SUM(len)), 6) AS gini
        FROM rk GROUP BY source ORDER BY source""")),

    // ---- precision/recall threshold sweep for the NB gate (round 8) ----
    // Which score cut should the q81 classifier ship with? Precision,
    // recall and F1 at five thresholds from ONE pass over the scored
    // corpus: per (threshold, quadrant) counts are a combinable
    // aggregation over an explode(5) projection — the corpus is read
    // once, the sweep table is 5 rows — and every rate is exact basis
    // points. The oracle replays the model and all five confusion
    // matrices from the shared nbScoreCtes fragment.
    QueryDef(
      "q164_pr_sweep",
      (s, dir) => {
        import s.implicits._
        val scored = graft.ops.NaiveBayes.trainScore(
            table(s, dir, "documents"), "text",
            when($"lang" === "en", 1.0).otherwise(0.0),
            dims = 256, carry = Seq("lang"))
          .select(round($"nb_score" * 1e6).cast("long").as("sm"),
            when($"lang" === "en", 1L).otherwise(0L).as("y"))
        scored
          .select($"sm", $"y", explode(array(
            lit(-2000000L), lit(-1000000L), lit(0L), lit(1000000L),
            lit(2000000L))).as("thr"))
          .withColumn("p", when($"sm" > $"thr", 1L).otherwise(0L))
          .groupBy($"thr")
          .agg(sum(when($"p" === 1 && $"y" === 1, 1L).otherwise(0L))
              .as("tp"),
            sum(when($"p" === 1 && $"y" === 0, 1L).otherwise(0L)).as("fp"),
            sum(when($"p" === 0 && $"y" === 1, 1L).otherwise(0L)).as("fn"))
          .withColumn("precision_bp",
            expr("CASE WHEN tp + fp = 0 THEN 0 ELSE tp * 10000 DIV (tp + fp) END"))
          .withColumn("recall_bp",
            expr("CASE WHEN tp + fn = 0 THEN 0 ELSE tp * 10000 DIV (tp + fn) END"))
          .withColumn("f1_bp", expr(
            "CASE WHEN 2*tp + fp + fn = 0 THEN 0 ELSE 2 * tp * 10000 DIV (2*tp + fp + fn) END"))
          .sortBounded($"thr")
      },
      Some(raw"""WITH ${CorpusQueries.nbScoreCtes},
        j AS (SELECT CAST(ROUND(ROUND(s, 6) * 1000000) AS BIGINT) AS sm,
            CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
          FROM sc JOIN documents USING (doc_id)),
        sw AS (SELECT sm, y, t.thr
          FROM j CROSS JOIN (SELECT unnest([-2000000, -1000000, 0,
            1000000, 2000000]) AS thr) t),
        cm AS (SELECT thr,
            SUM(CASE WHEN sm > thr AND y = 1 THEN 1 ELSE 0 END) AS tp,
            SUM(CASE WHEN sm > thr AND y = 0 THEN 1 ELSE 0 END) AS fp,
            SUM(CASE WHEN sm <= thr AND y = 1 THEN 1 ELSE 0 END) AS fn
          FROM sw GROUP BY thr)
        SELECT CAST(thr AS BIGINT) AS thr, CAST(tp AS BIGINT) AS tp,
          CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
          CAST(CASE WHEN tp + fp = 0 THEN 0
            ELSE tp * 10000 // (tp + fp) END AS BIGINT) AS precision_bp,
          CAST(CASE WHEN tp + fn = 0 THEN 0
            ELSE tp * 10000 // (tp + fn) END AS BIGINT) AS recall_bp,
          CAST(CASE WHEN 2*tp + fp + fn = 0 THEN 0
            ELSE 2 * tp * 10000 // (2*tp + fp + fn) END AS BIGINT) AS f1_bp
        FROM cm ORDER BY thr"""))
  )
}
