package graft.queries

import org.apache.spark.sql.functions._
import QueryDef.{table, BoundedSort}

/** Training-data text operators over `documents` (builder-prompt surface:
  * dedup, token counting, quality scoring, language-ID, fingerprinting).
  * All formulated identically in Spark and DuckDB so the oracle
  * hash-checks them; the heavier sketch-based dedup (MinHash/SimHash)
  * lives in graft.ops with rows-only checks + unit tests.
  */
object TextQueries {

  private val stopEn = Seq("the", "a", "and", "of", "to", "in", "is", "that")
  private val stopDe = Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein")
  private val stopFr = Seq("le", "la", "les", "et", "est", "pas", "pour", "que")
  private val stopEs = Seq("el", "los", "de", "y", "en", "un", "ser", "no")

  private def sqlList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString("[", ", ", "]")

  val defs: Seq[QueryDef] = Seq(
    // ---- exact dedup on normalized content -----------------------------
    // normalize (lower, strip non-alnum, collapse space) -> md5 -> keep
    // min doc_id per hash. Hash-groupBy dedup: the standard exact-dedup
    // shape at scale (shuffle on digest, not on full text). The
    // normalize is the one-pass codegen norm_text kernel — byte-equal
    // to the oracle's regexp_replace chain (PrepSpec property-pins the
    // equivalence on adversarial unicode), without two regex passes
    // per document on the hot path (round 7; the Dedup ops already
    // scanned this way).
    QueryDef(
      "q20_dedup_exact",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "documents")
          .withColumn("h", md5(graft.ops.Dedup.normalize($"text")))
          .groupBy($"h")
          .agg(min($"doc_id").as("keeper_id"), count(lit(1)).as("n_copies"))
          .orderBy($"h")
      },
      Some("""SELECT h, MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
        FROM (SELECT doc_id,
            md5(trim(regexp_replace(
              regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
              ' +', ' ', 'g'))) AS h
          FROM documents) t
        GROUP BY h ORDER BY h""")),

    // ---- token counting (whitespace + word-regex) ----------------------
    // counting maximal runs directly (regexp_count of \S+ / [A-Za-z0-9]+)
    // ≡ len(filter(split(sep+), non-empty)) — same token boundaries, but
    // no per-row array materialization; stays inside codegen
    QueryDef(
      "q21_token_count",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "documents")
          .select($"doc_id",
            regexp_count($"text", lit("\\S+")).as("n_tokens"),
            regexp_count($"text", lit("[A-Za-z0-9]+")).as("n_words"),
            length($"text").as("n_chars_actual"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
        len(list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')) AS n_tokens,
        len(list_filter(regexp_split_to_array(text, '[^A-Za-z0-9]+'), t -> t <> '')) AS n_words,
        length(text) AS n_chars_actual
        FROM documents ORDER BY doc_id""")),

    // ---- quality scoring (length/punct/stopword ratios) ----------------
    QueryDef(
      "q22_quality_score",
      (s, dir) => {
        import s.implicits._
        val toks = filter(split(lower($"text"), "\\s+"), t => t =!= "")
        val nTok = size(toks).cast("double")
        val stopArr = array(stopEn.map(lit): _*)
        val nStop = size(filter(toks, t => array_contains(stopArr, t))).cast("double")
        val nPunct = (length($"text") -
          length(regexp_replace($"text", "[.,;:!?]", ""))).cast("double")
        val nCh = length($"text").cast("double")
        table(s, dir, "documents")
          .select($"doc_id",
            round(nStop / nTok, 6).as("stopword_ratio"),
            round(nPunct / nCh, 6).as("punct_ratio"),
            round(nCh / nTok, 6).as("chars_per_token"))
          .orderBy($"doc_id")
      },
      Some(raw"""SELECT doc_id,
        ROUND(CAST(len(list_filter(toks, t -> list_contains(${sqlList(stopEn)}, t))) AS DOUBLE)
          / CAST(len(toks) AS DOUBLE), 6) AS stopword_ratio,
        ROUND(CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
          / CAST(length(text) AS DOUBLE), 6) AS punct_ratio,
        ROUND(CAST(length(text) AS DOUBLE)
          / CAST(len(toks) AS DOUBLE), 6) AS chars_per_token
        FROM (SELECT doc_id, text,
            list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '') AS toks
          FROM documents) t
        ORDER BY doc_id""")),

    // ---- language ID by stopword-list voting ---------------------------
    // (argmax over per-language stopword hit counts, ties broken by a
    // fixed language order; same decision rule in both engines)
    QueryDef(
      "q23_lang_id",
      (s, dir) => {
        import s.implicits._
        // one-pass codegen kernel: tokenize ≡ split on [^a-zà-ÿäöüß]+
        // and count hits per stopword set (the interpreted 4×filter/
        // array_contains chain re-tokenized four times per row)
        val hitsArr = graft.functions.SketchExpressions.lang_hits($"text",
          Array(stopEn.toArray, stopDe.toArray, stopFr.toArray,
            stopEs.toArray))
        table(s, dir, "documents")
          .select($"doc_id", $"lang", hitsArr.as("h"))
          .select($"doc_id", $"lang",
            $"h" (0).as("s_en"), $"h" (1).as("s_de"),
            $"h" (2).as("s_fr"), $"h" (3).as("s_es"))
          .withColumn("predicted",
            when($"s_en" >= $"s_de" && $"s_en" >= $"s_fr" && $"s_en" >= $"s_es" && $"s_en" > 0, "en")
              .when($"s_de" >= $"s_fr" && $"s_de" >= $"s_es" && $"s_de" > 0, "de")
              .when($"s_fr" >= $"s_es" && $"s_fr" > 0, "fr")
              .when($"s_es" > 0, "es")
              .otherwise("unknown"))
          .groupBy($"lang", $"predicted")
          .agg(count(lit(1)).as("n"))
          .sortBounded($"lang", $"predicted")
      },
      Some(s"""WITH scored AS (
          SELECT doc_id, lang,
            len(list_filter(toks, t -> list_contains(${sqlList(stopEn)}, t))) AS s_en,
            len(list_filter(toks, t -> list_contains(${sqlList(stopDe)}, t))) AS s_de,
            len(list_filter(toks, t -> list_contains(${sqlList(stopFr)}, t))) AS s_fr,
            len(list_filter(toks, t -> list_contains(${sqlList(stopEs)}, t))) AS s_es
          FROM (SELECT doc_id, lang,
              list_filter(regexp_split_to_array(lower(text), '[^a-zà-ÿäöüß]+'),
                t -> t <> '') AS toks
            FROM documents) t),
        pred AS (
          SELECT lang,
            CASE
              WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0 THEN 'en'
              WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0 THEN 'de'
              WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr'
              WHEN s_es > 0 THEN 'es'
              ELSE 'unknown' END AS predicted
          FROM scored)
        SELECT lang, predicted, COUNT(*) AS n
        FROM pred GROUP BY lang, predicted ORDER BY lang, predicted""")),

    // ---- content fingerprint (digest-based document fingerprinting) ----
    QueryDef(
      "q24_fingerprint",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "documents")
          .select($"doc_id",
            substring(md5($"text"), 1, 16).as("fp64"),
            substring(sha2($"text", 256), 1, 16).as("fp_sha"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id, substr(md5(text), 1, 16) AS fp64,
        substr(sha256(text), 1, 16) AS fp_sha
        FROM documents ORDER BY doc_id""")),

    // ---- multimodal column plumbing ------------------------------------
    // Opaque binary payload + typed metadata extracted without decoding
    // (the decode itself is the stubbed step; Spark-side schema/batching
    // is real — see graft.ops.Multimodal for the mapPartitions path).
    QueryDef(
      "q25_multimodal_meta",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "documents")
          .withColumn("payload", encode($"text", "UTF-8"))
          .select($"doc_id",
            octet_length($"payload").as("n_bytes"),
            ascii(substring($"text", 1, 1)).as("magic_byte"),
            (octet_length($"payload") % 256).as("fake_height"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id, strlen(text) AS n_bytes,
        ascii(substr(text, 1, 1)) AS magic_byte,
        strlen(text) % 256 AS fake_height
        FROM documents ORDER BY doc_id""")),

    // ---- stratified sampling: exact k per stratum ----------------------
    // Deterministic rank by md5 of the id inside each (lang, source)
    // stratum — reproducible under any partitioning, and the per-stratum
    // quota is exact, which uniform-probability sampling can't give.
    // Strata are few and skewed, so a partitioned window would serialize
    // the dominant stratum through one task; TopK.perGroup keeps a k-row
    // heap per stratum per map task and shuffles heaps, not documents.
    QueryDef(
      "q42_stratified_sample",
      (s, dir) => {
        import s.implicits._
        graft.ops.TopK.perGroup(
            table(s, dir, "documents").select($"lang", $"source", $"doc_id"),
            Seq("lang", "source"),
            Seq((md5($"doc_id".cast("string")), false), ($"doc_id", false)),
            5, "rk")
          .select($"lang", $"source", $"doc_id", $"rk")
          .sortBounded($"lang", $"source", $"rk")
      },
      Some("""SELECT lang, source, doc_id, rk FROM (
          SELECT lang, source, doc_id,
            CAST(ROW_NUMBER() OVER (PARTITION BY lang, source
              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS rk
          FROM documents) t
        WHERE rk <= 5 ORDER BY lang, source, rk""")),

    // ---- Gopher top n-gram char fractions (n = 2, 3, 4) -----------------
    // The other half of the Gopher repetition ruleset (Rae et al. 2021):
    // q48 gates on dup-word and top-BIGRAM fractions; this completes the
    // top-n-gram family — for each n, the characters claimed by the
    // single most frequent n-gram (count × the gram's char length, space-
    // joined) over the document's total token chars. The aggregation key
    // is the document itself, so the engine computes all three n values
    // in ONE zero-shuffle kernel pass (the rep_stats pattern; the
    // relational formulation shipped every gram occurrence across a
    // shuffle for a doc-local answer — 2.4 s vs ~0.2 s at sf0.1). The
    // oracle replays it relationally, certifying the kernel.
    QueryDef(
      "q86_topgram_fractions",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "documents")
          .select($"doc_id", graft.functions.SketchExpressions
            .topgram_stats(coalesce($"text", lit(""))).as("st"))
          .select($"doc_id",
            when($"st" (0) > 0, round($"st" (1).cast("double") / $"st" (0), 6))
              .otherwise(0.0).as("top2_frac"),
            when($"st" (0) > 0, round($"st" (2).cast("double") / $"st" (0), 6))
              .otherwise(0.0).as("top3_frac"),
            when($"st" (0) > 0, round($"st" (3).cast("double") / $"st" (0), 6))
              .otherwise(0.0).as("top4_frac"))
          .orderBy($"doc_id")
      },
      Some(raw"""WITH t AS (SELECT doc_id,
            list_filter(regexp_split_to_array(lower(coalesce(text, '')),
              '\s+'), x -> x <> '') AS toks
          FROM documents),
        base AS (SELECT doc_id, toks,
            CAST(len(array_to_string(toks, ' ')) AS BIGINT) AS tc
          FROM t),
        tagged AS (SELECT doc_id, tc, n,
            unnest(list_transform(range(0, GREATEST(len(toks) - n + 1, 0)),
              i -> array_to_string(toks[i + 1 : i + n], ' '))) AS g
          FROM base CROSS JOIN (SELECT unnest(range(2, 5)) AS n) ns),
        cnt AS (SELECT doc_id, tc, n, g, COUNT(*) AS c
          FROM tagged GROUP BY doc_id, tc, n, g),
        mxs AS (SELECT doc_id, tc, n, MAX(c * len(g)) AS mx
          FROM cnt GROUP BY doc_id, tc, n),
        piv AS (SELECT doc_id,
            MAX(CASE WHEN n = 2 THEN ROUND(CAST(mx AS DOUBLE) / tc, 6) END)
              AS top2_frac,
            MAX(CASE WHEN n = 3 THEN ROUND(CAST(mx AS DOUBLE) / tc, 6) END)
              AS top3_frac,
            MAX(CASE WHEN n = 4 THEN ROUND(CAST(mx AS DOUBLE) / tc, 6) END)
              AS top4_frac
          FROM mxs GROUP BY doc_id)
        SELECT b.doc_id,
          COALESCE(piv.top2_frac, 0.0) AS top2_frac,
          COALESCE(piv.top3_frac, 0.0) AS top3_frac,
          COALESCE(piv.top4_frac, 0.0) AS top4_frac
        FROM base b LEFT JOIN piv ON b.doc_id = piv.doc_id
        ORDER BY b.doc_id""")),

    // ---- weighted sampling without replacement (A-ES) ------------------
    // Efraimidis–Spirakis exponential-rank sampling: key = ln(u)/w with
    // u an md5-derived uniform and w a per-document quality weight
    // (char entropy + 0.1 here) — the top-k keys ARE a weighted sample
    // without replacement, deterministic under any partitioning and
    // replayable by the oracle (no rand()). Scale shape: zero-shuffle
    // score projection + bounded TakeOrdered; keys are rounded (9 dp,
    // the q61/q63 float-rank discipline) so cross-engine ln ulps can't
    // flip the cut.
    QueryDef(
      "q85_weighted_sample",
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
        val w = round(element_at(graft.functions.SketchExpressions
          .char_entropy(lower(coalesce($"text", lit("")))), 2), 6) + 0.1
        val u = conv(substring(md5(concat(lit("ws:"),
            $"doc_id".cast("string"))), 1, 15), 16, 10)
          .cast("double") / lit(1152921504606846976.0)
        docs.select($"doc_id", w.as("__w"), u.as("__u"))
          .select($"doc_id", round($"__w", 6).as("w"),
            round(log($"__u") / $"__w", 9).as("key"))
          .orderBy($"key".desc, $"doc_id")
          .limit(100)
      },
      Some(raw"""WITH ch AS (SELECT doc_id,
            unnest(string_split(lower(coalesce(text, '')), '')) AS c
          FROM documents),
        f AS (SELECT doc_id, c, COUNT(*) AS n FROM ch
          WHERE ascii(c) BETWEEN 32 AND 126 GROUP BY doc_id, c),
        tt AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS t
          FROM f GROUP BY doc_id),
        e0 AS (SELECT f.doc_id,
            ROUND(-SUM((CAST(n AS DOUBLE) / t) * LN(CAST(n AS DOUBLE) / t)), 6)
              AS ent
          FROM f JOIN tt ON f.doc_id = tt.doc_id GROUP BY f.doc_id),
        base AS (SELECT d.doc_id, COALESCE(e0.ent, 0.0) + 0.1 AS w,
            CAST(('0x' || substr(md5('ws:' || CAST(d.doc_id AS VARCHAR)),
              1, 15)) AS BIGINT) / 1152921504606846976.0 AS u
          FROM documents d LEFT JOIN e0 ON d.doc_id = e0.doc_id)
        SELECT doc_id, ROUND(w, 6) AS w, ROUND(LN(u) / w, 9) AS key
        FROM base ORDER BY key DESC, doc_id LIMIT 100""")),

    // ---- vocabulary building: corpus-wide term frequencies -------------
    // explode tokens -> count per term -> top terms with deterministic
    // tie-break; the classic map-side-combinable shape (partial
    // aggregation before the shuffle moves terms, not documents).
    QueryDef(
      "q43_vocabulary",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "documents")
          .select(explode(split(
            trim(regexp_replace(regexp_replace(lower($"text"),
              "[^a-z0-9 ]", " "), " +", " ")), " ")).as("term"))
          .filter($"term" =!= "")
          .groupBy($"term")
          .agg(count(lit(1)).as("tf"))
          .orderBy($"tf".desc, $"term")
          .limit(50)
      },
      Some("""SELECT term, COUNT(*) AS tf FROM (
          SELECT unnest(list_filter(regexp_split_to_array(
            trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
              ' +', ' ', 'g')), ' '), t -> t <> '')) AS term
          FROM documents) t
        GROUP BY term ORDER BY tf DESC, term LIMIT 50""")),

    // ---- repetition quality filter (Gopher-style) ----------------------
    // Per-document duplicate-word fraction and top-bigram fraction, the
    // word-level analogues of Gopher's "duplicate line fraction" /
    // "top 2-gram fraction" repetition rules (Rae et al. 2021, §A1.1).
    // Everything is computed WITHIN the row (array_distinct + a sorted-
    // run fold for the modal bigram count) — a pure projection with zero
    // shuffle, so the filter streams at scan speed on any corpus size.
    // The oracle reaches the same numbers the relational way (explode +
    // group-by), certifying the in-row fold against an independent
    // formulation.
    QueryDef(
      "q48_repetition",
      (s, dir) => {
        import s.implicits._
        // one-pass codegen kernel: [nTokens, nDistinct, maxBigramCount]
        // (the interpreted zip_with/array_sort/aggregate-fold chain cost
        // ~0.9 s per 5k docs; same lesson as char_ngrams in q47)
        val base = table(s, dir, "documents")
          .select($"doc_id",
            graft.functions.SketchExpressions.rep_stats($"text").as("st"))
          .select($"doc_id", $"st" (0).as("n"), $"st" (1).as("u"),
            $"st" (2).as("mx"))
        val dw = lit(1.0) - $"u".cast("double") / $"n".cast("double")
        val tb = $"mx".cast("double") / ($"n" - 1).cast("double")
        base
          .select($"doc_id",
            round(dw, 6).as("dup_word_frac"),
            when($"n" >= 2, round(tb, 6)).as("top_bigram_frac"),
            (dw > 0.6 || (($"n" >= 2) && tb > 0.05)).as("flagged"))
          .orderBy($"doc_id")
      },
      Some(raw"""WITH t AS (SELECT doc_id,
            list_filter(regexp_split_to_array(lower(text), '\s+'),
              x -> x <> '') AS toks
          FROM documents),
        base AS (SELECT doc_id, toks, len(toks) AS n,
            len(list_distinct(toks)) AS u FROM t),
        bg AS (SELECT doc_id,
            unnest(list_transform(range(1, n),
              i -> toks[i] || ' ' || toks[i+1])) AS g
          FROM base),
        bgc AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY doc_id, g),
        top AS (SELECT doc_id, MAX(c) AS mx FROM bgc GROUP BY doc_id)
        SELECT b.doc_id,
          ROUND(1.0 - CAST(u AS DOUBLE) / CAST(n AS DOUBLE), 6)
            AS dup_word_frac,
          CASE WHEN n >= 2 THEN
            ROUND(CAST(mx AS DOUBLE) / CAST(n - 1 AS DOUBLE), 6)
          END AS top_bigram_frac,
          (1.0 - CAST(u AS DOUBLE) / CAST(n AS DOUBLE)) > 0.6 OR
            (n >= 2 AND CAST(mx AS DOUBLE) / CAST(n - 1 AS DOUBLE) > 0.05)
            AS flagged
        FROM base b LEFT JOIN top USING (doc_id)
        ORDER BY doc_id""")),

    // ---- PII detection + redaction -------------------------------------
    // The corpus is synthetic word soup, so PII is injected
    // deterministically from doc_id — the SAME injection on both sides —
    // and the operator under test is the regexp detect/redact chain
    // (email, IPv4, phone), all codegen built-ins: zero shuffle, streams
    // at scan speed. Patterns stay inside the RE2 ∩ java.util.regex
    // common subset so both engines read them identically.
    QueryDef(
      "q49_pii_scrub",
      (s, dir) => {
        import s.implicits._
        val synth = concat($"text",
          lit(" contact user"), $"doc_id".cast("string"),
          lit("@mail.example or admin"), ($"doc_id" % 7).cast("string"),
          lit("@spam.test from 10."), ($"doc_id" % 200).cast("string"),
          lit(".0.1 call +1-555-"),
          lpad(($"doc_id" % 10000).cast("string"), 4, "0"))
        // redaction = codegen linear scanners exactly equivalent to the
        // email/ipv4/phone regex chain (OpsSpec pins the equivalence
        // against java.util.regex; the oracle certifies it against RE2)
        // — Java regex cost ~150 µs/doc here, the scanners ~10 µs.
        // Counts come from the redacted text (token occurrences via
        // plain replace), not separate regexp_count passes.
        def tokCount(c: org.apache.spark.sql.Column, tok: String) =
          ((length(c) - length(replace(c, lit(tok), lit("")))) / tok.length)
            .cast("int")
        table(s, dir, "documents")
          .withColumn("synth", synth)
          .withColumn("red",
            graft.functions.SketchExpressions.pii_redact($"synth"))
          .select($"doc_id",
            tokCount($"red", "<EMAIL>").as("n_emails"),
            tokCount($"red", "<IP>").as("n_ips"),
            tokCount($"red", "<PHONE>").as("n_phones"),
            md5($"red").as("red_md5"))
          .orderBy($"doc_id")
      },
      Some(raw"""WITH s AS (SELECT doc_id,
          text || ' contact user' || CAST(doc_id AS VARCHAR) ||
            '@mail.example or admin' || CAST(doc_id % 7 AS VARCHAR) ||
            '@spam.test from 10.' || CAST(doc_id % 200 AS VARCHAR) ||
            '.0.1 call +1-555-' ||
            lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS synth
          FROM documents),
        r AS (SELECT doc_id,
          regexp_replace(regexp_replace(regexp_replace(synth,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
            '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS red
          FROM s)
        SELECT doc_id,
          CAST((length(red) - length(replace(red, '<EMAIL>', ''))) // 7
            AS INT) AS n_emails,
          CAST((length(red) - length(replace(red, '<IP>', ''))) // 4
            AS INT) AS n_ips,
          CAST((length(red) - length(replace(red, '<PHONE>', ''))) // 7
            AS INT) AS n_phones,
          md5(red) AS red_md5
        FROM r ORDER BY doc_id""")),

    // ---- benchmark decontamination (eval-shingle overlap) --------------
    // Flag training documents sharing any 4-word shingle with the eval
    // set (doc_id % 50 = 0 stands in for a benchmark suite). The eval
    // side is distinct-shingled and BROADCAST — benchmark suites are
    // tiny next to a training corpus, so the corpus side never shuffles:
    // shingle, hash-probe the broadcast set, and only the (doc_id,
    // matched-shingle) survivors reach the per-doc count. Per-doc
    // shingles are array_distinct'd in-row so the count is a distinct
    // count without a countDistinct shuffle.
    QueryDef(
      "q50_decontaminate",
      (s, dir) => {
        import s.implicits._
        // distinct 4-word shingles via the codegen kernel (one pass per
        // doc; the interpreted transform+slice chain was 7+ s at sf0.1)
        def shingled(df: org.apache.spark.sql.DataFrame) = df
          .select($"doc_id",
            graft.functions.SketchExpressions.word_shingles($"text", 4)
              .as("shingles"))
        val docs = table(s, dir, "documents")
        val evalSh = shingled(docs.filter($"doc_id" % 50 === 0))
          .select(explode($"shingles").as("sh")).distinct()
        val trainSh = shingled(docs.filter($"doc_id" % 50 =!= 0))
          .select($"doc_id", explode($"shingles").as("sh"))
        trainSh.join(broadcast(evalSh), "sh")
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_shared"))
          .orderBy($"doc_id")
      },
      Some(raw"""WITH t AS (SELECT doc_id,
            list_filter(regexp_split_to_array(lower(text), '\s+'),
              x -> x <> '') AS toks
          FROM documents),
        sh AS (SELECT doc_id,
            unnest(list_distinct(list_transform(range(1, len(toks) - 2),
              i -> array_to_string(toks[i:i+3], ' ')))) AS s
          FROM t WHERE len(toks) >= 4),
        ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0),
        tr AS (SELECT doc_id, s FROM sh WHERE doc_id % 50 <> 0)
        SELECT tr.doc_id, COUNT(*) AS n_shared
        FROM tr JOIN ev USING (s)
        GROUP BY tr.doc_id ORDER BY doc_id""")),

    // ---- sequence packing (context-window batch assembly) --------------
    // Chunk the doc_id-ordered corpus into 256-token packs via a
    // distributed exclusive prefix sum (graft.ops.Packing — the
    // DistWindow bucket + broadcast-offset recipe, NO unpartitioned
    // window anywhere in the plan). The oracle computes the same prefix
    // sum with a plain global window, certifying the two-phase
    // formulation against the textbook one.
    QueryDef(
      "q52_seq_packing",
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
          .select($"doc_id",
            regexp_count($"text", lit("\\S+"))
              .cast("long").as("ntok"))
        graft.ops.Packing.packBySize(docs, "doc_id", "ntok", capacity = 256L)
          .groupBy($"pack_id")
          .agg(count(lit(1)).as("n_docs"), sum($"ntok").as("total_tokens"),
            min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
          .orderBy($"pack_id")
      },
      Some(raw"""WITH t AS (SELECT doc_id,
            len(list_filter(regexp_split_to_array(text, '\s+'),
              x -> x <> '')) AS ntok
          FROM documents),
        c AS (SELECT doc_id, ntok,
            COALESCE(SUM(ntok) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
          FROM t),
        p AS (SELECT doc_id, ntok, CAST(bef // 256 AS BIGINT) AS pack_id FROM c)
        SELECT pack_id, COUNT(*) AS n_docs,
          CAST(SUM(ntok) AS BIGINT) AS total_tokens,
          MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        FROM p GROUP BY pack_id ORDER BY pack_id""")),

    // ---- TF-IDF term weighting -----------------------------------------
    // tf comes straight off the scan: the term_counts kernel counts per
    // document where the document already lives (doc_id IS the row key),
    // so only DISTINCT (doc, term) rows exist after the explode — token
    // occurrences never cross a shuffle. df is a term-partitioned window
    // count over that same relation: ONE term-keyed exchange serves both
    // df and the score (no tf⋈df join, no second aggregation). N rides
    // along as a broadcast 1-row aggregate (the q14 trick, no driver
    // count()). idf is the smoothed ln((N+1)/(df+1)) + 1. Top 50 scores
    // with a total-order tie-break.
    QueryDef(
      "q54_tfidf",
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
        val tf = docs.select($"doc_id",
            explode(graft.functions.SketchExpressions
              .term_counts(coalesce($"text", lit("")))).as("tc"))
          .select($"doc_id", $"tc.term".as("term"), $"tc.tf".as("tf"))
        val nDf = broadcast(docs.agg(count(lit(1)).as("__n")))
        tf.withColumn("df", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy($"term")))
          .crossJoin(nDf)
          .withColumn("score",
            $"tf" * (log(($"__n" + 1).cast("double") / ($"df" + 1)) + 1.0))
          .select($"doc_id", $"term", $"tf", $"df",
            round($"score", 6).as("score"))
          .orderBy($"score".desc, $"doc_id", $"term")
          .limit(50)
      },
      Some(raw"""WITH terms AS (
          SELECT doc_id,
            unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
              t -> t <> '')) AS term
          FROM documents),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf
          FROM terms GROUP BY doc_id, term),
        df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        n AS (SELECT COUNT(*) AS n FROM documents)
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
          ROUND(tf.tf * (LN(CAST(n.n + 1 AS DOUBLE) / (df.df + 1)) + 1.0), 6)
            AS score
        FROM tf JOIN df USING (term) CROSS JOIN n
        ORDER BY score DESC, tf.doc_id, tf.term LIMIT 50""")),

    // ---- printable-ASCII character entropy (quality signal) ------------
    // Low char entropy = boilerplate/repetition, near-uniform = encoded
    // blobs (the C4/Gopher filter family's cheapest signal). One-pass
    // codegen kernel, zero shuffle — the whole query is scan → project →
    // sort. The oracle recomputes the 95-bucket histogram relationally;
    // both sides meet at the round-6 contract (q57/q61 convention). The
    // JVM kernel counts UTF-16 units, the oracle counts codepoints —
    // equivalent under the printable-ASCII filter, where every counted
    // char is one unit AND one codepoint.
    QueryDef(
      "q74_char_entropy",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "documents")
          .select($"doc_id",
            graft.functions.SketchExpressions
              .char_entropy(lower(coalesce($"text", lit("")))).as("st"))
          .select($"doc_id",
            element_at($"st", 1).cast("long").as("n_ascii"),
            round(element_at($"st", 2), 6).as("entropy"))
          .orderBy($"doc_id")
      },
      Some(raw"""WITH ch AS (SELECT doc_id,
            unnest(string_split(lower(coalesce(text, '')), '')) AS c
          FROM documents),
        f AS (SELECT doc_id, c, COUNT(*) AS n FROM ch
          WHERE ascii(c) BETWEEN 32 AND 126 GROUP BY doc_id, c),
        tt AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS t
          FROM f GROUP BY doc_id),
        e AS (SELECT f.doc_id,
            ROUND(-SUM((CAST(n AS DOUBLE) / t) * LN(CAST(n AS DOUBLE) / t)), 6)
              AS entropy
          FROM f JOIN tt ON f.doc_id = tt.doc_id GROUP BY f.doc_id)
        SELECT d.doc_id, COALESCE(tt.t, 0) AS n_ascii,
          COALESCE(e.entropy, 0.0) AS entropy
        FROM documents d
        LEFT JOIN tt ON d.doc_id = tt.doc_id
        LEFT JOIN e ON d.doc_id = e.doc_id
        ORDER BY d.doc_id""")),

    // ---- BM25 query scoring (round 7) ----------------------------------
    // The IR-standard relevance score over a fixed query-term set
    // (Robertson k1=1.2, b=0.75, +1 idf so weights stay positive).
    // Scale shape: per-doc term frequencies and length come straight
    // off the term_counts kernel with ARRAY builtins — no explode, no
    // shuffle; the corpus stats (N, Σdl, per-term df) ride as ONE
    // broadcast 1-row aggregate; scoring is a zero-shuffle projection
    // and the top-20 is a bounded TakeOrdered on the rounded score.
    // The per-row formula is pure scalar arithmetic, identical
    // operation order on both engines (ln + round-6 discipline).
    QueryDef(
      "q91_bm25",
      (s, dir) => {
        graft.ops.Bm25.score(table(s, dir, "documents"), "text", "doc_id",
          terms = Seq("join", "vector", "stream"),
          k1 = 1.2, b = 0.75, topK = 20)
      },
      Some(raw"""WITH terms AS (
          SELECT doc_id,
            unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
              t -> t <> '')) AS term
          FROM documents),
        tc AS (SELECT doc_id, term, COUNT(*) AS c FROM terms
          GROUP BY doc_id, term),
        dv0 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS dl,
            CAST(COALESCE(SUM(CASE WHEN term = 'join' THEN c END), 0)
              AS BIGINT) AS tf0,
            CAST(COALESCE(SUM(CASE WHEN term = 'vector' THEN c END), 0)
              AS BIGINT) AS tf1,
            CAST(COALESCE(SUM(CASE WHEN term = 'stream' THEN c END), 0)
              AS BIGINT) AS tf2
          FROM tc GROUP BY doc_id),
        dv AS (SELECT d.doc_id, COALESCE(dv0.dl, 0) AS dl,
            COALESCE(dv0.tf0, 0) AS tf0, COALESCE(dv0.tf1, 0) AS tf1,
            COALESCE(dv0.tf2, 0) AS tf2
          FROM documents d LEFT JOIN dv0 ON d.doc_id = dv0.doc_id),
        st AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS dltot,
            CAST(SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
            CAST(SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
            CAST(SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
          FROM dv)
        SELECT doc_id, dl, ROUND(
          LN(1.0 + (CAST(n AS DOUBLE) - CAST(df0 AS DOUBLE) + 0.5)
            / (CAST(df0 AS DOUBLE) + 0.5))
            * (CAST(tf0 AS DOUBLE) * 2.2)
            / (CAST(tf0 AS DOUBLE) + 1.2 * (1.0 - 0.75
              + 0.75 * CAST(dl AS DOUBLE)
                / (CAST(dltot AS DOUBLE) / CAST(n AS DOUBLE)))) +
          LN(1.0 + (CAST(n AS DOUBLE) - CAST(df1 AS DOUBLE) + 0.5)
            / (CAST(df1 AS DOUBLE) + 0.5))
            * (CAST(tf1 AS DOUBLE) * 2.2)
            / (CAST(tf1 AS DOUBLE) + 1.2 * (1.0 - 0.75
              + 0.75 * CAST(dl AS DOUBLE)
                / (CAST(dltot AS DOUBLE) / CAST(n AS DOUBLE)))) +
          LN(1.0 + (CAST(n AS DOUBLE) - CAST(df2 AS DOUBLE) + 0.5)
            / (CAST(df2 AS DOUBLE) + 0.5))
            * (CAST(tf2 AS DOUBLE) * 2.2)
            / (CAST(tf2 AS DOUBLE) + 1.2 * (1.0 - 0.75
              + 0.75 * CAST(dl AS DOUBLE)
                / (CAST(dltot AS DOUBLE) / CAST(n AS DOUBLE)))), 6) AS score
        FROM dv CROSS JOIN st
        ORDER BY score DESC, doc_id LIMIT 20""")),

    // ---- Zipf/vocabulary corpus diagnostics (round 7) -------------------
    // The corpus-health report a curation run checks before training: a
    // natural corpus follows Zipf's law (log-log rank-frequency slope
    // near -1); template spam, boilerplate floods and synthetic data
    // bend the curve. One map-side-combinable term count, then TWO
    // bounded branches off it: full-vocabulary totals (1-row combinable
    // agg) and an OLS fit of ln(freq) on ln(rank) over the top-1000
    // terms — the candidate set is a bounded TakeOrdered (no global
    // sort), the rank a row_number over those 1000 rows (partitioned on
    // a constant-by-construction key for the plan audit — the table IS
    // driver-bounded), and the fit a codegen regr_slope/regr_r2. Also
    // emits the Gopher-style top-10 token mass fraction. round-6 on the
    // regression doubles absorbs engine association order.
    QueryDef(
      "q94_zipf_stats",
      (s, dir) => {
        graft.ops.Zipf.stats(table(s, dir, "documents"), "text",
          headN = 1000)
      },
      Some(raw"""WITH terms AS (SELECT
            unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
              t -> t <> '')) AS term
          FROM documents),
        gc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM terms
          GROUP BY term),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size,
          CAST(SUM(cnt) AS BIGINT) AS total_tokens FROM gc),
        top AS (SELECT term, cnt, CAST(ROW_NUMBER() OVER (
              ORDER BY cnt DESC, term) AS BIGINT) AS r
          FROM (SELECT term, cnt FROM gc
            ORDER BY cnt DESC, term LIMIT 1000)),
        reg AS (SELECT
            ROUND(regr_slope(ln(CAST(cnt AS DOUBLE)),
              ln(CAST(r AS DOUBLE))), 6) AS zipf_slope,
            ROUND(regr_r2(ln(CAST(cnt AS DOUBLE)),
              ln(CAST(r AS DOUBLE))), 6) AS zipf_r2,
            CAST(SUM(CASE WHEN r <= 10 THEN cnt ELSE 0 END) AS BIGINT)
              AS top10 FROM top)
        SELECT tot.vocab_size, tot.total_tokens,
          ROUND(CAST(reg.top10 AS DOUBLE)
            / CAST(tot.total_tokens AS DOUBLE), 6) AS top10_frac,
          reg.zipf_slope, reg.zipf_r2
        FROM tot CROSS JOIN reg"""))
  )
}
