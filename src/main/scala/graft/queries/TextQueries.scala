package graft.queries

import org.apache.spark.sql.functions._
import QueryDef.table

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
    // shape at scale (shuffle on digest, not on full text).
    QueryDef(
      "q20_dedup_exact",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "documents")
          .withColumn("norm",
            regexp_replace(
              regexp_replace(lower($"text"), "[^a-z0-9 ]", " "),
              " +", " "))
          .withColumn("h", md5(trim($"norm")))
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
    QueryDef(
      "q21_token_count",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "documents")
          .select($"doc_id",
            size(filter(split($"text", "\\s+"), t => t =!= "")).as("n_tokens"),
            size(filter(split($"text", "[^A-Za-z0-9]+"), t => t =!= ""))
              .as("n_words"),
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
        val toks = filter(split(lower($"text"), "[^a-zà-ÿäöüß]+"), t => t =!= "")
        def hits(ws: Seq[String]) = {
          val arr = array(ws.map(lit): _*)
          size(filter(toks, t => array_contains(arr, t)))
        }
        table(s, dir, "documents")
          .select($"doc_id", $"lang",
            hits(stopEn).as("s_en"), hits(stopDe).as("s_de"),
            hits(stopFr).as("s_fr"), hits(stopEs).as("s_es"))
          .withColumn("predicted",
            when($"s_en" >= $"s_de" && $"s_en" >= $"s_fr" && $"s_en" >= $"s_es" && $"s_en" > 0, "en")
              .when($"s_de" >= $"s_fr" && $"s_de" >= $"s_es" && $"s_de" > 0, "de")
              .when($"s_fr" >= $"s_es" && $"s_fr" > 0, "fr")
              .when($"s_es" > 0, "es")
              .otherwise("unknown"))
          .groupBy($"lang", $"predicted")
          .agg(count(lit(1)).as("n"))
          .orderBy($"lang", $"predicted")
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
          .orderBy($"lang", $"source", $"rk")
      },
      Some("""SELECT lang, source, doc_id, rk FROM (
          SELECT lang, source, doc_id,
            CAST(ROW_NUMBER() OVER (PARTITION BY lang, source
              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS rk
          FROM documents) t
        WHERE rk <= 5 ORDER BY lang, source, rk""")),

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
        GROUP BY term ORDER BY tf DESC, term LIMIT 50"""))
  )
}
