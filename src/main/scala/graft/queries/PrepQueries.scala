package graft.queries

import org.apache.spark.sql.functions._
import QueryDef.table
import graft.functions.SketchExpressions

/** Training-prep operators: deterministic global shuffle (the epoch-
  * ordering step every pretraining pipeline ends with), blocklist phrase
  * filtering, overlapping context-window chunking, Rademacher random-
  * projection dimensionality reduction, and winnowing fingerprints
  * (MOSS-style sampled near-dup index). All formulated identically in
  * Spark and DuckDB so the oracle hash-checks them.
  */
object PrepQueries {

  val defs: Seq[QueryDef] = Seq(
    // ---- deterministic global shuffle ----------------------------------
    // Seeded corpus shuffle with EXACT global positions: sort key =
    // md5(seed || doc_id), position = global rank under (key, doc_id).
    // The rank comes from DistWindow.withGlobalRank — row_number within
    // hash-prefix buckets plus broadcast per-bucket offsets (two-phase
    // distributed rank), so NO window task ever sees more than one
    // bucket (~1/256 of the corpus) while the oracle's textbook
    // unpartitioned ROW_NUMBER certifies the result. At 100 TB the
    // positions feed deterministic epoch sharding (pos % nShards)
    // without any single-task sort.
    QueryDef(
      "q66_global_shuffle",
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
          .select($"doc_id",
            md5(concat(lit("ep7:"), $"doc_id".cast("string"))).as("skey"))
        graft.ops.DistWindow.withGlobalRank(docs,
            conv(substring($"skey", 1, 2), 16, 10).cast("long"),
            Seq($"skey", $"doc_id"), "pos")
          .select($"doc_id", $"skey", $"pos")
          .orderBy($"pos")
      },
      Some("""SELECT doc_id,
          md5('ep7:' || CAST(doc_id AS VARCHAR)) AS skey,
          ROW_NUMBER() OVER (
            ORDER BY md5('ep7:' || CAST(doc_id AS VARCHAR)), doc_id) AS pos
        FROM documents ORDER BY pos""")),

    // ---- blocklist phrase filter ---------------------------------------
    // Flag documents containing any of a bounded banned-phrase list —
    // here the 10 most frequent 3-word shingles (by document frequency)
    // stand in for a curated blocklist, so the result is deterministic
    // and non-trivially populated. Scale shape: the list is built by a
    // map-side-combinable DF aggregation + bounded top-10, broadcast,
    // then matched with ONE substring scan per (doc, phrase) — a
    // broadcast nested-loop join with a deliberately tiny side (the
    // production form runs the same bounded list through one
    // Aho-Corasick pass per row; at ≤ dozens of phrases per-needle
    // contains is equivalent work). Zero shuffle of documents.
    QueryDef(
      "q67_blocklist",
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
        val top = docs
          .select(explode(SketchExpressions.word_shingles($"text", 3)).as("ph"))
          .groupBy($"ph").agg(count(lit(1)).as("df"))
          .orderBy($"df".desc, $"ph").limit(10)
          .select($"ph")
        docs
          .select($"doc_id",
            regexp_replace(lower($"text"), "\\s+", " ").as("__norm"))
          .join(broadcast(top), contains($"__norm", $"ph"))
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_banned"), min($"ph").as("first_banned"))
          .orderBy($"doc_id")
      },
      Some(raw"""WITH t AS (SELECT doc_id,
            list_filter(regexp_split_to_array(lower(text), '\s+'),
              x -> x <> '') AS toks,
            regexp_replace(lower(text), '\s+', ' ', 'g') AS norm
          FROM documents),
        sh AS (SELECT doc_id,
            unnest(list_distinct(list_transform(range(1, len(toks) - 1),
              i -> array_to_string(list_slice(toks, i, i + 2), ' ')))) AS ph
          FROM t WHERE len(toks) >= 3),
        top AS (SELECT ph FROM (SELECT ph, COUNT(*) AS df FROM sh GROUP BY ph
          ORDER BY df DESC, ph LIMIT 10))
        SELECT doc_id, COUNT(*) AS n_banned, MIN(ph) AS first_banned
        FROM t JOIN top ON contains(t.norm, top.ph)
        GROUP BY doc_id ORDER BY doc_id""")),

    // ---- overlapping context-window chunking ---------------------------
    // Split each document into 64-token chunks with stride 48 (16-token
    // overlap) — the RAG-indexing / long-document pretraining splitter.
    // Chunk count = ceil((n-16)/48) (min 1), so the last chunk always
    // reaches the end of the document. Pure per-row projection +
    // explode: zero shuffle, trivially data-parallel at any corpus size.
    QueryDef(
      "q68_chunk",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "documents")
          .select($"doc_id",
            filter(split(lower($"text"), "\\s+"), t => t =!= "").as("toks"))
          .withColumn("nc", greatest(lit(1L),
            ceil((size($"toks") - 16).cast("double") / 48.0)))
          .select($"doc_id", $"toks",
            explode(sequence(lit(0L), $"nc" - 1)).as("chunk_id"))
          .withColumn("chunk",
            slice($"toks", ($"chunk_id" * 48 + 1).cast("int"), lit(64)))
          .select($"doc_id", $"chunk_id",
            size($"chunk").cast("long").as("n_tok"),
            substring(md5(array_join($"chunk", " ")), 1, 16).as("fp"))
          .orderBy($"doc_id", $"chunk_id")
      },
      Some(raw"""WITH t AS (SELECT doc_id,
            list_filter(regexp_split_to_array(lower(text), '\s+'),
              x -> x <> '') AS toks
          FROM documents),
        c AS (SELECT doc_id, toks,
            GREATEST(1, CAST(CEIL((len(toks) - 16) / 48.0) AS BIGINT)) AS nc
          FROM t),
        ch AS (SELECT doc_id, toks, unnest(range(nc)) AS chunk_id FROM c)
        SELECT doc_id, chunk_id,
          len(list_slice(toks, chunk_id * 48 + 1, chunk_id * 48 + 64))
            AS n_tok,
          substr(md5(array_to_string(
            list_slice(toks, chunk_id * 48 + 1, chunk_id * 48 + 64), ' ')),
            1, 16) AS fp
        FROM ch ORDER BY doc_id, chunk_id""")),

    // ---- Rademacher random-projection reduction ------------------------
    // 64-d float embeddings compressed to 16 projection values against
    // the same md5-derived ±1 hyperplane family as the LSH surface
    // (Achlioptas 2003: sign-random projections preserve cosine in
    // expectation). One codegen kernel pass, zero shuffle; the oracle
    // regenerates the identical matrix from md5 hex nibbles and re-sums
    // every dot product (the q27 recipe).
    QueryDef(
      "q69_rand_proj",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "embeddings")
          .select($"vec_id",
            posexplode(SketchExpressions.rand_project($"embedding", 16)))
          .select($"vec_id", $"pos".cast("long").as("p"),
            round($"col", 5).as("proj"))
          .orderBy($"vec_id", $"p")
      },
      Some("""WITH planes AS (
          SELECT pp.p, jj.j,
            CASE WHEN substr(md5(pp.p || '_' || jj.j), 1, 1) >= '8'
              THEN -1.0 ELSE 1.0 END AS r
          FROM (SELECT unnest(range(16)) AS p) pp,
               (SELECT unnest(range(64)) AS j) jj),
        dots AS (
          SELECT e.vec_id, pl.p,
            SUM(CAST(e.embedding[pl.j + 1] AS DOUBLE) * pl.r) AS dot
          FROM embeddings e CROSS JOIN planes pl
          GROUP BY e.vec_id, pl.p)
        SELECT vec_id, CAST(p AS BIGINT) AS p, ROUND(dot, 5) AS proj
        FROM dots ORDER BY vec_id, p""")),

    // ---- winnowing fingerprints (sampled near-dup index) ---------------
    // Schleimer et al. 2003 (MOSS): per document, hash every 3-word
    // shingle, slide a 4-hash window, keep each window's minimum — two
    // documents sharing any ≥6-word passage are guaranteed a common
    // fingerprint while only ~2/(w+1) of shingle hashes survive. The
    // shared-fingerprint join then mirrors q56's digest-keyed shape but
    // shuffles the SAMPLED fingerprint set — the volume reduction is the
    // point at corpus scale. The kernel is one codegen pass; the oracle
    // re-derives every hash, window minimum, and share count.
    QueryDef(
      "q70_winnowing",
      (s, dir) => {
        import s.implicits._
        val fps = table(s, dir, "documents")
          .select($"doc_id",
            explode(SketchExpressions.winnow($"text", 3, 4)).as("fp"))
        val shared = fps.groupBy($"fp").agg(count(lit(1)).as("nd"))
          .filter($"nd" >= 2).select($"fp".as("sfp"))
        fps.join(shared, $"fp" === $"sfp", "left")
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_fp"),
            sum(when($"sfp".isNotNull, 1L).otherwise(0L)).as("n_shared"))
          .orderBy($"doc_id")
      },
      Some(raw"""WITH t AS (SELECT doc_id,
            list_filter(regexp_split_to_array(lower(text), '\s+'),
              x -> x <> '') AS toks
          FROM documents),
        hsrc AS (SELECT doc_id,
            list_transform(range(1, len(toks) - 1),
              i -> substr(md5(array_to_string(
                list_slice(toks, i, i + 2), ' ')), 1, 16)) AS hs
          FROM t WHERE len(toks) >= 3),
        fpt AS (SELECT doc_id,
            unnest(list_distinct(list_transform(
              range(1, GREATEST(1, len(hs) - 3) + 1),
              i -> list_min(list_slice(hs, i, i + 3))))) AS fp
          FROM hsrc),
        shared AS (SELECT fp AS sfp FROM fpt GROUP BY fp
          HAVING COUNT(*) >= 2)
        SELECT f.doc_id, COUNT(*) AS n_fp, COUNT(s.sfp) AS n_shared
        FROM fpt f LEFT JOIN shared s ON f.fp = s.sfp
        GROUP BY f.doc_id ORDER BY doc_id""")),

    // ---- composed prep chain: chunk -> shuffle -> pack -----------------
    // Documents to shuffled training batches in ONE lazy plan: split
    // into 64/48 chunks (q68), shuffle chunks deterministically with
    // exact global positions (q66's two-phase rank), then assign each
    // chunk to a 256-token context window by the distributed exclusive
    // prefix sum (q52's Packing) keyed on the shuffle position — no
    // unpartitioned window anywhere, while the oracle replays the whole
    // chain with textbook global windows. The shape a pretraining data
    // loader actually consumes.
    QueryDef(
      "q71_prep_pipeline",
      (s, dir) => {
        import s.implicits._
        val chunks = table(s, dir, "documents")
          .select($"doc_id",
            filter(split(lower($"text"), "\\s+"), t => t =!= "").as("toks"))
          .withColumn("nc", greatest(lit(1L),
            ceil((size($"toks") - 16).cast("double") / 48.0)))
          .select($"doc_id", $"toks",
            explode(sequence(lit(0L), $"nc" - 1)).as("chunk_id"))
          .select($"doc_id", $"chunk_id",
            size(slice($"toks", ($"chunk_id" * 48 + 1).cast("int"), lit(64)))
              .cast("long").as("n_tok"),
            md5(concat(lit("ep:"), $"doc_id".cast("string"), lit(":"),
              $"chunk_id".cast("string"))).as("skey"))
        val ranked = graft.ops.DistWindow.withGlobalRank(chunks,
          conv(substring($"skey", 1, 2), 16, 10).cast("long"),
          Seq($"skey", $"doc_id", $"chunk_id"), "pos")
        graft.ops.Packing
          .withRunningBefore(ranked, "pos", "n_tok", "__before")
          .select($"doc_id", $"chunk_id", $"n_tok", $"pos",
            floor($"__before" / 256).cast("long").as("pack_id"))
          .orderBy($"pos")
      },
      Some(raw"""WITH t AS (SELECT doc_id,
            list_filter(regexp_split_to_array(lower(text), '\s+'),
              x -> x <> '') AS toks
          FROM documents),
        c AS (SELECT doc_id, toks,
            GREATEST(1, CAST(CEIL((len(toks) - 16) / 48.0) AS BIGINT)) AS nc
          FROM t),
        ch AS (SELECT doc_id, toks, unnest(range(nc)) AS chunk_id FROM c),
        sized AS (SELECT doc_id, chunk_id,
            len(list_slice(toks, chunk_id * 48 + 1, chunk_id * 48 + 64))
              AS n_tok,
            md5('ep:' || CAST(doc_id AS VARCHAR) || ':' ||
              CAST(chunk_id AS VARCHAR)) AS skey
          FROM ch),
        r AS (SELECT *, ROW_NUMBER() OVER (
            ORDER BY skey, doc_id, chunk_id) AS pos FROM sized),
        p AS (SELECT *, CAST(COALESCE(SUM(n_tok) OVER (ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS before_tok FROM r)
        SELECT doc_id, chunk_id, n_tok, pos,
          CAST(before_tok // 256 AS BIGINT) AS pack_id
        FROM p ORDER BY pos""")),

    // ---- exact global quantile quality gate ----------------------------
    // The FineWeb-style selection step: score every document (char
    // entropy, the q74 zero-shuffle kernel), keep the top 60% by EXACT
    // global rank. The rank is DistWindow.withGlobalRank bucketed on a
    // coarse entropy band (band order aligned with the sort, so no
    // window task sees more than one band); the quantile cut is pure
    // integer arithmetic (rk·10 ≤ n·6 — no float threshold whose
    // representation could flip a boundary row), with n riding as a
    // broadcast 1-row aggregate. The oracle recomputes the entropy, the
    // textbook unpartitioned rank, and the same integer cut.
    QueryDef(
      "q82_quality_gate",
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
          .select($"doc_id",
            round(element_at(SketchExpressions
              .char_entropy(lower(coalesce($"text", lit("")))), 2), 6)
              .as("ent"))
        val n = broadcast(docs.agg(count(lit(1)).as("__n")))
        graft.ops.DistWindow.withGlobalRank(docs,
            lit(100L) - floor($"ent" * 20.0).cast("long"),
            Seq($"ent".desc, $"doc_id"), "rk")
          .crossJoin(n)
          .select($"doc_id", $"ent", $"rk",
            ($"rk" * 10 <= $"__n" * 6).as("kept"))
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
        e AS (SELECT d.doc_id, COALESCE(e0.ent, 0.0) AS ent
          FROM documents d LEFT JOIN e0 ON d.doc_id = e0.doc_id),
        r AS (SELECT doc_id, ent, CAST(ROW_NUMBER() OVER (
            ORDER BY ent DESC, doc_id) AS BIGINT) AS rk FROM e),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents)
        SELECT r.doc_id, r.ent, r.rk, (r.rk * 10 <= nn.n * 6) AS kept
        FROM r CROSS JOIN nn""")),

    // ---- training-shard manifest (round 7) ------------------------------
    // The output stage of a curation pipeline: deterministic shard
    // assignment (a 32-bit md5 slice of the doc id — reproducible on
    // any engine, no engine-private hash) plus the per-shard manifest a
    // trainer consumes: doc/token/char totals, id range, and an
    // ORDER-INDEPENDENT content signature (bit_xor of a 60-bit md5
    // slice of each doc's text) so two engines writing the same shard
    // in different row orders certify identical content. Scale shape:
    // one projection + ONE map-side-combinable aggregation — with
    // thousands of shards the key distributes uniformly by
    // construction, partials are one row per (task, shard), and every
    // aggregate (count/min/max/sum/bit_xor) combines associatively.
    QueryDef(
      "q93_shard_manifest",
      (s, dir) => {
        graft.ops.Shards.manifest(table(s, dir, "documents"),
          "text", "doc_id", nShards = 16)
      },
      Some(raw"""WITH d AS (SELECT
            CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 16 AS shard,
            doc_id,
            CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
              t -> t <> '')) AS BIGINT) AS tok,
            CAST(length(text) AS BIGINT) AS ch,
            CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS sig
          FROM documents)
        SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
          MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id,
          CAST(SUM(tok) AS BIGINT) AS n_tokens,
          CAST(SUM(ch) AS BIGINT) AS n_chars,
          bit_xor(sig) AS content_sig
        FROM d GROUP BY shard ORDER BY shard""")),

    // ---- shard compaction plan (small-files problem) -------------------
    // A 64-way delivery (the q93 md5 shard contract) compacted into
    // ≈8 output files by next-fit over the shard order: output group =
    // ⌊bytes-before DIV target⌋ with target = total DIV 8 + 1. One
    // combinable per-shard size aggregation + the two-phase distributed
    // prefix sum (Shards.compactionPlan); groups are contiguous shard
    // ranges by construction — the property PrepSpec pins — so merged
    // manifests roll up without interleaving (the q131 promise).
    // Target derives from a 1-row total broadcast; char length is the
    // engine-portable byte proxy (both engines measure identically).
    QueryDef(
      "q147_compaction_plan",
      (s, dir) => {
        import s.implicits._
        val perShard = table(s, dir, "documents")
          .select(
            (conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10)
              .cast("long") % 64).as("shard"),
            length($"text").cast("long").as("ch"))
          .groupBy($"shard").agg(sum($"ch").as("bytes"))
        val tgt = perShard.agg((sum($"bytes") / 8).cast("long").as("t0"))
          .select(($"t0" + 1).as("target"))
        val planned = graft.ops.Packing.withRunningBefore(
            perShard.crossJoin(broadcast(tgt)), "shard", "bytes", "__before")
          .withColumn("out_group", expr("__before DIV target"))
        planned.groupBy($"out_group")
          .agg(count(lit(1)).as("n_shards"), sum($"bytes").as("total_bytes"),
            min($"shard").as("first_shard"), max($"shard").as("last_shard"))
          .orderBy($"out_group")
      },
      Some(raw"""WITH d AS (SELECT
            CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 64 AS shard,
            CAST(length(text) AS BIGINT) AS ch
          FROM documents),
        ps AS (SELECT shard, CAST(SUM(ch) AS BIGINT) AS bytes FROM d
          GROUP BY shard),
        t AS (SELECT CAST(SUM(bytes) AS BIGINT) // 8 + 1 AS target FROM ps),
        pl AS (SELECT shard, bytes,
            CAST(COALESCE(SUM(bytes) OVER (ORDER BY shard
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) // target AS out_group
          FROM ps CROSS JOIN t)
        SELECT out_group, COUNT(*) AS n_shards,
          CAST(SUM(bytes) AS BIGINT) AS total_bytes,
          MIN(shard) AS first_shard, MAX(shard) AS last_shard
        FROM pl GROUP BY out_group ORDER BY out_group"""))
  )
}
