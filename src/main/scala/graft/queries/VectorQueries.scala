package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import QueryDef.table

/** Embedding-column operators over `embeddings` (builder-prompt surface:
  * similarity search + embedding near-dup). Brute-force cosine is the
  * verifiable baseline; the LSH/IVF scale path lives in graft.ops.Ann
  * with rows-only checks.
  */
object VectorQueries {

  /** codegen'd float dot product — sequential double fold, deterministic. */
  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot_f(a, b)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  val defs: Seq[QueryDef] = Seq(
    // ---- brute-force cosine top-k vs a fixed query vector --------------
    QueryDef(
      "q26_ann_brute",
      (s, dir) => {
        import s.implicits._
        val emb = table(s, dir, "embeddings")
        val q = emb.filter($"vec_id" === 1)
          .select($"embedding".as("qe"))
        emb.filter($"vec_id" =!= 1)
          .crossJoin(broadcast(q))
          .select($"vec_id",
            round(dot($"embedding", $"qe") / (norm($"embedding") * norm($"qe")), 5)
              .as("sim"))
          .orderBy($"sim".desc, $"vec_id")
          .limit(10)
      },
      Some("""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 1),
        pairs AS (
          SELECT e.vec_id,
            CAST(e.embedding[t.i] AS DOUBLE) AS ev,
            CAST(q.qe[t.i] AS DOUBLE) AS qv
          FROM embeddings e CROSS JOIN q
          CROSS JOIN generate_series(1, 64) t(i)
          WHERE e.vec_id <> 1),
        sims AS (
          SELECT vec_id,
            ROUND(SUM(ev * qv) / (SQRT(SUM(ev * ev)) * SQRT(SUM(qv * qv))), 5) AS sim
          FROM pairs GROUP BY vec_id)
        SELECT vec_id, sim FROM sims
        ORDER BY sim DESC, vec_id LIMIT 10""")),

    // ---- embedding near-dup pairs (label-blocked cosine join) ----------
    // Blocking on `label` bounds the candidate set (the same role an LSH
    // bucket plays at scale), then the precise cosine threshold verifies.
    QueryDef(
      "q27_embedding_dedup",
      (s, dir) => {
        import s.implicits._
        // norms are computed once per row BEFORE the pair join (2k rows,
        // not 2M pairs) — same doubles, a third of the flops
        val a = table(s, dir, "embeddings")
          .select($"vec_id".as("id_a"), $"embedding".as("ea"), $"label",
            sqrt(dot($"embedding", $"embedding")).as("norm_a"))
        val b = table(s, dir, "embeddings")
          .select($"vec_id".as("id_b"), $"embedding".as("eb"), $"label",
            sqrt(dot($"embedding", $"embedding")).as("norm_b"))
        a.join(b, Seq("label"))
          .filter($"id_a" < $"id_b")
          .withColumn("sim",
            round(dot($"ea", $"eb") / ($"norm_a" * $"norm_b"), 5))
          .filter($"sim" > 0.4)
          .select($"label", $"id_a", $"id_b", $"sim")
          .orderBy($"label", $"id_a", $"id_b")
      },
      Some("""WITH pairs AS (
          SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
            CAST(a.embedding[t.i] AS DOUBLE) AS av,
            CAST(b.embedding[t.i] AS DOUBLE) AS bv
          FROM embeddings a
          JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
          CROSS JOIN generate_series(1, 64) t(i)),
        sims AS (
          SELECT label, id_a, id_b,
            ROUND(SUM(av * bv) / (SQRT(SUM(av * av)) * SQRT(SUM(bv * bv))), 5) AS sim
          FROM pairs GROUP BY label, id_a, id_b)
        SELECT label, id_a, id_b, sim FROM sims
        WHERE sim > 0.4
        ORDER BY label, id_a, id_b"""))
  )
}
