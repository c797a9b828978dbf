package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Directed contracts for the round-8 governance ops (the q110-q115
  * surface): funnel ordering/horizon semantics, decontamination
  * flagging, domain-cap ranking, delta-ingest staging.
  */
class GovernanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- Funnel.stageTimes ---------------------------------------------

  private val H = 1000L // tiny horizon for directed cases

  private def funnel(rows: Seq[(Long, String, Long)]) =
    graft.ops.Funnel.stageTimes(
      rows.toDF("user_id", "event_type", "us"),
      "user_id", "event_type", "us", Seq("a", "b", "c"), H)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap

  test("funnel: completed chain takes the FIRST qualifying event per step") {
    val m = funnel(Seq(
      (1L, "a", 100L), (1L, "a", 50L), // first a = 50
      (1L, "b", 40L), // before a: must not count
      (1L, "b", 200L), (1L, "b", 300L), // first b after a = 200
      (1L, "c", 250L))) // after b, inside horizon
    assert(m(1L) == (Some(50L), Some(200L), Some(250L)))
  }

  test("funnel: a step event BEFORE the previous step never matches") {
    val m = funnel(Seq((2L, "b", 10L), (2L, "a", 100L), (2L, "c", 200L)))
    // b exists only before a; chain stops at t0
    assert(m(2L) == (Some(100L), None, None))
  }

  test("funnel: the horizon bounds each step-to-step gap") {
    val m = funnel(Seq((3L, "a", 0L), (3L, "b", 1001L), (3L, "c", 1500L)))
    // b is 1001 > horizon 1000 after a
    assert(m(3L) == (Some(0L), None, None))
    val m2 = funnel(Seq((4L, "a", 0L), (4L, "b", 1000L), (4L, "c", 2001L)))
    // b exactly at horizon counts (<=); c is 1001 after b: out
    assert(m2(4L) == (Some(0L), Some(1000L), None))
  }

  test("funnel: a user with no first-step event completes nothing") {
    val m = funnel(Seq((5L, "b", 10L), (5L, "c", 20L)))
    assert(m(5L) == (None, None, None))
  }

  // ---- Ann.semanticDecontam ------------------------------------------

  test("semanticDecontam flags near-dups of the eval set, not strangers") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.01f, 0.0f)), // near-parallel to eval e1
      (2L, Array(0.0f, 1.0f, 0.0f)), // orthogonal to both eval vectors
      (3L, Array(0.0f, 0.0f, -1.0f))) // anti-parallel to eval e2
      .toDF("vec_id", "embedding")
    val ev = Seq((10L, Array(1.0f, 0.0f, 0.0f)),
      (11L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = graft.ops.Ann.semanticDecontam(corpus, ev, "embedding")
      .select($"vec_id", $"max_sim_u").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) > 99000L) // cos ~0.99995 in 1e-5 units
    assert(out(2L) == 0L)
    assert(out(3L) == 0L) // max picks the +1 eval direction? no: e1 gives 0
    // anti-parallel to e2 gives -1e5; vs e1 gives 0 -> max is 0
  }

  test("semanticDecontam: null corpus vector keeps a NULL sim (not the " +
      "empty-eval pin) so keep-clean filters exclude it") {
    val corpus = Seq((1L, Some(Array(1.0f, 0.0f))), (2L, None))
      .toDF("vec_id", "embedding")
    val ev = Seq((10L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = graft.ops.Ann.semanticDecontam(corpus, ev, "embedding")
    val byId = out.select($"vec_id", $"max_sim_u").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(byId(1L).contains(100000L))
    assert(byId(2L).isEmpty,
      "a row that can't be embedded must not read as 'similar to nothing'")
    // and the unembeddable row passes NEITHER side of a threshold split
    assert(out.filter($"max_sim_u" < 50000L).count() == 0L ||
      !out.filter($"max_sim_u" < 50000L).collect().exists(_.getLong(0) == 2L))
    assert(!out.filter($"max_sim_u" >= 50000L).collect()
      .exists(_.getLong(0) == 2L))
    // the empty-eval pin still fires for rows WITH vectors
    val pinned = graft.ops.Ann.semanticDecontam(
      corpus, ev.limit(0), "embedding")
      .select($"vec_id", $"max_sim_u").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(pinned(1L).contains(-100000L))
  }

  test("semanticDecontam rounds each pair BEFORE the max (integer max)") {
    // two eval vectors with sims straddling a rounding boundary must
    // produce exactly the max of the individually-rounded values
    val corpus = Seq((1L, Array(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val ev = Seq((10L, Array(1.0f, 0.0f)), (11L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = graft.ops.Ann.semanticDecontam(corpus, ev, "embedding")
      .select($"max_sim_u").head().getLong(0)
    // cos = 1/sqrt(2) = 0.7071067..., rounded at 1e-5 -> 70711
    assert(out == 70711L)
  }

  // ---- declared-query sanity over real testdata ----------------------

  private val dir = "/root/testdata/sf0.001"

  test("q110 keeps at most 15 docs per source, ranked by entropy") {
    val rows = SparkEntry.queries("q110_domain_cap")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nDocs = r.getAs[Long]("n_docs")
      val nKept = r.getAs[Long]("n_kept")
      assert(nKept <= 15L && nKept <= nDocs)
      assert(r.getAs[Long]("n_dropped") == nDocs - nKept)
    }
  }

  test("q112 ranks exactly one minimal-error banding as chosen") {
    val rows = SparkEntry.queries("q112_lsh_tune")(spark, dir).collect()
    assert(rows.length == 6)
    val errs = rows.map(_.getAs[Long]("err_nano"))
    val chosen = rows.filter(_.getAs[Boolean]("chosen"))
    assert(chosen.nonEmpty)
    assert(chosen.map(_.getAs[Long]("err_nano")).forall(_ == errs.min))
  }

  test("q115 delta-ingest drops base-digest and non-first-occurrence docs") {
    // replay the staging relationally and compare survivor counts
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("h", md5(graft.ops.Dedup.normalize($"text")))
    val baseH = docs.filter($"doc_id" % 3 === 0).select($"h").distinct()
    val dd = docs.filter($"doc_id" % 3 =!= 0).join(baseH, Seq("h"), "left_anti")
    val nFirst = dd.groupBy($"h").count().count()
    val manifest = SparkEntry.queries("q115_delta_ingest")(spark, dir)
    val total = manifest.agg(sum($"n_docs")).head().getLong(0)
    // gate only ever removes docs: survivors <= first occurrences
    assert(total <= nFirst && total > 0)
  }
}
