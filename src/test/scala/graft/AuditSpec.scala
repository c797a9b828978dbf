package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Directed contracts for the round-8 audit operators beyond the
  * oracle hash-gate: winner semantics of the quality-aware dedup, exact
  * proportions of the stratified split, coverage-curve invariants, and
  * the KS null case.
  */
class AuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("exactBest keeps the highest-quality copy, ties to lowest id") {
    val df = Seq(
      // digest group "a b": quality 5 wins over 3 regardless of order
      (1L, "a b", 3L), (2L, "a b", 5L), (3L, "A  b!", 5L),
      // singleton survives untouched
      (9L, "c", 1L)
    ).toDF("doc_id", "text", "q")
    val got = graft.ops.Dedup
      .exactBest(df, "text", "doc_id", "q", countCol = Some("n"))
      .select("doc_id", "q", "n").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // ids 2 and 3 tie on quality 5 (same normalized digest) -> lowest id 2
    assert(got == Set((2L, 5L, 3L), (9L, 1L, 1L)))
  }

  test("stratified split proportions are exact per stratum") {
    val df = (0 until 119).map { i =>
      (i.toLong, if (i < 100) "big" else if (i < 110) "mid" else "small")
    }.toDF("doc_id", "source").withColumn("lang", lit("en"))
    val out = graft.ops.Splits
      .stratified(df, Seq("lang", "source"), "doc_id")
      .groupBy($"source", $"split").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // floor semantics: n=100 -> 80/10/10, n=10 -> 8/1/1, n=9 -> 7/1/1
    assert(out(("big", "train")) == 80 && out(("big", "validation")) == 10
      && out(("big", "test")) == 10)
    assert(out(("mid", "train")) == 8 && out(("mid", "validation")) == 1
      && out(("mid", "test")) == 1)
    assert(out(("small", "train")) == 7 && out(("small", "validation")) == 1
      && out(("small", "test")) == 1)
    // deterministic: a re-run assigns identical rows
    val a = graft.ops.Splits.stratified(df, Seq("lang", "source"), "doc_id")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = graft.ops.Splits.stratified(df, Seq("lang", "source"), "doc_id")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
  }

  test("vocabulary coverage curve is monotone and sufficient") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val rows = graft.ops.Vocab.coverageCurve(docs, "text")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq(80, 90, 95, 99))
    // each level covers at least p% (integer cross-multiplication)
    rows.foreach { case (p, _, cum, tot) => assert(cum * 100 >= tot * p) }
    // higher coverage never needs a smaller vocabulary
    assert(rows.map(_._2).toSeq == rows.map(_._2).toSeq.sorted)
    // total token mass equals the corpus tokenization's count
    val want = docs.select(sum(size(filter(split(coalesce($"text", lit("")),
      "\\s+"), t => t =!= "")).cast("long"))).head().getLong(0)
    assert(rows.head._4 == want)
  }

  test("KS drift is zero for identical slice distributions") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ks").toString
    // ids 0,3 -> slice A (id%3=0) with lengths {2,3}; ids 1,2,4,5 ->
    // slice B with lengths {2,3,2,3}: identical CDFs
    Seq((0L, "w w"), (3L, "w w w"), (1L, "w w"), (2L, "w w w"),
        (4L, "w w"), (5L, "w w w"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = SparkEntry.queries("q120_ks_drift")(spark, tmp).head()
    assert(r.getAs[Double]("ks_stat") == 0.0)
    assert(r.getAs[Long]("n_a") == 2 && r.getAs[Long]("n_b") == 4)
  }
}
