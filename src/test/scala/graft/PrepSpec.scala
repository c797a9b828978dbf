package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{SketchEval, SketchExpressions}
import org.apache.spark.unsafe.types.UTF8String

/** Training-prep surface: winnowing/random-projection kernel contracts
  * and the DistWindow global-rank equivalence (the q66/q69/q70
  * machinery; end-to-end values are oracle-certified by Verify).
  */
class PrepSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def winnowSet(s: String): Set[String] = {
    val ad = SketchEval.winnow(UTF8String.fromString(s), 3, 4)
    (0 until ad.numElements()).map(i => ad.getUTF8String(i).toString).toSet
  }

  test("winnow edge cases: empty, sub-shingle, sub-window texts") {
    assert(winnowSet("") === Set.empty)
    assert(winnowSet("one two") === Set.empty) // < k tokens
    // exactly one shingle -> one window over it
    assert(winnowSet("one two three").size === 1)
    // m=3 shingles < w=4 -> a single short window keeps only the min
    assert(winnowSet("a b c d e").size === 1)
  }

  test("winnow guarantee: docs sharing a >= k+w-1 word passage share a fingerprint") {
    val passage = "the quick brown fox jumps over" // 6 words = k+w-1
    val a = winnowSet(s"alpha beta $passage gamma delta epsilon")
    val b = winnowSet(s"zeta eta theta iota $passage kappa")
    assert(a.nonEmpty && b.nonEmpty && (a & b).nonEmpty)
    // and selection is genuinely a sample, not the full shingle set
    val long = (1 to 200).map(i => s"tok$i").mkString(" ")
    val m = 200 - 3 + 1
    assert(winnowSet(long).size < m / 2)
  }

  test("randProject values agree with the LSH signature signs") {
    val vec = Array.tabulate(64)(i => (math.sin(i + 1) * 3).toFloat)
    val ad = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      vec.map(v => v: Any))
    val proj = graft.ops.Ann.signProjectAD(ad, 16)
    assert(proj.length === 16)
    val sig = graft.ops.Ann.lshSignature(vec, 16)
    (0 until 16).foreach { p =>
      assert((proj(p) >= 0) === (((sig >> p) & 1) === 1),
        s"plane $p sign mismatch")
    }
  }

  test("withGlobalRank equals the textbook global row_number") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, s"row$i")).toDF("id", "v")
      .withColumn("skey", md5(concat(lit("t:"), $"id".cast("string"))))
    val got = graft.ops.DistWindow.withGlobalRank(df,
        conv(substring($"skey", 1, 2), 16, 10).cast("long"),
        Seq($"skey", $"id"), "pos")
      .select($"id", $"pos")
    val want = df.withColumn("pos",
        row_number().over(Window.orderBy($"skey", $"id")).cast("long"))
      .select($"id", $"pos")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    // and it is a permutation: positions are exactly 1..n
    val ps = got.select($"pos").as[Long].collect().sorted
    assert(ps.toSeq === (1L to 1000L))
  }
}
