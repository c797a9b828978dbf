package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Directed contracts for the event-behavior operators (q136–q140)
  * beyond the oracle hash-gate: retention/transition probability
  * invariants, quartile balance, a brute-force median/MAD cross-check,
  * and known-span recovery for the repeated-span screen.
  */
class BehaviorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) =
    SparkEntry.queries(name)(spark, dir)

  test("gram_hash_seq is positional and md5-slice-compatible") {
    val df = Seq("a b c d", "x", "").toDF("t")
      .select(graft.functions.SketchExpressions.gram_hash_seq($"t", 3).as("g"))
    val rows = df.collect().map(_.getSeq[Long](0))
    assert(rows(1).isEmpty && rows(2).isEmpty)
    // positional: 2 grams for 4 tokens at k=3, in order, matching the
    // relational conv(substr(md5(gram),1,15)) idiom exactly
    val expect = Seq("a b c", "b c d").map { s =>
      spark.range(1).select(
        conv(substring(md5(lit(s)), 1, 15), 16, 10).cast("long"))
        .head().getLong(0)
    }
    assert(rows(0) == expect)
  }

  test("retention: every cohort anchors at offset 0 with 10000 bp") {
    val rows = run("q136_retention_cohorts").collect()
    val byCohort = rows.groupBy(_.getLong(0))
    assert(byCohort.nonEmpty)
    byCohort.foreach { case (_, rs) =>
      val r0 = rs.filter(_.getLong(1) == 0L)
      assert(r0.length == 1 && r0.head.getLong(3) == 10000L)
      // retention never exceeds the cohort size; offsets non-negative
      assert(rs.forall(r => r.getLong(3) <= 10000L && r.getLong(1) >= 0L))
    }
  }

  test("markov: per-from probabilities floor-sum to within rounding of 10000") {
    val rows = run("q137_markov_transitions").collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val s = rs.map(_.getLong(3)).sum
      // each of the |to| terms loses < 1 bp to floor division
      assert(s <= 10000L && s > 10000L - rs.length)
    }
  }

  test("rfm: quartile digits in 1..4 and user total preserved") {
    val rows = run("q138_rfm_segments").collect()
    val nUsers = rows.map(_.getLong(1)).sum
    val purchasers = graft.queries.JoinQueries.events(spark, dir)
      .filter($"event_type" === "purchase")
      .select($"user_id").distinct().count()
    assert(nUsers == purchasers)
    rows.foreach { r =>
      val code = r.getLong(0)
      val (rq, fq, mq) = (code / 100, (code / 10) % 10, code % 10)
      assert(Seq(rq, fq, mq).forall(d => d >= 1 && d <= 4), s"code $code")
    }
  }

  test("anomaly gate matches a brute-force median/MAD per type") {
    val got = run("q139_anomaly_robust").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val ev = graft.queries.JoinQueries.events(spark, dir)
      .select($"event_type", $"event_id", $"value").collect()
      .map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 1e6)))
    val brute = ev.groupBy(_._1).map { case (t, rs) =>
      // lower median under the exact (v, event_id) order — the oracle's
      // rn = (n+1) DIV 2 element
      def medOf(xs: Seq[(Long, Long)]): Long = {
        val sorted = xs.sortBy(identity)
        sorted(((xs.size + 1) / 2) - 1)._1
      }
      val n = rs.length.toLong
      val med = medOf(rs.map(r => (r._3, r._2)).toSeq)
      val mad = medOf(rs.map(r => (math.abs(r._3 - med), r._2)).toSeq)
      val an = rs.count(r => math.abs(r._3 - med) > 3 * mad).toLong
      t -> ((n, med, mad, an))
    }
    assert(got == brute)
  }

  test("repeatedSpans recovers a planted 15-token shared span exactly") {
    def words(prefix: String, n: Int): Seq[String] =
      (0 until n).map(i => s"$prefix$i")
    val shared = words("s", 15)
    val a = (words("a", 10) ++ shared ++ words("b", 10)).mkString(" ")
    val b = (words("c", 4) ++ shared ++ words("d", 7)).mkString(" ")
    val c = words("e", 30).mkString(" ")
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val out = graft.ops.Spans
      .repeatedSpans(df, "text", "doc_id", k = 8, minSpan = 12, dfCap = 16)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 15L, "max_span_tokens")
    assert(r.getLong(3) == 1L, "n_spans")
    assert(r.getLong(4) == 10L, "first_pos_a = span start in doc 1")
  }

  test("lifecycle: states partition the active users; week 0 is all new") {
    val rows = run("q141_user_lifecycle").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val ev = graft.queries.JoinQueries.events(spark, dir)
      .select($"user_id",
        floor(unix_timestamp($"ts") / 604800.0).cast("long").as("wk"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val activePerWeek = ev.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    // new + retained + resurrected = distinct active users of the week
    rows.foreach { case (w, (nw, re, rs, _)) =>
      assert(nw + re + rs == activePerWeek(w), s"week $w")
    }
    val w0 = ev.map(_._2).min
    assert(rows(w0) == ((activePerWeek(w0), 0L, 0L, 0L)))
    // churn conservation: churned at w+1 = active(w) - retained(w+1)
    rows.toSeq.sortBy(_._1).sliding(2).foreach {
      case Seq((w1, _), (w2, (_, re2, _, ch2))) if w2 == w1 + 1 =>
        assert(ch2 == activePerWeek(w1) - re2, s"churn at $w2")
      case _ =>
    }
  }

  test("silhouette values are in [-1, 1] and clusters cover the sample") {
    val rows = run("q142_silhouette").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getDouble(2)
      assert(s >= -1.0 && s <= 1.0, s"silhouette $s out of range")
      assert(r.getLong(1) > 0)
    }
  }

  test("novelty: the first source is 100% novel, all bp within 0..10000") {
    val rows = run("q143_ngram_novelty").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val first = rows.minBy(_._1)
    assert(first._4 == 10000L, s"first source ${first._1} not fully novel")
    rows.foreach { case (src, tot, nw, bp) =>
      assert(nw <= tot && bp >= 0 && bp <= 10000, s"$src")
    }
    // novelty decreases in aggregate: later sources repeat earlier grams
    assert(rows.exists(_._4 < 10000L), "degenerate: every gram unique")
  }

  test("session paths: capped at 5 steps, known event vocabulary, sorted") {
    val rows = run("q144_session_paths").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.nonEmpty && rows.length <= 20)
    val types = Set("view", "click", "purchase", "signup", "error")
    rows.foreach { case (p, n) =>
      val steps = p.split(">")
      assert(steps.nonEmpty && steps.length <= 5 &&
        steps.forall(types), s"path $p")
      assert(n > 0)
    }
    // descending by count (ties by path)
    val counts = rows.map(_._2)
    assert(counts.zip(counts.drop(1)).forall { case (a, b) => a >= b })
  }

  test("ab lift: arms partition the users, z sign follows the diff") {
    val r = run("q145_ab_lift").head()
    val (nA, nB, cA, cB) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val users = graft.queries.JoinQueries.events(spark, dir)
      .select($"user_id").distinct().count()
    assert(nA + nB == users && nA > 0 && nB > 0)
    assert(cA >= 0 && cA <= nA && cB >= 0 && cB <= nB)
    // non-degenerate conversion on this corpus
    assert(cA + cB > 0 && cA + cB < nA + nB)
    val diff = r.getLong(6); val z = r.getLong(7)
    assert(diff.sign == z.sign || diff == 0L)
  }

  test("pareto: concentration is at least uniform and nested") {
    val r = run("q146_pareto_events").head()
    val (nUsers, top1Users, top1Bp, top10Users, top10Bp) =
      (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    assert(top1Users == math.max(1, nUsers / 100))
    assert(top10Users == math.max(1, nUsers / 10))
    assert(top1Bp <= top10Bp && top10Bp <= 10000)
    // the top-10%-most-active always hold >= 10% of events (floor slack
    // for the integer head size)
    assert(top10Bp >= top10Users * 10000 / nUsers)
  }

  test("compaction plan: contiguous shard ranges, next-fit bound holds") {
    import org.apache.spark.sql.functions.col
    val perShard = Seq((0L, 30L), (1L, 80L), (2L, 10L), (3L, 95L),
      (4L, 5L), (5L, 40L), (6L, 60L), (7L, 20L)).toDF("shard", "bytes")
    val plan = graft.ops.Shards
      .compactionPlan(perShard, "shard", "bytes", targetBytes = 100L)
      .orderBy(col("out_group")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // next-fit at target 100 over prefix sums 0,30,110,120,215,220,260,320:
    // groups 0=[0,1], 1=[2,3], 2=[4,5,6], 3=[7]
    assert(plan.map(g => (g._1, g._4, g._5)).toSeq ==
      Seq((0L, 0L, 1L), (1L, 2L, 3L), (2L, 4L, 6L), (3L, 7L, 7L)))
    // every byte accounted for; ranges contiguous and ordered
    assert(plan.map(_._3).sum == 340L)
    plan.sliding(2).foreach {
      case Array(a, b) => assert(b._4 == a._5 + 1)
      case _ =>
    }
    // bound: each group < target + its own largest member is implied by
    // next-fit; the coarser invariant every group except possibly the
    // last starts before the target boundary
    assert(plan.forall { case (g, _, total, _, _) =>
      total <= 100L + 95L
    })
  }

  test("cohort ltv: offset-0 users equal the q136 cohort size, cum monotone") {
    val ltv = run("q148_cohort_ltv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val ret = run("q136_retention_cohorts").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // the activity cells agree with retention's
    ltv.foreach { case (cw, off, n, _, _) =>
      assert(ret((cw, off)) == n, s"cell ($cw,$off)")
    }
    // cumulative revenue is monotone within each cohort
    ltv.groupBy(_._1).foreach { case (_, rows) =>
      val cum = rows.sortBy(_._2).map(_._4)
      assert(cum.zip(cum.drop(1)).forall { case (a, b) => b >= a })
    }
  }

  test("attribution: every purchase lands in exactly one campaign bucket") {
    val rows = run("q150_attribution").collect()
      .map(r => (if (r.isNullAt(0)) Long.MinValue else r.getLong(0),
        r.getLong(1), r.getLong(2)))
    val nPurch = graft.queries.JoinQueries.events(spark, dir)
      .filter($"event_type" === "purchase").count()
    assert(rows.map(_._2).sum == nPurch)
    rows.foreach { case (c, n, rev) =>
      assert(c == Long.MinValue || (c >= -1 && c <= 9), s"campaign $c")
      assert(n > 0 && rev >= 0)
    }
    // the 7-day horizon attributes most purchases on this dense corpus
    val attributed = rows.filter(r => r._1 >= 0).map(_._2).sum
    assert(attributed > 0)
  }

  test("hll rollup: merged total tracks the exact count within HLL error") {
    val rows = run("q151_hll_rollup").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val (exact, est) = rows(-1L)
    assert(exact > 0)
    assert(math.abs(est - exact) / exact < 0.25,
      s"merged estimate $est vs exact $exact")
    // weekly exacts each bounded by the total; sum >= total (re-activity)
    val weekly = rows.filter(_._1 >= 0).values
    assert(weekly.forall(_._1 <= exact))
    assert(weekly.map(_._1).sum >= exact)
  }

  test("hll rollup: null user_ids are excluded, pinned by fixture not data") {
    // the sf fixtures carry no null user_ids, so the Spark-side
    // isNotNull filter and the oracle's WHERE user_id IS NOT NULL were
    // only data-coincidentally equivalent; this pins the semantic — a
    // null-user row changes NOTHING in the rollup
    val tmp = java.nio.file.Files.createTempDirectory("q151null").toString
    val base = spark.read.parquet(s"$dir/events.parquet")
    val nullRow = base.limit(1).withColumn("user_id",
      lit(null).cast("long"))
    base.unionByName(nullRow).coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val withNull = SparkEntry.queries("q151_hll_rollup")(spark, tmp)
      .collect().map(_.toString).sorted
    val without = run("q151_hll_rollup").collect().map(_.toString).sorted
    assert(withNull.sameElements(without),
      "a null user_id row must not alter n_distinct or hll_est")
  }

  test("scrubSpans removes the planted span from the higher id only") {
    def words(prefix: String, n: Int): Seq[String] =
      (0 until n).map(i => s"$prefix$i")
    val shared = words("s", 15)
    val a = (words("a", 10) ++ shared ++ words("b", 10)).mkString(" ")
    val b = (words("c", 4) ++ shared ++ words("d", 7)).mkString(" ")
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val out = graft.ops.Spans
      .scrubSpans(df, "text", "doc_id", k = 8, minSpan = 12, dfCap = 16)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // doc 1 (first occurrence) untouched
    assert(out(1L) == ((35L, 0L, a)))
    // doc 2 loses exactly the 15 shared tokens, keeps its own
    val (nb, nr, txt) = out(2L)
    assert(nb == 26L && nr == 15L)
    assert(txt == (words("c", 4) ++ words("d", 7)).mkString(" "))
  }

  test("dp counts: noise bounded by the clamped inverse-CDF, deterministic") {
    val r1 = run("q153_dp_counts").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
    val r2 = run("q153_dp_counts").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
    assert(r1.toSeq == r2.toSeq, "release must be replayable")
    r1.foreach { case (t, (n, dp)) =>
      // |Laplace(1)| clamped at -ln(1e-12) ≈ 27.6
      assert(math.abs(dp - n) <= 28.0, s"$t noise ${dp - n}")
    }
  }

  test("state lift: user-week cells conserved across lifecycle states") {
    val rows = run("q154_state_lift").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    val cells = graft.queries.JoinQueries.events(spark, dir)
      .select($"user_id",
        floor(unix_timestamp($"ts") / 604800.0).cast("long").as("wk"))
      .distinct().count()
    assert(rows.map(_._2._1).sum == cells)
    val valid = Set("new", "retained", "resurrected")
    rows.foreach { case (s, (n, c, bp)) =>
      assert(valid(s) && c <= n && bp >= 0 && bp <= 10000, s"state $s")
    }
  }

  test("first-touch and last-touch attribute the same purchase set") {
    val ft = run("q155_first_touch").collect()
      .map(r => (if (r.isNullAt(0)) Long.MinValue else r.getLong(0),
        r.getLong(1), r.getLong(2)))
    val lt = run("q150_attribution").collect()
      .map(r => (if (r.isNullAt(0)) Long.MinValue else r.getLong(0),
        r.getLong(1), r.getLong(2)))
    assert(ft.map(_._2).sum == lt.map(_._2).sum, "purchase conservation")
    assert(ft.map(_._3).sum == lt.map(_._3).sum, "revenue conservation")
    ft.foreach { case (c, n, _) =>
      assert(c == Long.MinValue || (c >= -1 && c <= 9), s"campaign $c")
      assert(n > 0)
    }
  }

  test("dedup order: kept docs equal distinct digests, counts conserve") {
    val rows = run("q156_dedup_order").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val total = docs.count()
    val distinctDigests = docs
      .select(md5(graft.ops.Dedup.normalize($"text")).as("h"))
      .distinct().count()
    assert(rows.map(_._2).sum == total)
    assert(rows.map(_._5).sum == distinctDigests)
    rows.foreach { case (s, n, cr, wi, kept) =>
      assert(kept + cr + wi == n, s"conservation at $s")
    }
  }

  test("conformal intervals cover ~90% with q05 < q95") {
    val rows = run("q157_conformal_nb").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(5)))
    assert(rows.map(_._1).toSet == Set("en", "other"))
    rows.foreach { case (l, n, q05, q95, cov) =>
      assert(q05 <= q95, s"$l interval inverted")
      // exact ceil-rank intervals cover >= 90% by construction and at
      // most 100%; small-n discreteness keeps it near 9000 bp
      assert(cov >= 8800 && cov <= 10000, s"$l coverage $cov")
      assert(n > 0)
    }
  }

  test("spearman in [-1,1]; gini in [0,1); both non-degenerate") {
    val sp = run("q158_spearman").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
    assert(sp.nonEmpty)
    sp.foreach { case (s, n, rho) =>
      assert(rho >= -1.0 && rho <= 1.0, s"$s rho $rho")
      assert(n > 1)
    }
    val gi = run("q159_gini").collect()
      .map(r => (r.getString(0), r.getDouble(3)))
    gi.foreach { case (s, g) =>
      assert(g >= 0.0 && g < 1.0, s"$s gini $g")
    }
    // document sizes vary, so some inequality exists somewhere
    assert(gi.exists(_._2 > 0.0))
  }

  test("session depth buckets conserve the q19 session count") {
    val rows = run("q165_session_depth").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val totalSessions = run("q19_sessionize").collect()
      .map(_.getLong(1)).sum
    assert(rows.map(_._2).sum == totalSessions)
    rows.foreach { case (b, n, c, bp) =>
      assert(c <= n && bp >= 0 && bp <= 10000, s"bucket $b")
    }
  }

  test("stickiness: avg DAU bounded by WAU, ratio in (0, 10000]") {
    val rows = run("q166_stickiness").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (w, ud, wau, bp) =>
      assert(ud >= wau, s"week $w: user-days < wau")
      assert(ud <= 7 * wau, s"week $w: user-days exceed 7*wau")
      assert(bp > 0 && bp <= 10000, s"week $w stickiness $bp")
    }
  }

  test("repeatedSpans ignores spans shorter than minSpan and hot grams") {
    def words(prefix: String, n: Int): Seq[String] =
      (0 until n).map(i => s"$prefix$i")
    val short = words("s", 11) // 11 < minSpan=12
    val a = (words("a", 5) ++ short ++ words("b", 5)).mkString(" ")
    val b = (words("c", 5) ++ short ++ words("d", 5)).mkString(" ")
    // a 20-token block present in ALL 20 docs: dfCap=8 suppresses it
    val hot = words("h", 20).mkString(" ")
    val hotDocs = (10L until 30L).map(i => (i, s"$hot extra$i"))
    val df = (Seq((1L, a), (2L, b)) ++ hotDocs).toDF("doc_id", "text")
    val out = graft.ops.Spans
      .repeatedSpans(df, "text", "doc_id", k = 8, minSpan = 12, dfCap = 8)
      .collect()
    assert(out.isEmpty)
  }
}
