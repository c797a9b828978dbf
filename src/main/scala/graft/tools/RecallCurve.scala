package graft.tools

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recall-vs-cap measurement for the df-capped pair operators (round-15
  * verdict item 2): HotBand proved the caps bound TIME; this harness
  * quantifies what they cost in RECALL, on a Zipf-density corpus with
  * planted ground-truth pairs straddling the caps.
  *
  * Corpus shape: band/frame/gram values are drawn from a Zipf
  * distribution, so posting-list sizes follow the power law a real
  * corpus shows (a few boilerplate-hot buckets, a long cold tail) and
  * the caps 100/1000/10000 each cut a different prefix of it. Planted
  * pairs inherit that density: a pair whose agreeing bands all land on
  * hot values is exactly the pair the cap is allowed to lose.
  *
  * For phash and video the loss is PREDICTABLE from the bucket census
  * alone (a pair is lost iff every agreeing band / all-but-<minShared
  * shared frames exceed the cap), so the harness asserts measured
  * recall == census-predicted recall — the documented recall statement
  * becomes a checked property at 10^5-doc scale, not prose.
  */
object RecallCurve {

  /** Zipf(s) sampler over [0, n): inverse-CDF by binary search. */
  final class Zipf(n: Int, s: Double, rnd: Random) {
    private val cum = new Array[Double](n)
    locally {
      var acc = 0.0
      var i = 0
      while (i < n) { acc += 1.0 / math.pow(i + 1.0, s); cum(i) = acc; i += 1 }
      i = 0
      while (i < n) { cum(i) /= acc; i += 1 }
    }
    def next(): Int = {
      val u = rnd.nextDouble()
      var lo = 0; var hi = n - 1
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (cum(mid) < u) lo = mid + 1 else hi = mid
      }
      lo
    }
  }

  private def caps: Seq[Int] =
    sys.env.get("GRAFT_RECALL_CAPS")
      .map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(100, 1000, 10000))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nDocs = sys.env.getOrElse("GRAFT_RECALL_DOCS", "200000").toInt
    val nPairs = sys.env.getOrElse("GRAFT_RECALL_PAIRS", "5000").toInt
    // GRAFT_RECALL_TIER=phash|video|ngram restricts to one tier (dev loop)
    val tier = sys.env.get("GRAFT_RECALL_TIER")
    if (tier.forall(_ == "phash")) phashCurve(spark, nDocs, nPairs)
    if (tier.forall(_ == "video")) videoCurve(spark, nDocs / 4, nPairs)
    // the ngram tier runs on its own smaller corpus: its cost at cap c is
    // #buckets(df in (prev, c]) × c² pair rows by construction, and the
    // flat-Zipf gram distribution makes the cap-10⁴ tier quadratic-heavy
    // — recall is the measurement here; HotBand owns the time story
    if (tier.forall(_ == "ngram"))
      ngramCurve(spark, math.max(2000, nDocs / 32), math.max(200, nPairs / 2))
    spark.stop()
  }

  // ---- phash: 4 16-bit bands, Zipf band values -------------------------

  def phashCurve(spark: SparkSession, nDocs: Int, nPairs: Int): Unit = {
    import spark.implicits._
    val rnd = new Random(42)
    // 3000-value alphabet per band at s=1.1: the hottest value lands on
    // ~7% of docs (hot at every cap), rank ~100 on ~0.05% (hot only at
    // cap 100 for 2e5 docs), the tail cold everywhere
    val zipf = new Zipf(3000, 1.1, rnd)
    def draw(): Long = {
      // band values spread across the 16-bit space (value identity is
      // all that matters; spreading avoids accidental structure)
      def v(): Long = (zipf.next().toLong * 2654435761L) & 0xffffL
      v() | (v() << 16) | (v() << 32) | (v() << 48)
    }
    val base = Array.tabulate(nDocs)(i => (i.toLong, draw()))
    // planted pairs: partner = base doc with 1..3 random bit flips
    val planted = Array.tabulate(nPairs) { j =>
      val a = rnd.nextInt(nDocs)
      var h = base(a)._2
      val flips = 1 + rnd.nextInt(3)
      var f = 0
      while (f < flips) { h ^= 1L << rnd.nextInt(64); f += 1 }
      ((nDocs + j).toLong, h, base(a)._1)
    }
    val all = (base.map { case (id, h) => (id, h >>> 32, h & 0xffffffffL) } ++
      planted.map { case (id, h, _) => (id, h >>> 32, h & 0xffffffffL) }).toSeq
      .toDF("doc_id", "ahash_hi", "ahash_lo")
      .repartition(32).localCheckpoint(true)
    // census: true df per (band, value) over the WHOLE corpus
    val df = collection.mutable.HashMap.empty[Long, Int].withDefaultValue(0)
    def bands(h: Long): Array[Long] =
      Array(0L << 16 | (h & 0xffffL), 1L << 16 | ((h >>> 16) & 0xffffL),
        2L << 16 | ((h >>> 32) & 0xffffL), 3L << 16 | (h >>> 48))
    (base.iterator.map(_._2) ++ planted.iterator.map(_._2)).foreach { h =>
      bands(h).foreach(k => df(k) += 1)
    }
    println(s"[recall] phash corpus: ${nDocs + nPairs} docs, $nPairs planted; " +
      s"hottest bucket=${df.values.max}")
    caps.foreach { cap =>
      // predicted: lost iff EVERY agreeing band's bucket is hot
      val predicted = planted.count { case (_, h, baseId) =>
        val bh = base(baseId.toInt)._2
        val agree = (0 until 4).filter(b =>
          ((h >>> (16 * b)) & 0xffffL) == ((bh >>> (16 * b)) & 0xffffL))
        agree.nonEmpty && agree.exists(b =>
          df((b.toLong << 16) | ((h >>> (16 * b)) & 0xffffL)) <= cap)
      }
      val t0 = System.nanoTime()
      val found = graft.ops.Multimodal
        .phashNearDups(all, "doc_id", maxHamming = 3, maxBandDf = cap)
        .select(least($"id_a", $"id_b").as("a"),
          greatest($"id_a", $"id_b").as("b"))
      val wanted = planted.map { case (id, _, baseId) =>
        (math.min(id, baseId), math.max(id, baseId)) }.toSet
      val gotRows = graft.util.CollectCapped(found, 1L << 24,
        "recall-curve emitted phash pairs (df-capped)")
        .map(r => (r.getLong(0), r.getLong(1)))
      val sec = (System.nanoTime() - t0) / 1e9
      val got = gotRows.toSet
      val hit = wanted.count(got.contains)
      // the shipped self-report must agree with BOTH the measured recall
      // and the harness's own census prediction (VERDICT r15 #3)
      val refPairs = planted.map { case (id, _, baseId) => (id, baseId) }
        .toSeq.toDF("id_a", "id_b")
      val rep = graft.ops.Multimodal.phashRecallReport(all, "doc_id",
        refPairs, maxHamming = 3, maxBandDf = cap).head()
      println(f"[recall] phash cap=$cap%-6d recall=${hit.toDouble / nPairs}%.4f " +
        f"(predicted ${predicted.toDouble / nPairs}%.4f, " +
        f"self-report ${rep.getDouble(2)}%.4f) " +
        f"emitted=${gotRows.length}%-9d sec=$sec%.2f")
      require(hit == predicted,
        s"measured recall ($hit) != census prediction ($predicted) at cap $cap")
      require(rep.getLong(1) == hit.toLong,
        s"phashRecallReport (${rep.getLong(1)}) != measured recall ($hit) at cap $cap")
    }
  }

  // ---- video: 12 frames per video, Zipf frame hashes -------------------

  def videoCurve(spark: SparkSession, nVids: Int, nPairs: Int): Unit = {
    import spark.implicits._
    val rnd = new Random(43)
    val minShared = 3
    val zipf = new Zipf(20000, 1.1, rnd)
    def frame(): Long = zipf.next().toLong * 0x9e3779b97f4a7c15L
    val base = Array.tabulate(nVids)(i =>
      (i.toLong, Array.fill(12)(frame()).distinct))
    // planted partner: shares 5 of the base video's frames + 7 fresh
    val planted = Array.tabulate(nPairs) { j =>
      val a = rnd.nextInt(nVids)
      val shared = rnd.shuffle(base(a)._2.toList).take(5)
      ((nVids + j).toLong,
        (shared ++ Array.fill(7)(frame())).distinct.toArray, base(a)._1)
    }
    val fh = (base.iterator.flatMap { case (id, fs) => fs.map(f => (id, f)) } ++
      planted.iterator.flatMap { case (id, fs, _) => fs.map(f => (id, f)) })
      .map { case (id, f) => (id, f >>> 32, f & 0xffffffffL) }.toSeq
      .toDF("doc_id", "frame_hi", "frame_lo")
      .repartition(32).localCheckpoint(true)
    val df = collection.mutable.HashMap.empty[Long, Int].withDefaultValue(0)
    (base.iterator.map(_._2) ++ planted.iterator.map(_._2))
      .foreach(_.foreach(f => df(f) += 1))
    println(s"[recall] video corpus: ${nVids + nPairs} videos, " +
      s"$nPairs planted; hottest frame=${df.values.max}")
    // per-video prefix exclusion (round-17 operator): each video skips
    // indexing its minShared-1 HOTTEST frames, hotness = (df, hi, lo)
    // ascending key, hottest = max — replayed here with the operator's
    // exact tie-break (unsigned hi/lo halves)
    def hotKey(f: Long): (Int, Long, Long) = (df(f), f >>> 32, f & 0xffffffffL)
    val excluded: Map[Long, Set[Long]] =
      (base.iterator.map(v => (v._1, v._2)) ++
        planted.iterator.map(v => (v._1, v._2))).map { case (id, fs) =>
        id -> fs.sortBy(hotKey).takeRight(minShared - 1).toSet
      }.toMap
    // pruned bucket census: videos still indexing each frame
    val dfp = collection.mutable.HashMap.empty[Long, Int].withDefaultValue(0)
    (base.iterator.map(v => (v._1, v._2)) ++
      planted.iterator.map(v => (v._1, v._2))).foreach { case (id, fs) =>
      fs.foreach(f => if (!excluded(id)(f)) dfp(f) += 1)
    }
    caps.foreach { cap =>
      // predicted under the round-17 prefix-filter + exact-count rule:
      // detectable iff true overlap clears max(minShared,
      // ceil(0.375*min(nA,nB))) AND some shared frame is indexed by
      // both sides with pruned df <= cap
      val predicted = planted.count { case (pid, fs, baseId) =>
        val bs = base(baseId.toInt)._2
        val shared = fs.toSet.intersect(bs.toSet)
        val bar = math.max(minShared.toLong,
          math.ceil(0.375 * math.min(bs.length, fs.length)).toLong)
        shared.size >= bar && shared.exists(f =>
          !excluded(pid)(f) && !excluded(baseId)(f) && dfp(f) <= cap)
      }
      // distributive measurement (round-17): the exact-count rule's
      // honest output on dense corpora reaches 10⁷ pairs at the deep
      // caps — count and intersect distributed, never collect
      val t0 = System.nanoTime()
      val out = graft.ops.Multimodal
        .videoNearDups(fh, "doc_id", minShared = minShared, maxPostings = cap)
        .select(least($"id_a", $"id_b").as("a"),
          greatest($"id_a", $"id_b").as("b"))
        .localCheckpoint(false)
      val emitted = out.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val wantedDf = planted.map { case (id, _, baseId) =>
        (math.min(id, baseId), math.max(id, baseId)) }.toSeq.toDF("a", "b")
      val hit = wantedDf.join(out, Seq("a", "b"), "left_semi").count().toInt
      // the shipped self-report must agree with BOTH the measured recall
      // and the harness's own census prediction (VERDICT r15 #3)
      val refPairs = planted.map { case (id, _, baseId) => (id, baseId) }
        .toSeq.toDF("id_a", "id_b")
      val rep = graft.ops.Multimodal.videoRecallReport(fh, "doc_id",
        refPairs, minShared = minShared, maxPostings = cap).head()
      println(f"[recall] video cap=$cap%-6d recall=${hit.toDouble / nPairs}%.4f " +
        f"(predicted ${predicted.toDouble / nPairs}%.4f, " +
        f"self-report ${rep.getDouble(2)}%.4f) " +
        f"emitted=$emitted%-9d sec=$sec%.2f")
      require(hit == predicted,
        s"measured recall ($hit) != census prediction ($predicted) at cap $cap")
      require(rep.getLong(1) == hit.toLong,
        s"videoRecallReport (${rep.getLong(1)}) != measured recall ($hit) at cap $cap")
    }
  }

  // ---- n-gram Jaccard: Zipf token text ----------------------------------

  def ngramCurve(spark: SparkSession, nDocs: Int, nPairs: Int): Unit = {
    import spark.implicits._
    val rnd = new Random(44)
    val zipf = new Zipf(30000, 1.05, rnd)
    def tok(): String = "w" + zipf.next()
    def doc(): String = Array.fill(40)(tok()).mkString(" ")
    val base = Array.tabulate(nDocs)(i => (i.toLong, doc()))
    // planted partner: same text with 3 of ~40 tokens replaced — Jaccard
    // over 4-gram sets stays well above the 0.5 threshold uncapped
    val planted = Array.tabulate(nPairs) { j =>
      val a = rnd.nextInt(nDocs)
      val toks = base(a)._2.split(" ")
      var i = 0
      while (i < 3) { toks(rnd.nextInt(toks.length)) = tok(); i += 1 }
      ((nDocs + j).toLong, toks.mkString(" "), base(a)._1)
    }
    val all = (base.map(t => (t._1, t._2)) ++
      planted.map(t => (t._1, t._2))).toSeq
      .toDF("doc_id", "text").repartition(32).localCheckpoint(true)
    println(s"[recall] ngram corpus: ${nDocs + nPairs} docs, $nPairs planted")
    caps.foreach { cap =>
      val t0 = System.nanoTime()
      val got = graft.util.CollectCapped(graft.ops.Dedup
        .ngramJaccardNearDups(all, "text", "doc_id", n = 4,
          threshold = 0.5, maxDf = cap)
        .select(least($"id_a", $"id_b").as("a"),
          greatest($"id_a", $"id_b").as("b")), 1L << 24,
        "recall-curve emitted jaccard pairs (thresholded)")
        .map(r => (r.getLong(0), r.getLong(1)))
      val sec = (System.nanoTime() - t0) / 1e9
      val wanted = planted.map { case (id, _, baseId) =>
        (math.min(id, baseId), math.max(id, baseId)) }.toSet
      val hit = wanted.count(got.toSet.contains)
      // the shipped self-report must agree with measured recall (r16:
      // the census identity as API, same as the phash/video tiers)
      val refPairs = planted.map { case (id, _, baseId) => (id, baseId) }
        .toSeq.toDF("id_a", "id_b")
      val rep = graft.ops.Dedup.ngramRecallReport(all, "text", "doc_id",
        refPairs, n = 4, threshold = 0.5, maxDf = cap).head()
      println(f"[recall] ngram cap=$cap%-6d recall=${hit.toDouble / nPairs}%.4f " +
        f"(self-report ${rep.getDouble(2)}%.4f) " +
        f"emitted=${got.length}%-9d sec=$sec%.2f")
      require(rep.getLong(1) == hit.toLong,
        s"ngramRecallReport (${rep.getLong(1)}) != measured recall ($hit) at cap $cap")
    }
  }
}
