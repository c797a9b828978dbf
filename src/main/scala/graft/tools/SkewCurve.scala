package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** Hot-key (power-law duplicate) skew harness for the dedup family.
  *
  * [[ScaleCurve]]'s synthesis is deliberately shard-disjoint: duplicate
  * GROUP COUNT scales with the corpus while group SIZE stays bounded, so
  * it can never observe the failure mode the round-6 verdict flagged —
  * a digest-partitioned window serializing every row of a hot key
  * through one task. This harness synthesizes the opposite corpus:
  *
  *  - one exact-dup digest carrying 30% of all documents (the
  *    "error page duplicated millions of times" shape; its text is 10
  *    identical 10-token blocks, so it doubles as a hot BLOCK digest
  *    carried by ~half of all block rows);
  *  - a geometric (Zipf-like) boilerplate ladder: 10-token block j
  *    prefixes ~N/2^(18-j) documents, so the hottest block opens ~half
  *    the corpus — frequent BY DEFINITION, exactly what q87 strips;
  *  - everything else token-salted per shard (unique, cold).
  *
  * For each op it times the LEGACY window formulation (pre-round-7,
  * reconstructed here verbatim) against the shipped combinable-
  * aggregation shape, and reports the worst stage's max-task-time /
  * median-task-time — the serialization symptom itself, not a proxy.
  * Done-bar (round-6 verdict item 2): shipped shape keeps max ≤ 10×
  * median on every stage; the legacy shape is expected to blow through
  * it.
  *
  * Run: `sbt "runMain graft.tools.SkewCurve /root/testdata/sf0.1 100"`
  * (~500k docs synthesized under /tmp; one JSON line + a markdown table
  * for BENCH_SCALING.md).
  */
object SkewCurve {

  // ---- legacy (round-6) window formulations, kept ONLY as the
  // measurement baseline ---------------------------------------------------

  private def legacyExact(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__h")).orderBy(col("doc_id"))
    df.withColumn("__h", md5(graft.ops.Dedup.normalize(col("text"))))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__h", "__rn")
  }

  private def legacyCross(base: DataFrame, incoming: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val digest = md5(graft.ops.Dedup.normalize(coalesce(col("text"), lit(""))))
    val baseH = base.select(digest.as("__h")).distinct()
      .withColumn("__inBase", lit(true))
    val w = Window.partitionBy(col("__h")).orderBy(col("doc_id"))
    incoming.select(col("doc_id"), digest.as("__h"))
      .withColumn("__rn", row_number().over(w))
      .join(baseH, Seq("__h"), "left")
      .select(col("doc_id"), col("__h").as("digest"),
        when(col("__inBase").isNotNull, lit("dup_of_base"))
          .when(col("__rn") > 1, lit("dup_in_batch"))
          .otherwise(lit("kept")).as("status"))
  }

  private def blocksOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), posexplode(
        graft.functions.SketchExpressions.token_blocks(
          coalesce(col("text"), lit("")), 10))
      .as(Seq("idx", "blk")))
      .withColumn("__bh", md5(col("blk")))

  private def legacyScrub(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__bh")).orderBy(col("doc_id"), col("idx"))
    val ranked = blocksOf(docs).withColumn("__rn", row_number().over(w))
    ranked.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_blocks"),
      sum(when(col("__rn") === 1, 1L).otherwise(0L)).as("n_kept"),
      md5(array_join(transform(
        array_sort(collect_list(
          when(col("__rn") === 1, struct(col("idx"), col("blk"))))),
        s => s.getField("blk")), " ")).as("scrubbed_digest"))
  }

  private def legacyStrip(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wRank = Window.partitionBy(col("__bh")).orderBy(col("doc_id"))
    val wAll = Window.partitionBy(col("__bh"))
    val flagged = blocksOf(docs)
      .withColumn("__dr", dense_rank().over(wRank))
      .withColumn("__df", max(col("__dr")).over(wAll))
    val keep = col("__df") < 3
    flagged.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_blocks"),
      sum(when(keep, 1L).otherwise(0L)).as("n_kept"),
      md5(array_join(transform(
        array_sort(collect_list(
          when(keep, struct(col("idx"), col("blk"))))),
        s => s.getField("blk")), " ")).as("scrubbed_digest"))
  }

  // ---- task-time capture --------------------------------------------------

  private final class TaskTimes extends SparkListener {
    val times = new ArrayBuffer[(Int, Long)]() // (stageId, durationMs)
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
      times.synchronized { times += ((e.stageId, e.taskInfo.duration)) }
  }

  /** wall seconds + per-stage (maxMs, medianMs, nTasks), and the skew
    * verdict: the worst max/median ratio over stages big enough to mean
    * anything (≥ 4 tasks, max ≥ 200 ms — below that it's scheduler
    * noise, not serialization).
    */
  private final case class Run(wall: Double, maxMs: Long,
      skew: Double, skewMaxMs: Long, skewMedMs: Long, skewTasks: Int)

  private def measure(spark: SparkSession, df: => DataFrame): Run = {
    val l = new TaskTimes
    spark.sparkContext.addSparkListener(l)
    val t0 = System.nanoTime()
    df.write.mode("overwrite").format("noop").save()
    val wall = (System.nanoTime() - t0) / 1e9
    // listener bus drains asynchronously; make sure every task landed
    org.apache.spark.sql.GraftListenerBridge
      .waitUntilListenerBusEmpty(spark.sparkContext)
    spark.sparkContext.removeSparkListener(l)
    val stages = l.times.groupBy(_._1).map { case (_, ts) =>
      val ds = ts.map(_._2).sorted
      (ds.last, ds(ds.length / 2), ds.length)
    }.toSeq
    val globalMax = stages.map(_._1).max
    val eligible = stages.filter(s => s._3 >= 4 && s._1 >= 200)
    val (sMax, sMed, sN) =
      if (eligible.nonEmpty)
        eligible.maxBy(s => s._1.toDouble / math.max(1, s._2))
      else stages.maxBy(_._1)
    Run(wall, globalMax, sMax.toDouble / math.max(1, sMed), sMax, sMed, sN)
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(100)
    val outDir = args.lift(2).getOrElse(s"/tmp/graft_skew_x$factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- hot-key synthesis ----------------------------------------------
    val src = spark.read.parquet(s"$baseDir/documents.parquet")
      .select("doc_id", "text")
    val span = src.agg(max(col("doc_id"))).head().getLong(0) + 1
    val salted = (0 until factor).map { i =>
      val s = if (i == 0) src
        else src.withColumn("text",
          regexp_replace(col("text"), "(\\S+)", s"$$1$i"))
      s.withColumn("doc_id", col("doc_id") + lit(i * span))
    }.reduce(_ union _)
    // hot exact-dup digest: doc_id % 10 in (1,3,5) -> 30% of ALL rows
    // share one text (10 identical blocks inside, so it is also a hot
    // block digest); doc_id % 10 == 0 puts a second hot digest entirely
    // inside q60's incoming batch (doc_id % 5 == 0)
    val hotText = ("hot error page retry later " * 20).trim // 100 tokens = 10 identical blocks
    // Zipf-ish boilerplate ladder: j = floor(log2(u+2)), u uniform in
    // [0, 2^17) -> block j prefixes ~2^j/2^17 of the corpus (j=17: half)
    val j = floor(log2(pmod(col("doc_id") * 2654435761L, lit(131072L)) + 2))
      .cast("int")
    val bp = array_join(array_repeat(concat(lit("bp"), col("__j")), 10), " ")
    val hot = salted
      .withColumn("__j", j)
      .withColumn("text",
        when(pmod(col("doc_id"), lit(10)).isin(1, 3, 5), lit(hotText))
          .when(pmod(col("doc_id"), lit(10)) === 0, lit(hotText + " variantzero"))
          .otherwise(concat(bp, lit(" "), col("text"))))
      .drop("__j")
    hot.write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val docs = spark.read.parquet(s"$outDir/documents.parquet")
    val base = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val inc = docs.filter(pmod(col("doc_id"), lit(5)) === 0)

    // ---- measure old vs new ---------------------------------------------
    val cases: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("exact", () => legacyExact(docs),
        () => graft.ops.Dedup.exact(docs, "text", "doc_id")),
      ("cross_dedup", () => legacyCross(base, inc),
        () => graft.ops.Dedup.crossDedup(base, inc, "text", "doc_id")),
      ("block_scrub", () => legacyScrub(docs),
        () => graft.ops.Dedup.scrubDuplicateBlocks(docs, "text", "doc_id", 10)),
      ("boilerplate_strip", () => legacyStrip(docs),
        () => graft.ops.Dedup.stripBoilerplateBlocks(docs, "text", "doc_id", 10, 3))
    )
    // warmup: JIT + parquet footer caches off the clock (small scale)
    val warm = spark.read.parquet(s"$baseDir/documents.parquet")
    cases.foreach { case (_, legacy, _) =>
      try legacy().write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
    }
    graft.ops.Dedup.exact(warm, "text", "doc_id")
      .write.mode("overwrite").format("noop").save()

    val rows = cases.map { case (name, legacy, shipped) =>
      val rl = measure(spark, legacy())
      spark.catalog.clearCache()
      val rn = measure(spark, shipped())
      spark.catalog.clearCache()
      (name, rl, rn)
    }
    val qjson = rows.map { case (n, l, s) =>
      f""""$n":{"legacy_wall":${l.wall}%.2f,"legacy_skew":${l.skew}%.1f,""" +
        f""""legacy_skew_max_ms":${l.skewMaxMs},"legacy_skew_med_ms":${l.skewMedMs},""" +
        f""""shipped_wall":${s.wall}%.2f,"shipped_skew":${s.skew}%.1f,""" +
        f""""shipped_skew_max_ms":${s.skewMaxMs},"shipped_skew_med_ms":${s.skewMedMs}}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"hotkey_skew","factor":$factor,"base":"$baseDir","ops":$qjson}""")
    println("# op                 | legacy wall / worst-stage max/med (skew) | shipped wall / worst-stage max/med (skew)")
    rows.foreach { case (n, l, s) =>
      println(f"# $n%-18s | ${l.wall}%6.2f s  ${l.skewMaxMs}%6d/${l.skewMedMs}%-5d ms (${l.skew}%5.1f x, ${l.skewTasks}%2d t)" +
        f" | ${s.wall}%6.2f s  ${s.skewMaxMs}%6d/${s.skewMedMs}%-5d ms (${s.skew}%5.1f x, ${s.skewTasks}%2d t)")
    }
    spark.stop()
  }
}
