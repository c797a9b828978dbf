package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch phase profiler (dev only). */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    t("warm: docs scan")(force(docs.select($"doc_id", $"text")))
    def scored = graft.ops.BigramLm
      .scoreDocs(docs, "text", "doc_id", carry = Seq("lang"))
      .select($"doc_id", $"lang",
        round($"avg_neg_logp" * 1e6).cast("long").as("sk"))
    def ranked = graft.ops.DistWindow.withGroupedRank(scored, $"lang",
      floor($"sk" / 4096L).cast("long"), Seq($"sk", $"doc_id"), "rank",
      groupTotalCol = Some("n_lang"))
    // sub-stage decomposition of scoreDocs (the dominant phase)
    def bg = docs
      .select($"doc_id", $"lang", explode(graft.functions.SketchExpressions
        .bigram_counts($"text")).as("b"))
      .select($"doc_id", $"lang", $"b.w1".as("w1"), $"b.w2".as("w2"),
        $"b.c".as("c"))
    def pairCounts = bg.groupBy($"w1", $"w2").agg(sum($"c").as("c2"))
    def pairStats = pairCounts.withColumn("c1",
      sum($"c2").over(org.apache.spark.sql.expressions.Window.partitionBy($"w1")))
    for (r <- 1 to 3) {
      t(s"run$r: bg kernel only")(force(bg))
      t(s"run$r: pairCounts")(force(pairCounts))
      t(s"run$r: pairStats")(force(pairStats))
      t(s"run$r: scoreDocs")(force(scored))
      t(s"run$r: + grouped rank")(force(ranked))
      val q = graft.SparkEntry.queries("q106_ppl_buckets")
      t(s"run$r: full q106")(force(q(spark, sfDir)))
    }
    println("[prof] rows: bg=" + bg.count() + " pairs=" + pairCounts.count() +
      " docs=" + docs.count())
    spark.stop()
  }
}
