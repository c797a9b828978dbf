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
    for (r <- 1 to 3) {
      t(s"run$r: scoreDocs")(force(scored))
      t(s"run$r: + grouped rank")(force(ranked))
      val q = graft.SparkEntry.queries("q106_ppl_buckets")
      t(s"run$r: full q106")(force(q(spark, sfDir)))
      val q92 = graft.SparkEntry.queries("q92_bigram_lm")
      t(s"run$r: q92 for reference")(force(q92(spark, sfDir)))
    }
    spark.stop()
  }
}
