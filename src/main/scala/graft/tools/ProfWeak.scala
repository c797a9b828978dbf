package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage profiler for the round-15 adjudicated-weak pair (dev only):
  * q157_conformal_nb and q181_video_frames — attribute the >2x-vs-oracle
  * reading to a stage before optimizing (or documenting) it.
  */
object ProfWeak {
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
      println(f"[prof] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    t("warm: docs")(force(docs))
    val M = graft.ops.Multimodal
    for (r <- 1 to 3) {
      // ---- q181 stages ----
      val media = M.withSyntheticGif(docs.select($"doc_id"), "doc_id")
      t(s"run$r: gif encode only")(force(media))
      val stats = M.sampleGifFrameStats(media, "payload", "doc_id", 2)
      t(s"run$r: encode+decode+stats")(force(stats))
      t(s"run$r: + orderBy (full q181)")(
        force(stats.orderBy($"doc_id", $"frame_idx")))
      // ---- q157 stages ----
      val scored0 = graft.ops.NaiveBayes.trainScore(
          docs, "text", when($"lang" === "en", 1.0).otherwise(0.0),
          dims = 256, carry = Seq("lang"))
        .select($"doc_id",
          when($"lang" === "en", "en").otherwise("other").as("label"),
          round($"nb_score" * 1e6).cast("long").as("sm"))
      t(s"run$r: nb trainScore")(force(scored0))
      val scored = scored0.localCheckpoint(false)
      val ranked = graft.ops.DistWindow.withGroupedRank(scored,
        col("label"), floor(col("sm") / 1000000.0).cast("long"),
        Seq(col("sm"), col("doc_id")), "r", Some("n"))
      t(s"run$r: + grouped rank")(force(ranked))
      val qs = ranked
        .select($"label", $"r", $"sm", $"n",
          explode(array(lit(5), lit(95))).as("p"))
        .filter($"r" * 100 >= $"n" * $"p" &&
          ($"r" - 1) * 100 < $"n" * $"p")
        .groupBy($"label")
        .agg(max($"n").as("n_docs"),
          min(when($"p" === 5, $"sm")).as("q05_micro"),
          min(when($"p" === 95, $"sm")).as("q95_micro"))
      t(s"run$r: + quantile cut")(force(qs))
      val q = graft.SparkEntry.queries("q157_conformal_nb")
      t(s"run$r: FULL q157")(force(q(spark, sfDir)))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      t(s"run$r: FULL q157 (AQE off)")(force(q(spark, sfDir)))
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      val q181 = graft.SparkEntry.queries("q181_video_frames")
      t(s"run$r: FULL q181 (fixed)")(force(q181(spark, sfDir)))
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
