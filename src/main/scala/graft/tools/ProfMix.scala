package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch phase profiler for the mid-tier hot queries (dev only). */
object ProfMix {
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
    def unp(): Unit = spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    t("warm: docs+emb scan")(force(docs.select($"doc_id", $"text")
      .crossJoin(emb.select($"vec_id").limit(1))))
    for (r <- 1 to 3) {
      // --- q142 decomposition -----------------------------------------
      val (assigned, _) = t(s"run$r: q142 kmeans construct") {
        graft.ops.KMeans.kmeans(emb, "embedding", "vec_id", k = 8, iters = 2)
      }
      t(s"run$r: q142 assigned force")(force(assigned))
      t(s"run$r: q142 full")(force(
        graft.SparkEntry.queries("q142_silhouette")(spark, sfDir)))
      unp()
      // --- others: full only, warm comparison --------------------------
      for (q <- Seq("q99_span_scrub", "q56_passage_dedup",
          "q163_knn_accuracy", "q161_heaps", "q157_conformal_nb",
          "q104_padding_waste", "q132_audit_chain")) {
        t(s"run$r: $q full")(force(graft.SparkEntry.queries(q)(spark, sfDir)))
        unp()
      }
    }
    spark.stop()
  }
}
