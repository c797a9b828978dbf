package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase profiler for q63_ann_pq (dev only): times each driver-synchronized
  * stage of the PQ pipeline separately so a >2x-vs-oracle verdict can be
  * attributed to a stage instead of guessed at.
  */
object ProfPq {
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
    val q = graft.SparkEntry.queries("q63_ann_pq")
    force(q(spark, "/root/testdata/sf0.001"))
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    t("warm: emb scan")(force(emb))
    for (r <- 1 to 3) {
      val cb = t(s"run$r: trainCodebooks")(
        graft.ops.Pq.trainCodebooks(emb, "embedding", "vec_id", 4, 16, 64))
      val init = t(s"run$r:   ivfCentroids only")(
        graft.ops.Ann.ivfCentroids(emb, "embedding", "vec_id", 16))
      val qraw = t(s"run$r: query fetch")(
        graft.util.CollectCapped(
          emb.filter($"vec_id" === 4).select($"embedding"), 1,
          "single query vector")(0).getSeq[Float](0).toArray)
      val top = emb.filter($"vec_id" =!= 4)
        .select($"vec_id",
          round(graft.ops.Pq.adcCosine(
            graft.functions.SketchExpressions.pq_encode($"embedding", cb),
            cb, qraw), 5).as("sim_pq"))
        .orderBy($"sim_pq".desc, $"vec_id")
        .limit(10)
      t(s"run$r: adc scan topk")(force(top))
      t(s"run$r: FULL q63")(force(q(spark, sfDir)))
      val _ = init
    }
    spark.stop()
  }
}
