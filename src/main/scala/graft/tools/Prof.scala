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

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    t("warm: emb scan")(force(emb))
    for (r <- 1 to 3) {
      val cb = t(s"run$r: train codebooks")(
        graft.ops.Pq.trainCodebooks(emb, "embedding", "vec_id",
          m = 4, k = 16, dims = 64))
      val qraw = t(s"run$r: fetch query")(
        emb.filter($"vec_id" === 4)
          .select($"embedding").collect()(0).getSeq[Float](0).toArray)
      val top = emb.filter($"vec_id" =!= 4)
        .select($"vec_id",
          round(graft.ops.Pq.adcCosine(
            graft.functions.SketchExpressions.pq_encode($"embedding", cb),
            cb, qraw), 5).as("sim_pq"))
        .orderBy($"sim_pq".desc, $"vec_id")
        .limit(10)
      val qlit = typedlit(qraw)
      def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
      val out = broadcast(top).join(emb, Seq("vec_id"))
        .select($"vec_id", $"sim_pq",
          round(dot($"embedding", qlit) /
            (sqrt(dot($"embedding", $"embedding")) * sqrt(dot(qlit, qlit))),
            5).as("sim_exact"))
        .orderBy($"sim_pq".desc, $"vec_id")
      t(s"run$r: adc + rerank deliver")(force(out))
    }
    spark.stop()
  }
}
