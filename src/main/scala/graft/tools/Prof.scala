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

    val e = spark.read.parquet(s"$sfDir/events.parquet")
    t("warm: events scan")(force(e.select($"user_id")))
    val p = e.filter($"event_type" === "purchase")
      .groupBy($"user_id")
      .agg(max(unix_timestamp($"ts")).as("last_s"),
        count(lit(1)).as("freq"),
        sum(round($"value" * 100).cast("long")).as("mon_c"))
    val anchor = e.agg(max(unix_timestamp($"ts")).as("anchor_s"))
    val r0 = p.crossJoin(broadcast(anchor))
      .withColumn("rec_d", expr("(anchor_s - last_s) DIV 86400"))
    val melted = r0.select($"user_id", $"mon_c",
      explode(array(
        struct(lit(1).as("tag"), $"rec_d".as("v"), $"rec_d".as("bkt")),
        struct(lit(2).as("tag"), $"freq".as("v"), $"freq".as("bkt")),
        struct(lit(3).as("tag"), $"mon_c".as("v"),
          floor($"mon_c" / 10000.0).cast("long").as("bkt")))).as("m"))
      .select($"user_id", $"mon_c", $"m.tag", $"m.v", $"m.bkt")
    val ranked = graft.ops.DistWindow.withGroupedRank(melted, col("tag"),
      col("bkt"), Seq(col("v"), col("user_id")), "rk",
      groupTotalCol = Some("nu"))
    val piv = ranked.groupBy($"user_id")
      .agg(max($"mon_c").as("mon_c"),
        max(when($"tag" === 1, expr("(rk-1)*4 DIV nu + 1"))).as("rq"),
        max(when($"tag" === 2, expr("(rk-1)*4 DIV nu + 1"))).as("fq"),
        max(when($"tag" === 3, expr("(rk-1)*4 DIV nu + 1"))).as("mq"))
    for (r <- 1 to 3) {
      t(s"run$r: per-user agg p")(force(p))
      t(s"run$r: + melt")(force(melted))
      t(s"run$r: + grouped rank")(force(ranked))
      t(s"run$r: + pivot")(force(piv))
      val q = graft.SparkEntry.queries("q138_rfm_segments")
      t(s"run$r: full q138")(force(q(spark, sfDir)))
    }
    spark.stop()
  }
}
