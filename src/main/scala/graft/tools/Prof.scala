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
    val tf0 = docs.select($"doc_id",
        explode(graft.functions.SketchExpressions
          .term_counts(coalesce($"text", lit(""))))
          .as("tc"))
      .select($"doc_id", $"tc.term".as("term"), $"tc.tf".as("tf"))
    for (r <- 1 to 3) {
      t(s"run$r: kernel+explode only")(force(tf0))
      t(s"run$r: + window df")(force(
        tf0.withColumn("df", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy($"term")))))
      val q = graft.SparkEntry.queries("q54_tfidf")
      t(s"run$r: full q54")(force(q(spark, sfDir)))
    }
    spark.stop()
  }
}
