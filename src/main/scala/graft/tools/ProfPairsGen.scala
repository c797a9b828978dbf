package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B profile (dev only): eager explode(sorted_pairs) vs the streaming
  * sorted_pairs_gen generator on the q47 posting lists at sf0.1 — the
  * round-15 memory fix must not cost wall time at the shipped cap.
  */
object ProfPairsGen {
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
      println(f"[prof] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val E = graft.functions.SketchExpressions
    val grams = docs.select($"doc_id".cast("long").as("__id"),
        explode(E.char_ngram_codes(lower($"text"), 4)).as("__g"))
    val posting = grams.groupBy($"__g")
      .agg(graft.ops.CollectCapped.collectCapped($"__id", 1000).as("__ids"),
        count(lit(1)).as("__df"))
      .filter($"__df" <= 1000)
      .localCheckpoint(true)
    println("[prof] posting rows: " + posting.count())
    def eager = posting
      .select(explode(E.sorted_pairs($"__ids")).as("__p"))
      .select($"__p".getItem(0).as("id_a"), $"__p".getItem(1).as("id_b"))
      .groupBy($"id_a", $"id_b").agg(count(lit(1)).as("c"))
    def streamed = posting
      .select(E.sorted_pairs_gen($"__ids").as(Seq("id_a", "id_b")))
      .groupBy($"id_a", $"id_b").agg(count(lit(1)).as("c"))
    for (r <- 1 to 3) {
      t(s"run$r: eager array")(force(eager))
      t(s"run$r: streamed gen")(force(streamed))
    }
    spark.stop()
  }
}
