package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbePhash2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def best3(label: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[p2] $label%-32s best ${ts.min}%.3f s")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select($"doc_id")
    def sig = graft.ops.Multimodal.withAHash(
      graft.ops.Multimodal.withSyntheticClassPng(docs, "doc_id", 40), "payload")
      .select($"doc_id", $"ahash_hi", $"ahash_lo")
    val maxBandDf = 1000
    def bands = sig
      .select(col("doc_id").cast("long").as("__id"),
        col("ahash_hi").as("__hi"), col("ahash_lo").as("__lo"))
      .where(col("__hi").isNotNull)
      .select(col("__id"), col("__hi"), col("__lo"),
        posexplode(array(
          (col("__lo") % 65536L), (col("__lo") / 65536L).cast("long"),
          (col("__hi") % 65536L), (col("__hi") / 65536L).cast("long")))
          .as(Seq("__bi", "__bv")))
    val cc = (c: org.apache.spark.sql.Column) =>
      graft.ops.CollectCapped.collectCapped(c, maxBandDf)
    def posting = bands.groupBy(col("__bi"), col("__bv"))
      .agg(cc(col("__id")).as("__ids"), cc(col("__hi")).as("__his"),
        cc(col("__lo")).as("__los"), count(lit(1)).as("__df"))
      .filter(col("__df") <= maxBandDf)
    def pairsRaw = posting
      .select(explode(graft.functions.SketchExpressions.hamming_pairs(
        col("__ids"), col("__his"), col("__los"), 3)).as("__p"))
      .select(col("__p").getItem(0).as("id_a"), col("__p").getItem(1).as("id_b"),
        col("__p").getItem(2).as("hamming"))
    // warmup
    force(pairsRaw.groupBy("id_a","id_b").agg(min("hamming")))
    best3("bands only")(force(bands))
    best3("posting agg")(force(posting.select(col("__df"))))
    best3("posting + kernel explode")(force(pairsRaw))
    best3("+ dedupe groupBy")(force(pairsRaw.groupBy("id_a","id_b").agg(min("hamming"))))
    println("[p2] raw pair rows: " + pairsRaw.count())
    spark.stop()
  }
}
