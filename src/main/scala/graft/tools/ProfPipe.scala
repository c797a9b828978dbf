package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch phase profiler for the q55/q80 curation chain (dev only). */
object ProfPipe {
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
    def unp(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.sharedState.cacheManager.clearCache()
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    t("warm: docs scan")(force(docs.select($"doc_id", $"text")))
    for (r <- 1 to 3) {
      val surv = t(s"run$r: survivors construct") {
        graft.ops.Pipeline.survivors(docs)
      }
      t(s"run$r: survivors force")(force(surv))
      t(s"run$r: q55 full")(force(
        graft.SparkEntry.queries("q55_pipeline")(spark, sfDir)))
      unp()
      val s2 = graft.ops.Pipeline.survivors(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val merges = t(s"run$r: bpe trainMerges") {
        graft.util.CollectCapped(
          graft.ops.Bpe.trainMerges(s2, "text", 8), 8, "BPE merge table")
          .map(x => (x.getString(1), x.getString(2))).toSeq
      }
      t(s"run$r: bpe tokenizeCount")(force(
        graft.ops.Bpe.tokenizeCount(s2, "text", merges)))
      t(s"run$r: q80 full")(force(
        graft.SparkEntry.queries("q80_bpe_pack")(spark, sfDir)))
      unp()
    }
    spark.stop()
  }
}
