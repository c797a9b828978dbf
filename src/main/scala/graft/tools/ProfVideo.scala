package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch phase profiler for the q183 video-dedup chain (dev only). */
object ProfVideo {
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
    def unp(): Unit = spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    t("warm: docs scan")(force(docs.select($"doc_id")))
    import graft.ops.Multimodal
    def media = Multimodal.withSyntheticClassGif(
      docs.select($"doc_id"), "doc_id", 30)
    def fh = Multimodal.withFrameHashes(media, "payload", "doc_id")
    for (r <- 1 to 3) {
      t(s"run$r: gif gen only")(force(media))
      t(s"run$r: gen+decode fh")(force(fh))
      // manual decomposition of videoNearDups
      val frames = t(s"run$r: frames distinct+ckpt") {
        val f = fh.select($"doc_id".cast("long").as("__id"),
            $"frame_hi", $"frame_lo")
          .where($"__id".isNotNull).distinct().localCheckpoint(false)
        f.count(); f
      }
      val census = frames.groupBy($"frame_hi", $"frame_lo")
        .agg(count(lit(1)).as("__df"))
      t(s"run$r: census")(force(census))
      val w = org.apache.spark.sql.expressions.Window.partitionBy($"__id")
        .orderBy($"__df".desc, $"frame_hi".desc, $"frame_lo".desc)
      val indexed = frames
        .join(census.hint("shuffle_hash"), Seq("frame_hi", "frame_lo"))
        .withColumn("__rk", row_number().over(w))
        .where($"__rk" > lit(2))
        .select($"__id", $"frame_hi", $"frame_lo")
      t(s"run$r: indexed")(force(indexed))
      val posting = indexed.groupBy($"frame_hi", $"frame_lo")
        .agg(graft.ops.CollectCapped.collectCapped($"__id", 500).as("__ids"),
          count(lit(1)).as("__dfp"))
        .filter($"__dfp" <= 500)
      val cands = posting
        .select(graft.functions.SketchExpressions
          .sorted_pairs_gen($"__ids").as(Seq("id_a", "id_b")))
        .where($"id_a" < $"id_b").distinct()
      t(s"run$r: cands")(force(cands))
      val pairs = Multimodal.videoNearDups(fh, "doc_id", minShared = 3)
      t(s"run$r: nearDups full")(force(pairs))
      val dd = Multimodal.videoDedup(fh, "doc_id", minShared = 3)
      t(s"run$r: videoDedup full")(force(dd))
      t(s"run$r: full q183")(force(
        graft.SparkEntry.queries("q183_video_dedup")(spark, sfDir)))
      unp()
    }
    spark.stop()
  }
}
