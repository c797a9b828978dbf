package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition for the multimodal scaled-class tier at a k×
  * corpus (dev tool): where do q176 (pairs → CC) and q183 (frame
  * hashes → inverted index → CC) spend their time when the ×100 slope
  * reads super-linear? args: dir classes
  */
object ProfMediaScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale_media_x100")
    val classes = args.lift(1).map(_.toInt).getOrElse(4000)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[media] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet").select($"doc_id")
    println(s"[media] docs=${docs.count()} classes=$classes dir=$dir")

    def sig = graft.ops.Multimodal.withAHash(
        graft.ops.Multimodal.withSyntheticClassPng(docs, "doc_id", classes),
        "payload")
      .select($"doc_id", $"ahash_hi", $"ahash_lo")
    t("q175: encode+decode+hash")(force(sig))
    def pairs = graft.ops.Multimodal.phashNearDups(sig, "doc_id", 3)
    t("q175: pairs")(force(pairs))
    println(s"[media] pair count = ${pairs.count()}")
    t("q176: pairs + CC")(
      force(graft.ops.Dedup.connectedComponents(pairs)))

    def mediaG = graft.ops.Multimodal.withSyntheticClassGif(docs, "doc_id",
      if (classes == 40) 30 else classes * 30 / 40)
    def fh = graft.ops.Multimodal.withFrameHashes(mediaG, "payload", "doc_id")
    t("q183: decode+frame hashes")(force(fh))
    println(s"[media] frame-hash rows = ${fh.count()}")
    t("q183: full videoDedup")(
      force(graft.ops.Multimodal.videoDedup(fh, "doc_id", 3)))
    spark.stop()
  }
}
