package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale_media_x100")
    val classes = args.lift(1).map(_.toInt).getOrElse(4000)
    val spark = SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ccprobe] $l%-28s ${(System.nanoTime()-t0)/1e9}%7.2f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet").select($"doc_id")
    val sig = graft.ops.Multimodal.withAHash(
      graft.ops.Multimodal.withSyntheticClassPng(docs, "doc_id", classes), "payload")
      .select($"doc_id", $"ahash_hi", $"ahash_lo")
    val pairs = t("pairs materialize") {
      val p = graft.ops.Multimodal.phashNearDups(sig, "doc_id", 3).localCheckpoint(true)
      println(s"[ccprobe] pairs = ${p.count()}"); p
    }
    // replicate connectedComponents internals with stage timing
    val edges = t("edges union + eager ckpt") {
      pairs.select($"id_a".as("s"), $"id_b".as("t"))
        .union(pairs.select($"id_b".as("s"), $"id_a".as("t")))
        .localCheckpoint(true)
    }
    var labels = t("labels distinct + ckpt") {
      edges.select($"s".as("id")).distinct()
        .withColumn("cluster_id", $"id").localCheckpoint(true)
    }
    var converged = false; var i = 0
    while (!converged && i < 20) {
      val (nc, lab) = t(s"round ${i + 1}") {
        val nbrMin = edges.join(labels.withColumnRenamed("id", "t"), Seq("t"))
          .groupBy($"s".as("id")).agg(min($"cluster_id").as("__nbr"))
        val next = labels.join(nbrMin, Seq("id"), "left")
          .select($"id",
            least($"cluster_id", coalesce($"__nbr", $"cluster_id")).as("cluster_id"),
            (coalesce($"__nbr", $"cluster_id") < $"cluster_id").as("__chg"))
          .localCheckpoint(false)
        val c = !next.agg(coalesce(max($"__chg"), lit(false))).head().getBoolean(0)
        (c, next.drop("__chg"))
      }
      converged = nc; labels = lab; i += 1
    }
    println(s"[ccprobe] rounds=$i")
    spark.stop()
  }
}
