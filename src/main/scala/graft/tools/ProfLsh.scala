package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch phase profiler for q112_lsh_tune (dev only). */
object ProfLsh {
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
    t("warm: docs scan")(force(docs.select($"doc_id", $"text")))
    for (r <- 1 to 3) {
      val sample = docs.filter($"doc_id" < 10000)
        .select($"doc_id",
          graft.functions.SketchExpressions.word_shingles($"text", 3)
            .as("sset"))
        .filter(size($"sset") > 0)
      val meta = sample.select($"doc_id",
        size($"sset").cast("long").as("sz"),
        array_sort($"sset").as("ss"),
        element_at(graft.functions.SketchExpressions
          .md5_minhash_sigs($"sset", 1), 1).as("m0"))
        .localCheckpoint(false)
      t(s"run$r: meta ckpt")(force(meta))
      val rnd = meta.filter($"doc_id" % 10 === 0)
      val randPairs = rnd.select($"doc_id".as("id_a"))
        .join(broadcast(rnd.select($"doc_id".as("id_b"))), $"id_a" < $"id_b")
      val candPairs = meta.as("p").join(broadcast(meta.as("q")),
          col("p.m0") === col("q.m0") && col("p.doc_id") < col("q.doc_id"))
        .select(col("p.doc_id").as("id_a"), col("q.doc_id").as("id_b"))
      val pairSet = randPairs.select($"id_a", $"id_b").union(candPairs)
        .distinct()
      t(s"run$r: pairSet")(force(pairSet))
      val szs = meta.select($"doc_id", $"sz", $"ss")
      val inter = pairSet
        .join(broadcast(szs.select($"doc_id".as("id_a"), $"sz".as("sza"),
          $"ss".as("ssa"))), Seq("id_a"))
        .join(broadcast(szs.select($"doc_id".as("id_b"), $"sz".as("szb"),
          $"ss".as("ssb"))), Seq("id_b"))
        .select($"sza", $"szb", graft.functions.SketchExpressions
          .sorted_intersect_count($"ssa", $"ssb").as("inter"))
      t(s"run$r: inter merge")(force(inter))
      // same joins carrying the ss arrays, no merge: isolates broadcast
      // build + join cost from the per-pair merge compares
      val noMerge = pairSet
        .join(broadcast(szs.select($"doc_id".as("id_a"), $"sz".as("sza"),
          $"ss".as("ssa"))), Seq("id_a"))
        .join(broadcast(szs.select($"doc_id".as("id_b"), $"sz".as("szb"),
          $"ss".as("ssb"))), Seq("id_b"))
        .select($"sza", $"szb",
          (element_at($"ssa", 1) === element_at($"ssb", 1)).as("x"))
      t(s"run$r: joins no merge")(force(noMerge))
      // hashed variant: merge long arrays (exactness aside — cost probe)
      val interH = pairSet
        .join(broadcast(meta.select($"doc_id".as("id_a"),
          sort_array(expr("transform(ss, x -> xxhash64(x))")).as("ha"))),
          Seq("id_a"))
        .join(broadcast(meta.select($"doc_id".as("id_b"),
          sort_array(expr("transform(ss, x -> xxhash64(x))")).as("hb"))),
          Seq("id_b"))
        .select(graft.functions.SketchExpressions
          .sorted_intersect_count_long($"ha", $"hb").as("inter"))
      t(s"run$r: inter hashed")(force(interH))
      t(s"run$r: full q112")(force(
        graft.SparkEntry.queries("q112_lsh_tune")(spark, sfDir)))
      unp()
    }
    println("[prof] pairs=" +
      spark.read.parquet(s"$sfDir/documents.parquet").count())
    spark.stop()
  }
}
