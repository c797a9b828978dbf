package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** CC strategy experiment on the dense pHash pair graph (dev tool):
  * shipped hash-to-min (round-1 specialized) vs an edge-CONTRACTION
  * variant that relabels+dedupes edges after round 1 so cliques
  * collapse before round 2's join. Settles the BENCH_SCALING claim
  * that the remaining dense-regime cost is intrinsic, with a number.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale_media_x100")
    val classes = args.lift(1).map(_.toInt).getOrElse(4000)
    val spark = SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ccprobe] $l%-34s ${(System.nanoTime()-t0)/1e9}%7.2f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet").select($"doc_id")
    val sig = graft.ops.Multimodal.withAHash(
      graft.ops.Multimodal.withSyntheticClassPng(docs, "doc_id", classes), "payload")
      .select($"doc_id", $"ahash_hi", $"ahash_lo")
    val pairs = graft.ops.Multimodal.phashNearDups(sig, "doc_id", 3)
      .localCheckpoint(true)
    println(s"[ccprobe] pairs = ${pairs.count()}")

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val keep = spark.sparkContext.getPersistentRDDs.keySet
    // drop only the blocks each RUN created; the shared pairs fixture
    // is an eager local checkpoint whose lineage is gone — unpersisting
    // it kills every later run
    def clean(): Unit = spark.sparkContext.getPersistentRDDs
      .filterNot { case (id, _) => keep.contains(id) }
      .values.foreach(_.unpersist(blocking = false))

    // shipped
    (1 to 2).foreach { i =>
      t(s"shipped CC run $i")(
        force(graft.ops.Dedup.connectedComponents(pairs)))
      clean()
    }

    // contraction variant: round-1 labels via groupBy-min (as shipped),
    // then rewrite edges through the labels, drop self-loops, dedupe,
    // run shipped CC on the contracted graph, compose label-of-label
    def contracted(): org.apache.spark.sql.DataFrame = {
      val base = pairs.select($"id_a".as("a"), $"id_b".as("b"))
        .localCheckpoint(true)
      val edges = base.select($"a".as("s"), $"b".as("t"))
        .union(base.select($"b".as("s"), $"a".as("t")))
      val l1 = edges.groupBy($"s".as("id"))
        .agg(min($"t").as("__nbr"))
        .select($"id", least($"id", $"__nbr").as("cluster_id"))
        .localCheckpoint(true)
      val e2 = base
        .join(l1.select($"id".as("a"), $"cluster_id".as("la")), Seq("a"))
        .join(l1.select($"id".as("b"), $"cluster_id".as("lb")), Seq("b"))
        .select($"la", $"lb").where($"la" =!= $"lb").distinct()
        .localCheckpoint(true)
      if (e2.isEmpty) l1
      else {
        val l2 = graft.ops.Dedup.connectedComponents(e2, "la", "lb")
        l1.join(l2.select($"id".as("cluster_id"), $"cluster_id".as("__f")),
            Seq("cluster_id"), "left")
          .select($"id", coalesce($"__f", $"cluster_id").as("cluster_id"))
      }
    }
    (1 to 2).foreach { i =>
      t(s"contraction CC run $i")(force(contracted()))
      clean()
    }
    // equivalence check: same labels
    val a = graft.ops.Dedup.connectedComponents(pairs)
      .select($"id", $"cluster_id")
    val b = contracted().select($"id", $"cluster_id".as("c2"))
    val diff = a.join(b, Seq("id")).where($"cluster_id" =!= $"c2").count()
    println(s"[ccprobe] label diff rows = $diff")
    spark.stop()
  }
}
