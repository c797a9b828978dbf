package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.Streaming

/** Batch/stream parity: the streaming windowed aggregation and the
  * stateful sessionization must reproduce the batch queries' results on
  * the same input (q18/q19 semantics).
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streaming windowed agg matches batch q18") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/events.parquet"))

    // complete mode: append would withhold the windows still inside the
    // watermark, which on a static source is the final 2 hours of data
    val streamed = Streaming.runToCompletion(
      Streaming.windowedAgg(Streaming.readEvents(spark, streamDir)),
      "win_agg_test", outputMode = "complete")
    val batch = SparkEntry.queries("q18_event_window")(spark, dir)

    val s = streamed.orderBy("window_start", "event_type")
      .collect().map(_.toSeq).toSeq
    val b = batch.collect().map(_.toSeq).toSeq
    assert(s == b, s"stream rows ${s.size} vs batch ${b.size}")
  }

  test("stateful sessionization matches batch q19") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val streamDir = java.nio.file.Files.createTempDirectory("graft_sess").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/events.parquet"))

    val events = Streaming.readEvents(spark, streamDir)
      .select($"event_id", $"ts", $"user_id").as[Streaming.Event]
    val streamed = Streaming.runToCompletion(
      Streaming.sessionize(events).toDF(), "sess_test", outputMode = "update")
    // update mode: last row per user wins
    val finalRows = streamed.groupBy("user_id")
      .agg(max("n_sessions").as("n_sessions"), max("n_events").as("n_events"))

    val batch = SparkEntry.queries("q19_sessionize")(spark, dir)
    val s = finalRows.orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val b = batch.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(s == b, s"stream ${s.take(3)}... vs batch ${b.take(3)}...")
  }

  test("streaming exact dedup keeps one row per digest like the batch op") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft_sdedup")
    // duplicated payloads with distinct ids and a timestamp column
    val docs = spark.range(0, 300).toDF("doc_id")
      .withColumn("text", concat(lit("payload "), col("doc_id") % 60))
      .withColumn("ts", timestamp_seconds(lit(1700000000L) + col("doc_id")))
    docs.write.mode("overwrite").parquet(streamDir.toString + "/in")

    val stream = spark.readStream
      .schema(docs.schema)
      .parquet(streamDir.toString + "/in")
    val out = Streaming.runToCompletion(
      Streaming.dedupExact(stream, "text", "ts"), "dedup_test")
    assert(out.count() == 60)
    // digest set matches the batch operator's
    val streamed = out.select(md5(graft.ops.Dedup.normalize($"text")))
      .collect().map(_.getString(0)).toSet
    val batch = graft.ops.Dedup.exact(docs, "text", "doc_id")
      .select(md5(graft.ops.Dedup.normalize($"text")))
      .collect().map(_.getString(0)).toSet
    assert(streamed == batch)
  }
}
