package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming operators over the events schema.
  *
  * The reference has NO event-time streaming (its "streaming" is Arrow
  * IPC pipe composition, SURVEY §2.12); this module is part of the
  * beyond-parity surface: the same windowed aggregation and
  * sessionization semantics as the batch queries (q18/q19), expressed as
  * streaming plans with watermarks and keyed state, so the engine can
  * run its pipelines over a live source at scale. Batch/stream parity is
  * asserted in StreamingSpec.
  */
object Streaming {

  /** events schema as stored by the driver (ts = TIMESTAMP(NANOS), read
    * as long via the legacy flag and converted here).
    */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming read of an events parquet directory. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(eventsRawSchema)
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Tumbling-window count/sum per event type with a watermark —
    * streaming twin of q18_event_window.
    */
  def windowedAgg(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Streaming exact dedup — the streaming twin of `Dedup.exact`: the
    * 16-byte content digest is the dedup key and
    * `dropDuplicatesWithinWatermark` keeps one state entry per digest
    * only until the watermark passes its event time, so state is
    * bounded by the watermark horizon, not the corpus. (Plain
    * `dropDuplicates("__digest")` would never evict — Spark only ages
    * dedup state out when the event-time column is part of the key.)
    * First-arrival wins, which under ordered replay equals the batch
    * min-id rule; duplicates farther apart than the watermark horizon
    * can both survive — the standard streaming-dedup contract.
    */
  def dedupExact(docs: DataFrame, textCol: String, tsCol: String,
      watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("__digest", md5(graft.ops.Dedup.normalize(col(textCol))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__digest")
      .drop("__digest")

  // ---- stateful sessionization -----------------------------------------

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long)
  final case class SessionState(sessionCount: Long, lastTs: Long, events: Long)
  final case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

  /** Keyed-state sessionization with a 30-minute gap —
    * flatMapGroupsWithState twin of q19_sessionize. Emits the running
    * per-user totals on every update batch.
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800)
      : Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSessions](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L))
          sorted.foreach { e =>
            val tsSec = e.ts.getTime / 1000
            val newSession = st.lastTs == Long.MinValue ||
              tsSec - st.lastTs > gapSeconds
            st = SessionState(
              st.sessionCount + (if (newSession) 1 else 0), tsSec, st.events + 1)
          }
          state.update(st)
          Iterator(UserSessions(userId, st.sessionCount, st.events))
      }
  }

  final case class Scored(grp: String, id: Long, score: Double)
  final case class TopKState(items: List[(Double, Long)])
  final case class TopKRow(grp: String, rank: Int, id: Long, score: Double)

  /** Streaming per-group exact top-k — the keyed-state twin of
    * `ops/TopK.perGroup`: each group's state is its current best ≤ k
    * (score desc, id asc) rows, so state is O(k × groups) regardless of
    * stream length; every update batch re-emits the group's ranks
    * (Update mode — downstream upserts by (grp, rank)).
    */
  def topKPerGroup(scores: Dataset[Scored], k: Int): Dataset[TopKRow] = {
    import scores.sparkSession.implicits._
    scores.groupByKey(_.grp)
      .flatMapGroupsWithState[TopKState, TopKRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (grp: String, batch: Iterator[Scored], state: GroupState[TopKState]) =>
          var best = state.getOption.map(_.items).getOrElse(Nil)
          batch.foreach { e =>
            best = ((e.score, e.id) :: best)
              .sortBy { case (s, id) => (-s, id) }.take(k)
          }
          state.update(TopKState(best))
          best.zipWithIndex.iterator.map { case ((s, id), i) =>
            TopKRow(grp, i + 1, id, s)
          }
      }
  }

  /** Run a streaming query over a static directory to completion via the
    * memory sink; returns the final result table. (Local harness used by
    * tests and the smoke tool — production would use a real sink.)
    */
  def runToCompletion(df: DataFrame, name: String,
      outputMode: String = "append"): DataFrame = {
    val spark = df.sparkSession
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }
}
