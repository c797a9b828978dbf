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

  /** events schema as stored by the driver. `ts` has been written as
    * TIMESTAMP(NANOS) (readable only as long via the legacy flag) in
    * some rounds and as native timestamp[us] in others; readEvents peeks
    * at the files to pick the right variant.
    */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming read of an events parquet directory. readStream needs the
    * schema up front, so probe the stored `ts` physical type with a
    * footer-only batch read (no data scan) and adapt.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    // the nanosAsLong flag is needed for the schema probe and — when the
    // stored ts really is TIMESTAMP(NANOS) — for the streaming scan
    // itself. When the dataset does NOT need it, restore the previous
    // value: leaving it set would silently change how every later
    // parquet read in this session types TIMESTAMP(NANOS) columns.
    val flag = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(flag)
    spark.conf.set(flag, "true")
    // restore on ANY non-success (missing dir, no ts column): leaking the
    // flag would silently retype TIMESTAMP(NANOS) in unrelated reads
    val tsIsLong =
      try spark.read.parquet(dir).schema("ts").dataType == LongType
      catch { case e: Throwable =>
        prev match {
          case Some(v) => spark.conf.set(flag, v)
          case None    => spark.conf.unset(flag)
        }
        throw e
      }
    if (!tsIsLong) prev match {
      case Some(v) => spark.conf.set(flag, v)
      case None    => spark.conf.unset(flag)
    }
    val schema =
      if (tsIsLong) eventsRawSchema
      else StructType(eventsRawSchema.map(f =>
        if (f.name == "ts") f.copy(dataType = TimestampNTZType) else f))
    val raw = spark.readStream.schema(schema).parquet(dir)
    if (tsIsLong) raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else raw.withColumn("ts", col("ts").cast("timestamp"))
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
      .withColumn("__digest", md5(graft.ops.Dedup.normalizeNN(col(textCol))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__digest")
      .drop("__digest")

  final case class BestState(em: Long, id: Long, lastSeenMs: Long)
  final case class BestRow(digest: String, doc_id: Long, em: Long)

  /** Per-thread MD5 + allocation-free hex — the keyed-state operators
    * digest every block/document, so per-record `getInstance` +
    * `"%02x".format` boxing is pure hot-path waste.
    */
  private val md5Tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private def md5Hex(s: String): String = {
    val md = md5Tl.get(); md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    val hex = "0123456789abcdef"
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hex((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hex(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** "N unit" duration string (the withWatermark/window grammar) → ms;
    * calendar months are rejected (no fixed ms length).
    */
  private[streaming] def intervalMs(s: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(s))
    require(iv.months == 0, s"calendar-month intervals unsupported: $s")
    iv.days * 86400000L + iv.microseconds / 1000L
  }

  /** Streaming twin of `Dedup.exactBest` — quality-aware dedup as an
    * Update-mode UPSERT keyed by content digest: state per digest is
    * the current best (quality-micro, id) pair (one tiny record), and a
    * row is re-emitted only when a strictly better copy arrives — the
    * q87-twin contract where downstream applies last-write-wins by
    * digest, so after ordered replay the sink equals the batch
    * `max_by(row, (quality, -id))` winner. First-arrival CANNOT win by
    * timing: a better copy later in the stream retroactively replaces
    * the earlier emit (this is exactly why keep-best cannot use the
    * emit-once `dropDuplicatesWithinWatermark` shape). State is evicted
    * at the event-time horizon, the standard bounded-state trade: a
    * better duplicate arriving after eviction re-emits and downstream
    * still converges to the best copy seen in either horizon.
    */
  def dedupBest(docs: Dataset[Doc],
      horizon: java.time.Duration = java.time.Duration.ofHours(1))
      : Dataset[BestRow] = {
    import docs.sparkSession.implicits._
    val horizonMs = horizon.toMillis
    val keyed = docs.map { d =>
      // round(round(ent, 6) * 1e6) — the exact batch fixed-point chain
      // (Spark's round = BigDecimal HALF_UP), so quality keys agree
      val ent = graft.functions.SketchEval.charEntropy(
        org.apache.spark.unsafe.types.UTF8String.fromString(
          // Locale.ROOT: a Turkish-locale executor lowercases "I" to
          // dotless ı (outside the ASCII entropy histogram), silently
          // picking a different dedup winner than the batch SQL lower()
          if (d.text == null) "" else d.text.toLowerCase(java.util.Locale.ROOT)))
        .getDouble(1)
      val em = math.round(BigDecimal(ent)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble * 1e6)
      // null text == empty text (the batch exactBest normalizeNN
      // contract) — a divergent NullDigest group here made the streaming
      // twin keep one extra document vs batch
      val digest =
        md5Hex(graft.ops.Dedup.normalizeText(if (d.text == null) "" else d.text))
      (digest, d.doc_id, em, d.ts)
    }.toDF("digest", "doc_id", "em", "ts")
    keyed.withWatermark("ts", s"${horizon.toSeconds} seconds")
      .as[(String, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[BestState, BestRow](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (digest: String,
            batch: Iterator[(String, Long, Long, java.sql.Timestamp)],
            state: GroupState[BestState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.getOrElse(
              BestState(Long.MinValue, Long.MaxValue, 0L))
            var changed = false
            batch.foreach { case (_, id, em, ts) =>
              st = st.copy(lastSeenMs = math.max(st.lastSeenMs, ts.getTime))
              // strictly better: higher quality, or equal quality with
              // a lower id (the batch (em, -id) max_by ordering)
              if (em > st.em || (em == st.em && id < st.id)) {
                st = st.copy(em = em, id = id); changed = true
              }
            }
            state.update(st)
            state.setTimeoutTimestamp(st.lastSeenMs + horizonMs)
            if (changed) Iterator(BestRow(digest, st.id, st.em))
            else Iterator.empty
          }
      }
  }

  /** Streaming twin of `Dedup.crossDedup` — continuous-ingestion dedup:
    * incoming documents arrive as a stream and are classified against a
    * STATIC base-corpus digest set (a stream-static left join, so the
    * accepted corpus contributes no streaming state at all) and against
    * the stream itself (`dropDuplicatesWithinWatermark` keyed on the
    * digest — the dedupExact state contract: one entry per digest,
    * evicted at the watermark horizon). Instead of a status column the
    * streaming variant EMITS only the kept rows — the sink-friendly
    * formulation (duplicates are dropped, not labeled, because a row
    * already emitted cannot be relabeled when its duplicate arrives
    * later). First-arrival wins within the stream, which under ordered
    * replay equals the batch min-id rule.
    *
    * `baseDigests` must be one md5-hex column named `digest` (build it
    * with `md5(Dedup.normalize(text))` over the accepted corpus).
    */
  def crossDedup(docs: DataFrame, baseDigests: DataFrame, textCol: String,
      tsCol: String, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("__digest",
        md5(graft.ops.Dedup.normalizeNN(col(textCol))))
      .join(baseDigests.select(col("digest").as("__digest"),
        lit(true).as("__inBase")), Seq("__digest"), "left")
      .filter(col("__inBase").isNull)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__digest")
      .drop("__digest", "__inBase")

  /** [[crossDedup]] with the Bloom-bitmap prefilter of
    * `Dedup.bloomCrossDedup` — the streaming-ingest shape when the
    * accepted corpus is huge: the bitmap (built once from the base
    * digest set with `Dedup.bloomBitmap`, the artifact a production
    * pipeline keeps between restarts) rides into every micro-batch as a
    * codegen literal, so bloom-miss rows — at mostly-novel-ingest scale,
    * nearly all of them — skip the stream-static join entirely and pay
    * only the within-stream watermarked dedup. Bloom hits take the
    * exact digest join; no false negatives, so the kept set is identical
    * to [[crossDedup]]'s.
    */
  def bloomCrossDedup(docs: DataFrame, baseDigests: DataFrame,
      bitmap: Array[Long], textCol: String, tsCol: String, k: Int = 4,
      watermark: String = "1 hour"): DataFrame = {
    val withH = docs
      .withColumn("__digest",
        md5(graft.ops.Dedup.normalizeNN(col(textCol))))
      .withColumn("__hit",
        graft.ops.Dedup.bloomHitExpr(col("__digest"), bitmap, k))
    val misses = withH.filter(!col("__hit"))
    val hits = withH.filter(col("__hit"))
      .join(baseDigests.select(col("digest").as("__digest"),
        lit(true).as("__inBase")), Seq("__digest"), "left")
      .filter(col("__inBase").isNull)
      .drop("__inBase")
    misses.unionByName(hits)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__digest")
      .drop("__digest", "__hit")
  }

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

  final case class Doc(doc_id: Long, text: String, ts: java.sql.Timestamp)
  final case class BandHit(band_sig: Long, doc_id: Long, norm: String,
      ts: java.sql.Timestamp)
  final case class BucketState(seen: List[(Long, String, Long)])
  final case class DupPair(id_a: Long, id_b: Long, jaccard: Double)

  /** Streaming MinHash near-dup detection — the keyed-state twin of
    * `Dedup.minhashNearDups`: each document explodes to its LSH band
    * signatures; state lives per band bucket (the same key the batch
    * equi-join shuffles on) holding the documents seen in that bucket;
    * each arrival is verified with exact Jaccard against its bucket
    * co-residents. An event-time horizon (`horizon`) evicts bucket
    * entries older than the newest arrival by more than the horizon, so
    * state is bounded by the stream rate × horizon, not the corpus —
    * duplicates farther apart than the horizon are missed, the standard
    * streaming-dedup contract (same tradeoff as dedupExact's
    * watermark). Pairs can surface from several shared bands; run a
    * downstream dropDuplicates(id_a, id_b) when exactly-once pairs
    * matter.
    *
    * `maxBucket` caps per-bucket state: a pathological band signature
    * (boilerplate text shared by millions of documents) would otherwise
    * hold every resident within the horizon AND do O(bucket²) Jaccard
    * work — one hot bucket can wedge the stream. When the cap is hit the
    * oldest entries are evicted (newest-K survive) and a warning is
    * logged; pairs against evicted residents are missed, the same
    * bounded-state contract as the horizon.
    */
  def minhashNearDups(docs: Dataset[Doc], numHashes: Int = 128,
      bands: Int = 32, shingleK: Int = 3, threshold: Double = 0.8,
      horizon: java.time.Duration = java.time.Duration.ofHours(1),
      maxBucket: Int = 256)
      : Dataset[DupPair] = {
    import docs.sparkSession.implicits._
    require(numHashes % bands == 0,
      s"numHashes must divide into bands (got $numHashes/$bands)") // batch parity
    val rowsPerBand = numHashes / bands
    val horizonMs = horizon.toMillis
    val banded = docs.flatMap { d =>
      // null text ≡ empty (the batch coalesce): no shingles, no pairs
      val norm = graft.ops.Dedup.normalizeText(
        if (d.text == null) "" else d.text)
      val sig = graft.ops.Dedup.minhashSignature(norm, numHashes, shingleK)
      (0 until bands).map { b =>
        val slice = sig.slice(b * rowsPerBand, (b + 1) * rowsPerBand)
        BandHit(b.toLong << 56 | (java.util.Arrays.hashCode(slice) & 0xffffffffL),
          d.doc_id, norm, d.ts)
      }
    }
    // watermark + event-time timeout so IDLE buckets are dropped from
    // the store: the in-callback horizon filter only prunes a bucket
    // when a NEW row hits the same key, and a corpus of mostly-unique
    // documents creates ~`bands` one-off keys per document — with
    // NoTimeout their state objects lived forever and the store grew
    // with the corpus, not the horizon
    banded.withWatermark("ts", s"${horizon.toSeconds} seconds")
      .groupByKey(_.band_sig)
      .flatMapGroupsWithState[BucketState, DupPair](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (bucket: Long, batch: Iterator[BandHit], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
          var seen = state.getOption.map(_.seen).getOrElse(Nil)
          var newestMs = seen.headOption.map(_._3).getOrElse(0L)
          val out = scala.collection.mutable.ArrayBuffer[DupPair]()
          batch.toSeq.sortBy(h => (h.ts.getTime, h.doc_id)).foreach { h =>
            val tsMs = h.ts.getTime
            newestMs = math.max(newestMs, tsMs)
            seen.foreach { case (oid, onorm, _) =>
              if (oid != h.doc_id) {
                val j = graft.ops.Dedup.jaccard(h.norm, onorm, shingleK)
                if (j >= threshold)
                  out += DupPair(math.min(oid, h.doc_id),
                    math.max(oid, h.doc_id), j)
              }
            }
            seen = (h.doc_id, h.norm, tsMs) :: seen
            // horizon eviction keyed on the newest arrival's event time
            seen = seen.filter(_._3 >= tsMs - horizonMs)
            // hot-bucket cap: the list is newest-first, so take keeps
            // the newest maxBucket residents
            if (seen.lengthCompare(maxBucket) > 0) {
              org.slf4j.LoggerFactory.getLogger(Streaming.getClass).warn(
                s"minhash bucket $bucket exceeded maxBucket=$maxBucket " +
                  "residents within the horizon; evicting oldest — " +
                  "near-dups against evicted entries will be missed")
              seen = seen.take(maxBucket)
            }
          }
          state.update(BucketState(seen))
          state.setTimeoutTimestamp(newestMs + horizonMs)
          out.iterator
          }
      }
  }

  final case class Vec(vec_id: Long, embedding: Array[Float],
      ts: java.sql.Timestamp)
  final case class VecBandHit(band_sig: Long, vec_id: Long,
      vec: Array[Float], ts: java.sql.Timestamp)
  final case class VecBucketState(seen: List[(Long, Array[Float], Long)])
  final case class CosPair(id_a: Long, id_b: Long, cosine: Double)

  /** Streaming embedding near-dup detection — the keyed-state twin of
    * `Dedup.embeddingNearDups` (batch q27): each vector's banded
    * hyperplane-LSH signature keys the state (same md5-derived planes,
    * same (band, bandSig) the batch equi-join shuffles on); each arrival
    * is verified with exact cosine against its bucket co-residents.
    * State is bounded by the event-time `horizon` and the `maxBucket`
    * hot-bucket cap, the same contracts as [[minhashNearDups]].
    */
  def embeddingNearDups(vecs: Dataset[Vec], threshold: Double = 0.9,
      bits: Int = 24, bands: Int = 4,
      horizon: java.time.Duration = java.time.Duration.ofHours(1),
      maxBucket: Int = 256): Dataset[CosPair] = {
    import vecs.sparkSession.implicits._
    require(bits % bands == 0, "bits must be divisible by bands")
    // the signature itself is a 32-bit Int: bits > 32 would alias planes
    // mod 32 and make every band's slice identical — silent recall loss,
    // not an error (the per-band mask guard alone missed this)
    require(bits >= 1 && bits <= 32, s"bits must be in 1..32, got $bits")
    val per = bits / bands
    require(per >= 1 && per <= 32, s"bits/bands must be in 1..32, got $per")
    val horizonMs = horizon.toMillis
    val banded = vecs.flatMap { v =>
      val sig = graft.ops.Ann.lshSignature(v.embedding, bits)
      (0 until bands).map { b =>
        val bandSig = (sig >>> (b * per)) & ((1L << per) - 1L)
        VecBandHit(b.toLong << 32 | (bandSig & 0xffffffffL),
          v.vec_id, v.embedding, v.ts)
      }
    }
    // watermark + event-time timeout: idle buckets leave the store (see
    // minhashNearDups — same bounded-state rationale)
    banded.withWatermark("ts", s"${horizon.toSeconds} seconds")
      .groupByKey(_.band_sig)
      .flatMapGroupsWithState[VecBucketState, CosPair](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (bucket: Long, batch: Iterator[VecBandHit],
            state: GroupState[VecBucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
          var seen = state.getOption.map(_.seen).getOrElse(Nil)
          var newestMs = seen.headOption.map(_._3).getOrElse(0L)
          val out = scala.collection.mutable.ArrayBuffer[CosPair]()
          batch.toSeq.sortBy(h => (h.ts.getTime, h.vec_id)).foreach { h =>
            val tsMs = h.ts.getTime
            newestMs = math.max(newestMs, tsMs)
            seen.foreach { case (oid, ovec, _) =>
              if (oid != h.vec_id) {
                val c = graft.ops.Ann.cosineArrays(h.vec, ovec)
                if (c >= threshold)
                  out += CosPair(math.min(oid, h.vec_id),
                    math.max(oid, h.vec_id), c)
              }
            }
            seen = (h.vec_id, h.vec, tsMs) :: seen
            seen = seen.filter(_._3 >= tsMs - horizonMs)
            if (seen.lengthCompare(maxBucket) > 0) {
              org.slf4j.LoggerFactory.getLogger(Streaming.getClass).warn(
                s"embedding bucket $bucket exceeded maxBucket=$maxBucket; " +
                  "evicting oldest")
              seen = seen.take(maxBucket)
            }
          }
          state.update(VecBucketState(seen))
          state.setTimeoutTimestamp(newestMs + horizonMs)
          out.iterator
          }
      }
  }

  final case class Media(doc_id: Long, payload: Array[Byte],
      ts: java.sql.Timestamp)
  final case class HashHit(band_sig: Long, doc_id: Long, hi: Long,
      lo: Long, ts: java.sql.Timestamp)
  final case class HashBucketState(seen: List[(Long, Long, Long, Long)])
  final case class HamPair(id_a: Long, id_b: Long, hamming: Long)

  /** Streaming perceptual-hash image near-dup detection — the
    * keyed-state twin of `Multimodal.phashNearDups` (batch q175): each
    * arriving payload is imageio-DECODED and aHashed partition-locally
    * ([[graft.ops.Multimodal.aHashOf]] — the identical hash the batch
    * column computes), then fanned out to its 4 disjoint 16-bit bands;
    * state lives per (band, band value) holding in-horizon residents,
    * and every arrival emits a pair per co-resident within `maxHamming`
    * — complete for Hamming ≤ 3 by the same pigeonhole argument as the
    * batch join. A pair agreeing on several bands would surface once
    * per agreeing bucket; the first-agreeing-band guard (both full
    * hashes are in the hit) keeps exactly one emission, mirroring the
    * batch side's projection-level dedupe. Horizon + maxBucket bound
    * state exactly as in [[minhashNearDups]]; only 8-byte hashes enter
    * state — image bytes never do.
    */
  def phashNearDups(media: Dataset[Media], maxHamming: Int = 3,
      horizon: java.time.Duration = java.time.Duration.ofHours(1),
      maxBucket: Int = 256): Dataset[HamPair] = {
    import media.sparkSession.implicits._
    require(maxHamming <= 3, "4-band pigeonhole is complete only to 3")
    val horizonMs = horizon.toMillis
    val banded = media.flatMap { m =>
      graft.ops.Multimodal.aHashOf(m.payload) match {
        case Some((hi, lo)) =>
          val bv = Array(lo % 65536L, lo / 65536L, hi % 65536L, hi / 65536L)
          (0 until 4).map(b =>
            HashHit(b.toLong << 56 | bv(b), m.doc_id, hi, lo, m.ts))
        case None => Nil
      }
    }
    def firstAgree(ha: Long, la: Long, hb: Long, lb: Long): Int =
      if (la % 65536L == lb % 65536L) 0
      else if (la / 65536L == lb / 65536L) 1
      else if (ha % 65536L == hb % 65536L) 2
      else 3
    // watermark + event-time timeout: idle buckets leave the store (see
    // minhashNearDups — same bounded-state rationale)
    banded.withWatermark("ts", s"${horizon.toSeconds} seconds")
      .groupByKey(_.band_sig)
      .flatMapGroupsWithState[HashBucketState, HamPair](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (bucket: Long, batch: Iterator[HashHit],
            state: GroupState[HashBucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
          val myBand = (bucket >>> 56).toInt
          var seen = state.getOption.map(_.seen).getOrElse(Nil)
          var newestMs = seen.headOption.map(_._4).getOrElse(0L)
          val out = scala.collection.mutable.ArrayBuffer[HamPair]()
          batch.toSeq.sortBy(h => (h.ts.getTime, h.doc_id)).foreach { h =>
            val tsMs = h.ts.getTime
            newestMs = math.max(newestMs, tsMs)
            seen.foreach { case (oid, ohi, olo, _) =>
              if (oid != h.doc_id &&
                  firstAgree(h.hi, h.lo, ohi, olo) == myBand) {
                val d = java.lang.Long.bitCount(h.hi ^ ohi) +
                  java.lang.Long.bitCount(h.lo ^ olo)
                if (d <= maxHamming)
                  out += HamPair(math.min(oid, h.doc_id),
                    math.max(oid, h.doc_id), d.toLong)
              }
            }
            seen = (h.doc_id, h.hi, h.lo, tsMs) :: seen
            seen = seen.filter(_._4 >= tsMs - horizonMs)
            if (seen.lengthCompare(maxBucket) > 0) {
              org.slf4j.LoggerFactory.getLogger(Streaming.getClass).warn(
                s"phash bucket $bucket exceeded maxBucket=$maxBucket; " +
                  "evicting oldest")
              seen = seen.take(maxBucket)
            }
          }
          state.update(HashBucketState(seen))
          state.setTimeoutTimestamp(newestMs + horizonMs)
          out.iterator
          }
      }
  }

  final case class FpHit(fp: String, doc_id: Long, ts: java.sql.Timestamp)
  final case class FpBucketState(seen: List[(Long, Long)])
  final case class FpPair(id_a: Long, id_b: Long, fp: String)

  /** Streaming winnowing near-dup detection — the keyed-state twin of
    * q70's shared-fingerprint join: each document explodes to its
    * winnowed fingerprints ([[graft.functions.SketchEval.winnow]] — the
    * same md5 windowed-min sampling as the batch kernel, so any shared
    * ≥ shingleK+window-1 word passage inside the horizon is caught);
    * state lives per fingerprint holding (doc_id, ts) residents; every
    * arrival emits a pair per co-resident. Horizon + maxBucket bound
    * state exactly as in [[minhashNearDups]], and winnowing's ~2/(w+1)
    * sampling keeps both the state keys and the per-arrival fan-out
    * small — unlike full shingle hashing, whose state would carry every
    * shingle of every in-horizon document. Pairs can surface via several
    * shared fingerprints — dropDuplicates(id_a, id_b) downstream when
    * exactly-once pairs matter.
    */
  def winnowNearDups(docs: Dataset[Doc], shingleK: Int = 3,
      window: Int = 4,
      horizon: java.time.Duration = java.time.Duration.ofHours(1),
      maxBucket: Int = 256): Dataset[FpPair] = {
    import docs.sparkSession.implicits._
    val horizonMs = horizon.toMillis
    val hits = docs.flatMap { d =>
      // null text ≡ empty: the batch kernel short-circuits null input
      val ad = graft.functions.SketchEval.winnow(
        org.apache.spark.unsafe.types.UTF8String.fromString(
          if (d.text == null) "" else d.text),
        shingleK, window)
      (0 until ad.numElements()).map(i =>
        FpHit(ad.getUTF8String(i).toString, d.doc_id, d.ts))
    }
    // watermark + event-time timeout: idle fingerprints leave the store
    // (see minhashNearDups — same bounded-state rationale)
    hits.withWatermark("ts", s"${horizon.toSeconds} seconds")
      .groupByKey(_.fp)
      .flatMapGroupsWithState[FpBucketState, FpPair](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (fp: String, batch: Iterator[FpHit], state: GroupState[FpBucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
          var seen = state.getOption.map(_.seen).getOrElse(Nil)
          var newestMs = seen.headOption.map(_._2).getOrElse(0L)
          val out = scala.collection.mutable.ArrayBuffer[FpPair]()
          batch.toSeq.sortBy(h => (h.ts.getTime, h.doc_id)).foreach { h =>
            val tsMs = h.ts.getTime
            newestMs = math.max(newestMs, tsMs)
            seen.foreach { case (oid, _) =>
              if (oid != h.doc_id)
                out += FpPair(math.min(oid, h.doc_id),
                  math.max(oid, h.doc_id), fp)
            }
            seen = (h.doc_id, tsMs) :: seen
            seen = seen.filter(_._2 >= tsMs - horizonMs)
            if (seen.lengthCompare(maxBucket) > 0) {
              org.slf4j.LoggerFactory.getLogger(Streaming.getClass).warn(
                s"winnow fingerprint $fp exceeded maxBucket=$maxBucket " +
                  "residents within the horizon; evicting oldest")
              seen = seen.take(maxBucket)
            }
          }
          state.update(FpBucketState(seen))
          state.setTimeoutTimestamp(newestMs + horizonMs)
          out.iterator
          }
      }
  }

  final case class BlockHit(bh: String, doc_id: Long, idx: Int, blk: String,
      ts: java.sql.Timestamp)

  /** Shared digest fan-out for the block-keyed twins (scrub + strip):
    * one definition so the digesting can never drift between them.
    */
  private def blockHits(d: Doc, blockTokens: Int): Seq[BlockHit] = {
    val ad = graft.functions.SketchEval.tokenBlocks(
      org.apache.spark.unsafe.types.UTF8String.fromString(
        if (d.text == null) "" else d.text), blockTokens)
    (0 until ad.numElements()).map { i =>
      val blk = ad.getUTF8String(i).toString
      BlockHit(md5Hex(blk), d.doc_id, i, blk, d.ts)
    }
  }
  final case class BlockFirst(firstDoc: Long, firstIdx: Int, lastSeenMs: Long)
  final case class BlockDecision(doc_id: Long, idx: Int, blk: String,
      kept: Boolean)

  /** Streaming sub-document block scrub — the keyed-state twin of
    * `Dedup.scrubDuplicateBlocks` (batch q79): every document splits
    * into consecutive `blockTokens`-token blocks (the same
    * `token_blocks` kernel), state lives per 16-byte block digest — the
    * key the batch survival window shuffles on — and holds ONLY the
    * first occurrence (doc_id, idx), so unlike the minhash twin there
    * is no per-bucket resident list to cap: per-key state is one
    * record, and the KEY COUNT is bounded by the event-time timeout
    * (a digest unseen for `horizon` is evicted once the watermark
    * passes). Each arriving block emits a kept/scrubbed decision:
    * first arrival wins — under ordered replay that equals the batch
    * (doc_id, idx) rule — re-deliveries of the winning row stay kept,
    * and boilerplate arriving after the horizon starts a fresh first
    * occurrence, the standard streaming-dedup contract. Downstream
    * reassembles documents from their kept decisions (the batch op's
    * doc-keyed aggregation), which keeps this operator single-purpose:
    * the unbounded part — block survival — is what needs keyed state.
    */
  def scrubDuplicateBlocks(docs: Dataset[Doc], blockTokens: Int = 10,
      horizon: java.time.Duration = java.time.Duration.ofHours(1))
      : Dataset[BlockDecision] = {
    import docs.sparkSession.implicits._
    val horizonMs = horizon.toMillis
    val hits = docs.flatMap(d => blockHits(d, blockTokens))
    hits.withWatermark("ts", s"${horizon.toSeconds} seconds")
      .groupByKey(_.bh)
      .flatMapGroupsWithState[BlockFirst, BlockDecision](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (_: String, batch: Iterator[BlockHit], state: GroupState[BlockFirst]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = batch.toSeq.sortBy(h => (h.ts.getTime, h.doc_id, h.idx))
            val out = scala.collection.mutable.ArrayBuffer[BlockDecision]()
            var st = state.getOption
            sorted.foreach { h =>
              val kept = st.isEmpty ||
                (st.get.firstDoc == h.doc_id && st.get.firstIdx == h.idx)
              st = Some(st.fold(BlockFirst(h.doc_id, h.idx, h.ts.getTime))(
                s => s.copy(lastSeenMs = math.max(s.lastSeenMs, h.ts.getTime))))
              out += BlockDecision(h.doc_id, h.idx, h.blk, kept)
            }
            state.update(st.get)
            state.setTimeoutTimestamp(st.get.lastSeenMs + horizonMs)
            out.iterator
          }
      }
  }

  final case class StripState(docs: List[Long], kept: List[(Long, Int)],
      boiler: Boolean, seq: Long, lastSeenMs: Long)
  final case class StripDecision(doc_id: Long, idx: Int, blk: String,
      kept: Boolean, seq: Long)

  /** Streaming boilerplate strip — the keyed-state twin of
    * `Dedup.stripBoilerplateBlocks` (batch q87): a block whose digest
    * reaches `minDf` DISTINCT documents is boilerplate and is stripped
    * from EVERY document, including the occurrences that arrived before
    * the threshold crossed. Because Update-mode decisions are upserts
    * keyed by (doc_id, idx), retroactive stripping is expressible: when
    * a digest's df crosses `minDf`, the operator RE-EMITS every
    * previously-kept occurrence as scrubbed (with a higher per-key
    * `seq`, so last-write-wins downstream; re-emissions carry empty
    * block text — a scrubbed row needs none). After ordered replay the
    * latest decision per (doc_id, idx) therefore equals the batch rule
    * exactly.
    *
    * State per digest is BOUNDED like the bloom-bitmap artifact, not
    * corpus-sized: distinct doc ids seen (< minDf of them — once the
    * threshold crosses only a boolean remains), the kept occurrences
    * eligible for retroactive flip (≤ maxKeptPerKey; a pathologically
    * self-repeating document that exceeds the cap warns and evicts
    * oldest — those rows stay kept), and the df-threshold flag. Idle
    * digests are evicted by the event-time timeout once the watermark
    * passes `horizon`; boilerplate arriving later starts a fresh count,
    * the standard streaming-dedup contract. The boilerplate-digest SET
    * (keys with the flag) is the artifact a production pipeline
    * snapshots between sessions, exactly as the bloom bitmap is for
    * cross-corpus dedup.
    */
  def stripBoilerplateBlocks(docs: Dataset[Doc], blockTokens: Int = 10,
      minDf: Int = 3,
      horizon: java.time.Duration = java.time.Duration.ofHours(1),
      maxKeptPerKey: Int = 4096): Dataset[StripDecision] = {
    import docs.sparkSession.implicits._
    val horizonMs = horizon.toMillis
    val hits = docs.flatMap(d => blockHits(d, blockTokens))
    hits.withWatermark("ts", s"${horizon.toSeconds} seconds")
      .groupByKey(_.bh)
      .flatMapGroupsWithState[StripState, StripDecision](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (_: String, batch: Iterator[BlockHit], state: GroupState[StripState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = batch.toSeq.sortBy(h => (h.ts.getTime, h.doc_id, h.idx))
            val out = scala.collection.mutable.ArrayBuffer[StripDecision]()
            var st = state.getOption.getOrElse(
              StripState(Nil, Nil, boiler = false, seq = 0L, lastSeenMs = 0L))
            sorted.foreach { h =>
              st = st.copy(lastSeenMs = math.max(st.lastSeenMs, h.ts.getTime))
              if (st.boiler) {
                out += StripDecision(h.doc_id, h.idx, h.blk, kept = false, st.seq)
                st = st.copy(seq = st.seq + 1)
              } else {
                val docsSeen =
                  if (st.docs.contains(h.doc_id)) st.docs else h.doc_id :: st.docs
                if (docsSeen.lengthCompare(minDf) >= 0) {
                  // threshold crossed: flip everything previously kept
                  var seq = st.seq
                  st.kept.reverse.foreach { case (d, i) =>
                    out += StripDecision(d, i, "", kept = false, seq)
                    seq += 1
                  }
                  out += StripDecision(h.doc_id, h.idx, h.blk, kept = false, seq)
                  st = StripState(Nil, Nil, boiler = true, seq + 1, st.lastSeenMs)
                } else {
                  out += StripDecision(h.doc_id, h.idx, h.blk, kept = true, st.seq)
                  var kept = (h.doc_id, h.idx) :: st.kept
                  if (kept.lengthCompare(maxKeptPerKey) > 0) {
                    org.slf4j.LoggerFactory.getLogger(Streaming.getClass).warn(
                      s"strip digest exceeded maxKeptPerKey=$maxKeptPerKey kept " +
                        "occurrences below the df threshold; evicting oldest " +
                        "(evicted rows stay kept if the threshold crosses later)")
                    kept = kept.take(maxKeptPerKey)
                  }
                  st = st.copy(docs = docsSeen, kept = kept, seq = st.seq + 1)
                }
              }
            }
            state.update(st)
            state.setTimeoutTimestamp(st.lastSeenMs + horizonMs)
            out.iterator
          }
      }
  }

  final case class DriftState(counts: Map[Long, Long], lastSeenMs: Long)
  final case class DriftRow(window_start: java.sql.Timestamp, n_window: Long,
      n_ref: Long, ks_stat: Double, ks_at_len: Long)

  /** Streaming twin of the q120 KS drift alarm: a CONTINUOUS
    * distribution monitor. Documents arrive with event time; per
    * tumbling window the keyed state holds the token-length histogram
    * (bounded by distinct lengths — the q120 insight that the corpus
    * collapses to a histogram — and hard-capped by `maxLens` with a
    * loud warning), and every update re-emits the window's exact
    * two-sample KS against a FIXED reference histogram (the
    * between-restarts artifact, built batch-side from the accepted
    * corpus). Update-mode upsert by window; after ordered replay the
    * final emission per window equals the batch q120 formula computed
    * on that window's documents — parity-tested in StreamingSpec. Same
    * integer discipline: the sup is an exact cross-multiplied BIGINT;
    * the single float division happens at emission.
    */
  def lengthDrift(docs: DataFrame, textCol: String, tsCol: String,
      ref: Map[Long, Long], windowLen: String = "1 hour",
      watermark: String = "1 hour", maxLens: Int = 65536)
      : Dataset[DriftRow] = {
    import docs.sparkSession.implicits._
    // eviction horizon derived from the ACTUAL window + watermark: a
    // hardcoded constant shorter than windowLen would let the timeout
    // fire mid-window and silently reset the histogram (a wrong final
    // KS for that window); lastMs + windowMs + wmMs can never pass the
    // watermark while a row for this window is still admissible
    val evictMs = intervalMs(windowLen) + intervalMs(watermark)
    val refN = ref.values.sum
    def ks(counts: Map[Long, Long]): (Long, Double, Long) = {
      val n = counts.values.sum
      val lens = (counts.keySet ++ ref.keySet).toArray.sorted
      var ca = 0L; var cb = 0L; var best = BigInt(0); var bestLen = 0L
      // cross-multiplication in BigInt: at the corpus scale this module
      // targets, ca * refN can pass Long.MaxValue (1e9-doc window vs
      // 1e11-doc reference ~ 1e20) and a silent wrap would garble the
      // sup; the loop runs over <= maxLens entries once per trigger, so
      // the BigInt cost is irrelevant
      lens.foreach { l =>
        ca += counts.getOrElse(l, 0L)
        cb += ref.getOrElse(l, 0L)
        val d = (BigInt(ca) * refN - BigInt(cb) * n).abs
        if (d > best) { best = d; bestLen = l }
      }
      val stat = if (n == 0 || refN == 0) 0.0
        else {
          val raw = best.toDouble / n.toDouble / refN.toDouble
          // one rounding at the edge (the q120 contract)
          BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble
        }
      (n, stat, bestLen)
    }
    val evs = docs
      // null text counts as a 0-length document (regexp_count(null) is
      // null, and the non-nullable tuple decode below would kill the
      // whole streaming query on the first null row)
      .withColumn("__len", coalesce(
        regexp_count(col(textCol), lit("\\S+")).cast("long"), lit(0L)))
      // null event time gets the same treatment as null text: without
      // the filter, window(null) null-fills the struct and the
      // non-nullable tuple decode NPEs, killing the monitor
      .filter(col(tsCol).isNotNull)
      .withColumn("__w", window(col(tsCol), windowLen))
      .select(col("__w.start").as("ws"), col("__len"), col(tsCol).as("ts"))
      .withWatermark("ts", watermark)
      .as[(java.sql.Timestamp, Long, java.sql.Timestamp)]
    evs.groupByKey(_._1.getTime)
      .flatMapGroupsWithState[DriftState, DriftRow](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (wsMs: Long,
            batch: Iterator[(java.sql.Timestamp, Long, java.sql.Timestamp)],
            state: GroupState[DriftState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.getOrElse(DriftState(Map.empty, 0L))
            var counts = st.counts
            var lastMs = st.lastSeenMs
            var dropped = 0L // warn ONCE per trigger, not per row — a
                             // high-rate stream past the cap would flood
                             // executor logs from inside the fold
            batch.foreach { case (_, len, ts) =>
              lastMs = math.max(lastMs, ts.getTime)
              if (counts.size < maxLens || counts.contains(len))
                counts = counts.updated(len, counts.getOrElse(len, 0L) + 1L)
              else dropped += 1
            }
            if (dropped > 0)
              org.slf4j.LoggerFactory.getLogger(Streaming.getClass)
                .warn(s"lengthDrift window $wsMs exceeded maxLens=" +
                  s"$maxLens distinct lengths; dropped $dropped new-length" +
                  " rows this trigger (KS becomes approximate)")
            state.update(DriftState(counts, lastMs))
            state.setTimeoutTimestamp(lastMs + evictMs)
            val (n, stat, atLen) = ks(counts)
            Iterator(DriftRow(new java.sql.Timestamp(wsMs), n, refN,
              stat, atLen))
          }
      }
  }

  /** Batch-side reference-histogram builder for [[lengthDrift]] — the
    * artifact a deployment computes once over the accepted corpus and
    * ships to the monitor.
    */
  def lengthHistogram(docs: DataFrame, textCol: String): Map[Long, Long] = {
    import org.apache.spark.sql.functions.{col => c}
    graft.util.CollectCapped(
      docs.select(regexp_count(c(textCol), lit("\\S+")).cast("long").as("len"))
        .groupBy(c("len")).count(), 1000000,
      "reference length histogram (distinct doc lengths)")
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
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
          // fold the whole batch, then ONE sort+take — a per-row sort of
          // the list is O(B·k log k) busywork for identical results
          val prev = state.getOption.map(_.items).getOrElse(Nil)
          val best = (batch.map(e => (e.score, e.id)).toList ::: prev)
            .sortBy { case (s, id) => (-s, id) }.take(k)
          state.update(TopKState(best))
          best.zipWithIndex.iterator.map { case ((s, id), i) =>
            TopKRow(grp, i + 1, id, s)
          }
      }
  }

  /** Streaming benchmark decontamination — the streaming twin of q50:
    * the eval set is STATIC (a benchmark suite), the corpus streams.
    * Shingle the stream with the codegen kernel, probe the static
    * distinct-shingled eval side (stream-static equi-join; Spark
    * broadcasts the tiny side), and count matches per document inside
    * the watermarked event-time window. Stateless except the windowed
    * count, whose state the watermark bounds.
    */
  def decontaminate(docs: DataFrame, evalDocs: DataFrame, textCol: String,
      idCol: String, tsCol: String, shingleK: Int = 4,
      watermark: String = "1 hour", windowLen: String = "1 hour"): DataFrame = {
    val sh = graft.functions.SketchExpressions.word_shingles(col(textCol),
      shingleK)
    val evalSh = evalDocs.select(explode(
      graft.functions.SketchExpressions.word_shingles(col(textCol),
        shingleK)).as("__sh")).distinct()
    docs.withWatermark(tsCol, watermark)
      .select(col(idCol), col(tsCol), explode(sh).as("__sh"))
      .join(evalSh, Seq("__sh")) // per-doc shingles are already distinct
      .groupBy(window(col(tsCol), windowLen).as("__w"), col(idCol))
      .agg(count(lit(1)).as("n_shared"))
      // window_start rides along: a document whose matches straddle two
      // windows emits two rows, and without the window key downstream
      // cannot tell partial counts apart or upsert by (window, id)
      .select(col("__w.start").as("window_start"), col(idCol),
        col("n_shared"))
  }

  /** Streaming count-min sketch — the frequency sketch CMS exists for:
    * the counter table is ONE combinable streaming aggregation
    * (`Cms.counterTableDirect`'s shape — chained aggregations are not
    * streamable, a single cell-keyed sum is), so the (d, slot, cell)
    * state is bounded at depth×width regardless of stream length and
    * each micro-batch folds in map-side. Complete-mode output IS the
    * batch counter table over everything ingested; the snapshot is the
    * between-session artifact (the bloom-bitmap contract). Estimates
    * stay monotone over-counts exactly as in batch.
    */
  def cmsCounters(docs: DataFrame, textCol: String, width: Int = 1024,
      depth: Int = 4): DataFrame =
    graft.ops.Cms.counterTableDirect(docs, textCol, width, depth)

  /** Streaming PII scrub — stateless projection (codegen scanners), so
    * the streaming twin IS the batch expression: no state, no watermark,
    * exactly-once per record under any trigger.
    */
  def piiScrub(docs: DataFrame, textCol: String,
      outCol: String = "redacted"): DataFrame =
    docs.withColumn(outCol,
      graft.functions.SketchExpressions.pii_redact(col(textCol)))

  /** Streaming Naive Bayes scoring — the model (the 257-double
    * log-likelihood-ratio weights from `NaiveBayes.trainScore`'s
    * training half, the artifact a production filter keeps between
    * restarts) rides into every micro-batch as a generated-code
    * reference object, so scoring is a stateless zero-shuffle
    * projection: hash-featurize + sparse-dot + round, exactly-once per
    * record under any trigger, like [[piiScrub]].
    */
  def nbScore(docs: DataFrame, textCol: String, weights: Array[Double],
      dims: Int = 256): DataFrame =
    docs
      .withColumn("nb_score", round(
        graft.functions.SketchExpressions.dot_weights(
          graft.functions.SketchExpressions.token_hash_counts(
            coalesce(col(textCol), lit("")), dims), weights), 6))
      .withColumn("pred_en", col("nb_score") > 0)

  /** Streaming logistic-regression scoring — the micro-unit weight
    * vector from `LogReg.train` (the filter-model artifact a production
    * pipeline keeps between restarts, like [[nbScore]]'s LLR weights)
    * rides as a generated-code reference object: hash-featurize +
    * exact BIGINT sparse-dot + rational sigmoid, stateless and
    * zero-shuffle, exactly-once per record under any trigger.
    */
  def logRegScore(docs: DataFrame, textCol: String, weights: Array[Long],
      dims: Int = 256): DataFrame =
    docs
      .withColumn("p_pos", round(
        graft.ops.LogReg.scoreExpr(col(textCol), weights, dims), 6))
      .withColumn("pred_pos", col("p_pos") > 0.5)

  /** Streaming training-shard manifest — maintain per-shard doc/token/
    * char totals, id ranges and the order-independent bit_xor content
    * signature INCREMENTALLY as documents arrive (the ingestion face of
    * q93): every aggregate in the manifest combines associatively and
    * commutatively, so the complete-mode snapshot after any prefix of
    * the stream equals the batch manifest of that prefix — arrival
    * order, trigger boundaries and restarts cannot change it. State is
    * one row per shard (bounded by construction); the snapshot is the
    * between-session artifact a trainer reads.
    */
  def shardManifest(docs: DataFrame, textCol: String, idCol: String,
      nShards: Int = 16): DataFrame =
    graft.ops.Shards.manifest(docs, textCol, idCol, nShards)

  /** Streaming BM25 relevance scoring — the corpus-statistics artifact
    * (`Bm25.Stats`: N, avgdl, per-query-term dfs — a few dozen numbers
    * at any corpus size, built batch-side like [[nbScore]]'s weights)
    * freezes the idf and length normalization, so per-record scoring is
    * the one-pass term_counts kernel plus scalar arithmetic: stateless,
    * zero-shuffle, exactly-once per record under any trigger. The
    * targeted-slicing filter ("route documents about X to the hot
    * queue") this enables is the streaming face of q91.
    */
  def bm25Score(docs: DataFrame, textCol: String, st: graft.ops.Bm25.Stats,
      terms: Seq[String], minScore: Double = 0.0): DataFrame =
    docs
      .withColumn("score", graft.ops.Bm25.scoreExpr(col(textCol), st, terms))
      .withColumn("relevant", col("score") > minScore)

  /** Streaming HLL registers — the cardinality twin (q102). The sketch
    * update is ONE map-side-combinable MAX aggregation over (group,
    * bucket) keyed rows; duplicates re-deliver the same (bucket, rho)
    * and MAX absorbs them, so no distinct pass and no per-value state:
    * state is bounded at 256 rows per group forever. Complete-mode
    * snapshot ≡ batch registers under any arrival order or restart
    * (MAX is associative+commutative+idempotent);
    * `Hll.estimateFromRegisters` finishes a snapshot into estimates.
    */
  def hllRegisters(docs: DataFrame, groupCol: String,
      valueCol: org.apache.spark.sql.Column): DataFrame =
    graft.ops.Hll.registers(docs, col(groupCol), valueCol, groupCol)

  /** Streaming Gopher quality gate — the rule verdicts are a pure
    * integer-arithmetic projection ([[graft.ops.Gopher.withRules]]), so
    * the streaming twin IS the batch expression: stateless,
    * zero-shuffle, exactly-once per record under any trigger, like
    * [[piiScrub]]. The ingestion face of q103: drop (or route) failing
    * documents before they ever land in the corpus store.
    */
  def gopherGate(docs: DataFrame, textCol: String): DataFrame =
    graft.ops.Gopher.withRules(docs, textCol)

  /** Streaming audio gate — the ingestion face of q179: each arriving
    * payload is decoded through the JDK's javax.sound reader and
    * classified by the SAME rule ladder as the batch query
    * ([[graft.ops.Multimodal.withAudioGate]] — one definition), all
    * partition-local, so per-record verdicts are stateless and
    * exactly-once under any trigger like [[piiScrub]]/[[gopherGate]].
    * The complete-mode per-reason report (count/sum/max) combines
    * associatively and commutatively, so the snapshot after any prefix
    * of the stream equals the batch q179 report of that prefix under
    * any arrival order, trigger boundary, or restart. Audio bytes never
    * enter state or a shuffle — only the 5 feature longs do.
    */
  def audioGate(media: DataFrame, payloadCol: String): DataFrame =
    graft.ops.Multimodal.withAudioGate(media, payloadCol)

  /** Streaming video frame sampling — the ingestion face of q181: each
    * arriving GIF container is decoded by the SAME hand-rolled parser
    * as the batch query (`Multimodal.sampleGifFrameStats` — one
    * definition) into per-sampled-frame stat rows. Stateless flatMap,
    * exactly-once per record under any trigger; container bytes never
    * enter state or a shuffle.
    */
  def videoFrameStats(media: DataFrame, payloadCol: String, idCol: String,
      everyN: Int = 2): DataFrame =
    graft.ops.Multimodal.sampleGifFrameStats(media, payloadCol, idCol, everyN)

  /** Streaming acoustic dedup — the ingestion face of q182: each
    * arriving clip is decoded and reduced to its quantized
    * energy-envelope fingerprint ([[graft.ops.Multimodal
    * .withAudioFingerprint]] — the identical key the batch op groups
    * on), and `dropDuplicatesWithinWatermark` keeps the first arrival
    * per fingerprint — the [[dedupExact]] contract with the acoustic
    * key: state is one tiny row per distinct fingerprint inside the
    * watermark horizon, audio bytes never enter state.
    */
  def audioDedup(media: DataFrame, payloadCol: String, tsCol: String,
      watermark: String = "1 hour"): DataFrame =
    graft.ops.Multimodal.withAudioFingerprint(media, payloadCol)
      .where(col("audio_fp").isNotNull)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("audio_fp")

  /** Streaming scene-cut detection — the ingestion face of q184: each
    * arriving container is decoded and reduced to its per-video cut
    * report by the SAME definition as the batch query
    * ([[graft.ops.Multimodal.sceneChangeStats]]): stateless flatMap,
    * exactly-once per record under any trigger like [[videoFrameStats]];
    * container bytes never enter state or a shuffle.
    */
  def sceneCuts(media: DataFrame, payloadCol: String, idCol: String,
      threshold: Long = 1000L): DataFrame =
    graft.ops.Multimodal.sceneChangeStats(media, payloadCol, idCol, threshold)

  /** Streaming frame-level dedup — the ingestion face of q183's
    * inverted index: each arriving container is decoded to its DISTINCT
    * per-frame aHashes ([[graft.ops.Multimodal.decodedFrameHashes]] —
    * the identical key the batch index joins on), and
    * `dropDuplicatesWithinWatermark` keeps the FIRST arrival per frame
    * hash — frame-level storage dedup (each distinct frame is kept
    * once); the batch near-dup clustering (q183) runs downstream over
    * the compacted (id, frame-hash) table. State is one tiny row per
    * distinct frame hash inside the watermark horizon; pixels never
    * enter state or a shuffle.
    */
  def frameDedup(media: DataFrame, payloadCol: String, idCol: String,
      tsCol: String, watermark: String = "1 hour"): DataFrame =
    // the SAME frame_hashes codegen expression as the batch inverted
    // index (one decode+hash definition — round-17, VERDICT r16 #2);
    // only the leading columns differ
    media.select(col(idCol).as("doc_id"), col(tsCol).as("ts"),
        explode(graft.functions.SketchExpressions
          .frame_hashes(col(payloadCol))).as("__fh"))
      .select(col("doc_id"), col("ts"),
        col("__fh.frame_hi").as("frame_hi"),
        col("__fh.frame_lo").as("frame_lo"))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("frame_hi", "frame_lo")

  final case class FunnelEvent(user_id: Long, event_type: String, us: Long,
      event_id: Long)
  final case class FunnelState(times: List[Long])
  final case class FunnelProgress(user_id: Long, stage: Int,
      t_first: Long, t_last: Long)

  final case class LastEvent(us: Long, event_type: String)
  final case class Transition(user_id: Long, from_type: String,
      to_type: String, us: Long)

  /** Streaming attribution candidates — the stream-stream
    * WATERMARKED INTERVAL JOIN face of q150: a purchases stream joins a
    * clicks stream on user with the click constrained to
    * [purchase − horizon, purchase]. Both sides carry event-time
    * watermarks, so Spark bounds the join state to the horizon (clicks
    * older than purchase-watermark − horizon are evicted) — the
    * stream-stream pattern whose state would otherwise grow without
    * bound. Emits ONE row per in-horizon (purchase, click) candidate;
    * the last-touch reduction (max click per purchase) is the same
    * combinable max_by the batch operator ends with, run downstream of
    * the join (StreamingSpec reduces the candidate set and pins
    * equality with the batch as-of attribution per purchase).
    */
  def attributionCandidates(purchases: DataFrame, clicks: DataFrame,
      horizon: java.time.Duration,
      watermark: String = "30 seconds"): DataFrame = {
    val h = horizon.toSeconds
    val p = purchases
      .withColumn("p_ts", col("ts").cast("timestamp"))
      .withWatermark("p_ts", watermark)
      .select(col("user_id").as("p_user"), col("p_ts"),
        col("purchase_id"), col("cents"))
    val c = clicks
      .withColumn("c_ts", col("ts").cast("timestamp"))
      .withWatermark("c_ts", watermark)
      .select(col("user_id").as("c_user"), col("c_ts"), col("campaign"))
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $h SECONDS"),
      "inner")
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("cents"), col("campaign"),
        unix_timestamp(col("c_ts")).as("click_s"))
  }

  final case class WeekState(cohortWeek: Long, seen: List[Long])
  final case class RetentionCell(user_id: Long, cohort_week: Long,
      week_offset: Long)

  /** Streaming cohort-retention cells — the keyed-state twin of q136.
    * Per-user state is the cohort week plus the set of weeks already
    * seen (CALENDAR-bounded, the same contract as the batch
    * collect_set); each arrival whose epoch-week is new emits ONE
    * (cohort_week, week_offset) cell. Under ordered replay the first
    * seen week IS the min week, so the emitted cell multiset equals the
    * batch cells exactly and the downstream count-per-cell aggregation
    * is the same combinable groupBy the batch query runs
    * (StreamingSpec pins it).
    */
  def retentionCells(events: Dataset[FunnelEvent]): Dataset[RetentionCell] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[WeekState, RetentionCell](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[FunnelEvent],
            state: GroupState[WeekState]) =>
          val weeks = batch.map(e => Math.floorDiv(e.us, 604800000000L))
            .toSeq.sorted
          var st = state.getOption.getOrElse(
            WeekState(Long.MaxValue, Nil))
          val out = Seq.newBuilder[RetentionCell]
          weeks.foreach { w =>
            if (st.cohortWeek == Long.MaxValue) st = st.copy(cohortWeek = w)
            if (!st.seen.contains(w)) {
              st = st.copy(seen = w :: st.seen)
              out += RetentionCell(uid, st.cohortWeek, w - st.cohortWeek)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Streaming Markov transition extraction — the keyed-state twin of
    * q137's lead() window. Per-user state is ONE (timestamp, type) pair
    * — the last event seen — so state size is users-bounded and
    * constant per user whatever the event volume. Each arrival emits
    * the (from → to) transition it completes and becomes the new last
    * event. Within a micro-batch arrivals are folded in (us, event_id)
    * order — batch q137's exact lead() tie-break — so under ordered
    * replay the emitted transition multiset equals the batch lead()
    * pairs exactly, same-timestamp events included (StreamingSpec
    * aggregates both sides to counts and pins equality, plus a
    * same-timestamp fixture). Downstream, the
    * transition-matrix aggregation is the same combinable groupBy the
    * batch query runs.
    */
  def markovTransitions(events: Dataset[FunnelEvent]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEvent, Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[FunnelEvent],
            state: GroupState[LastEvent]) =>
          val sorted = batch.toSeq.sortBy(e => (e.us, e.event_id))
          var last = state.getOption
          val out = Seq.newBuilder[Transition]
          sorted.foreach { e =>
            last.foreach(l =>
              out += Transition(uid, l.event_type, e.event_type, e.us))
            last = Some(LastEvent(e.us, e.event_type))
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  final case class WeekCents(week: Long, cents: Long)
  final case class BandState(hist: Map[Long, Long])
  final case class BandRow(week: Long, p: Int, n_purchases: Long,
      cents_at: Long)

  /** Streaming weekly percentile bands — the keyed-state twin of q171:
    * per-week state is the (cents → count) HISTOGRAM (domain-bounded by
    * the price range, the same boundedness argument as the batch
    * histogram selector — NEVER a buffer of raw purchases), and each
    * micro-batch folds arrivals in and re-emits the week's ceil-rank
    * percentile rows. The histogram is an order-independent CRDT-style
    * state (counts only), so the FINAL Update-mode row per (week, p)
    * equals the batch `histCeilRanks` selection exactly under any
    * arrival order or restart; the selection is the identical integer
    * inequality pos = ceil(n·p/100), cum − c < pos ≤ cum.
    */
  def weeklyBands(purchases: Dataset[WeekCents],
      ps: Seq[Int] = Seq(50, 90)): Dataset[BandRow] = {
    import purchases.sparkSession.implicits._
    purchases.groupByKey(_.week)
      .flatMapGroupsWithState[BandState, BandRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (week: Long, batch: Iterator[WeekCents],
            state: GroupState[BandState]) =>
          var hist = state.getOption.map(_.hist)
            .getOrElse(Map.empty[Long, Long])
          batch.foreach { r =>
            hist = hist.updated(r.cents, hist.getOrElse(r.cents, 0L) + 1L)
          }
          state.update(BandState(hist))
          val sorted = hist.toArray.sortBy(_._1)
          val tot = sorted.iterator.map(_._2).sum
          ps.iterator.map { p =>
            val pos = (tot * p + 99) / 100
            var cum = 0L
            var i = 0
            while (i < sorted.length - 1 && cum + sorted(i)._2 < pos) {
              cum += sorted(i)._2; i += 1
            }
            BandRow(week, p, tot, sorted(i)._1)
          }
      }
  }

  /** Streaming robust anomaly gate — the scoring face of q139 under a
    * FROZEN per-type (median, MAD) model, the same
    * model-as-deployment-artifact contract as [[nbScore]]/[[bm25Score]]:
    * the batch job fits the medians, the stream applies them. The
    * thresholds ride as a literal map expression, the verdict is a pure
    * integer projection (|value_micros − median| > 3×MAD) — stateless,
    * zero-shuffle, exactly-once per record under any trigger.
    */
  def robustAnomalyGate(events: DataFrame, typeCol: String,
      valueCol: String, model: Map[String, (Long, Long)]): DataFrame = {
    val medMap = map(model.toSeq.sortBy(_._1).flatMap { case (t, (m, _)) =>
      Seq(lit(t), lit(m)) }: _*)
    val madMap = map(model.toSeq.sortBy(_._1).flatMap { case (t, (_, d)) =>
      Seq(lit(t), lit(d)) }: _*)
    events
      .withColumn("v_micros",
        round(col(valueCol) * 1000000).cast("long"))
      .withColumn("median_micro", element_at(medMap, col(typeCol)))
      .withColumn("mad_micro", element_at(madMap, col(typeCol)))
      // unseen event types (deployed after the model was fitted) have
      // no (median, MAD) entry; a null verdict vanished from BOTH sides
      // of a downstream filter — exactly the novel traffic an anomaly
      // gate exists to surface, so they flag as anomalous
      .withColumn("is_anomaly", coalesce(
        abs(col("v_micros") - col("median_micro")) >
          col("mad_micro") * 3, lit(true)))
  }

  /** Streaming ordered-sequence funnel — the keyed-state twin of
    * [[graft.ops.Funnel.stageTimes]] (q113). Per-user state is the list
    * of completed stage times (≤ steps.size longs — bounded by
    * construction, unlike a buffer of raw events); each arrival either
    * advances the user's frontier stage (strictly after the previous
    * stage, within the horizon) or is dropped. Scanning in event-time
    * order makes "first qualifying arrival" ≡ the batch op's
    * min-over-window fold, so under ordered replay the final Update-mode
    * row per user equals the batch stage times exactly
    * (StreamingSpec pins it).
    */
  def funnelStages(events: Dataset[FunnelEvent], steps: Seq[String],
      horizonMicros: Long): Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    require(steps.size >= 2, s"a funnel needs >= 2 steps: $steps")
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelProgress](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[FunnelEvent],
            state: GroupState[FunnelState]) =>
          val sorted = batch.toSeq.sortBy(_.us)
          var times = state.getOption.map(_.times).getOrElse(Nil)
          sorted.foreach { e =>
            val stage = times.size
            if (stage < steps.size && e.event_type == steps(stage)) {
              val ok = times.isEmpty ||
                (e.us > times.last && e.us <= times.last + horizonMicros)
              if (ok) times = times :+ e.us
            }
          }
          state.update(FunnelState(times))
          if (times.isEmpty) Iterator.empty
          else Iterator(FunnelProgress(uid, times.size, times.head, times.last))
      }
  }

  /** Streaming semantic eval-set decontamination — the ingestion face
    * of q111. The eval embedding set (small by contract: a held-out
    * benchmark, not a corpus) is the between-restarts artifact, riding
    * as a literal array-of-vectors expression; per record the max
    * cosine folds in the projection: stateless, zero-shuffle,
    * exactly-once under any trigger. Per-pair cosines round to 1e-5
    * integer units BEFORE the max (the batch op's contract), so the
    * stream and batch annotations are bit-identical.
    */
  def embedDecontam(vecs: DataFrame, vecCol: String,
      evalVecs: Array[Array[Float]], tauU: Long = 30000L): DataFrame = {
    require(evalVecs.nonEmpty, "eval set must be non-empty")
    val evLit = array(evalVecs.map(v =>
      array(v.map(x => lit(x)): _*)): _*)
    vecs
      .withColumn("max_sim_u", array_max(transform(evLit, q =>
        round(graft.ops.Ann.cosine(col(vecCol), q) * 1e5).cast("long"))))
      .withColumn("contaminated", col("max_sim_u") >= tauU)
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
