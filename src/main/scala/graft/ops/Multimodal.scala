package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing — builder-prompt
  * surface. Media is carried as opaque `binary` columns with a typed
  * metadata struct; decode / feature-extract run as partition-local
  * batch functions over the binary payloads (the Scala analogue of a
  * Pandas-UDF-over-mapInPandas pipeline).
  *
  * The actual codecs are NOT available in this container, so
  * `decodeStub` produces a deterministic fake decode — the Spark-side
  * contract (schema, batching, partition locality, null behavior) is
  * real and tested; swapping in a real codec is a one-function change.
  */
object Multimodal {

  /** Metadata schema carried next to every media payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Deterministic fake decode of a payload: byte-derived dimensions.
    * Used for media the JVM cannot decode natively (audio/video — those
    * codecs ARE absent in this container) and for image payloads that
    * aren't actually decodable image bytes.
    * >>> REAL AV CODEC GOES HERE. <<<
    */
  def decodeStub(payload: Array[Byte], mediaType: String): Row = {
    if (payload == null) Row(mediaType, null, null, null, null)
    else {
      val n = payload.length
      val w = 16 + (if (n > 0) (payload(0) & 0x7f) else 0)
      val h = 16 + (if (n > 1) (payload(1) & 0x7f) else 0)
      val frames = if (mediaType == "video") 1 + n % 30 else 1
      Row(mediaType, n, w, h, frames)
    }
  }

  /** REAL image decode via the JDK's built-in `javax.imageio` readers
    * (PNG/JPEG/BMP/GIF/WBMP ship with the JVM — no external jars).
    * Returns (width, height), or None when the bytes aren't a decodable
    * image. ImageIO's default stream cache is a temp FILE per decode;
    * disable it once — payloads are already in memory.
    */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int)] = {
    if (payload == null || payload.length == 0) None
    else try {
      javax.imageio.ImageIO.setUseCache(false)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      Option(img).map(i => (i.getWidth, i.getHeight))
    } catch { case _: Exception => None }
  }

  /** Encode an RGB image as real PNG bytes with pixels derived from
    * `seed` — the fixture side of the decode round-trip (tests and q46
    * synthesize corpora whose dimensions are a pure function of the row
    * id, so a SQL oracle can verify the real decode output). Encoded by
    * [[encodeRgbPng]] — the `ImageIO` READER remains the certified
    * decode path.
    */
  def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val px = new Array[Int](width * height)
    var p = 0
    while (p < px.length) {
      px(p) = Hashing.family(seed, p).toInt & 0xffffff
      p += 1
    }
    encodeRgbPng(px, width, height)
  }

  /** Minimal spec-conformant PNG encoder for 24-bit RGB pixels
    * (0xRRGGBB, row-major): signature + IHDR + one zlib IDAT of
    * filter-0 scanlines + IEND. Any standards-compliant decoder (the
    * `javax.imageio` reader used throughout, browsers, libpng) reads
    * back the exact pixel values. Hand-rolled because `ImageIO.write`
    * costs ~100 µs/image in writer plumbing — 30× the payload's actual
    * work at fixture-corpus scale — and this repo already writes its
    * binary formats (Shapefile/GPKG/FlatGeobuf) directly.
    */
  def encodeRgbPng(pixels: Array[Int], width: Int, height: Int): Array[Byte] = {
    val raw = new Array[Byte](height * (1 + 3 * width))
    var y = 0
    while (y < height) {
      val base = y * (1 + 3 * width)
      var x = 0
      while (x < width) {
        val v = pixels(y * width + x)
        raw(base + 1 + 3 * x) = ((v >> 16) & 0xff).toByte
        raw(base + 2 + 3 * x) = ((v >> 8) & 0xff).toByte
        raw(base + 3 + 3 * x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val cbuf = new Array[Byte](raw.length + 128)
    var clen = 0
    while (!defl.finished()) clen += defl.deflate(cbuf, clen, cbuf.length - clen)
    defl.end()
    val out = new java.io.ByteArrayOutputStream(64 + clen)
    val dos = new java.io.DataOutputStream(out)
    dos.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    def chunk(tag: String, data: Array[Byte], len: Int): Unit = {
      dos.writeInt(len)
      val tb = tag.getBytes("US-ASCII")
      dos.write(tb)
      dos.write(data, 0, len)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data, 0, len)
      dos.writeInt(crc.getValue.toInt)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor RGB
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate/adaptive/none
    chunk("IHDR", ihdr.array(), 13)
    chunk("IDAT", cbuf, clen)
    chunk("IEND", Array.emptyByteArray, 0)
    out.toByteArray
  }

  /** Attach decoded metadata partition-locally (no shuffle). Image
    * payloads go through the REAL `javax.imageio` decoder; anything the
    * JVM can't decode (audio/video, or image rows whose payload isn't
    * image bytes) falls back to [[decodeStub]].
    */
  def withDecodedMeta(df: DataFrame, payloadCol: String, mediaTypeCol: String,
      metaCol: String = "media_meta"): DataFrame = {
    val outSchema = df.schema.add(metaCol, mediaMetaType)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val tIdx = df.schema.fieldIndex(mediaTypeCol)
    df.mapPartitions { it =>
      it.map { row =>
        val payload = row.getAs[Array[Byte]](pIdx)
        val mt = row.getString(tIdx)
        val meta =
          if (mt == "image")
            decodeImage(payload)
              .map { case (w, h) => Row(mt, payload.length, w, h, 1) }
              .getOrElse(decodeStub(payload, mt))
          else decodeStub(payload, mt)
        Row.fromSeq(row.toSeq :+ meta)
      }
    }(enc)
  }

  /** Synthesize a real-PNG payload column from an id column
    * (partition-local): width = 1 + id % 13, height = 1 + id % 7. The
    * stand-in for reading actual image bytes at this sandbox's data
    * scale — dimensions are a pure function of the id, so a SQL oracle
    * can certify the real decoder's output (q46).
    */
  def withSyntheticPng(df: DataFrame, idCol: String,
      payloadCol: String = "payload"): DataFrame = {
    val schema = df.schema.add(payloadCol, BinaryType)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val iIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(iIdx)
        Row.fromSeq(row.toSeq :+
          encodePng((1 + id % 13).toInt, (1 + id % 7).toInt, id))
      }
    }(enc)
  }

  /** md5-derived 8-bit luminance for pixel `p` of image class `cls` —
    * the first hex byte of md5("cls:p"), the same formula a SQL oracle
    * replays with its own md5 (the q102/q151 hex-arithmetic trick).
    */
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def classLum(cls: Long, p: Int): Int = {
    val md = md5Local.get(); md.reset()
    (md.digest(s"$cls:$p".getBytes("UTF-8"))(0)) & 0xff
  }

  /** Grayscale face of [[encodeRgbPng]]: all three channels = lum. */
  def encodeGrayPng(lums: Array[Int], width: Int, height: Int): Array[Byte] =
    encodeRgbPng(lums.map(l => (l & 0xff) * 0x010101), width, height)

  /** Synthesize an 8×8 grayscale real-PNG payload whose pixels are the
    * [[classLum]] formula for class id % `classes`, with ONE noise
    * pixel (position id % 64, low luminance bit flipped) so documents
    * of one class are perceptual NEAR-duplicates, not byte-duplicates —
    * the fixture for the perceptual-hash dedup family (q175). Pixels
    * are a pure function of the id, so a SQL oracle can certify the
    * real encode→decode→hash round-trip.
    */
  def withSyntheticClassPng(df: DataFrame, idCol: String, classes: Int,
      payloadCol: String = "payload"): DataFrame = {
    val schema = df.schema.add(payloadCol, BinaryType)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val iIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      val lums = new Array[Int](64)
      it.map { row =>
        val id = row.getLong(iIdx)
        var p = 0
        while (p < 64) {
          val base = classLum(id % classes, p)
          lums(p) = if (p == (id % 64).toInt) base ^ 1 else base
          p += 1
        }
        Row.fromSeq(row.toSeq :+ encodeGrayPng(lums, 8, 8))
      }
    }(enc)
  }

  /** Average-hash (aHash) of a decoded image payload, split into two
    * 32-bit halves (bit p of the row-major pixel order: 1 iff
    * lum·n_pixels ≥ Σlum — integer-exact, no float mean). Decode is the
    * REAL javax.imageio path; rows whose payload doesn't decode get
    * null halves. Partition-local; only the 2×4-byte hash ever reaches
    * a shuffle — the image bytes never do.
    */
  /** aHash of one payload — (hi, lo) 32-bit halves, or None when the
    * bytes don't decode. The single definition both the batch column
    * ([[withAHash]]) and the streaming twin key their state on.
    */
  def aHashOf(payload: Array[Byte]): Option[(Long, Long)] = {
    javax.imageio.ImageIO.setUseCache(false)
    val img = if (payload == null || payload.isEmpty) null
      else try javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      val w = img.getWidth; val h = img.getHeight; val n = w * h
      val lums = new Array[Long](n)
      var s = 0L
      var p = 0
      while (p < n) {
        lums(p) = (img.getRGB(p % w, p / w) & 0xff).toLong
        s += lums(p); p += 1
      }
      var hi = 0L; var lo = 0L
      p = 0
      while (p < n && p < 64) {
        if (lums(p) * n >= s) {
          if (p < 32) lo |= 1L << p else hi |= 1L << (p - 32)
        }
        p += 1
      }
      Some((hi, lo))
    }
  }

  def withAHash(df: DataFrame, payloadCol: String,
      hiCol: String = "ahash_hi", loCol: String = "ahash_lo"): DataFrame = {
    val schema = df.schema.add(hiCol, LongType).add(loCol, LongType)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.map { row =>
        aHashOf(row.getAs[Array[Byte]](pIdx)) match {
          case Some((hi, lo)) => Row.fromSeq(row.toSeq :+ hi :+ lo)
          case None           => Row.fromSeq(row.toSeq :+ null :+ null)
        }
      }
    }(enc)
  }

  /** Perceptual near-duplicate pairs over (id, ahash_hi, ahash_lo):
    * every pair at Hamming distance ≤ `maxHamming` (≤ 3), found by the
    * 4×16-bit pigeonhole band join — two hashes within distance 3 MUST
    * agree on at least one of 4 disjoint 16-bit bands, so candidates
    * come from 4 equi-joins on (band index, band value) and only
    * hash-sized rows shuffle; the exact Hamming filter then makes the
    * band pre-filter lossless. The same complete-for-≤3 guarantee the
    * q29 SimHash pigeonhole uses, here over decoded-image aHashes.
    */
  def phashNearDups(sig: DataFrame, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, s"4-band pigeonhole is complete only to 3")
    // materialize the hash table once (24 B/row — hashes, never image
    // bytes): both sides of the band equi-join consume it, and without
    // the barrier each side re-runs the upstream decode+hash chain
    val bands = sig
      .select(col(idCol).as("__id"), col("ahash_hi").as("__hi"),
        col("ahash_lo").as("__lo"))
      .where(col("__hi").isNotNull)
      .localCheckpoint(false)
      .select(col("__id"), col("__hi"), col("__lo"),
        explode(array(
          struct(lit(0).as("bi"), (col("__lo") % 65536L).as("bv")),
          struct(lit(1).as("bi"), (col("__lo") / 65536L).cast("long").as("bv")),
          struct(lit(2).as("bi"), (col("__hi") % 65536L).as("bv")),
          struct(lit(3).as("bi"), (col("__hi") / 65536L).cast("long").as("bv"))))
          .as("b"))
      .select(col("__id"), col("__hi"), col("__lo"),
        col("b.bi").as("__bi"), col("b.bv").as("__bv"))
    val a = bands.select(col("__id").as("id_a"), col("__hi").as("ha"),
      col("__lo").as("la"), col("__bi"), col("__bv"))
    val b = bands.select(col("__id").as("id_b"), col("__hi").as("hb"),
      col("__lo").as("lb"), col("__bi"), col("__bv"))
    // a pair agreeing on k bands appears k times; keep only the row
    // whose join band is the FIRST band the two hashes agree on — a
    // projection-level dedupe (both full hashes are in the row), no
    // distinct() exchange over the candidate fanout
    val firstAgree = when(
        col("la") % 65536L === col("lb") % 65536L, 0)
      .when((col("la") / 65536L).cast("long") ===
        (col("lb") / 65536L).cast("long"), 1)
      .when(col("ha") % 65536L === col("hb") % 65536L, 2)
      .otherwise(3)
    a.join(b, Seq("__bi", "__bv"))
      .where(col("id_a") < col("id_b") && col("__bi") === firstAgree)
      .select(col("id_a"), col("id_b"),
        (bit_count(col("ha").bitwiseXOR(col("hb"))) +
          bit_count(col("la").bitwiseXOR(col("lb")))).cast("long")
          .as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  // ---- audio: real RIFF/WAVE PCM round-trip ---------------------------
  //
  // The audio sibling of the PNG path above: the fixture side writes
  // spec-conformant WAV bytes with a minimal hand-rolled RIFF writer
  // (like encodeRgbPng — this repo already writes its binary formats
  // directly), the decode side goes through the JDK's certified
  // `javax.sound.sampled` reader (ships with the JVM, no external
  // codecs), and the per-document samples are a pure integer formula a
  // SQL oracle replays — so a cross-engine hash match certifies the
  // whole encode→decode→feature round-trip, not just plumbing.

  /** Minimal spec-conformant RIFF/WAVE writer for 16-bit signed PCM
    * mono: "RIFF" + "WAVE" + a 16-byte "fmt " chunk (PCM, 1 channel)
    * + one "data" chunk of little-endian samples. Any compliant reader
    * (the `javax.sound.sampled` reader used by [[decodeWavPcm16]],
    * ffmpeg, sox) reads back the exact sample values.
    */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                 // audio format: PCM
      .putShort(1)                 // channels: mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)      // byte rate
      .putShort(2)                 // block align
      .putShort(16)                // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
    buf.array()
  }

  /** REAL WAV decode via the JDK's built-in `javax.sound.sampled`
    * reader — the certified decode path (the writer above is never
    * consulted). Returns (sampleRate, samples) for 16-bit signed PCM
    * mono payloads, None when the bytes aren't decodable audio.
    */
  def decodeWavPcm16(payload: Array[Byte]): Option[(Int, Array[Short])] = {
    if (payload == null || payload.length == 0) None
    else try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val f = in.getFormat
        if (f.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            f.getSampleSizeInBits != 16 || f.getChannels != 1) None
        else {
          val bytes = in.readAllBytes()
          val n = bytes.length / 2
          val out = new Array[Short](n)
          var i = 0
          if (f.isBigEndian)
            while (i < n) {
              out(i) = (((bytes(2 * i) & 0xff) << 8) | (bytes(2 * i + 1) & 0xff)).toShort
              i += 1
            }
          else
            while (i < n) {
              out(i) = (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort
              i += 1
            }
          Some((f.getSampleRate.toInt, out))
        }
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** Fixture sample rate for the synthetic audio corpus (8 kHz mono —
    * 0.2–0.4 s clips at the formula lengths below).
    */
  val syntheticWavRate = 8000

  /** Deterministic per-document PCM samples — the formula a SQL oracle
    * replays (all integer arithmetic, BIGINT-exact):
    * n = 1600 + (id % 32)·50 samples, amplitude amp = 256 + (id % 8)·256,
    * sample(t) = ((id·7919 + t·104729) mod (2·amp+1)) − amp.
    */
  def syntheticSamples(id: Long): Array[Short] = {
    val n = (1600 + (id % 32) * 50).toInt
    val amp = 256 + (id % 8) * 256
    val m = 2 * amp + 1
    val out = new Array[Short](n)
    var t = 0
    while (t < n) {
      out(t) = ((id * 7919 + t * 104729L) % m - amp).toShort
      t += 1
    }
    out
  }

  /** Synthesize a real-WAV payload column from an id column
    * (partition-local): [[syntheticSamples]] through the RIFF writer.
    */
  def withSyntheticWav(df: DataFrame, idCol: String,
      payloadCol: String = "payload"): DataFrame = {
    val schema = df.schema.add(payloadCol, BinaryType)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val iIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(iIdx)
        Row.fromSeq(row.toSeq :+
          encodeWavPcm16(syntheticSamples(id), syntheticWavRate))
      }
    }(enc)
  }

  /** Integer-exact features of a decoded clip: n_samples, peak = max|s|,
    * sum_sq = Σs², zero_cross = #{t ≥ 1 : sign(s[t-1] ≥ 0) ≠ sign(s[t] ≥ 0)}.
    * All sums fit a Long at any realistic clip length (2³¹ samples of
    * ±2¹⁵ → Σs² < 2⁶¹).
    */
  def audioFeatures(samples: Array[Short]): (Long, Long, Long, Long) = {
    var peak = 0L; var sumSq = 0L; var zc = 0L
    var i = 0
    while (i < samples.length) {
      val v = samples(i).toLong
      val a = math.abs(v)
      if (a > peak) peak = a
      sumSq += v * v
      if (i > 0 && (samples(i - 1) >= 0) != (v >= 0)) zc += 1
      i += 1
    }
    (samples.length.toLong, peak, sumSq, zc)
  }

  /** Decode audio payloads partition-locally (no shuffle) and attach the
    * integer-exact feature columns; rows whose payload doesn't decode as
    * 16-bit PCM mono get nulls. Only the 5 feature longs ever reach a
    * shuffle — the audio bytes never do.
    */
  def withAudioFeatures(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = df.schema
      .add("sample_rate", LongType).add("n_samples", LongType)
      .add("peak", LongType).add("sum_sq", LongType)
      .add("zero_cross", LongType)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.map { row =>
        decodeWavPcm16(row.getAs[Array[Byte]](pIdx)) match {
          case Some((rate, samples)) =>
            val (n, peak, sumSq, zc) = audioFeatures(samples)
            Row.fromSeq(row.toSeq :+ rate.toLong :+ n :+ peak :+ sumSq :+ zc)
          case None =>
            Row.fromSeq(row.toSeq :+ null :+ null :+ null :+ null :+ null)
        }
      }
    }(enc)
  }

  /** The q179 audio-gate rule ladder over decoded features — FIRST
    * matching rule wins (clipping ≻ too_short ≻ low_energy ≻ keep), all
    * integer comparisons. One definition serves the batch query and the
    * streaming twin, so their verdicts are identical by construction.
    */
  def withAudioGate(df: DataFrame, payloadCol: String): DataFrame =
    withAudioFeatures(df, payloadCol).withColumn("reason",
      when(col("peak") >= 2040L, "clipping")
        .when(col("n_samples") < 1700L, "too_short")
        .when(col("sum_sq") < col("n_samples") * 30000L, "low_energy")
        .otherwise("keep"))

  /** Deterministic fake resize: a real implementation decodes, scales
    * to targetW × targetH and re-encodes; the stub emits a payload of
    * exactly targetW*targetH bytes sampled by stride from the source so
    * size contracts and content determinism are testable.
    * >>> REAL CODEC GOES HERE (image libs absent in container). <<<
    */
  def resizeStub(payload: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    if (payload == null || payload.isEmpty) new Array[Byte](targetW * targetH)
    else {
      val out = new Array[Byte](targetW * targetH)
      var i = 0
      while (i < out.length) {
        out(i) = payload((i.toLong * payload.length / out.length).toInt)
        i += 1
      }
      out
    }
  }

  /** Resize payloads partition-locally (no shuffle); replaces the
    * payload column and stamps the new dimensions.
    */
  def withResized(df: DataFrame, payloadCol: String,
      targetW: Int, targetH: Int): DataFrame = {
    val schema = df.schema
      .add("resized_w", IntegerType).add("resized_h", IntegerType)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.map { row =>
        val seq = row.toSeq.updated(pIdx,
          resizeStub(row.getAs[Array[Byte]](pIdx), targetW, targetH))
        Row.fromSeq(seq :+ targetW :+ targetH)
      }
    }(enc)
  }

  /** Deterministic fake feature extraction: `dims` floats from strided
    * byte windows, L2-normalized — the embedding-column contract the
    * ANN operators consume (a real model inference call drops in here).
    * >>> REAL MODEL GOES HERE. <<<
    */
  def featureStub(payload: Array[Byte], dims: Int): Array[Float] = {
    val out = new Array[Float](dims)
    if (payload != null && payload.nonEmpty) {
      var i = 0
      while (i < dims) {
        var acc = 0.0f
        var j = i
        while (j < payload.length) { acc += (payload(j) & 0xff) - 128; j += dims }
        out(i) = acc
        i += 1
      }
      val norm = math.sqrt(out.map(v => v.toDouble * v).sum)
      if (norm > 0) {
        var i2 = 0
        while (i2 < dims) { out(i2) = (out(i2) / norm).toFloat; i2 += 1 }
      }
    }
    out
  }

  /** Attach an embedding column partition-locally — output feeds
    * `ops/Ann` / `ops/Dedup.embeddingNearDups` directly.
    */
  def withFeatures(df: DataFrame, payloadCol: String, dims: Int = 64,
      outCol: String = "embedding"): DataFrame = {
    val schema = df.schema.add(outCol, ArrayType(FloatType, containsNull = false))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.map { row =>
        Row.fromSeq(row.toSeq :+
          featureStub(row.getAs[Array[Byte]](pIdx), dims).toSeq)
      }
    }(enc)
  }

  /** Frame sampling for video payloads: deterministic byte strides —
    * output one row per sampled "frame" (payload slice + frame index).
    */
  def sampleFrames(df: DataFrame, payloadCol: String, idCol: String,
      everyN: Int = 10): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame_bytes", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val iIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.flatMap { row =>
        val payload = row.getAs[Array[Byte]](pIdx)
        val id = row.getLong(iIdx)
        if (payload == null) Iterator.empty
        else {
          val frameSize = math.max(1, payload.length / 30)
          (0 until 30 by everyN).iterator.map { f =>
            val start = math.min(f * frameSize, payload.length)
            val end = math.min(payload.length, start + frameSize)
            Row(id, f, java.util.Arrays.copyOfRange(payload, start, end))
          }
        }
      }
    }(enc)
  }
}
