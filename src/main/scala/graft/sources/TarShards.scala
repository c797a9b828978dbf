package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style tar shard sink + source: training samples packed as
  * `<key>.<ext>` entries in size-bounded POSIX ustar shards
  * (`shard-00000.tar`, ...) — the container format multimodal training
  * loaders stream sequentially. Reference pipelines publish corpora
  * this way because a tar shard is one sequential read: no per-sample
  * object-store round-trips at 100 TB.
  *
  * Spark-native on both sides, no driver funnel: the sink hashes keys
  * to shards and writes each shard inside one `foreachPartition` task
  * through the Hadoop FileSystem (so `file://`, `hdfs://` or any
  * mounted connector works); the source is a `binaryFile` scan +
  * per-file parse (a shard parses in one task — shards are the
  * parallelism unit, exactly as training loaders consume them).
  *
  * The tar writer emits plain ustar: 512-byte headers (name ≤ 100
  * bytes, octal size/mtime, checksum over a space-filled checksum
  * field, typeflag '0', magic "ustar" NUL + version "00"), data
  * padded to 512, two zero blocks at end — readable by GNU/BSD tar and
  * Python's tarfile.
  */
object TarShards {

  private val BLOCK = 512

  private[graft] def header(name: String, size: Long): Array[Byte] = {
    require(name.getBytes("UTF-8").length <= 100,
      s"tar entry name exceeds 100 bytes: $name")
    // 11 octal digits = 8 GiB - 1; a larger size would silently
    // truncate the field and misalign every subsequent entry
    require(size >= 0 && size < (1L << 33),
      s"tar entry $name is $size bytes — exceeds the ustar 8 GiB limit")
    val h = new Array[Byte](BLOCK)
    def put(s: String, off: Int, len: Int): Unit = {
      val b = s.getBytes("UTF-8")
      System.arraycopy(b, 0, h, off, math.min(b.length, len))
    }
    put(name, 0, 100)
    put("0000644", 100, 8) // mode (block is zero-filled: NUL-terminated)
    put("0000000", 108, 8) // uid
    put("0000000", 116, 8) // gid
    put(f"$size%011o", 124, 12) // size, octal
    put("00000000000", 136, 12) // mtime 0: deterministic shards
    h(156) = '0' // typeflag: regular file
    put("ustar", 257, 5) // POSIX magic "ustar\0" + version "00"
    h(263) = '0'; h(264) = '0'
    // checksum: sum of header bytes with the checksum field as spaces
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    val sum = h.map(_ & 0xff).sum
    put(f"$sum%06o", 148, 8)
    h(154) = 0; h(155) = ' ' // checksum terminator: NUL then space
    h
  }

  /** Write `df` as tar shards under `dir`. Each row becomes one sample:
    * entries `<key>.<ext>` for every (ext, bytesCol) pair, in the given
    * order (webdataset groups a sample by key prefix). Rows hash to
    * `nShards` shards by key, and within a shard samples are written in
    * key order — the layout is deterministic for a given input.
    */
  def write(df: DataFrame, dir: String, keyCol: String,
      entries: Seq[(String, String)], nShards: Int = 16): Unit = {
    require(entries.nonEmpty, "at least one (ext, bytesCol) entry")
    val cols = col(keyCol).cast("string").as("__key") +:
      entries.map { case (_, c) => col(c).cast("binary") }
    val exts = entries.map(_._1)
    val prepared = df.select(cols: _*)
      .withColumn("__shard", pmod(hash(col("__key")), lit(nShards)))
      .repartition(nShards, col("__shard"))
      .sortWithinPartitions(col("__shard"), col("__key"))
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    prepared.foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        // rows arrive sorted by (__shard, __key); two shard ids can
        // co-reside in one partition (hash collision mod nShards), so
        // roll to a new tar whenever the shard id changes
        var out: org.apache.hadoop.fs.FSDataOutputStream = null
        var current = Int.MinValue
        def close(): Unit = if (out != null) {
          out.write(new Array[Byte](2 * BLOCK)) // end-of-archive
          out.close(); out = null
        }
        try {
          rows.foreach { row =>
            val shard = row.getAs[Int]("__shard")
            if (shard != current) {
              close()
              val path = new org.apache.hadoop.fs.Path(
                dir, f"shard-$shard%05d.tar")
              out = path.getFileSystem(conf.value).create(path, true)
              current = shard
            }
            val key = row.getString(0)
            exts.indices.foreach { i =>
              val bytes = row.get(i + 1).asInstanceOf[Array[Byte]]
              if (bytes != null) {
                out.write(header(s"$key.${exts(i)}", bytes.length.toLong))
                out.write(bytes)
                val pad = (BLOCK - bytes.length % BLOCK) % BLOCK
                if (pad > 0) out.write(new Array[Byte](pad))
              }
            }
          }
        } finally close()
    }
  }

  /** Read tar shards back as one row per entry:
    * (shard, key, ext, content: binary). Each shard parses inside its
    * own task off the `binaryFile` scan.
    */
  /** Parse one ustar shard to (key, ext, content) entries — the udf body
    * of [[read]], extracted so the mutation-fuzz suite can drive it
    * without a Spark job per case. Loud (require) on any corruption.
    */
  private[graft] def parseTarEntries(path: String,
      bytes: Array[Byte]): Seq[(String, String, Array[Byte])] = {
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(String, String, Array[Byte])]
      def octalField(o: Int, len: Int): Long = {
        val str = new String(bytes, o, len, "US-ASCII")
          .dropWhile(c => c == ' ' || c == 0)
          .takeWhile(c => c >= '0' && c <= '7')
        java.lang.Long.parseLong(str, 8)
      }
      var off = 0
      var done = false
      while (!done && off + BLOCK <= bytes.length) {
        if (bytes(off) == 0) done = true // zero block: end of archive
        else {
          val name = new String(bytes, off, 100, "UTF-8")
            .takeWhile(_ != 0.toChar)
          val size = octalField(off + 124, 12)
          // verify the ustar magic + checksum before trusting the entry
          val magic = new String(bytes, off + 257, 5, "US-ASCII")
          require(magic == "ustar", s"bad tar magic in $path at $off")
          val stored = octalField(off + 148, 8)
          var sum = 0L
          var i = 0
          while (i < BLOCK) {
            sum += (if (i >= 148 && i < 156) ' '.toInt
              else bytes(off + i) & 0xff)
            i += 1
          }
          require(sum == stored, s"tar checksum mismatch in $path at $off")
          // size.toInt below would wrap for >2 GiB entries (JVM arrays
          // cap there anyway) — fail loudly instead of decoding garbage
          require(size >= 0 && size <= Int.MaxValue.toLong - BLOCK,
            s"tar entry $name is $size bytes — exceeds the 2 GiB " +
              "JVM array limit of this reader")
          // a corrupt size past end-of-archive must fail loudly BEFORE
          // copyOfRange: Arrays.copyOfRange zero-PADS past the source
          // end, so a mutated 2 GB size field allocates 2 GB of zeros
          // (an executor-killing OOM) instead of erroring (same class
          // as the round-13 Shapefile/FlatGeobuf fuzz findings)
          require(off + BLOCK + size <= bytes.length,
            s"tar entry $name claims $size bytes but only " +
              s"${bytes.length - off - BLOCK} remain in $path")
          val data = java.util.Arrays.copyOfRange(bytes,
            off + BLOCK, off + BLOCK + size.toInt)
          // FIRST dot, the webdataset convention: "k.json.gz" is
          // sample key "k" with extension "json.gz" — a last-dot split
          // gave ("k.json", "gz"), so the entries of one sample no
          // longer shared a key and groupBy(key) reconstruction paired
          // nothing (keys themselves must not contain dots, same as
          // webdataset)
          val dot = name.indexOf('.')
          val (key, ext) =
            if (dot >= 0) (name.substring(0, dot), name.substring(dot + 1))
            else (name, "")
          out += ((key, ext, data))
          off += BLOCK + ((size.toInt + BLOCK - 1) / BLOCK) * BLOCK
        }
      }
      out.toSeq
  }

  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val parse = udf { (path: String, bytes: Array[Byte]) =>
      parseTarEntries(path, bytes)
    }
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tar")
      .load(dir)
      .select(regexp_extract(input_file_name(), "shard-(\\d+)\\.tar", 1)
        .cast("int").as("shard"),
        explode(parse(input_file_name(), $"content")).as("e"))
      .select($"shard", $"e._1".as("key"), $"e._2".as("ext"),
        $"e._3".as("content"))
  }
}
