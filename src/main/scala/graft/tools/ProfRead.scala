package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler: phase timing of the fast local read path on an
  * existing wide hive layout (arg = dataset dir).
  */
object ProfRead {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profread] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    (1 to 2).foreach { round =>
      println(s"-- round $round")
      val st = t("partFileStatuses")(graft.meta.Footer.partFileStatuses(dir)).get
      println(s"[profread] files: ${st.size}")
      import org.apache.spark.sql.execution.datasources.{FileStatusCache, InMemoryFileIndex}
      import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
      val conf = spark.sessionState.newHadoopConf()
      val root = new org.apache.hadoop.fs.Path(dir)
      val fs = root.getFileSystem(conf)
      val qualified = fs.makeQualified(root)
      val statuses = t("makeQualified x N")(st.map(s =>
        new org.apache.hadoop.fs.FileStatus(s.getLen, false, s.getReplication,
          s.getBlockSize, s.getModificationTime,
          fs.makeQualified(s.getPath))).toArray)
      val cache = FileStatusCache.getOrCreate(spark)
      t("putLeafFiles")(cache.putLeafFiles(qualified, statuses))
      val opts = Map("mergeSchema" -> "false", "basePath" -> qualified.toString)
      val index = t("new InMemoryFileIndex")(
        new InMemoryFileIndex(spark, Seq(qualified), opts, None,
          fileStatusCache = cache))
      t("partitionSpec()")(index.partitionSpec())
      val fmt = new ParquetFileFormat
      val schema = t("inferSchema")(
        fmt.inferSchema(spark, opts, statuses.toIndexedSeq)).get
      t("HadoopFsRelation+baseRelationToDataFrame") {
        spark.baseRelationToDataFrame(
          org.apache.spark.sql.execution.datasources.HadoopFsRelation(index,
            index.partitionSpec().partitionColumns, schema, None, fmt,
            opts)(spark))
      }
      t("GeoTable.read full")(graft.table.GeoTable.read(spark, dir))
    }
    spark.stop()
  }
}
