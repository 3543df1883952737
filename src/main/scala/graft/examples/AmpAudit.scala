package graft.examples

import org.apache.spark.sql.SparkSession

/** Diagnostic for the scaled-bench staging (VERDICT r7 #4): the amplified
  * parquet baseline showed q1 at 65.5s — ~9x over linear extrapolation —
  * which flatters the headline scaled ratio. This tool stages the
  * amplification, dumps the per-file / per-row-group layout of the parquet
  * side, and times q1 on both formats, so a layout pathology (one giant
  * unsplittable row group, thousands of tiny ones, ...) is visible directly.
  *
  * Run: sbt "runMain graft.examples.AmpAudit /root/testdata/sf0.1 10"
  */
object AmpAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val amp = graft.Bench.stageAmplified(spark, sfDir, factor)
    println(s"staged: $amp")

    val conf = spark.sessionState.newHadoopConf()
    Seq("lineitem", "orders", "documents").foreach { t =>
      val dir = new org.apache.hadoop.fs.Path(s"$amp/$t.parquet")
      val fs = dir.getFileSystem(conf)
      val files = fs.listStatus(dir).filter(f =>
        f.isFile && f.getPath.getName.endsWith(".parquet"))
      println(s"\n== $t: ${files.length} files, " +
        f"${files.map(_.getLen).sum / 1e6}%.1f MB total")
      files.sortBy(_.getPath.getName).foreach { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f.getPath, conf)
        val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val rgs = rdr.getFooter.getBlocks
          val rows = rgs.asInstanceOf[java.util.List[org.apache.parquet.hadoop.metadata.BlockMetaData]]
          import scala.jdk.CollectionConverters._
          val sizes = rows.asScala.map(b => (b.getRowCount, b.getTotalByteSize))
          println(f"  ${f.getPath.getName}%-60s ${f.getLen / 1e6}%8.1f MB " +
            s"rowgroups=${sizes.length} rows=${sizes.map(_._1).sum} " +
            f"rg_rows[min=${if (sizes.isEmpty) 0L else sizes.map(_._1).min}%d," +
            f"max=${if (sizes.isEmpty) 0L else sizes.map(_._1).max}%d]")
        } finally rdr.close()
      }
    }

    def timeQ1(format: String): Double = {
      sys.props("graft.tables.format") = format
      try {
        spark.catalog.clearCache()
        val df = graft.SparkEntry.queries("q1_pricing_summary")(spark, amp)
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      } finally sys.props.remove("graft.tables.format")
    }
    graft.Tables.all.foreach(t => graft.Tables.load(spark, amp, t))
    Seq(1, 2, 3).foreach { i =>
      val p = timeQ1("parquet"); val g = timeQ1("graft")
      println(f"\nq1 run $i: parquet=$p%.2fs graft=$g%.2fs")
    }
    spark.stop()
  }
}
