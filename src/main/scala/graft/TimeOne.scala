package graft

import org.apache.spark.sql.SparkSession

/** Scratch timing harness (not part of the library surface). */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val factor = if (args.length > 2) args(2).toInt else 1
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.hadoop.graft.read.prefetch.threads",
        sys.env.getOrElse("GRAFT_PREFETCH_THREADS", "1"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (factor > 1) Bench.stageAmplified(spark, sfDir, factor) else sfDir
    for (name <- names; fmt <- Seq("graft", "parquet", "graft", "parquet")) {
      spark.catalog.clearCache()
      sys.props("graft.tables.format") = fmt
      try {
        if (name.startsWith("x_")) {
          val sec = BenchMaintenance.time(spark, name, fmt, dir)
          println(f"TIMING $name $fmt $sec%.3f")
        } else {
          val df = SparkEntry.queries(name)(spark, dir)
          val t0 = System.nanoTime()
          df.write.mode("overwrite").format("noop").save()
          println(f"TIMING $name $fmt ${(System.nanoTime() - t0) / 1e9}%.3f")
        }
      } catch { case e: Throwable => println(s"TIMING $name $fmt FAILED ${e.getMessage.take(150)}") }
      finally sys.props.remove("graft.tables.format")
    }
    spark.stop()
  }
}
