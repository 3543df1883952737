package graft.examples

import org.apache.spark.sql.SparkSession

/** Diagnostic: interleaved A/B timing of one SparkEntry query over graft vs
  * parquet in one JVM (alternating runs, so machine load lands on both
  * formats equally — the bench's suite-then-suite order cannot tell noise
  * from regression on a loaded box).
  *
  *   sbt "runMain graft.examples.QueryAB q5_local_supplier /root/testdata/sf0.1 5"
  */
object QueryAB {
  def main(args: Array[String]): Unit = {
    val q = if (args.length > 0) args(0) else "q5_local_supplier"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 5
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.all.foreach(t => graft.Tables.load(spark, sfDir, t))

    def time(fmt: String): Double = {
      spark.catalog.clearCache()
      sys.props("graft.tables.format") = fmt
      try {
        val df = graft.SparkEntry.queries(q)(spark, sfDir)
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      } finally sys.props.remove("graft.tables.format")
    }

    time("graft"); time("parquet") // warm
    val g = collection.mutable.ArrayBuffer[Double]()
    val p = collection.mutable.ArrayBuffer[Double]()
    (1 to runs).foreach { i =>
      g += time("graft"); p += time("parquet")
      println(f"RUN$i: graft ${g.last}%.3f s  parquet ${p.last}%.3f s")
    }
    println(f"MIN: graft ${g.min}%.3f s  parquet ${p.min}%.3f s  ratio ${g.min / p.min}%.2f")
    spark.stop()
  }
}
