package graft.examples

import org.apache.spark.sql.SparkSession

/** Diagnostic: interleaved A/B timing of one BenchMaintenance op (the
  * bench's x_* entries) over graft vs parquet in one JVM — the maintenance
  * counterpart of [[QueryAB]].
  *
  *   sbt "runMain graft.examples.MaintAB x_cdc_apply /root/testdata/sf0.01 3"
  */
object MaintAB {
  def main(args: Array[String]): Unit = {
    val op = if (args.length > 0) args(0) else "x_delete_where"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val runs = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(fmt: String): Double =
      graft.BenchMaintenance.time(spark, op, fmt, sfDir)

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
