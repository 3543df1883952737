package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: isolate raw scan+decode throughput from join/agg cost.
  * Times `select <cols> -> noop` over one table in BOTH formats,
  * interleaved (graft, parquet, graft, ...) so machine load lands on both.
  *
  *   sbt "runMain graft.examples.ScanBench lineitem l_orderkey,l_extendedprice /root/testdata/sf0.1 5"
  */
object ScanBench {
  def main(args: Array[String]): Unit = {
    val table = if (args.length > 0) args(0) else "lineitem"
    val cols = (if (args.length > 1) args(1) else "l_orderkey").split(',').toSeq
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val runs = if (args.length > 3) args(3).toInt else 5
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.load(spark, sfDir, table) // ensure conversion

    def time(fmt: String): Double = {
      sys.props("graft.tables.format") = fmt
      try {
        val df = graft.Tables.load(spark, sfDir, table).select(cols.map(col): _*)
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      } finally sys.props.remove("graft.tables.format")
    }

    time("graft"); time("parquet") // warm both
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
