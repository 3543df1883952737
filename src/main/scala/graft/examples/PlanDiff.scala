package graft.examples

import org.apache.spark.sql.SparkSession

/** Diagnostic: print the FINAL (post-AQE) physical plan skeleton of one
  * SparkEntry query under graft and parquet side by side — join strategies,
  * exchanges, and scan nodes only.
  *
  *   sbt "runMain graft.examples.PlanDiff q10_returned_items /root/testdata/sf0.1"
  */
object PlanDiff {
  def main(args: Array[String]): Unit = {
    val q = if (args.length > 0) args(0) else "q10_returned_items"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.all.foreach(t => graft.Tables.load(spark, sfDir, t))

    def skeleton(fmt: String): String = {
      sys.props("graft.tables.format") = fmt
      try {
        val df = graft.SparkEntry.queries(q)(spark, sfDir)
        df.collect() // run THIS QueryExecution so the printed plan is AQE-final
        df.queryExecution.executedPlan.toString.linesIterator
          .filter(l => l.contains("Join") || l.contains("Exchange") ||
            l.contains("Scan") || l.contains("Aggregate") || l.contains("Sort"))
          .map(_.replaceAll("#\\d+L?", "").take(150)).mkString("\n")
      } finally sys.props.remove("graft.tables.format")
    }

    println("==== GRAFT ====\n" + skeleton("graft"))
    println("==== PARQUET ====\n" + skeleton("parquet"))
    spark.stop()
  }
}
