package graft.examples

import org.apache.spark.sql.SparkSession

/** Writes `.explain("formatted")` output for the named SparkEntry queries
  * (graft format) to `<outDir>/<query>_<suffix>.txt` — the audit artifact
  * the optimization rounds commit under plans/rNN/.
  *
  *   sbt "runMain graft.examples.PlanDump plans/r19 before q1_pricing_summary,q6_forecast_revenue [sfDir]"
  *
  * Query list "headline" expands to Bench.headline minus the x_ maintenance
  * ops (those are custom timed operations, not single DataFrames).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.length > 0) args(0) else "plans/r19"
    val suffix = if (args.length > 1) args(1) else "before"
    val qArg = if (args.length > 2) args(2) else "headline"
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    val names: Seq[String] =
      if (qArg == "headline")
        graft.Bench.headline.filterNot(_.startsWith("x_"))
      else qArg.split(",").toSeq
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.all.foreach(t => graft.Tables.load(spark, sfDir, t))
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), txt)
        println(s"PLANDUMP ok $name")
      } catch { case e: Throwable =>
        println(s"PLANDUMP fail $name: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
