package graft.examples

import org.apache.spark.sql.SparkSession

/** Prints `.explain("formatted")` for selected queries over graft storage —
  * the plan-shape review loop: check broadcasts, pushed filters, ReadSchema
  * pruning, and WholeStageCodegen spans. Usage:
  *   sbt "runMain graft.examples.PlanAudit [sfDir] [query ...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q5_local_supplier", "q3_shipping_priority", "q10_returned_items")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n================ $name ================")
      graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
