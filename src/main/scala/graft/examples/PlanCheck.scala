package graft.examples
import org.apache.spark.sql.SparkSession
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val q = graft.SparkEntry.queries("q5_local_supplier")(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    println("JOINS: " + plan.linesIterator.filter(l => l.contains("Join") || l.contains("Exchange")).map(_.trim.take(90)).mkString("\n"))
    spark.stop()
  }
}
