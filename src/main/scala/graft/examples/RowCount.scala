package graft.examples

import org.apache.spark.sql.SparkSession

/** Diagnostic: row counts for selected SparkEntry queries over graft
  * storage — the fastest "did a plan rewrite change the result set?"
  * check before running the full Verify+DuckDB gate. Usage:
  *   sbt "runMain graft.examples.RowCount [sfDir] [query ...]"
  */
object RowCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(s"ROWS $name: $n")
    }
    spark.stop()
  }
}
