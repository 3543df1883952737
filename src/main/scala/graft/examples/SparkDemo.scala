package graft.examples

import org.apache.spark.sql.SparkSession

/** Drives the DSv2 connector at its user surface: parquet -> graft ->
  * query, plan inspection, and error-path probes.
  */
object SparkDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"

    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    li.write.format("graft").mode("overwrite").save("/tmp/graft-demo/lineitem")
    val g = spark.read.format("graft").load("/tmp/graft-demo/lineitem")
    println(s"rows parquet=${li.count()} graft=${g.count()}")

    println("--- plan for 2-column projection + filter ---")
    val q = g.select("l_orderkey", "l_quantity").filter(org.apache.spark.sql.functions.col("l_quantity") > 30)
    q.explain("formatted")
    println(s"projected rows: ${q.count()}")

    println("--- probe: load dir with no graft files ---")
    try {
      spark.read.format("graft").load("/tmp/graft-demo-empty").count()
      println("NO ERROR (bad)")
    } catch { case e: Exception => println(s"error: ${e.getMessage.linesIterator.next()}") }

    println("--- probe: default SaveMode (ErrorIfExists) ---")
    try {
      li.write.format("graft").save("/tmp/graft-demo/lineitem")
      println("NO ERROR")
    } catch { case e: Exception => println(s"error: ${e.getMessage.linesIterator.next()}") }

    println("--- probe: append mode doubles rows ---")
    li.limit(10).write.format("graft").mode("append").save("/tmp/graft-demo/app")
    li.limit(10).write.format("graft").mode("append").save("/tmp/graft-demo/app")
    println(s"append rows: ${spark.read.format("graft").load("/tmp/graft-demo/app").count()} (want 20)")

    spark.stop()
  }
}
