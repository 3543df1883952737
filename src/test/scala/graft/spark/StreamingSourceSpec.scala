package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("readStream.format(graft) processes existing and newly arriving files") {
    val dir = "/tmp/graft-test/stream-src"
    spark.range(100).selectExpr("id as k", "id * 2 as v")
      .write.format("graft").mode("overwrite").save(dir)

    val schema = spark.read.format("graft").load(dir).schema
    val stream = spark.readStream.format("graft").schema(schema).load(dir)
      .groupBy().agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("graft_stream_test").start()
    try {
      q.processAllAvailable()
      val r1 = spark.table("graft_stream_test").head()
      assert(r1.getLong(0) == 100L)
      assert(r1.getLong(1) == (0L until 100L).map(_ * 2).sum)

      // new file arrives -> next micro-batch picks up only the delta
      spark.range(100, 150).selectExpr("id as k", "id * 2 as v")
        .write.format("graft").mode("append").save(dir)
      q.processAllAvailable()
      val r2 = spark.table("graft_stream_test").head()
      assert(r2.getLong(0) == 150L)
      assert(r2.getLong(1) == (0L until 150L).map(_ * 2).sum)
    } finally q.stop()
  }
}
