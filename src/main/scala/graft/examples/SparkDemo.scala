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

    println("--- zone-map pruning at the SQL surface ---")
    spark.range(200000).selectExpr("id as k", "id * 3 as v").orderBy("k").coalesce(1)
      .write.format("graft").mode("overwrite").save("/tmp/graft-demo/sorted")
    val sorted = spark.read.format("graft").load("/tmp/graft-demo/sorted")
    graft.spark.GraftMetrics.pageGroupsSkipped.set(0)
    graft.spark.GraftMetrics.pageGroupsRead.set(0)
    val zq = sorted.filter(org.apache.spark.sql.functions.col("k").between(150000, 151000))
    println(s"scan node: ${zq.queryExecution.executedPlan.collectLeaves().head.toString.linesIterator.next()}")
    println(s"rows=${zq.count()} pageGroupsSkipped=${graft.spark.GraftMetrics.pageGroupsSkipped.get()} read=${graft.spark.GraftMetrics.pageGroupsRead.get()}")

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

    println("--- nested + nullable lists through graft ---")
    spark.sql("""SELECT id,
        CASE WHEN id % 5 = 0 THEN NULL ELSE sequence(0, cast(id % 4 AS INT)) END AS xs,
        named_struct('k', concat('n', id), 'v', map(cast(id AS INT), cast(id * 2 AS BIGINT))) AS rec
      FROM range(10000)""")
      .write.format("graft").mode("overwrite").save("/tmp/graft-demo/nested")
    val nested = spark.read.format("graft").load("/tmp/graft-demo/nested")
    nested.createOrReplaceTempView("nested")
    spark.sql("""SELECT count(*) AS rows, count(xs) AS non_null_lists,
        sum(aggregate(coalesce(xs, array()), 0, (a, x) -> a + x)) AS sum_elems,
        sum(rec.v[cast(id AS INT)]) AS sum_map_vals
      FROM nested""").show()

    println("--- probe: append mode doubles rows ---")
    li.limit(10).write.format("graft").mode("append").save("/tmp/graft-demo/app")
    li.limit(10).write.format("graft").mode("append").save("/tmp/graft-demo/app")
    println(s"append rows: ${spark.read.format("graft").load("/tmp/graft-demo/app").count()} (want 20)")

    println("--- native streaming source: readStream.format(graft) ---")
    val sdir = "/tmp/graft-demo/streamsrc"
    spark.range(1000).selectExpr("id as k", "id * 2 as v")
      .write.format("graft").mode("overwrite").save(sdir)
    val sschema = spark.read.format("graft").load(sdir).schema
    val sq = spark.readStream.format("graft").schema(sschema).load(sdir)
      .groupBy().agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("demo_stream").start()
    sq.processAllAvailable()
    println(s"batch 1 count: ${spark.table("demo_stream").head().getLong(0)} (want 1000)")
    spark.range(1000, 1500).selectExpr("id as k", "id * 2 as v")
      .write.format("graft").mode("append").save(sdir)
    sq.processAllAvailable()
    println(s"after arrival: ${spark.table("demo_stream").head().getLong(0)} (want 1500)")
    sq.stop()

    spark.stop()
  }
}
