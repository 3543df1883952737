package graft.spark

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftDataSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def roundTrip(table: String): Unit = {
    val dir = s"/tmp/graft-test/$table"
    val raw = spark.read.parquet(s"$sf/$table.parquet")
    // events.ts is timestamp[ns] (read as long nanos) — normalize to micros
    val src =
      if (table == "events")
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.col("ts").divide(1000).cast("long")))
      else raw
    src.write.format("graft").mode("overwrite").save(dir)
    val back = spark.read.format("graft").load(dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      src.schema.fields.map(f => (f.name, f.dataType)).toSeq, "schema mismatch")
    assert(back.count() == src.count(), "row count mismatch")
    // cast to string for set-compare robustness (arrays not comparable via except)
    val a = src.selectExpr("cast(to_json(struct(*)) as string) as r")
    val b = back.selectExpr("cast(to_json(struct(*)) as string) as r")
    assert(a.exceptAll(b).count() == 0, s"$table: rows in parquet missing from graft")
    assert(b.exceptAll(a).count() == 0, s"$table: extra rows in graft")
  }

  for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")) {
    test(s"parquet->graft->read round-trip: $t") { roundTrip(t) }
  }

  test("column pruning reaches the scan") {
    val dir = "/tmp/graft-test/lineitem"
    val df = spark.read.format("graft").load(dir).select("l_orderkey", "l_quantity")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(df.count() > 0)
  }

  test("aggregate over graft matches parquet (q1 skeleton)") {
    import org.apache.spark.sql.functions._
    val dir = "/tmp/graft-test/lineitem"
    val g = spark.read.format("graft").load(dir)
    val p = spark.read.parquet(s"$sf/lineitem.parquet")
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").as("sq"), avg("l_extendedprice").as("ap"), count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
        .collect().toSeq.map(_.toString)
    assert(agg(g) == agg(p))
  }

  test("forced codecs still round-trip") {
    for (codec <- Seq("none", "zstd", "snappy")) {
      val dir = s"/tmp/graft-test/orders-$codec"
      val src = spark.read.parquet(s"$sf/orders.parquet")
      src.write.format("graft").option("compression", codec)
        .option("pagesize", "512").mode("overwrite").save(dir)
      val back = spark.read.format("graft").load(dir)
      assert(back.count() == src.count())
      assert(back.exceptAll(src).count() == 0)
    }
  }

  test("failed overwrite leaves previous table contents intact") {
    val dir = "/tmp/graft-test/atomic-overwrite"
    spark.range(1000).selectExpr("id", "id * 2 AS v")
      .write.format("graft").mode("overwrite").save(dir)
    assert(spark.read.format("graft").load(dir).count() == 1000)

    // overwrite job that fails mid-task must not delete the old files
    intercept[Exception] {
      spark.range(500)
        .selectExpr("id", "CASE WHEN id = 250 THEN raise_error('boom') ELSE cast(id AS string) END AS v")
        .write.format("graft").mode("overwrite").save(dir)
    }
    val back = spark.read.format("graft").load(dir)
    assert(back.count() == 1000, "old table lost by failed overwrite")
    assert(back.selectExpr("sum(v)").head.getLong(0) == (0L until 1000L).map(_ * 2).sum)

    // a successful overwrite swaps cleanly and leaves no stale files
    spark.range(200).selectExpr("id", "id * 3 AS v")
      .write.format("graft").mode("overwrite").save(dir)
    assert(spark.read.format("graft").load(dir).count() == 200)
  }

  test("strawboat alias works") {
    val dir = "/tmp/graft-test/region-alias"
    spark.read.parquet(s"$sf/region.parquet")
      .write.format("strawboat").mode("overwrite").save(dir)
    assert(spark.read.format("strawboat").load(dir).count() ==
      spark.read.parquet(s"$sf/region.parquet").count())
  }
}
