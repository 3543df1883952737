package graft.spark

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The `strawboat-import` DSv2 source: legacy reference-layout files
  * queried IN PLACE — schema inference from the footer, one partition per
  * file, top-level column pruning down to the byte level, COUNT(*) with an
  * empty projection, and Catalyst operators running directly over the
  * foreign files. Fixtures are written by GraftExport (itself pinned by
  * the format specs + the oracle gate).
  */
class StrawboatImportSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rm(p: String): Unit =
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))

  private def stageFlat(dir: String): Unit = {
    rm(dir)
    val df = spark.range(0, 200).repartition(3).select(
      col("id"),
      concat(lit("name"), col("id")).as("name"),
      (col("id") * 2.5).as("score"),
      when(col("id") % 9 === 0, lit(null)).otherwise(col("id") % 5).as("bucket"))
    GraftExport.write(df, dir)
  }

  test("query legacy files in place: schema, filter, aggregate") {
    val dir = "/tmp/graft-test/straw-src-flat"
    stageFlat(dir)
    val df = spark.read.format("strawboat-import").load(dir)
    assert(df.schema.fieldNames.toSeq == Seq("id", "name", "score", "bucket"))
    assert(df.count() == 200)
    val agg = df.filter(col("id") % 2 === 0)
      .agg(sum("id").as("s"), count(lit(1)).as("n")).head()
    assert(agg.getLong(1) == 100)
    assert(agg.getLong(0) == (0L until 200L by 2).sum)
    // joins/groupBy run straight over the foreign files
    val grouped = df.groupBy("bucket").agg(count(lit(1)).as("n"))
      .orderBy("bucket").collect()
    assert(grouped.map(_.getLong(1)).sum == 200)
  }

  test("column pruning reaches the scan (ReadSchema carries only selected)") {
    val dir = "/tmp/graft-test/straw-src-prune"
    stageFlat(dir)
    val df = spark.read.format("strawboat-import").load(dir).select("name")
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("columns [name]"), s"scan not pruned:\n$plan")
    assert(df.orderBy("name").head().getString(0) == "name0")
  }

  test("COUNT(*) uses an empty projection and still counts rows") {
    val dir = "/tmp/graft-test/straw-src-count"
    stageFlat(dir)
    val df = spark.read.format("strawboat-import").load(dir)
    val plan = df.groupBy().count().queryExecution.executedPlan.toString()
    assert(plan.contains("columns []"), s"expected empty projection:\n$plan")
    assert(df.groupBy().count().head().getLong(0) == 200L)
  }

  test("nested-first-column table: COUNT(*) from page headers, values intact") {
    val dir = "/tmp/graft-test/straw-src-nested"
    rm(dir)
    val src = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(Seq(1L, 2L), "a"), Row(Seq.empty[Long], "b"), Row(null, "c"),
        Row(Seq(7L), "d")), 2),
      StructType(Seq(
        StructField("xs", ArrayType(LongType, containsNull = false), nullable = true),
        StructField("tag", StringType, nullable = false))))
    GraftExport.write(src, dir)
    val df = spark.read.format("strawboat-import").load(dir)
    assert(df.count() == 4L)
    val got = df.orderBy("tag").collect()
    assert(Option(got(0).getSeq[Long](0)).map(_.toList).orNull == List(1L, 2L))
    assert(got(2).isNullAt(0))
    // selecting ONLY the flat column skips the nested column's pages
    assert(df.select("tag").orderBy("tag").collect().map(_.getString(0)).toSeq ==
      Seq("a", "b", "c", "d"))
  }

  test("one partition per file") {
    val dir = "/tmp/graft-test/straw-src-parts"
    stageFlat(dir) // 3 repartitions -> up to 3 files
    val files = new java.io.File(dir).listFiles().count(_.getName.endsWith(".str"))
    val df = spark.read.format("strawboat-import").load(dir)
    assert(df.rdd.getNumPartitions == files)
  }
}
