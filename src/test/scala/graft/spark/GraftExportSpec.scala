package graft.spark

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end EXPORT of a DataFrame as reference-layout files, then
  * re-import: the Spark surface (file-parallel encode, rolling by
  * rowsperfile, option plumbing) on top of the byte-level round-trip the
  * format specs pin down. Includes the full loop a real hand-back runs:
  * graft table -> export -> reference-layout dir -> import -> same rows.
  */
class GraftExportSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rm(p: String): Unit =
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))

  test("export -> import round-trip: mixed types, nulls, multiple partitions") {
    import spark.implicits._
    val dir = "/tmp/graft-test/straw-export"
    rm(dir)
    val df = spark.range(0, 100).repartition(3)
      .select(
        col("id"),
        when(col("id") % 7 === 0, lit(null)).otherwise(concat(lit("s"), col("id"))).as("s"),
        (col("id") * 3.5).as("d"),
        (col("id") % 2 === 0).as("flag"),
        when(col("id") % 5 === 0, lit(null))
          .otherwise(date_add(lit(java.sql.Date.valueOf("2020-01-01")), col("id").cast("int")))
          .as("dt"),
        col("id").cast(DecimalType(10, 2)).as("dec"),
        array(col("id"), col("id") * 2).as("arr"))
    val n = GraftExport.write(df, dir)
    assert(n == 100L)
    // one .str file per non-empty partition
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".str"))
    assert(files.nonEmpty && files.length <= 3)
    val back = GraftImport.read(spark, dir)
    assert(back.schema.fieldNames.toSeq == df.schema.fieldNames.toSeq)
    val want = df.orderBy("id").collect().toSeq
    val got = back.orderBy("id").collect().toSeq
    assert(got.size == want.size)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getLong(0) == w.getLong(0))
      assert(g.getAs[String]("s") == w.getAs[String]("s"))
      assert(g.getAs[Double]("d") == w.getAs[Double]("d"))
      assert(g.getAs[Boolean]("flag") == w.getAs[Boolean]("flag"))
      assert(g.getAs[java.sql.Date]("dt") == w.getAs[java.sql.Date]("dt"))
      assert(g.getAs[java.math.BigDecimal]("dec").compareTo(
        w.getAs[java.math.BigDecimal]("dec")) == 0)
      assert(g.getSeq[Long](6) == w.getSeq[Long](6))
    }
  }

  test("rowsperfile rolls files and compression options apply") {
    import spark.implicits._
    val base = "/tmp/graft-test/straw-export-roll"
    val sizes = Seq("none", "zstd").map { comp =>
      val dir = s"$base-$comp"
      rm(dir)
      val df = spark.range(0, 1000).coalesce(1)
        .select(col("id"), lit("padpadpadpadpadpad").as("pad"))
      assert(GraftExport.write(df, dir,
        Map("rowsperfile" -> "300", "compression" -> comp)) == 1000L)
      val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".str"))
      assert(files.length == 4, s"$comp: expected 4 rolled files, got ${files.length}")
      assert(GraftImport.read(spark, dir).count() == 1000L)
      files.map(_.length()).sum
    }
    assert(sizes(1) < sizes(0), "zstd output should be smaller than uncompressed")
  }

  test("full hand-back loop: graft table -> export -> import preserves data") {
    val gdir = "/tmp/graft-test/straw-export-src-graft"
    val xdir = "/tmp/graft-test/straw-export-handback"
    rm(gdir); rm(xdir)
    val src = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "alpha", Map("a" -> 1L), Row("x", 2.5)),
        Row(2L, null, Map.empty[String, Long], Row(null, -1.0)),
        Row(3L, "gamma", Map("b" -> 2L, "c" -> null), null))),
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("name", StringType, nullable = true),
        StructField("tags", MapType(StringType, LongType, valueContainsNull = true),
          nullable = false),
        StructField("st", StructType(Seq(
          StructField("k", StringType, nullable = true),
          StructField("v", DoubleType, nullable = false))), nullable = true))))
    src.write.format("graft").mode("overwrite").save(gdir)
    val g = spark.read.format("graft").load(gdir)
    assert(GraftExport.write(g, xdir) == 3L)
    val back = GraftImport.read(spark, xdir).orderBy("id").collect()
    assert(back.length == 3)
    assert(back(0).getAs[Map[String, Long]]("tags") == Map("a" -> 1L))
    assert(back(1).getAs[String]("name") == null)
    assert(back(2).getAs[Map[String, Any]]("tags") == Map("b" -> 2L, "c" -> null))
    assert(back(0).getAs[Row]("st") == Row("x", 2.5))
    assert(back(2).getAs[Row]("st") == null)
  }

  test("unsupported column type fails fast with a clear message") {
    import spark.implicits._
    val df = spark.range(3).select(col("id"),
      lit(java.time.Duration.ofSeconds(5)).as("bad"))
    val e = intercept[UnsupportedOperationException] {
      GraftExport.write(df, "/tmp/graft-test/straw-export-bad")
    }
    assert(e.getMessage.contains("bad"))
  }
}
