package graft.examples

import graft.format._
import graft.spark.GraftSchema
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructType}

/** Shows per-page codec choices on real TPC-H data through the user-facing
  * write API, incl. the forcecodec option (reference analogue: the env-var
  * forced codecs in `/root/reference/src/util/env.rs` + `stat.rs` test).
  */
object CodecDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    li.coalesce(1).write.format("graft").mode("overwrite").save("/tmp/codec-demo/li")

    val file = new java.io.File("/tmp/codec-demo/li").listFiles()
      .filter(_.getName.endsWith(".graft")).head.toPath
    val in = new LocalFileInput(file)
    val footer = GraftFileReader.readFooter(in)
    val schema = DataType.fromJson(footer.schemaJson).asInstanceOf[StructType]
    val specs = schema.fields.flatMap(f => GraftSchema.leafSpecs(f.dataType, f.nullable))
    val stat = GraftStat.describe(in, footer, specs)
    in.close()
    val codecName = Map[Byte, String](0.toByte -> "none", 1.toByte -> "lz4", 2.toByte -> "zstd",
      3.toByte -> "snappy", 10.toByte -> "rle", 11.toByte -> "dict", 12.toByte -> "onevalue",
      13.toByte -> "freq", 14.toByte -> "bitpack", 15.toByte -> "deltabp", 16.toByte -> "patas")
    schema.fields.zip(stat).foreach { case (f, leaf) =>
      val byCodec = leaf.pages.groupBy(_.codec).map { case (c, ps) =>
        s"${codecName(c)}x${ps.length}"
      }.mkString(" ")
      val comp = leaf.pages.map(_.compressedLen.toLong).sum
      val raw = leaf.pages.map(_.rawLen.toLong).sum
      println(f"${f.name}%-17s $byCodec%-22s ${raw.toDouble / math.max(comp, 1)}%5.1fx  ($comp B)")
    }

    println("--- forcecodec=dict via write option ---")
    li.select("l_returnflag").coalesce(1).write.format("graft")
      .option("forcecodec", "dict").mode("overwrite").save("/tmp/codec-demo/flag")
    val f2 = new java.io.File("/tmp/codec-demo/flag").listFiles()
      .filter(_.getName.endsWith(".graft")).head.toPath
    val st2 = GraftStat.describeFile(f2, Array((Lane.Bin, true)))
    println("l_returnflag forced-dict pages: " +
      st2(0).pages.map(p => codecName(p.codec)).distinct.mkString(","))
    val cnt = spark.read.format("graft").load("/tmp/codec-demo/flag")
      .groupBy("l_returnflag").count().collect().map(_.toString).sorted.mkString(" ")
    val expected = li.groupBy("l_returnflag").count().collect().map(_.toString).sorted.mkString(" ")
    println(s"group counts match parquet: ${cnt == expected}")
    spark.stop()
  }
}
