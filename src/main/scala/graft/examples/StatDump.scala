package graft.examples

import graft.format._
import graft.spark.GraftSchema
import org.apache.spark.sql.types.{DataType, StructType}

/** Diagnostic: per-leaf page codec histogram of one .graft file. */
object StatDump {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File(args(0))
    val file = dir.listFiles().filter(_.getName.endsWith(".graft")).head.toPath
    val in = new LocalFileInput(file)
    val footer = GraftFileReader.readFooter(in)
    val schema = DataType.fromJson(footer.schemaJson).asInstanceOf[StructType]
    val specs = schema.fields.flatMap(f => GraftSchema.leafSpecs(f.dataType, f.nullable))
    val stat = GraftStat.describe(in, footer, specs)
    in.close()
    stat.zipWithIndex.foreach { case (l, i) =>
      val hist = l.pages.groupBy(p => (p.codec, p.body.codec))
        .map { case (k, v) => s"$k x${v.size}" }.mkString(", ")
      val raw = l.pages.map(_.rawLen.toLong).sum
      val comp = l.pages.map(_.compressedLen.toLong).sum
      println(s"leaf$i lane=${l.lane}: vals=${l.pages.map(_.numValues.toLong).sum} raw=$raw comp=$comp [$hist]")
    }
  }
}
