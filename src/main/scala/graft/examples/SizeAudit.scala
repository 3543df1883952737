package graft.examples

import graft.format._
import graft.spark.GraftSchema
import org.apache.spark.sql.types.{DataType, StructType}

/** Per-leaf on-disk size breakdown of a graft directory vs logical bytes —
  * where does the file size go? Usage:
  *   sbt "runMain graft.examples.SizeAudit /tmp/graft_str_v8/<staged>/documents"
  */
object SizeAudit {
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get(args.headOption.getOrElse(sys.error("SizeAudit needs an explicit graft dir argument (see Tables staging under /tmp/graft_str_v8)")))
    val files = java.nio.file.Files.list(dir).toArray.map(_.asInstanceOf[java.nio.file.Path])
      .filter(_.toString.endsWith(".graft")).sorted
    files.take(1).foreach { f =>
      val in = new LocalFileInput(f)
      try {
        val footer = GraftFileReader.readFooter(in)
        val schema = DataType.fromJson(footer.schemaJson).asInstanceOf[StructType]
        val specs = schema.fields.flatMap(x => GraftSchema.leafSpecs(x.dataType, x.nullable)).toArray
        val names = schema.fields.flatMap(x =>
          Seq.fill(GraftSchema.leafCount(x.dataType, x.nullable))(x.name))
        val stat = GraftStat.describe(in, footer, specs)
        println(f"${f.getFileName} total=${in.length}%,d bytes")
        stat.zipWithIndex.foreach { case (li, i) =>
          val disk = footer.leaves(i).totalBytes
          val raw = li.pages.map(_.rawLen.toLong).sum
          val codecs = li.pages.map(p => p.codec).distinct.mkString(",")
          println(f"  leaf $i%2d ${names(i)}%-12s lane=${li.lane} disk=$disk%,10d raw=$raw%,10d codecs=[$codecs]")
        }
      } finally in.close()
    }
  }
}
