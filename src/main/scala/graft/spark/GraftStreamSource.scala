package graft.spark

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType

/** File-based micro-batch streaming over a graft directory: each batch is
  * the set of `.graft` files that appeared since the last offset (files are
  * immutable once renamed into place — the writer's tmp+rename commit makes
  * this safe). This is the FileStreamSource pattern re-expressed for DSv2,
  * giving `spark.readStream.format("graft")` natively (SURVEY.md §2.9).
  */
final case class GraftStreamOffset(files: Seq[String]) extends Offset {
  override def json(): String =
    files.sorted.map(f => "\"" + f.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString("[", ",", "]")
}

object GraftStreamOffset {
  def fromJson(s: String): GraftStreamOffset = {
    // minimal parser for the ["a","b"] arrays we emit
    val t = s.trim
    if (t == "[]" || t.isEmpty) return GraftStreamOffset(Seq.empty)
    val inner = t.stripPrefix("[").stripSuffix("]")
    val files = scala.collection.mutable.ArrayBuffer[String]()
    val sb = new StringBuilder
    var inStr = false
    var esc = false
    inner.foreach { c =>
      if (esc) { sb.append(c); esc = false }
      else if (c == '\\') esc = true
      else if (c == '"') { if (inStr) { files += sb.toString; sb.clear() }; inStr = !inStr }
      else if (inStr) sb.append(c)
    }
    GraftStreamOffset(files.toSeq)
  }
}

final class GraftMicroBatchStream(path: String, conf: SerializableHadoopConf,
    projectedJson: String) extends MicroBatchStream {

  private def currentFiles(): Map[String, Long] =
    GraftUtil.listDataFiles(path, conf.value)
      .map(f => f.getPath.toString -> f.getLen).toMap

  override def initialOffset(): Offset = GraftStreamOffset(Seq.empty)

  override def latestOffset(): Offset = GraftStreamOffset(currentFiles().keys.toSeq.sorted)

  override def deserializeOffset(json: String): Offset = GraftStreamOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[GraftStreamOffset].files.toSet
    val target = end.asInstanceOf[GraftStreamOffset].files
    val lens = currentFiles()
    target.filterNot(seen).flatMap(f => lens.get(f).map(len =>
      GraftInputPartition(f, len): InputPartition)).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(conf, projectedJson)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
