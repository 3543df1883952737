package graft.spark

import graft.format._
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType

import scala.collection.mutable.ArrayBuffer

/** DSv2 write path: per-task DataWriter buffers rows columnar, encodes one
  * chunk per file, rolls files at maxRowsPerFile (the reference's
  * one-row-group-per-file constraint, `/root/reference/src/write/writer.rs:108-112`,
  * handled by rolling — SURVEY.md §7.4).
  */
final class GraftWriteBuilder(info: LogicalWriteInfo, path: String)
    extends WriteBuilder with SupportsTruncate {

  private var doTruncate = false

  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = {
    val opts = GraftWriteOptions.fromOptions(info.options)
    new GraftWriteImpl(info.schema(), path, opts, doTruncate,
      new SerializableHadoopConf(SparkSession.active.sessionState.newHadoopConf()))
  }
}

final case class GraftWriteOptions(
    writeOptions: WriteOptions,
    maxRowsPerFile: Int)

object GraftWriteOptions {
  def fromOptions(o: org.apache.spark.sql.util.CaseInsensitiveStringMap): GraftWriteOptions = {
    val compName = Option(o.get("compression")).map(_.toLowerCase)
    val hc = compName.contains("lz4hc")
    val codec = compName.map(n => if (n == "lz4hc") Codec.Lz4 else Codec.byName(n))
      .getOrElse(Codec.Lz4)
    val forced = Option(o.get("forcecodec")).map(Codec.byName)
    GraftWriteOptions(
      WriteOptions(
        defaultCodec = if (Codec.isCommon(codec)) codec else Codec.Lz4,
        compressRatio = Option(o.get("compressratio")).map(_.toDouble).getOrElse(1.2),
        pageSize = Option(o.get("pagesize")).map(_.toInt).getOrElse(8192),
        forcedCodec = if (forced.isDefined) forced else if (!Codec.isCommon(codec)) Some(codec) else None,
        adaptive = Option(o.get("adaptive")).map(_.toBoolean).getOrElse(true),
        zstdLevel = Option(o.get("zstdlevel")).map(_.toInt).getOrElse(3),
        sampledChooser = Option(o.get("chooser")).forall(_ != "analytic"),
        lz4hc = hc),
      maxRowsPerFile = Option(o.get("maxrowsperfile")).map(_.toInt).getOrElse(1 << 20))
  }
}

final class GraftWriteImpl(schema: StructType, path: String, opts: GraftWriteOptions,
    doTruncate: Boolean, conf: SerializableHadoopConf) extends Write {
  override def toBatch: BatchWrite = new GraftBatchWrite(schema, path, opts, doTruncate, conf)
}

final class GraftBatchWrite(schema: StructType, path: String, opts: GraftWriteOptions,
    doTruncate: Boolean, conf: SerializableHadoopConf) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    fs.mkdirs(dir)
    // sweep staging leftovers of previously crashed jobs (their task aborts
    // never ran); fresh stages use new uuids so this cannot race this job
    val it = fs.listStatus(dir)
    it.foreach { f =>
      if (f.isFile && f.getPath.getName.endsWith(GraftUtil.Extension + ".tmp"))
        fs.delete(f.getPath, false)
    }
    new GraftWriterFactory(schema.json, path, opts, conf)
  }

  /** All-or-nothing swap: tasks only stage `.tmp` files (invisible to
    * readers, which list by extension); after every task has succeeded the
    * staged files are renamed in and THEN the old contents deleted, so a
    * crash mid-commit leaves old+new visible (duplicates, recoverable)
    * rather than an empty table. A failed or aborted overwrite leaves the
    * previous table intact.
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val tableDir = new Path(path)
    val fs = tableDir.getFileSystem(conf.value)
    val oldFiles =
      if (doTruncate) GraftUtil.listDataFiles(path, conf.value).map(_.getPath) else Seq.empty
    messages.foreach {
      case GraftCommitMessage(files, _) =>
        files.foreach { case (tmp, dst, _) =>
          if (!fs.rename(new Path(tmp), new Path(dst)))
            throw new java.io.IOException(s"graft: failed to rename $tmp to $dst")
        }
      case _ =>
    }
    // streaming manifest AFTER the data renames (every listed file is
    // visible) and BEFORE old-file deletion — a crash between the two leaves
    // old+new data plus an accurate manifest of the new files. A truncating
    // overwrite also resets the manifest history: stale manifests would
    // reference the files deleted below.
    val added = messages.toSeq.flatMap {
      case GraftCommitMessage(files, _) =>
        files.map { case (_, dst, len) => (new Path(dst).getName, len) }
      case _ => Seq.empty
    }
    val oldManifests =
      if (doTruncate) GraftManifest.list(fs, tableDir) else Seq.empty
    GraftManifest.publish(fs, tableDir, added)
    oldManifests.foreach(n => fs.delete(new Path(GraftManifest.dir(tableDir), n), false))
    oldFiles.foreach(fs.delete(_, false))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(conf.value)
    messages.foreach {
      case GraftCommitMessage(files, _) =>
        files.foreach { case (tmp, _, _) => fs.delete(new Path(tmp), false) }
      case _ =>
    }
  }
}

/** (staged tmp path, final path, byte length) per rolled file. */
final case class GraftCommitMessage(files: Seq[(String, String, Long)], rows: Long)
    extends WriterCommitMessage

final class GraftWriterFactory(schemaJson: String, path: String, opts: GraftWriteOptions,
    conf: SerializableHadoopConf) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(schemaJson, path, opts, conf, partitionId, taskId)
}

final class GraftDataWriter(schemaJson: String, path: String, opts: GraftWriteOptions,
    conf: SerializableHadoopConf, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  import org.apache.spark.sql.types.DataType

  private val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
  private val dir = new Path(path)
  private val fs: FileSystem = dir.getFileSystem(conf.value)
  private val uuid = java.util.UUID.randomUUID().toString.take(8)

  private val appenders: Array[FieldAppender] =
    schema.fields.map(f => FieldAppender(f.dataType, f.nullable))

  private var rowsInFile = 0
  private var totalRows = 0L
  private var fileSeq = 0
  private val committed = ArrayBuffer[(Path, Path, Long)]() // (tmp, final, bytes)

  override def write(row: InternalRow): Unit = {
    var i = 0
    while (i < appenders.length) { appenders(i).appendFrom(row, i); i += 1 }
    rowsInFile += 1
    if (rowsInFile >= opts.maxRowsPerFile) rollFile()
  }

  private def rollFile(): Unit = {
    if (rowsInFile == 0) return
    val name = f"part-$partitionId%05d-$uuid-$fileSeq%04d${GraftUtil.Extension}"
    val tmp = new Path(dir, s".$name.tmp")
    val counting = new CountingOutputStream(fs.create(tmp, true))
    val out = new java.io.BufferedOutputStream(counting, 1 << 16)
    try {
      val w = new GraftFileWriter(out, schemaJson, opts.writeOptions)
      w.start()
      w.writeChunk(appenders.map(_.tree()).toSeq, rowsInFile)
      w.finish()
    } finally out.close()
    committed += ((tmp, new Path(dir, name), counting.count))
    appenders.foreach(_.clear())
    totalRows += rowsInFile
    rowsInFile = 0
    fileSeq += 1
  }

  override def commit(): WriterCommitMessage = {
    rollFile()
    // renames happen at job commit (GraftBatchWrite.commit) so a failed job
    // never exposes partial output or loses the pre-overwrite table
    GraftCommitMessage(committed.map(p => (p._1.toString, p._2.toString, p._3)).toSeq, totalRows)
  }

  override def abort(): Unit =
    committed.foreach { case (tmp, _, _) => fs.delete(tmp, false) }

  override def close(): Unit = ()
}

/** Byte counter under the buffered writer: the staged file's final length,
  * recorded in the commit message so the manifest carries lengths without
  * per-file driver RPCs at job commit.
  */
private final class CountingOutputStream(u: java.io.OutputStream) extends java.io.OutputStream {
  var count = 0L
  override def write(b: Int): Unit = { u.write(b); count += 1 }
  override def write(b: Array[Byte], off: Int, len: Int): Unit = { u.write(b, off, len); count += len }
  override def flush(): Unit = u.flush()
  override def close(): Unit = u.close()
}
