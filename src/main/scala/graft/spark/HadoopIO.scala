package graft.spark

import graft.format.SeekableInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FileSystem, Path}

/** Hadoop Configuration is not Serializable; ship it to executors with
  * Hadoop's own Writable serialization.
  */
final class SerializableHadoopConf(@transient var value: Configuration) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

/** Positional reads over any Hadoop FileSystem (local, HDFS, object stores).
  * One ranged read per leaf column + one tail read per footer — the access
  * pattern the reference's async reader was designed for
  * (`/root/reference/src/read/reader.rs:180-225`).
  */
final class HadoopSeekableInput(fs: FileSystem, path: Path, val length: Long)
    extends SeekableInput {
  private val in: FSDataInputStream = fs.open(path)
  def readFully(pos: Long, dst: Array[Byte], off: Int, len: Int): Unit = {
    GraftMetrics.bytesRead.addAndGet(len)
    in.readFully(pos, dst, off, len)
  }
  def close(): Unit = in.close()
}
