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

/** One broadcast of the Hadoop conf per (SparkContext, conf contents),
  * driver-side cached. A Configuration embedded in every task binary costs
  * ~40-100ms of Executor Deserialize Time PER TASK (it Writable-serializes
  * ~1000 properties); measured as the dominant wall-clock residual on
  * broadcast-heavy join queries (q5: six 1-task build stages each paying
  * it serially). Broadcasting pays the deserialize once per executor —
  * the same shape Spark's own parquet reader uses (SerializableConfiguration
  * via broadcast).
  */
object HadoopConfBroadcast {
  import org.apache.spark.broadcast.Broadcast
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Broadcast[SerializableHadoopConf]]()

  private def fingerprint(conf: Configuration): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val it = conf.iterator()
    // order-independent 128-bit fold (sum + xor lanes over the full
    // digest): Configuration iteration order is not stable, and a 32-bit
    // per-entry hash would make cross-conf collisions plausible enough to
    // silently serve another conf's broadcast. Entries are length-prefixed
    // so (key, value) boundaries are unambiguous.
    var accSum = 0L
    var accXor = 0L
    var count = 0
    while (it.hasNext) {
      val e = it.next()
      val k = e.getKey.getBytes("UTF-8")
      val v = e.getValue.getBytes("UTF-8")
      md.update(java.nio.ByteBuffer.allocate(8).putInt(k.length).putInt(v.length).array())
      md.update(k)
      md.update(v)
      val d = md.digest()
      val bb = java.nio.ByteBuffer.wrap(d)
      val h1 = bb.getLong
      val h2 = bb.getLong
      accSum += h1
      accXor ^= java.lang.Long.rotateLeft(h2, count % 63)
      count += 1
      md.reset()
    }
    java.lang.Long.toHexString(accSum) + "-" + java.lang.Long.toHexString(accXor) + "-" + count
  }

  /** Driver-side only. */
  def apply(conf: Configuration): Broadcast[SerializableHadoopConf] = {
    val sc = org.apache.spark.SparkContext.getOrCreate()
    val key = sc.applicationId + "#" + fingerprint(conf)
    var bc = cache.get(key)
    if (bc == null) {
      bc = sc.broadcast(new SerializableHadoopConf(conf))
      val prev = cache.putIfAbsent(key, bc)
      if (prev != null) bc = prev
    }
    bc
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

/** Shared executor-side pool for async leaf prefetch (the reference's
  * async read path, `/root/reference/src/read/reader.rs:180-225`,
  * re-expressed for Spark's task model): a scan submits each projected
  * leaf's ranged read here so a split's leaf fetches overlap instead of
  * serializing on first decode access. The pool is deliberately SMALL and
  * JVM-global — IO parallelism beyond a few concurrent ranged reads per
  * executor saturates the link, and local[32] must not spawn 32x8
  * threads. A busy pool costs nothing: the decode thread's lazy-val
  * access fetches inline and the queued task becomes a no-op.
  */
object GraftPrefetch {
  private lazy val pool = {
    val n = math.max(2, math.min(8, Runtime.getRuntime.availableProcessors() / 4))
    java.util.concurrent.Executors.newFixedThreadPool(n, (r: Runnable) => {
      val t = new Thread(r, "graft-prefetch")
      t.setDaemon(true)
      t
    })
  }
  def submit(task: Runnable): java.util.concurrent.Future[_] = pool.submit(task)
}
