package graft.spark

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.WriterCommitMessage
import org.apache.spark.sql.types.{LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.scalatest.funsuite.AnyFunSuite

/** The streaming sink's crash/retry windows, driven at the DataWriter /
  * StreamingWrite level so partial commits can be simulated exactly:
  *  - concurrent attempts of one task (speculation, zombie vs retry) must
  *    stage to DIFFERENT tmp paths even though final names are deterministic;
  *  - an epoch replay after a partial commit (some dst renamed, no manifest)
  *    must make the REPLAY authoritative — stale earlier-attempt files
  *    removed, differing dst replaced, manifest lengths = real file lengths;
  *  - a replay after a FULL commit (manifest published) must be a no-op that
  *    discards its restaged tmps.
  */
class StreamingSinkReplaySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val schema = new StructType().add("k", LongType, nullable = false)

  private def sink(dir: String): (GraftStreamingWrite, SerializableHadoopConf) = {
    val hconf = new SerializableHadoopConf(spark.sessionState.newHadoopConf())
    val opts = GraftWriteOptions.fromOptions(CaseInsensitiveStringMap.empty())
    (new GraftStreamingWrite(schema, dir, opts, hconf, "testq"), hconf)
  }

  private def stage(sw: GraftStreamingWrite, taskId: Long, epoch: Long,
      rows: Range): WriterCommitMessage = {
    val w = sw.createStreamingWriterFactory(null).createWriter(0, taskId, epoch)
    rows.foreach(i => w.write(InternalRow(i.toLong)))
    w.commit()
  }

  test("concurrent attempts of one task stage to distinct tmp paths") {
    val dir = "/tmp/graft-test/stream-sink-attempts"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val (sw, hconf) = sink(dir)
    val m1 = stage(sw, taskId = 1, epoch = 3, rows = 0 until 10)
    val m2 = stage(sw, taskId = 2, epoch = 3, rows = 0 until 10)
    val fs = new Path(dir).getFileSystem(hconf.value)
    def tmps(m: WriterCommitMessage): Seq[String] =
      m.asInstanceOf[GraftCommitMessage].files.map(_._1)
    assert(tmps(m1).toSet.intersect(tmps(m2).toSet).isEmpty,
      "attempts must not share staged tmp paths")
    assert(tmps(m1).forall(t => fs.exists(new Path(t))) &&
      tmps(m2).forall(t => fs.exists(new Path(t))),
      "neither attempt's staged file may be truncated/deleted by the other")
    // the losing attempt's abort must not touch the survivor's tmp
    tmps(m1).foreach(t => fs.delete(new Path(t), false))
    assert(tmps(m2).forall(t => fs.exists(new Path(t))))
    // final names collide by design; the commit rename picks the winner
    assert(m1.asInstanceOf[GraftCommitMessage].files.map(_._2) ==
      m2.asInstanceOf[GraftCommitMessage].files.map(_._2))
  }

  test("the streaming sink honors a partitioned layout end to end") {
    val src = "/tmp/graft-test/stream-sink-part-src"
    val dst = "/tmp/graft-test/stream-sink-part-dst"
    val ckpt = "/tmp/graft-test/stream-sink-part-ckpt"
    Seq(src, dst, ckpt).foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
    import org.apache.spark.sql.functions._
    spark.range(0, 40).selectExpr("id AS k", "CAST(id % 3 AS STRING) AS p")
      .write.format("graft").mode("append").save(src)
    val inSchema = spark.read.format("graft").load(src).schema
    val q = spark.readStream.format("graft").schema(inSchema).load(src)
      .writeStream.format("graft").option("partitionby", "p")
      .option("checkpointLocation", ckpt)
      .start(dst)
    try {
      q.processAllAvailable()
      val files = GraftUtil.listDataFiles(dst, spark.sessionState.newHadoopConf())
        .map(_.getPath.toString)
      assert(files.nonEmpty && files.forall(_.matches(".*/p=[0-2]/[^/]+")),
        s"streamed files must land in hive dirs: ${files.take(2)}")
      // content exact, and partition pruning works over the streamed table
      assert(spark.read.format("graft").load(dst)
        .select("k").collect().map(_.getLong(0)).sorted.toSeq == (0L until 40L))
      assert(spark.read.format("graft").load(dst)
        .filter(col("p") === "1").count() == 13)
    } finally q.stop()
  }

  test("epoch replay after a partial commit is authoritative and manifest-accurate") {
    val dir = "/tmp/graft-test/stream-sink-replay"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val (sw, hconf) = sink(dir)
    val fs = new Path(dir).getFileSystem(hconf.value)

    // attempt 1 of epoch 5: rename its dst in (simulating the crash AFTER
    // some renames but BEFORE the manifest publish)
    val m1 = stage(sw, taskId = 10, epoch = 5, rows = 0 until 100)
    val f1 = m1.asInstanceOf[GraftCommitMessage].files
    f1.foreach { case (tmp, dst, _) => assert(fs.rename(new Path(tmp), new Path(dst))) }
    // plus a stale extra file of the same epoch the replay will NOT restage
    // (earlier attempt rolled more files than the replay will)
    val stale = new Path(dir, "part-00000-qtestq-e000005-0099.graft")
    val out = fs.create(stale, true); out.write(Array[Byte](1, 2, 3)); out.close()

    // the replay writes DIFFERENT content (fewer rows -> different length)
    val m2 = stage(sw, taskId = 11, epoch = 5, rows = 0 until 40)
    val f2 = m2.asInstanceOf[GraftCommitMessage].files
    assert(f2.map(_._2) == f1.map(_._2), "deterministic names: same dst set")
    assert(f2.map(_._3) != f1.map(_._3), "different content must differ in length")
    sw.commit(5, Array(m2))

    assert(!fs.exists(stale), "stale earlier-attempt epoch file must be removed")
    val visible = GraftUtil.listDataFiles(dir, hconf.value)
    assert(visible.map(f => fs.makeQualified(f.getPath).toString).sorted ==
      f2.map(f => fs.makeQualified(new Path(f._2)).toString).sorted,
      "visible files must be exactly the replay's output")
    // manifest lengths match the files actually on disk
    val manifests = GraftManifest.list(fs, new Path(dir))
    assert(manifests.exists(_.endsWith("-qtestqe5")))
    val entries = GraftManifest.read(fs, new Path(dir), manifests.last)
    entries.foreach { case (name, len) =>
      assert(fs.getFileStatus(new Path(dir, name)).getLen == len,
        s"manifest length for $name must match the real file")
    }
    assert(spark.read.format("graft").load(dir).count() == 40,
      "table content is the replay attempt's rows")
  }

  test("epoch replay after a full commit discards its restaged tmps") {
    val dir = "/tmp/graft-test/stream-sink-replay-full"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val (sw, hconf) = sink(dir)
    val fs = new Path(dir).getFileSystem(hconf.value)
    val m1 = stage(sw, taskId = 20, epoch = 7, rows = 0 until 25)
    sw.commit(7, Array(m1))
    val after1 = GraftUtil.listDataFiles(dir, hconf.value)
      .map(f => f.getPath.getName -> f.getLen).sorted

    val m2 = stage(sw, taskId = 21, epoch = 7, rows = 0 until 99)
    sw.commit(7, Array(m2))
    val after2 = GraftUtil.listDataFiles(dir, hconf.value)
      .map(f => f.getPath.getName -> f.getLen).sorted
    assert(after2 == after1, "a fully-committed epoch must not change on replay")
    assert(GraftManifest.list(fs, new Path(dir)).size == 1)
    m2.asInstanceOf[GraftCommitMessage].files.foreach { case (tmp, _, _) =>
      assert(!fs.exists(new Path(tmp)), "replay tmps must be cleaned up")
    }
    assert(spark.read.format("graft").load(dir).count() == 25)
  }
}
