package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("readStream.format(graft) processes existing and newly arriving files") {
    val dir = "/tmp/graft-test/stream-src"
    spark.range(100).selectExpr("id as k", "id * 2 as v")
      .write.format("graft").mode("overwrite").save(dir)

    val schema = spark.read.format("graft").load(dir).schema
    val stream = spark.readStream.format("graft").schema(schema).load(dir)
      .groupBy().agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("graft_stream_test").start()
    try {
      q.processAllAvailable()
      val r1 = spark.table("graft_stream_test").head()
      assert(r1.getLong(0) == 100L)
      assert(r1.getLong(1) == (0L until 100L).map(_ * 2).sum)

      // new file arrives -> next micro-batch picks up only the delta
      spark.range(100, 150).selectExpr("id as k", "id * 2 as v")
        .write.format("graft").mode("append").save(dir)
      q.processAllAvailable()
      val r2 = spark.table("graft_stream_test").head()
      assert(r2.getLong(0) == 150L)
      assert(r2.getLong(1) == (0L until 150L).map(_ * 2).sum)
    } finally q.stop()
  }

  test("manifest mode: a data file renamed in 10 minutes late lands in exactly one batch") {
    val dir = "/tmp/graft-test/stream-manifest-late"
    spark.range(10).selectExpr("id as k").write.format("graft").mode("overwrite").save(dir)
    val hconf = spark.sessionState.newHadoopConf()
    val schemaJson = spark.read.format("graft").load(dir).schema.json
    val ms = new GraftMicroBatchStream(dir, new SerializableHadoopConf(hconf), schemaJson)
    val msPlain = new GraftMicroBatchStream(dir, new SerializableHadoopConf(hconf), schemaJson,
      manifestOpt = Some(false))
    val o1 = ms.latestOffset().asInstanceOf[GraftStreamOffset]
    assert(o1.manifest, "writer-produced directories carry a commit manifest")
    val b1 = ms.planInputPartitions(GraftStreamOffset.Empty, o1)
    val o1p = msPlain.latestOffset().asInstanceOf[GraftStreamOffset]

    // a straggler commit whose data-file rename "landed" 10 minutes late:
    // backdate the new data files' modTimes far beyond the lateness window
    val before = GraftUtil.listDataFiles(dir, hconf).map(_.getPath.toString).toSet
    spark.range(10, 15).selectExpr("id as k").write.format("graft").mode("append").save(dir)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(hconf)
    val late = GraftUtil.listDataFiles(dir, hconf).filterNot(f => before(f.getPath.toString))
    assert(late.nonEmpty)
    late.foreach(f => fs.setTimes(f.getPath, System.currentTimeMillis() - 10 * 60 * 1000L, -1))

    val o2 = ms.latestOffset().asInstanceOf[GraftStreamOffset]
    val b2 = ms.planInputPartitions(o1, o2)
    val b2names = b2.map(_.asInstanceOf[GraftInputPartition].filePath).toSet
    late.foreach(f => assert(b2names.contains(f.getPath.toString),
      s"late file ${f.getPath} must land in the next manifest batch"))
    // exactly once: never delivered in batch 1, and not re-delivered later
    val b1names = b1.map(_.asInstanceOf[GraftInputPartition].filePath).toSet
    assert(b1names.intersect(b2names).isEmpty)
    val o3 = ms.latestOffset().asInstanceOf[GraftStreamOffset]
    assert(ms.planInputPartitions(o2, o3).isEmpty)

    // contrast: the plain modTime source silently drops the backdated file —
    // the gap the manifest closes
    val o2p = msPlain.latestOffset().asInstanceOf[GraftStreamOffset]
    val p2 = msPlain.planInputPartitions(o1p, o2p)
      .map(_.asInstanceOf[GraftInputPartition].filePath).toSet
    late.foreach(f => assert(!p2.contains(f.getPath.toString),
      "modTime mode drops a file older than the lateness window"))
  }

  test("restored checkpoint pins the offset mode; manifest mode backfills unmanifested history") {
    val dir = "/tmp/graft-test/stream-mode-pin"
    spark.range(20).selectExpr("id as k").write.format("graft").mode("overwrite").save(dir)
    val hconf = spark.sessionState.newHadoopConf()
    val schemaJson = spark.read.format("graft").load(dir).schema.json

    // a restart from a pre-manifest (modTime) checkpoint must NOT flip to
    // manifest offsets even though the directory now carries manifests —
    // that would redeliver files the old offset already covered
    val ms = new GraftMicroBatchStream(dir, new SerializableHadoopConf(hconf), schemaJson)
    val restored = ms.deserializeOffset(
      s"""{"t":${System.currentTimeMillis()},"names":[]}""").asInstanceOf[GraftStreamOffset]
    assert(!restored.manifest)
    assert(!ms.latestOffset().asInstanceOf[GraftStreamOffset].manifest,
      "latestOffset must stay in the restored checkpoint's mode")

    // a fresh manifest-mode stream over a directory with unmanifested
    // history (simulating files from a pre-manifest writer) delivers that
    // history in its first batch exactly once
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(hconf)
    val manifestDir = GraftManifest.dir(new org.apache.hadoop.fs.Path(dir))
    val firstManifest = GraftManifest.list(fs, new org.apache.hadoop.fs.Path(dir)).head
    val legacyFile = GraftUtil.listDataFiles(dir, hconf).head
    // drop one file from every manifest record by rewriting the manifest
    val entries = GraftManifest.read(fs, new org.apache.hadoop.fs.Path(dir), firstManifest)
      .filterNot(_._1 == legacyFile.getPath.getName)
    fs.delete(new org.apache.hadoop.fs.Path(manifestDir, firstManifest), false)
    GraftManifest.publish(fs, new org.apache.hadoop.fs.Path(dir), entries)

    val ms2 = new GraftMicroBatchStream(dir, new SerializableHadoopConf(hconf), schemaJson)
    val o1 = ms2.latestOffset().asInstanceOf[GraftStreamOffset]
    assert(o1.manifest)
    val b1 = ms2.planInputPartitions(GraftStreamOffset.Empty, o1)
      .map(_.asInstanceOf[GraftInputPartition].filePath).toSet
    assert(b1.contains(legacyFile.getPath.toString),
      "unmanifested history must backfill into the first batch")
    assert(b1.size == GraftUtil.listDataFiles(dir, hconf).size)
    // and never again
    val o2 = ms2.latestOffset().asInstanceOf[GraftStreamOffset]
    assert(ms2.planInputPartitions(o1, o2).isEmpty)
  }

  test("native streaming sink: graft-to-graft copy is exactly-once across restarts") {
    import org.apache.spark.sql.functions.col
    val srcDir = "/tmp/graft-test/stream-sink-src"
    val dstDir = "/tmp/graft-test/stream-sink-dst"
    val ckpt = "/tmp/graft-test/stream-sink-ckpt"
    Seq(srcDir, dstDir, ckpt).foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
    spark.range(100).selectExpr("id as k", "id * 3 as v")
      .write.format("graft").mode("overwrite").save(srcDir)

    val schema = spark.read.format("graft").load(srcDir).schema
    def startQuery() = spark.readStream.format("graft").schema(schema).load(srcDir)
      .writeStream.format("graft").option("checkpointLocation", ckpt).start(dstDir)

    val q1 = startQuery()
    try {
      q1.processAllAvailable()
      assert(spark.read.format("graft").load(dstDir).count() == 100)
    } finally q1.stop()

    // restart from the checkpoint; a new wave arrives
    spark.range(100, 150).selectExpr("id as k", "id * 3 as v")
      .write.format("graft").mode("append").save(srcDir)
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      val out = spark.read.format("graft").load(dstDir)
      assert(out.count() == 150, "restart must deliver only the new wave, exactly once")
      assert(out.agg(org.apache.spark.sql.functions.sum(col("v"))).head.getLong(0) ==
        (0L until 150L).map(_ * 3).sum)
    } finally q2.stop()

    // sink manifests carry the epoch tag, so the dst table is itself a
    // manifest-mode streamable source
    val hconf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(dstDir).getFileSystem(hconf)
    val manifests = GraftManifest.list(fs, new org.apache.hadoop.fs.Path(dstDir))
    assert(manifests.nonEmpty && manifests.forall(_.contains("-q")),
      s"sink manifests must carry the epoch tag: $manifests")

    // complete mode is rejected loudly
    val err = intercept[Exception] {
      spark.readStream.format("graft").schema(schema).load(srcDir)
        .groupBy().count()
        .writeStream.format("graft").outputMode("complete")
        .option("checkpointLocation", ckpt + "2").start(dstDir + "2")
        .processAllAvailable()
    }
    assert(err.getMessage != null)
  }

  test("explicit manifest=true upgrades a modTime checkpoint without redelivery") {
    val dir = "/tmp/graft-test/stream-upgrade"
    spark.range(20).selectExpr("id as k").write.format("graft").mode("overwrite").save(dir)
    val hconf = spark.sessionState.newHadoopConf()
    val schemaJson = spark.read.format("graft").load(dir).schema.json

    // wave 1 processed under modTime offsets (a pre-manifest-era checkpoint)
    val msPlain = new GraftMicroBatchStream(dir, new SerializableHadoopConf(hconf), schemaJson,
      manifestOpt = Some(false))
    val o1 = msPlain.latestOffset().asInstanceOf[GraftStreamOffset]
    assert(!o1.manifest)
    val b1 = msPlain.planInputPartitions(GraftStreamOffset.Empty, o1)
      .map(_.asInstanceOf[GraftInputPartition].filePath).toSet

    Thread.sleep(20)
    spark.range(20, 30).selectExpr("id as k").write.format("graft").mode("append").save(dir)

    // restart from o1 with manifest=true: the upgrade batch delivers exactly
    // the files the modTime checkpoint had not processed
    val msUp = new GraftMicroBatchStream(dir, new SerializableHadoopConf(hconf), schemaJson,
      manifestOpt = Some(true))
    val restored = msUp.deserializeOffset(o1.json()).asInstanceOf[GraftStreamOffset]
    val o2 = msUp.latestOffset().asInstanceOf[GraftStreamOffset]
    assert(o2.manifest, "explicit manifest=true must outrank the restored mode pin")
    val b2 = msUp.planInputPartitions(restored, o2)
      .map(_.asInstanceOf[GraftInputPartition].filePath).toSet
    val total = GraftUtil.listDataFiles(dir, hconf).map(_.getPath.toString).toSet
    assert(b1.intersect(b2).isEmpty, "upgrade batch must not redeliver processed files")
    assert(b1 ++ b2 == total, s"upgrade batch must close the gap: missing ${total -- b1 -- b2}")
    // subsequent batches run in pure manifest mode and stay empty until new data
    val o3 = msUp.latestOffset().asInstanceOf[GraftStreamOffset]
    assert(msUp.planInputPartitions(o2, o3).isEmpty)

    // the reverse direction is rejected loudly
    val msDown = new GraftMicroBatchStream(dir, new SerializableHadoopConf(hconf), schemaJson,
      manifestOpt = Some(false))
    val err = intercept[IllegalStateException] {
      msDown.planInputPartitions(o2, msDown.latestOffset())
    }
    assert(err.getMessage.contains("manifest"))
  }

  test("maxfilespertrigger bounds a backlog into multiple exactly-once batches") {
    val dir = "/tmp/graft-test/stream-maxfiles"
    // a deep backlog: 6 separate commits before the stream starts
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    (0 until 6).foreach { i =>
      spark.range(i * 10, i * 10 + 10).selectExpr("id as k")
        .coalesce(1).write.format("graft").mode("append").save(dir)
    }
    val schema = spark.read.format("graft").load(dir).schema
    val stream = spark.readStream.format("graft").schema(schema)
      .option("maxfilespertrigger", "2").load(dir)
      .groupBy().agg(count(lit(1)).as("n"), sum(col("k")).as("sk"))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("graft_stream_maxfiles").start()
    try {
      q.processAllAvailable()
      val r = spark.table("graft_stream_maxfiles").head()
      // all rows, exactly once, across the capped catch-up batches
      assert(r.getLong(0) == 60L)
      assert(r.getLong(1) == (0L until 60L).sum)
      // the cap really split the backlog: 6 commits / 2 per trigger >= 3
      // batches (manifest mode admits per manifest)
      val prog = q.recentProgress
      assert(prog.count(_.numInputRows > 0) >= 3,
        s"expected >=3 capped batches, got ${prog.map(_.numInputRows).mkString(",")}")
    } finally q.stop()
  }

  test("asof is rejected on streaming reads") {
    val dir = "/tmp/graft-test/stream-asof-reject"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.range(5).selectExpr("id AS k").write.format("graft").mode("append").save(dir)
    val schema = spark.read.format("graft").load(dir).schema
    val e = intercept[Exception] {
      val q = spark.readStream.format("graft").schema(schema)
        .option("asof", System.currentTimeMillis().toString).load(dir)
        .writeStream.format("noop").start()
      try q.processAllAvailable() finally q.stop()
    }
    def hasAsof(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("asof")) || hasAsof(t.getCause))
    assert(hasAsof(e), s"expected the asof rejection, got: ${e.getMessage}")
  }

  test("startingposition=latest skips pre-existing history on a fresh checkpoint") {
    val dir = "/tmp/graft-test/stream-latest"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.range(50).selectExpr("id AS k").write.format("graft").mode("append").save(dir)
    val schema = spark.read.format("graft").load(dir).schema
    val q = spark.readStream.format("graft").schema(schema)
      .option("startingposition", "latest").load(dir)
      .groupBy().agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("graft_stream_latest").start()
    try {
      q.processAllAvailable()
      val n0 = spark.table("graft_stream_latest").collect()
        .headOption.map(_.getLong(0)).getOrElse(0L)
      assert(n0 == 0L, s"latest start must skip history, saw $n0 rows")
      spark.range(50, 70).selectExpr("id AS k")
        .write.format("graft").mode("append").save(dir)
      q.processAllAvailable()
      assert(spark.table("graft_stream_latest").head().getLong(0) == 20L)
    } finally q.stop()
  }

  test("stream offset stays compact as the directory grows") {
    val dir = "/tmp/graft-test/stream-offset"
    spark.range(10).selectExpr("id as k").write.format("graft").mode("overwrite").save(dir)
    val hconf = spark.sessionState.newHadoopConf()
    hconf.setLong("graft.stream.lateness.ms", 0L)
    val schemaJson = spark.read.format("graft").load(dir).schema.json
    val ms = new GraftMicroBatchStream(dir, new SerializableHadoopConf(hconf), schemaJson)

    val o1 = ms.latestOffset().asInstanceOf[GraftStreamOffset]
    val b1 = ms.planInputPartitions(GraftStreamOffset.Empty, o1)

    Thread.sleep(50)
    spark.range(10, 20).selectExpr("id as k").write.format("graft").mode("append").save(dir)
    val o2 = ms.latestOffset().asInstanceOf[GraftStreamOffset]
    val b2 = ms.planInputPartitions(o1, o2)

    val conf = spark.sessionState.newHadoopConf()
    val total = GraftUtil.listDataFiles(dir, conf).size
    val wave1 = b1.length
    // every file lands in exactly one batch
    assert(b1.length + b2.length == total,
      s"b1=${b1.length} b2=${b2.length} total=$total")
    val names1 = b1.map(_.asInstanceOf[GraftInputPartition].filePath).toSet
    val names2 = b2.map(_.asInstanceOf[GraftInputPartition].filePath).toSet
    assert(names1.intersect(names2).isEmpty)

    // the offset lists at most the newest wave, never the whole history
    assert(o2.names.size <= total - wave1,
      s"offset should not accumulate history: ${o2.names.size} names, total=$total")

    // offsets survive json round-trip
    assert(GraftStreamOffset.fromJson(o2.json()) == o2)
    assert(GraftStreamOffset.fromJson(GraftStreamOffset.Empty.json()) == GraftStreamOffset.Empty)

    // legacy (pre-watermark) checkpoints serialized a bare file array —
    // they must still parse, with name-membership-only coverage
    val legacy = GraftStreamOffset.fromJson("""["/a/b.graft","/a/c.graft"]""")
    assert(legacy.t == GraftStreamOffset.LegacyT)
    assert(legacy.names == Seq("/a/b.graft", "/a/c.graft"))
  }

  test("stray files in the manifest dir are ignored, not a crash loop") {
    val dir = "/tmp/graft-test/stream-stray-manifest"
    spark.range(10).selectExpr("id as k").write.format("graft").mode("overwrite").save(dir)
    val hconf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(hconf)
    val mdir = GraftManifest.dir(new org.apache.hadoop.fs.Path(dir))
    Seq("_SUCCESS", "README", "notes-editor").foreach { n =>
      val out = fs.create(new org.apache.hadoop.fs.Path(mdir, n), true)
      try out.write("junk".getBytes("UTF-8")) finally out.close()
    }
    val schemaJson = spark.read.format("graft").load(dir).schema.json
    val ms = new GraftMicroBatchStream(dir, new SerializableHadoopConf(hconf), schemaJson)
    val o1 = ms.latestOffset().asInstanceOf[GraftStreamOffset]
    assert(o1.manifest, "real manifests must still be detected around the junk")
    assert(o1.names.forall(n => n.takeWhile(_ != '-').forall(_.isDigit)))
    val b1 = ms.planInputPartitions(GraftStreamOffset.Empty, o1)
    assert(b1.nonEmpty)
  }

  test("offset json survives control-character names and persists the window") {
    val off = GraftStreamOffset(1234567L, Seq("a\nb.graft", "plain.graft"),
      manifest = true, latenessMs = 60000L)
    val j = off.json()
    assert(!j.contains('\n'), s"offset json must stay single-line: $j")
    val back = GraftStreamOffset.fromJson(j)
    assert(back == off, s"round-trip mismatch: $back vs $off")
    // pre-persistence checkpoints (no "l") keep working
    val legacy = GraftStreamOffset.fromJson("""{"t":99,"names":["x.graft"]}""")
    assert(legacy.t == 99L && legacy.latenessMs == -1L)
  }

  test("in-flight files newer than the first manifest stay out of the backfill") {
    val dir = "/tmp/graft-test/stream-inflight"
    spark.range(10).selectExpr("id as k").write.format("graft").mode("overwrite").save(dir)
    val hconf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(hconf)
    val schemaJson = spark.read.format("graft").load(dir).schema.json
    // simulate a concurrent writer mid-commit: its data file is renamed in
    // (modTime NOW, newer than every manifest) but its manifest has not
    // published yet
    val src = GraftUtil.listDataFiles(dir, hconf).head.getPath
    val inflight = new org.apache.hadoop.fs.Path(dir, "part-inflight-copy.graft")
    org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, inflight, false, hconf)
    val inflightLen = fs.getFileStatus(inflight).getLen

    val ms = new GraftMicroBatchStream(dir, new SerializableHadoopConf(hconf), schemaJson)
    val o1 = ms.latestOffset().asInstanceOf[GraftStreamOffset]
    val b1 = ms.planInputPartitions(GraftStreamOffset.Empty, o1)
      .map(_.asInstanceOf[GraftInputPartition].filePath).toSet
    assert(!b1.exists(_.contains("part-inflight-copy")),
      "a mid-commit file must NOT backfill — its manifest will deliver it")
    // the writer's commit lands: the file arrives through its manifest once
    GraftManifest.publish(fs, new org.apache.hadoop.fs.Path(dir),
      Seq((inflight.getName, inflightLen)))
    val o2 = ms.latestOffset().asInstanceOf[GraftStreamOffset]
    val b2 = ms.planInputPartitions(o1, o2)
      .map(_.asInstanceOf[GraftInputPartition].filePath)
    assert(b2.count(_.contains("part-inflight-copy")) == 1,
      s"the committed file must arrive exactly once, got: ${b2.toSeq}")
  }

  test("deleteWhere survivors and expired-manifest orphans reach a fresh manifest-mode stream") {
    val dir = "/tmp/graft-test/stream-delete-survivors"
    val hconf = spark.sessionState.newHadoopConf()
    // commit 1 (manifest M1): k = 0..9; commit 2 (manifest M2): k = 10..29
    spark.range(10).selectExpr("id as k").write.format("graft").mode("overwrite").save(dir)
    spark.range(10, 30).selectExpr("id as k").write.format("graft").mode("append").save(dir)
    val tablePath = new org.apache.hadoop.fs.Path(dir)
    val fs = tablePath.getFileSystem(hconf)
    assert(GraftManifest.list(fs, tablePath).size == 2)
    // deleteWhere rewrites a commit-2 file holding 10..12 into survivor
    // files with FRESH modTimes and expires M2; commit-2 files untouched by the predicate become unmanifested orphans with commit-2-era modTimes — both
    // classes sit ABOVE the backfill's first-manifest time bound and were
    // silently dropped before the catch-up manifest existed
    GraftMaintenance.deleteWhere(spark, dir,
      org.apache.spark.sql.functions.col("k").between(10, 12))
    assert(spark.read.format("graft").load(dir).count() == 27)
    // the catch-up manifest must make the fresh-stream view == the batch
    // view, file for file
    val schemaJson = spark.read.format("graft").load(dir).schema.json
    val ms = new GraftMicroBatchStream(dir, new SerializableHadoopConf(hconf), schemaJson)
    val o1 = ms.latestOffset().asInstanceOf[GraftStreamOffset]
    assert(o1.manifest, "the table keeps manifest mode after the delete")
    val planned = ms.planInputPartitions(GraftStreamOffset.Empty, o1)
      .map(_.asInstanceOf[GraftInputPartition].filePath).toSet
    val live = GraftUtil.listDataFiles(dir, hconf).map(_.getPath.toString).toSet
    assert(planned == live,
      s"fresh stream must deliver every live file; missing: ${live -- planned}")
    // and exactly once: nothing re-arrives on the next batch
    val o2 = ms.latestOffset().asInstanceOf[GraftStreamOffset]
    assert(ms.planInputPartitions(o1, o2).isEmpty)
    // end-to-end row check through a real streaming query
    val got = spark.readStream.format("graft").schema(
        spark.read.format("graft").load(dir).schema).load(dir)
      .groupBy().agg(count(lit(1)).as("n"))
    val q = got.writeStream.outputMode("complete")
      .format("memory").queryName("graft_stream_del_surv").start()
    try {
      q.processAllAvailable()
      assert(spark.table("graft_stream_del_surv").head().getLong(0) == 27L)
    } finally q.stop()
  }

  test("deleteWhere replacement manifest is NOT redelivered to a stream with history") {
    val dir = "/tmp/graft-test/stream-delete-nodup"
    val hconf = spark.sessionState.newHadoopConf()
    spark.range(10).selectExpr("id as k").write.format("graft").mode("overwrite").save(dir)
    spark.range(10, 30).selectExpr("id as k").write.format("graft").mode("append").save(dir)
    val schemaJson = spark.read.format("graft").load(dir).schema.json
    val ms = new GraftMicroBatchStream(dir, new SerializableHadoopConf(hconf), schemaJson)
    // the running stream processes the full table...
    val o1 = ms.latestOffset().asInstanceOf[GraftStreamOffset]
    assert(ms.planInputPartitions(GraftStreamOffset.Empty, o1).nonEmpty)
    // ...then a delete rewrites part of it: the REPLACEMENT manifest
    // (expired commit's surviving coverage, re-published at the original
    // commit time) exists for fresh streams and window readers, but this
    // stream already delivered every kept row through the original files —
    // the coverage tie (same commit time + base suffix as the original the
    // offset lists) must keep it out of the next batch even though the
    // delete landed INSIDE the offset's lateness window
    GraftMaintenance.deleteWhere(spark, dir,
      org.apache.spark.sql.functions.col("k").between(10, 12))
    val fsLocal = new org.apache.hadoop.fs.Path(dir).getFileSystem(hconf)
    assert(GraftManifest.list(fsLocal, new org.apache.hadoop.fs.Path(dir))
      .exists(GraftManifest.isReplacement),
      "the delete published a replacement manifest")
    val o2 = ms.latestOffset().asInstanceOf[GraftStreamOffset]
    val b2 = ms.planInputPartitions(o1, o2)
      .map(_.asInstanceOf[GraftInputPartition].filePath)
    assert(b2.isEmpty,
      s"replacement manifest redelivered ${b2.length} files to a stream with history: ${b2.toSeq}")
    // a NEW append after the delete still flows normally
    spark.range(30, 35).selectExpr("id as k").write.format("graft").mode("append").save(dir)
    val o3 = ms.latestOffset().asInstanceOf[GraftStreamOffset]
    val b3 = ms.planInputPartitions(o2, o3)
    assert(b3.nonEmpty, "post-delete appends must still stream")
  }

  test("manifest=false against a manifest checkpoint fails at offset restore") {
    val dir = "/tmp/graft-test/stream-downgrade"
    spark.range(5).selectExpr("id as k").write.format("graft").mode("overwrite").save(dir)
    val hconf = spark.sessionState.newHadoopConf()
    val schemaJson = spark.read.format("graft").load(dir).schema.json
    val ms = new GraftMicroBatchStream(dir, new SerializableHadoopConf(hconf), schemaJson)
    val manifestOffset = ms.latestOffset().asInstanceOf[GraftStreamOffset]
    assert(manifestOffset.manifest)
    val msPlain = new GraftMicroBatchStream(dir, new SerializableHadoopConf(hconf), schemaJson,
      manifestOpt = Some(false))
    // the rejection must fire at RESTORE time, before any new offset could
    // be captured and WAL-logged into an unrecoverable mixed-mode pair
    val e = intercept[IllegalStateException](
      msPlain.deserializeOffset(manifestOffset.json()))
    assert(e.getMessage.contains("manifest=false"))
  }

  test("s_stream_sliding: every event lands in exactly size/slide = 2 windows") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val out = graft.queries.Streaming.queries("s_stream_sliding")(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    val nEvents = spark.read.parquet(s"$sf/events.parquet").count()
    assert(rows.map(_.getLong(2)).sum == 2 * nEvents,
      "overlapping-window multiplicity broken: total window membership != 2x events")
    // consecutive windows overlap: a 2h window starting at t shares its
    // second hour with the window starting at t+1h, so each window's count
    // equals the sum of its two tumbling hour cells
    val hourly = spark.read.parquet(s"$sf/events.parquet")
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("hn"))
      .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1)) -> r.getLong(2)).toMap
    rows.foreach { r =>
      val t0 = r.getTimestamp(0).getTime
      val et = r.getString(1)
      val expect = hourly.getOrElse((t0, et), 0L) + hourly.getOrElse((t0 + 3600000L, et), 0L)
      assert(r.getLong(2) == expect,
        s"window($t0, $et): ${r.getLong(2)} != hour cells sum $expect")
    }
  }
}
