package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Compaction must preserve content exactly, actually shrink the file set,
  * and allow a layout (sortby / bloomfilter) to be imposed during the
  * rewrite — the natural maintenance moment at scale.
  */
class GraftMaintenanceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("compact shrinks the file set and preserves rows bit-exactly") {
    val dir = "/tmp/graft-test/maintenance-compact"
    // simulate drip ingest: 16 tiny files
    spark.range(16000).selectExpr("id AS k", "id * 3 AS v",
        "format_string('r%06d', id) AS s")
      .repartition(16)
      .write.format("graft").mode("overwrite").save(dir)
    val conf = spark.sessionState.newHadoopConf()
    assert(GraftUtil.listDataFiles(dir, conf).size == 16)
    val expected = spark.read.format("graft").load(dir)
      .selectExpr("to_json(struct(*)) AS r").collect().map(_.getString(0)).sorted.toSeq

    val st = GraftMaintenance.compact(spark, dir, targetFiles = 2)
    assert(st.filesBefore == 16 && st.filesAfter == 2 && st.rows == 16000)
    val back = spark.read.format("graft").load(dir)
    assert(back.count() == 16000)
    assert(back.selectExpr("to_json(struct(*)) AS r")
      .collect().map(_.getString(0)).sorted.toSeq == expected)
  }

  test("compact never deletes a file appended after its snapshot") {
    val dir = "/tmp/graft-test/maintenance-concurrent"
    spark.range(1000).selectExpr("id AS k", "id * 3 AS v")
      .repartition(8)
      .write.format("graft").mode("overwrite").save(dir)
    // a drip-ingest writer lands an append in compact's commit window
    // (after the rewrite, before the snapshot delete): its rows must
    // survive — the old commit-time listing deleted them silently
    val st = GraftMaintenance.compactImpl(spark, dir, 2, Map.empty, () =>
      spark.range(1000, 1250).selectExpr("id AS k", "id * 3 AS v")
        .coalesce(1)
        .write.format("graft").mode("append").save(dir))
    assert(st.rows == 1000)
    val back = spark.read.format("graft").load(dir)
    assert(back.count() == 1250, "concurrently appended rows were lost by compaction")
    assert(back.selectExpr("sum(k)").first().getLong(0) == (0L until 1250).sum)
  }

  test("deleteWhere rewrites only matching files and preserves partition layout") {
    import org.apache.spark.sql.functions.col
    val dir = "/tmp/graft-test/maintenance-delete"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    // lang-partitioned: matches live only under lang=b
    spark.range(3000)
      .selectExpr("id AS k", "CASE WHEN id % 3 = 0 THEN 'a' ELSE 'b' END AS lang")
      .write.format("graft").option("partitionby", "lang")
      .option("maxrowsperfile", "500").mode("overwrite").save(dir)
    val conf = spark.sessionState.newHadoopConf()
    val beforeA = GraftUtil.listDataFiles(s"$dir/lang=a", conf)
      .map(f => (f.getPath.toString, f.getModificationTime)).toSet

    val st = GraftMaintenance.deleteWhere(spark, dir,
      col("lang") === "b" && col("k") % 10 === 1)
    assert(st.rowsBefore == 3000)
    val deleted = (0L until 3000L).count(k => k % 3 != 0 && k % 10 == 1)
    assert(st.rowsAfter == 3000 - deleted, s"stats: $st")
    assert(st.filesUntouched > 0 && st.filesRewritten > 0)

    val back = spark.read.format("graft").load(dir)
    assert(back.count() == 3000 - deleted)
    assert(back.filter(col("lang") === "b" && col("k") % 10 === 1).count() == 0)
    // untouched partition keeps its exact files (identity, not rewrite)
    val afterA = GraftUtil.listDataFiles(s"$dir/lang=a", conf)
      .map(f => (f.getPath.toString, f.getModificationTime)).toSet
    assert(afterA == beforeA, "lang=a files must keep their identity")
    // rewritten rows landed back under their partition dirs
    assert(GraftUtil.listDataFiles(dir, conf)
      .forall(_.getPath.toString.contains("lang=")), "partition layout lost")
  }

  test("deleteWhere re-run after a publish/retire crash does not duplicate rows") {
    import org.apache.spark.sql.functions.col
    val dirA = "/tmp/graft-test/maintenance-delete-crash-a"
    val dirB = "/tmp/graft-test/maintenance-delete-crash-b"
    Seq(dirA, dirB).foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
    spark.range(1000).selectExpr("id AS k", "id * 2 AS v")
      .write.format("graft").option("maxrowsperfile", "400")
      .mode("overwrite").save(dirA)
    // identical twin table (same file names) to harvest the deterministic
    // survivor file a completed delete would publish
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(dirA), new java.io.File(dirB))
    val pred = col("k") < 100
    GraftMaintenance.deleteWhere(spark, dirB, pred)
    val conf = spark.sessionState.newHadoopConf()
    val survivor = GraftUtil.listDataFiles(dirB, conf)
      .map(_.getPath.getName).find(_.contains("-del"))
    assert(survivor.nonEmpty, "completed delete should publish a -del survivor file")
    // simulate the crash window in A: survivors published, original NOT yet
    // retired — copy B's survivor file next to A's intact original
    org.apache.commons.io.FileUtils.copyFile(
      new java.io.File(s"$dirB/${survivor.get}"),
      new java.io.File(s"$dirA/${survivor.get}"))
    // the pair state is invisible to readers: the published survivor
    // shadows its original (twin-wins dedup), so even BEFORE the re-run a
    // read is exactly-once at the POST-delete state for the crashed file
    val crashed = spark.read.format("graft").load(dirA)
    assert(crashed.count() == 900,
      "crash state must read exactly-once: survivor shadows its original")
    assert(crashed.filter(pred).count() == 0,
      "the shadowed original's pre-delete rows must not resurface")
    // the re-run must recognise the published survivors and only retire
    val st = GraftMaintenance.deleteWhere(spark, dirA, pred)
    val back = spark.read.format("graft").load(dirA)
    assert(back.count() == 900, s"re-run duplicated or lost rows: $st")
    assert(back.filter(col("k") < 100).count() == 0)
    assert(back.select(countDistinct(col("k"))).head().getLong(0) == 900,
      "survivor rows must appear exactly once")
  }

  test("expireManifests trims snapshot depth without touching data") {
    val dir = "/tmp/graft-test/maintenance-expire"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.range(10).selectExpr("id AS k").write.format("graft").mode("append").save(dir)
    Thread.sleep(5)
    val cut = System.currentTimeMillis()
    Thread.sleep(5)
    spark.range(10, 30).selectExpr("id AS k").write.format("graft").mode("append").save(dir)
    val removed = GraftMaintenance.expireManifests(spark, dir, cut)
    assert(removed == 1)
    // data intact; the expired commit's files read as pre-manifest history
    val g = spark.read.format("graft").load(dir)
    assert(g.count() == 30)
    assert(spark.read.format("graft").option("asof", cut.toString).load(dir).count() == 10)
  }

  test("zorder re-layout prunes range probes on BOTH columns") {
    val dir = "/tmp/graft-test/maintenance-zorder"
    // a scrambled 256x256 grid: no natural order, so only the z-layout can
    // give page groups axis-aligned tiles
    spark.range(256L * 256L).selectExpr("cast(hash(id) as bigint) AS noise",
        "id % 256 AS x", "id div 256 AS y", "id AS v")
      .orderBy("noise").drop("noise")
      .repartition(8).write.format("graft").mode("overwrite").save(dir)
    val st = GraftMaintenance.zorder(spark, dir, Seq("x", "y"), targetFiles = 16)
    assert(st.rows == 65536 && st.filesAfter == 16)
    val g = spark.read.format("graft").load(dir)
    def prunedFrac(f: org.apache.spark.sql.DataFrame => Long): Double = {
      GraftMetrics.pageGroupsSkipped.set(0)
      GraftMetrics.pageGroupsRead.set(0)
      f(g)
      val (s, r) = (GraftMetrics.pageGroupsSkipped.get(), GraftMetrics.pageGroupsRead.get())
      assert(s + r > 0)
      s.toDouble / (s + r)
    }
    val fx = prunedFrac { df =>
      val n = df.filter(col("x") >= 10 && col("x") < 20).count()
      assert(n == 10L * 256); n
    }
    assert(fx >= 0.5, s"x-range should prune half the tiles, pruned=$fx")
    val fy = prunedFrac { df =>
      val n = df.filter(col("y") >= 100 && col("y") < 110).count()
      assert(n == 10L * 256); n
    }
    assert(fy >= 0.5, s"y-range should prune half the tiles, pruned=$fy")
    // rows survive bit-exactly
    assert(g.agg(sum(col("v"))).head.getLong(0) == (0L until 65536L).sum)
  }

  test("compaction can impose a sorted layout that then prunes") {
    val dir = "/tmp/graft-test/maintenance-sort"
    // unsorted drip ingest
    spark.range(100000).selectExpr("cast(hash(id) as bigint) AS noise", "id AS k")
      .orderBy("noise").drop("noise").repartition(8)
      .write.format("graft").mode("overwrite").save(dir)
    val st = GraftMaintenance.compact(spark, dir, targetFiles = 1,
      extraWriteOptions = Map("sortby" -> "k"))
    assert(st.rows == 100000)
    val g = spark.read.format("graft").load(dir)
    GraftMetrics.pageGroupsSkipped.set(0)
    GraftMetrics.pageGroupsRead.set(0)
    assert(g.filter(col("k") >= 50000 && col("k") < 51000).count() == 1000)
    assert(GraftMetrics.pageGroupsSkipped.get() >= 10,
      s"post-compaction sorted layout should prune, skipped=${GraftMetrics.pageGroupsSkipped.get()}")
  }

  test("sorted compact withholds the sort marker when an append interleaves") {
    val dir = "/tmp/graft-test/maintenance-sorted-concurrent"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.range(2000).selectExpr("id AS k", "id * 3 AS v")
      .repartition(4)
      .write.format("graft").mode("overwrite").save(dir)
    // an unsorted append lands in compact's commit window: its rows must
    // survive (existing contract) AND the sorted rewrite must NOT publish
    // a whole-table sort marker over the unsorted file
    GraftMaintenance.compactImpl(spark, dir, 2,
      Map("sortby" -> "k"), () =>
        spark.range(2000, 2100).selectExpr("id AS k", "id * 3 AS v")
          .coalesce(1)
          .write.format("graft").mode("append").save(dir))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(spark.read.format("graft").load(dir).count() == 2100)
    assert(GraftSortMarker.read(fs, new org.apache.hadoop.fs.Path(dir)).isEmpty,
      "marker published over a table containing a concurrent unsorted append")
  }

  test("compact can EVOLVE the partition layout: flat table re-laid as hive dirs") {
    val dir = "/tmp/graft-test/maintenance-relayout"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    // a table ingested flat, later discovered to be pruned on `lang`
    spark.range(4000)
      .selectExpr("id AS k", "concat('l', cast(id % 4 as string)) AS lang")
      .repartition(8)
      .write.format("graft").mode("overwrite").save(dir)
    val conf = spark.sessionState.newHadoopConf()
    assert(GraftUtil.listDataFiles(dir, conf)
      .forall(f => f.getPath.getParent.getName == "maintenance-relayout"))
    val st = GraftMaintenance.compact(spark, dir, targetFiles = 4,
      extraWriteOptions = Map("partitionby" -> "lang"))
    assert(st.rows == 4000)
    // layout evolved in place: every file now lives under lang=…/
    val files = GraftUtil.listDataFiles(dir, conf)
    assert(files.nonEmpty &&
      files.forall(_.getPath.getParent.getName.startsWith("lang=")),
      s"expected hive layout after relayout: ${files.map(_.getPath).take(3)}")
    // and directory pruning now applies: an equality filter reads 1 of 4 dirs
    val one = spark.read.format("graft").load(dir).filter(col("lang") === "l2")
    assert(one.count() == 1000)
    assert(one.select(sum(col("k"))).first().getLong(0) ==
      (0L until 4000L).filter(_ % 4 == 2).sum)
  }

  test("deleteWhere crash window (catch-up published, expiry missed) self-heals on re-run") {
    import org.apache.hadoop.fs.Path
    val dir = "/tmp/graft-test/maint-delete-crashwin"
    spark.range(10).selectExpr("id as k").write.format("graft").mode("overwrite").save(dir)
    spark.range(10, 30).selectExpr("id as k").write.format("graft").mode("append").save(dir)
    val hconf = spark.sessionState.newHadoopConf()
    val tableDir = new Path(dir)
    val fs = tableDir.getFileSystem(hconf)
    // capture the commit-2 manifest so the crash window can be recreated
    val m2 = GraftManifest.list(fs, tableDir).last
    val m2entries = GraftManifest.read(fs, tableDir, m2)
    val pred = col("k").between(10, 12)
    GraftMaintenance.deleteWhere(spark, dir, pred)
    // survivors of the expired COMMIT manifest are re-published as a
    // REPLACEMENT at the original commit time (windows stay exact); the
    // catch-up tag is reserved for pre-manifest-history survivors, absent
    // here (both commits were manifested)
    assert(GraftManifest.list(fs, tableDir).exists(GraftManifest.isReplacement))
    assert(!GraftManifest.list(fs, tableDir).contains(m2), "m2 expired")
    // simulate the crash BETWEEN replacement publish and expiry: the
    // expired manifest reappears, referencing a now-retired file
    // (transient double coverage is the designed crash residue — never
    // row loss)
    val out = fs.create(new Path(GraftManifest.dir(tableDir), m2), true)
    try out.write(m2entries.map { case (n, l) => s"$n\t$l" }.mkString("", "\n", "\n")
      .getBytes("UTF-8")) finally out.close()
    // re-running the SAME delete heals: nothing matches (rows already
    // gone), but the listing-based expiry retires the stale manifest and
    // the already-covered survivors get no SECOND replacement (collapsed
    // on the logical commit key)
    GraftMaintenance.deleteWhere(spark, dir, pred)
    val after = GraftManifest.list(fs, tableDir)
    assert(!after.contains(m2), "stale manifest must expire on the healing re-run")
    assert(after.count(GraftManifest.isReplacement) == 1,
      s"healing must not publish a second replacement manifest: $after")
    assert(!after.exists(GraftManifest.isCatchup),
      s"manifested-commit survivors must not also land in a catch-up: $after")
    assert(spark.read.format("graft").load(dir).count() == 27)
    // fresh stream view == batch view after the heal
    val schemaJson = spark.read.format("graft").load(dir).schema.json
    val ms = new GraftMicroBatchStream(dir, new SerializableHadoopConf(hconf), schemaJson)
    val o1 = ms.latestOffset().asInstanceOf[GraftStreamOffset]
    val planned = ms.planInputPartitions(GraftStreamOffset.Empty, o1)
      .map(_.asInstanceOf[GraftInputPartition].filePath).toSet
    assert(planned == GraftUtil.listDataFiles(dir, hconf).map(_.getPath.toString).toSet)
  }

  test("updateWhere rewrites only matched files, preserves cardinality and schema") {
    import org.apache.hadoop.fs.Path
    val dir = "/tmp/graft-test/maint-update"
    spark.range(100).selectExpr("id AS k", "cast(id * 3 AS long) AS v", "'src' || (id % 4) AS s")
      .orderBy("k").repartition(4)
      .write.format("graft").mode("overwrite").save(dir)
    val hconf = spark.sessionState.newHadoopConf()
    val before = GraftUtil.listDataFiles(dir, hconf).map(_.getPath.getName).toSet
    val stats = GraftMaintenance.updateWhere(spark, dir,
      col("k") >= 90, Map("v" -> lit(-1), "s" -> lit("redacted")))
    assert(stats.rowsUpdated == 10 && stats.rowsTotal == 100)
    assert(stats.filesRewritten >= 1 &&
      stats.filesRewritten + stats.filesUntouched == 4)
    val after = spark.read.format("graft").load(dir)
    assert(after.count() == 100, "UPDATE preserves cardinality")
    assert(after.filter(col("k") >= 90)
      .collect().forall(r => r.getLong(1) == -1L && r.getString(2) == "redacted"))
    assert(after.filter(col("k") < 90 && (col("v") =!= col("k") * 3)).count() == 0,
      "non-matching rows untouched")
    // untouched files keep their identity (no needless rewrite)
    val names = GraftUtil.listDataFiles(dir, hconf).map(_.getPath.getName).toSet
    assert((before intersect names).size == stats.filesUntouched)
    assert(names.count(_.contains("-upd")) == stats.filesRewritten)
    // idempotent re-run: nothing left to match after the update
    val again = GraftMaintenance.updateWhere(spark, dir,
      col("k") >= 90 && col("s") =!= "redacted", Map("s" -> lit("redacted")))
    assert(again.rowsUpdated == 0 && again.filesRewritten == 0)
    // fresh stream view == batch view (the -upd outputs are adopted by the
    // catch-up manifest machinery like delete survivors)
    val schemaJson = after.schema.json
    val ms = new GraftMicroBatchStream(dir, new SerializableHadoopConf(hconf), schemaJson)
    val o1 = ms.latestOffset().asInstanceOf[GraftStreamOffset]
    val planned = ms.planInputPartitions(GraftStreamOffset.Empty, o1)
      .map(_.asInstanceOf[GraftInputPartition].filePath).toSet
    assert(planned == GraftUtil.listDataFiles(dir, hconf).map(_.getPath.toString).toSet)
  }

  test("updateWhere guards: partition columns rejected, sort marker cleared, changelog preimage") {
    import org.apache.hadoop.fs.Path
    val dir = "/tmp/graft-test/maint-update-guards"
    // the change feed accumulates across suite re-runs (overwrite truncates
    // DATA files only) — start from a clean table dir
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.range(60).selectExpr("id AS k", "cast(id % 3 AS string) AS p", "id * 2 AS v")
      .write.format("graft").option("partitionby", "p")
      .option("sortby", "k").mode("overwrite").save(dir)
    val hconf = spark.sessionState.newHadoopConf()
    val tableDir = new Path(dir)
    val fs = tableDir.getFileSystem(hconf)
    // a hive-partition path column cannot be assigned in place
    val e = intercept[IllegalArgumentException](
      GraftMaintenance.updateWhere(spark, dir, col("k") < 5, Map("p" -> lit("9"))))
    assert(e.getMessage.contains("partition"), e.getMessage)
    // an unknown target column is rejected with the schema in the message
    val e2 = intercept[IllegalArgumentException](
      GraftMaintenance.updateWhere(spark, dir, col("k") < 5, Map("nope" -> lit(1))))
    assert(e2.getMessage.contains("does not exist"), e2.getMessage)
    // updating a NON-marker column keeps the sort marker...
    assert(GraftSortMarker.read(fs, tableDir).contains(Seq("k")))
    GraftMaintenance.updateWhere(spark, dir, col("k") === 7, Map("v" -> lit(0)))
    assert(GraftSortMarker.read(fs, tableDir).contains(Seq("k")),
      "marker survives updates to non-sort columns")
    // ...updating the MARKER column clears it (order no longer guaranteed)
    GraftMaintenance.updateWhere(spark, dir, col("k") === 8, Map("k" -> lit(1000)))
    assert(GraftSortMarker.read(fs, tableDir).isEmpty,
      "marker must clear when a sort column is assigned")
    // changelog captures the PRE-image of updated rows
    val clBefore = spark.read.format("graft").load(dir)
      .filter(col("v") === 42).collect()
    GraftMaintenance.updateWhere(spark, dir, col("v") === 42,
      Map("v" -> lit(-42)), changelog = true)
    val feed = spark.read.format("graft")
      .load(new Path(tableDir, GraftCdc.ChangesDir).toString)
    assert(feed.filter(col("v") === 42).count() == clBefore.length,
      "change feed must hold the pre-image values")
    assert(spark.read.format("graft").load(dir).filter(col("v") === -42).count() ==
      clBefore.length)
  }

  test("updateWhere crash-resume: a published rewrite is recognised, not duplicated") {
    import org.apache.hadoop.fs.Path
    val dir = "/tmp/graft-test/maint-update-resume"
    spark.range(40).selectExpr("id AS k", "id * 5 AS v")
      .coalesce(2).write.format("graft").mode("overwrite").save(dir)
    val hconf = spark.sessionState.newHadoopConf()
    val fs = new Path(dir).getFileSystem(hconf)
    // run once to learn the deterministic name, then recreate the crash
    // window: rewrite published, original NOT retired
    val before = GraftUtil.listDataFiles(dir, hconf).map(_.getPath.toString).toSet
    GraftMaintenance.updateWhere(spark, dir, col("k") < 10, Map("v" -> lit(0)))
    val updFile = GraftUtil.listDataFiles(dir, hconf)
      .find(_.getPath.getName.contains("-upd")).get.getPath
    val origName = before.find(p => updFile.getName.startsWith(
      new Path(p).getName.stripSuffix(GraftUtil.Extension))).get
    // resurrect the "original" alongside the rewrite (duplicate-rows crash
    // residue, exactly what the docs describe)
    val resurrect = new Path(origName)
    org.apache.hadoop.fs.FileUtil.copy(fs, updFile, fs, resurrect, false, hconf)
    // the crash residue is invisible to readers: the published rewrite
    // shadows the resurrected original (twin-wins dedup), so reads stay
    // exactly-once even before the healing re-run
    assert(spark.read.format("graft").load(dir).count() == 40,
      "pair state must read exactly-once, not duplicate")
    // the re-run finds the published rewrite by name and just retires
    GraftMaintenance.updateWhere(spark, dir, col("k") < 10, Map("v" -> lit(0)))
    assert(!fs.exists(resurrect),
      "re-run must physically retire the shadowed original")
    assert(spark.read.format("graft").load(dir).count() == 40,
      "re-run must converge back to exactly-once contents")
  }

  test("non-idempotent update is never double-applied by a crash-window re-run") {
    import org.apache.hadoop.fs.Path
    val dir = "/tmp/graft-test/maint-update-nonidem"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.range(20).selectExpr("id AS k", "id AS v").coalesce(2)
      .write.format("graft").mode("overwrite").save(dir)
    val hconf = spark.sessionState.newHadoopConf()
    val fs = new Path(dir).getFileSystem(hconf)
    // v = v + 1 WHERE k < 10: the predicate still matches the REWRITTEN
    // rows, so without the converged-file guard a re-run would increment
    // them again (and a task race could duplicate the file outright)
    GraftMaintenance.updateWhere(spark, dir, col("k") < 10, Map("v" -> (col("v") + 1)))
    val once = spark.read.format("graft").load(dir)
      .filter(col("k") < 10).agg(sum(col("v"))).head().getLong(0)
    assert(once == (0 until 10).map(_ + 1).sum)
    // crash window: resurrect one original beside its published rewrite
    val updFile = GraftUtil.listDataFiles(dir, hconf)
      .find(_.getPath.getName.contains("-upd")).get.getPath
    val resurrect = new Path(updFile.getParent,
      updFile.getName.replaceAll("-upd[0-9a-f]{8}", ""))
    org.apache.hadoop.fs.FileUtil.copy(fs, updFile, fs, resurrect, false, hconf)
    // the healing re-run retires the original and must NOT touch the
    // converged -upd file (its rows would take +1 a second time)
    GraftMaintenance.updateWhere(spark, dir, col("k") < 10, Map("v" -> (col("v") + 1)))
    val healed = spark.read.format("graft").load(dir)
      .filter(col("k") < 10).agg(sum(col("v")), count(lit(1))).head()
    assert(healed.getLong(1) == 10, "exactly-once rows after healing")
    assert(healed.getLong(0) == once,
      s"assignment must apply exactly once: ${healed.getLong(0)} vs $once")
  }

  test("changelog survives identical basenames across partition directories") {
    import org.apache.hadoop.fs.Path
    val dir = "/tmp/graft-test/maint-update-partnames"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    // ONE task writing a partitioned layout emits the SAME basename in
    // every k=v dir (per-dir sequence restarts at 0, shared task uuid) —
    // a basename-keyed changelog identity made one partition's publish
    // mask the other's (permanent pre-image loss, found in review)
    spark.range(40).selectExpr("id AS k", "cast(id % 2 AS string) AS p", "id AS v")
      .coalesce(1).write.format("graft").option("partitionby", "p")
      .mode("overwrite").save(dir)
    val hconf = spark.sessionState.newHadoopConf()
    val byName = GraftUtil.listDataFiles(dir, hconf).map(_.getPath.getName)
    assert(byName.distinct.size < byName.size,
      s"test setup must produce colliding basenames, got $byName")
    // the predicate matches rows in BOTH partitions
    GraftMaintenance.updateWhere(spark, dir, col("k") < 10,
      Map("v" -> lit(-1L)), changelog = true)
    val feed = spark.read.format("graft")
      .load(new Path(dir, GraftCdc.ChangesDir).toString)
    assert(feed.count() == 10,
      "every partition's pre-image batch must reach the change feed")
    assert(feed.select("p").distinct().count() == 2,
      "pre-images from BOTH partition directories must be present")
    assert(spark.read.format("graft").load(dir).filter(col("v") === -1L).count() == 10)
  }

  test("mergeInto: matched files rewrite in place, unmatched source rows append") {
    import org.apache.hadoop.fs.Path
    val dir = "/tmp/graft-test/maint-merge"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.range(100).selectExpr("id AS k", "id * 2 AS v", "'old' AS s")
      .repartition(4).write.format("graft").mode("overwrite").save(dir)
    val hconf = spark.sessionState.newHadoopConf()
    val src = spark.range(90, 110).selectExpr("id AS k", "id * 100 AS v", "'src' AS s")
    import graft.spark.{GraftMaintenance => M}
    val pre = s"${M.SrcPrefix}"
    val stats = M.mergeInto(spark, dir, src, Seq("k" -> "k"),
      Map("v" -> col(pre + "v"), "s" -> lit("merged")),
      Some(Map("k" -> col("k"), "v" -> col("v"), "s" -> col("s"))))
    assert(stats.rowsUpdated == 10 && stats.rowsInserted == 10 && stats.rowsTotal == 100)
    val after = spark.read.format("graft").load(dir)
    assert(after.count() == 110)
    assert(after.filter(col("k").between(90, 99))
      .collect().forall(r => r.getLong(1) == r.getLong(0) * 100 && r.getString(2) == "merged"))
    assert(after.filter(col("k") >= 100)
      .collect().forall(r => r.getLong(1) == r.getLong(0) * 100 && r.getString(2) == "src"))
    assert(after.filter(col("k") < 90 && col("s") =!= "old").count() == 0)
    // re-running the SAME merge is exactly-once on rows AND values:
    // nothing re-inserts, and the rows run 1 INSERTED keep their inserted
    // values (the merge's own ins-tagged commit is excluded from the
    // rewrite set — matched clauses were judged against the PRE-merge
    // state, where those rows did not exist). A resume is fully quiescent.
    val again = M.mergeInto(spark, dir, src, Seq("k" -> "k"),
      Map("v" -> col(pre + "v"), "s" -> lit("merged")),
      Some(Map("k" -> col("k"), "v" -> col("v"), "s" -> col("s"))))
    assert(again.rowsInserted == 0, s"re-run must not re-insert, got $again")
    assert(again.filesRewritten == 0 && again.rowsUpdated == 0,
      s"converged re-run must be quiescent, got $again")
    assert(spark.read.format("graft").load(dir).count() == 110)
    assert(spark.read.format("graft").load(dir).filter(col("k").between(90, 99))
      .collect().forall(r => r.getLong(1) == r.getLong(0) * 100 && r.getString(2) == "merged"))
    assert(spark.read.format("graft").load(dir).filter(col("k") >= 100)
      .collect().forall(r => r.getString(2) == "src"),
      "a resume must not re-apply matched clauses to rows this merge inserted")
    val third = M.mergeInto(spark, dir, src, Seq("k" -> "k"),
      Map("v" -> col(pre + "v"), "s" -> lit("merged")),
      Some(Map("k" -> col("k"), "v" -> col("v"), "s" -> col("s"))))
    assert(third.filesRewritten == 0 && third.rowsInserted == 0,
      s"third run must be fully quiescent, got $third")
    // duplicate source keys violate the MERGE cardinality rule
    val e = intercept[IllegalArgumentException](
      M.mergeInto(spark, dir, src.union(src), Seq("k" -> "k"),
        Map("v" -> col(pre + "v")), None))
    assert(e.getMessage.contains("duplicate"), e.getMessage)
  }

  test("mergeApply: changelog pre-images, condition-narrowed probe, rowsDeleted") {
    import org.apache.hadoop.fs.Path
    import graft.spark.{GraftMaintenance => M}
    val dir = "/tmp/graft-test/maint-merge-matrix"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.range(40).selectExpr("id AS k", "id AS v").coalesce(4)
      .write.format("graft").mode("overwrite").save(dir)
    val hconf = spark.sessionState.newHadoopConf()
    // delete-only merge whose condition matches NOTHING: key matches exist
    // in every file, but no file may be rewritten (probe narrows by the
    // clause conditions, not just the join keys)
    val srcAll = spark.range(40).selectExpr("id AS k", "id AS v")
    val noop = M.mergeApply(spark, dir, srcAll, Seq("k" -> "k"),
      matched = Seq(M.MergeClause(Some(col(s"${M.SrcPrefix}v") > 1000), None)),
      notMatchedInsert = Seq.empty)
    assert(noop.filesRewritten == 0 && noop.rowsUpdated == 0 && noop.rowsDeleted == 0,
      s"condition-narrowed probe must rewrite nothing, got $noop")
    // tombstone delete WITH changelog: pre-images of the deleted rows land
    // in the CDC feed before the originals are retired
    val tomb = spark.range(5).selectExpr("id AS k", "id AS v")
    val st = M.mergeApply(spark, dir, tomb, Seq("k" -> "k"),
      matched = Seq(M.MergeClause(None, None)),
      notMatchedInsert = Seq.empty,
      changelog = true)
    assert(st.rowsDeleted == 5, s"got $st")
    assert(spark.read.format("graft").load(dir).count() == 35)
    val feed = spark.read.format("graft")
      .load(new Path(dir, GraftCdc.ChangesDir).toString)
    assert(feed.filter(col("k") < 5).count() == 5,
      "deleted rows' pre-images must reach the change feed")
  }

  test("mergeInto: incremental readers see only inserts; fresh streams see everything") {
    import org.apache.hadoop.fs.Path
    val dir = "/tmp/graft-test/maint-merge-cdc"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.range(40).selectExpr("id AS k", "id AS v").coalesce(2)
      .write.format("graft").mode("overwrite").save(dir)
    val hconf = spark.sessionState.newHadoopConf()
    val t0 = GraftManifest.list(
      new Path(dir).getFileSystem(hconf), new Path(dir))
      .map(GraftManifest.nameT).max
    Thread.sleep(5)
    val src = spark.range(35, 45).selectExpr("id AS k", "id * 10 AS v")
    import graft.spark.{GraftMaintenance => M}
    M.mergeInto(spark, dir, src, Seq("k" -> "k"),
      Map("v" -> col(s"${M.SrcPrefix}v")),
      Some(Map("k" -> col("k"), "v" -> col("v"))))
    // a `since` window spanning the merge delivers exactly the INSERTED
    // rows: the rewrites ride a catch-up manifest incremental readers skip
    val delta = spark.read.format("graft").option("since", t0.toString).load(dir)
    assert(delta.collect().map(_.getLong(0)).sorted.toSeq == (40L until 45L),
      "since-window must hold exactly the merge's inserted rows")
    // a fresh stream's view matches the batch view file for file
    val schemaJson = spark.read.format("graft").load(dir).schema.json
    val ms = new GraftMicroBatchStream(dir, new SerializableHadoopConf(hconf), schemaJson)
    val o1 = ms.latestOffset().asInstanceOf[GraftStreamOffset]
    val planned = ms.planInputPartitions(GraftStreamOffset.Empty, o1)
      .map(_.asInstanceOf[GraftInputPartition].filePath).toSet
    assert(planned == GraftUtil.listDataFiles(dir, hconf).map(_.getPath.toString).toSet)
  }

  test("vacuum removes aged staging junk, never live data or young tmps") {
    import org.apache.hadoop.fs.Path
    val dir = "/tmp/graft-test/maintenance-vacuum"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.range(2000).selectExpr("id AS k", "id * 3 AS v")
      .repartition(2)
      .write.format("graft").mode("overwrite").save(dir)
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val before = spark.read.format("graft").load(dir)
      .agg(sum(col("v"))).first().getLong(0)
    def plant(p: Path, aged: Boolean): Unit = {
      val out = fs.create(p, true); out.write(Array.fill(64)(7.toByte)); out.close()
      if (aged) fs.setTimes(p, 1000L, 1000L) // epoch-ish: far older than any cutoff
    }
    plant(new Path(root, ".crashed.graft.a99.tmp"), aged = true)
    plant(new Path(root, ".inflight.graft.a100.tmp"), aged = false)
    plant(new Path(new Path(root, GraftManifest.DirName), ".0000-stale.tmp"), aged = true)
    plant(new Path(root, "_graft_tmp_delete/x-ab/part.graft"), aged = true)

    val dry = GraftMaintenance.vacuum(spark, dir,
      olderThanMs = System.currentTimeMillis() - 60000, dryRun = true)
    assert(dry.stagingTmps == 2 && dry.scratchFiles == 1 && dry.changelogFiles == 0,
      s"dry-run miscounted: $dry")
    assert(dry.candidates.size == 3 && dry.bytesReclaimed == 3 * 64L)
    assert(fs.exists(new Path(root, ".crashed.graft.a99.tmp")), "dry-run must not delete")

    val st = GraftMaintenance.vacuum(spark, dir,
      olderThanMs = System.currentTimeMillis() - 60000)
    assert(st.stagingTmps == 2 && st.scratchFiles == 1)
    assert(!fs.exists(new Path(root, ".crashed.graft.a99.tmp")))
    assert(!fs.exists(new Path(root, "_graft_tmp_delete")))
    assert(fs.exists(new Path(root, ".inflight.graft.a100.tmp")),
      "a tmp younger than the cutoff belongs to an in-flight write — must survive")
    assert(GraftUtil.listDataFiles(dir, conf).size == 2, "live data files are never candidates")
    assert(GraftManifest.list(fs, root).nonEmpty, "live manifests are never candidates")
    assert(spark.read.format("graft").load(dir)
      .agg(sum(col("v"))).first().getLong(0) == before)
  }

  test("vacuum changelog retention expires aged feed history, keeps unlisted files") {
    import org.apache.hadoop.fs.Path
    val dir = "/tmp/graft-test/maintenance-vacuum-cl"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.range(1000).selectExpr("id AS k", "id * 3 AS v")
      .repartition(4)
      .write.format("graft").mode("overwrite").save(dir)
    GraftMaintenance.deleteWhere(spark, dir, col("k") < 100, changelog = true)
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val clDir = new Path(root, GraftCdc.ChangesDir)
    val fed = fs.listStatus(clDir).filter(f =>
      f.isFile && f.getPath.getName.endsWith(GraftUtil.Extension))
    assert(fed.nonEmpty, "deleteWhere(changelog=true) should have published feed files")
    // a feed file no manifest lists yet (mid-publish) must never be a candidate
    val unlisted = new Path(clDir, "unlisted-feed.graft")
    val out = fs.create(unlisted, true); out.write(1); out.close()
    fs.setTimes(unlisted, 1000L, 1000L)

    // default: changelog untouched even with an ancient general cutoff
    GraftMaintenance.vacuum(spark, dir, olderThanMs = System.currentTimeMillis())
    assert(fs.listStatus(clDir).count(f => f.isFile &&
      f.getPath.getName.endsWith(GraftUtil.Extension)) == fed.length + 1)

    val st = GraftMaintenance.vacuum(spark, dir,
      olderThanMs = System.currentTimeMillis(),
      changelogOlderThanMs = Some(System.currentTimeMillis() + 1000))
    assert(st.changelogFiles == fed.length, s"expected ${fed.length} feed files expired: $st")
    assert(fs.exists(unlisted), "feed file with no covering manifest must survive")
    assert(GraftManifest.list(fs, clDir).isEmpty, "covering feed manifests expire with the files")
  }
}
