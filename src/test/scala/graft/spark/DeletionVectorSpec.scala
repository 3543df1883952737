package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Merge-on-read deletes via deletion vectors: a per-file ordinal bitmap
  * sidecar masks deleted rows at scan time instead of rewriting the file.
  * The contract under test:
  *
  *   - batch view identical to a copy-on-write deleteWhere;
  *   - original data files BYTE-IDENTICAL (same name, length, mtime);
  *   - footer row counts subtract the mask; footer-only aggregate /
  *     limit / top-N pushdowns decline while DVs exist;
  *   - cumulative across ops, convergent on re-run;
  *   - compaction folds the mask away and drops the sidecars;
  *   - fresh streams and the SQL surface see the masked view;
  *   - the _graft_ordinal metadata column addresses rows physically.
  */
class DeletionVectorSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fresh(name: String): String = {
    val dir = s"/tmp/graft-test/dv-$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    dir
  }

  private def fsOf(dir: String) = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sessionState.newHadoopConf())

  private def filesOf(dir: String): Map[String, (Long, Long)] =
    GraftUtil.listDataFiles(dir, spark.sessionState.newHadoopConf())
      .map(f => f.getPath.toString -> ((f.getLen, f.getModificationTime))).toMap

  private def ks(dir: String): Seq[Long] =
    spark.read.format("graft").load(dir)
      .select("k").collect().map(_.getLong(0)).sorted.toSeq

  test("_graft_ordinal metadata column exposes file-physical row positions") {
    val dir = fresh("ordinal")
    spark.range(0, 100).selectExpr("id AS k")
      .coalesce(1).write.format("graft")
      .option("maxrowsperfile", "1000").option("pagesize", "16")
      .mode("overwrite").save(dir)
    val got = spark.read.format("graft").load(dir)
      .select(col("k"), col(GraftDv.OrdinalCol))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    // single sorted file: ordinal == position == k
    assert(got == (0L until 100L).map(k => (k, k)),
      s"ordinals must be file-physical positions: ${got.take(5)}")
  }

  test("DV delete matches deleteWhere semantics with byte-identical files") {
    val dir = fresh("basic")
    spark.range(0, 500).selectExpr("id AS k", "id * 3 AS v").repartition(4)
      .write.format("graft").option("maxrowsperfile", "100")
      .mode("overwrite").save(dir)
    val before = filesOf(dir)
    val st = GraftMaintenance.deleteWhereDv(spark, dir, col("k") % 10 === 7)
    assert(st.rowsBefore == 500 && st.rowsAfter == 450, st)
    assert(filesOf(dir) == before,
      "DV delete must leave every data file byte-identical")
    assert(ks(dir) == (0L until 500L).filterNot(_ % 10 == 7))
    // row values intact, not just keys
    val vBad = spark.read.format("graft").load(dir)
      .filter(col("v") =!= col("k") * 3).count()
    assert(vBad == 0)
    // sidecars exist
    assert(GraftDv.hasAny(fsOf(dir), new org.apache.hadoop.fs.Path(dir)))
  }

  test("a broad DV delete routes to copy-on-write above graft.dv.maxMatchedFiles") {
    val dir = fresh("broadcow")
    spark.range(0, 400).selectExpr("id AS k", "id * 2 AS v").repartition(8)
      .write.format("graft").option("maxrowsperfile", "50")
      .mode("overwrite").save(dir)
    val before = filesOf(dir)
    assert(before.size >= 8)
    spark.conf.set("graft.dv.maxMatchedFiles", "3")
    try {
      // broad predicate touches every file -> matched-file count (8+)
      // exceeds the bound -> the CoW rewrite runs instead: files REWRITE
      // (survivor outputs), and no DV sidecar is ever published
      val st = GraftMaintenance.deleteWhereDv(spark, dir, col("k") % 2 === 0)
      assert(st.rowsAfter == 200, st)
      assert(ks(dir) == (0L until 400L).filter(_ % 2 == 1))
      assert(filesOf(dir) != before, "CoW fallback must rewrite files")
      assert(!GraftDv.hasAny(fsOf(dir), new org.apache.hadoop.fs.Path(dir)),
        "the fallback must not stage DV blobs")
      // a NARROW delete under the same bound still takes the dv path
      val before2 = filesOf(dir)
      GraftMaintenance.deleteWhereDv(spark, dir, col("k") === 1)
      assert(filesOf(dir) == before2, "narrow delete stays merge-on-read")
      assert(GraftDv.hasAny(fsOf(dir), new org.apache.hadoop.fs.Path(dir)))
      assert(ks(dir) == (0L until 400L).filter(k => k % 2 == 1 && k != 1))
    } finally spark.conf.unset("graft.dv.maxMatchedFiles")
  }

  test("DV deletes are cumulative and re-runs converge") {
    val dir = fresh("cumulative")
    spark.range(0, 300).selectExpr("id AS k").repartition(2)
      .write.format("graft").mode("overwrite").save(dir)
    GraftMaintenance.deleteWhereDv(spark, dir, col("k") < 50)
    val st2 = GraftMaintenance.deleteWhereDv(spark, dir, col("k").between(100, 149))
    assert(st2.rowsAfter == 200, st2)
    assert(ks(dir) == ((50L until 100L) ++ (150L until 300L)))
    // re-run of the first predicate: nothing still matches, nothing changes
    val st3 = GraftMaintenance.deleteWhereDv(spark, dir, col("k") < 50)
    assert(st3.filesRewritten == 0 && st3.rowsAfter == 200, st3)
    assert(ks(dir) == ((50L until 100L) ++ (150L until 300L)))
  }

  test("footer-only count and agg/limit/topN pushdowns stay correct under DVs") {
    val dir = fresh("pushdown")
    spark.range(0, 400).selectExpr("id AS k")
      .coalesce(1).sortWithinPartitions("k")
      .write.format("graft").option("sortby", "k")
      .option("pagesize", "32").mode("overwrite").save(dir)
    // pre-DV: footer count & agg pushdown active (sanity)
    assert(spark.read.format("graft").load(dir).count() == 400)
    GraftMaintenance.deleteWhereDv(spark, dir, col("k") < 10 || col("k") === 399)
    val t = spark.read.format("graft").load(dir)
    assert(t.count() == 389, "count must subtract the mask")
    // COUNT(*) stays a FOOTER-ONLY pushdown under DVs (cardinality
    // subtracted at plan time) — the plan must carry the agg scan
    assert(t.groupBy().count().queryExecution.executedPlan.toString
      .contains("footer-only aggregate scan"),
      "CountStar must still push down over a DV'd table")
    val mm = t.agg(min("k"), max("k")).collect()(0)
    assert(mm.getLong(0) == 10 && mm.getLong(1) == 398,
      s"min/max must reflect masked rows: $mm")
    // top-N over the sort marker: the true smallest are 10..14 now, and
    // the pushdown SURVIVES the mask — the per-file cover inflates by the
    // mask cardinality (11 here), so the scan still reads a bounded page
    // prefix instead of the file
    val pagesBefore = GraftMetrics.pageGroupsRead.get()
    val top = t.orderBy("k").limit(5).collect().map(_.getLong(0)).toSeq
    assert(top == (10L to 14L), s"topN must not serve masked leading rows: $top")
    val topPages = GraftMetrics.pageGroupsRead.get() - pagesBefore
    assert(topPages <= 3,
      s"masked top-N must stay page-bounded (read $topPages of ~13 pages)")
    assert(t.limit(3).collect().length == 3)
    // statistics numRows (plan-time) subtracts too
    val scanRows = GraftScan.rowCount(
      GraftUtil.listDataFiles(dir, spark.sessionState.newHadoopConf()),
      spark.sessionState.newHadoopConf())
    assert(scanRows.isPresent && scanRows.getAsLong == 389)
  }

  test("compaction folds DVs away and restores the sidecar-free table") {
    val dir = fresh("compact")
    spark.range(0, 300).selectExpr("id AS k").repartition(3)
      .write.format("graft").mode("overwrite").save(dir)
    GraftMaintenance.deleteWhereDv(spark, dir, col("k") % 3 === 0)
    assert(ks(dir) == (0L until 300L).filterNot(_ % 3 == 0))
    GraftMaintenance.compact(spark, dir, targetFiles = 1)
    assert(ks(dir) == (0L until 300L).filterNot(_ % 3 == 0),
      "compaction must fold the mask, not resurrect rows")
    assert(!GraftDv.hasAny(fsOf(dir), new org.apache.hadoop.fs.Path(dir)),
      "compaction must drop the retired files' DV sidecars")
    // pushdowns are live again post-fold
    assert(spark.read.format("graft").load(dir).count() == 200)
  }

  test("a row-level rewrite on a DV'd file folds the mask into its output") {
    val dir = fresh("rewrite-fold")
    spark.range(0, 200).selectExpr("id AS k", "id AS v").coalesce(1)
      .write.format("graft").mode("overwrite").save(dir)
    GraftMaintenance.deleteWhereDv(spark, dir, col("k") < 20)
    // copy-on-write delete of a DIFFERENT band rewrites the file — the
    // output must exclude both bands, and the DV sidecar must be dropped
    GraftMaintenance.deleteWhere(spark, dir, col("k").between(50, 59))
    assert(ks(dir) == (20L until 200L).filterNot(k => k >= 50 && k <= 59))
    assert(!GraftDv.hasAny(fsOf(dir), new org.apache.hadoop.fs.Path(dir)),
      "retiring a file must retire its deletion vectors")
  }

  test("DV deletes respect hive-partitioned layouts") {
    val dir = fresh("partitioned")
    spark.range(0, 120).selectExpr("id AS k", "CAST(id % 3 AS STRING) AS p")
      .write.format("graft").option("partitionby", "p")
      .mode("overwrite").save(dir)
    val before = filesOf(dir)
    GraftMaintenance.deleteWhereDv(spark, dir, col("k") % 4 === 1)
    assert(filesOf(dir) == before)
    assert(ks(dir) == (0L until 120L).filterNot(_ % 4 == 1))
    // partition pruning still applies above the mask
    assert(spark.read.format("graft").load(dir)
      .filter(col("p") === "0").count() == (0L until 120L)
        .count(k => k % 3 == 0 && k % 4 != 1))
  }

  private def lastCommitT(dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    GraftManifest.list(fsOf(dir), p).map(GraftManifest.nameT).max
  }

  private def ksAt(dir: String, asof: Long): Seq[Long] =
    spark.read.format("graft").option("asof", asof.toString).load(dir)
      .select("k").collect().map(_.getLong(0)).sorted.toSeq

  test("a VERSIONED DV delete keeps pinned reads reproducible; a TAKEDOWN erases history") {
    val dir = fresh("posture")
    spark.range(0, 100).selectExpr("id AS k").coalesce(1)
      .write.format("graft").mode("overwrite").save(dir)
    val t1 = lastCommitT(dir)
    Thread.sleep(5)
    // versioned: the pre-delete snapshot must still see the rows...
    GraftMaintenance.deleteWhereDv(spark, dir, col("k") < 10, takedown = false)
    assert(ks(dir) == (10L until 100L), "current read applies the mask")
    assert(ksAt(dir, t1) == (0L until 100L),
      "a pinned read older than a VERSIONED delete must see the pre-delete rows")
    Thread.sleep(5)
    // ...but a takedown delete is gone from EVERY read, pinned included.
    // Its publish sweeps the touched file's mask history, so the pinned
    // read of that file collapses to the takedown's CUMULATIVE mask — the
    // earlier versioned delete's rows vanish from the pin too (documented:
    // a takedown erases the history a more precise answer would need).
    GraftMaintenance.deleteWhereDv(spark, dir, col("k") === 50, takedown = true)
    assert(ks(dir) == (10L until 100L).filterNot(_ == 50))
    assert(ksAt(dir, t1) == (10L until 100L).filterNot(_ == 50),
      "a TAKEDOWN delete must mask pinned reads too (history erased)")
  }

  test("a takedown leaves OTHER files' pinned masks exactly versioned") {
    val dir = fresh("posture2")
    // two partitions = two files: the takedown touches only p=1
    spark.range(0, 100).selectExpr("id AS k", "CAST(id % 2 AS STRING) AS p")
      .write.format("graft").option("partitionby", "p")
      .mode("overwrite").save(dir)
    val t1 = lastCommitT(dir)
    Thread.sleep(5)
    GraftMaintenance.deleteWhereDv(spark, dir, col("k") < 10, takedown = false)
    Thread.sleep(5)
    GraftMaintenance.deleteWhereDv(spark, dir, col("k") === 51, takedown = true)
    assert(ks(dir) == (10L until 100L).filterNot(_ == 51))
    // pinned: even file untouched by the takedown reproduces exactly
    // (0,2,4,8 visible); the odd file collapsed to its takedown mask
    val pinned = ksAt(dir, t1)
    assert((0L until 10L by 2).forall(pinned.contains),
      s"files a takedown never touched must keep exact pinned masks: $pinned")
    assert(!pinned.contains(51L), "the takedown row must be gone from the pin")
  }

  test("a pinned read between two versioned deletes resolves the mid generation") {
    val dir = fresh("midgen")
    spark.range(0, 60).selectExpr("id AS k").coalesce(1)
      .write.format("graft").mode("overwrite").save(dir)
    GraftMaintenance.deleteWhereDv(spark, dir, col("k") < 5, takedown = false)
    Thread.sleep(5)
    val mid = System.currentTimeMillis()
    Thread.sleep(5)
    GraftMaintenance.deleteWhereDv(spark, dir, col("k") >= 55, takedown = false)
    assert(ks(dir) == (5L until 55L))
    assert(ksAt(dir, mid) == (5L until 60L),
      "the pin must resolve the generation current AT the pin, not the newest")
  }

  test("MOR update stays invisible to reads pinned before it") {
    val dir = fresh("updpin")
    spark.range(0, 40).selectExpr("id AS k", "id AS v").coalesce(1)
      .write.format("graft").mode("overwrite").save(dir)
    val t1 = lastCommitT(dir)
    Thread.sleep(5)
    GraftMaintenance.updateWhereDv(spark, dir, col("k") < 10,
      Map("v" -> (col("v") + 1000)))
    // current: updated values; pinned: original values, no new versions
    val cur = spark.read.format("graft").load(dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(cur == (0L until 40L).map(k => (k, if (k < 10) k + 1000 else k)))
    val pinned = spark.read.format("graft").option("asof", t1.toString).load(dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(pinned == (0L until 40L).map(k => (k, k)),
      "a pinned read older than a MOR update must see pre-update rows only")
  }

  test("vacuum sweeps superseded versioned generations past retention") {
    val dir = fresh("dvvac")
    spark.range(0, 30).selectExpr("id AS k").coalesce(1)
      .write.format("graft").mode("overwrite").save(dir)
    GraftMaintenance.deleteWhereDv(spark, dir, col("k") === 1, takedown = false)
    Thread.sleep(5)
    GraftMaintenance.deleteWhereDv(spark, dir, col("k") === 2, takedown = false)
    val fs = fsOf(dir)
    val tableDir = new org.apache.hadoop.fs.Path(dir)
    assert(GraftDv.listAll(fs, tableDir).head._2.length == 2,
      "both generations retained while within retention")
    // retention cutoff in the future: the superseded gen 1 goes, gen 2 stays
    GraftMaintenance.vacuum(spark, dir,
      olderThanMs = System.currentTimeMillis() + 60000)
    val left = GraftDv.listAll(fs, tableDir).head._2
    assert(left.map(_.gen) == Seq(2),
      s"vacuum must sweep the superseded generation, kept: $left")
    assert(ks(dir) == (0L until 30L).filterNot(k => k == 1 || k == 2))
  }

  test("COUNT(*) of a partition SUBDIR of a DV'd table subtracts the masks") {
    val dir = fresh("subdircount")
    spark.range(0, 120).selectExpr("id AS k", "CAST(id % 3 AS STRING) AS p")
      .write.format("graft").option("partitionby", "p")
      .mode("overwrite").save(dir)
    GraftMaintenance.deleteWhereDv(spark, dir, col("k") % 4 === 1)
    // loading the SUBDIR directly: the footer-only CountStar pushdown must
    // resolve the sidecars (and file idents) at the TABLE root — finding
    // none under the subdir would silently overcount the deleted rows
    val expected = (0L until 120L).count(k => k % 3 == 0 && k % 4 != 1)
    assert(spark.read.format("graft").load(s"$dir/p=0").count() == expected)
    // and the row scan of the same subdir agrees
    assert(spark.read.format("graft").load(s"$dir/p=0")
      .select("k").collect().length == expected)
  }

  test("a table whose own directory name contains '=' keeps its DV root") {
    val dir = fresh("eqname") + "/run=5"
    spark.range(0, 100).selectExpr("id AS k")
      .write.format("graft").mode("overwrite").save(dir)
    val st = GraftMaintenance.deleteWhereDv(spark, dir, col("k") < 10)
    assert(st.rowsAfter == 90, st)
    // the k=v walk must stop AT the table root (it carries _graft_dv /
    // _graft_manifest), not resolve one level above and drop the masks
    assert(ks(dir) == (10L until 100L))
    assert(spark.read.format("graft").load(dir).count() == 90)
  }

  test("fresh streams read through the mask") {
    val dir = fresh("stream")
    spark.range(0, 80).selectExpr("id AS k")
      .write.format("graft").mode("overwrite").save(dir)
    GraftMaintenance.deleteWhereDv(spark, dir, col("k") >= 60)
    val schema = spark.read.format("graft").load(dir).schema
    val q = spark.readStream.format("graft").schema(schema).load(dir)
      .writeStream.format("memory").queryName("dv_stream").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dv_stream").select("k")
        .collect().map(_.getLong(0)).sorted.toSeq == (0L until 60L))
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS dv_stream")
    }
  }

  test("changelog publishes DV-deleted rows to the change feed") {
    val dir = fresh("cdc")
    spark.range(0, 90).selectExpr("id AS k")
      .write.format("graft").mode("overwrite").save(dir)
    Thread.sleep(3)
    val t1 = System.currentTimeMillis()
    Thread.sleep(3)
    GraftMaintenance.deleteWhereDv(spark, dir, col("k") < 5, changelog = true)
    Thread.sleep(3)
    val w = GraftCdc.changes(spark, dir, t1, System.currentTimeMillis())
      .select("k", GraftCdc.ChangeTypeCol)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(w == (0L until 5L).map((_, "delete")),
      s"the feed must carry the masked rows as deletes: $w")
  }

  test("DV changelog shards one feed file per matched data file") {
    val dir = fresh("cdcshard")
    // 4 files, every one holding victims of the scattered predicate
    spark.range(0, 400).selectExpr("id AS k").repartition(4)
      .write.format("graft").option("maxrowsperfile", "100")
      .mode("overwrite").save(dir)
    Thread.sleep(3)
    val t1 = System.currentTimeMillis()
    Thread.sleep(3)
    GraftMaintenance.deleteWhereDv(spark, dir, col("k") % 10 === 3,
      changelog = true)
    val feed = GraftUtil.listDataFiles(s"$dir/${GraftCdc.ChangesDir}",
      spark.sessionState.newHadoopConf())
    assert(feed.size == 4,
      s"a multi-file matched set must publish per-file feed shards, got " +
        feed.map(_.getPath.getName).mkString(", "))
    // the sharded feed still reads as one exact delete batch
    val w = GraftCdc.changes(spark, dir, t1, System.currentTimeMillis())
      .select("k", GraftCdc.ChangeTypeCol)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(w == (0L until 400L).filter(_ % 10 == 3).map((_, "delete")),
      s"head: ${w.take(5)}")
    // re-run converges without duplicate shards
    GraftMaintenance.deleteWhereDv(spark, dir, col("k") % 10 === 3,
      changelog = true)
    assert(GraftUtil.listDataFiles(s"$dir/${GraftCdc.ChangesDir}",
      spark.sessionState.newHadoopConf()).size == 4)
  }

  test("changes() types MOR-update feed events without raising") {
    val dir = fresh("cdctype")
    spark.range(0, 50).selectExpr("id AS k", "id AS v").repartition(2)
      .write.format("graft").mode("overwrite").save(dir)
    Thread.sleep(3)
    val t1 = System.currentTimeMillis()
    Thread.sleep(3)
    GraftMaintenance.updateWhereDv(spark, dir, col("k") < 6,
      Map("v" -> (col("v") + 100)), changelog = true)
    Thread.sleep(3)
    // the feed file names must carry a marker the reader's 8-hex pattern
    // matches — the old op-wide updv-upd<hash16> name raised here
    val w = GraftCdc.changes(spark, dir, t1, System.currentTimeMillis())
      .select("k", "v", GraftCdc.ChangeTypeCol)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sorted.toSeq
    val pre = (0L until 6L).map(k => (k, k, GraftCdc.TypeChangePreimage))
    val ins = (0L until 6L).map(k => (k, k + 100, "insert"))
    assert(w == (pre ++ ins).sorted,
      s"expected preimages + new-version inserts, got: $w")
  }

  test("SQL DELETE routes through deletion vectors under graft.delete.mode=dv") {
    val dir = fresh("sqlmode")
    spark.conf.set("spark.sql.catalog.gdv", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdv.warehouse", "/tmp/graft-test")
    spark.range(0, 70).selectExpr("id AS k")
      .write.format("graft").mode("overwrite").save(dir)
    val before = filesOf(dir)
    spark.conf.set("graft.delete.mode", "dv")
    try spark.sql(s"DELETE FROM gdv.`dv-sqlmode` WHERE k < 7")
    finally spark.conf.unset("graft.delete.mode")
    assert(filesOf(dir) == before,
      "dv-mode SQL DELETE must not rewrite any data file")
    assert(GraftDv.hasAny(fsOf(dir), new org.apache.hadoop.fs.Path(dir)))
    assert(spark.sql(s"SELECT k FROM gdv.`dv-sqlmode`")
      .collect().map(_.getLong(0)).sorted.toSeq == (7L until 70L))
    // default mode still rewrites
    spark.sql(s"DELETE FROM gdv.`dv-sqlmode` WHERE k >= 65")
    assert(spark.sql(s"SELECT count(*) FROM gdv.`dv-sqlmode`")
      .collect()(0).getLong(0) == 58)
  }

  test("atomic projections stay COLUMNAR under a mask; nested fall back row-based") {
    val dir = fresh("columnar")
    spark.range(0, 1000)
      .selectExpr("id AS k", "CAST(id AS STRING) AS s", "array(id, id + 1) AS tags")
      .coalesce(1).write.format("graft")
      .option("pagesize", "64").mode("overwrite").save(dir)
    GraftMaintenance.deleteWhereDv(spark, dir, col("k") % 7 === 3)
    val survivors = (0L until 1000L).filterNot(_ % 7 == 3)
    // atomic-only projection: the columnar mask path (pass-through batches
    // for untouched pages, per-type compaction for overlapped ones)
    val atomic = spark.read.format("graft").load(dir).select("k", "s")
    assert(atomic.queryExecution.executedPlan.toString.contains("Columnar"),
      "atomic projections over a DV'd table must plan columnar")
    val got = atomic.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.map(_._1).toSeq == survivors &&
      got.forall { case (kk, ss) => ss == kk.toString },
      "columnar mask must keep values row-aligned across compaction")
    // nested projection: row-based fallback, same masked view
    val nested = spark.read.format("graft").load(dir).select("k", "tags")
    val gotN = nested.collect().map(r =>
      (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1)
    assert(gotN.map(_._1).toSeq == survivors &&
      gotN.forall { case (kk, t) => t == Seq(kk, kk + 1) },
      "row fallback must mask nested projections identically")
  }

  test("truncating overwrite clears the DV sidecars with the files they masked") {
    val dir = fresh("truncate")
    spark.range(0, 60).selectExpr("id AS k")
      .write.format("graft").mode("overwrite").save(dir)
    GraftMaintenance.deleteWhereDv(spark, dir, col("k") < 10)
    assert(GraftDv.hasAny(fsOf(dir), new org.apache.hadoop.fs.Path(dir)))
    spark.range(100, 120).selectExpr("id AS k")
      .write.format("graft").mode("overwrite").save(dir)
    assert(!GraftDv.hasAny(fsOf(dir), new org.apache.hadoop.fs.Path(dir)),
      "stale sidecars would pin the re-filled table row-based forever")
    assert(ks(dir) == (100L until 120L))
  }

  test("vacuum sweeps orphaned DV sidecars and stale tmps") {
    val dir = fresh("vacuum")
    spark.range(0, 60).selectExpr("id AS k").coalesce(1)
      .write.format("graft").mode("overwrite").save(dir)
    GraftMaintenance.deleteWhereDv(spark, dir, col("k") < 5)
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = fsOf(dir)
    // orphan the sidecar: retire its data file through a path that cannot
    // know about DVs (an external delete), leaving the mask dangling
    val dataFile = GraftUtil.listDataFiles(dir, spark.sessionState.newHadoopConf()).head
    fs.delete(dataFile.getPath, false)
    assert(GraftDv.hasAny(fs, p))
    val st = GraftMaintenance.vacuum(spark, dir,
      olderThanMs = System.currentTimeMillis() + 1000)
    assert(st.scratchFiles >= 1, s"vacuum must report the swept sidecar: $st")
    assert(!GraftDv.hasAny(fs, p),
      "an orphaned mask must not keep declining pushdowns for nothing")
  }

  test("MOR update masks old versions and appends new ones; files untouched") {
    val dir = fresh("morupd")
    spark.range(0, 200).selectExpr("id AS k", "id AS v").repartition(2)
      .write.format("graft").mode("overwrite").save(dir)
    val before = filesOf(dir)
    val st = GraftMaintenance.updateWhereDv(spark, dir,
      col("k").between(50, 59), Map("v" -> (col("v") + 1000)))
    assert(st.rowsUpdated == 10, st)
    // original files byte-identical; the new versions are a fresh append
    assert(before.forall { case (f, m) => filesOf(dir).get(f).contains(m) },
      "MOR update must not rewrite the matched files")
    val got = spark.read.format("graft").load(dir)
      .select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).toSeq
    val want = (0L until 200L).map(k =>
      (k, if (k >= 50 && k <= 59) k + 1000 else k))
    assert(got == want, s"updated view wrong: ${got.slice(48, 62)}")
    assert(spark.read.format("graft").load(dir).count() == 200)
  }

  test("MOR update re-run converges (never re-applies to its own output)") {
    val dir = fresh("morupd-rerun")
    spark.range(0, 100).selectExpr("id AS k", "id AS v")
      .write.format("graft").mode("overwrite").save(dir)
    // v = v + 1 where v < 10: a re-application would hit the NEW versions
    // (v in 1..10 overlaps v < 10) and double the increment
    GraftMaintenance.updateWhereDv(spark, dir, col("v") < 10,
      Map("v" -> (col("v") + 1)))
    val once = spark.read.format("graft").load(dir)
      .select("v").collect().map(_.getLong(0)).sorted.toSeq
    val st2 = GraftMaintenance.updateWhereDv(spark, dir, col("v") < 10,
      Map("v" -> (col("v") + 1)))
    val twice = spark.read.format("graft").load(dir)
      .select("v").collect().map(_.getLong(0)).sorted.toSeq
    assert(st2.rowsUpdated == 0 && twice == once,
      s"re-run must converge, not double-apply: $st2 / ${twice.take(12)}")
  }

  test("MOR update crash after the append converges on re-run") {
    val dir = fresh("morupd-crash")
    spark.range(0, 100).selectExpr("id AS k", "id AS v")
      .write.format("graft").mode("overwrite").save(dir)
    // crash seam: the append committed, the masks never published —
    // old+new both visible (the documented duplicate window)
    intercept[RuntimeException] {
      GraftMaintenance.updateWhereDvImpl(spark, dir, col("k") < 10,
        Map("v" -> (col("v") + 500)), changelog = false,
        afterAppend = () => throw new RuntimeException("seam: crash after append"))
    }
    assert(spark.read.format("graft").load(dir).count() == 110,
      "the crash window shows duplicates (old unmasked + new appended)")
    // the re-run masks the old versions and skips the tagged append
    val st = GraftMaintenance.updateWhereDv(spark, dir, col("k") < 10,
      Map("v" -> (col("v") + 500)))
    val got = spark.read.format("graft").load(dir)
      .select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(t => (t._1, t._2)).toSeq
    val want = (0L until 100L).map(k =>
      (k, if (k < 10) k + 500 else k)).sortBy(t => (t._1, t._2))
    assert(got == want,
      s"resume must converge to exactly-once update: ${got.take(12)}")
    // the resume reports the rows it MASKED (they were still live); its
    // append was recognized as a replay and published nothing — count
    // staying exactly 100 proves that
    assert(st.rowsUpdated == 10, st)
  }

  test("MOR update with changelog reconciles a CDC consumer's derived table") {
    val src = fresh("morupd-cdc-src")
    val dst = fresh("morupd-cdc-dst")
    spark.range(0, 80).selectExpr("id AS k", "id AS v")
      .write.format("graft").mode("append").save(src)
    spark.read.format("graft").load(src)
      .write.format("graft").mode("append").save(dst)
    Thread.sleep(3)
    val t1 = System.currentTimeMillis()
    Thread.sleep(3)
    GraftMaintenance.updateWhereDv(spark, src, col("k") % 8 === 3,
      Map("v" -> (col("v") * 100)), changelog = true)
    Thread.sleep(3)
    GraftCdc.applyChangesBetween(spark, src, t1, System.currentTimeMillis(),
      dst, "k")
    val got = spark.read.format("graft").load(dst)
      .select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).toSeq
    val want = (0L until 80L).map(k =>
      (k, if (k % 8 == 3) k * 100 else k))
    assert(got == want,
      s"the consumer must see delete(old)+insert(new): ${got.take(10)}")
  }

  test("SQL UPDATE routes through MOR under graft.update.mode=dv with re-apply semantics") {
    val dir = fresh("morupd-sql")
    spark.conf.set("spark.sql.catalog.gdv2", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdv2.warehouse", "/tmp/graft-test")
    spark.range(0, 50).selectExpr("id AS k", "id AS v")
      .write.format("graft").mode("overwrite").save(dir)
    val before = filesOf(dir)
    spark.conf.set("graft.update.mode", "dv")
    try {
      spark.sql(s"UPDATE gdv2.`dv-morupd-sql` SET v = v + 1 WHERE k < 5")
      assert(before.forall { case (f, m) => filesOf(dir).get(f).contains(m) },
        "dv-mode SQL UPDATE must not rewrite the matched files")
      // SQL re-run semantics: the SAME statement applies AGAIN (fresh
      // execution nonce), unlike the library API's converge-on-re-run
      spark.sql(s"UPDATE gdv2.`dv-morupd-sql` SET v = v + 1 WHERE k < 5")
      val got = spark.sql(s"SELECT k, v FROM gdv2.`dv-morupd-sql`")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      assert(got == (0L until 50L).map(k => (k, if (k < 5) k + 2 else k)),
        s"two executions must apply twice: ${got.take(8)}")
    } finally spark.conf.unset("graft.update.mode")
  }

  test("a CDC consumer propagates DV deletes to a derived table") {
    val src = fresh("cdc-consume-src")
    val dst = fresh("cdc-consume-dst")
    spark.range(0, 100).selectExpr("id AS k", "id AS v")
      .write.format("graft").mode("append").save(src)
    spark.read.format("graft").load(src)
      .write.format("graft").mode("append").save(dst)
    Thread.sleep(3)
    val t1 = System.currentTimeMillis()
    Thread.sleep(3)
    GraftMaintenance.deleteWhereDv(spark, src, col("k") % 9 === 2, changelog = true)
    Thread.sleep(3)
    val (app, del) = GraftCdc.applyChangesBetween(spark, src,
      t1, System.currentTimeMillis(), dst, "k")
    assert(app == 0 && del == 11, s"($app, $del)")
    val got = spark.read.format("graft").load(dst)
      .select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (0L until 100L).filterNot(_ % 9 == 2),
      "the derived table must follow the masked source through the feed")
  }

  test("DV sidecar round-trip survives odd partition values (injective idents)") {
    val dir = fresh("weird-parts")
    spark.createDataFrame(Seq(
      (1L, "a/b"), (2L, "a/b"), (3L, "a_b"), (4L, "a_b")
    )).toDF("k", "p")
      .write.format("graft").option("partitionby", "p")
      .mode("overwrite").save(dir)
    GraftMaintenance.deleteWhereDv(spark, dir, col("k") === 1 || col("k") === 3)
    val got = spark.read.format("graft").load(dir)
      .select("k", "p").collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1).toSeq
    assert(got == Seq((2L, "a/b"), (4L, "a_b")),
      s"sanitization-colliding partitions must keep separate bitmaps: $got")
  }
}
