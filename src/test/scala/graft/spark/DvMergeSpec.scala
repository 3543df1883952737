package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MERGE-ON-READ merge (`dvMode = true` / `graft.merge.mode=dv`): matched
  * UPDATE/DELETE clauses mask the old rows via deletion-vector sidecars
  * and append the updated versions under one tagged commit, NOT MATCHED
  * inserts are unchanged — the CDC-upsert cadence without rewrite
  * amplification. The contract under test:
  *
  *   - batch view identical to the copy-on-write merge on the same input;
  *   - matched data files BYTE-IDENTICAL (mask + append, never rewrite);
  *   - crash in the append->mask window converges to exactly-once;
  *   - re-runs are quiescent; SQL routes under graft.merge.mode=dv;
  *   - pinned (asof) reads older than the merge reproduce the pre-merge
  *     dataset (versioned masks + manifest-time file window).
  */
class DvMergeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.catalog.dvm", "graft.spark.GraftCatalog")
    .config("spark.sql.catalog.dvm.warehouse", "/tmp/graft-test/dvm-wh")
    .getOrCreate()

  private def fresh(name: String): String = {
    val dir = s"/tmp/graft-test/dvmerge-$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    dir
  }

  private def filesOf(dir: String): Map[String, (Long, Long)] =
    GraftUtil.listDataFiles(dir, spark.sessionState.newHadoopConf())
      .map(f => f.getPath.toString -> ((f.getLen, f.getModificationTime))).toMap

  private def rows(dir: String): Seq[(Long, Long)] =
    spark.read.format("graft").load(dir)
      .select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq

  private def upsertSource(ids: Seq[Long], bump: Long) = {
    import spark.implicits._
    ids.map(k => (k, k + bump)).toDF("sk", "sv")
  }

  test("dv-mode upsert masks matched rows, appends versions, leaves files byte-identical") {
    val dir = fresh("upsert")
    spark.range(0, 200).selectExpr("id AS k", "id AS v").repartition(4)
      .write.format("graft").option("maxrowsperfile", "50")
      .mode("overwrite").save(dir)
    val before = filesOf(dir)
    // keys 150..249: 50 matched updates + 50 inserts
    val st = GraftMaintenance.mergeApply(spark, dir,
      upsertSource(150L until 250L, 10000), Seq("k" -> "sk"),
      matched = Seq(GraftMaintenance.MergeClause(None,
        Some(Map("v" -> col(GraftMaintenance.SrcPrefix + "sv"))))),
      notMatchedInsert = Seq(GraftMaintenance.MergeClause(None,
        Some(Map("k" -> col("sk"), "v" -> col("sv"))))),
      dvMode = true)
    assert(st.filesRewritten == 0, st)
    assert(st.rowsUpdated == 50 && st.rowsInserted == 50, st)
    // original files untouched; appended files are new
    val after = filesOf(dir)
    assert(before.forall { case (p, meta) => after.get(p).contains(meta) },
      "dv-mode merge must leave every pre-existing data file byte-identical")
    assert(after.size > before.size, "the new versions arrive as appends")
    assert(GraftDv.hasAny(
      new org.apache.hadoop.fs.Path(dir).getFileSystem(
        spark.sessionState.newHadoopConf()),
      new org.apache.hadoop.fs.Path(dir)))
    val want = (0L until 150L).map(k => (k, k)) ++
      (150L until 250L).map(k => (k, k + 10000))
    assert(rows(dir) == want.sorted)
  }

  test("dv-mode tombstone matrix equals copy-on-write semantics") {
    import spark.implicits._
    def run(dvMode: Boolean): Seq[(Long, Long)] = {
      val dir = fresh(s"matrix-$dvMode")
      spark.range(0, 100).selectExpr("id AS k", "id AS v").repartition(2)
        .write.format("graft").mode("overwrite").save(dir)
      // op D deletes, op U updates, new keys insert
      val src = ((80L until 95L).map(k => (k, k * 2, "U")) ++
        (0L until 10L).map(k => (k, 0L, "D")) ++
        (200L until 205L).map(k => (k, k, "I"))).toDF("sk", "sv", "op")
      GraftMaintenance.mergeApply(spark, dir, src, Seq("k" -> "sk"),
        matched = Seq(
          GraftMaintenance.MergeClause(
            Some(col(GraftMaintenance.SrcPrefix + "op") === "D"), None),
          GraftMaintenance.MergeClause(None,
            Some(Map("v" -> col(GraftMaintenance.SrcPrefix + "sv"))))),
        notMatchedInsert = Seq(GraftMaintenance.MergeClause(None,
          Some(Map("k" -> col("sk"), "v" -> col("sv"))))),
        dvMode = dvMode)
      rows(dir)
    }
    val dv = run(dvMode = true)
    val cow = run(dvMode = false)
    assert(dv == cow, "dv-mode merge must produce the copy-on-write view")
    assert(dv == ((10L until 80L).map(k => (k, k)) ++
      (80L until 95L).map(k => (k, k * 2)) ++ Seq((95L, 95L), (96L, 96L),
      (97L, 97L), (98L, 98L), (99L, 99L)) ++
      (200L until 205L).map(k => (k, k))).sorted)
  }

  test("crash in the append->mask window converges on re-run (exactly-once)") {
    val dir = fresh("crash")
    spark.range(0, 100).selectExpr("id AS k", "id AS v").coalesce(1)
      .write.format("graft").mode("overwrite").save(dir)
    val src = upsertSource(90L until 110L, 5000)
    GraftMaintenance.dvMergeCrashAfterAppend = true
    try {
      val ex = intercept[RuntimeException] {
        GraftMaintenance.mergeApply(spark, dir, src, Seq("k" -> "sk"),
          matched = Seq(GraftMaintenance.MergeClause(None,
            Some(Map("v" -> col(GraftMaintenance.SrcPrefix + "sv"))))),
          notMatchedInsert = Seq(GraftMaintenance.MergeClause(None,
            Some(Map("k" -> col("sk"), "v" -> col("sv"))))),
          dvMode = true)
      }
      assert(ex.getMessage.contains("crash after append"))
    } finally GraftMaintenance.dvMergeCrashAfterAppend = false
    // crash window: old and new versions of the matched keys BOTH visible
    val mid = rows(dir)
    assert(mid.count(_._1 == 95L) == 2, s"old+new expected mid-crash: $mid")
    // resume with the SAME source converges to exactly-once
    val st = GraftMaintenance.mergeApply(spark, dir, src, Seq("k" -> "sk"),
      matched = Seq(GraftMaintenance.MergeClause(None,
        Some(Map("v" -> col(GraftMaintenance.SrcPrefix + "sv"))))),
      notMatchedInsert = Seq(GraftMaintenance.MergeClause(None,
        Some(Map("k" -> col("sk"), "v" -> col("sv"))))),
      dvMode = true)
    val want = (0L until 90L).map(k => (k, k)) ++
      (90L until 110L).map(k => (k, k + 5000))
    assert(rows(dir) == want.sorted, "resume must converge to exactly-once")
    // and a further re-run is quiescent
    GraftMaintenance.mergeApply(spark, dir, src, Seq("k" -> "sk"),
      matched = Seq(GraftMaintenance.MergeClause(None,
        Some(Map("v" -> col(GraftMaintenance.SrcPrefix + "sv"))))),
      notMatchedInsert = Seq(GraftMaintenance.MergeClause(None,
        Some(Map("k" -> col("sk"), "v" -> col("sv"))))),
      dvMode = true)
    assert(rows(dir) == want.sorted)
  }

  test("SQL MERGE routes through dv mode under graft.merge.mode=dv") {
    spark.sql("DROP TABLE IF EXISTS dvm.db.t")
    spark.sql("CREATE TABLE dvm.db.t (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO dvm.db.t SELECT id, id FROM range(100)")
    val dir = "/tmp/graft-test/dvm-wh/db/t"
    val before = filesOf(dir)
    spark.conf.set("graft.merge.mode", "dv")
    try {
      spark.sql(
        """MERGE INTO dvm.db.t t USING (
          |  SELECT id + 90 AS mk, id + 7000 AS mv FROM range(20)) s
          |ON t.k = s.mk
          |WHEN MATCHED THEN UPDATE SET v = s.mv
          |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.mk, s.mv)""".stripMargin)
    } finally spark.conf.unset("graft.merge.mode")
    val after = filesOf(dir)
    assert(before.forall { case (p, meta) => after.get(p).contains(meta) },
      "SQL dv-mode merge must not rewrite any pre-existing file")
    val got = spark.sql("SELECT k, v FROM dvm.db.t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = (0L until 90L).map(k => (k, k)) ++
      (90L until 110L).map(k => (k, k - 90 + 7000))
    assert(got == want, s"head: ${got.take(5)}")
  }

  test("pinned reads older than a dv merge reproduce the pre-merge dataset") {
    val dir = fresh("pin")
    spark.range(0, 50).selectExpr("id AS k", "id AS v").coalesce(1)
      .write.format("graft").mode("overwrite").save(dir)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sessionState.newHadoopConf())
    val t1 = GraftManifest.list(fs, new org.apache.hadoop.fs.Path(dir))
      .map(GraftManifest.nameT).max
    Thread.sleep(5)
    GraftMaintenance.mergeApply(spark, dir, upsertSource(40L until 60L, 900),
      Seq("k" -> "sk"),
      matched = Seq(GraftMaintenance.MergeClause(None,
        Some(Map("v" -> col(GraftMaintenance.SrcPrefix + "sv"))))),
      notMatchedInsert = Seq(GraftMaintenance.MergeClause(None,
        Some(Map("k" -> col("sk"), "v" -> col("sv"))))),
      dvMode = true)
    val pinned = spark.read.format("graft").option("asof", t1.toString).load(dir)
      .select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    assert(pinned == (0L until 50L).map(k => (k, k)),
      "the pin must hide both the masks and the appended versions")
    assert(rows(dir) == ((0L until 40L).map(k => (k, k)) ++
      (40L until 60L).map(k => (k, k + 900))).sorted)
  }

  test("dv merge with changelog reconciles a CDC consumer's derived table") {
    val dir = fresh("cdc")
    spark.range(0, 60).selectExpr("id AS k", "id AS v").coalesce(1)
      .write.format("graft").mode("overwrite").save(dir)
    // consumer bootstraps a derived copy at t0
    val derived = fresh("cdc-derived")
    spark.read.format("graft").load(dir)
      .write.format("graft").mode("overwrite").save(derived)
    val t0 = System.currentTimeMillis()
    Thread.sleep(5)
    GraftMaintenance.mergeApply(spark, dir, upsertSource(50L until 70L, 300),
      Seq("k" -> "sk"),
      matched = Seq(GraftMaintenance.MergeClause(None,
        Some(Map("v" -> col(GraftMaintenance.SrcPrefix + "sv"))))),
      notMatchedInsert = Seq(GraftMaintenance.MergeClause(None,
        Some(Map("k" -> col("sk"), "v" -> col("sv"))))),
      changelog = true, dvMode = true)
    Thread.sleep(5)
    GraftCdc.applyChangesBetween(spark, dir, t0,
      System.currentTimeMillis(), derived, "k")
    val got = spark.read.format("graft").load(derived)
      .select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    assert(got == rows(dir), "CDC apply must reconcile the dv merge exactly")
  }
}
