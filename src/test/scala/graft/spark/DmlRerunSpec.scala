package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 DML semantics hardening:
  *
  *   - SQL UPDATE / MERGE re-run = RE-APPLICATION (standard SQL), while a
  *     crashed execution still resumes exactly-once under its persisted
  *     per-execution nonce (GraftOpMarker); the library API keeps its
  *     documented converge-on-re-run contract.
  *   - merge's insert append is idempotent across the crash window between
  *     the append commit and the staging cleanup (deterministic
  *     ins<hash>-tagged manifest).
  *   - updateWhere's stats distinguish a converged no-op resume from a real
  *     update (rowsUpdated counts only files this run touched).
  *   - merge probes survive a non-broadcast join plan
  *     (autoBroadcastJoinThreshold = -1): input_file_name is captured
  *     pre-join.
  *   - VERSION AS OF ordinals are stable across manifest expiry (version
  *     log holes, never renumbering).
  */
class DmlRerunSpec extends AnyFunSuite {

  private val wh = "/tmp/graft-test/dml-rerun-wh"

  lazy val spark: SparkSession = {
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.dmlcat", "graft.spark.GraftCatalog")
      .config("spark.sql.catalog.dmlcat.warehouse", wh)
      .getOrCreate()
  }

  private def conf = spark.sessionState.newHadoopConf()

  test("SQL UPDATE re-run applies a non-idempotent assignment again") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dmlcat.db")
    spark.sql("CREATE TABLE dmlcat.db.counters (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO dmlcat.db.counters VALUES (1, 10), (2, 20), (3, 30)")
    spark.sql("UPDATE dmlcat.db.counters SET v = v + 1 WHERE k <= 2")
    spark.sql("UPDATE dmlcat.db.counters SET v = v + 1 WHERE k <= 2")
    val got = spark.sql("SELECT k, v FROM dmlcat.db.counters ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 12L), (2L, 22L), (3L, 30L)),
      s"second identical SQL UPDATE must increment again, got $got")
  }

  test("SQL UPDATE crash-resume under a persisted nonce stays exactly-once") {
    spark.sql("CREATE TABLE dmlcat.db.resume1 (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO dmlcat.db.resume1 VALUES (1, 100), (2, 200)")
    val dir = s"$wh/db/resume1"
    val tableDir = new org.apache.hadoop.fs.Path(dir)
    val fs = tableDir.getFileSystem(conf)
    def markers() = {
      val d = new org.apache.hadoop.fs.Path(tableDir, "_graft_tmp_update")
      if (!fs.exists(d)) Seq.empty
      else fs.listStatus(d).toSeq.map(_.getPath.getName).filter(_.startsWith("op-"))
    }
    // execution 1 "crashes" AFTER its rewrites, BEFORE releasing its
    // marker — the exact window the persisted nonce covers
    GraftUpdateCommand.crashBeforeRelease = true
    val boom = intercept[RuntimeException](
      spark.sql("UPDATE dmlcat.db.resume1 SET v = v + 7 WHERE k = 1"))
    GraftUpdateCommand.crashBeforeRelease = false
    assert(boom.getMessage.contains("test seam"))
    assert(spark.sql("SELECT v FROM dmlcat.db.resume1 WHERE k = 1")
      .head().getLong(0) == 107L, "the crashed execution's rewrite is durable")
    assert(markers().size == 1, s"crashed execution must leave its marker: ${markers()}")
    // the re-run of the IDENTICAL statement resumes under the SAME nonce:
    // the converged file is skipped — v stays 107, never 114
    spark.sql("UPDATE dmlcat.db.resume1 SET v = v + 7 WHERE k = 1")
    val v = spark.sql("SELECT v FROM dmlcat.db.resume1 WHERE k = 1")
      .head().getLong(0)
    assert(v == 107L, s"crash-resume must not double-apply: v = $v")
    assert(markers().isEmpty, "the completed resume must release the marker")
    // with the marker released, the NEXT identical statement is a fresh
    // execution and re-applies — standard SQL semantics
    spark.sql("UPDATE dmlcat.db.resume1 SET v = v + 7 WHERE k = 1")
    assert(spark.sql("SELECT v FROM dmlcat.db.resume1 WHERE k = 1")
      .head().getLong(0) == 114L,
      "after release, an identical statement must re-apply")
  }

  test("SQL UPDATE crash-resume stays exactly-once in dv mode too") {
    spark.sql("CREATE TABLE dmlcat.db.resume2 (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO dmlcat.db.resume2 VALUES (1, 100), (2, 200)")
    spark.conf.set("graft.update.mode", "dv")
    try {
      // execution 1 crashes AFTER the MOR pass (mask+append committed),
      // BEFORE releasing its marker
      GraftUpdateCommand.crashBeforeRelease = true
      val boom = intercept[RuntimeException](
        spark.sql("UPDATE dmlcat.db.resume2 SET v = v + 7 WHERE k = 1"))
      GraftUpdateCommand.crashBeforeRelease = false
      assert(boom.getMessage.contains("test seam"))
      assert(spark.sql("SELECT v FROM dmlcat.db.resume2 WHERE k = 1")
        .head().getLong(0) == 107L)
      // the resume re-runs under the SAME nonce: probe excludes the
      // tagged append's files, masks converge — v stays 107
      spark.sql("UPDATE dmlcat.db.resume2 SET v = v + 7 WHERE k = 1")
      assert(spark.sql("SELECT v FROM dmlcat.db.resume2 WHERE k = 1")
        .head().getLong(0) == 107L, "dv-mode crash-resume must not double-apply")
      // a fresh execution (marker released) re-applies — SQL semantics
      spark.sql("UPDATE dmlcat.db.resume2 SET v = v + 7 WHERE k = 1")
      assert(spark.sql("SELECT v FROM dmlcat.db.resume2 WHERE k = 1")
        .head().getLong(0) == 114L)
      assert(spark.sql("SELECT count(*) FROM dmlcat.db.resume2")
        .head().getLong(0) == 2, "no duplicate row versions may survive")
    } finally {
      GraftUpdateCommand.crashBeforeRelease = false
      spark.conf.unset("graft.update.mode")
    }
  }

  test("SQL MERGE re-run with an identical source re-applies matched updates") {
    spark.sql("CREATE TABLE dmlcat.db.merged (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO dmlcat.db.merged VALUES (1, 10), (2, 20)")
    spark.range(1, 2).selectExpr("id AS k", "5L AS dv")
      .createOrReplaceTempView("mrg_src_rerun")
    val m = "MERGE INTO dmlcat.db.merged AS t USING mrg_src_rerun AS s " +
      "ON t.k = s.k WHEN MATCHED THEN UPDATE SET v = t.v + s.dv"
    spark.sql(m)
    spark.sql(m)
    val v = spark.sql("SELECT v FROM dmlcat.db.merged WHERE k = 1").head().getLong(0)
    assert(v == 20L, s"second identical MERGE must add dv again, got v = $v")
  }

  test("library updateWhere re-run converges and reports it (stats, not silence)") {
    val dir = "/tmp/graft-test/dml-rerun-lib-upd"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.range(100).selectExpr("id AS k", "id AS v").repartition(2)
      .write.format("graft").mode("overwrite").save(dir)
    val st1 = GraftMaintenance.updateWhere(spark, dir, col("k") < 50,
      Map("v" -> (col("v") + 1)))
    assert(st1.rowsUpdated == 50L && st1.filesRewritten > 0 &&
      st1.skippedConverged == 0)
    // identical statement again: converged — no rewrite, and the stats say
    // so instead of claiming phantom updated rows
    val st2 = GraftMaintenance.updateWhere(spark, dir, col("k") < 50,
      Map("v" -> (col("v") + 1)))
    assert(st2.filesRewritten == 0, "converged re-run must rewrite nothing")
    assert(st2.rowsUpdated == 0L,
      s"a converged no-op resume must not claim updated rows, got ${st2.rowsUpdated}")
    assert(st2.skippedConverged == st1.filesRewritten)
    assert(spark.read.format("graft").load(dir)
      .agg(sum("v")).head().getLong(0) == (0L until 100L).sum + 50L)
  }

  test("merge insert append is idempotent across the append/cleanup crash window") {
    val dir = "/tmp/graft-test/dml-rerun-mrg-ins"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.range(10).selectExpr("id AS k", "id * 2 AS v").coalesce(1)
      .write.format("graft").mode("overwrite").save(dir)
    val source = spark.range(8, 14).selectExpr("id AS k", "id * 100 AS v")
    val st1 = GraftMaintenance.mergeInto(spark, dir, source,
      keys = Seq("k" -> "k"),
      updateAssigns = Map("v" -> col(GraftMaintenance.SrcPrefix + "v")),
      insertExprs = Some(Map("k" -> col("k"), "v" -> col("v"))))
    assert(st1.rowsInserted == 4L)
    val tableDir = new org.apache.hadoop.fs.Path(dir)
    val fs = tableDir.getFileSystem(conf)
    // the insert commit carries its deterministic ins<hash> tag
    val insTag = GraftManifest.list(fs, tableDir)
      .flatMap("""-(ins[0-9a-f]{8})$""".r.findFirstMatchIn(_)).map(_.group(1))
    assert(insTag.size == 1, s"expected one ins-tagged manifest, got $insTag")
    // simulate the ADVICE crash window: the append committed, the cleanup
    // never ran — the hash-keyed staging is back on disk when the same
    // merge re-executes, and the resume deliberately skips recomputing it
    val insStage = new org.apache.hadoop.fs.Path(tableDir,
      s"_graft_tmp_merge/${insTag.head.replaceFirst("ins", "ins-")}")
    spark.range(8, 14).filter(col("id") >= 10).selectExpr("id AS k", "id * 100 AS v")
      .write.format("graft").mode("overwrite").save(insStage.toString)
    val before = spark.read.format("graft").load(dir).count()
    val st2 = GraftMaintenance.mergeInto(spark, dir, source,
      keys = Seq("k" -> "k"),
      updateAssigns = Map("v" -> col(GraftMaintenance.SrcPrefix + "v")),
      insertExprs = Some(Map("k" -> col("k"), "v" -> col("v"))))
    val after = spark.read.format("graft").load(dir).count()
    assert(after == before,
      s"resume after the append/cleanup crash window duplicated rows: $before -> $after")
    assert(spark.read.format("graft").load(dir)
      .groupBy("k").count().filter(col("count") > 1).count() == 0,
      "no key may appear twice after a crash-resume")
    assert(st2.rowsInserted >= 0L) // resume reports the staged count, not a new append
  }

  test("merge resume never re-applies non-idempotent matched clauses to its own inserts") {
    // the review-pass corruption case: run 1 inserts keys via an ordinary
    // append (no -mrg marker in the file name), and a crash-resume re-run
    // of the SAME merge used to find those rows matched and apply
    // v = v + src.v AGAIN — the own-insert commit exclusion prevents it
    val dir = "/tmp/graft-test/dml-rerun-own-ins"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.range(10).selectExpr("id AS k", "id AS v").coalesce(1)
      .write.format("graft").mode("overwrite").save(dir)
    val source = spark.range(8, 13).selectExpr("id AS k", "100L AS dv")
    def merge() = GraftMaintenance.mergeApply(spark, dir, source,
      keys = Seq("k" -> "k"),
      matched = Seq(GraftMaintenance.MergeClause(None, Some(Map(
        "v" -> (col("v") + col(GraftMaintenance.SrcPrefix + "dv")))))),
      notMatchedInsert = Seq(GraftMaintenance.MergeClause(None, Some(Map(
        "k" -> col("k"), "v" -> col("dv"))))))
    val st1 = merge()
    assert(st1.rowsUpdated == 2L && st1.rowsInserted == 3L)
    def vals() = spark.read.format("graft").load(dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val after1 = vals()
    assert(after1(8L) == 108L && after1(9L) == 109L, s"$after1")
    assert(after1(10L) == 100L && after1(12L) == 100L, s"$after1")
    // resume (library converge path, same hash): fully quiescent — the
    // inserted rows keep their INSERTED values, matched rows are skipped
    // as converged, nothing re-applies
    val st2 = merge()
    assert(st2.filesRewritten == 0 && st2.rowsUpdated == 0 && st2.rowsInserted == 0,
      s"resume must be quiescent, got $st2")
    assert(vals() == after1,
      "resume re-applied a non-idempotent matched clause")
  }

  test("merge probes survive autoBroadcastJoinThreshold = -1 (no broadcast)") {
    val dir = "/tmp/graft-test/dml-rerun-nobc"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.range(200).selectExpr("id AS k", "id AS v").repartition(3)
      .write.format("graft").mode("overwrite").save(dir)
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val source = spark.range(190, 210).selectExpr("id AS k", "id * 10 AS v")
      val st = GraftMaintenance.mergeInto(spark, dir, source,
        keys = Seq("k" -> "k"),
        updateAssigns = Map("v" -> col(GraftMaintenance.SrcPrefix + "v")),
        insertExprs = Some(Map("k" -> col("k"), "v" -> col("v"))))
      assert(st.rowsUpdated == 10L && st.rowsInserted == 10L,
        s"merge under a sort-merge join plan must still probe files: $st")
      assert(spark.read.format("graft").load(dir).count() == 210L)
      assert(spark.read.format("graft").load(dir)
        .filter(col("k") === 195).head().getAs[Long]("v") == 1950L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("VERSION AS OF ordinals survive mid-history manifest expiry") {
    spark.sql("CREATE TABLE dmlcat.db.versioned (k BIGINT)")
    spark.sql("INSERT INTO dmlcat.db.versioned VALUES (1)")
    Thread.sleep(5)
    spark.sql("INSERT INTO dmlcat.db.versioned VALUES (2)")
    Thread.sleep(5)
    spark.sql("INSERT INTO dmlcat.db.versioned VALUES (3)")
    val dir = s"$wh/db/versioned"
    def asOf(n: Int) =
      spark.sql(s"SELECT sum(k) FROM dmlcat.db.versioned VERSION AS OF $n")
        .head().getLong(0)
    assert(asOf(1) == 1L && asOf(2) == 3L && asOf(3) == 6L)
    // expire the FIRST commit's manifest (retention): later ordinals must
    // NOT renumber — version 2 still means "after the second commit"
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    val names = GraftManifest.list(fs, new org.apache.hadoop.fs.Path(dir))
    assert(names.size == 3)
    GraftMaintenance.expireManifests(spark, dir,
      olderThanMs = GraftManifest.nameT(names(0)) + 1)
    assert(asOf(2) == 3L, "version 2 renumbered after expiring version 1")
    assert(asOf(3) == 6L, "version 3 renumbered after expiring version 1")
    val err = intercept[Exception](asOf(1))
    assert(err.getMessage.contains("expired"),
      s"expired version must say so, got: ${err.getMessage}")
    // a NEW commit takes ordinal 4 — numbering never reuses holes
    spark.sql("INSERT INTO dmlcat.db.versioned VALUES (4)")
    assert(asOf(4) == 10L)
  }

  test("truncating overwrite resets merge-insert dedup (generation sentinel)") {
    // the exact trap the full-suite rerun exposed: a table truncated and
    // reloaded with identical content, then hit with the IDENTICAL merge —
    // the pre-truncate insert commit is in the version log, but its rows
    // are gone, so treating it as already-applied would silently drop the
    // insert set. The truncate sentinel scopes the dedup to the current
    // data generation.
    val dir = "/tmp/graft-test/dml-rerun-trunc"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    def seed(): Unit = spark.range(10).selectExpr("id AS k", "id * 2 AS v")
      .coalesce(1).write.format("graft").mode("overwrite").save(dir)
    val source = spark.range(8, 12).selectExpr("id AS k", "id * 100 AS v")
    def merge() = GraftMaintenance.mergeInto(spark, dir, source,
      keys = Seq("k" -> "k"),
      updateAssigns = Map("v" -> col(GraftMaintenance.SrcPrefix + "v")),
      insertExprs = Some(Map("k" -> col("k"), "v" -> col("v"))))
    seed()
    assert(merge().rowsInserted == 2L)
    assert(spark.read.format("graft").load(dir).count() == 12L)
    seed() // truncating overwrite: back to 10 rows, same content
    merge()
    assert(spark.read.format("graft").load(dir).count() == 12L,
      "identical merge after a truncate must re-insert the unmatched rows")
    // and VERSION AS OF ordinals ignore the sentinel (no shift, no reuse)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    val log = GraftVersionLog.sync(fs, new org.apache.hadoop.fs.Path(dir))
    assert(log.exists(_.startsWith(GraftVersionLog.SentinelPrefix)))
    assert(GraftVersionLog.commits(log).size >= 3) // seed, ins, seed2, ins2
  }
}
