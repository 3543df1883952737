package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Metadata-only ALTER TABLE DROP/RENAME COLUMN through the column-mapping
  * sidecar: files never rewrite, mixed-generation directories read as one
  * namespace, dropped/renamed physical names can never be reused, and the
  * whole DML/pushdown surface keeps working over renamed columns.
  */
class ColumnMappingSpec extends AnyFunSuite {

  private val wh = "/tmp/graft-test/colmap-wh"

  lazy val spark: SparkSession = {
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.cmcat", "graft.spark.GraftCatalog")
      .config("spark.sql.catalog.cmcat.warehouse", wh)
      .getOrCreate()
  }

  private def conf = spark.sessionState.newHadoopConf()

  private def dataFiles(dir: String): Map[String, Long] =
    GraftUtil.listDataFiles(dir, conf)
      .map(f => f.getPath.getName -> f.getModificationTime).toMap

  test("mapping sidecar JSON round-trips (incl. escapes)") {
    val m = GraftColumnMap.Mapping(
      Map("newName" -> Seq("old \"quoted\"", "tab\tname")),
      Seq("dropped1", "weird\\slash"))
    assert(GraftColumnMap.parse(GraftColumnMap.render(m)) == m)
    assert(GraftColumnMap.parse("""{"aliases":{},"dropped":[]}""") == GraftColumnMap.Empty)
  }

  test("RENAME COLUMN reads mixed-generation files under one name, files unrewritten") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cmcat.db")
    spark.sql("CREATE TABLE cmcat.db.t1 (id BIGINT, amount BIGINT)")
    spark.sql("INSERT INTO cmcat.db.t1 SELECT id, id * 10 FROM range(100)")
    val dir = s"$wh/db/t1"
    val before = dataFiles(dir)
    spark.sql("ALTER TABLE cmcat.db.t1 RENAME COLUMN amount TO revenue")
    // old files untouched — identity (name + mtime) preserved
    assert(dataFiles(dir) == before, "rename must not rewrite any data file")
    // second generation written under the NEW physical name
    spark.sql("INSERT INTO cmcat.db.t1 SELECT id + 100, (id + 100) * 10 FROM range(100)")
    val all = spark.sql(
      "SELECT count(*) AS n, sum(revenue) AS s, min(revenue) AS mn FROM cmcat.db.t1")
      .head()
    assert(all.getLong(0) == 200L)
    assert(all.getLong(1) == (0L until 200L).map(_ * 10).sum)
    assert(all.getLong(2) == 0L)
    // filters on the renamed column reach both generations
    assert(spark.sql("SELECT count(*) FROM cmcat.db.t1 WHERE revenue >= 1500")
      .head().getLong(0) == 50L)
    // the PATH reader sees the identical logical table (catalog invariant)
    val byPath = spark.read.format("graft").load(dir)
    assert(byPath.columns.toSeq == Seq("id", "revenue"))
    assert(byPath.agg(sum("revenue")).head().getLong(0) == all.getLong(1))
    // the old name is gone from the surface
    val e = intercept[Exception](
      spark.sql("SELECT amount FROM cmcat.db.t1").collect())
    assert(e.getMessage.toLowerCase.contains("amount"))
  }

  test("DROP COLUMN hides data without rewrites; name reuse is barred") {
    spark.sql("CREATE TABLE cmcat.db.t2 (id BIGINT, secret STRING, keep BIGINT)")
    spark.sql("INSERT INTO cmcat.db.t2 SELECT id, concat('s', id), id * 2 FROM range(50)")
    val dir = s"$wh/db/t2"
    val before = dataFiles(dir)
    spark.sql("ALTER TABLE cmcat.db.t2 DROP COLUMN secret")
    assert(dataFiles(dir) == before, "drop must not rewrite any data file")
    assert(spark.table("cmcat.db.t2").columns.toSeq == Seq("id", "keep"))
    assert(spark.sql("SELECT sum(keep) FROM cmcat.db.t2").head().getLong(0) ==
      (0L until 50L).map(_ * 2).sum)
    // re-adding the dropped name would resurrect old bytes -> rejected
    val e1 = intercept[Exception](
      spark.sql("ALTER TABLE cmcat.db.t2 ADD COLUMN secret STRING"))
    assert(e1.getMessage.contains("resurrect"), e1.getMessage)
    // a fresh name is fine
    spark.sql("ALTER TABLE cmcat.db.t2 ADD COLUMN note STRING")
    assert(spark.table("cmcat.db.t2").columns.toSeq == Seq("id", "keep", "note"))
    // DROP IF EXISTS of a missing column is a no-op; plain DROP errors
    // (Spark's analyzer rejects it before the catalog is even consulted)
    spark.sql("ALTER TABLE cmcat.db.t2 DROP COLUMN IF EXISTS ghost")
    val e2 = intercept[Exception](
      spark.sql("ALTER TABLE cmcat.db.t2 DROP COLUMN ghost"))
    assert(e2.getMessage.contains("ghost"))
  }

  test("rename chains keep every historical physical name occupied") {
    spark.sql("CREATE TABLE cmcat.db.t3 (k BIGINT, a BIGINT)")
    spark.sql("INSERT INTO cmcat.db.t3 SELECT id, id + 1 FROM range(10)")
    spark.sql("ALTER TABLE cmcat.db.t3 RENAME COLUMN a TO b")
    spark.sql("INSERT INTO cmcat.db.t3 SELECT id + 10, id + 11 FROM range(10)")
    spark.sql("ALTER TABLE cmcat.db.t3 RENAME COLUMN b TO c")
    // three physical generations (a, b, c) read as logical c
    assert(spark.sql("SELECT sum(c) FROM cmcat.db.t3").head().getLong(0) ==
      (1L to 20L).sum)
    // both historical names are occupied forever
    for (dead <- Seq("a", "b")) {
      val e = intercept[Exception](
        spark.sql(s"ALTER TABLE cmcat.db.t3 ADD COLUMN $dead BIGINT"))
      assert(e.getMessage.contains("resurrect"), s"'$dead': ${e.getMessage}")
    }
    // ...and a rename cannot target them either
    spark.sql("ALTER TABLE cmcat.db.t3 ADD COLUMN fresh BIGINT")
    val e = intercept[Exception](
      spark.sql("ALTER TABLE cmcat.db.t3 RENAME COLUMN fresh TO a"))
    assert(e.getMessage.contains("resurrect"))
  }

  test("hive-partition path columns are immovable") {
    val dir = s"$wh/db/t4"
    spark.range(20).selectExpr("id", "CAST(id % 2 AS STRING) AS part", "id * 3 AS v")
      .write.format("graft").option("partitionby", "part")
      .mode("overwrite").save(dir)
    val e1 = intercept[Exception](
      spark.sql("ALTER TABLE cmcat.db.t4 RENAME COLUMN part TO bucket"))
    assert(e1.getMessage.contains("directory layout"))
    val e2 = intercept[Exception](
      spark.sql("ALTER TABLE cmcat.db.t4 DROP COLUMN part"))
    assert(e2.getMessage.contains("directory layout"))
    // non-partition columns still evolve freely on a partitioned table
    spark.sql("ALTER TABLE cmcat.db.t4 RENAME COLUMN v TO w")
    assert(spark.sql("SELECT sum(w) FROM cmcat.db.t4").head().getLong(0) ==
      (0L until 20L).map(_ * 3).sum)
  }

  test("row-level DML works over renamed columns across generations") {
    spark.sql("CREATE TABLE cmcat.db.t5 (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO cmcat.db.t5 SELECT id, id FROM range(40)")
    spark.sql("ALTER TABLE cmcat.db.t5 RENAME COLUMN v TO score")
    spark.sql("INSERT INTO cmcat.db.t5 SELECT id + 40, id + 40 FROM range(40)")
    // UPDATE touches rows in BOTH generations through the logical name —
    // the per-file rewrite reads single files and must find the mapping
    // by walking up from the file path
    spark.sql("UPDATE cmcat.db.t5 SET score = score + 1000 WHERE k % 10 = 3")
    val got = spark.sql(
      "SELECT count(*) AS n, sum(score) AS s FROM cmcat.db.t5 WHERE score >= 1000")
      .head()
    assert(got.getLong(0) == 8L, s"rows from both generations must update: $got")
    assert(got.getLong(1) == (3L until 80L by 10).map(_ + 1000).sum)
    // DELETE likewise
    spark.sql("DELETE FROM cmcat.db.t5 WHERE score >= 1000")
    assert(spark.sql("SELECT count(*) FROM cmcat.db.t5").head().getLong(0) == 72L)
    // rewritten files now carry the LOGICAL name physically; the rest
    // still resolve via the alias — totals stay exact
    assert(spark.sql("SELECT sum(score) FROM cmcat.db.t5").head().getLong(0) ==
      (0L until 80L).filterNot(_ % 10 == 3).sum)
  }

  test("footer-only agg pushdown resolves renamed columns in old files") {
    spark.sql("CREATE TABLE cmcat.db.t6 (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO cmcat.db.t6 SELECT id, id * 7 FROM range(100)")
    spark.sql("ALTER TABLE cmcat.db.t6 RENAME COLUMN v TO amt")
    val df = spark.sql("SELECT count(amt) AS c, min(amt) AS mn, max(amt) AS mx FROM cmcat.db.t6")
    // plan goes through the footer-only aggregate scan (no filters)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("footer-only aggregate"), s"agg pushdown missing:\n$plan")
    val r = df.head()
    assert(r.getLong(0) == 100L && r.getLong(1) == 0L && r.getLong(2) == 693L)
  }

  test("a never-backed column drops without tombing its name (typo recovery)") {
    spark.sql("CREATE TABLE cmcat.db.t8 (k BIGINT)")
    spark.sql("INSERT INTO cmcat.db.t8 VALUES (1), (2)")
    // ADD a column, never write it, DROP it — the name must stay free
    spark.sql("ALTER TABLE cmcat.db.t8 ADD COLUMN qualty BIGINT") // typo
    spark.sql("ALTER TABLE cmcat.db.t8 DROP COLUMN qualty")
    spark.sql("ALTER TABLE cmcat.db.t8 ADD COLUMN quality BIGINT")
    spark.sql("ALTER TABLE cmcat.db.t8 ADD COLUMN qualty BIGINT") // re-add OK
    assert(spark.table("cmcat.db.t8").columns.toSeq ==
      Seq("k", "quality", "qualty"))
    // a BACKED column stays tombed (the soundness rule)
    spark.sql("INSERT INTO cmcat.db.t8 VALUES (3, 7, 8)")
    spark.sql("ALTER TABLE cmcat.db.t8 DROP COLUMN qualty")
    val e = intercept[Exception](
      spark.sql("ALTER TABLE cmcat.db.t8 ADD COLUMN qualty BIGINT"))
    assert(e.getMessage.contains("resurrect"))
  }

  test("sidecar crash windows recover via tmp promotion (mapping + version log)") {
    spark.sql("CREATE TABLE cmcat.db.t9 (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO cmcat.db.t9 SELECT id, id FROM range(20)")
    spark.sql("ALTER TABLE cmcat.db.t9 RENAME COLUMN v TO w")
    val dir = s"$wh/db/t9"
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    // simulate a publish that crashed between delete and rename: the tmp
    // is the table's SOLE mapping copy — reads must promote it, never
    // silently revert the rename
    val main = new org.apache.hadoop.fs.Path(p, GraftColumnMap.Name)
    val tmp = new org.apache.hadoop.fs.Path(p, s".${GraftColumnMap.Name}.deadbeef.tmp")
    assert(fs.rename(main, tmp))
    assert(GraftColumnMap.forRead(fs, p).physToLogical.get("v").contains("w"),
      "the crash-window tmp must be promoted, not ignored")
    assert(fs.exists(main), "promotion must restore the committed sidecar")
    assert(spark.read.format("graft").load(dir).columns.toSeq == Seq("k", "w"))
    // same for the version log
    val mdir = GraftManifest.dir(p)
    val vmain = new org.apache.hadoop.fs.Path(mdir, GraftVersionLog.Name)
    GraftVersionLog.sync(fs, p)
    val before = GraftVersionLog.commits(GraftVersionLog.sync(fs, p))
    assert(before.nonEmpty)
    val vtmp = new org.apache.hadoop.fs.Path(mdir, s".${GraftVersionLog.Name}.cafebabe.tmp")
    assert(fs.rename(vmain, vtmp))
    assert(GraftVersionLog.commits(GraftVersionLog.sync(fs, p)) == before,
      "version log must recover from its crash-window tmp without renumbering")
  }

  test("sort marker follows renames and truncates at drops") {
    val dir = s"$wh/db/t7"
    spark.range(100).selectExpr("id AS a", "id * 2 AS b", "id * 3 AS c")
      .write.format("graft").option("sortby", "a,b,c")
      .mode("overwrite").save(dir)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    val p = new org.apache.hadoop.fs.Path(dir)
    assert(GraftSortMarker.read(fs, p).contains(Seq("a", "b", "c")))
    spark.sql("ALTER TABLE cmcat.db.t7 RENAME COLUMN a TO a2")
    assert(GraftSortMarker.read(fs, p).contains(Seq("a2", "b", "c")),
      "marker must re-label on rename")
    spark.sql("ALTER TABLE cmcat.db.t7 DROP COLUMN b")
    assert(GraftSortMarker.read(fs, p).contains(Seq("a2")),
      "marker must truncate at a dropped sort key")
  }
}
