package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The graft conversion cache must be keyed by a fingerprint of the source
  * listing: regenerated testdata (same path, new bytes) has to invalidate a
  * warm machine's stale `.graft` conversion, or the engine would serve old
  * data against a fresh oracle (the round-8 near-miss).
  */
class TablesCacheSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("regenerating a source table invalidates the cached conversion") {
    val dir = new java.io.File("/tmp/graft-test/tables-cache-src")
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    dir.mkdirs()
    val sfDir = dir.getAbsolutePath

    spark.range(100).selectExpr("id", "id * 2 AS v")
      .coalesce(1).write.mode("overwrite").parquet(s"$sfDir/demo.parquet")
    assert(Tables.load(spark, sfDir, "demo").count() == 100)

    // regenerate in place: same path, different contents (and ensure the
    // mtime moves even on coarse-grained filesystems)
    spark.range(250).selectExpr("id", "id * 3 AS v")
      .coalesce(1).write.mode("overwrite").parquet(s"$sfDir/demo.parquet")
    val bump = System.currentTimeMillis() + 5000
    dir.listFiles().foreach(f => { f.setLastModified(bump);
      Option(f.listFiles()).toSeq.flatten.foreach(_.setLastModified(bump)) })

    // a path-only cache key would still serve the stale 100-row conversion
    assert(Tables.load(spark, sfDir, "demo").count() == 250,
      "stale graft conversion served after the source was regenerated")
  }

  test("fingerprint changes when file length or mtime changes") {
    val dir = new java.io.File("/tmp/graft-test/tables-fp")
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    dir.mkdirs()
    val f = new java.io.File(dir, "a.bin")
    java.nio.file.Files.writeString(f.toPath, "abc")
    val fp1 = Tables.fingerprint(dir.getAbsolutePath)
    java.nio.file.Files.writeString(f.toPath, "abcd")
    val fp2 = Tables.fingerprint(dir.getAbsolutePath)
    assert(fp1 != fp2, "length change not reflected in fingerprint")
    f.setLastModified(f.lastModified() + 60000)
    val fp3 = Tables.fingerprint(dir.getAbsolutePath)
    assert(fp2 != fp3, "mtime change not reflected in fingerprint")
  }
}
