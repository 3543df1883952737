package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Metadata-only ALTER COLUMN ... TYPE widening: the sidecar declares the
  * wider type, data files stay immutable, and files written before the
  * ALTER decode through a fill-time widening cast. Soundness hinges on the
  * stats domain being unchanged (GraftSchema.widens), so zone maps and
  * footer aggregates keep working over mixed-width generations.
  */
class TypeWideningSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.catalog.gwiden", "graft.spark.GraftCatalog")
    .config("spark.sql.catalog.gwiden.warehouse", "/tmp/graft-test/widen-wh")
    .getOrCreate()

  private def freshTable(name: String): String = {
    spark.sql(s"DROP TABLE IF EXISTS gwiden.db.$name")
    s"gwiden.db.$name"
  }

  test("int -> bigint widening reads mixed generations exactly, files untouched") {
    val t = freshTable("w1")
    val dir = "/tmp/graft-test/widen-wh/db/w1"
    spark.sql(s"CREATE TABLE $t (k BIGINT, v INT)")
    spark.range(0, 100).selectExpr("id AS k", "CAST(id * 7 AS INT) AS v")
      .writeTo(t).append()
    val filesBefore = GraftUtil.listDataFiles(dir, spark.sessionState.newHadoopConf())
      .map(f => (f.getPath.toString, f.getLen, f.getModificationTime)).toSet
    spark.sql(s"ALTER TABLE $t ALTER COLUMN v TYPE BIGINT")
    assert(GraftUtil.listDataFiles(dir, spark.sessionState.newHadoopConf())
      .map(f => (f.getPath.toString, f.getLen, f.getModificationTime)).toSet == filesBefore,
      "widening must be metadata-only")
    // post-ALTER generation carries genuinely 64-bit values
    spark.range(100, 110).selectExpr("id AS k", "id + 10000000000 AS v")
      .writeTo(t).append()
    val got = spark.table(t).select("k", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val want = (0L until 100L).map(k => (k, k * 7)) ++
      (100L until 110L).map(k => (k, k + 10000000000L))
    assert(got == want, s"mixed-width read wrong: ${got.take(4)} ... ${got.takeRight(2)}")
    assert(spark.table(t).schema("v").dataType ==
      org.apache.spark.sql.types.LongType)
  }

  test("path reads see the declared wide schema (one schema per directory)") {
    val t = freshTable("w2")
    val dir = "/tmp/graft-test/widen-wh/db/w2"
    spark.sql(s"CREATE TABLE $t (k BIGINT, v INT)")
    spark.range(0, 50).selectExpr("id AS k", "CAST(id AS INT) AS v").writeTo(t).append()
    spark.sql(s"ALTER TABLE $t ALTER COLUMN v TYPE BIGINT")
    spark.range(50, 60).selectExpr("id AS k", "id * 1000000000 AS v").writeTo(t).append()
    val df = spark.read.format("graft").load(dir)
    assert(df.schema("v").dataType == org.apache.spark.sql.types.LongType,
      "path reader must apply the declared widening overlay")
    assert(df.agg(sum("v")).collect()(0).getLong(0) ==
      (0L until 50L).sum + (50L until 60L).map(_ * 1000000000L).sum)
  }

  test("zone maps and footer aggregates stay sound over mixed widths") {
    val t = freshTable("w3")
    val dir = "/tmp/graft-test/widen-wh/db/w3"
    spark.sql(s"CREATE TABLE $t (k BIGINT, v INT)")
    spark.range(0, 2000).selectExpr("id AS k", "CAST(id AS INT) AS v")
      .coalesce(1).sortWithinPartitions("v")
      .writeTo(t).option("pagesize", "128").option("sortby", "v").append()
    spark.sql(s"ALTER TABLE $t ALTER COLUMN v TYPE BIGINT")
    spark.range(0, 10).selectExpr("id + 5000 AS k", "id + 6000000000 AS v")
      .writeTo(t).append()
    val df = spark.read.format("graft").load(dir)
    // predicate over the widened column: int-generation pages prune on the
    // shared long stats domain, values exact
    val band = df.filter(col("v").between(100L, 110L))
      .select("v").collect().map(_.getLong(0)).sorted.toSeq
    assert(band == (100L to 110L))
    val wide = df.filter(col("v") > 5000000000L).count()
    assert(wide == 10, "64-bit band must come from the post-ALTER generation")
    // footer-only min/max/count across both generations
    val mm = df.agg(count(lit(1)), min("v"), max("v")).collect()(0)
    assert(mm.getLong(0) == 2010 && mm.getLong(1) == 0L &&
      mm.getLong(2) == 6000000009L, s"footer agg wrong: $mm")
  }

  test("page blooms keep answering equality probes across a widening") {
    // int-lane blooms hash the value AS A LONG at write time, so a probe
    // compiled against the widened BIGINT schema must still hit — a domain
    // mismatch here would silently skip pages holding real matches
    val t = freshTable("wbloom")
    val dir = "/tmp/graft-test/widen-wh/db/wbloom"
    spark.sql(s"CREATE TABLE $t (k BIGINT, v INT)")
    spark.range(0, 4000).selectExpr("id AS k", "CAST(pmod(id * 7919, 100000) AS INT) AS v")
      .coalesce(1)
      .writeTo(t).option("pagesize", "256").option("bloomfilter", "v").append()
    spark.sql(s"ALTER TABLE $t ALTER COLUMN v TYPE BIGINT")
    val df = spark.read.format("graft").load(dir)
    // every probed value must be FOUND (soundness); rough skip sanity via
    // a value that cannot exist
    val probe = (0L until 4000L by 997L).map(k => (k * 7919) % 100000)
    probe.foreach { pv =>
      assert(df.filter(col("v") === pv).count() >= 1,
        s"bloom over the widened column wrongly skipped value $pv")
    }
    assert(df.filter(col("v") === 99999999L).count() == 0)
  }

  test("float -> double and decimal precision growth widen; illegal changes reject") {
    val t = freshTable("w4")
    spark.sql(s"CREATE TABLE $t (k BIGINT, f FLOAT, d DECIMAL(10,2))")
    spark.sql(s"INSERT INTO $t SELECT id, CAST(id AS FLOAT) / 4, CAST(id AS DECIMAL(10,2)) FROM range(40)")
    spark.sql(s"ALTER TABLE $t ALTER COLUMN f TYPE DOUBLE")
    spark.sql(s"ALTER TABLE $t ALTER COLUMN d TYPE DECIMAL(14,2)")
    spark.sql(s"INSERT INTO $t SELECT id, 1e100, CAST(999999999999.25 AS DECIMAL(14,2)) FROM range(40, 42)")
    val r = spark.table(t).agg(sum("f"), sum("d")).collect()(0)
    assert(r.getDouble(0) > 1e100)
    assert(r.getDecimal(1).toString == (
      (0 until 40).map(BigDecimal(_)).sum + BigDecimal("999999999999.25") * 2)
      .setScale(2).toString, s"decimal widen sum wrong: ${r.getDecimal(1)}")
    // rejections: narrowing, cross-class, cross-lane decimal, scale change
    for (bad <- Seq("ALTER COLUMN k TYPE INT", "ALTER COLUMN f TYPE STRING",
        "ALTER COLUMN d TYPE DECIMAL(22,2)", "ALTER COLUMN d TYPE DECIMAL(16,4)")) {
      val e = intercept[Exception] { spark.sql(s"ALTER TABLE $t $bad") }
      assert(e.getMessage.contains("widening") || e.getMessage.contains("widen"),
        s"'$bad' must reject as non-widening: ${e.getMessage.take(120)}")
    }
  }

  test("widening a declared partition column is rejected") {
    val t = freshTable("w5")
    spark.sql(s"CREATE TABLE $t (k BIGINT, p INT) PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO $t SELECT id, CAST(id % 3 AS INT) FROM range(9)")
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $t ALTER COLUMN p TYPE BIGINT")
    }
    assert(e.getMessage.contains("partition column"), e.getMessage)
  }

  test("DML and compaction work over mixed-width generations") {
    val t = freshTable("w6")
    val dir = "/tmp/graft-test/widen-wh/db/w6"
    spark.sql(s"CREATE TABLE $t (k BIGINT, v INT)")
    spark.range(0, 100).selectExpr("id AS k", "CAST(id AS INT) AS v").writeTo(t).append()
    spark.sql(s"ALTER TABLE $t ALTER COLUMN v TYPE BIGINT")
    spark.range(100, 120).selectExpr("id AS k", "id + 8000000000 AS v").writeTo(t).append()
    GraftMaintenance.deleteWhere(spark, dir, col("v") < 10,
      schemaOverride = Some(spark.table(t).schema))
    assert(spark.table(t).count() == 110)
    GraftMaintenance.compact(spark, dir, targetFiles = 1)
    // post-compaction files carry the wide type natively
    val vs = spark.table(t).select("v").collect().map(_.getLong(0)).sorted.toSeq
    assert(vs == ((10L until 100L) ++ (100L until 120L).map(_ + 8000000000L)))
  }
}
