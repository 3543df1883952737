package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AggPushdownSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def scanDesc(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")

  test("count/min/max answered from footers only") {
    val dir = "/tmp/graft-test/aggpush"
    spark.sql("""SELECT id AS k, cast(id AS DOUBLE) / 3 AS d,
        timestamp_millis(1700000000000 + id * 1000) AS ts,
        CASE WHEN id % 10 = 0 THEN NULL ELSE id * 2 END AS v,
        concat('s', id) AS name
      FROM range(100000)""")
      .coalesce(2).write.format("graft").mode("overwrite").save(dir)

    val g = spark.read.format("graft").load(dir)
    val agg = g.agg(count(lit(1)).as("n"), min(col("k")).as("mink"),
      max(col("k")).as("maxk"), count(col("v")).as("nv"),
      min(col("d")).as("mind"), max(col("ts")).as("maxts"))

    assert(scanDesc(agg).contains("footer-only aggregate"),
      s"expected footer-only scan, got:\n${scanDesc(agg)}")

    val r = agg.head()
    assert(r.getLong(0) == 100000L)
    assert(r.getLong(1) == 0L)
    assert(r.getLong(2) == 99999L)
    assert(r.getLong(3) == 90000L) // every 10th v is null
    assert(r.getDouble(4) == 0.0)
    assert(r.getTimestamp(5).getTime == 1700000000000L + 99999L * 1000)
  }

  test("GROUP BY partition columns answered from footers + paths only") {
    val dir = "/tmp/graft-test/aggpush-grouped"
    spark.sql("""SELECT id, id % 4 AS bucket,
        concat('p', cast(id % 3 AS string)) AS part,
        CASE WHEN id % 7 = 0 THEN NULL ELSE id * 2 END AS v
      FROM range(90000)""")
      .write.format("graft").option("partitionby", "part")
      .option("maxrowsperfile", "20000")
      .mode("overwrite").save(dir)
    val g = spark.read.format("graft").load(dir)

    val agg = g.groupBy(col("part"))
      .agg(count(lit(1)).as("n"), count(col("v")).as("nv"),
        min(col("id")).as("mini"), max(col("id")).as("maxi"))
      .orderBy(col("part"))
    assert(scanDesc(agg).contains("grouped by part"),
      s"expected partition-grouped footer-only scan, got:\n${scanDesc(agg)}")
    GraftMetrics.pageGroupsRead.set(0)
    val rows = agg.collect()
    assert(GraftMetrics.pageGroupsRead.get() == 0, "grouped agg read data pages")
    val expected = spark.sql("""SELECT concat('p', cast(id % 3 AS string)) AS part,
        count(*) AS n, count(CASE WHEN id % 7 = 0 THEN NULL ELSE id * 2 END) AS nv,
        min(id) AS mini, max(id) AS maxi
      FROM range(90000) GROUP BY 1 ORDER BY 1""").collect()
    assert(rows.map(_.toString).toSeq == expected.map(_.toString).toSeq)

    // a NON-partition group column must fall back to a normal scan and
    // stay correct
    val byBucket = g.groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"))
    assert(!scanDesc(byBucket).contains("footer-only"),
      s"non-partition group-by must not push:\n${scanDesc(byBucket)}")
    assert(byBucket.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      (0L to 3L).map(b => (b, 90000L / 4)))

    // grouped + filter must not push either (hadFilters gate)
    val filtered = g.filter(col("id") > 100).groupBy(col("part")).agg(count(lit(1)))
    assert(!scanDesc(filtered).contains("footer-only"))
  }

  test("GROUP BY on a partition column with null values bails out safely") {
    // a null value in an integral partition column lands on disk as the
    // hive null token; partitionSegments unescapes it back to Scala null,
    // so the grouped pushdown must bail on null (not the literal sentinel)
    // or pathValue would NPE on null.toLong in the executor
    val dir = "/tmp/graft-test/aggpush-nullpart"
    spark.sql("""SELECT id, CASE WHEN id % 3 = 0 THEN NULL ELSE id % 3 END AS pk
      FROM range(9000)""")
      .write.format("graft").option("partitionby", "pk")
      .mode("overwrite").save(dir)
    val g = spark.read.format("graft").load(dir)
    val agg = g.groupBy(col("pk"))
      .agg(count(lit(1)).as("n"), max(col("id")).as("maxi"))
      .orderBy(col("pk"))
    assert(!scanDesc(agg).contains("grouped by"),
      s"null partition value must not push grouped agg:\n${scanDesc(agg)}")
    val rows = agg.collect().map(r =>
      (if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = spark.sql("""SELECT CASE WHEN id % 3 = 0 THEN NULL ELSE id % 3 END AS pk,
        count(*) AS n, max(id) AS maxi FROM range(9000) GROUP BY 1 ORDER BY 1""")
      .collect().map(r =>
        (if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == expected.toSeq)
  }

  test("nested struct sub-field min/max answered from footers only") {
    val dir = "/tmp/graft-test/aggpush-nested"
    spark.sql("""SELECT id, named_struct('a', id * 3,
        'inner', named_struct('x', CASE WHEN id % 4 = 0 THEN NULL ELSE cast(id AS DOUBLE) / 2 END)) AS s
      FROM range(50000)""")
      .coalesce(2).write.format("graft").mode("overwrite").save(dir)
    val g = spark.read.format("graft").load(dir)
    val agg = g.agg(min(col("s.a")).as("mina"), max(col("s.a")).as("maxa"),
      count(col("s.inner.x")).as("nx"), max(col("s.inner.x")).as("maxx"))
    assert(scanDesc(agg).contains("footer-only aggregate"),
      s"nested agg should push to footers:\n${scanDesc(agg)}")
    val r = agg.head()
    assert(r.getLong(0) == 0L && r.getLong(1) == 49999L * 3)
    assert(r.getLong(2) == 50000L - 12500L)
    assert(r.getDouble(3) == 49999.0 / 2)
  }

  test("footer min/max respect Spark NaN semantics") {
    val dir = "/tmp/graft-test/aggpush-nan"
    spark.range(10000).selectExpr(
        "CASE WHEN id % 17 = 0 THEN cast('NaN' AS DOUBLE) ELSE cast(id AS DOUBLE) / 7 END AS d",
        "cast('NaN' AS DOUBLE) AS allnan")
      .coalesce(1).write.format("graft").mode("overwrite").save(dir)
    val g = spark.read.format("graft").load(dir)
    val agg = g.agg(min(col("d")).as("mind"), max(col("d")).as("maxd"),
      min(col("allnan")).as("minn"), max(col("allnan")).as("maxn"))
    assert(scanDesc(agg).contains("footer-only aggregate"),
      s"expected footer-only scan, got:\n${scanDesc(agg)}")
    val r = agg.head()
    assert(r.getDouble(0) == 1.0 / 7) // id=0 is NaN, min over finite values
    assert(r.getDouble(1).isNaN)      // Spark max over a set containing NaN is NaN
    assert(r.getDouble(2).isNaN)
    assert(r.getDouble(3).isNaN)
  }

  test("aggregate with filter or string min does NOT get pushed, stays correct") {
    val dir = "/tmp/graft-test/aggpush"
    val g = spark.read.format("graft").load(dir)

    val filtered = g.filter(col("k") < 100).agg(count(lit(1)))
    assert(!scanDesc(filtered).contains("footer-only"))
    assert(filtered.head().getLong(0) == 100L)

    val strMin = g.agg(min(col("name")))
    assert(!scanDesc(strMin).contains("footer-only"))
    assert(strMin.head().getString(0) == "s0")

    val grouped = g.groupBy(col("k") % 2).agg(count(lit(1)))
    assert(!scanDesc(grouped).contains("footer-only"))
    assert(grouped.count() == 2)
  }
}
