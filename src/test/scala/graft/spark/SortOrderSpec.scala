package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `_graft_sort` marker + SupportsReportOrdering: a table whose every file
  * is internally sorted reports that ordering per split, and Spark plans
  * away the local sorts downstream operators would re-impose. The marker
  * must be conservative: any commit that cannot guarantee whole-table
  * order clears it.
  */
class SortOrderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rm(dir: String): Unit =
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))

  private def sortNodes(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.SortExec => s
    }.size

  test("sortby write publishes the marker; local sort on the key is planned away") {
    val dir = "/tmp/graft-test/sort-order"
    rm(dir)
    spark.range(50000).selectExpr("cast(hash(id) as bigint) AS noise", "id AS k", "id*3 AS v")
      .orderBy("noise").drop("noise").repartition(4)
      .write.format("graft").option("sortby", "k").mode("overwrite").save(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(GraftSortMarker.read(fs, new org.apache.hadoop.fs.Path(dir))
      .contains(Seq("k")), "sortby overwrite must publish the sort marker")

    val sorted = spark.read.format("graft").load(dir).sortWithinPartitions("k")
    assert(sortNodes(sorted) == 0,
      s"local sort on the marker column should be eliminated:\n${sorted.queryExecution.explainString(FormattedMode)}")
    // the data really is sorted per partition (the claim must be true, not
    // just believed): count out-of-order adjacent pairs inside each split
    val violations = spark.read.format("graft").load(dir).select("k")
      .mapPartitions { it =>
        var prev = Long.MinValue; var bad = 0L
        it.foreach { r => val k = r.getLong(0); if (k < prev) bad += 1; prev = k }
        Iterator.single(bad)
      }(org.apache.spark.sql.Encoders.scalaLong).collect().sum
    assert(violations == 0L, s"$violations out-of-order rows in 'sorted' splits")
  }

  test("unsorted append clears the marker; sorts come back") {
    val dir = "/tmp/graft-test/sort-order-append"
    rm(dir)
    spark.range(10000).selectExpr("id AS k", "id*3 AS v").repartition(2)
      .write.format("graft").option("sortby", "k").mode("overwrite").save(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val root = new org.apache.hadoop.fs.Path(dir)
    assert(GraftSortMarker.read(fs, root).contains(Seq("k")))
    // identically-sorted append EXTENDS the guarantee
    spark.range(10000, 12000).selectExpr("id AS k", "id*3 AS v").coalesce(1)
      .write.format("graft").option("sortby", "k").mode("append").save(dir)
    assert(GraftSortMarker.read(fs, root).contains(Seq("k")),
      "matching sorted append must keep the marker")
    // unsorted append KILLS it
    spark.range(12000, 12500).selectExpr("id AS k", "id*3 AS v").coalesce(1)
      .write.format("graft").mode("append").save(dir)
    assert(GraftSortMarker.read(fs, root).isEmpty,
      "unsorted append must clear the marker")
    val sorted = spark.read.format("graft").load(dir).sortWithinPartitions("k")
    assert(sortNodes(sorted) == 1, "with the marker gone the local sort must stay")
  }

  test("ordering is a projected prefix: pruning the lead column drops the claim") {
    val dir = "/tmp/graft-test/sort-order-prefix"
    rm(dir)
    spark.range(10000).selectExpr("id AS k", "id % 7 AS v").repartition(2)
      .write.format("graft").option("sortby", "k,v").mode("overwrite").save(dir)
    // (k, v) marker, k projected away -> no ordering claim on v alone
    val vOnly = spark.read.format("graft").load(dir).select("v").sortWithinPartitions("v")
    assert(sortNodes(vOnly) == 1,
      "v is not sorted without k — ordering must not be claimed past a pruned lead column")
    // prefix (k) alone still holds under pruning of v
    val kOnly = spark.read.format("graft").load(dir).select("k").sortWithinPartitions("k")
    assert(sortNodes(kOnly) == 0)
  }

  test("top-n pushdown: ORDER BY+LIMIT on a sorted table plans leading pages per file") {
    val dir = "/tmp/graft-test/sort-order-topn"
    rm(dir)
    spark.range(100000).selectExpr("id AS k", "id * 3 AS v").repartition(8)
      .write.format("graft").option("sortby", "k").mode("overwrite").save(dir)
    def scanDesc(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan.description()
      }.mkString("\n")
    val q = spark.read.format("graft").load(dir).orderBy("k").limit(7)
    assert(scanDesc(q).contains("topn=7"),
      s"expected the top-n prefix plan in the scan:\n${scanDesc(q)}")
    assert(q.collect().map(_.getLong(0)).toSeq == (0L until 7L),
      "retained TopN must produce the exact global smallest rows")
    // descending ("latest N"): trailing pages per file (+ leading for
    // potential null padding) — pushed and exact
    val qd = spark.read.format("graft").load(dir).orderBy(col("k").desc).limit(3)
    assert(scanDesc(qd).contains("topn=3 desc"),
      s"expected the descending prefix plan:\n${scanDesc(qd)}")
    assert(qd.collect().map(_.getLong(0)).toSeq == Seq(99999L, 99998L, 99997L))
    // nulls rank into a desc answer when non-null rows run short: a table
    // with 2 non-null and mostly-null keys must still answer LIMIT 4
    val nd = "/tmp/graft-test/sort-order-topn-nulls"
    rm(nd)
    spark.range(20000)
      .selectExpr("CASE WHEN id >= 19998 THEN id ELSE NULL END AS k", "id AS v")
      .repartition(2)
      .write.format("graft").option("sortby", "k").mode("overwrite").save(nd)
    val qn = spark.read.format("graft").load(nd).select("k")
      .orderBy(col("k").desc).limit(4)
    val got = qn.collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).toSeq
    assert(scanDesc(qn).contains("desc"))
    assert(got.take(2) == Seq(19999L, 19998L) && got.drop(2) == Seq(-1L, -1L),
      s"desc top-4 must pad with nulls after the 2 non-null keys: $got")
    // multi-column desc with NULLS FIRST on the secondary column: the
    // null rows of a leading-column group sit at the GROUP's head —
    // mid-file, outside both planned ends — so this must NOT be pushed
    // (and must still answer correctly through the ordinary plan)
    val md = "/tmp/graft-test/sort-order-topn-multidesc"
    rm(md)
    spark.range(10000)
      .selectExpr("id DIV 2500 AS k",
        "CASE WHEN id % 2500 = 0 THEN NULL ELSE id END AS v")
      .repartition(4)
      .write.format("graft").option("sortby", "k,v").mode("overwrite").save(md)
    val qm = spark.read.format("graft").load(md)
      .orderBy(col("k").desc, col("v").desc_nulls_first).limit(1)
    assert(!scanDesc(qm).contains("topn="),
      "NULLS FIRST on a secondary desc column must decline the prefix plan")
    val top = qm.collect().head
    assert(top.getLong(0) == 3L && top.isNullAt(1),
      s"expected the k=3 group's null-v head row, got $top")
    // unsorted table: no marker, no prefix plan
    val flat = "/tmp/graft-test/sort-order-topn-flat"
    rm(flat)
    spark.range(1000).selectExpr("id AS k").repartition(2)
      .write.format("graft").mode("overwrite").save(flat)
    val qf = spark.read.format("graft").load(flat).orderBy("k").limit(3)
    assert(!scanDesc(qf).contains("topn="))
    assert(qf.collect().map(_.getLong(0)).toSeq == (0L until 3L))
  }

  test("compaction with sortby republishes the marker over the rewrite") {
    val dir = "/tmp/graft-test/sort-order-compact"
    rm(dir)
    spark.range(20000).selectExpr("cast(hash(id) as bigint) AS noise", "id AS k")
      .orderBy("noise").drop("noise").repartition(8)
      .write.format("graft").mode("overwrite").save(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val root = new org.apache.hadoop.fs.Path(dir)
    assert(GraftSortMarker.read(fs, root).isEmpty)
    GraftMaintenance.compact(spark, dir, targetFiles = 2,
      extraWriteOptions = Map("sortby" -> "k"))
    assert(GraftSortMarker.read(fs, root).contains(Seq("k")),
      "sorted compaction must leave the whole-table sort marker")
    val sorted = spark.read.format("graft").load(dir).sortWithinPartitions("k")
    assert(sortNodes(sorted) == 0)
  }

  test("declared sort order at CREATE TABLE survives SQL-only INSERT INTO") {
    val wh = "/tmp/graft-test/sort-order-wh"
    rm(wh)
    spark.conf.set("spark.sql.catalog.gsort", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gsort.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsort.db")
    spark.sql("CREATE TABLE gsort.db.t (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.sortby'='k')")
    // two pure-SQL inserts — neither can pass a write option, so without
    // the declared intent the first would never publish the marker and
    // the second would clear it
    spark.sql("INSERT INTO gsort.db.t SELECT cast(hash(id) % 100000 AS BIGINT), id FROM range(20000)")
    spark.sql("INSERT INTO gsort.db.t SELECT cast(hash(id + 7) % 100000 AS BIGINT), id FROM range(20000)")
    val dir = s"$wh/db/t"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(GraftSortMarker.read(fs, new org.apache.hadoop.fs.Path(dir))
      .contains(Seq("k")),
      "INSERT INTO a declared-sort table must keep the whole-table marker")
    // ...and the ORDER-BY-prefix top-N still plans page covers
    def scanDesc(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan.description()
      }.mkString("\n")
    val q = spark.sql("SELECT k FROM gsort.db.t ORDER BY k LIMIT 5")
    assert(scanDesc(q).contains("topn=5"),
      s"declared-sort table must keep the top-N prefix plan:\n${scanDesc(q)}")
    val viaSql = q.collect().map(_.getLong(0)).toSeq
    val exact = spark.read.format("graft").load(dir)
      .select("k").collect().map(_.getLong(0)).sorted.take(5).toSeq
    assert(viaSql == exact)
    // an explicit conflicting per-write option fails loudly
    val ex = intercept[Exception] {
      spark.range(5).selectExpr("id AS k", "id AS v")
        .writeTo("gsort.db.t").option("sortby", "v").append()
    }
    def causes(e: Throwable): Seq[String] =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(c => Option(c.getMessage).getOrElse("")).toSeq
    assert(causes(ex).exists(_.contains("conflicts with the table's declared sortby")),
      s"got: ${causes(ex)}")
  }
}
