package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-partitioned joins: two graft tables hive-partitioned on the
  * same key report KeyGroupedPartitioning, so the join (and a GROUP BY on
  * the partition key) runs with NO shuffle — the co-located-join layout a
  * 100 TB deployment buys by partitioning fact tables on the join key.
  * AQE off + broadcast off so the physical plan shows exactly what the
  * scan's reported partitioning bought.
  */
class StoragePartitionedJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.sources.v2.bucketing.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.sql.catalog.spj", "graft.spark.GraftCatalog")
    .config("spark.sql.catalog.spj.warehouse", "/tmp/graft-test/spj-wh")
    .getOrCreate()

  private def rm(p: String): Unit =
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect { case s: ShuffleExchangeExec => s }.size

  private val dirA = "/tmp/graft-test/spj-a"
  private val dirB = "/tmp/graft-test/spj-b"

  private def stage(): Unit = {
    if (new java.io.File(s"$dirA/_SPJ_STAGED").exists()) return
    rm(dirA); rm(dirB)
    spark.range(0, 400)
      .select((col("id") % 8).cast("int").as("k"), col("id").as("va"))
      .write.format("graft").option("partitionby", "k").mode("overwrite").save(dirA)
    spark.range(0, 160)
      .select((col("id") % 8).cast("int").as("k"), (col("id") * 10).as("vb"))
      .write.format("graft").option("partitionby", "k").mode("overwrite").save(dirB)
    new java.io.File(s"$dirA/_SPJ_STAGED").createNewFile()
  }

  test("co-partitioned join runs with zero shuffles") {
    stage()
    val a = spark.read.format("graft").load(dirA)
    val b = spark.read.format("graft").load(dirB)
    val joined = a.join(b, "k")
    assert(shuffles(joined) == 0,
      s"expected shuffle-free SPJ plan:\n${joined.queryExecution.executedPlan}")
    // correctness vs the shuffled plan (bucketing off via fresh views)
    assert(joined.count() == 400L / 8 * (160L / 8) * 8)
    val agg = joined.groupBy("k").agg(sum(col("va") + col("vb")).as("s"))
      .orderBy("k").collect()
    assert(agg.length == 8)
  }

  test("GROUP BY the partition key needs no shuffle") {
    stage()
    val a = spark.read.format("graft").load(dirA)
    val grouped = a.groupBy("k").agg(sum("va").as("s"), count(lit(1)).as("n"))
    assert(shuffles(grouped) == 0,
      s"expected shuffle-free agg plan:\n${grouped.queryExecution.executedPlan}")
    val got = grouped.orderBy("k").collect()
    assert(got.length == 8 && got.map(_.getLong(2)).sum == 400L)
    assert(got.map(_.getLong(1)).sum == (0L until 400L).sum)
  }

  test("bucketing off: same results through the ordinary shuffled plan") {
    stage()
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    try {
      val a = spark.read.format("graft").load(dirA)
      val b = spark.read.format("graft").load(dirB)
      val joined = a.join(b, "k")
      assert(shuffles(joined) > 0, "without v2 bucketing the join must shuffle")
      assert(joined.count() == 400L / 8 * (160L / 8) * 8)
    } finally spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
  }

  test("null partition values group correctly (no shuffle, null key kept)") {
    val dir = "/tmp/graft-test/spj-null"
    rm(dir)
    spark.range(0, 60)
      .select(when(col("id") % 3 === 0, lit(null))
        .otherwise((col("id") % 3).cast("int")).as("k"), col("id").as("v"))
      .write.format("graft").option("partitionby", "k").mode("overwrite").save(dir)
    val grouped = spark.read.format("graft").load(dir)
      .groupBy("k").agg(count(lit(1)).as("n"))
    assert(shuffles(grouped) == 0,
      s"expected shuffle-free agg plan:\n${grouped.queryExecution.executedPlan}")
    val got = grouped.collect().map(r =>
      (if (r.isNullAt(0)) -1 else r.getInt(0)) -> r.getLong(1)).toMap
    assert(got == Map(-1 -> 20L, 1 -> 20L, 2 -> 20L))
  }

  test("filters compose with SPJ: partition pruning shrinks the key set, " +
      "data filters apply inside keyed partitions") {
    stage()
    val a = spark.read.format("graft").load(dirA)
    val b = spark.read.format("graft").load(dirB)
    // partition-column filter: directories pruned BEFORE planning, join
    // still shuffle-free over the surviving keys
    val filtered = a.filter(col("k") < 4).join(b.filter(col("k") < 4), "k")
    assert(shuffles(filtered) == 0,
      s"expected shuffle-free filtered SPJ plan:\n${filtered.queryExecution.executedPlan}")
    assert(filtered.count() == 400L / 8 * (160L / 8) * 4)
    // non-partition data filter runs inside the keyed partitions
    val dataFiltered = a.filter(col("va") % 2 === 0).join(b, "k")
      .groupBy("k").agg(count(lit(1)).as("n"))
    assert(shuffles(dataFiltered) == 0)
    assert(dataFiltered.collect().map(_.getLong(1)).sum == 200L * (160L / 8))
  }

  test("bucketed-sorted layout: SPJ join with neither shuffle NOR sort") {
    // single file per partition value + sortby marker = the
    // bucketed-sorted-table layout: KeyGroupedPartitioning removes the
    // exchanges, SupportsReportOrdering removes the SMJ's local sorts —
    // at 100 TB this join touches the wire exactly zero times and never
    // re-sorts what storage already sorted
    val sa = "/tmp/graft-test/spj-sorted-a"
    val sb = "/tmp/graft-test/spj-sorted-b"
    rm(sa); rm(sb)
    spark.range(0, 400)
      .select((col("id") % 8).cast("int").as("k"), col("id").as("va"))
      .repartition(col("k"))
      .write.format("graft")
      .option("partitionby", "k").option("sortby", "k")
      .mode("overwrite").save(sa)
    spark.range(0, 160)
      .select((col("id") % 8).cast("int").as("k"), (col("id") * 10).as("vb"))
      .repartition(col("k"))
      .write.format("graft")
      .option("partitionby", "k").option("sortby", "k")
      .mode("overwrite").save(sb)
    val conf = spark.sessionState.newHadoopConf()
    Seq(sa, sb).foreach { d =>
      val byDir = GraftUtil.listDataFiles(d, conf)
        .groupBy(_.getPath.getParent.toString)
      assert(byDir.values.forall(_.size == 1),
        s"staging must produce one file per partition dir: $byDir")
    }
    val a = spark.read.format("graft").load(sa)
    val b = spark.read.format("graft").load(sb)
    val joined = a.join(b, "k")
    val plan = joined.queryExecution.executedPlan
    assert(shuffles(joined) == 0, s"expected shuffle-free plan:\n$plan")
    val sorts = plan.collect { case s: org.apache.spark.sql.execution.SortExec => s }.size
    assert(sorts == 0, s"expected sort-free SMJ over the sorted marker:\n$plan")
    assert(joined.count() == 400L / 8 * (160L / 8) * 8)
  }

  test("bucket-transform tables join with zero shuffles (catalog SPJ)") {
    // the TRANSFORM extension of SPJ: two catalog tables bucketed
    // identically on the join key report bucket(8, id) in their
    // KeyGroupedPartitioning; the catalog's FunctionCatalog resolves the
    // transform and the join plans with NO exchange on either side — the
    // lay-out-once, join-shuffle-free-forever shape a 100 TB fact-fact
    // join wants
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File("/tmp/graft-test/spj-wh"))
    spark.sql("CREATE TABLE spj.ta (id BIGINT, va BIGINT) " +
      "PARTITIONED BY (bucket(8, id))")
    spark.sql("INSERT INTO spj.ta SELECT id, id * 2 FROM range(400)")
    spark.sql("CREATE TABLE spj.tb (id BIGINT, vb BIGINT) " +
      "PARTITIONED BY (bucket(8, id))")
    spark.sql("INSERT INTO spj.tb SELECT id, id * 10 FROM range(0, 400, 2)")
    val joined = spark.table("spj.ta").join(spark.table("spj.tb"), "id")
    assert(shuffles(joined) == 0,
      s"expected shuffle-free bucket SPJ plan:\n${joined.queryExecution.executedPlan}")
    assert(joined.count() == 200)
    // values, not just counts
    assert(joined.filter(col("vb") =!= col("id") * 10).count() == 0)
    // a days(ts) layout SPJ-groups too (grouping on the source column
    // can't elide the shuffle — the transform key is coarser — but the
    // scan still plans keyed partitions and stays correct)
    spark.sql("CREATE TABLE spj.ev (id BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    spark.sql("INSERT INTO spj.ev SELECT id, " +
      "timestamp'2026-05-01 00:00:00' + make_dt_interval(CAST(id % 4 AS INT), 0, 0, 0) " +
      "FROM range(40)")
    assert(spark.table("spj.ev").groupBy(col("ts")).count().count() == 4)
  }

  test("bucket SPJ stays exact when one side is missing buckets") {
    // a small batch often occupies a subset of the buckets; Spark aligns
    // the two sides' key sets (pushPartValues) — the join must stay
    // shuffle-free AND exact, inner and outer
    spark.sql("CREATE TABLE spj.miss_a (id BIGINT, va BIGINT) " +
      "PARTITIONED BY (bucket(8, id))")
    spark.sql("INSERT INTO spj.miss_a SELECT id, id FROM range(10)")
    spark.sql("CREATE TABLE spj.miss_b (id BIGINT, vb BIGINT) " +
      "PARTITIONED BY (bucket(8, id))")
    spark.sql("INSERT INTO spj.miss_b SELECT id, id * 10 FROM range(400)")
    val a = spark.table("spj.miss_a"); val b = spark.table("spj.miss_b")
    val inner = a.join(b, "id")
    assert(shuffles(inner) == 0,
      s"mismatched key sets must still SPJ:\n${inner.queryExecution.executedPlan}")
    assert(inner.count() == 10)
    assert(a.join(b, Seq("id"), "full_outer").count() == 400)
  }

  test("unpartitioned tables keep ordinary page-range planning") {
    val dir = "/tmp/graft-test/spj-flat"
    rm(dir)
    spark.range(0, 100).selectExpr("id AS k", "id AS v")
      .write.format("graft").mode("overwrite").save(dir)
    val df = spark.read.format("graft").load(dir)
    assert(df.count() == 100) // plans through GraftInputPartition unchanged
    val grouped = df.groupBy("k").agg(count(lit(1)))
    assert(shuffles(grouped) > 0, "an unpartitioned scan cannot promise clustering")
  }
}
