package graft.spark

import graft.format.{FormatConstants, GraftFileReader, KmvUtil}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Footer KMV ndv-synopsis (format v004) contract:
  *
  *  - synopsis-bearing files declare GRAFT004; plain files keep the old
  *    magic byte-for-byte (a v2/v3 reader never sees a v4 section);
  *  - the per-leaf sketch is the k smallest distinct portable hashes,
  *    sorted, with the write-time k persisted;
  *  - GraftNdv answers exactly (unfilled sketch) or within KMV error
  *    (filled), from footers only — and multi-file merge equals the
  *    single-file sketch of the same rows;
  *  - unsupported types and nested paths are rejected at plan time;
  *  - a v4 file scans normally (data pages are untouched by the feature).
  */
class NdvSynopsisSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshDir(name: String): String = {
    val d = s"/tmp/graft-test/ndv-$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    d
  }

  private def magicOf(f: java.io.File): String = {
    val in = new java.io.FileInputStream(f)
    try { val b = new Array[Byte](8); in.read(b); new String(b, "UTF-8") }
    finally in.close()
  }

  private def graftFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".graft")).toSeq.sortBy(_.getName)

  test("synopsis files declare v004, sketch is sorted distinct hashes with k persisted") {
    import spark.implicits._
    val dir = freshDir("v4")
    (1L to 600L).map(i => (i, s"s${i % 7}")).toDF("id", "src")
      .coalesce(1).write.format("graft")
      .option("ndvsketch", "id,src").mode("overwrite").save(dir)
    val fs = graftFiles(dir)
    assert(fs.nonEmpty)
    fs.foreach(f => assert(magicOf(f) == "GRAFT004"))
    val in = new graft.format.LocalFileInput(fs.head.toPath)
    val footer = GraftFileReader.readFooter(in)
    val idMeta = footer.leaves(0)
    assert(idMeta.kmv != null && idMeta.kmvK == 256)
    assert(idMeta.kmv.length == 256, "600 distinct ids must fill a k=256 sketch")
    assert(idMeta.kmv.toSeq == idMeta.kmv.toSeq.sorted && idMeta.kmv.toSet.size == 256)
    // the sketch IS the 256 smallest hashes of the actual values
    val expect = (1L to 600L).map(KmvUtil.hashLong).toSet.toSeq.sorted.take(256)
    assert(idMeta.kmv.toSeq == expect)
    val srcMeta = footer.leaves(1)
    assert(srcMeta.kmv != null && srcMeta.kmv.length == 7, "7 distinct sources -> unfilled exact set")
  }

  test("plain writes keep the old magic; their footers carry no synopsis") {
    import spark.implicits._
    val dir = freshDir("plain")
    (1L to 50L).map(i => (i, s"v$i")).toDF("id", "v")
      .coalesce(1).write.format("graft").mode("overwrite").save(dir)
    graftFiles(dir).foreach(f => assert(magicOf(f) == "GRAFT002"))
    val footer = GraftFileReader.readFooter(new graft.format.LocalFileInput(graftFiles(dir).head.toPath))
    assert(footer.leaves.forall(_.kmv == null))
  }

  test("GraftNdv: exact on unfilled sets, within KMV error when filled; merge = single-file") {
    import spark.implicits._
    val rows = (1L to 2000L).map(i => (i, s"g${i % 13}"))
    val multi = freshDir("multi"); val single = freshDir("single")
    rows.toDF("id", "grp").repartition(4).write.format("graft")
      .option("ndvsketch", "id,grp").mode("overwrite").save(multi)
    rows.toDF("id", "grp").coalesce(1).write.format("graft")
      .option("ndvsketch", "id,grp").mode("overwrite").save(single)
    assert(graftFiles(multi).size > 1)
    val m = GraftNdv.estimate(spark, multi, Seq("id", "grp")).map(s => s.column -> s).toMap
    val s1 = GraftNdv.estimate(spark, single, Seq("id", "grp")).map(s => s.column -> s).toMap
    assert(m("grp").kth == -1L && m("grp").estimate == 13.0, "unfilled sketch must be exact")
    assert(m("id").nHashes == 256 && m("id").kth > 0)
    val relErr = math.abs(m("id").estimate - 2000.0) / 2000.0
    assert(relErr < 0.2, s"KMV estimate ${m("id").estimate} off by ${relErr * 100}%")
    // associative merge: the union's k-min equals the single-file sketch
    assert(m("id").kth == s1("id").kth && m("id").estimate == s1("id").estimate)
    assert(m("grp").estimate == s1("grp").estimate)
  }

  test("unsupported types and nested paths are rejected at plan time") {
    import spark.implicits._
    val dir = freshDir("reject")
    val e1 = intercept[Exception] {
      Seq((1L, 2.5)).toDF("id", "x").write.format("graft")
        .option("ndvsketch", "x").mode("overwrite").save(dir)
    }
    assert(e1.getMessage.contains("portable synopsis rendering"))
    val e2 = intercept[Exception] {
      Seq((1L, Seq("a"))).toDF("id", "arr").write.format("graft")
        .option("ndvsketch", "arr.element").mode("overwrite").save(dir)
    }
    assert(e2.getMessage.contains("top-level"))
  }

  test("compaction re-applies the synopsis via extraWriteOptions; plain compact drops it") {
    import spark.implicits._
    val dir = freshDir("compact")
    (1L to 1200L).map(i => (i, s"s${i % 5}")).toDF("id", "src")
      .repartition(6).write.format("graft")
      .option("ndvsketch", "id").mode("overwrite").save(dir)
    val before = GraftNdv.estimate(spark, dir, Seq("id")).head
    GraftMaintenance.compact(spark, dir, targetFiles = 2,
      extraWriteOptions = Map("ndvsketch" -> "id"))
    val after = GraftNdv.estimate(spark, dir, Seq("id")).head
    // same rows -> same global k-min sketch, whatever the file layout
    assert(after.kth == before.kth && after.estimate == before.estimate)
    // a compact WITHOUT the option rewrites plain files: the synopsis is
    // gone and GraftNdv refuses loudly rather than falling back to a scan
    GraftMaintenance.compact(spark, dir, targetFiles = 1)
    val e = intercept[Exception] { GraftNdv.estimate(spark, dir, Seq("id")) }
    assert(e.getMessage.contains("no ndv synopsis"))
  }

  test("footer ndv surfaces as DSv2 column statistics for the optimizer") {
    import spark.implicits._
    val dir = freshDir("stats")
    (1L to 1500L).map(i => (i, s"g${i % 11}")).toDF("id", "grp")
      .repartition(3).write.format("graft")
      .option("ndvsketch", "id,grp").mode("overwrite").save(dir)
    val df = spark.read.format("graft").load(dir)
    val rel = df.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
    }.get
    val byName = rel.stats.attributeStats.map { case (a, st) => a.name -> st }
    assert(byName.contains("grp") && byName.contains("id"),
      s"no column stats surfaced: ${rel.stats.attributeStats}")
    assert(byName("grp").distinctCount.exists(_.toLong == 11L),
      s"grp ndv ${byName("grp").distinctCount} != exact 11")
    val idNdv = byName("id").distinctCount.map(_.toLong).getOrElse(0L)
    assert(idNdv > 1100 && idNdv < 1900, s"id ndv estimate $idNdv far from 1500")
    // footer min/max/nullCount flow beside the ndv (numeric lanes) —
    // filter-selectivity estimation prices ranges off real bounds
    assert(byName("id").min.exists(_.asInstanceOf[Number].longValue == 1L) &&
      byName("id").max.exists(_.asInstanceOf[Number].longValue == 1500L),
      s"id bounds ${byName("id").min}..${byName("id").max} != [1, 1500]")
    assert(byName("id").nullCount.exists(_.toLong == 0L))
    // a synopsis-less table surfaces NO distinctCount (never a guess),
    // but the footer bounds are EXACT and still flow
    val plain = freshDir("stats-plain")
    (1L to 100L).map(i =>
        (i, "x", if (i % 4 == 0) null else java.lang.Double.valueOf(i * 0.5)))
      .toDF("id", "grp", "d")
      .coalesce(1).write.format("graft").mode("overwrite").save(plain)
    val rel2 = spark.read.format("graft").load(plain)
      .queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
      }.get
    val byName2 = rel2.stats.attributeStats.map { case (a, st) => a.name -> st }
    assert(byName2.get("id").forall(_.distinctCount.isEmpty),
      "no synopsis -> no ndv guess")
    assert(byName2("id").min.exists(_.asInstanceOf[Number].longValue == 1L))
    assert(byName2("id").max.exists(_.asInstanceOf[Number].longValue == 100L))
    assert(byName2("d").nullCount.exists(_.toLong == 25L),
      s"null count ${byName2("d").nullCount} != 25")
    assert(byName2("d").min.exists(_.asInstanceOf[Number].doubleValue == 0.5) &&
      byName2("d").max.exists(_.asInstanceOf[Number].doubleValue == 49.5))
  }

  test("CBO filter selectivity uses the footer bounds to flip a build side") {
    import spark.implicits._
    // big table: 100k rows, values 0..99999; small table: 5k rows. A
    // filter big.v < 1000 keeps ~1% — with real bounds CBO estimates
    // ~1000 rows and broadcasts the FILTERED big side; without bounds the
    // filtered size falls back to a default fraction far above the small
    // side. Pin the plan: the filtered-big-side join must broadcast.
    val bigDir = freshDir("cbo-big"); val smallDir = freshDir("cbo-small")
    (0L until 100000L).map(i => (i, i)).toDF("k", "v")
      .coalesce(2).write.format("graft").mode("overwrite").save(bigDir)
    (0L until 5000L).map(i => (i, s"s$i")).toDF("k", "s")
      .coalesce(1).write.format("graft").mode("overwrite").save(smallDir)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64 * 1024).toString)
    try {
      val big = spark.read.format("graft").load(bigDir).filter($"v" < 30)
      val small = spark.read.format("graft").load(smallDir)
      val joined = small.join(big, "k")
      val planned = joined.queryExecution.sparkPlan.toString
      assert(planned.contains("BroadcastHashJoin"),
        s"bounded filter estimate must allow a broadcast:\n$planned")
      assert(joined.count() == 30)
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("a v004 file scans normally and composes with blooms") {
    import spark.implicits._
    val dir = freshDir("scan")
    val df = (1L to 1000L).map(i => (i, s"name$i", i % 10)).toDF("id", "name", "bucket")
    df.coalesce(1).write.format("graft")
      .option("ndvsketch", "id,name")
      .option("bloomfilter", "name").mode("overwrite").save(dir)
    graftFiles(dir).foreach(f => assert(magicOf(f) == "GRAFT004"))
    val back = spark.read.format("graft").load(dir)
    assert(back.count() == 1000L)
    assert(back.filter(col("name") === "name77").select("id").as[Long].collect().toSeq == Seq(77L))
    val stats = GraftNdv.estimate(spark, dir, Seq("name")).head
    assert(stats.nHashes == 256 && stats.estimate > 700 && stats.estimate < 1300)
  }
}
