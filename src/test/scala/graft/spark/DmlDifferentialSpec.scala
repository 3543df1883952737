package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential testing of the row-level DML machinery: random sequences
  * of delete / update / merge ops applied through the graft rewrite
  * passes must leave the table byte-identical (as sorted rows) to a plain
  * in-memory reference model. Seeded deterministically — failures
  * reproduce; the sequences exercise the shared rewrite scaffold
  * (deterministic names, converged guards, manifest healing) across flat
  * AND hive-partitioned layouts in compositions no hand-written case
  * covers.
  */
class DmlDifferentialSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // the overwrite ops (dynamic partitions / replaceWhere) are only
    // reachable through a catalog table — point one at the scenario root
    .config("spark.sql.catalog.dmlow", "graft.spark.GraftCatalog")
    .config("spark.sql.catalog.dmlow.warehouse", "/tmp/graft-test")
    .getOrCreate()

  /** writeTo target for a scenario dir under the fuzz catalog. */
  private def identOf(dir: String): String =
    s"dmlow.`${new java.io.File(dir).getName}`"

  // reference model: key -> (v, s, p)
  type Model = scala.collection.mutable.LinkedHashMap[Long, (Long, String, String)]

  private def tableOf(dir: String): DataFrame =
    spark.read.format("graft").load(dir)

  private def snapshot(dir: String): Seq[(Long, Long, String, String)] =
    tableOf(dir).select("k", "v", "s", "p").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .sortBy(_._1).toSeq

  private def modelSnapshot(m: Model): Seq[(Long, Long, String, String)] =
    m.toSeq.map { case (k, (v, s, p)) => (k, v, s, p) }.sortBy(_._1)

  private def runScenario(seed: Long, partitioned: Boolean,
      bucketLayout: Boolean = false): Unit = {
    val rnd = new scala.util.Random(seed)
    val dir = s"/tmp/graft-test/dml-diff-$seed-$partitioned-$bucketLayout"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val n = 150 + rnd.nextInt(100)
    val init = (0L until n).map(k =>
      (k, rnd.nextInt(1000).toLong, s"s${rnd.nextInt(4)}", s"p${k % 3}"))
    val model: Model = scala.collection.mutable.LinkedHashMap(
      init.map { case (k, v, s, p) => k -> (v, s, p) }: _*)
    val df = spark.createDataFrame(init).toDF("k", "v", "s", "p")
    val w = df.repartition(3).write.format("graft").mode("overwrite")
    (if (bucketLayout) w.option("partitionby", "bucket(4,k)")
     else if (partitioned) w.option("partitionby", "p") else w).save(dir)

    for (step <- 0 until 4) {
      rnd.nextInt(6) match {
        case 0 => // DELETE WHERE k % m = r — half copy-on-write rewrites,
          // half merge-on-read deletion vectors (same semantics; the DV
          // variant also exercises the masked scan under every later op,
          // including rewrites folding the mask into their outputs)
          val m = 3 + rnd.nextInt(5); val r = rnd.nextInt(m)
          if (rnd.nextBoolean())
            GraftMaintenance.deleteWhere(spark, dir, col("k") % m === r)
          else
            GraftMaintenance.deleteWhereDv(spark, dir, col("k") % m === r)
          model.filterInPlace((k, _) => k % m != r)
        case 1 => // UPDATE SET v = v + d, s = tag WHERE k % m = r — half
          // copy-on-write rewrites, half merge-on-read (mask + tagged
          // append); both must leave the identical logical table
          val m = 3 + rnd.nextInt(5); val r = rnd.nextInt(m)
          val d = 1 + rnd.nextInt(50); val tag = s"u$step"
          if (rnd.nextBoolean())
            GraftMaintenance.updateWhere(spark, dir, col("k") % m === r,
              Map("v" -> (col("v") + d), "s" -> lit(tag)))
          else
            GraftMaintenance.updateWhereDv(spark, dir, col("k") % m === r,
              Map("v" -> (col("v") + d), "s" -> lit(tag)))
          model.mapValuesInPlace((k, t) =>
            if (k % m == r) (t._1 + d, tag, t._3) else t)
        case 2 => // MERGE: tombstones + updates + inserts in one batch —
          // half copy-on-write rewrites, half merge-on-read (DV masks +
          // tagged append); the model is mode-blind, so the fuzz pins
          // both modes to identical semantics
          val existing = model.keys.toIndexedSeq
          val touch =
            if (existing.isEmpty) Seq.empty
            else rnd.shuffle(existing).take(1 + rnd.nextInt(math.max(1, existing.size / 4)))
          val fresh = (0 until (1 + rnd.nextInt(8))).map(_ => 10000L + rnd.nextInt(500))
          val batch0 = (touch ++ fresh).distinct.map { k =>
            val op = if (rnd.nextInt(4) == 0) "D" else "U"
            (k, rnd.nextInt(1000).toLong, s"m$step", s"p${k % 3}", op)
          }
          if (batch0.nonEmpty) {
            val src = spark.createDataFrame(batch0).toDF("k", "v", "s", "p", "op")
            val pre = GraftMaintenance.SrcPrefix
            GraftMaintenance.mergeApply(spark, dir, src, Seq("k" -> "k"),
              matched = Seq(
                GraftMaintenance.MergeClause(Some(col(pre + "op") === "D"), None),
                GraftMaintenance.MergeClause(None, Some(Map(
                  "v" -> col(pre + "v"), "s" -> col(pre + "s"))))),
              notMatchedInsert = Seq(GraftMaintenance.MergeClause(
                Some(col("op") =!= "D"),
                Some(Map("k" -> col("k"), "v" -> col("v"),
                  "s" -> col("s"), "p" -> col("p"))))),
              dvMode = rnd.nextBoolean())
            // reference semantics: matched -> first-true clause (tombstone
            // delete wins over update); not-matched -> insert unless D;
            // judged against the PRE-merge state
            val preKeys = model.keySet.toSet
            batch0.foreach { case (k, v, s, p, op) =>
              if (preKeys.contains(k)) {
                if (op == "D") model.remove(k)
                else model.update(k, (v, s, model(k)._3))
              } else if (op != "D") model.update(k, (v, s, p))
            }
          }
        case 3 => // OVERWRITE: dynamic partition swap / replaceWhere band
          // (bucket layouts take the replaceWhere branch: a dynamic
          // overwrite there replaces whole BUCKETS, which no per-key
          // model can express — replaceWhere is predicate-scoped and
          // layout-independent)
          if (partitioned && !bucketLayout) {
            // replace one whole partition with fresh rows (keys keep the
            // k % 3 == partition convention the other ops rely on)
            val pi = rnd.nextInt(3); val pv = s"p$pi"
            val rows = (0 until (2 + rnd.nextInt(6))).map { j =>
              (21000L + step * 999 + pi + 3L * j,
                rnd.nextInt(1000).toLong, s"o$step", pv)
            }
            spark.createDataFrame(rows).toDF("k", "v", "s", "p")
              .writeTo(identOf(dir)).overwritePartitions()
            model.filterInPlace((_, t) => t._3 != pv)
            rows.foreach { case (k, v, s, p) => model.update(k, (v, s, p)) }
          } else {
            // replace a key band with a recomputed (possibly smaller) slice
            val lo = rnd.nextInt(200).toLong
            val hi = lo + 10 + rnd.nextInt(60)
            val rows = (0 until (1 + rnd.nextInt(5))).map { j =>
              (lo + j, rnd.nextInt(1000).toLong, s"o$step", s"p${(lo + j) % 3}")
            }
            spark.createDataFrame(rows).toDF("k", "v", "s", "p")
              .writeTo(identOf(dir)).overwrite(col("k").between(lo, hi))
            model.filterInPlace((k, _) => k < lo || k > hi)
            rows.foreach { case (k, v, s, p) => model.update(k, (v, s, p)) }
          }
        case 4 => // RESTORE: a good 1-row commit pins the version, a junk
          // "bad load" lands strictly after it, and restore must un-happen
          // exactly the bad load — mid-sequence, over whatever mix of dv
          // masks / rewrites / overwrites the earlier steps left behind.
          // (Batch scenarios only: restore REWRITES history, so the
          // streaming fuzz's live-stream invariants don't apply to it.)
          val kGood = 50000L + step
          val good = Seq((kGood, 7L, s"g$step", s"p${kGood % 3}"))
          spark.createDataFrame(good).toDF("k", "v", "s", "p")
            .writeTo(identOf(dir)).append()
          model.update(kGood, (7L, s"g$step", s"p${kGood % 3}"))
          val fs = new org.apache.hadoop.fs.Path(dir)
            .getFileSystem(spark.sessionState.newHadoopConf())
          val v = GraftVersionLog.commits(GraftVersionLog.sync(fs,
            new org.apache.hadoop.fs.Path(dir))).size.toLong
          Thread.sleep(5) // the bad load must commit strictly after v
          val bad = (0 until (1 + rnd.nextInt(5))).map(j =>
            (60000L + step * 100 + j, rnd.nextInt(1000).toLong,
              "BAD", s"p${(60000L + step * 100 + j) % 3}"))
          spark.createDataFrame(bad).toDF("k", "v", "s", "p")
            .writeTo(identOf(dir)).append()
          GraftMaintenance.restore(spark, dir, v)
        case 5 => // ATOMIC REPLACE: CREATE OR REPLACE TABLE AS SELECT
          // rebuilds the table from the model's own content, reshaped —
          // a fresh generation (new version log, no sidecars) under the
          // remaining ops, with the layout declaration carried across
          val rows = model.toSeq.map { case (k, (v, s, p)) =>
            (k, v + 7, s"r$step", p) }
          if (rows.nonEmpty) {
            spark.createDataFrame(rows).toDF("k", "v", "s", "p")
              .createOrReplaceTempView(s"dml_rep_src_$seed")
            val part =
              if (bucketLayout) "PARTITIONED BY (bucket(4, k)) "
              else if (partitioned) "PARTITIONED BY (p) " else ""
            spark.sql(s"CREATE OR REPLACE TABLE ${identOf(dir)} $part" +
              s"AS SELECT * FROM dml_rep_src_$seed")
            rows.foreach { case (k, v, s, p) => model.update(k, (v, s, p)) }
          }
      }
      val got = snapshot(dir)
      val want = modelSnapshot(model)
      assert(got == want,
        s"seed=$seed partitioned=$partitioned diverged at step $step:\n" +
          s"  graft=${got.take(8)}... (${got.size} rows)\n" +
          s"  model=${want.take(8)}... (${want.size} rows)")
      if (bucketLayout) {
        // every generation of every op must keep the DERIVED layout: a
        // root-level file would strip directory pruning and read as a
        // MIXED layout to the catalog's strict inference
        val stray = GraftUtil.listDataFiles(dir,
          spark.sessionState.newHadoopConf())
          .filterNot(_.getPath.getParent.getName.startsWith("k_bucket="))
        assert(stray.isEmpty,
          s"seed=$seed step $step left files outside the bucket layout: " +
            stray.map(_.getPath.getName).take(3).mkString(", "))
      }
    }
  }

  test("random DML sequences match the reference model (flat layout)") {
    // heavier sweeps opt in via -Dgraft.fuzz.dml.seeds=N
    val extra = sys.props.get("graft.fuzz.dml.seeds").map(_.toInt).getOrElse(0)
    (Seq(11L, 23L, 47L) ++ (0 until extra).map(i => 2000L + 31L * i))
      .foreach(runScenario(_, partitioned = false))
  }

  test("random DML sequences match the reference model (bucket-transform layout)") {
    // the derived-dir layout under the full DML mix: rewrites, dv masks,
    // merges, replaceWhere, restore and CTAS-replace must all re-derive
    // bucket dirs (the round-16 fuzz caught MERGE inserts flattening
    // hive layouts; this variant guards the transform generation)
    val extra = sys.props.get("graft.fuzz.dml.seeds").map(_.toInt).getOrElse(0)
    (Seq(13L, 29L) ++ (0 until extra).map(i => 4000L + 37L * i))
      .foreach(runScenario(_, partitioned = true, bucketLayout = true))
  }

  test("random DML sequences match the reference model (hive-partitioned)") {
    val extra = sys.props.get("graft.fuzz.dml.seeds").map(_.toInt).getOrElse(0)
    (Seq(5L, 83L) ++ (0 until extra).map(i => 3000L + 29L * i))
      .foreach(runScenario(_, partitioned = true))
  }

  // ---- DML x streaming interleavings (round-14, VERDICT r13 #7) ----
  //
  // The catch-up-manifest machinery (row-level rewrites expire the
  // manifests of retired files and publish TAGGED survivor re-lists) makes
  // three promises that only hold together if the tagging is exactly
  // right, so they are fuzzed here against the same seeded op sequences:
  //
  //   1. a LIVE manifest-mode stream (checkpoint across every op) receives
  //      the initial corpus plus ONLY merge-inserted rows — rewritten
  //      survivors are never redelivered (catch-up manifests are skipped
  //      by streams with history);
  //   2. a FRESH manifest-mode stream started after any op drains to
  //      exactly the batch view — the catch-up coverage keeps the
  //      backfill bound from dropping survivors;
  //   3. an incremental `since` window cut just before an op sees ONLY
  //      that op's inserts (merge NOT MATCHED rows) — never the kept rows
  //      of rewritten files.
  private def runStreamingScenario(seed: Long): Unit = {
    val rnd = new scala.util.Random(seed)
    val dir = s"/tmp/graft-test/dml-sdiff-$seed"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val ckpt = s"$dir-ckpt"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    val n = 120 + rnd.nextInt(80)
    val init = (0L until n).map(k =>
      (k, rnd.nextInt(1000).toLong, s"s${rnd.nextInt(4)}", s"p${k % 3}"))
    val model: Model = scala.collection.mutable.LinkedHashMap(
      init.map { case (k, v, s, p) => k -> (v, s, p) }: _*)
    spark.createDataFrame(init).toDF("k", "v", "s", "p")
      .repartition(3).write.format("graft").mode("overwrite").save(dir)
    val schema = tableOf(dir).schema
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // 0 when an op expired every manifest: unmanifested survivors are
    // pre-manifest history, outside ANY since window — the invariant holds
    def tMax: Long = GraftManifest.list(fs, new org.apache.hadoop.fs.Path(dir))
      .filterNot(GraftManifest.isCatchup).map(GraftManifest.nameT)
      .foldLeft(0L)(math.max)
    // (1) the live stream, checkpointed across the whole sequence. Half
    // the seeds run under ADMISSION CONTROL: the capped latestOffset path
    // (timestamp-major prefix + coverage checks) must interact with
    // rewrite-published replacement manifests exactly like the unbounded
    // path — same final contents, batches merely split.
    val liveName = s"dml_sdiff_live_$seed"
    spark.streams.active.filter(_.name == liveName).foreach(_.stop())
    val reader0 = spark.readStream.format("graft").schema(schema)
      .option("manifest", "true")
    val reader =
      if (seed % 2 == 1) reader0.option("maxfilespertrigger", "2") else reader0
    val live = reader.load(dir)
      .writeStream.format("memory").queryName(liveName)
      .option("checkpointLocation", ckpt).start()
    val liveExpected = scala.collection.mutable.ArrayBuffer[(Long, Long, String, String)](
      init: _*)
    def sortedRows(df: DataFrame): Seq[(Long, Long, String, String)] =
      df.select("k", "v", "s", "p").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
        .sortBy(t => (t._1, t._2, t._3)).toSeq
    try {
      live.processAllAvailable()
      for (step <- 0 until 3) {
        val sinceCut = tMax
        Thread.sleep(3) // commits of this step must land strictly after the cut
        val inserted = scala.collection.mutable.ArrayBuffer[(Long, Long, String, String)]()
        rnd.nextInt(4) match {
          case 0 =>
            val m = 3 + rnd.nextInt(5); val r = rnd.nextInt(m)
            GraftMaintenance.deleteWhere(spark, dir, col("k") % m === r)
            model.filterInPlace((k, _) => k % m != r)
          case 1 =>
            val m = 3 + rnd.nextInt(5); val r = rnd.nextInt(m)
            val d = 1 + rnd.nextInt(50); val tag = s"u$step"
            GraftMaintenance.updateWhere(spark, dir, col("k") % m === r,
              Map("v" -> (col("v") + d), "s" -> lit(tag)))
            model.mapValuesInPlace((k, t) =>
              if (k % m == r) (t._1 + d, tag, t._3) else t)
          case 2 =>
            val existing = model.keys.toIndexedSeq
            val touch =
              if (existing.isEmpty) Seq.empty
              else rnd.shuffle(existing).take(1 + rnd.nextInt(math.max(1, existing.size / 4)))
            val fresh = (0 until (1 + rnd.nextInt(8))).map(_ => 10000L + rnd.nextInt(500))
            val batch0 = (touch ++ fresh).distinct.map { k =>
              val op = if (rnd.nextInt(4) == 0) "D" else "U"
              (k, rnd.nextInt(1000).toLong, s"m$step", s"p${k % 3}", op)
            }
            if (batch0.nonEmpty) {
              val src = spark.createDataFrame(batch0).toDF("k", "v", "s", "p", "op")
              val pre = GraftMaintenance.SrcPrefix
              GraftMaintenance.mergeApply(spark, dir, src, Seq("k" -> "k"),
                matched = Seq(
                  GraftMaintenance.MergeClause(Some(col(pre + "op") === "D"), None),
                  GraftMaintenance.MergeClause(None, Some(Map(
                    "v" -> col(pre + "v"), "s" -> col(pre + "s"))))),
                notMatchedInsert = Seq(GraftMaintenance.MergeClause(
                  Some(col("op") =!= "D"),
                  Some(Map("k" -> col("k"), "v" -> col("v"),
                    "s" -> col("s"), "p" -> col("p"))))))
              val preKeys = model.keySet.toSet
              batch0.foreach { case (k, v, s, p, op) =>
                if (preKeys.contains(k)) {
                  if (op == "D") model.remove(k)
                  else model.update(k, (v, s, model(k)._3))
                } else if (op != "D") {
                  model.update(k, (v, s, p))
                  inserted += ((k, v, s, p))
                }
              }
            }
          case 3 =>
            // replaceWhere: the new slice commits as an ordinary manifest
            // (streams deliver its rows), then the band is deleted from
            // the pre-commit snapshot — survivors must behave exactly
            // like a deleteWhere's (replacements at original commit
            // times, no redelivery, no since-window leakage)
            val lo = rnd.nextInt(150).toLong
            val hi = lo + 10 + rnd.nextInt(50)
            val rows = (0 until (1 + rnd.nextInt(5))).map { j =>
              (lo + j, rnd.nextInt(1000).toLong, s"o$step", s"p${(lo + j) % 3}")
            }
            spark.createDataFrame(rows).toDF("k", "v", "s", "p")
              .writeTo(identOf(dir)).overwrite(col("k").between(lo, hi))
            model.filterInPlace((k, _) => k < lo || k > hi)
            rows.foreach { case (k, v, s, p) =>
              model.update(k, (v, s, p))
              inserted += ((k, v, s, p))
            }
        }
        // batch view still matches the reference model (baseline sanity)
        assert(snapshot(dir) == modelSnapshot(model),
          s"seed=$seed batch view diverged at step $step")
        // (3) the since window cut before the op delivers ONLY the inserts
        val delta = sortedRows(
          spark.read.format("graft").option("since", sinceCut).load(dir))
        val wantDelta = inserted.sortBy(t => (t._1, t._2, t._3)).toSeq
        assert(delta == wantDelta,
          s"seed=$seed step $step: since-window delivered ${delta.size} rows, " +
            s"expected ${wantDelta.size} inserts — rewritten survivors must " +
            s"never re-enter an incremental window\n  got=${delta.take(6)}\n" +
            s"  want=${wantDelta.take(6)}")
        // (1) the live stream has appended exactly the inserts
        live.processAllAvailable()
        liveExpected ++= inserted
        val liveGot = sortedRows(spark.table(liveName))
        assert(liveGot == liveExpected.sortBy(t => (t._1, t._2, t._3)).toSeq,
          s"seed=$seed step $step: live stream diverged " +
            s"(${liveGot.size} rows vs ${liveExpected.size} expected) — a " +
            "rewrite redelivered or dropped rows for a checkpointed stream")
        // (2) a fresh stream drains to the batch view exactly. Mode is
        // AUTO-detected (the product default): after an op that expired
        // every manifest the directory legitimately reverts to modTime
        // listing — forcing manifest mode there would read an empty log
        val freshName = s"dml_sdiff_fresh_${seed}_$step"
        val fq = spark.readStream.format("graft").schema(schema)
          .load(dir)
          .writeStream.format("memory").queryName(freshName).start()
        try {
          fq.processAllAvailable()
          val freshGot = sortedRows(spark.table(freshName))
          val batchGot = sortedRows(tableOf(dir))
          assert(freshGot == batchGot,
            s"seed=$seed step $step: fresh stream (${freshGot.size} rows) != " +
              s"batch view (${batchGot.size} rows) — catch-up coverage broken")
        } finally {
          fq.stop()
          spark.sql(s"DROP TABLE IF EXISTS $freshName")
        }
      }
    } finally {
      live.stop()
      spark.sql(s"DROP TABLE IF EXISTS $liveName")
    }
  }

  test("DML x streaming interleavings: live stream, fresh streams, since windows") {
    Seq(7L, 19L, 31L, 59L, 101L).foreach(runStreamingScenario)
  }

  // ---- CDC consumer fuzz: a derived table follows the source ----
  //
  // The feed contract (inserts via windowed commits, deletes via the
  // changelog) promises a consumer can keep a derived table exact without
  // re-diffing the source, for ANY polling cadence — including windows
  // that span an append AND a takedown rewriting that same append (the
  // replacement-manifest case WindowSpanSpec pins minimally). Fuzz it:
  // random append/takedown sequences with the consumer applying windows
  // at random intervals through BOTH delete paths (keyed + merge).
  private def runCdcConsumerScenario(seed: Long): Unit = {
    val rnd = new scala.util.Random(seed)
    val src = s"/tmp/graft-test/dml-cdc-fuzz-$seed-src"
    val dst = s"/tmp/graft-test/dml-cdc-fuzz-$seed-dst"
    Seq(src, dst).foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
    def rows(ks: Seq[Long]) = spark.createDataFrame(
      ks.map(k => (k, k * 7))).toDF("k", "v")
    val derive = (df: DataFrame) =>
      df.filter(col("k") % 2 === 0).select(col("k"), col("v"))
    var nextK = 200L
    rows(0L until 200L).repartition(3)
      .write.format("graft").mode("append").save(src)
    derive(spark.read.format("graft").load(src))
      .write.format("graft").mode("append").save(dst)
    val liveKeys = scala.collection.mutable.TreeSet[Long](0L until 200L: _*)
    // the production consumer cadence: windows are cut at WALL-CLOCK poll
    // times ("everything committed since my last run, up to now") — feed
    // commits are timestamped independently of table commits, so a
    // table-manifest watermark would silently exclude takedowns landing
    // after the table's newest commit
    var lastApplied = System.currentTimeMillis()
    val steps = sys.props.get("graft.fuzz.cdc.steps").map(_.toInt).getOrElse(6)
    for (step <- 0 until steps) {
      Thread.sleep(3)
      rnd.nextInt(3) match {
        case 0 => // append: fresh keys, sometimes re-using deleted ones
          val fresh = (0 until 20 + rnd.nextInt(30)).map(_ => { nextK += 1; nextK })
          val reused = if (rnd.nextBoolean()) Seq(1L + rnd.nextInt(150))
            .filterNot(liveKeys.contains) else Seq.empty
          val ks = fresh ++ reused
          rows(ks).write.format("graft").mode("append").save(src)
          liveKeys ++= ks
        case 1 => // takedown: a key band, changelog'd for the feed
          if (liveKeys.nonEmpty) {
            val all = liveKeys.toIndexedSeq
            val at = rnd.nextInt(all.size)
            val band = all.slice(at, at + 10 + rnd.nextInt(40))
            if (band.nonEmpty) {
              GraftMaintenance.deleteWhere(spark, src,
                col("k").between(band.head, band.last), changelog = true)
              // materialize before removing: range() is a live view of the
              // tree, and mutating under its iterator can skip keys
              liveKeys --= liveKeys.range(band.head, band.last + 1).toList
            }
          }
        case 2 => // re-value a key band: feed carries change pre-images,
          // the consumer must reconcile against current state
          if (liveKeys.nonEmpty) {
            val all = liveKeys.toIndexedSeq
            val at = rnd.nextInt(all.size)
            val band = all.slice(at, at + 5 + rnd.nextInt(30))
            if (band.nonEmpty)
              GraftMaintenance.updateWhere(spark, src,
                col("k").between(band.head, band.last),
                Map("v" -> (col("v") + lit(1000000L * (step + 1)))),
                changelog = true)
          }
      }
      // the consumer polls on its own cadence: sometimes after every op,
      // sometimes sleeping through several (the spanning-window shape)
      if (rnd.nextBoolean() || step == steps - 1) {
        Thread.sleep(3) // poll strictly after every commit of this step
        val asof = System.currentTimeMillis()
        val window = (lastApplied, asof)
        val (firstAppended, _) = GraftCdc.applyChangesBetween(spark, src,
          window._1, window._2,
          dst, "k", derive, driverKeyMax = if (rnd.nextBoolean()) 3 else 1000)
        lastApplied = asof
        val want = derive(spark.read.format("graft").load(src))
          .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        val got = spark.read.format("graft").load(dst)
          .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        assert(got == want,
          s"seed=$seed step $step: derived table diverged " +
            s"(${got.size} rows vs ${want.size} expected) — got ${got.take(6)}" +
            s" want ${want.take(6)}")
        // crash-replay / duplicate poll of the SAME window: EVERY applied
        // window is recognized by its tag up front and no-ops at (0,0) —
        // row-appending ones via their tagged append manifest, zero-append
        // ones via the zero-entry marker manifest (without the marker, an
        // out-of-order replay of an old zero-append window would re-delete
        // rows later windows re-appended, and those windows' own tags
        // block the restoring re-appends). The table must not move.
        if (rnd.nextBoolean()) {
          val (ra, rd) = GraftCdc.applyChangesBetween(spark, src,
            window._1, window._2, dst, "k", derive,
            driverKeyMax = if (rnd.nextBoolean()) 3 else 1000)
          assert(ra == 0,
            s"seed=$seed step $step: replay re-appended rows ($ra, $rd)")
          assert(rd == 0,
            s"seed=$seed step $step: window's replay not " +
              s"recognized up front ($ra, $rd, appended=$firstAppended)")
          val again = spark.read.format("graft").load(dst)
            .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
          assert(again == want,
            s"seed=$seed step $step: replay mutated the derived table")
        }
      }
    }
  }

  test("CDC consumer fuzz: derived tables stay exact under any polling cadence") {
    // heavier sweeps opt in via -Dgraft.fuzz.cdc.seeds=N / .steps=M
    val extra = sys.props.get("graft.fuzz.cdc.seeds").map(_.toInt).getOrElse(0)
    val seeds = Seq(13L, 37L, 71L, 113L) ++ (0 until extra).map(i => 1000L + 17L * i)
    seeds.foreach(runCdcConsumerScenario)
  }
}
