package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** s_ann_bruteforce is a deliberately quadratic recall oracle; the
  * row-count guard must refuse to aim it at anything bigger than the
  * configured cap (and still run normally under it).
  */
class AnnGuardSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("brute-force ANN refuses inputs above the configured cap") {
    spark.conf.set("graft.ann.bruteForceMaxRows", "5")
    try {
      val e = intercept[IllegalArgumentException](
        graft.SparkEntry.queries("s_ann_bruteforce")(spark, sf))
      assert(e.getMessage.contains("quadratic"), e.getMessage)
    } finally spark.conf.unset("graft.ann.bruteForceMaxRows")
  }

  test("brute-force ANN runs under the default cap") {
    assert(graft.SparkEntry.queries("s_ann_bruteforce")(spark, sf).count() == 50)
  }

  test("coarse K scales with corpus size (no fixed-K quadratic cliff)") {
    // IVF family: K = max(32, ceil(sqrt(N))) — grows, and keeps both the
    // assignment (N*K) and per-probe rerank (nprobe*N/K) sublinear in N^2
    assert(TrainingData.kIvf(500L) == 32L)
    assert(TrainingData.kIvf(1000000L) == 1000L)
    assert(TrainingData.kIvf(100000000L) == 10000L)
    // SemDeDup: K = max(32, ceil(N/500)) — expected cluster size bounded
    // at ~500 members, so within-cluster pairwise work is <= ~500*N
    assert(TrainingData.kSem(500L) == 32L)
    assert(TrainingData.kSem(1000000L) == 2000L)
    for (n <- Seq(10000L, 100000L, 10000000L)) {
      assert(TrainingData.kIvf(n * 10) > TrainingData.kIvf(n), s"kIvf flat at $n")
      assert(TrainingData.kSem(n * 10) > TrainingData.kSem(n), s"kSem flat at $n")
      assert((n.toDouble / TrainingData.kSem(n)) <= 500.0 + 1e-9,
        s"expected cluster size above target at $n")
    }
  }

  test("seedIds selects exactly K distinct hash-ranked centroids") {
    import org.apache.spark.sql.functions.col
    val seeds = TrainingData.seedIds(spark, sf, TrainingData.kIvf)
      .select(col("vec_id")).collect().map(_.getLong(0))
    assert(seeds.length == 32, s"got ${seeds.length} seeds for N=500, expected 32")
    assert(seeds.distinct.length == 32)
    // hash-rank, not id-order: the seed set must not be a prefix/stride of
    // the id space (that alignment is what collapses amplified corpora)
    assert(!seeds.sorted.sameElements(0L until 32L))
  }

  test("SemDeDup large-K plan: shuffled hash join on gid, no forced K-row broadcast") {
    // Past graft.sem.broadcastMaxK the fine-level seed frame must NOT be
    // broadcast: the keyed join plans as ShuffledHashJoin and the flat
    // argmax as a partitioned cartesian. Drive the cap to 0 so sf0.001's
    // K=32 takes the large-K path, and pin the plan + result equivalence.
    import org.apache.spark.sql.functions.col
    val default2 = graft.SparkEntry.queries("d_dedup_semantic2")(spark, sf).collect()
    val default1 = graft.SparkEntry.queries("d_dedup_semantic")(spark, sf).collect()
    spark.conf.set("graft.sem.broadcastMaxK", "0")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // -1 kills PLANNER-chosen broadcasts (a small side under the threshold
    // legitimately becomes BNLJ); a FORCED broadcast() hint would survive
    // it — which is exactly the regression this test detects
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val two = graft.SparkEntry.queries("d_dedup_semantic2")(spark, sf)
      val plan2 = two.queryExecution.executedPlan.toString
      assert(plan2.contains("ShuffledHashJoin"),
        s"fine-level join must be a shuffled hash join past the cap:\n$plan2")
      assert(!plan2.contains("BroadcastHashJoin") && !plan2.contains("BroadcastNestedLoop"),
        s"no forced K-row broadcast may survive past the cap:\n$plan2")
      assert(two.collect().sameElements(default2),
        "large-K plan changed the d_dedup_semantic2 result")
      val one = graft.SparkEntry.queries("d_dedup_semantic")(spark, sf)
      val plan1 = one.queryExecution.executedPlan.toString
      assert(!plan1.contains("BroadcastNestedLoop") && !plan1.contains("BroadcastHashJoin"),
        s"flat argmax must not broadcast past the cap:\n$plan1")
      assert(one.collect().sameElements(default1),
        "large-K plan changed the d_dedup_semantic result")
    } finally {
      spark.conf.unset("graft.sem.broadcastMaxK")
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("SemDeDup cluster sizes stay bounded on a 40k-row corpus") {
    // synthesize a corpus big enough that the scale-aware K exceeds the 32
    // floor (N=40000 -> K_sem=80, stride=500), from perturbed copies of the
    // real embeddings; assert the resulting cluster-size distribution
    // honours the design bound the fixed-K scheme violated
    import org.apache.spark.sql.functions._
    val dir = "/tmp/graft-test/ann-40k"
    val marker = new java.io.File(s"$dir/embeddings.parquet/_SUCCESS")
    if (!marker.exists()) {
      val base = spark.read.parquet(s"$sf/embeddings.parquet")
      base.withColumn("c", explode(expr("sequence(0L, 79L)")))
        .withColumn("vec_id", col("vec_id") + col("c") * 500L)
        .withColumn("embedding", expr(
          "transform(embedding, x -> x + cast(c as float) * cast(1e-3 as float))"))
        .drop("c")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }
    val seeds = TrainingData.seedIds(spark, dir, TrainingData.kSem).collect()
    assert(seeds.length == 80, s"K=${seeds.length} for N=40000, expected 80")
    val sizes = graft.SparkEntry.queries("d_dedup_semantic")(spark, dir)
      .select(col("cluster_size")).collect().map(_.getLong(0))
    assert(sizes.sum == 40000L, s"every vector lands in a cluster (${sizes.sum})")
    assert(sizes.length > 32, s"K must exceed the floor, got ${sizes.length} clusters")
    // the scale property under pin: max cluster is a CONSTANT factor of the
    // ~500-member target, independent of N (the fixed-K scheme put ~N/4 in
    // one cluster here; stride seeds on this copy-aligned layout put ~0.9N).
    // 8x absorbs the worst-case skew of a corpus that is 80 near-identical
    // copies of every vector.
    assert(sizes.max <= 8 * 500L,
      s"max cluster ${sizes.max} blew the ~500-member design bound")
  }

  test("composed IVF-PQ recall@5 at sf0.01 stays above the 0.4 floor") {
    // round-12 headline quality win (0.26 -> 0.50 via nprobe=8 + exact
    // refine of the ADC top-50): guard against a silent regression of the
    // composed index — coarse probing, ADC ranking, and the refine stage
    // all compound into this number
    import org.apache.spark.sql.functions._
    val r = graft.SparkEntry.queries("s_knn_recall_ivfpq")(spark, "/root/testdata/sf0.01")
      .agg(avg(col("recall"))).first().getDouble(0)
    assert(r >= 0.4, f"composed IVF-PQ recall@5 regressed: $r%.3f < 0.40")
  }
}
