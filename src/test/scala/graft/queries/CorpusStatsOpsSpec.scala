package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics + scale-shape guards for the corpus-statistics ops added on
  * top of the dedup/ANN families:
  *
  *  - s_embedding_pca: exact covariance/correlation prep — the d(d+1)/2
  *    upper triangle comes back complete, diagonal correlation is 1 (up to
  *    the floor quantization), off-diagonals live in [-1, 1], and the plan
  *    never shuffles on vec_id (the pair expansion is map-side; only the
  *    d²-bounded cell frame is exchanged).
  *  - d_decontam_bloom: the Bloom pass can false-POSITIVE but never
  *    false-NEGATIVE — every exactly-contaminated (train doc, gram) pair
  *    must be bloom-positive, and the per-doc exact counts must equal an
  *    independently computed join.
  *  - t_token_entropy: zero for single-token docs, ln(k) for uniform
  *    k-token docs (micro-nat quantized), and always in [0, ln(distinct)].
  */
class CorpusStatsOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("s_embedding_pca: full upper triangle, bounded correlations, no corpus shuffle") {
    val df = TrainingData.queries("s_embedding_pca")(spark, sf)
    val plan = df.queryExecution.explainString(FormattedMode)
    assert(!plan.contains("CartesianProduct"), "pair expansion fell back to a Cartesian")
    assert(!plan.contains("hashpartitioning(vec_id"),
      "covariance plan shuffles on vec_id — the pair expansion must be map-side")
    val rows = df.collect()
    val d = 64
    assert(rows.length == d * (d + 1) / 2, s"expected ${d * (d + 1) / 2} cells, got ${rows.length}")
    rows.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      val corr = r.getLong(3)
      assert(i <= j, s"lower-triangle cell ($i,$j) leaked out")
      if (i == j) {
        assert(corr >= 999998L && corr <= 1000000L,
          s"diagonal corr_micro($i,$i) = $corr not ~1e6")
        assert(r.getDouble(2) > 0.0, s"variance($i) not positive")
      } else
        assert(math.abs(corr) <= 1000000L, s"corr_micro($i,$j) = $corr out of [-1,1]")
    }
    // symmetric sanity: cov(i,j) equals cov(j,i) by construction (only one
    // triangle is emitted), so check a couple of cells against a direct
    // computation over the quantized vectors
    val q = spark.read.parquet(s"$sf/embeddings.parquet")
      .withColumn("q", expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000.0) as bigint))"))
      .select(col("q")).collect().map(_.getSeq[Long](0).toArray)
    val n = q.length.toLong
    def covn(i: Int, j: Int): Double = {
      val si = q.map(_(i)).sum; val sj = q.map(_(j)).sum
      q.map(v => BigInt(v(i) * n - si) * BigInt(v(j) * n - sj)).sum.toDouble
    }
    val got = rows.map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got((0, 0)) == covn(0, 0), "cov(0,0) mismatch vs direct computation")
    assert(got((0, 1)) == covn(0, 1), "cov(0,1) mismatch vs direct computation")
    assert(got((3, 17)) == covn(3, 17), "cov(3,17) mismatch vs direct computation")
  }

  test("s_embedding_power: the iterate is (near) an eigenvector of the real covariance") {
    val rows = TrainingData.queries("s_embedding_power")(spark, sf).collect()
    assert(rows.length == 64)
    val v = rows.sortBy(_.getInt(0)).map(_.getLong(1).toDouble)
    assert(v.forall(x => math.abs(x) <= 1000.0), "loadings out of milli scale")
    assert(v.exists(x => math.abs(x) == 1000.0), "no component at the rescale anchor")
    val rayleigh = rows.head.getDouble(2)
    assert(rayleigh > 0.0, "covariance top eigenvalue must be positive")
    // direct covariance from the quantized vectors, then check A·v ∥ v
    val q = spark.read.parquet(s"$sf/embeddings.parquet")
      .withColumn("q", expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000.0) as bigint))"))
      .select(col("q")).collect().map(_.getSeq[Long](0).toArray)
    val n = q.length.toLong
    val sums = Array.tabulate(64)(i => q.map(_(i)).sum)
    val av = Array.tabulate(64) { i =>
      (0 until 64).map { j =>
        val cij = q.map(x => BigInt(x(i) * n - sums(i)) * BigInt(x(j) * n - sums(j)))
          .sum.toDouble
        cij * v(j)
      }.sum
    }
    def norm(a: Array[Double]) = math.sqrt(a.map(x => x * x).sum)
    val cos = (av, v).zipped.map(_ * _).sum / (norm(av) * norm(v))
    // the op's contract is the DETERMINISTIC k-step iterate, which
    // approaches the eigenvector at the eigengap rate — on this synthetic
    // covariance 6 rounds land ~0.997; assert the direction is clearly
    // dominant without over-promising exact convergence
    assert(cos > 0.99, s"A·v not parallel to v after power iteration: cos=$cos")
    // Rayleigh consistency against the direct matrix
    val rayDirect = (av, v).zipped.map(_ * _).sum / v.map(x => x * x).sum
    assert(math.abs(rayleigh - rayDirect) / rayDirect < 1e-6,
      s"rayleigh $rayleigh vs direct $rayDirect")
  }

  test("d_decontam_bloom: no false negatives, exact counts match an independent join") {
    val rows = TrainingData.queries("d_decontam_bloom")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (bp, ex, fp) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(ex <= bp, s"doc ${r.getLong(0)}: exact $ex > bloom-positive $bp")
      assert(fp == bp - ex && fp >= 0L)
    }
    // independent exact contamination count per train doc (plain join,
    // no bloom): every such doc/count must appear with exact_hit_grams equal
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("w", split(col("text"), " "))
      .withColumn("g", explode(expr(
        """CASE WHEN size(w) >= 4
             THEN transform(sequence(0, size(w)-4), i -> array_join(slice(w, i+1, 4), ' '))
             ELSE array() END""")))
      .select(col("doc_id"), col("g"))
    val ev = d.filter(col("doc_id") % 97 === 0).select(col("g")).distinct()
    val exact = d.filter(col("doc_id") % 97 =!= 0).select(col("doc_id"), col("g")).distinct()
      .join(ev, Seq("g")).groupBy(col("doc_id")).agg(count(lit(1)).as("hits"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    exact.foreach { case (id, hits) =>
      assert(got.getOrElse(id, 0L) == hits,
        s"doc $id: bloom path reports ${got.getOrElse(id, 0L)} exact hits, join says $hits")
    }
    assert(exact.nonEmpty, "no contaminated docs at all — vacuous corpus")
  }

  test("t_inverted_index: AND-search equals direct text scan; search never touches the corpus") {
    val df = Functions.queries("t_inverted_index")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty, "AND of the 3 most frequent tokens matched nothing — vacuous probe")
    rows.foreach(r => assert(r.getLong(1) == 3L))
    // ground truth straight off the text
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("ws")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val dfs = docs.values.toSeq.flatMap(_.toSeq).groupBy(identity).view.mapValues(_.size)
    val probes = dfs.toSeq.sortBy { case (w, c) => (-c, w) }.take(3).map(_._1).toSet
    val want = docs.filter { case (_, ws) => probes.subsetOf(ws) }.keys.toSeq.sorted
    assert(rows.map(_.getLong(0)).toSeq == want,
      "index search result differs from the direct containment scan")
    // the search side reads the INDEX table only — the documents source
    // must not appear in its plan (that is the point of the index)
    val plan = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("documents"), "search plan rescans the corpus")
    assert(plan.contains("graft_invidx_stage"), "search plan does not read the staged index")
  }

  test("q_funnel: step order is enforced on a controlled log") {
    import spark.implicits._
    import java.sql.Timestamp
    val tmp = "/tmp/graft-test/funnel-ctl"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    Seq(
      // user 1: full ordered funnel
      (1L, t(1), 1L, "view", 1.0, "{}"), (2L, t(2), 1L, "click", 1.0, "{}"),
      (3L, t(3), 1L, "purchase", 1.0, "{}"),
      // user 2: purchase BEFORE the view — must not count past step 1
      (4L, t(1), 2L, "purchase", 1.0, "{}"), (5L, t(2), 2L, "view", 1.0, "{}"),
      // user 3: view+click, no purchase
      (6L, t(1), 3L, "view", 1.0, "{}"), (7L, t(2), 3L, "click", 1.0, "{}"),
      // user 4: never viewed
      (8L, t(1), 4L, "click", 1.0, "{}"), (9L, t(2), 4L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = Relational.queries("q_funnel")(spark, tmp).collect()(0)
    assert(r.getLong(0) == 4L, "n_users")
    assert(r.getLong(1) == 3L, "users with a view (1, 2, 3)")
    assert(r.getLong(2) == 2L, "clicks after a view (1, 3)")
    assert(r.getLong(3) == 1L, "ordered purchases (only user 1)")
  }

  test("q_graph_pagerank: mass conserved up to floor shave, agrees with a float reference") {
    val rows = RelationalExt.queries("q_graph_pagerank")(spark, sf).collect()
    assert(rows.nonEmpty)
    val n = rows.length
    val total = rows.map(_.getLong(1)).sum
    // every floor shaves < 1 micro-unit; bound the shave by the term count
    // (n base terms + n dangling terms + one per edge, per iteration)
    val edgeCount = rows.map(_.getLong(2)).sum
    val slack = 3 * (2 * n + edgeCount + 2)
    assert(total <= 1000000L, s"rank mass $total exceeds 1e6")
    assert(total >= 1000000L - slack, s"rank mass $total lost more than floor slack $slack")
    assert(rows.map(_.getInt(4).toLong).sorted.toSeq == (1 to n).map(_.toLong),
      "pos is not a 1..n permutation")

    // float reference: same graph, double arithmetic, 3 iterations
    import org.apache.spark.sql.expressions.Window
    val e = spark.read.parquet(s"$sf/events.parquet")
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val edges = e.withColumn("src", lag(col("event_type"), 1).over(byUser))
      .filter(col("src").isNotNull)
      .groupBy(col("src"), col("event_type").as("dst")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2).toDouble).toMap
    val nodes = rows.map(_.getString(0))
    val outw = nodes.map(v => v -> edges.collect { case ((s0, _), c) if s0 == v => c }.sum).toMap
    var r = nodes.map(v => v -> 1.0 / n).toMap
    (1 to 3).foreach { _ =>
      val dang = nodes.filter(outw(_) == 0.0).map(r).sum
      r = nodes.map { v =>
        v -> (0.15 / n + 0.85 * dang / n +
          nodes.map(u => if (outw(u) > 0) 0.85 * r(u) * edges.getOrElse((u, v), 0.0) / outw(u) else 0.0).sum)
      }.toMap
    }
    rows.foreach { row =>
      val got = row.getLong(1) / 1e6
      val want = r(row.getString(0))
      assert(math.abs(got - want) < 1e-3,
        s"${row.getString(0)}: integer rank $got vs float reference $want")
    }
  }

  test("t_profile_columns: one row per column, nulls counted, widths exact") {
    import spark.implicits._
    val tmp = "/tmp/graft-test/profile-ctl"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    Seq(
      (1L, Some("ab"), Some("en"), "s1", 2L),
      (2L, None, Some("en"), "s1", 0L),
      (3L, Some("wxyz"), None, "s2", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val prof = TrainingData.queries("t_profile_columns")(spark, tmp)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(prof.size == 5)
    assert(prof("text").getLong(1) == 1L && prof("lang").getLong(1) == 1L)
    assert(prof("doc_id").getLong(1) == 0L)
    assert(prof("text").getLong(2) == 2L, "distinct over non-null values only")
    assert(prof("text").getString(3) == "ab" && prof("text").getString(4) == "wxyz")
    // mean width over NON-NULL rows: (2 + 4) * 1e6 / 2
    assert(prof("text").getLong(5) == 3000000L, s"avg width ${prof("text").getLong(5)}")
    assert(prof("source").getLong(2) == 2L && prof("source").getLong(1) == 0L)

    // real corpus: row set is exactly the 5 columns, doc_id is unique + non-null
    val rows = TrainingData.queries("t_profile_columns")(spark, sf).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("doc_id", "lang", "n_chars", "source", "text"))
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    val did = rows.find(_.getString(0) == "doc_id").get
    assert(did.getLong(1) == 0L && did.getLong(2) == nDocs)
  }

  test("t_token_entropy: analytic values on a controlled corpus, bounds on the real one") {
    import spark.implicits._
    val tmp = "/tmp/graft-test/entropy-ctl"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    Seq(
      (1L, "spam spam spam spam spam spam", "s", "en", 6L), // 1 type -> 0
      (2L, "a b c d", "s", "en", 4L), // uniform 4 -> ln 4
      (3L, "x x y y", "s", "en", 4L)) // uniform 2 -> ln 2
      .toDF("doc_id", "text", "source", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val ctl = TrainingData.queries("t_token_entropy")(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(ctl(1L) == 0L, s"single-type doc entropy ${ctl(1L)} != 0")
    val ln4 = (math.log(4.0) * 1e6).toLong
    val ln2 = (math.log(2.0) * 1e6).toLong
    assert(math.abs(ctl(2L) - ln4) <= 4, s"uniform-4 entropy ${ctl(2L)} != ~$ln4")
    assert(math.abs(ctl(3L) - ln2) <= 2, s"uniform-2 entropy ${ctl(3L)} != ~$ln2")

    val rows = TrainingData.queries("t_token_entropy")(spark, sf).collect()
    assert(rows.length == spark.read.parquet(s"$sf/documents.parquet").count())
    rows.foreach { r =>
      val (n, k, e) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(k <= n)
      assert(e >= 0L, s"doc ${r.getLong(0)}: negative entropy $e")
      // per-term floors only shave, so ln(k) (+1 micro-nat slack per term)
      // upper-bounds the quantized sum
      assert(e <= (math.log(k.toDouble) * 1e6).toLong + k,
        s"doc ${r.getLong(0)}: entropy $e above ln(distinct)=ln($k)")
    }
  }
}
