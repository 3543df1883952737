package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-19 native kernels bit-for-bit against the SQL / window
  * plans they replaced (the optimization contract: same results, fewer
  * allocations/exchanges):
  *
  *  - VecOps.SimhashFold vs the aggregate-over-bits HOF (incl. the NULL
  *    array → 0, empty array → all-bits, null-element corners);
  *  - VecOps.NearestCentroid vs crossJoin + row_number() (incl. cid
  *    tie-breaks, zero-norm null ordering, length-mismatch null ordering);
  *  - VecOps.PqEncode vs the explode(m) + window argmin;
  *  - TriangleSums covariance cells vs the zip_with/explode decimal plan
  *    (exact decimal(38,0) equality via the n²·S − n·sx·sx identity).
  */
class KernelParitySpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("SimhashFold == aggregate-over-bits SQL, corners included") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows: Seq[(Long, Option[Seq[Option[Long]]])] =
      (0L until 200L).map { i =>
        val n = rng.nextInt(40)
        (i, Some(Seq.tabulate(n)(j =>
          if ((i + j) % 17 == 0) None else Some(rng.nextLong()))))
      } ++ Seq(
        (1000L, Some(Seq.empty[Option[Long]])), // empty → every bit set
        (1001L, None), // NULL array → 0
        (1002L, Some(Seq(None, None)))) // all-null elements
    val df = rows.toDF("id", "hs")
    Seq(60, 64).foreach { nbits =>
      val sqlForm = df.withColumn("sim", expr(
        s"""aggregate(sequence(0, ${nbits - 1}), cast(0 as bigint),
             (acc, b) -> acc + CASE
               WHEN size(filter(hs, h -> ((h >> b) & 1) = 1)) * 2 >= size(hs)
               THEN shiftleft(cast(1 as bigint), b) ELSE cast(0 as bigint) END)"""))
      val kernel = df.withColumn("sim", VecOps.simhashFolded(col("hs"), nbits))
      assert(sorted(kernel) == sorted(sqlForm), s"nbits=$nbits")
    }
  }

  /** Random quantized vectors with engineered ties: several centroids share
    * the same vector under different cids, plus a zero vector (NaN cosine)
    * and a length-mismatched centroid (null cosine / null d2).
    */
  private def vecRows(rng: scala.util.Random, n: Int, d: Int): Seq[(Long, Seq[Long])] =
    (0 until n).map { i =>
      if (i == 3) (i.toLong, Seq.fill(d)(0L)) // zero vector
      else (i.toLong, Seq.fill(d)(rng.nextInt(2001).toLong - 1000L))
    }

  test("NearestCentroid == crossJoin + window argmax, ties/NaN/null included") {
    import spark.implicits._
    // under ANSI (the Spark 4 default) the WINDOW form's double division
    // THROWS on a zero-norm vector (unreachable for the gated corpus);
    // non-ANSI division yields NULL on a 0 divisor — which is the corner
    // this test pins: the kernel ranks a zero-norm candidate null-last,
    // exactly like the window's desc NULLS LAST
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
    val rng = new scala.util.Random(11)
    val d = 8
    val e = vecRows(rng, 64, d).toDF("vec_id", "q")
      .withColumn("nn", VecOps.longNormSq(col("q")))
    val base = vecRows(new scala.util.Random(12), 6, d)
    val centRows = base ++ Seq(
      (100L, base(1)._2), // duplicate vector, different cid → cosine tie
      (101L, base(1)._2),
      (102L, Seq.fill(d)(0L)), // zero centroid → NULL cosine (0 divisor)
      (103L, Seq.fill(d + 2)(1L))) // length mismatch → null cosine
    val cents = centRows.toDF("cid", "cq")
      .withColumn("cn", VecOps.longNormSq(col("cq")))
    val windowForm = e.crossJoin(broadcast(cents))
      .withColumn("cdot", VecOps.longDot(col("q"), col("cq")))
      .withColumn("ccos", col("cdot").cast("double") /
        (sqrt(col("nn").cast("double")) * sqrt(col("cn").cast("double"))))
      .withColumn("crk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cid"))))
      .filter(col("crk") === 1)
      .select(col("vec_id"), col("cid"))
    val cb = cents.agg(collect_list(struct(col("cid"), col("cq"), col("cn"))).as("cb"))
    val kernelForm = e.crossJoin(broadcast(cb))
      .select(col("vec_id"), VecOps.nearestCentroidCol(col("q"), col("cb")).as("cid"))
    assert(sorted(kernelForm) == sorted(windowForm))
    } finally spark.conf.unset("spark.sql.ansi.enabled")
  }

  test("PqEncode == explode(m) + window argmin, ties included") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val M = 4; val sub = 4; val d = M * sub
    val e = vecRows(rng, 64, d).toDF("vec_id", "q")
    val base = vecRows(new scala.util.Random(29), 8, d)
    val centRows = base ++ Seq((50L, base(2)._2), (51L, base(2)._2)) // d2 ties
    val cents = centRows.toDF("cid", "cq")
    val windowForm = e.crossJoin(broadcast(cents))
      .withColumn("m", explode(expr(s"sequence(0, ${M - 1})")))
      .withColumn("d2", VecOps.longL2(
        expr(s"slice(q, m*$sub+1, $sub)"), expr(s"slice(cq, m*$sub+1, $sub)")))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("vec_id"), col("m")).orderBy(col("d2"), col("cid"))))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("m"), col("cid").as("code"))
    val cb = cents.agg(collect_list(struct(col("cid"), col("cq"))).as("cb"))
    val kernelForm = e.crossJoin(broadcast(cb))
      .select(col("vec_id"),
        posexplode(VecOps.pqEncodeCol(col("q"), col("cb"), M, sub))
          .as(Seq("m", "code")))
    assert(sorted(kernelForm) == sorted(windowForm))
  }

  test("TriangleSums covariance cells == the zip_with/explode decimal plan") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    val d = 6
    val e = vecRows(rng, 100, d).toDF("vec_id", "q")
    // the replaced plan, verbatim (covCells pre-r19)
    val sums = e.select(posexplode(col("q")).as(Seq("pos", "x")))
      .groupBy(col("pos")).agg(sum(col("x")).as("sx"), count(lit(1)).as("cnt"))
      .agg(expr("transform(sort_array(collect_list(struct(pos, sx))), p -> p.sx)")
          .as("sxarr"),
        max(col("cnt")).as("n"))
    val oldCells = e.crossJoin(broadcast(sums))
      .withColumn("dd", expr(
        """zip_with(q, sxarr, (x, sx) -> cast(
             cast(x as decimal(19,0)) * cast(n as decimal(19,0)) - cast(sx as decimal(19,0))
           as decimal(19,0)))"""))
      .select(explode(expr(
        """flatten(transform(sequence(1, size(dd)), i ->
             transform(sequence(i, size(dd)), j -> named_struct(
               'i', i - 1, 'j', j - 1,
               'p', element_at(dd, i) * element_at(dd, j)))))""")).as("c"))
      .groupBy(col("c.i").as("pos_i"), col("c.j").as("pos_j"))
      .agg(sum(col("c.p")).as("covn"))
    // the aggregate + recombination, as covCells now plans it
    val newCells = e
      .agg(AggOps.triangleSums(col("q")).as("ts"))
      .select(col("ts.n").as("n"), col("ts.sx").as("sx"), col("ts.tri").as("tri"))
      .select(col("n"), col("sx"), col("tri"), explode(expr(
        """flatten(transform(sequence(1, size(sx)), i ->
             transform(sequence(i, size(sx)), j ->
               named_struct('i', i - 1, 'j', j - 1))))""")).as("c"))
      .select(col("c.i").as("pos_i"), col("c.j").as("pos_j"), expr(
        """cast(
             cast(n as decimal(19,0)) * cast(n as decimal(19,0)) *
               cast(element_at(tri, cast(
                 c.i * size(sx) - (c.i * (c.i - 1)) div 2 + (c.j - c.i) + 1 as int))
                 as decimal(19,0))
             - cast(n as decimal(19,0)) *
               cast(element_at(sx, c.i + 1) as decimal(19,0)) *
               cast(element_at(sx, c.j + 1) as decimal(19,0))
           as decimal(38,0))""").as("covn"))
    // types must match too (covn decimal(38,0) feeds the power iteration)
    assert(newCells.schema("covn").dataType == oldCells.schema("covn").dataType,
      s"${newCells.schema("covn").dataType} != ${oldCells.schema("covn").dataType}")
    assert(sorted(newCells) == sorted(oldCells))
    // empty input: the old plan emitted zero cell rows
    val empty = Seq.empty[(Long, Seq[Long])].toDF("vec_id", "q")
    val emptyCells = empty.agg(AggOps.triangleSums(col("q")).as("ts"))
      .select(col("ts.sx").as("sx"))
      .select(explode(expr(
        "flatten(transform(sequence(1, size(sx)), i -> array(i)))")))
    assert(emptyCells.count() == 0)
  }

  test("quality punct: length-diff == size(regexp_extract_all) for a 1-char class") {
    import spark.implicits._
    val df = Seq("a,b!! c?", "", "plain text 123", "!!!", "déjà vu, café.")
      .toDF("text")
    val a = df.select(expr("size(regexp_extract_all(text, '[^a-zA-Z0-9 ]', 0))").as("p"))
    val b = df.select(expr(
      "length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', ''))").as("p"))
    assert(sorted(a) == sorted(b))
  }

  // ------------------------------------------------- round-20 text kernels

  /** Texts covering the span-tokenization corners: short (<4 words),
    * exactly 4, longer, consecutive/leading/trailing spaces (empty
    * tokens), unicode (multi-byte never splits), empty string, and the
    * <3-word minhash fallback shapes.
    */
  private def textRows: Seq[(Long, String)] = Seq(
    (0L, "the quick brown fox jumps over"),
    (1L, "a b c d"),
    (2L, "too short"),
    (3L, "    "),
    (4L, "x  y z  w q"),
    (5L, "déjà vu café ok ☃ done"),
    (6L, ""),
    (7L, "one two three four five six seven eight nine"),
    (8L, " leading and trailing "),
    (9L, "single"))

  private val fourGramsSql =
    """CASE WHEN size(w) >= 4
         THEN transform(sequence(0, size(w)-4), i -> array_join(slice(w, i+1, 4), ' '))
         ELSE array() END"""

  test("FourGramMd5Text / FourGramsText == split + transform+slice+array_join (+unhex(md5))") {
    import spark.implicits._
    val df = textRows.toDF("id", "text").withColumn("w", split(col("text"), " "))
    // binary values render as object identity in Row.toString — compare hex
    val sqlMd5 = df.select(col("id"),
      explode(expr(fourGramsSql)).as("g"))
      .select(col("id"), hex(unhex(md5(col("g")))).as("gh"))
    val kernelMd5 = df.select(col("id"),
      explode(TextOps.fourGramMd5TextCol(col("text"))).as("gh0"))
      .select(col("id"), hex(col("gh0")).as("gh"))
    assert(sorted(kernelMd5) == sorted(sqlMd5))
    val sqlStr = df.select(col("id"), explode(expr(fourGramsSql)).as("g"))
    val kernelStr = df.select(col("id"),
      explode(TextOps.fourGramsTextCol(col("text"))).as("g"))
    assert(sorted(kernelStr) == sorted(sqlStr))
  }

  test("SegmentMd5Text == split + transform+slice+array_join+unhex(md5), short tail included") {
    import spark.implicits._
    val df = textRows.toDF("id", "text").withColumn("w", split(col("text"), " "))
    val sqlForm = df.select(col("id"), explode(expr(
      """transform(sequence(0, cast(ceil(size(w)/4.0) as int) - 1),
           i -> array_join(slice(w, i*4+1, 4), ' '))""")).as("seg"))
      .select(col("id"), hex(unhex(md5(col("seg")))).as("seg_h"))
    val kernelForm = df.select(col("id"),
      explode(TextOps.segmentMd5TextCol(col("text"))).as("seg_h0"))
      .select(col("id"), hex(col("seg_h0")).as("seg_h"))
    assert(sorted(kernelForm) == sorted(sqlForm))
  }

  private val portableHashSql =
    """transform(transform(shingles, s0 -> substr(md5(s0), 1, 15)),
        h -> aggregate(sequence(1, 15), cast(0 as bigint),
          (acc, i) -> acc * 16 + (instr('0123456789abcdef', substr(h, i, 1)) - 1)))"""

  test("MinhashSigText == split + 3-gram shingles + hash + VecOps.minhashSig, both hash variants") {
    import spark.implicits._
    val df = textRows.toDF("id", "text").withColumn("w", split(col("text"), " "))
      .withColumn("shingles", expr(
        """CASE WHEN size(w) >= 3
           THEN transform(sequence(0, size(w)-3),
                i -> concat(element_at(w, i+1), ' ', element_at(w, i+2), ' ', element_at(w, i+3)))
           ELSE array(text) END"""))
    for (portable <- Seq(true, false)) {
      val baseHash =
        if (portable) portableHashSql
        else "transform(shingles, sh -> pmod(xxhash64(sh), 1000000007))"
      val sqlForm = df
        .withColumn("hb", expr(baseHash))
        .select(col("id"), VecOps.minhashSignature(col("hb")).as("sig"))
      val kernelForm = df.select(col("id"),
        TextOps.minhashSigTextCol(col("text"), portable).as("sig"))
      assert(sorted(kernelForm) == sorted(sqlForm), s"portable=$portable")
    }
  }

  test("SimhashText == split + per-word hash + VecOps.simhashFold, both hash variants") {
    import spark.implicits._
    val df = textRows.toDF("id", "text")
      .withColumn("shingles", split(col("text"), " ")) // word array for the SQL side
    for (portable <- Seq(true, false)) {
      val nbits = if (portable) 60 else 64
      val wordHash =
        if (portable) portableHashSql
        else "transform(shingles, w -> xxhash64(w))"
      val sqlForm = df
        .withColumn("hs", expr(wordHash))
        .select(col("id"), VecOps.simhashFolded(col("hs"), nbits).as("sim"))
      val kernelForm = df.select(col("id"),
        TextOps.simhashTextCol(col("text"), portable).as("sim"))
      assert(sorted(kernelForm) == sorted(sqlForm), s"portable=$portable")
    }
  }

  test("BloomPos3 == the hex-nibble-fold positions off md5(prefix||g)") {
    import spark.implicits._
    val m = 8192
    def bfPos(j: Int): String =
      s"""pmod(aggregate(transform(sequence(1, 10),
            i -> cast(instr('0123456789abcdef',
                   substr(h, ${j * 10} + i, 1)) - 1 as bigint)),
          cast(0 as bigint), (a, x) -> a * 16 + x), $m)"""
    val df = Seq("the quick brown fox", "", "déjà vu café ☃", "a b c d",
      "x y z w", "1 2 3 4").toDF("g")
    val sqlForm = df
      .withColumn("h", md5(concat(lit("bf:"), col("g"))))
      .select(col("g"), expr(s"array(${bfPos(0)}, ${bfPos(1)}, ${bfPos(2)})").as("ps"))
    val kernelForm = df.select(col("g"), TextOps.bloomPos3Col(col("g"), "bf:", m).as("ps"))
    assert(sorted(kernelForm) == sorted(sqlForm))
  }

  test("QualityStats == (size(split), stop filter, punct length-diff), corners included") {
    import spark.implicits._
    val df = Seq(
      "the quick brown fox", "a", "", "   ", "the the a a the",
      "déjà vu, café ☃ !", "plain text 123", "a,b!! c?", "trailing space ",
      " leading", "double  space", "the!a the a!", "áéíóú").toDF("text")
    val sqlForm = df
      .withColumn("w", split(col("text"), " "))
      .select(col("text"),
        expr("size(w)").as("n_words"),
        expr("size(filter(w, x -> x IN ('the','a')))").as("stop_hits"),
        expr("length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', ''))").as("punct"))
    val kernelForm = df
      .withColumn("qs", TextOps.qualityStatsCol(col("text")))
      .select(col("text"), col("qs.n_words").as("n_words"),
        col("qs.stop_hits").as("stop_hits"), col("qs.punct").as("punct"))
    assert(kernelForm.schema == sqlForm.schema,
      s"${kernelForm.schema} != ${sqlForm.schema}")
    assert(sorted(kernelForm) == sorted(sqlForm))
  }

  test("LangScoresText == the five size(filter(split(...))) passes") {
    import spark.implicits._
    val df = (textRows ++ Seq(
      (100L, "the a join data filter customer"),
      (101L, "fast slow hash merge batch batch"),
      (102L, "the  query part"))).toDF("id", "text")
      .withColumn("w", split(col("text"), " "))
    val sqlForm = df.select(
      expr("size(filter(w, x -> x IN ('the','a','fast','slow')))").as("s_en"),
      expr("size(filter(w, x -> x IN ('join','hash','merge','batch')))").as("s_de"),
      expr("size(filter(w, x -> x IN ('data','table','row','scan')))").as("s_es"),
      expr("size(filter(w, x -> x IN ('filter','order','column','small')))").as("s_fr"),
      expr("size(filter(w, x -> x IN ('customer','query','value','part')))").as("s_zh"))
    val kernelForm = df.withColumn("ls", TextOps.langScoresTextCol(col("text")))
      .select(col("ls.s_en").as("s_en"), col("ls.s_de").as("s_de"),
        col("ls.s_es").as("s_es"), col("ls.s_fr").as("s_fr"), col("ls.s_zh").as("s_zh"))
    assert(kernelForm.schema == sqlForm.schema)
    assert(sorted(kernelForm) == sorted(sqlForm))
  }

  test("kernel qualityScoreMilli == the expression-form score, bit for bit") {
    import spark.implicits._
    val df = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b c d e f g h", "short", "punct!!! heavy??? text...",
      "the the the a a a", "x" * 600 + " the a end").toDF("text")
    val legacy = df
      .withColumn("w", split(col("text"), " "))
      .select(col("text"), expr(
        """400L * least(length(text), 500) div 500
           + 300L * size(filter(w, x -> x IN ('the','a'))) div size(w)
           + 300L * length(regexp_replace(text, '[^a-zA-Z0-9 ]', '')) div length(text)""")
        .as("score_milli"))
    val kernel = df
      .withColumn("qs", TextOps.qualityStatsCol(col("text")))
      .select(col("text"), expr(
        """400L * least(length(text), 500) div 500
           + 300L * qs.stop_hits div qs.n_words
           + 300L * (length(text) - qs.punct) div length(text)""").as("score_milli"))
    assert(kernel.schema == legacy.schema)
    assert(sorted(kernel) == sorted(legacy))
  }
}
