package graft.format

import org.scalacheck.{Gen, Prop, Properties}
import java.nio.file.Files

/** ScalaCheck property round-trips (FIXTURES.md): arbitrary values, null
  * densities, page sizes and codec settings — write(read(x)) == x for every
  * lane, adaptive or forced-common.
  */
object FormatProperties extends Properties("graft.format.roundtrip") {

  private def rt(lane: Int, nullable: Boolean, vec: Vec, opts: WriteOptions): Vec = {
    val f = Files.createTempFile("graft-prop", ".graft")
    try {
      val os = new java.io.BufferedOutputStream(Files.newOutputStream(f))
      val w = new GraftFileWriter(os, "{}", opts)
      w.start()
      w.writeChunk(Seq(LeafCol(lane, nullable, vec)), vec.n)
      w.finish()
      os.close()
      val in = new LocalFileInput(f)
      try {
        new LeafReader(in, GraftFileReader.readFooter(in).leaves(0), lane, nullable).readAll()
      } finally in.close()
    } finally Files.deleteIfExists(f)
  }

  private val genOpts: Gen[WriteOptions] = for {
    pageSize <- Gen.choose(64, 4096)
    codec <- Gen.oneOf(Codec.Lz4, Codec.Zstd, Codec.None)
    adaptive <- Gen.oneOf(true, false)
    ratio <- Gen.choose(1.0, 3.0)
  } yield WriteOptions(defaultCodec = codec, pageSize = pageSize,
    adaptive = adaptive, compressRatio = ratio)

  private def genNulls(n: Int): Gen[Array[Boolean]] =
    Gen.oneOf(
      Gen.const(null: Array[Boolean]),
      Gen.containerOfN[Array, Boolean](n, Gen.prob(0.3)))

  private def eqAt(a: Vec, b: Vec, i: Int): Boolean = (a, b) match {
    case (x: IntVec, y: IntVec) => x.values(i) == y.values(i)
    case (x: LongVec, y: LongVec) => x.values(i) == y.values(i)
    case (x: DoubleVec, y: DoubleVec) =>
      java.lang.Double.doubleToLongBits(x.values(i)) == java.lang.Double.doubleToLongBits(y.values(i))
    case (x: FloatVec, y: FloatVec) =>
      java.lang.Float.floatToIntBits(x.values(i)) == java.lang.Float.floatToIntBits(y.values(i))
    case (x: BoolVec, y: BoolVec) => x.values(i) == y.values(i)
    case (x: BinaryVec, y: BinaryVec) => java.util.Arrays.equals(x(i), y(i))
    case _ => false
  }

  private def check(lane: Int, vec: Vec, opts: WriteOptions): Prop = {
    val nullable = vec.nulls != null
    val got = rt(lane, nullable, vec, opts)
    Prop(got.n == vec.n && (0 until vec.n).forall { i =>
      got.isNull(i) == vec.isNull(i) && (vec.isNull(i) || eqAt(vec, got, i))
    })
  }

  property("longs") = Prop.forAll(
    Gen.choose(0, 3000).flatMap(n => for {
      vals <- Gen.containerOfN[Array, Long](n, Gen.chooseNum(Long.MinValue, Long.MaxValue))
      nulls <- genNulls(n)
    } yield LongVec(n, nulls, vals)), genOpts) { (v: LongVec, o: WriteOptions) =>
    check(Lane.I64, v, o)
  }

  property("ints-small-range") = Prop.forAll(
    Gen.choose(0, 3000).flatMap(n => for {
      base <- Gen.chooseNum(Int.MinValue + 100, Int.MaxValue - 100)
      vals <- Gen.containerOfN[Array, Int](n, Gen.choose(base - 50, base + 50))
      nulls <- genNulls(n)
    } yield IntVec(n, nulls, vals)), genOpts) { (v: IntVec, o: WriteOptions) =>
    check(Lane.I32, v, o)
  }

  property("doubles") = Prop.forAll(
    Gen.choose(0, 2000).flatMap(n => for {
      vals <- Gen.containerOfN[Array, Double](n,
        Gen.oneOf(Gen.chooseNum(-1e12, 1e12), Gen.oneOf(0.0, -0.0, 1.5, Double.NaN,
          Double.PositiveInfinity, Double.MinPositiveValue)))
      nulls <- genNulls(n)
    } yield DoubleVec(n, nulls, vals)), genOpts) { (v: DoubleVec, o: WriteOptions) =>
    check(Lane.F64, v, o)
  }

  property("strings") = Prop.forAll(
    Gen.choose(0, 1500).flatMap(n => for {
      words <- Gen.containerOfN[Array, String](n,
        Gen.oneOf(Gen.alphaNumStr.map(_.take(12)), Gen.oneOf("", "same", "other")))
      nulls <- genNulls(n)
    } yield {
      val b = new BinaryVecBuilder()
      var i = 0
      while (i < n) {
        if (nulls != null && nulls(i)) b.appendNull() else b.append(words(i).getBytes("UTF-8"))
        i += 1
      }
      b.result().asInstanceOf[BinaryVec]
    }), genOpts) { (v: BinaryVec, o: WriteOptions) =>
    check(Lane.Bin, v, o)
  }

  property("bools") = Prop.forAll(
    Gen.choose(0, 3000).flatMap(n => for {
      vals <- Gen.containerOfN[Array, Boolean](n, Gen.prob(0.8))
      nulls <- genNulls(n)
    } yield BoolVec(n, nulls, vals)), genOpts) { (v: BoolVec, o: WriteOptions) =>
    check(Lane.Bool, v, o)
  }
  // Bloom soundness: an added value must ALWAYS test positive (a false
  // negative would let a zone-map probe skip a page that holds the value —
  // wrong results, not just a missed optimization). Checked for both hash
  // domains at every filter size the adaptive sizing produces.
  property("bloom-no-false-negatives-longs") = Prop.forAll(
    Gen.containerOf[List, Long](Gen.chooseNum(Long.MinValue, Long.MaxValue)),
    Gen.oneOf(64, 128, 1024, 16384)) { (vs: List[Long], bytes: Int) =>
    val bits = new Array[Byte](bytes)
    vs.foreach(v => BloomUtil.add(bits, BloomUtil.hashLong(v)))
    Prop(vs.forall(v => BloomUtil.mightContain(bits, BloomUtil.hashLong(v))))
  }

  property("bloom-no-false-negatives-bytes") = Prop.forAll(
    Gen.containerOf[List, String](Gen.asciiPrintableStr),
    Gen.oneOf(64, 256, 4096)) { (vs: List[String], bytes: Int) =>
    val bits = new Array[Byte](bytes)
    val bs = vs.map(_.getBytes("UTF-8"))
    bs.foreach(b => BloomUtil.add(bits, BloomUtil.hashBytes(b, 0, b.length)))
    Prop(bs.forall(b => BloomUtil.mightContain(bits, BloomUtil.hashBytes(b, 0, b.length))))
  }

  // fpr sanity at the adaptive operating point (~10 bits/value): absent
  // probes should rarely pass — this bounds accidental hash degeneracy
  // (e.g. all probes landing on one bit), not the exact analytic rate
  property("bloom-prunes-absent-values") = Prop.forAll(Gen.choose(1L, 1L << 40)) { seed =>
    val bits = new Array[Byte](2048) // 16384 bits for 1500 values
    (0 until 1500).foreach(i => BloomUtil.add(bits, BloomUtil.hashLong(seed + i)))
    val falsePos = (0 until 1000).count(i =>
      BloomUtil.mightContain(bits, BloomUtil.hashLong(seed + 1000000 + i)))
    Prop(falsePos < 150) :| s"false positives: $falsePos/1000"
  }

}
