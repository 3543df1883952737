package graft.format

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Codec-targeted shapes from FIXTURES.md F3 (mirroring the reference's
  * tests/it/io.rs corpus): each special codec is (a) chosen by the adaptive
  * chooser on its natural shape, (b) correct on round-trip, (c) correct when
  * forced.
  */
class CodecSpec extends AnyFunSuite {

  private def writeRead(lane: Int, nullable: Boolean, vec: Vec, opts: WriteOptions):
      (Vec, Array[GraftStat.PageInfo]) = {
    val f = Files.createTempFile("graft-codec", ".graft")
    try {
      val os = new java.io.BufferedOutputStream(Files.newOutputStream(f))
      val w = new GraftFileWriter(os, "{}", opts)
      w.start()
      w.writeChunk(Seq(LeafCol(lane, nullable, vec)), vec.n)
      w.finish()
      os.close()
      val specs = Array((lane, nullable))
      val stat = GraftStat.describeFile(f, specs)
      val in = new LocalFileInput(f)
      try {
        val footer = GraftFileReader.readFooter(in)
        (new LeafReader(in, footer.leaves(0), lane, nullable).readAll(), stat(0).pages)
      } finally in.close()
    } finally Files.deleteIfExists(f)
  }

  private def assertEq(expected: Vec, got: Vec): Unit = {
    assert(got.n == expected.n)
    var i = 0
    while (i < expected.n) {
      assert(got.isNull(i) == expected.isNull(i), s"null mismatch at $i")
      if (!expected.isNull(i)) (expected, got) match {
        case (a: BoolVec, b: BoolVec) => assert(a.values(i) == b.values(i), s"at $i")
        case (a: IntVec, b: IntVec) => assert(a.values(i) == b.values(i), s"at $i")
        case (a: LongVec, b: LongVec) => assert(a.values(i) == b.values(i), s"at $i")
        case (a: FloatVec, b: FloatVec) => assert(a.values(i) == b.values(i), s"at $i")
        case (a: DoubleVec, b: DoubleVec) => assert(a.values(i) == b.values(i), s"at $i")
        case (a: BinaryVec, b: BinaryVec) => assert(java.util.Arrays.equals(a(i), b(i)), s"at $i")
        case other => fail(s"type mismatch $other")
      }
      i += 1
    }
  }

  private def nullsFor(n: Int, density: Double, seed: Long): Array[Boolean] =
    if (density <= 0) null
    else { val r = new scala.util.Random(seed); Array.fill(n)(r.nextDouble() < density) }

  private val adaptive = WriteOptions(pageSize = 2048, compressRatio = 1.2)

  private def fileBytes(lane: Int, vec: Vec, opts: WriteOptions): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val w = new GraftFileWriter(bos, "{}", opts)
    w.start()
    w.writeChunk(Seq(LeafCol(lane, nullable = false, vec)), vec.n)
    w.finish()
    bos.toByteArray
  }

  test("bitpack handles widths above 56 bits; delta overflow falls back safely") {
    val n = 4096
    // range needs 62 bits -> previously fell to block codecs
    val r = new scala.util.Random(11)
    val wide = Array.fill(n)(r.nextLong() & ((1L << 62) - 1))
    val wvec = LongVec(n, null, wide)
    val (gotW, pagesW) = writeRead(Lane.I64, nullable = false, wvec,
      WriteOptions(forcedCodec = Some(Codec.Bitpack)))
    assert(pagesW.forall(_.codec == Codec.Bitpack))
    assert(pagesW.forall(p => p.body.bits > 56), pagesW.map(_.body.bits).mkString(","))
    assertEq(wvec, gotW)

    // full-width: negative + positive extremes (range wraps past u64 -> the
    // chooser must NOT pick Bitpack/Delta, and round-trip must still hold)
    val extremes = Array.tabulate(n)(i =>
      if (i % 2 == 0) Long.MinValue + (i % 97) else Long.MaxValue - (i % 89))
    val evec = LongVec(n, null, extremes)
    val (gotE, _) = writeRead(Lane.I64, nullable = false, evec, adaptive)
    assertEq(evec, gotE)

    // sorted but delta > Long.MaxValue inside one page: DeltaBitpack must
    // refuse (the wrapped delta used to under-size the bit width and
    // corrupt silently)
    val overflow = Array.tabulate(n)(i =>
      if (i < 1000) Long.MinValue + i else Long.MaxValue - (n - i))
    val ovec = LongVec(n, null, overflow)
    val (gotO, pagesO) = writeRead(Lane.I64, nullable = false, ovec,
      WriteOptions(pageSize = 8192))
    assert(pagesO.forall(_.codec != Codec.DeltaBitpack),
      s"delta overflow page must not choose DeltaBitpack: ${pagesO.map(_.codec).mkString(",")}")
    assertEq(ovec, gotO)
  }

  test("patas ring reference beats XOR-prev on interleaved series") {
    val n = 8192
    // two interleaved drifting series: XOR against the previous value flips
    // nearly every byte, but the offset-2 reference (same series) differs
    // only in low mantissa bytes
    val vals = Array.tabulate(n) { i =>
      if (i % 2 == 0) 1000.0 + (i / 2) * 1e-6 else -55555.5 - (i / 2) * 1e-6
    }
    val vec = DoubleVec(n, null, vals)
    val (got, pages) = writeRead(Lane.F64, nullable = false, vec,
      WriteOptions(forcedCodec = Some(Codec.Patas)))
    assert(pages.forall(_.codec == Codec.Patas))
    assertEq(vec, got)
    // prev-only XOR needs ~9 bytes/value here; the ring reference stays
    // comfortably below that
    val bytes = pages.map(_.compressedLen.toLong).sum
    assert(bytes < n * 7L, s"ring patas should beat prev-only XOR, got $bytes bytes")
  }

  test("sampled chooser beats analytic mis-rank and stays deterministic") {
    // short runs (3) of small-range pseudo-random longs: the analytic
    // chooser ranks Bitpack/RLE viable, but zstd on the byte stream (mostly
    // zero high bytes + repeated runs) is actually smaller — only the
    // sampled trial detects that
    val n = 8192
    val vals = Array.tabulate(n)(i => math.abs((i / 3) * 2654435761L) % (1L << 40))
    val vec = LongVec(n, null, vals)
    val analytic = WriteOptions(defaultCodec = Codec.Zstd, sampledChooser = false)
    val sampled = WriteOptions(defaultCodec = Codec.Zstd, sampledChooser = true)

    val aBytes = fileBytes(Lane.I64, vec, analytic)
    val sBytes = fileBytes(Lane.I64, vec, sampled)

    // choosers disagree: analytic picks a special codec, sampled measures
    // the block codec as smaller
    val (gotA, pagesA) = writeRead(Lane.I64, nullable = false, vec, analytic)
    val (gotS, pagesS) = writeRead(Lane.I64, nullable = false, vec, sampled)
    assert(pagesA.forall(p => !Codec.isCommon(p.codec)),
      s"analytic should pick a special codec, got ${pagesA.map(_.codec).mkString(",")}")
    assert(pagesS.forall(p => Codec.isCommon(p.codec)),
      s"sampled should fall to the block codec, got ${pagesS.map(_.codec).mkString(",")}")
    // and the sampled choice wins on ACTUAL file size
    assert(sBytes.length < aBytes.length,
      s"sampled ${sBytes.length}B should beat analytic ${aBytes.length}B")
    // both decode identically
    assertEq(vec, gotA)
    assertEq(vec, gotS)
    // deterministic output across writes
    assert(java.util.Arrays.equals(sBytes, fileBytes(Lane.I64, vec, sampled)))
  }

  test("float lane: sampled chooser falls back to block codec on noisy pages") {
    // same mis-rank shape as the long-lane case, viewed as double bit
    // patterns (positive denormals): the analytic float chooser ranks a
    // delegated integer codec (or Patas) viable, but zstd on the byte
    // stream is measurably smaller — only the sampled trial detects that
    val n = 8192
    val vals = Array.tabulate(n)(i =>
      java.lang.Double.longBitsToDouble(math.abs((i / 3) * 2654435761L) % (1L << 40)))
    val vec = DoubleVec(n, null, vals)
    val analytic = WriteOptions(defaultCodec = Codec.Zstd, sampledChooser = false)
    val sampled = WriteOptions(defaultCodec = Codec.Zstd, sampledChooser = true)

    val (gotA, pagesA) = writeRead(Lane.F64, nullable = false, vec, analytic)
    val (gotS, pagesS) = writeRead(Lane.F64, nullable = false, vec, sampled)
    assert(pagesA.forall(p => !Codec.isCommon(p.codec)),
      s"analytic should pick a special codec, got ${pagesA.map(_.codec).mkString(",")}")
    assert(pagesS.forall(p => Codec.isCommon(p.codec)),
      s"sampled should fall to the block codec, got ${pagesS.map(_.codec).mkString(",")}")
    assert(fileBytes(Lane.F64, vec, sampled).length < fileBytes(Lane.F64, vec, analytic).length)
    assertEq(vec, gotA)
    assertEq(vec, gotS)
  }

  test("codec tree exposes dict cardinality, freq exceptions, bitpack widths") {
    val n = 4096
    // dict shape: 8 distinct values
    val dvals = Array.tabulate(n)(i => Array(3L, 17L, 123456L, -9L, 42L, 7L, 8L, 100L)(i % 8))
    val (_, dictPages) = writeRead(Lane.I64, nullable = false, LongVec(n, null, dvals),
      WriteOptions(forcedCodec = Some(Codec.Dict)))
    assert(dictPages.forall(_.body.codec == Codec.Dict))
    assert(dictPages.forall(_.body.cardinality == 8),
      dictPages.map(_.body.cardinality).mkString(","))
    // the dict indices are a nested frame with its own codec
    assert(dictPages.forall(_.body.children.nonEmpty))

    // freq shape: dominant value + 1% exceptions
    val fvals = Array.tabulate(n)(i => if (i % 100 == 0) i.toLong else 5L)
    val (_, freqPages) = writeRead(Lane.I64, nullable = false, LongVec(n, null, fvals),
      WriteOptions(forcedCodec = Some(Codec.Freq)))
    assert(freqPages.forall(_.body.codec == Codec.Freq))
    assert(freqPages.map(_.body.exceptions).sum == (n + 99) / 100, // i = 0, 100, ..., 4000
      freqPages.map(_.body.exceptions).mkString(","))
    assert(freqPages.forall(_.body.children.nonEmpty))

    // bitpack shape: range 0..1023 -> 10 bits
    val bvals = Array.tabulate(n)(i => (i % 1024).toLong)
    val (_, bpPages) = writeRead(Lane.I64, nullable = false, LongVec(n, null, bvals),
      WriteOptions(forcedCodec = Some(Codec.Bitpack)))
    assert(bpPages.forall(_.body.codec == Codec.Bitpack))
    assert(bpPages.forall(_.body.bits == 10), bpPages.map(_.body.bits).mkString(","))

    // rle shape: run count surfaces
    val rvals = Array.tabulate(n)(i => (i / 512).toLong)
    val (_, rlePages) = writeRead(Lane.I64, nullable = false, LongVec(n, null, rvals),
      WriteOptions(forcedCodec = Some(Codec.Rle)))
    assert(rlePages.forall(_.body.codec == Codec.Rle))
    assert(rlePages.map(_.body.runs).sum == n / 512, rlePages.map(_.body.runs).mkString(","))
  }

  test("sorted ints choose DeltaBitpack and round-trip") {
    val n = 10240
    val vec = IntVec(n, null, Array.tabulate(n)(i => i * 3))
    val (got, pages) = writeRead(Lane.I32, nullable = false, vec, adaptive)
    assert(pages.forall(_.codec == Codec.DeltaBitpack), pages.map(_.codec).mkString(","))
    assertEq(vec, got)
  }

  test("low-cardinality ints choose Dict and round-trip (with nulls)") {
    val n = 10240
    val r = new scala.util.Random(42)
    val nulls = nullsFor(n, 0.2, 7)
    val vals = Array.fill(n)(Array(3, 17, 123456, -9, 42, 7, 8, 100)(r.nextInt(8)))
    val vec = IntVec(n, nulls, vals)
    val (got, pages) = writeRead(Lane.I32, nullable = true, vec, adaptive)
    assert(pages.forall(p => p.codec == Codec.Dict || p.codec == Codec.Bitpack),
      pages.map(_.codec).mkString(","))
    assertEq(vec, got)
  }

  test("constant column chooses OneValue") {
    val n = 8192
    val vec = LongVec(n, null, Array.fill(n)(123456789L))
    val (got, pages) = writeRead(Lane.I64, nullable = false, vec, adaptive)
    assert(pages.forall(_.codec == Codec.OneValue))
    assertEq(vec, got)
  }

  test("dominant value with outliers chooses Freq") {
    val n = 10240
    val vals = Array.fill(n)(20)
    val r = new scala.util.Random(1)
    (0 until 15).foreach(_ => vals(r.nextInt(n)) = 1000000)
    val vec = IntVec(n, null, vals)
    val (got, pages) = writeRead(Lane.I32, nullable = false, vec, adaptive)
    // RLE can legitimately beat Freq on long constant runs — accept either
    assert(pages.forall(p => p.codec == Codec.Freq || p.codec == Codec.OneValue ||
      p.codec == Codec.Rle), pages.map(_.codec).mkString(","))
    assert(pages.exists(_.codec == Codec.Freq))
    assertEq(vec, got)
  }

  test("small-range ints choose Bitpack") {
    val n = 10240
    val r = new scala.util.Random(42)
    val vec = IntVec(n, null, Array.fill(n)(r.nextInt(8) + 1000))
    val (got, pages) = writeRead(Lane.I32, nullable = false, vec, adaptive)
    assert(pages.forall(_.codec == Codec.Bitpack), pages.map(_.codec).mkString(","))
    assertEq(vec, got)
  }

  test("runs choose RLE") {
    val n = 10240
    val vec = IntVec(n, null, Array.tabulate(n)(i => (i / 500) * 7))
    val (got, pages) = writeRead(Lane.I32, nullable = false, vec, adaptive)
    assert(pages.forall(p => p.codec == Codec.Rle || p.codec == Codec.DeltaBitpack),
      pages.map(_.codec).mkString(","))
    assertEq(vec, got)
  }

  test("slowly-varying doubles choose Patas and round-trip") {
    val n = 8192
    // quantized (money-like) doubles: XORs have many trailing-zero bytes, and
    // high cardinality + sawtooth order keep Dict/DeltaBitpack/Bitpack out
    val vals = Array.tabulate(n)(i => 1000.0 + (i % 4073) * 0.25 - (i % 7) * 128.0)
    val vec = DoubleVec(n, null, vals)
    val (got, pages) = writeRead(Lane.F64, nullable = false, vec, adaptive)
    assert(pages.forall(_.codec == Codec.Patas), pages.map(_.codec).mkString(","))
    assertEq(vec, got)
  }

  test("low-cardinality doubles choose Dict-on-bits (with nulls)") {
    val n = 8192
    val r = new scala.util.Random(4)
    val choices = Array(1.5, 2.25, -17.75, 1e9)
    val vec = DoubleVec(n, nullsFor(n, 0.3, 11), Array.fill(n)(choices(r.nextInt(4))))
    val (got, pages) = writeRead(Lane.F64, nullable = true, vec, adaptive)
    assert(pages.forall(_.codec == Codec.Dict), pages.map(_.codec).mkString(","))
    assertEq(vec, got)
  }

  test("low-cardinality strings choose Dict; dominant string chooses Freq; constant OneValue") {
    val n = 8192
    val r = new scala.util.Random(5)
    def mk(vals: Int => String, nullDensity: Double, seed: Long): BinaryVec = {
      val b = new BinaryVecBuilder()
      val nulls = nullsFor(n, nullDensity, seed)
      (0 until n).foreach { i =>
        if (nulls != null && nulls(i)) b.appendNull() else b.append(vals(i).getBytes("UTF-8"))
      }
      b.result().asInstanceOf[BinaryVec]
    }
    val modes = Array("AIR", "RAIL", "SHIP", "TRUCK")
    val dictV = mk(_ => modes(r.nextInt(4)), 0.1, 21)
    val (gotD, pagesD) = writeRead(Lane.Bin, nullable = true, dictV, adaptive)
    assert(pagesD.forall(_.codec == Codec.Dict), pagesD.map(_.codec).mkString(","))
    assertEq(dictV, gotD)

    val freqV = mk(i => if (i % 100 == 7) s"rare-$i" else "dominant", 0.0, 0)
    val (gotF, pagesF) = writeRead(Lane.Bin, nullable = false, freqV, adaptive)
    assert(pagesF.forall(p => p.codec == Codec.Freq || p.codec == Codec.Dict),
      pagesF.map(_.codec).mkString(","))
    assertEq(freqV, gotF)

    val oneV = mk(_ => "same", 0.0, 0)
    val (gotO, pagesO) = writeRead(Lane.Bin, nullable = false, oneV, adaptive)
    assert(pagesO.forall(_.codec == Codec.OneValue))
    assertEq(oneV, gotO)
  }

  test("booleans: constant OneValue, runs RLE, random plain") {
    val n = 8192
    val allTrue = BoolVec(n, null, Array.fill(n)(true))
    val (g1, p1) = writeRead(Lane.Bool, nullable = false, allTrue, adaptive)
    assert(p1.forall(_.codec == Codec.OneValue))
    assertEq(allTrue, g1)

    val runs = BoolVec(n, null, Array.tabulate(n)(i => (i / 1000) % 2 == 0))
    val (g2, p2) = writeRead(Lane.Bool, nullable = false, runs, adaptive)
    assert(p2.forall(_.codec == Codec.Rle), p2.map(_.codec).mkString(","))
    assertEq(runs, g2)

    val r = new scala.util.Random(9)
    val rand = BoolVec(n, nullsFor(n, 0.2, 33), Array.fill(n)(r.nextBoolean()))
    val (g3, p3) = writeRead(Lane.Bool, nullable = true, rand, adaptive)
    assert(p3.forall(p => Codec.isCommon(p.codec)))
    assertEq(rand, g3)
  }

  test("forced codecs round-trip on random data where feasible") {
    val n = 4096
    val r = new scala.util.Random(42)
    val ints = IntVec(n, nullsFor(n, 0.1, 13), Array.fill(n)(r.nextInt(1000)))
    for (codec <- Seq(Codec.Rle, Codec.Dict, Codec.Freq, Codec.Bitpack)) {
      val (got, pages) = writeRead(Lane.I32, nullable = true, ints,
        WriteOptions(pageSize = 1024, forcedCodec = Some(codec)))
      assert(pages.forall(_.codec == codec), s"forced $codec got ${pages.map(_.codec).mkString(",")}")
      assertEq(ints, got)
    }
    val dbl = DoubleVec(n, nullsFor(n, 0.2, 17), Array.fill(n)(r.nextDouble() * 1e6))
    val (gotP, pagesP) = writeRead(Lane.F64, nullable = true, dbl,
      WriteOptions(pageSize = 1024, forcedCodec = Some(Codec.Patas)))
    assert(pagesP.forall(_.codec == Codec.Patas))
    assertEq(dbl, gotP)

    val longs = LongVec(n, null, Array.tabulate(n)(i => i.toLong * 1000003))
    val (gotL, pagesL) = writeRead(Lane.I64, nullable = false, longs,
      WriteOptions(pageSize = 1024, forcedCodec = Some(Codec.DeltaBitpack)))
    assert(pagesL.forall(_.codec == Codec.DeltaBitpack))
    assertEq(longs, gotL)
  }

  test("random data round-trips under adaptive chooser (all lanes, null densities)") {
    val n = 10000
    for (density <- Seq(0.0, 0.1, 0.5)) {
      val r = new scala.util.Random(42)
      def nn(seed: Long) = nullsFor(n, density, seed)
      val cols: Seq[(Int, Vec)] = Seq(
        Lane.Bool -> BoolVec(n, nn(1), Array.fill(n)(r.nextBoolean())),
        Lane.I8 -> IntVec(n, nn(2), Array.fill(n)(r.nextInt(256) - 128)),
        Lane.I16 -> IntVec(n, nn(3), Array.fill(n)(r.nextInt(65536) - 32768)),
        Lane.I32 -> IntVec(n, nn(4), Array.fill(n)(r.nextInt())),
        Lane.I64 -> LongVec(n, nn(5), Array.fill(n)(r.nextLong())),
        Lane.F32 -> FloatVec(n, nn(6), Array.fill(n)(r.nextFloat())),
        Lane.F64 -> DoubleVec(n, nn(7), Array.fill(n)(r.nextDouble())),
        Lane.Bin -> {
          val b = new BinaryVecBuilder()
          val nl = nn(8)
          (0 until n).foreach(i => if (nl != null && nl(i)) b.appendNull()
            else b.append(r.nextInt(1000).toString.getBytes))
          b.result()
        })
      cols.foreach { case (lane, vec) =>
        val (got, _) = writeRead(lane, density > 0, vec, adaptive)
        assertEq(vec, got)
      }
    }
  }

  test("per-family force matrix: one lane family forced, the rest adaptive") {
    // the graft analogue of the reference's per-codec debug env matrix
    // (/root/reference/src/util/env.rs:20-83): .option("forcecodec.<fam>")
    // pins a codec for ONE lane family while the others keep choosing
    val n = 4096
    val r = new scala.util.Random(21)
    def mixedChunk(opts: WriteOptions): Array[GraftStat.LeafInfo] = {
      val ints = LongVec(n, null, Array.tabulate(n)(i => (i / 64).toLong)) // runny
      val floats = DoubleVec(n, null, Array.fill(n)(r.nextDouble()))
      val strs = {
        val b = new BinaryVecBuilder()
        (0 until n).foreach(i => b.append(s"tag${i % 7}".getBytes)) // low card
        b.result()
      }
      val bools = BoolVec(n, null, Array.tabulate(n)(i => i % 2 == 0))
      val f = Files.createTempFile("graft-matrix", ".graft")
      try {
        val os = new java.io.BufferedOutputStream(Files.newOutputStream(f))
        val w = new GraftFileWriter(os, "{}", opts)
        w.start()
        w.writeChunk(Seq(LeafCol(Lane.I64, nullable = false, ints),
          LeafCol(Lane.F64, nullable = false, floats),
          LeafCol(Lane.Bin, nullable = false, strs),
          LeafCol(Lane.Bool, nullable = false, bools)), n)
        w.finish()
        os.close()
        GraftStat.describeFile(f, Array((Lane.I64, false), (Lane.F64, false),
          (Lane.Bin, false), (Lane.Bool, false)))
      } finally Files.deleteIfExists(f)
    }
    // binary forced to Dict; the sorted-runny ints stay ADAPTIVE (they
    // choose DeltaBitpack for this shape — the point is the binary force
    // did not leak onto them)
    val st1 = mixedChunk(WriteOptions(pageSize = 1024,
      forcedFamily = Map("binary" -> Codec.Dict)))
    assert(st1(2).pages.forall(_.codec == Codec.Dict),
      st1(2).pages.map(_.codec).mkString(","))
    assert(st1(0).pages.forall(_.codec == Codec.DeltaBitpack),
      st1(0).pages.map(_.codec).mkString(","))
    // ints forced to Dict; binary adaptive picks its own Dict-or-better,
    // floats forced to Patas, bools forced to Rle — all at once
    val st2 = mixedChunk(WriteOptions(pageSize = 1024,
      forcedFamily = Map("int" -> Codec.Dict, "float" -> Codec.Patas,
        "bool" -> Codec.Rle)))
    assert(st2(0).pages.forall(_.codec == Codec.Dict))
    assert(st2(1).pages.forall(_.codec == Codec.Patas))
    assert(st2(3).pages.forall(_.codec == Codec.Rle))
    // family force beats the global force where both apply
    val st3 = mixedChunk(WriteOptions(pageSize = 1024,
      forcedCodec = Some(Codec.Rle), forcedFamily = Map("int" -> Codec.Dict)))
    assert(st3(0).pages.forall(_.codec == Codec.Dict))
    assert(st3(3).pages.forall(_.codec == Codec.Rle)) // global still on bools
  }
}
