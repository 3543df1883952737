package graft.format

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Round-trip tests mirroring the reference corpus (FIXTURES.md F1/F2):
  * write -> read equality per codec, seed-42 random data with null densities.
  */
class FormatRoundTripSpec extends AnyFunSuite {

  private def rt(cols: Seq[(Int, Boolean, Vec)], numRows: Int, opts: WriteOptions): Seq[Vec] = {
    val f = Files.createTempFile("graft", ".graft")
    try {
      val os = new java.io.BufferedOutputStream(Files.newOutputStream(f))
      val w = new GraftFileWriter(os, """{"t":"test"}""", opts)
      w.start()
      w.writeChunk(cols.map { case (lane, nullable, vec) => LeafCol(lane, nullable, vec) }, numRows)
      w.finish()
      os.close()
      val in = new LocalFileInput(f)
      try {
        val footer = GraftFileReader.readFooter(in)
        assert(footer.schemaJson == """{"t":"test"}""")
        assert(footer.leaves.length == cols.length)
        cols.zipWithIndex.map { case ((lane, nullable, _), i) =>
          new LeafReader(in, footer.leaves(i), lane, nullable).readAll()
        }
      } finally in.close()
    } finally Files.deleteIfExists(f)
  }

  private def assertVecEq(expected: Vec, got: Vec): Unit = {
    assert(got.n == expected.n)
    var i = 0
    while (i < expected.n) {
      val en = expected.isNull(i)
      assert(got.isNull(i) == en, s"null mismatch at $i")
      if (!en) (expected, got) match {
        case (a: BoolVec, b: BoolVec) => assert(a.values(i) == b.values(i), s"at $i")
        case (a: IntVec, b: IntVec) => assert(a.values(i) == b.values(i), s"at $i")
        case (a: LongVec, b: LongVec) => assert(a.values(i) == b.values(i), s"at $i")
        case (a: FloatVec, b: FloatVec) => assert(a.values(i) == b.values(i), s"at $i")
        case (a: DoubleVec, b: DoubleVec) => assert(a.values(i) == b.values(i), s"at $i")
        case (a: BinaryVec, b: BinaryVec) =>
          assert(java.util.Arrays.equals(a(i), b(i)), s"at $i")
        case other => fail(s"vec type mismatch: $other")
      }
      i += 1
    }
  }

  private def mkCols(n: Int, seed: Long, nullDensity: Double): Seq[(Int, Boolean, Vec)] = {
    val rnd = new scala.util.Random(seed)
    def nulls(): Array[Boolean] =
      if (nullDensity <= 0) null else Array.fill(n)(rnd.nextDouble() < nullDensity)
    val bools = BoolVec(n, nulls(), Array.fill(n)(rnd.nextBoolean()))
    val i8 = IntVec(n, nulls(), Array.fill(n)(rnd.nextInt(256) - 128))
    val i16 = IntVec(n, nulls(), Array.fill(n)(rnd.nextInt(65536) - 32768))
    val i32 = IntVec(n, nulls(), Array.fill(n)(rnd.nextInt()))
    val i64 = LongVec(n, nulls(), Array.fill(n)(rnd.nextLong()))
    val f32 = FloatVec(n, nulls(), Array.fill(n)(rnd.nextFloat()))
    val f64 = DoubleVec(n, nulls(), Array.fill(n)(rnd.nextDouble()))
    val bb = new BinaryVecBuilder()
    val binNulls = nulls()
    (0 until n).foreach { i =>
      if (binNulls != null && binNulls(i)) bb.appendNull()
      else bb.append(rnd.nextInt(100000).toString.getBytes("UTF-8"))
    }
    Seq(
      (Lane.Bool, nullDensity > 0, bools),
      (Lane.I8, nullDensity > 0, i8),
      (Lane.I16, nullDensity > 0, i16),
      (Lane.I32, nullDensity > 0, i32),
      (Lane.I64, nullDensity > 0, i64),
      (Lane.F32, nullDensity > 0, f32),
      (Lane.F64, nullDensity > 0, f64),
      (Lane.Bin, nullDensity > 0, bb.result()))
  }

  private val commonCodecs = Seq(Codec.None, Codec.Lz4, Codec.Zstd, Codec.Snappy)

  for (codec <- commonCodecs) {
    test(s"round-trip flat no-null codec=$codec") {
      val n = 10000
      val cols = mkCols(n, 42L, 0.0)
      val opts = WriteOptions(defaultCodec = if (codec == Codec.None) Codec.Lz4 else codec,
        forcedCodec = Some(codec), pageSize = 2048)
      val got = rt(cols, n, opts)
      cols.zip(got).foreach { case ((_, _, e), g) => assertVecEq(e, g) }
    }
  }

  for (density <- Seq(0.1, 0.5)) {
    test(s"round-trip flat nulls density=$density") {
      val n = 10000
      val cols = mkCols(n, 42L, density)
      val got = rt(cols, n, WriteOptions(pageSize = 2048))
      cols.zip(got).foreach { case ((_, _, e), g) => assertVecEq(e, g) }
    }
  }

  test("empty file (0 rows)") {
    val cols = Seq((Lane.I32, true, IntVec(0, null, Array.empty[Int]): Vec))
    val got = rt(cols, 0, WriteOptions())
    assert(got.head.n == 0)
  }

  test("format version 001 files are rejected with a clear error") {
    val n = 100
    val v = IntVec(n, null, Array.tabulate(n)(identity))
    val f = Files.createTempFile("graft-v1", ".graft")
    try {
      val os = new java.io.BufferedOutputStream(Files.newOutputStream(f))
      val w = new GraftFileWriter(os, "{}", WriteOptions())
      w.start()
      w.writeChunk(Seq(LeafCol(Lane.I32, nullable = false, v)), n)
      w.finish()
      os.close()
      // rewrite the trailing magic to the previous version
      val raf = new java.io.RandomAccessFile(f.toFile, "rw")
      raf.seek(raf.length() - 8)
      raf.write(FormatConstants.MagicV1)
      raf.close()
      val in = new LocalFileInput(f)
      try {
        val e = intercept[java.io.IOException](GraftFileReader.readFooter(in))
        assert(e.getMessage.contains("version 001"), e.getMessage)
      } finally in.close()
    } finally Files.deleteIfExists(f)
  }

  test("page stats are persisted (zone maps)") {
    val n = 5000
    val v = IntVec(n, null, Array.tabulate(n)(i => i))
    val f = Files.createTempFile("graft", ".graft")
    try {
      val os = new java.io.BufferedOutputStream(Files.newOutputStream(f))
      val w = new GraftFileWriter(os, "{}", WriteOptions(pageSize = 2048))
      w.start()
      w.writeChunk(Seq(LeafCol(Lane.I32, nullable = false, v)), n)
      w.finish()
      os.close()
      val in = new LocalFileInput(f)
      try {
        val footer = GraftFileReader.readFooter(in)
        val pages = footer.leaves(0).pages
        assert(pages.length == 3)
        assert(pages(0).statsKind == 1 && pages(0).minLong == 0 && pages(0).maxLong == 2047)
        assert(pages(2).minLong == 4096 && pages(2).maxLong == 4999)
      } finally in.close()
    } finally Files.deleteIfExists(f)
  }
}
