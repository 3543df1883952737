package graft.format

import org.scalatest.funsuite.AnyFunSuite

/** Importer round-trip against HAND-CONSTRUCTED reference-layout fixture
  * bytes: the byte layout is specified in SURVEY §1.2 from the reference
  * sources (`/root/reference/src/write/writer.rs:91-167` frame,
  * `serialize.rs:200-215` validity, `compression/integer/mod.rs:49-70`
  * codec blocks), and these fixtures assemble it independently of the
  * importer code — a shared misreading of the spec would still fail on
  * the schema bytes, which go through the arrow-java IPC serializer the
  * reference's arrow2 interoperates with.
  */
class StrawboatImportSpec extends AnyFunSuite {

  import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
  import scala.jdk.CollectionConverters._

  // ---------------------------------------------------------- byte tools

  private def u32(v: Long): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(v.toInt); b.array()
  }
  private def u64(v: Long): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putLong(v); b.array()
  }
  private def leInts(w: Int, vs: Seq[Long]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(w * vs.size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vs.foreach { v =>
      w match {
        case 1 => b.put(v.toByte)
        case 2 => b.putShort(v.toShort)
        case 4 => b.putInt(v.toInt)
        case 8 => b.putLong(v)
      }
    }
    b.array()
  }
  private def cat(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray

  /** codec block header + payload: codec | compressed | uncompressed */
  private def block(codec: Int, payload: Array[Byte], rawSize: Int): Array[Byte] =
    cat(Array(codec.toByte), u32(payload.length), u32(rawSize), payload)

  private def noneBlock(raw: Array[Byte]): Array[Byte] = block(0, raw, raw.length)

  /** parquet hybrid-RLE V2 def levels, ONE bitpacked run (the shape the
    * reference writer emits — `read_basic.rs:57` treats RLE as unreachable).
    */
  private def validityBitpacked(valid: Seq[Boolean]): Array[Byte] = {
    val groups = (valid.size + 7) / 8
    // ULEB128 header (groups << 1) | 1 — fixture sizes stay < 64 groups
    val header = (groups << 1) | 1
    require(header < 128, "fixture validity too long for 1-byte varint")
    val bits = new Array[Byte](groups)
    valid.zipWithIndex.foreach { case (v, i) => if (v) bits(i >> 3) = (bits(i >> 3) | (1 << (i & 7))).toByte }
    cat(Array(header.toByte), bits)
  }
  private def validityBlock(valid: Seq[Boolean]): Array[Byte] = {
    val b = if (valid.forall(identity)) Array.empty[Byte] else validityBitpacked(valid)
    cat(u32(b.length), b)
  }

  // ------------------------------------------------------ fixture writer

  private final class FixtureWriter {
    private val body = new java.io.ByteArrayOutputStream()
    private val metas = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[(Long, Long)])]
    def addColumn(pages: Seq[(Array[Byte], Int)]): Unit = {
      val offset = 8L + body.size()
      metas += ((offset, pages.map { case (b, n) => (b.length.toLong, n.toLong) }))
      pages.foreach(p => body.write(p._1))
    }
    def finish(schema: Schema): Array[Byte] = {
      val schemaBytes = {
        val baos = new java.io.ByteArrayOutputStream()
        val ch = new org.apache.arrow.vector.ipc.WriteChannel(
          java.nio.channels.Channels.newChannel(baos))
        org.apache.arrow.vector.ipc.message.MessageSerializer.serialize(ch, schema)
        baos.toByteArray
      }
      val metaBytes = {
        val mb = new java.io.ByteArrayOutputStream()
        mb.write(u64(metas.size))
        metas.foreach { case (off, pages) =>
          mb.write(u64(off)); mb.write(u64(pages.size))
          pages.foreach { case (len, n) => mb.write(u64(len)); mb.write(u64(n)) }
        }
        mb.toByteArray
      }
      val out = new java.io.ByteArrayOutputStream()
      out.write("ARROW2".getBytes("UTF-8")); out.write(Array[Byte](0, 0))
      out.write(body.toByteArray)
      out.write(schemaBytes)
      out.write(metaBytes)
      out.write(u32(schemaBytes.length))
      out.write(u32(metaBytes.length))
      out.write(Array[Byte](-1, -1, -1, -1, 0, 0, 0, 0)) // EOS continuation
      out.toByteArray
    }
  }

  private final class BytesInput(bytes: Array[Byte]) extends SeekableInput {
    def length: Long = bytes.length
    def readFully(pos: Long, dst: Array[Byte], off: Int, len: Int): Unit =
      System.arraycopy(bytes, pos.toInt, dst, off, len)
    def close(): Unit = ()
  }

  private def field(name: String, t: ArrowType, nullable: Boolean = false): Field =
    new Field(name, if (nullable) FieldType.nullable(t) else FieldType.notNullable(t), null)

  // ---------------------------------------------------------------- tests

  test("flat round-trip: None codec i64 with nulls + strings + bool + f64") {
    val n = 10
    val valid = Seq(true, true, false, true, true, true, false, true, true, true)
    val ks = (0 until n).map(i => i * 100L)
    val strs = (0 until n).map(i => s"v$i")
    val f = new FixtureWriter
    // k: i64 nullable, None codec
    f.addColumn(Seq((cat(validityBlock(valid), noneBlock(leInts(8, ks))), n)))
    // s: utf8 non-null, two-block basic
    val offsets = strs.scanLeft(0L)((acc, s) => acc + s.length)
    val values = strs.mkString.getBytes("UTF-8")
    f.addColumn(Seq((cat(noneBlock(leInts(4, offsets)), noneBlock(values)), n)))
    // b: bool non-null (uncompressed size = VALUE COUNT per the reference)
    val bools = (0 until n).map(i => i % 3 == 0)
    val bits = new Array[Byte]((n + 7) / 8)
    bools.zipWithIndex.foreach { case (v, i) => if (v) bits(i >> 3) = (bits(i >> 3) | (1 << (i & 7))).toByte }
    f.addColumn(Seq((block(0, bits, n), n)))
    // d: f64 non-null
    val ds = (0 until n).map(i => i / 3.0)
    f.addColumn(Seq((noneBlock(leInts(8, ds.map(java.lang.Double.doubleToLongBits))), n)))
    val schema = new Schema(Seq(
      field("k", new ArrowType.Int(64, true), nullable = true),
      field("s", ArrowType.Utf8.INSTANCE),
      field("b", ArrowType.Bool.INSTANCE),
      field("d", new ArrowType.FloatingPoint(
        org.apache.arrow.vector.types.FloatingPointPrecision.DOUBLE))).asJava)

    val (sparkSchema, rows) = StrawboatImport.decodeFile(new BytesInput(f.finish(schema)))
    assert(sparkSchema.fieldNames.toSeq == Seq("k", "s", "b", "d"))
    assert(rows.size == n)
    (0 until n).foreach { i =>
      assert(rows(i)(0) == (if (valid(i)) ks(i) else null), s"k row $i")
      assert(rows(i)(1) == strs(i))
      assert(rows(i)(2) == bools(i))
      assert(rows(i)(3) == ds(i))
    }
  }

  test("integer codecs: RLE, Dict, OneValue, Freq(roaring) round-trip") {
    val n = 20
    val f = new FixtureWriter
    // rle: i32 runs 5x7, 10x-3, 5x1000
    val rleVals = Seq.fill(5)(7L) ++ Seq.fill(10)(-3L) ++ Seq.fill(5)(1000L)
    f.addColumn(Seq((block(10,
      cat(u32(5), leInts(4, Seq(7L)), u32(10), leInts(4, Seq(-3L)), u32(5), leInts(4, Seq(1000L))),
      n * 4), n)))
    // dict: i64 over sets [100, 200]; inner indices block = None u32s
    val dictIdx = (0 until n).map(i => (i % 2).toLong)
    val dictPayload = cat(noneBlock(leInts(4, dictIdx)), u32(2),
      leInts(8, Seq(100L, 200L)))
    f.addColumn(Seq((block(11, dictPayload, n * 8), n)))
    // one: i16 constant 42
    f.addColumn(Seq((block(12, leInts(2, Seq(42L)), n * 2), n)))
    // freq: i32 top=9 with exceptions at 3 -> 77 and 15 -> -5 (roaring)
    val bm = new org.roaringbitmap.RoaringBitmap()
    bm.add(3); bm.add(15)
    val bmBytes = {
      val bb = java.nio.ByteBuffer.allocate(bm.serializedSizeInBytes())
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bm.serialize(bb)
      bb.array()
    }
    val freqPayload = cat(leInts(4, Seq(9L)), u32(bmBytes.length), bmBytes,
      noneBlock(leInts(4, Seq(77L, -5L))))
    f.addColumn(Seq((block(13, freqPayload, n * 4), n)))
    val schema = new Schema(Seq(
      field("rle", new ArrowType.Int(32, true)),
      field("dict", new ArrowType.Int(64, true)),
      field("one", new ArrowType.Int(16, true)),
      field("freq", new ArrowType.Int(32, true))).asJava)

    val (_, rows) = StrawboatImport.decodeFile(new BytesInput(f.finish(schema)))
    assert(rows.size == n)
    (0 until n).foreach { i =>
      assert(rows(i)(0) == rleVals(i).toInt, s"rle row $i")
      assert(rows(i)(1) == (if (i % 2 == 0) 100L else 200L))
      assert(rows(i)(2) == 42.toShort)
      val expFreq = if (i == 3) 77 else if (i == 15) -5 else 9
      assert(rows(i)(3) == expFreq, s"freq row $i")
    }
  }

  /** Independent SIMD-BP128 packer (the `bitpacking` crate's BitPacker4x
    * layout): 128 values as 32 registers x 4 lanes; lane l's sub-stream
    * (indices 4i+l) LSB-packed into numBits u32 words; group g emits the
    * four lanes' g-th words.
    */
  private def pack128(vals: Seq[Long], numBits: Int): Array[Byte] = {
    require(vals.size == 128)
    if (numBits == 0) return Array.empty
    val mask = if (numBits == 32) 0xffffffffL else (1L << numBits) - 1
    val words = Array.ofDim[Long](4, numBits)
    for (lane <- 0 until 4; i <- 0 until 32) {
      val v = vals(4 * i + lane) & mask
      val bitPos = i * numBits
      val g = bitPos >> 5
      val off = bitPos & 31
      words(lane)(g) |= (v << off) & 0xffffffffL
      if (off + numBits > 32) words(lane)(g + 1) |= v >>> (32 - off)
    }
    val out = java.nio.ByteBuffer.allocate(numBits * 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (g <- 0 until numBits; lane <- 0 until 4) out.putInt(words(lane)(g).toInt)
    out.array()
  }

  test("bitpacking and delta-bitpacking blocks (SIMD-BP128 layout)") {
    val n = 256 // two blocks with different widths
    val b1 = (0 until 128).map(i => (i * 7 % 100).toLong) // needs 7 bits
    val b2 = (0 until 128).map(i => (i % 8).toLong) // needs 3 bits
    val vals = b1 ++ b2
    val bpPayload = cat(Array(7.toByte), pack128(b1, 7), Array(3.toByte), pack128(b2, 3))
    // sorted column for delta: v_j = 3j (deltas all 3, initial 0 carries
    // across blocks); the writer stores num_bits of the RAW chunk values
    val sorted = (0 until n).map(i => 3L * i)
    def deltas(chunk: Seq[Long], initial: Long): Seq[Long] =
      chunk.zip(initial +: chunk.init).map { case (v, p) => v - p }
    val dPayload = cat(
      Array(10.toByte), pack128(deltas(sorted.take(128), 0L), 10),
      Array(10.toByte), pack128(deltas(sorted.drop(128), sorted(127)), 10))
    val f = new FixtureWriter
    f.addColumn(Seq((block(14, bpPayload, n * 4), n)))
    f.addColumn(Seq((block(15, dPayload, n * 4), n)))
    val schema = new Schema(Seq(
      field("bp", new ArrowType.Int(32, true)),
      field("dbp", new ArrowType.Int(32, true))).asJava)
    val (_, rows) = StrawboatImport.decodeFile(new BytesInput(f.finish(schema)))
    (0 until n).foreach { i =>
      assert(rows(i)(0) == vals(i).toInt, s"bp row $i")
      assert(rows(i)(1) == sorted(i).toInt, s"dbp row $i")
    }
  }

  /** Independent Patas encoder, always referencing the previous value:
    * u16 LE (ref<<9 | sigBytes<<6 | trailingZeroBits) + sig XOR bytes.
    */
  private def patasEncode(patterns: Seq[Long], width: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def leBytes(v: Long, nb: Int): Array[Byte] =
      (0 until nb).map(b => ((v >>> (8 * b)) & 0xff).toByte).toArray
    out.write(leBytes(patterns.head, width))
    patterns.sliding(2).foreach { case Seq(prev, cur) =>
      val xor = prev ^ cur
      val (sig, tz) =
        if (xor == 0) (0, 63) // sig=0 + tz=63 encodes "equal to reference"
        else {
          val tzBits = java.lang.Long.numberOfTrailingZeros(xor)
          val sigBits = 64 - java.lang.Long.numberOfLeadingZeros(xor) - tzBits
          ((sigBits + 7) / 8, tzBits)
        }
      val packed = (1 << 9) | ((sig & 7) << 6) | tz
      out.write(leBytes(packed.toLong, 2))
      if (sig > 0) out.write(leBytes(xor >>> tz, sig))
      ()
    }
    out.toByteArray
  }

  test("patas float pages and extended double codecs") {
    val n = 12
    val ds = Seq(1.0, 1.0, 1.5, 1.5078125, 2.25, -3.0, 0.0, 1e300, 1e300,
      -1e-300, 42.42, 42.42)
    val f = new FixtureWriter
    f.addColumn(Seq((block(16,
      patasEncode(ds.map(java.lang.Double.doubleToRawLongBits), 8), n * 8), n)))
    // double RLE reuses the integer codec over f64 bit patterns
    val rleD = Seq.fill(7)(2.5) ++ Seq.fill(5)(-0.125)
    f.addColumn(Seq((block(10,
      cat(u32(7), u64(java.lang.Double.doubleToRawLongBits(2.5)),
        u32(5), u64(java.lang.Double.doubleToRawLongBits(-0.125))), n * 8), n)))
    // f32 patas
    val fs = Seq(0.5f, 0.5f, 1.25f, -7.5f, 3.14159f, 3.14159f, 0f, 1e30f,
      -1e-30f, 2f, 4f, 8f)
    f.addColumn(Seq((block(16,
      patasEncode(fs.map(v => java.lang.Float.floatToRawIntBits(v) & 0xffffffffL), 4),
      n * 4), n)))
    val schema = new Schema(Seq(
      field("p", new ArrowType.FloatingPoint(
        org.apache.arrow.vector.types.FloatingPointPrecision.DOUBLE)),
      field("r", new ArrowType.FloatingPoint(
        org.apache.arrow.vector.types.FloatingPointPrecision.DOUBLE)),
      field("pf", new ArrowType.FloatingPoint(
        org.apache.arrow.vector.types.FloatingPointPrecision.SINGLE))).asJava)
    val (_, rows) = StrawboatImport.decodeFile(new BytesInput(f.finish(schema)))
    (0 until n).foreach { i =>
      assert(rows(i)(0) == ds(i), s"patas f64 row $i")
      assert(rows(i)(1) == rleD(i), s"rle f64 row $i")
      assert(rows(i)(2) == fs(i), s"patas f32 row $i")
    }
  }

  test("common compressions: lz4 raw block, zstd, snappy") {
    val n = 100
    val vs = (0 until n).map(i => (i * 31 % 17).toLong)
    val raw = leInts(8, vs)
    val lz4 = {
      val c = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()
      val out = new Array[Byte](c.maxCompressedLength(raw.length))
      val sz = c.compress(raw, 0, raw.length, out, 0)
      java.util.Arrays.copyOf(out, sz)
    }
    val zstd = com.github.luben.zstd.Zstd.compress(raw)
    val snappy = org.xerial.snappy.Snappy.compress(raw)
    val f = new FixtureWriter
    f.addColumn(Seq((block(1, lz4, raw.length), n)))
    f.addColumn(Seq((block(2, zstd, raw.length), n)))
    f.addColumn(Seq((block(3, snappy, raw.length), n)))
    val schema = new Schema(Seq(
      field("a", new ArrowType.Int(64, true)),
      field("b", new ArrowType.Int(64, true)),
      field("c", new ArrowType.Int(64, true))).asJava)
    val (_, rows) = StrawboatImport.decodeFile(new BytesInput(f.finish(schema)))
    (0 until n).foreach { i =>
      assert(rows(i)(0) == vs(i) && rows(i)(1) == vs(i) && rows(i)(2) == vs(i))
    }
  }

  test("multi-page column, page-local validity") {
    val f = new FixtureWriter
    val p1Valid = Seq(true, false, true, true)
    val p1 = cat(validityBlock(p1Valid), noneBlock(leInts(4, Seq(1L, 0L, 3L, 4L))))
    val p2Valid = Seq(false, true, true)
    val p2 = cat(validityBlock(p2Valid), noneBlock(leInts(4, Seq(0L, 6L, 7L))))
    f.addColumn(Seq((p1, 4), (p2, 3)))
    val schema = new Schema(
      Seq(field("x", new ArrowType.Int(32, true), nullable = true)).asJava)
    val (_, rows) = StrawboatImport.decodeFile(new BytesInput(f.finish(schema)))
    assert(rows.map(_(0)).toSeq == Seq(1, null, 3, 4, null, 6, 7))
  }

  test("validity RLE-run encoding is also accepted") {
    // an all-valid prefix as an RLE run (header (8<<1)|0, value 1) then a
    // bitpacked tail — tolerated even though the reference writer only
    // emits bitpacked runs
    val n = 12
    val rleRun = Array[Byte]((8 << 1).toByte, 1)
    val tail = Array[Byte](((1 << 1) | 1).toByte, 0x0b) // bits 0,1,3 of last 4
    val validity = cat(u32(rleRun.length + tail.length), rleRun, tail)
    val f = new FixtureWriter
    f.addColumn(Seq((cat(validity, noneBlock(leInts(4, (1L to 12L).toSeq))), n)))
    val schema = new Schema(
      Seq(field("x", new ArrowType.Int(32, true), nullable = true)).asJava)
    val (_, rows) = StrawboatImport.decodeFile(new BytesInput(f.finish(schema)))
    val got = rows.map(_(0)).toSeq
    assert(got.take(8) == (1 to 8))
    assert(got.drop(8) == Seq(9, 10, null, 12))
  }

  test("logical types: date32, timestamp(us), decimal128, unsigned widening") {
    val n = 4
    val f = new FixtureWriter
    f.addColumn(Seq((noneBlock(leInts(4, Seq(0L, 19000L, 19001L, 1L))), n)))
    val micros = Seq(0L, 1700000000000000L, 1700000000123456L, -1000000L)
    f.addColumn(Seq((noneBlock(leInts(8, micros)), n)))
    // decimal(9,2) i128 LE: 12345 -> 123.45
    val decs = Seq(12345L, -500L, 0L, 99999999999L)
    val decBytes = {
      val b = java.nio.ByteBuffer.allocate(16 * n).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      decs.foreach { v => b.putLong(v); b.putLong(if (v < 0) -1L else 0L) }
      b.array()
    }
    f.addColumn(Seq((noneBlock(decBytes), n)))
    // u32 with a value above Int.MaxValue
    f.addColumn(Seq((noneBlock(leInts(4, Seq(1L, 0xFFFFFFFFL, 7L, 0x80000000L))), n)))
    val schema = new Schema(Seq(
      field("d", new ArrowType.Date(org.apache.arrow.vector.types.DateUnit.DAY)),
      field("ts", new ArrowType.Timestamp(
        org.apache.arrow.vector.types.TimeUnit.MICROSECOND, "UTC")),
      field("dec", new ArrowType.Decimal(18, 2, 128)),
      field("u", new ArrowType.Int(32, false))).asJava)
    val (ss, rows) = StrawboatImport.decodeFile(new BytesInput(f.finish(schema)))
    import org.apache.spark.sql.types._
    assert(ss("d").dataType == DateType && ss("ts").dataType == TimestampType)
    assert(ss("dec").dataType == DecimalType(18, 2) && ss("u").dataType == LongType)
    assert(rows(1)(0) == java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(19000)))
    assert(rows(2)(1).asInstanceOf[java.sql.Timestamp].getTime == 1700000000123L)
    assert(rows(0)(2) == new java.math.BigDecimal("123.45"))
    assert(rows(1)(2) == new java.math.BigDecimal("-5.00"))
    assert(rows(1)(3) == 0xFFFFFFFFL)
  }

  test("binary extended codecs: OneValue and Dict") {
    val n = 6
    val f = new FixtureWriter
    // onevalue utf8: u32 len + bytes
    f.addColumn(Seq((block(12, cat(u32(2), "hi".getBytes("UTF-8")), 0), n)))
    // dict utf8: inner None u32 indices + set count + (u64 len + bytes)*
    val idx = Seq(0L, 1L, 0L, 2L, 1L, 0L)
    val sets = Seq("alpha", "b", "ccc")
    val setBytes = cat(sets.flatMap(s =>
      Seq(u64(s.length), s.getBytes("UTF-8"))): _*)
    f.addColumn(Seq((block(11, cat(noneBlock(leInts(4, idx)), u32(sets.size), setBytes), 0), n)))
    val schema = new Schema(Seq(
      field("one", ArrowType.Utf8.INSTANCE),
      field("dict", ArrowType.Utf8.INSTANCE)).asJava)
    val (_, rows) = StrawboatImport.decodeFile(new BytesInput(f.finish(schema)))
    (0 until n).foreach { i =>
      assert(rows(i)(0) == "hi")
      assert(rows(i)(1) == sets(idx(i).toInt))
    }
  }

  test("binary Freq codec: top value + roaring exceptions") {
    val n = 8
    val bm = new org.roaringbitmap.RoaringBitmap()
    bm.add(2); bm.add(5)
    val bmBytes = {
      val bb = java.nio.ByteBuffer.allocate(bm.serializedSizeInBytes())
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bm.serialize(bb); bb.array()
    }
    val top = "common".getBytes("UTF-8")
    val e1 = "rare-a".getBytes("UTF-8")
    val e2 = "x".getBytes("UTF-8")
    val payload = cat(u64(top.length), top, u32(bmBytes.length), bmBytes,
      u64(e1.length), e1, u64(e2.length), e2)
    val f = new FixtureWriter
    f.addColumn(Seq((block(13, payload, 0), n)))
    val schema = new Schema(Seq(field("s", ArrowType.Utf8.INSTANCE)).asJava)
    val (_, rows) = StrawboatImport.decodeFile(new BytesInput(f.finish(schema)))
    (0 until n).foreach { i =>
      val exp = if (i == 2) "rare-a" else if (i == 5) "x" else "common"
      assert(rows(i)(0) == exp, s"freq row $i")
    }
  }

  test("boolean extended codecs: RLE and OneValue") {
    val n = 10
    val f = new FixtureWriter
    // rle: 4x true, 6x false (usize slot carries the value count)
    f.addColumn(Seq((block(10, cat(u32(4), Array(1.toByte), u32(6), Array(0.toByte)), n), n)))
    f.addColumn(Seq((block(12, Array(1.toByte), n), n)))
    val schema = new Schema(Seq(
      field("r", ArrowType.Bool.INSTANCE),
      field("o", ArrowType.Bool.INSTANCE)).asJava)
    val (_, rows) = StrawboatImport.decodeFile(new BytesInput(f.finish(schema)))
    (0 until n).foreach { i =>
      assert(rows(i)(0) == (i < 4), s"bool rle row $i")
      assert(rows(i)(1) == true)
    }
  }

  // -------------------------------------------------------- nested pages

  /** hybrid-RLE levels, one BIT-PACKED run (8 values/group, `width` bytes
    * per group, LSB-first) — one of the two run shapes
    * `HybridRleDecoder` accepts. */
  private def levelsBitpacked(vals: Seq[Int], width: Int): Array[Byte] = {
    if (width == 0) return Array.empty
    val groups = (vals.size + 7) / 8
    val header = (groups << 1) | 1
    require(header < 128)
    val out = Array.newBuilder[Byte]
    out += header.toByte
    (0 until groups).foreach { g =>
      var acc = 0L
      (0 until 8).foreach { k =>
        val v = if (g * 8 + k < vals.size) vals(g * 8 + k).toLong else 0L
        acc |= v << (k * width)
      }
      (0 until width).foreach(b => out += ((acc >>> (8 * b)) & 0xff).toByte)
    }
    out.result()
  }

  /** hybrid-RLE levels as RLE runs (count<<1 header + 1-byte value). */
  private def levelsRle(vals: Seq[Int], width: Int): Array[Byte] = {
    if (width == 0) return Array.empty
    val out = Array.newBuilder[Byte]
    var i = 0
    while (i < vals.size) {
      var j = i
      while (j < vals.size && vals(j) == vals(i)) j += 1
      val count = j - i
      require(count < 64)
      out += ((count << 1) & 0xff).toByte
      out += vals(i).toByte
      i = j
    }
    out.result()
  }

  /** nested page: rows + rep/def lengths + levels + leaf codec block
    * (`/root/reference/src/write/serialize.rs:217-232` header,
    *  `read_basic.rs:72-90` read side). */
  private def nestedPage(rows: Int, reps: Array[Byte], defs: Array[Byte],
      leafBlock: Array[Byte]): Array[Byte] =
    cat(u32(rows), u32(reps.length), u32(defs.length), reps, defs, leafBlock)

  private def utf8Block(strs: Seq[String]): Array[Byte] = {
    val offsets = strs.scanLeft(0L)((acc, s) => acc + s.getBytes("UTF-8").length)
    cat(noneBlock(leInts(4, offsets)), noneBlock(strs.mkString.getBytes("UTF-8")))
  }

  private def listField(name: String, elem: Field, nullable: Boolean): Field =
    new Field(name,
      if (nullable) FieldType.nullable(ArrowType.List.INSTANCE)
      else FieldType.notNullable(ArrowType.List.INSTANCE),
      Seq(elem).asJava)

  test("nested: List<Int> with nulls, empties and null elements") {
    // rows: [1,2,3] | [] | null | [4,null]
    // list nullable (+2 def, +1 rep), elem nullable (+1 def): maxDef=3 maxRep=1
    val reps = Seq(0, 1, 1, 0, 0, 0, 1)
    val defs = Seq(3, 3, 3, 1, 0, 3, 2)
    // slots = defs >= 2 -> 5 values (last is a masked garbage slot)
    val vals = Seq(1L, 2L, 3L, 4L, 99L)
    val f = new FixtureWriter
    f.addColumn(Seq((nestedPage(4,
      levelsBitpacked(reps, 1), levelsBitpacked(defs, 2),
      noneBlock(leInts(4, vals))), reps.size)))
    val schema = new Schema(Seq(
      listField("xs", field("item", new ArrowType.Int(32, true), nullable = true),
        nullable = true)).asJava)
    val (st, rows) = StrawboatImport.decodeFile(new BytesInput(f.finish(schema)))
    assert(st.fields(0).dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType, true))
    assert(rows.size == 4)
    assert(rows(0)(0) == Seq(1, 2, 3))
    assert(rows(1)(0) == Seq())
    assert(rows(2)(0) == null)
    assert(rows(3)(0) == Seq(4, null))
  }

  test("nested: nullable Struct<a:Int?, b:Utf8> (no lists, zero-width rep)") {
    // rows: {a:1,b:"x"} | null | {a:null,b:"y"}
    // struct nullable (+1); a nullable (+1): maxDef=2; b required: maxDef=1
    val f = new FixtureWriter
    f.addColumn(Seq((nestedPage(3,
      levelsBitpacked(Seq(0, 0, 0), 0), // maxRep=0: empty stream
      levelsRle(Seq(2, 0, 1), 2),
      noneBlock(leInts(4, Seq(1L, 88L)))), 3)))
    f.addColumn(Seq((nestedPage(3,
      Array.empty[Byte], levelsBitpacked(Seq(1, 0, 1), 1),
      utf8Block(Seq("x", "y"))), 3)))
    val entries = new Field("s", FieldType.nullable(ArrowType.Struct.INSTANCE), Seq(
      field("a", new ArrowType.Int(32, true), nullable = true),
      field("b", ArrowType.Utf8.INSTANCE)).asJava)
    val schema = new Schema(Seq(entries).asJava)
    val (_, rows) = StrawboatImport.decodeFile(new BytesInput(f.finish(schema)))
    assert(rows.size == 3)
    assert(rows(0)(0) == org.apache.spark.sql.Row(1, "x"))
    assert(rows(1)(0) == null)
    assert(rows(2)(0) == org.apache.spark.sql.Row(null, "y"))
  }

  test("nested: Map<Utf8,Int64> incl. empty and null maps") {
    // rows: {a->1,b->2} | {} | null | {c->null}
    // map nullable List (+2 def, +1 rep); entries struct required (+0);
    // key required: maxDef=2; value nullable: maxDef=3
    val reps = Seq(0, 1, 0, 0, 0)
    val keyDefs = Seq(2, 2, 1, 0, 2)
    val valDefs = Seq(3, 3, 1, 0, 2)
    val f = new FixtureWriter
    f.addColumn(Seq((nestedPage(4,
      levelsRle(reps, 1), levelsRle(keyDefs, 2),
      utf8Block(Seq("a", "b", "c"))), reps.size)))
    f.addColumn(Seq((nestedPage(4,
      levelsRle(reps, 1), levelsBitpacked(valDefs, 2),
      noneBlock(leInts(8, Seq(1L, 2L, 77L)))), reps.size)))
    val key = field("key", ArrowType.Utf8.INSTANCE)
    val value = field("value", new ArrowType.Int(64, true), nullable = true)
    val entries = new Field("entries", FieldType.notNullable(ArrowType.Struct.INSTANCE),
      Seq(key, value).asJava)
    val mapField = new Field("m", FieldType.nullable(new ArrowType.Map(false)),
      Seq(entries).asJava)
    val schema = new Schema(Seq(mapField).asJava)
    val (st, rows) = StrawboatImport.decodeFile(new BytesInput(f.finish(schema)))
    assert(st.fields(0).dataType == org.apache.spark.sql.types.MapType(
      org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.LongType, true))
    assert(rows.size == 4)
    assert(rows(0)(0) == Map("a" -> 1L, "b" -> 2L))
    assert(rows(1)(0) == Map())
    assert(rows(2)(0) == null)
    assert(rows(3)(0) == Map("c" -> null))
  }

  test("nested: required List<Struct> and List<List<Int>> multi-page") {
    // col 1: required list of required struct{x:Int, y:Utf8?}
    // rows: [{1,"p"},{2,null}] | []
    // list required (+1 def, +1 rep); struct (+0); x: maxDef=1; y: maxDef=2
    val reps1 = Seq(0, 1, 0)
    val f = new FixtureWriter
    f.addColumn(Seq((nestedPage(2,
      levelsRle(reps1, 1), levelsRle(Seq(1, 1, 0), 1),
      noneBlock(leInts(4, Seq(1L, 2L)))), reps1.size)))
    f.addColumn(Seq((nestedPage(2,
      levelsRle(reps1, 1), levelsBitpacked(Seq(2, 1, 0), 2),
      utf8Block(Seq("p", "q"))), reps1.size)))
    // col 2: nullable List<nullable List<Int>>, elem required — TWO pages
    // page 1: ONE row [[1,2],[],null] ; page 2: ONE row [[3]]
    // outer +2, inner +2: maxDef=4, maxRep=2
    val p1 = nestedPage(1,
      levelsBitpacked(Seq(0, 2, 1, 1), 2), levelsBitpacked(Seq(4, 4, 3, 2), 3),
      noneBlock(leInts(4, Seq(1L, 2L))))
    val p2 = nestedPage(1,
      levelsRle(Seq(0), 2), levelsRle(Seq(4), 3),
      noneBlock(leInts(4, Seq(3L))))
    f.addColumn(Seq((p1, 4), (p2, 1)))
    val structF = new Field("e", FieldType.notNullable(ArrowType.Struct.INSTANCE), Seq(
      field("x", new ArrowType.Int(32, true)),
      field("y", ArrowType.Utf8.INSTANCE, nullable = true)).asJava)
    val inner = listField("inner", field("item", new ArrowType.Int(32, true)), nullable = true)
    val schema = new Schema(Seq(
      listField("es", structF, nullable = false),
      listField("xss", inner, nullable = true)).asJava)
    val (_, rows) = StrawboatImport.decodeFile(new BytesInput(f.finish(schema)))
    assert(rows.size == 2)
    assert(rows(0)(0) == Seq(org.apache.spark.sql.Row(1, "p"), org.apache.spark.sql.Row(2, null)))
    assert(rows(1)(0) == Seq())
    assert(rows(0)(1) == Seq(Seq(1, 2), Seq(), null))
    assert(rows(1)(1) == Seq(Seq(3)))
  }

  test("bad magic and writer-rejected types fail with clear messages") {
    val junk = new BytesInput("PARQUET-ish junk that is long enough to probe".getBytes)
    val e1 = intercept[IllegalArgumentException](StrawboatImport.readFooter(junk))
    assert(e1.getMessage.contains("magic"))
    // Dictionary-encoded fields are writer-panics in the reference
    // (`/root/reference/src/write/serialize.rs:122`) — clear rejection
    // (FixedSizeList, once rejected here too, now imports via the List
    // path like the reference's own reader)
    val dictF = new Field("d",
      new FieldType(true, new ArrowType.Int(32, true),
        new org.apache.arrow.vector.types.pojo.DictionaryEncoding(0L, false, null)),
      java.util.Collections.emptyList[Field]())
    val f = new FixtureWriter
    f.addColumn(Seq((noneBlock(leInts(4, Seq(1L))), 1)))
    val bytes = f.finish(new Schema(Seq(dictF).asJava))
    val e2 = intercept[Exception] {
      StrawboatImport.sparkSchema(StrawboatImport.readFooter(new BytesInput(bytes)))
    }
    assert(e2.getMessage.contains("not imported") || e2.getMessage.contains("Dictionary"))
  }

  test("corrupt files fail loudly, never decode garbage") {
    // a healthy fixture to mutilate
    val f = new FixtureWriter
    val n = 8
    f.addColumn(Seq((noneBlock(leInts(8, (0 until n).map(_.toLong))), n)))
    val schema = new Schema(Seq(field("k", new ArrowType.Int(64, true))).asJava)
    val good = f.finish(schema)

    // truncated mid-footer: schema bytes unreadable or sizes implausible
    val truncated = java.util.Arrays.copyOf(good, good.length - 12)
    intercept[Exception](StrawboatImport.readFooter(new BytesInput(truncated)))

    // too small to hold any footer at all
    intercept[Exception](
      StrawboatImport.readFooter(new BytesInput("ARROW2  tiny".getBytes)))

    // footer sizes pointing past the file
    val bad = good.clone()
    val szOff = good.length - 16 // schema_size u32 little-endian
    bad(szOff) = -1; bad(szOff + 1) = -1; bad(szOff + 2) = 0x7f; bad(szOff + 3) = 0x7f
    val e = intercept[Exception](StrawboatImport.readFooter(new BytesInput(bad)))
    assert(e.getMessage.contains("implausible"))

    // unknown codec id inside an otherwise healthy page
    val f2 = new FixtureWriter
    f2.addColumn(Seq((block(77, leInts(8, Seq(1L)), 8), 1)))
    val bytes2 = f2.finish(schema)
    val e2 = intercept[Exception](StrawboatImport.decodeFile(new BytesInput(bytes2)))
    assert(e2.getMessage.contains("codec") || e2.getMessage.contains("77"))

    // value payload shorter than the declared row count
    val f3 = new FixtureWriter
    f3.addColumn(Seq((noneBlock(leInts(8, Seq(1L, 2L))), 5), (Array.emptyByteArray, 0)))
    val bytes3 = f3.finish(schema)
    intercept[Exception](StrawboatImport.decodeFile(new BytesInput(bytes3)))
  }

  test("FixedSizeList imports via the List path (reference reader dispatch)") {
    import org.apache.spark.sql.types._
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field => AField, FieldType, Schema => ASchema}
    import scala.jdk.CollectionConverters._
    val sparkSchema = StructType(Seq(StructField("arr",
      ArrayType(LongType, containsNull = false), nullable = true)))
    val rows = Seq(
      org.apache.spark.sql.Row(Seq(1L, 2L, 3L)),
      org.apache.spark.sql.Row(null),
      org.apache.spark.sql.Row(Seq(7L, 8L, 9L)))
    val bytes = StrawboatExport.encodeFile(sparkSchema, rows, pageRows = 2, codec = 0)
    // splice a FixedSizeList(3) schema over the List-encoded pages: the
    // page/level bytes are identical for both declarations when every list
    // has exactly 3 elements, only the footer schema differs — i.e. the
    // file an arrow2-based writer (not the reference's, whose writer
    // panics on FSL) would produce
    def u32At(off: Int): Int = java.nio.ByteBuffer.wrap(bytes, off, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    val schemaSize = u32At(bytes.length - 16)
    val metaSize = u32At(bytes.length - 12)
    val schemaStart = bytes.length - 16 - metaSize - schemaSize
    val item = new AField("item",
      FieldType.notNullable(new ArrowType.Int(64, true)),
      java.util.Collections.emptyList[AField]())
    val fsl = new AField("arr",
      FieldType.nullable(new ArrowType.FixedSizeList(3)), Seq(item).asJava)
    val fslSchemaBytes = {
      val baos = new java.io.ByteArrayOutputStream()
      val ch = new org.apache.arrow.vector.ipc.WriteChannel(
        java.nio.channels.Channels.newChannel(baos))
      org.apache.arrow.vector.ipc.message.MessageSerializer.serialize(ch,
        new ASchema(Seq(fsl).asJava))
      baos.toByteArray
    }
    def u32le(v: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(v); b.array()
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(bytes, 0, schemaStart)
    out.write(fslSchemaBytes)
    out.write(bytes, schemaStart + schemaSize, metaSize)
    out.write(u32le(fslSchemaBytes.length))
    out.write(u32le(metaSize))
    out.write(Array[Byte](-1, -1, -1, -1, 0, 0, 0, 0))
    val (schema2, got) = StrawboatImport.decodeFile(new BytesInput(out.toByteArray))
    assert(schema2.fields.length == 1)
    assert(schema2.fields(0).dataType == ArrayType(LongType, containsNull = false),
      schema2.fields(0).dataType.toString)
    assert(got.size == 3)
    assert(got(0)(0).asInstanceOf[Seq[Any]] == Seq(1L, 2L, 3L))
    assert(got(1)(0) == null)
    assert(got(2)(0).asInstanceOf[Seq[Any]] == Seq(7L, 8L, 9L))
  }
}
