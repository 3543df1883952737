package graft.format

import org.apache.spark.sql.types._

/** Read-only importer for REFERENCE-layout strawboat files (`ARROW2`
  * magic), so a user holding files written by the reference engine can load
  * them into Spark without the reference toolchain. This decodes the
  * reference's own byte layout — it is NOT the graft format (graft
  * redesigned the footer and nested encoding; see README "Format spec &
  * reference interop").
  *
  * Layout implemented from the reference sources:
  *  - file frame: magic+pad, concatenated per-leaf pages, footer =
  *    arrow-IPC schema + column metas + sizes + EOS
  *    (`/root/reference/src/write/writer.rs:91-167`,
  *     `/root/reference/src/read/reader.rs:148-241`)
  *  - page frame: optional validity block (u32 def-levels length +
  *    parquet hybrid-RLE bit-width-1 runs) then a codec block
  *    `codec(u8) | compressed(u32) | uncompressed(u32) | payload`
  *    (`/root/reference/src/write/serialize.rs:200-215`,
  *     `/root/reference/src/read/read_basic.rs:36-63`,
  *     `/root/reference/src/compression/integer/mod.rs:49-70`)
  *  - codecs: None/Lz4(raw block)/Zstd/Snappy(raw)
  *    (`/root/reference/src/compression/basic.rs:70-151`), integer
  *    OneValue/RLE/Dict/Freq (`.../integer/{one_value,rle,dict,freq}.rs`),
  *    binary two-block Basic + OneValue/Dict
  *    (`/root/reference/src/compression/binary/mod.rs:30-110`), boolean
  *    Basic bitmap (`/root/reference/src/compression/boolean/mod.rs`).
  *
  * Type coverage:
  *
  * | arrow type              | Spark type      | codecs                          |
  * |-------------------------|-----------------|---------------------------------|
  * | Int8/16/32/64           | Byte..Long      | Common, OneValue, RLE, Dict, Freq |
  * | Int32/UInt32            | Int/Long        | + Bitpacking, DeltaBitpacking (SIMD-BP128 vertical layout) |
  * | UInt8/16/32             | Short/Int/Long  | same (widened)                  |
  * | UInt64                  | Decimal(20,0)   | same                            |
  * | Float32/64              | Float/Double    | Common, OneValue, RLE, Dict, Freq, Patas |
  * | Boolean                 | Boolean         | Common, RLE, OneValue           |
  * | Utf8/LargeUtf8          | String          | Common(2-block), OneValue, Dict, Freq |
  * | Binary/LargeBinary      | Binary          | Common(2-block), OneValue, Dict, Freq |
  * | Date(DAY)               | Date            | integer codecs (Int32)          |
  * | Timestamp(s/ms/us/ns)   | Timestamp (tz) / TimestampNTZ (no tz) | integer codecs (Int64) |
  * | Decimal128              | Decimal(p,s)    | Common, OneValue                |
  * | List/LargeList          | ArrayType       | rep/def nested pages over any of the above |
  * | Struct                  | StructType      | ditto                           |
  * | Map                     | MapType         | ditto (List over entries struct) |
  * | FixedSizeList(w)        | ArrayType       | read like List (reference reader's own dispatch); its writer panics, so such files come from other arrow2 writers |
  * | Float16/intervals/Union/Dictionary | unsupported (reference writer panics on them too) |
  *
  * Nested columns use the reference's parquet-style rep/def shredding —
  * one leaf column per primitive, page header `rows|rep_len|def_len` +
  * hybrid-RLE levels (`/root/reference/src/write/serialize.rs:217-232`,
  * `read/read_basic.rs:65-175`) — reassembled Dremel-style into Spark
  * Array/Row/Map values.
  */
object StrawboatImport {

  val Magic: Array[Byte] = "ARROW2".getBytes("UTF-8")

  final case class PageMeta(length: Long, numValues: Long)
  final case class ColumnMeta(offset: Long, pages: Seq[PageMeta])

  /** Cheap probe: does this file start with the reference magic? */
  def isStrawboat(in: SeekableInput): Boolean =
    in.length > 24 && java.util.Arrays.equals(in.readRange(0, 6), Magic)

  // ------------------------------------------------------------ footer

  final case class StrFooter(arrowSchema: org.apache.arrow.vector.types.pojo.Schema,
      metas: Seq[ColumnMeta])

  def readFooter(in: SeekableInput): StrFooter = {
    val len = in.length
    require(len >= 24, s"strawboat import: file too small ($len bytes)")
    require(java.util.Arrays.equals(in.readRange(0, 6), Magic),
      "strawboat import: bad magic (not an ARROW2 reference file)")
    // footer tail: schema_size(u32) meta_size(u32) EOS(8)
    val tail = in.readRange(len - 16, 16)
    val tb = java.nio.ByteBuffer.wrap(tail).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val schemaSize = tb.getInt(0)
    val metaSize = tb.getInt(4)
    require(schemaSize > 0 && metaSize > 0 &&
      16L + schemaSize.toLong + metaSize.toLong <= len,
      s"strawboat import: implausible footer sizes schema=$schemaSize meta=$metaSize")
    val schemaBytes = in.readRange(len - 16 - metaSize - schemaSize, schemaSize)
    val metaBytes = in.readRange(len - 16 - metaSize, metaSize)
    StrFooter(parseIpcSchema(schemaBytes), parseMetas(metaBytes))
  }

  /** The footer schema is an arrow-IPC encapsulated Schema message; Java
    * arrow's MessageSerializer reads both the continuation-prefixed and
    * the legacy framing.
    */
  private def parseIpcSchema(bytes: Array[Byte]): org.apache.arrow.vector.types.pojo.Schema = {
    val ch = new org.apache.arrow.vector.ipc.ReadChannel(
      java.nio.channels.Channels.newChannel(new java.io.ByteArrayInputStream(bytes)))
    try org.apache.arrow.vector.ipc.message.MessageSerializer.deserializeSchema(ch)
    finally ch.close()
  }

  private def parseMetas(bytes: Array[Byte]): Seq[ColumnMeta] = {
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val n = b.getLong
    require(n >= 0 && n < (1 << 20), s"strawboat import: implausible column count $n")
    (0L until n).map { _ =>
      val offset = b.getLong
      val pageNum = b.getLong
      require(pageNum >= 0 && pageNum < (1 << 24),
        s"strawboat import: implausible page count $pageNum")
      val pages = (0L until pageNum).map(_ => PageMeta(b.getLong, b.getLong))
      ColumnMeta(offset, pages)
    }
  }

  // ------------------------------------------------------- schema mapping

  import org.apache.arrow.vector.types.pojo.{ArrowType, Field => AField}

  def sparkType(f: AField): DataType = if (f.getDictionary != null)
    // arrow stores the encoding NEXT TO the value type, so a dispatch on
    // getType alone would silently misread dictionary page payloads as
    // plain values — reject loudly (the reference writer panics on
    // Dictionary too, serialize.rs:122)
    fail(f, s"Dictionary-encoded ${f.getType}")
  else f.getType match {
    case i: ArrowType.Int => (i.getBitWidth, i.getIsSigned) match {
      case (8, true) => ByteType
      case (16, true) => ShortType
      case (32, true) => IntegerType
      case (64, true) => LongType
      case (8, false) => ShortType
      case (16, false) => IntegerType
      case (32, false) => LongType
      case (64, false) => DecimalType(20, 0)
      case (w, s) => fail(f, s"Int(bitWidth=$w, signed=$s)")
    }
    case fp: ArrowType.FloatingPoint => fp.getPrecision match {
      case org.apache.arrow.vector.types.FloatingPointPrecision.SINGLE => FloatType
      case org.apache.arrow.vector.types.FloatingPointPrecision.DOUBLE => DoubleType
      case p => fail(f, s"FloatingPoint($p)")
    }
    case _: ArrowType.Utf8 | _: ArrowType.LargeUtf8 => StringType
    case _: ArrowType.Binary | _: ArrowType.LargeBinary => BinaryType
    case _: ArrowType.Bool => BooleanType
    case d: ArrowType.Date => d.getUnit match {
      case org.apache.arrow.vector.types.DateUnit.DAY => DateType
      case u => fail(f, s"Date($u)")
    }
    case t: ArrowType.Timestamp =>
      // arrow semantics: a timezone-less timestamp is a wall-clock reading
      // (Spark's TimestampNTZ); one with a timezone is an instant
      if (t.getTimezone == null) TimestampNTZType else TimestampType
    case d: ArrowType.Decimal if d.getBitWidth == 128 =>
      DecimalType(d.getPrecision, d.getScale)
    case _: ArrowType.List | _: ArrowType.LargeList | _: ArrowType.FixedSizeList =>
      // FixedSizeList reads exactly like List — the reference's own reader
      // dispatches it to the List path (`/root/reference/src/read/
      // deserialize.rs:203-207`); Spark has no fixed-width array type, so
      // the width collapses into a plain ArrayType
      val elem = f.getChildren.get(0)
      ArrayType(sparkType(elem), elem.isNullable)
    case _: ArrowType.Struct =>
      import scala.jdk.CollectionConverters._
      StructType(f.getChildren.asScala.toSeq.map(c =>
        StructField(c.getName, sparkType(c), c.isNullable)))
    case _: ArrowType.Map =>
      val entries = f.getChildren.get(0)
      val key = entries.getChildren.get(0)
      val value = entries.getChildren.get(1)
      MapType(sparkType(key), sparkType(value), value.isNullable)
    case t => fail(f, t.toString)
  }

  private def fail(f: AField, t: String): Nothing =
    throw new UnsupportedOperationException(
      s"strawboat import: column '${f.getName}' has type $t — the importer " +
      "supports Int/UInt/Float/Bool/Utf8/Binary/Date(day)/Timestamp/Decimal128 " +
      "plus List/FixedSizeList/Struct/Map over them (the types the reference " +
      "writer itself rejects — Dictionary/Union/Float16/intervals — are not imported)")

  def sparkSchema(footer: StrFooter): StructType = {
    import scala.jdk.CollectionConverters._
    StructType(footer.arrowSchema.getFields.asScala.toSeq.map { f =>
      StructField(f.getName, sparkType(f), f.isNullable)
    })
  }

  // ------------------------------------------------------------- decode

  private final class Cursor(val b: Array[Byte], var pos: Int) {
    def u8(): Int = { val v = b(pos) & 0xff; pos += 1; v }
    def u32(): Long = {
      val v = (b(pos) & 0xffL) | (b(pos + 1) & 0xffL) << 8 |
        (b(pos + 2) & 0xffL) << 16 | (b(pos + 3) & 0xffL) << 24
      pos += 4; v
    }
    def i64(): Long = {
      var v = 0L; var i = 0
      while (i < 8) { v |= (b(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8; v
    }
    def bytes(n: Int): Array[Byte] = {
      val out = java.util.Arrays.copyOfRange(b, pos, pos + n); pos += n; out
    }
  }

  /** parquet hybrid-RLE runs at bit width 1 (no length prefix — V2 def
    * levels). Returns null for "no nulls" when the block is empty.
    */
  private[format] def decodeValidity(bytes: Array[Byte], n: Int): Array[Boolean] = {
    if (bytes.isEmpty) return null
    val out = new Array[Boolean](n)
    var idx = 0
    var pos = 0
    while (pos < bytes.length && idx < n) {
      // ULEB128 run header
      var h = 0L; var shift = 0; var more = true
      while (more) {
        val x = bytes(pos) & 0xff; pos += 1
        h |= (x & 0x7fL) << shift; shift += 7; more = (x & 0x80) != 0
      }
      if ((h & 1) == 1) {
        val groups = (h >>> 1).toInt // groups of 8 values, 1 byte each
        var g = 0
        while (g < groups) {
          val byte = if (pos < bytes.length) bytes(pos) & 0xff else 0
          pos += 1
          var bit = 0
          while (bit < 8 && idx < n) { out(idx) = ((byte >> bit) & 1) == 1; idx += 1; bit += 1 }
          g += 1
        }
      } else {
        val count = (h >>> 1).toInt
        val v = bytes(pos) & 0xff; pos += 1 // ceil(1/8)=1 byte per RLE value
        var c = 0
        while (c < count && idx < n) { out(idx) = v == 1; idx += 1; c += 1 }
      }
    }
    out
  }

  /** One codec block: header + payload, decompressed for the common
    * codecs; extended codecs return their payload slice for the caller.
    */
  private def commonDecompress(codec: Int, payload: Array[Byte], rawSize: Int): Array[Byte] =
    codec match {
      case 0 => payload
      case 1 => // lz4 raw block (compress_to_buffer with prepend_size=false)
        val out = new Array[Byte](rawSize)
        net.jpountz.lz4.LZ4Factory.fastestInstance().fastDecompressor()
          .decompress(payload, 0, out, 0, rawSize)
        out
      case 2 =>
        val out = new Array[Byte](rawSize)
        com.github.luben.zstd.Zstd.decompress(out, payload)
        out
      case 3 => org.xerial.snappy.Snappy.uncompress(payload)
      case c => throw new java.io.IOException(
        s"strawboat import: codec $c is not a common compression")
    }

  /** Integer block: returns n sign-extended (by `width`) longs. Handles
    * Common + OneValue + RLE + Dict + Freq, recursing for Dict indices and
    * Freq exceptions exactly like the reference
    * (`compression/integer/dict.rs:46-55`, `freq.rs:60-73`).
    */
  private def decodeIntBlock(c: Cursor, n: Int, width: Int, signed: Boolean): Array[Long] = {
    val codec = c.u8()
    val csize = c.u32().toInt
    val usize = c.u32().toInt
    def readVal(cc: Cursor): Long = {
      var v = 0L; var i = 0
      while (i < width) { v |= (cc.b(cc.pos + i) & 0xffL) << (8 * i); i += 1 }
      cc.pos += width
      if (signed && width < 8) { val sh = 64 - width * 8; (v << sh) >> sh } else v
    }
    codec match {
      case 0 | 1 | 2 | 3 =>
        val raw = commonDecompress(codec, c.bytes(csize), usize)
        require(raw.length >= n * width,
          s"strawboat import: integer block too short (${raw.length} for $n x $width)")
        val rc = new Cursor(raw, 0)
        Array.fill(n)(readVal(rc))
      case 12 => // OneValue
        val v = readVal(c)
        Array.fill(n)(v)
      case 10 => // RLE: (count u32, value)*
        val out = new Array[Long](n)
        var idx = 0
        while (idx < n) {
          val count = c.u32().toInt
          val v = readVal(c)
          var i = 0
          while (i < count && idx < n) { out(idx) = v; idx += 1; i += 1 }
        }
        out
      case 11 => // Dict: recursive u32 indices + set count + plain values
        val indices = decodeIntBlock(c, n, 4, signed = false)
        val setCount = c.u32().toInt
        val sets = Array.fill(setCount)(readVal(c))
        indices.map(i => sets(i.toInt))
      case 13 => // Freq: top value + roaring exceptions bitmap + exceptions
        val top = readVal(c)
        val bmSize = c.u32().toInt
        val bm = new org.roaringbitmap.RoaringBitmap()
        bm.deserialize(java.nio.ByteBuffer.wrap(c.b, c.pos, bmSize)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN))
        c.pos += bmSize
        val card = bm.getLongCardinality.toInt
        val exceptions = decodeIntBlock(c, card, width, signed)
        val out = Array.fill(n)(top)
        val it = bm.getIntIterator
        var i = 0
        while (it.hasNext) { out(it.next()) = exceptions(i); i += 1 }
        out
      case 14 => // Bitpacking: per-128 block, u8 num_bits + vertical layout
        require(width == 4 && n % 128 == 0,
          s"strawboat import: Bitpacking expects u32 blocks of 128 (n=$n width=$width) " +
          "— the reference writer only chooses it under those conditions")
        val out = new Array[Long](n)
        var base = 0
        while (base < n) {
          val numBits = c.u8()
          unpack128(c, numBits, out, base)
          base += 128
        }
        out
      case 15 => // DeltaBitpacking: packed sequential deltas + prefix sum
        require(width == 4 && n % 128 == 0,
          s"strawboat import: DeltaBitpacking expects u32 blocks of 128 (n=$n width=$width)")
        val out = new Array[Long](n)
        var base = 0
        var carry = 0L
        while (base < n) {
          val numBits = c.u8()
          unpack128(c, numBits, out, base)
          var i = base
          while (i < base + 128) {
            carry = (carry + out(i)) & 0xffffffffL
            out(i) = carry
            i += 1
          }
          base += 128
        }
        out
      case 16 => // Patas (float pages): first value raw, then u16-packed
        // (refIndex<<9 | sigBytes<<6 | trailingZeroBits) + sig XOR bytes
        // (`/root/reference/src/compression/double/patas.rs`)
        require(width == 4 || width == 8,
          s"strawboat import: Patas applies to float pages only (width=$width)")
        val mask = if (width == 4) 0xffffffffL else -1L
        val out = new Array[Long](n)
        out(0) = readVal(c) & mask
        var i = 1
        while (i < n) {
          val packed = c.u8() | (c.u8() << 8)
          val refIdx = (packed >> 9) & 0x7f
          var sig = (packed >> 6) & 7
          val tz = packed & 0x3f
          if (tz < 63 && sig == 0) sig = 8
          var v = 0L
          var b = 0
          while (b < sig) { v |= (c.b(c.pos + b) & 0xffL) << (8 * b); b += 1 }
          c.pos += sig
          val prev = out(i - refIdx)
          out(i) = ((v << tz) ^ prev) & mask
          i += 1
        }
        out
      case other => throw new UnsupportedOperationException(
        s"strawboat import: unknown integer codec $other")
    }
  }

  /** One SIMD-BP128 block (the `bitpacking` crate's BitPacker4x layout):
    * 128 u32s seen as 32 registers of 4 consecutive values; lane l's
    * 32-value sub-stream (original indices 4i+l) is LSB-first bitpacked
    * into `numBits` u32 words, and word g of the output interleaves the
    * four lanes' g-th words (16 bytes per group, numBits groups total).
    */
  private def unpack128(c: Cursor, numBits: Int, out: Array[Long], base: Int): Unit = {
    if (numBits == 0) {
      java.util.Arrays.fill(out, base, base + 128, 0L)
      return
    }
    val mask = if (numBits == 32) 0xffffffffL else (1L << numBits) - 1
    def word(g: Int, lane: Int): Long = {
      val p = c.pos + g * 16 + lane * 4
      (c.b(p) & 0xffL) | (c.b(p + 1) & 0xffL) << 8 |
        (c.b(p + 2) & 0xffL) << 16 | (c.b(p + 3) & 0xffL) << 24
    }
    var lane = 0
    while (lane < 4) {
      var i = 0
      while (i < 32) {
        val bitPos = i * numBits
        val g = bitPos >> 5
        val off = bitPos & 31
        var v = word(g, lane) >>> off
        if (off + numBits > 32) v |= word(g + 1, lane) << (32 - off)
        out(base + 4 * i + lane) = v & mask
        i += 1
      }
      lane += 1
    }
    c.pos += numBits * 16
  }

  /** Binary block: returns n byte arrays (null-position contents are
    * garbage masked later by validity). Basic = two codec sub-blocks
    * (zero-based offsets then values); OneValue/Dict per the reference
    * binary codecs.
    */
  private def decodeBinaryBlock(c: Cursor, n: Int, wideOffsets: Boolean): Array[Array[Byte]] = {
    val codec = c.u8()
    val csize = c.u32().toInt
    val usize = c.u32().toInt
    codec match {
      case 0 | 1 | 2 | 3 =>
        val offRaw = commonDecompress(codec, c.bytes(csize), usize)
        val offW = if (wideOffsets) 8 else 4
        require(offRaw.length >= (n + 1) * offW,
          s"strawboat import: offsets block too short (${offRaw.length} for ${n + 1} x $offW)")
        val ob = java.nio.ByteBuffer.wrap(offRaw).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val offsets = Array.tabulate(n + 1)(i =>
          if (wideOffsets) ob.getLong(i * 8) else ob.getInt(i * 4).toLong)
        // second sub-block: values
        val vcodec = c.u8()
        val vcsize = c.u32().toInt
        val vusize = c.u32().toInt
        val values = commonDecompress(vcodec, c.bytes(vcsize), vusize)
        Array.tabulate(n) { i =>
          java.util.Arrays.copyOfRange(values, offsets(i).toInt, offsets(i + 1).toInt)
        }
      case 12 => // OneValue: u32 len + bytes
        val len = c.u32().toInt
        val v = c.bytes(len)
        Array.fill(n)(v)
      case 11 => // Dict: recursive u32 indices + set count + (u64 len + bytes)*
        val indices = decodeIntBlock(c, n, 4, signed = false)
        val setCount = c.u32().toInt
        val sets = Array.fill(setCount) { val l = c.i64().toInt; c.bytes(l) }
        indices.map(i => sets(i.toInt))
      case 13 => // Freq: (u64 len + top value) + roaring exceptions bitmap +
        // plain (u64 len + bytes)* exceptions (`binary/freq.rs:66-90`)
        val topLen = c.i64().toInt
        val top = c.bytes(topLen)
        val bmSize = c.u32().toInt
        val bm = new org.roaringbitmap.RoaringBitmap()
        bm.deserialize(java.nio.ByteBuffer.wrap(c.b, c.pos, bmSize)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN))
        c.pos += bmSize
        val out = Array.fill[Array[Byte]](n)(top)
        val it = bm.getIntIterator
        while (it.hasNext) {
          val i = it.next()
          val l = c.i64().toInt
          out(i) = c.bytes(l)
        }
        out
      case other => throw new UnsupportedOperationException(
        s"strawboat import: binary codec $other is not supported by the flat importer v1")
    }
  }

  private def decodeBoolBlock(c: Cursor, n: Int): Array[Boolean] = {
    val codec = c.u8()
    val csize = c.u32().toInt
    val _usize = c.u32() // NOTE: reference stores the VALUE COUNT here for booleans
    codec match {
      case 0 | 1 | 2 | 3 =>
        val raw = commonDecompress(codec, c.bytes(csize), (n + 7) / 8)
        Array.tabulate(n)(i => ((raw(i >> 3) >> (i & 7)) & 1) == 1)
      case 10 => // RLE: (count u32, value u8)* (`boolean/rle.rs`)
        val out = new Array[Boolean](n)
        var idx = 0
        while (idx < n) {
          val count = c.u32().toInt
          val v = c.u8() != 0
          var i = 0
          while (i < count && idx < n) { out(idx) = v; idx += 1; i += 1 }
        }
        out
      case 12 => // OneValue: single u8 (`boolean/one_value.rs`)
        val v = c.u8() != 0
        Array.fill(n)(v)
      case other => throw new UnsupportedOperationException(
        s"strawboat import: boolean codec $other is not supported by the flat importer v1")
    }
  }

  // ------------------------------------------------- column materialize

  /** Decode one codec block of `n` values of arrow type `t` to JVM values.
    * Null-position contents are whatever the writer put there — callers
    * mask them with the validity bitmap (flat) or def levels (nested).
    */
  private def decodeTypedBlock(c: Cursor, n: Int, t: ArrowType): Array[Any] = t match {
    case t: ArrowType.Int =>
      val w = t.getBitWidth / 8
      val vs = decodeIntBlock(c, n, w, t.getIsSigned)
      (t.getBitWidth, t.getIsSigned) match {
        case (8, true) => Array.tabulate[Any](n)(i => vs(i).toByte)
        case (16, true) => Array.tabulate[Any](n)(i => vs(i).toShort)
        case (32, true) => Array.tabulate[Any](n)(i => vs(i).toInt)
        case (64, true) => Array.tabulate[Any](n)(i => vs(i))
        case (8, false) => Array.tabulate[Any](n)(i => (vs(i) & 0xffL).toShort)
        case (16, false) => Array.tabulate[Any](n)(i => (vs(i) & 0xffffL).toInt)
        case (32, false) => Array.tabulate[Any](n)(i => vs(i) & 0xffffffffL)
        case (64, false) => Array.tabulate[Any](n) { i =>
          new java.math.BigDecimal(
            new java.math.BigInteger(java.lang.Long.toUnsignedString(vs(i))))
        }
        case _ => throw new IllegalStateException("unreachable: gated by sparkType")
      }
    case t: ArrowType.FloatingPoint =>
      val single =
        t.getPrecision == org.apache.arrow.vector.types.FloatingPointPrecision.SINGLE
      val vs = decodeIntBlock(c, n, if (single) 4 else 8, signed = false)
      if (single) Array.tabulate[Any](n)(i => java.lang.Float.intBitsToFloat(vs(i).toInt))
      else Array.tabulate[Any](n)(i => java.lang.Double.longBitsToDouble(vs(i)))
    case d: ArrowType.Date =>
      require(d.getUnit == org.apache.arrow.vector.types.DateUnit.DAY)
      val vs = decodeIntBlock(c, n, 4, signed = true)
      Array.tabulate[Any](n)(i =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(vs(i))))
    case t: ArrowType.Timestamp =>
      val vs = decodeIntBlock(c, n, 8, signed = true)
      import org.apache.arrow.vector.types.TimeUnit._
      val toMicros: Long => Long = t.getUnit match {
        case SECOND => _ * 1000000L
        case MILLISECOND => _ * 1000L
        case MICROSECOND => identity
        case NANOSECOND => Math.floorDiv(_, 1000L)
      }
      if (t.getTimezone == null)
        Array.tabulate[Any](n) { i =>
          val us = toMicros(vs(i))
          java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(us, 1000000L),
            (Math.floorMod(us, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
        }
      else
        Array.tabulate[Any](n) { i =>
          val us = toMicros(vs(i))
          val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
          ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
          ts
        }
    case d: ArrowType.Decimal =>
      // i128 LE per value; Common + OneValue only
      val codec = c.u8()
      val csize = c.u32().toInt
      val usize = c.u32().toInt
      def bigAt(raw: Array[Byte], base: Int): java.math.BigDecimal = {
        val be = new Array[Byte](16)
        var i = 0
        while (i < 16) { be(i) = raw(base + 15 - i); i += 1 } // LE -> BE
        new java.math.BigDecimal(new java.math.BigInteger(be), d.getScale)
      }
      codec match {
        case 0 | 1 | 2 | 3 =>
          val raw = commonDecompress(codec, c.bytes(csize), usize)
          Array.tabulate[Any](n)(i => bigAt(raw, i * 16))
        case 12 =>
          val v = bigAt(c.bytes(16), 0)
          Array.fill[Any](n)(v)
        case other => throw new UnsupportedOperationException(
          s"strawboat import: decimal128 codec $other not supported by the importer")
      }
    case _: ArrowType.Utf8 | _: ArrowType.LargeUtf8 =>
      val vs = decodeBinaryBlock(c, n, t.isInstanceOf[ArrowType.LargeUtf8])
      Array.tabulate[Any](n)(i =>
        new String(vs(i), java.nio.charset.StandardCharsets.UTF_8))
    case _: ArrowType.Binary | _: ArrowType.LargeBinary =>
      val vs = decodeBinaryBlock(c, n, t.isInstanceOf[ArrowType.LargeBinary])
      Array.tabulate[Any](n)(i => vs(i))
    case _: ArrowType.Bool =>
      val vs = decodeBoolBlock(c, n)
      Array.tabulate[Any](n)(i => vs(i))
    case t => throw new UnsupportedOperationException(
      s"strawboat import: type $t not supported")
  }

  /** Decode one whole FLAT column to JVM values Spark's Row encoder accepts. */
  def decodeColumn(in: SeekableInput, field: AField, meta: ColumnMeta): Array[Any] = {
    val nullable = field.isNullable
    val out = Array.newBuilder[Any]
    var off = meta.offset
    meta.pages.foreach { pm =>
      val page = in.readRange(off, pm.length.toInt)
      off += pm.length
      val c = new Cursor(page, 0)
      val n = pm.numValues.toInt
      val validity: Array[Boolean] =
        if (!nullable) null
        else {
          val dlen = c.u32().toInt
          decodeValidity(c.bytes(dlen), n)
        }
      val vs = decodeTypedBlock(c, n, field.getType)
      var i = 0
      while (i < n) {
        out += (if (validity != null && !validity(i)) null else vs(i))
        i += 1
      }
    }
    out.result()
  }

  // --------------------------------------------------- nested materialize

  /** Level-structure tree mirroring the reference reader's `InitNested`
    * chain (`/root/reference/src/read/deserialize.rs:140-235`): each level
    * contributes `nullable + repeated` to the def budget and `repeated` to
    * the rep budget (`read_basic.rs:96-106` cum_sum/cum_rep). Map is a
    * List over its entries Struct, exactly as the reference reads it
    * (`deserialize.rs:212-217`).
    */
  private sealed trait Node { def nullable: Boolean; def leafCount: Int }
  private final case class PrimNode(field: AField) extends Node {
    def nullable: Boolean = field.isNullable
    def leafCount = 1
  }
  private final case class ListNode(nullable: Boolean, child: Node, isMap: Boolean) extends Node {
    def leafCount: Int = child.leafCount
  }
  private final case class StructNode(nullable: Boolean, children: Seq[Node]) extends Node {
    val leafCount: Int = children.map(_.leafCount).sum
  }

  private def buildNode(f: AField): Node = f.getType match {
    case _: ArrowType.List | _: ArrowType.LargeList | _: ArrowType.FixedSizeList =>
      ListNode(f.isNullable, buildNode(f.getChildren.get(0)), isMap = false)
    case _: ArrowType.Map =>
      val entries = f.getChildren.get(0)
      ListNode(f.isNullable,
        StructNode(entries.isNullable,
          Seq(buildNode(entries.getChildren.get(0)), buildNode(entries.getChildren.get(1)))),
        isMap = true)
    case _: ArrowType.Struct =>
      import scala.jdk.CollectionConverters._
      StructNode(f.isNullable, f.getChildren.asScala.toSeq.map(buildNode))
    case _ => PrimNode(f)
  }

  /** DFS leaves with their cumulative (def-before-leaf, rep) budgets —
    * cum_sum[leaf depth] / cum_rep in the reference's terms. */
  private def leafBudgets(node: Node, d: Int, r: Int): Seq[(AField, Int, Int)] = node match {
    case PrimNode(f) => Seq((f, d, r))
    case ListNode(nl, child, _) => leafBudgets(child, d + (if (nl) 2 else 1), r + 1)
    case StructNode(nl, children) =>
      val d2 = d + (if (nl) 1 else 0)
      children.flatMap(c => leafBudgets(c, d2, r))
  }

  /** parquet hybrid RLE/bitpacked levels at bit width of `maxLevel` —
    * exactly `HybridRleDecoder::try_new(bytes, get_bit_width(max), n)`
    * (`read_basic.rs:84-86`). Width 0 ⇒ all zeros, empty byte stream.
    */
  private[format] def decodeHybridLevels(bytes: Array[Byte], n: Int, maxLevel: Int): Array[Int] = {
    val out = new Array[Int](n)
    if (maxLevel == 0 || n == 0) return out
    val width = 32 - Integer.numberOfLeadingZeros(maxLevel)
    val mask = (1L << width) - 1
    var idx = 0
    var pos = 0
    while (idx < n && pos < bytes.length) {
      var h = 0L; var shift = 0; var more = true
      while (more) {
        val x = bytes(pos) & 0xff; pos += 1
        h |= (x & 0x7fL) << shift; shift += 7; more = (x & 0x80) != 0
      }
      if ((h & 1) == 1) {
        // bit-packed: (h>>1) groups of 8 values, `width` bytes per group
        val groups = (h >>> 1).toInt
        var g = 0
        while (g < groups) {
          var acc = 0L; var b = 0
          while (b < width) {
            acc |= (if (pos < bytes.length) bytes(pos) & 0xffL else 0L) << (8 * b)
            pos += 1; b += 1
          }
          var k = 0
          while (k < 8 && idx < n) {
            out(idx) = ((acc >>> (k * width)) & mask).toInt; idx += 1; k += 1
          }
          g += 1
        }
      } else {
        // RLE run: count + value in ceil(width/8) bytes
        val count = (h >>> 1).toInt
        val vbytes = (width + 7) / 8
        var v = 0; var b = 0
        while (b < vbytes) { v |= (bytes(pos) & 0xff) << (8 * b); pos += 1; b += 1 }
        var c = 0
        while (c < count && idx < n) { out(idx) = v; idx += 1; c += 1 }
      }
    }
    out
  }

  /** One leaf's decoded page: level streams + value slots + cursors. */
  private final class LeafStream(val reps: Array[Int], val defs: Array[Int],
      val values: Array[Any], val defBeforeLeaf: Int, val leafNullable: Boolean) {
    var i = 0 // level cursor
    var vi = 0 // value cursor
    def defl: Int = defs(i)
    /** consume one level entry; if the leaf slot exists, also its value */
    def take(): Any = {
      val d = defs(i); i += 1
      if (d < defBeforeLeaf) null // ancestor null/empty: no slot
      else {
        val v = values(vi); vi += 1
        if (leafNullable && d == defBeforeLeaf) null else v
      }
    }
    def skipOne(): Unit = { val _ = take() }
  }

  /** Assemble ONE slot of `node` from the leaf streams rooted at
    * `leafOff`, Dremel-style: `d` = def budget consumed by ancestors,
    * `r` = rep budget (list depth) above this node.
    */
  private def assemble(node: Node, leaves: Array[LeafStream], leafOff: Int,
      d: Int, r: Int): Any = node match {
    case _: PrimNode => leaves(leafOff).take()
    case StructNode(nullable, children) =>
      val head = leaves(leafOff)
      if (nullable && head.defl <= d) {
        // null struct: every leaf below carries exactly one entry
        (leafOff until leafOff + node.leafCount).foreach(li => leaves(li).skipOne())
        null
      } else {
        val d2 = d + (if (nullable) 1 else 0)
        var off = leafOff
        val cells = children.map { ch =>
          val v = assemble(ch, leaves, off, d2, r)
          off += ch.leafCount
          v
        }
        org.apache.spark.sql.Row.fromSeq(cells)
      }
    case ListNode(nullable, child, isMap) =>
      val head = leaves(leafOff)
      val dPresent = d + (if (nullable) 1 else 0) // list defined
      val dElems = dPresent + 1 // repeated level: at least one element
      val curDef = head.defl
      if (nullable && curDef <= d) {
        (leafOff until leafOff + node.leafCount).foreach(li => leaves(li).skipOne())
        null
      } else if (curDef < dElems) {
        // defined but empty
        (leafOff until leafOff + node.leafCount).foreach(li => leaves(li).skipOne())
        if (isMap) Map.empty[Any, Any] else Seq.empty[Any]
      } else {
        val r2 = r + 1
        val buf = scala.collection.mutable.ListBuffer.empty[Any]
        var continue = true
        while (continue) {
          buf += assemble(child, leaves, leafOff, dElems, r2)
          // peek: next entry continues THIS list iff its rep == r2
          continue = head.i < head.reps.length && head.reps(head.i) >= r2
        }
        if (isMap)
          buf.iterator.map { case row: org.apache.spark.sql.Row => (row(0), row(1)) }.toMap
        else buf.toList
      }
  }

  /** Decode one whole NESTED column (leafCount metas) to JVM values. */
  private def decodeNestedColumn(in: SeekableInput, node: Node,
      metas: Seq[ColumnMeta]): Array[Any] = {
    val budgets = leafBudgets(node, 0, 0)
    require(budgets.size == metas.size,
      s"strawboat import: ${budgets.size} leaves vs ${metas.size} metas")
    val nPages = metas.head.pages.size
    metas.foreach(m => require(m.pages.size == nPages,
      s"strawboat import: ragged page counts across nested leaves " +
      s"(${m.pages.size} vs $nPages)"))
    val offs = metas.map(_.offset).toArray
    val out = Array.newBuilder[Any]
    var p = 0
    while (p < nPages) {
      var pageRows = -1
      val streams = budgets.zipWithIndex.map { case ((f, defBefore, maxRep), li) =>
        val pm = metas(li).pages(p)
        val page = in.readRange(offs(li), pm.length.toInt)
        offs(li) += pm.length
        val c = new Cursor(page, 0)
        val nLevels = pm.numValues.toInt
        // nested page header (`read_basic.rs:72-81`): rows, rep len, def len
        val rows = c.u32().toInt
        val repLen = c.u32().toInt
        val defLen = c.u32().toInt
        val maxDef = defBefore + (if (f.isNullable) 1 else 0)
        val reps = decodeHybridLevels(c.bytes(repLen), nLevels, maxRep)
        val defs = decodeHybridLevels(c.bytes(defLen), nLevels, maxDef)
        if (pageRows < 0) pageRows = rows
        else require(rows == pageRows,
          s"strawboat import: leaf row counts disagree ($rows vs $pageRows)")
        var nSlots = 0
        defs.foreach(dv => if (dv >= defBefore) nSlots += 1)
        val values = decodeTypedBlock(c, nSlots, f.getType)
        new LeafStream(reps, defs, values, defBefore, f.isNullable)
      }.toArray
      var row = 0
      while (row < pageRows) {
        require(streams(0).reps(streams(0).i) == 0,
          "strawboat import: row did not start at rep level 0")
        out += assemble(node, streams, 0, 0, 0)
        row += 1
      }
      streams.foreach(s => require(s.i == s.reps.length && s.vi == s.values.length,
        s"strawboat import: page not fully consumed (${s.i}/${s.reps.length} levels, " +
        s"${s.vi}/${s.values.length} values)"))
      p += 1
    }
    out.result()
  }

  /** Decode a whole file into (spark schema, row-major values). */
  def decodeFile(in: SeekableInput): (StructType, Seq[Array[Any]]) = {
    import scala.jdk.CollectionConverters._
    val footer = readFooter(in)
    decodeProjected(in, footer,
      footer.arrowSchema.getFields.asScala.toSeq.map(_.getName))
  }

  /** Column-PRUNED decode: reads and decodes only `wanted` top-level
    * columns' byte ranges (pages of unselected columns are never fetched —
    * the footer metas carry every column's offsets). `wanted` order is the
    * output column order; an empty projection still yields the correct row
    * count (for COUNT(*)-style scans) from the first column's page
    * headers without decoding any values.
    */
  def decodeProjected(in: SeekableInput, footer: StrFooter,
      wanted: Seq[String]): (StructType, Seq[Array[Any]]) = {
    import scala.jdk.CollectionConverters._
    val fields = footer.arrowSchema.getFields.asScala.toSeq
    val nodes = fields.map(buildNode)
    val wantLeaves = nodes.map(_.leafCount).sum
    require(wantLeaves == footer.metas.size,
      s"strawboat import: $wantLeaves schema leaves vs ${footer.metas.size} column metas")
    var mi = 0
    val byName = fields.zip(nodes).map { case (f, node) =>
      val metas = footer.metas.slice(mi, mi + node.leafCount)
      mi += node.leafCount
      f.getName -> ((f, node, metas))
    }.toMap
    val sel = wanted.map(w => byName.getOrElse(w, throw new IllegalArgumentException(
      s"strawboat import: no column '$w' in ${fields.map(_.getName).mkString(", ")}")))
    val cols = sel.map { case (f, node, metas) =>
      node match {
        case _: PrimNode => decodeColumn(in, f, metas.head)
        case _ => decodeNestedColumn(in, node, metas)
      }
    }
    val nRows =
      if (cols.nonEmpty) cols.head.length
      else rowCount(in, fields, nodes, footer.metas)
    cols.foreach(cl => require(cl.length == nRows,
      s"strawboat import: ragged columns (${cl.length} vs $nRows)"))
    val schema = StructType(sel.map { case (f, _, _) =>
      StructField(f.getName, sparkType(f), f.isNullable)
    })
    val rows = (0 until nRows).map(r => Array.tabulate[Any](cols.size)(ci => cols(ci)(r)))
    (schema, rows)
  }

  /** Row count without decoding values: flat first column ⇒ sum of page
    * `num_values`; nested ⇒ the `rows` u32 leading each first-leaf page.
    */
  private def rowCount(in: SeekableInput, fields: Seq[AField], nodes: Seq[Node],
      metas: Seq[ColumnMeta]): Int = {
    if (fields.isEmpty) return 0
    nodes.head match {
      case _: PrimNode => metas.head.pages.map(_.numValues).sum.toInt
      case _ =>
        var off = metas.head.offset
        var n = 0L
        metas.head.pages.foreach { pm =>
          val hdr = in.readRange(off, 4)
          n += (hdr(0) & 0xffL) | (hdr(1) & 0xffL) << 8 |
            (hdr(2) & 0xffL) << 16 | (hdr(3) & 0xffL) << 24
          off += pm.length
        }
        n.toInt
    }
  }
}
