package graft.format

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.apache.arrow.vector.types.pojo.{ArrowType, Field => AField, FieldType, Schema => ASchema}
import scala.jdk.CollectionConverters._

/** Write-side counterpart of [[StrawboatImport]]: encodes Spark rows into
  * REFERENCE-layout strawboat files (`ARROW2` magic) so data produced here
  * can be handed back to a deployment still running the reference engine —
  * interop in BOTH directions, not just migration in.
  *
  * Layout written (same spec the importer decodes, from the reference
  * sources — file frame `/root/reference/src/write/writer.rs:98-167`, page
  * frame `serialize.rs:200-232`, codec blocks
  * `compression/integer/mod.rs:49-70`):
  *
  *  - `ARROW2` magic + 2 pad bytes, then per-leaf pages COLUMN-CONTIGUOUS
  *    (column 0's pages, then column 1's, ...), then footer = arrow-IPC
  *    schema + column metas + schema_size(u32) + meta_size(u32) + EOS.
  *  - flat page: `def_levels_len(u32) | hybrid-RLE validity` (nullable
  *    fields only) + codec block `codec(u8)|csize(u32)|usize(u32)|payload`.
  *  - nested page: `rows(u32)|rep_len(u32)|def_len(u32)| rep | def` hybrid-
  *    RLE level streams + the leaf codec block; `num_values` is the
  *    level-tuple count (flat pages: the row count).
  *
  * Codec policy: value lanes go through an adaptive chooser that emits
  * the reference's special codecs whenever they beat the plain encoding,
  * so handed-back files land near the size the reference writer itself
  * would produce —
  *
  *  - integer family (ints, date, timestamp): OneValue / RLE / Dict /
  *    Freq (`compression/integer/{one_value,rle,dict,freq}.rs`), plus
  *    SIMD-BP128 Bitpacking / DeltaBitpacking on u32 lanes with
  *    128-aligned pages (`{bp,delta_bp}.rs`);
  *  - floats: the same integer codecs over raw bit patterns (the
  *    reference's OrderedFloat trick, `compression/double/mod.rs`);
  *  - strings/binary: OneValue / Dict / Freq (`compression/binary/`);
  *  - booleans: OneValue / RLE (`compression/boolean/`);
  *  - float lanes additionally compete Patas (`compression/double/
  *    patas.rs`) — f32 only when the stream encodes no equal-value pair:
  *    such a pair packs sig=0/tz=31 and the layout's sig==0 -> 8-byte
  *    decode repair (an f64-ism) desyncs the reference's own reader on
  *    it, so those pages fall back to the other codecs (see
  *    `patasPayloadOpt`; Float32PatasSpec pins both directions).
  *
  * Validity/level streams and non-winning pages stay on a COMMON codec
  * (None / Lz4 raw block / Zstd / Snappy), the spec's always-valid
  * encoding every reference reader decodes. `special = "none"` restores
  * pure-Common output; "onevalue"/"rle"/"dict" force a codec (on the
  * families that have it) for tests.
  *
  * Scale shape: `encodeFile` buffers one file's rows (column-contiguous
  * layout forces whole-file buffering — the reference writer itself holds
  * the full chunk in memory); callers bound memory by limiting rows per
  * file (see `graft.spark.GraftExport`).
  */
object StrawboatExport {

  // --------------------------------------------------- spark -> arrow schema

  /** Inverse of `StrawboatImport.sparkType` over the types the reference
    * supports; throws on anything its writer would reject too.
    */
  def arrowField(name: String, dt: DataType, nullable: Boolean): AField = {
    def mk(t: ArrowType, children: Seq[AField] = Nil): AField =
      new AField(name,
        if (nullable) FieldType.nullable(t) else FieldType.notNullable(t),
        children.asJava)
    dt match {
      case ByteType => mk(new ArrowType.Int(8, true))
      case ShortType => mk(new ArrowType.Int(16, true))
      case IntegerType => mk(new ArrowType.Int(32, true))
      case LongType => mk(new ArrowType.Int(64, true))
      case FloatType => mk(new ArrowType.FloatingPoint(
        org.apache.arrow.vector.types.FloatingPointPrecision.SINGLE))
      case DoubleType => mk(new ArrowType.FloatingPoint(
        org.apache.arrow.vector.types.FloatingPointPrecision.DOUBLE))
      case BooleanType => mk(ArrowType.Bool.INSTANCE)
      case StringType => mk(ArrowType.Utf8.INSTANCE)
      case BinaryType => mk(ArrowType.Binary.INSTANCE)
      case DateType => mk(new ArrowType.Date(org.apache.arrow.vector.types.DateUnit.DAY))
      case TimestampType => mk(new ArrowType.Timestamp(
        org.apache.arrow.vector.types.TimeUnit.MICROSECOND, "UTC"))
      case TimestampNTZType => mk(new ArrowType.Timestamp(
        org.apache.arrow.vector.types.TimeUnit.MICROSECOND, null))
      case d: DecimalType => mk(new ArrowType.Decimal(d.precision, d.scale, 128))
      case a: ArrayType =>
        mk(ArrowType.List.INSTANCE,
          Seq(arrowField("item", a.elementType, a.containsNull)))
      case s: StructType =>
        mk(ArrowType.Struct.INSTANCE,
          s.fields.toSeq.map(f => arrowField(f.name, f.dataType, f.nullable)))
      case m: MapType =>
        // arrow Map = List over a non-nullable entries struct(key, value)
        val entries = new AField("entries",
          FieldType.notNullable(ArrowType.Struct.INSTANCE),
          Seq(arrowField("key", m.keyType, nullable = false),
            arrowField("value", m.valueType, m.valueContainsNull)).asJava)
        mk(new ArrowType.Map(false), Seq(entries))
      case other => throw new UnsupportedOperationException(
        s"strawboat export: column '$name' has Spark type $other — the reference " +
        "format supports Byte/Short/Int/Long, Float/Double, Boolean, String, " +
        "Binary, Date, Timestamp, Decimal(<=38), and Array/Struct/Map over them")
    }
  }

  def arrowSchema(st: StructType): ASchema =
    new ASchema(st.fields.toSeq.map(f => arrowField(f.name, f.dataType, f.nullable)).asJava)

  // ------------------------------------------------------------ byte tools

  private def u32(v: Long): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(v.toInt); b.array()
  }
  private def u64(v: Long): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putLong(v); b.array()
  }
  private def cat(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray

  /** Common-codec compression of one payload. */
  private def compress(codec: Int, raw: Array[Byte]): Array[Byte] = codec match {
    case 0 => raw
    case 1 => // lz4 raw block (prepend_size=false), what the reference reads
      val c = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()
      val out = new Array[Byte](c.maxCompressedLength(raw.length))
      val n = c.compress(raw, 0, raw.length, out, 0)
      java.util.Arrays.copyOf(out, n)
    case 2 => com.github.luben.zstd.Zstd.compress(raw)
    case 3 => org.xerial.snappy.Snappy.compress(raw)
    case c => throw new IllegalArgumentException(s"strawboat export: codec $c")
  }

  /** `codec(u8) | csize(u32) | usize(u32) | payload`. `usizeOverride` serves
    * booleans, where the reference stores the VALUE COUNT in the
    * uncompressed-size field instead of the bitmap byte length.
    */
  private def block(codec: Int, raw: Array[Byte], usizeOverride: Long = -1L): Array[Byte] = {
    val payload = compress(codec, raw)
    cat(Array(codec.toByte), u32(payload.length),
      u32(if (usizeOverride >= 0) usizeOverride else raw.length.toLong), payload)
  }

  /** parquet hybrid-RLE levels at `get_bit_width(maxLevel)`: one bitpacked
    * run covering all values (multi-byte ULEB128 header for any length).
    * Width 0 ⇒ empty stream, matching the reader's all-zeros fast path.
    */
  private[format] def encodeHybridLevels(vals: Seq[Int], maxLevel: Int): Array[Byte] = {
    if (maxLevel == 0 || vals.isEmpty) return Array.empty
    val width = 32 - Integer.numberOfLeadingZeros(maxLevel)
    val groups = (vals.size + 7) / 8
    val out = new java.io.ByteArrayOutputStream()
    var header = (groups.toLong << 1) | 1
    while ({
      val x = (header & 0x7f).toInt
      header >>>= 7
      if (header != 0) out.write(x | 0x80) else out.write(x)
      header != 0
    }) ()
    var g = 0
    while (g < groups) {
      var acc = 0L
      var k = 0
      while (k < 8) {
        val i = g * 8 + k
        if (i < vals.size) acc |= (vals(i).toLong & ((1L << width) - 1)) << (k * width)
        k += 1
      }
      var b = 0
      while (b < width) { out.write(((acc >>> (8 * b)) & 0xff).toInt); b += 1 }
      g += 1
    }
    out.toByteArray
  }

  /** Flat validity block: `len(u32) | hybrid-RLE width-1 levels`. */
  private def validityBlock(valid: Array[Boolean]): Array[Byte] = {
    val levels = encodeHybridLevels(valid.map(v => if (v) 1 else 0).toSeq, 1)
    cat(u32(levels.length), levels)
  }

  // -------------------------------------------------------- leaf encoders

  private def leInts(width: Int, vs: Seq[Long]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(width * vs.size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    width match {
      case 1 => vs.foreach(v => b.put(v.toByte))
      case 2 => vs.foreach(v => b.putShort(v.toShort))
      case 4 => vs.foreach(v => b.putInt(v.toInt))
      case 8 => vs.foreach(v => b.putLong(v))
    }
    b.array()
  }

  private def tsMicros(v: Any): Long = v match {
    case t: java.sql.Timestamp =>
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    case i: java.time.Instant =>
      Math.multiplyExact(i.getEpochSecond, 1000000L) + i.getNano / 1000L
    case l: java.time.LocalDateTime => // NTZ wall clock, micros from epoch
      Math.multiplyExact(l.toEpochSecond(java.time.ZoneOffset.UTC), 1000000L) +
        l.getNano / 1000L
    case other => throw new IllegalArgumentException(s"timestamp value $other")
  }
  private def dateDays(v: Any): Long = v match {
    case d: java.sql.Date => d.toLocalDate.toEpochDay
    case d: java.time.LocalDate => d.toEpochDay
    case other => throw new IllegalArgumentException(s"date value $other")
  }

  /** Special integer codecs of the reference
    * (`/root/reference/src/compression/integer/{one_value,rle,dict}.rs`),
    * emitted when they beat the plain encoding (or when `special` forces
    * one). Same frame as every block — `codec(u8)|csize(u32)|usize(u32)`
    * with usize = n·width — payloads:
    *
    *  - OneValue (12): the single value, plain LE.
    *  - RLE (10): `(count u32 | value)*` runs.
    *  - Dict (11): a RECURSIVE integer block of u32 indices (here: a
    *    Common block, matching dict.rs's forbidden-Dict recursion) +
    *    `set_count u32` + first-appearance-ordered values, plain LE.
    */
  private def intBlock(width: Int, vals: Seq[Long], codec: Int,
      special: String, allowBp: Boolean = true,
      allowPatas: Boolean = false): Array[Byte] = {
    val n = vals.size
    def plain = block(codec, leInts(width, vals))
    def frame(id: Int, payload: Array[Byte]) =
      cat(Array(id.toByte), u32(payload.length.toLong), u32(n.toLong * width), payload)
    def oneValue = frame(12, leInts(width, Seq(vals.head)))
    def runs: Seq[(Int, Long)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
      vals.foreach { v =>
        if (out.nonEmpty && out.last._2 == v) out(out.size - 1) = (out.last._1 + 1, v)
        else out += ((1, v))
      }
      out.toSeq
    }
    def rle = frame(10, cat(runs.map { case (c, v) =>
      cat(u32(c.toLong), leInts(width, Seq(v))) }: _*))
    def dict = {
      val sets = scala.collection.mutable.LinkedHashMap.empty[Long, Int]
      val indices = vals.map(v => sets.getOrElseUpdate(v, sets.size).toLong)
      frame(11, cat(block(codec, leInts(4, indices)),
        u32(sets.size.toLong), leInts(width, sets.keys.toSeq)))
    }
    // Bitpacking (14) / DeltaBitpacking (15): the SIMD-BP128 vertical
    // layout (`compression/integer/{bp,delta_bp}.rs` via the bitpacking
    // crate's BitPacker4x): per 128-value block, u8 num_bits then 4
    // interleaved 32-value lanes packed into u32 words (value 4*i+lane at
    // bit i*num_bits of lane's word column). u32 lanes with n%128==0 only
    // — the same conditions under which the reference writer chooses them.
    // allowBp=false on float lanes: the reference's double codec family
    // has no Bitpack/DeltaBitpack, so emitting them there would produce a
    // file its reader rejects
    val bpOk = allowBp && width == 4 && n % 128 == 0
    def bitsOf(x: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(x)
    def pack128All(u: IndexedSeq[Long]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      var base = 0
      while (base < u.length) {
        var maxBits = 0
        var i = 0
        while (i < 128) {
          val b = bitsOf(u(base + i)); if (b > maxBits) maxBits = b; i += 1
        }
        bos.write(maxBits)
        if (maxBits > 0) {
          val words = new Array[Int](maxBits * 4)
          var lane = 0
          while (lane < 4) {
            var j = 0
            while (j < 32) {
              val v = u(base + 4 * j + lane)
              val bitPos = j * maxBits
              val g = bitPos >> 5
              val off = bitPos & 31
              words(g * 4 + lane) |= (v << off).toInt
              if (off + maxBits > 32) words((g + 1) * 4 + lane) |= (v >>> (32 - off)).toInt
              j += 1
            }
            lane += 1
          }
          words.foreach { w =>
            bos.write(w & 0xff); bos.write((w >> 8) & 0xff)
            bos.write((w >> 16) & 0xff); bos.write((w >> 24) & 0xff)
          }
        }
        base += 128
      }
      bos.toByteArray
    }
    lazy val u32s: IndexedSeq[Long] = vals.toIndexedSeq.map(_ & 0xffffffffL)
    lazy val deltas: IndexedSeq[Long] = u32s.indices
      .map(i => (u32s(i) - (if (i == 0) 0L else u32s(i - 1))) & 0xffffffffL)
    def packedBytes(u: IndexedSeq[Long]): Long = {
      var total = 0L
      var base = 0
      while (base < u.length) {
        var maxBits = 0
        var i = 0
        while (i < 128) {
          val b = bitsOf(u(base + i)); if (b > maxBits) maxBits = b; i += 1
        }
        total += 1 + maxBits * 16
        base += 128
      }
      total
    }
    def bitpack = frame(14, pack128All(u32s))
    def deltaBitpack = frame(15, pack128All(deltas))
    // Patas (16, float bit patterns, width 4 or 8): first value raw, then
    // per value a u16 `refDiff<<9 | sigBytes<<6 | (tz - isEq)` + the
    // XOR-vs-reference significant bytes (`compression/double/patas.rs:
    // 37-105`). The reference is the LAST occurrence of the same bit
    // pattern within the trailing 128 values (hash-indexed), else the
    // previous value. f32 lanes emit ONLY when the stream encodes no
    // equal-value pair (returns None otherwise): an f32 equal pair packs
    // sig=0 with tz=31, and the decoder's `sig==0 && tz<63 -> read 8
    // bytes` repair (`patas.rs:156-161` unpack — it exists for the f64
    // full-64-significant-bits case, whose sigBytes=8 wraps to 0 in the
    // 3-bit field) misfires on f32, consuming 8 payload bytes the writer
    // never produced — stream desync in the reference's own reader, so
    // such a stream is undecodable everywhere. f64 equal pairs pack
    // tz=63 and decode correctly.
    def patasPayloadOpt: Option[Array[Byte]] = {
      val wBits = width * 8
      val bos = new java.io.ByteArrayOutputStream()
      def wv(v: Long): Unit = { var b = 0; while (b < width) { bos.write(((v >>> (8 * b)) & 0xff).toInt); b += 1 } }
      wv(vals.head)
      val lastIdx = scala.collection.mutable.HashMap[Long, Int](vals.head -> 0)
      var i = 1
      while (i < n) {
        val v = vals(i)
        var refIdx = lastIdx.getOrElse(v, 0)
        if (refIdx > i || i - refIdx >= 128) refIdx = i - 1
        val refDiff = i - refIdx
        val xor = v ^ vals(refIdx)
        val tz = math.min(java.lang.Long.numberOfTrailingZeros(xor), wBits)
        val lz = java.lang.Long.numberOfLeadingZeros(xor) - (64 - wBits)
        val isEq = if (tz == wBits) 1 else 0
        if (isEq == 1 && width == 4) return None // undecodable f32 packet
        val sigBits = if (isEq == 1) 0 else wBits - tz - lz
        val sigBytes = (sigBits >> 3) + (if ((sigBits & 7) != 0) 1 else 0)
        val packed = (refDiff << 9) | ((sigBytes & 7) << 6) | (tz - isEq)
        bos.write(packed & 0xff); bos.write((packed >> 8) & 0xff)
        val shifted = if (isEq == 1) 0L else xor >>> (tz - isEq)
        var b = 0
        while (b < sigBytes) { bos.write(((shifted >>> (8 * b)) & 0xff).toInt); b += 1 }
        lastIdx(v) = i
        i += 1
      }
      Some(bos.toByteArray)
    }
    def patas = frame(16, patasPayloadOpt.getOrElse(throw new IllegalArgumentException(
      "forced patas on an f32 lane with an equal-value pair — the reference " +
        "layout cannot represent it (sig==0/tz<63 decode repair misreads it)")))
    // Freq (13): top value + roaring bitmap of exception positions +
    // recursive integer block of the exception values, matching
    // `compression/integer/freq.rs:60-90` (the roaring portable
    // serialization both the Rust crate and RoaringBitmap speak)
    def topValue: Long =
      vals.groupBy(identity).maxBy { case (v, g) => (g.size, -v) }._1
    def freq = {
      val top = topValue
      val bm = new org.roaringbitmap.RoaringBitmap()
      val exceptions = scala.collection.mutable.ArrayBuffer.empty[Long]
      vals.zipWithIndex.foreach { case (v, i) =>
        if (v != top) { bm.add(i); exceptions += v }
      }
      bm.runOptimize()
      val bmBytes = new Array[Byte](bm.serializedSizeInBytes())
      bm.serialize(java.nio.ByteBuffer.wrap(bmBytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN))
      frame(13, cat(leInts(width, Seq(top)), u32(bmBytes.length.toLong), bmBytes,
        block(codec, leInts(width, exceptions.toSeq))))
    }
    special match {
      case _ if n == 0 => plain
      case "none" => plain
      case "onevalue" =>
        require(vals.forall(_ == vals.head), "forced onevalue on non-constant page")
        oneValue
      case "rle" => rle
      case "dict" => dict
      case "freq" => freq
      case "patas" =>
        require(allowPatas, "forced patas applies to float lanes only")
        patas
      case "bitpack" =>
        require(bpOk, "forced bitpack needs a u32 lane with n % 128 == 0")
        bitpack
      case "deltabp" =>
        require(bpOk, "forced deltabp needs a u32 lane with n % 128 == 0")
        deltaBitpack
      case "adaptive" =>
        val rawBytes = n.toLong * width
        if (vals.forall(_ == vals.head)) oneValue
        else {
          val runBytes = runs.size.toLong * (4 + width)
          val distinct = vals.distinct.size
          // + 13: the recursive indices sub-block's own header
          val dictBytes =
            if (distinct >= (1 << 20)) Long.MaxValue
            else n.toLong * 4 + 13 + 4 + distinct.toLong * width
          val exceptionCount = n - vals.count(_ == topValue)
          // rough roaring cost: container overhead + ~2B/position
          val freqBytes = width.toLong + 4 + 16 + 2L * exceptionCount +
            13 + exceptionCount.toLong * width
          val bpBytes = if (bpOk) packedBytes(u32s) else Long.MaxValue
          val dbpBytes = if (bpOk) packedBytes(deltas) else Long.MaxValue
          val patasEnc = if (allowPatas) patasPayloadOpt.orNull else null
          val patasBytes = if (patasEnc != null) patasEnc.length.toLong else Long.MaxValue
          // smallest candidate wins if it beats plain by >= 10% (headers
          // and block-compression of the plain path eat anything closer)
          val best = Seq(("rle", runBytes), ("dict", dictBytes), ("freq", freqBytes),
            ("bitpack", bpBytes), ("deltabp", dbpBytes),
            ("patas", patasBytes)).minBy(_._2)
          if (best._2 * 10 <= rawBytes * 9) best._1 match {
            case "rle" => rle
            case "dict" => dict
            case "freq" => freq
            case "bitpack" => bitpack
            case "patas" => frame(16, patasEnc)
            case _ => deltaBitpack
          } else plain
        }
      case other => throw new IllegalArgumentException(
        s"strawboat export: unknown special-codec mode '$other' " +
          "(adaptive|none|onevalue|rle|dict|freq|bitpack|deltabp|patas)")
    }
  }

  /** Encode `slots` (null-free placeholders already substituted) of leaf
    * type `dt` as one codec block (strings/binary: two sub-blocks).
    */
  private def leafBlock(dt: DataType, slots: Seq[Any], codec: Int,
      special: String): Array[Byte] = dt match {
    case ByteType => intBlock(1, slots.map(_.asInstanceOf[Byte].toLong), codec, special)
    case ShortType => intBlock(2, slots.map(_.asInstanceOf[Short].toLong), codec, special)
    case IntegerType => intBlock(4, slots.map(_.asInstanceOf[Int].toLong), codec, special)
    case LongType => intBlock(8, slots.map(_.asInstanceOf[Long]), codec, special)
    case DateType => intBlock(4, slots.map(dateDays), codec, special)
    case TimestampType | TimestampNTZType => intBlock(8, slots.map(tsMicros), codec, special)
    case FloatType => intBlock(4,
      slots.map(v => java.lang.Float.floatToRawIntBits(v.asInstanceOf[Float]).toLong & 0xffffffffL),
      codec, special, allowBp = false, allowPatas = true)
    case DoubleType => intBlock(8,
      slots.map(v => java.lang.Double.doubleToRawLongBits(v.asInstanceOf[Double])),
      codec, special, allowPatas = true)
    case BooleanType =>
      boolBlock(slots.map(_.asInstanceOf[Boolean]), codec, special)
    case d: DecimalType =>
      val raw = new Array[Byte](16 * slots.size)
      slots.zipWithIndex.foreach { case (v, i) =>
        val bd = v match {
          case b: java.math.BigDecimal => b
          case b: BigDecimal => b.bigDecimal
          case b: org.apache.spark.sql.types.Decimal => b.toJavaBigDecimal
        }
        val unscaled = bd.setScale(d.scale).unscaledValue()
        val be = unscaled.toByteArray // big-endian two's complement
        require(be.length <= 16, s"strawboat export: decimal $bd overflows 128 bits")
        val sign: Byte = if (unscaled.signum() < 0) -1 else 0
        var k = 0
        while (k < 16) {
          val src = be.length - 1 - k // LE byte k
          raw(i * 16 + k) = if (src >= 0) be(src) else sign
          k += 1
        }
      }
      block(codec, raw)
    case StringType =>
      val bytes = slots.map(v => v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      binaryBlock(bytes, codec, special)
    case BinaryType =>
      binaryBlock(slots.map(_.asInstanceOf[Array[Byte]]), codec, special)
    case other => throw new UnsupportedOperationException(
      s"strawboat export: leaf type $other")
  }

  /** Boolean special codecs (`/root/reference/src/compression/boolean/
    * {one_value,rle}.rs`): OneValue = single u8; RLE = `(count u32 |
    * value u8)*` runs. Adaptive picks them when they beat the bitmap.
    * usize carries the VALUE COUNT, like the boolean Basic block.
    */
  private def boolBlock(vals: Seq[Boolean], codec: Int, special: String): Array[Byte] = {
    val n = vals.size
    def plain = {
      val bits = new Array[Byte]((n + 7) / 8)
      vals.zipWithIndex.foreach { case (v, i) =>
        if (v) bits(i >> 3) = (bits(i >> 3) | (1 << (i & 7))).toByte
      }
      block(codec, bits, usizeOverride = n.toLong)
    }
    def frame(id: Int, payload: Array[Byte]) =
      cat(Array(id.toByte), u32(payload.length.toLong), u32(n.toLong), payload)
    def oneValue = frame(12, Array[Byte](if (vals.head) 1 else 0))
    def runs: Seq[(Int, Boolean)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Boolean)]
      vals.foreach { v =>
        if (out.nonEmpty && out.last._2 == v) out(out.size - 1) = (out.last._1 + 1, v)
        else out += ((1, v))
      }
      out.toSeq
    }
    def rle = frame(10, cat(runs.map { case (c, v) =>
      cat(u32(c.toLong), Array[Byte](if (v) 1 else 0)) }: _*))
    special match {
      case _ if n == 0 => plain
      case "none" | "dict" | "freq" | "bitpack" | "deltabp" | "patas" => plain // RLE/OneValue only
      case "onevalue" =>
        require(vals.forall(_ == vals.head), "forced onevalue on non-constant page")
        oneValue
      case "rle" => rle
      case "adaptive" =>
        if (vals.forall(_ == vals.head)) oneValue
        else if (runs.size * 5L * 10 <= ((n + 7) / 8).toLong * 9) rle
        else plain
      case other => throw new IllegalArgumentException(
        s"strawboat export: unknown special-codec mode '$other'")
    }
  }

  /** Binary special codecs (`/root/reference/src/compression/binary/
    * {one_value,dict}.rs`): OneValue = `u32 len | bytes`; Dict = recursive
    * u32-indices integer block + `set_count u32` + `(u64 len | bytes)*`
    * first-appearance sets. Falls back to the two-sub-block Basic layout.
    */
  private def binaryBlock(vs: Seq[Array[Byte]], codec: Int, special: String): Array[Byte] = {
    val n = vs.size
    def plain = binaryTwoBlock(vs, codec)
    val totalBytes = vs.iterator.map(_.length.toLong).sum
    def frame(id: Int, payload: Array[Byte]) =
      cat(Array(id.toByte), u32(payload.length.toLong),
        u32((n + 1).toLong * 4 + totalBytes), payload)
    def oneValue = frame(12, cat(u32(vs.head.length.toLong), vs.head))
    def dictParts: (Seq[Long], Seq[Array[Byte]]) = {
      val sets = scala.collection.mutable.LinkedHashMap.empty[String, Int]
      val keys = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      val indices = vs.map { v =>
        val kStr = java.util.Base64.getEncoder.encodeToString(v)
        sets.getOrElseUpdate(kStr, { keys += v; keys.size - 1 }).toLong
      }
      (indices, keys.toSeq)
    }
    def dict = {
      val (indices, keys) = dictParts
      frame(11, cat(block(codec, leInts(4, indices)),
        u32(keys.size.toLong),
        cat(keys.map(k => cat(u64(k.length.toLong), k)): _*)))
    }
    // binary Freq (13): `u64 len | top bytes` + roaring exception-position
    // bitmap + `(u64 len | bytes)*` exceptions (`compression/binary/freq.rs:66-90`)
    def topKey: Array[Byte] =
      vs.groupBy(v => java.util.Base64.getEncoder.encodeToString(v))
        .maxBy(_._2.size)._2.head
    def freq = {
      val top = topKey
      val bm = new org.roaringbitmap.RoaringBitmap()
      val exceptions = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      vs.zipWithIndex.foreach { case (v, i) =>
        if (!java.util.Arrays.equals(v, top)) { bm.add(i); exceptions += v }
      }
      bm.runOptimize()
      val bmBytes = new Array[Byte](bm.serializedSizeInBytes())
      bm.serialize(java.nio.ByteBuffer.wrap(bmBytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN))
      frame(13, cat(u64(top.length.toLong), top, u32(bmBytes.length.toLong), bmBytes,
        cat(exceptions.toSeq.map(e => cat(u64(e.length.toLong), e)): _*)))
    }
    special match {
      case _ if n == 0 => plain
      case "none" | "rle" | "bitpack" | "deltabp" | "patas" => plain // no binary forms
      case "onevalue" =>
        require(vs.forall(v => java.util.Arrays.equals(v, vs.head)),
          "forced onevalue on non-constant page")
        oneValue
      case "dict" => dict
      case "freq" => freq
      case "adaptive" =>
        if (vs.forall(v => java.util.Arrays.equals(v, vs.head))) oneValue
        else {
          val (_, keys) = dictParts
          if (keys.size >= (1 << 20)) plain
          else {
            val plainBytes = (n + 1).toLong * 4 + totalBytes
            val dictBytes = n.toLong * 4 + 13 + 4 +
              keys.iterator.map(k => 8L + k.length).sum
            val top = topKey
            val excBytes = vs.iterator
              .filterNot(v => java.util.Arrays.equals(v, top))
              .map(e => 8L + e.length).sum
            val excCount = vs.count(v => !java.util.Arrays.equals(v, top))
            val freqBytes = 8L + top.length + 4 + 16 + 2L * excCount + excBytes
            val best = Seq(("dict", dictBytes), ("freq", freqBytes)).minBy(_._2)
            if (best._2 * 10 <= plainBytes * 9) (if (best._1 == "dict") dict else freq)
            else plain
          }
        }
      case other => throw new IllegalArgumentException(
        s"strawboat export: unknown special-codec mode '$other'")
    }
  }

  /** Binary Basic layout: zero-based i32 offsets sub-block + values
    * sub-block (`/root/reference/src/compression/binary/mod.rs:30-110`).
    */
  private def binaryTwoBlock(vs: Seq[Array[Byte]], codec: Int): Array[Byte] = {
    val offs = vs.scanLeft(0L)((a, b) => a + b.length)
    require(offs.last <= Int.MaxValue,
      "strawboat export: page value bytes exceed i32 offsets — lower pagerows")
    val offRaw = leInts(4, offs)
    val values = new java.io.ByteArrayOutputStream()
    vs.foreach(values.write)
    cat(block(codec, offRaw), block(codec, values.toByteArray))
  }

  /** Placeholder for a slot whose value is null (masked by validity / def
    * levels on read; the bytes only need to be type-valid).
    */
  private def zeroOf(dt: DataType): Any = dt match {
    case ByteType => 0.toByte
    case ShortType => 0.toShort
    case IntegerType => 0
    case LongType => 0L
    case FloatType => 0f
    case DoubleType => 0d
    case BooleanType => false
    case StringType => ""
    case BinaryType => Array.empty[Byte]
    case DateType => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(0))
    case TimestampType => new java.sql.Timestamp(0L)
    case TimestampNTZType =>
      java.time.LocalDateTime.ofEpochSecond(0L, 0, java.time.ZoneOffset.UTC)
    case d: DecimalType => java.math.BigDecimal.ZERO.setScale(d.scale)
    case other => throw new UnsupportedOperationException(s"zeroOf($other)")
  }

  // ------------------------------------------------------ nested shredding

  /** Dremel shred state per leaf (nested columns only). */
  private final class LeafBuf(val leafType: DataType, val leafNullable: Boolean) {
    val reps = scala.collection.mutable.ArrayBuffer.empty[Int]
    val defs = scala.collection.mutable.ArrayBuffer.empty[Int]
    val slots = scala.collection.mutable.ArrayBuffer.empty[Any]
  }

  private def leafFields(dt: DataType, nullable: Boolean): Seq[(DataType, Boolean)] = dt match {
    case a: ArrayType => leafFields(a.elementType, a.containsNull)
    case s: StructType => s.fields.toSeq.flatMap(f => leafFields(f.dataType, f.nullable))
    case m: MapType =>
      leafFields(m.keyType, nullable = false) ++ leafFields(m.valueType, m.valueContainsNull)
    case leaf => Seq((leaf, nullable))
  }

  /** Classic Dremel: `r` = rep level of this occurrence's first entries,
    * `d` = def budget consumed by defined ancestors, `listDepth` = list
    * ancestors (the rep level subsequent siblings repeat at). Mirrors the
    * level semantics the importer assembles
    * (`StrawboatImport.leafBudgets`/`assemble`).
    */
  private def shred(dt: DataType, nullable: Boolean, v: Any, bufs: Seq[LeafBuf],
      r: Int, d: Int, listDepth: Int): Unit = dt match {
    case a: ArrayType =>
      val dPresent = d + (if (nullable) 1 else 0)
      if (v == null) bufs.foreach { b => b.reps += r; b.defs += d }
      else {
        val elems: Seq[Any] = v match {
          case s: scala.collection.Seq[_] => s.toSeq
          case arr: Array[_] => arr.toSeq
          case other => throw new IllegalArgumentException(s"array value $other")
        }
        if (elems.isEmpty) bufs.foreach { b => b.reps += r; b.defs += dPresent }
        else elems.zipWithIndex.foreach { case (e, i) =>
          shred(a.elementType, a.containsNull, e, bufs,
            if (i == 0) r else listDepth + 1, dPresent + 1, listDepth + 1)
        }
      }
    case m: MapType =>
      // a Map shreds exactly like List(Struct(key, value)) — the arrow
      // entries struct is non-nullable, so it adds no def level
      val dPresent = d + (if (nullable) 1 else 0)
      if (v == null) bufs.foreach { b => b.reps += r; b.defs += d }
      else {
        val entries = v.asInstanceOf[scala.collection.Map[Any, Any]].toSeq
        val nKeyLeaves = leafFields(m.keyType, nullable = false).size
        if (entries.isEmpty) bufs.foreach { b => b.reps += r; b.defs += dPresent }
        else entries.zipWithIndex.foreach { case ((k, mv), i) =>
          val r2 = if (i == 0) r else listDepth + 1
          shred(m.keyType, nullable = false, k, bufs.take(nKeyLeaves),
            r2, dPresent + 1, listDepth + 1)
          shred(m.valueType, m.valueContainsNull, mv, bufs.drop(nKeyLeaves),
            r2, dPresent + 1, listDepth + 1)
        }
      }
    case s: StructType =>
      if (v == null) bufs.foreach { b => b.reps += r; b.defs += d }
      else {
        val d2 = d + (if (nullable) 1 else 0)
        val row = v.asInstanceOf[Row]
        var off = 0
        s.fields.zipWithIndex.foreach { case (f, i) =>
          val n = leafFields(f.dataType, f.nullable).size
          shred(f.dataType, f.nullable, row(i), bufs.slice(off, off + n), r, d2, listDepth)
          off += n
        }
      }
    case leaf =>
      val b = bufs.head
      b.reps += r
      if (v == null) {
        b.defs += d
        b.slots += zeroOf(leaf)
      } else {
        b.defs += d + (if (nullable) 1 else 0)
        b.slots += v
      }
  }

  /** (def budget before leaf, max rep) per leaf — same walk as the
    * importer's `leafBudgets`.
    */
  private def budgets(dt: DataType, nullable: Boolean, d: Int, r: Int): Seq[(Int, Int)] =
    dt match {
      case a: ArrayType =>
        budgets(a.elementType, a.containsNull, d + (if (nullable) 2 else 1), r + 1)
      case m: MapType =>
        val d2 = d + (if (nullable) 2 else 1) // list level (+1 def if nullable)
        // entries struct is non-nullable: contributes nothing further
        budgets(m.keyType, nullable = false, d2, r + 1) ++
          budgets(m.valueType, m.valueContainsNull, d2, r + 1)
      case s: StructType =>
        val d2 = d + (if (nullable) 1 else 0)
        s.fields.toSeq.flatMap(f => budgets(f.dataType, f.nullable, d2, r))
      case _ => Seq((d, r))
    }

  // ------------------------------------------------------------- encoding

  private final case class PageBytes(bytes: Array[Byte], numValues: Long)

  /** Encode one file: `ARROW2` frame, column-contiguous pages, footer.
    * `rows` is buffered in full (column-contiguous layout requires it).
    */
  def encodeFile(schema: StructType, rows: Seq[Row], pageRows: Int = 8192,
      codec: Int = 1, special: String = "adaptive"): Array[Byte] = {
    require(pageRows > 0, "strawboat export: pageRows must be positive")
    val aschema = arrowSchema(schema) // also validates type coverage
    val pagesOfRows = if (rows.isEmpty) Seq(Seq.empty[Row]) else rows.grouped(pageRows).toSeq

    // per-leaf page list, in schema DFS order
    val perLeaf = scala.collection.mutable.ArrayBuffer.empty[Seq[PageBytes]]
    schema.fields.zipWithIndex.foreach { case (f, ci) =>
      f.dataType match {
        case _: ArrayType | _: StructType | _: MapType =>
          val leaves = leafFields(f.dataType, f.nullable)
          val bgs = budgets(f.dataType, f.nullable, 0, 0)
          val pagesPerLeaf = leaves.map(_ => scala.collection.mutable.ArrayBuffer.empty[PageBytes])
          pagesOfRows.foreach { pr =>
            val bufs = leaves.map { case (lt, ln) => new LeafBuf(lt, ln) }
            pr.foreach(row => shred(f.dataType, f.nullable, row(ci), bufs, 0, 0, 0))
            bufs.zipWithIndex.foreach { case (b, li) =>
              val (defBefore, maxRep) = bgs(li)
              val maxDef = defBefore + (if (b.leafNullable) 1 else 0)
              val repB = encodeHybridLevels(b.reps.toSeq, maxRep)
              val defB = encodeHybridLevels(b.defs.toSeq, maxDef)
              val page = cat(u32(pr.size), u32(repB.length), u32(defB.length),
                repB, defB, leafBlock(b.leafType, b.slots.toSeq, codec, special))
              pagesPerLeaf(li) += PageBytes(page, b.reps.size.toLong)
            }
          }
          pagesPerLeaf.foreach(p => perLeaf += p.toSeq)
        case flat =>
          perLeaf += pagesOfRows.map { pr =>
            val vals = pr.map(r => r(ci))
            val body = leafBlock(flat, vals.map(v => if (v == null) zeroOf(flat) else v), codec, special)
            val page =
              if (f.nullable) cat(validityBlock(vals.map(_ != null).toArray), body)
              else body
            PageBytes(page, pr.size.toLong)
          }
      }
    }

    // assemble: magic+pad, body, schema, metas, sizes, EOS
    val out = new java.io.ByteArrayOutputStream()
    out.write(StrawboatImport.Magic)
    out.write(Array[Byte](0, 0))
    val metas = perLeaf.map { pages =>
      val off = out.size().toLong // next page lands at the current offset
      pages.foreach(p => out.write(p.bytes))
      (off, pages.map(p => (p.bytes.length.toLong, p.numValues)))
    }
    val schemaBytes = {
      val baos = new java.io.ByteArrayOutputStream()
      val ch = new org.apache.arrow.vector.ipc.WriteChannel(
        java.nio.channels.Channels.newChannel(baos))
      org.apache.arrow.vector.ipc.message.MessageSerializer.serialize(ch, aschema)
      baos.toByteArray
    }
    out.write(schemaBytes)
    val metaBytes = {
      val mb = new java.io.ByteArrayOutputStream()
      mb.write(u64(metas.size.toLong))
      metas.foreach { case (off, pages) =>
        mb.write(u64(off)); mb.write(u64(pages.size.toLong))
        pages.foreach { case (len, n) => mb.write(u64(len)); mb.write(u64(n)) }
      }
      mb.toByteArray
    }
    out.write(metaBytes)
    out.write(u32(schemaBytes.length.toLong))
    out.write(u32(metaBytes.length.toLong))
    out.write(Array[Byte](-1, -1, -1, -1, 0, 0, 0, 0)) // EOS continuation
    out.toByteArray
  }

  /** Codec name -> common codec id. */
  def codecId(name: String): Int = name.toLowerCase match {
    case "none" => 0
    case "lz4" => 1
    case "zstd" => 2
    case "snappy" => 3
    case other => throw new IllegalArgumentException(
      s"strawboat export: unknown compression '$other' (none|lz4|zstd|snappy)")
  }
}
