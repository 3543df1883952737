package graft.format

import org.roaringbitmap.RoaringBitmap

/** Special codecs for integer-valued pages (lanes I8..I64; float lanes
  * delegate their raw bit patterns here for RLE/Dict/Freq).
  *
  * Codec inventory and eligibility heuristics mirror the reference's
  * adaptive chooser (`/root/reference/src/compression/integer/mod.rs:231-308`),
  * but payload layouts are this library's own spec:
  *  - OneValue:      value@width
  *  - Rle:           u32 runCount | (u32 count, value@width)*
  *  - Dict:          u32 dictCount | dict values@width | nested frame (indices)
  *  - Freq:          top@width | u32 exCount | u32 rbLen | roaring bytes |
  *                   nested frame (exception values)
  *  - Bitpack:       i64 base | u8 bits | LSB-first packed (v-base)
  *    (frame-of-reference, so negatives/any lane work — generalizes the
  *     reference's min>=0 guard, bp.rs:92-99)
  *  - DeltaBitpack:  i64 first | u8 bits | packed non-negative deltas
  *    (sorted pages only, like delta_bp.rs:97-105)
  *
  * Null slots carry the preceding non-null value (reference semantics:
  * "nulls merged into the current run", SURVEY.md §7.4) — the validity
  * bitmap is authoritative.
  */
object IntCodecs {

  final class Stats(val n: Int) {
    var min: Long = Long.MaxValue
    var max: Long = Long.MinValue
    var runCount = 0
    var uniqueCount = 0
    var topValue = 0L
    var topCount = 0
    var sorted = true
    var maxDelta = 0L
    /** a sorted-adjacent difference exceeded Long range (x - prev wrapped
      * negative) — DeltaBitpack must not run on such a page */
    var deltaOverflow = false
    var hasNull = false
  }

  /** Fill null slots with the last non-null value (0 before the first). */
  def effectiveValues(vec: Vec, from: Int, until: Int, lane: Int): (Array[Long], Boolean) = {
    val n = until - from
    val out = new Array[Long](n)
    val nulls = vec.nulls
    var hasNull = false
    var last = 0L
    var i = 0
    lane match {
      case Lane.I64 =>
        val v = vec.asInstanceOf[LongVec].values
        while (i < n) {
          if (nulls != null && nulls(from + i)) { hasNull = true; out(i) = last }
          else { last = v(from + i); out(i) = last }
          i += 1
        }
      case Lane.F32 =>
        val v = vec.asInstanceOf[FloatVec].values
        while (i < n) {
          if (nulls != null && nulls(from + i)) { hasNull = true; out(i) = last }
          else { last = java.lang.Float.floatToRawIntBits(v(from + i)).toLong & 0xffffffffL; out(i) = last }
          i += 1
        }
      case Lane.F64 =>
        val v = vec.asInstanceOf[DoubleVec].values
        while (i < n) {
          if (nulls != null && nulls(from + i)) { hasNull = true; out(i) = last }
          else { last = java.lang.Double.doubleToRawLongBits(v(from + i)); out(i) = last }
          i += 1
        }
      case _ =>
        val v = vec.asInstanceOf[IntVec].values
        while (i < n) {
          if (nulls != null && nulls(from + i)) { hasNull = true; out(i) = last }
          else { last = v(from + i).toLong; out(i) = last }
          i += 1
        }
    }
    (out, hasNull)
  }

  /** One-pass stats over effective values (exact distinct/top via open
    * addressing; page-sized inputs keep this cheap).
    * Reference analogue: `gen_stats`, integer/mod.rs:164-229.
    */
  def computeStats(v: Array[Long]): Stats = {
    val n = v.length
    val s = new Stats(n)
    if (n == 0) { s.min = 0; s.max = 0; return s }
    // open addressing map value -> count
    var cap = Integer.highestOneBit(math.max(4, n * 2) - 1) << 1
    val keys = new Array[Long](cap)
    val cnts = new Array[Int](cap)
    val mask = cap - 1
    var i = 0
    var prev = 0L
    while (i < n) {
      val x = v(i)
      if (x < s.min) s.min = x
      if (x > s.max) s.max = x
      if (i == 0) s.runCount = 1
      else {
        if (x != prev) s.runCount += 1
        if (x < prev) s.sorted = false
        else {
          val d = x - prev
          if (d < 0) s.deltaOverflow = true // wrapped: true delta > Long.MaxValue
          else if (d > s.maxDelta) s.maxDelta = d
        }
      }
      prev = x
      // hash insert (h != 0 sentinel trick: use cnts==0 as empty)
      var h = (java.lang.Long.hashCode(x * -7046029254386353131L)) & mask
      var done = false
      while (!done) {
        if (cnts(h) == 0) { keys(h) = x; cnts(h) = 1; s.uniqueCount += 1; done = true }
        else if (keys(h) == x) {
          cnts(h) += 1
          done = true
        } else h = (h + 1) & mask
      }
      if (cnts(h) > s.topCount) { s.topCount = cnts(h); s.topValue = keys(h) }
      i += 1
    }
    s
  }

  @inline def bitsFor(range: Long): Int =
    if (range <= 0) 0 else 64 - java.lang.Long.numberOfLeadingZeros(range)

  @inline private def packedBytes(n: Int, bits: Int): Long = (n.toLong * bits + 7) / 8

  /** Choose + encode a codec-framed value body for an integer page.
    * Returns false if the common (block) codec should be used instead.
    * `forbid` is a bitmask of codec bytes (recursion guard, like
    * integer/dict.rs:59-62).
    */
  def tryWrite(v: Array[Long], n: Int, width: Int, opts: WriteOptions,
      forbid: Long, out: ByteBuf): Boolean = {
    if (n == 0) return false
    val forced = opts.forcedCodec
    val s = computeStats(v)

    def allowed(c: Byte): Boolean = ((forbid >> c) & 1) == 0

    forced match {
      case Some(c) if !Codec.isCommon(c) && allowed(c) =>
        val feasible = c match {
          case Codec.Bitpack => s.max - s.min >= 0 // range within u64: any bit width packs
          case Codec.DeltaBitpack => s.sorted && !s.hasNull && !s.deltaOverflow
          case Codec.Patas => false // float lanes handle Patas before delegating here
          case _ => true
        }
        if (feasible) { encode(c, v, n, width, s, opts, forbid, out); return true }
        return false
      case Some(_) => return false
      case None =>
    }
    if (!opts.adaptive) return false

    val (bestCodec, bestSize) = chooseCodec(s, n, width, forbid)
    val plain = n.toLong * width
    if (bestCodec < 0 || plain.toDouble / bestSize < opts.compressRatio) return false
    // The analytic sizes above are near-exact for the special codecs, but
    // say nothing about what the block codec would achieve — mixed data can
    // make e.g. RLE's 12-bytes-per-run layout lose to zstd. Cross-check with
    // a deterministic sampled block-codec estimate and step aside when the
    // block codec measures smaller (caller falls through to it).
    if (opts.sampledChooser && blockSampledSize(v, n, width, opts) < bestSize) return false
    encode(bestCodec, v, n, width, s, opts, forbid, out)
    true
  }

  /** Deterministic sampled size estimate of block-compressing this page:
    * up to 10 evenly spaced 256-value runs are trial-compressed with the
    * default block codec and the measured ratio scaled to the full page.
    * Same inputs always sample the same runs, so files stay byte-identical
    * across writes. (Reference analogue: `seq_box_compress_sample`,
    * integer/mod.rs:310-347.)
    */
  private[format] def blockSampledSize(v: Array[Long], n: Int, width: Int,
      opts: WriteOptions): Long = {
    val codec = opts.defaultCodec
    if (codec == Codec.None) return Long.MaxValue
    val runLen = math.min(n, 256)
    val runs = math.max(1, math.min(10, n / runLen))
    val stride = if (runs <= 1) 0.0 else (n - runLen).toDouble / (runs - 1)
    val plainBuf = new ByteBuf(runLen * width + 16)
    val dst = new Array[Byte](BlockCompression.maxCompressedLength(codec, runLen * width))
    var sampledPlain = 0L
    var sampledComp = 0L
    var k = 0
    while (k < runs) {
      val off = math.round(k * stride).toInt
      plainBuf.reset()
      var i = off
      width match {
        case 1 => while (i < off + runLen) { plainBuf.putByte(v(i).toInt); i += 1 }
        case 2 => while (i < off + runLen) { plainBuf.putShortLE(v(i).toInt); i += 1 }
        case 4 => while (i < off + runLen) { plainBuf.putIntLE(v(i).toInt); i += 1 }
        case _ => while (i < off + runLen) { plainBuf.putLongLE(v(i)); i += 1 }
      }
      val clen = BlockCompression.compress(codec, plainBuf.arr, 0, plainBuf.length,
        dst, 0, opts.zstdLevel, opts.lz4hc)
      sampledPlain += plainBuf.length
      sampledComp += clen
      k += 1
    }
    if (sampledPlain <= 0) Long.MaxValue
    else 9L + (n.toLong * width * sampledComp + sampledPlain - 1) / sampledPlain
  }

  /** Estimated best special codec + its size, or (-1, MaxValue) if none is
    * eligible. (Reference analogue: `choose_compressor`,
    * integer/mod.rs:231-308, with analytic instead of sampled ratios.)
    */
  def chooseCodec(s: Stats, n: Int, width: Int, forbid: Long): (Byte, Long) = {
    var bestCodec: Byte = -1
    var bestSize = Long.MaxValue
    def allowed(c: Byte): Boolean = ((forbid >> c) & 1) == 0
    def consider(c: Byte, size: Long): Unit =
      if (allowed(c) && size < bestSize) { bestCodec = c; bestSize = size }

    if (s.uniqueCount <= 1) consider(Codec.OneValue, width.toLong)
    else {
      consider(Codec.Rle, s.runCount.toLong * (4 + width))
      if (s.uniqueCount.toLong * 3 < n) {
        val idxBits = bitsFor(s.uniqueCount - 1)
        consider(Codec.Dict, 4L + s.uniqueCount.toLong * width + 18 + packedBytes(n, idxBits))
      }
      if (s.topCount >= n * 0.9) {
        val ex = n - s.topCount
        consider(Codec.Freq, width.toLong + 8 + ex.toLong * 2 + 16 + 18 + ex.toLong * width)
      }
      // range < 0 means max - min exceeds u64: no packing possible
      val range = s.max - s.min
      if (range >= 0)
        consider(Codec.Bitpack, 9L + packedBytes(n, bitsFor(range)))
      if (s.sorted && !s.hasNull && !s.deltaOverflow)
        consider(Codec.DeltaBitpack, 9L + packedBytes(n, bitsFor(s.maxDelta)))
    }
    (bestCodec, bestSize)
  }

  private def putValue(out: ByteBuf, v: Long, width: Int): Unit = width match {
    case 1 => out.putByte(v.toInt)
    case 2 => out.putShortLE(v.toInt)
    case 4 => out.putIntLE(v.toInt)
    case _ => out.putLongLE(v)
  }

  def encode(codec: Byte, v: Array[Long], n: Int, width: Int, s: Stats,
      opts: WriteOptions, forbid: Long, out: ByteBuf): Unit = {
    out.putByte(codec)
    val lenPos = out.reserve(8) // clen, rawLen patched at end
    val start = out.length
    codec match {
      case Codec.OneValue =>
        putValue(out, if (n > 0) v(0) else 0L, width)

      case Codec.Rle =>
        val rcPos = out.reserve(4)
        var runs = 0
        var i = 0
        while (i < n) {
          val x = v(i)
          var j = i + 1
          while (j < n && v(j) == x) j += 1
          out.putIntLE(j - i)
          putValue(out, x, width)
          runs += 1
          i = j
        }
        out.patchIntLE(rcPos, runs)

      case Codec.Dict =>
        // interning pass preserving first-seen order
        val cap = Integer.highestOneBit(math.max(4, s.uniqueCount * 2) - 1) << 1
        val mask = cap - 1
        val hkeys = new Array[Long](cap)
        val hvals = new Array[Int](cap)
        java.util.Arrays.fill(hvals, -1)
        val dict = new Array[Long](s.uniqueCount)
        var dictN = 0
        val indices = new Array[Long](n)
        var i = 0
        while (i < n) {
          val x = v(i)
          var h = (java.lang.Long.hashCode(x * -7046029254386353131L)) & mask
          var idx = -1
          while (idx < 0) {
            if (hvals(h) < 0) { hkeys(h) = x; hvals(h) = dictN; dict(dictN) = x; dictN += 1; idx = hvals(h) }
            else if (hkeys(h) == x) idx = hvals(h)
            else h = (h + 1) & mask
          }
          indices(i) = idx.toLong
          i += 1
        }
        out.putIntLE(dictN)
        i = 0
        while (i < dictN) { putValue(out, dict(i), width); i += 1 }
        writeFrame(indices, n, 4, opts, forbid | (1L << Codec.Dict), out)

      case Codec.Freq =>
        putValue(out, s.topValue, width)
        val rb = new RoaringBitmap()
        var ex = 0
        var i = 0
        while (i < n) { if (v(i) != s.topValue) { rb.add(i); ex += 1 }; i += 1 }
        out.putIntLE(ex)
        rb.runOptimize()
        val bos = new java.io.ByteArrayOutputStream()
        rb.serialize(new java.io.DataOutputStream(bos))
        val rbBytes = bos.toByteArray
        out.putIntLE(rbBytes.length)
        out.putBytes(rbBytes)
        val exceptions = new Array[Long](ex)
        var k = 0
        i = 0
        while (i < n) { if (v(i) != s.topValue) { exceptions(k) = v(i); k += 1 }; i += 1 }
        writeFrame(exceptions, ex, width, opts, forbid | (1L << Codec.Freq), out)

      case Codec.Bitpack =>
        out.putLongLE(s.min)
        val bits = bitsFor(s.max - s.min)
        out.putByte(bits)
        packInto(v, n, s.min, bits, out)

      case Codec.DeltaBitpack =>
        out.putLongLE(if (n > 0) v(0) else 0L)
        val bits = bitsFor(s.maxDelta)
        out.putByte(bits)
        val deltas = new Array[Long](n)
        var i = 1
        while (i < n) { deltas(i) = v(i) - v(i - 1); i += 1 }
        packInto(deltas, n, 0L, bits, out)

      case other => throw new IllegalArgumentException(s"int codec $other")
    }
    out.patchIntLE(lenPos, out.length - start)
    out.patchIntLE(lenPos + 4, n * width)
  }

  /** Codec-framed body for an integer array: special codec or plain+block. */
  def writeFrame(v: Array[Long], n: Int, width: Int, opts: WriteOptions,
      forbid: Long, out: ByteBuf): Unit = {
    if (!tryWrite(v, n, width, opts, forbid, out)) {
      // plain encode at width, then block compress
      val plain = new ByteBuf(math.max(64, n * width))
      var i = 0
      width match {
        case 1 => while (i < n) { plain.putByte(v(i).toInt); i += 1 }
        case 2 => while (i < n) { plain.putShortLE(v(i).toInt); i += 1 }
        case 4 => while (i < n) { plain.putIntLE(v(i).toInt); i += 1 }
        case _ => while (i < n) { plain.putLongLE(v(i)); i += 1 }
      }
      PageSerializer.writeBlockBody(opts.defaultCodec, plain, out, opts.zstdLevel, opts.lz4hc)
    }
  }

  /** LSB-first bitpacking of (v - base) at `bits` per value (any width up
    * to 64 — the accumulator spills whole 64-bit words, so no width guard).
    */
  private def packInto(v: Array[Long], n: Int, base: Long, bits: Int, out: ByteBuf): Unit = {
    if (bits == 0) return
    val total = ((n.toLong * bits + 7) / 8).toInt
    val p = out.reserve(total)
    java.util.Arrays.fill(out.arr, p, p + total, 0.toByte)
    val mask = if (bits == 64) -1L else (1L << bits) - 1
    var acc = 0L
    var accBits = 0
    var bytePos = p
    var i = 0
    while (i < n) {
      val x = (v(i) - base) & mask
      acc |= x << accBits // low (64 - accBits) bits of x
      val fits = 64 - accBits
      if (bits < fits) accBits += bits
      else {
        // word full: spill all 8 bytes, carry x's high remainder
        var b = 0
        while (b < 8) { out.arr(bytePos) = (acc >>> (8 * b)).toByte; bytePos += 1; b += 1 }
        acc = if (fits == 64) 0L else x >>> fits
        accBits = bits - fits
      }
      i += 1
    }
    while (accBits > 0) {
      out.arr(bytePos) = acc.toByte
      bytePos += 1
      acc >>>= 8
      accBits -= 8
    }
  }

  /** Decode a codec-framed integer body (cursor at frame start). */
  def readFrame(cur: ByteCursor, n: Int, width: Int): Array[Long] = {
    val codec = cur.getByte().toByte
    val clen = cur.getIntLE()
    val rawLen = cur.getIntLE()
    if (Codec.isCommon(codec)) {
      val plain = new Array[Byte](rawLen)
      BlockCompression.decompress(codec, cur.arr, cur.pos, clen, plain, 0, rawLen)
      cur.skip(clen)
      val out = new Array[Long](n)
      var i = 0
      width match {
        case 1 => while (i < n) { out(i) = plain(i).toLong; i += 1 }
        case 2 => while (i < n) { out(i) = ((plain(2 * i) & 0xff) | (plain(2 * i + 1) << 8)).toShort.toLong; i += 1 }
        case 4 => while (i < n) { out(i) = PageDeserializer.getInt(plain, 4 * i).toLong; i += 1 }
        case _ => while (i < n) { out(i) = PageDeserializer.getLong(plain, 8 * i); i += 1 }
      }
      out
    } else readSpecial(codec, cur, n, width, clen)
  }

  /** Decode a special-codec payload into `out0` when provided (must hold ≥ n
    * values; scan hot loops reuse one buffer across pages), else a fresh
    * array. Only entries [0, n) are written/meaningful.
    */
  def readSpecial(codec: Byte, cur: ByteCursor, n: Int, width: Int, clen: Int,
      out0: Array[Long] = null): Array[Long] = {
    val end = cur.pos + clen
    val out = if (out0 != null && out0.length >= n) out0 else new Array[Long](n)
    def getValue(): Long = width match {
      case 1 => cur.getByte().toByte.toLong
      case 2 => cur.getShortLE().toShort.toLong
      case 4 => cur.getIntLE().toLong
      case _ => cur.getLongLE()
    }
    codec match {
      case Codec.OneValue =>
        val v = getValue()
        java.util.Arrays.fill(out, 0, n, v)
      case Codec.Rle =>
        val runs = cur.getIntLE()
        var pos = 0
        var r = 0
        while (r < runs) {
          val cnt = cur.getIntLE()
          val v = getValue()
          java.util.Arrays.fill(out, pos, pos + cnt, v)
          pos += cnt
          r += 1
        }
      case Codec.Dict =>
        val dictN = cur.getIntLE()
        val dict = new Array[Long](dictN)
        var i = 0
        while (i < dictN) { dict(i) = getValue(); i += 1 }
        val idx = readFrame(cur, n, 4)
        i = 0
        while (i < n) { out(i) = dict(idx(i).toInt); i += 1 }
      case Codec.Freq =>
        val top = getValue()
        val ex = cur.getIntLE()
        val rbLen = cur.getIntLE()
        val rb = new RoaringBitmap()
        rb.deserialize(new java.io.DataInputStream(
          new java.io.ByteArrayInputStream(cur.arr, cur.pos, rbLen)))
        cur.skip(rbLen)
        val exceptions = readFrame(cur, ex, width)
        java.util.Arrays.fill(out, 0, n, top)
        val it = rb.getIntIterator
        var k = 0
        while (it.hasNext) { out(it.next()) = exceptions(k); k += 1 }
      case Codec.Bitpack =>
        val base = cur.getLongLE()
        val bits = cur.getByte()
        unpack(cur, n, bits, base, out)
      case Codec.DeltaBitpack =>
        val first = cur.getLongLE()
        val bits = cur.getByte()
        unpack(cur, n, bits, 0L, out)
        if (n > 0) {
          out(0) = first
          var i = 1
          while (i < n) { out(i) = out(i - 1) + out(i); i += 1 }
        }
      case other => throw new java.io.IOException(s"unknown integer codec $other")
    }
    cur.pos = end
    out
  }

  private def unpack(cur: ByteCursor, n: Int, bits: Int, base: Long, out: Array[Long]): Unit = {
    if (bits == 0) {
      java.util.Arrays.fill(out, 0, n, base)
      return
    }
    val mask = if (bits == 64) -1L else (1L << bits) - 1
    val arr = cur.arr
    var acc = 0L
    var accBits = 0
    var p = cur.pos
    var i = 0
    while (i < n) {
      if (accBits >= bits) {
        out(i) = (acc & mask) + base
        acc = if (bits == 64) 0L else acc >>> bits
        accBits -= bits
      } else {
        // refill a whole word (reads past the payload are masked out and the
        // caller repositions the cursor from the frame length afterwards)
        var next = 0L
        var nb = 0
        while (nb < 8 && p < arr.length) {
          next |= (arr(p) & 0xffL) << (8 * nb)
          p += 1
          nb += 1
        }
        val low = accBits
        out(i) = ((acc | (next << low)) & mask) + base
        val consumed = bits - low
        acc = if (consumed == 64) 0L else next >>> consumed
        accBits = nb * 8 - consumed
      }
      i += 1
    }
  }
}
