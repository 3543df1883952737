package graft.format

import org.roaringbitmap.RoaringBitmap

/** Patas-lineage float compression: XOR against the previous value,
  * byte-aligned (header = trailingZeroBytes<<4 | significantBytes, then the
  * significant XOR bytes). Reference analogue:
  * `/root/reference/src/compression/double/patas.rs:36-202` — same family of
  * technique (DuckDB "patas"), independently designed byte-aligned layout.
  */
object FloatCodecs {

  /** Ring depth for reference selection: each value may XOR against any of
    * the last 128 decoded values, not just the previous one (reference
    * analogue: the best-of-ring selection in
    * `/root/reference/src/compression/double/patas.rs:36-202`). The header
    * byte is (ext << 7 | tz << 4 | sig); ext=0 means "XOR vs previous"
    * (1-byte header, identical cost to the plain XOR-prev scheme on smooth
    * series), ext=1 is followed by a u8 back-offset (2..128) so oscillating
    * series pay one byte to reach a closer reference.
    */
  val RingDepth = 128

  /** patterns: raw bit patterns (u32 in low bits for F32). width = 4 or 8. */
  def estimateSize(patterns: Array[Long], n: Int, width: Int): Long = {
    val ring = new RefIndex(width)
    var size = 0L
    var i = 0
    while (i < n) {
      val (off, xor) = bestRef(patterns, i, width, ring)
      ring.insert(patterns(i), i)
      size += (if (off <= 1) 1 else 2) + sigBytes(xor, tzBytes(xor, width), width)
      i += 1
    }
    size
  }

  @inline private def tzBytes(xor: Long, width: Int): Int =
    if (xor == 0) 0 else math.min(java.lang.Long.numberOfTrailingZeros(xor) >> 3, width - 1)
  @inline private def sigBytes(xor: Long, tz: Int, width: Int): Int =
    if (xor == 0) 0
    else width - tz - math.min((java.lang.Long.numberOfLeadingZeros(xor) - (8 - width) * 8) >> 3, width - 1 - tz)

  /** Hash-indexed ring (the reference's design, patas.rs:36-202): maps the
    * high bits of a pattern — exponent + upper mantissa, the bytes XOR churn
    * rarely touches — to the most recent index carrying them. Reference
    * selection drops from O(RingDepth) to O(1) per value at write with no
    * format change (the offset byte addresses the same 2..128 window).
    */
  private final class RefIndex(width: Int) {
    private val Bits = 10
    private val idx = new Array[Int](1 << Bits) // last index + 1 per key; 0 = empty
    @inline private def key(p: Long): Int = {
      val hi = if (width == 8) p >>> 24 else (p & 0xffffffffL) >>> 12
      (((hi * 0x9E3779B97F4A7C15L) >>> (64 - Bits)).toInt) & ((1 << Bits) - 1)
    }
    @inline def lookup(p: Long): Int = idx(key(p)) - 1
    @inline def insert(p: Long, i: Int): Unit = idx(key(p)) = i + 1
  }

  /** (backOffset, xor) minimizing payload bytes between the previous value
    * and the ring's hash-matched candidate; prefers the previous value on
    * ties (the ring only pays its extra offset byte when it strictly wins).
    * Deterministic: fixed probe order, strict improvement required.
    */
  private def bestRef(patterns: Array[Long], i: Int, width: Int, ring: RefIndex): (Int, Long) = {
    val prevRef = if (i == 0) 0L else patterns(i - 1)
    val prevXor = patterns(i) ^ prevRef
    var bestOff = 1
    var bestXor = prevXor
    var bestCost = 1 + sigBytes(prevXor, tzBytes(prevXor, width), width)
    // a ring candidate costs at least 2 (header + offset byte), so nothing
    // can improve once bestCost <= 2
    if (bestCost > 2) {
      val j = ring.lookup(patterns(i))
      val off = i - j
      if (j >= 0 && off >= 2 && off <= RingDepth) {
        val x = patterns(i) ^ patterns(j)
        val c = 2 + sigBytes(x, tzBytes(x, width), width)
        if (c < bestCost) { bestOff = off; bestXor = x; bestCost = c }
      }
    }
    (bestOff, bestXor)
  }

  def encode(patterns: Array[Long], n: Int, width: Int, out: ByteBuf): Unit = {
    out.putByte(Codec.Patas)
    val lenPos = out.reserve(8)
    val start = out.length
    val ring = new RefIndex(width)
    var i = 0
    while (i < n) {
      val (off, x) = bestRef(patterns, i, width, ring)
      ring.insert(patterns(i), i)
      val tz = tzBytes(x, width)
      val sig = sigBytes(x, tz, width)
      val ext = if (off > 1) 0x80 else 0
      out.putByte(ext | (tz << 4) | sig)
      if (off > 1) out.putByte(off - 1) // 1..127 encodes back-offset 2..128
      var b = 0
      var shifted = x >>> (tz * 8)
      while (b < sig) { out.putByte((shifted & 0xff).toInt); shifted >>>= 8; b += 1 }
      i += 1
    }
    out.patchIntLE(lenPos, out.length - start)
    out.patchIntLE(lenPos + 4, n * width)
  }

  def read(cur: ByteCursor, n: Int, clen: Int, out0: Array[Long] = null): Array[Long] = {
    val end = cur.pos + clen
    // ring references only look backward at entries written THIS page, so a
    // reused buffer cannot leak stale values
    val out = if (out0 != null && out0.length >= n) out0 else new Array[Long](n)
    var i = 0
    while (i < n) {
      val h = cur.getByte()
      val ext = (h & 0x80) != 0
      val tz = (h >>> 4) & 0x7
      val sig = h & 0xf
      val off = if (ext) cur.getByte() + 1 else 1
      var x = 0L
      var b = 0
      while (b < sig) { x |= (cur.getByte().toLong & 0xff) << (8 * b); b += 1 }
      x <<= tz * 8
      val ref = if (i - off < 0) 0L else out(i - off)
      out(i) = ref ^ x
      i += 1
    }
    cur.pos = end
    out
  }
}

/** OneValue / Dict / Freq for the binary lane (strings, raw bytes, big
  * decimals). Reference analogue: `/root/reference/src/compression/binary/`.
  * Binary Freq exceptions stay PLAIN, not recursively compressed — same
  * deliberate asymmetry as the reference (binary/freq.rs:94-99).
  */
object BinaryCodecs {

  def tryWrite(vec: BinaryVec, from: Int, until: Int, opts: WriteOptions,
      out: ByteBuf): Boolean = {
    val n = until - from
    if (n == 0) return false
    val nulls = vec.nulls

    // effective slots: null -> last non-null (empty before first)
    val effStart = new Array[Int](n)
    val effEnd = new Array[Int](n)
    var lastS = 0
    var lastE = 0
    var i = 0
    while (i < n) {
      if (nulls != null && nulls(from + i)) { effStart(i) = lastS; effEnd(i) = lastE }
      else {
        lastS = vec.offsets(from + i); lastE = vec.offsets(from + i + 1)
        effStart(i) = lastS; effEnd(i) = lastE
      }
      i += 1
    }

    // stats: unique interning via String keys (page-sized input)
    val counts = new java.util.HashMap[String, Array[Int]]() // value -> (count, firstSeenIdx)
    val indices = new Array[Long](n)
    val dictOrder = new scala.collection.mutable.ArrayBuffer[(Int, Int)]() // (start,end) first-seen
    var topCount = 0
    var topIdx = 0
    i = 0
    while (i < n) {
      val key = new String(vec.bytes, effStart(i), effEnd(i) - effStart(i), "ISO-8859-1")
      var e = counts.get(key)
      if (e == null) {
        e = Array(0, dictOrder.length)
        counts.put(key, e)
        dictOrder += ((effStart(i), effEnd(i)))
      }
      e(0) += 1
      indices(i) = e(1).toLong
      if (e(0) > topCount) { topCount = e(0); topIdx = e(1) }
      i += 1
    }
    val unique = dictOrder.length
    val totalBytes = {
      var s = 0L; var k = 0
      while (k < n) { s += effEnd(k) - effStart(k); k += 1 }
      s
    }
    val plainSize = 4L * (n + 1) + totalBytes
    val dictBytes = dictOrder.map(e => (e._2 - e._1).toLong).sum

    val forced = opts.forcedCodec
    def pick(): Byte = {
      forced match {
        case Some(c) if c == Codec.OneValue || c == Codec.Dict || c == Codec.Freq =>
          return if (c == Codec.OneValue && unique > 1) -1 else c
        case Some(_) => return -1
        case None =>
      }
      if (!opts.adaptive) return -1
      var best: Byte = -1
      var bestSize = Long.MaxValue
      if (unique <= 1) { best = Codec.OneValue; bestSize = 8 + dictBytes }
      else {
        if (unique.toLong * 3 < n) {
          val sz = 4L + 4L * (unique + 1) + dictBytes + 18 +
            (n.toLong * IntCodecs.bitsFor(unique - 1) + 7) / 8
          if (sz < bestSize) { best = Codec.Dict; bestSize = sz }
        }
        if (topCount >= n * 0.9) {
          val d = dictOrder(topIdx)
          var exBytes = 0L
          var k = 0
          while (k < n) { if (indices(k) != topIdx) exBytes += effEnd(k) - effStart(k); k += 1 }
          val sz = 4L + (d._2 - d._1) + 8 + (n - topCount).toLong * 6 + 16 + exBytes
          if (sz < bestSize) { best = Codec.Freq; bestSize = sz }
        }
      }
      if (best >= 0 && plainSize.toDouble / bestSize >= opts.compressRatio) best else -1
    }

    val codec = pick()
    if (codec < 0) return false

    out.putByte(codec)
    val lenPos = out.reserve(8)
    val start = out.length
    codec match {
      case Codec.OneValue =>
        val (s0, e0) = if (unique >= 1) dictOrder(0) else (0, 0)
        out.putIntLE(e0 - s0)
        out.putBytes(vec.bytes, s0, e0 - s0)
      case Codec.Dict =>
        out.putIntLE(unique)
        var off = 0
        out.putIntLE(0)
        dictOrder.foreach { case (s0, e0) => off += e0 - s0; out.putIntLE(off) }
        dictOrder.foreach { case (s0, e0) => out.putBytes(vec.bytes, s0, e0 - s0) }
        IntCodecs.writeFrame(indices, n, 4, opts, 1L << Codec.Dict, out)
      case Codec.Freq =>
        val (ts, te) = dictOrder(topIdx)
        out.putIntLE(te - ts)
        out.putBytes(vec.bytes, ts, te - ts)
        val rb = new RoaringBitmap()
        var ex = 0
        i = 0
        while (i < n) { if (indices(i) != topIdx) { rb.add(i); ex += 1 }; i += 1 }
        out.putIntLE(ex)
        rb.runOptimize()
        val bos = new java.io.ByteArrayOutputStream()
        rb.serialize(new java.io.DataOutputStream(bos))
        val rbBytes = bos.toByteArray
        out.putIntLE(rbBytes.length)
        out.putBytes(rbBytes)
        // exceptions: (ex+1) u32 offsets then bytes, PLAIN
        var off = 0
        out.putIntLE(0)
        i = 0
        while (i < n) {
          if (indices(i) != topIdx) { off += effEnd(i) - effStart(i); out.putIntLE(off) }
          i += 1
        }
        i = 0
        while (i < n) {
          if (indices(i) != topIdx) out.putBytes(vec.bytes, effStart(i), effEnd(i) - effStart(i))
          i += 1
        }
    }
    out.patchIntLE(lenPos, out.length - start)
    out.patchIntLE(lenPos + 4, plainSize.toInt)
    true
  }

  def read(codec: Byte, cur: ByteCursor, n: Int, nulls: Array[Boolean], clen: Int): BinaryVec = {
    val end = cur.pos + clen
    val res = codec match {
      case Codec.OneValue =>
        val len = cur.getIntLE()
        val value = new Array[Byte](len)
        System.arraycopy(cur.arr, cur.pos, value, 0, len)
        cur.skip(len)
        val offs = new Array[Int](n + 1)
        val bytes = new Array[Byte](len * n)
        var i = 0
        while (i < n) {
          System.arraycopy(value, 0, bytes, i * len, len)
          offs(i + 1) = (i + 1) * len
          i += 1
        }
        BinaryVec(n, nulls, offs, bytes)
      case Codec.Dict =>
        val dictN = cur.getIntLE()
        val dOffs = new Array[Int](dictN + 1)
        var i = 0
        while (i <= dictN) { dOffs(i) = cur.getIntLE(); i += 1 }
        val dictBytes = new Array[Byte](dOffs(dictN))
        System.arraycopy(cur.arr, cur.pos, dictBytes, 0, dOffs(dictN))
        cur.skip(dOffs(dictN))
        val idx = IntCodecs.readFrame(cur, n, 4)
        val offs = new Array[Int](n + 1)
        var total = 0
        i = 0
        while (i < n) { total += dOffs(idx(i).toInt + 1) - dOffs(idx(i).toInt); offs(i + 1) = total; i += 1 }
        val bytes = new Array[Byte](total)
        i = 0
        while (i < n) {
          val d = idx(i).toInt
          System.arraycopy(dictBytes, dOffs(d), bytes, offs(i), dOffs(d + 1) - dOffs(d))
          i += 1
        }
        BinaryVec(n, nulls, offs, bytes)
      case Codec.Freq =>
        val topLen = cur.getIntLE()
        val top = new Array[Byte](topLen)
        System.arraycopy(cur.arr, cur.pos, top, 0, topLen)
        cur.skip(topLen)
        val ex = cur.getIntLE()
        val rbLen = cur.getIntLE()
        val rb = new RoaringBitmap()
        rb.deserialize(new java.io.DataInputStream(
          new java.io.ByteArrayInputStream(cur.arr, cur.pos, rbLen)))
        cur.skip(rbLen)
        val exOffs = new Array[Int](ex + 1)
        var i = 0
        while (i <= ex) { exOffs(i) = cur.getIntLE(); i += 1 }
        val exBytesStart = cur.pos
        val isEx = new Array[Boolean](n)
        val it = rb.getIntIterator
        while (it.hasNext) isEx(it.next()) = true
        val offs = new Array[Int](n + 1)
        var total = 0
        var k = 0
        i = 0
        while (i < n) {
          val len = if (isEx(i)) { val l = exOffs(k + 1) - exOffs(k); k += 1; l } else topLen
          total += len
          offs(i + 1) = total
          i += 1
        }
        val bytes = new Array[Byte](total)
        k = 0
        i = 0
        while (i < n) {
          if (isEx(i)) {
            System.arraycopy(cur.arr, exBytesStart + exOffs(k), bytes, offs(i), exOffs(k + 1) - exOffs(k))
            k += 1
          } else System.arraycopy(top, 0, bytes, offs(i), topLen)
          i += 1
        }
        BinaryVec(n, nulls, offs, bytes)
      case other => throw new java.io.IOException(s"unknown binary codec $other")
    }
    cur.pos = end
    res
  }
}

/** OneValue / RLE for booleans (reference analogue:
  * `/root/reference/src/compression/boolean/`).
  */
object BoolCodecs {

  def tryWrite(vec: BoolVec, from: Int, until: Int, opts: WriteOptions,
      out: ByteBuf): Boolean = {
    val n = until - from
    if (n == 0) return false
    val nulls = vec.nulls
    // effective: null -> last value
    val eff = new Array[Boolean](n)
    var last = false
    var i = 0
    var runCount = 0
    var unique1 = true
    while (i < n) {
      if (nulls == null || !nulls(from + i)) last = vec.values(from + i)
      eff(i) = last
      if (i == 0) runCount = 1
      else if (eff(i) != eff(i - 1)) { runCount += 1; unique1 = false }
      i += 1
    }
    val plainSize = (n + 7) / 8

    val codec: Byte = opts.forcedCodec match {
      case Some(c) if c == Codec.OneValue => if (unique1) Codec.OneValue else -1
      case Some(c) if c == Codec.Rle => Codec.Rle
      case Some(_) => -1
      case None =>
        if (!opts.adaptive) (-1).toByte
        else if (unique1) Codec.OneValue
        else if (runCount.toLong * 5 * opts.compressRatio <= plainSize) Codec.Rle
        else -1
    }
    if (codec < 0) return false

    out.putByte(codec)
    val lenPos = out.reserve(8)
    val start = out.length
    codec match {
      case Codec.OneValue =>
        out.putByte(if (eff(0)) 1 else 0)
      case Codec.Rle =>
        val rcPos = out.reserve(4)
        var runs = 0
        i = 0
        while (i < n) {
          var j = i + 1
          while (j < n && eff(j) == eff(i)) j += 1
          out.putIntLE(j - i)
          out.putByte(if (eff(i)) 1 else 0)
          runs += 1
          i = j
        }
        out.patchIntLE(rcPos, runs)
    }
    out.patchIntLE(lenPos, out.length - start)
    out.patchIntLE(lenPos + 4, plainSize)
    true
  }

  def read(codec: Byte, cur: ByteCursor, n: Int, nulls: Array[Boolean], clen: Int): BoolVec = {
    val end = cur.pos + clen
    val values = new Array[Boolean](n)
    codec match {
      case Codec.OneValue =>
        val v = cur.getByte() != 0
        java.util.Arrays.fill(values, v)
      case Codec.Rle =>
        val runs = cur.getIntLE()
        var pos = 0
        var r = 0
        while (r < runs) {
          val cnt = cur.getIntLE()
          val v = cur.getByte() != 0
          java.util.Arrays.fill(values, pos, pos + cnt, v)
          pos += cnt
          r += 1
        }
      case other => throw new java.io.IOException(s"unknown boolean codec $other")
    }
    cur.pos = end
    BoolVec(n, nulls, values)
  }
}
