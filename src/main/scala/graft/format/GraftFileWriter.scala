package graft.format

import scala.collection.mutable.ArrayBuffer

/** Streaming writer for one `.graft` file.
  *
  * File layout (this library's spec; structural analogue of the reference's
  * `/root/reference/src/write/writer.rs:91-167`):
  * {{{
  *   magic (8B: "GRAFT002"; "GRAFT003" when blooms may be present;
  *          "GRAFT004" when per-leaf KMV ndv synopses may be present)
  *   leaf 0 pages | leaf 1 pages | ...          (depth-first leaf order)
  *   schema bytes (UTF-8 JSON of the Spark StructType)
  *   meta block:
  *     u32 leafCount
  *     per leaf: u64 offset | u32 pageCount
  *       per page: u32 length | u32 numValues | u8 statsKind
  *                 [u64 min | u64 max | u32 nullCount]  (iff statsKind != 0)
  *                 [u32 bloomLen | bloom bytes]         (iff v003+ bloom leaf)
  *       v004 only, per leaf after its page list: KMV ndv synopsis —
  *         u8 presence | [u32 k | u32 count | count x u64 hashes, ascending]
  *   u32 schemaSize | u32 metaSize | magic (8B)
  * }}}
  * Like the reference (writer.rs:108-112), exactly one chunk per file —
  * callers roll files.
  */
final class GraftFileWriter(out: java.io.OutputStream, schemaJson: String,
    opts: WriteOptions = WriteOptions()) {

  private var pos: Long = 0L
  private var state = 0 // 0=new 1=started 2=chunk written 3=finished
  // bloom-bearing files declare format version 003 (a 002 reader would
  // misparse the appended bloom sections); bloom-less files stay 002
  private val magic: Array[Byte] =
    if (opts.ndvLeaves.nonEmpty) FormatConstants.MagicV4
    else if (opts.bloomLeaves.nonEmpty) FormatConstants.MagicV3
    else FormatConstants.Magic
  private val metasBuf = ArrayBuffer[ColumnMeta]()
  private val pageBuf = new ByteBuf(1 << 16)
  private val scratch = new ByteBuf(1 << 16)

  def metas: Array[ColumnMeta] = metasBuf.toArray
  def bytesWritten: Long = pos

  private def emit(b: ByteBuf): Unit = { b.writeTo(out); pos += b.length; b.reset() }

  def start(): Unit = {
    require(state == 0, "already started")
    out.write(magic)
    pos += magic.length
    state = 1
  }

  def writeChunk(cols: Seq[ColumnTree], numRows: Int): Unit = {
    require(state == 1, "writeChunk: writer not in started state (one chunk per file)")
    val bounds = pageBounds(numRows, opts.pageSize)
    cols.foreach(writeTree(_, bounds))
    state = 2
  }

  private def pageBounds(n: Int, pageSize: Int): Array[Int] = {
    val nPages = if (n == 0) 0 else (n + pageSize - 1) / pageSize
    val b = new Array[Int](nPages + 1)
    var i = 0
    while (i <= nPages) { b(i) = math.min(i * pageSize, n); i += 1 }
    b
  }

  private def writeTree(t: ColumnTree, bounds: Array[Int]): Unit = t match {
    case LeafCol(lane, nullable, vec) =>
      writeLeaf(lane, nullable, vec, bounds)
    case ListCol(nullable, lengths, child) =>
      writeLeaf(Lane.I32, nullable, lengths, bounds)
      writeTree(child, childBounds(lengths, bounds))
    case StructCol(nullable, n, nulls, children) =>
      if (nullable) writeLeaf(Lane.Bool, nullable = true,
        BoolVec(n, nulls, new Array[Boolean](n)), bounds)
      children.foreach(writeTree(_, bounds))
    case MapCol(nullable, lengths, key, value) =>
      writeLeaf(Lane.I32, nullable, lengths, bounds)
      val cb = childBounds(lengths, bounds)
      writeTree(key, cb)
      writeTree(value, cb)
  }

  /** Translate parent-level page bounds into child value bounds via the
    * running sum of per-row lengths.
    */
  private def childBounds(lengths: IntVec, bounds: Array[Int]): Array[Int] = {
    val cb = new Array[Int](bounds.length)
    var bi = 0
    var row = 0
    var cum = 0
    while (bi < bounds.length) {
      while (row < bounds(bi)) {
        if (lengths.nulls == null || !lengths.nulls(row)) cum += lengths.values(row)
        row += 1
      }
      cb(bi) = cum
      bi += 1
    }
    cb
  }

  private def writeLeaf(lane: Int, nullable: Boolean, vec: Vec, bounds: Array[Int]): Unit = {
    val offset = pos
    val nPages = math.max(bounds.length - 1, 0)
    val pages = new Array[PageMeta](nPages)
    // metasBuf.length IS this leaf's depth-first index — the same order
    // GraftSchema's leaf layout (and the bloomfilter option resolver) uses
    val withBloom = opts.bloomLeaves.contains(metasBuf.length)
    var p = 0
    while (p < nPages) {
      pageBuf.reset()
      pages(p) = PageSerializer.writePage(lane, vec, bounds(p), bounds(p + 1),
        nullable, opts, pageBuf, scratch, withBloom)
      emit(pageBuf)
      p += 1
    }
    val kmv =
      if (opts.ndvLeaves.contains(metasBuf.length))
        buildKmv(lane, vec, if (bounds.isEmpty) 0 else bounds.last)
      else null
    metasBuf += ColumnMeta(offset, pages, kmv)
  }

  /** Per-leaf KMV ndv synopsis: the k smallest distinct portable hashes of
    * the non-null values (KmvUtil hashing — reproducible outside the JVM).
    * Only integer and binary lanes carry one; the Spark layer validates the
    * option, this is the format-level backstop.
    */
  private def buildKmv(lane: Int, vec: Vec, n: Int): Array[Long] = {
    val k = opts.ndvK
    val set = new java.util.TreeSet[java.lang.Long]()
    val nulls = vec.nulls
    @inline def live(i: Int) = nulls == null || !nulls(i)
    @inline def add(h: Long): Unit = {
      set.add(h)
      if (set.size > k) set.remove(set.last)
    }
    vec match {
      case v: BinaryVec =>
        var i = 0
        while (i < n) {
          if (live(i)) {
            val o = v.offsets(i)
            add(KmvUtil.hashBytes(v.bytes, o, v.offsets(i + 1) - o))
          }
          i += 1
        }
      case v: IntVec if lane == Lane.I8 || lane == Lane.I16 || lane == Lane.I32 =>
        var i = 0
        while (i < n) { if (live(i)) add(KmvUtil.hashLong(v.values(i).toLong)); i += 1 }
      case v: LongVec if lane == Lane.I64 =>
        var i = 0
        while (i < n) { if (live(i)) add(KmvUtil.hashLong(v.values(i))); i += 1 }
      case _ =>
        throw new IllegalArgumentException(
          s"graft: ndv synopsis unsupported for lane $lane — only integer and " +
            "binary leaves have a portable value rendering")
    }
    val out = new Array[Long](set.size)
    val it = set.iterator(); var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  def finish(): Unit = {
    require(state == 2 || state == 1, "finish: bad state")
    val schemaBytes = schemaJson.getBytes("UTF-8")
    val buf = new ByteBuf(1 << 14)
    buf.putBytes(schemaBytes)
    val metaStart = buf.length
    buf.putIntLE(metasBuf.length)
    metasBuf.foreach { cm =>
      buf.putLongLE(cm.offset)
      buf.putIntLE(cm.pages.length)
      cm.pages.foreach { pm =>
        buf.putIntLE(pm.length)
        buf.putIntLE(pm.numValues)
        // bit 0x10 of the kind byte flags an appended bloom section; the
        // base stats layout is unchanged, so bloom-less files are byte-
        // identical to before
        val hasBloom = pm.bloom != null && pm.statsKind != 0
        buf.putByte(((pm.statsKind & 0x0f) | (if (hasBloom) 0x10 else 0)).toByte)
        if (pm.statsKind == 4) {
          // u8 minLen | minBytes | u8 maxLen | maxBytes | u32 nullCount
          // (maxLen 0xFF = no finite upper bound)
          buf.putByte(pm.minBin.length.toByte)
          buf.putBytes(pm.minBin)
          if (pm.maxBin == null) buf.putByte(0xFF.toByte)
          else { buf.putByte(pm.maxBin.length.toByte); buf.putBytes(pm.maxBin) }
          buf.putIntLE(pm.nullCount)
        } else if (pm.statsKind != 0) {
          buf.putLongLE(pm.minLong)
          buf.putLongLE(pm.maxLong)
          buf.putIntLE(pm.nullCount)
        }
        if (hasBloom) {
          buf.putIntLE(pm.bloom.length)
          buf.putBytes(pm.bloom)
        }
      }
      // v004: per-leaf KMV ndv-synopsis section after the page list
      // (presence u8 | u32 k | u32 count | count x u64 hashes, ascending)
      if (opts.ndvLeaves.nonEmpty) {
        if (cm.kmv == null) buf.putByte(0.toByte)
        else {
          buf.putByte(1.toByte)
          buf.putIntLE(opts.ndvK)
          buf.putIntLE(cm.kmv.length)
          cm.kmv.foreach(buf.putLongLE)
        }
      }
    }
    val metaSize = buf.length - metaStart
    buf.putIntLE(schemaBytes.length)
    buf.putIntLE(metaSize)
    buf.putBytes(magic)
    emit(buf)
    out.flush()
    state = 3
  }
}
