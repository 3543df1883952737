package graft.format

/** Page-level physical introspection without decoding values — which codec
  * each page chose, compressed/raw sizes, null counts.
  * (Reference analogue: `/root/reference/src/stat.rs:25-172`.)
  */
object GraftStat {

  final case class PageInfo(codec: Byte, compressedLen: Int, rawLen: Int,
      numValues: Int, nullCount: Int)
  final case class LeafInfo(lane: Int, nullable: Boolean, pages: Array[PageInfo])

  def describe(in: SeekableInput, footer: Footer,
      leafSpecs: Array[(Int, Boolean)]): Array[LeafInfo] = {
    footer.leaves.zipWithIndex.map { case (meta, li) =>
      val (lane, nullable) = leafSpecs(li)
      val bytes = in.readRange(meta.offset, meta.totalBytes.toInt)
      var pos = 0
      val pages = meta.pages.map { pm =>
        val cur = new ByteCursor(bytes, pos)
        var nullCount = 0
        if (nullable) {
          nullCount = cur.getIntLE()
          if (nullCount > 0) cur.skip((pm.numValues + 7) >>> 3)
        }
        val codec = cur.getByte().toByte
        val clen = cur.getIntLE()
        val rawLen = cur.getIntLE()
        pos += pm.length
        PageInfo(codec, clen, rawLen, pm.numValues, nullCount)
      }
      LeafInfo(lane, nullable, pages)
    }
  }

  /** Convenience for a local file written with a known leaf layout. */
  def describeFile(path: java.nio.file.Path, leafSpecs: Array[(Int, Boolean)]): Array[LeafInfo] = {
    val in = new LocalFileInput(path)
    try describe(in, GraftFileReader.readFooter(in), leafSpecs)
    finally in.close()
  }
}
