package graft.format

/** Page-level physical introspection without decoding values — which codec
  * each page chose, compressed/raw sizes, null counts, and the decoded
  * codec sub-tree: dictionary cardinality, frequency-exception counts,
  * bitpack widths, RLE run counts, and the nested frames recursive codecs
  * wrap (dict indices, freq exceptions, i128 delegation).
  * (Reference analogue: `/root/reference/src/stat.rs:25-270`.)
  */
object GraftStat {

  /** One node of a page's codec tree. Detail fields are -1 when the codec
    * has no such attribute.
    */
  final case class CodecNode(
      codec: Byte,
      compressedLen: Int,
      rawLen: Int,
      cardinality: Int = -1,
      exceptions: Int = -1,
      bits: Int = -1,
      runs: Int = -1,
      children: Seq[CodecNode] = Nil)

  final case class PageInfo(codec: Byte, compressedLen: Int, rawLen: Int,
      numValues: Int, nullCount: Int, body: CodecNode)
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
        val body = parseBody(cur, lane, pm.numValues)
        pos += pm.length
        PageInfo(body.codec, body.compressedLen, body.rawLen, pm.numValues, nullCount, body)
      }
      LeafInfo(lane, nullable, pages)
    }
  }

  /** Parse one value-body frame (codec | clen | rawLen | payload) into its
    * codec tree; the cursor ends positioned after the frame.
    */
  def parseBody(cur: ByteCursor, lane: Int, n: Int): CodecNode = {
    val codec = cur.getByte().toByte
    val clen = cur.getIntLE()
    val rawLen = cur.getIntLE()
    val end = cur.pos + clen
    val node =
      if (Codec.isCommon(codec)) CodecNode(codec, clen, rawLen)
      else lane match {
        case Lane.Bin => parseBinary(cur, codec, clen, rawLen)
        case Lane.Bool => parseBool(cur, codec, clen, rawLen)
        case Lane.I128 =>
          // Codec.Wide: payload is a nested I64 frame over the low words
          CodecNode(codec, clen, rawLen, children = Seq(parseBody(cur, Lane.I64, n)))
        case _ => parseIntLike(cur, codec, clen, rawLen, Lane.width(lane))
      }
    cur.pos = end
    node
  }

  /** Integer family (also floats' raw-bit delegation): see IntCodecs. */
  private def parseIntLike(cur: ByteCursor, codec: Byte, clen: Int, rawLen: Int,
      width: Int): CodecNode = codec match {
    case Codec.OneValue => CodecNode(codec, clen, rawLen, cardinality = 1)
    case Codec.Rle =>
      CodecNode(codec, clen, rawLen, runs = cur.getIntLE())
    case Codec.Dict =>
      val card = cur.getIntLE()
      cur.skip(card * width)
      CodecNode(codec, clen, rawLen, cardinality = card,
        children = Seq(parseBody(cur, laneForWidth(4), -1)))
    case Codec.Freq =>
      cur.skip(width) // top value
      val ex = cur.getIntLE()
      val rbLen = cur.getIntLE()
      cur.skip(rbLen)
      CodecNode(codec, clen, rawLen, exceptions = ex,
        children = Seq(parseBody(cur, laneForWidth(width), ex)))
    case Codec.Bitpack =>
      cur.skip(8) // base
      CodecNode(codec, clen, rawLen, bits = cur.getByte())
    case Codec.DeltaBitpack =>
      cur.skip(8) // first value
      CodecNode(codec, clen, rawLen, bits = cur.getByte())
    case Codec.Patas => CodecNode(codec, clen, rawLen)
    case other => CodecNode(other, clen, rawLen)
  }

  private def laneForWidth(w: Int): Int = w match {
    case 1 => Lane.I8
    case 2 => Lane.I16
    case 4 => Lane.I32
    case _ => Lane.I64
  }

  /** Binary lane: see BinaryCodecs layouts. */
  private def parseBinary(cur: ByteCursor, codec: Byte, clen: Int, rawLen: Int): CodecNode =
    codec match {
      case Codec.OneValue => CodecNode(codec, clen, rawLen, cardinality = 1)
      case Codec.Dict =>
        val card = cur.getIntLE()
        var last = 0
        var i = 0
        while (i <= card) { last = cur.getIntLE(); i += 1 } // (card+1) offsets
        cur.skip(last) // dictionary bytes
        CodecNode(codec, clen, rawLen, cardinality = card,
          children = Seq(parseBody(cur, Lane.I32, -1)))
      case Codec.Freq =>
        val topLen = cur.getIntLE()
        cur.skip(topLen)
        val ex = cur.getIntLE()
        val rbLen = cur.getIntLE()
        cur.skip(rbLen)
        CodecNode(codec, clen, rawLen, exceptions = ex) // exceptions stored plain
      case other => CodecNode(other, clen, rawLen)
    }

  private def parseBool(cur: ByteCursor, codec: Byte, clen: Int, rawLen: Int): CodecNode =
    codec match {
      case Codec.OneValue => CodecNode(codec, clen, rawLen, cardinality = 1)
      case Codec.Rle => CodecNode(codec, clen, rawLen, runs = cur.getIntLE())
      case other => CodecNode(other, clen, rawLen)
    }

  /** Convenience for a local file written with a known leaf layout. */
  def describeFile(path: java.nio.file.Path, leafSpecs: Array[(Int, Boolean)]): Array[LeafInfo] = {
    val in = new LocalFileInput(path)
    try describe(in, GraftFileReader.readFooter(in), leafSpecs)
    finally in.close()
  }
}
