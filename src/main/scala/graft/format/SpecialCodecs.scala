package graft.format

/** Dispatch point for the non-block codecs (OneValue, RLE, Dict, Freq,
  * Bitpacking, DeltaBitpacking, Patas). Implementations land with M3;
  * until then every page falls back to the common block codec.
  */
object SpecialCodecs {

  /** Attempt to encode rows [from,until) with a special codec. Returns true
    * if a codec-framed body was written to `out`.
    */
  def tryWrite(lane: Int, vec: Vec, from: Int, until: Int, stats: PageStats,
      nullCount: Int, opts: WriteOptions, out: ByteBuf, scratch: ByteBuf): Boolean =
    false

  /** Decode a special-codec value body (cursor positioned after the
    * u8|u32|u32 frame header).
    */
  def read(codec: Byte, lane: Int, numValues: Int, nulls: Array[Boolean],
      cur: ByteCursor, clen: Int, rawLen: Int): Vec =
    throw new java.io.IOException(s"unsupported codec byte $codec for lane $lane")
}
