package graft.format

import com.github.luben.zstd.Zstd
import net.jpountz.lz4.LZ4Factory
import org.xerial.snappy.Snappy

/** Common (block) codecs — None/Lz4/Zstd/Snappy over opaque bytes.
  * (Reference analogue: `/root/reference/src/compression/basic.rs:62-152`.)
  * JVM impls come from the jars Spark already ships (lz4-java, zstd-jni,
  * snappy-java).
  */
object BlockCompression {
  private val lz4Factory = LZ4Factory.fastestInstance()

  def maxCompressedLength(codec: Byte, n: Int): Int = codec match {
    case Codec.None   => n
    case Codec.Lz4    => lz4Factory.fastCompressor().maxCompressedLength(n)
    case Codec.Zstd   => Zstd.compressBound(n.toLong).toInt
    case Codec.Snappy => Snappy.maxCompressedLength(n)
    case c => throw new IllegalArgumentException(s"not a block codec: $c")
  }

  /** Compress src[off, off+len) into dst at dstOff; returns compressed size.
    * `lz4hc` selects the high-compression LZ4 encoder — same frame, same
    * (fast) decompression, ~25% smaller on text, slower to compress.
    */
  def compress(codec: Byte, src: Array[Byte], off: Int, len: Int,
      dst: Array[Byte], dstOff: Int, zstdLevel: Int = 3, lz4hc: Boolean = false): Int = codec match {
    case Codec.None =>
      System.arraycopy(src, off, dst, dstOff, len); len
    case Codec.Lz4 =>
      val c = if (lz4hc) lz4Factory.highCompressor() else lz4Factory.fastCompressor()
      c.compress(src, off, len, dst, dstOff, dst.length - dstOff)
    case Codec.Zstd =>
      val r = Zstd.compressByteArray(dst, dstOff, dst.length - dstOff, src, off, len, zstdLevel)
      if (Zstd.isError(r)) throw new java.io.IOException(s"zstd: ${Zstd.getErrorName(r)}")
      r.toInt
    case Codec.Snappy =>
      Snappy.compress(src, off, len, dst, dstOff)
    case c => throw new IllegalArgumentException(s"not a block codec: $c")
  }

  /** Decompress src[off, off+clen) into dst[dstOff, dstOff+rawLen). */
  def decompress(codec: Byte, src: Array[Byte], off: Int, clen: Int,
      dst: Array[Byte], dstOff: Int, rawLen: Int): Unit = codec match {
    case Codec.None =>
      System.arraycopy(src, off, dst, dstOff, rawLen)
    case Codec.Lz4 =>
      lz4Factory.fastDecompressor().decompress(src, off, dst, dstOff, rawLen)
    case Codec.Zstd =>
      val r = Zstd.decompressByteArray(dst, dstOff, rawLen, src, off, clen)
      if (Zstd.isError(r)) throw new java.io.IOException(s"zstd: ${Zstd.getErrorName(r)}")
    case Codec.Snappy =>
      Snappy.uncompress(src, off, clen, dst, dstOff)
    case c => throw new IllegalArgumentException(s"not a block codec: $c")
  }
}
