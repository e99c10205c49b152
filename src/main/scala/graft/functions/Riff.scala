package graft.functions

/** Shared little-endian RIFF byte writer — the ONE copy of the
  * ascii/u32/u16 emit helpers used by every container encoder here
  * ([[Wav.encodePcm16Mono]], [[Wav.encodeG711Mono]], [[Avi.encodeMjpeg]]);
  * a masking fix in one encoder must not silently miss the others. */
private[functions] object Riff {

  /** Shared little-endian READERS — the decode-side counterpart, used by
    * every LE container walker here ([[Webp]], [[AnimWebp]], [[Ico]]). */
  def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  final class Writer {
    private val out = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Unit = {
      var i = 0
      while (i < s.length) { out.write(s.charAt(i)); i += 1 }
    }
    def u32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def bytes(b: Array[Byte]): Unit = out.write(b, 0, b.length)
    def pad(): Unit = out.write(0)
    def result(): Array[Byte] = out.toByteArray
  }
}
