package graft.functions

/** Microsoft RLE8 (BI_RLE8, biCompression=1) — the first TRUE INTER-FRAME
  * video codec in the decode family. Unlike MJPEG (every frame a standalone
  * JPEG) or Y4M (raw planes), an RLE8 AVI stream is DELTA-coded: each frame
  * chunk is a stream of opcodes that UPDATE the previous frame's canvas,
  * and the skip opcodes (end-of-line, the two-byte delta move, early
  * end-of-bitmap) leave every skipped pixel holding the PRIOR frame's
  * content. A decoder that treats frames as standalone images shows
  * garbage wherever a delta frame skipped — the defining inter-frame
  * failure mode, and exactly what the reference's converter registry
  * dispatch must never do (`src/converters/base.py:10-27`).
  *
  * Opcode grammar (Windows BITMAPINFOHEADER public spec, 1991):
  * {{{
  *   n>0, v          — run: n pixels of palette index v
  *   0, 0            — end of line: x←0, advance one stored row
  *   0, 1            — end of bitmap
  *   0, 2, dx, dy    — delta: skip dx pixels right, dy stored rows onward
  *   0, n≥3, p…      — absolute: n literal palette indices, word-padded
  * }}}
  * Rows are stored BOTTOM-UP (the BMP convention): stored row r paints
  * canvas row (h−1−r). All cursor moves are clamped to the canvas and all
  * reads to the chunk — hostile counts/deltas drop pixels, never throw or
  * write out of bounds (the 100 TB classify-don't-crash contract shared
  * with [[Y4m]]/[[Avi]]/[[Gif]]).
  */
object Rle8 {

  /** Apply one frame chunk's opcodes onto `canvas` (ARGB, top-down
    * row-major, length w·h). Pixels the opcodes skip keep their prior
    * value — that retention IS the inter-frame semantics. */
  def applyChunk(bytes: Array[Byte], off: Int, len: Int,
      canvas: Array[Int], w: Int, h: Int, palette: Array[Int]): Unit = {
    var i = off
    val end = math.min(off.toLong + len, bytes.length.toLong).toInt
    var x = 0
    var r = 0 // stored row, 0 = bottom
    var done = false
    while (!done && i + 2 <= end) {
      val c = bytes(i) & 0xff
      val v = bytes(i + 1) & 0xff
      i += 2
      if (c > 0) {
        // run: clamped to the row (runs never cross rows by spec)
        var n = c
        while (n > 0 && x < w) {
          if (r < h) canvas((h - 1 - r) * w + x) = palette(v)
          x += 1; n -= 1
        }
      } else v match {
        case 0 => x = 0; r += 1 // end of line
        case 1 => done = true // end of bitmap
        case 2 => // delta move — skipped pixels RETAIN the previous frame
          if (i + 2 <= end) { x += bytes(i) & 0xff; r += bytes(i + 1) & 0xff; i += 2 }
          else done = true
        case n =>
          // absolute: n literal indices, then pad to a 16-bit boundary
          var j = 0
          while (j < n && i < end) {
            val p = bytes(i) & 0xff; i += 1
            if (x < w && r < h) canvas((h - 1 - r) * w + x) = palette(p)
            x += 1; j += 1
          }
          if ((n & 1) == 1) i += 1
      }
    }
  }

  // ---- opcode builders (the encode surface: fixtures + hostile specs) ----

  /** Keyframe: paint the full w×h canvas with palette index `idx`
    * (run-coded rows, EOL between rows, EOB after the last). */
  def opFull(w: Int, h: Int, idx: Int): Array[Byte] = {
    require(w >= 1 && w <= 255 && h >= 1, s"opFull needs 1..255 width, got ${w}x$h")
    val out = new java.io.ByteArrayOutputStream()
    var r = 0
    while (r < h) {
      out.write(w); out.write(idx)
      if (r < h - 1) { out.write(0); out.write(0) } // EOL
      r += 1
    }
    out.write(0); out.write(1) // EOB
    out.toByteArray
  }

  /** Delta frame: paint ONLY a pw×ph patch at top-down (px, py) with
    * palette index `idx`; everything else is skipped via delta moves and
    * end-of-line escapes, so it retains the previous frame. `absolute`
    * codes patch rows in absolute mode (needs pw ≥ 3), else as runs —
    * both opcode families stay on the wire in every fixture. */
  def opPatch(w: Int, h: Int, px: Int, py: Int, pw: Int, ph: Int, idx: Int,
      absolute: Boolean): Array[Byte] = {
    require(px >= 0 && py >= 0 && pw >= 1 && ph >= 1 &&
      px + pw <= w && py + ph <= h, s"patch ${pw}x$ph@($px,$py) exceeds ${w}x$h")
    require(w <= 255 && h <= 255, "opcode coordinates are single bytes")
    require(!absolute || pw >= 3, "absolute mode needs >= 3 pixels (0/1/2 are escapes)")
    val out = new java.io.ByteArrayOutputStream()
    val rb0 = h - py - ph // bottom-up stored row of the patch's lowest row
    def delta(dx: Int, dy: Int): Unit = { out.write(0); out.write(2); out.write(dx); out.write(dy) }
    if (px > 0 || rb0 > 0) delta(px, rb0)
    var i = 0
    while (i < ph) {
      if (absolute) {
        out.write(0); out.write(pw)
        (0 until pw).foreach(_ => out.write(idx))
        if ((pw & 1) == 1) out.write(0) // word-align pad
      } else {
        out.write(pw); out.write(idx)
      }
      if (i < ph - 1) {
        out.write(0); out.write(0) // EOL: x←0, next stored row
        if (px > 0) delta(px, 0)
      }
      i += 1
    }
    out.write(0); out.write(1) // EOB — rows above the patch are never touched
    out.toByteArray
  }

  /** 256-entry identity grayscale palette: index i decodes to gray i —
    * makes fixture checks exact (RLE8 is lossless given in-palette colors,
    * like GIF). */
  def grayPalette: Array[Int] = Array.tabulate(256)(i => 0xff000000 | (i << 16) | (i << 8) | i)
}
