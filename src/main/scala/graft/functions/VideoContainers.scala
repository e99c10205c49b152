package graft.functions

import java.awt.image.BufferedImage

/** Container sniffing for the video decode family: dispatch on the
  * payload's magic bytes to the real decoder that owns it — [[Y4m]]
  * (uncompressed YUV4MPEG2), [[Avi]] (Motion-JPEG or inter-frame RLE8 in
  * RIFF/AVI, codec picked by strf content), or
  * [[Gif]]/[[Apng]]/[[AnimWebp]] (compressed animations with
  * patch/disposal compositing). At
  * 100 TB the `bytes` column carries whatever the crawl fetched; format
  * comes from content, not a trusted column. Unknown/truncated magic →
  * empty (classify, never throw), same contract as both decoders.
  */
object VideoContainers {

  /** The family's floor-spaced sampling rule: SOURCE indices of up to `n`
    * evenly-spaced frames out of `m` — shared by every decoder so a rule
    * change lands in one place. */
  private[functions] def floorSpacedIndices(m: Int, n: Int): IndexedSeq[Int] = {
    val k = math.min(n, m)
    (0 until k).map(j => (j.toLong * m / k).toInt)
  }

  /** Deep ARGB snapshot — the compositing decoders capture the canvas
    * mid-walk with this. */
  private[functions] def copyArgb(img: BufferedImage): BufferedImage = {
    val c = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_INT_ARGB)
    val g = c.createGraphics()
    try { g.setComposite(java.awt.AlphaComposite.Src); g.drawImage(img, 0, 0, null) }
    finally g.dispose()
    c
  }

  private val Y4mMagic = "YUV4MPEG2".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  private def hasPrefix(bytes: Array[Byte], magic: Array[Byte]): Boolean =
    bytes.length >= magic.length && {
      var i = 0
      while (i < magic.length && bytes(i) == magic(i)) i += 1
      i == magic.length
    }

  /** Evenly-spaced sample of up to `n` distinct frames with SOURCE
    * indices, whichever real container the payload is. */
  def sampleFramesIndexed(bytes: Array[Byte], n: Int): Seq[(Int, BufferedImage)] =
    if (bytes == null) Seq.empty
    else if (hasPrefix(bytes, Y4mMagic)) Y4m.sampleFramesIndexed(bytes, n)
    else if (Avi.isAvi(bytes)) Avi.sampleFramesIndexed(bytes, n)
    else if (Gif.isGif(bytes)) Gif.sampleFramesIndexed(bytes, n)
    // APNG/animated WebP only when the animation chunks are present — a
    // plain PNG/WebP is a still image (the image decoders' job), not a
    // zero-frame video
    else if (Apng.isApng(bytes)) Apng.sampleFramesIndexed(bytes, n)
    else if (AnimWebp.isAnimWebp(bytes)) AnimWebp.sampleFramesIndexed(bytes, n)
    else Seq.empty
}
