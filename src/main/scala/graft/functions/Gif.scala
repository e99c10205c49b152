package graft.functions

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

import javax.imageio.ImageIO
import javax.imageio.metadata.IIOMetadataNode
import javax.imageio.stream.MemoryCacheImageInputStream

/** Real animated-GIF decode (GIF87a/GIF89a — LZW-compressed, the most
  * common animated format a web crawl fetches): the JDK's own GIF codec
  * does the LZW + palette work per frame; this module adds what a frame
  * SAMPLER needs on top — the animation semantics the per-image codec
  * does not apply:
  *
  *  - frames are PATCHES, not full images: each carries an (x, y) offset
  *    into the logical screen (ImageDescriptor), so frame k must be
  *    composited onto the accumulated canvas
  *  - DISPOSAL methods (GIF89a Graphic Control Extension): after a frame
  *    displays, the region is kept (`none`/`doNotDispose`), cleared
  *    (`restoreToBackgroundColor`), or rolled back (`restoreToPrevious`)
  *    before the next patch lands
  *
  * A sampler that returned `reader.read(k)` raw would show a 2×2 patch
  * where the real frame k is a full screen. Sampling therefore walks
  * frames 0..maxSampled sequentially (inherent to GIF — interframe state
  * is cumulative) and snapshots the canvas at each sampled index.
  * Malformed/truncated payloads classify (empty / null), never throw —
  * the same contract as [[Y4m]]/[[Avi]].
  */
object Gif {

  def isGif(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 6 &&
      bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == '8' && (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a'

  private def attr(node: IIOMetadataNode, tag: String, name: String): Option[String] = {
    val list = node.getElementsByTagName(tag)
    if (list.getLength == 0) None
    else Option(list.item(0).getAttributes.getNamedItem(name)).map(_.getNodeValue)
  }

  /** Evenly-spaced sample of up to `n` distinct COMPOSITED frames with
    * SOURCE indices — the same floor-spaced decimation rule as
    * [[Y4m.sampleFramesIndexed]]/[[Avi.sampleFramesIndexed]]. */
  def sampleFramesIndexed(bytes: Array[Byte], n: Int): Seq[(Int, BufferedImage)] = {
    if (!isGif(bytes) || n <= 0) return Seq.empty
    val readers = ImageIO.getImageReadersByFormatName("gif")
    if (!readers.hasNext) return Seq.empty
    val reader = readers.next()
    val input = new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes))
    try {
      reader.setInput(input, false, false)
      val m = reader.getNumImages(true)
      if (m <= 0) return Seq.empty
      val wanted = VideoContainers.floorSpacedIndices(m, n).toSet
      val maxIdx = wanted.max

      // logical screen from stream metadata; fall back to frame-0 extent
      // (cached — frame 0 is the loop's first patch, don't decode twice)
      var frame0: BufferedImage = null
      val smeta = reader.getStreamMetadata
      val screen = Option(smeta)
        .map(_.getAsTree("javax_imageio_gif_stream_1.0").asInstanceOf[IIOMetadataNode])
        .flatMap { t =>
          for {
            w <- attr(t, "LogicalScreenDescriptor", "logicalScreenWidth").map(_.toInt)
            h <- attr(t, "LogicalScreenDescriptor", "logicalScreenHeight").map(_.toInt)
            if w > 0 && h > 0
          } yield (w, h)
        }
      val (sw, sh) = screen.getOrElse {
        frame0 = reader.read(0)
        (frame0.getWidth, frame0.getHeight)
      }
      // decompression-bomb bound: a few-hundred-byte payload can CLAIM any
      // logical screen; the ARGB canvas (and each snapshot copy) costs
      // 4·w·h bytes, so cap total pixels, not just each side — and OOM is
      // an Error that NonFatal would not catch
      if (sw <= 0 || sh <= 0 || sw.toLong * sh > (1L << 22)) return Seq.empty

      val canvas = new BufferedImage(sw, sh, BufferedImage.TYPE_INT_ARGB)
      val out = Seq.newBuilder[(Int, BufferedImage)]
      var previous: BufferedImage = null
      var i = 0
      while (i <= maxIdx) {
        val patch = if (i == 0 && frame0 != null) frame0 else reader.read(i)
        val tree = reader.getImageMetadata(i)
          .getAsTree("javax_imageio_gif_image_1.0").asInstanceOf[IIOMetadataNode]
        val x = attr(tree, "ImageDescriptor", "imageLeftPosition").map(_.toInt).getOrElse(0)
        val y = attr(tree, "ImageDescriptor", "imageTopPosition").map(_.toInt).getOrElse(0)
        val disposal = attr(tree, "GraphicControlExtension", "disposalMethod")
          .getOrElse("none")
        if (disposal == "restoreToPrevious") previous = copy(canvas)
        val g = canvas.createGraphics()
        try g.drawImage(patch, x, y, null)
        finally g.dispose()
        if (wanted.contains(i)) out += ((i, copy(canvas)))
        disposal match {
          case "restoreToBackgroundColor" =>
            // clear exactly the frame's rect (transparent — the canvas
            // carries alpha; uniform-bg round-trips are spec'd)
            val g2 = canvas.createGraphics()
            try {
              g2.setComposite(java.awt.AlphaComposite.Clear)
              g2.fillRect(x, y, patch.getWidth, patch.getHeight)
            } finally g2.dispose()
          case "restoreToPrevious" if previous != null =>
            val g2 = canvas.createGraphics()
            try {
              g2.setComposite(java.awt.AlphaComposite.Src)
              g2.drawImage(previous, 0, 0, null)
            } finally g2.dispose()
          case _ => () // none / doNotDispose: keep
        }
        i += 1
      }
      out.result()
    } catch {
      case scala.util.control.NonFatal(_) => Seq.empty
    } finally {
      reader.dispose() // dispose does NOT close the input stream
      try input.close() catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  def frameCount(bytes: Array[Byte]): Int = {
    if (!isGif(bytes)) return 0
    val readers = ImageIO.getImageReadersByFormatName("gif")
    if (!readers.hasNext) return 0
    val reader = readers.next()
    val input = new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes))
    try {
      reader.setInput(input, false, true)
      reader.getNumImages(true)
    } catch {
      case scala.util.control.NonFatal(_) => 0
    } finally {
      reader.dispose()
      try input.close() catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  def decodeFirstFrame(bytes: Array[Byte]): BufferedImage =
    sampleFramesIndexed(bytes, 1).headOption.map(_._2).orNull

  private def copy(img: BufferedImage): BufferedImage =
    VideoContainers.copyArgb(img)

  /** Animated-GIF encode (the inverse surface): the JDK GIF writer in
    * sequence mode, one full-screen frame per input image (offset 0,0,
    * disposal none) — palette-quantized by the codec, so single-color
    * frames round-trip EXACTLY (LZW is lossless given an in-palette
    * color). All frames must share the first frame's dimensions. */
  def encodeGif(frames: Seq[BufferedImage]): Array[Byte] =
    encodeGifPlaced(frames.map(f => (f, 0, 0, "none")))

  /** One placed frame: (patch, x, y, disposal) — disposal is the GIF89a
    * Graphic Control Extension name (`none`, `doNotDispose`,
    * `restoreToBackgroundColor`, `restoreToPrevious`). */
  def encodeGifPlaced(frames: Seq[(BufferedImage, Int, Int, String)]): Array[Byte] = {
    require(frames.nonEmpty, "at least one frame")
    // the logical screen IS frame 0's extent (prepareWriteSequence(null)
    // derives it); an out-of-screen patch would be silently clipped on
    // decode, so reject it loudly here
    val (sw, sh) = (frames.head._1.getWidth, frames.head._1.getHeight)
    require(frames.head._2 == 0 && frames.head._3 == 0,
      "frame 0 defines the logical screen and must sit at (0,0)")
    frames.foreach { case (f, x, y, _) =>
      require(x >= 0 && y >= 0 && x + f.getWidth <= sw && y + f.getHeight <= sh,
        s"patch ${f.getWidth}x${f.getHeight}@($x,$y) exceeds the ${sw}x$sh screen")
    }
    val writers = ImageIO.getImageWritersByFormatName("gif")
    require(writers.hasNext, "JDK GIF writer missing")
    val writer = writers.next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { case (f, x, y, disposal) =>
        // GIF palettes are RGB: render onto an opaque raster first so the
        // writer never quantizes alpha
        val rgb = new BufferedImage(f.getWidth, f.getHeight, BufferedImage.TYPE_INT_RGB)
        val g = rgb.createGraphics()
        try g.drawImage(f, 0, 0, null)
        finally g.dispose()
        val meta = writer.getDefaultImageMetadata(
          new javax.imageio.ImageTypeSpecifier(rgb), null)
        val fmt = "javax_imageio_gif_image_1.0"
        val root = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
        setNodeAttrs(root, "ImageDescriptor", Map(
          "imageLeftPosition" -> x.toString, "imageTopPosition" -> y.toString))
        setNodeAttrs(root, "GraphicControlExtension", Map(
          "disposalMethod" -> disposal, "userInputFlag" -> "FALSE",
          "transparentColorFlag" -> "FALSE", "delayTime" -> "10",
          "transparentColorIndex" -> "0"))
        meta.setFromTree(fmt, root)
        writer.writeToSequence(new javax.imageio.IIOImage(rgb, null, meta), null)
      }
      writer.endWriteSequence()
      ios.flush()
      bos.toByteArray
    } finally {
      writer.dispose()
      ios.close()
    }
  }

  private def setNodeAttrs(root: IIOMetadataNode, tag: String,
      attrs: Map[String, String]): Unit = {
    val list = root.getElementsByTagName(tag)
    val node =
      if (list.getLength > 0) list.item(0).asInstanceOf[IIOMetadataNode]
      else { val n = new IIOMetadataNode(tag); root.appendChild(n); n }
    attrs.foreach { case (k, v) => node.setAttribute(k, v) }
  }
}
