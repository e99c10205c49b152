package graft

import graft.functions.Mpeg
import graft.fixtures.FixtureGen
import org.scalatest.funsuite.AnyFunSuite

/** X1 — MPEG audio (MP3) frame-header metadata: the honest half of the
  * perceptual-audio story (duration/bitrate/rate/channels without a
  * codec), spec'd against the q52 fixture, VBR chains, ID3 tags both
  * ends, truncation, and sync-in-noise false positives. */
class MpegSpec extends AnyFunSuite {

  private val V1L3 = Array(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  test("fixture metadata matches the closed form across the full bitrate table") {
    (0L until 28L).foreach { d => // 2 cycles of the 14-entry table
      val m = Mpeg.audioMeta(FixtureGen.mp3Bytes(d)).getOrElse(fail(s"doc $d"))
      val sr = Seq(44100, 48000, 32000)((d % 3).toInt)
      val nf = (40 + d % 30).toInt
      assert(m.version == "MPEG1" && m.layer == 3, s"doc $d")
      assert(m.sampleRate == sr, s"doc $d")
      assert(m.channels == (if (d % 2 == 0) 1 else 2), s"doc $d")
      assert(m.frames == nf, s"doc $d")
      assert(m.bitrateKbps == V1L3((d % 14).toInt), s"doc $d")
      assert(m.durationMs == nf.toLong * 1152 * 1000 / sr, s"doc $d")
      assert(!m.vbr, s"doc $d")
    }
  }

  test("VBR: a chain mixing bitrates reports vbr and the floor-average") {
    val a = Mpeg.encodeFrames(nFrames = 3, srIdx = 0, brIdx = 2, mono = true) // 40 kbps
    val b = Mpeg.encodeFrames(nFrames = 2, srIdx = 0, brIdx = 4, mono = true) // 56 kbps
    val m = Mpeg.audioMeta(a ++ b).get
    assert(m.vbr && m.frames == 5)
    assert(m.bitrateKbps == (3 * 40 + 2 * 56) / 5)
    assert(m.durationMs == 5L * 1152 * 1000 / 44100)
  }

  test("frames must CHAIN: lone syncs in noise and single frames classify") {
    // 0xFF 0xFB then garbage — a valid-looking header whose successor
    // does not sit at the declared size
    val noise = Array.tabulate(600)(i => ((i * 37 + 11) % 251).toByte)
    noise(0) = 0xff.toByte; noise(1) = 0xfb.toByte; noise(2) = 0x92.toByte; noise(3) = 0
    assert(Mpeg.audioMeta(noise).isEmpty)
    val one = Mpeg.encodeFrames(nFrames = 1, srIdx = 0, brIdx = 9, mono = false)
    assert(Mpeg.audioMeta(one).isEmpty, "below MinFrames")
    assert(Mpeg.audioMeta(null).isEmpty)
    assert(Mpeg.audioMeta(Array.emptyByteArray).isEmpty)
  }

  test("ID3v2 leading and ID3v1 trailing tags are tolerated; bulk junk is not") {
    val core = Mpeg.encodeFrames(nFrames = 6, srIdx = 1, brIdx = 9, mono = false)
    val tagged = FixtureGen.mp3Bytes(4L) // wears an ID3v2 header
    assert(Mpeg.audioMeta(tagged).isDefined)
    val id3v1 = "TAG".getBytes("US-ASCII") ++ Array.fill(125)(0x20.toByte)
    val m = Mpeg.audioMeta(core ++ id3v1).get
    assert(m.frames == 6)
    // more trailing bytes than a frame + tag: not a clean stream
    val junk = core ++ Array.fill(core.length)(0x55.toByte)
    assert(Mpeg.audioMeta(junk).isEmpty)
  }

  test("ID3v2.4 footer flag: the 10-byte footer the size excludes is skipped too") {
    val core = Mpeg.encodeFrames(nFrames = 4, srIdx = 0, brIdx = 9, mono = false)
    val body = Array.fill(40)(0.toByte)
    val hdr = Array[Byte]('I', 'D', '3', 4, 0, 0x10.toByte, 0, 0, 0, 40) ++
      body ++ Array[Byte]('3', 'D', 'I', 4, 0, 0x10.toByte, 0, 0, 0, 40)
    val m = Mpeg.audioMeta(hdr ++ core).getOrElse(fail("footer tag must skip"))
    assert(m.frames == 4)
  }

  test("resync: padding between the tag and the first frame is scanned past") {
    val core = Mpeg.encodeFrames(nFrames = 5, srIdx = 1, brIdx = 7, mono = true)
    val padded = Array.fill(33)(0.toByte) ++ core // tag-editor padding gap
    val m = Mpeg.audioMeta(padded).getOrElse(fail("leading padding must resync"))
    assert(m.frames == 5 && m.sampleRate == 48000)
    // a partial leading frame (stream rip) also resyncs to the chain
    val ripped = core.drop(50)
    val r = Mpeg.audioMeta(ripped).getOrElse(fail("stream rip must resync"))
    assert(r.frames == 4)
  }

  test("VBR truncated tail: slack is judged by the LARGEST frame, not the first") {
    // first frame tiny (32 kbps), later frames large (320 kbps); cutting
    // into the big final frame leaves more slack than the FIRST frame's
    // size — the stream must still parse with the partial frame dropped
    val small = Mpeg.encodeFrames(nFrames = 2, srIdx = 0, brIdx = 1, mono = true)
    val big = Mpeg.encodeFrames(nFrames = 2, srIdx = 0, brIdx = 14, mono = true)
    val cut = (small ++ big).dropRight(60)
    val m = Mpeg.audioMeta(cut).getOrElse(fail("VBR truncated tail must parse"))
    assert(m.frames == 3 && m.vbr)
  }

  test("a truncated final frame drops from the count, not over-reports duration") {
    val core = Mpeg.encodeFrames(nFrames = 4, srIdx = 2, brIdx = 6, mono = true)
    val cut = core.dropRight(10) // the 4th frame's payload is incomplete
    val m = Mpeg.audioMeta(cut).get
    assert(m.frames == 3)
    assert(m.durationMs == 3L * 1152 * 1000 / 32000)
  }
}
