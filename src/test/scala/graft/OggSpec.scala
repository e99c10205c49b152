package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Ogg

/** X1 — Ogg (Vorbis/Opus) container metadata: page walk + CRC + ident
  * headers + granule-position duration. Malformed streams classify. */
class OggSpec extends AnyFunSuite {

  test("vorbis: round-trip recovers codec/channels/rate/duration/pages") {
    val bytes = Ogg.encodeStream("vorbis", channels = 2, rate = 44100,
      preSkip = 0, granuleEnd = 441 * 25, audioPages = 4)
    val m = Ogg.audioMeta(bytes).getOrElse(fail("vorbis must parse"))
    assert(m.codec == "vorbis" && m.channels == 2 && m.sampleRate == 44100)
    assert(m.preSkipSamples == 0 && m.durationMs == 250 && m.pages == 6)
  }

  test("opus: pre-skip is subtracted from the final granule at 48 kHz") {
    val bytes = Ogg.encodeStream("opus", channels = 1, rate = 48000,
      preSkip = 312, granuleEnd = 312 + 4800 * 20, audioPages = 3)
    val m = Ogg.audioMeta(bytes).getOrElse(fail("opus must parse"))
    assert(m.codec == "opus" && m.channels == 1 && m.sampleRate == 48000)
    assert(m.preSkipSamples == 312 && m.durationMs == 2000 && m.pages == 5)
  }

  test("continuation lacing: a >255-byte setup packet spans lacing values") {
    val bytes = Ogg.encodeStream("vorbis", channels = 1, rate = 32000,
      preSkip = 0, granuleEnd = 320 * 30, audioPages = 3, bigSetup = true)
    assert(Ogg.audioMeta(bytes).exists(_.durationMs == 300))
  }

  test("a flipped payload byte fails the page CRC and classifies") {
    val bytes = Ogg.encodeStream("vorbis", 2, 48000, 0, 480 * 20, 3)
    val bad = bytes.clone()
    bad(bytes.length - 3) = (bad(bytes.length - 3) ^ 0x41).toByte
    assert(Ogg.audioMeta(bad).isEmpty, "corrupt page must fail CRC")
    assert(Ogg.audioMeta(bytes).isDefined)
  }

  test("truncated final page is tolerated; duration reflects pages seen") {
    val bytes = Ogg.encodeStream("vorbis", 2, 48000, 0, 480 * 100, audioPages = 4)
    val cut = bytes.dropRight(10) // rips into the last audio page
    val m = Ogg.audioMeta(cut).getOrElse(fail("partial download must report"))
    assert(m.pages == 5) // 2 header + 3 complete audio pages
    assert(m.durationMs == 480L * 100 * 3 / 4 * 1000 / 48000)
  }

  test("multiplexed second stream: the first audio BOS serial owns duration") {
    val a = Ogg.encodeStream("vorbis", 1, 32000, 0, 320 * 10, 2, serial = 7)
    // a second whole stream appended (chained Ogg): its granules must not
    // bleed into the first stream's duration
    val b = Ogg.encodeStream("opus", 2, 48000, 0, 4800 * 99, 2, serial = 9)
    val m = Ogg.audioMeta(a ++ b).getOrElse(fail("chained stream must parse"))
    assert(m.codec == "vorbis" && m.durationMs == 100 && m.pages == 8)
  }

  test("junk, desync, and non-audio BOS classify") {
    assert(Ogg.audioMeta(null).isEmpty)
    assert(Ogg.audioMeta("OggSnotapage".getBytes("US-ASCII")).isEmpty)
    val good = Ogg.encodeStream("vorbis", 1, 48000, 0, 480 * 10, 2)
    assert(Ogg.audioMeta(good ++ Array.fill(40)(0x7e.toByte)).isEmpty,
      "mid-stream desync is not a clean Ogg")
    // a BOS page whose first packet is neither vorbis nor opus
    val alien = Ogg.encodePage(2, 0, 5, 0, Seq("theoraXXXXXXXXXXX".getBytes("US-ASCII"))) ++
      Ogg.encodePage(4, 100, 5, 1, Seq(Array.fill(10)(0.toByte)))
    assert(Ogg.audioMeta(alien).isEmpty)
  }

  test("q55 fixture closed form holds across doc ids") {
    (0L until 120L).foreach { d =>
      val m = Ogg.audioMeta(graft.fixtures.FixtureGen.oggBytes(d))
        .getOrElse(fail(s"doc $d must parse"))
      assert(m.codec == (if (d % 2 == 0) "vorbis" else "opus"), s"doc $d")
      assert(m.channels == 1 + (d % 6) / 3)
      if (d % 2 == 0) {
        assert(m.sampleRate == Seq(44100, 48000, 32000)((d % 3).toInt))
        assert(m.preSkipSamples == 0 && m.durationMs == 10 * (20 + d % 30))
      } else {
        assert(m.sampleRate == 48000 && m.preSkipSamples == 312 + d % 100)
        assert(m.durationMs == 100 * (10 + d % 90))
      }
      assert(m.pages == 5 + d % 5)
    }
  }
}
