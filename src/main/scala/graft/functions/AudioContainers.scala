package graft.functions

/** Container sniffing for the audio decode family, the exact analog of
  * [[VideoContainers]]: dispatch on the payload's magic bytes to the
  * real decoder that owns it — [[Wav]] (RIFF/WAVE: PCM, G.711, IMA +
  * MS ADPCM), [[Flac]] (the Rice-coded lossless codec), [[Aiff]]
  * (big-endian IFF with the 80-bit extended sample rate), or [[Au]]
  * (Sun ".snd": variable data offset, G.711/PCM). At 100 TB the
  * `bytes` column carries whatever the crawl fetched; format comes from
  * content, not a trusted column. Unknown/truncated magic → None
  * (classify, never throw), the same contract as every decoder here.
  */
object AudioContainers {

  def features(bytes: Array[Byte]): Option[Wav.Features] =
    if (bytes == null) None
    else if (Flac.isFlac(bytes)) Flac.features(bytes)
    else if (Aiff.isAiff(bytes)) Aiff.features(bytes)
    else if (Au.isAu(bytes)) Au.features(bytes)
    else Wav.features(bytes) // Wav verifies the RIFF/WAVE magic itself

  /** Interleaved linear samples, whichever real container the payload is. */
  def samples(bytes: Array[Byte]): Option[Array[Int]] =
    if (bytes == null) None
    else if (Flac.isFlac(bytes)) Flac.samples(bytes)
    else if (Aiff.isAiff(bytes)) Aiff.samples(bytes)
    else if (Au.isAu(bytes)) Au.samples(bytes)
    else Wav.samples(bytes)
}
