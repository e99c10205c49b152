package graft.functions

/** Container sniffing for the audio decode family, the exact analog of
  * [[VideoContainers]]: dispatch on the payload's magic bytes to the
  * real decoder that owns it — [[Wav]] (RIFF/WAVE: PCM, G.711, IMA
  * ADPCM) or [[Flac]] (the Rice-coded lossless codec). At 100 TB the
  * `bytes` column carries whatever the crawl fetched; format comes from
  * content, not a trusted column. Unknown/truncated magic → None
  * (classify, never throw), the same contract as both decoders.
  */
object AudioContainers {

  def features(bytes: Array[Byte]): Option[Wav.Features] =
    if (bytes == null) None
    else if (Flac.isFlac(bytes)) Flac.features(bytes)
    else Wav.features(bytes) // Wav verifies the RIFF/WAVE magic itself

  /** Interleaved linear samples, whichever real container the payload is. */
  def samples(bytes: Array[Byte]): Option[Array[Int]] =
    if (bytes == null) None
    else if (Flac.isFlac(bytes)) Flac.samples(bytes)
    else Wav.samples(bytes)
}
