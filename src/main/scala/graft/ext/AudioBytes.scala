package graft.ext

/** Codec-free audio metadata + real PCM decode for the multimodal pipeline —
  * the audio twin of [[ImageHeaders]]/[[ImageIoDecoder]].
  *
  * WAV/RIFF is a raw-sample CONTAINER, not a codec: the "fmt " chunk
  * carries sample rate / channels / bit depth, the "data" chunk carries
  * the PCM samples verbatim. So unlike compressed audio (MP3/AAC/Opus,
  * which genuinely need codec libraries), a WAV payload can be both
  * sniffed AND fully decoded with nothing but byte arithmetic:
  *
  *   1. [[wavMeta]] — chunk-walk the RIFF header: format tag, channels,
  *      sample rate, bit depth, frame count, duration. ~50 byte reads per
  *      record, works on a truncated prefix (duration comes from the
  *      declared data-chunk size). This is the cheap pre-filter tier.
  *   2. [[pcm16Features]] — real sample decode for 16-bit PCM: per-segment
  *      RMS energy over `bins` equal time slices, the audio analogue of
  *      the image luminance histogram.
  */
object AudioBytes {

  /** Parsed "fmt " + "data" chunk facts. `dataBytes` is the DECLARED data
    * chunk size — valid for duration math even when only a header prefix
    * was fetched; sample reads clamp to the bytes actually present. */
  final case class WavMeta(
      audioFormat: Int, // 1 = PCM, 3 = IEEE float, 0xFFFE = extensible
      channels: Int,
      sampleRate: Int,
      bitsPerSample: Int,
      dataOffset: Int,
      dataBytes: Long) {
    def bytesPerFrame: Int = channels * (bitsPerSample / 8)
    def nFrames: Long = if (bytesPerFrame == 0) 0L else dataBytes / bytesPerFrame
    def durationSec: Double = if (sampleRate == 0) 0.0 else nFrames.toDouble / sampleRate
  }

  private def u8(b: Byte): Int = b & 0xff
  private def le16(b: Array[Byte], o: Int): Int = u8(b(o)) | (u8(b(o + 1)) << 8)
  private def le16s(b: Array[Byte], o: Int): Int = le16(b, o).toShort.toInt
  private def le32(b: Array[Byte], o: Int): Long =
    (u8(b(o)) | (u8(b(o + 1)) << 8) | (u8(b(o + 2)) << 16) | (u8(b(o + 3)).toLong << 24)) & 0xffffffffL

  /** RIFF chunk walk: "RIFF"<size>"WAVE", then (id, size, payload) chunks
    * word-aligned; "fmt " must appear for the meta, "data" for duration. */
  def wavMeta(b: Array[Byte]): Option[WavMeta] = {
    if (b.length < 12 ||
        b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
    var o = 12
    var fmt: Option[(Int, Int, Int, Int)] = None
    var data: Option[(Int, Long)] = None
    while (o + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val id = new String(b, o, 4, "US-ASCII")
      val size = le32(b, o + 4)
      if (id == "fmt " && o + 24 <= b.length)
        fmt = Some((le16(b, o + 8), le16(b, o + 10), le32(b, o + 12).toInt, le16(b, o + 22)))
      else if (id == "data")
        data = Some((o + 8, size))
      // chunks are 2-byte aligned; guard against a corrupt size looping
      val step = 8L + size + (size & 1L)
      if (step <= 0 || o + step > Int.MaxValue) o = b.length
      else o += step.toInt
    }
    for ((af, ch, sr, bps) <- fmt; (off, sz) <- data)
      yield WavMeta(af, ch, sr, bps, off, sz)
  }

  /** Real 16-bit PCM decode: RMS energy per time segment, normalized to
    * [0, 1] full scale. Empty for non-PCM16 payloads (caller degrades to
    * metadata-only, mirroring the corrupt-image path). */
  def pcm16Features(b: Array[Byte], m: WavMeta, bins: Int = 8): Array[Float] = {
    if (m.audioFormat != 1 || m.bitsPerSample != 16) return Array.empty
    val avail = math.max(0L, math.min(m.dataBytes, (b.length - m.dataOffset).toLong)).toInt
    val nSamples = avail / 2
    if (nSamples == 0) return Array.empty
    val out = new Array[Float](bins)
    var bin = 0
    while (bin < bins) {
      val from = (bin.toLong * nSamples / bins).toInt
      val until = ((bin + 1).toLong * nSamples / bins).toInt
      var s = 0.0
      var i = from
      while (i < until) {
        val v = le16s(b, m.dataOffset + 2 * i) / 32768.0
        s += v * v
        i += 1
      }
      out(bin) = if (until > from) math.sqrt(s / (until - from)).toFloat else 0f
      bin += 1
    }
    out
  }
}
