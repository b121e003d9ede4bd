package graft.ext

/** Codec-free VIDEO container metadata — the video twin of [[ImageHeaders]]
  * and [[AudioBytes]]. Frame/pixel decode genuinely needs H.264/VP9-class
  * codec libraries (absent here, the one remaining stub), but the CONTAINER
  * layer is plain byte structure:
  *
  *  - MP4 / ISO BMFF ("ftyp" brands): length-prefixed box tree; `moov/mvhd`
  *    carries timescale + duration, `moov/trak/tkhd` carries the track's
  *    16.16 fixed-point display width/height.
  *  - AVI (RIFF "AVI "): the `avih` main header carries microseconds per
  *    frame, total frames, and dimensions.
  *
  * That covers the routing facts a 100 TB media pipeline needs BEFORE it
  * ever schedules a decode: duration histograms, sub-resolution drops,
  * per-format bucketing.
  */
object VideoBytes {

  final case class VideoMeta(
      format: String, // "mp4:<brand>" or "avi"
      width: Int,
      height: Int,
      durationSec: Double,
      nFrames: Long) // 0 when the container does not declare it (mp4 mvhd)

  private def u8(b: Byte): Int = b & 0xff
  private def be16(b: Array[Byte], o: Int): Int = (u8(b(o)) << 8) | u8(b(o + 1))
  private def be32(b: Array[Byte], o: Int): Long =
    ((u8(b(o)).toLong << 24) | (u8(b(o + 1)) << 16) | (u8(b(o + 2)) << 8) | u8(b(o + 3))) & 0xffffffffL
  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)
  private def le32(b: Array[Byte], o: Int): Long =
    (u8(b(o)) | (u8(b(o + 1)) << 8) | (u8(b(o + 2)) << 16) | (u8(b(o + 3)).toLong << 24)) & 0xffffffffL
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(Array(b(o), b(o + 1), b(o + 2), b(o + 3)), "ISO-8859-1")

  /** Walk ISO-BMFF boxes in [from, to): invoke f(type, payloadFrom,
    * payloadTo); malformed sizes end the walk rather than throwing. */
  private def walkBoxes(b: Array[Byte], from: Int, to: Int)(f: (String, Int, Int) => Unit): Unit = {
    var o = from
    while (o + 8 <= to) {
      val size32 = be32(b, o)
      val typ = fourcc(b, o + 4)
      val (size, hdr) =
        if (size32 == 1 && o + 16 <= to) (be64(b, o + 8), 16L)
        else if (size32 == 0) ((to - o).toLong, 8L) // box extends to EOF
        else (size32, 8L)
      if (size < hdr || o + size > to) return // truncated/corrupt: stop
      f(typ, o + hdr.toInt, o + size.toInt)
      o += size.toInt
    }
  }

  private def mp4Meta(b: Array[Byte]): Option[VideoMeta] = {
    if (b.length < 12 || fourcc(b, 4) != "ftyp") return None
    val brand = fourcc(b, 8).trim
    var timescale = 0L
    var duration = 0L
    var w = 0
    var h = 0
    walkBoxes(b, 0, b.length) {
      case ("moov", from, to) =>
        walkBoxes(b, from, to) {
          case ("mvhd", f2, t2) =>
            val v = u8(b(f2))
            if (v == 1 && f2 + 32 <= t2) { timescale = be32(b, f2 + 20); duration = be64(b, f2 + 24) }
            else if (f2 + 20 <= t2) { timescale = be32(b, f2 + 12); duration = be32(b, f2 + 16) }
          case ("trak", f2, t2) =>
            walkBoxes(b, f2, t2) {
              case ("tkhd", f3, t3) =>
                val v = u8(b(f3))
                val wOff = if (v == 1) f3 + 88 else f3 + 76
                if (wOff + 8 <= t3 && w == 0) {
                  // 16.16 fixed point display size
                  w = be16(b, wOff)
                  h = be16(b, wOff + 4)
                }
              case _ => ()
            }
          case _ => ()
        }
      case _ => ()
    }
    if (timescale == 0 && w == 0) None
    else Some(VideoMeta(s"mp4:$brand", w, h,
      if (timescale == 0) 0.0 else duration.toDouble / timescale, 0L))
  }

  private def aviMeta(b: Array[Byte]): Option[VideoMeta] = {
    if (b.length < 12 ||
        b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        fourcc(b, 8) != "AVI ") return None
    // RIFF chunk walk: find LIST/hdrl, then avih inside it
    var o = 12
    while (o + 8 <= b.length) {
      val id = fourcc(b, o)
      val size = le32(b, o + 4)
      val payload = o + 8
      if (payload + size > b.length) return None
      if (id == "LIST" && payload + 4 <= b.length && fourcc(b, payload) == "hdrl") {
        var i = payload + 4
        val end = payload + size.toInt
        while (i + 8 <= end) {
          val cid = fourcc(b, i)
          val csize = le32(b, i + 4)
          if (cid == "avih" && i + 8 + 40 <= b.length) {
            val usPerFrame = le32(b, i + 8)
            val totalFrames = le32(b, i + 8 + 16)
            val w = le32(b, i + 8 + 32).toInt
            val h = le32(b, i + 8 + 36).toInt
            return Some(VideoMeta("avi", w, h,
              usPerFrame * totalFrames / 1e6, totalFrames))
          }
          i += 8 + csize.toInt + (csize.toInt & 1)
        }
      }
      o = payload + size.toInt + (size.toInt & 1)
    }
    None
  }

  /** Sniff MP4/ISO-BMFF or AVI container metadata; None for anything else
    * (including the compressed-stream formats that need real codecs). */
  def sniff(b: Array[Byte]): Option[VideoMeta] =
    try mp4Meta(b).orElse(aviMeta(b))
    catch { case _: IndexOutOfBoundsException => None }

  /** First video-frame payload from an AVI `movi` list, when that frame is
    * a standalone JPEG (MJPEG codec: every `##dc`/`##db` chunk begins with
    * the FF D8 SOI marker). MJPEG needs NO codec library — the container
    * walk here plus the JDK's ImageIO close the frame-decode path — so
    * this is the codec-free seam between "container metadata only" and
    * real pixels. Inter-frame codecs (whose chunks are not JPEGs) and
    * non-AVI containers return None. Handles frames nested in `rec ` lists
    * (interleaved AVIs group chunks per video rec). */
  def aviFirstJpegFrame(b: Array[Byte]): Option[Array[Byte]] = {
    if (b.length < 12 ||
        b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        fourcc(b, 8) != "AVI ") return None
    def scan(from: Int, to: Int): Option[Array[Byte]] = {
      var o = from
      while (o + 8 <= to) {
        val id = fourcc(b, o)
        val size = le32(b, o + 4).toInt
        val payload = o + 8
        if (size < 0 || payload + size > to) return None // truncated: stop
        if (id == "LIST" && payload + 4 <= to) {
          val ltype = fourcc(b, payload)
          if (ltype == "movi" || ltype == "rec ") {
            val hit = scan(payload + 4, payload + size)
            if (hit.isDefined) return hit
          }
        } else if (id(0).isDigit && id(1).isDigit && id(2) == 'd' &&
                   (id(3) == 'c' || id(3) == 'b') && size >= 2 &&
                   u8(b(payload)) == 0xff && u8(b(payload + 1)) == 0xd8) {
          return Some(java.util.Arrays.copyOfRange(b, payload, payload + size))
        }
        o = payload + size + (size & 1)
      }
      None
    }
    try scan(12, b.length)
    catch { case _: IndexOutOfBoundsException => None }
  }
}
