package graft.ext

/** Codec-free image metadata + JDK-only image decode for the multimodal
  * pipeline.
  *
  * Two tiers, matching what a 100 TB media pipeline actually does:
  *
  *   1. [[ImageHeaders]] — container-header SNIFFING: width/height/format
  *      read straight from the first bytes of the payload (PNG IHDR, JPEG
  *      SOF marker scan, GIF logical screen descriptor, BMP DIB header).
  *      Costs ~a hundred byte reads per record, no decode, no library —
  *      this is the cheap pre-filter (drop thumbnails, route by format,
  *      size-bucket partitions) you run on ALL records before spending
  *      decode cycles on any.
  *   2. [[ImageIoDecoder]] — REAL pixel decode via `javax.imageio`, which
  *      ships inside the JDK (PNG/JPEG/GIF/BMP readers included, no
  *      external codec needed): true dimensions plus an 8-bin luminance
  *      histogram as the feature vector. Audio/video stay behind the
  *      `CodecDecoder` seam — those genuinely need ffmpeg-class codecs the
  *      container does not ship.
  */
object ImageHeaders {

  private def u8(b: Byte): Int = b & 0xff
  private def be16(b: Array[Byte], o: Int): Int = (u8(b(o)) << 8) | u8(b(o + 1))
  private def be32(b: Array[Byte], o: Int): Int =
    (u8(b(o)) << 24) | (u8(b(o + 1)) << 16) | (u8(b(o + 2)) << 8) | u8(b(o + 3))
  private def le16(b: Array[Byte], o: Int): Int = u8(b(o)) | (u8(b(o + 1)) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    u8(b(o)) | (u8(b(o + 1)) << 8) | (u8(b(o + 2)) << 16) | (u8(b(o + 3)) << 24)

  /** PNG: 8-byte magic, then the IHDR chunk is mandatory-first — width and
    * height are big-endian u32 at offsets 16 and 20. */
  def pngDims(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 24 &&
        u8(b(0)) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        u8(b(4)) == 0x0d && u8(b(5)) == 0x0a && u8(b(6)) == 0x1a && u8(b(7)) == 0x0a)
      Some((be32(b, 16), be32(b, 20)))
    else None

  /** JPEG: walk the marker stream from SOI (FFD8) to the first start-of-
    * frame marker (C0–CF minus the non-frame C4/C8/CC); the frame header
    * carries height then width as big-endian u16. */
  def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 4 || u8(b(0)) != 0xff || u8(b(1)) != 0xd8) return None
    var i = 2
    while (i + 9 < b.length) {
      if (u8(b(i)) != 0xff) return None // marker desync: not a JPEG stream
      val marker = u8(b(i + 1))
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) {
        i += 2 // standalone marker, no length field
      } else if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
        return Some((be16(b, i + 7), be16(b, i + 5))) // (width, height)
      } else {
        i += 2 + be16(b, i + 2) // skip segment (length includes itself)
      }
    }
    None
  }

  /** GIF87a/89a: little-endian u16 logical screen width/height at 6/8. */
  def gifDims(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      Some((le16(b, 6), le16(b, 8)))
    else None

  /** BMP: "BM" + BITMAPINFOHEADER — little-endian i32 width/height at
    * 18/22 (height may be negative for top-down rows). */
  def bmpDims(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
      Some((le32(b, 18), math.abs(le32(b, 22))))
    else None

  /** Best-effort (format, width, height) sniff across the four containers. */
  def sniff(b: Array[Byte]): Option[(String, Int, Int)] =
    pngDims(b).map { case (w, h) => ("png", w, h) }
      .orElse(jpegDims(b).map { case (w, h) => ("jpeg", w, h) })
      .orElse(gifDims(b).map { case (w, h) => ("gif", w, h) })
      .orElse(bmpDims(b).map { case (w, h) => ("bmp", w, h) })
}
