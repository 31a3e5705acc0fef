package graft.core

/**
 * Minimal YUV4MPEG2 (.y4m) container demuxer — pure JVM, zero codec
 * dependencies. y4m is the standard UNCOMPRESSED video interchange
 * container (ffmpeg's `-f yuv4mpegpipe`): an ASCII stream header, then
 * per frame an ASCII `FRAME` line followed by raw Y, U, V planes. Because
 * the payload is raw planes, demux + pixel access is pure byte
 * arithmetic — which is exactly the slice of the reference's video-frame
 * op (S17) this environment CAN implement for real; compressed codecs
 * (h264/vp9/...) remain env-blocked and stay behind the documented stub.
 *
 * Supported chroma layouts: C420 family (420jpeg/420mpeg2/420paldv share
 * one plane layout — the siting tags only matter for resampling filters,
 * not for plane sizes) and C444. Frame offsets are WALKED, not
 * multiplied: the spec allows per-frame parameters on the FRAME line, so
 * each frame's data start is found by scanning its header line.
 *
 * YUV -> BGR is the integer-exact ITU-R BT.601 limited-range transform
 * (the y4m default):
 *   c = y - 16, d = u - 128, e = v - 128
 *   r = clip((298c + 409e + 128) >> 8)
 *   g = clip((298c - 100d - 208e + 128) >> 8)
 *   b = clip((298c + 516d + 128) >> 8)
 */
object Y4m {
  private val Magic = "YUV4MPEG2"

  final case class Header(w: Int, h: Int, fpsNum: Int, fpsDen: Int,
                          c444: Boolean, dataStart: Int) {
    val ySize: Int = w * h
    val cSize: Int = if (c444) w * h else (w / 2) * (h / 2)
    val frameDataSize: Int = ySize + 2 * cSize
  }

  def isY4m(bytes: Array[Byte]): Boolean =
    bytes.length > Magic.length &&
      new String(bytes, 0, Magic.length, "US-ASCII") == Magic

  private def lineEnd(bytes: Array[Byte], from: Int): Int = {
    var i = from
    while (i < bytes.length && bytes(i) != '\n') i += 1
    require(i < bytes.length, "y4m: unterminated header line")
    i
  }

  def parseHeader(bytes: Array[Byte]): Header = {
    require(isY4m(bytes), "not a YUV4MPEG2 stream")
    val end = lineEnd(bytes, 0)
    val parts = new String(bytes, 0, end, "US-ASCII").split(' ')
    var w = -1; var h = -1; var num = 25; var den = 1; var c444 = false
    parts.drop(1).foreach { p =>
      if (p.nonEmpty) p.charAt(0) match {
        case 'W' => w = p.substring(1).toInt
        case 'H' => h = p.substring(1).toInt
        case 'F' =>
          val r = p.substring(1).split(':')
          num = r(0).toInt; den = r(1).toInt
        case 'C' =>
          val c = p.substring(1)
          if (c.startsWith("444")) c444 = true
          else require(c.startsWith("420"),
            s"y4m: unsupported chroma layout C$c (only C420*/C444)")
        case _ => () // I/A/X params do not affect plane layout
      }
    }
    require(w > 0 && h > 0, "y4m: missing W/H")
    require(c444 || (w % 2 == 0 && h % 2 == 0), "y4m: C420 needs even dimensions")
    require(num > 0 && den > 0, "y4m: bad frame rate")
    Header(w, h, num, den, c444, end + 1)
  }

  /** Data offset of frame `idx` (just past its FRAME line), walking the
    * per-frame headers. Fails loudly on truncation. */
  def frameDataOffset(bytes: Array[Byte], hd: Header, idx: Int): Int = {
    require(idx >= 0, s"y4m: negative frame index $idx")
    var off = hd.dataStart
    var i = 0
    while (i <= idx) {
      require(off + 5 <= bytes.length &&
        new String(bytes, off, 5, "US-ASCII") == "FRAME",
        s"y4m: frame $i marker missing at offset $off")
      off = lineEnd(bytes, off) + 1
      if (i == idx) {
        require(off + hd.frameDataSize <= bytes.length, s"y4m: frame $i truncated")
        return off
      }
      off += hd.frameDataSize
      i += 1
    }
    off
  }

  /** Number of complete frames in the stream. */
  def frameCount(bytes: Array[Byte]): Int = {
    val hd = parseHeader(bytes)
    var off = hd.dataStart
    var n = 0
    while (off + 5 <= bytes.length &&
           new String(bytes, off, 5, "US-ASCII") == "FRAME") {
      val dataOff = lineEnd(bytes, off) + 1
      if (dataOff + hd.frameDataSize > bytes.length) return n
      off = dataOff + hd.frameDataSize
      n += 1
    }
    n
  }

  @inline private def clip(v: Int): Byte =
    (if (v < 0) 0 else if (v > 255) 255 else v).toByte

  /** Decode frame `idx` to a BGR raster (ImageCodec.Raw). */
  def decodeFrame(bytes: Array[Byte], idx: Int): ImageCodec.Raw = {
    val hd = parseHeader(bytes)
    val off = frameDataOffset(bytes, hd, idx)
    val uOff = off + hd.ySize
    val vOff = uOff + hd.cSize
    val cw = if (hd.c444) hd.w else hd.w / 2
    val bgr = new Array[Byte](hd.h * hd.w * 3)
    var y = 0
    while (y < hd.h) {
      var x = 0
      while (x < hd.w) {
        val yy = bytes(off + y * hd.w + x) & 0xFF
        val ci = if (hd.c444) y * cw + x else (y / 2) * cw + (x / 2)
        val u = bytes(uOff + ci) & 0xFF
        val v = bytes(vOff + ci) & 0xFF
        val c = yy - 16; val d = u - 128; val e = v - 128
        val o = (y * hd.w + x) * 3
        bgr(o) = clip((298 * c + 516 * d + 128) >> 8)           // B
        bgr(o + 1) = clip((298 * c - 100 * d - 208 * e + 128) >> 8) // G
        bgr(o + 2) = clip((298 * c + 409 * e + 128) >> 8)       // R
        x += 1
      }
      y += 1
    }
    ImageCodec.Raw(hd.h, hd.w, bgr)
  }

  /** Forward BT.601 limited-range integer transform of one BGR raster to
    * Y + C420 chroma planes (chroma = 2x2 box mean of the per-pixel
    * chroma, rounded). The encoder half of the container: [[decodeFrame]]
    * inverts it within ±2 per channel (rounding + range clipping). */
  def bgrToYuv420(raw: ImageCodec.Raw): (Array[Byte], Array[Byte], Array[Byte]) = {
    require(raw.w % 2 == 0 && raw.h % 2 == 0, "C420 needs even dimensions")
    val yp = new Array[Byte](raw.w * raw.h)
    val uf = new Array[Int](raw.w * raw.h)
    val vf = new Array[Int](raw.w * raw.h)
    var i = 0
    while (i < raw.w * raw.h) {
      val b = raw.bgr(i * 3) & 0xFF
      val g = raw.bgr(i * 3 + 1) & 0xFF
      val r = raw.bgr(i * 3 + 2) & 0xFF
      yp(i) = (((66 * r + 129 * g + 25 * b + 128) >> 8) + 16).toByte
      uf(i) = ((-38 * r - 74 * g + 112 * b + 128) >> 8) + 128
      vf(i) = ((112 * r - 94 * g - 18 * b + 128) >> 8) + 128
      i += 1
    }
    val cw = raw.w / 2
    val up = new Array[Byte](cw * (raw.h / 2))
    val vp = new Array[Byte](cw * (raw.h / 2))
    var cy = 0
    while (cy < raw.h / 2) {
      var cx = 0
      while (cx < cw) {
        val p0 = (cy * 2) * raw.w + cx * 2
        val p1 = p0 + raw.w
        up(cy * cw + cx) = ((uf(p0) + uf(p0 + 1) + uf(p1) + uf(p1 + 1) + 2) / 4).toByte
        vp(cy * cw + cx) = ((vf(p0) + vf(p0 + 1) + vf(p1) + vf(p1 + 1) + 2) / 4).toByte
        cx += 1
      }
      cy += 1
    }
    (yp, up, vp)
  }

  /** Frame sequence (uniform-dim BGR rasters) -> one y4m stream — the
    * real uncompressed-container form of the reference's dir2vid/list2vid
    * sink (video.py:8-29, 31-47), with y4m in place of the env-blocked
    * DIVX encoder. */
  def encodeBgr(frames: Seq[ImageCodec.Raw], fpsNum: Int, fpsDen: Int): Array[Byte] = {
    require(frames.nonEmpty, "y4m: empty frame sequence")
    val (w, h) = (frames.head.w, frames.head.h)
    require(frames.forall(f => f.w == w && f.h == h), "y4m: frame dims must be uniform")
    encode(w, h, fpsNum, fpsDen, c444 = false, frames.map(bgrToYuv420))
  }

  /** Build a y4m stream from raw planes — the test-side encoder (and a
    * legitimate sink for uncompressed interchange). `frames` are
    * (yPlane, uPlane, vPlane) at the layout `c444` implies. */
  def encode(w: Int, h: Int, fpsNum: Int, fpsDen: Int, c444: Boolean,
             frames: Seq[(Array[Byte], Array[Byte], Array[Byte])]): Array[Byte] = {
    val hd = Header(w, h, fpsNum, fpsDen, c444, 0)
    val out = new java.io.ByteArrayOutputStream()
    val cTag = if (c444) "C444" else "C420jpeg"
    out.write(s"YUV4MPEG2 W$w H$h F$fpsNum:$fpsDen Ip A1:1 $cTag\n".getBytes("US-ASCII"))
    frames.foreach { case (yp, up, vp) =>
      require(yp.length == hd.ySize && up.length == hd.cSize && vp.length == hd.cSize,
        "y4m encode: plane sizes do not match the layout")
      out.write("FRAME\n".getBytes("US-ASCII"))
      out.write(yp); out.write(up); out.write(vp)
    }
    out.toByteArray
  }
}
