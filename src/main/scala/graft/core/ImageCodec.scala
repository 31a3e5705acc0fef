package graft.core

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/**
 * Image kernel: decode / encode / stitch / crop / metrics. Pure JVM
 * (javax.imageio), zero native deps.
 *
 * Raw pixel form: row-major, 3 bytes per pixel in **BGR** order — matching
 * cv2.imread's layout (reference lib/layers.py:196) so crop/stitch goldens
 * are directly comparable.
 *
 * Encoding uses a fixed JPEG quality (0.92) so outputs are deterministic and
 * the decode->re-encode PSNR >= 40 dB bar (BASELINE.json north_star) is
 * measurable.
 */
object ImageCodec {
  final case class Raw(h: Int, w: Int, bgr: Array[Byte])

  // ImageIO defaults to a disk-backed stream cache whose temp-file
  // creation serializes concurrent encoders — memory cache keeps N
  // executor threads independent.
  ImageIO.setUseCache(false)

  val JpegQuality = 0.92f

  // ImageIO.read / getImageWritersByFormatName walk a synchronized service
  // registry on EVERY call — a global lock that inverts scaling at high
  // thread counts. Resolve the providers once, instantiate per thread.
  private val jpegReaderSpi = {
    val r = ImageIO.getImageReadersByFormatName("jpeg").next()
    val spi = r.getOriginatingProvider; r.dispose(); spi
  }
  private val pngReaderSpi = {
    val r = ImageIO.getImageReadersByFormatName("png").next()
    val spi = r.getOriginatingProvider; r.dispose(); spi
  }
  private val jpegWriterSpi = {
    val w = ImageIO.getImageWritersByFormatName("jpeg").next()
    val spi = w.getOriginatingProvider; w.dispose(); spi
  }
  private val pngWriterSpi = {
    val w = ImageIO.getImageWritersByFormatName("png").next()
    val spi = w.getOriginatingProvider; w.dispose(); spi
  }
  private val jpegReader = ThreadLocal.withInitial[javax.imageio.ImageReader](() => jpegReaderSpi.createReaderInstance())
  private val pngReader = ThreadLocal.withInitial[javax.imageio.ImageReader](() => pngReaderSpi.createReaderInstance())
  private val jpegWriter = ThreadLocal.withInitial[javax.imageio.ImageWriter](() => jpegWriterSpi.createWriterInstance())
  private val pngWriter = ThreadLocal.withInitial[javax.imageio.ImageWriter](() => pngWriterSpi.createWriterInstance())

  def decode(bytes: Array[Byte]): Raw = {
    // magic-byte sniff -> thread-local codec (no registry walk)
    val reader =
      if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8)
        jpegReader.get()
      else if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P')
        pngReader.get()
      else null
    val img =
      if (reader != null) {
        // direct MemoryCacheImageInputStream: no ImageIO registry walk
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new ByteArrayInputStream(bytes))
        try { reader.setInput(iis, true, true); reader.read(0) }
        finally { reader.setInput(null); iis.close() }
      } else ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "undecodable image bytes")
    val h = img.getHeight; val w = img.getWidth
    // fast path: JPEG/PNG decoders produce TYPE_3BYTE_BGR whose raster
    // buffer IS the row-major BGR layout — copy once, no per-pixel calls
    if (img.getType == BufferedImage.TYPE_3BYTE_BGR) {
      val data = img.getRaster.getDataBuffer
        .asInstanceOf[java.awt.image.DataBufferByte].getData
      if (data.length == h * w * 3) return Raw(h, w, data.clone())
    }
    val out = new Array[Byte](h * w * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val i = (y * w + x) * 3
        out(i) = (rgb & 0xFF).toByte           // B
        out(i + 1) = ((rgb >> 8) & 0xFF).toByte  // G
        out(i + 2) = ((rgb >> 16) & 0xFF).toByte // R
        x += 1
      }
      y += 1
    }
    Raw(h, w, out)
  }

  def encode(raw: Raw, fmt: String): Array[Byte] = {
    // a mis-shaped Raw (e.g. a corrupted stitch buffer) must fail loudly,
    // not encode with silently-black rows
    require(raw.bgr.length == raw.h * raw.w * 3,
      s"Raw shape mismatch: ${raw.h}x${raw.w} needs ${raw.h * raw.w * 3} bytes, got ${raw.bgr.length}")
    // TYPE_3BYTE_BGR raster wraps our layout directly — bulk copy, no
    // per-pixel setRGB
    val img = new BufferedImage(raw.w, raw.h, BufferedImage.TYPE_3BYTE_BGR)
    val data = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    System.arraycopy(raw.bgr, 0, data, 0, data.length)
    val bos = new ByteArrayOutputStream()
    fmt.toLowerCase match {
      case "jpeg" | "jpg" =>
        val writer = jpegWriter.get()
        val param = writer.getDefaultWriteParam
        param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionQuality(JpegQuality)
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
        writer.setOutput(ios)
        writer.write(null, new IIOImage(img, null, null), param)
        ios.close(); writer.setOutput(null)
      case "png" =>
        val writer = pngWriter.get()
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
        writer.setOutput(ios)
        writer.write(null, new IIOImage(img, null, null), writer.getDefaultWriteParam)
        ios.close(); writer.setOutput(null)
      case other => throw new IllegalArgumentException(s"unsupported fmt: $other")
    }
    bos.toByteArray
  }

  /** Place one tile at (px, py) of a mosaic canvas — the kernel of the
    * stitch aggregate (reference lib/layers.py:187-201: row-major placement
    * into an (htiles*256, wtiles*256, 3) canvas). Order-independent: the
    * position is derived from the tile's cell offset, not arrival order. */
  def blit(canvas: Raw, tile: Raw, px: Int, py: Int): Unit = {
    if (px >= 0 && py >= 0 && px + tile.w <= canvas.w && py + tile.h <= canvas.h) {
      // fully inside (the stitch hot path): one arraycopy per row instead
      // of per-pixel stores with bounds checks
      var y = 0
      while (y < tile.h) {
        System.arraycopy(tile.bgr, y * tile.w * 3,
          canvas.bgr, ((py + y) * canvas.w + px) * 3, tile.w * 3)
        y += 1
      }
    } else {
      var y = 0
      while (y < tile.h) {
        val cy = py + y
        if (cy >= 0 && cy < canvas.h) {
          var x = 0
          while (x < tile.w) {
            val cx = px + x
            if (cx >= 0 && cx < canvas.w) {
              val si = (y * tile.w + x) * 3
              val di = (cy * canvas.w + cx) * 3
              canvas.bgr(di) = tile.bgr(si)
              canvas.bgr(di + 1) = tile.bgr(si + 1)
              canvas.bgr(di + 2) = tile.bgr(si + 2)
            }
            x += 1
          }
        }
        y += 1
      }
    }
  }

  /** numpy-slice crop `img[y0:y1, x0:x1]`, clamped: negative bounds clamp
    * to 0, overlarge to the extent; empty slice -> 0-sized image. NOTE:
    * numpy itself WRAPS negative starts (img[-5:10] reads from the end);
    * in-contract callers never pass negatives — rint'd viewport offsets
    * and way-cover corners are non-negative by construction (reference
    * lib/layers.py:209, 242 operate in the same regime) — so the clamp is
    * a defensive bound, not a semantics claim. */
  def crop(src: Raw, y0in: Int, y1in: Int, x0in: Int, x1in: Int): Raw = {
    val y0 = math.min(math.max(y0in, 0), src.h)
    val y1 = math.min(math.max(y1in, 0), src.h)
    val x0 = math.min(math.max(x0in, 0), src.w)
    val x1 = math.min(math.max(x1in, 0), src.w)
    val h = math.max(y1 - y0, 0); val w = math.max(x1 - x0, 0)
    val out = new Array[Byte](h * w * 3)
    var y = 0
    while (y < h) {
      System.arraycopy(src.bgr, ((y0 + y) * src.w + x0) * 3, out, y * w * 3, w * 3)
      y += 1
    }
    Raw(h, w, out)
  }

  /** Center crop around (cx, cy): img[cy-h/2 : cy+h/2, cx-w/2 : cx+w/2]
    * with python floor-division — reference lib/layers.py:203-210. */
  def centerCrop(src: Raw, cx: Int, cy: Int, h: Int, w: Int): Raw =
    crop(src, cy - h / 2, cy + h / 2, cx - w / 2, cx + w / 2)

  /** Deterministic box-average resize (cv2.INTER_AREA-like on downscale;
    * nearest-box on upscale): output pixel (oy,ox) is the floor-mean of the
    * source box [oy·h/oh, (oy+1)·h/oh) × [ox·w/ow, (ox+1)·w/ow) — pure
    * integer accumulation, identical on any JVM. */
  def resizeBox(src: Raw, oh: Int, ow: Int): Raw = {
    require(oh > 0 && ow > 0 && src.h > 0 && src.w > 0, "resize dims must be positive")
    val out = new Array[Byte](oh * ow * 3)
    var oy = 0
    while (oy < oh) {
      val y0 = (oy.toLong * src.h / oh).toInt
      val y1 = math.max(((oy + 1).toLong * src.h / oh).toInt, y0 + 1)
      var ox = 0
      while (ox < ow) {
        val x0 = (ox.toLong * src.w / ow).toInt
        val x1 = math.max(((ox + 1).toLong * src.w / ow).toInt, x0 + 1)
        var sb = 0L; var sg = 0L; var sr = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val i = (y * src.w + x) * 3
            sb += src.bgr(i) & 0xFF; sg += src.bgr(i + 1) & 0xFF; sr += src.bgr(i + 2) & 0xFF
            x += 1
          }
          y += 1
        }
        val n = (y1 - y0).toLong * (x1 - x0)
        val j = (oy * ow + ox) * 3
        out(j) = (sb / n).toByte; out(j + 1) = (sg / n).toByte; out(j + 2) = (sr / n).toByte
        ox += 1
      }
      oy += 1
    }
    Raw(oh, ow, out)
  }

  /** PSNR in dB between two same-shape images (peak 255). Infinity if equal. */
  def psnr(a: Raw, b: Raw): Double = {
    require(a.h == b.h && a.w == b.w, "shape mismatch")
    var se = 0.0
    var i = 0
    val n = a.bgr.length
    while (i < n) {
      val d = (a.bgr(i) & 0xFF) - (b.bgr(i) & 0xFF)
      se += d.toDouble * d
      i += 1
    }
    if (se == 0) Double.PositiveInfinity
    else 10.0 * math.log10(255.0 * 255.0 / (se / n))
  }

  /** Mean BGR color (reference minimap.py:28 `img.mean(axis=0).mean(axis=0)`). */
  def meanColor(a: Raw): (Double, Double, Double) = {
    var sb = 0L; var sg = 0L; var sr = 0L
    var i = 0
    while (i < a.bgr.length) {
      sb += a.bgr(i) & 0xFF; sg += a.bgr(i + 1) & 0xFF; sr += a.bgr(i + 2) & 0xFF
      i += 3
    }
    val n = (a.bgr.length / 3).toDouble
    (sb / n, sg / n, sr / n)
  }

  /** 64-bit average hash: downscale to 8x8 grayscale by box averaging, then
    * bit i = 1 if cell-luma > mean. Deterministic pure-integer pipeline. */
  def phash(a: Raw): Long = {
    val cells = new Array[Long](64)
    val counts = new Array[Long](64)
    var y = 0
    while (y < a.h) {
      val gy = math.min(y * 8 / math.max(a.h, 1), 7)
      var x = 0
      while (x < a.w) {
        val gx = math.min(x * 8 / math.max(a.w, 1), 7)
        val i = (y * a.w + x) * 3
        // integer luma: (r*299 + g*587 + b*114) / 1000
        val luma = ((a.bgr(i + 2) & 0xFF) * 299L + (a.bgr(i + 1) & 0xFF) * 587L + (a.bgr(i) & 0xFF) * 114L) / 1000L
        cells(gy * 8 + gx) += luma
        counts(gy * 8 + gx) += 1
        x += 1
      }
      y += 1
    }
    var total = 0L; var nc = 0L
    var k = 0
    while (k < 64) {
      if (counts(k) > 0) { cells(k) = cells(k) / counts(k); total += cells(k); nc += 1 }
      k += 1
    }
    val mean = if (nc > 0) total / nc else 0L
    var hash = 0L
    k = 0
    while (k < 64) {
      if (counts(k) > 0 && cells(k) > mean) hash |= 1L << k
      k += 1
    }
    hash
  }

  @inline def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
