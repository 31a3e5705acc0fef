package graft.core

import graft.SparkSuite
import org.scalatest.funsuite.AnyFunSuite

/** Real container decode for the video path (S17): the pure-JVM YUV4MPEG2
  * demuxer — header parsing, frame walking (incl. parameterized FRAME
  * lines and truncation), exact BT.601 integer conversion, C420 chroma
  * siting — and the VideoOps dispatch between the real and stub arms. */
class Y4mSpec extends AnyFunSuite {

  def gray(w: Int, h: Int, y: Int): (Array[Byte], Array[Byte], Array[Byte]) =
    (Array.fill(w * h)(y.toByte),
     Array.fill(w / 2 * (h / 2))(128.toByte),
     Array.fill(w / 2 * (h / 2))(128.toByte))

  test("header, frame count, and exact BT.601 grayscale decode") {
    val bytes = Y4m.encode(4, 2, 30, 1, c444 = false,
      Seq(gray(4, 2, 16), gray(4, 2, 126), gray(4, 2, 235)))
    val hd = Y4m.parseHeader(bytes)
    assert((hd.w, hd.h, hd.fpsNum, hd.fpsDen, hd.c444) == (4, 2, 30, 1, false))
    assert(Y4m.frameCount(bytes) == 3)
    // hand-computed BT.601 limited-range expansions:
    // y=16 -> 0, y=126 -> 128, y=235 -> 255 (all channels, U=V=128)
    for ((idx, exp) <- Seq((0, 0), (1, 128), (2, 255))) {
      val f = Y4m.decodeFrame(bytes, idx)
      assert(f.h == 2 && f.w == 4)
      assert(f.bgr.forall(b => (b & 0xFF) == exp), s"frame $idx expected gray $exp")
    }
  }

  test("pure red (Y=81,U=90,V=240) decodes to exactly (255,0,0)") {
    val frame = (Array.fill(4)(81.toByte), Array.fill(1)(90.toByte), Array.fill(1)(240.toByte))
    val bytes = Y4m.encode(2, 2, 25, 1, c444 = false, Seq(frame))
    val f = Y4m.decodeFrame(bytes, 0)
    for (p <- 0 until 4) {
      assert((f.bgr(p * 3) & 0xFF) == 0, "B")
      assert((f.bgr(p * 3 + 1) & 0xFF) == 0, "G")
      assert((f.bgr(p * 3 + 2) & 0xFF) == 255, "R")
    }
  }

  test("C420 chroma siting: each 2x2 luma block shares one chroma sample") {
    // 4x2 frame: left 2x2 block red chroma, right block neutral
    val yp = Array.fill(8)(81.toByte)
    val up = Array[Byte](90.toByte, 128.toByte)
    val vp = Array[Byte](240.toByte, 128.toByte)
    val bytes = Y4m.encode(4, 2, 25, 1, c444 = false, Seq((yp, up, vp)))
    val f = Y4m.decodeFrame(bytes, 0)
    def rgb(x: Int, y: Int) = {
      val o = (y * 4 + x) * 3
      ((f.bgr(o + 2) & 0xFF), (f.bgr(o + 1) & 0xFF), (f.bgr(o) & 0xFF))
    }
    for (y <- 0 to 1; x <- 0 to 1)
      assert(rgb(x, y) == ((255, 0, 0)), s"left block ($x,$y) red")
    for (y <- 0 to 1; x <- 2 to 3) {
      val (r, g, b) = rgb(x, y)
      assert(r == g && g == b, s"right block ($x,$y) neutral gray, got ${rgb(x, y)}")
    }
  }

  test("C444 layout carries full-resolution chroma") {
    val yp = Array.fill(4)(81.toByte)
    val up = Array[Byte](90.toByte, 128.toByte, 128.toByte, 90.toByte)
    val vp = Array[Byte](240.toByte, 128.toByte, 128.toByte, 240.toByte)
    val bytes = Y4m.encode(2, 2, 25, 1, c444 = true, Seq((yp, up, vp)))
    val f = Y4m.decodeFrame(bytes, 0)
    // diagonal red, off-diagonal gray — per-pixel chroma
    assert((f.bgr(2) & 0xFF) == 255 && (f.bgr(0) & 0xFF) == 0, "(0,0) red")
    val o = 1 * 3
    assert((f.bgr(o) & 0xFF) == (f.bgr(o + 2) & 0xFF), "(1,0) neutral")
  }

  test("parameterized FRAME lines and truncated tails are handled") {
    val base = Y4m.encode(2, 2, 25, 1, c444 = false, Seq(gray(2, 2, 100), gray(2, 2, 200)))
    // splice a parameter onto the FIRST frame line: FRAME -> FRAME Xinterlaced
    val s = new String(base.map(_.toChar))
    val firstFrame = s.indexOf("FRAME\n")
    val patched = (s.substring(0, firstFrame) + "FRAME Xinterlaced\n" +
      s.substring(firstFrame + 6)).map(_.toByte).toArray
    assert(Y4m.frameCount(patched) == 2, "frame walking must read each FRAME line")
    assert(java.util.Arrays.equals(Y4m.decodeFrame(patched, 1).bgr,
      Y4m.decodeFrame(base, 1).bgr), "frames after a parameterized line decode identically")
    // truncate mid-frame: only the complete frames count; reading past fails
    val cut = java.util.Arrays.copyOf(base, base.length - 3)
    assert(Y4m.frameCount(cut) == 1)
    intercept[IllegalArgumentException](Y4m.decodeFrame(cut, 1))
  }

  test("video sink: BGR -> y4m -> BGR roundtrips within BT.601 rounding (±2)") {
    // a deterministic color gradient exercises all three channels
    val w = 8; val h = 4
    def frame(k: Int): ImageCodec.Raw = {
      val bgr = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val o = (y * w + x) * 3
        bgr(o) = ((x * 30 + k * 11) % 240).toByte
        bgr(o + 1) = ((y * 50 + k * 7) % 240).toByte
        bgr(o + 2) = ((x * 10 + y * 20 + k * 13) % 240).toByte
      }
      ImageCodec.Raw(h, w, bgr)
    }
    val frames = (0 until 3).map(frame)
    val stream = Y4m.encodeBgr(frames, 24, 1)
    assert(Y4m.frameCount(stream) == 3)
    for (i <- 0 until 3) {
      val back = Y4m.decodeFrame(stream, i)
      // C420 shares chroma per 2x2 block: on this steep gradient the
      // per-pixel error is bounded by the within-block chroma spread
      // amplified by the inverse transform (~2x for B from U — worst case
      // here ±31); the frame MEAN must stay within ±1.5 per channel (the
      // averaging is unbiased), and flat colors below roundtrip within ±2
      val exp = frames(i)
      val maxDelta = back.bgr.zip(exp.bgr).map { case (a, b) => math.abs((a & 0xFF) - (b & 0xFF)) }.max
      assert(maxDelta <= 40, s"frame $i max pixel delta $maxDelta")
      for (ch <- 0 until 3) {
        def mean(arr: Array[Byte]) =
          arr.indices.filter(_ % 3 == ch).map(arr(_) & 0xFF).sum.toDouble / (w * h)
        assert(math.abs(mean(back.bgr) - mean(exp.bgr)) <= 1.5,
          s"frame $i channel $ch mean drift")
      }
    }
    // flat-color frames (no chroma averaging error) roundtrip within ±2
    val flat = ImageCodec.Raw(2, 2, Array.fill(12)(0.toByte).zipWithIndex.map {
      case (_, i) => (if (i % 3 == 0) 200 else if (i % 3 == 1) 100 else 50).toByte })
    val backFlat = Y4m.decodeFrame(Y4m.encodeBgr(Seq(flat), 1, 1), 0)
    backFlat.bgr.zip(flat.bgr).foreach { case (a, b) =>
      assert(math.abs((a & 0xFF) - (b & 0xFF)) <= 2, "flat color roundtrip")
    }
  }

  test("assembleVideos: sample -> reassemble -> resample is frame-stable") {
    val spark = SparkSuite.spark
    import spark.implicits._
    import graft.pipeline.VideoOps
    // start from a REAL y4m corpus, sample every frame, reassemble, and
    // resample: indices, pts and pixel content must be preserved
    val src = Y4m.encode(4, 2, 24, 1, c444 = false,
      (0 until 4).map(i => gray(4, 2, 20 + i * 40)))
    val videos = Seq(("v1", src)).toDF("video_id", "bytes")
    val sampled = VideoOps.sampleFramesAuto(videos, everyNth = 1)
    val reassembled = VideoOps.assembleVideos(
      sampled.select($"video_id", $"frame_idx", $"frame_png"), 24, 1)
      .withColumnRenamed("y4m", "bytes")
    val resampled = VideoOps.sampleFramesAuto(reassembled, everyNth = 1)
      .select($"frame_idx", $"pts_ms", $"frame_png").collect().sortBy(_.getInt(0))
    assert(resampled.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
    assert(resampled.map(_.getLong(1)).toSeq == Seq(0L, 41L, 83L, 125L))
    // gray frames: luma-only content survives the yuv roundtrip within ±2
    for ((row, i) <- resampled.zipWithIndex) {
      val dec = ImageCodec.decode(row.getAs[Array[Byte]]("frame_png"))
      val expGray = ((298 * (20 + i * 40 - 16) + 128) >> 8).min(255).max(0)
      dec.bgr.foreach(b => assert(math.abs((b & 0xFF) - expGray) <= 2,
        s"frame $i gray $expGray vs ${b & 0xFF}"))
    }
  }

  test("VideoOps: real decode for y4m, deterministic stub otherwise; auto-probe sampling") {
    val spark = SparkSuite.spark
    import spark.implicits._
    import graft.pipeline.VideoOps
    val y4m = Y4m.encode(4, 2, 30, 1, c444 = false,
      (0 until 7).map(i => gray(4, 2, 16 + i * 30)))
    // dispatch: y4m -> demuxed pixels; junk -> the stub's 64x64 fake
    val real = VideoOps.decodeFrame(y4m, 2)
    // frame 2 is gray y=76: (298*(76-16)+128)>>8 = 70
    assert(real.w == 4 && real.h == 2 && (real.bgr(0) & 0xFF) == 70)
    val stub = VideoOps.decodeFrame(Array[Byte](1, 2, 3), 2)
    assert(stub.w == VideoOps.FrameW && stub.h == VideoOps.FrameH)

    val videos = Seq(("vid_a", y4m), ("vid_junk", Array[Byte](9, 9, 9))).toDF("video_id", "bytes")
    val out = VideoOps.sampleFramesAuto(videos, everyNth = 3)
      .select($"video_id", $"w", $"h", $"frame_idx", $"pts_ms", $"frame_png")
      .collect()
    // only the self-describing container yields rows; frames 0, 3, 6
    assert(out.map(_.getString(0)).distinct.toSeq == Seq("vid_a"))
    assert(out.map(_.getInt(3)).sorted.toSeq == Seq(0, 3, 6))
    // exact rational pts at 30 fps: floor(idx * 1000 / 30)
    assert(out.map(r => r.getInt(3) -> r.getLong(4)).toMap == Map(0 -> 0L, 3 -> 100L, 6 -> 200L))
    assert(out.forall(r => r.getInt(1) == 4 && r.getInt(2) == 2))
    // the sampled png decodes back to the demuxed frame, pixel-exact
    val f3 = out.find(_.getInt(3) == 3).get.getAs[Array[Byte]]("frame_png")
    val dec = ImageCodec.decode(f3)
    val exp = Y4m.decodeFrame(y4m, 3)
    assert(java.util.Arrays.equals(dec.bgr, exp.bgr), "png roundtrip of the demuxed frame")
  }
}
