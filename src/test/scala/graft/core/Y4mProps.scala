package graft.core

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based checks of the y4m container (no Spark): the DEMUX side
  * is lossless on raw planes for every stream the encoder can produce —
  * header fields, frame count, and each frame's plane bytes must
  * roundtrip exactly (the YUV->BGR color transform is separate and
  * tolerance-spec'd in Y4mSpec; the container itself may lose nothing). */
object Y4mProps extends Properties("y4m-container") {

  private case class Fixture(w: Int, h: Int, fpsNum: Int, fpsDen: Int,
                             c444: Boolean,
                             frames: List[(Array[Byte], Array[Byte], Array[Byte])])

  private val fixtureGen: Gen[Fixture] = for {
    wHalf <- Gen.choose(1, 8)
    hHalf <- Gen.choose(1, 8)
    c444 <- Gen.oneOf(true, false)
    fpsNum <- Gen.choose(1, 120)
    fpsDen <- Gen.choose(1, 4)
    n <- Gen.choose(1, 5)
    w = wHalf * 2; h = hHalf * 2
    cSize = if (c444) w * h else (w / 2) * (h / 2)
    frames <- Gen.listOfN(n, for {
      yp <- Gen.listOfN(w * h, Gen.choose(0, 255))
      up <- Gen.listOfN(cSize, Gen.choose(0, 255))
      vp <- Gen.listOfN(cSize, Gen.choose(0, 255))
    } yield (yp.map(_.toByte).toArray, up.map(_.toByte).toArray, vp.map(_.toByte).toArray))
  } yield Fixture(w, h, fpsNum, fpsDen, c444, frames)

  property("header + frame count roundtrip for any stream") = forAll(fixtureGen) { f =>
    val bytes = Y4m.encode(f.w, f.h, f.fpsNum, f.fpsDen, f.c444, f.frames)
    val hd = Y4m.parseHeader(bytes)
    Y4m.isY4m(bytes) &&
      hd.w == f.w && hd.h == f.h && hd.fpsNum == f.fpsNum && hd.fpsDen == f.fpsDen &&
      hd.c444 == f.c444 && Y4m.frameCount(bytes) == f.frames.length
  }

  property("demux is plane-lossless: every frame's Y/U/V bytes roundtrip exactly") =
    forAll(fixtureGen) { f =>
      val bytes = Y4m.encode(f.w, f.h, f.fpsNum, f.fpsDen, f.c444, f.frames)
      val hd = Y4m.parseHeader(bytes)
      f.frames.zipWithIndex.forall { case ((yp, up, vp), i) =>
        val off = Y4m.frameDataOffset(bytes, hd, i)
        val gotY = java.util.Arrays.copyOfRange(bytes, off, off + hd.ySize)
        val gotU = java.util.Arrays.copyOfRange(bytes, off + hd.ySize, off + hd.ySize + hd.cSize)
        val gotV = java.util.Arrays.copyOfRange(bytes,
          off + hd.ySize + hd.cSize, off + hd.frameDataSize)
        java.util.Arrays.equals(gotY, yp) && java.util.Arrays.equals(gotU, up) &&
          java.util.Arrays.equals(gotV, vp)
      }
    }

  property("truncating inside frame k leaves exactly k complete frames") =
    forAll(fixtureGen, Gen.choose(0, 4)) { (f, kRaw) =>
      val k = math.min(kRaw, f.frames.length - 1)
      val bytes = Y4m.encode(f.w, f.h, f.fpsNum, f.fpsDen, f.c444, f.frames)
      val hd = Y4m.parseHeader(bytes)
      val cutAt = Y4m.frameDataOffset(bytes, hd, k) + hd.frameDataSize / 2
      Y4m.frameCount(java.util.Arrays.copyOf(bytes, cutAt)) == k
    }

  property("gray decode matches the BT.601 luma expansion per pixel") =
    forAll(Gen.choose(0, 255), Gen.choose(1, 4)) { (y, half) =>
      val w = half * 2; val h = 2
      val bytes = Y4m.encode(w, h, 25, 1, c444 = false, Seq((
        Array.fill(w * h)(y.toByte),
        Array.fill(w / 2)(128.toByte),
        Array.fill(w / 2)(128.toByte))))
      val exp = math.max(0, math.min(255, (298 * (y - 16) + 128) >> 8))
      Y4m.decodeFrame(bytes, 0).bgr.forall(b => (b & 0xFF) == exp)
    }
}
