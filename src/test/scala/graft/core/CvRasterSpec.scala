package graft.core

import org.scalatest.funsuite.AnyFunSuite
import CvRaster._

/** Hand-derived goldens for the OpenCV-parity rasterizers. Each expected
  * set was walked through the OpenCV 4.x integer algorithm by hand
  * (drawing.cpp LineIterator / ThickLine / FillEdgeCollection semantics);
  * see scaladoc on [[CvRaster]]. */
class CvRasterSpec extends AnyFunSuite {
  private def painted(c: Canvas): Set[(Int, Int)] = c.paintedPixels.toSet

  test("line4: horizontal / vertical / diagonal visit dx+dy+1 pixels, no diagonal steps") {
    val c = new Canvas(10, 10)
    line(c, 0, 0, 3, 0, 4)
    assert(painted(c) == Set((0, 0), (1, 0), (2, 0), (3, 0)))

    val c2 = new Canvas(10, 10)
    line(c2, 2, 1, 2, 4, 4)
    assert(painted(c2) == Set((2, 1), (2, 2), (2, 3), (2, 4)))

    val c3 = new Canvas(10, 10)
    line(c3, 0, 0, 2, 2, 4)
    assert(painted(c3) == Set((0, 0), (1, 0), (1, 1), (2, 1), (2, 2)))
    // 4-connectivity property: consecutive pixels differ in exactly one axis by 1
    val c4 = new Canvas(64, 64)
    line(c4, 3, 7, 41, 23, 4)
    assert(c4.paintedCount == math.abs(41 - 3) + math.abs(23 - 7) + 1)
  }

  test("line8: diagonal steps allowed, dx_major+1 pixels") {
    val c = new Canvas(10, 10)
    line(c, 0, 0, 2, 2, 8)
    assert(painted(c) == Set((0, 0), (1, 1), (2, 2)))
    val c2 = new Canvas(64, 64)
    line(c2, 3, 7, 41, 23, 8)
    assert(c2.paintedCount == math.max(math.abs(41 - 3), math.abs(23 - 7)) + 1)
  }

  test("line endpoints swap-invariant pixel set (leftToRight normalization)") {
    for (conn <- Seq(4, 8); (x0, y0, x1, y1) <- Seq((1, 1, 7, 4), (2, 6, 5, 1), (0, 0, 0, 5))) {
      val a = new Canvas(12, 12); line(a, x0, y0, x1, y1, conn)
      val b = new Canvas(12, 12); line(b, x1, y1, x0, y0, conn)
      assert(painted(a) == painted(b), s"conn=$conn ($x0,$y0)-($x1,$y1)")
    }
  }

  test("clipLine truncates with C++ semantics and drops outside segments") {
    assert(clipLine(10, 10, -5, -5, -1, -1) == null)
    val r = clipLine(10, 10, -2, 3, 12, 3)
    assert(r.toSeq == Seq(0, 3, 9, 3))
    // line crossing a corner
    val r2 = clipLine(10, 10, -3, 5, 5, -3)
    assert(r2 != null && r2(0) >= 0 && r2(1) >= 0 && r2(2) >= 0 && r2(3) >= 0)
  }

  test("filled circle radius 1 is a plus shape; radius 0 a dot") {
    val c = new Canvas(10, 10)
    circleFilled(c, 2, 2, 1)
    assert(painted(c) == Set((1, 2), (2, 2), (3, 2), (2, 1), (2, 3)))
    val c0 = new Canvas(10, 10)
    circleFilled(c0, 5, 5, 0)
    assert(painted(c0) == Set((5, 5)))
  }

  test("thickLine width=2 horizontal: 3-wide band + round caps (cv2 parity)") {
    val c = new Canvas(16, 16)
    thickLine(c, 1, 2, 5, 2, 2, 4, 3)
    val rect = (for (x <- 1 to 5; y <- 1 to 3) yield (x, y)).toSet
    assert(painted(c) == rect ++ Set((0, 2), (6, 2)))
  }

  test("thickLine width=2 zero-length segment paints only caps") {
    val c = new Canvas(16, 16)
    thickLine(c, 4, 4, 4, 4, 2, 4, 3)
    // r ~ 0 -> no quad; caps at both (same) endpoints: radius-1 plus shape
    assert(painted(c) == Set((3, 4), (4, 4), (5, 4), (4, 3), (4, 5)))
  }

  test("fillPoly rectangle fills interior + boundary") {
    val c = new Canvas(10, 10)
    fillPoly(c, Array(1, 4, 4, 1), Array(1, 1, 4, 4))
    val expected = (for (x <- 1 to 4; y <- 1 to 4) yield (x, y)).toSet
    assert(painted(c) == expected)
  }

  test("fillPoly right triangle: scanline spans shrink along the hypotenuse") {
    val c = new Canvas(10, 10)
    fillPoly(c, Array(1, 5, 1), Array(1, 1, 5))
    val fill = Set.empty[(Int, Int)] ++
      (for (x <- 1 to 5) yield (x, 1)) ++ // row 1 span + boundary
      (for (x <- 1 to 4) yield (x, 2)) ++
      (for (x <- 1 to 3) yield (x, 3)) ++
      (for (x <- 1 to 2) yield (x, 4)) ++
      Seq((1, 5))
    // boundary line (5,1)-(1,5) is 4-connected: adds staircase pixels
    val hypo = { val h = new Canvas(10, 10); line(h, 5, 1, 1, 5, 4); painted(h) }
    val left = { val h = new Canvas(10, 10); line(h, 1, 5, 1, 1, 4); painted(h) }
    val top = { val h = new Canvas(10, 10); line(h, 1, 1, 5, 1, 4); painted(h) }
    assert(painted(c) == (fill ++ hypo ++ left ++ top))
  }

  test("fillPoly concave polygon: even-odd rule leaves the notch empty") {
    // U-shape: (1,1) (7,1) (7,5) (5,5) (5,3) (3,3) (3,5) (1,5)
    val xs = Array(1, 7, 7, 5, 5, 3, 3, 1)
    val ys = Array(1, 1, 5, 5, 3, 3, 5, 5)
    val c = new Canvas(12, 12)
    fillPoly(c, xs, ys)
    assert(c.get(2, 4), "left arm filled")
    assert(c.get(6, 4), "right arm filled")
    assert(c.get(4, 2), "bridge filled")
    assert(!c.get(4, 4), "notch interior empty")
  }

  test("polyLine closed=true draws the closing segment (reference road quirk)") {
    // open V polyline, but reference always passes isClosed=True
    // (lib/helpers.py:88): the segment from last back to first must paint
    val xs = Array(1, 4, 7)
    val ys = Array(1, 4, 1)
    val closed = new Canvas(12, 12)
    polyLine(closed, xs, ys, isClosed = true, 1, 4)
    val open = new Canvas(12, 12)
    polyLine(open, xs, ys, isClosed = false, 1, 4)
    val closingSeg = { val h = new Canvas(12, 12); line(h, 7, 1, 1, 1, 4); painted(h) }
    assert(painted(closed) == painted(open) ++ closingSeg)
    assert((2 to 6).forall(x => closed.get(x, 1)) && !open.get(3, 1))
  }

  test("out-of-canvas geometry clips instead of throwing") {
    val c = new Canvas(8, 8)
    line(c, -5, -5, 20, 20, 4)
    thickLine(c, -3, 2, 12, 2, 2, 4, 3)
    fillPoly(c, Array(-2, 10, 10, -2), Array(-2, -2, 3, 3))
    assert(c.paintedCount > 0)
    // everything that painted is within bounds by construction of Canvas.set
  }
}
