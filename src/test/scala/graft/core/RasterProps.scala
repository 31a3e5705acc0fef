package graft.core

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based checks of the CvRaster kernels. These pin INVARIANTS
  * (containment, connectivity, symmetry-free bounds) that hold for every
  * input under the cv2 semantics; exact pixel values stay pinned by the
  * hand-derived goldens in CvRasterSpec — nothing here may conflict with a
  * quirk, only with a genuine regression (dropped spans, runaway fills,
  * disconnected Bresenham walks). */
object RasterProps extends Properties("cv-raster") {

  private val W = 64
  private val ptGen = for {
    x <- Gen.choose(0, W - 1)
    y <- Gen.choose(0, W - 1)
  } yield (x, y)

  property("line paints both endpoints and stays inside the segment bbox") =
    forAll(ptGen, ptGen, Gen.oneOf(4, 8)) { case ((x1, y1), (x2, y2), conn) =>
      val c = new CvRaster.Canvas(W, W)
      CvRaster.line(c, x1, y1, x2, y2, conn)
      val px = c.paintedPixels.toSet
      px.contains((x1, y1)) && px.contains((x2, y2)) &&
        px.forall { case (x, y) =>
          x >= math.min(x1, x2) && x <= math.max(x1, x2) &&
          y >= math.min(y1, y2) && y <= math.max(y1, y2)
        }
    }

  property("line's painted set is one 8-connected component") =
    forAll(ptGen, ptGen, Gen.oneOf(4, 8)) { case ((x1, y1), (x2, y2), conn) =>
      val c = new CvRaster.Canvas(W, W)
      CvRaster.line(c, x1, y1, x2, y2, conn)
      val px = c.paintedPixels.toSet
      // BFS from one endpoint must reach every painted pixel
      val seen = collection.mutable.Set((x1, y1))
      val queue = collection.mutable.Queue((x1, y1))
      while (queue.nonEmpty) {
        val (x, y) = queue.dequeue()
        for (dx <- -1 to 1; dy <- -1 to 1 if (dx, dy) != (0, 0)) {
          val n = (x + dx, y + dy)
          if (px.contains(n) && seen.add(n)) queue.enqueue(n)
        }
      }
      seen == px
    }

  property("clipLine is the identity for fully-interior segments") =
    forAll(ptGen, ptGen) { case ((x1, y1), (x2, y2)) =>
      val r = CvRaster.clipLine(W, W, x1, y1, x2, y2)
      r != null && r.toSeq == Seq(x1, y1, x2, y2).map(_.toLong)
    }

  property("clipLine output always lands in-bounds (or null when fully outside)") =
    forAll(Gen.choose(-200L, 200L), Gen.choose(-200L, 200L),
           Gen.choose(-200L, 200L), Gen.choose(-200L, 200L)) { (x1, y1, x2, y2) =>
      val r = CvRaster.clipLine(W, W, x1, y1, x2, y2)
      r == null || r.forall(v => v >= 0 && v < W)
    }

  property("fillPoly of a rectangle paints ~its area, inside its bbox") =
    forAll(Gen.choose(2, W - 3), Gen.choose(2, W - 3),
           Gen.choose(3, 20), Gen.choose(3, 20)) { (x0, y0, dw, dh) =>
      val x1 = math.min(x0 + dw, W - 1)
      val y1 = math.min(y0 + dh, W - 1)
      val c = new CvRaster.Canvas(W, W)
      CvRaster.fillPoly(c, Array(x0, x1, x1, x0), Array(y0, y0, y1, y1))
      val inside = c.paintedPixels.forall { case (x, y) =>
        x >= x0 && x <= x1 && y >= y0 && y <= y1
      }
      val area = c.paintedCount
      // boundary conventions may include/exclude one row/column per side —
      // goldens pin the exact rule; the property pins the magnitude
      inside && area >= (x1 - x0 - 1) * (y1 - y0 - 1) &&
        area <= (x1 - x0 + 1) * (y1 - y0 + 1)
    }

  property("circleFilled stays within radius+1 of the center and covers it") =
    forAll(Gen.choose(15, W - 16), Gen.choose(15, W - 16), Gen.choose(1, 12)) {
      (cx, cy, r) =>
        val c = new CvRaster.Canvas(W, W)
        CvRaster.circleFilled(c, cx, cy, r)
        c.get(cx, cy) && c.paintedPixels.forall { case (x, y) =>
          val dx = (x - cx).toDouble
          val dy = (y - cy).toDouble
          math.sqrt(dx * dx + dy * dy) <= r + 1.0
        }
    }
}
