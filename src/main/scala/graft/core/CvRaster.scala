package graft.core

import java.util.{BitSet => JBitSet}

/**
 * OpenCV-parity rasterization kernel. Pure Scala, zero Spark deps.
 *
 * The reference paints positive examples onto a per-bbox tile canvas with
 * cv2 primitives and then anti-joins negatives from the unpainted complement
 * (reference lib/helpers.py:36-215):
 *  - dots:      canvas[y][x] = color            (lib/helpers.py:67-76)
 *  - polylines: cv2.polylines(..., isClosed=True, width, lineType=4)
 *               (lib/helpers.py:84-88 — note closed=True even for open
 *               roads; the extra closing segment is reproduced here)
 *  - lines:     cv2.line(..., width)            (lib/helpers.py:78-82)
 *  - fills:     cv2.fillPoly(..., lineType=4)   (lib/helpers.py:90-94)
 *
 * This object re-implements the *semantics* of OpenCV 4.x's integer drawing
 * algorithms (modules/imgproc/src/drawing.cpp, Apache-2.0): LineIterator
 * Bresenham (4- and 8-connected), clipLine, Line2 fixed-point DDA,
 * FillConvexPoly, filled Circle (round caps), ThickLine, PolyLine,
 * CollectPolyEdges/FillEdgeCollection scanline fill. All arithmetic is
 * integer/fixed-point exactly as in OpenCV so painted-cell sets are
 * bit-reproducible.
 */
object CvRaster {
  final val XyShift = 16
  final val XyOne = 1 << XyShift

  /** Minimal uint8-canvas stand-in: a bitset of painted pixels. */
  final class Canvas(val width: Int, val height: Int) {
    val bits = new JBitSet(width * height)
    @inline def set(x: Int, y: Int): Unit =
      if (x >= 0 && x < width && y >= 0 && y < height) bits.set(y * width + x)
    @inline def get(x: Int, y: Int): Boolean =
      x >= 0 && x < width && y >= 0 && y < height && bits.get(y * width + x)
    /** Inclusive horizontal span, caller pre-clips to [0, width). */
    @inline def hline(x1: Int, x2: Int, y: Int): Unit = {
      var x = x1
      while (x <= x2) { bits.set(y * width + x); x += 1 }
    }
    def paintedCount: Int = bits.cardinality()
    def paintedPixels: Iterator[(Int, Int)] =
      Iterator.iterate(bits.nextSetBit(0))(i => bits.nextSetBit(i + 1))
        .takeWhile(_ >= 0).map(i => (i % width, i / width))
  }

  /** OpenCV clipLine (drawing.cpp clipLine(Size2l,...)): Cohen-Sutherland
    * with double intermediates truncated toward zero. Returns null if the
    * segment is fully outside, else the clipped endpoints. */
  def clipLine(w: Long, h: Long, x1in: Long, y1in: Long, x2in: Long, y2in: Long): Array[Long] = {
    if (w <= 0 || h <= 0) return null
    val right = w - 1; val bottom = h - 1
    var x1 = x1in; var y1 = y1in; var x2 = x2in; var y2 = y2in
    def code(x: Long, y: Long): Int =
      (if (x < 0) 1 else 0) + (if (x > right) 2 else 0) +
      (if (y < 0) 4 else 0) + (if (y > bottom) 8 else 0)
    var c1 = code(x1, y1); var c2 = code(x2, y2)
    if ((c1 & c2) == 0 && (c1 | c2) != 0) {
      if ((c1 & 12) != 0) {
        val a = if (c1 < 8) 0L else bottom
        x1 += ((a - y1).toDouble * (x2 - x1) / (y2 - y1)).toLong
        y1 = a
        c1 = (if (x1 < 0) 1 else 0) + (if (x1 > right) 2 else 0)
      }
      if ((c2 & 12) != 0) {
        val a = if (c2 < 8) 0L else bottom
        x2 += ((a - y2).toDouble * (x2 - x1) / (y2 - y1)).toLong
        y2 = a
        c2 = (if (x2 < 0) 1 else 0) + (if (x2 > right) 2 else 0)
      }
      if ((c1 & c2) == 0 && (c1 | c2) != 0) {
        if (c1 != 0) {
          val a = if (c1 == 1) 0L else right
          y1 += ((a - x1).toDouble * (y2 - y1) / (x2 - x1)).toLong
          x1 = a
          c1 = 0
        }
        if (c2 != 0) {
          val a = if (c2 == 1) 0L else right
          y2 += ((a - x2).toDouble * (y2 - y1) / (x2 - x1)).toLong
          x2 = a
          c2 = 0
        }
      }
    }
    if ((c1 | c2) == 0) Array(x1, y1, x2, y2) else null
  }

  /** OpenCV thin Line: LineIterator (leftToRight=true) with clipping;
    * connectivity 4 or 8. Plots every visited pixel. */
  def line(c: Canvas, x1in: Int, y1in: Int, x2in: Int, y2in: Int, connectivity: Int): Unit = {
    val clipped = clipLine(c.width, c.height, x1in, y1in, x2in, y2in)
    if (clipped == null) return
    var px1 = clipped(0).toInt; var py1 = clipped(1).toInt
    val px2 = clipped(2).toInt; val py2 = clipped(3).toInt

    var deltaX = 1; var deltaY = 1
    var dx = px2 - px1
    var dy = py2 - py1
    if (dx < 0) { // leftToRight
      dx = -dx; dy = -dy
      px1 = px2; py1 = py2
    }
    if (dy < 0) { dy = -dy; deltaY = -1 }
    val vert = dy > dx
    if (vert) { val t = dx; dx = dy; dy = t; val s = deltaX; deltaX = deltaY; deltaY = s }

    var err, plusDelta, minusDelta, plusStep, minusStep, plusShift, minusShift, count = 0
    if (connectivity == 8) {
      err = dx - (dy + dy)
      plusDelta = dx + dx
      minusDelta = -(dy + dy)
      minusShift = deltaX; plusShift = 0
      minusStep = 0; plusStep = deltaY
      count = dx + 1
    } else { // 4
      err = 0
      plusDelta = (dx + dx) + (dy + dy)
      minusDelta = -(dy + dy)
      minusShift = deltaX; plusShift = -deltaX
      minusStep = 0; plusStep = deltaY
      count = dx + dy + 1
    }
    if (vert) {
      var t = plusStep; plusStep = plusShift; plusShift = t
      t = minusStep; minusStep = minusShift; minusShift = t
    }
    var x = px1; var y = py1
    var i = 0
    while (i < count) {
      c.set(x, y)
      val mask = if (err < 0) -1 else 0
      err += minusDelta + (plusDelta & mask)
      x += minusShift + (plusShift & mask)
      y += minusStep + (plusStep & mask)
      i += 1
    }
  }

  /** OpenCV Line2: fixed-point (XY_SHIFT) DDA used for thick-line quad
    * boundaries. Endpoints in fixed-point coords. */
  def line2(c: Canvas, p1xIn: Long, p1yIn: Long, p2xIn: Long, p2yIn: Long): Unit = {
    val sw = c.width.toLong << XyShift
    val sh = c.height.toLong << XyShift
    val clipped = clipLine(sw, sh, p1xIn, p1yIn, p2xIn, p2yIn)
    if (clipped == null) return
    var p1x = clipped(0); var p1y = clipped(1)
    var p2x = clipped(2); var p2y = clipped(3)

    val dx = p2x - p1x
    val dy = p2y - p1y
    val j = if (dx < 0) -1L else 0L
    val ax = (dx ^ j) - j
    val i0 = if (dy < 0) -1L else 0L
    val ay = (dy ^ i0) - i0

    var xStep = 0L; var yStep = 0L; var ecount = 0
    if (ax > ay) {
      val dyn = (dy ^ j) - j
      if (j != 0) { var t = p1x; p1x = p2x; p2x = t; t = p1y; p1y = p2y; p2y = t }
      xStep = XyOne.toLong
      yStep = dyn * (1L << XyShift) / (ax | 1)
      ecount = ((p2x - p1x) >> XyShift).toInt
    } else {
      val dxn = (dx ^ i0) - i0
      if (i0 != 0) { var t = p1x; p1x = p2x; p2x = t; t = p1y; p1y = p2y; p2y = t }
      xStep = dxn * (1L << XyShift) / (ay | 1)
      yStep = XyOne.toLong
      ecount = ((p2y - p1y) >> XyShift).toInt
    }
    c.set(((p2x + (XyOne >> 1)) >> XyShift).toInt, ((p2y + (XyOne >> 1)) >> XyShift).toInt)
    var cx = p1x + (XyOne >> 1)
    var cy = p1y + (XyOne >> 1)
    var e = ecount
    while (e >= 0) {
      c.set((cx >> XyShift).toInt, (cy >> XyShift).toInt)
      cx += xStep
      cy += yStep
      e -= 1
    }
  }

  /** OpenCV FillConvexPoly over fixed-point vertices (shift = XY_SHIFT form,
    * as invoked by ThickLine). Draws the boundary with Line2, then scanline-
    * fills. `lineType` < 100 means non-AA (we only support 4/8). */
  def fillConvexPolyFp(c: Canvas, vx: Array[Long], vy: Array[Long]): Unit = {
    val npts = vx.length
    val shift = XyShift
    val delta = (1 << shift) >> 1
    val delta1 = XyOne >> 1
    val delta2 = XyOne >> 1
    var imin = 0
    var xminL = vx(0); var xmaxL = vx(0); var yminL = vy(0); var ymaxL = vy(0)
    var p0x = vx(npts - 1); var p0y = vy(npts - 1)
    var i = 0
    while (i < npts) {
      val px = vx(i); val py = vy(i)
      if (py < yminL) { yminL = py; imin = i }
      if (py > ymaxL) ymaxL = py
      if (px > xmaxL) xmaxL = px
      if (px < xminL) xminL = px
      // boundary: shift != 0 -> Line2
      line2(c, p0x, p0y, px, py)
      p0x = px; p0y = py
      i += 1
    }
    val xmin = (xminL + delta) >> shift
    val xmax = (xmaxL + delta) >> shift
    val ymin = (yminL + delta) >> shift
    var ymax = (ymaxL + delta) >> shift
    if (npts < 3 || xmax < 0 || ymax < 0 || xmin >= c.width || ymin >= c.height) return
    if (ymax > c.height - 1) ymax = c.height - 1

    // two active edges walking clockwise/counterclockwise from the top vertex
    val eIdx = Array(imin, imin)
    val eDi = Array(1, npts - 1)
    val eX = Array(-XyOne.toLong, -XyOne.toLong)
    val eDx = Array(0L, 0L)
    val eYe = Array(ymin.toInt, ymin.toInt)
    var edges = npts
    var y = ymin.toInt
    var break = false
    while (!break) {
      i = 0
      while (i < 2) {
        if (y >= eYe(i)) {
          var idx0 = eIdx(i); val di = eDi(i)
          var idx = idx0 + di
          if (idx >= npts) idx -= npts
          var found = false
          while (!found && { edges -= 1; edges >= 0 }) {
            val ty = ((vy(idx) + delta) >> shift).toInt
            if (ty > y) {
              val xs = vx(idx0)
              val xe = vx(idx)
              eYe(i) = ty
              eDx(i) = ((xe - xs) * 2 + (ty - y)) / (2L * (ty - y))
              eX(i) = xs
              eIdx(i) = idx
              found = true
            } else {
              idx0 = idx
              idx += di
              if (idx >= npts) idx -= npts
            }
          }
        }
        i += 1
      }
      if (edges < 0) break = true
      else {
        if (y >= 0) {
          var left = 0; var right = 1
          if (eX(0) > eX(1)) { left = 1; right = 0 }
          var xx1 = ((eX(left) + delta1) >> XyShift).toInt
          var xx2 = ((eX(right) + delta2) >> XyShift).toInt
          if (xx2 >= 0 && xx1 < c.width) {
            if (xx1 < 0) xx1 = 0
            if (xx2 >= c.width) xx2 = c.width - 1
            c.hline(xx1, xx2, y)
          }
        }
        eX(0) += eDx(0)
        eX(1) += eDx(1)
        y += 1
        if (y > ymax) break = true
      }
    }
  }

  /** OpenCV filled Circle (midpoint algorithm with horizontal spans). */
  def circleFilled(c: Canvas, cx: Int, cy: Int, radius: Int): Unit = {
    var err = 0; var dx = radius; var dy = 0; var plus = 1
    var minus = (radius << 1) - 1
    while (dx >= dy) {
      val y11 = cy - dy; val y12 = cy + dy; val y21 = cy - dx; val y22 = cy + dx
      val x11 = cx - dx; val x12 = cx + dx; val x21 = cx - dy; val x22 = cx + dy
      def span(x1: Int, x2: Int, y: Int): Unit =
        if (y >= 0 && y < c.height) {
          val a = math.max(x1, 0); val b = math.min(x2, c.width - 1)
          if (a <= b) c.hline(a, b, y)
        }
      span(x11, x12, y11); span(x11, x12, y12)
      span(x21, x22, y21); span(x21, x22, y22)
      dy += 1
      err += plus
      plus += 2
      val mask = if (err <= 0) 0 else -1
      err -= minus & mask
      dx += mask
      minus -= mask & 2
    }
  }

  /** OpenCV ThickLine, shift=0 integer endpoints. flags bit1 = round cap at
    * p0, bit2 = round cap at p1 (thickness > 1 only). */
  def thickLine(c: Canvas, x0: Int, y0: Int, x1: Int, y1: Int,
                thickness: Int, lineType: Int, flags: Int): Unit = {
    // promote to fixed point (shift=0 -> << XY_SHIFT)
    var p0x = x0.toLong << XyShift; var p0y = y0.toLong << XyShift
    val p1x = x1.toLong << XyShift; val p1y = y1.toLong << XyShift
    if (thickness <= 1) {
      // lineType 4 (or shift==0 in general): round back and Bresenham
      line(c, ((p0x + (XyOne >> 1)) >> XyShift).toInt, ((p0y + (XyOne >> 1)) >> XyShift).toInt,
           ((p1x + (XyOne >> 1)) >> XyShift).toInt, ((p1y + (XyOne >> 1)) >> XyShift).toInt, lineType)
    } else {
      val invXyOne = 1.0 / XyOne
      val dx = (p0x - p1x) * invXyOne
      val dy = (p1y - p0y) * invXyOne
      var r = dx * dx + dy * dy
      val oddThickness = thickness & 1
      val thickFp = thickness.toLong << (XyShift - 1)
      if (math.abs(r) > Double.MinPositiveValue * 4) { // DBL_EPSILON guard
        r = (thickFp + oddThickness * XyOne * 0.5) / math.sqrt(r)
        val dpx = math.rint(dy * r).toLong // cvRound = round-half-even
        val dpy = math.rint(dx * r).toLong
        val qx = Array(p0x + dpx, p0x - dpx, p1x - dpx, p1x + dpx)
        val qy = Array(p0y + dpy, p0y - dpy, p1y - dpy, p1y + dpy)
        fillConvexPolyFp(c, qx, qy)
      }
      var i = 0
      while (i < 2) {
        if ((flags & (i + 1)) != 0) {
          val ccx = ((p0x + (XyOne >> 1)) >> XyShift).toInt
          val ccy = ((p0y + (XyOne >> 1)) >> XyShift).toInt
          circleFilled(c, ccx, ccy, ((thickFp + (XyOne >> 1)) >> XyShift).toInt)
        }
        p0x = p1x; p0y = p1y
        i += 1
      }
    }
  }

  /** OpenCV PolyLine: one ThickLine per segment; closed starts at the last
    * vertex. Reference roads: closed=true, width=2, lineType=4
    * (lib/helpers.py:84-88). */
  def polyLine(c: Canvas, xs: Array[Int], ys: Array[Int], isClosed: Boolean,
               thickness: Int, lineType: Int): Unit = {
    val count = xs.length
    if (count == 0) return
    val i0 = if (isClosed) count - 1 else 0
    var flags = 2 + (if (isClosed) 0 else 1)
    var p0x = xs(i0); var p0y = ys(i0)
    var i = if (isClosed) 0 else 1
    while (i < count) {
      thickLine(c, p0x, p0y, xs(i), ys(i), thickness, lineType, flags)
      p0x = xs(i); p0y = ys(i)
      flags = 2
      i += 1
    }
  }

  // ---------- general polygon fill (cv2.fillPoly semantics) ----------

  private final class PolyEdge {
    var y0 = 0; var y1 = 0
    var x = 0L; var dx = 0L
    var next: PolyEdge = null
  }

  /** OpenCV CollectPolyEdges with shift=0 (integer input vertices),
    * lineType 4/8: draws the boundary with Line() and collects y-monotone
    * edges in fixed-point x. */
  private def collectPolyEdges(c: Canvas, xs: Array[Int], ys: Array[Int],
                               lineType: Int, edges: collection.mutable.ArrayBuffer[PolyEdge]): Unit = {
    val count = xs.length
    if (count == 0) return
    // shift=0: delta = 0, x <<= XY_SHIFT, y unchanged
    var pt0x = xs(count - 1).toLong << XyShift
    var pt0y = ys(count - 1).toLong
    var i = 0
    while (i < count) {
      val pt1x = xs(i).toLong << XyShift
      val pt1y = ys(i).toLong
      // draw boundary (integer endpoints after rounding x back)
      line(c, ((pt0x + (XyOne >> 1)) >> XyShift).toInt, pt0y.toInt,
           ((pt1x + (XyOne >> 1)) >> XyShift).toInt, pt1y.toInt, lineType)
      if (pt0y != pt1y) {
        val e = new PolyEdge
        if (pt0y < pt1y) { e.y0 = pt0y.toInt; e.y1 = pt1y.toInt; e.x = pt0x }
        else { e.y0 = pt1y.toInt; e.y1 = pt0y.toInt; e.x = pt1x }
        e.dx = (pt1x - pt0x) / (pt1y - pt0y)
        edges += e
      }
      pt0x = pt1x; pt0y = pt1y
      i += 1
    }
  }

  /** OpenCV FillEdgeCollection: even-odd scanline fill with an active edge
    * list re-sorted by bubble passes per row. */
  private def fillEdgeCollection(c: Canvas, buf: collection.mutable.ArrayBuffer[PolyEdge]): Unit = {
    val total = buf.length
    if (total < 2) return
    var yMax = Int.MinValue; var yMin = Int.MaxValue
    var xMax = Long.MinValue; var xMin = Long.MaxValue
    var i = 0
    while (i < total) {
      val e1 = buf(i)
      val x1 = e1.x + (e1.y1 - e1.y0) * e1.dx
      if (e1.y0 < yMin) yMin = e1.y0
      if (e1.y1 > yMax) yMax = e1.y1
      if (e1.x < xMin) xMin = e1.x
      if (e1.x > xMax) xMax = e1.x
      if (x1 < xMin) xMin = x1
      if (x1 > xMax) xMax = x1
      i += 1
    }
    if (yMax < 0 || yMin >= c.height || xMax < 0 || xMin >= (c.width.toLong << XyShift)) return
    val sorted = buf.sortWith { (e1, e2) =>
      e1.y0 < e2.y0 || (e1.y0 == e2.y0 && (e1.x < e2.x || (e1.x == e2.x && e1.dx < e2.dx)))
    }
    // sentinel appended like OpenCV's edges.push_back(tmp with y0=INT_MAX)
    val sentinel = new PolyEdge
    sentinel.y0 = Int.MaxValue
    sorted += sentinel
    val tmp = new PolyEdge
    tmp.next = null
    var idx = 0
    var e = sorted(idx)
    val yStop = math.min(yMax, c.height)
    var y = e.y0
    while (y < yStop) {
      var draw = false
      val clip = y < 0
      var prelast = tmp
      var last = tmp.next
      var break = false
      while (!break && (last != null || e.y0 == y)) {
        if (last != null && last.y1 == y) {
          // exclude edge whose lower endpoint is reached
          prelast.next = last.next
          last = last.next
        } else {
          val keepPrelast = prelast
          if (last != null && (e.y0 > y || last.x < e.x)) {
            prelast = last
            last = last.next
          } else if (idx < total) {
            // activate the next edge whose upper endpoint is reached
            prelast.next = e
            e.next = last
            prelast = e
            idx += 1
            e = sorted(idx)
          } else {
            break = true
          }
          if (!break) {
            if (draw) {
              if (!clip) {
                var x1 = 0; var x2 = 0
                if (keepPrelast.x > prelast.x) {
                  x1 = ((prelast.x + XyOne - 1) >> XyShift).toInt
                  x2 = (keepPrelast.x >> XyShift).toInt
                } else {
                  x1 = ((keepPrelast.x + XyOne - 1) >> XyShift).toInt
                  x2 = (prelast.x >> XyShift).toInt
                }
                if (x1 < c.width && x2 >= 0) {
                  if (x1 < 0) x1 = 0
                  if (x2 >= c.width) x2 = c.width - 1
                  if (x1 <= x2) c.hline(x1, x2, y)
                }
              }
              keepPrelast.x += keepPrelast.dx
              prelast.x += prelast.dx
            }
            draw = !draw
          }
        }
      }
      // bubble re-sort of the active list by x
      var keepPrelast: PolyEdge = null
      var continueSort = true
      while (continueSort) {
        var pre = tmp
        var cur = tmp.next
        var lastExchange: PolyEdge = null
        while (cur != null && cur != keepPrelast && cur.next != null) {
          val te = cur.next
          if (cur.x > te.x) {
            pre.next = te
            cur.next = te.next
            te.next = cur
            pre = te
            lastExchange = pre
          } else {
            pre = cur
            cur = cur.next
          }
        }
        if (lastExchange == null) continueSort = false
        else {
          keepPrelast = lastExchange
          if (keepPrelast == tmp.next || keepPrelast == tmp) continueSort = false
        }
      }
      y += 1
    }
  }

  /** cv2.fillPoly with lineType=4, shift=0 — reference lib/helpers.py:90-94. */
  def fillPoly(c: Canvas, xs: Array[Int], ys: Array[Int], lineType: Int = 4): Unit = {
    val edges = collection.mutable.ArrayBuffer.empty[PolyEdge]
    collectPolyEdges(c, xs, ys, lineType, edges)
    fillEdgeCollection(c, edges)
  }
}
