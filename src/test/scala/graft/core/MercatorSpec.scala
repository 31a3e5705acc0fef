package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Goldens computed from the reference formulas (lib/layers.py:24-39,
  * 91-118; lib/loaders.py:7-8) with CPython IEEE-754 doubles. Double
  * comparisons use 1e-9 relative tolerance (JVM vs libm may differ in the
  * last ulp of sin/log); tile indices and mil keys are exact. */
class MercatorSpec extends AnyFunSuite {
  private def close(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  val projectGoldens = Seq(
    // (lat, lng, wx, wy)
    (53.8306, 27.4026, 147.48629333333332, 82.40142664015553),
    (53.9739, 27.7003, 147.69799111111112, 82.2284659022114),
    (53.9045, 27.5615, 147.59928888888888, 82.31230464739087),
    (0.0, 0.0, 128.0, 128.0),
    (-33.865, 151.2094, 235.52668444444444, 153.6203619950187),
    (89.5, -179.95, 0.035555555555561114, -73.75117310580401), // above siny clamp
    (-89.5, 179.95, 255.96444444444444, 329.751173105804),
    (85.051128, 0.0, 128.0, 6.4280751956857785e-06),
  )

  test("project2web matches reference goldens incl. siny clamp") {
    for ((lat, lng, wx, wy) <- projectGoldens) {
      assert(close(Mercator.projectX(lng), wx), s"x($lat,$lng)")
      assert(close(Mercator.projectY(lat), wy), s"y($lat,$lng)")
    }
  }

  val tileGoldens = Seq(
    // (lat, lng, z, maxarOffsets, tx, ty, rx, ry)
    (53.8306, 27.4026, 19, false, 302051L, 168758L, 237.75914666056633, 31.170313864946365),
    (53.9739, 27.7003, 19, false, 302485L, 168403L, 124.36366222798824, 229.93093860894442),
    (53.9045, 27.5615, 19, false, 302283L, 168575L, 87.97297777235508, 153.57897126674652),
    (0.0, 0.0, 19, false, 262144L, 262144L, 0.0, 0.0),
    (-33.865, 151.2094, 19, false, 482358L, 314614L, 166.33400888741016, 128.34964436292648),
    (85.051128, 0.0, 19, false, 262144L, 0L, 0.0, 3.3701626881957054),
    (53.8306, 27.4026, 19, true, 302051L, 168758L, 207.75914666056633, 41.170313864946365),
    (53.9739, 27.7003, 19, true, 302485L, 168403L, 94.36366222798824, 239.93093860894442),
    (53.9045, 27.5615, 19, true, 302283L, 168575L, 57.97297777235508, 163.57897126674652),
    (0.0, 0.0, 19, true, 262143L, 262144L, 226.0, 10.0),
    (-33.865, 151.2094, 19, true, 482358L, 314614L, 136.33400888741016, 138.34964436292648),
    (85.051128, 0.0, 19, true, 262143L, 0L, 226.0, 13.370162688195705),
  )

  test("tile_at_wgs + pixel remainder match reference goldens incl. maxar offsets") {
    for ((lat, lng, z, maxar, tx, ty, rx, ry) <- tileGoldens) {
      val ox = if (maxar) Mercator.MaxarOffsetX else 0.0
      val oy = if (maxar) Mercator.MaxarOffsetY else 0.0
      val (gtx, gty, grx, gry) = Mercator.tileAndPixelAtWgs(lat, lng, z, ox, oy)
      assert(gtx == tx && gty == ty, s"tile($lat,$lng,maxar=$maxar): got ($gtx,$gty)")
      assert(close(grx, rx, 1e-6) && close(gry, ry, 1e-6), s"remainder($lat,$lng,maxar=$maxar)")
    }
  }

  test("wgs_at_tile returns the tile CENTER (reference lib/layers.py:32-39)") {
    val goldens = Seq(
      (0L, 0L, 0, 0.0, 0.0),
      (1L, 1L, 1, -66.51326044311185, 90.0),
      (302304L, 168755L, 19, 53.83166243011047, 27.576026916503906),
      (151152L, 84377L, 18, 53.83186504485331, 27.576370239257812),
      (75576L, 42188L, 17, 53.83227027139864, 27.577056884765625),
    )
    for ((tx, ty, z, lat, lng) <- goldens) {
      val (glat, glng) = Mercator.wgsAtTile(tx, ty, z)
      assert(close(glat, lat) && close(glng, lng), s"center($tx,$ty,$z)")
    }
  }

  test("mil floors (not truncates) — reference lib/loaders.py:7-8") {
    val goldens = Seq((0.0, 0L), (1.5, 1500000L), (-1.5, -1500000L),
      (53.9739, 53973900L), (-1e-07, -1L), (27.4026, 27402600L),
      (-27.4026, -27402600L), (0.9999995, 999999L))
    for ((v, m) <- goldens) assert(Mercator.mil(v) == m, s"mil($v)")
  }

  test("edge filter half-open bounds at edge=16 and edge=24 (lib/layers.py:135-141)") {
    for (e <- Seq(16, 24)) {
      assert(Mercator.isEdgeOutlier(e - 1, 128, e))
      assert(!Mercator.isEdgeOutlier(e, 128, e))
      assert(!Mercator.isEdgeOutlier(256 - e - 1, 128, e))
      assert(Mercator.isEdgeOutlier(256 - e, 128, e))
      assert(Mercator.isEdgeOutlier(128, e - 1, e))
      assert(!Mercator.isEdgeOutlier(128, 256 - e - 1, e))
    }
  }

  test("cell round trip: cellAtWgs(cellCenterWgs(c)) == c across zooms") {
    val cells = for {
      z <- Seq(3, 10, 18, 19, 22)
      k <- 0 until 50
    } yield {
      val max = 1L << z
      (z, math.abs(Splitmix.mix(z * 1000L + k)) % max, math.abs(Splitmix.mix(z * 2000L + k)) % max)
    }
    for ((z, tx, ty) <- cells) {
      val (lat, lng) = Mercator.wgsAtTile(tx, ty, z)
      // skip centers outside the siny clamp (poles) where inversion breaks
      if (math.abs(lat) < 89.0) {
        val (gtx, gty) = Mercator.tileAtWgs(lat, lng, z, 0, 0)
        assert(gtx == tx && gty == ty, s"roundtrip z=$z ($tx,$ty)")
      }
    }
  }

  test("CellId pack/unpack/parent/children/ring") {
    val c = CellId.pack(19, 302051L, 168758L)
    assert(CellId.z(c) == 19 && CellId.tx(c) == 302051L && CellId.ty(c) == 168758L)
    assert(CellId.parent(c) == CellId.pack(18, 151025L, 84379L))
    assert(CellId.children(CellId.parent(c)).contains(CellId.pack(19, 302050L, 168758L)))
    assert(CellId.ring(c, 0).toSeq == Seq(c))
    assert(CellId.ring(c, 1).length == 8)
    assert(CellId.ring(c, 2).length == 16)
    // corner clamping
    val corner = CellId.pack(5, 0L, 0L)
    assert(CellId.ring(corner, 1).length == 3)
  }

  test("projection is monotone: x in lng, y decreasing in lat") {
    val lngs = Seq(-179.0, -90.0, -1.0, 0.0, 1.0, 90.0, 179.0)
    assert(lngs.map(Mercator.projectX) == lngs.map(Mercator.projectX).sorted)
    val lats = Seq(-85.0, -45.0, 0.0, 45.0, 85.0)
    val ys = lats.map(Mercator.projectY)
    assert(ys == ys.sorted.reverse)
  }
}
