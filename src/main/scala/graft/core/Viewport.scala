package graft.core

/**
 * Viewport / mosaic / way-cover geometry, reproducing the reference's
 * lib/layers.py:145-272 exactly, including its documented quirks:
 *
 *  - `tiles_near_wgs` uses h/2 for BOTH axes (lib/layers.py:155-158) so
 *    viewports are square regardless of w — preserved.
 *  - point-in-viewport offsets use python round() = round-half-to-even
 *    (lib/layers.py:175-176) -> Math.rint here.
 *  - `tiles_way` padding: 25% of extent per axis, floored at 48px at the
 *    target zoom, then `%= 256` world wrap (lib/layers.py:258-270). The
 *    wrap is a latent antimeridian bug in the reference; preserved
 *    bit-for-bit and pinned by golden (SURVEY.md §2.2 P11).
 *  - `tiles_box_wc` crop corners use round() on the NW/SE pixel remainders
 *    with the reference's transposed naming (pN is the x-remainder of the
 *    NW corner) — lib/layers.py:212-243.
 */
object Viewport {
  import Mercator.TileSize

  /** Viewport tile range + point offset. h is used for both axes (square-
    * viewport quirk). Returns (txmin, txmax, tymin, tymax, rx, ry). */
  def tilesNearWgs(lat: Double, lng: Double, z: Int, h: Int, w: Int,
                   offsetX: Double, offsetY: Double): (Long, Long, Long, Long, Long, Long) = {
    val scale = (1L << z).toDouble
    val px = (Mercator.projectX(lng) + offsetX) * scale
    val py = (Mercator.projectY(lat) + offsetY) * scale
    val pxmin = px - h / 2.0
    val pxmax = px + h / 2.0
    val pymin = py - h / 2.0 // sic: h, not w — lib/layers.py:157-158
    val pymax = py + h / 2.0
    val txmin = math.floor(pxmin / TileSize).toLong
    val txmax = math.floor(pxmax / TileSize).toLong
    val tymin = math.floor(pymin / TileSize).toLong
    val tymax = math.floor(pymax / TileSize).toLong
    val rx = math.rint(px - txmin * TileSize).toLong
    val ry = math.rint(py - tymin * TileSize).toLong
    (txmin, txmax, tymin, tymax, rx, ry)
  }

  /** Box cover in unscaled world coordinates -> tile range + crop bounds
    * (xmin, ymin, xmax, ymax) in mosaic-local pixels. lib/layers.py:212-243.
    * Returns (txmin, txmax, tymin, tymax, xmin, ymin, xmax, ymax). */
  def tilesBoxWc(w0: Double, s0: Double, e0: Double, n0: Double, z: Int,
                 offsetX: Double, offsetY: Double): (Long, Long, Long, Long, Long, Long, Long, Long) = {
    val (txmin, tymin, pN, pW) = Mercator.tileAtWcu(w0, n0, z, offsetX, offsetY)
    val (txmax, tymax, pS, pE) = Mercator.tileAtWcu(e0, s0, z, offsetX, offsetY)
    val htiles = tymax - tymin + 1
    val wtiles = txmax - txmin + 1
    // after the paste loops px/py end at wtiles*256 / htiles*256
    val pxEnd = wtiles * TileSize
    val pyEnd = htiles * TileSize
    val xmin = math.rint(pN).toLong // transposed naming preserved (ref :232-235)
    val ymin = math.rint(pW).toLong
    val xmax = math.rint(pxEnd - TileSize + pS).toLong
    val ymax = math.rint(pyEnd - TileSize + pE).toLong
    (txmin, txmax, tymin, tymax, xmin, ymin, xmax, ymax)
  }

  /** Way bbox + padding + %256 world wrap -> box cover. lib/layers.py:245-272.
    * Input: packed coordinate arrays of the way's nodes. */
  def tilesWay(lats: Array[Double], lngs: Array[Double], z: Int,
               offsetX: Double, offsetY: Double,
               padPct: Double = 0.25, padPx: Double = 48): (Long, Long, Long, Long, Long, Long, Long, Long) = {
    // a zero-node way must fail loudly (reference min([]) raises), not
    // produce a plausible-looking cover from the MaxValue sentinels
    require(lats.nonEmpty && lats.length == lngs.length,
      s"tilesWay needs matched non-empty coords, got ${lats.length}/${lngs.length}")
    var wMin = Double.MaxValue; var eMax = Double.MinValue
    var nMin = Double.MaxValue; var sMax = Double.MinValue
    var i = 0
    while (i < lats.length) {
      val x = Mercator.projectX(lngs(i))
      val y = Mercator.projectY(lats(i))
      if (x < wMin) wMin = x
      if (x > eMax) eMax = x
      if (y < nMin) nMin = y
      if (y > sMax) sMax = y
      i += 1
    }
    var padWE = (eMax - wMin) * padPct
    var padNS = (sMax - nMin) * padPct
    val scale = (1L << z).toDouble
    if (padWE * scale < padPx) padWE = padPx / scale
    if (padNS * scale < padPx) padNS = padPx / scale
    // python's % on floats always returns a non-negative result for a
    // positive modulus; reproduce with floorMod semantics
    def pmod(a: Double): Double = { val r = a % 256.0; if (r < 0) r + 256.0 else r }
    val w1 = pmod(wMin - padWE)
    val e1 = pmod(eMax + padWE)
    val n1 = pmod(nMin - padNS)
    val s1 = pmod(sMax + padNS)
    tilesBoxWc(w1, s1, e1, n1, z, offsetX, offsetY)
  }

}
