package graft.core

/**
 * Web-Mercator / slippy-tile kernel. Pure Scala, zero Spark deps; wrapped by
 * Catalyst expressions in [[graft.functions]].
 *
 * Semantics reproduce the reference exactly (all citations vs
 * /root/reference/):
 *  - `project2web`: lib/layers.py:24-30 — WGS84 degrees -> unscaled
 *    Web-Mercator "world coordinates" in 0..256, with the siny clamp at
 *    +-0.9999 (bounds latitude to ~ +-89.19 deg).
 *  - `wgsAtTile`: lib/layers.py:32-39 — tile index -> WGS of the tile
 *    **center** ((t+0.5)/2^z), not the corner.
 *  - `tileAtWcu` / `tileAtWgs`: lib/layers.py:91-118 — floor-division tile
 *    containment with a per-imagery-provider offset applied in unscaled
 *    world units *before* scaling.
 *  - `mil`: lib/loaders.py:7-8 — fixed-point micro-degree key,
 *    floor (not truncation) so negatives round down.
 *
 * Latitude-first ordering everywhere, per the reference's convention
 * (lib/layers.py:10-11).
 */
object Mercator {
  val TileSize = 256

  /** EPSG:4326 degrees -> unscaled world coords (0..256). lib/layers.py:24-30 */
  @inline def projectX(lng: Double): Double =
    TileSize * (0.5 + lng / 360.0)

  @inline def projectY(lat: Double): Double = {
    var siny = math.sin(lat * math.Pi / 180.0)
    if (siny < -0.9999) siny = -0.9999
    if (siny > 0.9999) siny = 0.9999
    TileSize * (0.5 - math.log((1 + siny) / (1 - siny)) / (4 * math.Pi))
  }

  /** Tile index -> WGS of the tile CENTER. lib/layers.py:32-39 */
  def wgsAtTile(tx: Long, ty: Long, z: Int): (Double, Double) = {
    val scale = (1L << z).toDouble
    val x = (tx + 0.5) / scale
    val y = (ty + 0.5) / scale
    val lng = 180.0 * (2 * x - 1)
    val lat = 180.0 / math.Pi * (2 * math.atan(math.exp((1 - 2 * y) * math.Pi)) - math.Pi / 2)
    (lat, lng)
  }

  /** World coords + provider offset -> (tx, ty, rx, ry). lib/layers.py:91-105.
    * Offset is in unscaled world units and is applied before the floor. */
  def tileAtWcu(wx: Double, wy: Double, z: Int, offsetX: Double, offsetY: Double): (Long, Long, Double, Double) = {
    val scale = (1L << z).toDouble
    val px = (wx + offsetX) * scale
    val py = (wy + offsetY) * scale
    val tx = math.floor(px / TileSize).toLong
    val ty = math.floor(py / TileSize).toLong
    (tx, ty, px - tx * TileSize, py - ty * TileSize)
  }

  /** WGS point -> containing tile index. lib/layers.py:107-118 */
  def tileAtWgs(lat: Double, lng: Double, z: Int, offsetX: Double, offsetY: Double): (Long, Long) = {
    val t = tileAtWcu(projectX(lng), projectY(lat), z, offsetX, offsetY)
    (t._1, t._2)
  }

  /** WGS point -> (tx, ty, rx, ry) with in-tile pixel remainder.
    * lib/layers.py:120-133 (gettile_wgs before the edge test). */
  def tileAndPixelAtWgs(lat: Double, lng: Double, z: Int, offsetX: Double, offsetY: Double): (Long, Long, Double, Double) =
    tileAtWcu(projectX(lng), projectY(lat), z, offsetX, offsetY)

  /** Edge-proximity test: true = point is an "outlier" too close to a tile
    * border and must be dropped. lib/layers.py:135-141 (default edge=16;
    * buildings use 24, make_buildings.py:40). */
  @inline def isEdgeOutlier(rx: Double, ry: Double, edge: Double): Boolean =
    rx < edge || rx >= TileSize - edge || ry < edge || ry >= TileSize - edge

  /** Fixed-point micro-degree key: floor(x * 1e6). lib/loaders.py:7-8 */
  @inline def mil(fp: Double): Long = math.floor(fp * 1000000.0).toLong

  /** Maxar imagery offsets: -30px/+10px at z19, stored in unscaled world
    * units. lib/layers.py:277-278 */
  val MaxarOffsetX: Double = -30.0 / (1 << 19)
  val MaxarOffsetY: Double = 10.0 / (1 << 19)
}

/**
 * Hierarchical cell index packing z/tx/ty into one Long — the engine's
 * H3/S2-analog (no H3/S2 jar in the offline environment; slippy tiles ARE
 * the reference's own index, lib/layers.py:107-118, generalized here with
 * parent/child/neighbor navigation for kNN ring search).
 *
 * Layout: [ 6 bits z | 29 bits tx | 29 bits ty ]  (supports z <= 29).
 * tx/ty are non-negative for any on-earth point (world coords 0..256 scaled
 * by 2^z stay positive); provider offsets can push a point one tile past
 * the edge at extreme coords, so tx/ty are masked defensively.
 */
object CellId {
  @inline def pack(z: Int, tx: Long, ty: Long): Long =
    (z.toLong << 58) | ((tx & 0x1FFFFFFFL) << 29) | (ty & 0x1FFFFFFFL)

  @inline def z(cell: Long): Int = (cell >>> 58).toInt
  @inline def tx(cell: Long): Long = (cell >>> 29) & 0x1FFFFFFFL
  @inline def ty(cell: Long): Long = cell & 0x1FFFFFFFL

  /** Parent cell one zoom level up (quadtree). */
  @inline def parent(cell: Long): Long = {
    val zz = z(cell)
    require(zz > 0, "z0 cell has no parent")
    pack(zz - 1, tx(cell) >> 1, ty(cell) >> 1)
  }

  /** The 4 children one zoom level down. */
  def children(cell: Long): Array[Long] = {
    val zz = z(cell); val x = tx(cell) << 1; val y = ty(cell) << 1
    Array(pack(zz + 1, x, y), pack(zz + 1, x + 1, y),
          pack(zz + 1, x, y + 1), pack(zz + 1, x + 1, y + 1))
  }

  /** Square ring of cells at Chebyshev distance r (r=0 -> the cell itself).
    * Used for kNN candidate expansion (SURVEY.md §2.4 J9). */
  def ring(cell: Long, r: Int): Array[Long] = {
    val zz = z(cell); val cx = tx(cell); val cy = ty(cell)
    val max = (1L << zz) - 1
    if (r == 0) return Array(cell)
    val out = Array.newBuilder[Long]
    var dx = -r
    while (dx <= r) {
      var dy = -r
      while (dy <= r) {
        if (math.max(math.abs(dx), math.abs(dy)) == r) {
          val x = cx + dx; val y = cy + dy
          if (x >= 0 && x <= max && y >= 0 && y <= max) out += pack(zz, x, y)
        }
        dy += 1
      }
      dx += 1
    }
    out.result()
  }
}
