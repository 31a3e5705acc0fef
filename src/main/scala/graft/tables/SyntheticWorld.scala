package graft.tables

import graft.core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic synthetic world (FIXTURES.md §1): an `images` corpus with
 * the exact BASELINE.json input_hint schema, plus `osm_nodes` / `osm_ways`
 * vector tables shaped like the reference's Overpass responses
 * (lib/loaders.py:10-66). Everything is keyed by splitmix64(seed ^ id) —
 * no RNG state, so generation is distributed, partition-invariant and
 * reproducible at any scale.
 *
 * The world covers the tile grid [tx0, tx0+gridW) x [ty0, ty0+gridH) at
 * zoom `z`; `bbox` returns WGS corners lying on the corner-tile centers so
 * painter extents are exactly the grid (no floating-point fence posts).
 */
final case class World(z: Int, tx0: Long, ty0: Long, gridW: Int, gridH: Int,
                       lamps: Int, roads: Int, buildings: Int, seed: Long = 42L,
                       hotCellSkew: Double = 0.0) {
  /** (W, S, E, N) with corners at the centers of the corner tiles. */
  def bbox: (Double, Double, Double, Double) = {
    val (n, w) = Mercator.wgsAtTile(tx0, ty0, z)
    val (s, e) = Mercator.wgsAtTile(tx0 + gridW - 1, ty0 + gridH - 1, z)
    (w, s, e, n)
  }
  def tileCount: Long = gridW.toLong * gridH
}

object SyntheticWorld {
  /** Small deterministic world for unit tests: 24x24 tiles, z18 slice of
    * the Minsk grid (reference make_original.py:22 bbox neighborhood). */
  val testWorld: World = World(z = 18, tx0 = 151020L, ty0 = 84370L,
    gridW = 24, gridH = 24, lamps = 220, roads = 12, buildings = 30)

  // ---------- WGS placement ----------

  /** Invert (tile, in-tile pixel) -> WGS, zero offsets. */
  def wgsAtPixel(z: Int, tx: Long, ty: Long, rx: Double, ry: Double): (Double, Double) = {
    val scale = (1L << z).toDouble
    val wx = (tx * 256 + rx) / scale
    val wy = (ty * 256 + ry) / scale
    val lng = (wx / 256.0 - 0.5) * 360.0
    val y = wy / 256.0
    val lat = 180.0 / math.Pi * (2 * math.atan(math.exp((1 - 2 * y) * math.Pi)) - math.Pi / 2)
    (lat, lng)
  }

  /** Deterministic lamp position k: hot-cell skew sends a fraction of lamps
    * into 3 fixed cells (salting exercise, FIXTURES.md §1.1); edge-case
    * lamps pin the edge filter on both sides of the 16px boundary. */
  def lampPos(w: World, k: Long): (Double, Double) = {
    val h1 = Splitmix.mix(w.seed ^ (k * 2654435761L + 1))
    val h2 = Splitmix.mix(w.seed ^ (k * 2654435761L + 2))
    if (k < 24) {
      // edge-filter pins: rx in {15.5, 16.5, 239.5, 240.5} x ry center/edge
      val rxs = Array(15.5, 16.5, 239.5, 240.5, 128.0, 23.5, 24.5, 231.5)
      val rys = Array(128.0, 15.5, 240.5)
      val tx = w.tx0 + 2 + (k % w.gridW.toLong.max(1)) % (w.gridW - 4)
      val ty = w.ty0 + 2 + (k / 3) % (w.gridH - 4)
      wgsAtPixel(w.z, tx, ty, rxs((k % 8).toInt), rys((k % 3).toInt))
    } else if (w.hotCellSkew > 0 && Splitmix.uniform(h1) < w.hotCellSkew) {
      val hot = (math.abs(h2) % 3).toInt
      val tx = w.tx0 + w.gridW / 4 + hot * 3
      val ty = w.ty0 + w.gridH / 3
      wgsAtPixel(w.z, tx, ty, 30 + Splitmix.uniform(h1 + 7) * 196, 30 + Splitmix.uniform(h2 + 7) * 196)
    } else {
      val tx = w.tx0 + (math.abs(h1) % w.gridW).toInt
      val ty = w.ty0 + (math.abs(h2) % w.gridH).toInt
      wgsAtPixel(w.z, tx, ty, Splitmix.uniform(h1 ^ h2) * 256, Splitmix.uniform(h1 + h2) * 256)
    }
  }

  // ---------- vector tables ----------

  /** osm_nodes: lamp nodes (highway=street_lamp) + way-vertex nodes.
    * Node-id space: lamps [0, lamps), way vertices [10^6, ...). */
  def osmNodes(spark: SparkSession, w: World): DataFrame = {
    import spark.implicits._
    val lamps = (0L until w.lamps).map { k =>
      val (lat, lng) = lampPos(w, k)
      (k, lat, lng, Map("highway" -> "street_lamp"))
    }
    val wayNodes = wayVertices(w).map { case (nid, lat, lng) => (nid, lat, lng, Map.empty[String, String]) }
    (lamps ++ wayNodes).toDF("node_id", "lat", "lng", "tags")
  }

  /** Deterministic way vertices: roads are L-to-R jittered polylines,
    * buildings are small closed rectangles (ring repeats first vertex id in
    * `node_ids`, matching Overpass closed-way form). */
  def wayVertices(w: World): Seq[(Long, Double, Double)] = {
    val out = Seq.newBuilder[(Long, Double, Double)]
    var nid = 1000000L
    for (r <- 0 until w.roads) {
      val k = 5 + (math.abs(Splitmix.mix(w.seed ^ (r + 501))) % 6).toInt
      val ty = w.ty0 + 1 + (math.abs(Splitmix.mix(w.seed ^ (r + 601))) % (w.gridH - 2))
      for (i <- 0 until k) {
        val tx = w.tx0 + 1 + i.toLong * (w.gridW - 2) / k
        val jy = (Splitmix.uniform(Splitmix.mix(w.seed ^ (r * 100 + i))) - 0.5) * 2.5
        val (lat, lng) = wgsAtPixel(w.z, tx, (ty + jy.round).max(w.ty0).min(w.ty0 + w.gridH - 1),
          Splitmix.uniform(w.seed + r * 31 + i) * 256, Splitmix.uniform(w.seed + r * 37 + i) * 256)
        out += ((nid, lat, lng)); nid += 1
      }
    }
    for (b <- 0 until w.buildings) {
      val h1 = Splitmix.mix(w.seed ^ (b + 9001))
      val tx = w.tx0 + 1 + (math.abs(h1) % (w.gridW - 3))
      val ty = w.ty0 + 1 + (math.abs(Splitmix.mix(h1)) % (w.gridH - 3))
      val sx = 0.4 + Splitmix.uniform(h1 + 1) * 1.6 // width in tiles
      val sy = 0.4 + Splitmix.uniform(h1 + 2) * 1.6
      val corners = Seq((0.0, 0.0), (sx, 0.0), (sx, sy), (0.0, sy))
      for ((dx, dy) <- corners) {
        val (lat, lng) = wgsAtPixel(w.z, tx, ty, 40 + dx * 256, 40 + dy * 256)
        out += ((nid, lat, lng)); nid += 1
      }
    }
    out.result()
  }

  val RoadClasses = Array("trunk", "trunk_link", "primary", "primary_link",
    "secondary", "tertiary", "residential", "unclassified") // lib/loaders.py:37-46
  val RoofShapes = Array("flat", "hipped", "gabled") // make_roofshapes.py:20

  /** osm_ways: roads (8 highway classes round-robin) + buildings (closed
    * rings; every 3rd tagged roof:shape; every 7th emitted as
    * kind=relation_outer to exercise S6's ways ∪ relations). */
  def osmWays(spark: SparkSession, w: World): DataFrame = {
    import spark.implicits._
    var nid = 1000000L
    val roads = (0 until w.roads).map { r =>
      val k = 5 + (math.abs(Splitmix.mix(w.seed ^ (r + 501))) % 6).toInt
      val ids = (0 until k).map(i => nid + i)
      nid += k
      (2000L + r, "way", Map("highway" -> RoadClasses(r % 8)), ids)
    }
    val buildings = (0 until w.buildings).map { b =>
      val ids = (0 until 4).map(i => nid + i)
      nid += 4
      val tags = Map("building" -> "yes") ++
        (if (b % 3 == 0) Map("roof:shape" -> RoofShapes((b / 3) % 3)) else Map.empty)
      val kind = if (b % 7 == 0) "relation_outer" else "way"
      (3000L + b, kind, tags, ids :+ ids.head) // closed ring
    }
    (roads ++ buildings).toDF("way_id", "kind", "tags", "node_ids")
  }

  // ---------- images corpus (input_hint schema) ----------

  /** Deterministic 256x256 BGR tile pattern seeded by the cell id: flat
    * base color + two solid rectangles. Compresses well => JPEG re-encode
    * PSNR headroom. */
  /** Integer triangle wave — smooth deterministic gradients with no
    * transcendental functions (cross-JVM exact). */
  @inline private def tri(t: Long, period: Int, amp: Int): Int = {
    val m = math.floorMod(t, 2L * period).toInt
    (math.abs(m - period) * amp) / period
  }

  /** Base color varies smoothly across neighboring tiles (satellite-like:
    * no hard edges at tile borders, so the lossy re-encode leg stays above
    * the 40 dB PSNR bar). */
  def baseColor(cell: Long): Int = {
    val tx = CellId.tx(cell); val ty = CellId.ty(cell)
    val b = 70 + tri(tx * 7 + ty * 3, 60, 90)
    val g = 80 + tri(tx * 5 + ty * 11, 75, 90)
    val r = 60 + tri(tx * 3 + ty * 13, 90, 90)
    (r << 16) | (g << 8) | b
  }

  def tileRaw(cell: Long, seed: Long): ImageCodec.Raw = {
    val h1 = Splitmix.mix(cell ^ seed)
    val base = baseColor(cell)
    val bgr = new Array[Byte](256 * 256 * 3)
    val b0 = (base & 0xFF).toByte
    val g0 = ((base >> 8) & 0xFF).toByte
    val r0 = ((base >> 16) & 0xFF).toByte
    var i = 0
    while (i < bgr.length) { bgr(i) = b0; bgr(i + 1) = g0; bgr(i + 2) = r0; i += 3 }
    val raw = ImageCodec.Raw(256, 256, bgr)
    // low-contrast texture (satellite-like smoothness keeps the double-JPEG
    // leg above the PSNR bar): two rectangles at base +- small luma delta
    var rct = 0
    while (rct < 2) {
      val h = Splitmix.mix(h1 + rct)
      val x0 = (math.abs(h) % 160).toInt + 16
      val y0 = (math.abs(Splitmix.mix(h)) % 160).toInt + 16
      val cw = 32 + (math.abs(h) % 48).toInt
      val d = (if ((h & 1) == 0) 18 else -18) + (rct * 7)
      def clamp(v: Int): Byte = math.max(0, math.min(255, v)).toByte
      var y = y0
      while (y < math.min(y0 + cw, 256)) {
        var x = x0
        while (x < math.min(x0 + cw, 256)) {
          val j = (y * 256 + x) * 3
          bgr(j) = clamp((b0 & 0xFF) + d)
          bgr(j + 1) = clamp((g0 & 0xFF) + d)
          bgr(j + 2) = clamp((r0 & 0xFF) + d)
          x += 1
        }
        y += 1
      }
      rct += 1
    }
    raw
  }

  def caption(z: Int, tx: Long, ty: Long, base: Int): String =
    f"tile z$z x$tx y$ty seed42 color#$base%06x"

  /** Distributed images generation: one row per grid tile, executed on
    * executors (spark.range -> map), schema exactly input_hint +
    * cell_id partition/index column. ~3% of tiles are png (lossless path). */
  def images(spark: SparkSession, w: World): DataFrame = {
    import spark.implicits._
    val z = w.z; val tx0 = w.tx0; val ty0 = w.ty0; val gw = w.gridW; val seed = w.seed
    spark.range(0, w.tileCount, 1, spark.sparkContext.defaultParallelism)
      .map { idx =>
        val tx = tx0 + idx % gw
        val ty = ty0 + idx / gw
        val cell = CellId.pack(z, tx, ty)
        val raw = tileRaw(cell, seed)
        val fmt = if (Splitmix.mix(cell ^ (seed + 99)) % 32 == 0) "png" else "jpeg"
        val bytes = ImageCodec.encode(raw, fmt)
        val base = baseColor(cell)
        (s"z$z/x${tx}y$ty", bytes, 256, 256, fmt, caption(z, tx, ty, base),
          ImageCodec.phash(raw), cell)
      }
      .toDF("image_id", "bytes", "w", "h", "fmt", "caption", "phash", "cell_id")
  }

  /** Write the world as parquet tables under `dir` (images bucket-sorted by
    * cell_id for join locality). File count is sized from the corpus, NOT
    * the writing session's parallelism: parquet row groups are the minimum
    * split granularity, so a corpus written as few fat files caps every
    * later decode-dense scan at that task count regardless of
    * maxPartitionBytes (measured: 8-core-written world -> 44-task scans at
    * 32 cores, 23% utilization). ~512 tiles per file keeps scans splittable
    * for any cluster size in this sandbox. */
  def write(spark: SparkSession, w: World, dir: String): Unit = {
    val nFiles = math.max(spark.sparkContext.defaultParallelism,
      (w.tileCount / 512).toInt).min(2000)
    images(spark, w).repartition(nFiles)
      .write.mode("overwrite").parquet(s"$dir/images.parquet")
    osmNodes(spark, w).write.mode("overwrite").parquet(s"$dir/osm_nodes.parquet")
    osmWays(spark, w).write.mode("overwrite").parquet(s"$dir/osm_ways.parquet")
  }
}
