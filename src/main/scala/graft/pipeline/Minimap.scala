package graft.pipeline

import graft.core.{CellId, ImageCodec}
import graft.functions.ImageUdfs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Coverage minimap (S18, reference minimap.py:10-36): one canvas pixel per
 * tile of the extent, colored with the tile's mean BGR; tiles outside the
 * canvas are skipped via the half-open outside() gate. The mean-color
 * aggregation is distributed (the same per-tile reduce as q_a3_minimap);
 * only the finished (cell, b, g, r) rows — one short row per tile, bounded
 * by the extent — are collected to assemble the diagnostic image, exactly
 * like the reference's driver-side canvas loop.
 */
object Minimap {
  /** Returns (h, w, png bytes). Canvas dims reproduce the reference's
    * +2 fence (minimap.py:20-21). */
  def render(images: DataFrame, cfg: Pipelines.Config): (Int, Int, Array[Byte]) = {
    val ext = cfg.ext
    val width = ext.width + 1  // txmax-txmin+2
    val height = ext.height + 1
    // driver-side canvas: one short row AND 3 canvas bytes per extent tile —
    // refuse extents that would make this diagnostic a driver OOM (a 4096²
    // canvas is ~50MB; a metro z19 extent would be tens of GB)
    require(width.toLong * height <= (1L << 24),
      s"minimap extent ${width}x$height exceeds the driver-side canvas guard (2^24 tiles)")
    // padTiles=1: the reference's +2 fence admits tiles at txmax+1/tymax+1
    // (outside() gate vs the canvas), which padTiles=0 would prune away
    val rows = Pipelines.imagesInBbox(images, cfg, padTiles = 1)
      .select(col("cell_id"), ImageUdfs.meanColorUdf(col("bytes")).as("bgr"))
      .select(col("cell_id"), col("bgr")(0).as("b"), col("bgr")(1).as("g"), col("bgr")(2).as("r"))
      .collect()
    val canvas = ImageCodec.Raw(height, width, new Array[Byte](height * width * 3))
    rows.foreach { row =>
      val cell = row.getLong(0)
      val x = (CellId.tx(cell) - ext.txmin).toInt
      val y = (CellId.ty(cell) - ext.tymin).toInt
      // outside((x,y),(0,0),(width,height)) gate, half-open
      if (x >= 0 && x < width && y >= 0 && y < height) {
        val i = (y * width + x) * 3
        // numpy uint8 assignment truncates toward zero
        canvas.bgr(i) = row.getDouble(1).toInt.toByte
        canvas.bgr(i + 1) = row.getDouble(2).toInt.toByte
        canvas.bgr(i + 2) = row.getDouble(3).toInt.toByte
      }
    }
    (height, width, ImageCodec.encode(canvas, "png"))
  }
}
