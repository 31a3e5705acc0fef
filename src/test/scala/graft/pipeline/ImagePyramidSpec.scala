package graft.pipeline

import graft.SparkSuite
import graft.core.{CellId, ImageCodec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pixel pyramid contract: parents are the exact 2×2-box-halved mosaics
  * of their children (quadrant placement from the tile coordinate parity,
  * black where a child is missing), levels chain geometrically, and the
  * output is partitioning-invariant byte-for-byte. */
class ImagePyramidSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  private def solid(b: Int, g: Int, r: Int): Array[Byte] = {
    val bgr = new Array[Byte](256 * 256 * 3)
    var i = 0
    while (i < bgr.length) {
      bgr(i) = b.toByte; bgr(i + 1) = g.toByte; bgr(i + 2) = r.toByte; i += 3
    }
    ImageCodec.encode(ImageCodec.Raw(256, 256, bgr), "png")
  }

  // 4×4 solid-color leaves at z18, even-aligned so z17 has 4 full quads
  // and z16 one full quad
  private val base = (0, 0)
  lazy val leaves: DataFrame = (for {
    dx <- 0 until 4; dy <- 0 until 4
  } yield (CellId.pack(18, 100 + dx, 200 + dy),
      solid(10 * dx + 20, 10 * dy + 20, 40))).toDF("cell_id", "bytes").cache()

  test("full-quad parent pixels == exact floor(mean of the 4 solid children)") {
    val pyr = ImagePyramid.build(leaves, zLeaf = 18, zMin = 16)
    val z17 = pyr.where(col("zl") === 17).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("bytes")).toMap
    assert(z17.keySet == Set(
      CellId.pack(17, 50, 100), CellId.pack(17, 51, 100),
      CellId.pack(17, 50, 101), CellId.pack(17, 51, 101)))
    // parent (50,100) holds children dx,dy in {0,1}: a solid 2x2 mosaic of
    // 4 solid colors halves to 4 solid quadrants — every pixel exact
    val p = ImageCodec.decode(z17(CellId.pack(17, 50, 100)))
    assert(p.h == 256 && p.w == 256)
    def px(x: Int, y: Int): (Int, Int, Int) = {
      val i = (y * 256 + x) * 3
      (p.bgr(i) & 0xFF, p.bgr(i + 1) & 0xFF, p.bgr(i + 2) & 0xFF)
    }
    // quadrant (qx, qy) comes from child (100+qx, 200+qy) = solid
    // (20+10qx, 20+10qy, 40); box-halving a solid block is the identity
    for (qx <- 0 until 2; qy <- 0 until 2; pt <- Seq((5, 5), (120, 99))) {
      val (x, y) = (qx * 128 + pt._1, qy * 128 + pt._2)
      assert(px(x, y) == (20 + 10 * qx, 20 + 10 * qy, 40),
        s"quadrant ($qx,$qy) pixel ($x,$y): ${px(x, y)}")
    }
    // z16: one parent over all 16 leaves
    assert(pyr.where(col("zl") === 16).count() == 1L)
  }

  test("missing children stay black; present quadrant keeps its pixels") {
    val lone = Seq((CellId.pack(18, 301, 400), solid(100, 150, 200)))
      .toDF("cell_id", "bytes")
    val out = ImagePyramid.build(lone, zLeaf = 18, zMin = 17).collect()
    assert(out.length == 1 && out(0).getLong(0) == CellId.pack(17, 150, 200))
    val p = ImageCodec.decode(out(0).getAs[Array[Byte]]("bytes"))
    val i1 = (10 * 256 + 200) * 3 // quadrant (1,0): x>=128, y<128
    assert((p.bgr(i1) & 0xFF, p.bgr(i1 + 1) & 0xFF, p.bgr(i1 + 2) & 0xFF)
      == (100, 150, 200))
    val i0 = (10 * 256 + 20) * 3 // quadrant (0,0): missing -> black
    assert((p.bgr(i0) & 0xFF, p.bgr(i0 + 1) & 0xFF, p.bgr(i0 + 2) & 0xFF) == (0, 0, 0))
  }

  test("byte-identical under repartitioning") {
    val a = ImagePyramid.build(leaves, 18, 16).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]]("bytes").toSeq)).toMap
    val b = ImagePyramid.build(leaves.repartition(7), 18, 16).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]]("bytes").toSeq)).toMap
    assert(a == b)
  }
}
