package graft.functions

import graft.core.ImageCodec
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/**
 * Mosaic assembly as a TypedImperativeAggregate (SURVEY.md §2.6 I2, §2.9):
 * each input row is one tile (dx, dy tile offsets + encoded bytes +
 * mosaic dims); the buffer is the decoded BGR canvas, tiles blit into
 * place as they arrive. Placement is position-derived, so the result is
 * identical for any arrival order / partitioning (reference row-major
 * paste loop, lib/layers.py:187-201).
 *
 * Vs `collect_list` + stitch UDF: tiles decode and blit incrementally —
 * peak memory is one canvas per open group instead of every encoded tile
 * list materialized, and partial mosaics merge by opaque-pixel overlay.
 *
 * Memory budget at scale (learned from the local-cluster study, where
 * default settings OOM'd an 8 GB executor):
 *  1. co-partition input by the group key BEFORE the groupBy (the
 *     pipelines do) — otherwise map-side partial aggregation allocates a
 *     full canvas per group per map task and shuffles partial canvases
 *     that are larger than the raw tiles they aggregate;
 *  2. canvases are untracked JVM objects, so ObjectHashAggregate keeps up
 *     to `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
 *     (default 128) of them open per task — size that knob so
 *     threshold x canvasBytes x coresPerExecutor fits the executor heap
 *     (Bench sets 16 -> ~30 MB/task at 432 px crops).
 *
 * Input: struct<dx INT, dy INT, wtiles INT, htiles INT, bytes BINARY>.
 * Output: struct<h INT, w INT, bgr BINARY> (raw mosaic; crop/encode are
 * downstream scalar ops).
 */
case class StitchAggExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[StitchBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("h", IntegerType, nullable = false),
    StructField("w", IntegerType, nullable = false),
    StructField("bgr", BinaryType, nullable = false)))
  override def prettyName: String = "stitch_agg"

  override def createAggregationBuffer(): StitchBuffer = new StitchBuffer

  override def update(buffer: StitchBuffer, input: InternalRow): StitchBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      val dx = row.getInt(0); val dy = row.getInt(1)
      val wtiles = row.getInt(2); val htiles = row.getInt(3)
      buffer.ensure(htiles * 256, wtiles * 256)
      if (!row.isNullAt(4)) {
        val tile = ImageCodec.decode(row.getBinary(4))
        ImageCodec.blit(ImageCodec.Raw(buffer.h, buffer.w, buffer.bgr), tile, dx * 256, dy * 256)
      }
    }
    buffer
  }

  override def merge(b1: StitchBuffer, b2: StitchBuffer): StitchBuffer = {
    if (b2.bgr == null) return b1
    if (b1.bgr == null) return b2
    // partials of one group must agree on mosaic dims — inconsistent
    // wtiles/htiles rows in a group would otherwise truncate or AIOOBE
    require(b1.h == b2.h && b1.w == b2.w && b1.bgr.length == b2.bgr.length,
      s"stitch merge shape mismatch: ${b1.h}x${b1.w} vs ${b2.h}x${b2.w}")
    // overlay: b2's written regions are non-zero only where tiles landed;
    // tiles are disjoint per mosaic, so byte-wise OR merges partials
    var i = 0
    while (i < b1.bgr.length) {
      b1.bgr(i) = (b1.bgr(i) | b2.bgr(i)).toByte
      i += 1
    }
    b1
  }

  override def eval(buffer: StitchBuffer): Any = {
    val bgr = if (buffer.bgr == null) Array.emptyByteArray else buffer.bgr
    InternalRow(buffer.h, buffer.w, bgr)
  }

  override def serialize(buffer: StitchBuffer): Array[Byte] = {
    val bgr = if (buffer.bgr == null) Array.emptyByteArray else buffer.bgr
    val out = java.nio.ByteBuffer.allocate(8 + bgr.length)
    out.putInt(buffer.h).putInt(buffer.w).put(bgr)
    out.array()
  }
  override def deserialize(bytes: Array[Byte]): StitchBuffer = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    val b = new StitchBuffer
    val h = in.getInt; val w = in.getInt
    if (h > 0) { b.ensure(h, w); in.get(b.bgr) }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): StitchAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): StitchAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

final class StitchBuffer {
  var h: Int = 0
  var w: Int = 0
  var bgr: Array[Byte] = null
  def ensure(hh: Int, ww: Int): Unit =
    if (bgr == null) {
      // bounded-buffer guard: callers gate mosaic extents upstream (e.g.
      // roofShapes' pre-stitch size gate bounds covers to <=6 tiles); an
      // unbounded way bbox must fail loudly, not allocate gigabytes
      require(hh > 0 && ww > 0 && hh <= MaxDim && ww <= MaxDim,
        s"stitch canvas ${hh}x$ww exceeds ${MaxDim}x$MaxDim — gate covers before stitching")
      h = hh; w = ww; bgr = new Array[Byte](hh * ww * 3)
    }
  private def MaxDim = 8192
}

object Stitch {
  /** Aggregate tile slots into a raw mosaic struct<h,w,bgr>. */
  def stitchAgg(slot: Column): Column =
    Bridge.toColumn(StitchAggExpr(Bridge.toExpression(slot)).toAggregateExpression())

  /** Center-crop a raw mosaic struct at (rx, ry) and encode jpeg. */
  val cropEncode = org.apache.spark.sql.functions.udf {
    (h: Int, w: Int, bgr: Array[Byte], rx: Int, ry: Int, ch: Int, cw: Int) =>
      val cropped = ImageCodec.centerCrop(ImageCodec.Raw(h, w, bgr), rx, ry, ch, cw)
      ImageCodec.encode(cropped, "jpeg")
  }

  /** Crop a raw mosaic to an explicit box [ymin,ymax)x[xmin,xmax) and
    * encode jpeg (roofshape way mosaics, reference lib/layers.py:212-243). */
  val cropBoxEncode = org.apache.spark.sql.functions.udf {
    (h: Int, w: Int, bgr: Array[Byte], ymin: Int, ymax: Int, xmin: Int, xmax: Int) =>
      val cropped = ImageCodec.crop(ImageCodec.Raw(h, w, bgr), ymin, ymax, xmin, xmax)
      ImageCodec.encode(cropped, "jpeg")
  }

  /** Halve a raw mosaic (exact 2×2 box average, floor) and encode — the
    * overview-tile downsample of [[graft.pipeline.ImagePyramid]]. */
  val halveEncode = org.apache.spark.sql.functions.udf {
    (h: Int, w: Int, bgr: Array[Byte], fmt: String) =>
      ImageCodec.encode(
        ImageCodec.resizeBox(ImageCodec.Raw(h, w, bgr), h / 2, w / 2), fmt)
  }
}
