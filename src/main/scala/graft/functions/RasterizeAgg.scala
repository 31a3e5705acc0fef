package graft.functions

import graft.core.CellId
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import java.util.{BitSet => JBitSet}

/**
 * Painted-canvas union as a TypedImperativeAggregate (SURVEY.md §2.5 A2
 * form (b), §2.9): the buffer is the reference's uint8 canvas
 * (lib/helpers.py:55) as a BitSet over the bounded painter extent.
 *
 * Scale rationale vs the relational `explode -> distinct` form: partial
 * aggregation ORs fixed-size bitmaps map-side, so the shuffle carries one
 * `width*height/8`-byte buffer per task instead of every painted cell —
 * for dense urban extents (millions of painted cells) that is orders of
 * magnitude less exchange traffic, and merge is branch-free word OR. The
 * extent is bounded at plan time (canvas <= ~10^7 cells per bbox job,
 * SURVEY.md §2.5), so the buffer is spill-safe.
 *
 * Input: ARRAY<LONG> of packed cell ids per geometry (the output of the
 * rasterizer UDFs). Output: ARRAY<LONG> of distinct painted cells.
 */
case class RasterizeBitSetAgg(
    child: Expression,
    z: Int, txmin: Long, tymin: Long, canvasW: Int, canvasH: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[JBitSet] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rasterize_bitset_agg"

  override def createAggregationBuffer(): JBitSet = new JBitSet(canvasW * canvasH)

  override def update(buffer: JBitSet, input: org.apache.spark.sql.catalyst.InternalRow): JBitSet = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        val cell = arr.getLong(i)
        val x = (CellId.tx(cell) - txmin).toInt
        val y = (CellId.ty(cell) - tymin).toInt
        if (x >= 0 && x < canvasW && y >= 0 && y < canvasH) buffer.set(y * canvasW + x)
        i += 1
      }
    }
    buffer
  }

  override def merge(b1: JBitSet, b2: JBitSet): JBitSet = { b1.or(b2); b1 }

  override def eval(buffer: JBitSet): Any = {
    val out = new Array[Long](buffer.cardinality())
    var k = 0
    var i = buffer.nextSetBit(0)
    while (i >= 0) {
      out(k) = CellId.pack(z, txmin + i % canvasW, tymin + i / canvasW)
      k += 1
      i = buffer.nextSetBit(i + 1)
    }
    ArrayData.toArrayData(out)
  }

  override def serialize(buffer: JBitSet): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): JBitSet = JBitSet.valueOf(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): RasterizeBitSetAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): RasterizeBitSetAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object RasterizeAgg {
  /** Column API: aggregate ARRAY<LONG> cell columns into the distinct
    * painted-cell array over the given extent. */
  def paintedCells(ext: GeoUdfs.Extent)(cells: Column): Column =
    Bridge.toColumn(RasterizeBitSetAgg(Bridge.toExpression(cells),
      ext.z, ext.txmin, ext.tymin, ext.width, ext.height).toAggregateExpression())
}
