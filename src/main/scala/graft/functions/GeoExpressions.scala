package graft.functions

import graft.core.Mercator
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/**
 * Custom Catalyst expressions for the hot path (SURVEY.md §2.9). Each
 * generates a direct static call into [[GeoKernel]] so whole-stage codegen
 * keeps the geo math in one tight primitive loop (north_star "batched
 * columnar UDF": no boxing, no Scala-function dispatch, null handling via
 * nullSafeCodeGen).
 *
 * Zoom and provider offsets are plan-time constants (they come from the
 * pipeline definition, reference lib/layers.py:274-281), so they are
 * constructor parameters, not children — Catalyst sees a deterministic
 * binary/unary expression over (lat, lng).
 */
case class CellAtWgsExpr(lat: Expression, lng: Expression,
                         z: Int, offX: Double, offY: Double)
    extends BinaryExpression with Serializable {
  override def left: Expression = lat
  override def right: Expression = lng
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cell_at_wgs"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GeoKernel.cellAtWgs(a.asInstanceOf[Double], b.asInstanceOf[Double], z, offX, offY)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (la, ln) =>
      s"graft.functions.GeoKernel.cellAtWgs($la, $ln, $z, ${dbl(offX)}, ${dbl(offY)})")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(lat = l, lng = r)
  private def dbl(d: Double): String = if (d == 0.0) "0.0" else s"${d}D"
}

case class EdgeOkExpr(lat: Expression, lng: Expression,
                      z: Int, offX: Double, offY: Double, edge: Double)
    extends BinaryExpression with Serializable {
  override def left: Expression = lat
  override def right: Expression = lng
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "edge_ok"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GeoKernel.edgeOk(a.asInstanceOf[Double], b.asInstanceOf[Double], z, offX, offY, edge)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (la, ln) =>
      s"graft.functions.GeoKernel.edgeOk($la, $ln, $z, ${offX}D, ${offY}D, ${edge}D)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(lat = l, lng = r)
}

/** Ray-cast point-in-polygon over packed coordinate arrays. */
case class PointInPolyExpr(lat: Expression, lng: Expression,
                           lats: Expression, lngs: Expression)
    extends QuaternaryExpression with Serializable {
  override def first: Expression = lat
  override def second: Expression = lng
  override def third: Expression = lats
  override def fourth: Expression = lngs
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "point_in_poly"
  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    GeoKernel.pointInPoly(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[ArrayData], d.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"${ev.value} = graft.functions.GeoKernel.pointInPoly($a, $b, $c, $d);")
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
                                                 c: Expression, d: Expression): Expression =
    copy(lat = a, lng = b, lats = c, lngs = d)
}

/** Membership of a level-`zMax` cell in a mixed-zoom [zMin, zMax] cell
  * cover — the FILTER form of CellOps.coverJoin for covers small enough to
  * be a plan constant (a polyfilled exclusion region, a compacted
  * city/country cover). A FOLDABLE cover folds to a hash set once at plan
  * time (O(levels) probes per row, independent of cover size); a per-row
  * cover array falls back to the scan kernel. Cells not at level zMax are
  * rejected — the contract [[graft.plans.CellCoverPushdown]]'s injected
  * sargable cell_id range conjunct relies on. */
case class CellInCoverExpr(cell: Expression, cover: Expression, zMax: Int, zMin: Int)
    extends BinaryExpression with Serializable {
  require(zMax >= zMin && zMin >= 0 && zMax <= 29, s"bad z range [$zMin, $zMax]")
  override def left: Expression = cell
  override def right: Expression = cover
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cell_in_cover"

  /** Plan-time-folded cover set (null when the cover is per-row). Built
    * lazily on each JVM (driver for the optimizer rule, executors for
    * eval) — literal eval is side-effect-free and cheap. */
  @transient lazy val foldedSet: java.util.HashSet[java.lang.Long] =
    if (!cover.foldable) null
    else Option(cover.eval(null)).map { data =>
      val arr = data.asInstanceOf[ArrayData]
      val s = new java.util.HashSet[java.lang.Long]()
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) s.add(arr.getLong(i))
        i += 1
      }
      s
    }.orNull

  override protected def nullSafeEval(c: Any, arr: Any): Any =
    if (foldedSet != null)
      GeoKernel.cellInCoverSet(c.asInstanceOf[Long], foldedSet, zMax, zMin)
    else
      GeoKernel.cellInCover(c.asInstanceOf[Long], arr.asInstanceOf[ArrayData], zMax, zMin)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (foldedSet != null) {
      val setRef = ctx.addReferenceObj("coverSet", foldedSet, "java.util.HashSet")
      nullSafeCodeGen(ctx, ev, (c, _) =>
        s"${ev.value} = graft.functions.GeoKernel.cellInCoverSet($c, $setRef, $zMax, $zMin);")
    } else
      nullSafeCodeGen(ctx, ev, (c, arr) =>
        s"${ev.value} = graft.functions.GeoKernel.cellInCover($c, $arr, $zMax, $zMin);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(cell = l, cover = r)
}

/** Tile center of a packed cell id — struct<lat,lng> (reference
  * lib/layers.py:32-39; negative-example crops center here,
  * make_expand.py:80). */
case class CellCenterExpr(cell: Expression) extends UnaryExpression
    with codegen.CodegenFallback with Serializable {
  override def child: Expression = cell
  override def dataType: DataType =
    StructType(Seq(StructField("lat", DoubleType, nullable = false),
                   StructField("lng", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cell_center_wgs"
  override protected def nullSafeEval(c: Any): Any = {
    val cl = c.asInstanceOf[Long]
    val (lat, lng) = Mercator.wgsAtTile(graft.core.CellId.tx(cl), graft.core.CellId.ty(cl),
      graft.core.CellId.z(cl))
    InternalRow(lat, lng)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(cell = c)
}

/** Column-level API over the custom expressions + composed built-ins. */
object GeoF {
  private def col(e: Expression): Column = Bridge.toColumn(e)
  private def expr(c: Column): Expression = Bridge.toExpression(c)

  /** Packed cell id of the containing tile (P3). */
  def cellAtWgs(lat: Column, lng: Column, z: Int, offX: Double = 0, offY: Double = 0): Column =
    col(CellAtWgsExpr(expr(lat), expr(lng), z, offX, offY))

  /** Edge filter predicate: keep iff not within `edge` px of a border (F1). */
  def edgeOk(lat: Column, lng: Column, z: Int, offX: Double = 0, offY: Double = 0,
             edge: Double = 16): Column =
    col(EdgeOkExpr(expr(lat), expr(lng), z, offX, offY, edge))

  /** Exact point-in-polygon refinement (F6). */
  def pointInPoly(lat: Column, lng: Column, lats: Column, lngs: Column): Column =
    col(PointInPolyExpr(expr(lat), expr(lng), expr(lats), expr(lngs)))

  /** struct<lat,lng> tile center of a cell (P2). */
  def cellCenter(cell: Column): Column = col(CellCenterExpr(expr(cell)))

  /** Point-in-cover membership filter (the coverJoin predicate form). */
  def cellInCover(cell: Column, cover: Column, zMax: Int, zMin: Int): Column =
    col(CellInCoverExpr(expr(cell), expr(cover), zMax, zMin))

  /** Pack/unpack helpers as plain column math (no custom expr needed).
    * Masking uses bitwiseAND (not %, which preserves sign in Spark) so
    * negative tx/ty — a provider offset past the world edge — pack
    * identically to the kernel's `CellId.pack` `& 0x1FFFFFFF`. */
  def packCell(z: Int, tx: Column, ty: Column): Column =
    (lit(z.toLong) * lit(1L << 58)) +
      tx.cast(LongType).bitwiseAND(lit(0x1FFFFFFFL)) * lit(1L << 29) +
      ty.cast(LongType).bitwiseAND(lit(0x1FFFFFFFL))
  def cellZ(cell: Column): Column = shiftrightunsigned(cell, 58).cast(IntegerType)
  def cellTx(cell: Column): Column = shiftrightunsigned(cell, 29).bitwiseAND(lit(0x1FFFFFFFL))
  def cellTy(cell: Column): Column = cell.bitwiseAND(lit(0x1FFFFFFFL))

  /** Fixed-point micro-degree key (P6): floor(x*1e6) as long. */
  def milCol(c: Column): Column = floor(c * lit(1000000.0)).cast(LongType)

  /** Great-circle distance in meters (haversine, mean earth radius) —
    * plain codegen'd column math. The operation ORDER is fixed and
    * mirrored verbatim by the SQL twin; consumers that need
    * engine-portable EXACT compare must floor to whole meters (JVM and
    * other libms differ in final-ulp transcendentals — measured 0/60k
    * floor-to-meter mismatches vs ~1-ulp raw differences on every row). */
  def haversineMeters(lat1: Column, lng1: Column,
                      lat2: Column, lng2: Column): Column = {
    val sLat = sin((lat2 - lat1) * lit(math.Pi) / lit(360.0))
    val sLng = sin((lng2 - lng1) * lit(math.Pi) / lit(360.0))
    val h = sLat * sLat +
      cos(lat1 * lit(math.Pi) / lit(180.0)) * cos(lat2 * lit(math.Pi) / lit(180.0)) *
        sLng * sLng
    lit(2.0) * lit(6371008.8) * asin(sqrt(h))
  }
}
