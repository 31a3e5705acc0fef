package graft.pipeline

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Geodesic cell area: the tanh-only spherical-zone formula against
 * closed-form sphere facts — whole-planet conservation, parent==children
 * additivity, equator-to-pole monotonicity, and level scaling.
 */
class CellAreaSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  val R2 = 6371000.0 * 6371000.0
  val ZShift = 1L << 58
  val XYShift = 1L << 29

  def allCells(z: Int) = {
    val nt = 1L << z
    (for (tx <- 0L until nt; ty <- 0L until nt)
      yield z * ZShift + tx * XYShift + ty).toDF("cell_id")
  }

  test("full z=3 grid: areas sum to the mercator-covered zone 4*pi*R^2*tanh(pi)") {
    // web-mercator clips at |lat| ~ 85.05 deg: sin(lat_max) = tanh(pi),
    // so the full grid covers 2*pi*R^2*(tanh(pi) - (-tanh(pi)))
    val sum = CellOps.cellArea(allCells(3)).agg(org.apache.spark.sql.functions.sum("area_m2"))
      .head().getLong(0).toDouble
    val zone = 4.0 * math.Pi * R2 * math.tanh(math.Pi)
    assert(math.abs(sum / zone - 1.0) < 1e-9, s"sum $sum vs zone $zone")
  }

  test("parent area == sum of its 4 children (within floor rounding)") {
    val parents = allCells(4)
    val pAreas = CellOps.cellArea(parents).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cAreas = CellOps.cellArea(allCells(5))
      .select(CellOps.parentOf(col("cell_id")).as("p"), col("area_m2"))
      .groupBy(col("p")).agg(org.apache.spark.sql.functions.sum("area_m2").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pAreas.keySet == cAreas.keySet)
    pAreas.foreach { case (cell, a) =>
      assert(math.abs(a - cAreas(cell)) <= 4,
        s"cell $cell parent $a vs children-sum ${cAreas(cell)}")
    }
  }

  test("areas shrink monotonically from equator rows toward the poles") {
    val z = 5
    val nt = 1 << z
    val areas = CellOps.cellArea(
        (0 until nt).map(ty => z.toLong * ZShift + ty.toLong).toDF("cell_id"))
      .collect().map(r => (r.getLong(0) % XYShift) -> r.getLong(1)).toMap
    // northern half: rows 0 .. nt/2-1, area increases toward the equator
    for (ty <- 1 until nt / 2)
      assert(areas(ty.toLong) >= areas(ty.toLong - 1),
        s"row $ty area ${areas(ty.toLong)} < row ${ty - 1} ${areas(ty.toLong - 1)}")
    // mirror rows agree within 1 m^2 (exp-form tanh is not exactly odd)
    for (ty <- 0 until nt / 2)
      assert(math.abs(areas(ty.toLong) - areas((nt - 1 - ty).toLong)) <= 1)
  }

  test("equator cell matches the closed-form spherical zone") {
    // z=2, ty=1: rows span mercator y in [1/4, 1/2) -> sin(lat) from
    // tanh(pi/2) down to 0; area = (2pi/4) * R^2 * (tanh(pi/2) - 0)
    val cell = 2L * ZShift + 0L * XYShift + 1L
    val got = CellOps.cellArea(Seq(cell).toDF("cell_id")).head().getLong(1)
    val want = math.floor(2.0 * math.Pi / 4.0 * R2 * math.tanh(math.Pi / 2.0))
    assert(math.abs(got - want) <= 1, s"got $got want $want")
  }
}
