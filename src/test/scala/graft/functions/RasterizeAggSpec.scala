package graft.functions

import graft.SparkSuite
import graft.tables.SyntheticWorld
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The TypedImperativeAggregate bitmap form of the painted-cell union must
  * equal the relational explode+distinct form (already spec'd equal to the
  * sequential painter) and be partitioning-invariant. */
class RasterizeAggSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  test("RasterizeBitSetAgg == explode+distinct over the test world's roads") {
    val w = SyntheticWorld.testWorld
    val (bw, bs, be, bn) = w.bbox
    val ext = GeoUdfs.Extent.ofBbox(bw, bs, be, bn, w.z)
    val nodes = SyntheticWorld.osmNodes(spark, w)
    val ways = SyntheticWorld.osmWays(spark, w)
    val packed = graft.pipeline.Pipelines.waysPacked(ways, nodes,
      graft.pipeline.Pipelines.roadFilter)
      .withColumn("cells", GeoUdfs.rasterizePolyline(ext, 2)($"lats", $"lngs"))

    val relational = packed.select(explode($"cells").as("cell_id"))
      .distinct().as[Long].collect().toSet

    val viaAgg = packed.select(RasterizeAgg.paintedCells(ext)($"cells").as("painted"))
      .select(explode($"painted").as("cell_id")).as[Long].collect()
    assert(viaAgg.length == viaAgg.toSet.size, "agg output already distinct")
    assert(viaAgg.toSet == relational)

    // partial/merge path: many partitions -> same result
    val viaAggParts = packed.repartition(13)
      .select(RasterizeAgg.paintedCells(ext)($"cells").as("painted"))
      .select(explode($"painted").as("cell_id")).as[Long].collect().toSet
    assert(viaAggParts == relational)

    // out-of-extent cells are clipped, not corrupted
    val stray = Seq(Seq(graft.core.CellId.pack(w.z, w.tx0 - 5, w.ty0 - 5),
      graft.core.CellId.pack(w.z, w.tx0 + 1, w.ty0 + 1))).toDF("cells")
    val got = stray.select(RasterizeAgg.paintedCells(ext)($"cells").as("p"))
      .select(explode($"p")).as[Long].collect().toSeq
    assert(got == Seq(graft.core.CellId.pack(w.z, w.tx0 + 1, w.ty0 + 1)))
  }
}
