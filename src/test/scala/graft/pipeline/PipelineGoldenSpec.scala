package graft.pipeline

import graft.SparkSuite
import graft.core._
import graft.tables.SyntheticWorld
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Example-ID-level goldens for the buildings and roofshapes pipelines
  * (VERDICT r1 "Next round" #6): a literal sequential re-run of the
  * reference algorithms (make_buildings.py:16-80, make_roofshapes.py:15-52)
  * over collected rows, using only the core kernels — then exact ID-set /
  * ID->label-map equality against the distributed plans. The one pinned
  * divergence is sampling: the reference's sequential accumulate-until-
  * LIMIT / random.shuffle is replaced by deterministic hash-rank, so the
  * oracle applies the same hash-rank, as PipelineSpec does for
  * originalTiles. */
class PipelineGoldenSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  val w = SyntheticWorld.testWorld
  lazy val nodes = SyntheticWorld.osmNodes(spark, w).cache()
  lazy val ways = SyntheticWorld.osmWays(spark, w).cache()
  lazy val images = SyntheticWorld.images(spark, w).cache()
  val (bw, bs, be, bn) = w.bbox
  val cfg = Pipelines.Config(z = w.z, bbox = (bw, bs, be, bn), limit = 60, train = 40, valid = 20)

  /** (way_id, kind, tags, coords-in-node_ids-order) for ways passing `keep`. */
  private def resolvedWays(keep: Map[String, String] => Boolean): Seq[(Long, Seq[(Double, Double)], Map[String, String])] = {
    val verts = SyntheticWorld.wayVertices(w).map(v => v._1 -> (v._2, v._3)).toMap
    ways.as[(Long, String, Map[String, String], Seq[Long])].collect().toSeq
      .filter { case (_, _, tags, _) => keep(tags) }
      .map { case (id, _, tags, ids) => (id, ids.map(verts), tags) }
  }

  private def hashRankTop(cells: Set[Long], seed: Long, n: Int): Set[Long] =
    cells.toSeq.toDF("cell_id")
      .orderBy(xxhash64($"cell_id", lit(seed)), $"cell_id").limit(n)
      .as[Long].collect().toSet

  test("buildings: exact example-ID sets vs the sequential oracle") {
    // exclusion polygon over a grid block (same as PipelineSpec)
    val (xlat0, xlng0) = SyntheticWorld.wgsAtPixel(w.z, w.tx0 + 2, w.ty0 + 2, 0, 0)
    val (xlat1, xlng1) = SyntheticWorld.wgsAtPixel(w.z, w.tx0 + 6, w.ty0 + 6, 255, 255)
    val wkt = s"POLYGON (($xlng0 $xlat0, $xlng1 $xlat0, $xlng1 $xlat1, $xlng0 $xlat1, $xlng0 $xlat0))"

    // ---- sequential oracle (make_buildings.py) ----
    // yes: every tile a building-way node lands on, edge=24, deduped,
    // hash-rank-capped at LIMIT; filename = raw tile basename x{tx}y{ty}
    val bways = resolvedWays(_.contains("building"))
    val posCells = (for {
      (_, pts, _) <- bways
      (lat, lng) <- pts
      (tx, ty, rx, ry) = Mercator.tileAndPixelAtWgs(lat, lng, w.z, 0, 0)
      if !Mercator.isEdgeOutlier(rx, ry, 24)
    } yield CellId.pack(w.z, tx, ty)).toSet
    val expectedYes = hashRankTop(posCells, cfg.seed + 3, cfg.limit)
      .map(c => s"x${CellId.tx(c)}y${CellId.ty(c)}")

    // no: complement of {building outlines width 1} ∪ {exclusion fill},
    // hash-rank sample; filename m_x{tx}y{ty}
    val painter = new Painter(w.z, 0, 0, bw, bs, be, bn)
    for ((_, pts, _) <- bways) painter.addPolylineWgs(pts, width = 1)
    for ((lats, lngs) <- Wkt.latlngsFromWkt(wkt))
      painter.addFillPolyWgs(lats.zip(lngs).map(p => (p._1, p._2)))
    val expectedNo = hashRankTop(painter.freeCells.toSet, cfg.seed + 4, cfg.limit)
      .map(c => s"m_x${CellId.tx(c)}y${CellId.ty(c)}")

    // ---- distributed plan ----
    val out = Pipelines.buildings(spark, nodes, ways, images, cfg, wkt).cache()
    val gotYes = out.where($"label" === "yes").select($"example_id").as[String].collect().toSet
    val gotNo = out.where($"label" === "no").select($"example_id").as[String].collect().toSet
    assert(gotYes == expectedYes, "yes example-id set")
    assert(gotNo == expectedNo, "no example-id set")
  }

  test("roofShapes: exact example-ID -> label map vs the sequential oracle") {
    // ---- sequential oracle (make_roofshapes.py): per tagged way, cover
    // via tilesWay, numpy-slice crop shape, half-open outside() gate ----
    val tagged = resolvedWays(t => t.contains("roof:shape") && t.contains("building"))
    val expected = (for {
      (wayId, pts, tags) <- tagged
      (txmin, txmax, tymin, tymax, xmin, ymin, xmax, ymax) =
        Viewport.tilesWay(pts.map(_._1).toArray, pts.map(_._2).toArray, w.z, 0, 0)
      ch = (math.min(ymax, (tymax - tymin + 1) * 256) - math.max(ymin, 0)).max(0)
      cw = (math.min(xmax, (txmax - txmin + 1) * 256) - math.max(xmin, 0)).max(0)
      if ch >= 128 && ch < 1024 && cw >= 128 && cw < 1024
    } yield s"m$wayId" -> tags("roof:shape")).toMap

    val out = Pipelines.roofShapes(spark, nodes, ways, images, cfg)
    val got = out.select($"example_id", $"label").as[(String, String)].collect().toMap
    assert(got == expected, "example-id -> label map")

    // balance variant: per-class hash-rank cap at the min class size
    val byLabel = expected.groupBy(_._2).map { case (l, m) => l -> m.keys.toSet }
    if (byLabel.nonEmpty) {
      val balanced = Pipelines.roofShapes(spark, nodes, ways, images, cfg, balance = true)
        .select($"example_id", $"label").as[(String, String)].collect()
      // the cap is computed over tagged ways BEFORE the size gate
      // (reference LIMIT applies to the query result list) — so assert
      // per-class counts <= min tagged-class size and subset of unbalanced
      assert(balanced.map(_._1).toSet.subsetOf(expected.keySet))
      val taggedCounts = tagged.groupBy(_._3("roof:shape")).map { case (l, s) => l -> s.size }
      val minTagged = taggedCounts.values.min
      balanced.groupBy(_._2).foreach { case (_, rows) => assert(rows.length <= minTagged) }
    }
  }
}
