package graft.pipeline

import graft.SparkSuite
import graft.core._
import graft.tables.SyntheticWorld
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end pipeline tests on the deterministic synthetic world
  * (SURVEY.md §5.4): the distributed plans must reproduce a literal
  * sequential oracle built from the core kernels, and be invariant to
  * partitioning. */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  val w = SyntheticWorld.testWorld
  lazy val nodes = SyntheticWorld.osmNodes(spark, w).cache()
  lazy val ways = SyntheticWorld.osmWays(spark, w).cache()
  lazy val images = SyntheticWorld.images(spark, w).cache()
  val (bw, bs, be, bn) = w.bbox
  val cfg = Pipelines.Config(z = w.z, bbox = (bw, bs, be, bn), limit = 60, train = 40, valid = 20)

  test("originalTiles matches the sequential oracle (exact join rows + tile assignments)") {
    val out = Pipelines.originalTiles(spark, nodes, ways, images, cfg).cache()

    // ---- sequential oracle (literal reference algorithm + hash-rank) ----
    val lampRows = nodes
      .where($"tags".getItem("highway") === "street_lamp" &&
        $"lat".between(bs, bn) && $"lng".between(bw, be))
      .select($"node_id", $"lat", $"lng",
        xxhash64($"node_id", lit(cfg.seed)).as("rk"))
      .as[(Long, Double, Double, Long)].collect()
      .sortBy(r => (r._4, r._1)).take(cfg.limit)

    val expectedPosCells = lampRows.flatMap { case (_, lat, lng, _) =>
      val (tx, ty, rx, ry) = Mercator.tileAndPixelAtWgs(lat, lng, w.z, 0, 0)
      if (!Mercator.isEdgeOutlier(rx, ry, 16)) Some(CellId.pack(w.z, tx, ty)) else None
    }.toSet

    val gotPos = out.where($"label" === "lamp").select($"cell_id").as[Long].collect().toSet
    assert(gotPos == expectedPosCells, "positive tile assignments")

    // painter oracle for the negative complement
    val painter = new Painter(w.z, 0, 0, bw, bs, be, bn)
    painter.addDotsWgs(lampRows.map(r => (r._2, r._3)))
    val verts = SyntheticWorld.wayVertices(w).map(v => v._1 -> (v._2, v._3)).toMap
    val waysLocal = ways.as[(Long, String, Map[String, String], Seq[Long])].collect()
    for ((_, _, tags, ids) <- waysLocal
         if tags.get("highway").exists(SyntheticWorld.RoadClasses.contains))
      painter.addPolylineWgs(ids.map(verts), width = 2)
    val free = painter.freeCells.toSet

    val gotNeg = out.where($"label" === "nolamp").select($"cell_id").as[Long].collect()
    assert(gotNeg.length == cfg.limit, "negative count == LIMIT")
    assert(gotNeg.forall(free.contains), "negatives drawn from the unpainted complement")
    // expected negatives: hash-rank top-K of the free set (same rank fn)
    val expectedNeg = free.toSeq.toDF("cell_id")
      .orderBy(xxhash64($"cell_id", lit(cfg.seed + 1)), $"cell_id").limit(cfg.limit)
      .as[Long].collect().toSet
    assert(gotNeg.toSet == expectedNeg, "negative sample is the deterministic hash-rank top-K")

    // caption equality per row (north_star)
    val mismatch = out.where($"cell_id".isNotNull)
      .join(images.select($"cell_id", $"caption".as("expected")), "cell_id")
      .where($"caption" =!= $"expected").count()
    assert(mismatch == 0, "caption equality")

    // example-id name parity m_x{tx}y{ty}
    val idRow = out.select($"example_id", $"cell_id").head()
    assert(idRow.getString(0) == s"m_x${CellId.tx(idRow.getLong(1))}y${CellId.ty(idRow.getLong(1))}")
  }

  test("originalTiles output is invariant to input partitioning (N vs 4N evidence)") {
    val a = Pipelines.originalTiles(spark, nodes.repartition(1), ways.repartition(1),
      images.repartition(2), cfg)
      .select($"example_id", $"label", $"cell_id").orderBy($"example_id", $"label")
      .collect().toSeq
    val b = Pipelines.originalTiles(spark, nodes.repartition(7), ways.repartition(5),
      images.repartition(13), cfg)
      .select($"example_id", $"label", $"cell_id").orderBy($"example_id", $"label")
      .collect().toSeq
    assert(a == b)
  }

  test("expandedCrops: split sizes, provenance, crop dimensions") {
    val out = Pipelines.expandedCrops(spark, nodes, ways, images, cfg).cache()
    val counts = out.groupBy($"label", $"split").count()
      .as[(String, String, Long)].collect().toMap2
    // train positives = lamps ranked <= train (all crops emitted)
    assert(counts(("lamp", "train")) == math.min(cfg.train,
      nodes.where($"tags".getItem("highway") === "street_lamp" &&
        $"lat".between(bs, bn) && $"lng".between(bw, be)).count().toInt))
    assert(counts(("nolamp", "train")) == cfg.train)
    assert(counts(("nolamp", "valid")) == cfg.valid)
    assert(counts.getOrElse(("lamp", "valid"), 0L) <= cfg.valid)

    // crop geometry: 256x256 jpeg decodes to the right shape
    val crop = out.where($"label" === "lamp" && $"split" === "train")
      .select($"bytes").head().getAs[Array[Byte]](0)
    val raw = ImageCodec.decode(crop)
    assert(raw.h == 256 && raw.w == 256)

    // a raw valid tile must be byte-identical to the corpus image (and its
    // caption equal) — tile passthrough path
    val validRow = out.where($"label" === "lamp" && $"split" === "valid")
      .join(images.select($"cell_id", $"bytes".as("src"), $"caption".as("expCap")), "cell_id")
      .select($"bytes", $"src", $"caption", $"expCap").head()
    assert(java.util.Arrays.equals(validRow.getAs[Array[Byte]](0), validRow.getAs[Array[Byte]](1)))
    assert(validRow.getString(2) == validRow.getString(3))
  }

  test("expandedCrops: crop pixels match a sequentially stitched oracle (PSNR >= 40)") {
    // pick one train lamp, assemble its crop sequentially from world tiles
    val lamp = Pipelines.lampScan(nodes, cfg)
      .orderBy(xxhash64($"node_id", lit(cfg.seed)), $"node_id")
      .select($"lat", $"lng").as[(Double, Double)].head()
    val h = 256
    val (txmin, txmax, tymin, tymax, rx, ry) = Viewport.tilesNearWgs(lamp._1, lamp._2, w.z, h, h, 0, 0)
    val canvas = ImageCodec.Raw(((tymax - tymin + 1) * 256).toInt, ((txmax - txmin + 1) * 256).toInt,
      new Array[Byte]((((tymax - tymin + 1) * 256) * ((txmax - txmin + 1) * 256) * 3).toInt))
    for (ty <- tymin to tymax; tx <- txmin to txmax) {
      val cell = CellId.pack(w.z, tx, ty)
      if (tx >= w.tx0 && tx < w.tx0 + w.gridW && ty >= w.ty0 && ty < w.ty0 + w.gridH) {
        val fmt = if (Splitmix.mix(cell ^ (w.seed + 99)) % 32 == 0) "png" else "jpeg"
        val bytes = ImageCodec.encode(SyntheticWorld.tileRaw(cell, w.seed), fmt)
        ImageCodec.blit(canvas, ImageCodec.decode(bytes), ((tx - txmin) * 256).toInt, ((ty - tymin) * 256).toInt)
      }
    }
    val expected = ImageCodec.centerCrop(canvas, rx.toInt, ry.toInt, h, h)

    val key = f"m_lat${Mercator.mil(lamp._1)}lng${Mercator.mil(lamp._2)}"
    val got = Pipelines.expandedCrops(spark, nodes, ways, images, cfg)
      .where($"example_id" === key).select($"bytes").head().getAs[Array[Byte]](0)
    val gotRaw = ImageCodec.decode(got)
    assert(gotRaw.h == expected.h && gotRaw.w == expected.w)
    assert(ImageCodec.psnr(expected, gotRaw) >= 40.0, "crop pixel fidelity after jpeg leg")
  }

  test("buildings: positives deduped/edge-filtered; negatives avoid outlines + exclusions") {
    // synthesize one exclusion polygon covering a block of the grid
    val (xlat0, xlng0) = SyntheticWorld.wgsAtPixel(w.z, w.tx0 + 2, w.ty0 + 2, 0, 0)
    val (xlat1, xlng1) = SyntheticWorld.wgsAtPixel(w.z, w.tx0 + 6, w.ty0 + 6, 255, 255)
    val wkt = s"POLYGON (($xlng0 $xlat0, $xlng1 $xlat0, $xlng1 $xlat1, $xlng0 $xlat1, $xlng0 $xlat0))"
    val out = Pipelines.buildings(spark, nodes, ways, images, cfg, wkt).cache()

    val pos = out.where($"label" === "yes").select($"cell_id").as[Long].collect()
    assert(pos.length == pos.toSet.size, "positives deduped by tile")
    assert(pos.nonEmpty)

    val neg = out.where($"label" === "no").select($"cell_id").as[Long].collect().toSet
    assert(neg.size == cfg.limit)
    // no negative inside the exclusion block
    for (cell <- neg) {
      val tx = CellId.tx(cell); val ty = CellId.ty(cell)
      assert(!(tx >= w.tx0 + 2 && tx <= w.tx0 + 6 && ty >= w.ty0 + 2 && ty <= w.ty0 + 6),
        s"negative in exclusion zone: ($tx,$ty)")
    }
    // no negative on a building outline cell
    val ext = cfg.ext
    val outline = Pipelines.waysPacked(ways, nodes, $"tags".getItem("building").isNotNull)
      .select(explode(graft.functions.GeoUdfs.rasterizePolyline(ext, 1)($"lats", $"lngs")).as("c"))
      .as[Long].collect().toSet
    assert(neg.intersect(outline).isEmpty)
  }

  test("roofShapes: labeled mosaics pass the half-open size gate") {
    val out = Pipelines.roofShapes(spark, nodes, ways, images, cfg).cache()
    val rows = out.select($"label", $"bytes").as[(String, Array[Byte])].collect()
    assert(rows.nonEmpty, "at least one roof-shape mosaic survives the gate")
    for ((label, bytes) <- rows) {
      assert(SyntheticWorld.RoofShapes.contains(label))
      val raw = ImageCodec.decode(bytes)
      assert(raw.h >= 128 && raw.h < 1024 && raw.w >= 128 && raw.w < 1024,
        s"size gate: ${raw.h}x${raw.w}")
    }
    // balance caps every class at the min class count
    val bal = Pipelines.roofShapes(spark, nodes, ways, images, cfg, balance = true)
      .groupBy($"label").count().as[(String, Long)].collect().toMap
    if (bal.nonEmpty) assert(bal.values.max - bal.values.min <= bal.values.min,
      "balanced classes within one min-count band")
  }

  implicit class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[(A, B), C] = rows.map(r => ((r._1, r._2), r._3)).toMap
  }
}
