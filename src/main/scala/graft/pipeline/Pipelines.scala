package graft.pipeline

import graft.core._
import graft.functions.{GeoF, GeoUdfs, ImageUdfs}
import graft.tables.HashRank
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One tile slot of a mosaic: the covering cell and its (dx,dy) tile offset
  * within the mosaic canvas. */
case class Slot(cell_id: Long, dx: Int, dy: Int)
/** Viewport cover of a point: slots + mosaic dims + point offset px
  * (reference lib/layers.py:145-178; square-viewport quirk preserved). */
case class ViewportSpec(cells: Seq[Slot], wtiles: Int, htiles: Int, rx: Long, ry: Long)

/**
 * The four dataset-construction pipelines of the reference, re-expressed as
 * declarative Catalyst plans (SURVEY.md §3). Common shape:
 *
 *   scan (pruned) -> hash-rank sample -> cell binning (codegen expr)
 *   -> equi-join vs `images` on cell_id -> rasterize-agg (explode+distinct)
 *   -> anti-join complement -> hash-rank negative sample -> labeled output
 *
 * All sampling is deterministic hash-rank (partitioning-invariant), so
 * outputs are identical at any parallelism — the property behind the
 * N-vs-4N scaling-equality evidence.
 *
 * Scale notes (100 TB design): every join is an equi-join on a LongType
 * cell_id; the lamp/way side is tiny relative to the image corpus and is
 * broadcast by AQE/stats; the grid-complement anti-join builds the grid
 * relationally (range x range) and prunes the images scan by the bbox's
 * cell range; rasterization is per-geometry (embarrassingly parallel) and
 * unions relationally via distinct. Hot cells are handled by AQE skew
 * join; the corpus side is bucket-partitionable by cell_id.
 */
object Pipelines {
  val TileSize = 256

  final case class Config(
      z: Int,
      bbox: (Double, Double, Double, Double), // (W, S, E, N)
      offX: Double = 0.0, offY: Double = 0.0,
      limit: Int = 5000,          // make_original.py:17
      train: Int = 4000,          // make_expand.py:24
      valid: Int = 1000,          // make_expand.py:27
      expandPad: Int = 0,         // make_expand.py:18
      buildingEdge: Double = 24,  // make_buildings.py:40
      seed: Long = 42L) {
    def ext: GeoUdfs.Extent =
      GeoUdfs.Extent.ofBbox(bbox._1, bbox._2, bbox._3, bbox._4, z, offX, offY)
  }

  // ---------- shared stages ----------

  /** O2: restrict the image corpus to the bbox's padded tile range BEFORE
    * any join — at 10^12 images no pipeline may open with a full-corpus
    * scan. On a cell-bucketed table ([[graft.tables.ImagesTable]], with
    * pty/ptx partition columns) the parent-range predicates prune
    * directories at planning time (PartitionFilters — asserted in
    * PlanAuditSpec); on any other source they evaluate as cheap bit-field
    * filters on cell_id. `padTiles` absorbs viewports/way covers that poke
    * past the bbox (expand crops: <=2 tiles at pad 88; roofshape covers:
    * <=4 at the 1024px gate). Assumes no antimeridian %256 wrap (the
    * reference's latent tilesWay quirk) — a wrapped cover would fetch from
    * the far side of the world, which the pruned corpus cannot serve. */
  def imagesInBbox(images: DataFrame, cfg: Config, padTiles: Int = 8): DataFrame = {
    val ext = cfg.ext
    val (txlo, txhi) = (ext.txmin - padTiles, ext.txmin + ext.width - 1 + padTiles)
    val (tylo, tyhi) = (ext.tymin - padTiles, ext.tymin + ext.height - 1 + padTiles)
    // the table's bucketing granularity travels as column metadata set by
    // ImagesTable.read — without it the partition fast path is skipped
    // (the leaf filter below is always correct on its own)
    val dzOpt = images.schema.fields.find(_.name == "pty")
      .filter(_.metadata.contains(graft.tables.ImagesTable.DeltaZMetaKey))
      .map(_.metadata.getLong(graft.tables.ImagesTable.DeltaZMetaKey).toInt)
    val base = dzOpt match {
      case Some(dz) if images.columns.contains("ptx") =>
        images.where(col("pty").between(tylo >> dz, tyhi >> dz) &&
                     col("ptx").between(txlo >> dz, txhi >> dz))
      case _ => images
    }
    base.where(GeoF.cellTx(col("cell_id")).between(txlo, txhi) &&
               GeoF.cellTy(col("cell_id")).between(tylo, tyhi))
  }

  /** S1: lamp scan with bbox + tag pushdown (reference lib/loaders.py:10-27). */
  def lampScan(nodes: DataFrame, cfg: Config): DataFrame = {
    val (w, s, e, n) = cfg.bbox
    nodes.where(col("lat").between(s, n) && col("lng").between(w, e) &&
      col("tags").getItem("highway") === "street_lamp")
  }

  /** S2/J1: road scan + way⋈node resolution into packed coordinate arrays
    * (order-preserving; reference lib/loaders.py:30-66). */
  def waysPacked(ways: DataFrame, nodes: DataFrame, tagFilter: Column): DataFrame = {
    ways.where(tagFilter)
      .select(col("way_id"), col("kind"), col("tags"),
        posexplode(col("node_ids")).as(Seq("pos", "node_id")))
      .join(nodes.select("node_id", "lat", "lng"), "node_id")
      .groupBy(col("way_id"))
      .agg(first(col("kind")).as("kind"), first(col("tags")).as("tags"),
        array_sort(collect_list(struct(col("pos"), col("lat"), col("lng")))).as("pts"))
      .select(col("way_id"), col("kind"), col("tags"),
        col("pts.lat").as("lats"), col("pts.lng").as("lngs"))
  }

  val roadFilter: Column =
    array_contains(lit(graft.tables.SyntheticWorld.RoadClasses), col("tags").getItem("highway"))

  /** A2 (relational form): painted-cell union of lamp dots + road polylines
    * width 2 (reference make_original.py:40-44). */
  def paintedCells(lamps: DataFrame, roads: DataFrame, cfg: Config): DataFrame = {
    val ext = cfg.ext
    val dots = lamps.select(
      GeoF.cellAtWgs(col("lat"), col("lng"), cfg.z, cfg.offX, cfg.offY).as("cell_id"))
    val roadCells = roads.select(
      explode(GeoUdfs.rasterizePolyline(ext, 2)(col("lats"), col("lngs"))).as("cell_id"))
    dots.unionByName(roadCells).distinct()
  }

  /** J6 + SA2: hash-rank sample of the unpainted complement of the canvas
    * grid. The grid is generated relationally; painted is typically small
    * and broadcast into the anti-join. */
  def negativeCells(spark: SparkSession, painted: DataFrame, cfg: Config, n: Int,
                    seedTag: Long): DataFrame = {
    val grid = GeoUdfs.gridCells(spark, cfg.ext)
    val free = grid.join(painted, Seq("cell_id"), "left_anti")
    HashRank.sample(free, "cell_id", cfg.seed + seedTag, n)
      .repartition(col("cell_id"))
  }

  /** Cover-path form of [[negativeCells]]: the painted exclusion set is
    * COMPACTED to mixed zoom [zMin, cfg.z] and candidates probe it through
    * the bounded ancestor-chain [[CellOps.coverJoin]] (anti form) —
    * identical output by compact's losslessness (PolyfillSpec pins it on
    * the buildings exclusion zones), but the broadcast side is the
    * compacted cover: for area-shaped exclusions (WKT fills,
    * make_buildings.py:24-27) that is orders of magnitude smaller than
    * the fine painted set, which is what keeps the anti-join broadcastable
    * at planet-scale exclusion zones. */
  def negativeCellsViaCover(spark: SparkSession, painted: DataFrame, cfg: Config,
                            n: Int, seedTag: Long, zMin: Int): DataFrame = {
    val cover = CellOps.compact(painted.select(col("cell_id")), cfg.z, zMin)
    val grid = GeoUdfs.gridCells(spark, cfg.ext)
    val free = grid.join(
      CellOps.coverJoin(grid, cover, cfg.z, zMin).select(col("cell_id")),
      Seq("cell_id"), "left_anti")
    HashRank.sample(free, "cell_id", cfg.seed + seedTag, n)
      .repartition(col("cell_id"))
  }

  private def exampleIdAtCell: Column =
    format_string("m_x%dy%d", GeoF.cellTx(col("cell_id")), GeoF.cellTy(col("cell_id")))

  /** Tile basename without the m_ prefix — building positives copy the raw
    * tile filename (reference make_buildings.py:42 basename of
    * tilefile x{tx}y{ty}); only negatives get the m_ prefix (:69). */
  private def exampleIdAtCellBare: Column =
    format_string("x%dy%d", GeoF.cellTx(col("cell_id")), GeoF.cellTy(col("cell_id")))

  /** Co-partitioning strategy before a stitch aggregation. Default: hash
    * `repartition(key)`. `-Dgraft.stitchPartition=range` switches to
    * `repartitionByRange(key)` — nearby keys (mil-keyed points, way ids)
    * land in the same task, the north_star's "per-cell range partitioning"
    * for stitch locality. Results are key-grouped aggregates either way,
    * so output is partitioning-invariant; the A/B on the bench world is
    * recorded in BENCH/BASELINE.md (hash kept as default: range adds a
    * boundary-sampling job and measured no win at bench scale). */
  def copartitionForStitch(df: DataFrame, key: Column): DataFrame =
    if (sys.props.get("graft.stitchPartition")
        .orElse(sys.env.get("GRAFT_STITCH_PARTITION")).contains("range"))
      df.repartitionByRange(key)
    else df.repartition(key)

  /** Exact global top-`n` membership by (rank, key) WITHOUT a global
    * row_number window (which forces all rows into one partition —
    * VERDICT r1 "What's wrong" #1): the n-th smallest (rank, key) tuple is
    * computed distributedly via TakeOrdered and broadcast back as a scalar
    * threshold. Rows with tuple <= threshold are exactly the global top-n
    * (keys are distinct, so the order is total and tie-free). */
  def rankThreshold(df: DataFrame, rankCol: Column, keyCol: Column, n: Int): DataFrame = {
    val kth = df.select(struct(rankCol.as("r"), keyCol.as("k")).as("s"))
      .orderBy(col("s")).limit(n)
      .agg(max(col("s")).as("graft_kth"))
    df.crossJoin(broadcast(kth))
  }

  // ---------- pipeline 1: make_original (§3.1) ----------

  /** Streetlamp tile classification set: positives = tiles containing a
    * sampled lamp away from borders; negatives = sampled unpainted tiles.
    * Output: (example_id, cell_id, label, split, bytes, caption, fmt). */
  def originalTiles(spark: SparkSession, nodes: DataFrame, ways: DataFrame,
                    images: DataFrame, cfg: Config): DataFrame = {
    // not materialized — same reasoning as expandedCrops
    val img = imagesInBbox(images, cfg)
    // hash-rank limit (TakeOrderedAndProject) emits a single partition and
    // the images join is typically a broadcast, which would pin the whole
    // downstream chain to one task — redistribute the (tiny) lamp set
    val lamps = HashRank.sample(lampScan(nodes, cfg), "node_id", cfg.seed, cfg.limit)
      .select("node_id", "lat", "lng")
      .repartition(col("node_id"))

    // O1: edge filter BEFORE the image join (reference lib/layers.py:135-142)
    val positives = lamps
      .where(GeoF.edgeOk(col("lat"), col("lng"), cfg.z, cfg.offX, cfg.offY, 16))
      .withColumn("cell_id", GeoF.cellAtWgs(col("lat"), col("lng"), cfg.z, cfg.offX, cfg.offY))
      .join(img, "cell_id")
      .select(exampleIdAtCell.as("example_id"), col("cell_id"),
        lit("lamp").as("label"), lit("all").as("split"),
        col("bytes"), col("caption"), col("fmt"))

    val roads = waysPacked(ways, nodes, roadFilter)
    val painted = paintedCells(lamps, roads, cfg)
    val negatives = negativeCells(spark, painted, cfg, cfg.limit, seedTag = 1)
      .join(img, "cell_id")
      .select(exampleIdAtCell.as("example_id"), col("cell_id"),
        lit("nolamp").as("label"), lit("all").as("split"),
        col("bytes"), col("caption"), col("fmt"))

    positives.unionByName(negatives)
  }

  // ---------- pipeline 2: make_expand (§3.2) ----------

  private def viewportSpecUdf(z: Int, h: Int, offX: Double, offY: Double) =
    udf { (lat: Double, lng: Double) =>
      val (txmin, txmax, tymin, tymax, rx, ry) =
        Viewport.tilesNearWgs(lat, lng, z, h, h, offX, offY)
      val slots = for (ty <- tymin to tymax; tx <- txmin to txmax)
        yield Slot(CellId.pack(z, tx, ty), (tx - txmin).toInt, (ty - tymin).toInt)
      ViewportSpec(slots, (txmax - txmin + 1).toInt, (tymax - tymin + 1).toInt, rx, ry)
    }

  /** J3+I2+I3: viewport join -> stitch -> center crop -> jpeg, for a set of
    * points (reference getcrop_wgs, lib/layers.py:180-210). Input must have
    * (key, lat, lng) columns; emits (key, bytes). */
  def cropAroundPoints(points: DataFrame, images: DataFrame, cfg: Config, h: Int): DataFrame = {
    val spec = viewportSpecUdf(cfg.z, h, cfg.offX, cfg.offY)
    val withSpec = points.withColumn("vp", spec(col("lat"), col("lng")))
    val joined = withSpec
      .select(col("key"), col("vp.wtiles").as("wtiles"), col("vp.htiles").as("htiles"),
        col("vp.rx").as("rx"), col("vp.ry").as("ry"), explode(col("vp.cells")).as("slot"))
      .select(col("key"), col("wtiles"), col("htiles"), col("rx"), col("ry"),
        col("slot.cell_id").as("cell_id"), col("slot.dx").as("dx"), col("slot.dy").as("dy"))
      .join(images.select(col("cell_id"), col("bytes")), Seq("cell_id"), "left")
    // co-partition by group key BEFORE the stitch agg: map-side partial
    // aggregation would otherwise allocate a full canvas per group per
    // map task and shuffle ~|mapTasks|x inflated partial canvases
    // (measured: executor OOM at 8 GB in the local-cluster study; raw
    // tile rows are ~8x smaller than their partial mosaics)
    val copart = copartitionForStitch(joined, col("key"))
    // I2 via TypedImperativeAggregate: tiles decode+blit into the mosaic
    // buffer as they arrive (no collect_list materialization)
    copart.groupBy(col("key"))
      .agg(first(col("rx")).as("rx"), first(col("ry")).as("ry"),
        graft.functions.Stitch.stitchAgg(struct(col("dx").cast("int"), col("dy").cast("int"),
          col("wtiles").cast("int"), col("htiles").cast("int"), col("bytes"))).as("mosaic"))
      .select(col("key"), graft.functions.Stitch.cropEncode(col("mosaic.h"), col("mosaic.w"),
        col("mosaic.bgr"), col("rx").cast("int"), col("ry").cast("int"),
        lit(h), lit(h)).as("bytes"))
  }

  // ---- expand stage functions (shared by expandedCrops + StagedExpand) ----

  /** All bbox lamps with their deterministic rank: (node_id, lat, lng, rk). */
  def expandLampsRanked(nodes: DataFrame, cfg: Config): DataFrame =
    lampScan(nodes, cfg).select(col("node_id"), col("lat"), col("lng"),
      HashRank.rank(col("node_id"), cfg.seed).as("rk"))

  /** Exact global train/valid lamp split via broadcast rank threshold — no
    * single-partition window anywhere in this pipeline. */
  def expandLampSplit(lampsRanked: DataFrame, cfg: Config): (DataFrame, DataFrame) = {
    val lampSplit = rankThreshold(lampsRanked, col("rk"), col("node_id"), cfg.train)
    val lampTuple = struct(col("rk").as("r"), col("node_id").as("k"))
    // train=0 makes graft_kth null (max over an empty limit): everything is
    // valid then — guard both branches or the null comparison drops ALL rows
    (lampSplit.where(col("graft_kth").isNotNull && lampTuple <= col("graft_kth"))
       .drop("graft_kth").repartition(col("node_id")),
     lampSplit.where(col("graft_kth").isNull || lampTuple > col("graft_kth"))
       .drop("graft_kth").repartition(col("node_id")))
  }

  /** Negative cells with their split: (cell_id, split). Painter uses ALL
    * lamps in the bbox (make_expand.py:67), roads width 2. */
  def expandNegCells(spark: SparkSession, lampsRanked: DataFrame, nodes: DataFrame,
                     ways: DataFrame, cfg: Config): DataFrame = {
    val roads = waysPacked(ways, nodes, roadFilter)
    val painted = paintedCells(lampsRanked.select("node_id", "lat", "lng"), roads, cfg)
    val negAll = negativeCells(spark, painted, cfg, cfg.train + cfg.valid, seedTag = 2)
      .withColumn("nrk", HashRank.rank(col("cell_id"), cfg.seed + 2))
    val negTuple = struct(col("nrk").as("r"), col("cell_id").as("k"))
    rankThreshold(negAll, col("nrk"), col("cell_id"), cfg.train)
      .withColumn("split", when(negTuple <= col("graft_kth"), "train").otherwise("valid"))
      .drop("nrk", "graft_kth")
      .repartition(col("cell_id"))
  }

  /** Train positives: crops centered on the lamp (mil-keyed example ids).
    * Two lamps within 1e-6 deg share a key (reference: same-filename
    * collision); dedupe per key so each stitch group holds exactly one
    * viewport — keep the first by (rk, node_id). */
  def expandTrainPos(trainLamps: DataFrame, img: DataFrame, cfg: Config): DataFrame = {
    val h = cfg.expandPad + TileSize + cfg.expandPad
    val trainPosPts = trainLamps.select(
        format_string("m_lat%dlng%d", GeoF.milCol(col("lat")), GeoF.milCol(col("lng"))).as("key"),
        col("lat"), col("lng"), col("rk"), col("node_id"))
      .withColumn("dupk", row_number().over(
        Window.partitionBy(col("key")).orderBy(col("rk"), col("node_id"))))
      .where(col("dupk") === 1)
      .select(col("key"), col("lat"), col("lng"))
    cropAroundPoints(trainPosPts, img, cfg, h)
      .select(col("key").as("example_id"), lit(null).cast("long").as("cell_id"),
        lit("lamp").as("label"), lit("train").as("split"),
        col("bytes"), lit(null).cast("string").as("caption"), lit("jpeg").as("fmt"))
  }

  /** Valid positives: raw tiles, edge filter, dedupe by tile, first VALID. */
  def expandValidPos(validLamps: DataFrame, img: DataFrame, cfg: Config): DataFrame =
    validLamps
      .where(GeoF.edgeOk(col("lat"), col("lng"), cfg.z, cfg.offX, cfg.offY, 16))
      .withColumn("cell_id", GeoF.cellAtWgs(col("lat"), col("lng"), cfg.z, cfg.offX, cfg.offY))
      .withColumn("dup", row_number().over(
        Window.partitionBy(col("cell_id")).orderBy(col("rk"), col("node_id"))))
      .where(col("dup") === 1)
      .orderBy(col("rk"), col("node_id")).limit(cfg.valid)
      .repartition(col("cell_id"))
      .join(img, "cell_id")
      .select(exampleIdAtCell.as("example_id"), col("cell_id"),
        lit("lamp").as("label"), lit("valid").as("split"),
        col("bytes"), col("caption"), col("fmt"))

  /** Train negatives: crops centered at the TILE CENTER (P2, make_expand.py:80). */
  def expandTrainNeg(negCells: DataFrame, img: DataFrame, cfg: Config): DataFrame = {
    val h = cfg.expandPad + TileSize + cfg.expandPad
    val trainNegPts = negCells.where(col("split") === "train")
      .select(GeoF.cellCenter(col("cell_id")).as("c"))
      .select(format_string("m_lat%dlng%d", GeoF.milCol(col("c.lat")), GeoF.milCol(col("c.lng"))).as("key"),
        col("c.lat").as("lat"), col("c.lng").as("lng"))
    cropAroundPoints(trainNegPts, img, cfg, h)
      .select(col("key").as("example_id"), lit(null).cast("long").as("cell_id"),
        lit("nolamp").as("label"), lit("train").as("split"),
        col("bytes"), lit(null).cast("string").as("caption"), lit("jpeg").as("fmt"))
  }

  /** Valid negatives: raw tiles (make_expand.py:88-93). */
  def expandValidNeg(negCells: DataFrame, img: DataFrame, cfg: Config): DataFrame =
    negCells.where(col("split") === "valid")
      .join(img, "cell_id")
      .select(exampleIdAtCell.as("example_id"), col("cell_id"),
        lit("nolamp").as("label"), lit("valid").as("split"),
        col("bytes"), col("caption"), col("fmt"))

  /** Expanded crops with train/valid split. Split provenance reproduced
    * exactly (reference make_expand.py): train positives = crops around the
    * lamp point; valid positives = raw tiles passing the edge filter,
    * deduped; negative crops center on tile centers (P2); valid negatives =
    * raw tiles. Composition of the expand* stage functions above;
    * [[StagedExpand]] runs the same graph with a snapshot per stage. */
  def expandedCrops(spark: SparkSession, nodes: DataFrame, ways: DataFrame,
                    images: DataFrame, cfg: Config): DataFrame = {
    // NOT materialized here: the branches' bbox re-scans of a parquet
    // corpus are cheap (column-pruned, page-cached), while checkpointing
    // every tile's bytes measured a 2x wall regression on the flagship
    // (4.2 -> 8-10 s). Callers whose image table is GENERATED (the
    // synthetic-world count queries) materialize it before passing in.
    val img = imagesInBbox(images, cfg)
    val lampsRanked = expandLampsRanked(nodes, cfg)
    val (trainLamps, validLamps) = expandLampSplit(lampsRanked, cfg)
    val negCells = expandNegCells(spark, lampsRanked, nodes, ways, cfg)
    expandTrainPos(trainLamps, img, cfg)
      .unionByName(expandValidPos(validLamps, img, cfg))
      .unionByName(expandTrainNeg(negCells, img, cfg))
      .unionByName(expandValidNeg(negCells, img, cfg))
  }

  // ---------- pipeline 3: make_buildings (§3.3) ----------

  /** Building presence with WKT exclusion zones. Positives: every tile a
    * building way has a node in (edge=24), deduped; negatives from the
    * complement of {building outlines width 1} ∪ {exclusion fills}. */
  def buildings(spark: SparkSession, nodes: DataFrame, ways: DataFrame,
                images: DataFrame, cfg: Config, exclusionWkt: String = ""): DataFrame = {
    import spark.implicits._
    val img = imagesInBbox(images, cfg)
    val buildingWays = waysPacked(ways, nodes, col("tags").getItem("building").isNotNull)

    val positives = buildingWays
      .select(posexplode(arrays_zip(col("lats"), col("lngs"))).as(Seq("pos", "pt")))
      .select(col("pt.lats").as("lat"), col("pt.lngs").as("lng"))
      .where(GeoF.edgeOk(col("lat"), col("lng"), cfg.z, cfg.offX, cfg.offY, cfg.buildingEdge))
      .withColumn("cell_id", GeoF.cellAtWgs(col("lat"), col("lng"), cfg.z, cfg.offX, cfg.offY))
      .dropDuplicates("cell_id")
    val posLimited = HashRank.sample(positives, "cell_id", cfg.seed + 3, cfg.limit)
      .repartition(col("cell_id"))
      .join(img, "cell_id")
      .select(exampleIdAtCellBare.as("example_id"), col("cell_id"),
        lit("yes").as("label"), lit("all").as("split"),
        col("bytes"), col("caption"), col("fmt"))

    val ext = cfg.ext
    val outlineCells = buildingWays.select(
      explode(GeoUdfs.rasterizePolyline(ext, 1)(col("lats"), col("lngs"))).as("cell_id"))
    val exclusionCells =
      if (exclusionWkt.trim.isEmpty) spark.emptyDataset[Long].toDF("cell_id")
      else {
        val polys = Wkt.latlngsFromWkt(exclusionWkt).toSeq
          .map { case (lats, lngs) => (lats.toSeq, lngs.toSeq) }
        polys.toDF("lats", "lngs")
          .select(explode(GeoUdfs.rasterizeFill(ext)(col("lats"), col("lngs"))).as("cell_id"))
      }
    val painted = outlineCells.unionByName(exclusionCells).distinct()
    val negatives = negativeCells(spark, painted, cfg, cfg.limit, seedTag = 4)
      .join(img, "cell_id")
      .select(exampleIdAtCell.as("example_id"), col("cell_id"),
        lit("no").as("label"), lit("all").as("split"),
        col("bytes"), col("caption"), col("fmt"))

    posLimited.unionByName(negatives)
  }

  // ---------- pipeline 4: make_roofshapes (§3.4) ----------

  /** Roof-shape mosaics: per tagged way, cover its padded bbox with tiles,
    * stitch, crop to the box, gate size to [128,1024) (P10/F4 half-open),
    * label by roof:shape. `balance` caps every class at the smallest class
    * size (A1, make_roofshapes.py:33-39). */
  def roofShapes(spark: SparkSession, nodes: DataFrame, ways: DataFrame,
                 images: DataFrame, cfg: Config, balance: Boolean = false): DataFrame = {
    val img = imagesInBbox(images, cfg)
    val tagged = waysPacked(ways, nodes, col("tags").getItem("roof:shape").isNotNull &&
      col("tags").getItem("building").isNotNull)
      .withColumn("label", col("tags").getItem("roof:shape"))

    val capped = if (!balance) tagged else {
      // A1 single-plan form: the min class size joins in as a broadcast
      // scalar (no driver-side .head() action)
      val minN = tagged.groupBy(col("label")).agg(count(lit(1)).as("n"))
        .agg(min(col("n")).as("graft_mn"))
      tagged.withColumn("rn", row_number().over(
        Window.partitionBy(col("label"))
          .orderBy(HashRank.rank(col("way_id"), cfg.seed + 5), col("way_id"))))
        .crossJoin(broadcast(minN))
        .where(col("rn") <= col("graft_mn")).drop("rn", "graft_mn")
    }

    val cover = capped.withColumn("cov",
      GeoUdfs.wayCover(cfg.z, cfg.offX, cfg.offY)(col("lats"), col("lngs")))
    // F4/P10 gate BEFORE the image join + stitch: the crop box lies inside
    // the mosaic (ymin,xmin >= 0; ymax,xmax <= canvas edge — Viewport
    // remainders are in [0,256]), so cropped dims are exactly
    // (ymax-ymin, xmax-xmin) and the half-open gate can be applied to the
    // cover alone. Oversized/undersized ways never decode a tile, and the
    // gate bounds the stitch buffer (crop < 1024px => mosaic <= 6 tiles).
    val boxes = cover.select(col("way_id"), col("label"),
        col("cov.txmin").as("txmin"), col("cov.tymin").as("tymin"),
        (col("cov.txmax") - col("cov.txmin") + 1).cast("int").as("wtiles"),
        (col("cov.tymax") - col("cov.tymin") + 1).cast("int").as("htiles"),
        col("cov.xmin").as("xmin"), col("cov.ymin").as("ymin"),
        col("cov.xmax").as("xmax"), col("cov.ymax").as("ymax"))
      .where((col("ymax") - col("ymin")).between(128, 1023) &&
             (col("xmax") - col("xmin")).between(128, 1023))
    val slots = boxes
      .withColumn("tx", explode(sequence(col("txmin"), col("txmin") + col("wtiles") - 1)))
      .withColumn("ty", explode(sequence(col("tymin"), col("tymin") + col("htiles") - 1)))
      .withColumn("cell_id", GeoF.packCell(cfg.z, col("tx"), col("ty")))
      .withColumn("dx", (col("tx") - col("txmin")).cast("int"))
      .withColumn("dy", (col("ty") - col("tymin")).cast("int"))
      .join(img.select(col("cell_id"), col("bytes")), Seq("cell_id"), "left")

    // I2 via StitchAgg: tiles decode+blit into the mosaic buffer as they
    // arrive — never a collect_list of encoded image bytes; co-partition by
    // way BEFORE the stitch agg (see cropAroundPoints: partial canvases are
    // larger than the raw tiles they aggregate)
    copartitionForStitch(slots, col("way_id")).groupBy(col("way_id"))
      .agg(first(col("label")).as("label"),
        first(col("xmin")).as("xmin"), first(col("ymin")).as("ymin"),
        first(col("xmax")).as("xmax"), first(col("ymax")).as("ymax"),
        graft.functions.Stitch.stitchAgg(struct(col("dx"), col("dy"),
          col("wtiles"), col("htiles"), col("bytes"))).as("mosaic"))
      .select(format_string("m%d", col("way_id")).as("example_id"),
        lit(null).cast("long").as("cell_id"),
        col("label"), lit("all").as("split"),
        graft.functions.Stitch.cropBoxEncode(col("mosaic.h"), col("mosaic.w"),
          col("mosaic.bgr"), col("ymin").cast("int"), col("ymax").cast("int"),
          col("xmin").cast("int"), col("xmax").cast("int")).as("bytes"),
        lit(null).cast("string").as("caption"), lit("jpeg").as("fmt"))
  }
}
