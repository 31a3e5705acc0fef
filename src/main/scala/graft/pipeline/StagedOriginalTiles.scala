package graft.pipeline

import graft.tables.{HashRank, StageRunner}
import graft.functions.{GeoF, GeoUdfs}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Checkpoint-resumable form of the flagship pipeline (north_rule:
 * "resumable from checkpoint with per-partition lineage + row-count
 * metrics"). Each stage commits a snapshot through [[StageRunner]]
 * (atomic manifest rename); a rerun skips every committed stage — the
 * generalization of the reference's JSON/tile memoization
 * (lib/loaders.py:13-16, lib/layers.py:77-79).
 *
 * Stage graph (lineage recorded in each manifest):
 *   lamps_sample  <- scan+hash-rank sample
 *   painted_cells <- lamps_sample + road rasterization
 *   negative_cells<- painted_cells (anti-join + hash-rank)
 *   labeled       <- lamps_sample + negative_cells joined vs images
 */
object StagedOriginalTiles {
  def run(spark: SparkSession, nodes: DataFrame, ways: DataFrame,
          images: DataFrame, cfg: Pipelines.Config, baseDir: String): DataFrame = {
    val stages = new StageRunner(spark, baseDir)

    val lamps = stages.stage("lamps_sample") {
      HashRank.sample(Pipelines.lampScan(nodes, cfg), "node_id", cfg.seed, cfg.limit)
        .select("node_id", "lat", "lng")
        .repartition(col("node_id"))
    }

    val painted = stages.stage("painted_cells", inputs = Seq("lamps_sample")) {
      val roads = Pipelines.waysPacked(ways, nodes, Pipelines.roadFilter)
      Pipelines.paintedCells(lamps, roads, cfg)
    }

    val negatives = stages.stage("negative_cells", inputs = Seq("painted_cells")) {
      Pipelines.negativeCells(spark, painted, cfg, cfg.limit, seedTag = 1)
    }

    stages.stage("labeled", inputs = Seq("lamps_sample", "negative_cells")) {
      val img = Pipelines.imagesInBbox(images, cfg)
      val exampleId = format_string("m_x%dy%d",
        GeoF.cellTx(col("cell_id")), GeoF.cellTy(col("cell_id")))
      val pts = lamps
        .where(GeoF.edgeOk(col("lat"), col("lng"), cfg.z, cfg.offX, cfg.offY, 16))
        .withColumn("cell_id", GeoF.cellAtWgs(col("lat"), col("lng"), cfg.z, cfg.offX, cfg.offY))
      // O8 [GRAFT]: the lamp⋈images join is the pipeline's skew point —
      // dense urban tiles concentrate many lamps on one cell_id. Detect hot
      // cells on the (snapshotted, bounded) lamp side and salt the join
      // when any exceed the threshold; result is row-identical to the plain
      // join (ResumeSaltSinkSpec), task-balance is asserted in
      // PlanAuditSpec on the hotCellSkew world. AQE skew-join remains the
      // runtime backstop for joins it can split.
      val hot = SaltedJoin.detectHotCells(pts, threshold = 8.0)
      val posJoined =
        if (hot.nonEmpty) SaltedJoin.joinOnCell(pts, img, hot, saltFactor = 8)
        else pts.join(img, "cell_id")
      val positives = posJoined
        .select(exampleId.as("example_id"), col("cell_id"),
          lit("lamp").as("label"), col("bytes"), col("caption"), col("fmt"))
      val negs = negatives.join(img, "cell_id")
        .select(exampleId.as("example_id"), col("cell_id"),
          lit("nolamp").as("label"), col("bytes"), col("caption"), col("fmt"))
      positives.unionByName(negs)
    }
  }
}

/**
 * Explicit hot-cell salting (SURVEY.md §4 O8 [GRAFT]): when a handful of
 * cells hold a disproportionate share of the point side (dense urban
 * tiles), a plain cell_id equi-join puts them in one task. Salting spreads
 * the hot cells' rows over `saltFactor` sub-keys and replicates the
 * matching image rows; AQE skew-join is the runtime backstop, this is the
 * plan-level form usable with joins AQE cannot split (e.g. followed by a
 * positional aggregation).
 */
object SaltedJoin {
  /** Equi-join `points` (with cell_id + a unique `pointKey` column) against
    * `images` (unique cell_id), salting the listed hot cells. Result ==
    * plain join, row for row; salt is keyed (deterministic, partitioning-
    * invariant — monotonically_increasing_id would not be). */
  def joinOnCell(points: DataFrame, images: DataFrame, hotCells: Seq[Long],
                 saltFactor: Int, pointKey: String = "node_id"): DataFrame = {
    val hot = typedLit(hotCells)
    val salted = points.withColumn("salt",
      when(array_contains(hot, col("cell_id")),
        pmod(xxhash64(col(pointKey)), lit(saltFactor.toLong))).otherwise(lit(0L)))
    val imagesSalted = images
      .withColumn("salt", explode(when(array_contains(hot, col("cell_id")),
        sequence(lit(0L), lit(saltFactor.toLong - 1))).otherwise(array(lit(0L)))))
    salted.join(imagesSalted, Seq("cell_id", "salt")).drop("salt")
  }

  /** Hot-cell detection: cells whose point count exceeds `threshold` times
    * the mean (approx distinct pre-pass, SURVEY.md §4 O8). An empty points
    * side has no hot cells (avg over zero groups is null, not a crash). */
  def detectHotCells(points: DataFrame, threshold: Double = 8.0): Seq[Long] = {
    val counts = points.groupBy(col("cell_id")).agg(count(lit(1)).as("n"))
    val meanRow = counts.agg(avg(col("n"))).head()
    if (meanRow.isNullAt(0)) return Seq.empty
    val mean = meanRow.getDouble(0)
    counts.where(col("n") > mean * threshold)
      .select(col("cell_id")).collect().map(_.getLong(0)).toSeq
  }
}
