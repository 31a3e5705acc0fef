package graft.pipeline

import graft.tables.StageRunner
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Checkpoint-resumable form of the image-heavy expand pipeline — the
 * workload where resumability pays: the crop stages decode/stitch/encode
 * every example, so a failed run must never redo finished crops
 * (north_rule: "resumable from checkpoint with per-partition lineage +
 * metrics"). Same stage contract as [[StagedOriginalTiles]]: each stage
 * commits a parquet snapshot + atomic manifest (per-partition row counts,
 * lineage); a rerun skips every committed stage.
 *
 * Stage graph (lineage recorded in each manifest):
 *   lamps_ranked      <- scan + deterministic rank
 *   neg_cells         <- lamps_ranked + road rasterization + anti-join
 *   train_pos_crops   <- lamps_ranked   (stitch+encode — the heavy one)
 *   valid_pos_tiles   <- lamps_ranked
 *   train_neg_crops   <- neg_cells      (stitch+encode)
 *   valid_neg_tiles   <- neg_cells
 *   labeled           <- the four branches
 *
 * Outputs are identical to [[Pipelines.expandedCrops]] (asserted in
 * ResumeSaltSinkSpec) because every stage function is shared.
 */
object StagedExpand {
  def run(spark: SparkSession, nodes: DataFrame, ways: DataFrame,
          images: DataFrame, cfg: Pipelines.Config, baseDir: String): DataFrame = {
    val stages = new StageRunner(spark, baseDir)
    val img = Pipelines.imagesInBbox(images, cfg)

    val lampsRanked = stages.stage("lamps_ranked") {
      Pipelines.expandLampsRanked(nodes, cfg)
    }
    val negCells = stages.stage("neg_cells", inputs = Seq("lamps_ranked")) {
      Pipelines.expandNegCells(spark, lampsRanked, nodes, ways, cfg)
    }
    val (trainLamps, validLamps) = Pipelines.expandLampSplit(lampsRanked, cfg)

    val trainPos = stages.stage("train_pos_crops", inputs = Seq("lamps_ranked")) {
      Pipelines.expandTrainPos(trainLamps, img, cfg)
    }
    val validPos = stages.stage("valid_pos_tiles", inputs = Seq("lamps_ranked")) {
      Pipelines.expandValidPos(validLamps, img, cfg)
    }
    val trainNeg = stages.stage("train_neg_crops", inputs = Seq("neg_cells")) {
      Pipelines.expandTrainNeg(negCells, img, cfg)
    }
    val validNeg = stages.stage("valid_neg_tiles", inputs = Seq("neg_cells")) {
      Pipelines.expandValidNeg(negCells, img, cfg)
    }
    stages.stage("labeled", inputs =
        Seq("train_pos_crops", "valid_pos_tiles", "train_neg_crops", "valid_neg_tiles")) {
      trainPos.unionByName(validPos).unionByName(trainNeg).unionByName(validNeg)
    }
  }
}
