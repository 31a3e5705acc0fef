package graft.pipeline

import graft.tables.StageRunner
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Checkpoint-resumable semantic dedup — the embeddings flagship
 * (q_sim_resolve's inline chain staged through [[StageRunner]] snapshots,
 * north_rule: "resumable from checkpoint with per-partition lineage +
 * metrics"). At 100 TB the pair generation is the expensive pass (LSH
 * bucketing + exact cosine verification over the candidate set); staging
 * commits it once, and touching any upstream stage recomputes exactly its
 * downstream cone — never the whole chain, never stale data.
 *
 * Stage graph (lineage recorded in each manifest):
 *   semdedup_corpus  <- the embedding corpus, snapshotted (id, embedding)
 *   semdedup_pairs   <- LSH-bucketed candidate pairs, cosine-verified
 *                       ([[AnnIndex.nearDupPairs]] — never n²)
 *   semdedup_resolve <- connected components -> keep/drop decisions
 *                       ([[Dedup.resolveClusters]])
 *   semdedup_keep    <- corpus ids minus dropped: the dedup deliverable
 *                       (anti-join against the bounded drop set)
 */
object StagedSemanticDedup {
  def run(spark: SparkSession, corpus: DataFrame, baseDir: String,
          dim: Int = 64, minCosFp: Long = 999000L): DataFrame = {
    val stages = new StageRunner(spark, baseDir)

    val corp = stages.stage("semdedup_corpus") {
      corpus.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    }

    val pairs = stages.stage("semdedup_pairs", inputs = Seq("semdedup_corpus")) {
      AnnIndex.nearDupPairs(corp, dim, minCosFp)
    }

    val resolved = stages.stage("semdedup_resolve", inputs = Seq("semdedup_pairs")) {
      Dedup.resolveClusters(pairs.select(col("ida"), col("idb")))
    }

    stages.stage("semdedup_keep", inputs = Seq("semdedup_corpus", "semdedup_resolve")) {
      corp.select(col("vec_id"))
        .join(resolved.where(col("keep") === 0L).select(col("doc_id").as("vec_id")),
          Seq("vec_id"), "left_anti")
    }
  }
}
