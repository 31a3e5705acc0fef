package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANN index QUALITY evaluation — recall@k of an approximate per-probe
  * top-k against the exact one. The measurement loop every production
  * vector index runs continuously (after a build, after an append batch,
  * when tuning nprobe): without it "the index works" is a guess.
  * Reference analog: none (the reference ships no ANN ops); this is the
  * evaluation half the r4/r5 index-lifecycle family needs to be
  * operable.
  *
  * Scale shape: the probe panel is a bounded evaluation SAMPLE (hundreds
  * of rows — it broadcasts), so the exact baseline costs ONE linear
  * corpus scan regardless of corpus size, and the recall join touches
  * k·|panel| rows. Evaluation cost never multiplies into the corpus. */
object AnnEval {

  /** Exact per-probe top-k (the evaluation baseline): broadcast probe
    * panel × one linear corpus scan, exact integer dot, per-probe
    * map-side top-k. Self matches are excluded — the same contract as
    * the index probes, so recall compares like with like.
    * Output: (probe_id, rank, vec_id, dot). */
  def exactTopK(probes: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val p = probes.select(col("vec_id").as("probe_id"),
      AnnIndex.quant(AnnIndex.embD).as("pq"))
    val c = corpus.select(col("vec_id"), AnnIndex.quant(AnnIndex.embD).as("vq"))
    val scored = c.crossJoin(broadcast(p))
      .where(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        AnnIndex.intDot(col("vq"), col("pq")).as("dot"))
    AnnIndex.rankTopK(scored, k, "dot")
  }

  /** recall@k per probe: |approx top-k ∩ exact top-k| in `n_hits`, and
    * the fixed-point fraction floor(n_hits·10^6 / k) in `recall_fp`.
    * Every probe of the exact side emits a row — a probe the index
    * recovered NOTHING for reads (probe_id, 0, 0), never silently drops.
    * Both inputs are (probe_id, …, vec_id, …) rank relations (the
    * [[AnnIndex.rankTopK]] shape shared by every probe operator). */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val hits = exact.select(col("probe_id"), col("vec_id"))
      .join(approx.select(col("probe_id"), col("vec_id")), Seq("probe_id", "vec_id"))
      .groupBy(col("probe_id")).agg(count(lit(1)).as("n_hits"))
    exact.select(col("probe_id")).distinct()
      .join(hits, Seq("probe_id"), "left")
      .select(col("probe_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        floor(coalesce(col("n_hits"), lit(0L)) * lit(1000000L) / lit(k))
          .cast("long").as("recall_fp"))
  }
}
