package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * kNN join via grid-binned candidate gather with ring expansion
 * (SURVEY.md §2.4 J9 [GRAFT]; no reference counterpart — mandated by
 * north_rule "kNN feature lookups").
 *
 * Exactness argument: candidates are binned into a δ-degree grid. Searching
 * the (2r+1)² block around a probe's cell covers every point with
 * max(|Δlat|,|Δlng|) < r·δ. If the k-th best squared distance found so far
 * is ≤ (r·δ)², no point outside the block can beat it, so the top-k is
 * final. Probes not yet satisfied re-run with a doubled radius; a bounded
 * number of doublings ends in a brute-force sweep for the (rare) leftovers.
 *
 * Scale: the per-round work is one equi-join probe-blocks ⋈ candidate-bins
 * on (gx, gy) — shuffle on short int keys, broadcast when the probe side
 * is small; each round shrinks the probe set. No cross join except for the
 * leftover tail.
 *
 * Metric: squared degrees (pure arithmetic — portable and exact); ranks
 * tie-break on the candidate key, matching the brute-force oracle rank.
 */
object KnnJoin {
  /** probes: (probe_id, plat, plng); cands: (o_orderkey, lat, lng).
    * Returns (probe_id, rank, o_orderkey, dist2), rank in 1..k. */
  def knn(probes: DataFrame, cands: DataFrame, k: Int, delta: Double = 0.01,
          maxRounds: Int = 4): DataFrame = {
    val spark = probes.sparkSession
    val binned = cands
      .withColumn("gx", floor(col("lat") / delta).cast("long"))
      .withColumn("gy", floor(col("lng") / delta).cast("long"))

    var remaining = probes
    var results: DataFrame = null
    var r = 1
    var round = 0
    while (round < maxRounds && !remaining.isEmpty) {
      val isLast = round == maxRounds - 1
      val gathered =
        if (isLast) remaining.crossJoin(binned) // exact tail sweep
        else {
          val offsets: List[Int] = (-r to r).toList
          remaining
            .withColumn("pgx", floor(col("plat") / delta).cast("long"))
            .withColumn("pgy", floor(col("plng") / delta).cast("long"))
            .withColumn("dx", explode(typedLit(offsets)))
            .withColumn("dy", explode(typedLit(offsets)))
            .withColumn("gx", col("pgx") + col("dx"))
            .withColumn("gy", col("pgy") + col("dy"))
            .join(binned, Seq("gx", "gy"))
        }
      val scored = gathered
        .withColumn("dist2",
          (col("lat") - col("plat")) * (col("lat") - col("plat")) +
          (col("lng") - col("plng")) * (col("lng") - col("plng")))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("probe_id")).orderBy(col("dist2"), col("o_orderkey"))))
        .where(col("rank") <= k)
      val withKth = scored
        .withColumn("kth", max(when(col("rank") === k, col("dist2"))).over(
          Window.partitionBy(col("probe_id"))))
      val bound = (r.toDouble * delta) * (r.toDouble * delta)
      val done =
        if (isLast) withKth
        else withKth.where(col("kth").isNotNull && col("kth") <= bound)
      val donePart = done.select(col("probe_id"), col("rank"), col("o_orderkey"), col("dist2"))
        .localCheckpoint(false)
      results = if (results == null) donePart else results.unionByName(donePart)
      remaining = remaining.join(donePart.select("probe_id").distinct(),
        Seq("probe_id"), "left_anti").localCheckpoint(false)
      r *= 2
      round += 1
    }
    if (results == null) spark.emptyDataFrame else results
  }
}
