package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * kNN join via grid-binned candidate gather with ring expansion
 * (SURVEY.md §2.4 J9 [GRAFT]; no reference counterpart — mandated by
 * north_rule "kNN feature lookups").
 *
 * Exactness argument: candidates are binned into a δ-degree grid. After
 * round t the pool rows for a probe are (top-k of the inner block) ∪ (all
 * cells of the new annulus), whose top-k equals the top-k of the full
 * (2r+1)² block: any block point is either inside the inner block (where
 * membership in the overall top-k implies membership in the inner top-k)
 * or in the annulus. If the k-th best squared distance is ≤ (r·δ)², no
 * point outside the block can beat it, so the top-k is final. Unsatisfied
 * probes re-run with a doubled radius.
 *
 * Scale: each round gathers ONLY the new annulus (cells with
 * max(|Δgx|,|Δgy|) in (r_prev, r]) — never the whole block again — and
 * carries at most k rows per open probe between rounds. The final sweep
 * for leftover probes is a broadcast nested-loop whose broadcast side is
 * the leftover probe set, guarded by `tailLimit`: a sparse world cannot
 * silently degrade into an unbounded probes×candidates product.
 *
 * Metric: squared degrees (pure arithmetic — portable and exact); ranks
 * tie-break on the candidate key, matching the brute-force oracle rank.
 */
object KnnJoin {
  /** probes: (probe_id, plat, plng); cands: (o_orderkey, lat, lng).
    * Returns (probe_id, rank, o_orderkey, dist2), rank in 1..k. */
  def knn(probes: DataFrame, cands: DataFrame, k: Int, delta: Double = 0.01,
          maxRounds: Int = 4, tailLimit: Long = 1000000L): DataFrame = {
    val spark = probes.sparkSession
    val binned = cands
      .withColumn("gx", floor(col("lat") / delta).cast("long"))
      .withColumn("gy", floor(col("lng") / delta).cast("long"))

    val poolCols = Seq("probe_id", "plat", "plng", "o_orderkey", "lat", "lng")
    var remaining = probes
    var carried: DataFrame = null // top-k pool rows of still-open probes
    var results: DataFrame = null
    var rPrev = -1
    var r = 1
    var round = 0
    while (round < maxRounds && !remaining.isEmpty) {
      val isLast = round == maxRounds - 1
      val gathered =
        if (isLast) {
          // guarded tail sweep: leftover probes are the broadcast side
          val leftovers = remaining.count()
          require(leftovers <= tailLimit,
            s"kNN tail sweep over $leftovers probes exceeds tailLimit=$tailLimit — " +
              "raise maxRounds or delta for this data density")
          binned.crossJoin(broadcast(remaining)).select(poolCols.map(col): _*)
        } else {
          // annulus only: offsets with Chebyshev radius in (rPrev, r]
          val offsets = (for {
            dx <- -r to r; dy <- -r to r
            if math.max(math.abs(dx), math.abs(dy)) > rPrev
          } yield (dx, dy)).toList
          remaining
            .withColumn("pgx", floor(col("plat") / delta).cast("long"))
            .withColumn("pgy", floor(col("plng") / delta).cast("long"))
            .withColumn("o", explode(typedLit(offsets)))
            .withColumn("gx", col("pgx") + col("o._1"))
            .withColumn("gy", col("pgy") + col("o._2"))
            .join(binned, Seq("gx", "gy"))
            .select(poolCols.map(col): _*)
        }
      // the tail crossJoin already contains every (probe, candidate) pair —
      // unioning carried rows there would duplicate them and corrupt ranks
      val pool = if (carried == null || isLast) gathered
                 else gathered.unionByName(carried)
      val ranked = pool
        .withColumn("dist2",
          (col("lat") - col("plat")) * (col("lat") - col("plat")) +
          (col("lng") - col("plng")) * (col("lng") - col("plng")))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("probe_id")).orderBy(col("dist2"), col("o_orderkey"))))
        .where(col("rank") <= k)
      val withKth = ranked
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
      carried =
        if (isLast) null
        else ranked.select(poolCols.map(col): _*)
          .join(remaining.select("probe_id"), Seq("probe_id"), "left_semi")
          .localCheckpoint(false)
      rPrev = r
      r *= 2
      round += 1
    }
    if (results == null) spark.emptyDataFrame else results
  }

  /** Fixed-radius join in METERS (the distance-join sibling of [[knn]]):
    * every (probe, point) pair within `radiusM` great-circle meters, with
    * the exact haversine distance. Candidate gather is ONE 3×3 grid-block
    * equi-join: grid cells are sized per axis so `radiusM` can never span
    * more than one cell — lat degrees are constant (≥110.574 km each);
    * lng degrees shrink by cos(lat), bounded by the caller's `maxAbsLat`
    * (the data's latitude envelope — a wrong bound under-gathers, so it
    * is require-checked against every probe/point row). Refinement is the
    * codegen'd haversine ≤ radiusM.
    *
    * Scale shape: points exchange once on (gx, gy); probes explode ×9;
    * one equi-join (broadcastable probe side), zero windows. Never a
    * cross product at any density. */
  def radiusJoin(probes: DataFrame, points: DataFrame,
                 radiusM: Double, maxAbsLat: Double): DataFrame = {
    require(radiusM > 0 && maxAbsLat >= 0 && maxAbsLat < 85.0,
      s"radiusM=$radiusM must be positive and maxAbsLat=$maxAbsLat in [0, 85)")
    val dLat = radiusM / 110574.0 * 1.001
    val dLng = radiusM / (111320.0 * math.cos(math.toRadians(maxAbsLat))) * 1.001
    def guard(lat: Column): Column =
      when(abs(lat) > maxAbsLat, expr(
        s"CAST(raise_error('radiusJoin: |lat| exceeds maxAbsLat=$maxAbsLat') AS DOUBLE)"))
        .otherwise(lat)
    // Antimeridian guard (ADVICE r5): the gy binning is on raw degrees,
    // so a pair straddling ±180° lands in distant bins and would be
    // SILENTLY missed — the same under-gather failure mode the lat guard
    // exists for. Data within radiusM of the seam must be handled by a
    // wrapped binning (gy mod the ring's bin count), which no current
    // corpus needs; until then, refuse loudly instead of under-gathering.
    val lngLimit = 180.0 - (dLng * 1.001)
    def guardLng(lng: Column): Column =
      when(abs(lng) > lngLimit, expr(
        s"CAST(raise_error('radiusJoin: |lng| within one bin of the antimeridian " +
          s"(limit $lngLimit) — seam wrapping not implemented') AS DOUBLE)"))
        .otherwise(lng)
    val binned = points
      .withColumn("gx", floor(guard(col("lat")) / dLat).cast("long"))
      .withColumn("gy", floor(guardLng(col("lng")) / dLng).cast("long"))
    val offsets = (for (dx <- -1 to 1; dy <- -1 to 1) yield (dx, dy)).toList
    probes
      .withColumn("pgx", floor(guard(col("plat")) / dLat).cast("long"))
      .withColumn("pgy", floor(guardLng(col("plng")) / dLng).cast("long"))
      .withColumn("o", explode(typedLit(offsets)))
      .withColumn("gx", col("pgx") + col("o._1"))
      .withColumn("gy", col("pgy") + col("o._2"))
      .join(binned, Seq("gx", "gy"))
      .withColumn("dist_m", graft.functions.GeoF.haversineMeters(
        col("plat"), col("plng"), col("lat"), col("lng")))
      .where(col("dist_m") <= radiusM)
      .drop("pgx", "pgy", "o", "gx", "gy")
  }
}
