package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (backward) join — for each probe row, the build-side row with the
 * greatest timestamp <= the probe's timestamp within the same key (J10;
 * DuckDB/kdb ASOF JOIN semantics, matched by the q_j10_asof oracle).
 *
 * Spark-first shape: no per-probe range scan and no inequality join —
 * union the two sides, sort each key's rows by (ts, side) once, and carry
 * the latest build attributes forward with last(ignoreNulls) over the
 * running window. One shuffle on the key, partitioned windows only (never
 * a global sort), O(n log n) per key regardless of how many probes share
 * a build row. Build rows must be unique per (key, ts) — pre-aggregate
 * duplicates or the carried row is tie-ambiguous.
 */
object AsofJoin {
  /** probe: (key, ts, probe cols); build: (key, ts, `buildCols`...).
    * Returns probe rows + buildCols of the as-of match (null if none). */
  def asofBackward(probe: DataFrame, build: DataFrame, key: String, ts: String,
                   buildCols: Seq[String]): DataFrame = {
    val probeCols = probe.columns.toSeq
    // ASOF semantics for nulls: ts_probe >= ts_build is never true with a
    // null ts, so null-ts build rows can match nothing — drop them (they
    // would otherwise sort nulls-first and leak into every early probe).
    // Null-ts probes sort before all build rows and naturally get no match.
    val buildClean = build.where(col(ts).isNotNull)
    // side 0 sorts before side 1 at equal ts => a build row AT the probe's
    // ts is visible to it (ASOF's ts_probe >= ts_build). Build attributes
    // travel as ONE struct so a null attribute value cannot tear the
    // carried row back to an older build row.
    val bStruct = struct(buildCols.map(col): _*)
    val taggedBuild = buildClean.select(
      (Seq(col(key), col(ts), lit(0).as("graft_side"), bStruct.as("graft_b")) ++
        probeCols.filterNot(Seq(key, ts).contains).map(c => lit(null).as(c))): _*)
    val taggedProbe = probe.select(
      (Seq(col(key), col(ts), lit(1).as("graft_side"),
        lit(null).cast(taggedBuildStructType(build, buildCols)).as("graft_b")) ++
        probeCols.filterNot(Seq(key, ts).contains).map(col)): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("graft_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = taggedBuild.unionByName(taggedProbe)
      .withColumn("graft_b", last(col("graft_b"), ignoreNulls = true).over(w))
    carried.where(col("graft_side") === 1)
      .select((probeCols.map(col) ++
        buildCols.map(c => col(s"graft_b.$c").as(s"asof_$c"))): _*)
  }

  private def taggedBuildStructType(build: DataFrame,
                                    buildCols: Seq[String]): org.apache.spark.sql.types.StructType = {
    org.apache.spark.sql.types.StructType(
      buildCols.map(c => build.schema(c)))
  }

  /** Point-in-interval join (J10's second half) for possibly-OVERLAPPING
    * intervals: every (probe, interval) pair with start <= ts < end on the
    * same key. Spark-first shape: no inequality-only join — intervals
    * explode to the fixed-width time buckets they cover, probes map to
    * exactly ONE bucket (so no post-join dedup is ever needed), and the
    * join is an equi-join on (key, bucket) with an exact containment
    * filter. Shuffle volume: |build| x avg(duration/bucketWidth + 1) short
    * rows. Pick bucketWidth near the typical interval length.
    *
    * probe: (key, ts numeric, probe cols); build: (key, start, end,
    * `buildCols`...), half-open [start, end). Inner join (non-matching
    * probes drop). */
  def intervalJoin(probe: DataFrame, build: DataFrame, key: String, ts: String,
                   start: String, end: String, buildCols: Seq[String],
                   bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val b = build
      .where(col(start).isNotNull && col(end).isNotNull && col(end) > col(start))
      .withColumn("graft_bk", explode(sequence(
        floor(col(start) / bucketWidth).cast("long"),
        // end is exclusive: the last covered bucket holds end-1
        floor((col(end) - 1) / bucketWidth).cast("long"))))
    val p = probe.where(col(ts).isNotNull)
      .withColumn("graft_bk", floor(col(ts) / bucketWidth).cast("long"))
    p.join(b.select((Seq(col(key), col("graft_bk"), col(start), col(end)) ++
          buildCols.map(col)): _*),
        Seq(key, "graft_bk"))
      .where(col(start) <= col(ts) && col(ts) < col(end))
      .drop("graft_bk", start, end)
  }
}
