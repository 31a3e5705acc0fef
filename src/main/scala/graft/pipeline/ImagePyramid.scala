package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PIXEL-content tile pyramid — the overview levels every slippy map
  * serves, built from actual imagery: each parent tile is the 2×2 mosaic
  * of its children downsampled back to tile size (exact box average,
  * floor). Complements [[CellOps.pyramidRollup]] (integer mean-color
  * rollup of the same shape): the rollup is the cheap diagnostic pyramid;
  * this one produces servable tiles. Reference analog: minimap renders
  * ONE overview at a fixed scale from per-tile means (lib/minimap.py);
  * the multi-level pixel form is the planet-scale tile-serving pyramid.
  *
  * Scale shape (same geometry as pyramidRollup): level L-1 is built from
  * level L's OUTPUT, so total decode+encode work is a geometric series
  * ≤ 4/3 of the leaf level — never L passes over the leaves. Each level
  * is ONE groupBy on the parent id; mosaics assemble through the
  * incremental [[graft.functions.StitchAggExpr]] buffer (input
  * co-partitioned by parent first — its memory contract), never a
  * collect_list of encoded tiles. Missing children stay zero (black),
  * the canvas default.
  */
object ImagePyramid {

  /** One level up: `tiles` (cell_id, bytes) at a uniform level z become
    * parent tiles at z-1 — stitch the ≤4 children into a 2×2 canvas by
    * their in-parent quadrant (tx&1, ty&1), halve, re-encode as `fmt`. */
  def levelUp(tiles: DataFrame, fmt: String): DataFrame = {
    val tx = shiftrightunsigned(col("cell_id"), 29).bitwiseAND(lit(0x1FFFFFFFL))
    val ty = col("cell_id").bitwiseAND(lit(0x1FFFFFFFL))
    val slots = tiles.select(CellOps.parentOf(col("cell_id")).as("cell_id"),
      (tx % 2).cast("int").as("dx"), (ty % 2).cast("int").as("dy"), col("bytes"))
    slots.repartition(col("cell_id"))
      .groupBy(col("cell_id"))
      .agg(graft.functions.Stitch.stitchAgg(struct(col("dx"), col("dy"),
        lit(2), lit(2), col("bytes"))).as("m"))
      .select(col("cell_id"),
        graft.functions.Stitch.halveEncode(col("m.h"), col("m.w"),
          col("m.bgr"), lit(fmt)).as("bytes"))
  }

  /** Build every overview level zLeaf-1 .. zMin from uniform-level
    * leaves (cell_id, bytes). Emits (cell_id, zl, bytes); each built
    * level materializes once (localCheckpoint) and feeds the next — the
    * decode/encode cost is paid once per level, not once per ancestor. */
  def build(leaves: DataFrame, zLeaf: Int, zMin: Int,
            fmt: String = "png"): DataFrame = {
    require(zMin >= 0 && zMin < zLeaf, s"bad pyramid range [$zMin, $zLeaf)")
    val levels = Iterator.iterate(
        leaves.select(col("cell_id"), col("bytes"))) { cur =>
        levelUp(cur, fmt).localCheckpoint(false)
      }
      .slice(1, zLeaf - zMin + 1) // built levels only; leaves already exist
      .toSeq
    levels.reduce(_.unionAll(_))
      .select(col("cell_id"), CellOps.zOf(col("cell_id")).cast("long").as("zl"),
        col("bytes"))
  }
}
