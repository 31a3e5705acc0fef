package graft.tables

import graft.functions.GeoF
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Paths

/** Images-table manifest rows (on-disk JSON field names). */
case class ImgPart(pty: Long, ptx: Long, rows: Long, cell_min: Long, cell_max: Long)
case class ImgManifest(table: String, delta_z: Int, partitions: Seq[ImgPart],
                       committed_at: String)

/**
 * Cell-bucketed image corpus with manifest min/max pruning — the
 * Iceberg-lite table layout of SURVEY.md §4 O2 / §7.5 (SnapshotTable
 * "partition stats, skipping"). The reference's analog is server-side bbox
 * pushdown (lib/loaders.py:19); at 10^12 images a pipeline must never
 * start with a full-corpus scan, so:
 *
 *  - **layout**: rows are partitioned by the parent tile `deltaZ` zoom
 *    levels up (`pty`/`ptx` directory columns, each parent = 2^deltaZ ×
 *    2^deltaZ leaf tiles) and sorted by `cell_id` within partitions —
 *    a space-filling-adjacent layout that keeps any bbox query local to a
 *    handful of directories.
 *  - **manifest**: per-partition row counts and min/max cell_id, committed
 *    with an atomic rename (same contract as [[StageRunner]]).
 *  - **pruning**: [[readForBbox]] selects directories from the manifest
 *    (the scan never lists pruned dirs); the plain [[read]] +
 *    `Pipelines.imagesInBbox` route prunes via Catalyst partition filters
 *    on `pty`/`ptx` instead. Both produce identical rows.
 */
object ImagesTable {
  /** Default parent zoom delta: 2^6 = 64×64 leaf tiles per partition dir —
    * ~4k dirs for a z19 metro extent, parquet files in the 100MB+ range at
    * corpus density. */
  val DefaultDeltaZ = 6

  def dataPath(dir: String) = s"$dir/data"
  private def manifestPath(dir: String) = Paths.get(s"$dir/manifest.json")

  /** Write `images` (must carry cell_id) bucketed by parent cell. */
  def writeBucketed(spark: SparkSession, images: DataFrame, dir: String,
                    deltaZ: Int = DefaultDeltaZ): Unit = {
    val df = images
      .withColumn("pty", shiftrightunsigned(GeoF.cellTy(col("cell_id")), deltaZ))
      .withColumn("ptx", shiftrightunsigned(GeoF.cellTx(col("cell_id")), deltaZ))
    df.repartition(col("pty"), col("ptx"))
      .sortWithinPartitions(col("cell_id"))
      .write.mode("overwrite").partitionBy("pty", "ptx").parquet(dataPath(dir))

    // partition dir values are re-inferred as INT on read-back; normalize
    val stats = spark.read.parquet(dataPath(dir))
      .groupBy(col("pty").cast("long").as("pty"), col("ptx").cast("long").as("ptx"))
      .agg(count(lit(1)).as("rows"), min(col("cell_id")).as("cmin"), max(col("cell_id")).as("cmax"))
      .orderBy(col("pty"), col("ptx"))
      .collect()
      .map(r => ImgPart(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    ManifestJson.writeAtomic(manifestPath(dir),
      ImgManifest("images", deltaZ, stats, java.time.Instant.now().toString))
  }

  private def manifestObj(dir: String): ImgManifest =
    ManifestJson.read(manifestPath(dir), classOf[ImgManifest])

  /** Metadata key carrying the table's parent zoom delta on the pty
    * column, so `Pipelines.imagesInBbox` can derive the correct parent
    * range for its partition filters. */
  val DeltaZMetaKey = "graft.deltaZ"

  /** Full-table read (partition columns pty/ptx present — bbox filters on
    * them prune at planning time, see PlanAuditSpec). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val md = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong(DeltaZMetaKey, deltaZ(dir).toLong).build()
    spark.read.parquet(dataPath(dir))
      .withColumn("pty", col("pty").as("pty", md))
  }

  def deltaZ(dir: String): Int = manifestObj(dir).delta_z

  /** Catalog-registered bucketed form (Spark `bucketBy` on cell_id +
    * in-bucket sort): two tables bucketed the same way equi-join WITHOUT
    * any Exchange — the co-located-join layout for the recurring
    * points⋈images joins at corpus scale (asserted in PlanAuditSpec).
    * Complements [[writeBucketed]]'s directory layout: that one prunes
    * bbox scans, this one kills the join shuffle. */
  def saveBucketedCatalog(spark: SparkSession, df: DataFrame, table: String,
                          buckets: Int): Unit = {
    df.write.mode("overwrite")
      .bucketBy(buckets, "cell_id").sortBy("cell_id")
      .format("parquet").saveAsTable(table)
  }

  /** Manifest-pruned read: only directories whose parent cell intersects
    * the padded tile range are ever listed — file skipping driven by table
    * metadata, not directory discovery. */
  def readForBbox(spark: SparkSession, dir: String,
                  txRange: (Long, Long), tyRange: (Long, Long)): DataFrame = {
    val m = manifestObj(dir)
    val dz = m.delta_z
    val (pxlo, pxhi) = (txRange._1 >> dz, txRange._2 >> dz)
    val (pylo, pyhi) = (tyRange._1 >> dz, tyRange._2 >> dz)
    val dirs = m.partitions
      .filter(p => p.pty >= pylo && p.pty <= pyhi && p.ptx >= pxlo && p.ptx <= pxhi)
      .map(p => s"${dataPath(dir)}/pty=${p.pty}/ptx=${p.ptx}")
    if (dirs.isEmpty) read(spark, dir).where(lit(false))
    else spark.read.option("basePath", dataPath(dir)).parquet(dirs: _*)
  }
}
