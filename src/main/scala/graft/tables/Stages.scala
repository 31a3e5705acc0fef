package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

/**
 * Checkpoint-resumable stage runner with Iceberg-lite snapshot semantics
 * (north_rule: "resumable from checkpoint with per-partition lineage +
 * metrics"). No Iceberg runtime jar exists in this offline environment
 * (SURVEY.md env facts), so the table layer provides the same guarantees
 * over plain parquet:
 *
 *  - **atomic commit**: stage output is written to `<stage>/data`, then a
 *    manifest JSON is moved into place with an atomic rename; a stage
 *    without a manifest is invisible (partial writes are ignored and
 *    overwritten on retry).
 *  - **resume**: a committed stage is never recomputed — the reference's
 *    JSON/tile memoization generalized (lib/loaders.py:13-16,
 *    lib/layers.py:77-79).
 *  - **lineage + metrics**: the manifest records per-partition row counts
 *    (computed relationally via spark_partition_id, no RDD), total rows,
 *    input stage names, and the commit timestamp.
 *
 * The interface is deliberately narrow (resolve-or-compute + manifest) so a
 * real Iceberg catalog can be slotted in on a cluster.
 */
final class StageRunner(spark: SparkSession, baseDir: String) {
  Files.createDirectories(Paths.get(baseDir))

  def manifestPath(name: String) = Paths.get(s"$baseDir/$name/manifest.json")
  def dataPath(name: String) = s"$baseDir/$name/data"

  def isCommitted(name: String): Boolean = Files.exists(manifestPath(name))

  /** Run (or resume) a stage. `inputs` are upstream stage names recorded as
    * lineage. Returns the committed stage's DataFrame. */
  def stage(name: String, inputs: Seq[String] = Nil)(compute: => DataFrame): DataFrame = {
    if (!isCommitted(name)) {
      val df = compute
      df.write.mode("overwrite").parquet(dataPath(name))
      val written = spark.read.parquet(dataPath(name))
      val parts = written.groupBy(spark_partition_id().as("pid"))
        .count().orderBy("pid")
        .collect().map(r => s"""{"pid":${r.getInt(0)},"rows":${r.getLong(1)}}""")
      val total = written.count()
      val manifest =
        s"""{"stage":"${name}","rows":$total,
           |"inputs":[${inputs.map(i => "\"" + i + "\"").mkString(",")}],
           |"partitions":[${parts.mkString(",")}],
           |"committed_at":"${java.time.Instant.now()}"}""".stripMargin
      val tmp = Paths.get(s"$baseDir/$name/manifest.json.tmp")
      Files.write(tmp, manifest.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, manifestPath(name), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
    spark.read.parquet(dataPath(name))
  }

  def manifest(name: String): Option[String] =
    if (isCommitted(name)) Some(new String(Files.readAllBytes(manifestPath(name)), StandardCharsets.UTF_8))
    else None

  def rowCount(name: String): Option[Long] =
    manifest(name).flatMap { m =>
      """"rows":(\d+)""".r.findFirstMatchIn(m).map(_.group(1).toLong)
    }
}

/** Deterministic, partitioning-invariant sampling (SURVEY.md §2.7 SA1-SA4):
  * rank rows by a keyed 64-bit hash and take the top K. Uniform without
  * replacement, reproducible across parallelism levels — the property that
  * makes the N vs 4N scaling-equality claim checkable. Replaces the
  * reference's sequential random.shuffle / rejection sampling
  * (make_original.py:28-29, lib/helpers.py:157-215) whose busy/free
  * adaptive machinery is a sequential-RNG artifact. */
object HashRank {
  import org.apache.spark.sql.Column
  def rank(key: Column, seed: Long): Column = xxhash64(key, lit(seed))
  /** Stable sample of n rows by hash-rank on `key` (ties broken by key). */
  def sample(df: DataFrame, key: String, seed: Long, n: Int): DataFrame =
    df.orderBy(rank(col(key), seed), col(key)).limit(n)
}
