package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused timing harness for iterating on individual contract queries:
  * `runMain graft.BenchSome <sfDir> <q1,q2,...> [reps]` times each named
  * SparkEntry query (count()) under the same session config as [[Bench]]
  * section 1 and prints one `name: best=<s> runs=[...]` line per query.
  * Development tool only — the driver artifact stays [[Bench]]. */
object BenchSome {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "32k")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ plans.PipBboxPushdown
    // same warmup as Bench
    spark.range(0, 2000000)
      .select(xxhash64(col("id")).as("h"), (col("id") % 97).as("k"))
      .groupBy(col("k")).agg(count(lit(1)), sum(col("h"))).count()
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy(col("l_returnflag")).agg(count(lit(1))).count()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val s = (System.nanoTime() - t0) / 1e9
        spark.sqlContext.clearCache()
        s
      }
      println(f"[benchsome] $name: best=${runs.min}%.2f runs=[${runs.map(r => f"$r%.2f").mkString(", ")}]")
    }
    spark.stop()
  }
}
