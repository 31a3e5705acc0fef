package graft.tmp
import org.apache.spark.sql.functions._
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.sql.adaptive.coalescePartitions.enabled","false")
      .config("spark.sql.files.maxPartitionBytes","1m")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/tmp/graft_bench_world_z18_288"
    val images = spark.read.parquet(s"$dir/images.parquet")
    val nodes = spark.read.parquet(s"$dir/osm_nodes.parquet")
    val ways = spark.read.parquet(s"$dir/osm_ways.parquet")
    val w = graft.tables.World(z = 18, tx0 = 151000L, ty0 = 84350L, gridW = 288, gridH = 288,
      lamps = 288*288/4, roads = 144, buildings = 288, hotCellSkew = 0.2)
    val (bw, bs, be, bn) = w.bbox
    val cfg = graft.pipeline.Pipelines.Config(z = w.z, bbox = (bw, bs, be, bn),
      limit = w.lamps/2, train = w.lamps/3, valid = w.lamps/8, expandPad = 88)
    val out = graft.pipeline.Pipelines.expandedCrops(spark, nodes, ways, images, cfg)
    val plan = out.queryExecution.executedPlan.toString
    // print only agg/exchange/join skeleton lines
    plan.linesIterator.filter(l => l.contains("Aggregate") || l.contains("Exchange") ||
      l.contains("Join") || l.contains("stitch") || l.contains("Scan parquet") || l.contains("Union")).foreach(println)
    spark.stop()
  }
}
