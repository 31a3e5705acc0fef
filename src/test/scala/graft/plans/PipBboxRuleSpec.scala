package graft.plans

import graft.SparkSuite
import graft.functions.GeoF
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bbox-injection optimizer rule: identical results, and the injected
  * range predicates reach the parquet scan as PushedFilters — which the
  * bare ray-cast never can. */
class PipBboxRuleSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  val diamondLat = Seq(53.8381234, 53.8421234, 53.8461234, 53.8421234)
  val diamondLng = Seq(27.4101234, 27.4401234, 27.4101234, 27.3801234)

  lazy val parquetDir = {
    val dir = java.nio.file.Files.createTempDirectory("graft_pip_rule").toString
    (1L to 4000L).map(k =>
        (k, 53.8306 + (k % 14000) * 0.00001, 27.4026 + ((k * 3) % 29000) * 0.00001))
      .toDF("id", "lat", "lng")
      .repartition(8).write.mode("overwrite").parquet(dir)
    dir
  }

  private def pipQuery() = spark.read.parquet(parquetDir)
    .where(GeoF.pointInPoly($"lat", $"lng", typedLit(diamondLat), typedLit(diamondLng)))
    .select($"id")

  test("rule injects a sargable bbox that reaches PushedFilters; results identical") {
    val without = pipQuery().as[Long].collect().sorted.toSeq
    val planWithout = pipQuery().queryExecution.executedPlan.toString
    assert(!planWithout.contains("PushedFilters: [IsNotNull(lat), GreaterThanOrEqual(lat"),
      s"without the rule the scan has no lat range filters:\n$planWithout")

    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ PipBboxPushdown
    try {
      val df = pipQuery()
      val withRule = df.as[Long].collect().sorted.toSeq
      assert(withRule == without, "bbox AND pip must equal pip row-for-row")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("GreaterThanOrEqual(lat") && plan.contains("LessThanOrEqual(lat") &&
        plan.contains("GreaterThanOrEqual(lng"),
        s"bbox bounds must push into the scan:\n$plan")
      assert(plan.contains("PushedFilters: ["), s"scan must report pushed filters:\n$plan")
      // idempotent: optimizing twice adds nothing (rule sees its own output)
      val logical = df.queryExecution.optimizedPlan
      assert(PipBboxPushdown(logical) fastEquals logical,
        "re-applying the rule to its own output must be a no-op")
    } finally spark.experimental.extraOptimizations = prev
  }

  test("a pip under NOT gains no bbox (not implied); under AND it still does") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ PipBboxPushdown
    try {
      val neg = spark.read.parquet(parquetDir)
        .where(!GeoF.pointInPoly($"lat", $"lng", typedLit(diamondLat), typedLit(diamondLng)))
      val negPlan = neg.queryExecution.executedPlan.toString
      assert(!negPlan.contains("GreaterThanOrEqual(lat,53.83"),
        s"negated pip must not gain the polygon bbox:\n$negPlan")
      // correctness of the negated path is untouched
      val n = neg.count()
      val inside = pipQuery().count()
      assert(n + inside == 4000L)

      val conj = spark.read.parquet(parquetDir)
        .where($"id" > 100 &&
          GeoF.pointInPoly($"lat", $"lng", typedLit(diamondLat), typedLit(diamondLng)))
      val conjPlan = conj.queryExecution.executedPlan.toString
      assert(conjPlan.contains("GreaterThanOrEqual(lat"),
        s"pip as one conjunct of an AND still gains its bbox:\n$conjPlan")
    } finally spark.experimental.extraOptimizations = prev
  }

  test("the spark.sql.extensions entry point registers the rule") {
    // a full extension-loaded session needs its own SparkContext (not
    // available mid-suite); registering against a fresh extensions object
    // verifies the injection wiring spark-submit exercises via
    // spark.sql.extensions=graft.plans.GraftSparkExtensions
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftSparkExtensions().apply(ext)
    val rules = org.apache.spark.sql.graft.Bridge.optimizerRules(ext, spark)
    assert(rules.exists(_ eq PipBboxPushdown), "extension must inject PipBboxPushdown")
  }
}
