package graft.plans

import graft.SparkSuite
import graft.functions.GeoF
import graft.pipeline.CellOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The cell-cover range-gate optimizer rule: the CellInCoverExpr filter
  * equals the coverJoin semi-join row for row, the injected cell_id range
  * reaches the parquet scan as PushedFilters, and soundness holds even for
  * ids not at the cover's zMax level (the kernel rejects them, so the
  * range gate can never drop an accepted row). */
class CellCoverRuleSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  val ZMax = 14
  val ZMin = 11

  // points clustered in a small tx/ty region at z14 + far-away outliers
  lazy val pointsDf = (1L to 3000L).map { k =>
    (k, 53.8306 + (k % 900) * 0.0001, 27.4026 + ((k * 7) % 1700) * 0.0001)
  }.toDF("id", "lat", "lng")
    .select($"id", GeoF.cellAtWgs($"lat", $"lng", ZMax).as("cell_id"))

  // compacted cover of the first thousand points' cells
  lazy val cover: Seq[Long] = CellOps.compact(
      pointsDf.where($"id" <= 1000).select($"cell_id"), ZMax, ZMin)
    .as[Long].collect().sorted.toSeq

  lazy val parquetDir = {
    val dir = java.nio.file.Files.createTempDirectory("graft_cover_rule").toString
    pointsDf.repartition(8).write.mode("overwrite").parquet(dir)
    dir
  }

  private def filterQuery() = spark.read.parquet(parquetDir)
    .where(GeoF.cellInCover($"cell_id", typedLit(cover), ZMax, ZMin))
    .select($"id")

  test("cellInCover filter == coverJoin semi-join, and covers the planted cluster") {
    val viaExpr = filterQuery().as[Long].collect().toSet
    val viaJoin = CellOps.coverJoin(spark.read.parquet(parquetDir),
        cover.toDF("cell_id"), ZMax, ZMin)
      .select($"id").as[Long].collect().toSet
    assert(viaExpr == viaJoin)
    assert((1L to 1000L).toSet.subsetOf(viaExpr), "cover must accept its own donors")
  }

  test("rule injects a sargable cell_id range that reaches PushedFilters; results identical") {
    val without = filterQuery().as[Long].collect().sorted.toSeq
    val planWithout = filterQuery().queryExecution.executedPlan.toString
    assert(!planWithout.contains("GreaterThanOrEqual(cell_id"),
      s"without the rule the scan has no cell_id range:\n$planWithout")

    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ CellCoverPushdown
    try {
      val df = filterQuery()
      assert(df.as[Long].collect().sorted.toSeq == without,
        "range AND probe must equal probe row-for-row")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("GreaterThanOrEqual(cell_id") &&
        plan.contains("LessThanOrEqual(cell_id"),
        s"cell_id bounds must push into the scan:\n$plan")
      assert(plan.contains("PushedFilters: ["), s"scan must report pushed filters:\n$plan")
      val logical = df.queryExecution.optimizedPlan
      assert(CellCoverPushdown(logical) fastEquals logical,
        "re-applying the rule to its own output must be a no-op")
    } finally spark.experimental.extraOptimizations = prev
  }

  test("soundness: ids at the wrong level are rejected by probe AND range alike") {
    // craft ids whose tx/ty lie under the cover but whose packed level is
    // z13 — the kernel must reject them (level contract), and because it
    // does, the injected range (which assumes level zMax) stays sound
    val offLevel = cover.map { c =>
      val tx = (c >>> 29) & 0x1FFFFFFFL
      val ty = c & 0x1FFFFFFFL
      val d = ZMax - (c >>> 58).toInt
      (13L << 58) + ((tx << d) << 29) + (ty << d)
    }.toDF("cell_id")
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ CellCoverPushdown
    try {
      val n = offLevel.where(GeoF.cellInCover($"cell_id", typedLit(cover), ZMax, ZMin)).count()
      assert(n == 0L, "non-zMax ids must be rejected regardless of tx/ty")
    } finally spark.experimental.extraOptimizations = prev
  }

  test("a per-row (non-foldable) cover takes the scan kernel and gains no gate") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ CellCoverPushdown
    try {
      val df = pointsDf
        .withColumn("cov", array($"cell_id")) // trivially self-covering
        .where(GeoF.cellInCover($"cell_id", $"cov", ZMax, ZMax))
      assert(df.count() == 3000L)
      assert(!df.queryExecution.optimizedPlan.toString.contains("GreaterThanOrEqual"),
        "a non-foldable cover must not produce a range conjunct")
    } finally spark.experimental.extraOptimizations = prev
  }

  test("spark.sql.extensions activation: a real session loads BOTH rules end-to-end") {
    // the production activation path (spark-submit --conf
    // spark.sql.extensions=graft.plans.GraftSparkExtensions): build a NEW
    // SparkSession over the existing SparkContext with the extensions
    // config and assert the injected rules fire in its optimizer
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // spark.sql.extensions is a STATIC conf: session creation reads it
    // from the (already-running) SparkContext's conf, so plant it there —
    // the same place spark-submit --conf would put it
    org.apache.spark.sql.graft.Bridge.setContextConf(base.sparkContext,
      "spark.sql.extensions", "graft.plans.GraftSparkExtensions")
    try {
      val s2 = SparkSession.builder().getOrCreate()
      // (never stop s2 — it shares the suite-wide SparkContext)
      val executed = s2.read.parquet(parquetDir)
        .where(GeoF.cellInCover(col("cell_id"), typedLit(cover), ZMax, ZMin))
        .queryExecution.executedPlan.toString
      assert(executed.contains("GreaterThanOrEqual(cell_id"),
        s"extension-loaded session must inject the cover range gate:\n$executed")
      // both rules of the extension are registered in this real session
      // (the pip rule's behavior is covered by PipBboxRuleSpec)
      val ext = new org.apache.spark.sql.SparkSessionExtensions
      new GraftSparkExtensions().apply(ext)
      val rules = org.apache.spark.sql.graft.Bridge.optimizerRules(ext, s2)
      assert(rules.exists(_ eq PipBboxPushdown) && rules.exists(_ eq CellCoverPushdown))
    } finally {
      org.apache.spark.sql.graft.Bridge.removeContextConf(base.sparkContext,
        "spark.sql.extensions")
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
