package graft.pipeline

import graft.SparkSuite
import graft.tables.StageRunner
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * BM25 ranked retrieval: the distributed operator against a sequential
 * Scala oracle (same formula, same IEEE double tree, same floored-
 * per-term integer sum), plus the committed-index lifecycle contract
 * (staged == inline; a second build launches zero Spark jobs).
 */
class Bm25Spec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  // small corpus with known term overlaps (vocab drawn so every query
  // term has df in (0, N) and documents differ in length)
  val docsSeq: Seq[(Long, String)] = Seq(
    1L -> "spark table scan fast scan table",
    2L -> "slow table merge join window agg",
    3L -> "fast fast fast scan",
    4L -> "window agg window agg stream batch stream",
    5L -> "customer order query big table scan order",
    6L -> "the of and or it is on in at by",
    7L -> "vector hash merge batch hash vector hash")
  lazy val docs: DataFrame = docsSeq.toDF("doc_id", "text").cache()

  val queriesSeq: Seq[(Long, String)] = Seq(
    1L -> "table scan fast", 2L -> "window agg", 3L -> "hash vector batch")
  lazy val queries: DataFrame = queriesSeq.toDF("query_id", "qtext")

  /** Sequential BM25 oracle: identical arithmetic to [[Bm25.termScoreFpSql]]. */
  def oracleTopK(k: Int): Seq[(Long, Int, Long, Long)] = {
    val re = "[a-z]{3,}".r
    def toks(s: String): Seq[String] = re.findAllIn(s.toLowerCase).toSeq
    val docToks = docsSeq.map { case (id, t) => id -> toks(t) }.toMap
    val n = docToks.size.toLong
    val dl = docToks.map { case (id, ts) => id -> ts.length.toLong }
    val sumDl = dl.values.sum
    val tf = docToks.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, o) => (id, t) -> o.length.toLong }
    }
    val df = docToks.values.flatMap(_.distinct).groupBy(identity)
      .map { case (t, o) => t -> o.size.toLong }
    def termFp(tfv: Long, dfv: Long, dlv: Long): Long =
      math.floor(1000000.0 * (math.log(1.0 + (n - dfv + 0.5) / (dfv + 0.5)) *
        (tfv * 2.2) / (tfv + 1.2 * (0.25 + 0.75 * dlv / (sumDl.toDouble / n))))).toLong
    queriesSeq.flatMap { case (qid, qtext) =>
      val qts = toks(qtext).distinct
      val scored = docToks.keys.toSeq.flatMap { did =>
        val s = qts.flatMap(t => tf.get((did, t)).map(termFp(_, df(t), dl(did)))).sum
        if (qts.exists(t => tf.contains((did, t)))) Some(did -> s) else None
      }
      scored.sortBy { case (did, s) => (-s, did) }.take(k).zipWithIndex
        .map { case ((did, s), i) => (qid, i + 1, did, s) }
    }
  }

  private def jobsDuring[A](f: => A): (A, Int) = {
    val c = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = c.incrementAndGet()
    }
    org.apache.spark.sql.graft.Bridge.flushListenerBus(spark.sparkContext)
    spark.sparkContext.addSparkListener(l)
    try {
      val a = f
      org.apache.spark.sql.graft.Bridge.flushListenerBus(spark.sparkContext)
      (a, c.get())
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("topK == sequential oracle (ranks, docs, and integer scores)") {
    val got = Bm25.topK(Bm25.build(docs), queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val want = oracleTopK(5).sortBy(t => (t._1, t._2))
    assert(got == want)
    assert(got.nonEmpty && got.exists(_._1 == 1L))
  }

  test("stopword-only and absent-term queries behave: no match -> no rows") {
    // terms under 3 chars never tokenize; an absent term contributes no rows
    val qs = Seq(90L -> "on it at", 91L -> "zzzunseen").toDF("query_id", "qtext")
    assert(Bm25.topK(Bm25.build(docs), qs, k = 5).count() == 0L)
  }

  test("idf ordering: rare term outranks common term at equal tf and dl") {
    // doc 3 ("fast fast fast scan", dl=4) vs doc 6's stopword soup never
    // competes; directly: score of 'vector' (df=1) in doc 7 must exceed
    // score of 'table' (df=3) in doc 5 for single-term queries IF tf/dl
    // comparable — assert via two single-term queries' top-1 scores
    val qs = Seq(1L -> "vector", 2L -> "table").toDF("query_id", "qtext")
    val top = Bm25.topK(Bm25.build(docs), qs, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(top(1L) > top(2L), s"rare-term top score ${top(1L)} must exceed common-term ${top(2L)}")
  }

  test("staged build == inline build; second build launches zero jobs") {
    val dir = java.nio.file.Files.createTempDirectory("bm25_staged").toString
    val st = new StageRunner(spark, dir)
    val m1 = Bm25.buildStaged(st, docs)
    val staged = Bm25.topK(m1, queries, k = 5).collect().map(_.toString).toSet
    val inline = Bm25.topK(Bm25.build(docs), queries, k = 5).collect().map(_.toString).toSet
    assert(staged == inline && staged.nonEmpty)
    val (m2, jobs) = jobsDuring(Bm25.buildStaged(st, docs))
    assert(jobs == 0, s"second build launched $jobs Spark jobs — a committed index rebuilt")
    assert(Bm25.topK(m2, queries, k = 5).collect().map(_.toString).toSet == staged)
  }
}
