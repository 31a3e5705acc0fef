package graft.pipeline

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ANN evaluation (AnnEval) contracts: the exact baseline is a true
  * top-k, full-routing recall is exactly 1.0, recall is bounded, and
  * probes the index recovers nothing for still emit. */
class AnnEvalSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  // deterministic corpus with planted structure: 8 tight clusters of 6
  private lazy val corpus = {
    val rows = for (c <- 0 until 8; j <- 0 until 6) yield {
      val base = Array.tabulate(16)(i => math.sin(c * 16 + i).abs * 2 + 1)
      val v = base.map(x => x + (Dedup.md5h60(s"ae|$c|$j") % 7 - 3) * 0.0004)
      (c * 10L + j, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }
  private lazy val probes = corpus.where(col("vec_id") % 10 === 0)

  test("exactTopK is a true per-probe top-k (matches a driver-side sort)") {
    val out = AnnEval.exactTopK(probes, corpus, k = 4)
      .select("probe_id", "rank", "vec_id").as[(Long, Int, Long)].collect()
    val embs = corpus.as[(Long, Seq[Double])].collect().toMap
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => math.floor(x * 1000).toLong * math.floor(y * 1000).toLong }.sum
    for (pid <- embs.keys.filter(_ % 10 == 0)) {
      val exp = embs.toSeq.filter(_._1 != pid)
        .map { case (id, v) => (id, dot(v, embs(pid))) }
        .sortBy { case (id, d) => (-d, id) }.take(4).map(_._1)
      val got = out.filter(_._1 == pid).sortBy(_._2).map(_._3).toSeq
      assert(got === exp, s"probe $pid")
    }
  }

  test("full-routing probe recall == 1.0 for every probe") {
    val m = IvfIndex.build(corpus, nlist = 4, trainRounds = 1)
    val approx = IvfIndex.probe(m, probes, k = 3, nprobe = 4) // nprobe = nlist
    val exact = AnnEval.exactTopK(probes, corpus, k = 3)
    val rec = AnnEval.recallAtK(approx, exact, k = 3)
      .as[(Long, Long, Long)].collect()
    assert(rec.length === 8)
    assert(rec.forall { case (_, h, fp) => h == 3 && fp == 1000000L })
  }

  test("recall bounded in [0, 1e6]; planted-cluster probe at nprobe=1 finds its own cluster") {
    val m = IvfIndex.build(corpus, nlist = 8, trainRounds = 2)
    val rec = AnnEval.recallAtK(
      IvfIndex.probe(m, probes, k = 3, nprobe = 1),
      AnnEval.exactTopK(probes, corpus, k = 3), k = 3)
      .as[(Long, Long, Long)].collect()
    assert(rec.length === 8)
    assert(rec.forall { case (_, h, fp) => h >= 0 && h <= 3 && fp >= 0 && fp <= 1000000L })
  }

  test("a probe with an empty approximate result emits n_hits = 0, never drops") {
    val exact = AnnEval.exactTopK(probes, corpus, k = 2)
    val approxMissing = exact.where(col("probe_id") =!= 0L)
    val rows = AnnEval.recallAtK(approxMissing, exact, k = 2)
      .as[(Long, Long, Long)].collect()
    assert(rows.exists(r => r._1 == 0L && r._2 == 0L && r._3 == 0L))
    assert(rows.filter(_._1 != 0L).forall(r => r._2 == 2L && r._3 == 1000000L))
  }
}
