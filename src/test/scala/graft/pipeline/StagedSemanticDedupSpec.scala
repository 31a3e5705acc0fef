package graft.pipeline

import graft.SparkSuite
import graft.tables.StageRunner
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The staged semantic-dedup flagship: output identical to the inline
  * q_sim_resolve chain, resume skips committed stages, and touching an
  * upstream stage recomputes exactly its downstream cone. */
class StagedSemanticDedupSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  /** Corpus + 5 planted near-dups of vec 0 (AnnIndexSpec construction). */
  lazy val planted = {
    val base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = base.where($"vec_id" === 0).select($"embedding").head().getSeq[Float](0)
    val dups = (0 until 5).map { i =>
      (100000L + i, q.zipWithIndex.map { case (v, d) =>
        v + (if ((d + i) % 7 == 0) 0.003f else -0.002f) }.toArray)
    }
    base.select($"vec_id", $"embedding")
      .unionByName(dups.toDF("vec_id", "embedding"))
      .cache()
  }

  test("staged output == inline chain; resume skips; upstream touch recomputes its cone") {
    val dir = Files.createTempDirectory("graft_semdedup").toString
    def keeps(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select($"vec_id").as[Long].collect().sorted.toSeq

    val staged1 = keeps(StagedSemanticDedup.run(spark, planted, dir))
    // inline oracle: same chain without the snapshot layer
    val inline = {
      val pairs = AnnIndex.nearDupPairs(
        planted.select($"vec_id", $"embedding".cast("array<double>").as("embedding")),
        dim = 64, minCosFp = 999000L)
      val dropped = Dedup.resolveClusters(pairs.select($"ida", $"idb"))
        .where($"keep" === 0L).select($"doc_id").as[Long].collect().toSet
      keeps(planted.select($"vec_id")).filterNot(dropped)
    }
    assert(staged1 == inline, "staged chain must equal the inline pipeline")
    // the planted dups (and only they) were dropped; the original is kept
    assert((keeps(planted.select($"vec_id")).toSet -- staged1.toSet) ==
      (0 until 5).map(100000L + _).toSet)
    assert(staged1.contains(0L))

    val runner = new StageRunner(spark, dir)
    val all = Seq("semdedup_corpus", "semdedup_pairs", "semdedup_resolve", "semdedup_keep")
    assert(all.forall(s => runner.snapshotId(s).contains(1L)))
    assert(runner.manifestObj("semdedup_resolve").get.inputs.map(_.stage) == Seq("semdedup_pairs"))

    // no-op rerun: nothing recomputes
    val stamps = all.map(s => s -> Files.getLastModifiedTime(runner.manifestPath(s))).toMap
    assert(keeps(StagedSemanticDedup.run(spark, planted, dir)) == staged1)
    for ((s, t) <- stamps)
      assert(Files.getLastModifiedTime(runner.manifestPath(s)) == t, s"$s recomputed on no-op")

    // touch the resolve stage: only resolve + keep recompute — the heavy
    // pair-generation snapshot (the pass staging exists FOR) is reused
    runner.invalidate("semdedup_resolve")
    assert(keeps(StagedSemanticDedup.run(spark, planted, dir)) == staged1)
    assert(runner.snapshotId("semdedup_corpus").contains(1L), "corpus untouched")
    assert(runner.snapshotId("semdedup_pairs").contains(1L), "pairs snapshot reused")
    assert(runner.snapshotId("semdedup_resolve").contains(2L), "touched stage advanced")
    assert(runner.snapshotId("semdedup_keep").contains(2L), "downstream recomputed")

    // touch the corpus: the WHOLE cone recomputes (every stage is
    // downstream), reproducing identical output at new snapshots
    runner.invalidate("semdedup_corpus")
    assert(keeps(StagedSemanticDedup.run(spark, planted, dir)) == staged1)
    assert(runner.snapshotId("semdedup_corpus").contains(2L))
    assert(runner.snapshotId("semdedup_pairs").contains(2L))
    assert(runner.snapshotId("semdedup_resolve").contains(3L))
    assert(runner.snapshotId("semdedup_keep").contains(3L))
  }
}
