package graft.pipeline

import graft.SparkSuite
import graft.tables.StageRunner
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The index LIFECYCLE contract (VERDICT r4 Next #1): build once, commit,
 * probe many. For each of the four staged ANN indexes this pins
 *  (a) staged probe == the inline (train-in-query) operator, row for row;
 *  (b) a SECOND build call against the committed runner launches ZERO
 *      Spark jobs — no retraining, no re-assignment, not even a count;
 *  (c) committed snapshot ids are stable across build calls.
 */
class AnnStagedSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  val Dim = 64
  // small corpus with planted near-dups so probes have real neighbors
  lazy val corpus: DataFrame = {
    val base = (0L until 120L).map { id =>
      (id, Array.tabulate(Dim)(d => ((id * 31 + d * 7) % 100) / 100.0))
    }
    val dups = (0L until 20L).map { id =>
      (1000L + id, Array.tabulate(Dim)(d =>
        ((id * 31 + d * 7) % 100) / 100.0 + (((id + d) % 5) - 2) * 0.0004))
    }
    (base ++ dups).toDF("vec_id", "embedding").cache()
  }
  lazy val probes = corpus.where(col("vec_id") >= 1000L)

  private def fresh(tag: String): StageRunner = {
    val dir = java.nio.file.Files.createTempDirectory(s"ann_staged_$tag").toString
    new StageRunner(spark, dir)
  }

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  /** Spark jobs launched while `f` runs (listener-based; local mode posts
    * synchronously enough that waitUntilEmpty makes the count exact). */
  private def jobsDuring[A](f: => A): (A, Int) = {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        n.incrementAndGet()
        System.err.println(s"[jobsDuring] job ${js.jobId}: " +
          js.stageInfos.map(_.name).mkString(";"))
      }
    }
    // drain events from PRIOR actions first — a listener attached while the
    // async bus still holds undispatched JobStart events would count them
    org.apache.spark.sql.graft.Bridge.flushListenerBus(spark.sparkContext)
    spark.sparkContext.addSparkListener(l)
    try {
      val a = f
      org.apache.spark.sql.graft.Bridge.flushListenerBus(spark.sparkContext)
      (a, n.get())
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("staged IVF: probe == inline; rebuild runs zero jobs; snapshots stable") {
    val st = fresh("ivf")
    val m1 = IvfIndex.buildStaged(st, corpus, nlist = 8, trainRounds = 2)
    val staged = rows(IvfIndex.probe(m1, probes, k = 3, nprobe = 2))
    val inline = rows(IvfIndex.knnJoin(probes, corpus, k = 3, nlist = 8, nprobe = 2))
    assert(staged == inline && staged.nonEmpty)
    val snaps = Seq("ivf-n8-t2-centroids", "ivf-n8-t2-lists").map(st.snapshotId)
    val (m2, jobs) = jobsDuring {
      IvfIndex.buildStaged(st, corpus, nlist = 8, trainRounds = 2)
    }
    assert(jobs == 0, s"second build launched $jobs Spark jobs — a committed index retrained")
    assert(Seq("ivf-n8-t2-centroids", "ivf-n8-t2-lists").map(st.snapshotId) == snaps)
    assert(rows(IvfIndex.probe(m2, probes, k = 3, nprobe = 2)) == staged)
  }

  test("staged two-level IVF: probe == inline; rebuild runs zero jobs") {
    val st = fresh("ivf2")
    val m1 = IvfIndex.buildStagedTwoLevel(st, corpus, nsuper = 3, nsub = 4,
      trainRounds = 1, subTrainRounds = 1)
    val staged = rows(IvfIndex.probeTwoLevel(m1, probes, k = 3, nprobeSuper = 2, nprobe = 3))
    val inline = rows(IvfIndex.knnJoinTwoLevel(probes, corpus, k = 3,
      nsuper = 3, nsub = 4, nprobeSuper = 2, nprobe = 3,
      trainRounds = 1, subTrainRounds = 1))
    assert(staged == inline && staged.nonEmpty)
    val (m2, jobs) = jobsDuring {
      IvfIndex.buildStagedTwoLevel(st, corpus, nsuper = 3, nsub = 4,
        trainRounds = 1, subTrainRounds = 1)
    }
    assert(jobs == 0, s"second build launched $jobs Spark jobs")
    assert(rows(IvfIndex.probeTwoLevel(m2, probes, k = 3, nprobeSuper = 2, nprobe = 3)) == staged)
  }

  test("staged PQ: probe == inline adcTopK; rebuild runs zero jobs") {
    val st = fresh("pq")
    val m1 = PqIndex.buildStagedPq(st, corpus, pqTrainRounds = 1)
    val staged = rows(PqIndex.probePq(m1, probes, k = 3))
    val inline = rows(PqIndex.adcTopK(probes, corpus, k = 3, pqTrainRounds = 1))
    assert(staged == inline && staged.nonEmpty)
    val (m2, jobs) = jobsDuring {
      PqIndex.buildStagedPq(st, corpus, pqTrainRounds = 1)
    }
    assert(jobs == 0, s"second build launched $jobs Spark jobs")
    assert(rows(PqIndex.probePq(m2, probes, k = 3)) == staged)
  }

  test("staged IVF+PQ residual: probe == inline; rebuild runs zero jobs") {
    val st = fresh("ivfpq")
    val m1 = PqIndex.buildStagedIvfPq(st, corpus, nlist = 8,
      trainRounds = 1, pqTrainRounds = 1)
    val staged = rows(PqIndex.probeIvfPq(m1, probes, k = 3, nprobe = 2))
    val inline = rows(PqIndex.ivfAdcTopK(probes, corpus, k = 3, nlist = 8, nprobe = 2,
      trainRounds = 1, pqTrainRounds = 1))
    assert(staged == inline && staged.nonEmpty)
    val (_, jobs) = jobsDuring {
      PqIndex.buildStagedIvfPq(st, corpus, nlist = 8,
        trainRounds = 1, pqTrainRounds = 1)
    }
    assert(jobs == 0, s"second build launched $jobs Spark jobs")
  }

  test("staged two-level IVF + residual PQ: probe == inline ivf2AdcTopK; rebuild zero jobs") {
    val st = fresh("ivf2pq")
    val m1 = PqIndex.buildStagedIvf2Pq(st, corpus, nsuper = 3, nsub = 4,
      trainRounds = 1, subTrainRounds = 1, pqTrainRounds = 1)
    val staged = rows(PqIndex.probeIvf2Pq(m1, probes, k = 3, nprobeSuper = 2, nprobe = 3))
    val inline = rows(PqIndex.ivf2AdcTopK(probes, corpus, k = 3,
      nsuper = 3, nsub = 4, nprobeSuper = 2, nprobe = 3,
      trainRounds = 1, subTrainRounds = 1, pqTrainRounds = 1))
    assert(staged == inline && staged.nonEmpty)
    val (_, jobs) = jobsDuring {
      PqIndex.buildStagedIvf2Pq(st, corpus, nsuper = 3, nsub = 4,
        trainRounds = 1, subTrainRounds = 1, pqTrainRounds = 1)
    }
    assert(jobs == 0, s"second build launched $jobs Spark jobs")
  }

  test("composed IVF+PQ shares the flat index's committed quantizer stages") {
    val st = fresh("share")
    IvfIndex.buildStaged(st, corpus, nlist = 8, trainRounds = 1)
    val centsSnap = st.snapshotId("ivf-n8-t1-centroids")
    val listsSnap = st.snapshotId("ivf-n8-t1-lists")
    assert(centsSnap.isDefined && listsSnap.isDefined)
    // the composed build must REUSE those commits, never train a second
    // identical quantizer under a different stage name
    val m = PqIndex.buildStagedIvfPq(st, corpus, nlist = 8,
      trainRounds = 1, pqTrainRounds = 1)
    assert(st.snapshotId("ivf-n8-t1-centroids") == centsSnap &&
      st.snapshotId("ivf-n8-t1-lists") == listsSnap,
      "composed build recommitted the shared quantizer stages")
    assert(rows(PqIndex.probeIvfPq(m, probes, k = 3, nprobe = 2)).nonEmpty)
    // and the reverse order also shares: a fresh flat build over the
    // composed runner launches zero jobs
    val (_, jobs) = jobsDuring {
      IvfIndex.buildStaged(st, corpus, nlist = 8, trainRounds = 1)
    }
    assert(jobs == 0, s"flat build over shared stages launched $jobs jobs")
  }

  test("refined probe: exact re-rank over the compressed shortlist") {
    val st = fresh("refine")
    val m = PqIndex.buildStagedIvfPq(st, corpus, nlist = 8,
      trainRounds = 1, pqTrainRounds = 1)
    // (a) with full routing and a corpus-wide shortlist, the refine pass
    // recovers the EXACT top-k: quantization error only affects which
    // candidates reach the shortlist, and here all of them do
    val n = corpus.count().toInt
    val refinedFull = PqIndex.probeIvfPqRefined(m, probes, corpus,
      k = 3, kShort = n, nprobe = 8)
    val exact = AnnIndex.rankTopK(
      probes.select(col("vec_id").as("probe_id"),
          AnnIndex.quant(col("embedding")).as("pq"))
        .crossJoin(corpus.select(col("vec_id"),
          AnnIndex.quant(col("embedding")).as("vq")))
        .where(col("probe_id") =!= col("vec_id"))
        .select(col("probe_id"), col("vec_id"),
          AnnIndex.intDot(col("pq"), col("vq")).as("edot")),
      3, "edot")
    assert(rows(refinedFull) == rows(exact) && rows(exact).nonEmpty,
      "full-shortlist refine must equal the brute-force exact top-k")
    // (b) every reported edot IS the true integer dot of the pair
    val lies = PqIndex.probeIvfPqRefined(m, probes, corpus, k = 3, kShort = 12, nprobe = 2)
      .join(corpus.select(col("vec_id").as("probe_id"),
        AnnIndex.quant(col("embedding")).as("pq")), "probe_id")
      .join(corpus.select(col("vec_id"),
        AnnIndex.quant(col("embedding")).as("vq")), "vec_id")
      .where(col("edot") =!= AnnIndex.intDot(col("pq"), col("vq")))
      .count()
    assert(lies == 0L, s"$lies refined rows report a non-exact score")
    // (c) kShort == k degenerates to re-ranking ADC's own top-k set:
    // same pairs, possibly different order
    val adcPairs = rows(PqIndex.probeIvfPq(m, probes, k = 3, nprobe = 2)
      .select("probe_id", "vec_id"))
    val refPairs = rows(PqIndex.probeIvfPqRefined(m, probes, corpus,
      k = 3, kShort = 3, nprobe = 2).select("probe_id", "vec_id"))
    assert(refPairs == adcPairs)
    intercept[IllegalArgumentException] {
      PqIndex.probeIvfPqRefined(m, probes, corpus, k = 5, kShort = 3, nprobe = 2)
    }
  }

  test("two-level refined probe: exact scores; full shortlist over full routing == exact top-k") {
    val st = fresh("refine2")
    val m = PqIndex.buildStagedIvf2Pq(st, corpus, nsuper = 3, nsub = 4,
      trainRounds = 1, subTrainRounds = 1, pqTrainRounds = 1)
    val n = corpus.count().toInt
    // full routing (all supers, all subs) + corpus-wide shortlist ==
    // brute-force exact top-k, as in the flat case
    val refinedFull = PqIndex.probeIvf2PqRefined(m, probes, corpus,
      k = 3, kShort = n, nprobeSuper = 3, nprobe = 12)
    val exact = AnnIndex.rankTopK(
      probes.select(col("vec_id").as("probe_id"),
          AnnIndex.quant(col("embedding")).as("pq"))
        .crossJoin(corpus.select(col("vec_id"),
          AnnIndex.quant(col("embedding")).as("vq")))
        .where(col("probe_id") =!= col("vec_id"))
        .select(col("probe_id"), col("vec_id"),
          AnnIndex.intDot(col("pq"), col("vq")).as("edot")),
      3, "edot")
    assert(rows(refinedFull) == rows(exact) && rows(exact).nonEmpty)
    // narrow-shortlist pairs == the ADC top-k set re-ranked
    val adcPairs = rows(PqIndex.probeIvf2Pq(m, probes, k = 3, nprobeSuper = 2, nprobe = 3)
      .select("probe_id", "vec_id"))
    val refPairs = rows(PqIndex.probeIvf2PqRefined(m, probes, corpus,
      k = 3, kShort = 3, nprobeSuper = 2, nprobe = 3).select("probe_id", "vec_id"))
    assert(refPairs == adcPairs)
  }

  test("a recommitted upstream stage invalidates exactly the downstream cone") {
    val st = fresh("inval")
    IvfIndex.buildStaged(st, corpus, nlist = 4, trainRounds = 1)
    val lists0 = st.snapshotId("ivf-n4-t1-lists").get
    st.invalidate("ivf-n4-t1-centroids")
    IvfIndex.buildStaged(st, corpus, nlist = 4, trainRounds = 1)
    assert(st.snapshotId("ivf-n4-t1-lists").get > lists0,
      "lists stage must recompute when its centroid input recommits")
  }
}
