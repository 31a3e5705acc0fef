package graft.pipeline

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The trained coarse quantizer's reason to exist: on CLUSTERED embeddings
  * (the realistic regime — random sampling is fine on the uniform synthetic
  * corpus) md5-sampled centroids give unbalanced Voronoi lists, which is
  * exactly the hot-list skew the index exists to avoid. The deterministic
  * Lloyd's rounds must (a) bound max/mean list population below the sampled
  * baseline and (b) never lose recall against it. */
class IvfTrainSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  val Dim = 64
  val NList = 8
  // 8 well-separated clusters with skewed sizes (one dominant) — the shape
  // that makes sampled centroids pile onto the big cluster
  val clusterSizes = Seq(300, 60, 60, 60, 40, 40, 20, 20)
  def center(c: Int, d: Int): Double = ((c * 37 + d * 13) % 100) / 100.0

  lazy val corpus = {
    val rows = for {
      (sz, c) <- clusterSizes.zipWithIndex
      i <- 0 until sz
    } yield ((c * 1000 + i).toLong,
      // per-dim pseudo-random jitter (±0.05, decorrelated across dims so
      // each cluster is a ball Lloyd's can meaningfully partition, not a
      // degenerate line)
      Array.tabulate(Dim)(d => center(c, d) + (((c * 1000 + i) * (d + 7) * 2654435761L) % 101 - 50) * 0.001))
    rows.toDF("vec_id", "embedding").cache()
  }
  val n = clusterSizes.sum

  def listSizes(trainRounds: Int): Array[Long] = {
    val cents = IvfIndex.centroidTable(corpus, NList, trainRounds)
    IvfIndex.assign(corpus, cents).groupBy($"cid").count()
      .select($"count").as[Long].collect().sorted
  }

  /** recall@5 of own-cluster neighbors for one probe per cluster. */
  def recallAt5(trainRounds: Int): Double = {
    val probes = corpus.where($"vec_id" % 1000 === 7)
    val top = IvfIndex.knnJoin(probes, corpus, k = 5, NList, nprobe = 2, trainRounds)
      .select($"probe_id", $"vec_id").as[(Long, Long)].collect()
    val hits = top.count { case (p, v) => v / 1000 == p / 1000 }
    hits.toDouble / (clusterSizes.length * 5)
  }

  test("k-means rounds bound max/mean list population on clustered data") {
    val sampled = listSizes(0)
    val trained = listSizes(2)
    val mean = n.toDouble / NList
    val sampledRatio = sampled.max / mean
    val trainedRatio = trained.max / mean
    info(f"sampled max/mean = $sampledRatio%.2f (sizes ${sampled.mkString(",")})")
    info(f"trained max/mean = $trainedRatio%.2f (sizes ${trained.mkString(",")})")
    assert(trainedRatio < sampledRatio,
      f"training must improve balance: $trainedRatio%.2f !< $sampledRatio%.2f")
    assert(trainedRatio <= 3.0,
      f"trained max/mean $trainedRatio%.2f unbounded — quantizer did not spread")
  }

  test("nlist past the old 1024 closure cap: 2048 lists build and route") {
    // the r3 build require-failed at nlist > 1024 (centroid array in a UDF
    // closure); the broadcast-table join must carry √n-regime list counts
    // modulus > corpus size so all 4096 vectors are pairwise distinct
    // (a small modulus collapses ids mod p onto the same vector and lists
    // merge by the tie-break, undercounting occupancy)
    val big = spark.range(4096).select($"id".as("vec_id"),
      expr("transform(sequence(0, 63), d -> CAST(pmod(id * (d + 3) * 2654435761 + id, 100003) AS DOUBLE) / 100003.0)")
        .as("embedding"))
    val cents = IvfIndex.centroidTable(big, nlist = 2048, trainRounds = 0)
    assert(cents.count() == 2048)
    val lists = IvfIndex.assign(big, cents)
    assert(lists.count() == 4096, "assignment stays total at 2048 lists")
    assert(lists.select($"cid").distinct().count() > 1024,
      "routing uses the full list space beyond the old cap")
    val top = IvfIndex.knnJoin(big.where($"vec_id" < 3), big,
      k = 2, nlist = 2048, nprobe = 4, trainRounds = 0)
    assert(top.count() > 0, "probing still returns candidates")
  }

  test("trained recall@5 >= the sampled baseline, and is high on clustered data") {
    val r0 = recallAt5(0)
    val r2 = recallAt5(2)
    info(f"recall@5 sampled=$r0%.2f trained=$r2%.2f")
    assert(r2 >= r0, f"training must not lose recall: $r2%.2f < $r0%.2f")
    assert(r2 >= 0.9, f"trained recall@5 $r2%.2f too low for well-separated clusters")
  }

  // ADVICE r4 (medium): the mean update must be PER POSITION — the twin's
  // per-(cid, pos) LEFT JOIN + COALESCE — never a whole-array replacement
  // that truncates a trained centroid to its members' max length (or grows
  // it past the seed's) on a mixed-dimension corpus. Pinned against an
  // independent sequential model of the twin's round semantics.
  test("ragged corpus: trained centroids keep exactly the seed's positions, twin values") {
    // lengths deliberately mixed: 2, 3, 4 dims; values spread so both
    // seeds pick up members of both lengths
    val raggedRows: Seq[(Long, Seq[Double])] = Seq(
      1L -> Seq(0.0, 0.0), 2L -> Seq(0.01, 0.02, 0.9), 3L -> Seq(0.02, 0.01),
      4L -> Seq(1.0, 1.0, 1.0, 1.0), 5L -> Seq(0.98, 1.01), 6L -> Seq(1.01, 0.97, 0.5))
    val ragged = raggedRows.toDF("vec_id", "embedding")
    val nlist = 2
    // sequential model, twin semantics throughout: quantize floor(v*1000);
    // md5("ivf|" || id) seeding; assignment d = sum over SHARED positions
    // of (v-c)^2 (join-on-pos); means per (cid, pos) over members having
    // that pos; new centroid = seed positions only, coalesce(mean, old)
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val q: Map[Long, Array[Long]] = raggedRows.toMap.map { case (id, v) =>
      id -> v.map(x => math.floor(x * 1000).toLong).toArray }
    val seedIds = raggedRows.map(_._1).sortBy(id => (md5hex(s"ivf|$id"), id)).take(nlist)
    var model: Map[Long, Array[Long]] = seedIds.map(id => id -> q(id).clone()).toMap
    for (_ <- 0 until 2) {
      def d2(v: Array[Long], c: Array[Long]): Long =
        (0 until math.min(v.length, c.length)).map(i => (v(i) - c(i)) * (v(i) - c(i))).sum
      val assigned: Map[Long, Long] = q.map { case (id, v) =>
        id -> model.toSeq.map { case (cid, c) => (d2(v, c), cid) }.min._2 }
      model = model.map { case (cid, c) =>
        val members = assigned.collect { case (id, a) if a == cid => q(id) }.toSeq
        cid -> Array.tabulate(c.length) { pos =>
          val vals = members.filter(_.length > pos).map(_(pos))
          if (vals.isEmpty) c(pos) else Math.floorDiv(vals.sum, vals.length) }
      }
    }
    val trained = IvfIndex.centroidTable(ragged, nlist, trainRounds = 2)
      .select($"cid", $"cvq").as[(Long, Seq[Long])].collect().toMap
    assert(trained.keySet == model.keySet)
    for ((cid, c) <- model) {
      assert(trained(cid).length == c.length,
        s"cid=$cid: trained length ${trained(cid).length} != seed length ${c.length}")
      assert(trained(cid) == c.toSeq, s"cid=$cid: ${trained(cid)} != ${c.toSeq}")
    }
  }
}
