package graft.pipeline

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Rate-distortion contracts of the parameterized PQ: residual encoding
  * (vector minus its trained IVF list centroid) must spend the codebook
  * budget where the data is — reconstruction error strictly below the
  * raw-vector path on clustered data — and the canonical K=256 production
  * point must work through the same parameterized kernels. */
class PqResidualSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  val Dim = 64
  // clustered corpus (same construction family as IvfTrainSpec): 8 balls
  val clusterSizes = Seq(300, 60, 60, 60, 40, 40, 20, 20)
  def center(c: Int, d: Int): Double = ((c * 37 + d * 13) % 100) / 100.0
  lazy val corpus = {
    val rows = for {
      (sz, c) <- clusterSizes.zipWithIndex
      i <- 0 until sz
    } yield ((c * 1000 + i).toLong,
      Array.tabulate(Dim)(d => center(c, d) + (((c * 1000 + i) * (d + 7) * 2654435761L) % 101 - 50) * 0.001))
    rows.toDF("vec_id", "embedding").cache()
  }

  def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Σ over the corpus of ||vq - recon||² for a (vecs, codebooks) pair. */
  def sqErr(vecs: Map[Long, Array[Long]], cb: Array[Array[Array[Long]]],
            p: PqIndex.PqParams): Double =
    vecs.values.map { vq =>
      val codes = PqIndex.encodeQKernel(cb, vq, p)
      val recon = codes.zipWithIndex.flatMap { case (c, s) => cb(s)(c) }
      vq.zip(recon).map { case (a, b) => (a - b).toDouble * (a - b) }.sum
    }.sum

  def cbOf(vecs: Map[Long, Array[Long]], p: PqIndex.PqParams): Array[Array[Array[Long]]] = {
    val donors = vecs.keys.toSeq.sortBy(id => (md5hex(s"pq|$id"), id)).take(p.k)
    Array.tabulate(p.m, p.k)((s, j) => vecs(donors(j)).slice(s * p.subDim, (s + 1) * p.subDim))
  }

  lazy val rawVecs: Map[Long, Array[Long]] =
    corpus.select($"vec_id", AnnIndex.quant($"embedding".cast("array<double>")))
      .as[(Long, Seq[Long])].collect().map { case (id, v) => id -> v.toArray }.toMap

  lazy val residVecs: Map[Long, Array[Long]] = {
    val cents = IvfIndex.centroidTable(corpus, 16)
    val centMap = cents.select($"cid", $"cvq").as[(Long, Seq[Long])].collect()
      .map { case (c, v) => c -> v.toArray }.toMap
    IvfIndex.assign(corpus, cents).select($"vec_id", $"cid", $"vq")
      .as[(Long, Long, Seq[Long])].collect()
      .map { case (id, cid, vq) =>
        id -> vq.toArray.zip(centMap(cid)).map { case (x, c) => x - c } }.toMap
  }

  test("codebooksTrained == sequential per-subspace k-means oracle") {
    val p = PqIndex.Default
    val vecsDf = rawVecs.toSeq.toDF("vec_id", "vq")
    val got = PqIndex.codebooksTrainedQ(vecsDf, p, trainRounds = 2)
    // driver oracle: seed from md5-ranked donors, then 2 Lloyd's rounds
    // per subspace with floor-division means
    val donors = rawVecs.keys.toSeq.sortBy(id => (md5hex(s"pq|$id"), id)).take(p.k)
    var cb = Array.tabulate(p.m, p.k)((s, j) =>
      rawVecs(donors(j)).slice(s * p.subDim, (s + 1) * p.subDim))
    def sqd(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    for (_ <- 0 until 2) {
      val assigned = for { (_, vq) <- rawVecs.toSeq; s <- 0 until p.m } yield {
        val sv = vq.slice(s * p.subDim, (s + 1) * p.subDim)
        val code = (0 until p.k).map(j => (sqd(sv, cb(s)(j)), j)).min._2
        (s, code, sv)
      }
      val nu = cb.map(_.map(_.clone))
      assigned.groupBy(t => (t._1, t._2)).foreach { case ((s, j), members) =>
        val svs = members.map(_._3)
        for (i <- 0 until p.subDim)
          nu(s)(j)(i) = Math.floorDiv(svs.map(_(i)).sum, svs.size.toLong)
      }
      cb = nu
    }
    for (s <- 0 until p.m; j <- 0 until p.k)
      assert(got(s)(j).toSeq == cb(s)(j).toSeq, s"codeword ($s, $j)")
  }

  test("trained codebooks never fit worse than the sampled seed") {
    val p = PqIndex.Default
    val vecsDf = residVecs.toSeq.toDF("vec_id", "vq")
    val sampledErr = sqErr(residVecs, cbOf(residVecs, p), p)
    val trainedErr = sqErr(residVecs, PqIndex.codebooksTrainedQ(vecsDf, p, 2), p)
    info(f"sampled residual sq-err = $sampledErr%.3g, trained = $trainedErr%.3g")
    assert(trainedErr <= sampledErr,
      f"Lloyd's rounds must not worsen the fit: $trainedErr%.3g > $sampledErr%.3g")
  }

  test("residual encoding strictly reduces reconstruction error vs raw vectors") {
    val p = PqIndex.Default
    val rawErr = sqErr(rawVecs, cbOf(rawVecs, p), p)
    val residErr = sqErr(residVecs, cbOf(residVecs, p), p)
    info(f"raw-vector sq-err = $rawErr%.3g, residual sq-err = $residErr%.3g")
    assert(residErr < rawErr,
      f"residuals must fit the codebooks better: $residErr%.3g !< $rawErr%.3g")
  }

  test("K=256 parameterization: valid codes, error never above the K=16 point") {
    val p16 = PqIndex.PqParams(64, 8, 16)
    val p256 = PqIndex.PqParams(64, 8, 256)
    val cb256 = cbOf(residVecs, p256)
    assert(cb256.length == 8 && cb256.forall(_.length == 256))
    val codes = residVecs.values.take(50).map(v => PqIndex.encodeQKernel(cb256, v, p256))
    assert(codes.forall(cs => cs.length == 8 && cs.forall(c => c >= 0 && c < 256)))
    val e16 = sqErr(residVecs, cbOf(residVecs, p16), p16)
    val e256 = sqErr(residVecs, cb256, p256)
    info(f"residual sq-err K=16: $e16%.3g, K=256: $e256%.3g")
    assert(e256 <= e16, f"16x the codewords must not fit worse: $e256%.3g > $e16%.3g")
    // and the engine-side parameterized build produces the same codes
    val resid = residVecs.toSeq.toDF("vec_id", "vq")
    val engineCb = PqIndex.codebooksQ(resid, p256)
    val engineCodes = resid.select($"vec_id", PqIndex.encodeQUdf(engineCb, p256)($"vq"))
      .as[(Long, Seq[Int])].collect().toMap
    for ((id, v) <- residVecs.take(20))
      assert(engineCodes(id) == PqIndex.encodeQKernel(cb256, v, p256).toSeq, s"vec $id")
  }
}
