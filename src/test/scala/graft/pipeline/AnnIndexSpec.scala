package graft.pipeline

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sign-LSH ANN index contract: full recall on near-dup-strength neighbors
  * (a planted cluster), a SUB-LINEAR candidate fraction (<2% — the r2
  * 4-bit-chunk index was a 23% constant-fraction scan), exact agreement
  * with brute force restricted to the candidate set, and the batch
  * knnJoin == per-probe topK. */
class AnnIndexSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"
  lazy val base = spark.read.parquet(s"$sf/embeddings.parquet")

  /** Corpus + 5 planted near-dups of vec 0 (tiny deterministic per-dim
    * nudges — cosine > 0.999, code hamming ~0), ids 100000+i. */
  lazy val planted = {
    val q = base.where($"vec_id" === 0).select($"embedding").head().getSeq[Float](0)
    val dups = (0 until 5).map { i =>
      (100000L + i, q.zipWithIndex.map { case (v, d) =>
        v + (if ((d + i) % 7 == 0) 0.003f else -0.002f) }.toArray)
    }
    base.select($"vec_id", $"embedding")
      .unionByName(dups.toDF("vec_id", "embedding"))
      .cache()
  }

  test("planted near-dup cluster: full recall through the LSH buckets") {
    val cands = AnnIndex.candidates(planted, probeVecId = 0, dim = 64)
      .as[Long].collect().toSet
    for (i <- 0 until 5)
      assert(cands.contains(100000L + i), s"planted dup ${100000 + i} missed")
    val top = AnnIndex.topK(planted, probeVecId = 0, k = 5, dim = 64)
      .select($"vec_id").as[Long].collect().toSet
    assert(top == (0 until 5).map(100000L + _).toSet, s"top-5 should be the planted cluster: $top")
  }

  test("candidate fraction is sub-linear routing (<2%), not a scan") {
    val n = planted.where($"vec_id" =!= 0).count()
    val c = AnnIndex.candidates(planted, probeVecId = 0, dim = 64).count()
    val frac = c.toDouble / n
    assert(frac < 0.02, f"candidate fraction $frac%.4f too high — index degenerated toward a scan")
    assert(c >= 5, "the planted near-dups must be candidates")
    // the raw synthetic corpus has NO near-dup-strength neighbors of vec 0:
    // an honest sub-linear index returns (close to) nothing on it
    val raw = AnnIndex.candidates(base, probeVecId = 0, dim = 64).count()
    assert(raw <= n / 50, s"raw-corpus candidates $raw should be near zero")
  }

  test("minimap: canvas dims, per-tile mean-color pixels, png roundtrip") {
    val w = graft.tables.SyntheticWorld.testWorld
    val images = graft.tables.SyntheticWorld.images(spark, w)
    val (bw, bs, be, bn) = w.bbox
    val cfg = Pipelines.Config(z = w.z, bbox = (bw, bs, be, bn))
    val (h, wid, png) = Minimap.render(images, cfg)
    assert(h == w.gridH + 1 && wid == w.gridW + 1, s"canvas ${h}x$wid")
    val raw = graft.core.ImageCodec.decode(png)
    assert(raw.h == h && raw.w == wid)
    // pixel (0,0) = truncated mean color of the corner tile
    val corner = graft.core.CellId.pack(w.z, w.tx0, w.ty0)
    val bytes = images.where($"cell_id" === corner).select($"bytes").head().getAs[Array[Byte]](0)
    val (mb, mg, mr) = graft.core.ImageCodec.meanColor(graft.core.ImageCodec.decode(bytes))
    assert((raw.bgr(0) & 0xFF) == mb.toInt && (raw.bgr(1) & 0xFF) == mg.toInt &&
      (raw.bgr(2) & 0xFF) == mr.toInt)
  }

  test("LSH top-k == brute force restricted to the candidate set") {
    val cands = AnnIndex.candidates(planted, probeVecId = 0, dim = 64)
    def quant(c: org.apache.spark.sql.Column) =
      transform(c, v => floor(v.cast("double") * 1000).cast("long"))
    val qvec = planted.where($"vec_id" === 0).select(quant($"embedding").as("qq"))
    val brute = planted.join(cands, "vec_id")
      .crossJoin(broadcast(qvec))
      .select($"vec_id", aggregate(zip_with(quant($"embedding"), $"qq",
        (x, y) => x * y), lit(0L), (a, x) => a + x).as("dot"))
      .orderBy($"dot".desc, $"vec_id").limit(10)
      .as[(Long, Long)].collect().toSeq
    val lsh = AnnIndex.topK(planted, probeVecId = 0, k = 10, dim = 64)
      .as[(Long, Long)].collect().toSeq
    assert(lsh == brute)
    assert(lsh.nonEmpty)
  }

  test("batch knnJoin == per-probe topK, one routing join for all probes") {
    val probes = planted.where($"vec_id" < 5)
    val kj = AnnIndex.knnJoin(probes, planted, k = 3, dim = 64)
      .select($"probe_id", $"rank", $"vec_id")
      .as[(Long, Int, Long)].collect().toSeq.sorted
    val perProbe = (0L until 5L).flatMap { p =>
      AnnIndex.topK(planted, p, 3, 64)
        .select(lit(p).as("probe_id"), $"vec_id").as[(Long, Long)].collect()
        .zipWithIndex.map { case ((pid, vid), r) => (pid, r + 1, vid) }
    }.sorted
    assert(kj == perProbe)
    // probe 0's rank list is exactly its planted cluster's top-3
    val p0 = kj.filter(_._1 == 0L).map(_._3)
    assert(p0.forall(v => v >= 100000L && v < 100005L), s"probe 0 neighbors: $p0")
  }

  test("mixed-dimension corpora: intDot sums shared positions, never NULL") {
    // a 48-dim corpus row among 64-dim vectors: zip_with null-pads the
    // shorter side, and an unguarded product lattice turns the whole dot
    // NULL (sorting last) — the SQL twins join on shared pos and sum a
    // partial dot instead; the engine must match that semantics
    val full = base.where($"vec_id" === 1).select($"embedding").head().getSeq[Float](0)
      .map(_.toDouble)
    val short48 = full.take(48)
    val corpus = base.select($"vec_id", expr("transform(embedding, v -> CAST(v AS DOUBLE))").as("embedding"))
      .unionByName(Seq((600000L, short48)).toDF("vec_id", "embedding"))
    val dots = corpus.where($"vec_id".isin(1L, 600000L))
      .select($"vec_id", AnnIndex.intDot(
        AnnIndex.quant($"embedding"),
        AnnIndex.quant(typedLit(full))).as("dot"))
      .as[(Long, Long)].collect().toMap
    def q(v: Seq[Double]) = v.map(x => math.floor(x * 1000).toLong)
    val expShort = q(short48).zip(q(full)).map { case (a, b) => a * b }.sum
    val expFull = q(full).zip(q(full)).map { case (a, b) => a * b }.sum
    assert(dots(600000L) == expShort, "short row must score its partial dot, not NULL")
    assert(dots(1L) == expFull)
    // and through the batch join: every emitted dot is a concrete partial
    // sum (never NULL-sorted-last); recall of a truncated probe is not
    // part of the LSH contract, so only the scoring semantics is pinned
    val kj = AnnIndex.knnJoin(corpus.where($"vec_id" === 1L), corpus, k = 5, dim = 64)
    assert(kj.where($"dot".isNull).count() == 0, "no NULL dots in a mixed-dim corpus")
  }

  test("semantic dedup: nearDupPairs routes all-pairs through buckets; clusters keep-min") {
    val pairs = AnnIndex.nearDupPairs(planted, dim = 64, minCosFp = 999000L)
      .as[(Long, Long, Long)].collect()
    // only the planted cluster is near-dup-strength similar; every pair is
    // inside {0, 100000..100004}
    val members = Set(0L) ++ (0 until 5).map(100000L + _)
    assert(pairs.nonEmpty)
    assert(pairs.forall(p => members.contains(p._1) && members.contains(p._2)),
      s"unexpected near-dup pairs: ${pairs.filterNot(p => members.contains(p._1)).take(3).toSeq}")
    val resolved = Dedup.resolveClusters(
        AnnIndex.nearDupPairs(planted, 64, 999000L).select($"ida", $"idb"))
      .as[(Long, Long, Long)].collect()
    assert(resolved.map(_._1).toSet == members, "whole cluster resolved")
    assert(resolved.forall(_._2 == 0L), "component representative is the original vector")
    assert(resolved.count(_._3 == 1L) == 1 && resolved.find(_._3 == 1L).get._1 == 0L,
      "keep exactly the original")
  }

  test("multi-probe: guaranteed recall at code hamming 4..7, still sub-linear") {
    import org.apache.spark.sql.functions.{col, expr}
    // kernel-level search for a deterministic nudge that lands the planted
    // vector's code at hamming 4..7 from the probe's — outside the
    // single-probe pigeonhole guarantee, inside the multi-probe one
    val hp = AnnIndex.planeCoeffs(64)
    val q = base.where($"vec_id" === 0).select($"embedding").head().getSeq[Float](0)
      .map(_.toDouble)
    def hamming(a: Array[Long], b: Array[Long]): Int =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    val qCode = AnnIndex.chunkCodesKernel(hp, q, 64)
    val nudged = (1 to 400).iterator.map { s =>
      q.zipWithIndex.map { case (v, d) => v + (if (d % 3 == 0) s * 0.002 else -s * 0.001) }
    }.find { v => val h = hamming(qCode, AnnIndex.chunkCodesKernel(hp, v, 64)); h >= 4 && h <= 7 }
    assert(nudged.isDefined, "no nudge scale landed in hamming 4..7 — widen the search")
    val ham = hamming(qCode, AnnIndex.chunkCodesKernel(hp, nudged.get, 64))

    val corpus = base.select($"vec_id", expr("transform(embedding, v -> CAST(v AS DOUBLE))").as("embedding"))
      .unionByName(Seq((500000L, nudged.get)).toDF("vec_id", "embedding"))
    val probes = corpus.where($"vec_id" === 0)
    val single = AnnIndex.knnJoin(probes, corpus, k = 10, dim = 64)
      .select($"vec_id").as[Long].collect().toSet
    val multi = AnnIndex.knnJoin(probes, corpus, k = 10, dim = 64, multiProbe = true)
      .select($"vec_id").as[Long].collect().toSet
    assert(multi.contains(500000L),
      s"multi-probe must find the hamming-$ham neighbor (single-probe found it: ${single.contains(500000L)})")
    assert(multi.size >= single.size, "multi-probe candidates are a superset")
    // still routing, not a scan: candidate fraction stays far below 5%
    val pch = AnnIndex.chunkedFlips(probes, 64)
      .select(col("vec_id").as("probe_id"), col("c"), col("ck"))
    val candFrac = AnnIndex.chunked(corpus, 64).join(pch, Seq("c", "ck"))
      .where($"vec_id" =!= $"probe_id").select($"vec_id").distinct().count().toDouble /
      (corpus.count() - 1)
    assert(candFrac < 0.05, f"multi-probe candidate fraction $candFrac%.4f too high")
  }
}
