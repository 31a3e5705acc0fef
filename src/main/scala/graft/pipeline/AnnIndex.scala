package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor index over an embedding column: random-
 * hyperplane (sign) LSH with chunk-banded bucket routing — the scale path
 * next to the exact brute-force scan (SparkEntry q_ann_mips/q_ann_cosine).
 *
 * Everything is integer-exact and md5-derived, so the full index —
 * hyperplane coefficients, sign codes, chunk routing, candidate set and
 * scoring — has a bit-identical DuckDB twin (q_ann_lsh is oracle-checked):
 *
 *  - hyperplane j, dim i coefficient: hq(j,i) = h60("hp|j|i") % 2001 - 1000
 *    (integer in [-1000, 1000]).
 *  - embedding quantization: vq_i = floor(v_i * 1000) (same as the exact
 *    queries), so code bit j = (Σ vq_i · hq(j,i)) > 0 is exact integer math,
 *    independent of summation order.
 *  - routing: the 16-bit code splits into 4 chunks of 4 bits; candidates
 *    share at least one (chunk, value) with the probe. Expected candidate
 *    fraction for unrelated vectors ≈ 1-(1-2^-4)^4 ≈ 23%; vectors within
 *    a few code bits of the probe are found with near-certainty (recall →
 *    1 as cosine → 1; AnnIndexSpec plants a near-dup cluster and asserts
 *    full recall + a bounded candidate fraction).
 *
 * Honesty note (measured on the driver corpora): the synthetic embeddings'
 * true top-10 cosines are only ~0.25-0.4, where sign-LSH recall is weak by
 * construction — the operator targets near-dup-strength similarity; the
 * exact scan remains the oracle for weak-similarity top-k.
 */
object AnnIndex {
  val Planes = 16
  val Chunks = 4
  val ChunkBits = 4 // Planes / Chunks

  /** Integer hyperplane coefficients, identical to the SQL twin. */
  def planeCoeffs(dim: Int): Array[Array[Long]] =
    Array.tabulate(Planes, dim)((j, i) => Dedup.md5h60(s"hp|$j|$i") % 2001L - 1000L)

  /** 16-bit sign code of an embedding under the fixed hyperplanes. */
  def codeUdf(dim: Int) = {
    val hp = planeCoeffs(dim)
    udf { (emb: Seq[Float]) =>
      var code = 0L
      var j = 0
      while (j < Planes) {
        var s = 0L
        var i = 0
        val n = math.min(dim, emb.length)
        while (i < n) {
          s += math.floor(emb(i).toDouble * 1000).toLong * hp(j)(i)
          i += 1
        }
        if (s > 0) code |= 1L << j
        j += 1
      }
      code
    }
  }

  /** Integer-quantized embedding — shared with the exact-scan queries. */
  def quant(emb: Column): Column =
    transform(emb, v => floor(v.cast("double") * 1000).cast("long"))

  /** Exact integer array dot — order-free, engine-portable. */
  def intDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** (vec_id, vq, c, ck): one row per (vector, code chunk) — the single
    * source of the chunk-routing construction for topK and candidates. */
  private def chunked(emb: DataFrame, dim: Int): DataFrame = {
    val coded = emb.select(col("vec_id"), quant(col("embedding")).as("vq"),
      codeUdf(dim)(col("embedding")).as("code"))
    val chunkStructs = array((0 until Chunks).map { c =>
      struct(lit(c).as("c"),
        shiftrightunsigned(col("code"), c * ChunkBits).bitwiseAND(lit((1L << ChunkBits) - 1)).as("ck"))
    }: _*)
    coded.select(col("vec_id"), col("vq"), explode(chunkStructs).as("cs"))
      .select(col("vec_id"), col("vq"), col("cs.c").as("c"), col("cs.ck").as("ck"))
      .cache() // feeds both the probe lookup and the scan side; callers'
               // sessions release via clearCache between queries
  }

  /** Top-k by integer-quantized inner product among LSH candidates of the
    * probe vector. Scale shape: per-row code map (no shuffle), chunk
    * explode (4 short rows/vector), broadcast semi-join on the probe's 4
    * chunk keys, exact scoring of candidates only, TakeOrdered top-k. */
  def topK(emb: DataFrame, probeVecId: Long, k: Int, dim: Int): DataFrame = {
    val ch = chunked(emb, dim)
    val probeChunks = ch.where(col("vec_id") === probeVecId)
      .select(col("c"), col("ck"), col("vq").as("qq"))
    val cands = ch.where(col("vec_id") =!= probeVecId)
      .join(broadcast(probeChunks), Seq("c", "ck"))
      .groupBy(col("vec_id"))
      .agg(first(col("vq")).as("vq"), first(col("qq")).as("qq"))
    cands.select(col("vec_id"), intDot(col("vq"), col("qq")).as("dot"))
      .orderBy(col("dot").desc, col("vec_id")).limit(k)
  }

  /** Candidate set only (for recall/fraction audits). */
  def candidates(emb: DataFrame, probeVecId: Long, dim: Int): DataFrame = {
    val ch = chunked(emb, dim)
    val probeChunks = ch.where(col("vec_id") === probeVecId).select(col("c"), col("ck"))
    ch.where(col("vec_id") =!= probeVecId)
      .join(broadcast(probeChunks), Seq("c", "ck"))
      .select(col("vec_id")).distinct()
  }
}
