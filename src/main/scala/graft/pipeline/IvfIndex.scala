package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * IVF (inverted-file) ANN index — the coarse-quantizer companion to the
 * sign-LSH index in [[AnnIndex]]. Where LSH routes by code buckets whose
 * population it cannot control, IVF partitions the corpus into `nlist`
 * Voronoi lists around centroid vectors and probes only the `nprobe`
 * closest lists — candidate cost ≈ nprobe/nlist of the corpus by
 * construction, tunable independently of data geometry.
 *
 * Engine-portable determinism (the whole index has a DuckDB twin,
 * q_ann_ivf):
 *  - centroid selection: the `nlist` corpus vectors whose
 *    md5("ivf|" || vec_id) digest sorts first (a deterministic
 *    pseudo-random sample — real IVF refines these with k-means, which
 *    would also live driver-side; sampling keeps every step replayable in
 *    ANSI SQL while the routing/scan SHAPE is exactly IVF's).
 *  - assignment/routing metric: exact integer dot over the shared
 *    floor(v*1000) quantization (MIPS-flavored coarse quantization),
 *    ties broken toward the smaller centroid id — no floating-point
 *    reduction-order hazards in either engine.
 *
 * Scale shape at 10^12 rows: the centroid table is tiny (nlist ≲ √n,
 * capped here at broadcast size) and closed over by a per-row routing
 * kernel — corpus assignment is a zero-shuffle map, written once,
 * bucketed by `cid` (the index build). Probes explode to `nprobe` short
 * rows and meet the lists in ONE equi-join on `cid`; exact scoring touches
 * only the probed lists, and top-k is a window partitioned BY PROBE.
 * Hot lists (dense Voronoi cells) are ordinary join skew — AQE skew-join
 * splits them, the same contract as the flagship cell joins.
 */
object IvfIndex {

  /** Deterministic coarse quantizer: (cid, quantized centroid vector) for
    * the `nlist` md5-first corpus rows. Driver-side by design — the
    * centroid table is the broadcast model every IVF variant carries;
    * `nlist` is require-bounded so this can never become a driver scan. */
  def centroids(corpus: DataFrame, nlist: Int): Array[(Long, Array[Long])] = {
    require(nlist > 0 && nlist <= 1024,
      s"nlist=$nlist: the centroid table must stay broadcast-sized")
    AnnIndex.md5Ranked(corpus, "ivf", nlist)
      .select(col("vec_id"), AnnIndex.quant(AnnIndex.embD).as("vq"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1)
  }

  /** Routing kernel: ids of the `nprobe` centroids with the largest exact
    * integer dot against the quantized embedding (ties -> smaller cid). */
  def routeKernel(cents: Array[(Long, Array[Long])], emb: Seq[Double],
                  nprobe: Int): Array[Long] = {
    val scored = cents.map { case (cid, cv) =>
      var s = 0L
      var i = 0
      val n = math.min(cv.length, emb.length)
      while (i < n) { s += math.floor(emb(i) * 1000).toLong * cv(i); i += 1 }
      (cid, s)
    }
    if (nprobe == 1) {
      // assignment is the per-row hot path of the index build — argmax
      // scan, no per-row sort/allocation (cents is already cid-sorted, so
      // strict > keeps the smaller-cid tie-break)
      var best = scored(0)
      var i = 1
      while (i < scored.length) {
        if (scored(i)._2 > best._2) best = scored(i)
        i += 1
      }
      Array(best._1)
    } else scored.sortBy { case (cid, d) => (-d, cid) }.take(nprobe).map(_._1)
  }

  /** Column form of [[routeKernel]] — a per-row map over the embedding
    * (broadcast centroids in the closure, zero shuffle). */
  def routeUdf(cents: Array[(Long, Array[Long])], nprobe: Int) =
    udf { (emb: Seq[Double]) => routeKernel(cents, emb, nprobe) }

  /** Index build: each corpus vector in exactly ONE list —
    * (vec_id, cid, vq). At scale this is the relation you persist bucketed
    * by `cid`; here it feeds the join directly. */
  def assign(corpus: DataFrame, cents: Array[(Long, Array[Long])]): DataFrame =
    corpus.select(col("vec_id"),
      routeUdf(cents, 1)(AnnIndex.embD)(0).as("cid"),
      AnnIndex.quant(AnnIndex.embD).as("vq"))

  /** Batch IVF kNN: probes route to their `nprobe` nearest lists, meet the
    * assigned corpus in one equi-join on `cid`, candidates are scored with
    * the exact integer dot, per-probe top-k by (dot desc, vec_id). Output
    * (probe_id, rank, vec_id, dot) — same contract as [[AnnIndex.knnJoin]].
    * Self-matches (same vec_id) are excluded.
    *
    * Recall contract, stated not hidden: a true neighbor is found iff its
    * assigned list is among the probe's `nprobe` routes — near-duplicates
    * route with their original w.h.p. (their centroid dots differ by
    * O(nudge·|centroid|)), and raising `nprobe` trades linearly more scan
    * for recall, the standard IVF dial. Exhaustive guarantees stay with
    * the exact scans (q_ann_mips/q_ann_cosine). */
  def knnJoin(probes: DataFrame, corpus: DataFrame, k: Int,
              nlist: Int, nprobe: Int): DataFrame = {
    require(nprobe >= 1 && nprobe <= nlist, s"nprobe=$nprobe out of [1, $nlist]")
    val cents = centroids(corpus, nlist)
    val lists = assign(corpus, cents)
    val pr = probes.select(col("vec_id").as("probe_id"),
        explode(routeUdf(cents, nprobe)(AnnIndex.embD)).as("cid"),
        AnnIndex.quant(AnnIndex.embD).as("pq"))
    val scored = lists.join(pr, "cid")
      .where(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        AnnIndex.intDot(col("vq"), col("pq")).as("dot"))
    AnnIndex.rankTopK(scored, k, "dot")
  }
}
