package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Product quantization (PQ) — the embedding-compression layer of the ANN
 * stack (the canonical billion-scale recipe is IVF routing + PQ-compressed
 * residual scoring; here PQ composes with [[IvfIndex]]/[[AnnIndex]] as the
 * scoring-side companion). A 64-dim vector compresses to M=8 one-byte-ish
 * codes: the vector splits into 8 contiguous 8-dim subvectors, each
 * replaced by the id of its nearest codeword (K=16 per subspace) — 64
 * floats become 8 small ints, a ~32x memory cut, and probe scoring becomes
 * 8 table lookups per corpus row (ADC — asymmetric distance computation:
 * the probe stays exact, only the corpus side is quantized).
 *
 * Engine-portable determinism (full DuckDB twin, q_ann_pq):
 *  - codebooks: the K corpus vectors whose md5("pq|" || vec_id) digest
 *    sorts first donate their subvector slices as codewords (deterministic
 *    sampling in place of k-means training, same trade as [[IvfIndex]] —
 *    the compression/scoring SHAPE is exactly PQ's and every step replays
 *    in ANSI SQL).
 *  - encoding metric: exact integer squared-L2 over the shared
 *    floor(v*1000) quantization, ties toward the smaller codeword id.
 *  - ADC score: sum over subspaces of the exact integer dot between the
 *    probe's subvector and the corpus row's codeword.
 *
 * Scale shape at 10^12 rows: codebooks are tiny (K·M subvectors) and
 * closed over by a per-row encode kernel — the index build is a
 * zero-shuffle map (persist the 8 codes, drop the embedding). Probe-side
 * LUTs are K·M integer dots per probe, built relationally and joined to
 * the exploded corpus codes on (subspace, code) — probes broadcast, the
 * corpus never shuffles before the per-probe top-k.
 */
object PqIndex {
  val Dim = 64
  val M = 8        // subspaces
  val SubDim = 8   // Dim / M
  val K = 16       // codewords per subspace

  /** Deterministic codebooks: codeword j of subspace s is the s-th 8-dim
    * slice (quantized) of the j-th md5-ranked corpus vector. Returned as
    * cb(s)(j) = Array[Long](SubDim). Driver-side by design (the broadcast
    * model every PQ variant carries). */
  def codebooks(corpus: DataFrame): Array[Array[Array[Long]]] = {
    val donors = AnnIndex.md5Ranked(corpus, "pq", K)
      .select(AnnIndex.quant(AnnIndex.embD).as("vq"))
      .collect()
      .map(_.getSeq[Long](0).toArray)
    require(donors.length == K,
      s"PQ codebooks need >= $K corpus vectors to sample, got ${donors.length}")
    Array.tabulate(M, K)((s, j) => donors(j).slice(s * SubDim, (s + 1) * SubDim))
  }

  /** Encode kernel: the M nearest-codeword ids (exact integer squared-L2,
    * ties -> smaller j) of one embedding. */
  def encodeKernel(cb: Array[Array[Array[Long]]], emb: Seq[Double]): Array[Int] = {
    val vq = Array.tabulate(math.min(Dim, emb.length))(i => math.floor(emb(i) * 1000).toLong)
    Array.tabulate(M) { s =>
      var best = 0
      var bestD = Long.MaxValue
      var j = 0
      while (j < K) {
        var d = 0L
        var i = 0
        while (i < SubDim) {
          val base = s * SubDim + i
          // positions past the embedding's length contribute NO term —
          // the same semantics as the SQL twin's join on existing pos rows
          // (and as IvfIndex.intSqDist's missing-position rule); zero-substituting
          // would diverge from the oracle for short embeddings
          if (base < vq.length) {
            val diff = vq(base) - cb(s)(j)(i)
            d += diff * diff
          }
          i += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      best
    }
  }

  /** Column form of [[encodeKernel]] — the zero-shuffle index build. */
  def encodeUdf(cb: Array[Array[Array[Long]]]) =
    udf { (emb: Seq[Double]) => encodeKernel(cb, emb) }

  /** Batch ADC top-k: corpus rows carry only their M codes; each probe
    * builds a (subspace, codeword) -> exact-integer-dot lookup table
    * relationally, the exploded codes meet the LUT in ONE equi-join on
    * (s, code), and the per-probe score is the sum over subspaces —
    * followed by a window top-k BY PROBE. Output (probe_id, rank, vec_id,
    * score); self-matches excluded.
    *
    * Approximation contract, stated not hidden: score is the exact dot
    * against the QUANTIZED corpus row (the codeword centroids), so ranking
    * fidelity degrades with quantization error — near-duplicates of a
    * codebook donor rank exactly; far vectors coarsely. Exhaustive
    * guarantees stay with the exact scans; PQ buys the 32x memory cut that
    * makes a 10^12-row scoring pass feasible at all. */
  /** Corpus codes relation: (vec_id, s, code) — 8 short rows per row. */
  private def corpusCodes(corpus: DataFrame, cb: Array[Array[Array[Long]]]): DataFrame =
    corpus.select(col("vec_id"),
      posexplode(encodeUdf(cb)(AnnIndex.embD)).as(Seq("s", "code")))

  /** Probe LUTs: (probe_id, s, code, pdot) — K·M exact integer dots per
    * probe between the probe's subvector and every codeword. */
  private def probeLuts(probes: DataFrame, cb: Array[Array[Array[Long]]]): DataFrame = {
    val cbRows = cb.zipWithIndex.flatMap { case (sub, s) =>
      sub.zipWithIndex.map { case (cw, j) => (s, j, cw.toSeq) }
    }.toSeq
    import probes.sparkSession.implicits._
    val cbDf = cbRows.toDF("s", "code", "cw")
    probes
      .select(col("vec_id").as("probe_id"), AnnIndex.quant(AnnIndex.embD).as("pq"))
      .crossJoin(broadcast(cbDf))
      .select(col("probe_id"), col("s"), col("code"),
        AnnIndex.intDot(slice(col("pq"), col("s") * lit(SubDim) + 1, lit(SubDim)), col("cw")).as("pdot"))
  }

  def adcTopK(probes: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val cb = codebooks(corpus)
    val scored = corpusCodes(corpus, cb).join(broadcast(probeLuts(probes, cb)), Seq("s", "code"))
      .where(col("vec_id") =!= col("probe_id"))
      .groupBy(col("probe_id"), col("vec_id")).agg(sum(col("pdot")).as("score"))
    AnnIndex.rankTopK(scored, k, "score")
  }

  /** IVF+PQ — the composed billion-scale recipe: probes route through the
    * IVF coarse quantizer to their `nprobe` lists (sub-linear candidate
    * selection, [[IvfIndex]]), and ONLY those candidates are scored with
    * the PQ lookup tables (compressed scoring, no embedding access on the
    * corpus side). At 10^12 rows this is the pass that fits: the corpus
    * carries one int list id + 8 code ids per row; both the candidate join
    * and the score join are equi-joins with broadcast probe sides. */
  def ivfAdcTopK(probes: DataFrame, corpus: DataFrame, k: Int,
                 nlist: Int, nprobe: Int, trainRounds: Int = 2): DataFrame = {
    require(nprobe >= 1 && nprobe <= nlist, s"nprobe=$nprobe out of [1, $nlist]")
    val cents = IvfIndex.centroidTable(corpus, nlist, trainRounds)
    val cb = codebooks(corpus)
    val assigned = IvfIndex.assign(corpus, cents).select(col("vec_id"), col("cid"))
    val pr = IvfIndex.route(probes, cents, nprobe).select(col("probe_id"), col("cid"))
    val cand = assigned.join(broadcast(pr), "cid")
      .where(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"))
    val scored = cand.join(corpusCodes(corpus, cb), "vec_id")
      .join(broadcast(probeLuts(probes, cb)), Seq("probe_id", "s", "code"))
      .groupBy(col("probe_id"), col("vec_id")).agg(sum(col("pdot")).as("score"))
    AnnIndex.rankTopK(scored, k, "score")
  }
}
