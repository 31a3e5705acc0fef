package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Product quantization (PQ) — the embedding-compression layer of the ANN
 * stack (the canonical billion-scale recipe is IVF routing + PQ-compressed
 * RESIDUAL scoring; [[ivfAdcTopK]] composes exactly that). A dim-d vector
 * compresses to `m` codes: it splits into `m` contiguous subvectors, each
 * replaced by the id of its nearest codeword (`k` per subspace) — d floats
 * become m small ints, and probe scoring becomes m table lookups per
 * corpus row (ADC — asymmetric distance computation: the probe stays
 * exact, only the corpus side is quantized).
 *
 * Parameterization ([[PqParams]]): the defaults (64, 8, 16) are the
 * oracle-gate configuration (q_ann_pq/q_ann_ivfpq replay every step in
 * ANSI SQL; a 256-codeword twin would be oracle-cost for no extra
 * coverage); the canonical production rate-distortion point k = 256
 * (one byte per subspace) is exercised by PqResidualSpec.
 *
 * Engine-portable determinism (full DuckDB twin):
 *  - codebooks: the `k` corpus vectors whose md5("pq|" || vec_id) digest
 *    sorts first donate their subvector slices as codewords (deterministic
 *    sampling; every step replays in ANSI SQL).
 *  - encoding metric: exact integer squared-L2 over the shared
 *    floor(v*1000) quantization, ties toward the smaller codeword id.
 *  - ADC score: sum over subspaces of the exact integer dot between the
 *    probe's subvector and the corpus row's codeword (+ the probe-centroid
 *    dot on the residual path).
 *
 * Scale shape at 10^12 rows: codebooks are tiny (k·m subvectors) and
 * closed over by a per-row encode kernel — the index build is a
 * zero-shuffle map (persist the m codes, drop the embedding). Probe-side
 * LUTs are k·m integer dots per probe, built relationally and joined to
 * the exploded corpus codes on (subspace, code) — probes broadcast, the
 * corpus never shuffles before the per-probe top-k.
 */
object PqIndex {
  /** dim = embedding length, m = subspaces, k = codewords per subspace. */
  final case class PqParams(dim: Int, m: Int, k: Int) {
    require(dim > 0 && m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    require(k > 0 && k <= 4096, s"k=$k: codebooks must stay driver/broadcast-sized")
    val subDim: Int = dim / m
  }
  val Default: PqParams = PqParams(64, 8, 16)

  /** A committed (or in-flight) PQ index: the codebook TABLE (s, code, cw)
    * and the encoded corpus (vec_id, s, code). */
  final case class PqModel(cb: DataFrame, codes: DataFrame)

  /** A committed IVF+PQ residual index: trained IVF centroids, the corpus'
    * list assignment (vec_id, cid), residual codebooks and residual codes.
    * The corpus embedding appears in NO relation — the memory shape that
    * makes a 10^12-row index fit. */
  final case class IvfPqModel(cents: DataFrame, lists: DataFrame,
                              cb: DataFrame, codes: DataFrame)

  /** A committed two-level-IVF + residual-PQ index: the [[Ivf2Model]]
    * routing relations (lists reduced to (vec_id, cid)) plus residual
    * codebooks/codes against the SUB centroids. */
  final case class Ivf2PqModel(superCents: DataFrame, subs: DataFrame,
                               lists: DataFrame, cb: DataFrame, codes: DataFrame)
  // oracle-configuration constants, kept for spec/twin readability
  val Dim = Default.dim
  val M = Default.m
  val SubDim = Default.subDim
  val K = Default.k

  /** Deterministic codebooks from any quantized-vector relation
    * (vec_id, vq): codeword j of subspace s is the s-th subDim slice of
    * the j-th md5-ranked donor. cb(s)(j) = Array[Long](subDim).
    * Driver-side by design (the broadcast model every PQ variant
    * carries; k is require-bounded). */
  def codebooksQ(vecs: DataFrame, p: PqParams = Default): Array[Array[Array[Long]]] = {
    val donors = vecs
      .orderBy(md5(concat(lit("pq|"), col("vec_id").cast("string"))), col("vec_id"))
      .limit(p.k)
      .select(col("vq")).collect()
      .map(_.getSeq[Long](0).toArray)
    require(donors.length == p.k,
      s"PQ codebooks need >= ${p.k} corpus vectors to sample, got ${donors.length}")
    Array.tabulate(p.m, p.k)((s, j) => donors(j).slice(s * p.subDim, (s + 1) * p.subDim))
  }

  /** Codebooks over the raw embedding column (quantizes first). */
  def codebooks(corpus: DataFrame, p: PqParams = Default): Array[Array[Array[Long]]] =
    codebooksQ(corpus.select(col("vec_id"), AnnIndex.quant(AnnIndex.embD).as("vq")), p)

  /** Per-subspace Lloyd's-TRAINED codebooks over a quantized relation —
    * the canonical k-means PQ training, run as the same deterministic
    * relational rounds as the IVF coarse quantizer, independently inside
    * each subspace: subvector argmin assignment (broadcast codebook
    * table, map-side min_by) then an integer floor-division mean per
    * (subspace, codeword, dim); codewords whose cell goes empty keep
    * their previous value. trainRounds = 0 returns the md5-sampled seed.
    * The per-round means collect is bounded by m·k·subDim = dim·k rows —
    * the broadcast model every PQ variant carries anyway. The DuckDB
    * twins unroll the rounds (pqRoundCtes), so the trained path stays
    * oracle-checked end to end. */
  def codebooksTrainedQ(vecs: DataFrame, p: PqParams,
                        trainRounds: Int): Array[Array[Array[Long]]] = {
    require(trainRounds >= 0 && trainRounds <= 16,
      s"trainRounds=$trainRounds out of [0,16]")
    var cb = codebooksQ(vecs, p)
    if (trainRounds == 0) return cb
    import vecs.sparkSession.implicits._
    val sub = vecs.select(col("vec_id"),
      posexplode(expr(s"transform(sequence(0, ${p.m - 1})," +
        s" s -> slice(vq, s * ${p.subDim} + 1, ${p.subDim}))")).as(Seq("s", "sv")))
      .localCheckpoint(false) // feeds every round
    for (_ <- 0 until trainRounds) {
      val cbDf = cb.zipWithIndex.flatMap { case (subs, s) =>
        subs.zipWithIndex.map { case (cw, j) => (s, j, cw.toSeq) }
      }.toSeq.toDF("s", "code", "cw")
      val assigned = sub.join(broadcast(cbDf), "s")
        .select(col("vec_id"), col("s"), col("sv"), col("code"),
          IvfIndex.intSqDist(col("sv"), col("cw")).as("d"))
        .groupBy(col("vec_id"), col("s"))
        .agg(min_by(col("code"), struct(col("d"), col("code"))).as("code"),
          first(col("sv")).as("sv"))
      val means = assigned
        .select(col("s"), col("code"), posexplode(col("sv")).as(Seq("i", "v")))
        .groupBy(col("s"), col("code"), col("i"))
        .agg(sum(col("v")).as("sm"), count(lit(1)).as("n"))
        .select(col("s"), col("code"), col("i"),
          expr("(sm - pmod(sm, n)) div n").as("c"))
        .collect()
      val nu = cb.map(_.map(_.clone))
      // positions absent from the SEED codeword stay absent (the twin's
      // update is a LEFT JOIN from the previous codebook rows)
      means.foreach { r =>
        val cw = nu(r.getInt(0))(r.getInt(1))
        if (r.getInt(2) < cw.length) cw(r.getInt(2)) = r.getLong(3)
      }
      cb = nu
    }
    cb
  }

  /** Trained codebooks over the raw embedding column. */
  def codebooksTrained(corpus: DataFrame, p: PqParams = Default,
                       trainRounds: Int = 2): Array[Array[Array[Long]]] =
    codebooksTrainedQ(
      corpus.select(col("vec_id"), AnnIndex.quant(AnnIndex.embD).as("vq")), p, trainRounds)

  /** Encode kernel over a QUANTIZED vector: the m nearest-codeword ids
    * (exact integer squared-L2, ties -> smaller j). Positions past the
    * vector's length contribute NO term — the same semantics as the SQL
    * twin's join on existing pos rows; zero-substituting would diverge
    * from the oracle for short vectors. */
  def encodeQKernel(cb: Array[Array[Array[Long]]], vq: Seq[Long], p: PqParams): Array[Int] =
    Array.tabulate(p.m) { s =>
      var best = 0
      var bestD = Long.MaxValue
      var j = 0
      while (j < p.k) {
        var d = 0L
        var i = 0
        while (i < p.subDim) {
          val base = s * p.subDim + i
          if (base < vq.length && i < cb(s)(j).length) {
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

  /** Encode kernel over a raw embedding (quantizes, then [[encodeQKernel]]). */
  def encodeKernel(cb: Array[Array[Array[Long]]], emb: Seq[Double],
                   p: PqParams = Default): Array[Int] =
    encodeQKernel(cb,
      Array.tabulate(math.min(p.dim, emb.length))(i => math.floor(emb(i) * 1000).toLong), p)

  /** Column form of [[encodeKernel]] — the zero-shuffle index build. */
  def encodeUdf(cb: Array[Array[Array[Long]]], p: PqParams = Default) =
    udf { (emb: Seq[Double]) => encodeKernel(cb, emb, p) }

  /** Column form of [[encodeQKernel]] (already-quantized input — the
    * residual path). */
  def encodeQUdf(cb: Array[Array[Array[Long]]], p: PqParams = Default) =
    udf { (vq: Seq[Long]) => encodeQKernel(cb, vq, p) }

  /** Corpus codes relation: (vec_id, s, code) — m short rows per row. */
  private def corpusCodes(corpus: DataFrame, cb: Array[Array[Array[Long]]],
                          p: PqParams): DataFrame =
    corpus.select(col("vec_id"),
      posexplode(encodeUdf(cb, p)(AnnIndex.embD)).as(Seq("s", "code")))

  /** Codebooks as a RELATION (s, code, cw) — the committable/broadcastable
    * table form (tiny: m·k rows). */
  def cbToDf(spark: org.apache.spark.sql.SparkSession,
             cb: Array[Array[Array[Long]]]): DataFrame = {
    import spark.implicits._
    cb.zipWithIndex.flatMap { case (sub, s) =>
      sub.zipWithIndex.map { case (cw, j) => (s, j, cw.toSeq) }
    }.toSeq.toDF("s", "code", "cw")
  }

  /** Probe LUTs from the codebook TABLE: (probe_id, s, code, pdot) — k·m
    * exact integer dots per probe between the probe's subvector and every
    * codeword. Relational on purpose: a committed codebook snapshot feeds
    * this directly, no driver round-trip on the probe path. */
  private def probeLutsDf(probes: DataFrame, cbDf: DataFrame, p: PqParams): DataFrame =
    probes
      .select(col("vec_id").as("probe_id"), AnnIndex.quant(AnnIndex.embD).as("pq"))
      .crossJoin(broadcast(cbDf))
      .select(col("probe_id"), col("s"), col("code"),
        AnnIndex.intDot(slice(col("pq"), col("s") * lit(p.subDim) + 1, lit(p.subDim)), col("cw")).as("pdot"))

  private def probeLuts(probes: DataFrame, cb: Array[Array[Array[Long]]],
                        p: PqParams): DataFrame =
    probeLutsDf(probes, cbToDf(probes.sparkSession, cb), p)

  /** Batch ADC top-k: corpus rows carry only their m codes; each probe
    * builds a (subspace, codeword) -> exact-integer-dot lookup table
    * relationally, the exploded codes meet the LUT in ONE equi-join on
    * (s, code), and the per-probe score is the sum over subspaces —
    * followed by a window top-k BY PROBE. Output (probe_id, rank, vec_id,
    * score); self-matches excluded.
    *
    * THIS IS A SCAN SCORER, NOT A BATCH kNN OPERATOR: by contract it
    * touches m·|corpus| pre-aggregation rows PER PROBE (full-ADC — the
    * whole corpus is scored). The probe side is require-bounded
    * (`maxProbes`) so a caller cannot mistake it for [[ivfAdcTopK]], the
    * composed sub-linear path that scores IVF candidates only.
    *
    * Approximation contract, stated not hidden: score is the exact dot
    * against the QUANTIZED corpus row (the codeword centroids), so ranking
    * fidelity degrades with quantization error — near-duplicates of a
    * codebook donor rank exactly; far vectors coarsely. Exhaustive
    * guarantees stay with the exact scans; PQ buys the ~(4·dim/m)x memory
    * cut that makes a 10^12-row scoring pass feasible at all. */
  def adcTopK(probes: DataFrame, corpus: DataFrame, k: Int,
              p: PqParams = Default, maxProbes: Int = 4096,
              pqTrainRounds: Int = 0): DataFrame =
    probePq(buildPq(corpus, p, pqTrainRounds), probes, k, p, maxProbes)

  /** BUILD half of [[adcTopK]]: trained codebooks (as the committable
    * table form) + the zero-shuffle corpus encode. */
  def buildPq(corpus: DataFrame, p: PqParams = Default,
              pqTrainRounds: Int = 0): PqModel = {
    val cb = codebooksTrained(corpus, p, pqTrainRounds)
    PqModel(cbToDf(corpus.sparkSession, cb), corpusCodes(corpus, cb, p))
  }

  /** PROBE half of [[adcTopK]] — touches only the model's two relations;
    * a committed model is never re-encoded or retrained by a probe. */
  def probePq(model: PqModel, probes: DataFrame, k: Int,
              p: PqParams = Default, maxProbes: Int = 4096): DataFrame = {
    // DELIBERATE pre-flight action (not lazily deferred): the scan
    // contract must fail at call time, before a caller schedules an
    // m·|corpus|-per-probe pass. The probe side is localCheckpointed
    // FIRST, so the counted relation is materialized once and the scoring
    // below reuses those blocks — an uncached derived probe lineage is
    // never recomputed by the guard (ADVICE r4).
    val pb = probes.localCheckpoint(false)
    require(pb.limit(maxProbes + 1).count() <= maxProbes,
      s"adcTopK scores the FULL corpus per probe (scan contract) — more than " +
        s"$maxProbes probes means you want ivfAdcTopK, the sub-linear composed path")
    val scored = model.codes
      .join(broadcast(probeLutsDf(pb, model.cb, p)), Seq("s", "code"))
      .where(col("vec_id") =!= col("probe_id"))
      .groupBy(col("probe_id"), col("vec_id")).agg(sum(col("pdot")).as("score"))
    AnnIndex.rankTopK(scored, k, "score")
  }

  /** Staged [[buildPq]]: codebooks + codes commit as lineage-linked
    * StageRunner snapshots (same contract as [[IvfIndex.buildStaged]];
    * param-derived stage names, so identical configurations share). */
  def stagedKeyPq(p: PqParams, pqTrainRounds: Int): String =
    s"pq-d${p.dim}m${p.m}k${p.k}-t$pqTrainRounds"

  def buildStagedPq(st: graft.tables.StageRunner, corpus: DataFrame,
                    p: PqParams = Default, pqTrainRounds: Int = 0): PqModel = {
    val key = stagedKeyPq(p, pqTrainRounds)
    val cbDf = st.stage(s"$key-codebooks")(
      cbToDf(corpus.sparkSession, codebooksTrained(corpus, p, pqTrainRounds)))
    val codes = st.stage(s"$key-codes", Seq(s"$key-codebooks")) {
      // encode under the COMMITTED codebooks (collected back — k·m rows)
      corpusCodes(corpus, cbFromDf(cbDf, p), p)
    }
    PqModel(cbDf, codes)
  }

  /** Codebook table -> the driver-array form the encode kernel closes
    * over (bounded m·k rows — the broadcast model every PQ variant
    * carries). Missing (s, code) rows keep zero-length codewords. */
  def cbFromDf(cbDf: DataFrame, p: PqParams): Array[Array[Array[Long]]] = {
    val out = Array.fill(p.m, p.k)(Array.emptyLongArray)
    cbDf.select(col("s"), col("code"), col("cw")).collect().foreach { r =>
      out(r.getInt(0))(r.getInt(1)) = r.getSeq[Long](2).toArray
    }
    out
  }

  /** IVF+PQ — the composed billion-scale recipe, RESIDUAL-encoded: the
    * corpus assigns to its trained IVF list ([[IvfIndex]]), each vector's
    * RESIDUAL (vector minus its list centroid) is PQ-encoded — residuals
    * are small and centered, so the same k codewords spend their
    * rate-distortion budget where the data actually is (PqResidualSpec
    * measures reconstruction error strictly below the raw-vector path) —
    * and probes score candidates as
    *   dot(probe, centroid_of_list) + Σ_s LUT_s[code_s]
    * (exact, because dot(p, c + r̂) decomposes linearly; the LUT holds
    * dot(probe_subvector, residual_codeword)). At 10^12 rows this is the
    * pass that fits: the corpus carries one int list id + m code ids per
    * row; candidate selection is sub-linear (nprobe/nlist by
    * construction), scoring never touches a corpus embedding, and every
    * probe-side relation broadcasts. */
  def ivfAdcTopK(probes: DataFrame, corpus: DataFrame, k: Int,
                 nlist: Int, nprobe: Int, trainRounds: Int = 2,
                 p: PqParams = Default, pqTrainRounds: Int = 0): DataFrame = {
    require(nprobe >= 1 && nprobe <= nlist, s"nprobe=$nprobe out of [1, $nlist]")
    probeIvfPq(buildIvfPq(corpus, nlist, trainRounds, p, pqTrainRounds),
      probes, k, nprobe, p)
  }

  /** Residual relation r_i = v_i - c_i over the vector's OWN positions
    * (transform preserves vq's length — join-on-pos twin semantics for
    * short rows; centroids are full-dim means by construction).
    * `assigned` = (vec_id, cid, vq); `cents` keyed by `cid` with the
    * centroid in `cvq`. */
  private def residuals(assigned: DataFrame, cents: DataFrame): DataFrame =
    assigned.join(broadcast(cents.select(col("cid"), col("cvq"))), "cid")
      .select(col("vec_id"), col("cid"),
        expr("transform(vq, (x, i) -> x - coalesce(try_element_at(cvq, i + 1), 0L))").as("vq"))

  /** BUILD half of [[ivfAdcTopK]]: trained IVF centroids + list
    * assignment, residual codebooks trained on (v - centroid), residual
    * codes. The committed index carries one int list id + m code ids per
    * corpus row — never an embedding. */
  def buildIvfPq(corpus: DataFrame, nlist: Int, trainRounds: Int = 2,
                 p: PqParams = Default, pqTrainRounds: Int = 0): IvfPqModel = {
    val cents = IvfIndex.centroidTable(corpus, nlist, trainRounds)
    val assigned = IvfIndex.assign(corpus, cents) // (vec_id, cid, vq)
    val resid = residuals(assigned, cents)
      .localCheckpoint(false) // feeds codebook sampling + encoding
    val cbR = codebooksTrainedQ(resid, p, pqTrainRounds)
    val codes = resid.select(col("vec_id"),
      posexplode(encodeQUdf(cbR, p)(col("vq"))).as(Seq("s", "code")))
    IvfPqModel(cents, assigned.select(col("vec_id"), col("cid")),
      cbToDf(corpus.sparkSession, cbR), codes)
  }

  /** PROBE half of [[ivfAdcTopK]]: routing + candidate equi-join +
    * residual-LUT scoring, touching only the model's four relations —
    * score = dot(probe, centroid_of_list) + Σ_s LUT_s[code_s] (exact by
    * linearity). */
  def probeIvfPq(model: IvfPqModel, probes: DataFrame, k: Int, nprobe: Int,
                 p: PqParams = Default): DataFrame = {
    // routing feeds THREE subtrees (ctr, cand, the LUT join keys) —
    // materialize the tiny (probe_id, cid, pq) relation once
    // (localCheckpoint, auto-released) instead of replaying the
    // probe-scan + broadcast-argmin + window chain per consumer
    val pr = IvfIndex.route(probes, model.cents, nprobe)
      .localCheckpoint(false) // (probe_id, cid, pq)
    // per-(probe, routed list) centroid dot — the linear term of the score
    val ctr = pr.join(broadcast(model.cents), "cid")
      .select(col("probe_id"), col("cid"), AnnIndex.intDot(col("pq"), col("cvq")).as("cdot"))
    val cand = model.lists
      .join(broadcast(pr.select(col("probe_id"), col("cid"))), "cid")
      .where(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"), col("cid"))
    val scored = cand.join(model.codes, "vec_id")
      .join(broadcast(probeLutsDf(probes, model.cb, p)), Seq("probe_id", "s", "code"))
      .groupBy(col("probe_id"), col("vec_id"), col("cid"))
      .agg(sum(col("pdot")).as("radc"))
      .join(broadcast(ctr), Seq("probe_id", "cid"))
      .select(col("probe_id"), col("vec_id"), (col("radc") + col("cdot")).as("score"))
    AnnIndex.rankTopK(scored, k, "score")
  }

  /** Two-stage retrieval with exact re-rank — the production "refine"
    * pass every ADC deployment ends with: [[probeIvfPq]] produces a
    * kShort-candidate shortlist from the compressed index (the corpus-wide
    * pass never touches an embedding), then ONE equi-join fetches only the
    * shortlist's true embeddings for an exact integer-dot top-k.
    * Quantization error is confined to which candidates make the
    * shortlist cut; the final ordering among them is exact. Cost of the
    * exact pass: kShort rows per probe (probe side broadcasts), vs the
    * full-corpus scan the exact baseline (`q_ann_mips`) pays. */
  def probeIvfPqRefined(model: IvfPqModel, probes: DataFrame, corpus: DataFrame,
                        k: Int, kShort: Int, nprobe: Int,
                        p: PqParams = Default): DataFrame = {
    require(kShort >= k, s"shortlist kShort=$kShort must be >= k=$k")
    val short = probeIvfPq(model, probes, kShort, nprobe, p)
      .select(col("probe_id"), col("vec_id"))
    val pq = probes.select(col("vec_id").as("probe_id"),
      AnnIndex.quant(col("embedding")).as("pq"))
    val exact = short
      .join(corpus.select(col("vec_id"), AnnIndex.quant(col("embedding")).as("vq")),
        "vec_id")
      .join(broadcast(pq), "probe_id")
      .select(col("probe_id"), col("vec_id"),
        AnnIndex.intDot(col("pq"), col("vq")).as("edot"))
    AnnIndex.rankTopK(exact, k, "edot")
  }

  /** Staged [[buildIvfPq]]: the coarse quantizer + assigned lists are
    * [[IvfIndex.buildStaged]]'s OWN stages (param-keyed — a flat IVF of
    * the same configuration and this composed index share one committed
    * quantizer, never train two identical copies), plus two PQ stages
    * (codebooks -> codes) layered on top. Residuals are recomputed inside
    * the codebook/code stage thunks from the committed centroids + lists —
    * transient by design (committing a corpus-sized residual table would
    * double index storage); each thunk runs only when its stage commits. */
  def buildStagedIvfPq(st: graft.tables.StageRunner, corpus: DataFrame,
                       nlist: Int, trainRounds: Int = 2,
                       p: PqParams = Default, pqTrainRounds: Int = 0): IvfPqModel = {
    val ivfKey = IvfIndex.stagedKey(nlist, trainRounds)
    val ivf = IvfIndex.buildStaged(st, corpus, nlist, trainRounds)
    val key = s"ivfpq-n$nlist-t$trainRounds-${stagedKeyPq(p, pqTrainRounds)}"
    def resid = residuals(ivf.lists, ivf.cents)
    val cbDf = st.stage(s"$key-codebooks", Seq(s"$ivfKey-centroids", s"$ivfKey-lists"))(
      cbToDf(corpus.sparkSession, codebooksTrainedQ(resid.localCheckpoint(false), p, pqTrainRounds)))
    val codes = st.stage(s"$key-codes", Seq(s"$key-codebooks", s"$ivfKey-lists")) {
      val cbR = cbFromDf(cbDf, p)
      resid.select(col("vec_id"), posexplode(encodeQUdf(cbR, p)(col("vq"))).as(Seq("s", "code")))
    }
    IvfPqModel(ivf.cents, ivf.lists.select(col("vec_id"), col("cid")), cbDf, codes)
  }

  /** Two-level-IVF + residual-PQ composed — VERDICT r4 Next #6: the full
    * 10^12 composition in ONE operator. Candidate selection routes
    * through [[IvfIndex.knnJoinTwoLevel]]'s hierarchy (only nsuper
    * centroids broadcast; sub-lists meet probes in equi-joins on scid, so
    * list count is unbounded by broadcast size), and scoring is the
    * residual-ADC pass against the SUB-list centroids:
    *   score = dot(probe, sub_centroid_of_list) + Σ_s LUT_s[code_s]
    * — exact by the same linearity as [[ivfAdcTopK]], with residuals that
    * are even smaller (sub cells are tighter than flat lists). The corpus
    * side carries one sub-list id + m residual codes per row. Full ANSI
    * twin: q_ann_ivf2pq. */
  def ivf2AdcTopK(probes: DataFrame, corpus: DataFrame, k: Int,
                  nsuper: Int, nsub: Int, nprobeSuper: Int, nprobe: Int,
                  trainRounds: Int = 1, subTrainRounds: Int = 0,
                  p: PqParams = Default, pqTrainRounds: Int = 0): DataFrame = {
    require(nprobeSuper >= 1 && nprobeSuper <= nsuper,
      s"nprobeSuper=$nprobeSuper out of [1, $nsuper]")
    require(nprobe >= 1 && nprobe <= nsuper.toLong * nsub,
      s"nprobe=$nprobe out of [1, ${nsuper.toLong * nsub}]")
    probeIvf2Pq(
      buildIvf2Pq(corpus, nsuper, nsub, trainRounds, subTrainRounds, p, pqTrainRounds),
      probes, k, nprobeSuper, nprobe, p)
  }

  /** BUILD half of [[ivf2AdcTopK]]: the two-level IVF model plus residual
    * codebooks/codes against each vector's own SUB centroid. */
  def buildIvf2Pq(corpus: DataFrame, nsuper: Int, nsub: Int,
                  trainRounds: Int = 1, subTrainRounds: Int = 0,
                  p: PqParams = Default, pqTrainRounds: Int = 0): Ivf2PqModel = {
    val ivf2 = IvfIndex.buildTwoLevel(corpus, nsuper, nsub, trainRounds, subTrainRounds)
    val resid = residuals(ivf2.lists, ivf2.subs).localCheckpoint(false)
    val cbR = codebooksTrainedQ(resid, p, pqTrainRounds)
    val codes = resid.select(col("vec_id"),
      posexplode(encodeQUdf(cbR, p)(col("vq"))).as(Seq("s", "code")))
    Ivf2PqModel(ivf2.superCents, ivf2.subs,
      ivf2.lists.select(col("vec_id"), col("cid")),
      cbToDf(corpus.sparkSession, cbR), codes)
  }

  /** PROBE half of [[ivf2AdcTopK]]. */
  def probeIvf2Pq(model: Ivf2PqModel, probes: DataFrame, k: Int,
                  nprobeSuper: Int, nprobe: Int, p: PqParams = Default): DataFrame = {
    // same consumer-sharing as probeIvfPq: the hierarchical routing
    // (two windows deep) would otherwise replay per consumer subtree
    val pr2 = IvfIndex.routeTwoLevel(
      Ivf2Model(model.superCents, model.subs, model.lists),
      probes, nprobeSuper, nprobe)
      .localCheckpoint(false) // (probe_id, cid, pq)
    val ctr = pr2.join(broadcast(model.subs.select(col("cid"), col("cvq"))), "cid")
      .select(col("probe_id"), col("cid"), AnnIndex.intDot(col("pq"), col("cvq")).as("cdot"))
    val cand = model.lists
      .join(broadcast(pr2.select(col("probe_id"), col("cid"))), "cid")
      .where(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"), col("cid"))
    val scored = cand.join(model.codes, "vec_id")
      .join(broadcast(probeLutsDf(probes, model.cb, p)), Seq("probe_id", "s", "code"))
      .groupBy(col("probe_id"), col("vec_id"), col("cid"))
      .agg(sum(col("pdot")).as("radc"))
      .join(broadcast(ctr), Seq("probe_id", "cid"))
      .select(col("probe_id"), col("vec_id"), (col("radc") + col("cdot")).as("score"))
    AnnIndex.rankTopK(scored, k, "score")
  }

  /** [[probeIvfPqRefined]]'s two-level sibling — the full 10^12
    * composition ends here: hierarchical routing (only nsuper centroids
    * broadcast) × residual ADC shortlist × exact re-rank over only the
    * kShort fetched embeddings. Same error contract: quantization decides
    * the shortlist, the final ordering is exact. */
  def probeIvf2PqRefined(model: Ivf2PqModel, probes: DataFrame, corpus: DataFrame,
                         k: Int, kShort: Int, nprobeSuper: Int, nprobe: Int,
                         p: PqParams = Default): DataFrame = {
    require(kShort >= k, s"shortlist kShort=$kShort must be >= k=$k")
    val short = probeIvf2Pq(model, probes, kShort, nprobeSuper, nprobe, p)
      .select(col("probe_id"), col("vec_id"))
    val pq = probes.select(col("vec_id").as("probe_id"),
      AnnIndex.quant(col("embedding")).as("pq"))
    val exact = short
      .join(corpus.select(col("vec_id"), AnnIndex.quant(col("embedding")).as("vq")),
        "vec_id")
      .join(broadcast(pq), "probe_id")
      .select(col("probe_id"), col("vec_id"),
        AnnIndex.intDot(col("pq"), col("vq")).as("edot"))
    AnnIndex.rankTopK(exact, k, "edot")
  }

  /** Staged [[buildIvf2Pq]]: the three two-level routing stages are
    * [[IvfIndex.buildStagedTwoLevel]]'s own (param-keyed, shared with a
    * plain two-level index of the same configuration) plus two residual-PQ
    * stages layered on top. */
  def buildStagedIvf2Pq(st: graft.tables.StageRunner, corpus: DataFrame,
                        nsuper: Int, nsub: Int,
                        trainRounds: Int = 1, subTrainRounds: Int = 0,
                        p: PqParams = Default, pqTrainRounds: Int = 0): Ivf2PqModel = {
    val ivf2Key = IvfIndex.stagedKeyTwoLevel(nsuper, nsub, trainRounds, subTrainRounds)
    val ivf2 = IvfIndex.buildStagedTwoLevel(st, corpus, nsuper, nsub,
      trainRounds, subTrainRounds)
    val key = s"ivf2pq-s${nsuper}x$nsub-t${trainRounds}s$subTrainRounds-${stagedKeyPq(p, pqTrainRounds)}"
    def resid = residuals(ivf2.lists, ivf2.subs)
    val cbDf = st.stage(s"$key-codebooks", Seq(s"$ivf2Key-subs", s"$ivf2Key-lists"))(
      cbToDf(corpus.sparkSession, codebooksTrainedQ(resid.localCheckpoint(false), p, pqTrainRounds)))
    val codes = st.stage(s"$key-codes", Seq(s"$key-codebooks", s"$ivf2Key-lists")) {
      val cbR = cbFromDf(cbDf, p)
      resid.select(col("vec_id"), posexplode(encodeQUdf(cbR, p)(col("vq"))).as(Seq("s", "code")))
    }
    Ivf2PqModel(ivf2.superCents, ivf2.subs,
      ivf2.lists.select(col("vec_id"), col("cid")), cbDf, codes)
  }
}
