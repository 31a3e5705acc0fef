package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Near-duplicate detection suite for training-data pipelines. All hashing
 * is md5-derived (engine-portable: Spark, DuckDB and the Scala kernel
 * produce bit-identical values), so every method here has an exact ANSI-SQL
 * twin and is value-checked by the DuckDB oracle — no JVM-only hash
 * functions anywhere in the family.
 *
 *  - exact: canonical-hash groupBy (see SparkEntry q_dedup_exact).
 *  - MinHash + LSH: shingle -> per-permutation min-hash signature -> band
 *    buckets -> candidate pairs by bucket equi-join -> exact-Jaccard
 *    verification of candidates only. The verification join touches only
 *    LSH candidates, never the n² pair space.
 *  - SimHash: 60-bit sign-aggregated token hash; candidate pairs by
 *    fixed 15-bit chunk banding (4 chunks), verified by exact popcount.
 *  - n-gram Jaccard (exact, small scopes): SparkEntry q_dedup_ngram.
 *  - embedding cosine near-dup: SparkEntry q_sim_pairs / q_ann_*.
 *
 * Banding scale contract (two-stage design): candidates are pairs sharing
 * at least one of 4 wide chunks (15 bits for the 60-bit simhash, 16 bits
 * for a 64-bit phash). By pigeonhole this guarantees recall for pairs with
 * hamming <= 3; pairs with 3 < hamming <= maxHamming are emitted when they
 * happen to collide (best-effort recall, deterministic either way). Narrow
 * chunks (the alternative that guarantees larger budgets) collapse to
 * ~n²/2^width candidate pairs at corpus scale — with 15-bit chunks the
 * bucket space is 32768 per chunk, keeping expected candidates per row flat
 * in corpus size for any realistically-clustered hash distribution (see
 * BandingScaleSpec).
 */
object Dedup {
  /** Portable 60-bit hash: first 15 hex chars of md5(s), parsed base 16.
    * Spark: conv(substr(md5 ..)); DuckDB: CAST('0x' || substr(md5 ..) AS
    * BIGINT); kernel: [[md5h60]]. Always non-negative (fits 60 bits), so
    * signed/unsigned shift semantics never diverge across engines. */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Kernel twin of [[h60]] for row-level UDF loops. */
  def md5h60(s: String): Long = {
    val d = digest.get().digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    (v << 4) | ((d(7) & 0xFF) >>> 4)
  }
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Per-doc DISTINCT shingle array — `array_distinct` dedupes inside the
    * row, so building shingle sets needs NO shuffle (an exploded+`distinct`
    * form shuffles |docs|·|shingles| short strings — measured 8.5 s of the
    * r1 q_dedup_minhash's 18 s at sf0.1). */
  private def shingleArr(docs: DataFrame, shingleLen: Int): DataFrame =
    docs.select(col("doc_id"),
        array_distinct(expr(s"transform(sequence(1, greatest(length(text) - ${shingleLen - 1}, 0))," +
          s" i -> substring(text, i, $shingleLen))")).as("gs"))
      .where(size(col("gs")) > 0)

  /** Per-row minhash signature: out(p) = min over shingles of
    * md5h60(g + "|" + p) — the kernel twin of h60(concat(g, '|p')).
    * Hot loop: one UTF-8 encode per shingle, incremental digest updates
    * per permutation (no per-(g,p) string concat). */
  private def sigUdf(numPerm: Int) = {
    val suffixes = Array.tabulate(numPerm)(p =>
      ("|" + p).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    udf { (gs: Seq[String]) =>
      val md = digest.get()
      val out = Array.fill(numPerm)(Long.MaxValue)
      gs.foreach { g =>
        val gb = g.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        var p = 0
        while (p < numPerm) {
          md.reset()
          md.update(gb)
          md.update(suffixes(p))
          val d = md.digest()
          var v = 0L
          var i = 0
          while (i < 7) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
          val h = (v << 4) | ((d(7) & 0xFF) >>> 4)
          if (h < out(p)) out(p) = h
          p += 1
        }
      }
      out
    }
  }

  /** MinHash signature + LSH banding. Returns candidate pairs with their
    * exact Jaccard similarity (fixed-point x1e6) — candidates only, so the
    * expensive verification is bounded by bucket collisions.
    *
    * Shuffle ledger: signatures are per-row `array_min` over the shingle
    * array (zero shuffle), set sizes are per-row `size` (zero shuffle); the
    * only shuffles are the band-bucket self-join (one short row per
    * (doc, band)) and the candidate verification joins (candidates only). */
  def minhashPairs(docs: DataFrame, shingleLen: Int = 5, numPerm: Int = 16,
                   bands: Int = 4): DataFrame = {
    require(numPerm % bands == 0, "bands must divide numPerm")
    val rowsPerBand = numPerm / bands
    // shingling costs ~2s/5k docs and feeds three branches (signature,
    // verification relation, set sizes) — materialize once
    val withArr = shingleArr(docs, shingleLen).cache()

    // permutation p hash of shingle g = h60(g || "|p"); signature = per-row
    // kernel loop (bit-identical to a min-agg over h60 of exploded
    // shingles, via the md5h60 twin). A 16-way array_min(transform(md5..))
    // projection computes the same thing but its generated code takes ~25 s
    // to Janino-compile — a UDF keeps codegen tiny and the md5 in one
    // thread-local digest loop.
    val sig = withArr.select(col("doc_id"), sigUdf(numPerm)(col("gs")).as("hs"))

    // all band keys in one pass over sig; band key = '_'-joined slice
    val bandStructs = array((0 until bands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(p => col("hs")(p).cast("string"))
      struct(lit(b).as("band"), concat_ws("_", cols: _*).as("bh"))
    }: _*)
    val banded = sig.select(col("doc_id"), explode(bandStructs).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.bh").as("bh"))
      .cache() // tiny: one short row per (doc, band); feeds both join sides

    val candidates = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
      .distinct()

    // exact verification of candidates only; sh is the exploded shingle
    // relation (already per-doc distinct — no shuffle to build)
    val sh = withArr.select(col("doc_id"), explode(col("gs")).as("g")).cache()
    val na = withArr.select(col("doc_id"), size(col("gs")).cast("long").as("n"))
    val inter = candidates
      .join(sh.toDF("ida", "g"), "ida")
      .join(sh.toDF("idb", "g2").withColumnRenamed("g2", "g"), Seq("idb", "g"))
      .groupBy(col("ida"), col("idb")).agg(count(lit(1)).as("inter"))
    candidates
      .join(inter, Seq("ida", "idb"), "left")
      .join(na.toDF("ida", "na"), "ida")
      .join(na.toDF("idb", "nb"), "idb")
      .select(col("ida"), col("idb"),
        floor(coalesce(col("inter"), lit(0L)) * lit(1000000.0) /
          (col("na") + col("nb") - coalesce(col("inter"), lit(0L)))).cast("long").as("jac_fp"))
  }

  /** 60-bit SimHash over whitespace tokens (duplicates counted). Token
    * hash = [[md5h60]]; docs with no non-empty token are dropped (matching
    * the SQL twin, where token-less docs simply vanish from the unnest). */
  private val simhashUdf = udf { (tokens: Seq[String]) =>
    val counts = new Array[Int](60)
    tokens.foreach { t =>
      val h = md5h60(t)
      var j = 0
      while (j < 60) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
    }
    var out = 0L
    var j = 0
    while (j < 60) { if (counts(j) > 0) out |= 1L << j; j += 1 }
    out
  }

  def simhash(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        filter(split(col("text"), "\\s+"), t => t =!= "").as("toks"))
      .where(size(col("toks")) > 0)
      .select(col("doc_id"), simhashUdf(col("toks")).as("sh"))

  /** Candidate pairs with hamming(simhash) <= maxHamming (guaranteed for
    * hamming <= 3, best-effort above — see class doc). */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 8): DataFrame =
    simhashPairsFromHashes(simhash(docs), maxHamming, hashBits = 60)

  /** Same banding over any precomputed hash column (doc_id, sh) — also
    * used for phash perceptual near-dup buckets (hashBits = 64). Fixed 4
    * chunks of hashBits/4 bits each. */
  def simhashPairsFromHashes(hashes: DataFrame, maxHamming: Int,
                             hashBits: Int = 60): DataFrame = {
    val chunks = 4
    val width = hashBits / chunks
    val mask = (1L << width) - 1
    val chunkStructs = array((0 until chunks).map { c =>
      struct(lit(c).as("chunk"),
        shiftrightunsigned(col("sh"), c * width).bitwiseAND(lit(mask)).as("ck"))
    }: _*)
    val banded = hashes.select(col("doc_id"), col("sh"), explode(chunkStructs).as("cs"))
      .select(col("doc_id"), col("sh"), col("cs.chunk").as("chunk"), col("cs.ck").as("ck"))
      .cache() // tiny: 4 short rows per doc; feeds both join sides
    banded.as("a").join(banded.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.ck") === col("b.ck") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }
}
