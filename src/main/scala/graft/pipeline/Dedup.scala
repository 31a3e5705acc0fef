package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Near-duplicate detection suite for training-data pipelines. All methods
 * are deterministic (keyed xxhash64 / JVM-spec string hashing, no RNG) and
 * shuffle only on short keys:
 *
 *  - exact: canonical-hash groupBy (see SparkEntry q_dedup_exact).
 *  - MinHash + LSH: shingle -> per-permutation min-hash signature -> band
 *    buckets -> candidate pairs by bucket equi-join -> exact-Jaccard
 *    verification of candidates only. The verification join touches only
 *    LSH candidates, never the n² pair space.
 *  - SimHash: 64-bit sign-aggregated token hash; candidate pairs by
 *    pigeonhole chunk banding (hamming <= m pairs share one of m+1 equal
 *    chunks), verified by exact popcount.
 *  - n-gram Jaccard (exact, small scopes): SparkEntry q_dedup_ngram.
 *  - embedding cosine near-dup: SparkEntry q_sim_pairs / q_ann_*.
 */
object Dedup {
  /** Distinct character shingles of `text`. */
  private def shingles(docs: DataFrame, shingleLen: Int): DataFrame =
    docs.select(col("doc_id"),
        explode(expr(s"transform(sequence(1, greatest(length(text) - ${shingleLen - 1}, 0))," +
          s" i -> substring(text, i, $shingleLen))")).as("g"))
      .distinct()

  /** MinHash signature + LSH banding. Returns candidate pairs with their
    * exact Jaccard similarity (fixed-point x1e6) — candidates only, so the
    * expensive verification is bounded by bucket collisions. */
  def minhashPairs(docs: DataFrame, shingleLen: Int = 5, numPerm: Int = 16,
                   bands: Int = 4): DataFrame = {
    require(numPerm % bands == 0, "bands must divide numPerm")
    val rowsPerBand = numPerm / bands
    val sh = shingles(docs, shingleLen).cache()

    val aggs = (0 until numPerm).map(p => min(xxhash64(col("g"), lit(p))).as(s"h$p"))
    val sig = sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)

    // band hash = xxhash64 over the band's signature slice
    val banded = (0 until bands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(p => col(s"h$p"))
      sig.select(col("doc_id"), lit(b).as("band"), xxhash64(cols: _*).as("bh"))
    }.reduce(_ unionByName _)

    val candidates = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
      .distinct()

    // exact verification of candidates only
    val na = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
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

  /** 64-bit SimHash over whitespace tokens. Deterministic: token hash =
    * splitmix64(java String.hashCode) — both JVM-spec stable. */
  private val simhashUdf = udf { (tokens: Seq[String]) =>
    val counts = new Array[Int](64)
    tokens.foreach { t =>
      val h = graft.core.Splitmix.mix(t.hashCode.toLong)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) out |= 1L << j; j += 1 }
    out
  }

  def simhash(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      simhashUdf(split(col("text"), "\\s+")).as("sh"))

  /** Candidate pairs with hamming(simhash) <= maxHamming via pigeonhole
    * banding into maxHamming+1 chunks. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 8): DataFrame =
    simhashPairsFromHashes(simhash(docs), maxHamming)

  /** Same banding over any precomputed 64-bit hash column (doc_id, sh) —
    * also used for phash perceptual near-dup buckets. */
  def simhashPairsFromHashes(hashes: DataFrame, maxHamming: Int): DataFrame = {
    val chunks = maxHamming + 1
    val width = 64 / chunks // last chunk absorbs the remainder bits
    val hs = hashes.cache()
    val banded = (0 until chunks).map { cIdx =>
      val lo = cIdx * width
      val w = if (cIdx == chunks - 1) 64 - lo else width
      val mask = if (w >= 64) -1L else (1L << w) - 1
      hs.select(col("doc_id"), col("sh"), lit(cIdx).as("chunk"),
        (shiftrightunsigned(col("sh"), lo).bitwiseAND(lit(mask))).as("ck"))
    }.reduce(_ unionByName _)
    banded.as("a").join(banded.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.ck") === col("b.ck") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }
}
