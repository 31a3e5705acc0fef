package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A BM25 inverted index as four relations — the committed form of
  * full-text ranked retrieval over a caption/document corpus:
  *  - `postings` (term, doc_id, tf): the inverted lists,
  *  - `doclens`  (doc_id, dl): per-document token counts,
  *  - `dfs`      (term, df): per-term document frequencies,
  *  - `stats`    one row (n_docs, sum_dl): the corpus-level constants.
  * When the four come from [[Bm25.buildStaged]] they are snapshot-committed
  * parquet — a query execution touches only the index tables. */
final case class Bm25Model(postings: DataFrame, doclens: DataFrame,
                           dfs: DataFrame, stats: DataFrame)

/**
 * BM25 ranked retrieval (Robertson/Okapi scoring, the Lucene
 * `log(1 + (N - df + 0.5)/(df + 0.5))` idf form; k1 = 1.2, b = 0.75) with
 * the inverted index as a COMMITTED set of tables — the text-retrieval
 * operator a training-data pipeline needs for query-relevance filtering,
 * benchmark-query mining, and corpus exploration at 10^12 docs.
 *
 * Engine-portable determinism (full DuckDB twin, q_text_bm25): terms are
 * the shared `[a-z]{3,}` token stream (same regexp as q_text_keywords);
 * every per-term score is ONE double expression — textually identical in
 * Spark and the twin ([[termScoreFpSql]]) so both engines evaluate the
 * same IEEE tree — floored to integer micro-units BEFORE the per-document
 * sum, so the only float op sequence is per-term (order-free integer SUM
 * across terms; cross-engine double sums would be accumulation-order-
 * dependent). Ranking orders by the integer score, never the raw double.
 *
 * Scale shape at 10^12 docs: the index is built with two token-keyed
 * groupBys (map-side combined) and persisted bucketed by `term`; `dfs`
 * derives from postings (never a second corpus pass) and `stats` is one
 * row. A query batch tokenizes to a FEW (query, term) rows — the
 * postings join broadcasts the query side, so retrieval reads only the
 * probed terms' lists; hot terms (stopwords) are ordinary join skew
 * (AQE), and per-query top-k is a WindowGroupLimit window partitioned by
 * query. Nothing rescans the corpus at query time.
 */
object Bm25 {

  /** Token regexp shared with the tf-idf keyword operator. */
  val TermRe = "[a-z]{3,}"

  /** floor(1e6 * BM25 term score) over columns (tf, df, dl, n_docs,
    * sum_dl) — used verbatim by the Spark plan AND the DuckDB twin, so
    * the double expression tree is identical in both engines. avgdl
    * appears as `sum_dl / n_docs` (true division in both). */
  val termScoreFpSql: String =
    "CAST(floor(1000000.0 * (ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * " +
      "(tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / (sum_dl / n_docs))))) AS BIGINT)"

  /** The corpus token stream: (doc_id, term), one row per occurrence. */
  def terms(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(expr(s"regexp_extract_all(lower(text), '$TermRe', 0)")).as("term"))

  /** Index BUILD: two token-keyed groupBys over one corpus pass, dfs from
    * postings, stats from doclens. Build once, probe many. */
  def build(docs: DataFrame): Bm25Model = {
    val tm = terms(docs)
    val postings = tm.groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
    val doclens = tm.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val dfs = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = doclens.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    Bm25Model(postings, doclens, dfs, stats)
  }

  /** [[build]] with all four relations snapshot-committed via
    * [[graft.tables.StageRunner]] (lineage: dfs/stats derive from their
    * base stages, so recommitting postings invalidates exactly its
    * cone). A second build call resolves the committed snapshots and
    * runs zero corpus work — the same train-once/commit/probe-many
    * contract as the ANN index stack. */
  def buildStaged(st: graft.tables.StageRunner, docs: DataFrame): Bm25Model = {
    val postings = st.stage("bm25-postings")(
      terms(docs).groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf")))
    val doclens = st.stage("bm25-doclens")(
      terms(docs).groupBy(col("doc_id")).agg(count(lit(1)).as("dl")))
    val dfs = st.stage("bm25-dfs", Seq("bm25-postings"))(
      postings.groupBy(col("term")).agg(count(lit(1)).as("df")))
    val stats = st.stage("bm25-stats", Seq("bm25-doclens"))(
      doclens.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl")))
    Bm25Model(postings, doclens, dfs, stats)
  }

  /** Ranked retrieval: `queries` (query_id, qtext) against the committed
    * index -> (query_id, rank, doc_id, score_fp), top `k` per query by
    * (score desc, doc_id). Query terms are DISTINCT per query (repeating
    * a word in the query does not double its weight — the common qtf=1
    * simplification, stated not hidden). */
  def topK(model: Bm25Model, queries: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val qterms = queries.select(col("query_id"),
        explode(expr(s"regexp_extract_all(lower(qtext), '$TermRe', 0)")).as("term"))
      .distinct()
    // query terms pick up their df FIRST (tiny broadcast vs the term
    // dictionary — the full dfs relation is never broadcast), then the
    // enriched query side broadcasts against the postings lists
    val qdf = broadcast(qterms).join(model.dfs, "term")
    val scored = broadcast(qdf).join(model.postings, "term")
      .join(model.doclens, "doc_id")
      .crossJoin(broadcast(model.stats))
      .select(col("query_id"), col("doc_id"), expr(termScoreFpSql).as("sfp"))
      .groupBy(col("query_id"), col("doc_id")).agg(sum(col("sfp")).as("score_fp"))
    scored
      .withColumn("rank", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("score_fp").desc, col("doc_id"))))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score_fp"))
  }
}

/** Fingerprint-keyed stage root for committed TEXT indexes (the
  * [[AnnStages]] analog over a documents corpus). */
object TextStages {
  /** Bump when any text-index algorithm changes. */
  val Version = "v1"

  def fingerprint(docs: DataFrame): Long =
    docs.agg(coalesce(bit_xor(xxhash64(col("doc_id"), col("text"))), lit(0L)))
      .head().getLong(0)

  def runnerFor(docs: DataFrame): graft.tables.StageRunner = {
    val fp = java.lang.Long.toHexString(fingerprint(docs))
    val base = sys.props.getOrElse("graft.textStagesDir",
      sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft_text_stages")
    new graft.tables.StageRunner(docs.sparkSession, s"$base/${Version}_$fp")
  }
}
