package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the concat-and-chunk pass LLM training pipelines
  * run between dedup and the tokenizer shards: documents concatenate in a
  * deterministic hash order and the stream is cut into fixed token-budget
  * bins; a document overflowing a bin boundary is SPLIT across bins
  * (GPT-style packing, not first-fit — packing is exact and order-stable,
  * never a heuristic that depends on partitioning).
  *
  * Scale shape: a global running sum would be one single-partition window
  * over the corpus. Instead the deterministic order key (md5) is split at
  * its PREFIX into `shardHexChars` shards — prefix order makes
  * (shard, key) order == global key order — so the cumsum decomposes into
  * per-shard windows (each a normal hash-partitioned exchange) plus one
  * bounded running-offset pass over the 16^shardHexChars per-shard totals
  * (broadcast back; the same bounded-tiny-window pattern as the pipeline
  * rank-threshold splits). Growing the corpus only grows the per-shard
  * window inputs, never the offset table; at 10^12 rows raise
  * `shardHexChars` to 3-4 (4096-65536 shards).
  *
  * Reference counterpart: none — the reference ships examples one tile
  * per record (lib/tiles.py); packing is the large-scale training-data
  * operator this engine adds on top.
  */
object Pack {

  /** Pack `docs` (must carry `idCol` and a positive token count `nCol`;
    * zero/negative-count rows are dropped — an empty doc occupies no
    * tokens) into `budget`-token bins. Returns one row per (doc, bin)
    * span: (doc_id, bin_id, doc_off, bin_off, len) — `len` tokens of the
    * doc starting at `doc_off` land in bin `bin_id` at offset `bin_off`.
    * Every bin except the last is exactly full by construction. */
  def packChunks(docs: DataFrame, budget: Long,
                 idCol: String = "doc_id", nCol: String = "n_tokens",
                 shardHexChars: Int = 2): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shardHexChars >= 1 && shardHexChars <= 8,
      s"shardHexChars must be in [1,8], got $shardHexChars")
    val id = col(idCol)
    // deterministic engine-portable order key; its hex prefix is the shard
    val keyed = docs
      .where(col(nCol) > 0)
      .select(id.as("doc_id"), col(nCol).cast("long").as("n"),
        md5(concat_ws("|", lit("pack"), id.cast("string"))).as("pk"))
      .withColumn("shard", substring(col("pk"), 1, shardHexChars))
    // phase 1: per-shard running sum (hash-partitioned window, scales out)
    val local = keyed.withColumn("lcum",
      sum(col("n")).over(Window.partitionBy(col("shard"))
        .orderBy(col("pk"), col("doc_id"))))
    // phase 2: running offset over the per-shard totals — bounded at
    // 16^shardHexChars rows, so the unpartitioned window is a few KB
    val offs = keyed.groupBy(col("shard")).agg(sum(col("n")).as("tot"))
      .withColumn("off", coalesce(
        sum(col("tot")).over(Window.orderBy(col("shard"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("shard"), col("off"))
    val spans = local.join(broadcast(offs), "shard")
      .withColumn("cend", col("off") + col("lcum"))
      .withColumn("cstart", col("cend") - col("n"))
    // a doc covers bins floor(cstart/B) .. floor((cend-1)/B); per bin the
    // span is the overlap of [cstart, cend) with [bin*B, (bin+1)*B)
    val b = lit(budget)
    val sstart: Column = greatest(col("cstart"), col("bin_id") * b)
    val send: Column = least(col("cend"), (col("bin_id") + 1) * b)
    spans
      .withColumn("bin_id", explode(sequence(
        expr(s"cstart div $budget"), expr(s"(cend - 1) div $budget"))))
      .select(col("doc_id"), col("bin_id"),
        (sstart - col("cstart")).as("doc_off"),
        (sstart - col("bin_id") * b).as("bin_off"),
        (send - sstart).as("len"))
  }
}
