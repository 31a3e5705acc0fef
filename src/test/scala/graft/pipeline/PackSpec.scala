package graft.pipeline

import graft.SparkSuite
import org.apache.spark.sql.DataFrame

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sequence packing (concat-and-chunk) contract:
  *  - token conservation: every positive-count doc's spans tile [0, n);
  *  - bin density: every bin except the last is EXACTLY budget tokens,
  *    and within a bin spans tile [0, fill) with no gaps or overlap;
  *  - determinism: output is a pure function of (ids, counts), not of
  *    partitioning;
  *  - scale shape: the corpus-sized cumsum runs as per-shard windows —
  *    the only unpartitioned window is the bounded shard-offset pass.
  */
class PackSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  val B = 100L
  // counts straddle every interesting case: sub-bin, exactly-bin,
  // multi-bin (357 spans >= 3 boundaries), and zero (must vanish)
  lazy val docs: DataFrame = (1L to 200L).map { id =>
    (id, (id * 37 % 90) + (if (id % 7 == 0) 357L else 1L) - (if (id % 13 == 0) (id * 37 % 90) + 1L else 0L))
  }.toDF("doc_id", "n_tokens").cache()

  private def packed: DataFrame = Pack.packChunks(docs, B)

  test("token conservation: spans tile each doc exactly") {
    val perDoc = packed.groupBy("doc_id")
      .agg(sum("len").as("got"), min("doc_off").as("lo"),
        max(col("doc_off") + col("len")).as("hi"), count(lit(1)).as("nspans"))
      .join(docs, "doc_id")
      .collect()
    val pos = docs.where(col("n_tokens") > 0).count()
    assert(perDoc.length == pos, "every positive-count doc must appear")
    perDoc.foreach { r =>
      assert(r.getAs[Long]("got") == r.getAs[Long]("n_tokens") &&
        r.getAs[Long]("lo") == 0L &&
        r.getAs[Long]("hi") == r.getAs[Long]("n_tokens"),
        s"doc ${r.getAs[Long]("doc_id")} not tiled: $r")
    }
    // spans of one doc never overlap: offsets+lens tile => pairwise sums
    val overlaps = packed.as("a").join(packed.as("b"),
      col("a.doc_id") === col("b.doc_id") && col("a.bin_id") < col("b.bin_id") &&
        col("a.doc_off") + col("a.len") > col("b.doc_off")).count()
    assert(overlaps == 0L)
  }

  test("bin density: all bins except the last exactly full; spans tile bins") {
    val bins = packed.groupBy("bin_id").agg(sum("len").as("fill")).collect()
      .map(r => (r.getAs[Long]("bin_id"), r.getAs[Long]("fill"))).sortBy(_._1)
    val maxBin = bins.map(_._1).max
    assert(bins.map(_._1).toSeq == (0L to maxBin), "bin ids must be contiguous from 0")
    bins.dropRight(1).foreach { case (b, f) => assert(f == B, s"bin $b fill $f != $B") }
    assert(bins.last._2 <= B && bins.last._2 > 0)
    // within a bin, spans sorted by bin_off are gapless
    val gaps = packed.withColumn("nxt",
        lead(col("bin_off"), 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy("bin_id").orderBy("bin_off")))
      .where(col("nxt").isNotNull && col("nxt") =!= col("bin_off") + col("len"))
      .count()
    assert(gaps == 0L, "spans within a bin must be gapless and non-overlapping")
  }

  test("deterministic under repartitioning; zero-count docs vanish") {
    val a = packed.collect().map(_.toString).toSet
    val b = Pack.packChunks(docs.repartition(13, col("n_tokens")), B)
      .collect().map(_.toString).toSet
    assert(a == b, "packing must not depend on input partitioning")
    val zeros = docs.where(col("n_tokens") <= 0).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(zeros.nonEmpty, "fixture must include zero-count docs")
    val out = packed.select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(out.intersect(zeros).isEmpty)
  }

  test("scale shape: corpus cumsum is sharded; only the bounded offset window is global") {
    // the optimized logical plan (AQE wraps the physical one, hiding its
    // children from collect until execution)
    val plan = packed.queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w.partitionSpec
    }
    assert(windows.nonEmpty)
    val unpartitioned = windows.count(_.isEmpty)
    assert(unpartitioned == 1,
      s"exactly the shard-offset window may be unpartitioned, found $unpartitioned of ${windows.size}")
  }
}
