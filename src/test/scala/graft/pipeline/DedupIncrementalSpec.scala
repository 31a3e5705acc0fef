package graft.pipeline

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Incremental dedup's whole contract: resolveDelta(committed, deltaPairs)
 * == a full resolveClusters rerun over the grown corpus — for graphs that
 * exercise every merge shape a refresh can produce (old components merging
 * THROUGH delta docs, delta-only clusters, isolated old keeps touched and
 * untouched, chains crossing the boundary), plus a randomized graph.
 */
class DedupIncrementalSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  private def pairsDf(ps: Seq[(Long, Long)]): DataFrame = ps.toDF("ida", "idb")

  private def rows(df: DataFrame): Set[(Long, Long, Long)] =
    df.select(col("doc_id"), col("rep_id"), col("keep"))
      .as[(Long, Long, Long)].collect().toSet

  /** delta = ids >= `split`; committed = resolve over old-only pairs. */
  private def check(all: Seq[(Long, Long)], split: Long): Unit = {
    val oldPairs = all.filter { case (a, b) => a < split && b < split }
    val deltaPairs = all.filterNot { case (a, b) => a < split && b < split }
    val committed = Dedup.resolveClusters(pairsDf(oldPairs))
      .select(col("doc_id"), col("rep_id"))
    val inc = Dedup.resolveDelta(committed, pairsDf(deltaPairs))
    val full = Dedup.resolveClusters(pairsDf(all))
    assert(rows(inc) == rows(full))
  }

  test("two old components merged through a delta chain") {
    // {1,2} and {3,4} are separate old components; delta doc 100 bridges
    // them — the rerun must relabel 3,4 to rep 1, and so must the merge
    check(Seq((1L, 2L), (3L, 4L), (2L, 100L), (100L, 3L)), split = 50L)
  }

  test("delta-only cluster, untouched old component, old-to-delta attach") {
    check(Seq(
      (1L, 2L), (2L, 3L),          // old component untouched by the delta
      (10L, 11L),                  // old pair whose component gains 101
      (11L, 101L),
      (100L, 102L), (102L, 103L)   // cluster entirely inside the delta
    ), split = 50L)
  }

  test("isolated committed keeps: touched ones merge, untouched pass through") {
    // committed has self-components via docs that only appeared paired
    // with themselves in the OLD run — emulate with an old pair whose
    // resolve yields (7, 7, keep) after its partner also resolves, then
    // delta touches one isolated doc and not the other
    val committed = Seq((7L, 7L), (8L, 8L), (1L, 1L), (2L, 1L)).toDF("doc_id", "rep_id")
    val inc = Dedup.resolveDelta(committed, pairsDf(Seq((7L, 100L))))
    val got = rows(inc)
    assert(got.contains((8L, 8L, 1L)), "untouched isolated keep must pass through")
    assert(got.contains((7L, 7L, 1L)) && got.contains((100L, 7L, 0L)),
      "touched isolated keep becomes the rep of its new pair")
    assert(got.contains((1L, 1L, 1L)) && got.contains((2L, 1L, 0L)))
  }

  test("chain crossing the boundary repeatedly") {
    // 0-1-100-2-101-3: one component, min rep 0, stitched old/delta/old
    check(Seq((0L, 1L), (1L, 100L), (100L, 2L), (2L, 101L), (101L, 3L)), split = 50L)
  }

  test("randomized refresh graph matches the full rerun") {
    val rnd = new scala.util.Random(7)
    val nOld = 120L
    val nAll = 180L
    val all = (0 until 400).map { _ =>
      val a = rnd.nextInt(nAll.toInt).toLong
      val b = rnd.nextInt(nAll.toInt).toLong
      (math.min(a, b), math.max(a, b))
    }.filter { case (a, b) => a != b }.distinct
    check(all, split = nOld)
  }

  test("simhashDeltaPairs emits exactly the delta-involved band pairs") {
    // docs 0..9 near-identical hashes in two groups; delta = ids >= 6
    val hs = (0L until 10L).map { id =>
      val base = if (id % 2 == 0) 0x0F0F0F0F0F0F0FL else 0x70707070707070L
      (id, base ^ (1L << (id % 3))) // hamming <= 2 within a group
    }.toDF("doc_id", "sh")
    val allPairs = Dedup.simhashPairsFromHashes(hs, verifyHamming = 8, hashBits = 60)
      .select(col("ida"), col("idb")).as[(Long, Long)].collect().toSet
    val deltaPairs = Dedup.simhashDeltaPairs(hs, col("doc_id") >= 6L,
        verifyHamming = 8, hashBits = 60)
      .select(col("ida"), col("idb")).as[(Long, Long)].collect().toSet
    val expected = allPairs.filter { case (a, b) => a >= 6L || b >= 6L }
    assert(deltaPairs == expected && deltaPairs.nonEmpty)
    assert(deltaPairs != allPairs, "old×old pairs must be absent")
  }
}
