package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract smoke + engine-only query semantics (the ones without a DuckDB
  * oracle: MinHash-LSH, SimHash, kNN ring search). */
class SparkEntrySpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("entry: flagship pipeline returns labeled rows") {
    val df = SparkEntry.entry(spark)
    val counts = df.groupBy($"label").count().as[(String, Long)].collect().toMap
    assert(counts.getOrElse("lamp", 0L) > 0 && counts.getOrElse("nolamp", 0L) > 0)
  }

  test("every oracleSql key has a queries twin") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("kNN ring search == brute force (including ties)") {
    val probes = spark.read.parquet(s"$sf/customer.parquet")
      .where($"c_custkey" <= 50)
      .select($"c_custkey".as("probe_id"),
        (lit(53.8306) + (($"c_custkey" * 7) % 14000).cast("double") * 0.00001).as("plat"),
        (lit(27.4026) + (($"c_custkey" * 13) % 29000).cast("double") * 0.00001).as("plng"))
    val cands = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_orderkey",
        (lit(53.8306) + ($"o_orderkey" % 14000).cast("double") * 0.00001).as("lat"),
        (lit(27.4026) + ($"o_orderkey" % 29000).cast("double") * 0.00001).as("lng"))

    val ring = pipeline.KnnJoin.knn(probes, cands, k = 3)
      .select($"probe_id", $"rank", $"o_orderkey")
      .as[(Long, Int, Long)].collect().toSet

    val brute = probes.crossJoin(cands)
      .withColumn("d2", ($"lat" - $"plat") * ($"lat" - $"plat") +
        ($"lng" - $"plng") * ($"lng" - $"plng"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"probe_id")
          .orderBy($"d2", $"o_orderkey")))
      .where($"rank" <= 3)
      .select($"probe_id", $"rank", $"o_orderkey")
      .as[(Long, Int, Long)].collect().toSet

    assert(ring == brute)
  }

  test("MinHash-LSH candidates: every high-Jaccard pair is found, estimates sane") {
    // craft docs with known near-duplicates
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again!"), // ~dup of 1
      (3L, "completely different content about spark catalyst expressions"),
      (4L, "completely different content about spark catalyst expressions"), // exact dup of 3
      (5L, "unrelated short text"),
    ).toDF("doc_id", "text")
    val pairs = pipeline.Dedup.minhashPairs(docs, shingleLen = 5, numPerm = 16, bands = 4)
      .as[(Long, Long, Long)].collect()
      .map(p => ((p._1, p._2), p._3)).toMap
    assert(pairs.contains((3L, 4L)), "exact dup pair found")
    assert(pairs((3L, 4L)) == 1000000L, "exact dup jaccard == 1.0")
    assert(pairs.contains((1L, 2L)), "near dup pair found")
    assert(pairs((1L, 2L)) > 800000L, "near dup jaccard high")
    assert(!pairs.contains((1L, 5L)) || pairs((1L, 5L)) < 300000L)
  }

  test("SimHash pairs: identical docs at hamming 0, near dups within budget") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (4L, "nothing in common with those other documents at all whatsoever"),
    ).toDF("doc_id", "text")
    val pairs = pipeline.Dedup.simhashPairs(docs, verifyHamming = 8)
      .as[(Long, Long, Int)].collect()
      .map(p => ((p._1, p._2), p._3)).toMap
    assert(pairs((1L, 2L)) == 0, "identical docs")
    assert(pairs.get((1L, 3L)).forall(_ <= 8))
    assert(!pairs.contains((1L, 4L)) && !pairs.contains((2L, 4L)))
  }

  test("kNN sparse world: far probes resolve via the guarded tail sweep") {
    // candidates clustered near (53.85, 27.45); probes 2 grid-rounds away,
    // so rings stay empty and the broadcast tail handles them
    val cands = spark.range(0, 50).select($"id".as("o_orderkey"),
      (lit(53.85) + ($"id" % 10).cast("double") * 0.0001).as("lat"),
      (lit(27.45) + ($"id" % 7).cast("double") * 0.0001).as("lng"))
    val probes = Seq((1L, 54.9, 28.9), (2L, 52.1, 26.2)).toDF("probe_id", "plat", "plng")
    val got = pipeline.KnnJoin.knn(probes, cands, k = 3)
      .select($"probe_id", $"rank", $"o_orderkey").as[(Long, Int, Long)].collect().toSet
    val brute = probes.crossJoin(cands)
      .withColumn("d2", ($"lat" - $"plat") * ($"lat" - $"plat") +
        ($"lng" - $"plng") * ($"lng" - $"plng"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"probe_id")
          .orderBy($"d2", $"o_orderkey")))
      .where($"rank" <= 3).select($"probe_id", $"rank", $"o_orderkey")
      .as[(Long, Int, Long)].collect().toSet
    assert(got == brute)
    // the guard refuses an unbounded tail instead of cross-joining it
    val err = intercept[Exception] {
      pipeline.KnnJoin.knn(probes, cands, k = 3, tailLimit = 1L).collect()
    }
    assert(err.getMessage.contains("tailLimit"))
  }

  test("kNN carried-into-tail: probe with 1 <= m < k ring matches keeps exact ranks") {
    // probe has exactly ONE candidate inside every ring round (so it
    // carries m=1 < k=3 into the tail) and two candidates reachable only
    // by the tail sweep — duplicated carried rows would corrupt ranks
    val probes = Seq((1L, 50.0, 20.0)).toDF("probe_id", "plat", "plng")
    val cands = Seq((10L, 50.0005, 20.0005), (20L, 55.0, 25.0), (30L, 45.0, 15.0))
      .toDF("o_orderkey", "lat", "lng")
    val got = pipeline.KnnJoin.knn(probes, cands, k = 3)
      .select($"rank", $"o_orderkey").as[(Int, Long)].collect().toSet
    assert(got == Set((1, 10L), (2, 20L), (3, 30L)), s"got $got")
  }

  test("deterministic sampling is idempotent across runs and partitionings") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    def sample(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(xxhash64($"l_orderkey", lit(42L)), $"l_orderkey", $"l_linenumber")
        .limit(50).select($"l_orderkey", $"l_linenumber")
        .as[(Long, Int)].collect().toSeq
    assert(sample(li) == sample(li.repartition(13)))
  }
}
