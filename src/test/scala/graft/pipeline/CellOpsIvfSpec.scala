package graft.pipeline

import graft.SparkSuite
import graft.core.CellId
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the round-3 additions: CellOps compact/uncompact (H3-style
  * minimal covers) and the IVF ANN index. */
class CellOpsIvfSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  // ---------------- CellOps ----------------

  test("compact collapses complete quads, keeps partial quads, recursively") {
    // planted: the 16 z14 children of one z12 cell (two full levels), plus
    // 3 of 4 children of a neighbor z13 cell, plus one lone z14 cell
    val z12 = CellId.pack(12, 100, 200)
    val full16 = CellId.children(z12).flatMap(CellId.children)
    val partial = CellId.children(CellId.pack(13, 300, 400)).take(3)
    val lone = CellId.pack(14, 5000, 6000)
    val in = (full16 ++ partial ++ Array(lone)).toSeq.toDF("cell_id")
    val out = CellOps.compact(in, zMax = 14, zMin = 11)
      .as[Long].collect().toSet
    assert(out == (partial.toSet + z12 + lone),
      s"full 16-cell quad-of-quads must become its z12 ancestor: $out")
  }

  test("uncompact(compact(cover)) == cover for a uniform-z cover") {
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val cells = o.select(graft.functions.GeoF.cellAtWgs(
      lit(53.8306) + (col("o_orderkey") % 14000).cast("double") * lit(0.00001),
      lit(27.4026) + (col("o_orderkey") % 29000).cast("double") * lit(0.00001),
      14).as("cell_id")).distinct()
    val compacted = CellOps.compact(cells, zMax = 14, zMin = 11)
    val roundTrip = CellOps.uncompact(compacted, 14).as[Long].collect().sorted
    val orig = cells.as[Long].collect().sorted
    assert(roundTrip.sameElements(orig), "compact/uncompact must be lossless")
    assert(compacted.count() <= orig.length, "compact never grows a cover")
  }

  test("compact never expands a redundant cover (cell + its descendants)") {
    // Q13 present both as itself and as its 4 children, plus 2 of its 3
    // siblings: without per-round dedup the promoted Q13 double-counts and
    // the z13 round would promote the PARENT quad, claiming the absent
    // 4th sibling's area
    val z12 = CellId.pack(12, 100, 200)
    val q13 = CellId.children(z12)(0)
    val siblings = CellId.children(z12).drop(1).take(2)
    val in = (Array(q13) ++ CellId.children(q13) ++ siblings).toSeq.toDF("cell_id")
    val out = CellOps.compact(in, zMax = 14, zMin = 11).as[Long].collect()
    assert(out.length == out.distinct.length, "compact output must be a set")
    assert(out.toSet == (siblings.toSet + q13),
      s"redundant input must collapse WITHOUT promoting the incomplete z12 quad: ${out.toSet}")
  }

  test("uncompact fails loudly on cover cells finer than the target level") {
    val cover = Seq(CellId.pack(14, 400, 800)).toDF("cell_id")
    val e = intercept[Exception] {
      CellOps.uncompact(cover, 13).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("finer than target")), s"unexpected error: $e")
  }

  test("compact fails loudly on input cells finer than zMax") {
    // a z15 cell in a zMax=14 compact would silently pass through every
    // promotion round (level-mixed non-minimal output that coverJoin's
    // bounded ancestor chain never matches) — the guard must raise instead
    val in = Seq(CellId.pack(14, 400, 800), CellId.pack(15, 900, 900)).toDF("cell_id")
    val e = intercept[Exception] {
      CellOps.compact(in, zMax = 14, zMin = 11).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("finer than zMax")), s"unexpected error: $e")
  }

  test("PQ encode skips missing dimensions (short embeddings) like the SQL twin") {
    val cb = PqIndex.codebooks(planted)
    val full = planted.where($"vec_id" === 3)
      .select($"embedding".cast("array<double>")).as[Seq[Double]].head()
    val short = full.take(36) // subspace 4 half-present, 5..7 absent
    val codes = PqIndex.encodeKernel(cb, short)
    // fully-absent subspaces contribute NO distance terms: every codeword
    // ties at 0 and the tie-break must pick codeword 0
    for (s <- 5 until PqIndex.M)
      assert(codes(s) == 0, s"empty subspace $s must tie-break to codeword 0")
    // present subspaces must agree with encoding computed over only the
    // existing positions (join-on-pos semantics)
    for (s <- 0 until 4)
      assert(codes(s) == PqIndex.encodeKernel(cb, full)(s),
        s"fully-present subspace $s must encode as if the vector were full")
  }

  test("coverJoin: exactly one row per covered point, none for outside points") {
    val z12 = CellId.pack(12, 100, 200)
    val full16 = CellId.children(z12).flatMap(CellId.children) // its z14 grid
    val cover = CellOps.compact(full16.toSeq.toDF("cell_id"), zMax = 14, zMin = 11)
    assert(cover.as[Long].collect().toSet == Set(z12), "fixture compacts to one z12 cell")
    val points = Seq((1L, CellId.pack(14, 401, 802)),  // inside (z14 under z12)
                     (2L, CellId.pack(14, 500, 900)))  // outside
      .toDF("pid", "cell_id")
    val out = CellOps.coverJoin(points, cover, zMax = 14, zMin = 11)
      .select($"pid", $"cover_cell").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((1L, z12)),
      s"inside point matches its z12 ancestor exactly once, outside drops: ${out.toSeq}")
  }

  test("keyed compact: each zone's cover compacts independently in one pass") {
    val z12 = CellId.pack(12, 100, 200)
    val full16 = CellId.children(z12).flatMap(CellId.children)
    // zone X holds the complete quad-of-quads, zone Y only 15 of the 16 —
    // X must promote to z12, Y must not promote past the missing quad
    val in = (full16.map(("X", _)) ++ full16.drop(1).map(("Y", _)))
      .toSeq.toDF("zone", "cell_id")
    val out = CellOps.compact(in, zMax = 14, zMin = 11, keys = Seq("zone"))
      .as[(String, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(out("X") == Set(z12), s"zone X must compact to its z12 ancestor: ${out("X")}")
    val kidsZ13 = CellId.children(z12)
    // Y: the first z13 quad is missing one z14 child (3 singles), the
    // other three z13 quads are complete but their z12 quad is not
    assert(out("Y") == kidsZ13.drop(1).toSet ++ CellId.children(kidsZ13(0)).drop(1).toSet,
      s"zone Y must keep the partial structure: ${out("Y")}")
  }

  test("coverIntersect: ancestor-chain join == brute-force fine intersection, mixed levels") {
    val z12 = CellId.pack(12, 100, 200)
    val kidsZ13 = CellId.children(z12)
    val kidsZ14 = CellId.children(kidsZ13(0))
    val a = Seq(
      ("A1", z12),                        // coarse cell covering everything below
      ("A1", CellId.pack(14, 5000, 6000)), // isolated, matches nothing
      ("A2", kidsZ13(2)),                 // equal-level overlap with B2
      ("A3", kidsZ14(2))                  // finer than B4's z12 (direction 2)
    ).toDF("zone_a", "cell_id")
    val b = Seq(
      ("B1", kidsZ14(0)), ("B1", kidsZ14(1)), // z14 under A1's z12
      ("B2", kidsZ13(2)),                     // z13 under A1; equal to A2's cell
      ("B2", CellId.pack(13, 999, 999)),      // overlaps nothing
      ("B3", CellId.pack(14, 7000, 8000)),    // overlaps nothing
      ("B4", z12)                             // coarse; A3's z14 is inside
    ).toDF("zone_b", "cell_id")
    val got = CellOps.coverIntersect(a, b, zMax = 14, zMin = 11)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    // brute force: expand every cover cell to its z14 descendants
    // driver-side and intersect the fine sets per zone pair
    def desc14(c: Long): Set[Long] =
      if (CellId.z(c) == 14) Set(c) else CellId.children(c).flatMap(desc14).toSet
    def fine(rows: Seq[(String, Long)]): Map[String, Set[Long]] =
      rows.groupBy(_._1).view.mapValues(_.flatMap(x => desc14(x._2)).toSet).toMap
    val af = fine(Seq("A1" -> z12, "A1" -> CellId.pack(14, 5000, 6000),
      "A2" -> kidsZ13(2), "A3" -> kidsZ14(2)))
    val bf = fine(Seq("B1" -> kidsZ14(0), "B1" -> kidsZ14(1),
      "B2" -> kidsZ13(2), "B2" -> CellId.pack(13, 999, 999),
      "B3" -> CellId.pack(14, 7000, 8000), "B4" -> z12))
    val expectedAreas = (for {
      (za, fa) <- af; (zb, fb) <- bf
      n = fa.intersect(fb).size if n > 0
    } yield (za, zb) -> n.toLong).toMap
    assert(got.view.mapValues(_._2).toMap == expectedAreas,
      s"areas diverge: got=$got expected=$expectedAreas")
    // spot pair counts: A1xB1 = two cell pairs, A2xB2 = the equal-cell
    // pair, A3xB4 = the finer-a direction
    assert(got(("A1", "B1")) == (2L, 2L) && got(("A2", "B2")) == (1L, 4L)
      && got(("A3", "B4")) == (1L, 1L))
  }

  test("morton key == per-bit interleave reference; inverse roundtrips; blocks are contiguous ranges") {
    // driver-side reference: interleave one bit at a time
    def refMorton(cell: Long): Long = {
      val z = CellId.z(cell); val tx = CellId.tx(cell); val ty = CellId.ty(cell)
      var m = 0L
      for (b <- 0 until 29)
        m |= ((tx >> b) & 1L) << (2 * b) | ((ty >> b) & 1L) << (2 * b + 1)
      z.toLong * (1L << 58) + m
    }
    val rnd = new scala.util.Random(7)
    val cells = (1 to 200).map { _ =>
      val z = 1 + rnd.nextInt(29)
      val max = (1L << z) - 1
      CellId.pack(z, rnd.nextLong() & max, rnd.nextLong() & max)
    }
    val got = cells.toDF("cell_id")
      .select(col("cell_id"), CellOps.mortonOf(col("cell_id")).as("m"),
        CellOps.cellOfMorton(CellOps.mortonOf(col("cell_id"))).as("rt"))
      .collect()
    got.foreach { r =>
      val (c, m, rt) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(m == refMorton(c), s"morton mismatch for $c")
      assert(rt == c, s"roundtrip mismatch for $c")
    }
    // z-order block property: an aligned 2^k x 2^k block at one level is
    // EXACTLY one contiguous morton range of length 4^k
    for (_ <- 1 to 20) {
      val k = 1 + rnd.nextInt(4)
      val z = 10 + rnd.nextInt(10)
      val bx = (rnd.nextLong() & ((1L << (z - k)) - 1)) << k
      val by = (rnd.nextLong() & ((1L << (z - k)) - 1)) << k
      val ms = (for (dx <- 0L until (1L << k); dy <- 0L until (1L << k))
        yield refMorton(CellId.pack(z, bx + dx, by + dy))).sorted
      assert(ms.last - ms.head == (1L << (2 * k)) - 1 &&
        ms == (ms.head to ms.last),
        s"block z=$z k=$k at ($bx,$by) is not one contiguous range")
    }
  }

  test("mortonRangesOfCover: ranges tile exactly the cover's fine-cell morton keys") {
    def refMorton(cell: Long): Long = {
      val z = CellId.z(cell); val tx = CellId.tx(cell); val ty = CellId.ty(cell)
      var m = 0L
      for (b <- 0 until 29)
        m |= ((tx >> b) & 1L) << (2 * b) | ((ty >> b) & 1L) << (2 * b + 1)
      z.toLong * (1L << 58) + m
    }
    // mixed-level cover: one z12 cell, one z13, two z14 singles
    val z12 = CellId.pack(12, 100, 200)
    val cover = Seq(z12, CellId.pack(13, 300, 400),
      CellId.pack(14, 5000, 6000), CellId.pack(14, 7000, 8000)).toDF("cell_id")
    val ranges = CellOps.mortonRangesOfCover(cover, zLeaf = 14)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // expected: the morton keys of the UNCOMPACTED z14 fill
    val fine = CellOps.uncompact(cover, 14).as[Long].collect().map(refMorton).toSet
    val fromRanges = ranges.flatMap { case (lo, hi) => lo to hi }.toSet
    assert(fromRanges == fine,
      s"range union must equal the fine morton set (${fromRanges.size} vs ${fine.size})")
    assert(ranges.forall { case (lo, hi) => (hi - lo + 1) % 4 == 0 || hi == lo },
      "range lengths are powers of 4")
    intercept[Exception] {
      CellOps.mortonRangesOfCover(cover, zLeaf = 13).collect()
    }
  }

  test("parentOf column math == CellId.parent kernel") {
    val cells = Seq(CellId.pack(14, 0, 0), CellId.pack(14, 9731, 5442),
      CellId.pack(19, 302123, 171456), CellId.pack(1, 1, 1)).toDF("cell_id")
    val got = cells.select(col("cell_id"), CellOps.parentOf(col("cell_id")).as("p"))
      .as[(Long, Long)].collect().toMap
    got.foreach { case (c, p) => assert(p == CellId.parent(c), s"cell $c") }
  }

  // ---------------- IvfIndex ----------------

  val sf = "/root/testdata/sf0.001"
  lazy val base = spark.read.parquet(s"$sf/embeddings.parquet")

  /** Corpus + 5 planted near-dups of vec 0 (same construction as
    * AnnIndexSpec — cosine > 0.999). */
  lazy val planted = {
    val q = base.where($"vec_id" === 0).select($"embedding").head().getSeq[Float](0)
    val dups = (0 until 5).map { i =>
      (100000L + i, q.zipWithIndex.map { case (v, d) =>
        v + (if ((d + i) % 7 == 0) 0.003f else -0.002f) }.toArray)
    }
    base.select($"vec_id", $"embedding")
      .unionByName(dups.toDF("vec_id", "embedding"))
      .cache()
  }

  test("IVF: planted near-dups route with their original and fill its top-k") {
    val probes = planted.where($"vec_id" === 0)
    val top = IvfIndex.knnJoin(probes, planted, k = 5, nlist = 16, nprobe = 2)
      .select($"vec_id").as[Long].collect().toSet
    assert(top == (0 until 5).map(100000L + _).toSet,
      s"top-5 should be the planted cluster: $top")
  }

  test("IVF routing scans ~nprobe/nlist of the corpus, and every vector lands in one list") {
    val cents = IvfIndex.centroidTable(planted, 16)
    val cids = cents.select($"cid").as[Long].collect()
    assert(cids.length == 16 && cids.distinct.length == 16)
    val lists = IvfIndex.assign(planted, cents).cache()
    val n = lists.count()
    assert(n == planted.count(), "assignment is total: one list per vector")
    // probing 2 of 16 lists touches a bounded corpus fraction even with
    // skewed list sizes: the 2 largest lists bound any probe's candidates
    val sizes = lists.groupBy($"cid").count().select($"count").as[Long].collect().sorted
    val worst = sizes.takeRight(2).sum.toDouble / n
    assert(worst < 0.6, f"two largest lists hold $worst%.2f of the corpus — degenerate quantizer")
    lists.unpersist()
  }

  test("two-level IVF == sequential oracle; planted cluster recalled") {
    val got = IvfIndex.knnJoinTwoLevel(planted.where($"vec_id" < 10), planted,
        k = 3, nsuper = 4, nsub = 8, nprobeSuper = 2, nprobe = 4, trainRounds = 1)
      .select($"probe_id", $"rank", $"vec_id", $"dot")
      .as[(Long, Int, Long, Long)].collect().toSet
    // sequential oracle: the whole hierarchy re-derived driver-side
    val vecs = planted.select($"vec_id", AnnIndex.quant($"embedding".cast("array<double>")))
      .as[(Long, Seq[Long])].collect().map { case (id, v) => id -> v.toArray }.toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def sqd(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // super level: md5 'ivf' seeds + ONE Lloyd's round
    val seeds = vecs.keys.toSeq.sortBy(id => (md5hex(s"ivf|$id"), id)).take(4)
    var sCents: Map[Long, Array[Long]] = seeds.map(id => id -> vecs(id)).toMap
    def assignAll(): Map[Long, Long] =
      vecs.map { case (id, v) => id -> sCents.toSeq.map { case (c, cv) => (sqd(v, cv), c) }.min._2 }
    locally {
      val byList = assignAll().groupBy(_._2)
      sCents = sCents.map { case (cid, old) =>
        cid -> byList.get(cid).map { members =>
          val vs = members.keys.map(vecs).toSeq
          Array.tabulate(64)(d => Math.floorDiv(vs.map(_(d)).sum, vs.size.toLong))
        }.getOrElse(old)
      }
    }
    val sAsg = assignAll()
    // sub level: per-cell md5 'ivf2' seeds (8/cell), own-cell assignment
    val subs: Map[Long, Seq[Long]] = sAsg.groupBy(_._2).map { case (scid, members) =>
      scid -> members.keys.toSeq.sortBy(id => (md5hex(s"ivf2|$id"), id)).take(8)
    }
    val subAsg: Map[Long, Long] = vecs.map { case (id, v) =>
      id -> subs(sAsg(id)).map(c => (sqd(v, vecs(c)), c)).min._2
    }
    val exp = (0L until 10L).flatMap { p =>
      val superRoutes = sCents.toSeq.map { case (c, cv) => (sqd(vecs(p), cv), c) }
        .sorted.take(2).map(_._2)
      val subRoutes = superRoutes.flatMap(sc => subs(sc))
        .map(c => (sqd(vecs(p), vecs(c)), c)).sorted.take(4).map(_._2).toSet
      vecs.keys.filter(v => v != p && subRoutes.contains(subAsg(v))).toSeq
        .map(v => (v, vecs(v).zip(vecs(p)).map { case (x, y) => x * y }.sum))
        .sortBy { case (v, dot) => (-dot, v) }.take(3).zipWithIndex
        .map { case ((v, dot), i) => (p, i + 1, v, dot) }
    }.toSet
    assert(got == exp, "engine hierarchy must equal the sequential two-level oracle")
    // recall sanity: probe 0's planted near-dups route with it through
    // both levels and fill its top-3
    val p0 = got.filter(_._1 == 0L).map(_._3)
    assert(p0.forall(v => v >= 100000L && v < 100005L), s"probe 0 neighbors: $p0")
  }

  test("two-level IVF sub-training == sequential oracle with per-cell Lloyd's rounds") {
    val got = IvfIndex.knnJoinTwoLevel(planted.where($"vec_id" < 6), planted,
        k = 3, nsuper = 4, nsub = 8, nprobeSuper = 2, nprobe = 4,
        trainRounds = 1, subTrainRounds = 1)
      .select($"probe_id", $"rank", $"vec_id", $"dot")
      .as[(Long, Int, Long, Long)].collect().toSet
    val vecs = planted.select($"vec_id", AnnIndex.quant($"embedding".cast("array<double>")))
      .as[(Long, Seq[Long])].collect().map { case (id, v) => id -> v.toArray }.toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def sqd(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // super level (seed + 1 round), as the engine
    val seeds = vecs.keys.toSeq.sortBy(id => (md5hex(s"ivf|$id"), id)).take(4)
    var sCents: Map[Long, Array[Long]] = seeds.map(id => id -> vecs(id)).toMap
    def assignAll(): Map[Long, Long] =
      vecs.map { case (id, v) => id -> sCents.toSeq.map { case (c, cv) => (sqd(v, cv), c) }.min._2 }
    locally {
      val byList = assignAll().groupBy(_._2)
      sCents = sCents.map { case (cid, old) =>
        cid -> byList.get(cid).map { members =>
          val vs = members.keys.map(vecs).toSeq
          Array.tabulate(64)(d => Math.floorDiv(vs.map(_(d)).sum, vs.size.toLong))
        }.getOrElse(old)
      }
    }
    val sAsg = assignAll()
    // sub level: seed per cell, then ONE per-cell Lloyd's round
    val subMembers = sAsg.groupBy(_._2).map { case (sc, m) => sc -> m.keys.toSeq }
    var subCent: Map[Long, (Long, Array[Long])] = subMembers.flatMap { case (sc, members) =>
      members.sortBy(id => (md5hex(s"ivf2|$id"), id)).take(8).map(c => c -> (sc, vecs(c)))
    }
    def subAssignAll(): Map[Long, Long] = vecs.keys.map { id =>
      val sc = sAsg(id)
      id -> subCent.collect { case (c, (s, cv)) if s == sc => (sqd(vecs(id), cv), c) }.min._2
    }.toMap
    locally {
      val byList = subAssignAll().groupBy(_._2)
      subCent = subCent.map { case (cid, (sc, old)) =>
        cid -> (sc, byList.get(cid).map { members =>
          val vs = members.keys.map(vecs).toSeq
          Array.tabulate(64)(d => Math.floorDiv(vs.map(_(d)).sum, vs.size.toLong))
        }.getOrElse(old))
      }
    }
    val subAsg = subAssignAll()
    val exp = (0L until 6L).flatMap { p =>
      val superRoutes = sCents.toSeq.map { case (c, cv) => (sqd(vecs(p), cv), c) }
        .sorted.take(2).map(_._2).toSet
      val subRoutes = subCent.toSeq.collect { case (c, (sc, cv)) if superRoutes(sc) =>
        (sqd(vecs(p), cv), c) }.sorted.take(4).map(_._2).toSet
      vecs.keys.filter(v => v != p && subRoutes.contains(subAsg(v))).toSeq
        .map(v => (v, vecs(v).zip(vecs(p)).map { case (x, y) => x * y }.sum))
        .sortBy { case (v, dot) => (-dot, v) }.take(3).zipWithIndex
        .map { case ((v, dot), i) => (p, i + 1, v, dot) }
    }.toSet
    assert(got == exp, "engine sub-training must equal the per-cell Lloyd's oracle")
  }

  // ---------------- PqIndex ----------------

  test("PQ: codes are M ids in [0,K); donors encode to themselves exactly") {
    val cb = PqIndex.codebooks(planted)
    assert(cb.length == PqIndex.M && cb.forall(_.length == PqIndex.K))
    val codes = planted.select($"vec_id",
        PqIndex.encodeUdf(cb)($"embedding".cast("array<double>")).as("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    codes.values.foreach { cs =>
      assert(cs.length == PqIndex.M && cs.forall(c => c >= 0 && c < PqIndex.K))
    }
    // a codebook donor's own subvectors are AT zero distance from their
    // codewords, so it must encode to a consistent reconstruction:
    // reconstruction distance 0 in every subspace
    val donorIds = planted
      .orderBy(md5(concat(lit("pq|"), $"vec_id".cast("string"))), $"vec_id")
      .limit(PqIndex.K).select($"vec_id").as[Long].collect()
    val donorQ = planted.where($"vec_id" === donorIds(0))
      .select(AnnIndex.quant($"embedding".cast("array<double>"))).as[Seq[Long]].head()
    val donorCodes = codes(donorIds(0))
    for (s <- 0 until PqIndex.M) {
      val rec = cb(s)(donorCodes(s))
      val sub = donorQ.slice(s * PqIndex.SubDim, (s + 1) * PqIndex.SubDim)
      assert(rec.toSeq == sub, s"donor must reconstruct losslessly in subspace $s")
    }
  }

  test("PQ ADC LUT path scores a short probe over shared positions (twin parity)") {
    // a 36-dim probe: subspace 4 is half-present, 5..7 absent — slice()
    // yields short/empty probe subvectors and an unguarded zip_with product
    // would NULL the LUT dots; the twin's position join sums only shared
    // positions, so pdot must be the partial sum (0 for empty subspaces)
    val full = planted.where($"vec_id" === 3)
      .select($"embedding".cast("array<double>")).as[Seq[Double]].head()
    val corpus = planted.select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
      .unionByName(Seq((700000L, full.take(36))).toDF("vec_id", "embedding"))
    val got = PqIndex.adcTopK(corpus.where($"vec_id" === 700000L), corpus, k = 3)
      .select($"probe_id", $"rank", $"vec_id", $"score")
      .as[(Long, Int, Long, Long)].collect().toSet
    // oracle: reconstruct corpus rows from codewords, score with the
    // driver-side partial dot over the probe's 36 quantized positions
    val cb = PqIndex.codebooks(corpus)
    val recon = corpus.select($"vec_id", PqIndex.encodeUdf(cb)($"embedding").as("codes"))
      .as[(Long, Seq[Int])].collect()
      .map { case (id, cs) => (id, cs.zipWithIndex.flatMap { case (c, s) => cb(s)(c) }) }
    val pq = full.take(36).map(v => math.floor(v * 1000).toLong)
    val exp = recon.filter(_._1 != 700000L)
      .map { case (vid, rv) => (vid, pq.zip(rv).map { case (a, b) => a * b }.sum) }
      .sortBy { case (vid, sc) => (-sc, vid) }.take(3).zipWithIndex
      .map { case ((vid, sc), i) => (700000L, i + 1, vid, sc) }.toSet
    assert(got == exp, "short-probe ADC must equal partial-dot reconstruction scoring")
  }

  test("PQ adcTopK == exact dot against the reconstructed (codeword) corpus") {
    val cb = PqIndex.codebooks(planted)
    val got = PqIndex.adcTopK(planted.where($"vec_id" < 5), planted, k = 3)
      .select($"probe_id", $"rank", $"vec_id", $"score")
      .as[(Long, Int, Long, Long)].collect().toSet
    // oracle: reconstruct every corpus row from its codewords, score with
    // the plain exact integer dot, rank per probe
    val codes = planted.select($"vec_id",
        PqIndex.encodeUdf(cb)($"embedding".cast("array<double>")).as("codes"))
      .as[(Long, Seq[Int])].collect()
    val recon = codes.map { case (id, cs) =>
      (id, cs.zipWithIndex.flatMap { case (c, s) => cb(s)(c) }.toArray)
    }
    val probesQ = planted.where($"vec_id" < 5)
      .select($"vec_id", AnnIndex.quant($"embedding".cast("array<double>")))
      .as[(Long, Seq[Long])].collect()
    val exp = probesQ.flatMap { case (pid, pq) =>
      recon.filter(_._1 != pid)
        .map { case (vid, rv) => (vid, rv.zip(pq).map { case (a, b) => a * b }.sum) }
        .sortBy { case (vid, sc) => (-sc, vid) }.take(3).zipWithIndex
        .map { case ((vid, sc), i) => (pid, i + 1, vid, sc) }
    }.toSet
    assert(got == exp, "ADC lookup-sum must equal the reconstructed exact dot")
  }

  test("IVF+PQ == residual-reconstruction dot scoring restricted to the IVF candidates") {
    val probes = planted.where($"vec_id" < 5)
    val got = PqIndex.ivfAdcTopK(probes, planted, k = 3, nlist = 16, nprobe = 2)
      .select($"probe_id", $"rank", $"vec_id", $"score")
      .as[(Long, Int, Long, Long)].collect().toSet
    // oracle: IVF candidate set, then score = dot(probe, centroid + r̂)
    // with r̂ the residual reconstructed from its codewords — driver-side
    val cents = IvfIndex.centroidTable(planted, 16)
    val centMap = cents.select($"cid", $"cvq").as[(Long, Seq[Long])].collect()
      .map { case (c, v) => c -> v.toArray }.toMap
    val assigned = IvfIndex.assign(planted, cents)
      .select($"vec_id", $"cid", $"vq").as[(Long, Long, Seq[Long])].collect()
    val residMap = assigned.map { case (id, cid, vq) =>
      id -> (cid, vq.toArray.zip(centMap(cid)).map { case (x, c) => x - c })
    }.toMap
    // residual codebooks: md5-ranked donor residuals (same salt as the engine)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val donorIds = residMap.keys.toSeq.sortBy(id => (md5hex(s"pq|$id"), id)).take(PqIndex.K)
    val cbR = Array.tabulate(PqIndex.M, PqIndex.K)((s, j) =>
      residMap(donorIds(j))._2.slice(s * PqIndex.SubDim, (s + 1) * PqIndex.SubDim))
    val recon = residMap.map { case (id, (cid, rq)) =>
      val codes = PqIndex.encodeQKernel(cbR, rq, PqIndex.Default)
      val rhat: Array[Long] = codes.zipWithIndex.flatMap { case (c, s) => cbR(s)(c).toSeq }
      id -> centMap(cid).zip(rhat).map { case (cv, rv) => cv + rv }
    }
    val cand = IvfIndex.assign(planted, cents).select($"vec_id", $"cid")
      .join(IvfIndex.route(probes, cents, 2).select($"probe_id", $"cid"), "cid")
      .where($"vec_id" =!= $"probe_id")
      .select($"probe_id", $"vec_id").as[(Long, Long)].collect().toSet
    val probesQ = probes.select($"vec_id", AnnIndex.quant($"embedding".cast("array<double>")))
      .as[(Long, Seq[Long])].collect()
    val exp = probesQ.flatMap { case (pid, pq) =>
      cand.filter(_._1 == pid).toSeq
        .map { case (_, vid) => (vid, recon(vid).zip(pq).map { case (a, b) => a * b }.sum) }
        .sortBy { case (vid, sc) => (-sc, vid) }.take(3).zipWithIndex
        .map { case ((vid, sc), i) => (pid, i + 1, vid, sc) }
    }.toSet
    assert(got == exp,
      "composed IVF+PQ must equal candidate-restricted residual reconstruction scoring")
  }

  test("IVF index build stages through StageRunner: resume serves the snapshot") {
    // the index build (assignment pass over the whole corpus) is exactly
    // the heavy stage a 100 TB run persists once and resumes — wire it
    // through the snapshot layer and prove the rebuild is skipped
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_stage").toString
    val runner = new graft.tables.StageRunner(spark, dir)
    val cents = IvfIndex.centroidTable(planted, 16)
    var builds = 0
    def build() = { builds += 1; IvfIndex.assign(planted, cents) }
    val first = runner.stage("ivf_lists")(build())
      .select($"vec_id", $"cid").as[(Long, Long)].collect().sortBy(_._1)
    val second = runner.stage("ivf_lists")(build())
      .select($"vec_id", $"cid").as[(Long, Long)].collect().sortBy(_._1)
    assert(builds == 1, "a committed index stage must not rebuild")
    assert(first.sameElements(second), "snapshot must serve the identical assignment")
    assert(runner.snapshotId("ivf_lists").contains(1L))
  }

  test("IVF incremental append: the delta assigns against the committed centroid snapshot") {
    // index maintenance at 100 TB: assignment is a per-row map against a
    // FROZEN centroid snapshot, so corpus appends assign only the delta —
    // existing lists are untouched, and the result equals a full rebuild
    // against the same snapshot (never retrain on append; retraining is a
    // new snapshot id and a recompute of the downstream cone)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_inc").toString
    val runner = new graft.tables.StageRunner(spark, dir)
    val base = planted.where($"vec_id" < 400)
    val delta = planted.where($"vec_id" >= 400)
    runner.stage("ivf_cents")(IvfIndex.centroidTable(base, 16))
    val cents = runner.readAsOf("ivf_cents", 1L)
    val baseLists = runner.stage("ivf_lists", inputs = Seq("ivf_cents"))(
      IvfIndex.assign(base, cents))
    val deltaLists = IvfIndex.assign(delta, runner.readAsOf("ivf_cents", 1L))
    val incremental = baseLists.select($"vec_id", $"cid")
      .unionByName(deltaLists.select($"vec_id", $"cid"))
      .as[(Long, Long)].collect().toSet
    val rebuilt = IvfIndex.assign(planted, cents)
      .select($"vec_id", $"cid").as[(Long, Long)].collect().toSet
    assert(incremental == rebuilt,
      "append-only assignment must equal a full rebuild against the same snapshot")
    // the committed base lists were not recomputed by the append
    assert(runner.snapshotId("ivf_lists").contains(1L))
  }

  test("IVF knnJoin == sequential oracle (seed, 2 Lloyd's rounds, route, scan lists)") {
    val got = IvfIndex.knnJoin(planted.where($"vec_id" < 10), planted,
        k = 3, nlist = 16, nprobe = 2)
      .select($"probe_id", $"rank", $"vec_id", $"dot")
      .as[(Long, Int, Long, Long)].collect().toSet
    // sequential oracle: the whole trained index re-derived driver-side
    // from the raw embeddings — md5 seeding, 2 k-means rounds with
    // floor-division means, L2 routing, dot scoring
    val vecs = planted.select($"vec_id", AnnIndex.quant($"embedding".cast("array<double>")))
      .as[(Long, Seq[Long])].collect().map { case (id, v) => id -> v.toArray }.toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val seeds = vecs.keys.toSeq.sortBy(id => (md5hex(s"ivf|$id"), id)).take(16)
    def sqd(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var cents: Map[Long, Array[Long]] = seeds.map(id => id -> vecs(id)).toMap
    def assignAll(): Map[Long, Long] =
      vecs.map { case (id, v) => id -> cents.toSeq.map { case (cid, cv) => (sqd(v, cv), cid) }.min._2 }
    for (_ <- 0 until 2) {
      val byList = assignAll().groupBy(_._2)
      cents = cents.map { case (cid, old) =>
        cid -> byList.get(cid).map { members =>
          val vs = members.keys.map(vecs).toSeq
          Array.tabulate(64)(d => Math.floorDiv(vs.map(_(d)).sum, vs.size.toLong))
        }.getOrElse(old)
      }
    }
    val asg = assignAll()
    val exp = (0L until 10L).flatMap { p =>
      val routes = cents.toSeq.map { case (cid, cv) => (sqd(vecs(p), cv), cid) }
        .sorted.take(2).map(_._2).toSet
      vecs.keys.filter(v => v != p && routes.contains(asg(v))).toSeq
        .map(v => (v, vecs(v).zip(vecs(p)).map { case (x, y) => x * y }.sum))
        .sortBy { case (v, dot) => (-dot, v) }.take(3).zipWithIndex
        .map { case ((v, dot), i) => (p, i + 1, v, dot) }
    }.toSet
    assert(got == exp, "engine index must equal the sequential trained-IVF oracle")
  }

  test("pyramidRollup: hierarchical level-by-level == flat leaf-to-ancestor grouping") {
    // random leaf tiles at z10 with duplicate cells (multiple images per
    // tile) and arbitrary channel values; the operator's level-by-level
    // sum-carry must equal direct per-level grouping computed driver-side
    val rnd = new scala.util.Random(42)
    val leaves = Seq.fill(300) {
      val tx = 512L + rnd.nextInt(24); val ty = 768L + rnd.nextInt(24)
      (CellId.pack(10, tx, ty), rnd.nextInt(256).toLong,
        rnd.nextInt(256).toLong, rnd.nextInt(256).toLong)
    }
    val got = CellOps.pyramidRollup(
        leaves.toDF("cell_id", "mb", "mg", "mr"), zLeaf = 10, zMin = 7)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet

    val exp = (0 to 3).flatMap { k =>
      leaves.groupBy { case (c, _, _, _) =>
        val z = (c >>> 58) - k
        val tx = ((c >>> 29) & 0x1FFFFFFFL) >> k
        val ty = (c & 0x1FFFFFFFL) >> k
        (z << 58) + (tx << 29) + ty
      }.map { case (anc, rows) =>
        val n = rows.size.toLong
        (anc, anc >>> 58, n, rows.map(_._2).sum / n,
          rows.map(_._3).sum / n, rows.map(_._4).sum / n)
      }
    }.toSet
    assert(got == exp,
      "integer sum-carry must make the hierarchical rollup exactly associative")
  }
}
