package graft.pipeline

import graft.SparkSuite
import graft.core.{CellId, ImageCodec, Mercator}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** J10 as-of join semantics, I6 marker overlay pixels, P9 link format. */
class AsofMarkerSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  test("asofBackward == per-probe latest build at ts <= probe ts (incl. ties, misses, null attrs)") {
    val probe = Seq((1L, 10L, 100L), (1L, 20L, 101L), (1L, 8L, 102L),
      (2L, 5L, 103L), (3L, 7L, 104L))
      .toDF("user_id", "ts", "event_id")
    val build = Seq((1L, 8L, 900L, Some(11L)), (1L, 15L, 901L, None),
      (2L, 9L, 902L, Some(13L)))
      .toDF("user_id", "ts", "bid", "bcents")
    val got = AsofJoin.asofBackward(
        probe.select($"event_id", $"user_id", $"ts"), build, "user_id", "ts",
        Seq("bid", "bcents"))
      .select($"event_id", $"asof_bid", $"asof_bcents")
      .as[(Long, Option[Long], Option[Long])].collect().toSet
    val expected = Set(
      (100L, Some(900L), Some(11L)),  // latest build at ts<=10 is ts=8
      (101L, Some(901L), None),       // ts=15 build wins; its null attr must NOT tear back to 900
      (102L, Some(900L), Some(11L)),  // tie: build AT the probe ts matches
      (103L, None, None),             // build at ts=9 > probe ts=5 -> miss
      (104L, None, None))             // no build rows for the key at all
    assert(got == expected.map { case (a, b, c) => (a, b, c) })
  }

  test("asofBackward == driver-side scan oracle on random inputs, 8 seeds") {
    // the fixture pins the tie/miss/null cases we designed; random inputs
    // pin the interleavings we didn't (build ts distinct per key so the
    // winning row is well-defined)
    for (seed <- 0 until 8) {
      val rnd = new scala.util.Random(7000 + seed)
      val keys = 1 + rnd.nextInt(4)
      val builds = (0 until keys).flatMap { k =>
        rnd.shuffle((0L until 50L).toList).take(3 + rnd.nextInt(10))
          .map(t => (k.toLong, t, 1000L * k + t))
      }
      // sequential event ids: collision-free, and comparing SORTED rows
      // (not a Map/Set) keeps duplicate-output regressions visible
      val probes = Seq.tabulate(30)(i =>
        (rnd.nextInt(keys + 1).toLong, rnd.nextInt(60).toLong, 10000L + i))
      val got = AsofJoin.asofBackward(
          probes.toDF("user_id", "ts", "event_id").select($"event_id", $"user_id", $"ts"),
          builds.toDF("user_id", "ts", "bid"), "user_id", "ts", Seq("bid"))
        .select($"event_id", $"asof_bid")
        .as[(Long, Option[Long])].collect().sortBy(_._1).toSeq
      val expect = probes.map { case (k, t, eid) =>
        val cand = builds.filter(b => b._1 == k && b._2 <= t)
        eid -> (if (cand.isEmpty) None else Some(cand.maxBy(_._2)._3))
      }.sortBy(_._1)
      assert(got == expect, s"seed $seed")
    }
  }

  test("intervalJoin == driver-side scan oracle on random inputs, 8 seeds") {
    for (seed <- 0 until 8) {
      val rnd = new scala.util.Random(8000 + seed)
      val keys = 1 + rnd.nextInt(3)
      val ivals = Seq.tabulate(4 + rnd.nextInt(12)) { i =>
        val s = rnd.nextInt(200).toLong
        (i.toLong, rnd.nextInt(keys).toLong, s, s + 1 + rnd.nextInt(80))
      }
      val probes = Seq.tabulate(40)(i =>
        (10000L + i, rnd.nextInt(keys + 1).toLong, rnd.nextInt(300).toLong))
      val got = AsofJoin.intervalJoin(
          probes.toDF("event_id", "user_id", "tsm"),
          ivals.toDF("iid", "user_id", "s", "e"),
          "user_id", "tsm", "s", "e", Seq("iid"), bucketWidth = 16L)
        // sorted multiset, not a Set: the operator's single-bucket-per-probe
        // invariant means duplicates would be a real regression — keep them
        // visible to the compare
        .select($"event_id", $"iid").as[(Long, Long)].collect().sorted.toSeq
      val expect = (for {
        (eid, k, t) <- probes
        (iid, ik, s, e) <- ivals
        if ik == k && s <= t && t < e
      } yield (eid, iid)).sorted
      assert(got == expect, s"seed $seed")
    }
  }

  test("intervalJoin == inequality join: overlaps, boundaries, multi-bucket spans") {
    val probe = Seq((1L, 100L, 5L), (2L, 100L, 10L), (3L, 100L, 99L),
      (4L, 100L, 250L), (5L, 200L, 5L), (6L, 100L, 15L)) // 6L sits AT 11L's end
      .toDF("event_id", "user_id", "tsm")
    val ivals = Seq(
      (10L, 100L, 0L, 100L),     // [0,100): spans buckets 0-9 at width 10
      (11L, 100L, 5L, 15L),      // overlaps 10L
      (12L, 100L, 100L, 300L),   // starts where 10L ends
      (13L, 200L, 6L, 7L))       // other key, misses its only probe
      .toDF("interval_id", "user_id", "s", "e")
    val got = AsofJoin.intervalJoin(probe, ivals, "user_id", "tsm", "s", "e",
        Seq("interval_id"), bucketWidth = 10L)
      .select($"event_id", $"interval_id").as[(Long, Long)].collect().toSet
    val brute = probe.crossJoin(ivals.toDF("iid", "uid", "s", "e"))
      .where($"user_id" === $"uid" && $"s" <= $"tsm" && $"tsm" < $"e")
      .select($"event_id", $"iid").as[(Long, Long)].collect().toSet
    assert(got == brute)
    // boundary semantics: ts==start matches; ts==end does NOT (probe 6 is
    // exactly at interval 11's end and must pair only with interval 10)
    assert(got.contains((1L, 11L)) && got.contains((4L, 12L)))
    assert(got.contains((6L, 10L)) && !got.contains((6L, 11L)))
    assert(!got.contains((5L, 13L)))
  }

  test("marker overlay: red check-mark pixels exactly where cv2.line paints, rest untouched") {
    val w = graft.tables.SyntheticWorld.testWorld
    val cell = CellId.pack(w.z, w.tx0 + 3, w.ty0 + 3)
    val raw = graft.tables.SyntheticWorld.tileRaw(cell, w.seed)
    val png = ImageCodec.encode(raw, "png")
    val out = Seq((png, "png")).toDF("bytes", "fmt")
      .select(graft.functions.ImageUdfs.markerOverlay($"bytes", $"fmt").as("b"))
      .head().getAs[Array[Byte]](0)
    val img = ImageCodec.decode(out)
    // expected pixels from the same cv2-parity rasterizer
    val c = new graft.core.CvRaster.Canvas(256, 256)
    graft.core.CvRaster.line(c, 95, 135, 105, 145, 8)
    graft.core.CvRaster.line(c, 95, 135, 85, 145, 8)
    val marked = c.paintedPixels.toSet
    assert(marked.contains((95, 135)))
    for ((x, y) <- marked) {
      val i = (y * 256 + x) * 3
      assert((img.bgr(i) & 0xFF, img.bgr(i + 1) & 0xFF, img.bgr(i + 2) & 0xFF) == (0, 0, 255),
        s"marker pixel ($x,$y)")
    }
    // a pixel far from the marker is byte-identical to the source (png lossless)
    val j = (10 * 256 + 10) * 3
    assert(img.bgr(j) == raw.bgr(j) && img.bgr(j + 1) == raw.bgr(j + 1))
  }

  test("iD-editor link format matches the reference f-string") {
    val cell = CellId.pack(18, 151023L, 84373L)
    val got = Seq(cell).toDF("cell_id")
      .select(graft.functions.GeoUdfs.idEditorLink($"cell_id")).as[String].head()
    val (lat, lng) = Mercator.wgsAtTile(151023L, 84373L, 18)
    assert(got == s"https://www.openstreetmap.org/edit#map=18/$lat/$lng")
    assert(got.startsWith("https://www.openstreetmap.org/edit#map=18/"))
  }
}
