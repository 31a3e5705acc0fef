package graft.pipeline

import graft.SparkSuite
import graft.core.ImageCodec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal ops: deterministic box-average resize and the video
  * frame-sampling plumbing (real schema/partitioning, stubbed decode). */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  test("resizeBox: floor box means, flat-color invariance, dims") {
    // 2x2 -> 1x1: floor of the channel means
    val bgr = Array[Byte](10, 20, 30, 11, 21, 31, 12, 22, 32, 14, 25, 33)
    val one = ImageCodec.resizeBox(ImageCodec.Raw(2, 2, bgr), 1, 1)
    assert((one.bgr(0), one.bgr(1), one.bgr(2)) ==
      (((10 + 11 + 12 + 14) / 4).toByte, ((20 + 21 + 22 + 25) / 4).toByte,
        ((30 + 31 + 32 + 33) / 4).toByte))
    // flat color survives any resize exactly
    val flat = ImageCodec.Raw(16, 16, Array.fill(16 * 16 * 3)(77.toByte))
    val r = ImageCodec.resizeBox(flat, 5, 7)
    assert(r.h == 5 && r.w == 7 && r.bgr.forall(_ == 77.toByte))
    // upscale: nearest box, no crash, dims honored
    val up = ImageCodec.resizeBox(ImageCodec.Raw(2, 2, bgr), 4, 4)
    assert(up.h == 4 && up.w == 4 && up.bgr(0) == 10)
  }

  test("q_i_resize invariant holds for EVERY corpus tile (count anchored)") {
    val n = graft.SparkEntry.queries("q_i_resize")(spark, "").count()
    assert(n == graft.tables.SyntheticWorld.testWorld.tileCount,
      s"resize invariant must cover the full corpus, got $n rows")
  }

  test("grayStatsUdf: flat image has zero variance/range; planted two-tone exact") {
    import graft.functions.ImageUdfs
    // flat mid-gray: luma y = (77*90 + 150*90 + 29*90) >> 8 = 90*256>>8 = 90
    val flat = ImageCodec.encode(
      ImageCodec.Raw(8, 8, Array.fill(8 * 8 * 3)(90.toByte)), "png")
    // two-tone: half black (y=0), half white (y=255 -> (77+150+29)*255>>8 = 255)
    val twoBgr = Array.tabulate(8 * 8 * 3)(i => if (i < 8 * 4 * 3) 0.toByte else 255.toByte)
    val two = ImageCodec.encode(ImageCodec.Raw(8, 8, twoBgr), "png")
    val out = Seq((1L, flat), (2L, two)).toDF("id", "bytes")
      .select($"id", ImageUdfs.grayStatsUdf($"bytes").as("gs"))
      .select($"id", $"gs._1", $"gs._2", $"gs._3", $"gs._4", $"gs._5")
      .as[(Long, Long, Long, Long, Int, Int)].collect().sortBy(_._1)
    val (_, n1, s1, ss1, mn1, mx1) = out(0)
    assert(n1 === 64 && s1 === 64L * 90 && ss1 === 64L * 90 * 90 && mn1 === 90 && mx1 === 90)
    val (_, n2, s2, ss2, mn2, mx2) = out(1)
    assert(n2 === 64 && s2 === 32L * 255 && ss2 === 32L * 255 * 255 && mn2 === 0 && mx2 === 255)
  }

  test("sampleFrames: n_frames = 0 yields zero rows, not a crash") {
    val videos = Seq((1L, Array[Byte](1), 24, 0), (2L, Array[Byte](2), 24, 2))
      .toDF("video_id", "bytes", "fps", "n_frames")
    val rows = VideoOps.sampleFrames(videos, 1)
      .select($"video_id").as[Long].collect()
    assert(rows.toSet == Set(2L) && rows.length == 2)
  }

  test("sampleFrames: schema, frame selection, exact pts, partitioning-invariant") {
    val videos = Seq(
      (1L, Array[Byte](1, 2, 3), 24, 11),
      (2L, Array[Byte](9, 8), 25, 3),
      (3L, Array[Byte](5), 30, 1))
      .toDF("video_id", "bytes", "fps", "n_frames")
    val out = VideoOps.sampleFrames(videos, everyNth = 5)
    assert(out.columns.toSeq == Seq("video_id", "frame_idx", "pts_ms", "frame_png"))
    val rows = out.select($"video_id", $"frame_idx", $"pts_ms")
      .as[(Long, Int, Long)].collect().toSet
    assert(rows == Set((1L, 0, 0L), (1L, 5, 208L), (1L, 10, 416L),
      (2L, 0, 0L), (3L, 0, 0L)))
    // stub frames decode to the declared shape and are deterministic
    val pngA = out.where($"video_id" === 1 && $"frame_idx" === 5)
      .select($"frame_png").head().getAs[Array[Byte]](0)
    val pngB = VideoOps.sampleFrames(videos.repartition(7), 5)
      .where($"video_id" === 1 && $"frame_idx" === 5)
      .select($"frame_png").head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(pngA, pngB), "stub decode partitioning-invariant")
    val raw = ImageCodec.decode(pngA)
    assert(raw.h == VideoOps.FrameH && raw.w == VideoOps.FrameW)
    // no shuffle: the explode keeps frames in their input partition
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"frame sampling must not shuffle:\n$plan")
  }
}
