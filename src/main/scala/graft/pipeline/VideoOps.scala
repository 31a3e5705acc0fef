package graft.pipeline

import graft.core.ImageCodec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multimodal frame-sampling plumbing over an opaque `binary` video column
 * (training-data pipeline op from the brief: "decode / frame-sample as
 * batch UDFs ... STUB the decode step ... make the Spark-side plumbing —
 * schema, partitioning, UDF signature, batch shape — real and tested").
 *
 * Everything relational is real: the input schema is (video_id, bytes,
 * fps, n_frames), frame selection is a per-row `sequence` explode (no
 * shuffle — frames of one video stay in their input partition), timestamps
 * are exact integer math, and the per-frame decode call has the signature
 * a real container decoder would have (bytes × frame index → pixels).
 *
 * Container decode is REAL for uncompressed YUV4MPEG2 streams
 * ([[graft.core.Y4m]] — a pure-JVM demuxer, no codec needed; BT.601
 * integer YUV→BGR): [[decodeFrame]] dispatches on the container magic,
 * and [[sampleFramesAuto]] probes (w, h, fps, n_frames) from the bytes
 * themselves. ONLY compressed codecs (h264/vp9/...) remain env-blocked —
 * those inputs fall to the deterministic STUB (frame pixels from
 * xxhash-style mixing of (video bytes' md5, frame index), reproducible
 * across partitionings so the plumbing stays testable end-to-end). Swap
 * the stub arm for a JNI/FFmpeg binding on a real cluster; nothing else
 * changes.
 */
object VideoOps {
  val FrameW = 64
  val FrameH = 64

  /** Container decode: real demux for y4m, deterministic stub otherwise
    * (the env-blocked compressed-codec arm). */
  def decodeFrame(bytes: Array[Byte], frameIdx: Int): ImageCodec.Raw =
    if (graft.core.Y4m.isY4m(bytes)) graft.core.Y4m.decodeFrame(bytes, frameIdx)
    else decodeFrameStub(bytes, frameIdx)

  /** STUB container decode: deterministic fake pixels from
    * (md5(bytes), frameIdx). Real signature, fake pixels. */
  def decodeFrameStub(bytes: Array[Byte], frameIdx: Int): ImageCodec.Raw = {
    val seed = Dedup.md5h60(java.util.Base64.getEncoder.encodeToString(
      java.util.Arrays.copyOf(bytes, math.min(bytes.length, 64))))
    val h = graft.core.Splitmix.mix(seed ^ frameIdx.toLong)
    val bgr = new Array[Byte](FrameH * FrameW * 3)
    var i = 0
    while (i < bgr.length) {
      // smooth deterministic gradient + per-frame offset
      val p = i / 3
      bgr(i) = (((p % FrameW) * 2 + (h & 0x3F)) & 0xFF).toByte
      bgr(i + 1) = (((p / FrameW) * 2 + ((h >>> 8) & 0x3F)) & 0xFF).toByte
      bgr(i + 2) = ((frameIdx * 7 + ((h >>> 16) & 0x3F)) & 0xFF).toByte
      i += 3
    }
    ImageCodec.Raw(FrameH, FrameW, bgr)
  }

  private val frameUdf = udf { (bytes: Array[Byte], idx: Int) =>
    ImageCodec.encode(decodeFrame(bytes, idx), "png")
  }

  /** Sample every `everyNth` frame of each video. Input: (video_id, bytes,
    * fps, n_frames). Output: (video_id, frame_idx, pts_ms, frame_png) —
    * one row per sampled frame, no shuffle (per-row explode). */
  def sampleFrames(videos: DataFrame, everyNth: Int): DataFrame = {
    require(everyNth > 0, "everyNth must be positive")
    videos
      // n_frames <= 0 (empty/corrupt container) yields zero rows, not an
      // Illegal-sequence-boundaries crash
      .where(col("n_frames") > 0)
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyNth))))
      .select(col("video_id"), col("frame_idx").cast("int").as("frame_idx"),
        // exact pts: floor(frame_idx * 1000 / fps) in integer ms — `div`
        // IS integer floor division here (both operands non-negative), so
        // the claim holds for any idx, with no double-rounding detour
        expr("(frame_idx * 1000L) div fps").cast("long").as("pts_ms"),
        frameUdf(col("bytes"), col("frame_idx").cast("int")).as("frame_png"))
  }

  private val metaUdf = udf { (bytes: Array[Byte]) =>
    if (graft.core.Y4m.isY4m(bytes)) {
      val h = graft.core.Y4m.parseHeader(bytes)
      Some((h.w, h.h, h.fpsNum, h.fpsDen, graft.core.Y4m.frameCount(bytes)))
    } else None
  }

  private val assembleUdf = udf { (pngs: Seq[Array[Byte]], fpsNum: Int, fpsDen: Int) =>
    graft.core.Y4m.encodeBgr(pngs.map(ImageCodec.decode), fpsNum, fpsDen)
  }

  /** Video SINK (the reference's dir2vid/list2vid shape, S17): sampled/
    * rendered frames re-assemble into one uncompressed y4m container per
    * video — (video_id, frame_idx, frame_png) -> (video_id, y4m). Frames
    * order by frame_idx inside the row (array_sort on the collected
    * structs — a per-group sort of an already-grouped list, never a
    * global one); the only shuffle is the groupBy on video_id. A video's
    * frames must fit one row by contract (the reference writes one avi
    * per directory of frames); for longer media, chunk by
    * (video_id, segment) upstream — same operator per segment. */
  def assembleVideos(frames: DataFrame, fpsNum: Int, fpsDen: Int): DataFrame =
    frames.groupBy(col("video_id"))
      .agg(array_sort(collect_list(struct(col("frame_idx"), col("frame_png")))).as("fs"))
      .select(col("video_id"),
        assembleUdf(expr("transform(fs, f -> f.frame_png)"), lit(fpsNum), lit(fpsDen))
          .as("y4m"))

  /** Sample frames of self-describing containers: metadata (w, h, fps
    * rational, frame count) is PROBED from the bytes per row — no caller-
    * supplied n_frames/fps columns to drift from the container truth.
    * Input: (video_id, bytes); non-y4m rows (no supported container)
    * yield zero rows rather than fake metadata. pts is the exact rational
    * floor(idx * 1000 * den / num) in integer ms. Same scale shape as
    * [[sampleFrames]]: per-row probe + per-row explode, no shuffle. */
  def sampleFramesAuto(videos: DataFrame, everyNth: Int): DataFrame = {
    require(everyNth > 0, "everyNth must be positive")
    videos
      .withColumn("meta", metaUdf(col("bytes")))
      .where(col("meta").isNotNull && col("meta._5") > 0)
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("meta._5") - 1, lit(everyNth))))
      .select(col("video_id"),
        col("meta._1").as("w"), col("meta._2").as("h"),
        col("frame_idx").cast("int").as("frame_idx"),
        // exact rational floor(idx*1000*den/num) via integer `div` — all
        // operands non-negative, so truncating and flooring agree and the
        // documented claim is literally true for any idx*den magnitude
        // (double division could round the quotient across the floor)
        expr("(frame_idx * 1000L * meta._4) div meta._3")
          .cast("long").as("pts_ms"),
        frameUdf(col("bytes"), col("frame_idx").cast("int")).as("frame_png"))
  }
}
