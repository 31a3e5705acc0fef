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
 * ONLY the container decode itself is a STUB — this environment ships no
 * video codec — replaced by a deterministic fake: frame pixels derive from
 * xxhash-style mixing of (video bytes' md5, frame index), so outputs are
 * reproducible across partitionings and the plumbing is testable
 * end-to-end. Swap [[decodeFrameStub]] for a JNI/FFmpeg binding on a real
 * cluster; nothing else changes.
 */
object VideoOps {
  val FrameW = 64
  val FrameH = 64

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
    ImageCodec.encode(decodeFrameStub(bytes, idx), "png")
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
        // exact pts: frame_idx * 1000 / fps, floored integer ms
        floor(col("frame_idx") * lit(1000L) / col("fps")).cast("long").as("pts_ms"),
        frameUdf(col("bytes"), col("frame_idx").cast("int")).as("frame_png"))
  }
}
