package graft.pipeline

import graft.SparkSuite
import graft.tables.StageRunner
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * compactStage — the OPTIMIZE / rewrite-data-files maintenance operator:
 * rows bit-identical, target file count, per-file DISJOINT sort-key
 * ranges (the clustering that makes range predicates skip whole files),
 * lineage/freshness untouched, pre-compaction snapshot still servable.
 */
class StageCompactionSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  private def fresh(tag: String) = {
    val dir = java.nio.file.Files.createTempDirectory(s"compact_$tag").toString
    (new StageRunner(spark, dir), dir)
  }

  // a key-scattered relation: morton-style key arrives in hash order
  private def scattered = (0L until 4000L).map(i => (i * 2654435761L % 4096L, i))
    .toDF("mkey", "payload")

  private def dataFiles(st: StageRunner, name: String): Seq[String] = {
    val d = new java.io.File(st.dataPath(name))
    d.listFiles().filter(f => f.getName.endsWith(".parquet")).map(_.getPath).toSeq
  }

  test("rows identical, file count hit, per-file key ranges disjoint") {
    val (st, _) = fresh("basic")
    // write scattered with many partitions -> many unclustered files
    st.stage("t")(scattered.repartition(16))
    assert(dataFiles(st, "t").size == 16)
    val before = st.stage("t")(scattered).collect().map(_.toString).toSet
    val snap0 = st.snapshotId("t").get

    st.compactStage("t", Seq("mkey"), targetFiles = 4)
    val files = dataFiles(st, "t")
    assert(files.size == 4, s"expected 4 files, got ${files.size}")
    val after = spark.read.parquet(st.dataPath("t")).collect().map(_.toString).toSet
    assert(after == before, "compaction changed row content")

    // each file owns one contiguous, pairwise-disjoint mkey range
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min(col("mkey")), max(col("mkey"))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"file ranges overlap: hi=$hi lo2=$lo2")
      case _ =>
    }
    // and the previous snapshot remains servable (rollback intact)
    assert(st.readAsOf("t", snap0).count() == 4000L)
    assert(st.snapshotId("t").get > snap0)
  }

  test("freshness untouched: a later stage() resolve serves the compacted snapshot") {
    val (st, _) = fresh("freshness")
    st.stage("up")(spark.range(10).toDF("id"))
    st.stage("t", Seq("up"))(scattered)
    st.compactStage("t", Seq("mkey"), targetFiles = 2)
    val compactedSnap = st.snapshotId("t").get
    // same inputs -> fresh -> must NOT recompute (which would discard the
    // compacted layout); it serves the compacted snapshot
    st.stage("t", Seq("up"))(scattered)
    assert(st.snapshotId("t").get == compactedSnap,
      "resolve after compaction recomputed the stage and discarded the layout")
    // upstream recommit still invalidates the cone as before
    st.invalidate("up")
    st.stage("up")(spark.range(10).toDF("id"))
    st.stage("t", Seq("up"))(scattered)
    assert(st.snapshotId("t").get > compactedSnap)
  }

  test("a drifted rewrite aborts BEFORE the pointer swap: current snapshot untouched") {
    val (st, dir) = fresh("drift")
    st.stage("t")(scattered)
    val snap0 = st.snapshotId("t").get
    // simulate drift: corrupt the recorded row count so the guard sees a
    // mismatch against the (row-identical) rewrite
    val mPath = st.manifestPath("t")
    val m = graft.tables.ManifestJson.read(mPath, classOf[graft.tables.StageManifest])
    graft.tables.ManifestJson.writeAtomic(mPath, m.copy(rows = m.rows + 1))
    val e = intercept[IllegalStateException] { st.compactStage("t", Seq("mkey"), 2) }
    assert(e.getMessage.contains("row drift"))
    // the pointer still serves the pre-compaction snapshot and the orphan
    // rewrite dir was reaped — no committed-then-rolled-back state
    assert(st.snapshotId("t").get == snap0)
    assert(spark.read.parquet(st.dataPath("t")).count() == 4000L)
    val orphans = new java.io.File(s"$dir/t").listFiles()
      .filter(f => f.getName.startsWith("data_v") && f.getName != s"data_v$snap0")
    assert(orphans.isEmpty, s"orphan rewrite dirs left: ${orphans.mkString(",")}")
  }

  test("uncommitted stage refuses; sort column must exist") {
    val (st, _) = fresh("guards")
    intercept[IllegalStateException] { st.compactStage("ghost", Seq("k"), 2) }
    st.stage("t")(scattered)
    intercept[org.apache.spark.sql.AnalysisException] {
      st.compactStage("t", Seq("no_such_col"), 2)
    }
  }
}
