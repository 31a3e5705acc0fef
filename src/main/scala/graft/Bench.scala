package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Benchmark main. Prints ONE JSON line:
 *   {"metric":"total","value":<sec>,"unit":"sec","queries":{...},"sf":...,
 *    "cpus":N,"pipeline_rows":R,"tiles_joined_rows_per_sec":X,
 *    "output_xxhash":H}
 *
 * Sections:
 *  0. ann_index_build: the one-time ANN snapshot build (train-once half of
 *     the lifecycle; q_ann_* below are pure probes against it),
 *  1. every SparkEntry.queries entry timed on SPARK_GRAFT_SF_DIR (count()),
 *     BEST-OF-2 so one descheduled reading can't contaminate the artifact,
 *  2. the flagship geo pipeline (SURVEY.md §7.2) on a bench-scale synthetic
 *     world — the north-rule throughput metric "tiles+joined-rows/sec" =
 *     (image tiles scanned + output example rows) / pipeline wall time.
 *
 * `output_xxhash` is an order-independent hash of the pipeline output keys:
 * running at SPARK_GRAFT_CPUS=8 and =32 must produce the SAME hash (the
 * deterministic hash-rank sampling makes output partitioning-invariant) —
 * that plus the two throughputs is the N-vs-4N scaling-efficiency evidence
 * recorded in BENCH/BASELINE.md.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val gridSide = sys.env.getOrElse("SPARK_GRAFT_WORLD", "64").toInt
    // SPARK_GRAFT_MASTER=local-cluster[E,C,MEM_MB] runs REAL separate
    // executor JVMs (the spark-submit-on-a-cluster shape, north_rule's
    // N-vs-4N evidence); executors get this build's classes explicitly
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder00 = SparkSession.builder()
      .master(master)
      // = cores: local-mode task scheduling is a serial path (~ms/task);
      // finer tasks cost more in scheduling than they save in tail latency
      // at this data size (measured: 128 partitions doubled expand wall)
      .config("spark.sql.shuffle.partitions", cpus)
    val builder0 = if (!master.startsWith("local-cluster")) builder00 else {
      // local-cluster[n,c,mem]'s mem is the WORKER allocation; executor
      // JVMs still default to spark.executor.memory=1g — size their heap
      // to the worker grant or they OOM on image workloads
      val workerMb = "local-cluster\\[\\d+,\\d+,(\\d+)\\]".r
        .findFirstMatchIn(master).map(_.group(1)).getOrElse("8192")
      // executors need this build's classes ON TOP of the SPARK_HOME jars
      // the standalone worker already gives them. Derive ONLY the project's
      // own entries from the driver JVM's classpath (an sbt fork stages
      // them as an osmmlspark jar; spark-submit as --jars/classes dirs) —
      // passing the WHOLE driver classpath prepends ~290 duplicate Spark
      // jars to every executor classloader and measured a 20x slowdown on
      // the codegen-heavy expand stage (each Janino compile resolves
      // classes through the prepended path first). SPARK_GRAFT_EXEC_CLASSPATH
      // overrides for non-sbt launchers.
      val ownEntries = System.getProperty("java.class.path")
        .split(java.io.File.pathSeparator)
        .filter(p => p.contains("osmmlspark") || p.endsWith("classes"))
      if (ownEntries.isEmpty && !sys.env.contains("SPARK_GRAFT_EXEC_CLASSPATH"))
        System.err.println("[bench] WARNING: could not isolate the app's classpath " +
          "entries; falling back to the FULL driver classpath as executor " +
          "extraClassPath — expect the documented ~20x codegen-stage slowdown. " +
          "Set SPARK_GRAFT_EXEC_CLASSPATH to the app jar/classes dir.")
      builder00.config("spark.executor.extraClassPath",
          sys.env.getOrElse("SPARK_GRAFT_EXEC_CLASSPATH",
            if (ownEntries.nonEmpty) ownEntries.mkString(java.io.File.pathSeparator)
            else System.getProperty("java.class.path")))
        .config("spark.executor.memory", s"${workerMb}m")
        .config("spark.driver.memory", "8g")
    }
    val builder1 = sys.env.get("SPARK_GRAFT_EVENTLOG").fold(builder0) { dir =>
      builder0.config("spark.eventLog.enabled", "true").config("spark.eventLog.dir", dir)
    }
    val spark = builder1
      .config("spark.sql.adaptive.enabled", "true")
      // TypedImperativeAggregate buffers (stitch canvases ~1.8MB each) are
      // untracked JVM objects; cap how many stay open per task before the
      // sort-based fallback kicks in (default 128 -> ~230MB/task of
      // canvases; 16 -> ~30MB). Memory-budget knob for image-heavy aggs.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "16")
      // image-heavy stages carry ~100x more CPU per byte than relational
      // rows; AQE's byte-based partition coalescing starves threads on
      // those stages — keep the configured parallelism
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // synthetic tiles compress to ~0.5KB/row but cost ~ms to decode: the
      // default 128MB/4MB split sizing would scan the corpus 2-wide. At
      // production scale (25KB+ jpeg rows, TB files) defaults are fine —
      // this is byte-vs-CPU density tuning, same knob either way.
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "32k")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // production optimizer config (same as Verify): pip filters gain their
    // sargable bbox conjunct before the scan
    spark.experimental.extraOptimizations = spark.experimental.extraOptimizations ++
      Seq(plans.PipBboxPushdown, plans.CellCoverPushdown)

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // JVM/codegen warmup (unreported): without it the alphabetically-first
    // queries absorb all JIT + parquet-reader + shuffle-path warmup (r1's
    // q_a1_balance read 9.7s cold vs 1.6s warm for the same plan)
    spark.range(0, 2000000)
      .select(xxhash64(col("id")).as("h"), (col("id") % 97).as("k"))
      .groupBy(col("k")).agg(count(lit(1)), sum(col("h"))).count()
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy(col("l_returnflag")).agg(count(lit(1))).count()
    spark.read.parquet(s"$sfDir/documents.parquet").agg(sum(length(col("text")))).count()

    // index lifecycle: the q_ann_* contract queries PROBE committed
    // snapshots; the one-time training/assignment cost is timed here as
    // its own metric (train-once/probe-many — on a pre-built corpus dir
    // this resolves the committed stages and costs only the fingerprint)
    val (_, annBuildSec) =
      if (sys.env.contains("SPARK_GRAFT_PIPELINE_ONLY")) ((), 0.0)
      else time {
        try SparkEntry.annEnsureBuilt(spark, sfDir)
        catch { case e: Throwable => System.err.println(s"[bench] ann_index_build: ${e.getMessage}") }
      }

    // section 1: contract queries (skippable for pipeline-scaling
    // studies). BEST-OF-2 per query: section-1 readings are single-query
    // wall clocks on a shared host, and one descheduled reading used to
    // contaminate the whole artifact (r4's q_text_keywords read 43 s for
    // a 3 s plan); the min of two runs of a deterministic query is the
    // honest cost estimate at one extra pass of wall time.
    val results =
      if (sys.env.contains("SPARK_GRAFT_PIPELINE_ONLY")) Seq.empty[(String, Double)]
      else SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        def once(): Double = {
          val (_, sec) = time {
            try fn(spark, sfDir).count()
            catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}"); -1L }
          }
          // release per-operator caches so queries don't pin storage for
          // each other (and timings stay independent)
          spark.sqlContext.clearCache()
          sec
        }
        name -> math.min(once(), once())
      }

    // section 2: flagship pipeline on a bench-scale world (world build is
    // corpus generation, not engine time — staged once, excluded from the
    // pipeline timing like any pre-existing table)
    val w = tables.World(z = 18, tx0 = 151000L, ty0 = 84350L,
      gridW = gridSide, gridH = gridSide,
      lamps = gridSide * gridSide / 4, roads = gridSide / 2, buildings = gridSide,
      hotCellSkew = 0.2)
    val worldDir = s"/tmp/graft_bench_world_z${w.z}_${gridSide}"
    if (!new java.io.File(s"$worldDir/images.parquet/_SUCCESS").exists()) {
      tables.SyntheticWorld.write(spark, w, worldDir)
    }
    val images = spark.read.parquet(s"$worldDir/images.parquet")
    val nodes = spark.read.parquet(s"$worldDir/osm_nodes.parquet")
    val ways = spark.read.parquet(s"$worldDir/osm_ways.parquet")
    val (bw, bs, be, bn) = w.bbox
    val cfg = pipeline.Pipelines.Config(z = w.z, bbox = (bw, bs, be, bn),
      limit = w.lamps / 2, train = w.lamps / 4, valid = w.lamps / 8)

    def runOriginal(): (Long, Long) = {
      val out = pipeline.Pipelines.originalTiles(spark, nodes, ways, images, cfg)
        .select(col("example_id"), col("cell_id"), col("label"))
      val agg = out.agg(count(lit(1)),
        bit_xor(xxhash64(col("example_id"), col("label"), col("cell_id")))).head()
      (agg.getLong(0), agg.getLong(1))
    }
    // cold run warms JIT + codegen caches + page cache; the reported number
    // is the warm run (environment wall-clock noise here is large — see
    // BENCH/BASELINE.md methodology)
    time(runOriginal())
    val ((rows, outHash), pipeSec) = time(runOriginal())

    // image-heavy pipeline: viewport join -> mosaic stitch -> crop -> jpeg
    // per example (the compute-bound stage that shows core scaling);
    // expandPad=88 is the reference's documented maximum (make_expand.py:14-17)
    val expCfg = cfg.copy(train = w.lamps / 3, valid = w.lamps / 8, expandPad = 88)
    def runExpand(): (Long, Long) = {
      val out = pipeline.Pipelines.expandedCrops(spark, nodes, ways, images, expCfg)
      val agg = out.agg(count(lit(1)),
        bit_xor(xxhash64(col("example_id"), col("label"), col("split"),
          coalesce(col("cell_id"), lit(0L)), crc32(col("bytes"))))).head()
      (agg.getLong(0), agg.getLong(1))
    }
    time(runExpand())
    val ((expRows, expHash), expSec) = time(runExpand())

    // corpus scan: decode + phash every tile — a single-stage, compute-
    // dominant job isolating raw engine throughput from stage-barrier
    // scheduling (the cleanest N-vs-4N signal at sandbox sizes)
    def runScan(): Long = {
      images.select(graft.functions.ImageUdfs.phashUdf(col("bytes")).as("ph"))
        .agg(bit_xor(col("ph"))).head().getLong(0)
    }
    time(runScan())
    val (scanHash, scanSec) = time(runScan())

    val tilesScanned = w.tileCount
    val throughput = (tilesScanned + rows) / pipeSec
    val expThroughput = expRows / expSec
    val scanThroughput = tilesScanned / scanSec

    val entries = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" } ++
      Seq("\"ann_index_build\":" + f"$annBuildSec%.3f",
          "\"pipeline_original\":" + f"$pipeSec%.3f",
          "\"pipeline_expand\":" + f"$expSec%.3f",
          "\"corpus_scan\":" + f"$scanSec%.3f")
    val qs = entries.mkString("{", ",", "}")
    val total = results.map(_._2).sum + annBuildSec + pipeSec + expSec + scanSec
    println(s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"sf":"$sfDir","cpus":$cpus,"pipeline_rows":$rows,"world_tiles":$tilesScanned,"tiles_joined_rows_per_sec":${f"$throughput%.1f"},"expand_rows":$expRows,"expand_examples_per_sec":${f"$expThroughput%.1f"},"scan_tiles_per_sec":${f"$scanThroughput%.1f"},"output_xxhash":$outHash,"expand_xxhash":$expHash,"scan_xxhash":$scanHash}""")
    spark.stop()
  }
}
