package graft

import graft.functions.GeoF
import graft.tables.SyntheticWorld
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audits (SURVEY.md §4): the declarative pipelines must
  * produce the plans we'd hand-pick at 100 TB — predicate pushdown to the
  * parquet scan, column pruning, broadcast of the small side, codegen'd
  * custom expressions, no accidental cartesian products. */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  private def executed(df: org.apache.spark.sql.DataFrame): String = {
    df.queryExecution.executedPlan.toString
  }

  val w = SyntheticWorld.testWorld
  lazy val tmp = {
    val dir = java.nio.file.Files.createTempDirectory("graft_plan").toString
    SyntheticWorld.write(spark, w, dir)
    dir
  }

  test("O1/O2: lamp scan pushes tag+bbox predicates into the parquet scan") {
    val nodes = spark.read.parquet(s"$tmp/osm_nodes.parquet")
    val (bw, bs, be, bn) = w.bbox
    val cfg = pipeline.Pipelines.Config(z = w.z, bbox = (bw, bs, be, bn))
    val plan = executed(pipeline.Pipelines.lampScan(nodes, cfg))
    // bbox range predicates reach the scan (tags is a map -> not pushable,
    // but lat/lng min/max filtering must be); the toString elides the full
    // filter list, so check the visible prefix
    assert(plan.contains("PushedFilters: [IsNotNull(lat)") &&
      plan.contains("GreaterThanOrEqual(lat,"),
      s"bbox not pushed:\n$plan")
  }

  test("column pruning: projecting 2 columns reads 2 columns") {
    val images = spark.read.parquet(s"$tmp/images.parquet")
    val plan = executed(images.select($"image_id", $"cell_id"))
    val readSchema = "ReadSchema: struct<image_id:string,cell_id:bigint>"
    assert(plan.contains(readSchema), s"scan not pruned:\n$plan")
  }

  test("J2: the lamp->image cell join broadcasts the small lamp side") {
    val images = spark.read.parquet(s"$tmp/images.parquet")
    val nodes = spark.read.parquet(s"$tmp/osm_nodes.parquet")
    val lamps = nodes.where($"tags".getItem("highway") === "street_lamp")
      .withColumn("cell_id", GeoF.cellAtWgs($"lat", $"lng", w.z))
    val joined = lamps.join(images, "cell_id")
    joined.collect()
    val plan = executed(joined)
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("J6: the negative anti-join broadcasts the painted set") {
    val cfg = {
      val (bw, bs, be, bn) = w.bbox
      pipeline.Pipelines.Config(z = w.z, bbox = (bw, bs, be, bn), limit = 50)
    }
    val painted = Seq.tabulate(100)(i => graft.core.CellId.pack(w.z, w.tx0 + i % 10, w.ty0 + i / 10))
      .toDF("cell_id")
    val neg = pipeline.Pipelines.negativeCells(spark, painted, cfg, 50, 1)
    neg.collect()
    val plan = executed(neg)
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"anti join should broadcast painted cells:\n$plan")
  }

  test("custom geo expressions stay inside whole-stage codegen over a scan") {
    val nodes = spark.read.parquet(s"$tmp/osm_nodes.parquet")
    val df = nodes
      .withColumn("cell", GeoF.cellAtWgs($"lat", $"lng", w.z))
      .where(GeoF.edgeOk($"lat", $"lng", w.z))
      .select($"node_id", $"cell")
    val plan = executed(df)
    // the codegen'd stage (marked '*(n)') contains our expressions
    assert(plan.contains("cell_at_wgs") && plan.contains("edge_ok"))
    assert("\\*\\(\\d+\\)".r.findFirstIn(plan).isDefined, s"no codegen stage:\n$plan")
    assert(!plan.toLowerCase.contains("codegenfallback"), "hot path must not fall back")
  }

  test("O2: cell-bucketed images table prunes a small-bbox read to few partitions") {
    import graft.tables.ImagesTable
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    // deltaZ=3 -> 8x8-tile parents -> the 24x24 world spans a 3x3 parent grid
    ImagesTable.writeBucketed(spark, SyntheticWorld.images(spark, w), dir, deltaZ = 3)

    val full = ImagesTable.read(spark, dir)
    val allRows = full.collect()
    assert(allRows.length == w.tileCount)
    val fullFiles = full.queryExecution.executedPlan
      .collect { case f: FileSourceScanExec => f }.head.metrics("numFiles").value

    // small bbox: a 4x4 tile block inside one parent cell
    val (nlat, wlng) = graft.core.Mercator.wgsAtTile(w.tx0 + 8, w.ty0 + 8, w.z)
    val (slat, elng) = graft.core.Mercator.wgsAtTile(w.tx0 + 11, w.ty0 + 11, w.z)
    val cfg = pipeline.Pipelines.Config(z = w.z, bbox = (wlng, slat, elng, nlat))
    val pruned = pipeline.Pipelines.imagesInBbox(full, cfg, padTiles = 0)
    val rows = pruned.collect()
    assert(rows.length == 16, s"expected the 4x4 block, got ${rows.length}")

    val scan = pruned.queryExecution.executedPlan
      .collect { case f: FileSourceScanExec => f }.head
    val planStr = scan.toString
    assert(planStr.contains("PartitionFilters:") && planStr.contains("pty"),
      s"partition filters missing from scan:\n$planStr")
    val prunedFiles = scan.metrics("numFiles").value
    assert(prunedFiles < fullFiles,
      s"bbox read should touch fewer files: $prunedFiles vs $fullFiles")

    // manifest-driven read lists only intersecting directories and covers
    // the same rows once the leaf filter is applied
    val viaManifest = ImagesTable.readForBbox(spark, dir,
      (w.tx0 + 8, w.tx0 + 11), (w.ty0 + 8, w.ty0 + 11))
    assert(viaManifest.count() < allRows.length)
    val cellsA = pipeline.Pipelines.imagesInBbox(viaManifest, cfg, padTiles = 0)
      .select($"cell_id").as[Long].collect().toSet
    assert(cellsA == rows.map(_.getAs[Long]("cell_id")).toSet)
  }

  test("O2: originalTiles through the bucketed table == in-memory result") {
    import graft.tables.ImagesTable
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketed2").toString
    ImagesTable.writeBucketed(spark, SyntheticWorld.images(spark, w), dir, deltaZ = 3)
    val nodes = spark.read.parquet(s"$tmp/osm_nodes.parquet")
    val ways = spark.read.parquet(s"$tmp/osm_ways.parquet")
    val (bw, bs, be, bn) = w.bbox
    val cfg = pipeline.Pipelines.Config(z = w.z, bbox = (bw, bs, be, bn),
      limit = 60, train = 40, valid = 20)
    val viaBucketed = pipeline.Pipelines.originalTiles(spark, nodes, ways,
        ImagesTable.read(spark, dir), cfg)
      .select($"example_id", $"label").as[(String, String)].collect().toSet
    val viaMemory = pipeline.Pipelines.originalTiles(spark, nodes, ways,
        SyntheticWorld.images(spark, w), cfg)
      .select($"example_id", $"label").as[(String, String)].collect().toSet
    assert(viaBucketed == viaMemory)
  }

  test("O2: catalog-bucketed tables equi-join on cell_id with NO exchange") {
    import graft.tables.ImagesTable
    val images = SyntheticWorld.images(spark, w).select($"cell_id", $"image_id", $"phash")
    val points = SyntheticWorld.images(spark, w).select($"cell_id", $"caption")
    ImagesTable.saveBucketedCatalog(spark, images, "graft_img_bucketed", 8)
    ImagesTable.saveBucketedCatalog(spark, points, "graft_pts_bucketed", 8)
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_pts_bucketed")
        .join(spark.table("graft_img_bucketed"), "cell_id")
      assert(joined.count() == w.tileCount)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a non-broadcast join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must be exchange-free:\n$plan")
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        s"scan should be bucketed:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_img_bucketed")
      spark.sql("DROP TABLE IF EXISTS graft_pts_bucketed")
    }
  }

  test("O8: salted hot-cell join balances task rows where the plain join straggles") {
    val skewed = SyntheticWorld.testWorld.copy(lamps = 2000, hotCellSkew = 0.5, seed = 7L)
    val pts = SyntheticWorld.osmNodes(spark, skewed)
      .where($"tags".getItem("highway") === "street_lamp")
      .withColumn("cell_id", GeoF.cellAtWgs($"lat", $"lng", skewed.z))
    val imgs = SyntheticWorld.images(spark, skewed).select($"cell_id", $"image_id")
    val hot = pipeline.SaltedJoin.detectHotCells(pts, threshold = 4.0)
    assert(hot.nonEmpty, "skewed world must have detectable hot cells")

    // measure the raw shuffle-join partitioning: broadcast + AQE off — this
    // is exactly the "join AQE cannot split" case plan-level salting exists
    // for (AQE skew-join is the runtime backstop when it CAN split); 32
    // shuffle partitions so a hot cell is a visible straggler, not blended
    // into the suite's 4-partition default
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def partRows(df: org.apache.spark.sql.DataFrame): Array[Long] =
        df.select(spark_partition_id().as("pid"))
          .groupBy($"pid").count().select($"count").as[Long].collect()
      val plain = partRows(pts.join(imgs, "cell_id").select($"node_id"))
      val salted = partRows(
        pipeline.SaltedJoin.joinOnCell(pts, imgs, hot, saltFactor = 8).select($"node_id"))
      assert(plain.sum == salted.sum, "same join cardinality")
      // the plain join pins every hot-cell row to one task; salting spreads
      // them — no straggler: max task-rows drops by >=2x and stays within
      // 4x of the mean over non-empty tasks
      assert(plain.max >= salted.max * 2,
        s"salting should halve the max task: plain=${plain.max} salted=${salted.max}")
      val mean = salted.sum.toDouble / salted.count(_ > 0)
      assert(salted.max <= mean * 4,
        s"salted max ${salted.max} should be within 4x of mean $mean")
      // row-for-row equality of the salted plan (spec'd independently in
      // ResumeSaltSinkSpec; re-asserted here against this skewed world)
      val a = pts.join(imgs, "cell_id").select($"node_id", $"image_id")
        .as[(Long, String)].collect().sorted.toSeq
      val b = pipeline.SaltedJoin.joinOnCell(pts, imgs, hot, saltFactor = 8)
        .select($"node_id", $"image_id").as[(Long, String)].collect().sorted.toSeq
      assert(a == b)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("ANN knnJoin: map-side WindowGroupLimit top-k, broadcast routing, no cartesian") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val kj = pipeline.AnnIndex.knnJoin(e.where($"vec_id" < 30), e, k = 3, dim = 64)
    kj.collect()
    val plan = kj.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"routing must be equi-joins:\n$plan")
    // rank<=k is pushed into a pre-shuffle WindowGroupLimit (partial) so
    // only k rows per probe per map task ever reach the exchange
    assert(plan.contains("WindowGroupLimit"), s"top-k should push down:\n$plan")
    assert(plan.contains("windowspecdefinition(probe_id"),
      "window must be partitioned by probe, never global")
  }

  test("IVF knnJoin: equi-join routing on the list id, per-probe window, no cartesian") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val kj = pipeline.IvfIndex.knnJoin(emb.where($"vec_id" < 5), emb,
      k = 3, nlist = 16, nprobe = 2)
    kj.collect()
    val plan = kj.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"no cartesian anywhere:\n$plan")
    // the ONLY nested-loop joins are against the BROADCAST centroid table
    // (nlist rows, the intended assignment/routing scan); the corpus-side
    // candidate join on cid must be a hash equi-join
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"assignment must join the broadcast centroid table:\n$plan")
    assert(plan.contains("HashJoin") && plan.contains("cid"),
      s"candidates must meet probes in an equi-join on cid:\n$plan")
    assert(plan.contains("windowspecdefinition(probe_id"),
      "top-k window must be partitioned by probe, never global")
  }

  test("IVF assignment: broadcast centroid TABLE, no closure UDF, map-side argmin") {
    // the r3 build closed a centroid Array over a UDF (nlist require-capped
    // at 1024); the join-based build must show the centroids as a broadcast
    // relation and keep the whole kernel in codegen — no UDF anywhere
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val cents = pipeline.IvfIndex.centroidTable(emb, 16, trainRounds = 1)
    val assigned = pipeline.IvfIndex.assign(emb, cents)
    assigned.collect()
    val plan = assigned.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"centroids must arrive as a broadcast table:\n$plan")
    assert(!plan.contains("UDF") && !plan.contains("BatchEvalPython"),
      s"assignment must be UDF-free codegen:\n$plan")
    // argmin is a partial-aggregable min_by: the exchange carries one
    // combined row per vector, not |corpus| x nlist rows
    assert(plan.contains("partial_min_by") || plan.contains("partial min_by")
      || plan.contains("min_by"), s"argmin should aggregate map-side:\n$plan")
  }

  test("two-level IVF: nested-loop ONLY vs the tiny super table; sub level equi-joins") {
    // the whole point of the hierarchy: nothing ever cross-joins the full
    // sub-list table — sub-centroids meet corpus/probes keyed by scid
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val kj = pipeline.IvfIndex.knnJoinTwoLevel(emb.where($"vec_id" < 5), emb,
      k = 3, nsuper = 4, nsub = 8, nprobeSuper = 2, nprobe = 4, trainRounds = 1)
    kj.collect()
    val plan = kj.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"no cartesian anywhere:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"super routing joins the broadcast super table:\n$plan")
    assert(plan.contains("HashJoin") && plan.contains("scid"),
      s"sub-centroids must meet corpus/probes in equi-joins on scid:\n$plan")
    assert(plan.contains("windowspecdefinition(probe_id"),
      "sub-routing and top-k windows are partitioned by probe, never global")
    // sub-centroid seeding (rank <= nsub per super cell) pushes down to a
    // map-side WindowGroupLimit — a giant cell never sorts its membership
    val subsPlan = {
      val cents = pipeline.IvfIndex.centroidTable(emb, 4, 1)
      val subs = pipeline.IvfIndex.subCentroids(pipeline.IvfIndex.assign(emb, cents), 8)
      subs.collect()
      subs.queryExecution.executedPlan.toString
    }
    assert(subsPlan.contains("WindowGroupLimit"),
      s"sub seeding must map-side-limit per cell:\n$subsPlan")
  }

  test("coverJoin: the compacted cover broadcasts; points never exchange") {
    val z12 = graft.core.CellId.pack(12, 100, 200)
    val cover = graft.core.CellId.children(z12).flatMap(graft.core.CellId.children)
      .toSeq.toDF("cell_id")
    val compacted = pipeline.CellOps.compact(cover, zMax = 14, zMin = 11)
    val base = graft.core.CellId.pack(14, 400, 800)
    val points = spark.range(1000).select($"id".as("pid"),
      ($"id" % 16 + lit(base)).as("cell_id"))
    val out = pipeline.CellOps.coverJoin(points, compacted, zMax = 14, zMin = 11)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"small compacted cover should broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("morton layout: cover ranges reach PushedFilters and skip files via dir pruning") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import graft.core.CellId
    // a 32x32 z14 world laid out by morton: directory partition = coarse
    // morton block (z11 granularity: 4^3 = 64 keys per dir), rows sorted
    // by morton within files
    val cells = (for (dx <- 0 until 32; dy <- 0 until 32)
      yield CellId.pack(14, 1024 + dx, 2048 + dy)).toDF("cell_id")
    val laid = cells
      .withColumn("morton", pipeline.CellOps.mortonOf(col("cell_id")))
      .withColumn("mdir", expr("morton div 64"))
    val dir = java.nio.file.Files.createTempDirectory("graft_morton").toString + "/t"
    laid.repartitionByRange(8, col("morton")).sortWithinPartitions(col("morton"))
      .write.partitionBy("mdir").parquet(dir)

    val table = spark.read.parquet(dir)
    val allFiles = {
      val df = table.select(col("cell_id"))
      df.collect()
      df.queryExecution.executedPlan
        .collect { case f: FileSourceScanExec => f }.head.metrics("numFiles").value
    }
    // cover = one aligned z12 cell (an 4x4 z14 block) -> ONE morton range
    val cover = Seq(CellId.pack(12, 257, 512)).toDF("cell_id")
    val Array(r) = pipeline.CellOps.mortonRangesOfCover(cover, zLeaf = 14).collect()
    val (lo, hi) = (r.getLong(1), r.getLong(2))
    val pruned = table.where(col("mdir").between(lo / 64, hi / 64) &&
      col("morton").between(lo, hi))
    val rows = pruned.collect()
    assert(rows.length == 16, s"expected the 4x4 block, got ${rows.length}")
    val scan = pruned.queryExecution.executedPlan
      .collect { case f: FileSourceScanExec => f }.head
    val ps = scan.toString
    assert(ps.contains("PushedFilters:") && ps.contains("GreaterThanOrEqual(morton"),
      s"morton range must reach the parquet reader:\n$ps")
    assert(ps.contains("PartitionFilters:") && ps.contains("mdir"),
      s"directory predicate must prune partitions:\n$ps")
    val prunedFiles = scan.metrics("numFiles").value
    assert(prunedFiles < allFiles,
      s"morton-range read should touch fewer files: $prunedFiles vs $allFiles")
  }

  test("radiusJoin: complete vs brute force, meters exact vs scala reference, lat guard") {
    def refHav(lat1: Double, lng1: Double, lat2: Double, lng2: Double): Double = {
      val sLat = math.sin((lat2 - lat1) * math.Pi / 360.0)
      val sLng = math.sin((lng2 - lng1) * math.Pi / 360.0)
      val h = sLat * sLat +
        math.cos(lat1 * math.Pi / 180.0) * math.cos(lat2 * math.Pi / 180.0) * sLng * sLng
      2.0 * 6371008.8 * math.asin(math.sqrt(h))
    }
    val probes = Seq((1L, 53.8310, 27.4030), (2L, 53.8450, 27.4300))
      .toDF("probe_id", "plat", "plng")
    val ptRows = (1L to 3000L).map(k =>
      (k, 53.8306 + (k % 700) * 0.00002, 27.4026 + (k % 1100) * 0.00003))
    val pts = ptRows.toDF("o_orderkey", "lat", "lng")
    val R = 250.0
    val got = pipeline.KnnJoin.radiusJoin(probes, pts, radiusM = R, maxAbsLat = 54.0)
      .select("probe_id", "o_orderkey", "dist_m").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exp = (for {
      (pid, plat, plng) <- Seq((1L, 53.8310, 27.4030), (2L, 53.8450, 27.4300))
      (k, lat, lng) <- ptRows
      d = refHav(plat, plng, lat, lng) if d <= R
    } yield (pid, k) -> d).toMap
    assert(got.keySet == exp.keySet,
      s"grid gather must be complete: missing=${exp.keySet -- got.keySet} extra=${got.keySet -- exp.keySet}")
    assert(exp.nonEmpty && got.forall { case (k, d) => d == exp(k) },
      "engine haversine must equal the scala reference bit-for-bit")
    intercept[Exception] {
      pipeline.KnnJoin.radiusJoin(probes, pts, radiusM = R, maxAbsLat = 50.0).collect()
    }
    // antimeridian guard (r6, ADVICE r5): a point within one lng bin of
    // ±180° would silently miss seam-straddling pairs — must refuse loudly
    val seam = Seq((9L, 53.8310, 179.9999)).toDF("o_orderkey", "lat", "lng")
    val eSeam = intercept[Exception] {
      pipeline.KnnJoin.radiusJoin(probes, pts.unionByName(seam),
        radiusM = R, maxAbsLat = 54.0).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(eSeam).exists(_.contains("antimeridian")), s"unexpected: $eSeam")
  }

  test("kNN ring join plans equi-joins on grid keys, not a cross join") {
    val probes = Seq((1L, 53.85, 27.45), (2L, 53.86, 27.46)).toDF("probe_id", "plat", "plng")
    val cands = spark.range(500).select($"id".as("o_orderkey"),
      (lit(53.8) + ($"id" % 100).cast("double") * 0.001).as("lat"),
      (lit(27.4) + ($"id" % 90).cast("double") * 0.001).as("lng"))
    val out = pipeline.KnnJoin.knn(probes, cands, k = 3, delta = 0.01, maxRounds = 2)
    // first-round gather must be an equi-join (broadcast or hash) on gx/gy
    assert(out.count() > 0)
  }

  test("BM25 probe: query side broadcasts into the postings; no cartesian beyond the 1-row stats") {
    val docs = (1L to 80L)
      .map(i => (i, s"alpha bravo${i % 7} charlie delta${i % 3} echo table"))
      .toDF("doc_id", "text")
    val m = pipeline.Bm25.build(docs)
    val qs = Seq((1L, "table alpha"), (2L, "charlie echo")).toDF("query_id", "qtext")
    val out = pipeline.Bm25.topK(m, qs, k = 3)
    assert(out.count() > 0)
    val plan = executed(out)
    // retrieval must be broadcast-driven: the enriched query side meets
    // the postings in a BroadcastHashJoin (reads only probed terms'
    // lists at scale), and nothing plans a CartesianProduct — the only
    // nested loop allowed is the broadcast of the ONE-ROW stats relation
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in retrieval:\n$plan")
    // per-query top-k rank filter runs map-side (WindowGroupLimit)
    assert(plan.contains("WindowGroupLimit"), s"top-k not group-limited:\n$plan")
  }

  test("KMV sketch: the per-group bottom-k plans the WindowGroupLimit map-side filter") {
    val rows = spark.range(2000).select(($"id" % 5).cast("string").as("grp"),
      concat(lit("k"), $"id").as("key"))
    val sk = pipeline.Sketches.kmvSketch(rows, $"grp", $"key", k = 16)
    assert(sk.count() == 5 * 16)
    val plan = executed(sk)
    assert(plan.contains("WindowGroupLimit"),
      s"bottom-k must forward <= k rows per group per map task:\n$plan")
  }

  test("labelRegions: adjacency is equi-joins on shifted keys, never a cartesian/BNLJ") {
    val cells = (for { x <- 0L until 20L; y <- 0L until 20L if (x + y) % 3 != 0 }
      yield graft.core.CellId.pack(12, x, y)).toDF("cell_id")
    val out = pipeline.CellOps.labelRegions(cells)
    out.count() // resolveClusters materializes internally; audit the stats tail
    val plan = executed(out)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"region stats must stay equi-join shaped:\n$plan")
  }

  test("focalStats: one equi-join on the neighbor key; offset explode is pre-shuffle") {
    val raster = (for { x <- 0L until 30L; y <- 0L until 30L }
      yield (graft.core.CellId.pack(13, x, y), (x * 31 + y) % 7 + 1))
      .toDF("cell_id", "v")
    val out = pipeline.CellOps.focalStats(raster)
    val plan = executed(out)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"focal gather must be an equi-join:\n$plan")
    assert(plan.contains("Generate explode"),
      s"offset fan-out must be a per-row explode (zero shuffle to build):\n$plan")
  }

  test("geofence transitions / salted join: broadcast equi shapes, no cartesian") {
    // transitions: the compacted cover is the broadcast side of coverJoin
    val pts = spark.range(500).select($"id".as("event_id"), ($"id" % 37).as("user_id"),
      GeoF.cellAtWgs(lit(53.84) + ($"id" % 100).cast("double") * 0.0002,
        lit(27.41) + ($"id" % 90).cast("double") * 0.0004, 14).as("cell_id"))
    val cover = pipeline.CellOps.compact(pts.select($"cell_id"), zMax = 14, zMin = 11)
    val cj = pipeline.CellOps.coverJoin(pts, cover, zMax = 14, zMin = 11)
    cj.collect()
    val cjPlan = executed(cj)
    assert(cjPlan.contains("BroadcastHashJoin"), s"cover must broadcast:\n$cjPlan")
    // salted join: the salt explode replicates the dimension side and the
    // join stays an equi-join on (cell_id, salt)
    val dim = pts.select($"cell_id").distinct().withColumn("c_n", lit(1L))
    val sj = pipeline.SaltedJoin.joinOnCell(
      pts.select($"event_id".as("node_id"), $"cell_id"), dim,
      hotCells = Seq(pts.select($"cell_id").head().getLong(0)), saltFactor = 4)
    val sjPlan = executed(sj)
    assert(sjPlan.contains("Generate explode"), s"salt replication missing:\n$sjPlan")
    assert(!sjPlan.contains("CartesianProduct") &&
      !sjPlan.contains("BroadcastNestedLoopJoin"),
      s"salted join must remain equi-shaped:\n$sjPlan")
  }
}
