package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Absolute path of the corpus-metadata aux export (referenced by the
    * q_phash_neardup oracle SQL via read_parquet). Derived from the output
    * dir at runtime — never a hardcoded checkout path; the default serves
    * local spec/tool runs that don't go through [[main]]. */
  @volatile var AuxImagesMeta: String =
    sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft_verify_aux/images_meta.parquet"

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg (local tooling only — the driver passes two): comma-
    // separated query names to restrict the dump + oracle json to
    val only: Option[Set[String]] = args.lift(2).map(_.split(',').toSet)
    def keep(name: String): Boolean = only.forall(_.contains(name))
    // correctness gate: dedup signatures must take the md5-portable path
    // that the DuckDB twins replay (default is the xxhash64 fast path)
    System.setProperty("graft.oracleHashing", "1")
    AuxImagesMeta = Paths.get(outDir).toAbsolutePath.toString + "/aux/images_meta.parquet"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // production optimizer config: the bbox-injection rule runs under the
    // whole oracle battery, so its row-identical guarantee is validated
    // against DuckDB on every pip query at every sf
    spark.experimental.extraOptimizations = spark.experimental.extraOptimizations ++
      Seq(plans.PipBboxPushdown, plans.CellCoverPushdown)
    new java.io.File(outDir).mkdirs()
    // aux export for the image-metadata oracles: the synthetic corpus'
    // stored (cell_id, image_id, phash) metadata PLUS the engine-decoded
    // values (dims, phash, resize self-check) at a fixed path, so DuckDB
    // can re-run the chunk banding (q_phash_neardup/_resolve) and the
    // decode-meta/resize gate logic (q_i1_decode_meta, q_i_resize) in SQL
    // over the same rows. The decode kernels themselves stay spec-pinned
    // (MultimodalSpec, PSNR oracles); what the twins pin is every
    // relational step DOWNSTREAM of the decode.
    locally {
      import org.apache.spark.sql.functions.col
      tables.SyntheticWorld.images(spark, tables.SyntheticWorld.testWorld)
        .select(col("cell_id"), col("image_id"), col("phash"), col("caption"),
          functions.ImageUdfs.decodeDims(col("bytes")).as("dims"),
          functions.ImageUdfs.phashUdf(col("bytes")).as("ph"),
          functions.ImageUdfs.resizeSelfCheck(col("bytes")).as("rc"),
          functions.ImageUdfs.meanColorUdf(col("bytes")).as("bgr"),
          functions.ImageUdfs.grayStatsUdf(col("bytes")).as("gs"))
        .select(col("cell_id"), col("image_id"), col("phash"), col("caption"),
          col("dims._1").as("h"), col("dims._2").as("w"), col("ph"),
          col("rc._1").as("rh"), col("rc._2").as("rw"), col("rc._3").as("rdrift"),
          col("gs._1").as("yn"), col("gs._2").as("ysum"), col("gs._3").as("ysumsq"),
          col("gs._4").as("ymin"), col("gs._5").as("ymax"),
          org.apache.spark.sql.functions.floor(col("bgr")(0)).cast("long").as("mb"),
          org.apache.spark.sql.functions.floor(col("bgr")(1)).cast("long").as("mg"),
          org.apache.spark.sql.functions.floor(col("bgr")(2)).cast("long").as("mr"))
        .coalesce(1).write.mode("overwrite").parquet(AuxImagesMeta)
    }
    SparkEntry.queries.filter(kv => keep(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // release anything a query cached; operator-internal intermediates
      // use localCheckpoint and free themselves via the ContextCleaner
      spark.sqlContext.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
