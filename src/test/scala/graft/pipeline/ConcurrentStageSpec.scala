package graft.pipeline

import graft.SparkSuite
import graft.tables.StageRunner
import org.scalatest.funsuite.AnyFunSuite

/** The r6 parallel index build commits stages of ONE runner from
  * several driver threads — the ledger read-modify-write is synchronized
  * per base dir, so no thread's entry may be lost (a lost entry would
  * reset that stage's snapshot-id monotonicity on a later rebuild). */
class ConcurrentStageSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  test("concurrent commits of different stages never lose ledger entries") {
    val dir = java.nio.file.Files.createTempDirectory("conc_stage").toString
    val st = new StageRunner(spark, dir)
    val names = (0 until 8).map(i => s"s$i")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futs = names.map { n =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = {
            st.stage(n)((1L to 100L).toDF("v")); ()
          }
        })
      }
      futs.foreach(_.get())
    } finally pool.shutdown()
    // every stage committed with snapshot id 1 and 100 rows
    names.foreach { n =>
      assert(st.snapshotId(n).contains(1L), s"$n snapshot id")
      assert(st.rowCount(n).contains(100L), s"$n rows")
    }
    // the shared ledger holds ALL entries (the lost-update failure mode)
    val ledger = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/_snapshots.json")))
    names.foreach(n => assert(ledger.contains("\"" + n + "\""), s"ledger lost $n"))
  }
}
