package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Trajectory accounting invariants over the real contract query (the
  * value-level gate is the DuckDB twin; these pin the geometry). */
class TrajectorySpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  lazy val rows = SparkEntry.queries("q_trajectory")(spark, "/root/testdata/sf0.001")
    .collect()

  test("triangle inequality: path >= net displacement up to floor slack") {
    // each of the n_segs segments floors away < 1 m, so the floored path
    // can undershoot the true path by at most n_segs meters; net floors
    // down too, so path_m + n_segs >= net_m always
    rows.foreach { r =>
      val (nSegs, path, net) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(path + nSegs >= net,
        s"user ${r.getLong(0)}: path $path + slack $nSegs < net $net")
    }
    assert(rows.nonEmpty)
  }

  test("segment count is events - 1 for every user (complete coordinates)") {
    rows.foreach(r => assert(r.getLong(2) == r.getLong(1) - 1))
  }

  test("single-segment users aside, paths exceed nets somewhere (real wander)") {
    assert(rows.exists(r => r.getLong(3) > r.getLong(4)))
  }
}
