package graft.plans

import graft.functions.CellInCoverExpr
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, LongType}

/**
 * Optimizer rule — the cover-join analog of [[PipBboxPushdown]] (VERDICT
 * r4 Next #7): a [[CellInCoverExpr]] filter against a FOLDABLE cover gains
 * a redundant-but-SARGABLE `cell_id` RANGE conjunct. The hash-set
 * membership probe can never reach a parquet scan (opaque to the data
 * source), but a `cell >= lo AND cell <= hi` range becomes
 * `PushedFilters` — row groups (and, on a cell-sorted/partitioned table,
 * whole files/partitions) skip by min/max stats before the exact probe
 * runs. Against a planet-scale corpus laid out by cell id, a city-sized
 * cover turns a full scan into a band read.
 *
 * Range derivation: a cover cell c at level zc covers the level-zMax
 * descendants with tx in [txc·2^d, (txc+1)·2^d) and ty likewise
 * (d = zMax - zc); since a packed id is zMax·2^58 + tx·2^29 + ty, every
 * descendant id lies in [zMax·2^58 + txlo·2^29 + tylo,
 * zMax·2^58 + txhi·2^29 + tyhi] — a BOUNDING range (the tx band contains
 * non-member ty runs; the exact probe refines). The global gate is the
 * min/max over all cover cells.
 *
 * Soundness: CellInCoverExpr accepts only cells whose packed level IS
 * zMax (the kernel rejects others), so acceptance implies membership of
 * some cover cell's descendant range — `range AND probe == probe` row for
 * row (CellCoverRuleSpec asserts equality incl. off-level ids). Injected
 * only for TOP-LEVEL conjuncts (never under NOT/OR), only for
 * deterministic cell expressions, and only when not already present
 * (idempotent under fixed-point batches). Cover cells coarser than zMin
 * or finer than zMax can never match the probe's ancestor chain and are
 * excluded from the bounds.
 *
 * Activation: `spark.sql.extensions=graft.plans.GraftSparkExtensions`, or
 * session-scoped via `spark.experimental.extraOptimizations`.
 */
object CellCoverPushdown extends Rule[LogicalPlan] {

  private def coverCells(e: Expression): Option[Seq[Long]] = e match {
    case c if c.foldable && (c.dataType == ArrayType(LongType, false) ||
                             c.dataType == ArrayType(LongType, true)) =>
      Option(c.eval(null)).map(_.asInstanceOf[ArrayData]).map { arr =>
        (0 until arr.numElements()).filterNot(arr.isNullAt).map(arr.getLong)
      }
    case _ => None
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** [lo, hi] bounding the level-zMax descendants of the usable cover
    * cells; None when no cover cell is in [zMin, zMax]. */
  private def bounds(cells: Seq[Long], zMax: Int, zMin: Int): Option[(Long, Long)] = {
    val usable = cells.filter { c =>
      val zc = (c >>> 58).toInt
      zc >= zMin && zc <= zMax
    }
    if (usable.isEmpty) None
    else Some(usable.map { c =>
      val zc = (c >>> 58).toInt
      val d = zMax - zc
      val tx = (c >>> 29) & 0x1FFFFFFFL
      val ty = c & 0x1FFFFFFFL
      val lo = (zMax.toLong << 58) + ((tx << d) << 29) + (ty << d)
      val hi = (zMax.toLong << 58) + ((((tx + 1) << d) - 1) << 29) + (((ty + 1) << d) - 1)
      (lo, hi)
    }.reduce((a, b) => (math.min(a._1, b._1), math.max(a._2, b._2))))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjuncts(cond)
      val extra = scala.collection.mutable.ArrayBuffer.empty[Expression]
      conjuncts.foreach {
        case CellInCoverExpr(cell, cover, zMax, zMin) if cell.deterministic =>
          for (cells <- coverCells(cover); (lo, hi) <- bounds(cells, zMax, zMin)) {
            val conj = Seq[Expression](
              GreaterThanOrEqual(cell, Literal(lo)), LessThanOrEqual(cell, Literal(hi)))
            extra ++= conj.filterNot(c =>
              conjuncts.exists(_.semanticEquals(c)) || extra.exists(_.semanticEquals(c)))
          }
        case _ => ()
      }
      if (extra.isEmpty) f else Filter(And(extra.reduce(And), cond), child)
  }
}
