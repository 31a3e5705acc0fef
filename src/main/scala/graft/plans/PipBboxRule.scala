package graft.plans

import graft.functions.PointInPolyExpr
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/**
 * Optimizer rule — the SparkSessionExtensions tier of the custom-operator
 * ladder (SURVEY.md §2.9): a point-in-polygon filter with a LITERAL
 * polygon gains a redundant-but-SARGABLE bbox conjunct (lat/lng range
 * predicates over the polygon's vertex extremes). The ray-cast itself can
 * never reach a parquet scan (it is opaque to the data source), but the
 * injected range comparisons become `PushedFilters` — row groups skip by
 * min/max stats and the exact kernel only runs on survivors. This is the
 * standard spatial decomposition (coarse bbox gate -> exact refine) done
 * BY THE OPTIMIZER, so query authors write only the exact predicate; at
 * a 100 TB geo corpus partitioned by region, the bbox conjunct is the
 * difference between scanning the planet and scanning one city.
 *
 * Soundness: any point the ray cast accepts (interior or boundary) lies
 * within the CLOSED bbox of the polygon's vertices, so
 * `bbox AND pip == pip` row-for-row — including nulls: both predicates
 * are null-intolerant on (lat, lng), so a null row is dropped either way
 * (PipBboxRuleSpec asserts result equality). The conjunct is added only
 * for pip expressions appearing as TOP-LEVEL conjuncts of the filter
 * condition (a pip under NOT/OR does not imply its bbox) and only when
 * not already semantically present (idempotent under fixed-point rule
 * batches).
 *
 * Activation: `spark.sql.extensions=graft.plans.GraftSparkExtensions`
 * (spark-submit), or session-scoped via
 * `spark.experimental.extraOptimizations :+= PipBboxPushdown`.
 */
object PipBboxPushdown extends Rule[LogicalPlan] {

  private def bounds(arr: Expression): Option[(Double, Double)] = arr match {
    // any FOLDABLE double array (typedLit's Literal, array(lit...)'s
    // CreateArray, a constant-folded transform) — evaluated at plan time
    case e if e.foldable && e.dataType == ArrayType(DoubleType, false) ||
              e.foldable && e.dataType == ArrayType(DoubleType, true) =>
      Option(e.eval(null)).map(_.asInstanceOf[ArrayData]).filter(_.numElements() > 0)
        .flatMap { data =>
          var mn = Double.MaxValue
          var mx = Double.MinValue
          var ok = true
          var i = 0
          while (i < data.numElements()) {
            if (data.isNullAt(i)) ok = false
            else {
              val v = data.getDouble(i)
              if (v < mn) mn = v
              if (v > mx) mx = v
            }
            i += 1
          }
          if (ok) Some((mn, mx)) else None // a null vertex: no bbox claim
        }
    case _ => None
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjuncts(cond)
      val extra = scala.collection.mutable.ArrayBuffer.empty[Expression]
      conjuncts.foreach {
        // only a pip that IS a conjunct implies its bbox (never under
        // NOT/OR), and only for DETERMINISTIC coordinates — duplicating a
        // nondeterministic lat/lng into the bbox conjunct would evaluate
        // it independently of the ray-cast and could drop rows the pip
        // alone accepts (the same guard Spark's own pushdown rules apply)
        case p @ PointInPolyExpr(lat, lng, latsE, lngsE)
            if lat.deterministic && lng.deterministic =>
          for ((latMin, latMax) <- bounds(latsE); (lngMin, lngMax) <- bounds(lngsE)) {
            val conj = Seq[Expression](
              GreaterThanOrEqual(lat, Literal(latMin)), LessThanOrEqual(lat, Literal(latMax)),
              GreaterThanOrEqual(lng, Literal(lngMin)), LessThanOrEqual(lng, Literal(lngMax)))
            extra ++= conj.filterNot(c =>
              conjuncts.exists(_.semanticEquals(c)) || extra.exists(_.semanticEquals(c)))
          }
        case _ => ()
      }
      if (extra.isEmpty) f else Filter(And(extra.reduce(And), cond), child)
  }
}

/** `spark.sql.extensions` entry point registering the graft optimizer
  * tier ([[PipBboxPushdown]] + [[CellCoverPushdown]]). */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => PipBboxPushdown)
    ext.injectOptimizerRule(_ => CellCoverPushdown)
  }
}
