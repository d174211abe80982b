package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite exact COUNT(DISTINCT x) to the HyperLogLog++
  * sketch — "approximation mode" as a PLAN property instead of a query
  * rewrite, so a 100-TB dashboard workload can flip one session conf and
  * every distinct-count in every existing query trades exactness for the
  * sketch's one-pass, fixed-memory, mergeable-partials execution.
  *
  * Why this is a plan-shape win and not just an accuracy knob: Spark plans
  * an exact distinct aggregate as TWO hash aggregates with an Expand when
  * other aggregates share the query (each input row duplicated per
  * distinct column), and the distinct keys must be SHUFFLED before the
  * final count. HLL++ is an ordinary partial-merge aggregate: one pass,
  * no Expand, and only fixed-size sketch buffers cross the wire — on a
  * high-cardinality key the exchange shrinks from the key set to
  * `#groups × sketch_size`.
  *
  * Conservative trigger, mirroring [[BucketedRangeJoin]]'s conventions:
  * OPT-IN via `spark.graft.approxDistinct.enabled` (default false), with
  * `spark.graft.approxDistinct.rsd` (default 0.05) as the sketch's target
  * relative standard deviation. Only single-argument COUNT(DISTINCT x)
  * rewrites — multi-column distincts and other distinct aggregates
  * (sum/avg DISTINCT change semantics differently) are left exact. Null
  * handling matches: both forms ignore nulls. FILTER clauses carry over
  * unchanged on the enclosing AggregateExpression.
  *
  * Registered via `GraftExtensions` (injectOptimizerRule) or post-hoc
  * through `spark.experimental.extraOptimizations`. POSITION CAVEAT: the
  * extensions path runs among the operator-optimization batches — before
  * `RewriteDistinctAggregates` — and therefore reaches aggregates with
  * SEVERAL distinct counts (e.g. the [[graft.ops.TableChecks]] column
  * profile); the extraOptimizations path runs at the end of the
  * optimizer, after multi-distinct plans have already been expanded, so
  * it only reaches single-distinct aggregates. Production sessions should
  * prefer the extensions registration.
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {

  val EnabledConf = "spark.graft.approxDistinct.enabled"
  val RsdConf = "spark.graft.approxDistinct.rsd"

  private def enabled: Boolean =
    conf.getConfString(EnabledConf, "false").toBoolean

  private def rsd: Double =
    conf.getConfString(RsdConf, "0.05").toDouble

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transform {
      case a: Aggregate =>
        a.transformExpressions {
          case ae @ AggregateExpression(Count(Seq(child)), _, true, _, _) =>
            ae.copy(
              aggregateFunction = HyperLogLogPlusPlus(child, rsd),
              isDistinct = false)
        }
    }
}
