package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Cast, Coalesce, Expression, Literal, NamedExpression, Pmod, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types.MapType

/** Optimizer rule: SALT a skewed aggregation key — the armor that
  * [[graft.ops.Skew.skewReport]] diagnoses and [[graft.ops.Skew]]'s
  * query-level operators apply by hand, as a PLAN property instead of a
  * query rewrite: flip one session conf and every eligible aggregate in
  * every existing query runs two-phase over a composite (key, salt), so a
  * mega-key (the crawl corpus's one dominating host) spreads across
  * `salts` reducers instead of stalling one.
  *
  * Two disjoint rewrites, both exact (salting changes shuffle LAYOUT,
  * never the answer — spec-pinned):
  *
  *  - **Re-aggregable battery** (every aggregate is a non-distinct,
  *    unfiltered SUM / COUNT / MIN / MAX): inner aggregate on
  *    `keys :+ pmod(xxhash64(row), salts)` computes partials, outer
  *    aggregate merges them (sum of sums, sum of counts, min of mins,
  *    max of maxes). The salt is a DETERMINISTIC function of the whole
  *    input row — task retries recompute identical salts, so no
  *    round-robin-repartition-style correctness hazard (SPARK-23207).
  *    Honest scope note: for these functions Spark's map-side partial
  *    aggregation already collapses hot keys per input partition; the
  *    two-phase form pays off when partials are ineffective — wide
  *    pre-shuffle partition counts, sort-based fallback — and it is the
  *    portable shape for engines/stages without partial aggregation.
  *  - **Distinct count** (the aggregate is exactly one unfiltered
  *    `COUNT(DISTINCT x)` — the dashboard shape where salting genuinely
  *    changes the game): the final distinct aggregate otherwise funnels
  *    ALL of a hot key's distinct values through one reducer. Salt by
  *    `pmod(xxhash64(x), salts)` — a function of the VALUE, so buckets
  *    partition the value space and per-bucket distinct counts are
  *    disjoint: outer `sum` of inner `count(distinct x)` is exact.
  *    Grouped and global forms both rewrite.
  *
  * Conservative trigger, mirroring [[ApproxDistinctRewrite]]: OPT-IN via
  * `spark.graft.saltAgg.enabled` (default false), salt fan-out
  * `spark.graft.saltAgg.salts` (default 16). Group keys must already be
  * attributes (DataFrame `groupBy` resolves there), every aggregate
  * expression deterministic. Decimal SUM merges cast back to the
  * original result type (the doubled 10-digit headroom of sum-of-sums
  * would otherwise widen the schema); float/double sums reassociate —
  * exactly as Spark's own partial aggregation already does. Rewritten
  * aggregates carry a [[TreeNodeTag]] so the fixed-point optimizer batch
  * never salts a salt.
  */
object SaltedAggRewrite extends Rule[LogicalPlan] {

  val EnabledConf = "spark.graft.saltAgg.enabled"
  val SaltsConf = "spark.graft.saltAgg.salts"

  /** Marks both aggregates of an applied rewrite — idempotence under the
    * fixed-point optimizer batch. */
  private[plans] val Salted = TreeNodeTag[Boolean]("graft.saltAgg.applied")

  private def enabled: Boolean =
    conf.getConfString(EnabledConf, "false").toBoolean

  private def salts: Long =
    conf.getConfString(SaltsConf, "16").toLong

  private def aggsIn(exprs: Seq[NamedExpression]): Seq[AggregateExpression] =
    exprs.flatMap(_.collect { case ae: AggregateExpression => ae })

  private def reAggregable(ae: AggregateExpression): Boolean =
    !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
      case _: Sum | _: Min | _: Max | _: Count => true
      case _ => false
    })

  private def soleDistinctCount(aggs: Seq[AggregateExpression]): Boolean =
    aggs.size == 1 && aggs.head.isDistinct && aggs.head.filter.isEmpty &&
      (aggs.head.aggregateFunction match {
        case Count(Seq(_)) => true
        case _ => false
      })

  /** Hash children for the row salt: every output column whose type the
    * hash expression accepts (maps are not hashable). */
  private def hashable(child: LogicalPlan): Seq[Attribute] = {
    def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: MapType => true
      case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasMap(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
      case _ => false
    }
    child.output.filterNot(a => hasMap(a.dataType))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case a @ Aggregate(groupExprs, aggExprs, child, hint)
          if a.getTagValue(Salted).isEmpty &&
            groupExprs.forall(_.isInstanceOf[Attribute]) &&
            aggExprs.forall(_.deterministic) &&
            aggsIn(aggExprs).nonEmpty =>
        val keys = groupExprs.map(_.asInstanceOf[Attribute])
        val aggs = aggsIn(aggExprs)
        if (soleDistinctCount(aggs)) {
          val x = aggs.head.aggregateFunction.children.head
          rewrite(a, keys, aggExprs, child, hint,
            saltOf = Seq(x),
            partialOf = ae => ae, // count(distinct x) within the value bucket
            mergeOf = (ae, p) => Coalesce(Seq(
              Sum(p).toAggregateExpression(), Literal(0L))))
        } else if (keys.nonEmpty && aggs.forall(reAggregable)) {
          rewrite(a, keys, aggExprs, child, hint,
            saltOf = hashable(child),
            partialOf = ae => ae,
            mergeOf = (ae, p) => ae.aggregateFunction match {
              case s: Sum =>
                val m = Sum(p).toAggregateExpression()
                if (m.dataType == s.dataType) m else Cast(m, s.dataType)
              case _: Count =>
                Coalesce(Seq(Sum(p).toAggregateExpression(), Literal(0L)))
              case _: Min => Min(p).toAggregateExpression()
              case _: Max => Max(p).toAggregateExpression()
              case f => throw new IllegalStateException(s"unreachable: $f")
            })
        } else a
    }

  /** The shared two-phase construction: project a deterministic salt,
    * aggregate partials on (keys, salt), merge on keys. */
  private def rewrite(
      original: Aggregate,
      keys: Seq[Attribute],
      aggExprs: Seq[NamedExpression],
      child: LogicalPlan,
      hint: Option[org.apache.spark.sql.catalyst.plans.logical.AggregateHint],
      saltOf: Seq[Expression],
      partialOf: AggregateExpression => AggregateExpression,
      mergeOf: (AggregateExpression, Attribute) => Expression): LogicalPlan = {
    if (saltOf.isEmpty) return original // nothing hashable to salt by
    val saltAlias = Alias(
      Pmod(new XxHash64(saltOf), Literal(salts)), "_graft_salt")()
    val project = Project(child.output :+ saltAlias, child)
    val partials = ArrayBuffer.empty[NamedExpression]
    val merged = aggExprs.map { ne =>
      ne.transformUp {
        case ae: AggregateExpression =>
          val p = Alias(partialOf(ae), s"_graft_p${partials.size}")()
          partials += p
          mergeOf(ae, p.toAttribute)
      }.asInstanceOf[NamedExpression]
    }
    val inner = Aggregate(
      (keys :+ saltAlias.toAttribute).toList,
      (keys ++ partials).toList, project, None)
    inner.setTagValue(Salted, true)
    val outer = Aggregate(keys.toList, merged.toList, inner, hint)
    outer.setTagValue(Salted, true)
    outer
  }
}
