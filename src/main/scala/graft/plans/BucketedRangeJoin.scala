package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, LongType, TimestampType}

/** Optimizer rule: rewrite a pure range join into its bucketized equi-join
  * form — the whole-plan counterpart of [[graft.ops.RangeJoin]]'s manual
  * rewrite, so a user can write the natural
  *
  *   {{{ events.join(windows, $"ts" >= $"w_start" && $"ts" < $"w_end") }}}
  *
  * and still get an equi-join: vanilla Spark has no physical strategy for
  * a non-equi-only join condition and falls back to
  * BroadcastNestedLoopJoin — O(|left| × |right|) and a driver-memory bomb
  * when neither side is small.
  *
  * Rewrite (t from one side, lo/hi from the other, all TimestampType):
  *
  *   Join(L, R, t ≥ lo ∧ t < hi)
  *   → Project(origOutput,
  *       Join(L + bucket(t), Generate(explode(bucketRange(lo, hi)), R),
  *            bucket = bucketᵣ ∧ t ≥ lo ∧ t < hi))
  *
  * where bucket(x) = floorDiv(unix_micros(x), W) for a configurable bucket
  * width W (`spark.graft.rangeJoin.bucketSeconds`, default 3600). The
  * original predicate stays in the join condition, so the equi-match on
  * the bucket is a pure candidate filter — results are identical, and
  * Spark's ExtractEquiJoinKeys now sees an equi key and plans a hash/SMJ
  * join with the range predicate as the residual. floorDiv (not `div`)
  * keeps buckets aligned for pre-epoch timestamps too.
  *
  * Conservative trigger: INNER join, condition already resolved, NO
  * existing cross-side equi predicate (those plans already hash-join), and
  * a ≥/> + </≤ pair on the same timestamp expression with both bounds from
  * the opposite side. Empty/inverted intervals (hi ≤ lo — e.g. corrupt
  * rows) and null bounds produce ZERO bucket rows, and a null t never
  * equi-matches — exactly inner-join range semantics, never a runtime
  * Sequence error.
  *
  * OPT-IN (`spark.graft.rangeJoin.enabled`, default false), like every
  * production range-join rewrite (Databricks' is hint/conf-gated too):
  * the bucket explosion is linear in interval width ÷ bucket width, so an
  * open-ended interval (SCD `valid_to = '9999-12-31'`) would generate
  * millions of bucket rows per interval. Enable it where interval widths
  * are bounded, and size `spark.graft.rangeJoin.bucketSeconds`
  * (default 3600) to the typical width. Registered via `GraftExtensions`
  * (injectOptimizerRule) or post-hoc through
  * `spark.experimental.extraOptimizations`.
  */
object BucketedRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledConf = "spark.graft.rangeJoin.enabled"
  val BucketSecondsConf = "spark.graft.rangeJoin.bucketSeconds"

  private def enabled: Boolean =
    conf.getConfString(EnabledConf, "false").toBoolean

  private def bucketWidthMicros: Long =
    conf.getConfString(BucketSecondsConf, "3600").toLong * 1000000L

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transform {
      case j @ Join(left, right, Inner, Some(cond), _)
          if j.resolved && !hasCrossSideEquiKey(cond, j) =>
        rewrite(j, cond).getOrElse(j)
    }

  /** An existing cross-side equi predicate means Spark already plans a hash
    * join — adding a bucket key would only duplicate rows through the
    * generate. (Also makes the rewrite idempotent: the rewritten join
    * carries the bucket equi key.)
    */
  private def hasCrossSideEquiKey(cond: Expression, j: Join): Boolean =
    splitConjunctivePredicates(cond).exists {
      case EqualTo(a, b) => crossSide(a, b, j)
      case EqualNullSafe(a, b) => crossSide(a, b, j)
      case _ => false
    }

  private def crossSide(a: Expression, b: Expression, j: Join): Boolean = {
    def oneSide(e: Expression) =
      e.references.nonEmpty &&
        (e.references.subsetOf(j.left.outputSet) || e.references.subsetOf(j.right.outputSet))
    oneSide(a) && oneSide(b) &&
      !(a.references ++ b.references).subsetOf(j.left.outputSet) &&
      !(a.references ++ b.references).subsetOf(j.right.outputSet)
  }

  /** floorDiv(unix_micros(e), w) as catalyst expressions — exact for
    * negative (pre-epoch) micros, unlike integral `div`.
    */
  private def bucketOf(e: Expression, w: Long): Expression = {
    val us = UnixMicros(e)
    IntegralDivide(Subtract(us, Pmod(us, Literal(w))), Literal(w))
  }

  private def rewrite(j: Join, cond: Expression): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)

    // lower bounds normalized to (t, lo); upper to (t, hi, inclusive)
    val lowers = conjuncts.collect {
      case GreaterThanOrEqual(t, lo) => (t, lo)
      case GreaterThan(t, lo)        => (t, lo)
      case LessThanOrEqual(lo, t)    => (t, lo)
      case LessThan(lo, t)           => (t, lo)
    }
    val uppers = conjuncts.collect {
      case LessThan(t, hi)           => (t, hi, false)
      case LessThanOrEqual(t, hi)    => (t, hi, true)
      case GreaterThan(hi, t)        => (t, hi, false)
      case GreaterThanOrEqual(hi, t) => (t, hi, true)
    }

    val candidates = for {
      (t, lo) <- lowers
      (t2, hi, incl) <- uppers
      if t.semanticEquals(t2) && t.dataType == TimestampType &&
        lo.dataType == TimestampType && hi.dataType == TimestampType
      // t entirely from one side, both bounds entirely from the other
      (tSide, bSide, tIsLeft) <-
        if (t.references.nonEmpty && t.references.subsetOf(j.left.outputSet) &&
            (lo.references ++ hi.references).nonEmpty &&
            (lo.references ++ hi.references).subsetOf(j.right.outputSet))
          Seq((j.left, j.right, true))
        else if (t.references.nonEmpty && t.references.subsetOf(j.right.outputSet) &&
            (lo.references ++ hi.references).nonEmpty &&
            (lo.references ++ hi.references).subsetOf(j.left.outputSet))
          Seq((j.right, j.left, false))
        else Seq.empty
    } yield (t, lo, hi, incl, tSide, bSide, tIsLeft)

    candidates.headOption.map { case (t, lo, hi, incl, tSide, bSide, tIsLeft) =>
      val w = bucketWidthMicros
      val bucketT = Alias(bucketOf(t, w), "__graft_bucket_t")()
      val bucketedSide = Project(tSide.output :+ bucketT, tSide)

      // every bucket the interval [lo, hi) / [lo, hi] can touch
      val endUs =
        if (incl) UnixMicros(hi)
        else Subtract(UnixMicros(hi), Literal(1L)): Expression
      // explicit timeZoneId: Sequence is TimeZoneAwareExpression and the
      // analyzer's ResolveTimeZone has already run — without it the new
      // subtree reports unresolved and plan validation rejects the rewrite
      val startBucket =
        IntegralDivide(Subtract(UnixMicros(lo), Pmod(UnixMicros(lo), Literal(w))), Literal(w))
      val endBucket =
        IntegralDivide(Subtract(endUs, Pmod(endUs, Literal(w))), Literal(w))
      // Sequence THROWS on inverted boundaries (start > stop with step 1),
      // so guard: empty/inverted intervals (and null bounds — the null
      // comparison routes to the else branch) yield an empty bucket array
      // → zero generated rows → no matches, the nested-loop semantics
      val seq = If(
        GreaterThanOrEqual(endBucket, startBucket),
        Sequence(startBucket, endBucket, Some(Literal(1L)), Some(conf.sessionLocalTimeZone)),
        Literal.create(new GenericArrayData(Array.empty[Any]),
          ArrayType(LongType, containsNull = false)))
      val genOut = AttributeReference("__graft_bucket_g", LongType, nullable = false)()
      val generatedSide =
        Generate(Explode(seq), Seq.empty, outer = false, None, Seq(genOut), bSide)

      val (newLeft, newRight) =
        if (tIsLeft) (bucketedSide, generatedSide) else (generatedSide, bucketedSide)
      val newCond = And(EqualTo(bucketT.toAttribute, genOut), cond)
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint))
    }
  }
}
