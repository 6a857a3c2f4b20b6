package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Optimizer rule: rewrite a pure-inequality INNER band join
  *
  * {{{ points JOIN bands ON v >= lo AND v < hi }}}
  *
  * into a bucket-grid equi-join. Spark plans an inner join with no equi
  * conjunct as BroadcastNestedLoopJoin — every (point, band) pair is
  * tested, the classic quadratic trap at scale (SURVEY.md §9, q47 does
  * this rewrite by hand). With a bucket width `w` configured, this rule
  * does it automatically:
  *
  *  - point side gains `bucket = floor(v / w)` (each point in exactly
  *    one bucket, so no duplicate output pairs);
  *  - band side explodes to `sequence(floor(lo/w), floor(hi/w))` — every
  *    bucket the band overlaps (the top bucket may be vacuous when `hi`
  *    is exclusive on a boundary; the residual filter re-checks, so the
  *    only cost is a dead candidate);
  *  - the join becomes `p.bucket = b.bucket AND <original condition>`,
  *    which ExtractEquiJoinKeys turns into a hash/sort-merge join with
  *    the range predicate as a residual filter.
  *
  * Enabled by `spark.graft.bandJoin.bucketWidth` (a positive double,
  * chosen ~ the typical band width so bands explode to O(1) buckets);
  * unset → the rule is a no-op. Joins that already carry an equi
  * conjunct are left alone — they can hash-join without help (this also
  * keeps the rule from re-firing on its own output inside the
  * fixed-point batch). Accepted bound shapes: `v >= lo` / `v > lo` and
  * `v < hi` / `v <= hi` (either operand order), `v` numeric from one
  * side, both bounds numeric from the other; extra conjuncts simply
  * ride along in the residual condition.
  */
object BandJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val WidthKey = "spark.graft.bandJoin.bucketWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width =
      try conf.getConfString(WidthKey, "").toDouble
      catch { case _: NumberFormatException => -1.0 }
    if (width <= 0 || !width.isFinite) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), _) => rewrite(j, width).getOrElse(j)
    }
  }

  private def rewrite(j: Join, w: Double): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)
    def acrossSides(a: Expression, b: Expression): Boolean =
      (canEvaluate(a, j.left) && canEvaluate(b, j.right)) ||
        (canEvaluate(a, j.right) && canEvaluate(b, j.left))
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) => acrossSides(a, b)
      // <=> is an equi key for ExtractEquiJoinKeys too — such a join can
      // already hash-join; rewriting would add a useless explode + key
      case EqualNullSafe(a, b) => acrossSides(a, b)
      case _ => false
    }
    if (hasEqui) None
    else orient(j, w, j.left, j.right).orElse(orient(j, w, j.right, j.left))
  }

  private def numeric(e: Expression): Boolean =
    e.resolved && e.dataType.isInstanceOf[NumericType]

  /** Find `v >= lo` and `v < hi` with `v` from `points`, bounds from
    * `bands`, and build the bucketed plan. */
  private def orient(j: Join, w: Double, points: LogicalPlan, bands: LogicalPlan): Option[LogicalPlan] = {
    def fromPoints(e: Expression) = numeric(e) && canEvaluate(e, points)
    def fromBands(e: Expression) = numeric(e) && canEvaluate(e, bands)
    val conjuncts = splitConjunctivePredicates(j.condition.get)
    val lower = conjuncts.collectFirst {
      case GreaterThanOrEqual(v, lo) if fromPoints(v) && fromBands(lo) => (v, lo)
      case GreaterThan(v, lo) if fromPoints(v) && fromBands(lo) => (v, lo)
      case LessThanOrEqual(lo, v) if fromPoints(v) && fromBands(lo) => (v, lo)
      case LessThan(lo, v) if fromPoints(v) && fromBands(lo) => (v, lo)
    }
    val upper = conjuncts.collectFirst {
      case LessThan(v, hi) if fromPoints(v) && fromBands(hi) => (v, hi)
      case LessThanOrEqual(v, hi) if fromPoints(v) && fromBands(hi) => (v, hi)
      case GreaterThan(hi, v) if fromPoints(v) && fromBands(hi) => (v, hi)
      case GreaterThanOrEqual(hi, v) if fromPoints(v) && fromBands(hi) => (v, hi)
    }
    for {
      (v, lo) <- lower
      (v2, hi) <- upper
      if v.semanticEquals(v2)
    } yield build(j, w, points, bands, v, lo, hi)
  }

  private def bucketOf(e: Expression, w: Double): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(w)))

  private def build(j: Join, w: Double, points: LogicalPlan, bands: LogicalPlan,
      v: Expression, lo: Expression, hi: Expression): LogicalPlan = {
    val pBucket = Alias(bucketOf(v, w), "__graft_bucket_p")()
    val pPlan = Project(points.output :+ pBucket, points)
    val bAttr = AttributeReference("__graft_bucket_b", LongType, nullable = false)()
    // sequence() over longs needs no real zone, but TimeZoneAwareExpression
    // resolution does — analysis already ran, so set it here
    val seq = Sequence(bucketOf(lo, w), bucketOf(hi, w), None,
      Some(conf.sessionLocalTimeZone))
    val bPlan = Generate(Explode(seq), unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(bAttr), child = bands)
    val cond = And(EqualTo(pBucket.toAttribute, bAttr), j.condition.get)
    Project(j.output, Join(pPlan, bPlan, Inner, Some(cond), j.hint))
  }
}
