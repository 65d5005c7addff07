package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite an inequality interval-overlap join into a
  * binned EQUI-join — the [[graft.operators.IntervalOverlap]] plan,
  * applied automatically to plans the user wrote naively.
  *
  * Matches an inner join whose condition contains the half-open
  * overlap predicate `a_s < b_e AND b_s < a_e` (long attributes, each
  * `<` crossing sides; extra conjuncts are preserved). Spark plans
  * that join as BroadcastNestedLoopJoin or CartesianProduct —
  * O(|A|·|B|) — because neither conjunct is an equality. The rewrite:
  *
  *   1. Generate(explode(sequence(s div W, (e-1) div W))) on EACH side
  *      — every interval fans out to the fixed-width bins it touches;
  *   2. join on bin equality (hash-partitionable) plus the ORIGINAL
  *      condition (exactness) plus `bin = max(a_s div W, b_s div W)`
  *      — each qualifying pair meets in exactly its FIRST shared bin,
  *      so multiplicity is preserved without a Distinct (duplicate
  *      input rows keep their duplicate output rows);
  *   3. Project back to the original output.
  *
  * Truncating division is monotone for a positive width, so the bin
  * range covers the first-shared-bin for negative coordinates too.
  * The width is a config (`spark.graft.intervalJoin.binUs`, default
  * 1 hour in µs); 0 disables the rule. Fires once per join thanks to
  * the `__graft_bin` marker attribute it leaves behind.
  */
case class IntervalJoinRule(spark: org.apache.spark.sql.SparkSession)
    extends Rule[LogicalPlan] {

  private val BinAttr = "__graft_bin"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val binUs = spark.conf
      .get("spark.graft.intervalJoin.binUs", "3600000000").toLong
    if (binUs <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !j.output.exists(_.name == BinAttr) &&
            left.output.forall(_.name != BinAttr) &&
            right.output.forall(_.name != BinAttr) =>
        rewrite(j, left, right, cond, hint, binUs).getOrElse(j)
    }
  }

  /** (a_s, a_e) from left, (b_s, b_e) from right, iff `cond` contains
    * the crossing overlap conjuncts on long attributes. */
  private def matchOverlap(
      left: LogicalPlan, right: LogicalPlan, cond: Expression)
      : Option[(Attribute, Attribute, Attribute, Attribute, Seq[Expression])] = {
    val conjuncts = splitConjuncts(cond)
    val fromLeft = left.outputSet
    val fromRight = right.outputSet
    // canonicalize every strict comparison to (lesser, greater)
    val lts = conjuncts.collect {
      case LessThan(x: Attribute, y: Attribute) => (x, y)
      case GreaterThan(x: Attribute, y: Attribute) => (y, x)
    }.filter { case (x, y) =>
      x.dataType == LongType && y.dataType == LongType
    }
    val cross = lts.filter { case (x, y) =>
      (fromLeft.contains(x) && fromRight.contains(y)) ||
        (fromRight.contains(x) && fromLeft.contains(y))
    }
    // need a_s < b_e (left-start crossing) and b_s < a_e
    val lr = cross.find { case (x, _) => fromLeft.contains(x) }
    val rl = cross.find { case (x, _) => fromRight.contains(x) }
    (lr, rl) match {
      case (Some((aS, bE)), Some((bS, aE))) =>
        val used: Set[Expression] = Set(
          LessThan(aS, bE), GreaterThan(bE, aS),
          LessThan(bS, aE), GreaterThan(aE, bS))
        val rest = conjuncts.filterNot(used.contains)
        Some((aS, aE, bS, bE, rest))
      case _ => None
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def rewrite(
      j: Join,
      left: LogicalPlan,
      right: LogicalPlan,
      cond: Expression,
      hint: JoinHint,
      binUs: Long): Option[LogicalPlan] =
    matchOverlap(left, right, cond).map { case (aS, aE, bS, bE, rest) =>
      val w = Literal(binUs, LongType)
      def div(x: Expression) = new IntegralDivide(x, w)
      // clamp the upper bound: a row with e <= s (empty interval) can
      // never satisfy the overlap predicates, but an unclamped
      // descending sequence would throw at runtime instead of simply
      // not matching
      def bins(s: Attribute, e: Expression) = new Sequence(
        div(s),
        Greatest(Seq(div(s), div(Subtract(e, Literal(1L))))),
        Some(Literal(1L)))
        .withTimeZone(SQLConf.get.sessionLocalTimeZone)
      def withBins(child: LogicalPlan, s: Attribute, e: Attribute)
          : (LogicalPlan, Attribute) = {
        val attr = AttributeReference(BinAttr, LongType, nullable = true)()
        (Generate(Explode(bins(s, e)), unrequiredChildIndex = Nil,
          outer = false, qualifier = None,
          generatorOutput = Seq(attr), child = child), attr)
      }
      val (lGen, binL) = withBins(left, aS, aE)
      val (rGen, binR) = withBins(right, bS, bE)
      val firstShared = Greatest(Seq(div(aS), div(bS)))
      val newCond = (Seq(
        EqualTo(binL, binR),
        LessThan(aS, bE), LessThan(bS, aE),
        EqualTo(binL, firstShared)) ++ rest).reduce(And)
      Project(j.output, Join(lGen, rGen, Inner, Some(newCond), hint))
    }
}

/** `spark.sql.extensions` entry point injecting [[IntervalJoinRule]]. */
class IntervalJoinExtension
    extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(
      ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(session => IntervalJoinRule(session))
}
