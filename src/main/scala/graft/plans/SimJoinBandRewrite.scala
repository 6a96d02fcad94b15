package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.functions.HammingDistance

/** Auto-bands similarity joins — the custom `Rule[LogicalPlan]` layer of
  * the engine (SURVEY §2B "custom operators", preference order (c)).
  *
  * An INNER join whose condition contains `hamming_distance(l, r) <= k`
  * (k ≤ 3, 64-bit signatures) and has NO cross-side equality would plan
  * as a nested-loop/cartesian O(n²) scan. The rule rewrites it to the
  * pigeonhole banded form the hand-written dd_simhash_pairs query builds
  * manually: each side position-explodes its signature into 4 16-bit
  * bands (distance ≤ 3 ⇒ at least one band equal), the join becomes an
  * EQUI-join on (band index, band value) — shuffle-partitionable, so it
  * scales like any key join — and a first-agreeing-band predicate keeps
  * exact pair multiplicity (each qualifying pair appears from exactly ONE
  * band; no post-dedup, duplicate input rows keep multiset semantics).
  * The original condition is preserved in full, so the rewrite is
  * semantics-preserving by construction; the equi-key guard makes it a
  * fixpoint (the rewritten join no longer matches).
  *
  * Active in extension sessions via
  * [[graft.GraftExtensions]]`.injectOptimizerRule` and attachable to any
  * session at runtime through `spark.experimental.extraOptimizations` —
  * both run after the main optimizer batches, so the threshold literal
  * is already constant-folded to BIGINT.
  */
object SimJoinBandRewrite extends Rule[LogicalPlan] {

  private val Bands = 4
  private val BandBits = 16

  private def bandExpr(sig: Expression, j: Int): Expression =
    BitwiseAnd(ShiftRightUnsigned(sig, Literal(j * BandBits)), Literal(0xffffL))

  /** Index of the first agreeing 16-bit band (defined whenever the
    * hamming predicate held — pigeonhole guarantees one exists). */
  private def firstAgreeBand(l: Expression, r: Expression): Expression =
    CaseWhen(
      (0 until Bands).map(j =>
        (EqualTo(bandExpr(l, j), bandExpr(r, j)), Literal(j))),
      None)

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other     => Seq(other)
  }

  /** (left signature, right signature) when `e` is a qualifying hamming
    * threshold predicate between the two sides. */
  private def hammingSides(e: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression)] = {
    def sides(a: Expression, b: Expression): Option[(Expression, Expression)] =
      if (a.references.nonEmpty && b.references.nonEmpty &&
        a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet))
        Some((a, b))
      else if (a.references.nonEmpty && b.references.nonEmpty &&
        a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
        Some((b, a))
      else None
    e match {
      case LessThanOrEqual(HammingDistance(a, b), Literal(k: Long, LongType))
          if k >= 0 && k < Bands => sides(a, b)
      case LessThan(HammingDistance(a, b), Literal(k: Long, LongType))
          if k >= 1 && k <= Bands => sides(a, b)
      case GreaterThanOrEqual(Literal(k: Long, LongType), HammingDistance(a, b))
          if k >= 0 && k < Bands => sides(a, b)
      case _ => None
    }
  }

  private def crossEquality(e: Expression, left: LogicalPlan, right: LogicalPlan): Boolean =
    e match {
      case EqualTo(x, y) =>
        (x.references.nonEmpty && y.references.nonEmpty) &&
          ((x.references.subsetOf(left.outputSet) && y.references.subsetOf(right.outputSet)) ||
            (x.references.subsetOf(right.outputSet) && y.references.subsetOf(left.outputSet)))
      case _ => false
    }

  private def posExplodeBands(child: LogicalPlan, sig: Expression, prefix: String)
      : (LogicalPlan, Attribute, Attribute) = {
    val arr = CreateArray((0 until Bands).map(j => bandExpr(sig, j)))
    val pos = AttributeReference(prefix + "_band_idx", IntegerType, nullable = false)()
    val value = AttributeReference(prefix + "_band_val", LongType, nullable = true)()
    (Generate(PosExplode(arr), unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(pos, value), child), pos, value)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjuncts(cond)
      val hamming = conjuncts.view.flatMap(hammingSides(_, left, right)).headOption
      val hasEqui = conjuncts.exists(crossEquality(_, left, right))
      hamming match {
        case Some((lsig, rsig)) if !hasEqui =>
          val (l2, lpos, lval) = posExplodeBands(left, lsig, "_graft_l")
          val (r2, rpos, rval) = posExplodeBands(right, rsig, "_graft_r")
          val newCond = And(
            And(EqualTo(lpos, rpos), EqualTo(lval, rval)),
            And(EqualTo(firstAgreeBand(lsig, rsig), lpos), cond))
          Project(j.output, Join(l2, r2, Inner, Some(newCond), hint))
        case _ => j
      }
  }
}
