package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression, In, IsNotNull, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule

/** Collapse a UNION ALL of provably-disjoint literal filters over the same
  * source into one IN-filtered scan.
  *
  * The reference's concat-then-aggregate idiom — `cs_sum(Quote_concat(
  * array(...)))` over every per-instrument series (user_guide example.sql:50)
  * — lands in Spark as `Union(Filter(sym = 'A', T), Filter(sym = 'B', T),
  * ...)`: k full scans of the same table. Catalyst's CombineUnions flattens
  * nested unions but nothing merges the arms, so the fact table is read k
  * times — the difference between one pass and k passes over 100 TB.
  *
  * Soundness: UNION ALL is a multiset. When every arm is the same source and
  * projection (modulo expression ids — compared with `sameResult` after
  * stripping the filter) and each arm keeps `col = literal` (or `col IN
  * (literals)`) with pairwise-DISTINCT non-null literals on the same column,
  * each source row satisfies at most one arm, so the multiset union equals
  * one `Filter(col IN (all literals))` pass. NULL column values pass no arm
  * and fail IN the same way. Arms carrying any other predicate (beyond the
  * `IsNotNull(col)` guard the equality itself implies, which
  * InferFiltersFromConstraints adds), duplicate literals (a row would have
  * to appear twice), or differing sources are left untouched.
  *
  * Runs in `experimental.extraOptimizations` (installed idempotently by the
  * union-producing operators — [[graft.join.Align.unionMerge]],
  * [[graft.series.Series.concat]]) or cluster-wide via
  * [[graft.sqlext.GraftExtensions]]. The batch runs after the standard
  * operator optimizations, so arms arrive in the canonical
  * Project(Filter(src)) shape with inferred null guards already attached.
  */
object UnionDisjointFilterCollapse extends Rule[LogicalPlan] {

  /** One decomposed union arm: optional projection, the filtered column's
    * ordinal in the source output, its literal set, and the arm with the
    * filter condition stripped (for exprId-insensitive shape comparison).
    */
  private case class Arm(proj: Option[Seq[NamedExpression]], attrIdx: Int,
                         attr: Attribute, lits: Seq[Literal],
                         src: LogicalPlan, shape: LogicalPlan)

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  private def decompose(child: LogicalPlan): Option[Arm] = {
    val (proj, f) = child match {
      case Project(pl, pf: Filter) => (Some(pl), pf)
      case pf: Filter => (None, pf)
      case _ => return None
    }
    val cs = conjuncts(f.condition)
    val (eqs, rest0) = cs.partition {
      case EqualTo(_: Attribute, _: Literal) | EqualTo(_: Literal, _: Attribute) => true
      case In(_: Attribute, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) => true
      case _ => false
    }
    if (eqs.size != 1) return None
    val (attr, lits) = eqs.head match {
      case EqualTo(a: Attribute, l: Literal) => (a, Seq(l))
      case EqualTo(l: Literal, a: Attribute) => (a, Seq(l))
      case In(a: Attribute, vs) => (a, vs.map(_.asInstanceOf[Literal]))
      case _ => return None // unreachable by the partition above
    }
    if (lits.exists(_.value == null)) return None
    // the only other conjunct allowed is the null guard on the SAME column
    // (implied by the equality); IsNotNull on any other column is a real
    // constraint and blocks the rewrite
    val rest = rest0.filterNot {
      case IsNotNull(a: Attribute) => a.exprId == attr.exprId
      case _ => false
    }
    if (rest.nonEmpty) return None
    val idx = f.child.output.indexWhere(_.exprId == attr.exprId)
    if (idx < 0) return None
    val shape = proj.map(Project(_, f.child)).getOrElse(f.child)
    Some(Arm(proj, idx, attr, lits, f.child, shape))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case u: Union if !u.byName && u.children.length > 1 =>
      val arms = u.children.map(decompose)
      if (arms.exists(_.isEmpty)) u
      else {
        val as = arms.map(_.get)
        val h = as.head
        val allLits = as.flatMap(_.lits)
        val compatible = as.tail.forall { a =>
          a.attrIdx == h.attrIdx && a.proj.isDefined == h.proj.isDefined &&
            a.shape.sameResult(h.shape)
        } && allLits.forall(_.dataType == allLits.head.dataType)
        // pairwise-distinct literal values = each row matches at most one
        // arm = the multiset union is exactly one IN pass
        val disjoint = allLits.map(_.value).distinct.size == allLits.size
        if (!compatible || !disjoint) u
        else {
          // keep the HEAD arm's plan (the Union exposes the head child's
          // attribute ids), widening only its filter
          val nf = Filter(In(h.attr, allLits), h.src)
          h.proj.map(Project(_, nf)).getOrElse(nf)
        }
      }
  }

  /** Idempotently add the rule to a live session. */
  def install(spark: SparkSession): Unit = {
    val e = spark.experimental
    if (!e.extraOptimizations.contains(UnionDisjointFilterCollapse))
      e.extraOptimizations = e.extraOptimizations :+ UnionDisjointFilterCollapse
  }
}
