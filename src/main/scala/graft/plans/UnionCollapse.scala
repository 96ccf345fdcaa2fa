package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeMap, BindReferences, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal, NamedExpression, Or, PlanExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.DataType

/** Collapse a UNION ALL of provably-disjoint slices of the same source
  * into one filtered scan.
  *
  * The reference's concat idioms — `cs_sum(Quote_concat(array(...)))` over
  * every per-instrument series (user_guide example.sql:50) and
  * `TABLE_concat` over per-period slices of one table
  * (imcs--1.1.sql:246-259) — land in Spark as
  * `Union(Filter(slice_i, T), ...)`: k full scans of the same table.
  * Catalyst's CombineUnions flattens nested unions but nothing merges the
  * arms, so the fact table is read k times — the difference between one
  * pass and k passes over 100 TB.
  *
  * Soundness: UNION ALL is a multiset. When every arm is the same source
  * and projection (modulo expression ids — compared with `sameResult`
  * after stripping the filter), each arm's predicate splits into a SLICE
  * on a common deterministic key expression — a point set (`key = lit` /
  * `key IN (lits)`) or an interval (`>=/> lo AND </<= hi`, either bound
  * optional) — plus an arm-invariant RESIDUAL (the remaining conjuncts,
  * canonically equal across arms after binding attribute references to
  * source ordinals; e.g. the `IsNotNull` guards InferFiltersFromConstraints
  * adds, or a shared `value > c`), and the slices are PAIRWISE DISJOINT,
  * then every source row satisfies at most one arm. The multiset union
  * therefore equals a single `Filter(residual AND (slice_1 OR ... OR
  * slice_k))` pass — rendered as one `IN` when all slices are points.
  * NULL key values pass no slice and fail the disjunction the same way.
  * Overlapping slices (a row would have to appear twice), arm-varying
  * residuals, non-deterministic or subquery predicates, or differing
  * sources leave the union untouched.
  *
  * Runs in `experimental.extraOptimizations` (installed idempotently by
  * the union-producing operators — [[graft.join.Align.unionMerge]],
  * [[graft.series.Series.concat]]) or cluster-wide via
  * [[graft.sqlext.GraftExtensions]]. The batch runs after the standard
  * operator optimizations, so arms arrive in the canonical
  * Project(Filter(src)) shape with pushed-down, null-guarded predicates —
  * including filters rewritten onto computed columns (a normalized `ts`
  * projection) — which is why the slice key is an Expression, not an
  * Attribute.
  */
object UnionDisjointFilterCollapse extends Rule[LogicalPlan] {

  /** An arm's constraint on the common key: a finite point set, or one
    * interval with optional bounds, each (literal, inclusive).
    */
  private sealed trait Slice
  private case class Points(lits: Seq[Literal]) extends Slice
  private case class Interval(lo: Option[(Literal, Boolean)],
                              hi: Option[(Literal, Boolean)]) extends Slice

  private case class Arm(proj: Option[Seq[NamedExpression]], src: LogicalPlan,
                         shape: LogicalPlan, conjs: Seq[Expression],
                         f: Filter, repart: Option[(Int, Boolean)] = None)

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** (key expression, comparison kind, literals); kinds: 'e' =, 'i' IN,
    * 'g' >, 'G' >=, 'l' <, 'L' <=. The key side may be any expression —
    * determinism and reference-validity are checked by the caller.
    */
  private def cmpAtom(e: Expression): Option[(Expression, Char, Seq[Literal])] = e match {
    case EqualTo(x, l: Literal) if !x.isInstanceOf[Literal] => Some((x, 'e', Seq(l)))
    case EqualTo(l: Literal, x) if !x.isInstanceOf[Literal] => Some((x, 'e', Seq(l)))
    case In(x, vs) if !x.isInstanceOf[Literal] && vs.nonEmpty &&
      vs.forall(_.isInstanceOf[Literal]) =>
      Some((x, 'i', vs.map(_.asInstanceOf[Literal])))
    case GreaterThan(x, l: Literal) if !x.isInstanceOf[Literal] => Some((x, 'g', Seq(l)))
    case GreaterThan(l: Literal, x) if !x.isInstanceOf[Literal] => Some((x, 'l', Seq(l)))
    case GreaterThanOrEqual(x, l: Literal) if !x.isInstanceOf[Literal] => Some((x, 'G', Seq(l)))
    case GreaterThanOrEqual(l: Literal, x) if !x.isInstanceOf[Literal] => Some((x, 'L', Seq(l)))
    case LessThan(x, l: Literal) if !x.isInstanceOf[Literal] => Some((x, 'l', Seq(l)))
    case LessThan(l: Literal, x) if !x.isInstanceOf[Literal] => Some((x, 'g', Seq(l)))
    case LessThanOrEqual(x, l: Literal) if !x.isInstanceOf[Literal] => Some((x, 'L', Seq(l)))
    case LessThanOrEqual(l: Literal, x) if !x.isInstanceOf[Literal] => Some((x, 'G', Seq(l)))
    case _ => None
  }

  /** Canonical form for cross-arm comparison: attribute references bound
    * to their ordinal in the arm's source output, then canonicalized —
    * insensitive to per-arm expression ids. None when the expression is
    * unusable (non-deterministic, subquery-bearing, or unbound refs).
    */
  private def boundCanon(e: Expression, arm: Arm): Option[Expression] = {
    if (!e.deterministic || e.exists(_.isInstanceOf[PlanExpression[_]])) None
    else scala.util.Try(
      BindReferences.bindReference(e, arm.f.child.output).canonicalized).toOption
  }

  /** Interpret the atoms for one key within one arm as a slice; the arm's
    * remaining conjuncts are its residual. None = not a valid slice.
    */
  private def toSlice(atoms: Seq[(Expression, Char, Seq[Literal])]): Option[Slice] = {
    if (atoms.exists(_._3.exists(_.value == null))) return None
    val (pts, bounds) = atoms.partition(a => a._2 == 'e' || a._2 == 'i')
    if (pts.nonEmpty) {
      if (bounds.nonEmpty || pts.size != 1) None
      else Some(Points(pts.head._3))
    } else {
      var lo: Option[(Literal, Boolean)] = None
      var hi: Option[(Literal, Boolean)] = None
      bounds.foreach { case (_, k, ls) =>
        val l = ls.head
        k match {
          case 'g' | 'G' => if (lo.isDefined) return None else lo = Some((l, k == 'G'))
          case 'l' | 'L' => if (hi.isDefined) return None else hi = Some((l, k == 'L'))
          case _ => return None
        }
      }
      if (lo.isEmpty && hi.isEmpty) None else Some(Interval(lo, hi))
    }
  }

  /** All slices pairwise disjoint under the key type's ordering: points
    * become degenerate [l, l] intervals, then sorted intervals must not
    * touch (equal endpoints only when not both inclusive).
    *
    * Signed zeros: the interpreted ORDERING distinguishes -0.0 < 0.0, but
    * Spark's comparison EVALUATION treats them equal — arms `k = -0.0` and
    * `k = 0.0` both match a 0.0 row, so judging them disjoint would halve
    * that row's multiplicity in the rewrite. Literal values are normalized
    * (-0.0 → 0.0) before the check only — equal-after-normalization slices
    * then touch and the union is left alone, the conservative outcome.
    */
  private def normZero(v: Any): Any = v match {
    case d: java.lang.Double if d.doubleValue == 0.0 => java.lang.Double.valueOf(0.0)
    case f: java.lang.Float if f.floatValue == 0.0f => java.lang.Float.valueOf(0.0f)
    case x => x
  }

  private def disjoint(slices: Seq[Slice], dt: DataType): Boolean = {
    if (!TypeUtils.typeWithProperEquals(dt)) return false
    if (!org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(dt))
      return false
    val ord = TypeUtils.getInterpretedOrdering(dt)
    val iv: Seq[(Option[(Any, Boolean)], Option[(Any, Boolean)])] = slices.flatMap {
      case Points(lits) => lits.map(l => (Some((normZero(l.value), true)), Some((normZero(l.value), true))))
      case Interval(lo, hi) =>
        // an interval already empty (lo > hi, or lo = hi not both
        // inclusive) matches nothing — it cannot overlap anything
        val e = for { (ll, li) <- lo; (hl, hiI) <- hi } yield {
          val c = ord.compare(normZero(ll.value), normZero(hl.value))
          c > 0 || (c == 0 && !(li && hiI))
        }
        if (e.contains(true)) Seq.empty
        else Seq((lo.map { case (l, i) => (normZero(l.value), i) },
          hi.map { case (l, i) => (normZero(l.value), i) }))
    }
    val (unboundedLo, boundedLo) = iv.partition(_._1.isEmpty)
    if (unboundedLo.size > 1) return false
    // tie-break equal lo bounds inclusive-first: a degenerate point [5,5]
    // must sort BEFORE an exclusive-lo interval (5,10], or the sliding
    // check compares the interval's hi against the point's lo and
    // declares a phantom overlap (arm-order-dependent false negative)
    val sorted = boundedLo.sortBy { p => (p._1.get._1, !p._1.get._2) }(
      Ordering.Tuple2(ord, Ordering.Boolean))
    val all = unboundedLo ++ sorted
    all.sliding(2).forall {
      case Seq((_, Some((h, hIncl))), (Some((l, lIncl)), _)) =>
        val c = ord.compare(h, l)
        c < 0 || (c == 0 && !(hIncl && lIncl))
      case Seq((_, None), _) => false // unbounded hi before another arm
      case _ => true
    }
  }

  /** Rebuild one slice as a predicate over the head arm's ORIGINAL key
    * expression (whose attribute ids the rewritten plan keeps).
    */
  private def rebuild(key: Expression, s: Slice): Expression = s match {
    case Points(Seq(l)) => EqualTo(key, l)
    case Points(lits) => In(key, lits)
    case Interval(lo, hi) =>
      val lp = lo.map { case (l, incl) =>
        if (incl) GreaterThanOrEqual(key, l) else GreaterThan(key, l) }
      val hp = hi.map { case (l, incl) =>
        if (incl) LessThanOrEqual(key, l) else LessThan(key, l) }
      (lp.toSeq ++ hp.toSeq: Seq[Expression]).reduceLeft(And(_, _))
  }

  private def decomposeShape(child: LogicalPlan): Option[Arm] = child match {
    case Project(pl, pf: Filter) =>
      Some(Arm(Some(pl), pf.child, Project(pl, pf.child), conjuncts(pf.condition), pf))
    case pf: Filter =>
      Some(Arm(None, pf.child, pf.child, conjuncts(pf.condition), pf))
    // a round-robin Repartition (the undersized-source re-split
    // Tables.read inserts at sizes where one file would serialize every
    // scan) is row-preserving — peel it, collapse underneath, re-apply
    // ONE equivalent node on the merged scan. Arms must agree on
    // (numPartitions, shuffle) — checked in tryCollapse like the shape.
    case r: org.apache.spark.sql.catalyst.plans.logical.Repartition =>
      decomposeShape(r.child).filter(_.repart.isEmpty)
        .map(_.copy(repart = Some((r.numPartitions, r.shuffle))))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case u: Union if !u.byName && u.children.length > 1 =>
      tryCollapse(u).getOrElse(u)
  }

  /** Rewrite an arm's condition onto the head arm's attribute ids — valid
    * positionally because `sameResult` guarantees the canonicalized
    * sources agree column-for-column.
    */
  private def rebase(e: Expression, from: Seq[Attribute], to: Seq[Attribute]): Expression = {
    val m = AttributeMap(from.zip(to))
    e.transform { case a: Attribute => m.getOrElse(a, a) }
  }

  private def tryCollapse(u: Union): Option[LogicalPlan] = {
    val arms = u.children.map(decomposeShape)
    if (arms.exists(_.isEmpty)) return None
    val as = arms.map(_.get)
    val h = as.head
    if (!as.tail.forall(a =>
      a.proj.isDefined == h.proj.isDefined && a.repart == h.repart &&
        a.shape.sameResult(h.shape)))
      return None
    // a non-deterministic arm changes per-row evaluation under OR
    // short-circuiting; a subquery's inner plan would not rebase
    if (as.exists(a => !a.f.condition.deterministic ||
      a.f.condition.exists(_.isInstanceOf[PlanExpression[_]]))) return None
    // same for PROJECTIONS: per-arm rand(seed)/monotonic-id columns
    // canonicalize identically across arms, but one merged scan draws ONE
    // stream over the combined rows — a different multiset than two
    // per-arm streams (the same reason Catalyst's own rules refuse to
    // reorganize non-deterministic evaluation)
    if (as.exists(_.proj.exists(_.exists(e => !e.deterministic ||
      e.exists(_.isInstanceOf[PlanExpression[_]]))))) return None
    // per arm: comparison atoms grouped by canonical key, plus the other
    // conjuncts; every conjunct must canonicalize (deterministic, no
    // subqueries, refs bound to the arm's own source) or the arm opts out
    type Atom = (Expression, Char, Seq[Literal])
    case class Split(byKey: Map[Expression, Seq[(Atom, Expression)]],
                     keyOrder: Seq[Expression], // first-appearance order
                     residual: Seq[(Expression, Expression)]) // (canon, original)
    val splits = as.map { arm =>
      val parsed: Seq[Either[Expression, (Expression, Atom, Expression)]] =
        arm.conjs.map { c =>
          cmpAtom(c) match {
            case Some(a @ (k, _, _)) =>
              boundCanon(k, arm) match {
                case Some(kc) => Right((kc, a, c))
                case None => Left(c)
              }
            case None => Left(c)
          }
        }
      val residual = parsed.collect { case Left(c) => c }.map { c =>
        boundCanon(c, arm) match {
          case Some(cc) => (cc, c)
          case None => return None // non-deterministic / subquery conjunct
        }
      }
      val keyed = parsed.collect { case Right((kc, a, c)) => (kc, (a, c)) }
      Split(keyed.groupBy(_._1).view.mapValues(_.map(_._2)).toMap,
        keyed.map(_._1).distinct, residual)
    }
    def multiset(xs: Seq[Expression]): Map[Expression, Int] =
      xs.groupBy(identity).view.mapValues(_.size).toMap
    // candidate slice keys: tried in the head arm's CONJUNCT order (a
    // HashMap's .keys would make the chosen key — and thus the emitted
    // plan shape — depend on expression hashing); first viable wins
    splits.head.keyOrder.iterator.flatMap { key =>
      // per arm: the slice on this key; atoms on OTHER keys fold into the
      // residual (they must then match across arms like any residual)
      val armSlices = as.zip(splits).map { case (arm, sp) =>
        sp.byKey.get(key).flatMap(a => toSlice(a.map(_._1))).flatMap { slice =>
          val extras = (sp.byKey - key).values.flatten.toSeq.map(_._2)
          val extraCanon = extras.map(c => boundCanon(c, arm))
          if (extraCanon.exists(_.isEmpty)) None
          else Some((slice,
            sp.residual ++ extraCanon.map(_.get).zip(extras)))
        }
      }
      if (armSlices.exists(_.isEmpty)) None
      else {
        val slices = armSlices.map(_.get._1)
        val residuals = armSlices.map(_.get._2)
        val headResCanon = multiset(residuals.head.map(_._1))
        val sameResidual =
          residuals.tail.forall(r => multiset(r.map(_._1)) == headResCanon)
        // head's original key instance — its attribute ids are the ones
        // the rewritten (head-shaped) plan exposes
        val headKeyOrig = splits.head.byKey(key).head._1._1
        val dt = headKeyOrig.dataType
        val litsOk = slices.flatMap {
          case Points(ls) => ls
          case Interval(lo, hi) => lo.map(_._1).toSeq ++ hi.map(_._1).toSeq
        }.forall(_.dataType == dt)
        if (!litsOk || !disjoint(slices, dt)) None
        else {
          // disjoint slices alone make the collapse sound: each row
          // satisfies at most one arm, so the union equals Filter(OR of
          // the full arm conditions). When the residuals MATCH across
          // arms, hoist them and merge the slices (a single IN for
          // all-points unions) — the cleaner, pushdown-friendlier form.
          val cond =
            if (sameResidual) {
              val allPoints = slices.forall(_.isInstanceOf[Points])
              val sliceCond =
                if (allPoints)
                  In(headKeyOrig, slices.flatMap(_.asInstanceOf[Points].lits))
                else slices.map(rebuild(headKeyOrig, _)).reduceLeft(Or(_, _))
              (residuals.head.map(_._2) :+ sliceCond).reduceLeft(And(_, _))
            } else
              as.map(a => rebase(a.f.condition, a.src.output, h.src.output))
                .reduceLeft(Or(_, _))
          val nf = Filter(cond, h.src)
          val merged: LogicalPlan = h.proj.map(Project(_, nf)).getOrElse(nf)
          Some(h.repart.map { case (n, sh) =>
            org.apache.spark.sql.catalyst.plans.logical
              .Repartition(n, sh, merged): LogicalPlan
          }.getOrElse(merged))
        }
      }
    }.nextOption()
  }

  /** Idempotently add the rule to a live session. SESSION-GLOBAL: once
    * installed (by [[graft.join.Align.unionMerge]] /
    * [[graft.series.Series.concat]] or directly), the rule sees every
    * union the session optimizes — sound because the rewrite fires only
    * on provably-disjoint same-source arms and leaves everything else
    * untouched. `extraOptimizations` is a plain shared var, so the
    * check-then-append is serialized on the ExperimentalMethods instance —
    * unsynchronized concurrent installers could lose or duplicate the
    * append (duplicates are harmless but each costs an optimizer pass;
    * a lost install silently skips the collapse).
    */
  def install(spark: SparkSession): Unit = {
    val e = spark.experimental
    e.synchronized {
      if (!e.extraOptimizations.contains(UnionDisjointFilterCollapse))
        e.extraOptimizations = e.extraOptimizations :+ UnionDisjointFilterCollapse
    }
  }
}
