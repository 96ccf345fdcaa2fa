package graft.sqlext

import org.apache.spark.sql.catalyst.analysis.{TypeCheckResult, TypeCoercion}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Polymorphic lifting of the reference's scalar operator surface over
  * array series — the `_seq_seq` / `_seq_num` / `_num_seq` overload
  * families of imcs--1.1.sql:550-660. The reference defines the mixed
  * forms literally as `cs_add(ts, cs_const_num(val, cs_type(ts)))`
  * (imcs--1.1.sql:553-556): a scalar IS a constant series zipped with
  * the finite operand. These dispatchers reproduce that model over the
  * SQL type system:
  *
  *  - scalar op scalar  → the native Spark expression (unchanged plans:
  *    `cs_add(l_tax, 1)` still compiles to codegen `Add`);
  *  - array  op array   → `zip_with` truncated to the SHORTER input
  *    (iterator semantics: a binary pipe ends when either operand ends,
  *    func.c:106-184);
  *  - array  op scalar  → `transform`, the scalar broadcast per element
  *    (cs_const composition above) — and symmetrically.
  *
  * Dispatch needs operand TYPES, which a FunctionRegistry builder cannot
  * see (children are unresolved at build time), so each expression is a
  * [[RuntimeReplaceable]]: `replacement` is forced only after analysis
  * resolves the children (the ArrayCompact pattern). Because replacement
  * is constructed POST-analysis, no coercion rules run over it — the
  * common element type is computed here with the analyzer's own lattice
  * (TypeCoercion.findWiderTypeForTwo) and casts are inserted explicitly.
  *
  * Comparisons over arrays yield `array<boolean>` — the repo's series
  * convention (CsSeriesFilterPos consumes boolean conditions), where the
  * reference uses int8 0/1 series; value-parity replays cast at the
  * boundary (RefRegressionSpec).
  */
object CsPoly {
  private[sqlext] def isArr(dt: DataType): Boolean = dt.isInstanceOf[ArrayType]
  private[sqlext] def elemOf(dt: DataType): DataType =
    dt.asInstanceOf[ArrayType].elementType
  private[sqlext] def nullsOf(dt: DataType): Boolean =
    dt.asInstanceOf[ArrayType].containsNull

  private[sqlext] def numeric(dt: DataType): Boolean = dt match {
    case _: NumericType | NullType => true
    case _ => false
  }
  private[sqlext] def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | NullType => true
    case _ => false
  }

  /** The analyzer's widening lattice, applied manually (post-analysis). */
  private[sqlext] def widen(a: DataType, b: DataType): DataType =
    if (a == b) a
    else TypeCoercion.findWiderTypeForTwo(a, b).getOrElse(
      throw new IllegalArgumentException(
        s"no common type for ${a.sql} and ${b.sql}"))

  private[sqlext] def cast(e: Expression, dt: DataType): Expression =
    if (e.dataType == dt) e else Cast(e, dt)

  /** transform(arr, x -> f(x)) with a pre-bound lambda (post-analysis). */
  private[sqlext] def lift1(arr: Expression, f: Expression => Expression): Expression = {
    val x = NamedLambdaVariable("x", elemOf(arr.dataType), nullsOf(arr.dataType))
    ArrayTransform(arr, LambdaFunction(f(x), Seq(x)))
  }

  /** zip_with over the common prefix of two arrays (min length — the
    * reference's binary-iterator termination), pre-bound lambda.
    */
  private[sqlext] def lift2(
      a: Expression, b: Expression,
      f: (Expression, Expression) => Expression): Expression = {
    val n = Least(Seq(Size(a), Size(b)))
    val x = NamedLambdaVariable("x", elemOf(a.dataType), nullsOf(a.dataType))
    val y = NamedLambdaVariable("y", elemOf(b.dataType), nullsOf(b.dataType))
    ZipWith(
      Slice(a, Literal(1), n), Slice(b, Literal(1), n),
      LambdaFunction(f(x, y), Seq(x, y)))
  }
}

/** Binary scalar/series dispatcher — cs_add/sub/mul/div/mod/pow, the six
  * comparisons, bitwise and/or/xor, maxof/minof (func.c:106-255; SQL
  * overloads imcs--1.1.sql:550-660).
  */
case class CsPolyBinary(op: String, left: Expression, right: Expression)
    extends Expression with RuntimeReplaceable {
  import CsPoly._
  require(CsPolyBinary.ops.contains(op), s"unknown poly op $op")

  override def children: Seq[Expression] = Seq(left, right)
  override def prettyName: String = s"cs_$op"
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CsPolyBinary =
    copy(left = c(0), right = c(1))

  private def kind: String = CsPolyBinary.kindOf(op)

  override def checkInputDataTypes(): TypeCheckResult = {
    def elemTy(dt: DataType) = if (isArr(dt)) elemOf(dt) else dt
    val (lt, rt) = (elemTy(left.dataType), elemTy(right.dataType))
    val admissible = kind match {
      // boolean conditions admitted: the reference's comparisons yield
      // int8 0/1 series and compose with & | # (operators.sql); ours
      // yield booleans, which the bit ops widen to long
      case "bit" => (integral(lt) || lt == BooleanType) &&
        (integral(rt) || rt == BooleanType)
      case "cmp" => // widening must exist (covers numeric, string, date pairs)
        (lt == rt) || TypeCoercion.findWiderTypeForTwo(lt, rt).isDefined
      case _ => numeric(lt) && numeric(rt)
    }
    if (admissible) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName cannot operate on ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override lazy val replacement: Expression = {
    val (lt, rt) = (left.dataType, right.dataType)
    def elemTy(dt: DataType) = if (isArr(dt)) elemOf(dt) else dt
    // common element type, with the op families' result-type rules:
    // div/pow compute in double (Spark's Divide/Pow coercion); bitwise
    // stays integral; everything else takes the widened operand type.
    def boolToLong(dt: DataType): DataType =
      if (kind == "bit" && dt == BooleanType) LongType else dt
    val w0 = widen(boolToLong(elemTy(lt)), boolToLong(elemTy(rt)))
    val w = op match {
      case "div" | "pow" => if (w0.isInstanceOf[DecimalType]) w0 else DoubleType
      case _ => w0
    }
    def f(a: Expression, b: Expression): Expression = {
      val (x, y) = (cast(a, w), cast(b, w))
      op match {
        case "add" => Add(x, y)
        case "sub" => Subtract(x, y)
        case "mul" => Multiply(x, y)
        case "div" if w == DoubleType =>
          // C float-division semantics (the reference divides raw doubles,
          // func.c:106-184): x/0 is signed Inf, 0/0 and NaN/0 are NaN —
          // where ANSI Divide raises. Scalar decimal division keeps the
          // ANSI expression.
          If(EqualTo(y, Literal(0.0)),
            If(Or(IsNaN(x), EqualTo(x, Literal(0.0))), Literal(Double.NaN),
              If(LessThan(x, Literal(0.0)),
                Literal(Double.NegativeInfinity), Literal(Double.PositiveInfinity))),
            Divide(x, y, EvalMode.LEGACY))
        case "div" => Divide(x, y)
        case "mod" => Remainder(x, y)
        case "pow" => Pow(x, y)
        case "maxof" => Greatest(Seq(x, y))
        case "minof" => Least(Seq(x, y))
        case "eq" => EqualTo(x, y)
        case "ne" => Not(EqualTo(x, y))
        case "gt" => GreaterThan(x, y)
        case "ge" => GreaterThanOrEqual(x, y)
        case "lt" => LessThan(x, y)
        case "le" => LessThanOrEqual(x, y)
        case "and" => BitwiseAnd(x, y)
        case "or" => BitwiseOr(x, y)
        case "xor" => BitwiseXor(x, y)
      }
    }
    (isArr(lt), isArr(rt)) match {
      case (false, false) => f(left, right)
      case (true, true) => lift2(left, right, f)
      case (true, false) => lift1(left, f(_, right))
      case (false, true) => lift1(right, f(left, _))
    }
  }
}
object CsPolyBinary {
  val arith = Set("add", "sub", "mul", "div", "mod", "pow", "maxof", "minof")
  val cmp = Set("eq", "ne", "gt", "ge", "lt", "le")
  val bit = Set("and", "or", "xor")
  val ops: Set[String] = arith ++ cmp ++ bit
  def kindOf(op: String): String =
    if (cmp(op)) "cmp" else if (bit(op)) "bit" else "arith"
}

/** Unary scalar/series dispatcher — cs_neg/abs, the math functions,
  * ceil/floor, isnan, logical not, bitwise not (func.c:258-316, 864-902).
  */
case class CsPolyUnary(op: String, child: Expression)
    extends Expression with RuntimeReplaceable {
  import CsPoly._
  require(CsPolyUnary.ops.contains(op), s"unknown poly op $op")

  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = CsPolyUnary.nameOf(op)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CsPolyUnary =
    copy(child = c(0))

  override def checkInputDataTypes(): TypeCheckResult = {
    val et = if (isArr(child.dataType)) elemOf(child.dataType) else child.dataType
    val admissible = op match {
      case "bit_not" => integral(et)
      case "not" => et == BooleanType || integral(et)
      case _ => numeric(et)
    }
    if (admissible) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName cannot operate on ${child.dataType.sql}")
  }

  override lazy val replacement: Expression = {
    def f(x0: Expression): Expression = op match {
      case "neg" => UnaryMinus(x0)
      case "abs" => Abs(x0)
      case "ceil" => Ceil(x0)
      case "floor" => Floor(x0)
      case "isnan" => IsNaN(cast(x0, DoubleType))
      case "bit_not" => BitwiseNot(x0)
      case "not" =>
        // over the reference's int8 0/1 conditions !x is x==0; over the
        // repo's boolean conditions it is plain negation
        if (x0.dataType == BooleanType) Not(x0)
        else EqualTo(x0, cast(Literal(0), x0.dataType))
      case _ => // sin cos tan asin acos atan exp log sqrt: double domain
        val x = cast(x0, DoubleType)
        op match {
          case "sin" => Sin(x)
          case "cos" => Cos(x)
          case "tan" => Tan(x)
          case "asin" => Asin(x)
          case "acos" => Acos(x)
          case "atan" => Atan(x)
          case "exp" => Exp(x)
          case "log" => Log(x)
          case "sqrt" => Sqrt(x)
        }
    }
    if (isArr(child.dataType)) lift1(child, f) else f(child)
  }
}
object CsPolyUnary {
  val ops: Set[String] = Set(
    "neg", "abs", "sin", "cos", "tan", "asin", "acos", "atan",
    "exp", "log", "sqrt", "ceil", "floor", "isnan", "not", "bit_not")
  def nameOf(op: String): String = s"cs_$op"
}

/** Ternary conditional over scalars or array series — cs_iif
  * (func.c:2457-2558): a SCALAR boolean condition is plain `If`; an
  * `array<boolean>` condition selects ELEMENT-WISE, with either branch a
  * series or a broadcast scalar — the reference's comparisons yield 0/1
  * series, and its iif composes with them (`cs_iif(cs_gt(x, 0), x,
  * cs_neg(x))`), which a bare `If` rejects at analysis.
  */
case class CsPolyIf(cond: Expression, a: Expression, b: Expression)
    extends Expression with RuntimeReplaceable {
  import CsPoly._

  override def children: Seq[Expression] = Seq(cond, a, b)
  override def prettyName: String = "cs_iif"
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CsPolyIf =
    copy(cond = c(0), a = c(1), b = c(2))

  override def checkInputDataTypes(): TypeCheckResult = {
    def elemTy(dt: DataType) = if (isArr(dt)) elemOf(dt) else dt
    if (elemTy(cond.dataType) != BooleanType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName condition must be boolean or array<boolean>, got ${cond.dataType.sql}")
    else {
      val (at, bt) = (elemTy(a.dataType), elemTy(b.dataType))
      if (at == bt || TypeCoercion.findWiderTypeForTwo(at, bt).isDefined)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName branches must share a type, got ${a.dataType.sql} and ${b.dataType.sql}")
    }
  }

  override lazy val replacement: Expression = {
    def elemTy(dt: DataType) = if (isArr(dt)) elemOf(dt) else dt
    if (!isArr(cond.dataType)) If(cond, a, b)
    else {
      val w = widen(elemTy(a.dataType), elemTy(b.dataType))
      (isArr(a.dataType), isArr(b.dataType)) match {
        case (false, false) =>
          lift1(cond, c => If(c, cast(a, w), cast(b, w)))
        case (true, false) =>
          lift2(cond, a, (c, x) => If(c, cast(x, w), cast(b, w)))
        case (false, true) =>
          lift2(cond, b, (c, y) => If(c, cast(a, w), cast(y, w)))
        case (true, true) =>
          // no ternary zip in Catalyst: pair the branches first, then
          // select per element from the paired struct
          val zipped = lift2(a, b,
            (x, y) => CreateStruct(Seq(cast(x, w), cast(y, w))))
          lift2(cond, zipped,
            (c, s) => If(c, GetStructField(s, 0), GetStructField(s, 1)))
      }
    }
  }
}
