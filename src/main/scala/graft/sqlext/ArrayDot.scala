package graft.sqlext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Σ a[i]·b[i] as a NATIVE codegen'd expression — the embedding-similarity
  * hot loop (SURVEY.md "Similarity search"). Compared to the HOF form
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)` over `cast("array<double>")`)
  * this reads float elements straight out of the columnar ArrayData with no
  * intermediate array allocation, no per-element lambda dispatch, and no
  * cast materialization: one tight fused loop inside whole-stage codegen.
  * At 100 TB of embeddings the dot product IS the scan cost, which is why
  * this is an Expression with doGenCode and not a UDF (preference order in
  * the design: compose built-ins > custom Expression > UDF).
  *
  * Elements widen to double before multiply, identical to the cast-based
  * HOF path, so results are bit-equal with it. Mismatched lengths use the
  * common prefix; array element nulls are not expected (embedding columns
  * are dense) and read as garbage per ArrayData semantics.
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def okType(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"cs_dot requires array<float>/array<double> arguments, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cs_dot"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val la = l.asInstanceOf[ArrayData]
    val ra = r.asInstanceOf[ArrayData]
    val n = math.min(la.numElements(), ra.numElements())
    val lf = isFloat(left)
    val rf = isFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (lf) la.getFloat(i).toDouble else la.getDouble(i)
      val y = if (rf) ra.getFloat(i).toDouble else ra.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val lGet = if (isFloat(left)) s"(double) $l.getFloat($i)" else s"$l.getDouble($i)"
      val rGet = if (isFloat(right)) s"(double) $r.getFloat($i)" else s"$r.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($l.numElements(), $r.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $lGet * $rGet;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}
