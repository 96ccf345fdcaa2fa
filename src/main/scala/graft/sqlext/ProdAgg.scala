package graft.sqlext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Cast, Expression, If, IsNotNull, IsNull, Literal, Multiply, Or}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, NumericType}

/** Product aggregate — cs_prd (func.c:1407-1444): Πx over non-null
  * values, NULL for an empty (or all-null) input, matching SQL aggregate
  * null semantics and DuckDB's product(). A DeclarativeAggregate: the
  * update/merge are pure expression trees, so it runs partial/final with
  * whole-stage codegen like the built-in Sum — the frame-level typed
  * Aggregator (Aggs.prd) remains the Dataset-API form.
  */
case class CsProdAgg(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[NumericType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cs_prd requires a numeric value, got ${child.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cs_prd"

  private lazy val prod = AttributeReference("prod", DoubleType, nullable = false)()
  private lazy val seen = AttributeReference("seen", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(prod, seen)
  override lazy val initialValues: Seq[Expression] = Seq(Literal(1.0), Literal(false))
  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(child), prod, Multiply(prod, Cast(child, DoubleType))),
    Or(seen, IsNotNull(child)))
  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Multiply(prod.left, prod.right),
    Or(seen.left, seen.right))
  override lazy val evaluateExpression: Expression =
    If(seen, prod, Literal.create(null, DoubleType))

  override protected def withNewChildInternal(c: Expression): CsProdAgg = copy(child = c)
}
