package graft.sqlext

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.types.BinaryType

/** The `cs_*` SQL function surface (imcs--1.1.sql operator names), exposed
  * to `spark.sql(...)` as NATIVE Catalyst expressions — every builder
  * returns a built-in expression tree (full whole-stage codegen, no UDF
  * serialization), so `SELECT cs_wavg(volume, close)` plans identically to
  * the DataFrame `sum(x*y)/sum(x)` form.
  *
  * Two registration paths:
  *  - [[GraftFunctions.register]] on a live session (temp functions);
  *  - [[GraftExtensions]] via `spark.sql.extensions=graft.sqlext.GraftExtensions`
  *    (config-time injection, the deployment story for a shared cluster).
  */
object GraftFunctions {

  private def norm(text: Expression): Expression =
    Lower(StringTrim(RegExpReplace(text, Literal("[^A-Za-z0-9]+"), Literal(" "))))

  /** (name, builder, usage) for every registered function. */
  val all: Seq[(String, Seq[Expression] => Expression, String)] = Seq(
    ("cs_wsum",
      (c: Seq[Expression]) => Sum(Multiply(c(0), c(1))).toAggregateExpression(),
      "cs_wsum(x, y) - weighted sum Σxy (func.c:1502-1575)"),
    ("cs_wavg",
      (c: Seq[Expression]) => Divide(
        Sum(Multiply(c(0), c(1))).toAggregateExpression(),
        Sum(c(0)).toAggregateExpression()),
      "cs_wavg(x, y) - weighted average Σxy/Σx, VWAP when x=volume"),
    ("cs_maxof", (c: Seq[Expression]) => Greatest(c),
      "cs_maxof(a, b, ...) - element-wise max (func.c:241-255)"),
    ("cs_minof", (c: Seq[Expression]) => Least(c),
      "cs_minof(a, b, ...) - element-wise min"),
    ("cs_iif", (c: Seq[Expression]) => If(c(0), c(1), c(2)),
      "cs_iif(cond, a, b) - element-wise conditional (func.c:2457-2558)"),
    ("cs_hamming", (c: Seq[Expression]) => BitwiseCount(BitwiseXor(c(0), c(1))),
      "cs_hamming(a, b) - bit distance between 64-bit fingerprints"),
    ("cs_fingerprint", (c: Seq[Expression]) => new XxHash64(Seq(norm(c(0)))),
      "cs_fingerprint(text) - xxhash64 of normalized text"),
    ("cs_norm_text", (c: Seq[Expression]) => norm(c(0)),
      "cs_norm_text(text) - lowercase, non-alnum runs collapsed"),
    ("cs_dot", (c: Seq[Expression]) => ArrayDot(c(0), c(1)),
      "cs_dot(a, b) - fused codegen dot product over float/double arrays"),
    ("cs_cosine",
      (c: Seq[Expression]) => Divide(ArrayDot(c(0), c(1)),
        Multiply(Sqrt(ArrayDot(c(0), c(0))), Sqrt(ArrayDot(c(1), c(1))))),
      "cs_cosine(a, b) - cosine similarity over embedding arrays"),
    ("cs_token_count",
      (c: Seq[Expression]) => Size(StringSplit(
        StringTrim(c(0)), Literal("\\s+"), Literal(-1))),
      "cs_token_count(text) - whitespace token count"),
    ("cs_md5_fp", (c: Seq[Expression]) => Md5(Cast(norm(c(0)), BinaryType)),
      "cs_md5_fp(text) - portable md5 fingerprint of normalized text"),
    ("cs_simhash", (c: Seq[Expression]) => SimHash64(c(0)),
      "cs_simhash(hashes) - 64-bit SimHash of a token-hash array (one-pass codegen)"))

  /** Register as temp functions on a live session. */
  def register(spark: SparkSession): Unit = all.foreach { case (name, b, _) =>
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, b, "scala_udf")
  }
}

/** `spark.sql.extensions` entry point: injects the cs_* functions at
  * session build time (SparkSessionExtensions is the supported plugin
  * surface for adding resolved functions cluster-wide).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder, usage) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.sqlext.GraftFunctions", name, usage),
        builder))
    }
}
