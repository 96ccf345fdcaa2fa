package graft.sqlext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text normalization as ONE fused byte pass — bit-identical to
  * `lower(trim(regexp_replace(text, "[^A-Za-z0-9]+", " ")))`, the
  * normalization every dedup/text operator keys on (TextOps.normalizedText
  * and the cs_fingerprint / cs_md5_fp SQL builders composed it from three
  * string expressions before r17).
  *
  * Why a custom expression: the regex form was measured at ~75% of the
  * exact-dedup scan cost (0.19 s of q_dedup_exact's 0.31 s at sf0.1 —
  * java.util.regex over a UTF-16 copy plus two more full-string passes
  * and three intermediate allocations per document). The normalization
  * runs once per document over the WHOLE corpus in every text pipeline,
  * so at 100 TB it is the scan cost. This pass allocates one output
  * buffer and touches each byte once.
  *
  * Byte-level equivalence argument: the regex replaces every maximal run
  * of non-[A-Za-z0-9] CODEPOINTS with one space; in UTF-8 every byte of
  * a non-ASCII codepoint is >= 0x80 and every ASCII non-alnum byte is
  * its own codepoint, so "maximal run of non-alnum codepoints" and
  * "maximal run of non-alnum bytes" cover exactly the same spans. trim
  * then strips leading/trailing spaces (the only whitespace left) and
  * lower maps A-Z (the only cased characters left) to a-z. The state
  * machine emits lowercased alnum runs joined by single spaces — the
  * same string.
  */
case class NormText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cs_norm_text requires a string, got ${other.sql}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "cs_norm_text"

  override def nullSafeEval(input: Any): Any =
    NormText.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.sqlext.NormText.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormText =
    copy(child = newChild)
}

object NormText {
  /** The shared normalization kernel (called from both interpreted eval and
    * generated code): lowercased [a-z0-9] runs joined by single spaces,
    * no leading/trailing space.
    */
  def normalize(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    val in = s.getBytes // one copy; windows below are branch-only
    val out = new Array[Byte](n)
    var o = 0
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val b = in(i)
      val mapped: Byte =
        if (b >= 'A' && b <= 'Z') (b + 32).toByte
        else if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) b
        else -1
      if (mapped != -1) {
        if (pendingSpace && o > 0) { out(o) = ' '; o += 1 }
        pendingSpace = false
        out(o) = mapped; o += 1
      } else pendingSpace = true
      i += 1
    }
    UTF8String.fromBytes(out, 0, o)
  }
}
