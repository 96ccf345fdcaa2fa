package graft.sqlext

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** cs_lang_sig(text): per-language marker-word hit counts behind
  * TextOps.langId in ONE byte pass — struct(hits_de, hits_en, hits_es,
  * hits_fr), language order = langMarkers.keys.sorted (the fold order of
  * the composed argmax, which stays in langId unchanged).
  *
  * Replaces `split(lower(trim(text)), "\\s+")` + four per-language
  * interpreted `filter(...)` HOF lambdas (each a fresh array pass with 5
  * equality checks per token) — the parked r17 residual (VERDICT r17 next
  * #8). Equality with the composed form, token by token:
  *  - tokenization: maximal runs of java-regex `\s` (the 6 ASCII bytes;
  *    TextScan.isWs6) after a 0x20-only trim — boundary phantom-empty
  *    tokens (which `split`'s limit −1 keeps) can never equal a marker,
  *    so skipping them leaves every count unchanged;
  *  - the composed form lowercases the WHOLE string (full-unicode
  *    toLowerCase) before comparing tokens to the ASCII markers. For
  *    these markers ASCII-only tolower + byte equality is equivalent:
  *    a token equals an ASCII marker under full lowercase iff every
  *    source char lowercases to exactly that ASCII letter, and for every
  *    letter the markers use the full-lowercase preimage is exactly
  *    {lower, UPPER} ASCII (the two non-trivial unicode maps into ASCII
  *    lowercase — U+0130 İ → "i"+U+0307 and U+212A K → "k" — produce a
  *    combining mark / a letter no marker contains, so both sides agree
  *    on "not equal"); unicode lowercase never creates or removes `\s`,
  *    so token boundaries agree too;
  *  - a marker appearing in two languages ("la": fr AND es) increments
  *    both counts, exactly as the independent filter passes did.
  * NULL text yields a NULL struct; the argmax fold in langId turns that
  * into "und" through the same when-chain the composed counts took.
  */
case class LangSig(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cs_lang_sig requires a string, got ${other.sql}")
  }

  override def dataType: DataType = LangSig.schema

  override def prettyName: String = "cs_lang_sig"

  override def nullSafeEval(input: Any): Any =
    LangSig.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.sqlext.LangSig.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): LangSig =
    copy(child = newChild)
}

object LangSig {
  /** Field order = TextOps.langMarkers.keys.sorted — langId's fold order. */
  val langs: Seq[String] = Seq("de", "en", "es", "fr")

  val schema: StructType = StructType(
    langs.map(l => StructField(s"hits_$l", LongType, nullable = false)))

  // (markerBytes, langIndex) pairs — "la" is deliberately in BOTH fr and
  // es, so it appears twice with different indexes
  private val markers: Array[(Array[Byte], Int)] = {
    val m = Map(
      "de" -> Seq("der", "die", "und", "ist", "das"),
      "en" -> Seq("the", "and", "is", "of", "to"),
      "fr" -> Seq("le", "la", "et", "est", "les"),
      "es" -> Seq("el", "la", "es", "los", "una"))
    (for {
      (lang, words) <- m.toSeq
      w <- words
    } yield (w.getBytes("UTF-8"), langs.indexOf(lang))).toArray
  }
  private val maxMarkerLen = markers.map(_._1.length).max

  @inline private def lowerAscii(b: Byte): Byte =
    if (b >= 'A' && b <= 'Z') (b + 32).toByte else b

  /** Add every language whose marker set contains in[lo, lo+len) (ASCII
    * -lowered) to `hits`. */
  private def countToken(in: Array[Byte], lo: Int, len: Int,
                         hits: Array[Long]): Unit = {
    if (len < 2 || len > maxMarkerLen) return
    var m = 0
    while (m < markers.length) {
      val (w, lang) = markers(m)
      if (w.length == len) {
        var k = 0
        while (k < len && w(k) == lowerAscii(in(lo + k))) k += 1
        if (k == len) hits(lang) += 1
      }
      m += 1
    }
  }

  def compute(s: UTF8String): InternalRow = {
    import TextScan._
    val in = s.getBytes
    val (lo, hi) = trimBounds(in)
    val hits = new Array[Long](langs.length)
    var i = lo
    while (i < hi) {
      // skip a whitespace run, then scan one token
      while (i < hi && isWs6(in(i))) i += 1
      val tokLo = i
      while (i < hi && !isWs6(in(i))) i += 1
      if (i > tokLo) countToken(in, tokLo, i - tokLo, hits)
    }
    new GenericInternalRow(Array[Any](hits(0), hits(1), hits(2), hits(3)))
  }
}
