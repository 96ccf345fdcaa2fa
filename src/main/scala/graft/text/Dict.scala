package graft.text

import graft.series.Series
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** User-visible dictionary codes for string columns — cs_str2code /
  * cs_code2str (imcs.c:5769-5812). The reference dictionary-encodes every
  * varchar column into int16/int32 codes in one shared dictionary bounded
  * at 64 KB for small codes (imcs.h:35 IMCS_SMALL_DICTIONARY).
  *
  * Spark/Parquet dictionary-encode storage automatically; this exists for
  * the cases where codes must be user-visible (joins on code, compact
  * shuffles of high-frequency strings). Codes are the 0-based rank of the
  * sorted distinct values — deterministic and reproducible by any engine
  * (dense_rank over distinct), unlike insertion-order codes.
  *
  * Scale shape: `distinct` is one shuffle over the value column; the
  * dictionary itself is assumed small relative to the data (the same
  * assumption the reference makes), so the code-assignment sort runs on
  * dictionary-sized data via the ranged numbering in Series, and lookups
  * broadcast.
  */
object Dict {

  /** Build the dictionary: (code: long, value) with code = sorted rank. */
  def build(df: DataFrame, value: String): DataFrame =
    Series.attachPosRanged(
      df.select(col(value)).distinct(), Seq(), Seq(col(value)), out = "code")
      .select(col("code"), col(value))

  /** cs_str2code: attach `outCol` with the dictionary code of `value`.
    * The dictionary side is broadcast — a map-side hash lookup, no shuffle
    * of the data table.
    */
  def str2code(df: DataFrame, dict: DataFrame, value: String,
               outCol: String = "code"): DataFrame =
    df.join(broadcast(dict.withColumnRenamed("code", outCol)), Seq(value), "left")

  /** cs_code2str: resolve `codeCol` back to the string value. */
  def code2str(df: DataFrame, dict: DataFrame, codeCol: String,
               outCol: String = "value"): DataFrame = {
    val d = dict.select(col("code").as(codeCol),
      dict.columns.filter(_ != "code").map(col).head.as(outCol))
    df.join(broadcast(d), Seq(codeCol), "left")
  }
}
