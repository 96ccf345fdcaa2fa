package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for large-scale training-data pipelines: token counting,
  * quality scoring, language ID, fingerprinting. All pure Column
  * expressions (whole-stage codegen, no UDFs) so they run at full scan
  * speed over 100 TB of documents — each is a map-only operator with no
  * shuffle.
  */
object TextOps {

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column =
    size(split(trim(text), "\\s+")).cast("long")

  /** BPE-ish token estimate: words plus standalone punctuation/digit
    * runs, the usual cheap proxy for subword token counts.
    */
  def tokenCountRegex(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  /** Quality scoring signals (C4/Gopher-style cheap heuristics):
    * char length, word count, mean word length, punctuation ratio,
    * uppercase ratio, stopword ratio.
    */
  def qualitySignals(df: DataFrame, text: String): DataFrame = {
    val t = col(text)
    val nChars = length(t).cast("double")
    val words = split(trim(t), "\\s+")
    val nWords = size(words).cast("double")
    val stop = Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for")
    val lw = transform(words, w => lower(regexp_replace(w, "[^A-Za-z]", "")))
    val nStop = size(filter(lw, w => w.isInCollection(stop))).cast("double")
    df.withColumn("n_chars_c", nChars.cast("long"))
      .withColumn("n_words", nWords.cast("long"))
      .withColumn("mean_word_len",
        (nChars - (nWords - 1)) / nWords)
      .withColumn("punct_ratio",
        (nChars - length(regexp_replace(t, "[^A-Za-z0-9\\s]", ""))) / nChars)
      .withColumn("upper_ratio",
        (nChars - length(regexp_replace(t, "[A-Z]", ""))) / nChars)
      .withColumn("stopword_ratio", nStop / nWords)
  }

  /** Composite quality score in 0..10 points — monotone blend of the
    * signals (integer so it is exactly comparable across engines).
    */
  def qualityScore(df: DataFrame, text: String): DataFrame =
    qualitySignals(df, text).withColumn("quality_score",
      (when(col("n_words") >= 5, lit(4)).otherwise(lit(0)) +
        when(col("stopword_ratio") >= 0.1, lit(3)).otherwise(lit(0)) +
        when(col("punct_ratio") <= 0.2, lit(3)).otherwise(lit(0))).cast("int"))

  /** Language ID by stopword-hit counting (n-gram heuristic). Counts hits
    * of a tiny per-language marker-word list over the lowercased text and
    * returns the argmax language, "und" when nothing matches.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " is ", " of ", " to "),
    "de" -> Seq(" der ", " die ", " und ", " ist ", " das "),
    "fr" -> Seq(" le ", " la ", " et ", " est ", " les "),
    "es" -> Seq(" el ", " la ", " es ", " los ", " una "))

  /** Count non-overlapping occurrences of `pat` in `c` via length/replace —
    * stays in codegen (no UDF).
    */
  def countOccurrences(c: Column, pat: String): Column =
    ((length(c) - length(regexp_replace(c, java.util.regex.Pattern.quote(pat), ""))) /
      pat.length).cast("long")

  def langId(df: DataFrame, text: String, out: String = "lang_pred"): DataFrame = {
    // materialize the padded text ONCE: each of the 20 markers references
    // it twice (length + replace), and an inline alias would re-run
    // concat+lower 40× per row (CollapseProject keeps a multiply-referenced
    // non-trivial alias in its own projection)
    val withPad = df.withColumn("__padded", concat(lit(" "), lower(col(text)), lit(" ")))
    val padded = col("__padded")
    val scored = langMarkers.toSeq.sortBy(_._1).foldLeft(withPad) { case (d, (lang, ms)) =>
      d.withColumn(s"__hits_$lang",
        ms.map(m => countOccurrences(padded, m)).reduce(_ + _))
    }
    val langs = langMarkers.keys.toSeq.sorted
    val best = langs.foldLeft((lit("und"), lit(0L))) { case ((bl, bs), lang) =>
      val h = col(s"__hits_$lang")
      (when(h > bs, lit(lang)).otherwise(bl), when(h > bs, h).otherwise(bs))
    }
    scored.withColumn(out, best._1)
      .drop("__padded").drop(langs.map(l => s"__hits_$l"): _*)
  }

  /** Document fingerprint: 64-bit hash of the normalized text (lowercase,
    * punctuation and whitespace collapsed) — the reference's rolling-hash
    * fingerprint role. xxhash64 is Spark-native and codegen'd.
    *
    * ONE regex pass: any non-alphanumeric run → single space (collapsing
    * punctuation AND whitespace together), then trim+lower. Equivalent to
    * the two-pass punct-then-whitespace form but halves the regex cost —
    * this normalization runs once per document over the whole corpus, so it
    * dominates the exact-dedup scan.
    */
  def normalizedText(text: Column): Column =
    lower(trim(regexp_replace(text, "[^A-Za-z0-9]+", " ")))

  def fingerprint(text: Column): Column = xxhash64(normalizedText(text))

  /** Cross-engine-checkable fingerprint: md5 hex of the normalized text.
    * Same normalization pipeline as `fingerprint`; used where an external
    * oracle (DuckDB md5) must reproduce the value bit-for-bit. The xxhash64
    * variant stays the fast path (8-byte shuffle key vs 32-char string).
    */
  def fingerprintPortable(text: Column): Column = md5(normalizedText(text))

  /** Character shingles (n-grams) as a distinct set. Building block for
    * MinHash / Jaccard dedup.
    *
    * PERFORMANCE CONTRACT: `norm` must be a *materialized column* (e.g.
    * `withColumn("norm", normalizedText(col("text")))` first), not a raw
    * expression. The lambda references it per element; an inline
    * normalizedText expression would re-run its regexes once per shingle —
    * O(len²) per document.
    */
  def charShingles(norm: Column, n: Int): Column =
    array_distinct(
      filter(
        transform(sequence(lit(0), greatest(length(norm) - n, lit(0))),
          i => norm.substr(i + 1, lit(n))),
        s => length(s) === n))

  /** Word shingles (n-gram of tokens) joined by a space. Same contract:
    * `toks` must be a materialized array column (`split(norm, " ")`).
    */
  def wordShingles(toks: Column, n: Int): Column =
    array_distinct(
      filter(
        transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))),
        s => size(split(s, " ")) === n))
}
