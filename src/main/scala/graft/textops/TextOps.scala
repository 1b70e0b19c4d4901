package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language-ID, quality scoring, token counting, fingerprinting. All are
  * narrow column expressions (codegen'd `functions._` where possible) — at
  * 100 TB these run inside the parquet scan stage with full column pruning.
  */
object TextOps {

  // ---- language ID: n-gram/charclass heuristic ----------------------------

  /** Tiny per-language stopword profiles (top function words). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "with"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "en", "un"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "est"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "mit", "den"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "个", "不")
  )

  /** Predict language: CJK-ratio shortcut then stopword-hit argmax.
    * Pure Scala (used via typed map); deterministic.
    */
  def langId(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    var cjk = 0
    var i = 0
    val n = math.min(text.length, 4000)
    while (i < n) {
      val c = text.charAt(i)
      if (c >= 0x4e00 && c <= 0x9fff) cjk += 1
      i += 1
    }
    if (cjk * 10 > n) return "zh"
    val tokens = text.toLowerCase.split("[^\\p{L}]+").iterator
      .take(2000).toArray
    val scores = stopwords.map { case (lang, sw) =>
      val set = sw.toSet
      lang -> tokens.count(set.contains)
    }
    val best = scores.maxBy { case (l, s) => (s, l) }
    if (best._2 == 0) "und" else best._1
  }

  // ---- quality scoring ----------------------------------------------------
  // (column-level quality features live in SparkEntry's tq_quality_cols,
  // the oracle-checked integer-div formulation)

  /** Scalar quality score in [0,1] (length, word-shape, alpha ratio) —
    * the composite the SQL oracle can't express; rows-only checked.
    */
  def qualityScore(text: String): Double = {
    if (text == null || text.isEmpty) return 0.0
    val n = text.length
    val words = text.split(" +")
    val meanWl = words.iterator.map(_.length).sum.toDouble / math.max(words.length, 1)
    val alpha = text.count(_.isLetter).toDouble / n
    val lenScore = math.min(n / 500.0, 1.0)
    val wlScore = if (meanWl >= 3 && meanWl <= 10) 1.0
      else math.max(0.0, 1.0 - math.abs(meanWl - 6.5) / 10.0)
    0.4 * lenScore + 0.3 * wlScore + 0.3 * alpha
  }

  // ---- token counting -----------------------------------------------------

  /** BPE-ish pre-tokenizer: letter runs, digit runs, single symbols — the
    * regex is RE2/Java-compatible so the DuckDB oracle matches exactly.
    */
  val bpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  def bpeTokenCount(text: Column): Column =
    size(call_function("regexp_extract_all", text, lit(bpeTokenPattern),
      lit(0)))

  // ---- fingerprinting -----------------------------------------------------

  /** Normalized content fingerprint: lowercase, whitespace-collapsed, md5 —
    * both engines produce identical bytes (md5 is md5).
    */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", " ")))

  /** 64-bit polynomial rolling hash of the normalized text (the non-SQL
    * fingerprint; used for cheap near-line dedup joins).
    */
  def rollingHash(text: String): Long = {
    if (text == null) return 0L
    var h = 1125899906842597L
    var i = 0
    var prevSpace = false
    while (i < text.length) {
      var c = text.charAt(i)
      if (c >= 'A' && c <= 'Z') c = (c + 32).toChar
      val isSpace = c == ' ' || c == '\t' || c == '\n' || c == '\r'
      if (!(isSpace && prevSpace)) {
        h = 31 * h + (if (isSpace) ' ' else c)
      }
      prevSpace = isSpace
      i += 1
    }
    h
  }
}
