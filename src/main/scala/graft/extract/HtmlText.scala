package graft.extract

/** Pinned deterministic HTML → text extraction.
  *
  * The per-row invariant (BASELINE.json input_hint) is byte-identical `text`
  * per `url`, SHA-256-checked — so every rule here is frozen and the corpus
  * generator produces HTML that this function inverts exactly. Reference
  * analog: the OCR-txt ingestion at structurize_files.py:546-547 (the
  * reference reads pre-extracted text; web pages replace OCR per the north
  * rule, so the extractor is ours to pin).
  *
  * Rules (applied in order):
  *  1. drop <script>…</script> and <style>…</style> including content;
  *  2. <br> variants → newline;
  *  3. closing block tags (p, h1-h6, div, li, tr, td, table, ul, ol, title)
  *     and their openers → newline;
  *  4. all remaining tags stripped;
  *  5. entities decoded: &amp; &lt; &gt; &quot; &#39; &nbsp;
  *  6. lines trimmed (ASCII + ideographic space), empty lines dropped,
  *     joined with '\n'.
  */
object HtmlText {

  private val scriptStyle =
    "(?is)<(script|style)\\b[^>]*>.*?</\\1>".r
  private val brTag = "(?i)<br\\s*/?>".r
  private val blockTag =
    "(?i)</?(p|h[1-6]|div|li|tr|td|table|ul|ol|title|head|body|html)\\b[^>]*>".r
  private val anyTag = "<[^>]*>".r

  def decodeEntities(s: String): String =
    s.replace("&lt;", "<")
      .replace("&gt;", ">")
      .replace("&quot;", "\"")
      .replace("&#39;", "'")
      .replace("&nbsp;", " ")
      .replace("&amp;", "&")

  private def trimLine(s: String): String = {
    var a = 0
    var b = s.length
    def isSp(c: Char) = c == ' ' || c == '\t' || c == '\r' || c == '　'
    while (a < b && isSp(s.charAt(a))) a += 1
    while (b > a && isSp(s.charAt(b - 1))) b -= 1
    s.substring(a, b)
  }

  def extract(html: String): String = {
    var t = scriptStyle.replaceAllIn(html, "")
    t = brTag.replaceAllIn(t, "\n")
    t = blockTag.replaceAllIn(t, "\n")
    t = anyTag.replaceAllIn(t, "")
    t = decodeEntities(t)
    t.split('\n').iterator
      .map(trimLine)
      .filter(_.nonEmpty)
      .mkString("\n")
  }

  def extract(html: Array[Byte]): String =
    extract(new String(html, java.nio.charset.StandardCharsets.UTF_8))
}
