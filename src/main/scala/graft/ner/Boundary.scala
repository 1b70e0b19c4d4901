package graft.ner

/** Boundary punctuation stripping (reference P9).
  *
  * Port of `head_process` (clean_and_save.py:358-384) and its driver loop
  * (clean_and_save.py:534-544): for each symbol in a fixed list, strip ONE
  * occurrence off the head or tail of the mention; the whole symbol sweep is
  * run exactly 3 times, followed by 2 extra sweeps for '-' alone. The fixed
  * pass count (not a fixpoint) is replicated deliberately for parity.
  */
object Boundary {

  /** clean_and_save.py:535 symbol list. */
  val symbols: Seq[Char] = ",，：:、【】[]-.。&*！=".toSeq

  /** One `head_process` application for one symbol: strips at most one char
    * (head preferred over tail), empties results shorter than 2 chars.
    * Returns (word, start, end).
    */
  def headProcess(
      char: Char,
      e: String,
      s: Int,
      f: Int
  ): (String, Int, Int) = {
    if (e.isEmpty) return (e, s, f)
    if (e.head == char || e.last == char) {
      val (e2, s2, f2) =
        if (e.head == char) (e.drop(1), s + 1, f)
        else (e.dropRight(1), s, f - 1)
      if (e2.length >= 2) (e2, s2, f2) else ("", s2, f2)
    } else (e, s, f)
  }

  /** The full 3+2-pass sweep of clean_and_save.py:536-544. */
  def strip(word: String, start: Int, end: Int): (String, Int, Int) = {
    var cur = (word, start, end)
    var pass = 0
    while (pass < 3) {
      symbols.foreach { sym =>
        cur = headProcess(sym, cur._1, cur._2, cur._3)
      }
      pass += 1
    }
    cur = headProcess('-', cur._1, cur._2, cur._3)
    cur = headProcess('-', cur._1, cur._2, cur._3)
    cur
  }
}
