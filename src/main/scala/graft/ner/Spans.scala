package graft.ner

import graft.model.Mention

/** Span-convention normalization (reference P7).
  *
  * The reference produces end-INCLUSIVE raw ner spans and end-EXCLUSIVE seg
  * spans, then patches the ner side late (generation.py:35-62). We apply the
  * same normalization once, at ingest, so every downstream span is [s, e).
  */
object Spans {

  /** Port of `lengthcleaner` (generation.py:35-41): if the span length is one
    * short of the word length, the span was end-inclusive — widen by one.
    * Spans already end-exclusive pass through unchanged.
    */
  def lengthClean(m: Mention): Mention =
    if (m.word.length == m.end - m.start) m
    else if (m.word.length == m.end + 1 - m.start) m.copy(end = m.end + 1)
    else m

  /** Port of `nerlencal` (generation.py:43-62): mentions containing the CJK
    * enumeration comma 、 are split into one mention per segment with
    * recomputed consecutive spans; others are length-cleaned.
    */
  def normalize(ner: Seq[Mention]): Seq[Mention] =
    ner.flatMap { m =>
      if (m.word.contains('、')) {
        // split with -1 keeps trailing empty segments, matching Python's
        // str.split which the reference relies on (generation.py:48)
        val parts = m.word.split("、", -1)
        var pos = m.start
        parts.toSeq.map { w =>
          val s = pos
          pos += w.length
          Mention(w, m.tpe, s, s + w.length, m.pmin, m.pmax)
        }
      } else Seq(lengthClean(m))
    }
}
