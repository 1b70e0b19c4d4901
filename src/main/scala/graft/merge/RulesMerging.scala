package graft.merge

import graft.model.{EntityRow, Token}

/** Rule-merged-entity confidence + exclusion (reference A10 + P12), port of
  * clean_and_save.py:622-707.
  *
  * Per sentence: build a per-char probability sequence (ensemble prob_strict
  * assigned over mention spans, then max-ed with dictionary probs), then for
  * every merged token not already emitted as a dict/ensemble entity and not
  * tagged "x", confidence = min(Σ charProbs / divisor + 0.5, 0.98).
  *
  * Replicated quirks:
  *   - the divisor is `span + 1` where `span` is the LAST char index of the
  *     range (clean_and_save.py:681-687) — i.e. the span END OFFSET, not the
  *     span length;
  *   - if token spans overflow the sentence (the combiners' pos-1 wraparound)
  *     the seg is re-tiled from word lengths; if still overflowing, the whole
  *     sentence is skipped (:662-673);
  *   - exclusion (:694-707) drops by `ind`: ONE bad merged entity (bad
  *     first/last/mid char) discards ALL merged entities of the sentence.
  */
object RulesMerging {

  final val SufChars = "&和的,」)(1后中前未不-且有性由人:：".toSet
  final val PreChars = "&和的,」)(未其均-已".toSet
  final val MidChars = ",】【><：:。".toSet

  /** One mention span contributing to the per-char prob sequence. */
  final case class SpanProb(entName: String, start: Int, end: Int, prob: Double)

  def entityRows(
      ind: Long,
      sentence: String,
      seg0: Seq[Token],
      ensembleRows: Seq[SpanProb],
      dictRows: Seq[SpanProb]
  ): Seq[EntityRow] = {
    val n = sentence.length
    val probSeq = new Array[Double](n)
    ensembleRows.foreach { r =>
      var i = math.max(r.start, 0)
      while (i < math.min(r.end, n)) { probSeq(i) = r.prob; i += 1 }
    }
    dictRows.foreach { r =>
      var i = math.max(r.start, 0)
      while (i < math.min(r.end, n)) {
        probSeq(i) = math.max(probSeq(i), r.prob); i += 1
      }
    }
    val previous: Set[String] =
      (dictRows.map(_.entName) ++ ensembleRows.map(_.entName)).toSet

    var seg = seg0
    if (seg.nonEmpty && seg.map(_.end).max > n) {
      // re-tile from word lengths (clean_and_save.py:666-671)
      var begins = 0
      seg = seg.map { t =>
        val ends = begins + t.word.length
        val out = t.copy(start = begins, end = ends)
        begins = ends
        out
      }
    }
    if (seg.nonEmpty && seg.map(_.end).max > n) return Seq.empty

    var lastSpan = -1 // carries across tokens like the Python loop variable
    val rows = seg.flatMap { t =>
      if (previous.contains(t.word) || t.tag == "x") None
      else {
        var probsSum = 0.0
        var i = t.start
        while (i < t.end) { probsSum += probSeq(i); lastSpan = i; i += 1 }
        val divisor = lastSpan + 1
        val prob =
          if (divisor <= 0) 0.98
          else math.min(probsSum / divisor + 0.5, 0.98)
        Some(EntityRow(ind, "rules_merging", t.word, t.tag, t.start, t.end,
          prob, prob, prob, prob))
      }
    }
    // P12 exclusion: one bad entity poisons the sentence (:694-707)
    val bad = rows.exists { r =>
      val x = r.entName
      x.nonEmpty && (SufChars.contains(x.last) || PreChars.contains(x.head) ||
        x.exists(MidChars.contains))
    }
    if (bad) Seq.empty else rows
  }
}
