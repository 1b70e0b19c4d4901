package graft.merge

import scala.collection.mutable
import graft.model.{Mention, Ontology, Token}

/** Rule-based entity merging (reference §2.2 P9-adjacent / §2.4 rounds):
  * faithful ports of `merge_nerseg`, `words_combiner`,
  * `words_combiner_fuzzy`, `suffix_combiner`, `round_1`, `round_2`
  * (clean_and_save.py:59-263).
  *
  * These are order-sensitive, first-match-only, and full of deliberate
  * quirks the tests pin down:
  *   - `is_a_in_x` returns only the FIRST occurrence (clean_and_save.py:59-62);
  *   - the tag/word snapshots are taken once per sentence, BEFORE any merge in
  *     the same sentence mutates the token dict (:74-78) — later candidate
  *     sequences still match against the stale snapshot;
  *   - merged-span start comes from the PREVIOUS token's end with Python's
  *     [-1] wraparound at pos=0 (:84), which can produce an out-of-range span
  *     later re-tiled by the confidence stage (:662-673);
  *   - `words_combiner` deletes only pos+1 even for 3-token sequences (the
  *     second `del j_dict[pos+1]` always raises and is swallowed, :95-103), so
  *     the 3rd token survives; `words_combiner_fuzzy` deletes pos+1 AND pos+2;
  *   - `suffix_combiner` re-inserts a previously deleted position, which moves
  *     it to the END of the insertion-ordered dict (:281-283) — token order
  *     can scramble; replicated via LinkedHashMap;
  *   - length guard `len(combined) >= 12` exists in the two words-combiners
  *     but NOT in suffix_combiner.
  *
  * All row-local: Spark runs these inside one narrow map stage.
  */
object Merge {

  /** First occurrence of `a` as a slice of `x` (clean_and_save.py:59-62). */
  def isAInX[T](a: Seq[T], x: Seq[T]): (Int, Boolean) = {
    var i = 0
    val last = x.length - a.length
    while (i <= last) {
      if (x.slice(i, i + a.length) == a) return (i, true)
      i += 1
    }
    (0, false)
  }

  private def rejected(combined: String, sentence: String): Boolean =
    combined.contains('、') || !sentence.contains(combined) ||
      combined.contains(',') || combined.contains(':')

  private def toDict(seg: Seq[Token]): mutable.LinkedHashMap[Int, Token] = {
    val d = mutable.LinkedHashMap.empty[Int, Token]
    seg.zipWithIndex.foreach { case (t, i) => d.put(i, t) }
    d
  }

  /** Python-wraparound previous-token end (clean_and_save.py:84). */
  private def prevEnd(seg: Seq[Token], pos: Int): Int =
    if (seg.isEmpty) 0
    else if (pos == 0) seg.last.end
    else seg(pos - 1).end

  /** `words_combiner` (clean_and_save.py:65-110). */
  def wordsCombiner(
      sentence: String,
      seg: Seq[Token],
      poSeries: Seq[Seq[String]]
  ): Seq[Token] = {
    val jDict = toDict(seg)
    val segs = seg.map(_.tag)
    val words = seg.map(_.word)
    poSeries.foreach { seq =>
      val (pos, contains) = isAInX(seq, segs)
      if (contains) {
        val start = prevEnd(seg, pos)
        val combined = words.slice(pos, pos + seq.length).mkString
        if (combined.length < 12 && !rejected(combined, sentence)) {
          jDict.put(pos, Token(combined, seq.last, start, start + combined.length))
          if (jDict.contains(pos + 1)) {
            jDict.remove(pos + 1)
            // 3-seq: reference tries `del j_dict[pos+1]` AGAIN (:99-103);
            // it always fails -> the 3rd token survives. No-op here.
          }
        }
      }
    }
    jDict.values.toSeq
  }

  /** `words_combiner_fuzzy` (clean_and_save.py:177-236): expands
    * (preType, centerType) into [pre, center] plus [pre, T, center] for every
    * uppercase tag T, then behaves like words_combiner but deletes BOTH
    * swallowed positions for 3-sequences.
    */
  def wordsCombinerFuzzy(
      sentence: String,
      seg: Seq[Token],
      preTypes: Seq[String],
      centerType: String
  ): Seq[Token] = {
    val poSeries = preTypes.flatMap { pt =>
      Seq(Seq(pt, centerType)) ++
        Ontology.fuzzyMiddleTags.map(t => Seq(pt, t, centerType))
    }
    val jDict = toDict(seg)
    val segs = seg.map(_.tag)
    val words = seg.map(_.word)
    poSeries.foreach { seq =>
      val (pos, contains) = isAInX(seq, segs)
      if (contains) {
        val start = prevEnd(seg, pos)
        val combined = words.slice(pos, pos + seq.length).mkString
        if (combined.length < 12 && !rejected(combined, sentence)) {
          jDict.put(pos, Token(combined, seq.last, start, start + combined.length))
          val had = jDict.contains(pos + 1)
          jDict.remove(pos + 1)
          // reference (:227-233): `del pos+1` inside try/continue — a KeyError
          // skips the pos+2 delete too
          if (had && seq.length == 3) jDict.remove(pos + 2)
        }
      }
    }
    jDict.values.toSeq
  }

  /** `suffix_combiner` (clean_and_save.py:266-296): a token of a desired type
    * directly followed by a suffix word merges into one token of
    * `suffixType`. No length guard; re-insertion of a deleted position moves
    * it to the end (LinkedHashMap semantics mirror the Python dict).
    */
  def suffixCombiner(
      sentence: String,
      seg: Seq[Token],
      suffix: Set[String],
      desired: Set[String],
      suffixType: String
  ): Seq[Token] = {
    val jDict = toDict(seg)
    val words = seg.map(_.word)
    var dt = 0
    while (dt < seg.length - 1) {
      val md = seg(dt)
      if (desired.contains(md.tag) && suffix.contains(seg(dt + 1).word)) {
        val start = prevEnd(seg, dt)
        val combined = words(dt) + words(dt + 1)
        if (!rejected(combined, sentence)) {
          jDict.put(dt, Token(combined, suffixType, start, start + combined.length))
          jDict.remove(dt + 1)
        }
      }
      dt += 1
    }
    jDict.values.toSeq
  }

  /** `merge_nerseg` (clean_and_save.py:113-174): overlay ensemble mentions
    * onto the gazetteer token sequence when the mention exactly spans a run
    * of ≥2 tokens (token-boundary aligned); dictionary wins when boundaries
    * are identical. Mentions containing enumeration/sentence punctuation are
    * skipped; mentions shorter than 3 chars are skipped.
    */
  def mergeNerSeg(
      seg: Seq[Token],
      ensemble: Seq[Mention]
  ): Seq[Token] = {
    val desired = Ontology.essentialTypes
    var segInfo = seg.toBuffer
    val candidatesSeg = seg.filter(t => desired.contains(t.tag))
    val candNer = ensemble.filter(m => desired.contains(m.tpe))
    candNer.foreach { ner =>
      val w = ner.word
      if (!(w.contains('、') || w.contains('；') || w.contains('，') ||
          w.contains(';'))) {
        val pos = (ner.start, ner.end)
        val segPositions = candidatesSeg.map(t => (t.start, t.end))
        if (!segPositions.contains(pos) && w.length > 2) {
          val seg0 = segInfo.map(_.start)
          val seg1 = segInfo.map(_.end)
          val m0 = seg0.indexOf(ner.start)
          val m1 = seg1.indexOf(ner.end)
          if (m0 >= 0 && m1 >= 0 && m0 != m1) {
            // reference pops range(merge_1+1, merge_0, -1) (:163-165): for the
            // pathological m1 < m0 the range is empty and it inserts anyway
            if (m1 > m0) segInfo.remove(m0, m1 - m0 + 1)
            segInfo.insert(m0, Token(w, ner.tpe, ner.start, ner.end))
          }
        }
      }
    }
    // tag uppercase-ing (clean_and_save.py:170-172): lowercase jieba tags →
    // ontology types; already-uppercase tags pass through
    segInfo.toSeq.map { t =>
      Ontology.jiebaReverse.get(t.tag) match {
        case Some(up) => t.copy(tag = up)
        case None     => t
      }
    }
  }

  /** `round_1` (clean_and_save.py:237-246). The reference computes two extra
    * fuzzy passes into pre_copy2/pre_copy3 whose results are DISCARDED
    * (:241-242) — the combiners are pure (they deep-copy), so we skip the
    * dead work.
    */
  def round1(sentence: String, seg: Seq[Token]): Seq[Token] = {
    var s = wordsCombinerFuzzy(sentence, seg,
      Seq("SYM", "ORG", "DIS", "BFL", "DEG", "OGN"), "DIS")
    s = wordsCombinerFuzzy(sentence, s,
      Seq("SYM", "ORG", "DIS", "BFL", "DEG", "OGN"), "SYM")
    s = wordsCombinerFuzzy(sentence, s,
      Seq("SYM", "ORG", "DIS", "OBJ", "DRU"), "SUR")
    s = wordsCombiner(sentence, s, Seq(
      Seq("SUR", "DRU"), Seq("ORG", "SUR"), Seq("DIS", "SUR"), Seq("TES", "SUR")))
    s = wordsCombiner(sentence, s, Seq(
      Seq("SUR", "SUR"), Seq("ORG", "SUR"), Seq("DIS", "SUR"), Seq("TES", "SUR")))
    s
  }

  /** `round_2` (clean_and_save.py:248-263). `suffixDict` is surface → TYPE. */
  def round2(
      sentence: String,
      seg: Seq[Token],
      suffixDict: Map[String, String]
  ): Seq[Token] = {
    def sufOf(t: String): Set[String] =
      suffixDict.collect { case (k, v) if v == t => k }.toSet
    var s = suffixCombiner(sentence, seg, sufOf("SYM"),
      Set("DIS", "SYM", "BFL", "ORG"), "SYM")
    s = suffixCombiner(sentence, s, sufOf("DIS"),
      Set("DIS", "SYM", "BFL", "ORG"), "DIS")
    s = suffixCombiner(sentence, s, sufOf("EQM"),
      Set("SUR", "TES", "BFL", "EQM"), "EQM")
    s = suffixCombiner(sentence, s, sufOf("TES"),
      Set("SUR", "TES", "ORG", "DIS", "SYM", "BFL"), "TES")
    s = suffixCombiner(sentence, s, sufOf("SUR"),
      Set("SUR", "TES", "ORG", "DIS", "SYM", "BFL"), "SUR")
    s = wordsCombiner(sentence, s, Seq(
      Seq("SUR", "SUR"), Seq("ORG", "SUR"), Seq("DIS", "SUR")))
    s = wordsCombinerFuzzy(sentence, s,
      Seq("ORG", "DIS", "DRU", "OBJ", "BFL"), "TES")
    s = wordsCombinerFuzzy(sentence, s,
      Seq("SYM", "ORG", "DIS", "OBJ", "DRU"), "SUR")
    s
  }
}
