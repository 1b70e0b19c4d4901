package graft.ner

import graft.dict.Trie
import graft.model.Ontology
import graft.util.Hashing

/** Deterministic CRF-style sequence scorer — the Spark-side replacement for
  * the reference's per-model BiLSTM-CRF inference (multi_source_ner.py:803-844
  * `predict_oneline`; the torch nets themselves are absent from the snapshot,
  * see SURVEY.md "Missing from the snapshot").
  *
  * What is preserved from the reference, semantically:
  *   - output shape: per-char (BIO tag, prob) sequences over the essential
  *     ontology types, consumed verbatim by the ensemble stages
  *     (EnsemblePredict_all.py:226-395);
  *   - a real Viterbi decode over B-/I-/O label lattices with I-after-B
  *     transition constraints (CRF-style, per the north star);
  *   - the reference's custom probability squashing
  *     `1 / (1 + 10 / (x-2)^2)` (multi_source_ner.py:109-110);
  *   - k=4 models ("kd","a","c","d", config.yaml:48-49) that agree on most
  *     mentions but individually miss or mis-bound some — which is what makes
  *     the union/vote/majority ensembles non-trivial.
  *
  * What replaces the learned net: emissions are hashed-feature linear scores —
  * dictionary-evidence features (a broadcast trie hit of type T boosts B-T at
  * the hit start and I-T inside it) plus per-(model, char, label) hashed
  * weights. Per-(model, mention-occurrence) hashes drive deterministic
  * dropout (model misses the mention) and boundary jitter (model extends the
  * span one char), standing in for inter-model variance. Everything is a pure
  * function of (model, sentence) — no RNG, no wall-clock.
  */
final class CrfScorer(
    val model: String,
    trie: Trie,
    missPct: Int,
    jitterPct: Int
) extends Serializable {
  import CrfScorer._

  /** Per-char (BIO label, prob) for one sentence. */
  def predict(sentence: String): Array[(String, Double)] = {
    val n = sentence.length
    if (n == 0) return Array.empty
    // 1. dictionary evidence: maximal essential-type matches at every start
    val evidence = Array.fill(n)(Array.fill(NumLabels)(0.0))
    var i = 0
    while (i < n) {
      val m = trie.longestMatch(sentence, i)
      if (m != null) {
        val (end, tag) = m
        val tpe = Ontology.jiebaReverse.getOrElse(tag, "x")
        if (Ontology.essentialTypes.contains(tpe) && end - i >= 2) {
          val word = sentence.substring(i, end)
          val h = Hashing.fnv1a64(model, "|", word, "|", i.toString, "|", sentence)
          val roll = (h & Long.MaxValue) % 100
          if (roll >= missPct) {
            // boundary jitter: extend span end by one char
            val e2 =
              if (roll < missPct + jitterPct && end < n) end + 1 else end
            val affinity =
              2.0 + Hashing.unit(model, "#aff#", tpe) * 1.5
            val bIdx = labelIndex("B-" + tpe)
            val iIdx = labelIndex("I-" + tpe)
            evidence(i)(bIdx) += DictBoost + affinity
            var j = i + 1
            while (j < e2) { evidence(j)(iIdx) += DictBoost + affinity; j += 1 }
          }
        }
      }
      i += 1
    }
    // 2. emissions = evidence + small hashed per-(model,char,label) weights
    val emit = Array.ofDim[Double](n, NumLabels)
    i = 0
    while (i < n) {
      val c = sentence.charAt(i).toString
      var l = 0
      while (l < NumLabels) {
        emit(i)(l) = evidence(i)(l) +
          (Hashing.unit(model, "#w#", c, "#", l.toString) - 0.5) * 0.4
        l += 1
      }
      // O gets a steady positive bias so unevidenced chars decode to O
      emit(i)(0) += 1.0
      i += 1
    }
    // 3. Viterbi with BIO transition constraints
    val path = viterbi(emit)
    // 4. per-char probability via the reference's squash of the emission score
    val out = new Array[(String, Double)](n)
    i = 0
    while (i < n) {
      val l = path(i)
      val p =
        if (l == 0) refSigmoid(2.0 + emit(i)(0))
        else refSigmoid(2.0 + emit(i)(l))
      out(i) = (Labels(l), math.min(p, 0.99))
      i += 1
    }
    out
  }
}

object CrfScorer {
  /** Label lattice: O, then B-T/I-T per essential type in fixed order. */
  val Types: IndexedSeq[String] = Ontology.essential.keys.toIndexedSeq.sorted
  val Labels: IndexedSeq[String] =
    "O" +: Types.flatMap(t => Seq(s"B-$t", s"I-$t"))
  val NumLabels: Int = Labels.length
  private val labelIdx: Map[String, Int] = Labels.zipWithIndex.toMap
  def labelIndex(l: String): Int = labelIdx(l)

  final val DictBoost = 6.0
  private final val NegInf = -1e18

  /** Reference probability squash (multi_source_ner.py:109-110):
    * 1 / (1 + 10/(x-2)^2). Monotone for x > 2; 0 at x = 2.
    */
  def refSigmoid(x: Double): Double = {
    val d = x - 2.0
    if (d <= 0) 0.0 else 1.0 / (1.0 + 10.0 / (d * d))
  }

  /** Transition score; I-T reachable only from B-T / I-T. */
  private def trans(from: Int, to: Int): Double = {
    val toL = Labels(to)
    if (toL.startsWith("I-")) {
      val fromL = Labels(from)
      val t = toL.substring(2)
      if ((fromL.startsWith("B-") || fromL.startsWith("I-")) &&
        fromL.substring(2) == t) 0.2
      else NegInf
    } else 0.0
  }

  def viterbi(emit: Array[Array[Double]]): Array[Int] = {
    val n = emit.length
    val dp = Array.ofDim[Double](n, NumLabels)
    val bp = Array.ofDim[Int](n, NumLabels)
    var l = 0
    while (l < NumLabels) {
      dp(0)(l) = if (Labels(l).startsWith("I-")) NegInf else emit(0)(l)
      l = l + 1
    }
    var i = 1
    while (i < n) {
      var to = 0
      while (to < NumLabels) {
        var best = NegInf
        var bestFrom = 0
        var from = 0
        while (from < NumLabels) {
          val s = dp(i - 1)(from) + trans(from, to)
          if (s > best) { best = s; bestFrom = from }
          from += 1
        }
        dp(i)(to) = best + emit(i)(to)
        bp(i)(to) = bestFrom
        to += 1
      }
      i += 1
    }
    val path = new Array[Int](n)
    var bl = 0
    var bs = NegInf
    l = 0
    while (l < NumLabels) {
      if (dp(n - 1)(l) > bs) { bs = dp(n - 1)(l); bl = l }
      l += 1
    }
    path(n - 1) = bl
    i = n - 1
    while (i > 0) { path(i - 1) = bp(i)(path(i)); i -= 1 }
    path
  }

  /** The 4 production scorers with per-model miss/jitter rates (stand-in for
    * the 4 trained nets' differing recall; rates chosen so majority-vote ≥2
    * keeps ~all true mentions while single-model noise is filtered).
    */
  def productionScorers(trie: Trie): Seq[CrfScorer] = Seq(
    new CrfScorer("kd", trie, missPct = 10, jitterPct = 5),
    new CrfScorer("a", trie, missPct = 5, jitterPct = 3),
    new CrfScorer("c", trie, missPct = 15, jitterPct = 6),
    new CrfScorer("d", trie, missPct = 20, jitterPct = 8)
  )
}
