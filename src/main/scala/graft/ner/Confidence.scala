package graft.ner

import graft.model.{EntityRow, Ontology}

/** Per-mention confidence assignment (reference A9), port of the
  * post-processing block of EnsemblePredict_all.py:500-552.
  *
  * For every model sequence (the 4 scorers + ensemble_strong), mentions are
  * re-derived with [[Bio.getPositions]], the per-char probs inside the span
  * are averaged, and the average is scaled by the model's evaluation metrics:
  *
  *   single model (:526-529):  prob_k = mean × eval(ds)(model)(type)(k)
  *   ensemble     (:549-552):  prob_k = mean × (max(c_k) +
  *                                (1 − max(c_k)) · |models| / (2·M))
  *
  * where k ∈ {strict, partial, exact, type}, c_k are the metric values of the
  * models that voted for the span, and M is the total model count.
  */
object Confidence {

  type EvalMatrix = Map[String, Map[String, Array[Double]]]

  /** Mentions + confidences for one model's tagged sequence.
    *
    * @param dsEval   eval metrics for this dataset: model → type → [4]
    * @param spanModels for ensemble sequences: (start,end) → voting models
    */
  def entityRows(
      ind: Long,
      modelKey: String,
      tagged: Seq[(String, Double)],
      sentence: String,
      dsEval: Map[String, Map[String, Array[Double]]],
      numModels: Int,
      spanModels: Map[(Int, Int), Seq[String]] = Map.empty
  ): Seq[EntityRow] =
    entityRowsRaw(ind, modelKey, Tagged.fromPairs(tagged), sentence, dsEval,
      numModels, spanModels)

  /** Hot-path form over [[Tagged]]. */
  def entityRowsRaw(
      ind: Long,
      modelKey: String,
      tagged: Tagged,
      sentence: String,
      dsEval: Map[String, Map[String, Array[Double]]],
      numModels: Int,
      spanModels: Map[(Int, Int), Seq[String]] = Map.empty
  ): Seq[EntityRow] = {
    val (typeIdxs, spans) = BioRaw.getPositions(tagged.labels)
    val probs = tagged.probs
    val isEnsemble = modelKey.contains("ensemble")
    val out = Seq.newBuilder[EntityRow]
    var k = 0
    while (k < spans.length) {
      val s = BioRaw.spanStart(spans(k))
      val e = BioRaw.spanEnd(spans(k))
      val tpe = CrfScorer.Types(typeIdxs(k))
      // all scorer types are essential by construction; keep the reference's
      // membership guard for ensemble sequences fed from elsewhere
      if (Ontology.essentialTypes.contains(tpe)) {
        var sum = 0.0
        var i = s
        val e2 = math.min(e, probs.length)
        while (i < e2) { sum += probs(i); i += 1 }
        val mean = if (e2 > s) sum / (e2 - s) else 0.0
        val ps =
          if (!isEnsemble) {
            val m = dsEval(modelKey)(tpe)
            Array(mean * m(0), mean * m(1), mean * m(2), mean * m(3))
          } else {
            val voters = spanModels.getOrElse((s, e), Seq.empty)
            if (voters.isEmpty) Array(mean, mean, mean, mean)
            else {
              val cs = Array.tabulate(4) { j =>
                voters.map(v => dsEval(v)(tpe)(j))
              }
              Array.tabulate(4) { j =>
                val mx = cs(j).max
                mean * (mx + (1 - mx) * voters.size.toDouble / (2.0 * numModels))
              }
            }
          }
        val word = sentence.substring(math.min(s, sentence.length),
          math.min(e, sentence.length))
        out += EntityRow(ind, modelKey, word, tpe, s, e, ps(0), ps(1), ps(2), ps(3))
      }
      k += 1
    }
    out.result()
  }
}
