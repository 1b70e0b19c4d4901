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
  ): Seq[EntityRow] = {
    val (xTypes, xPositions, _) = Bio.getPositions(tagged)
    val probs = tagged.map(_._2)
    val isEnsemble = modelKey.contains("ensemble")
    xPositions.zip(xTypes).flatMap { case ((s, e), tpe) =>
      if (!Ontology.essentialTypes.contains(tpe)) None
      else {
        val slice = probs.slice(s, e)
        val mean = if (slice.isEmpty) 0.0 else slice.sum / slice.size
        val ps =
          if (!isEnsemble) {
            val m = dsEval(modelKey)(tpe)
            Array(mean * m(0), mean * m(1), mean * m(2), mean * m(3))
          } else {
            val voters = spanModels.getOrElse((s, e), Seq.empty)
            if (voters.isEmpty) Array(mean, mean, mean, mean)
            else {
              val cs = Array.tabulate(4) { k =>
                voters.map(v => dsEval(v)(tpe)(k))
              }
              Array.tabulate(4) { k =>
                val mx = cs(k).max
                mean * (mx + (1 - mx) * voters.size.toDouble / (2.0 * numModels))
              }
            }
          }
        val word = sentence.substring(s, math.min(e, sentence.length))
        Some(EntityRow(ind, modelKey, word, tpe, s, e, ps(0), ps(1), ps(2), ps(3)))
      }
    }
  }
}
