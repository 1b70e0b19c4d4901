package graft.ner

import scala.collection.mutable
import graft.model.Ontology

/** The three model-ensemble methods (reference A6–A8), ported from
  * `multi_labeling` (EnsemblePredict_all.py:226-395; identical copies in
  * multi_ner_prediction.py:437-568 and app_multi.py:170-253).
  *
  * All row-local: one sentence per call, arrays only — in Spark these run
  * inside a single narrow `mapPartitions` stage, no shuffle (SURVEY.md §2.5's
  * key observation: cross-row dependencies exist only at joins on `ind`).
  */
object Ensembles {

  /** Result bundle mirroring the pred_dict keys the reference adds:
    * ensemble_votes / ensemble_union / ensemble_strong (+ boundary, models,
    * types for the strong method).
    */
  final case class EnsembleResult(
      votes: Array[(String, Double)],
      union: Array[(String, Double)],
      strong: Array[(String, Double)],
      boundaries: Seq[(Int, Int)],
      models: Seq[Seq[String]],
      types: Seq[String]
  )

  /** @param predDict model code → per-char (BIO tag, prob); must contain "a"
    *                 (the base model, per EnsemblePredict_all.py:252).
    * @param weights  model → type → vote weight (multi_ner_prediction.py:139-159
    *                 normalization: per type, weight = strict_precision /
    *                 Σ strict_precision, so Σ_models weights(m)(t) = 1).
    * @param modelOrder iteration order over models (the reference iterates a
    *                 Python dict; we pin kd,a,c,d for determinism).
    */
  def run(
      predDict: Map[String, Array[(String, Double)]],
      weights: Map[String, Map[String, Double]],
      modelOrder: Seq[String] = Ontology.models
  ): EnsembleResult = {
    val base = predDict("a")
    val n = base.length
    val types = Ontology.essentialTypes
    val models = modelOrder.filter(predDict.contains)

    // ---- A6: weighted per-char vote (交集集成, :252-284) ----
    val probIntersect = base.map(_._2)
    val voteScores = Array.fill(n)(mutable.LinkedHashMap.empty[String, Double])
    for (m <- models; i <- 0 until n) {
      val (label, lprob) = predDict(m)(i)
      if (label != "O") {
        val etype = label.split("-")(1)
        if (types.contains(etype)) {
          val row = voteScores(i)
          row.update(etype, row.getOrElse(etype, 0.0) + weights(m)(etype))
          probIntersect(i) = math.min(probIntersect(i), lprob)
        }
      }
    }
    val voteFinal = voteScores.map { row =>
      if (row.isEmpty) "O"
      else {
        // res["O"] = 1 - sum; argmax over insertion order, first max wins
        // (EnsemblePredict_all.py:276-284)
        val withO = row.toSeq :+ ("O" -> (1.0 - row.values.sum))
        val (maxKey, maxVal) = withO.maxBy(_._2)
        if (maxKey != "O" && maxVal >= 0.2) maxKey else "O"
      }
    }
    val votesBio = Bio.toBio(voteFinal.toSeq).toArray
    val votes = votesBio.zip(probIntersect)

    // ---- A7: char-wise union, base model wins conflicts (:289-317) ----
    val unionTypes = base.map { case (l, _) =>
      if (l == "O") "O" else l.split("-")(1)
    }
    val probUnion = base.map(_._2)
    for (m <- models; i <- 0 until n) {
      val (label, lprob) = predDict(m)(i)
      if (label != "O") {
        val etype = label.split("-")(1)
        if (etype != unionTypes(i) && unionTypes(i) == "O") {
          probUnion(i) = math.max(probUnion(i), lprob)
          unionTypes(i) = etype
        }
      }
    }
    val unionBio = Bio.toBio(unionTypes.toSeq).toArray
    val union = unionBio.zip(probUnion)

    // ---- A8: majority vote over union spans (ensemble_strong, :321-395) ----
    val (cTypes, positions, _) = Bio.getPositions(union.toSeq)
    val probCombined = base.map(_._2)
    val frequencyCounts =
      mutable.LinkedHashMap.empty[Int, mutable.ArrayBuffer[String]]
    for (m <- models; i <- 0 until n) {
      val (label, lprob) = predDict(m)(i)
      if (label != "O") {
        probCombined(i) = math.max(probCombined(i), lprob)
        val ci = Bio.wordIndex(positions, i)
        if (ci >= 0)
          frequencyCounts.getOrElseUpdate(ci, mutable.ArrayBuffer.empty) += m
      }
    }
    val kept = frequencyCounts.toSeq.filter(_._2.distinct.size >= 2)
    val boundaries = kept.map { case (ci, _) => positions(ci) }
    val keptModels = kept.map { case (_, ms) => ms.distinct.sorted.toSeq }
    val keptTypes = kept.map { case (ci, _) => cTypes(ci) }
    val strongBio =
      Bio.fromSpans(n, boundaries.zip(keptTypes)).toArray
    val strong = strongBio.zip(probCombined)

    EnsembleResult(votes, union, strong, boundaries, keptModels, keptTypes)
  }
}
