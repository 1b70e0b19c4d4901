package graft.corpus

import graft.model.Ontology
import graft.util.Hashing

/** Deterministic model-weight and evaluation-matrix fixtures (FIXTURES.md §2)
  * standing in for the reference's trained-model artifacts:
  *
  *  - `modelWeights`: model → type → vote weight, normalized per type so
  *    Σ_models w(m)(t) = 1, exactly the normalization of
  *    multi_ner_prediction.py:139-159 (weight = strict_precision / Σ);
  *  - `evalMatrix`: dataset-source → model → type → [strict, partial, exact,
  *    type] precision values (EnsemblePredict_all.py:461-462, 526-529).
  *
  * Values are hashed into plausible precision ranges — deterministic, no
  * files, no RNG.
  */
object Fixtures {

  /** Pseudo strict-precision in [0.70, 0.95). */
  def strictPrecision(model: String, tpe: String): Double =
    0.70 + Hashing.unit("sp", model, tpe) * 0.25

  val modelWeights: Map[String, Map[String, Double]] = {
    val types = Ontology.essentialTypes.toSeq.sorted
    val raw = Ontology.models.map { m =>
      m -> types.map(t => t -> strictPrecision(m, t)).toMap
    }.toMap
    types.flatMap { t =>
      val total = Ontology.models.map(m => raw(m)(t)).sum
      Ontology.models.map(m => (m, t, raw(m)(t) / total))
    }.groupBy(_._1)
      .map { case (m, xs) => m -> xs.map(x => x._2 -> x._3).toMap }
  }

  /** Metric k in [0.60, 0.97); strict ≤ partial (partial match is easier). */
  def metric(source: String, model: String, tpe: String, k: Int): Double =
    0.60 + Hashing.unit("ev", source, model, tpe, k.toString) * 0.37

  val sources: Seq[String] = Seq("m", "c", "d", "kd")

  val evalMatrix: Map[String, Map[String, Map[String, Array[Double]]]] =
    sources.map { s =>
      s -> Ontology.models.map { m =>
        m -> Ontology.essentialTypes.toSeq.sorted.map { t =>
          t -> Array.tabulate(4)(k => metric(s, m, t, k))
        }.toMap
      }.toMap
    }.toMap

  /** Synthetic drug-instruction rows for the group-taboo path
    * (pre_labeling.py:313-376): (product, womanText, childrenText,
    * agednessText). Some cells deterministically empty to exercise the
    * nan-handling quirks.
    */
  final case class DrugInstr(
      product: String,
      woman: String,
      children: String,
      agedness: String
  )

  private val tabooPhrases = Vector(
    "孕妇禁用", "孕妇慎用", "妊娠期不宜使用", "孕妇使用需调整剂量并注意监测",
    "儿童禁止使用", "小儿酌情减量", "新生儿忌用", "儿童用药易发不良反应",
    "老人慎用", "老年患者减少剂量", "高龄者禁用", "老人用药请遵医嘱指导"
  )

  def drugInstructions(n: Int): Seq[DrugInstr] =
    (0 until n).map { i =>
      val drug = Vocab.drugs(i % Vocab.drugs.length)
      def cell(col: String): String =
        if (Hashing.unit("cell", col, i.toString) < 0.25) "" // nan analog
        else tabooPhrases(
          ((Hashing.fnv1a64("ph" + col + i) & Long.MaxValue) %
            tabooPhrases.length).toInt)
      DrugInstr(drug, cell("w"), cell("c"), cell("a"))
    }
}
