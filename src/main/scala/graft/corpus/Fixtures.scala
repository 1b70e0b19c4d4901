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

  /** Gold-labeled sentence for model evaluation: text + known entity spans
    * recorded at construction time.
    */
  final case class GoldSpan(word: String, tpe: String, start: Int, end: Int)
  final case class LabeledSentence(sentence: String, gold: Seq[GoldSpan])

  /** Deterministic labeled eval corpus — the synthetic analog of the
    * reference's held-out labeled data that multi_ner_prediction.py scores
    * models against. Five entity-bearing templates (mirroring
    * Corpus.sentence's shapes) covering all 10 essential types; gold offsets
    * are recorded while the string is assembled, so they are correct by
    * construction.
    */
  def labeledSentences(source: String, n: Int): Seq[LabeledSentence] =
    (0 until n).map { i =>
      val key = s"eval|$source|$i"
      def pk(table: Vector[String], tag: String): String =
        Vocab.pick(table, key, tag)
      val b = new StringBuilder
      val gold = Seq.newBuilder[GoldSpan]
      def lit(s: String): Unit = b ++= s
      def ent(w: String, t: String): Unit = {
        gold += GoldSpan(w, t, b.length, b.length + w.length)
        b ++= w
      }
      ((Hashing.fnv1a64(key + "|tpl") & Long.MaxValue) % 5).toInt match {
        case 0 =>
          lit("患者常见"); ent(pk(Vocab.symptoms, "s1"), "SYM")
          lit("及"); ent(pk(Vocab.symptoms, "s2"), "SYM")
          lit("，伴"); ent(pk(Vocab.symptoms, "s3"), "SYM"); lit("。")
        case 1 =>
          ent(pk(Vocab.diseases, "d1"), "DIS")
          lit("多由"); ent(pk(Vocab.organisms, "g1"), "OGN")
          lit("感染引起，可累及"); ent(pk(Vocab.organs, "o1"), "ORG"); lit("。")
        case 2 =>
          lit("建议行"); ent(pk(Vocab.tests, "t1"), "TES")
          lit("，必要时行"); ent(pk(Vocab.surgeries, "u1"), "SUR"); lit("。")
        case 3 =>
          lit("可给予"); ent(pk(Vocab.drugs, "r1"), "DRU")
          lit("治疗，慎用"); ent(pk(Vocab.drugs, "r2"), "DRU"); lit("。")
        case _ =>
          lit("术中使用"); ent(pk(Vocab.equipment, "e1"), "EQM")
          lit("，以"); ent(pk(Vocab.objects, "b1"), "OBJ")
          lit("消毒，留取"); ent(pk(Vocab.fluids, "f1"), "BFL"); lit("送检。")
      }
      LabeledSentence(b.toString, gold.result())
    }

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
