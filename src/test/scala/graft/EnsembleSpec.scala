package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ner.Ensembles

class EnsembleSpec extends AnyFunSuite {

  // 4 equal-weight models over a 6-char sentence; weights normalized per type
  // (multi_ner_prediction.py:139-159 ⇒ Σ_models w(m)(t) = 1)
  val w: Map[String, Map[String, Double]] =
    Seq("kd", "a", "c", "d").map { m =>
      m -> Map("DIS" -> 0.25, "SYM" -> 0.25)
    }.toMap

  def seq(tags: String*): Array[(String, Double)] =
    tags.map(t => (t, 0.8)).toArray

  test("majority (ensemble_strong) keeps spans with >=2 distinct models (EnsemblePredict_all.py:362-366)") {
    val pred = Map(
      "a" -> seq("B-DIS", "I-DIS", "O", "O", "O", "O"),
      "kd" -> seq("B-DIS", "I-DIS", "O", "O", "B-SYM", "I-SYM"),
      "c" -> seq("O", "O", "O", "O", "O", "O"),
      "d" -> seq("O", "O", "O", "O", "O", "O")
    )
    val r = Ensembles.run(pred, w)
    // DIS span seen by a+kd → kept; SYM span only by kd → dropped
    assert(r.boundaries == Seq((0, 2)))
    assert(r.types == Seq("DIS"))
    assert(r.models == Seq(Seq("a", "kd")))
    assert(r.strong.map(_._1).toSeq ==
      Seq("B-DIS", "I-DIS", "O", "O", "O", "O"))
  }

  test("votes accept type iff weighted sum >= 0.2 (EnsemblePredict_all.py:277-284)") {
    // only one model (weight .25) tags char 0 → 0.25 >= 0.2 → accepted;
    // max-key including O = 1 - 0.25 = 0.75 → O wins! So char stays O.
    val pred = Map(
      "a" -> seq("B-DIS", "O"),
      "kd" -> seq("O", "O"),
      "c" -> seq("O", "O"),
      "d" -> seq("O", "O")
    )
    val r = Ensembles.run(pred, w)
    assert(r.votes.map(_._1).toSeq == Seq("O", "O"))
    // three models agree → 0.75 beats O's 0.25 → accepted
    val pred2 = Map(
      "a" -> seq("B-DIS", "O"),
      "kd" -> seq("B-DIS", "O"),
      "c" -> seq("B-DIS", "O"),
      "d" -> seq("O", "O")
    )
    val r2 = Ensembles.run(pred2, w)
    assert(r2.votes.map(_._1).head == "B-DIS")
  }

  test("union: base model a wins conflicts; others fill O gaps (:289-317)") {
    val pred = Map(
      "a" -> seq("B-DIS", "I-DIS", "O", "O"),
      "kd" -> seq("B-SYM", "I-SYM", "I-SYM", "O"), // conflicts on 0-1, fills 2
      "c" -> seq("O", "O", "O", "O"),
      "d" -> seq("O", "O", "O", "O")
    )
    val r = Ensembles.run(pred, w)
    assert(r.union.map(_._1).toSeq == Seq("B-DIS", "I-DIS", "B-SYM", "O"))
  }

  test("union probabilities: min for votes path, max when filling union gaps") {
    val pred = Map(
      "a" -> Array(("B-DIS", 0.9), ("O", 0.2)),
      "kd" -> Array(("B-DIS", 0.5), ("B-SYM", 0.7)),
      "c" -> Array(("O", 0.1), ("O", 0.1)),
      "d" -> Array(("O", 0.1), ("O", 0.1))
    )
    val r = Ensembles.run(pred, w)
    // votes prob = min over non-O models' probs seeded with a's (0.9 min 0.5)
    assert(r.votes(0)._2 == 0.5)
    // union char 1 filled by kd with max(0.2, 0.7)
    assert(r.union(1)._2 == 0.7)
  }
}
