package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ner.{ModelEval, MucEvaluator}
import graft.ner.MucEvaluator.Span

/** MUC evaluator scenario semantics + the data-derived eval matrix and
  * gen_weights normalization (multi_ner_prediction.py:139-159, 595-606).
  */
class ModelEvalSpec extends AnyFunSuite {

  // ---- MucEvaluator scenario table --------------------------------------

  test("exact offsets + same type → COR in all four schemes") {
    val c = MucEvaluator.evaluate(Seq(
      (Seq(Span("DIS", 0, 3)), Seq(Span("DIS", 0, 3)))))
    assert(c.precisions.toSeq == Seq(1.0, 1.0, 1.0, 1.0))
  }

  test("exact offsets + different type → exact/partial COR, strict/type INC") {
    val c = MucEvaluator.evaluate(Seq(
      (Seq(Span("DIS", 0, 3)), Seq(Span("SYM", 0, 3)))))
    // [strict, partial, exact, type]
    assert(c.precisions.toSeq == Seq(0.0, 1.0, 1.0, 0.0))
  }

  test("overlap + same type → type COR, partial 0.5, strict/exact INC") {
    val c = MucEvaluator.evaluate(Seq(
      (Seq(Span("DIS", 0, 4)), Seq(Span("DIS", 1, 5)))))
    assert(c.precisions.toSeq == Seq(0.0, 0.5, 0.0, 1.0))
  }

  test("no overlap → spurious + missed; empty denominators → 0") {
    val c = MucEvaluator.evaluate(Seq(
      (Seq(Span("DIS", 0, 3)), Seq(Span("DIS", 10, 13)))))
    assert(c.precisions.toSeq == Seq(0.0, 0.0, 0.0, 0.0))
    assert(c.mis(0) == 1 && c.spu(0) == 1)
    val empty = MucEvaluator.evaluate(Seq((Seq.empty, Seq.empty)))
    assert(empty.precisions.toSeq == Seq(0.0, 0.0, 0.0, 0.0))
  }

  test("each gold is consumed at most once (double-pred → one SPU path)") {
    val c = MucEvaluator.evaluate(Seq(
      (Seq(Span("DIS", 0, 3)),
        Seq(Span("DIS", 0, 3), Span("DIS", 0, 3)))))
    // second identical pred finds no unconsumed gold → no overlap → SPU
    assert(c.cor(0) == 1 && c.spu(0) == 1)
  }

  test("recall counts missed gold") {
    val c = MucEvaluator.evaluate(Seq(
      (Seq(Span("DIS", 0, 3), Span("SYM", 5, 8)), Seq(Span("DIS", 0, 3)))))
    assert(c.precision(0) == 1.0)
    assert(c.recall(0) == 0.5)
  }

  // ---- derived eval matrix ----------------------------------------------

  test("eval matrix shape: 4 sources × 4 models × 10 types × 4 metrics") {
    val em = ModelEval.evalMatrix
    assert(em.keySet == Set("m", "c", "d", "kd"))
    em.values.foreach { byModel =>
      assert(byModel.keySet == Set("kd", "a", "c", "d"))
      byModel.values.foreach { byType =>
        assert(byType.keySet == graft.model.Ontology.essentialTypes)
        byType.values.foreach(a => assert(a.length == 4))
      }
    }
  }

  test("metric sanity: all in [0,1], partial ≥ strict, exact ≥ strict") {
    for {
      byModel <- ModelEval.evalMatrix.values
      byType <- byModel.values
      a <- byType.values
    } {
      a.foreach(v => assert(v >= 0.0 && v <= 1.0))
      assert(a(1) >= a(0), s"partial ${a(1)} < strict ${a(0)}")
      assert(a(2) >= a(0), s"exact ${a(2)} < strict ${a(0)}")
    }
  }

  test("regression pins: derived values are stable") {
    def at(s: String, m: String, t: String) = ModelEval.evalMatrix(s)(m)(t)
    assert(math.abs(at("c", "a", "DIS")(0) - 0.941176) < 1e-6)
    assert(math.abs(at("c", "a", "DRU")(1) - 0.953846) < 1e-6)
    assert(math.abs(at("c", "c", "EQM")(0) - 0.826087) < 1e-6)
    // determinism: recompute equals the cached lazy val
    val again = ModelEval.evalFor("c")
    assert(again("a")("DIS").toSeq == at("c", "a", "DIS").toSeq)
  }

  test("gen_weights: per-type normalization sums to 1 across models") {
    val w = ModelEval.derivedWeights
    assert(w.keySet == Set("kd", "a", "c", "d"))
    ModelEval.types.foreach { t =>
      val total = w.values.map(_(t)).sum
      assert(math.abs(total - 1.0) < 1e-12, s"$t sums to $total")
    }
    assert(math.abs(w("a")("BFL") - 0.255102) < 1e-6)
  }

  test("zero-scoring type → equal weight split") {
    val eval = Map(
      "kd" -> Map("DIS" -> Array(0.0, 0.0, 0.0, 0.0)),
      "a" -> Map("DIS" -> Array(0.0, 0.0, 0.0, 0.0)),
      "c" -> Map("DIS" -> Array(0.0, 0.0, 0.0, 0.0)),
      "d" -> Map("DIS" -> Array(0.0, 0.0, 0.0, 0.0)))
    val w = ModelEval.weightsFromEval(eval)
    assert(w.values.forall(m => math.abs(m("DIS") - 0.25) < 1e-12))
  }

  test("retraining path: pipeline runs end-to-end on the DERIVED matrices") {
    val spark = SparkTestBase.spark
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val b = graft.pipeline.Pipeline.broadcasts(spark,
      ModelEval.derivedWeights, ModelEval.evalMatrix)
    val triples = graft.pipeline.Triples.fromArtifacts(
      graft.pipeline.Pipeline.artifacts(
        graft.corpus.Corpus.pages(spark, 15, 4), b)).collect()
    assert(triples.nonEmpty)
    triples.foreach(t => assert(t.prob >= 0.0 && t.prob <= 1.0))
  }

  test("labeled corpus: gold spans index the sentence exactly") {
    graft.corpus.Fixtures.labeledSentences("m", 50).foreach { ls =>
      ls.gold.foreach { g =>
        assert(ls.sentence.substring(g.start, g.end) == g.word)
      }
      assert(ls.gold.nonEmpty)
    }
  }
}
