package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.Ontology

/** Pins the exact type→ontology-id pairs to the reference's
  * config.yaml:100-114 `ontology_mapping` — these ids are output format
  * (source_segment.head_onto_id, ner_result.onto_id), so a silent drift here
  * changes the emitted KG.
  */
class OntologySpec extends AnyFunSuite {

  test("ontologyMapping matches config.yaml:100-114 exactly") {
    val expected = Map(
      "DIS" -> "omahaT018",
      "SYM" -> "omahaT001",
      "BFL" -> "omahaT005",
      "DEG" -> "omahaT028",
      "FW" -> "omahaT044",
      "TES" -> "omahaT065",
      "ORG" -> "omahaT010",
      "OGN" -> "omahaT011",
      "SUR" -> "omahaT002",
      "MAT" -> "omahaT033",
      "DRU" -> "omahaT004",
      "OBJ" -> "omahaT005",
      "DUR" -> "omahaT054",
      "EQM" -> "omahaT033"
    )
    assert(Ontology.ontologyMapping == expected)
  }

  test("every essential type has an ontology id") {
    Ontology.essentialTypes.foreach { t =>
      assert(Ontology.ontologyMapping.contains(t), s"missing onto id for $t")
    }
  }
}
