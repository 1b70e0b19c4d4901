package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.canon.FinalTables

class FinalTablesSpec extends AnyFunSuite {
  implicit lazy val spark: org.apache.spark.sql.SparkSession = SparkTestBase.spark

  lazy val arts = graft.pipeline.Pipeline.artifacts(
    graft.corpus.Corpus.pages(spark, 25, 4)).persist()

  test("source_segment: schema, souc_id when-chain, h%08d head ids per group") {
    val ss = FinalTables.sourceSegment(arts)
    assert(ss.columns.toSeq == Seq("souc_id", "text_id", "catalog",
      "text_label", "text_background", "head_onto_id", "text_content",
      "crte_time", "crter", "head_id"))
    val rows = ss.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val souc = r.getString(0)
      assert(souc.startsWith("TXTC") || souc.startsWith("TXTM"), souc)
      assert(r.getString(9).matches("h\\d{8}"), r.getString(9))
      assert(r.getString(5).startsWith("omahaT"))
    }
    // one head_id per (label, background, catalog, souc) group
    val perGroup = ss.groupBy("text_label", "text_background", "catalog",
      "souc_id").agg(countDistinct("head_id").as("n")).collect()
    assert(perGroup.forall(_.getLong(4) == 1L))
    // same head_id never spans two groups
    val perHead = ss.groupBy("head_id")
      .agg(countDistinct("text_label", "text_background", "catalog",
        "souc_id").as("n")).collect()
    assert(perHead.forall(_.getLong(1) == 1L))
  }

  test("ner_result: schema and coordinate sanity; deterministic entity ids") {
    val nr = FinalTables.nerResult(arts)
    assert(nr.columns.toSeq == Seq("entity_id", "ner_model_id", "text_id",
      "text_content", "onto_id", "entity_name", "entity_begn_coord",
      "entity_end_coord", "entity_conf", "crte_time", "crter"))
    val rows = nr.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(6) >= 0 && r.getInt(7) >= r.getInt(6))
      assert(r.getString(4).startsWith("omahaT"))
      assert(r.getDouble(8) >= 0.0 && r.getDouble(8) <= 1.0)
    }
    val again = FinalTables.nerResult(arts).collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq ==
      again.map(_.getLong(0)).sorted.toSeq)
  }

  test("ner_result joins source_segment on text_id (the triple join)") {
    val ss = FinalTables.sourceSegment(arts).select(col("text_id"),
      col("text_label"))
    val nr = FinalTables.nerResult(arts).select(col("text_id"),
      col("entity_name"))
    val joined = nr.join(ss, "text_id")
    assert(joined.count() == nr.count()) // every mention has lineage
  }

  test("metadata tables populated") {
    assert(FinalTables.modelInfo(spark).count() == 4)
    assert(FinalTables.modelEvalResults(spark).count() ==
      4L * 4 * graft.model.Ontology.essentialTypes.size)
  }
}
