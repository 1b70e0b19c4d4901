package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source
import graft.tools.FreezeGoldens

/** Golden end-to-end parity (SURVEY.md §5.3, north-rule gates):
  *   - triple set P/R vs the frozen fixture goldens (bar ≥ 0.95; fixture
  *     scale must achieve 1.0);
  *   - byte-identical extracted text per url (SHA-256).
  */
class GoldenSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  def golden(name: String): Seq[String] = {
    val src = Source.fromResource(s"goldens/$name")(scala.io.Codec.UTF8)
    try src.getLines().toList
    finally src.close()
  }

  test("triple set P/R = 1.0 vs frozen goldens (bar >= 0.95)") {
    val expected = golden("triples.golden.txt").toSet
    val actual = FreezeGoldens.tripleLines(spark).toSet
    val tp = actual.intersect(expected).size.toDouble
    val precision = if (actual.isEmpty) 0.0 else tp / actual.size
    val recall = if (expected.isEmpty) 0.0 else tp / expected.size
    assert(precision >= 0.95, f"precision $precision%.4f")
    assert(recall >= 0.95, f"recall $recall%.4f")
    // at fixture scale the match must be exact
    assert(precision == 1.0 && recall == 1.0,
      s"diff+${(actual -- expected).take(3)} -${(expected -- actual).take(3)}")
  }

  test("extracted text is byte-identical per url (SHA-256)") {
    val expected = golden("text_sha.golden.csv")
      .map(_.split(",")).map(a => a(0) -> a(1)).toMap
    (0L until FreezeGoldens.FixturePages).foreach { i =>
      val p = graft.corpus.Corpus.page(i)
      val extracted = graft.extract.HtmlText.extract(p.html)
      assert(FreezeGoldens.sha256(extracted) == expected(p.url),
        s"SHA mismatch at ${p.url}")
      assert(extracted == p.text, s"text column mismatch at ${p.url}")
    }
  }

  test("votes/union/strong ensemble spans set-equal to goldens (A6/A7/A8)") {
    val expected = golden("ensembles.golden.txt").toSet
    val actual = FreezeGoldens.ensembleLines().toSet
    assert(actual == expected,
      s"+${(actual -- expected).take(3)} -${(expected -- actual).take(3)}")
  }

  test("group-taboo triples set-equal to goldens") {
    val expected = golden("group_triples.golden.txt").toSet
    val actual = FreezeGoldens.groupLines(spark).toSet
    assert(actual == expected)
  }
}
