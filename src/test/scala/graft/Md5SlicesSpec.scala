package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Md5Slices

/** Pins the fused [[Md5Slices]] codegen expression against the
  * conv(substring(md5(s), start, width), 16, 10) composition it replaced in
  * the HLL/CMS sketch passes (that composition is itself oracle-checked
  * against DuckDB's substr/md5 — so equality here carries the cross-engine
  * guarantee to the fused path).
  */
class Md5SlicesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val texts = Seq(
    "", "x", "the quick brown fox", "token", "0", "  spaced  ",
    "高血压 患者 血糖", "mixed 中文 and ascii 42", "ünïcödé tøkens",
    "a" * 300) ++ (0 until 200).map(i => s"tok$i")

  private def refSlices(widths: Seq[Int]) = {
    val starts = widths.scanLeft(0)(_ + _)
    widths.zip(starts).map { case (w, st) =>
      conv(substring(md5(col("t")), st + 1, w), 16, 10).cast("long")
    }
  }

  test("md5_slices == conv(substring(md5)) for the CMS [8,8,8,8] layout") {
    import spark.implicits._
    val df = texts.toDF("t")
    val widths = Seq(8, 8, 8, 8)
    val fused = df.select(Md5Slices.md5_slices(col("t"), widths).as("s"))
      .collect().map(_.getSeq[Long](0).toVector)
    val ref = df.select(array(refSlices(widths): _*).as("s"))
      .collect().map(_.getSeq[Long](0).toVector)
    assert(fused.toSeq == ref.toSeq)
  }

  test("md5_slices == conv(substring(md5)) for the HLL [2,14] layout") {
    import spark.implicits._
    val df = texts.toDF("t")
    val widths = Seq(2, 14)
    val fused = df.select(Md5Slices.md5_slices(col("t"), widths).as("s"))
      .collect().map(_.getSeq[Long](0).toVector)
    val ref = df.select(array(refSlices(widths): _*).as("s"))
      .collect().map(_.getSeq[Long](0).toVector)
    assert(fused.toSeq == ref.toSeq)
  }

  test("codegen participation + null passthrough + bad widths rejected") {
    import spark.implicits._
    val df = (1 to 64).map(i => s"doc $i").toDF("t")
      .select(explode(Md5Slices.md5_slices(col("t"), Seq(8, 8))).as("v"))
      .groupBy(col("v")).count()
    df.collect()
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.linesIterator.exists(_.contains("*(")),
      "expected WholeStageCodegen stages in:\n" + executed.take(800))
    val withNull = Seq(Some("a"), None).toDF("t")
      .select(Md5Slices.md5_slices(col("t"), Seq(4)).as("s")).collect()
    assert(withNull(1).isNullAt(0))
    intercept[IllegalArgumentException] {
      Md5Slices.md5_slices(col("t"), Seq(16)) // > 15 hex digits
    }
    intercept[IllegalArgumentException] {
      Md5Slices.md5_slices(col("t"), Seq(8, 8, 8, 8, 8)) // > 32 total
    }
  }
}
