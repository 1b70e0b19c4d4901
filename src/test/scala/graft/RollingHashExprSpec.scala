package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.RollingHash
import graft.textops.TextOps

class RollingHashExprSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("native expression matches the Scala implementation, via Column API and SQL") {
    import spark.implicits._
    val texts = Seq("A  b\tC", "高血压 患者", "", "x", "the  quick   brown fox")
    val df = texts.toDF("text")
    // Column API (codegen'd path)
    val viaCol = df.select(RollingHash.rolling_hash(col("text")).as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(viaCol == texts.map(TextOps.rollingHash))
    // SQL registration
    RollingHash.register(spark)
    df.createOrReplaceTempView("rh_t")
    val viaSql = spark.sql("SELECT rolling_hash(text) AS h FROM rh_t")
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql == texts.map(TextOps.rollingHash))
    // whitespace-collapse + case normalization carried through
    assert(viaCol(0) == TextOps.rollingHash("a b c"))
  }

  test("expression participates in whole-stage codegen (no codegen fallback)") {
    import spark.implicits._
    val df = (1 to 100).map(i => s"doc $i text").toDF("text")
      .select(RollingHash.rolling_hash(col("text")).as("h"))
      .groupBy(col("h")).count()
    df.collect()
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.linesIterator.exists(_.contains("*(")),
      "expected WholeStageCodegen stages in:\n" + executed.take(800))
    // null-safe: null input → null output (UnaryExpression default)
    val withNull = Seq(Some("a"), None).toDF("text")
      .select(RollingHash.rolling_hash(col("text")).as("h")).collect()
    assert(withNull(1).isNullAt(0))
  }
}
