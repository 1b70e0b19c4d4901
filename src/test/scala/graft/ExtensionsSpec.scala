package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.{CollapseRepeatedCaseFold, GraftExtensions}

/** SparkSessionExtensions surface: injected SQL functions + the
  * case-fold-collapse optimizer rule.
  */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("extension class wires without error on a fresh SparkSessionExtensions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // would throw on a bad descriptor
  }

  test("injected SQL functions evaluate: rolling_hash and top_k_freq") {
    import spark.implicits._
    // same builders the extension injects, registered on the shared session
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", GraftExtensions.rollingHashDescriptor._3, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "top_k_freq", GraftExtensions.topKFreqDescriptor._3, "scala_udf")
    Seq(("A  b\tC", "g1"), ("a b c", "g1"), ("x", "g1"), ("x", "g1"))
      .toDF("t", "g").createOrReplaceTempView("ext_t")
    val rh = spark.sql(
      "SELECT rolling_hash(t) AS h FROM ext_t").collect().map(_.getLong(0))
    assert(rh(0) == rh(1)) // whitespace collapse + case fold
    assert(rh(0) == graft.textops.TextOps.rollingHash("a b c"))
    val top = spark.sql(
      """SELECT top_k_freq(t, 1) AS top FROM ext_t""").collect()
    val first = top.head.getSeq[org.apache.spark.sql.Row](0).head
    assert(first.getString(0) == "x" && first.getLong(1) == 2L)
  }

  test("optimizer rule: lower(lower(x)) collapses to one Lower in the plan") {
    import spark.implicits._
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ CollapseRepeatedCaseFold
    try {
      // parquet-backed input so constant folding can't erase the expression
      val df = spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
        .select(lower(lower(lower(col("lang")))).as("l"))
      val lowers = df.queryExecution.optimizedPlan.expressions
        .flatMap(_.collect {
          case l: org.apache.spark.sql.catalyst.expressions.Lower => l
        }).size
      assert(lowers == 1, s"expected single Lower node, got $lowers")
      assert(df.collect().forall(r => r.getString(0) == r.getString(0).toLowerCase))
      // unsound pair is NOT rewritten
      val mixed = Seq("ß").toDF("s").select(lower(upper(col("s"))).as("r"))
      assert(mixed.collect().head.getString(0) == "ss")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == CollapseRepeatedCaseFold)
    }
  }
}
