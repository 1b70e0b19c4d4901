package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Bucketing

class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  val sf = "/root/testdata/sf0.001"

  test("same-bucketed tables join with zero shuffle; unbucketed join shuffles") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    // disable broadcast so the comparison is shuffle-vs-colocated, and
    // keep AQE from rewriting the bucketed side
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(li, "li_b", "l_orderkey", 8)
      Bucketing.writeBucketed(o, "o_b", "o_orderkey", 8)
      val colocated = Bucketing.bucketedJoin(spark, "li_b", "o_b",
        "l_orderkey", "o_orderkey")
      assert(!Bucketing.hasExchange(colocated),
        "bucketed join must not shuffle")
      val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
      assert(Bucketing.hasExchange(plain),
        "control: unbucketed sort-merge join should shuffle")
      // same results either way
      assert(colocated.count() == plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}
