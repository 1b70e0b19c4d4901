package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TopKFreq.top_k_freq

class TopKFreqSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  val sf = "/root/testdata/sf0.001"

  test("exact agreement with groupBy-count-sort when distincts fit capacity") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val got = ev.groupBy(col("user_id") % 10 as "bucket")
      .agg(top_k_freq(col("event_type"), 3).as("top"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getString(0), x.getLong(1))))
      .toMap
    // exact reference
    val exact = ev.withColumn("bucket", col("user_id") % 10)
      .groupBy("bucket", "event_type").count().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (b, rows) =>
        b -> rows.map(x => (x._2, x._3)).sortBy { case (t, c) => (-c, t) }
          .take(3).toSeq
      }
    exact.foreach { case (b, expect) =>
      assert(got(b) == expect, s"bucket $b: ${got(b)} vs $expect")
    }
  }

  test("bounded buffer: capacity smaller than distincts still yields the heavy hitter") {
    import spark.implicits._
    // one dominant key among many singletons — MG guarantees survival of any
    // item with frequency > N/capacity
    val rows = (1 to 500).map(_ => "dominant") ++
      (1 to 400).map(i => s"rare$i")
    val out = rows.toDF("w").agg(top_k_freq(col("w"), 1, capacity = 16))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(out.head.getString(0) == "dominant")
  }

  test("works partial+final across partitions (serialize/merge path)") {
    import spark.implicits._
    val df = spark.sparkContext
      .parallelize((1 to 1000).map(i => if (i % 3 == 0) "a" else "b"), 8)
      .toDF("w")
    val out = df.agg(top_k_freq(col("w"), 2)).collect()(0)
      .getSeq[org.apache.spark.sql.Row](0)
      .map(x => (x.getString(0), x.getLong(1)))
    assert(out == Seq(("b", 667L), ("a", 333L)))
  }
}
