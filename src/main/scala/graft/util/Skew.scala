package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling (north rule: "partitioning / shuffle / skew handled
  * explicitly").
  *
  * Three layers, used where each fits:
  *   1. algebraic aggregations (count/sum/min/max) — Spark's map-side partial
  *     aggregation absorbs hot keys before the shuffle automatically; no
  *     salting needed (that covers Canon's min-label and most group-bys);
  *   2. AQE skew-join splitting — enabled in every session builder for the
  *     join side;
  *   3. two-phase salted aggregation — for aggregations whose combine is
  *     expensive per distinct key or whose key distribution is
  *     pathologically hot (head entities like ubiquitous symptom surfaces,
  *     SURVEY.md §4.1): key → (key, salt) pre-aggregate → final merge.
  */
object Skew {

  /** Two-phase salted count: groupBy(key+salt).count → groupBy(key).sum.
    * The salt is content-derived (hash of all columns mod `salts`), so the
    * result is deterministic and the pre-aggregate splits any hot key across
    * `salts` reducers.
    */
  def saltedCount(df: DataFrame, keyCols: Seq[String], salts: Int = 16): DataFrame = {
    val salt = pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(salts))
    df.withColumn("__salt", salt)
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__partial")).as("n"))
  }

  /** Two-phase salted sum over `valueCol`. */
  def saltedSum(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      salts: Int = 16
  ): DataFrame = {
    val salt = pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(salts))
    df.withColumn("__salt", salt)
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }

  /** Hot-key detection: keys whose frequency exceeds `threshold` × the mean —
    * the driver-side step before choosing a salted plan or pre-collapsing
    * high-degree nodes in CC (star contraction).
    */
  def hotKeys(df: DataFrame, keyCols: Seq[String], threshold: Double = 10.0): DataFrame = {
    val counts = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n"))
    val meanN = counts.agg(avg(col("n"))).first().getDouble(0)
    counts.filter(col("n") > lit(meanN * threshold))
  }
}
