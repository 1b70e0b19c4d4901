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
  /** The salt must vary WITHIN a hot key's rows — identical rows (the exact
    * hot-count case) hash identically, so a content-derived salt would put
    * the whole hot key back on one reducer. spark_partition_id varies across
    * the input split instead; the salt only routes the PARTIAL aggregate, so
    * the final result is partitioning-independent either way.
    */
  private def rowSalt(salts: Int): Column =
    pmod(spark_partition_id().cast("long"), lit(salts.toLong))

  def saltedCount(df: DataFrame, keyCols: Seq[String], salts: Int = 16): DataFrame = {
    df.withColumn("__salt", rowSalt(salts))
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
    df.withColumn("__salt", rowSalt(salts))
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
    val meanRow = counts.agg(avg(col("n"))).first()
    if (meanRow.isNullAt(0)) counts // empty input → no hot keys
    else counts.filter(col("n") > lit(meanRow.getDouble(0) * threshold))
  }
}
