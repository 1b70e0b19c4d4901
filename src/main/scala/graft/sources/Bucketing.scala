package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table co-located joins.
  *
  * At 100 TB the dominant join cost is the shuffle; two tables bucketed (and
  * sorted) on the join key with the same bucket count join with ZERO
  * exchange — each task reads matching bucket files from both sides. This is
  * the storage-layout answer to the reference's repeated joins on `ind`
  * (J1/J2): persist mention and lineage tables bucketed by `ind` once,
  * then every downstream join is shuffle-free.
  *
  * Spark requires saveAsTable for bucketed writes (bucket metadata lives in
  * the catalog), so these helpers manage a local warehouse database.
  */
object Bucketing {

  /** Write df as a bucketed, sorted managed table. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      buckets: Int = 16
  ): Unit = {
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — planner elides both
    * exchanges (verify with [[hasExchange]]).
    */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      leftKey: String,
      rightKey: String
  ): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }

  /** True if the executed plan contains a shuffle exchange. */
  def hasExchange(df: DataFrame): Boolean = {
    df.collect()
    df.queryExecution.executedPlan.toString.contains("Exchange")
  }
}
