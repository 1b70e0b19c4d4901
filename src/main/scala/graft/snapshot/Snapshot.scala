package graft.snapshot

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-per-stage checkpointing with per-partition lineage + counter
  * metrics (north rule: "resumable from checkpoint with per-partition
  * lineage + metrics").
  *
  * Each pipeline stage writes its output as a partitioned parquet dir plus a
  * `_manifest.json` carrying the stage name, total row count, per-partition
  * row counts and the input snapshot it derived from. A stage whose manifest
  * exists is skipped on resume (idempotent re-run = same bytes because every
  * id is a content hash — no monotonically_increasing_id anywhere).
  *
  * This emulates Iceberg snapshot commits (no iceberg jar ships in
  * /opt/spark/jars): the manifest plays the role of the snapshot metadata
  * file, and "commit" is the atomic rename-free write of _manifest.json
  * AFTER the parquet write succeeds — readers gate on the manifest, so a
  * half-written stage is invisible, which is the same correctness contract
  * as an Iceberg MERGE commit.
  */
object Snapshot {

  final case class Manifest(
      stage: String,
      rows: Long,
      partitions: Map[String, Long],
      parent: String
  )

  def manifestPath(dir: String): String = s"$dir/_manifest.json"

  /** All manifest IO goes through the Hadoop FileSystem of the target path,
    * so snapshots gate correctly on hdfs:// and s3a:// outDirs as well as
    * local paths (the spark-submit cluster case, not just the sandbox).
    */
  private def fs(spark: SparkSession, path: String): FileSystem =
    new HPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, dir: String): Boolean =
    fs(spark, dir).exists(new HPath(manifestPath(dir)))

  /** Write df → dir (overwrite), then commit the manifest. `partitionBy`
    * columns become physical partitions (e.g. entity type + url-hash
    * bucket). Per-partition counts are computed from the data itself —
    * they double as the counter metrics the reference logs every 1000 rows
    * (EnsemblePredict_all.py:415-416), but exact and queryable.
    *
    * Counters are OBSERVED METRICS on the write query itself (CollectMetrics
    * with the TopKFreq count-by-key aggregate): the rows are counted while
    * they stream to parquet — no post-write re-read job. Round 1 re-read the
    * whole stage output per snapshot, the largest slice of the ~30 s fixed
    * end-to-end floor. A defensive fallback re-reads only if the observed
    * metric is unavailable.
    */
  def write(
      df: DataFrame,
      dir: String,
      stage: String,
      partitionBy: Seq[String] = Nil,
      parent: String = ""
  ): Manifest = {
    // shuffle rows onto their target partition before a partitioned write:
    // otherwise every task writes a file into every partition dir
    // (tasks × partitions small files — the classic partitioned-write
    // explosion). One shuffle buys one file per partition per write.
    val arranged =
      if (partitionBy.nonEmpty) df.repartition(partitionBy.map(col): _*)
      else df
    val keyCol =
      if (partitionBy.nonEmpty)
        concat_ws("/", partitionBy.map(c => col(c).cast("string")): _*)
      else lit("all")
    val obs = org.apache.spark.sql.Observation()
    val observed = arranged.observe(obs,
      graft.functions.TopKFreq
        .top_k_freq(keyCol, Int.MaxValue, Int.MaxValue).as("part_counts"))
    val writer = observed.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(dir)
    val spark = df.sparkSession
    val partCounts: Map[String, Long] = {
      val viaObs = org.apache.spark.sql.GraftBridge.observedOrEmpty(obs).get("part_counts").map {
        case rows: scala.collection.Seq[_] =>
          rows.map { case r: org.apache.spark.sql.Row =>
            r.getString(0) -> r.getLong(1)
          }.toMap
      }
      viaObs.getOrElse {
        // fallback: post-write re-read (pre-observe behavior)
        val written = spark.read.parquet(dir)
        if (partitionBy.nonEmpty)
          written.groupBy(partitionBy.map(col): _*).count()
            .collect()
            .map(r => partitionBy.indices.map(i => String.valueOf(r.get(i)))
              .mkString("/") -> r.getLong(partitionBy.length))
            .toMap
        else Map("all" -> written.count())
      }
    }
    val counts =
      if (partCounts.isEmpty && partitionBy.isEmpty) Map("all" -> 0L)
      else partCounts
    val m = Manifest(stage, counts.values.sum, counts, parent)
    val out = fs(spark, dir).create(new HPath(manifestPath(dir)), true)
    try out.write(toJson(m).getBytes("UTF-8"))
    finally out.close()
    m
  }

  /** Manifest-gated BUCKETED stage: the snapshot is written as an external
    * bucketed+sorted table (bucket metadata in the session catalog, files at
    * `dir`), so the NEXT stage's aggregations/joins keyed by `bucketCol`
    * read co-located data with ZERO exchange. On resume in a fresh session
    * (catalog empty) the files read back as plain parquet — same rows, the
    * bucket optimization simply re-arms once the table is re-registered.
    */
  def stageBucketed(
      spark: SparkSession,
      dir: String,
      table: String,
      name: String,
      bucketCol: String,
      buckets: Int = 16,
      parent: String = ""
  )(compute: => DataFrame): DataFrame = {
    if (!exists(spark, dir)) {
      val t0 = System.nanoTime()
      val df = compute
      val obs = org.apache.spark.sql.Observation()
      val observed = df.observe(obs,
        graft.functions.TopKFreq
          .top_k_freq(lit("all"), Int.MaxValue, Int.MaxValue)
          .as("part_counts"))
      spark.sql(s"DROP TABLE IF EXISTS $table")
      observed.write.mode(SaveMode.Overwrite)
        .option("path", dir)
        .bucketBy(buckets, bucketCol)
        .sortBy(bucketCol)
        .format("parquet")
        .saveAsTable(table)
      val rows = org.apache.spark.sql.GraftBridge.observedOrEmpty(obs).get("part_counts") match {
        case Some(rs: scala.collection.Seq[_]) =>
          rs.map { case r: org.apache.spark.sql.Row => r.getLong(1) }.sum
        case _ => spark.read.parquet(dir).count()
      }
      val m = Manifest(name, rows, Map("all" -> rows), parent)
      val out = fs(spark, dir).create(new HPath(manifestPath(dir)), true)
      try out.write(toJson(m).getBytes("UTF-8"))
      finally out.close()
      System.err.println(
        f"[snapshot] bucketed stage $name committed in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    if (spark.catalog.tableExists(table)) spark.table(table)
    else spark.read.parquet(dir)
  }

  /** Manifest-gated stage: skip the compute entirely when the snapshot is
    * already committed (resume path), else run and commit.
    */
  def stage(
      spark: SparkSession,
      dir: String,
      name: String,
      partitionBy: Seq[String] = Nil,
      parent: String = ""
  )(compute: => DataFrame): DataFrame = {
    if (!exists(spark, dir)) {
      val t0 = System.nanoTime()
      write(compute, dir, name, partitionBy, parent)
      System.err.println(
        f"[snapshot] stage $name committed in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.read.parquet(dir)
  }

  def toJson(m: Manifest): String = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val parts = m.partitions.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}":$v""" }.mkString(",")
    s"""{"stage":"${esc(m.stage)}","rows":${m.rows},"partitions":{$parts},"parent":"${esc(m.parent)}"}"""
  }
}
