package graft

import org.apache.spark.sql.SparkSession

/** Benchmark runner (driver contract): times the headline operator queries on
  * SPARK_GRAFT_SF_DIR plus the end-to-end KG pipeline at TWO parallelism
  * levels — local[8] (N) and local[32] (4N) on identical input — emitting
  * triples/sec at both and the scaling efficiency
  * (BASELINE.md §c sandbox protocol for the north rule's N→4N criterion).
  *
  * Prints exactly one JSON line.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchPages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "6000").toLong

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]

    // ---- headline operator queries at full parallelism ----
    var spark = session(cpus)
    // warm the JVM/codegen once with the smallest query
    SparkEntry.queries.get("a4_freq_count")
      .foreach(q => try q(spark, sfDir).count() catch { case _: Throwable => })
    val skipInBench = Set("kg_triples", "kg_group_taboo")
    SparkEntry.queries.foreach { case (name, fn) =>
      if (!skipInBench.contains(name)) {
        val (_, sec) =
          time(try fn(spark, sfDir).count() catch { case _: Throwable => -1L })
        results += name -> sec
      }
    }

    // warm the pipeline path once (codegen + classloading) so neither timed
    // run pays JVM warm-up
    graft.pipeline.Pipeline.triples(spark, 40, cpus).count()
    spark.stop()

    // ---- KG pipeline at N = cpus/4 on identical input (timed first) ----
    val nCpus = math.max(cpus / 4, 1)
    spark = session(nCpus)
    graft.pipeline.Pipeline.triples(spark, 40, nCpus).count() // warm
    val (triples8, kg8) = time {
      graft.pipeline.Pipeline.triples(spark, benchPages, nCpus).count()
    }
    results += "kg_pipeline_n" -> kg8
    spark.stop()

    // ---- KG pipeline at 4N ----
    spark = session(cpus)
    graft.pipeline.Pipeline.triples(spark, 40, cpus).count() // warm
    val (triples32, kg32) = time {
      graft.pipeline.Pipeline.triples(spark, benchPages, cpus).count()
    }
    results += "kg_pipeline_4n" -> kg32
    spark.stop()

    val thr32 = triples32 / kg32
    val thr8 = triples8 / kg8
    val eff = (thr32 / thr8) / (cpus.toDouble / nCpus)
    results += "kg_triples_per_sec_4n" -> thr32
    results += "kg_triples_per_sec_n" -> thr8
    results += "scaling_efficiency" -> eff

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.4f" }
      .mkString("{", ",", "}")
    val total = results.filterKeys(k => !k.contains("per_sec") &&
      !k.contains("efficiency")).values.sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","bench_pages":$benchPages,"triples":$triples32}""")
  }
}
