package graft.tools

import org.apache.spark.sql.SparkSession

/** Timed pipeline run(s) per JVM:
  * `runMain graft.tools.ScaleProbe <cpus> <pages> [rounds] [ctlPages]`.
  *
  * Default is ONE long measured round after a substantial JIT warm-up
  * (2×1000 + 5000 pages ≈ 385k sentences — the scorer hot loops are C2-
  * compiled well before the measured window). One long round, not several
  * short ones, because the N→4N efficiency ratio is measured from these
  * numbers: each round carries a fixed driver-side cost F (Catalyst
  * planning + job setup, measured ≈ 0.66 s at the 4N level, independent
  * of page count), and with short rounds F is amortized over 4× less
  * compute at 4N than at N, structurally deflating the ratio — measured
  * raw N→4N 0.72 at 15k pages vs 0.89 at 45k pages in the SAME host
  * window, fitting t = a·P + F exactly. A long round amortizes F the way
  * a real multi-minute job would, which is what the scaling criterion is
  * about. Pass rounds > 1 for manual steady-state inspection.
  *
  * With ctlPages > 0 the measured round is BRACKETED by two fixed
  * SPARK-SHAPED control rounds (same pipeline, same cluster config, the
  * given smaller page count), printed as `SCALEPROBE_CTL` lines. These are
  * the weather gauge VERDICT r4 #1 prescribed: this host's multi-minute
  * phases slow Spark legs 2-3× more than a pure-CPU control moves, so only
  * a control with the SAME workload shape (JVM threads, shuffle, memory
  * traffic) can see the disturbance the measured round experienced. The
  * controls run INSIDE the already-warm child, so they cost two small
  * rounds, not two extra JVM+cluster startups.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val pages = args(1).toLong
    val rounds = if (args.length > 2) args(2).toInt else 1
    val ctlPages = if (args.length > 3) args(3).toLong else 0L
    // SPARK_MASTER override enables real multi-executor measurement, e.g.
    // SPARK_MASTER=local-cluster[4,2,4096] (4 executor JVMs × 2 cores)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val parts = cpus * 4 // tasks-per-core headroom smooths stragglers
    graft.pipeline.Pipeline.triples(spark, 1000, parts).count()
    graft.pipeline.Pipeline.triples(spark, 1000, parts).count()
    graft.pipeline.Pipeline.triples(spark, 5000, parts).count()
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcMs: Long = {
      var t = 0L
      gcBeans.forEach(b => t += b.getCollectionTime)
      t
    }
    def ctlRound(phase: String): Unit = if (ctlPages > 0) {
      val t0 = System.nanoTime()
      val n = graft.pipeline.Pipeline.triples(spark, ctlPages, parts).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"SCALEPROBE_CTL phase=$phase cpus=$cpus pages=$ctlPages triples=$n sec=$sec%.2f tps=${n / sec}%.0f")
    }
    ctlRound("before")
    for (round <- 1 to rounds) {
      val cpu0 = osBean.getProcessCpuTime
      val gc0 = gcMs
      val t0 = System.nanoTime()
      val n = graft.pipeline.Pipeline.triples(spark, pages, parts).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val cpuSec = (osBean.getProcessCpuTime - cpu0) / 1e9
      val gcSec = (gcMs - gc0) / 1e3
      println(f"SCALEPROBE round=$round cpus=$cpus pages=$pages triples=$n sec=$sec%.2f tps=${n / sec}%.0f cpuSec=$cpuSec%.1f parallelEff=${cpuSec / sec}%.1f gcSec=$gcSec%.1f")
    }
    ctlRound("after")
    spark.stop()
  }
}
