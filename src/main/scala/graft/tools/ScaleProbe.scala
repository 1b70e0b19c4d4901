package graft.tools

import org.apache.spark.sql.SparkSession

/** One timed pipeline run per JVM: runMain graft.tools.ScaleProbe <cpus> <pages>. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val pages = args(1).toLong
    // SPARK_MASTER override enables real multi-executor measurement, e.g.
    // SPARK_MASTER=local-cluster[4,4,4096] (4 executor JVMs × 4 cores)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // substantial warm-up: the scorer hot loops need thousands of sentences
    // before C2 compiles them; a tiny warm run leaves JIT mid-flight in the
    // measured window (observed 2-3x run-to-run variance)
    val parts = cpus * 4 // tasks-per-core headroom smooths stragglers
    graft.pipeline.Pipeline.triples(spark, 1000, parts).count()
    graft.pipeline.Pipeline.triples(spark, 1000, parts).count()
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcMs: Long = {
      var t = 0L
      gcBeans.forEach(b => t += b.getCollectionTime)
      t
    }
    for (round <- 1 to 3) {
      val cpu0 = osBean.getProcessCpuTime
      val gc0 = gcMs
      val t0 = System.nanoTime()
      val n = graft.pipeline.Pipeline.triples(spark, pages, parts).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val cpuSec = (osBean.getProcessCpuTime - cpu0) / 1e9
      val gcSec = (gcMs - gc0) / 1e3
      println(f"SCALEPROBE round=$round cpus=$cpus pages=$pages triples=$n sec=$sec%.2f tps=${n / sec}%.0f cpuSec=$cpuSec%.1f parallelEff=${cpuSec / sec}%.1f gcSec=$gcSec%.1f")
    }
    spark.stop()
  }
}
