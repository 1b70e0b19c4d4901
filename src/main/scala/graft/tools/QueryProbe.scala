package graft.tools

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timing + shuffle-byte meter:
  * `runMain graft.tools.QueryProbe <sfDir> <q1> [q2 ...]`.
  * Each query: one warm run, one measured run (wall seconds + total
  * shuffle-write bytes across its stages). Used for targeted perf triage
  * (e.g. the dedup family) without paying for the whole Bench suite.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val shuffleBytes = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val tc = System.nanoTime()
      fn(spark, sfDir).count() // cold (≈ the Bench suite's measurement)
      val coldSec = (System.nanoTime() - tc) / 1e9
      Thread.sleep(200) // drain listener events from the cold run
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400) // let stage-completed events land before reading
      println(f"QUERYPROBE $name rows=$n cold=$coldSec%.3f warm=$sec%.3f shuffleMB=${shuffleBytes.get / 1048576.0}%.1f")
    }
    spark.stop()
  }
}
