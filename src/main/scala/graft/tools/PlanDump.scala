package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dumps `.explain("formatted")` for named SparkEntry queries to
  * `<outDir>/<query>_<suffix>.txt` — the before/after plan evidence for the
  * optimization rounds (plans/r06). Session shape mirrors Bench (local[N],
  * shuffle.partitions=N, AQE on) so the dumped plans are the plans the
  * bench actually runs.
  *
  * Run: sbt "runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <q1> [q2 ...]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
      println(s"PLANDUMP $name -> $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
