package graft.tools

import org.apache.spark.sql.SparkSession

/** Timed END-TO-END KgRunner run — all snapshot stages: narrow triple
  * extraction, bucketed mention/link tables, iterative CC canonicalization,
  * partitioned nodes/edges MERGE, metadata. This is the executor-pair scale
  * point for the shuffle/write stages that the narrow [[ScaleProbe]]
  * pipeline doesn't exercise (a real cluster diverges from threads exactly
  * there).
  *
  * Usage: E2eProbe <cpus> <pages> [rounds]; SPARK_MASTER overrides the
  * master (e.g. SPARK_MASTER=local-cluster[4,2,4096] for four real executor
  * JVMs). Fresh output dir per round — resume would otherwise skip every
  * committed stage — removed after counting.
  */
object E2eProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val pages = args(1).toLong
    val rounds = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // scorer hot loops need thousands of sentences before C2 compiles them
    graft.pipeline.Pipeline.triples(spark, 1000, cpus * 4).count()
    graft.pipeline.Pipeline.triples(spark, 1000, cpus * 4).count()
    for (round <- 1 to rounds) {
      val dir = java.nio.file.Files.createTempDirectory(s"e2e_r$round").toString
      val t0 = System.nanoTime()
      graft.KgRunner.run(spark, dir, pages, cpus)
      val sec = (System.nanoTime() - t0) / 1e9
      val triples = spark.read.parquet(s"$dir/triples").count()
      val edges = spark.read.parquet(s"$dir/edges").count()
      println(f"E2EPROBE round=$round cpus=$cpus pages=$pages triples=$triples edges=$edges sec=$sec%.2f tps=${triples / sec}%.0f")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
    spark.stop()
  }
}
