package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-stage timing: generation vs extract+sentence vs annotate. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val pages = args(1).toLong
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val s: SparkSession = spark
    import spark.implicits._
    val parts = cpus * 4
    def time(label: String)(f: => Long): Unit = {
      // warm twice, measure once
      f; f
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $label rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    time("gen") {
      graft.corpus.Corpus.pages(spark, pages, parts)
        .map(p => p.text.length.toLong).reduce(_ + _)
    }
    time("gen+extract+sent") {
      graft.extract.Extract.sentencesOf(graft.extract.Extract.sectionsOf(
        graft.corpus.Corpus.pages(spark, pages, parts))).count()
    }
    time("full") {
      graft.pipeline.Pipeline.triples(spark, pages, parts).count()
    }
    spark.stop()
  }
}
