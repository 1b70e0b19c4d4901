package graft.tools

import java.io.{BufferedInputStream, FileInputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths}
import java.util.jar.{JarEntry, JarOutputStream}
import org.apache.spark.sql.SparkSession

/** Real multi-executor measurement WITHOUT spark-submit: zips the compiled
  * classes directory into a jar and opens a `local-cluster[E,C,MB]` session
  * with `spark.jars` pointing at it, so the separate executor JVMs can fetch
  * the application classes (they cannot see sbt's target/classes on their
  * own — the round-1 finding that previously forced the packaged-jar +
  * spark-submit protocol).
  *
  * Usage: runMain graft.tools.LocalClusterProbe <executors> <coresPerExec> <pages>
  */
object LocalClusterProbe {

  /** Zip a classes directory into a jar (idempotent per JVM run). */
  def classesJar(): String = {
    val out = Paths.get(sys.props("java.io.tmpdir"), "graft-classes.jar")
    val classesDir = Seq("target/scala-2.13/classes",
      "/root/repo/target/scala-2.13/classes")
      .map(Paths.get(_)).find(Files.isDirectory(_))
      .getOrElse(sys.error("no compiled classes directory found"))
    val jos = new JarOutputStream(new FileOutputStream(out.toFile))
    try {
      val base = classesDir.toAbsolutePath
      Files.walk(base).forEach { p: Path =>
        if (Files.isRegularFile(p)) {
          val name = base.relativize(p).toString.replace('\\', '/')
          val e = new JarEntry(name)
          e.setTime(0L) // deterministic jar bytes
          jos.putNextEntry(e)
          val in = new BufferedInputStream(new FileInputStream(p.toFile))
          try {
            val buf = new Array[Byte](65536)
            var n = in.read(buf)
            while (n >= 0) { jos.write(buf, 0, n); n = in.read(buf) }
          } finally in.close()
          jos.closeEntry()
        }
      }
    } finally jos.close()
    out.toAbsolutePath.toString
  }

  def session(executors: Int, cores: Int, memMb: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local-cluster[$executors,$cores,$memMb]")
      .appName(s"graft-lc-$executors-$cores")
      .config("spark.jars", classesJar())
      .config("spark.executor.memory", s"${memMb - 512}m")
      .config("spark.sql.shuffle.partitions", (executors * cores).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val executors = if (args.length > 0) args(0).toInt else 1
    val cores = if (args.length > 1) args(1).toInt else 4
    val pages = if (args.length > 2) args(2).toLong else 10000L
    val spark = session(executors, cores, 4096)
    val parts = executors * cores * 4
    graft.pipeline.Pipeline.triples(spark, 1000, parts).count() // JIT warm
    graft.pipeline.Pipeline.triples(spark, 1000, parts).count()
    for (round <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.pipeline.Pipeline.triples(spark, pages, parts).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"LCPROBE round=$round executors=$executors cores=$cores pages=$pages triples=$n sec=$sec%.2f tps=${n / sec}%.0f")
    }
    spark.stop()
  }
}
