package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.canon.Canon
import graft.link.Link

class CanonSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import org.apache.spark.sql.DataFrame

  def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val df: DataFrame = edges.toDF("src", "dst")
    Canon.connectedComponents(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain collapses to min label") {
    val m = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert((1L to 5L).forall(v => m(v) == 1L))
  }

  test("disjoint components stay disjoint with min labels") {
    val m = cc(Seq((10L, 11L), (20L, 21L), (21L, 22L), (30L, 31L)))
    assert(m(10L) == 10L && m(11L) == 10L)
    assert(m(20L) == 20L && m(21L) == 20L && m(22L) == 20L)
    assert(m(30L) == 30L && m(31L) == 30L)
  }

  test("star with hot hub (skew shape) converges") {
    val hub = 500L
    val spokes = (1L to 200L).filter(_ != hub)
    val m = cc(spokes.map(s => (hub, s)))
    assert(m.values.toSet == Set(1L))
    assert(m.size == 201) // 200 spokes + hub
  }

  test("long path needs pointer jumping (diameter 60)") {
    val m = cc((1L to 60L).map(i => (i, i + 1)))
    assert((1L to 61L).forall(v => m(v) == 1L))
  }

  test("preContractHot preserves components and de-skews the hub") {
    import spark.implicits._
    // hub 500 with 150 spokes + a chain attached to one spoke
    val edges = (1L to 150L).map(s => (500L, s)) ++
      Seq((1L, 601L), (601L, 602L), (700L, 701L))
    val df = edges.toDF("src", "dst")
    val contracted = graft.canon.Canon.preContractHot(df, threshold = 3.0)
    // hub degree after contraction: exactly 1 (the witness edge)
    val sym = contracted.select(col("src")).union(contracted.select(col("dst")))
    val hubDeg = sym.filter(col("src") === 500L).count()
    assert(hubDeg == 1L, s"hub degree $hubDeg")
    // CC over contracted graph = CC over original
    def labels(e: org.apache.spark.sql.DataFrame) =
      graft.canon.Canon.connectedComponents(e).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = labels(df)
    val b = labels(contracted)
    // same partition of the original vertex set
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    assert(verts.forall(v => a(v) == b(v)),
      verts.filter(v => a(v) != b(v)).take(5).toString)
  }

  test("label is always a member of the component (partition validity)") {
    val edges = Seq((7L, 3L), (3L, 9L), (12L, 15L))
    val m = cc(edges)
    // build reachability the slow way
    assert(m(7L) == 3L && m(3L) == 3L && m(9L) == 3L)
    assert(m(12L) == 12L && m(15L) == 12L)
  }
}

class LinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("bigram jaccard") {
    assert(Link.bigramJaccard("高血压", "高血压") == 1.0)
    assert(Link.bigramJaccard("高血压病", "高血压") > 0.5)
    assert(Link.bigramJaccard("高血压", "阿司匹林") == 0.0)
  }

  test("candidates: same-type prefix within 2 chars via broadcast trie") {
    implicit val s = spark
    import s.implicits._
    val trie = graft.dict.Gazetteer.buildTrie(
      Map("高血压" -> "ds", "心脏" -> "og"))
    val trieB = spark.sparkContext.broadcast(trie)
    val surfaces = Seq(
      ("高血压病", "DIS"), // prefix + 1 char, same type → candidate
      ("高血压的治疗", "DIS"), // 3 extra chars → rejected
      ("高血压", "SYM"), // type mismatch → rejected
      ("心脏", "ORG") // exact → candidate (self)
    ).toDS()
    val out = Link.candidates(surfaces, trieB,
      graft.model.Ontology.jiebaReverse)
      .collect().map(r => (r.getString(0), r.getString(2))).toSet
    assert(out == Set(("高血压病", "高血压"), ("心脏", "心脏")))
  }

  test("context profiles are L2-normalized and idf-pruned") {
    implicit val s = spark
    import s.implicits._
    val ctx = Seq(
      ("A", "x"), ("A", "y"), ("A", "common"),
      ("B", "x"), ("B", "z"), ("B", "common"),
      ("C", "common"), ("C", "w")
    ).toDF("surface", "token")
    val prof = Link.contextProfiles(ctx, minIdf = 0.2)
    val rows = prof.collect().map(r =>
      (r.getString(0), r.getString(1), r.getDouble(2)))
    // "common" appears in all 3 surfaces → idf = ln(4/4) = 0 < 0.2 → pruned
    assert(!rows.exists(_._2 == "common"))
    // per-surface L2 norm ≈ 1
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val norm = math.sqrt(rs.map(x => x._3 * x._3).sum)
      assert(math.abs(norm - 1.0) < 1e-9)
    }
  }
}

class SnapshotSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import graft.snapshot.Snapshot

  test("stage writes manifest with per-partition counts and skips on resume") {
    implicit val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("snap").toString + "/t1"
    var computes = 0
    val df1 = Snapshot.stage(spark, dir, "test", partitionBy = Seq("k")) {
      computes += 1
      Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "v")
    }
    assert(computes == 1 && df1.count() == 3)
    assert(Snapshot.exists(spark, dir))
    val manifest = java.nio.file.Files.readString(
      java.nio.file.Paths.get(Snapshot.manifestPath(dir)))
    assert(manifest.contains(""""rows":3"""))
    assert(manifest.contains(""""a":2""") && manifest.contains(""""b":1"""))
    // resume: compute must NOT run again
    val df2 = Snapshot.stage(spark, dir, "test", partitionBy = Seq("k")) {
      computes += 1
      Seq(("x", 9)).toDF("k", "v")
    }
    assert(computes == 1 && df2.count() == 3)
  }
}

class KgRunnerSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("full runner: snapshots commit, canon groups alias variants, resume is byte-stable") {
    val out = java.nio.file.Files.createTempDirectory("kg").toString
    graft.KgRunner.run(spark, out, nPages = 30, par = 4)
    val nodes = spark.read.parquet(s"$out/nodes")
    val edges = spark.read.parquet(s"$out/edges")
    assert(nodes.count() > 0 && edges.count() > 0)
    // every edge endpoint resolves
    assert(edges.filter(col("objId").isNull || col("subjId").isNull).count() == 0)
    // canon: a surface and its jitter-extended variant share canonId when both present
    val canon = spark.read.parquet(s"$out/canon")
    val byCanon = canon.groupBy("canonId").count()
    assert(byCanon.filter(col("count") > 1).count() > 0,
      "expected at least one multi-surface canonical group")
    // resume: re-run with same dir; edge bytes unchanged
    val before = edges.collect().map(_.toString).sorted.toSeq
    graft.KgRunner.run(spark, out, nPages = 30, par = 4)
    val after = spark.read.parquet(s"$out/edges")
      .collect().map(_.toString).sorted.toSeq
    assert(before == after)
  }
}
