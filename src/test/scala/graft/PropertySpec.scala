package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.dict.Gazetteer
import graft.ner.{Bio, BioRaw, EnsemblesRaw, Tagged}

/** Property tests (SURVEY.md §5.2). */
class PropertySpec extends AnyFunSuite {

  /** Raw-scalacheck bridge (no scalatestplus jar in the offline cache). */
  def forAll[A](gen: Gen[A], minSuccessful: Int = 60)(body: A => Unit): Unit = {
    val prop = Prop.forAll(gen) { a => body(a); true }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful), prop)
    assert(res.passed, res.status.toString)
  }
  def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body

  val dictWords = graft.corpus.Vocab.jiebaDict
  val trie = Gazetteer.buildTrie(dictWords)
  val vocabChars: Seq[Char] =
    (dictWords.keys.flatten.toSet ++ "，。的了是在和x ").toSeq

  val sentenceGen: Gen[String] = for {
    n <- Gen.choose(0, 60)
    cs <- Gen.listOfN(n, Gen.oneOf(vocabChars))
  } yield cs.mkString

  test("tokenizer spans tile every sentence end-exclusively, no overlap") {
    forAll(sentenceGen) { s =>
      val toks = Gazetteer.tokenize(trie, s)
      assert(toks.map(t => t.end - t.start).sum == s.length)
      var pos = 0
      toks.foreach { t =>
        assert(t.start == pos && t.end > t.start)
        assert(s.substring(t.start, t.end) == t.word)
        pos = t.end
      }
    }
  }

  val typeGen: Gen[Int] = Gen.choose(-1, 9)

  test("toBio/typesToBio agree between string and int implementations") {
    forAll(Gen.listOf(typeGen)) { types =>
      val names = types.map(t =>
        if (t < 0) "O" else graft.ner.CrfScorer.Types(t))
      val viaString = Bio.toBio(names)
      val viaInt = EnsemblesRaw.typesToBio(types.toArray)
        .map(graft.ner.CrfScorer.Labels(_)).toSeq
      assert(viaString == viaInt)
    }
  }

  test("getPositions: string and raw implementations produce identical spans") {
    forAll(Gen.listOf(typeGen)) { types =>
      val bioInt = EnsemblesRaw.typesToBio(types.toArray)
      val tagged = bioInt.map(l => (graft.ner.CrfScorer.Labels(l), 0.5)).toSeq
      val (sTypes, sSpans, _) = Bio.getPositions(tagged)
      val (rTypes, rSpans) = BioRaw.getPositions(bioInt)
      assert(sSpans == rSpans.toSeq.map(s =>
        (BioRaw.spanStart(s), BioRaw.spanEnd(s))))
      assert(sTypes == rTypes.toSeq.map(graft.ner.CrfScorer.Types(_)))
    }
  }

  test("getPositions spans are disjoint, ordered, in-bounds, len>=1") {
    forAll(Gen.listOf(typeGen)) { types =>
      val bioInt = EnsemblesRaw.typesToBio(types.toArray)
      val (_, spans) = BioRaw.getPositions(bioInt)
      var lastEnd = -1
      spans.foreach { sp =>
        val s = BioRaw.spanStart(sp)
        val e = BioRaw.spanEnd(sp)
        assert(s >= 0 && e <= types.length && s < e)
        assert(s >= lastEnd)
        lastEnd = e
      }
    }
  }

  test("CC: same component => same label; label is the min member") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val edgeGen = for {
      n <- Gen.choose(1, 25)
      edges <- Gen.listOfN(n,
        Gen.zip(Gen.choose(1L, 30L), Gen.choose(1L, 30L)))
    } yield edges.filter(e => e._1 != e._2)
    forAll(edgeGen, minSuccessful = 8) { edges =>
      whenever(edges.nonEmpty) {
        val got = graft.canon.Canon
          .connectedComponents(edges.toDF("src", "dst"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // union-find reference
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val vertices = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val refComp = vertices.groupBy(v => find(v))
        refComp.foreach { case (_, members) =>
          val labels = members.map(got).distinct
          assert(labels.size == 1, s"split component: $members -> $labels")
          assert(labels.head == members.min)
        }
      }
    }
  }

  test("streamed shingle hashing == fnv1a64 of the joined string windows") {
    // r6: shingles() folds window chars straight through fnv1a64 (no
    // per-shingle mkString); this pins value-identity with the retained
    // string path, incl. unicode words, repeated spaces, and < n words
    import graft.textops.Dedup
    val wordGen = Gen.oneOf("a", "bc", "word", "高血压", "x1", "ünïc", "zz")
    val docGen = for {
      n <- Gen.choose(0, 12)
      ws <- Gen.listOfN(n, wordGen)
      sep <- Gen.oneOf(" ", "  ", "   ")
    } yield ws.mkString(sep)
    forAll(docGen) { d =>
      val streamed = Dedup.shingles(d).toSeq
      val viaStrings = Dedup.shingleStrings(d)
        .map(graft.util.Hashing.fnv1a64(_)).toSeq
      assert(streamed == viaStrings, s"doc: '$d'")
    }
  }

  test("minhash est_sim is within 0.2 of exact jaccard (128 hashes)") {
    import graft.textops.Dedup
    val docGen = for {
      n <- Gen.choose(5, 40)
      ws <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h"))
    } yield ws.mkString(" ")
    forAll(Gen.zip(docGen, docGen), minSuccessful = 30) { case (d1, d2) =>
      val s1 = Dedup.shingles(d1)
      val s2 = Dedup.shingles(d2)
      whenever(s1.nonEmpty && s2.nonEmpty) {
        val sig1 = Dedup.minhashSignature(s1)
        val sig2 = Dedup.minhashSignature(s2)
        val est = sig1.zip(sig2).count { case (a, b) => a == b }.toDouble /
          Dedup.NumHashes
        val exact = Dedup.exactJaccard(s1, s2)
        assert(math.abs(est - exact) <= 0.2, s"est $est exact $exact")
      }
    }
  }

  test("chunkDocuments equals a sequential reference for random shapes/configs") {
    // pure-Scala reference of the chunking contract, checked against the
    // distributed Column implementation over random doc lengths around the
    // window boundaries, for several (chunk, overlap) configurations
    def reference(nWords: Int, chunk: Int, overlap: Int): Seq[(Int, Int, String)] = {
      if (nWords == 0) return Seq.empty
      val words = (1 to nWords).map(i => s"w$i")
      val step = chunk - overlap
      val k = if (nWords <= chunk) 1 else (nWords - chunk + step - 1) / step + 1
      (0 until k).map { i =>
        val slice = words.slice(i * step, i * step + chunk)
        (i, slice.length, slice.mkString(" "))
      }
    }
    val spark = SparkTestBase.spark
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    Seq((16, 4), (7, 0), (5, 4)).foreach { case (chunk, overlap) =>
      val sizes = Seq(0, 1, chunk - 1, chunk, chunk + 1, 2 * chunk,
        2 * chunk + 1) ++ Seq.fill(40)(rnd.nextInt(90))
      val docs = sizes.zipWithIndex
        .map { case (n, id) => (id.toLong, (1 to n).map(i => s"w$i").mkString(" ")) }
        .toDF("doc_id", "text")
      val got = graft.textops.TextOps
        .chunkDocuments(docs, "doc_id", "text", chunk, overlap)
        .collect()
        .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2).toInt, r.getString(3))))
        .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
      sizes.zipWithIndex.foreach { case (n, id) =>
        val want = reference(n, chunk, overlap)
        val have = got.getOrElse(id.toLong, Seq.empty)
        assert(have == want, s"config ($chunk,$overlap) nWords=$n: $have vs $want")
      }
    }
  }
}
