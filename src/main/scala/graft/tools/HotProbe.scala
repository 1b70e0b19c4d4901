package graft.tools

/** Single-thread micro-profile of the per-sentence hot path (no Spark):
  * trie scan vs 4-scorer predict vs ensembles vs full annotate.
  */
object HotProbe {
  def main(args: Array[String]): Unit = {
    val nPages = if (args.nonEmpty) args(0).toInt else 800
    val trie = graft.dict.Gazetteer.buildTrie(graft.corpus.Vocab.jiebaDict)
    val scorers = graft.ner.CrfScorer.productionScorers(trie)
    val wIdx = graft.ner.Ensembles.weightsIdx(graft.corpus.Fixtures.modelWeights)
    val ctx = graft.pipeline.Annotate.Ctx(
      trie, scorers, graft.corpus.Fixtures.modelWeights, wIdx,
      graft.corpus.Fixtures.evalMatrix,
      graft.corpus.Vocab.refinedDict.keySet,
      graft.merge.Merge.SuffixSets.from(graft.corpus.Vocab.suffixDict))
    val sents = (0L until nPages.toLong).flatMap { i =>
      val p = graft.corpus.Corpus.page(i)
      if (p.lang != "zh") Seq.empty
      else {
        val firstLine = p.text.takeWhile(_ != '\n')
        val source = if (p.url.contains("/med/c/")) "c" else "m"
        graft.extract.Extract.sections(p.url, firstLine, source, p.text)
          .flatMap(graft.extract.Extract.sentences)
      }
    }
    println(s"sentences: ${sents.size}")
    def time(label: String, reps: Int)(f: => Long): Unit = {
      f; f // warm
      var best = Long.MaxValue
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime(); val r = f
        best = math.min(best, System.nanoTime() - t0)
        if (r == 42) println("") // keep result live
      }
      println(f"HOT $label best=${best / 1e6}%.1f ms")
    }
    time("dictScan", 3) {
      var acc = 0L
      sents.foreach(sr => acc += graft.ner.CrfScorer.dictScan(trie, sr.sentence).length)
      acc
    }
    time("scan+4xpredict", 3) {
      var acc = 0L
      sents.foreach { sr =>
        val m = graft.ner.CrfScorer.dictScan(trie, sr.sentence)
        scorers.foreach(sc => acc += sc.predictRaw(sr.sentence, m).labels.length)
      }
      acc
    }
    time("scan+predict+ensembles", 3) {
      var acc = 0L
      sents.foreach { sr =>
        val m = graft.ner.CrfScorer.dictScan(trie, sr.sentence)
        val pred = scorers.map(sc => sc.model -> sc.predictRaw(sr.sentence, m)).toMap
        acc += graft.ner.EnsemblesRaw.run(pred, wIdx).strong.labels.length
      }
      acc
    }
    time("full annotateOne", 3) {
      var acc = 0L
      sents.foreach(sr => acc += graft.pipeline.Annotate.annotateOne(sr, ctx).entities.size)
      acc
    }
  }
}
