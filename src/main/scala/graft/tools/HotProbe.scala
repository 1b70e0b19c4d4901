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

    // ---- per-step breakdown of annotateOne (mirrors its STEP A..F) ----
    {
      import graft.ner._
      import graft.model._
      val steps = Array.fill(9)(0L)
      def step[T](i: Int)(f: => T): T = {
        val t0 = System.nanoTime(); val r = f
        steps(i) += System.nanoTime() - t0; r
      }
      // warm once via the full path
      sents.foreach(sr => graft.pipeline.Annotate.annotateOne(sr, ctx))
      sents.foreach { sr =>
        val sent = sr.sentence
        val dsEval = ctx.eval.getOrElse(sr.source, ctx.eval("m"))
        val numModels = scorers.size
        val seg = step(0) {
          graft.dict.Gazetteer.tokenize(trie, sent).map { t =>
            t.copy(tag = Ontology.jiebaReverse.getOrElse(t.tag, "x"))
          }
        }
        val dictRows = step(0) {
          seg.filter(_.tag != "x").map { t =>
            val (prob, model) =
              if (ctx.refined.contains(t.word)) (0.95, "refined_dictionary")
              else (0.9, "other_dictionary")
            EntityRow(sr.ind, model, t.word, t.tag, t.start, t.end,
              prob, prob, prob, prob)
          }
        }
        val (pred, ens) = step(1) {
          val m = CrfScorer.dictScan(trie, sent)
          val p = scorers.map(sc => sc.model -> sc.predictRaw(sent, m)).toMap
          (p, EnsemblesRaw.run(p, wIdx))
        }
        val modelOrder = Ontology.models.filter(pred.contains)
        val ensembleMentions = step(2) {
          Spans.normalize(
            ens.boundaries.toSeq.zip(ens.typeIdxs.toSeq).map { case (span, ti) =>
              val s = BioRaw.spanStart(span)
              val e2 = math.min(BioRaw.spanEnd(span), sent.length)
              Mention(sent.substring(s, e2), CrfScorer.Types(ti), s, e2, 0.0, 0.0)
            })
        }
        val modelRows = step(3) {
          scorers.flatMap { sc =>
            Confidence.entityRowsRaw(sr.ind, sc.model, pred(sc.model), sent,
              dsEval, numModels)
          }
        }
        val strongRows = step(3) {
          val spanModels = ens.boundaries.toSeq.zip(ens.modelMasks.toSeq)
            .map { case (span, mask) =>
              (BioRaw.spanStart(span), BioRaw.spanEnd(span)) ->
                EnsemblesRaw.modelNames(mask, modelOrder)
            }.toMap
          Confidence.entityRowsRaw(sr.ind, "ensemble_strong",
            ens.strong, sent, dsEval, numModels, spanModels)
        }
        val strippedStrong = step(4) {
          strongRows.map { r =>
            val (w, s, e) = Boundary.strip(r.entName, r.start, r.end)
            r.copy(entName = w, start = s, end = e)
          }
        }
        val mns = step(5) {
          graft.merge.Merge.mergeNerSeg(seg, ensembleMentions)
        }
        val r1 = step(7) { graft.merge.Merge.round1(sent, mns) }
        val merged = step(8) {
          graft.merge.Merge.round2(sent, r1, ctx.suffixSets)
        }
        step(6) {
          graft.merge.RulesMerging.entityRows(sr.ind, sent, merged,
            strippedStrong.filter(_.entName.nonEmpty)
              .map(r => graft.merge.RulesMerging.SpanProb(r.entName, r.start, r.end, r.prob)),
            dictRows.map(r => graft.merge.RulesMerging.SpanProb(r.entName, r.start, r.end, r.prob)))
        }
      }
      val names = Seq("A seg+dictRows", "B scan+predict+ens", "B2 spanNorm",
        "C confidence", "D boundary", "E1 mergeNerSeg", "F rules rows",
        "E2 round1", "E3 round2")
      names.zip(steps).foreach { case (n, t) =>
        println(f"HOT-STEP $n%-20s ${t / 1e6}%.1f ms")
      }
    }
  }
}
