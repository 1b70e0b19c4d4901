package graft.tools

import org.apache.spark.sql.SparkSession
import graft.dict.Gazetteer
import graft.merge.{Merge, RulesMerging}
import graft.model.{Mention, Ontology}
import graft.ner.{CrfScorer, Ensembles, Spans}

/** Manual end-to-end drive of the row-local KG ops through a real
  * SparkSession: sentences → broadcast-trie tokenize → 4 CRF-style scorers →
  * union/vote/majority ensembles → NER∪dict merge → rule rounds → rule-merged
  * entity rows. Run with `sbt "runMain graft.tools.Drive"`.
  */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-drive")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dict = Map(
      "高血压" -> "ds", "呼吸困难" -> "sm", "阿司匹林" -> "du",
      "胸部X线" -> "ts", "心脏" -> "og", "手术" -> "sr", "肺淤血" -> "sm",
      "慢性心力衰竭" -> "ds", "冠心病" -> "ds"
    )
    val sentences = Seq(
      "慢性心力衰竭常见症状为呼吸困难，由肺淤血所致。",
      "冠心病患者可服阿司匹林，必要时行心脏手术治疗。",
      "高血压者建议胸部X线检查。"
    )

    val trieB = spark.sparkContext.broadcast(Gazetteer.buildTrie(dict))
    val weightsB = spark.sparkContext.broadcast(
      Ontology.models.map(m =>
        m -> Ontology.essentialTypes.map(_ -> 0.25).toMap).toMap)

    val ds = spark.createDataset(sentences.zipWithIndex)
    val annotated = ds.mapPartitions { it =>
      val trie = trieB.value
      val scorers = CrfScorer.productionScorers(trie)
      it.map { case (sent, i) =>
        val seg = Gazetteer.tokenize(trie, sent)
        val pred = scorers.map(sc => sc.model -> sc.predict(sent)).toMap
        val ens = Ensembles.run(pred, weightsB.value)
        val mentions = Spans.normalize(
          ens.boundaries.zip(ens.types).map { case ((s, e), t) =>
            Mention(sent.substring(s, math.min(e, sent.length)), t, s, e, 0, 0)
          })
        val segU = Merge.mergeNerSeg(
          seg.map(t => t.copy(tag = Ontology.jiebaReverse.getOrElse(t.tag, t.tag))),
          mentions)
        val merged = Merge.round2(sent, Merge.round1(sent, segU),
          Map("手术" -> "SUR", "检查" -> "TES"))
        val rules = RulesMerging.entityRows(i.toLong, sent, merged,
          mentions.map(m => RulesMerging.SpanProb(m.word, m.start, m.end, 0.8)),
          Nil)
        (sent, mentions.map(m => s"${m.word}/${m.tpe}@${m.start}-${m.end}"),
          merged.filter(t => Ontology.essentialTypes.contains(t.tag))
            .map(t => s"${t.word}/${t.tag}"),
          rules.map(r => f"${r.entName}/${r.entType}@${r.prob}%.3f"))
      }
    }

    annotated.collect().foreach { case (sent, ments, merged, rules) =>
      println(s"SENT: $sent")
      println(s"  ensemble_strong: ${ments.mkString(", ")}")
      println(s"  merged entities: ${merged.mkString(", ")}")
      println(s"  rules_merging  : ${rules.mkString(", ")}")
    }

    // full pipeline: synthetic pages → triples
    val nPages = if (args.nonEmpty) args(0).toLong else 20L
    val triples = graft.pipeline.Pipeline.triples(spark, nPages, 4)
    val collected = triples.collect()
    println(s"PIPELINE: ${collected.length} triples from $nPages pages")
    collected.take(8).foreach { t =>
      println(s"  (${t.subj}/${t.subjType}) -[${t.pred}]-> (${t.obj}/${t.objType}) p=${f"${t.prob}%.3f"} ind=${t.ind}")
    }
    val gts = graft.pipeline.Pipeline.groupTriples(spark, 12).collect()
    println(s"GROUP TABOO: ${gts.length} triples")
    gts.take(4).foreach(g => println(s"  (${g.entity1}) -[${g.relation}]-> (${g.entity2})"))

    // online NER (S10 analog): same scorers/ensemble as batch
    val annotate = graft.ner.OnlineNer.annotator(
      graft.dict.Gazetteer.buildTrie(graft.corpus.Vocab.jiebaDict),
      graft.corpus.Fixtures.modelWeights)
    val online = annotate("心衰竭患者常见呼吸困难，建议行心检查。")
    println(s"ONLINE NER: ${online.entities.map(e => s"${e.word}/${e.entType}@${e.start}-${e.end}").mkString(", ")}")

    // sources round-trip (S3/S7) + salted aggregation
    val tmp = java.nio.file.Files.createTempDirectory("drive").toString
    val sentsOut = graft.extract.Extract.sentencesOf(
      graft.extract.Extract.sectionsOf(
        graft.corpus.Corpus.pages(spark, 5, 2))(spark))(spark)
    graft.sources.Sources.writeSentencesJson(sentsOut, s"$tmp/sj")
    val back = graft.sources.Sources.readSentencesJson(spark, s"$tmp/sj")
    println(s"SOURCES: json round-trip ${sentsOut.count()} -> ${back.count()} rows")
    val salted = graft.util.Skew.saltedCount(
      triples.toDF().select($"objType"), Seq("objType")).collect()
    println(s"SALTED COUNT by objType: ${salted.map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(", ")}")
    spark.stop()
  }
}
