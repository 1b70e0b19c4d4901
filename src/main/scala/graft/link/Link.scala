package graft.link

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.dict.Trie
import graft.pipeline.Annotate.SentenceArtifacts

/** Entity linking (north star: "candidate generation via a broadcast alias
  * trie, entity-link scoring with TF-IDF/Jaccard context similarity").
  *
  * Reference analogs: refined-dict membership J5 (clean_and_save.py:484-490)
  * and head-type lookup J4 (EnsemblePredict_all.py:413-414) — the reference
  * links by exact dictionary membership only; the north star upgrades this to
  * contextual scoring, which is what resolves boundary-jittered mention
  * variants onto their canonical gazetteer entry.
  *
  * Scale design:
  *   - linking operates on DISTINCT (surface, entType) pairs, not on mention
  *     occurrences — the dedup happens first, so the expensive part is bounded
  *     by vocabulary size, not corpus size;
  *   - candidate generation is a broadcast trie probe (no shuffle);
  *   - TF-IDF profiles are algebraic aggregations (map-side combinable);
  *   - the final cosine join joins profile vectors keyed by token — token df
  *     caps the fan-out, and hot tokens (stopword-ish) get pruned by an idf
  *     floor exactly so they cannot create a skewed join.
  */
object Link {

  /** Candidate pairs via broadcast trie: canonical = longest gazetteer word
    * of the same type that prefixes the surface (catches jitter-extended
    * variants), plus exact membership. Emits (surface, entType, candidate).
    */
  def candidates(
      surfaces: Dataset[(String, String)], // (surface, entType)
      trieB: Broadcast[Trie],
      typeOfTag: Map[String, String]
  )(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    surfaces.flatMap { case (surface, entType) =>
      val trie = trieB.value
      val m = trie.longestMatch(surface, 0)
      val cand =
        if (m == null) None
        else {
          val (end, tag) = m
          val word = surface.substring(0, end)
          val candType = typeOfTag.getOrElse(tag, "x")
          // same-type prefix, at most 2 extra chars (jitter is +1, merges more)
          if (candType == entType && surface.length - end <= 2 && end >= 2)
            Some(word)
          else None
        }
      cand.map(c => (surface, entType, c))
    }.toDF("surface", "entType", "candidate")
  }

  /** TF-IDF context profiles per surface: contexts are the seg tokens of
    * sentences where the surface was extracted. Returns
    * (surface, token, weight) L2-normalized per surface.
    */
  def contextProfiles(
      mentionContexts: DataFrame, // (surface, token)
      minIdf: Double = 0.1
  ): DataFrame = {
    val spark = mentionContexts.sparkSession
    import spark.implicits._
    val tf = mentionContexts.groupBy($"surface", $"token")
      .agg(count(lit(1)).as("tf"))
    val nSurfaces = tf.select($"surface").distinct().count().toDouble
    val idf = tf.groupBy($"token")
      .agg(countDistinct($"surface").as("df"))
      .withColumn("idf", log(lit(nSurfaces + 1.0) / (col("df") + 1.0)))
      .filter($"idf" >= minIdf) // prune ubiquitous tokens → no hot-key join
    val w = tf.join(idf, "token")
      .withColumn("w", $"tf" * $"idf")
    val norms = w.groupBy($"surface")
      .agg(sqrt(sum($"w" * $"w")).as("norm"))
    w.join(norms, "surface")
      .select($"surface", $"token", ($"w" / $"norm").as("weight"))
  }

  /** Cosine similarity between mention-surface profiles and candidate
    * profiles; returns (surface, entType, candidate, sim).
    */
  def score(
      candidatePairs: DataFrame, // (surface, entType, candidate)
      profiles: DataFrame // (surface, token, weight)
  ): DataFrame = {
    val spark = candidatePairs.sparkSession
    import spark.implicits._
    val mp = profiles.toDF("surface", "token", "mw")
    val cp = profiles.toDF("candidate", "token", "cw")
    candidatePairs
      .join(mp, Seq("surface"), "left")
      .join(cp, Seq("candidate", "token"), "left")
      .groupBy($"surface", $"entType", $"candidate")
      .agg(coalesce(sum($"mw" * $"cw"), lit(0.0)).as("sim"))
  }

  /** Char-bigram Jaccard between two surfaces (the cheap string-side signal
    * blended with the contextual one).
    */
  def bigramJaccard(a: String, b: String): Double = {
    def grams(s: String): Set[String] =
      if (s.length < 2) Set(s) else s.sliding(2).toSet
    val (ga, gb) = (grams(a), grams(b))
    val inter = ga.intersect(gb).size.toDouble
    val union = ga.union(gb).size.toDouble
    if (union == 0) 0.0 else inter / union
  }

  /** Full linking pass over pipeline artifacts: distinct mention surfaces →
    * candidates → blended score; accepted links become alias edges for
    * [[graft.canon.Canon]]. Returns (surface, entType, candidate, score).
    */
  def mentionTokens(arts: Dataset[SentenceArtifacts])(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    arts.flatMap { a =>
      val tokens = a.row.seg.map(_.word).filter(_.length >= 2)
      a.entities
        .filter(e => e.model == "ensemble_strong" && e.entName.length >= 2)
        .flatMap(e => tokens.map(t => (e.entName, e.entType, t)))
    }.toDF("surface", "entType", "token")
  }

  def linkTable(
      arts: Dataset[SentenceArtifacts],
      trieB: Broadcast[Trie],
      typeOfTag: Map[String, String],
      minScore: Double = 0.3
  )(implicit spark: SparkSession): DataFrame =
    linkTableFromTokens(mentionTokens(arts), trieB, typeOfTag, minScore)

  /** Same, but from a (surface, entType, token) table — the snapshot-stage
    * entry point used by the resumable runner.
    */
  def linkTableFromTokens(
      mentionTokens: DataFrame,
      trieB: Broadcast[Trie],
      typeOfTag: Map[String, String],
      minScore: Double = 0.3
  )(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val surfaces = mentionTokens.select($"surface", $"entType").distinct()
      .as[(String, String)]
    val cands = candidates(surfaces, trieB, typeOfTag)
    val profiles = contextProfiles(
      mentionTokens.select($"surface", $"token"))
    val ctxScore = score(cands, profiles)
    val blend = udf { (s: String, c: String, sim: Double) =>
      0.5 * bigramJaccard(s, c) + 0.5 * sim
    }
    ctxScore
      .withColumn("score", blend($"surface", $"candidate", $"sim"))
      .filter($"score" >= minScore)
      .select($"surface", $"entType", $"candidate", $"score")
  }

  /** Alias edges (hashed vertex ids) from accepted links. */
  def aliasEdges(links: DataFrame): DataFrame = {
    links
      .select(
        xxhash64(concat_ws("|", col("surface"), col("entType")))
          .bitwiseAND(lit(Long.MaxValue)).as("src"),
        xxhash64(concat_ws("|", col("candidate"), col("entType")))
          .bitwiseAND(lit(Long.MaxValue)).as("dst"))
  }
}
