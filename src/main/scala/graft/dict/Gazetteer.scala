package graft.dict

import graft.model.Token
import scala.collection.mutable

/** Broadcast gazetteer trie + greedy longest-match tokenizer (reference
  * P5/J7).
  *
  * The reference tokenizes with jieba + a custom user dictionary sorted
  * longest-first (utils.py:61-63, pre_labeling.py:88-96). Our pinned,
  * deterministic replacement: greedy longest-match against a character trie;
  * characters not covered by any dictionary word become single-char tokens
  * with tag "x" (jieba's non-entity fallback as seen by
  * clean_and_save.py:461-463, where unknown flags map to "x").
  *
  * The trie is built once on the driver and broadcast — at 100 TB scale this
  * is the "broadcast alias trie" of the north star: O(dict) memory per
  * executor, zero shuffle for candidate generation.
  */
final class Trie extends Serializable {
  // Children keyed by char; flat HashMap per node. Values: tag if a word ends here.
  private[dict] final class Node extends Serializable {
    var children: mutable.HashMap[Char, Node] = null
    var tag: String = null
  }
  private val root = new Node
  private var maxLen = 0

  def add(word: String, tag: String): Unit = {
    if (word.isEmpty) return
    var n = root
    var i = 0
    while (i < word.length) {
      if (n.children == null) n.children = mutable.HashMap.empty
      n = n.children.getOrElseUpdate(word.charAt(i), new Node)
      i += 1
    }
    n.tag = tag
    if (word.length > maxLen) maxLen = word.length
  }

  /** Longest dictionary word starting at `from`; returns (endExclusive, tag)
    * or null.
    */
  def longestMatch(s: CharSequence, from: Int): (Int, String) = {
    var n = root
    var i = from
    var bestEnd = -1
    var bestTag: String = null
    while (i < s.length && n.children != null) {
      val c = n.children.getOrElse(s.charAt(i), null)
      if (c == null) i = s.length // stop
      else {
        n = c
        i += 1
        if (n.tag != null) { bestEnd = i; bestTag = n.tag }
      }
    }
    if (bestEnd < 0) null else (bestEnd, bestTag)
  }

  def size: Int = {
    def count(n: Node): Int =
      (if (n.tag != null) 1 else 0) +
        (if (n.children == null) 0 else n.children.valuesIterator.map(count).sum)
    count(root)
  }
}

object Gazetteer {

  /** Build the trie from surface → 2-letter jieba-style tag. */
  def buildTrie(dict: Map[String, String]): Trie = {
    val t = new Trie
    dict.foreach { case (w, tag) => t.add(w, tag) }
    t
  }

  /** Greedy longest-match tokenization producing end-exclusive spans that
    * tile the sentence exactly (property-tested): dictionary hits get their
    * tag, everything else becomes single-char "x" tokens.
    */
  def tokenize(trie: Trie, sentence: String): Seq[Token] = {
    val out = scala.collection.immutable.ArraySeq.newBuilder[Token]
    var i = 0
    val n = sentence.length
    while (i < n) {
      val m = trie.longestMatch(sentence, i)
      if (m != null) {
        out += Token(sentence.substring(i, m._1), m._2, i, m._1)
        i = m._1
      } else {
        out += Token(sentence.substring(i, i + 1), "x", i, i + 1)
        i += 1
      }
    }
    out.result()
  }
}
