package graft.functions

import scala.collection.mutable

/** Compiled Aho–Corasick automaton over a BOUNDED needle set — the
  * multi-pattern exact-substring matcher behind
  * [[graft.engine.TextOps.substringContamination]].
  *
  * Why an automaton and not a join: gram-based decontamination (q62/
  * q85) scales its join with the CORPUS gram count and only sees
  * matches that survive tokenization; an eval benchmark, by contrast,
  * is a bounded artifact (thousands of strings, MBs of text) even
  * when the corpus is 100 TB. Compiling the needles once into a
  * goto/fail/output automaton and broadcasting it turns exact
  * substring decontamination into ONE corpus scan at
  * O(text chars + matches) per document — no shuffle, no candidate
  * blowup from hot grams, and matches that cross token boundaries
  * (punctuation, casing variants normalized upstream) still hit.
  *
  * The structure is immutable after [[AhoCorasick.build]] and
  * Java-serializable, so one driver-side build broadcasts to every
  * executor. Memory is O(total needle chars): each trie node holds
  * one char-keyed map plus two ints.
  */
final class AhoCorasick private[functions] (
    gotoFn: Array[mutable.HashMap[Char, Int]],
    fail: Array[Int],
    out: Array[Array[Int]],
    dict: Array[Int],
    val nNeedles: Int)
    extends Serializable {

  /** Number of DISTINCT needles occurring in `text` as substrings.
    * One left-to-right pass; the dict-suffix chain is entered only at
    * positions where at least one needle ends, so total cost is
    * O(|text| + matches). */
  def countDistinct(text: String): Int = {
    if (text == null || nNeedles == 0) return 0
    val bits = new java.util.BitSet(nNeedles)
    var s = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      while (s != 0 && !gotoFn(s).contains(c)) s = fail(s)
      s = gotoFn(s).getOrElse(c, 0)
      var t = if (out(s).nonEmpty) s else dict(s)
      while (t >= 0) {
        val ids = out(t)
        var j = 0
        while (j < ids.length) { bits.set(ids(j)); j += 1 }
        t = dict(t)
      }
      i += 1
    }
    bits.cardinality()
  }
}

object AhoCorasick {

  /** Build the automaton: trie insert per needle, then one BFS pass
    * for failure links (longest proper suffix that is a trie path)
    * and dict links (nearest failure ancestor with output). Duplicate
    * needles share one id (the first); empty needles are ignored. */
  def build(needles: Array[String]): AhoCorasick = {
    val gotoB = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
    val outB = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
    val distinct = needles.filter(n => n != null && n.nonEmpty).distinct
    distinct.zipWithIndex.foreach { case (nd, id) =>
      var s = 0
      nd.foreach { c =>
        s = gotoB(s).getOrElseUpdate(c, {
          gotoB += mutable.HashMap.empty[Char, Int]
          outB += mutable.ArrayBuffer.empty[Int]
          gotoB.size - 1
        })
      }
      outB(s) += id
    }
    val nNodes = gotoB.size
    val fail = new Array[Int](nNodes)
    val dict = Array.fill(nNodes)(-1)
    val queue = mutable.Queue.empty[Int]
    gotoB(0).valuesIterator.foreach { v => fail(v) = 0; queue += v }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      dict(u) = if (outB(fail(u)).nonEmpty && fail(u) != u) fail(u) else dict(fail(u))
      gotoB(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !gotoB(f).contains(c)) f = fail(f)
        fail(v) = gotoB(f).get(c).filter(_ != v).getOrElse(0)
        queue += v
      }
    }
    new AhoCorasick(gotoB.toArray, fail, outB.map(_.toArray).toArray, dict,
      distinct.length)
  }
}
