package graft.kg

import scala.collection.mutable

/** Serializable Aho-Corasick automaton for multi-pattern mention scanning
  * (SURVEY §2.3 E1: deterministic stand-in for the reference's LLM entity
  * extraction, services/openai_service.py:224-354).
  *
  * Built once on the driver from the gazetteer, broadcast to executors,
  * scanned per partition (`mapPartitions`) so the build cost is amortized.
  * Node storage is flat arrays (goto map per node, fail/output arrays) —
  * compact enough to broadcast at 10^6 patterns; patterns are matched
  * case-sensitively (the gazetteer carries the surface-form variants).
  *
  * `find` returns word-boundary-checked, leftmost-longest, non-overlapping
  * matches — the deterministic mention semantics mirrored by the test
  * oracle.
  */
final class AhoCorasick private (
    gotoMaps: Array[mutable.HashMap[Char, Int]],
    fail: Array[Int],
    out: Array[List[Int]], // pattern ids terminating at node
    patLen: Array[Int]
) extends Serializable {

  /** All raw matches as (patternId, start, endExclusive). */
  def rawMatches(text: String): Seq[(Int, Int, Int)] = {
    val res = mutable.ArrayBuffer.empty[(Int, Int, Int)]
    var state = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      var s = state
      while (s != 0 && !gotoMaps(s).contains(c)) s = fail(s)
      state = gotoMaps(s).getOrElse(c, 0)
      var o = state
      while (o != 0) {
        out(o).foreach { pid =>
          val len = patLen(pid)
          res += ((pid, i - len + 1, i + 1))
        }
        o = fail(o)
      }
      i += 1
    }
    res.toSeq
  }

  // regex \b parity: '_' counts as a word character (the DuckDB oracle for
  // kg_mentions uses \b, so boundary semantics must agree exactly)
  @inline private def isWordChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_'

  /** Word-boundary-checked, leftmost-longest, non-overlapping matches. */
  def find(text: String): Seq[(Int, Int, Int)] = {
    val bounded = rawMatches(text).filter { case (_, s, e) =>
      (s == 0 || !isWordChar(text.charAt(s - 1))) &&
      (e == text.length || !isWordChar(text.charAt(e)))
    }
    // leftmost-longest greedy: sort by (start asc, len desc, pid asc), skip overlaps
    val sorted = bounded.sortBy { case (pid, s, e) => (s, -(e - s), pid) }
    val res = mutable.ArrayBuffer.empty[(Int, Int, Int)]
    var lastEnd = 0
    sorted.foreach { case m @ (_, s, e) =>
      if (s >= lastEnd) { res += m; lastEnd = e }
    }
    res.toSeq
  }
}

object AhoCorasick {
  def build(patterns: Seq[String]): AhoCorasick = {
    val gotoMaps = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
    val outB = mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pid) =>
      var node = 0
      p.foreach { c =>
        node = gotoMaps(node).getOrElseUpdate(c, {
          gotoMaps += mutable.HashMap.empty[Char, Int]
          outB += Nil
          gotoMaps.length - 1
        })
      }
      outB(node) = pid :: outB(node)
    }
    val n = gotoMaps.length
    val fail = new Array[Int](n)
    val queue = mutable.Queue.empty[Int]
    gotoMaps(0).valuesIterator.foreach { v => fail(v) = 0; queue += v }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      gotoMaps(u).foreach { case (c, v) =>
        queue += v
        var f = fail(u)
        while (f != 0 && !gotoMaps(f).contains(c)) f = fail(f)
        fail(v) = if (gotoMaps(f).contains(c) && gotoMaps(f)(c) != v) gotoMaps(f)(c) else 0
      }
    }
    new AhoCorasick(gotoMaps.toArray, fail, outB.toArray.map(_.reverse), patterns.map(_.length).toArray)
  }
}
