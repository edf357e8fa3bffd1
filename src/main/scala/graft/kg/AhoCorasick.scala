package graft.kg

import scala.collection.mutable

/** Serializable Aho-Corasick automaton for multi-pattern mention scanning
  * (SURVEY §2.3 E1: deterministic stand-in for the reference's LLM entity
  * extraction, services/openai_service.py:224-354).
  *
  * Built once on the driver from the gazetteer, broadcast to executors,
  * scanned per partition (`mapPartitions`) so the build cost is amortized.
  *
  * Storage is FROZEN FLAT ARRAYS (SURVEY §7.6-4): per-node sorted edge
  * slices in one (char[], int[]) pair addressed by an offset index, flat
  * output lists, int fail/output links — no per-node boxed maps, so the
  * 10^6-alias gazetteer fits the 8 GB driver/broadcast budget (~tens of
  * bytes per trie node instead of a ~200-byte HashMap each). Goto lookup is
  * a binary search within the node's edge slice; the per-character output
  * walk follows precomputed OUTPUT LINKS (next emitting node on the fail
  * chain) instead of the full fail chain.
  *
  * `find` returns word-boundary-checked, leftmost-longest, non-overlapping
  * matches — the deterministic mention semantics mirrored by the test
  * oracle. Boundary parity with regex \b: '_' counts as a word character.
  */
final class AhoCorasick private (
    edgeOffset: Array[Int],  // node -> [start, end) into edgeChar/edgeTarget
    edgeChar: Array[Char],
    edgeTarget: Array[Int],
    fail: Array[Int],
    outLink: Array[Int],     // next node on the fail chain with output (0 = none)
    outOffset: Array[Int],   // node -> [start, end) into outPat
    outPat: Array[Int],
    patLen: Array[Int]
) extends Serializable {

  @inline private def goto(s: Int, c: Char): Int = {
    var lo = edgeOffset(s)
    var hi = edgeOffset(s + 1) - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val mc = edgeChar(mid)
      if (mc == c) return edgeTarget(mid)
      else if (mc < c) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  /** All raw matches as (patternId, start, endExclusive). */
  def rawMatches(text: String): Seq[(Int, Int, Int)] = {
    val res = mutable.ArrayBuffer.empty[(Int, Int, Int)]
    var state = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      var s = state
      var g = goto(s, c)
      while (s != 0 && g < 0) { s = fail(s); g = goto(s, c) }
      state = if (g >= 0) g else 0
      var o = if (outOffset(state + 1) > outOffset(state)) state else outLink(state)
      while (o != 0) {
        var k = outOffset(o)
        val end = outOffset(o + 1)
        while (k < end) {
          val pid = outPat(k)
          res += ((pid, i - patLen(pid) + 1, i + 1))
          k += 1
        }
        o = outLink(o)
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
    // leftmost-longest greedy: sort by (start asc, len desc, pid asc), skip
    // overlaps (the sort is over per-document match counts — small)
    val sorted = bounded.sortBy { case (pid, s, e) => (s, -(e - s), pid) }
    val res = mutable.ArrayBuffer.empty[(Int, Int, Int)]
    var lastEnd = 0
    sorted.foreach { case m @ (_, s, e) =>
      if (s >= lastEnd) { res += m; lastEnd = e }
    }
    res.toSeq
  }

  /** Frozen footprint in bytes (flat arrays only) — the broadcast payload. */
  def sizeBytes: Long =
    4L * (edgeOffset.length + edgeTarget.length + fail.length +
      outLink.length + outOffset.length + outPat.length + patLen.length) +
      2L * edgeChar.length
}

object AhoCorasick {
  def build(patterns: Seq[String]): AhoCorasick = {
    // --- trie construction (transient hashmaps, freed after freeze) ---
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

    // --- freeze into flat arrays ---
    val nEdges = gotoMaps.iterator.map(_.size).sum
    val edgeOffset = new Array[Int](n + 1)
    val edgeChar = new Array[Char](nEdges)
    val edgeTarget = new Array[Int](nEdges)
    var ep = 0
    var i = 0
    while (i < n) {
      edgeOffset(i) = ep
      val es = gotoMaps(i).toArray
      java.util.Arrays.sort(es, Ordering.by((x: (Char, Int)) => x._1))
      es.foreach { case (c, tgt) => edgeChar(ep) = c; edgeTarget(ep) = tgt; ep += 1 }
      i += 1
    }
    edgeOffset(n) = ep

    val nOut = outB.iterator.map(_.size).sum
    val outOffset = new Array[Int](n + 1)
    val outPat = new Array[Int](nOut)
    var op = 0
    i = 0
    while (i < n) {
      outOffset(i) = op
      outB(i).reverse.foreach { pid => outPat(op) = pid; op += 1 }
      i += 1
    }
    outOffset(n) = op

    // output links: next emitting node along the fail chain (BFS order
    // guarantees fail(v) is finalized before v)
    val outLink = new Array[Int](n)
    val bfs = mutable.Queue.empty[Int]
    gotoMaps(0).valuesIterator.foreach(bfs += _)
    while (bfs.nonEmpty) {
      val u = bfs.dequeue()
      val f = fail(u)
      outLink(u) = if (outOffset(f + 1) > outOffset(f)) f else outLink(f)
      gotoMaps(u).valuesIterator.foreach(bfs += _)
    }

    new AhoCorasick(edgeOffset, edgeChar, edgeTarget, fail, outLink,
      outOffset, outPat, patterns.map(_.length).toArray)
  }
}
