package graft.kg

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class AhoCorasickSpec extends AnyFunSuite {

  /** Naive reference matcher: all occurrences of all patterns. */
  private def naiveAll(text: String, pats: Seq[String]): Set[(Int, Int, Int)] =
    (for {
      (p, pid) <- pats.zipWithIndex
      if p.nonEmpty
      start <- 0 to (text.length - p.length)
      if text.regionMatches(start, p, 0, p.length)
    } yield (pid, start, start + p.length)).toSet

  test("rawMatches equals naive scan on fixed patterns") {
    val pats = Seq("he", "she", "his", "hers", "a")
    val ac = AhoCorasick.build(pats)
    val text = "ushers say a hers his she"
    assert(ac.rawMatches(text).toSet == naiveAll(text, pats))
  }

  test("find: word boundaries + leftmost-longest non-overlap") {
    val pats = Seq("Albert Einstein", "Einstein", "Berg")
    val ac = AhoCorasick.build(pats)
    val text = "Albert Einstein bestieg den Berg. Einstein war dort. Bergen nicht."
    val got = ac.find(text).map { case (pid, s, e) => (pats(pid), s, e) }
    assert(got == Seq(
      ("Albert Einstein", 0, 15),
      ("Berg", 28, 32),
      ("Einstein", 34, 42))) // "Bergen" rejected: 'e' after "Berg" is a word char
  }

  test("property: rawMatches == naive on 500 random pattern/text draws") {
    val rng = new Random(42)
    def randStr(maxLen: Int): String = {
      val n = 1 + rng.nextInt(maxLen)
      (0 until n).map(_ => ('a' + rng.nextInt(3)).toChar).mkString
    }
    (0 until 500).foreach { _ =>
      val pats = (0 until 1 + rng.nextInt(8)).map(_ => randStr(4)).distinct
      val text = if (rng.nextBoolean()) randStr(60) else ""
      val ac = AhoCorasick.build(pats)
      assert(ac.rawMatches(text).toSet == naiveAll(text, pats),
        s"pats=$pats text=$text")
    }
  }

  test("property: find results are word-bounded, non-overlapping, leftmost-longest") {
    val rng = new Random(7)
    def randWord(): String =
      (0 until 1 + rng.nextInt(3)).map(_ => ('a' + rng.nextInt(3)).toChar).mkString
    (0 until 300).foreach { _ =>
      val pats = (0 until 1 + rng.nextInt(6)).map(_ => randWord()).distinct
      // build a text of space-separated words so boundaries exist
      val text = (0 until rng.nextInt(12)).map(_ => randWord()).mkString(" ")
      val ac = AhoCorasick.build(pats)
      val found = ac.find(text)
      // non-overlapping + sorted
      found.sliding(2).foreach {
        case Seq((_, _, e1), (_, s2, _)) => assert(e1 <= s2)
        case _ =>
      }
      found.foreach { case (pid, s, e) =>
        assert(text.substring(s, e) == pats(pid))
        assert(s == 0 || !Character.isLetterOrDigit(text.charAt(s - 1)))
        assert(e == text.length || !Character.isLetterOrDigit(text.charAt(e)))
      }
    }
  }
}
