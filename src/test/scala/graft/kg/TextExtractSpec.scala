package graft.kg

import org.scalatest.funsuite.AnyFunSuite

class TextExtractSpec extends AnyFunSuite {
  import TextExtract.extractText

  test("basic: first 3 non-empty <p> in #mw-content-text joined with ' '") {
    val html =
      """<html><body><div id="nav"><p>skip me</p></div>
        |<div id="mw-content-text"><div class="mw-parser-output">
        |<p>One.</p><p>  </p><p>Two.</p><p>Three.</p><p>Four.</p>
        |</div></div></body></html>""".stripMargin
    assert(extractText(html) == "One. Two. Three.")
  }

  test("infobox paragraphs are excluded (fallbacks.py:279-281)") {
    val html =
      """<div id="mw-content-text">
        |<table class="infobox"><tr><td><p>Infobox text</p></td></tr></table>
        |<p>Real text.</p></div>""".stripMargin
    assert(extractText(html) == "Real text.")
  }

  test("entities decoded, inline tags stripped, strip() applied") {
    val html =
      """<div id="mw-content-text"><p>  A &amp; <b>B</b> &lt;C&gt; &#228; &#x41;  </p></div>"""
    assert(extractText(html) == "A & B <C> ä A")
  }

  test("empty / degenerate inputs") {
    assert(extractText("") == "")
    assert(extractText("<p>no content div</p>") == "")
    assert(extractText("<div id=\"mw-content-text\"></div>") == "")
    assert(extractText(null: String) == "")
    val onlyInfobox =
      """<div id="mw-content-text"><div class="infobox"><p>x</p></div></div>"""
    assert(extractText(onlyInfobox) == "")
  }

  test("script/style content never leaks") {
    val html =
      """<div id="mw-content-text"><script>var p = "<p>evil</p>";</script>
        |<style>p { color: red }</style><p>Good.</p></div>""".stripMargin
    assert(extractText(html) == "Good.")
  }

  test("byte-identity invariant over the synthetic corpus (input_hint)") {
    val corpus = SyntheticCorpus.generate(nPages = 300, seed = 42L)
    corpus.pages.foreach { p =>
      val got = extractText(p.html)
      assert(got == p.text, s"extract_text mismatch for ${p.url}")
    }
  }

  test("byte-identity holds at a different seed (generator not overfit)") {
    val corpus = SyntheticCorpus.generate(nPages = 100, seed = 7L)
    corpus.pages.foreach { p =>
      assert(extractText(p.html) == p.text, s"mismatch for ${p.url}")
    }
  }
}
