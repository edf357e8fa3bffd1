package graft.kg

import org.scalatest.funsuite.AnyFunSuite

class TextUtilsSpec extends AnyFunSuite {
  import TextUtils._

  test("normName — relationships.py:112-134 cases") {
    assert(normName("  Dualism (theory) ") == "dualism")
    assert(normName("[Albert Einstein]") == "albert einstein")
    assert(normName("Zugspitze") == "zugspitze")
    assert(normName("") == "")
    assert(normName(null) == "")
    assert(normName("A (b) c (d)") == "a") // cut at FIRST '('
    assert(normName("[x (y)]") == "x")
    assert(normName("no-close (paren") == "no-close (paren") // needs both ( and )
  }

  test("chunk_text — text_utils.py:90-112 semantics") {
    assert(chunkText("abcdefghij", 4, 0) == Seq("abcd", "efgh", "ij"))
    assert(chunkText("abcdefghij", 4, 2) == Seq("abcd", "cdef", "efgh", "ghij"))
    assert(chunkText("abc", 10, 2) == Seq("abc"))
    assert(chunkText("", 4) == Seq.empty)
    // last chunk short, no dangling overlap chunk when end==length
    assert(chunkText("abcde", 4, 1) == Seq("abcd", "de"))
  }

  test("pyQuote / sanitize_wikipedia_url — text_utils.py:115-132") {
    assert(sanitizeWikipediaUrl("https://de.wikipedia.org/wiki/Albert Einstein")
      == "https://de.wikipedia.org/wiki/Albert_Einstein")
    assert(sanitizeWikipediaUrl("https://de.wikipedia.org/wiki/Zugspitze (Berg)")
      == "https://de.wikipedia.org/wiki/Zugspitze_(Berg)")
    // umlauts percent-encoded as UTF-8, '%' preserved (safe set "_()%-")
    assert(sanitizeWikipediaUrl("https://de.wikipedia.org/wiki/München")
      == "https://de.wikipedia.org/wiki/M%C3%BCnchen")
    assert(sanitizeWikipediaUrl("no wiki part") == "no wiki part")
  }

  test("dbpediaUri — dbpedia/service.py:160-193") {
    assert(dbpediaUri("prism (optics)") == "http://dbpedia.org/resource/Prism_(optics)")
    assert(dbpediaUri("Albert Einstein") == "http://dbpedia.org/resource/Albert_Einstein")
    assert(dbpediaUri("") == "")
    assert(dbpediaUri("a%b") == "http://dbpedia.org/resource/A%25b") // '%' NOT safe here
    assert(dbpediaUri("München") == "http://dbpedia.org/resource/M%C3%BCnchen")
  }

  test("detect_language — language_utils.py:15-66") {
    assert(detectLanguage("der Hund ist in dem Haus und die Katze") == "de")
    assert(detectLanguage("the cat is on the mat and the dog") == "en")
    assert(detectLanguage("xy") == null) // < 3 chars
    assert(detectLanguage("zzz qqq kkk") == "en") // no markers, no umlauts → en
    assert(detectLanguage("zzz äöü qqq") == "de") // umlaut fallback
    assert(detectLanguage("le chat est dans la maison pour un moment") == "fr")
  }

  test("cleanTitle / stripTrailingEllipsis / isValidWikipediaUrl") {
    assert(cleanTitle("Berlin  (Stadt)") == "Berlin")
    assert(cleanTitle("A  B   C") == "A B C")
    assert(stripTrailingEllipsis("Hello...") == "Hello")
    assert(stripTrailingEllipsis("Hello…") == "Hello")
    assert(stripTrailingEllipsis("Hello..") == "Hello..") // needs 3+ dots
    assert(isValidWikipediaUrl("https://de.wikipedia.org/wiki/Zugspitze"))
    assert(!isValidWikipediaUrl("https://example.com/wiki/Zugspitze"))
  }

  test("seqRatio matches difflib.SequenceMatcher.ratio() goldens") {
    val eps = 1e-12
    assert(math.abs(seqRatio("arbeitet mit", "arbeitete mit") - 0.96) < eps)
    assert(math.abs(seqRatio("liegt in", "liegt im Gebiet von") - 0.5925925925925926) < eps)
    assert(math.abs(seqRatio("works with", "worked with") - 0.8571428571428571) < eps)
    assert(seqRatio("entwickelte", "entwickelte") == 1.0)
    assert(seqRatio("abc", "xyz") == 0.0)
    assert(seqRatio("", "") == 1.0)
    assert(seqRatio("a", "") == 0.0)
    assert(math.abs(seqRatio("gründete", "gründet") - 0.9333333333333333) < eps)
    assert(math.abs(seqRatio("ist teil von", "is part of") - 0.45454545454545453) < eps)
    assert(math.abs(seqRatio("besuchte", "erforschte") - 0.6666666666666666) < eps)
  }

  test("P6 parseWikipediaUrl — wikipedia/service.py:145-156 cases") {
    import TextUtils._
    assert(parseWikipediaUrl("https://de.wikipedia.org/wiki/Albert_Einstein") ==
      ("de", "Albert Einstein"))
    // percent-encoded umlaut round-trips through unquote
    assert(parseWikipediaUrl("https://de.wikipedia.org/wiki/M%C3%BCnchen") ==
      ("de", "München"))
    assert(parseWikipediaUrl("https://en.wikipedia.org/wiki/Paris_(Texas)") ==
      ("en", "Paris (Texas)"))
    // no /wiki/ segment → ("", "")
    assert(parseWikipediaUrl("https://example.com/page/1") == ("", ""))
    assert(parseWikipediaUrl("not a url at all") == ("", ""))
    assert(parseWikipediaUrl(null) == ("", ""))
    // malformed escape passes through (Python unquote parity)
    assert(pyUnquote("a%ZZb%20c") == "a%ZZb c")
  }

  test("entityId is deterministic sha1") {
    assert(entityId("u", "e") == entityId("u", "e"))
    assert(entityId("u", "e") != entityId("u", "f"))
    assert(entityId("u", "e").matches("[0-9a-f]{40}"))
  }
}
