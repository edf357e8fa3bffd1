package graft.kg

import java.nio.charset.StandardCharsets

/** Deterministic `extract_text(html): string` — the Spark stand-in for the
  * reference's BeautifulSoup scraping path:
  *
  *  - region: the `<div id="mw-content-text">` subtree
  *    (services/wikipedia/fallbacks.py:273 selector
  *    `#mw-content-text > .mw-parser-output`; utils/html_scrape_utils.py:44)
  *  - paragraphs: every `<p>` in the region whose ancestors do not include an
  *    element with class "infobox" (fallbacks.py:279-281
  *    `not p.find_parent(class_='infobox')`)
  *  - text: concatenated text nodes (tags stripped, entities decoded),
  *    Python-strip()ed; empty paragraphs skipped (fallbacks.py:280)
  *  - result: first 3 non-empty paragraphs joined with ' '
  *    (fallbacks.py:283 `' '.join(paragraphs[:3])`)
  *
  * Hand-rolled single-pass scanner (no jsoup) so the byte-identity invariant
  * (`input_hint`: extract_text(html) == text per url) is fully specified by
  * this file + the corpus generator. Codegen note: this is one of the three
  * opaque UDFs (SURVEY §4.2); it is isolated in the first projection so
  * downstream stages stay in WholeStageCodegen.
  */
object TextExtract extends Serializable {

  private val MaxParagraphs = 3

  def extractText(html: Array[Byte]): String =
    if (html == null) "" else extractText(new String(html, StandardCharsets.UTF_8))

  def extractText(html: String): String = {
    if (html == null || html.isEmpty) return ""
    val n = html.length
    var i = 0
    // element stack: (tagName, isContentRoot, isInfobox)
    var stack = List.empty[(String, Boolean, Boolean)]
    var contentDepth = 0 // >0 when inside #mw-content-text
    var infoboxDepth = 0
    var pDepth = 0
    val para = new StringBuilder
    val paras = scala.collection.mutable.ArrayBuffer.empty[String]

    def flushP(): Unit = {
      val t = TextUtils.pyStrip(decodeEntities(para.toString))
      if (t.nonEmpty && paras.length < MaxParagraphs) paras += t
      para.clear()
    }

    while (i < n && paras.length < MaxParagraphs) {
      val c = html.charAt(i)
      if (c == '<') {
        val close = html.indexOf('>', i)
        if (close < 0) { i = n } // truncated tag: stop
        else {
          val raw = html.substring(i + 1, close)
          if (raw.startsWith("!--")) {
            // comment: skip to -->
            val end = html.indexOf("-->", i)
            i = if (end < 0) n else end + 3
          } else if (raw.startsWith("!") || raw.startsWith("?")) {
            i = close + 1 // doctype / PI
          } else if (raw.startsWith("/")) {
            // closing tag
            val name = tagName(raw.substring(1))
            // pop up to and including the matching open tag (lenient)
            var popped = false
            while (!popped && stack.nonEmpty) {
              val (tn, isContent, isInfobox) = stack.head
              stack = stack.tail
              if (isContent) contentDepth -= 1
              if (isInfobox) infoboxDepth -= 1
              if (tn == "p" && pDepth > 0) { pDepth -= 1; flushP() }
              if (tn == name) popped = true
            }
            i = close + 1
          } else {
            val selfClosing = raw.endsWith("/") || isVoid(tagName(raw))
            val name = tagName(raw)
            if (!selfClosing) {
              val isContent = name == "div" && attr(raw, "id").contains("mw-content-text")
              val isInfobox = attr(raw, "class").exists(_.split("\\s+").contains("infobox"))
              stack = (name, isContent, isInfobox) :: stack
              if (isContent) contentDepth += 1
              if (isInfobox) infoboxDepth += 1
              if (name == "p") pDepth += 1
            }
            i = close + 1
            // skip raw-text elements entirely
            if (name == "script" || name == "style") {
              val end = html.toLowerCase.indexOf(s"</$name", i)
              i = if (end < 0) n else end
              if (stack.nonEmpty && stack.head._1 == name) stack = stack.tail
              if (i < n) { val c2 = html.indexOf('>', i); i = if (c2 < 0) n else c2 + 1 }
            }
          }
        }
      } else {
        if (pDepth > 0 && contentDepth > 0 && infoboxDepth == 0) para.append(c)
        i += 1
      }
    }
    paras.take(MaxParagraphs).mkString(" ")
  }

  private def tagName(raw: String): String = {
    var e = 0
    while (e < raw.length && !Character.isWhitespace(raw.charAt(e)) && raw.charAt(e) != '/') e += 1
    raw.substring(0, e).toLowerCase(java.util.Locale.ROOT)
  }

  /** Extract attribute value from a raw tag body (double/single-quoted). */
  private def attr(raw: String, name: String): Option[String] = {
    val lower = raw.toLowerCase(java.util.Locale.ROOT)
    var from = 0
    while (true) {
      val at = lower.indexOf(name + "=", from)
      if (at < 0) return None
      // must be a word boundary before
      if (at == 0 || !Character.isLetterOrDigit(lower.charAt(at - 1))) {
        val vstart = at + name.length + 1
        if (vstart < raw.length) {
          val q = raw.charAt(vstart)
          if (q == '"' || q == '\'') {
            val vend = raw.indexOf(q, vstart + 1)
            if (vend > 0) return Some(raw.substring(vstart + 1, vend))
          } else {
            var e = vstart
            while (e < raw.length && !Character.isWhitespace(raw.charAt(e))) e += 1
            return Some(raw.substring(vstart, e))
          }
        }
        return None
      }
      from = at + 1
    }
    None
  }

  private val VoidTags = Set("br", "hr", "img", "input", "meta", "link", "area",
    "base", "col", "embed", "source", "track", "wbr")
  private def isVoid(name: String): Boolean = VoidTags.contains(name)

  /** Decode the HTML entities the corpus grammar can produce. */
  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i)
        if (semi > i && semi - i <= 10) {
          val ent = s.substring(i + 1, semi)
          val dec: Option[String] = ent match {
            case "amp" => Some("&")
            case "lt" => Some("<")
            case "gt" => Some(">")
            case "quot" => Some("\"")
            case "apos" => Some("'")
            case "nbsp" => Some(" ")
            case e if e.startsWith("#x") || e.startsWith("#X") =>
              try Some(new String(Character.toChars(Integer.parseInt(e.substring(2), 16))))
              catch { case _: Exception => None }
            case e if e.startsWith("#") =>
              try Some(new String(Character.toChars(Integer.parseInt(e.substring(1)))))
              catch { case _: Exception => None }
            case _ => None
          }
          dec match {
            case Some(d) => sb.append(d); i = semi + 1
            case None => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
