package graft.kg

import java.sql.Timestamp
import scala.collection.mutable
import scala.util.Random

/** Deterministic synthetic web-page corpus + dictionary tables
  * (FIXTURES.md §1-2). One seed drives everything; the generator emits the
  * page HTML *and* the expected extracted text together from one grammar, so
  * the `extract_text(html) == text` invariant (BASELINE.json input_hint) is
  * checkable by construction.
  *
  * Content shape mirrors the reference's own e2e corpus
  * (/root/reference/examples/minimal_extract.py:30-34 Zugspitze text):
  * German/English prose sentences embedding gazetteer entity names with
  * relation-pattern middles. Head-entity skew is built in via a Zipf
  * distribution over entity popularity, so the skew-salting path is
  * exercised at test scale (SURVEY §7.6-3).
  */
object SyntheticCorpus {

  final case class Entity(idx: Int, name: String, typ: String, qid: String)

  final case class Corpus(
      pages: Seq[PageRow],
      entities: Seq[Entity],
      aliases: Seq[AliasRow],
      patterns: Seq[PatternRow],
      wikiPages: Seq[WikiPageRow],
      redirects: Seq[RedirectRow],
      wdEntities: Seq[WdEntityRow],
      dbpedia: Seq[DbpediaRow],
      synonyms: Seq[SynonymRow])

  private val firstNames = Vector("Anna", "Bruno", "Clara", "David", "Emil",
    "Frieda", "Georg", "Hanna", "Ivo", "Julia", "Karl", "Lena", "Moritz",
    "Nora", "Otto", "Paula", "Quirin", "Rosa", "Stefan", "Tilda")
  private val lastNames = Vector("Achenbach", "Bergmann", "Clausen",
    "Dorfmeister", "Ebersbach", "Falkner", "Grünwald", "Hartmann", "Isenberg",
    "Jacobi", "Kellermann", "Lindner", "Mertens", "Neubauer", "Ostermann",
    "Pfeiffer", "Quandt", "Rosenthal", "Steinbach", "Tannhäuser", "Ullrich",
    "Vogelsang", "Wackern", "Zimmermann")
  private val ortPrefix = Vector("Alten", "Bieber", "Franken", "Gries",
    "Hohen", "Lang", "Mittel", "Neu", "Ober", "Unter")
  private val ortSuffix = Vector("bach", "berg", "burg", "dorf", "feld",
    "hausen", "heim", "stadt", "tal", "wald")
  private val orgKind = Vector("Institut für", "Akademie für", "Gesellschaft für",
    "Zentrum für", "Stiftung für", "Verein für")
  private val orgField = Vector("Physik", "Chemie", "Astronomie", "Geologie",
    "Mathematik", "Biologie", "Geschichte", "Philosophie")
  private val werkA = Vector("Abhandlung über", "Studie zu", "Geschichte der",
    "Theorie der", "Grundlagen der", "Analyse der", "Prinzipien der", "Kritik der")
  private val werkB = Vector("Optik", "Mechanik", "Wärme", "Elektrizität",
    "Sprache", "Logik", "Ethik", "Malerei")
  private val konA = Vector("Relativitäts", "Quanten", "Evolutions", "Feld",
    "Mengen", "Spiel", "Informations", "System", "Chaos", "Zahlen")
  private val konB = Vector("theorie", "mechanik", "lehre", "forschung",
    "analyse", "dynamik")
  private val types = Vector("Person", "Ort", "Organisation", "Werk", "Konzept")

  private def mkName(typ: String, j: Int): String = typ match {
    case "Person" =>
      val base = s"${firstNames(j % 20)} ${lastNames((j / 20) % 24)}"
      if (j >= 480) s"$base $j" else base
    case "Ort" =>
      val base = s"${ortPrefix(j % 10)}${ortSuffix((j / 10) % 10)}"
      if (j >= 100) s"$base $j" else base
    case "Organisation" =>
      val base = s"${orgKind(j % 6)} ${orgField((j / 6) % 8)}"
      if (j >= 48) s"$base $j" else base
    case "Werk" =>
      val base = s"${werkA(j % 8)} ${werkB((j / 8) % 8)}"
      if (j >= 64) s"$base $j" else base
    case _ =>
      val base = s"${konA(j % 10)}${konB((j / 10) % 6)}"
      if (j >= 60) s"$base $j" else base
  }

  /** Relation patterns (FIXTURES.md §2): predicate = lowercase
    * third-person-singular surface, per the reference's prompt rules
    * (core/api/relationships.py:477,518). */
  val patterns: Seq[PatternRow] = Seq(
    PatternRow("entwickelte", "entwickelte", "de", 0.9),
    PatternRow("liegt in", "liegt in", "de", 0.9),
    PatternRow("liegt im Gebiet von", "liegt in", "de", 0.8),
    PatternRow("arbeitet mit", "arbeitet mit", "de", 0.8),
    PatternRow("arbeitete mit", "arbeitete mit", "de", 0.75),
    PatternRow("gehört zu", "gehört zu", "de", 0.8),
    PatternRow("gründete", "gründete", "de", 0.9),
    PatternRow("erforschte", "erforschte", "de", 0.8),
    PatternRow("besuchte", "besuchte", "de", 0.7),
    PatternRow("developed", "developed", "en", 0.9),
    PatternRow("is located in", "is located in", "en", 0.9),
    PatternRow("works with", "works with", "en", 0.8),
    PatternRow("worked with", "worked with", "en", 0.75),
    PatternRow("founded", "founded", "en", 0.9),
    PatternRow("studied", "studied", "en", 0.8))

  private val fillersDe = Vector(
    "Danach folgte eine lange ruhige Phase.",
    "Viele Details blieben jedoch umstritten.",
    "Forschung &amp; Lehre blieben eng verbunden.",
    "Später wurde dies mehrfach überarbeitet.",
    "Die Quellenlage gilt als schwierig.")
  private val fillersEn = Vector(
    "A quiet period followed afterwards.",
    "Many details remained disputed.",
    "Research &amp; teaching stayed closely connected.",
    "This was revised several times later.",
    "The sources are considered difficult.")

  def typeQid(typ: String): String = typ match {
    case "Person" => "Q5"
    case "Ort" => "Q515"
    case "Organisation" => "Q43229"
    case "Werk" => "Q386724"
    case _ => "Q151885"
  }

  /** Serializable per-page generator: rebuilds the deterministic vocabulary
    * lazily on each executor, so the bench can synthesize pages DISTRIBUTED
    * (spark.range(n).mapPartitions) instead of materializing the corpus on
    * the driver — the sandbox stand-in for a distributed storage scan. */
  final class PageFactory(seed: Long, nEntities: Int) extends Serializable {
    @transient lazy val entities: IndexedSeq[Entity] = (0 until nEntities).map { i =>
      val typ = types(i % types.size)
      Entity(i, mkName(typ, i / types.size), typ, s"Q${1000 + i}")
    }
    @transient lazy val byName: Map[String, Entity] = {
      val m = entities.map(e => e.name -> e).toMap
      require(m.size == entities.size, "entity name collision in generator")
      m
    }
    @transient lazy val persons: IndexedSeq[Entity] = entities.filter(_.typ == "Person")
    val lastOf: Entity => String = (p: Entity) => p.name.split(" ")(1)
    @transient lazy val lastCounts: Map[String, Int] =
      persons.groupBy(lastOf).map { case (k, v) => k -> v.size }
    @transient lazy val lastAlias: Map[Int, String] = persons.flatMap { p =>
      val ln = lastOf(p)
      if (lastCounts(ln) == 1 && !byName.contains(ln)) Some(p.idx -> ln) else None
    }.toMap
    // Zipf popularity table over entities (head skew — SURVEY §7.6-3)
    @transient private lazy val cum: IndexedSeq[Double] =
      entities.indices.map(r => 1.0 / (r + 1)).scanLeft(0.0)(_ + _).tail
    def zipfPick(rng: Random): Entity = {
      val x = rng.nextDouble() * cum.last
      var lo = 0; var hi = cum.length - 1
      while (lo < hi) { val mid = (lo + hi) / 2; if (cum(mid) < x) lo = mid + 1 else hi = mid }
      entities(lo)
    }

    def page(pi: Int): PageRow = {
      val rng = new Random(seed * 1000003L + pi)
      val lang = if (rng.nextDouble() < 0.7) "de" else "en"
      val pagePatterns = patterns.filter(_.lang == lang)
      val fillers = if (lang == "de") fillersDe else fillersEn
      val nSent = 4 + rng.nextInt(8)
      // Homonym surfaces have EQUAL priors — only the L14 context TF-IDF
      // cosine can disambiguate them, via the Markwort marker sentence
      // emitted alongside (the marker token appears in the intended
      // candidate's Wikidata description and nowhere else)
      val markers = mutable.ArrayBuffer.empty[String]
      val sentsBase = (0 until nSent).map { _ =>
        if (rng.nextDouble() < 0.6) {
          val a = zipfPick(rng)
          var b = zipfPick(rng)
          var guard = 0
          while (b.idx == a.idx && guard < 5) { b = zipfPick(rng); guard += 1 }
          val pat = pagePatterns(rng.nextInt(pagePatterns.size))
          // surface form: ambiguous alias (prior-disambiguation path) >
          // equal-prior homonym (tfidf path) > unique last name > canonical
          def surface(e: Entity): String = {
            val r = rng.nextDouble()
            if ((e.idx % 10 == 0 || e.idx % 10 == 5) && r < 0.15) s"Ambigon${e.idx / 10}"
            else if ((e.idx % 10 == 1 || e.idx % 10 == 6) && r < 0.15) {
              markers += s"Markwort${e.idx}"
              s"Homonym${e.idx / 10}"
            }
            else if (r < 0.35) lastAlias.getOrElse(e.idx, e.name)
            else e.name
          }
          val surfA = surface(a)
          val surfB = surface(b)
          s"$surfA ${pat.middle} $surfB."
        } else fillers(rng.nextInt(fillers.size))
      }
      val sents = sentsBase ++
        markers.distinct.map(m => s"Die Quelle nennt $m ausdrücklich.")
      // distribute into paragraphs; ~20% of pages get a 4th paragraph that
      // extract_text must drop (first-3 rule, fallbacks.py:283)
      val nParas = if (rng.nextDouble() < 0.2) 4 else 3
      val paras = Array.fill(nParas)(mutable.ArrayBuffer.empty[String])
      sents.zipWithIndex.foreach { case (s, i) => paras(i % nParas) += s }
      val paraHtml = paras.map(p => p.mkString(" "))
      // expected text: entity-decoded paragraph text, first 3 non-empty
      val paraText = paraHtml.map(h => TextExtract.decodeEntities(h))
      val expected = paraText.filter(_.nonEmpty).take(3).mkString(" ")
      val infoboxEntity = zipfPick(rng)
      val html =
        s"""<html><head><title>Seite $pi</title></head><body>
           |<div id="nav"><p>Navigation</p></div>
           |<div id="mw-content-text"><div class="mw-parser-output">
           |<table class="infobox"><tr><td><p>Infobox: ${infoboxEntity.name}</p></td></tr></table>
           |${paraHtml.map(p => s"<p>$p</p>").mkString("\n<p>  </p>\n")}
           |</div></div>
           |<div id="footer"><p>Impressum &amp; Kontakt</p></div>
           |</body></html>""".stripMargin
      PageRow(
        url = s"https://site-${pi % 50}.example/page-$pi",
        warc_ts = new Timestamp(1704067200000L + pi * 97000L),
        html = html.getBytes("UTF-8"),
        text = expected,
        lang = lang)
    }
  }

  def generate(nPages: Int, seed: Long = 42L, nEntities: Int = 120): Corpus = {
    val factory = new PageFactory(seed, nEntities)
    val entities = factory.entities
    val persons = factory.persons
    val lastAlias = factory.lastAlias

    // ---- aliases (gazetteer) ----
    val aliasRows = mutable.ArrayBuffer.empty[AliasRow]
    entities.foreach { e =>
      aliasRows += AliasRow(e.name, e.name, e.qid, e.typ, 1.0, "de")
    }
    // last-name alias for persons whose last name is unique in the vocab
    lastAlias.foreach { case (idx, ln) =>
      val p = entities(idx)
      aliasRows += AliasRow(ln, p.name, p.qid, p.typ, 1.0, "de")
    }
    // ambiguous aliases: every 10th pair shares a surface form. The two
    // candidates come from DIFFERENT part_of groups (idx 10g vs 10g+5, both
    // group heads) with close priors, so the L14 coherence re-rank — not
    // the anchor prior alone — decides when context supports the underdog.
    entities.grouped(10).zipWithIndex.foreach { case (group, g) =>
      if (group.size >= 6) {
        val a = group(0); val b = group(5)
        aliasRows += AliasRow(s"Ambigon$g", a.name, a.qid, a.typ, 0.55, "de")
        aliasRows += AliasRow(s"Ambigon$g", b.name, b.qid, b.typ, 0.45, "de")
      }
      // equal-prior homonym pair: anchor prior and coherence cannot
      // separate these — only the context TF-IDF cosine (L14) can
      if (group.size >= 7) {
        val a = group(1); val b = group(6)
        aliasRows += AliasRow(s"Homonym$g", a.name, a.qid, a.typ, 0.5, "de")
        aliasRows += AliasRow(s"Homonym$g", b.name, b.qid, b.typ, 0.5, "de")
      }
    }

    val pages = (0 until nPages).map(factory.page)

    // ---- dictionaries ----
    val detRng = new Random(seed * 7919L)
    // Fallback-path fixtures by idx class (each L-stage has entities that
    // resolve ONLY through it):
    //   idx%20==7  → no wiki page at all; idx%40==27 resolves via the L4
    //                synonym stage (synonym → part_of group head's page),
    //                idx%40==7 falls through to L5 scrape / not_found
    //   idx%20==17 → de page exists only under a LONGER title, no en page,
    //                no redirect → resolves only via L3 opensearch prefix
    //   otherwise  → de+en pages; idx%7==3 has a short de extract
    //                (needs_fallback → L2 language fallback when the en
    //                extract is long enough)
    val wikiPages = entities.flatMap { e =>
      val longBody = s"${e.name} ist ein bedeutendes Thema der Kategorie ${e.typ}. " * 3
      val cats = Seq(s"Kategorie:${e.typ}", s"Kategorie:Themen") ++
        (if (e.idx % 5 == 0) Seq("Articles with short description", "Wikipedia stub") else Nil)
      val links = entities.filter(x => x.idx != e.idx && x.idx % 17 == e.idx % 17)
        .take(5).map(_.name)
      if (e.idx % 20 == 7) Nil
      else if (e.idx % 20 == 17) {
        val longTitle = s"${e.name} (Ausführlich)"
        Seq(WikiPageRow(longTitle, "de",
          s"https://de.wikipedia.org/wiki/${longTitle.replace(' ', '_')}",
          longBody.trim, cats, links, e.qid, Map.empty, s"thumb-${e.idx}.jpg"))
      } else {
        val shortBody = s"${e.name}: kurzer Eintrag."
        val extract = if (e.idx % 7 == 3) shortBody else longBody.trim
        Seq(
          WikiPageRow(e.name, "de", s"https://de.wikipedia.org/wiki/${e.name.replace(' ', '_')}",
            extract, cats, links, e.qid, Map("en" -> s"${e.name} (en)"), s"thumb-${e.idx}.jpg"),
          WikiPageRow(s"${e.name} (en)", "en", s"https://en.wikipedia.org/wiki/${e.name.replace(' ', '_')}",
            s"${e.name} is a notable ${e.typ} covered at length in this corpus. " * 2,
            cats, links, e.qid, Map("de" -> e.name), s"thumb-${e.idx}.jpg"))
      }
    }
    // L4 synonym dictionary: rank 1 deliberately points at a nonexistent
    // title (the stage must try candidates IN ORDER), rank 2 at the part_of
    // group head's real page
    val synonyms = entities.collect {
      case e if e.idx % 40 == 27 =>
        val head = entities(e.idx - e.idx % 5)
        Seq(SynonymRow(e.name, s"${e.name} Alt", 1),
            SynonymRow(e.name, head.name, 2))
    }.flatten
    val redirects = entities.collect {
      case e if e.idx % 4 == 1 => RedirectRow(s"${e.name} (Begriffsklärung)", e.name, "de")
    } ++ persons.flatMap { p =>
      lastAlias.get(p.idx).map(ln => RedirectRow(ln, p.name, "de"))
    }
    // type-class entities (Q5 human, Q515 city, ...) carry the labels the
    // instance_of/subclass_of enrichment resolves against — empty
    // descriptions so they contribute nothing to the IDF corpus shape
    val typeEntities = Seq(
      ("Q5", "Mensch", "human"), ("Q515", "Stadt", "city"),
      ("Q43229", "Organisation", "organization"),
      ("Q386724", "Werk", "work"), ("Q151885", "Begriff", "concept"))
      .map { case (q, de, en) =>
        WdEntityRow(q, Map("de" -> de, "en" -> en), Map.empty, Map.empty,
          Nil, Nil, Nil, Nil, Map.empty)
      }
    val wdEntities = entities.map { e =>
      val head = entities(e.idx - e.idx % 5) // group head for part_of
      WdEntityRow(
        qid = e.qid,
        labels = Map("de" -> e.name, "en" -> e.name),
        descriptions = Map(
          "de" -> s"${e.typ} aus dem Korpus Markwort${e.idx}",
          "en" -> s"a ${e.typ}"),
        aliases = Map("de" -> Seq(e.name.toLowerCase(java.util.Locale.ROOT))),
        instance_of = Seq(typeQid(e.typ)),
        // group heads are classes: subclass of their type class (P279)
        subclass_of = if (e.idx % 5 == 0) Seq(typeQid(e.typ)) else Nil,
        part_of = if (e.idx % 5 != 0) Seq(head.qid) else Nil,
        has_part = if (e.idx % 5 == 0) entities.filter(x => x.idx / 5 == e.idx / 5 && x.idx != e.idx).map(_.qid) else Nil,
        sitelinks =
          if (e.idx % 20 == 17) Map("dewiki" -> s"${e.name} (Ausführlich)")
          else Map("dewiki" -> e.name, "enwiki" -> s"${e.name} (en)"),
        // L12 scalar properties, deterministic per type/idx
        // (wikidata/formatters.py:196-250 flat projection)
        coordinates = if (e.typ == "Ort")
          Some(CoordRow(47.0 + (e.idx % 90) / 10.0, 8.0 + (e.idx % 180) / 10.0))
          else None,
        image_url = if (e.idx % 2 == 0) s"https://commons.example/img-${e.idx}.jpg" else null,
        date_of_birth = if (e.typ == "Person") f"+${1850 + e.idx % 150}%04d-01-01T00:00:00Z" else null,
        date_founded = if (e.typ == "Organisation") f"+${1800 + e.idx % 200}%04d-06-01T00:00:00Z" else null,
        date_of_death = if (e.typ == "Person" && e.idx % 3 == 0) f"+${1920 + e.idx % 100}%04d-12-31T00:00:00Z" else null,
        end_time = if (e.typ == "Organisation" && e.idx % 4 == 2) f"+${1990 + e.idx % 30}%04d-01-01T00:00:00Z" else null,
        official_website = if (e.typ == "Organisation") s"https://org-${e.idx}.example" else null,
        gnd_id = if (e.typ == "Person") s"gnd-${100000 + e.idx}" else null,
        isni_id = if (e.typ == "Person" && e.idx % 2 == 1) f"0000 0001 ${e.idx}%04d 0000" else null)
    } ++ typeEntities
    val dbpedia = entities.collect {
      // ~30% missing the en abstract → status "not_found" under the strict
      // linked criterion (dbpedia/service.py:271-276). idx%9==3 resources
      // live under a DISAMBIGUATED name (construction from the en label
      // misses) → linkable only via the S6 Lookup fallback.
      case e if e.idx % 3 != 2 =>
        val head = entities(e.idx - e.idx % 5)
        def res(n: String) = s"http://dbpedia.org/resource/${n.replace(' ', '_')}"
        DbpediaRow(
          uri = TextUtils.dbpediaUri(
            if (e.idx % 9 == 3) s"${e.name} (Begriff)" else e.name),
          label_en = e.name,
          abstract_en = if (e.idx % 3 == 0) s"${e.name} is a ${e.typ} in the corpus." else null,
          types = Seq(s"dbo:${e.typ}"),
          categories = Seq(s"dbc:${e.typ}s"),
          subjects = Seq(s"http://dbpedia.org/resource/Category:${e.typ}_topics"),
          part_of = if (e.idx % 5 != 0) Seq(res(head.name)) else Nil,
          has_part = if (e.idx % 5 == 0)
            entities.filter(x => x.idx / 5 == e.idx / 5 && x.idx != e.idx)
              .map(x => res(x.name)) else Nil)
    }
    val _ = detRng
    Corpus(pages, entities, aliasRows.toSeq, patterns, wikiPages, redirects,
      wdEntities, dbpedia, synonyms)
  }
}
