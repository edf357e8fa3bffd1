package graft.kg

import org.scalatest.funsuite.AnyFunSuite

class DocProcessSpec extends AnyFunSuite {
  import DocProcess._

  private def m(surface: String, canonical: String, start: Int,
      typ: String = "Konzept", qid: String = "Q1", prior: Double = 1.0) =
    RawMention(surface, canonical, qid, typ, start, start + surface.length, prior)

  private val pats = Map("de" -> Map(
    "entwickelte" -> PatternRow("entwickelte", "entwickelte", "de", 0.9),
    "arbeitet mit" -> PatternRow("arbeitet mit", "arbeitet mit", "de", 0.8),
    "arbeitete mit" -> PatternRow("arbeitete mit", "arbeitete mit", "de", 0.75)))

  test("sentence splitting: [.!?] + whitespace/EOT, offsets preserved") {
    assert(sentences("A. B! C?") == Vector((0, 2), (3, 5), (6, 8)))
    assert(sentences("No terminal") == Vector((0, 11)))
    assert(sentences("x.y. z.") == Vector((0, 4), (5, 7))) // "x.y." one sentence
    assert(sentences("") == Vector())
  }

  test("explicit triple extraction + R3 validation + D3 dedup") {
    val text = "Alpha entwickelte Beta. Alpha entwickelte Beta."
    val ms = Seq(m("Alpha", "Alpha", 0), m("Beta", "Beta", 18, qid = "Q2"),
      m("Alpha", "Alpha", 24), m("Beta", "Beta", 42, qid = "Q2"))
    val (ents, trips) = process("u", text, "de", ms, pats, Map.empty, KgConfig.default)
    assert(ents.map(_.entity).toSet == Set("Alpha", "Beta"))
    assert(trips.size == 1) // D3 collapses the duplicate
    assert(trips.head.subject == "Alpha" && trips.head.`object` == "Beta")
  }

  test("R4 cap: only the first MAX_RELATIONS triples in document order") {
    val cfg = KgConfig.default.copy(maxRelations = 2, enableEntityInference = false,
      semanticDedup = false)
    // 3 distinct triples across sentences
    val names = Seq("Aaa", "Bbb", "Ccc", "Ddd", "Eee", "Fff")
    val sb = new StringBuilder
    val ms = scala.collection.mutable.ArrayBuffer.empty[DocProcess.RawMention]
    names.grouped(2).foreach { case Seq(a, b) =>
      val s0 = sb.length
      sb.append(s"$a entwickelte $b. ")
      ms += m(a, a, s0)
      ms += m(b, b, s0 + a.length + 13)
    }
    val (_, trips) = process("u", sb.toString, "de", ms.toSeq, pats, Map.empty, cfg)
    assert(trips.size == 2)
    assert(trips.map(_.subject) == Vector("Aaa", "Ccc")) // document order kept
  }

  test("D6 collapse keeps shortest of similar predicates within a pair") {
    val text = "Alpha arbeitet mit Beta. Alpha arbeitete mit Beta."
    val ms = Seq(m("Alpha", "Alpha", 0), m("Beta", "Beta", 19, qid = "Q2"),
      m("Alpha", "Alpha", 25), m("Beta", "Beta", 45, qid = "Q2"))
    val (_, trips) = process("u", text, "de", ms, pats, Map.empty, KgConfig.default)
    assert(trips.map(_.predicate) == Vector("arbeitet mit")) // 0.96 ≥ 0.85 → shortest
  }

  test("R3 drops triples whose endpoint was cut by the entity cap") {
    val cfg = KgConfig.default.copy(maxEntities = 1, enableEntityInference = false)
    val text = "Alpha entwickelte Beta."
    // Alpha appears twice → higher freq → survives the cap; Beta cut
    val ms = Seq(m("Alpha", "Alpha", 0), m("Beta", "Beta", 18, qid = "Q2"))
    val (ents, trips) = process("u", text, "de", ms, pats, Map.empty, cfg)
    assert(ents.map(_.entity) == Vector("Alpha")) // freq tie → first start wins
    assert(trips.isEmpty)
  }

  test("P12 type restriction: disallowed mentions invisible to dedup AND pairing") {
    val cfg = KgConfig.default.copy(allowedEntityTypes = Some(Set("Konzept")))
    // "Alpha <Person> entwickelte Beta": with the Person dropped, Alpha and
    // Beta become ADJACENT and the middle no longer matches any pattern —
    // and the disallowed entity never appears in the output
    val text = "Alpha entwickelte Beta."
    val ms = Seq(m("Alpha", "Alpha", 0), m("Beta", "Beta", 18, qid = "Q2"),
      m("entwickelte", "Entwickler", 6, typ = "Person", qid = "Q9"))
    val (ents, trips) = process("u", text, "de", ms, pats, Map.empty, cfg)
    assert(ents.map(_.entity).toSet == Set("Alpha", "Beta"))
    assert(!ents.exists(_.entity_type == "Person"))
    // with the Person mention dropped, Alpha–Beta pair with middle
    // "entwickelte" IS a triple again (adjacency recomputed on survivors)
    assert(trips.size == 1)
    // without the restriction, the Person mention splits the pair
    val (_, trips2) = process("u", text, "de", ms, pats, Map.empty, KgConfig.default)
    assert(trips2.isEmpty)
  }

  test("E4 implied entities: part_of heads appear as implicit, explicit overrides") {
    val cfg = KgConfig.default.copy(inferEntities = true)
    val qidInfo = Map("QH" -> ("Haupt", "Konzept"), "QB" -> ("Beta", "Konzept"))
    val partOf = Map("QA" -> Set("QH"))
    val text = "Alpha."
    val ms = Seq(m("Alpha", "Alpha", 0, qid = "QA"))
    val (ents, trips) = process("u", text, "de", ms, pats, partOf, cfg, qidInfo)
    assert(ents.map(e => (e.entity, e.inferred)) ==
      Vector(("Alpha", "explicit"), ("Haupt", "implicit")))
    // the implied head also participates in R2 (implicit part_of relation)
    assert(trips.exists(t => t.subject == "Alpha" && t.`object` == "Haupt" &&
      t.inferred == "implicit"))
    // explicit overrides implicit: head mentioned in text stays explicit
    val ms2 = Seq(m("Alpha", "Alpha", 0, qid = "QA"), m("Haupt", "Haupt", 7, qid = "QH"))
    val (ents2, _) = process("u", "Alpha. Haupt.", "de", ms2, pats, partOf, cfg, qidInfo)
    assert(ents2.count(_.entity == "Haupt") == 1)
    assert(ents2.find(_.entity == "Haupt").get.inferred == "explicit")
  }

  test("oracle mirrors P12 + E4 on generated pages") {
    val corpus = SyntheticCorpus.generate(nPages = 80, seed = 7L)
    val cfg = KgConfig.default.copy(inferEntities = true,
      allowedEntityTypes = Some(Set("Person", "Ort", "Organisation", "Werk")))
    val gaz = KgExtract.buildGazetteer(corpus.aliases,
      corpus.wdEntities.map(w => w.qid -> w.descriptions.getOrElse("de", "")).toMap)
    val partOf = corpus.wdEntities.map(w => w.qid -> w.part_of.toSet).toMap
    val qidInfo = corpus.aliases.groupBy(_.qid).map { case (q, as) =>
      val a = as.minBy(_.canonical); q -> (a.canonical, a.entity_type)
    }
    var implicitSeen = 0
    corpus.pages.foreach { p =>
      val ms = KgExtract.rawMentions(p.text, gaz, partOf, cfg.tfidfWeight)
      val (ents, trips) = process(p.url, p.text, p.lang, ms, Map(
        "de" -> SyntheticCorpus.patterns.filter(_.lang == "de").map(x => x.middle -> x).toMap,
        "en" -> SyntheticCorpus.patterns.filter(_.lang == "en").map(x => x.middle -> x).toMap),
        partOf, cfg, qidInfo)
      val (oEnts, oTrips) = Oracle.processDoc(p, corpus.aliases,
        corpus.patterns, corpus.wdEntities, cfg)
      assert(ents.map(e => (e.entity, e.entity_type)) == oEnts, s"entities differ on ${p.url}")
      assert(trips.map(t => (t.subject, t.predicate, t.`object`, t.inferred)) ==
        oTrips.map(t => (t.subject, t.predicate, t.obj, t.inferred)),
        s"triples differ on ${p.url}")
      implicitSeen += ents.count(_.inferred == "implicit")
    }
    assert(implicitSeen > 0, "E4 never fired on the corpus — fixture degenerate")
  }

  test("implicit part_of relations respect _rel_key dedup and the cap") {
    val cfg = KgConfig.default.copy(implicitRelLimit = 1)
    val text = "Alpha. Beta. Gamma."
    val ms = Seq(m("Alpha", "Alpha", 0, qid = "QA"),
      m("Beta", "Beta", 7, qid = "QB"), m("Gamma", "Gamma", 13, qid = "QC"))
    val partOf = Map("QA" -> Set("QB"), "QC" -> Set("QB"))
    val (_, trips) = process("u", text, "de", ms, pats, partOf, cfg)
    val implicits = trips.filter(_.inferred == "implicit")
    assert(implicits.size == 1) // cap
    assert(implicits.head.subject == "Alpha") // alphabetical pair order
    assert(implicits.head.predicate == "ist teil von")
  }
}
