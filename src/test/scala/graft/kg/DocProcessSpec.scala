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
