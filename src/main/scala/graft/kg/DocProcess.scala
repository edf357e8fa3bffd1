package graft.kg

import scala.collection.mutable

/** Document-local extract→relate semantics, executed as a single fused map
  * pass over pages (no shuffle — document-local rules deserve
  * document-local execution; at 10^12 pages a groupBy(url) for the per-doc
  * dedup/cap would be the dominant shuffle for zero semantic gain).
  *
  * Stages implemented here, with reference citations:
  *  - E2 per-doc entity dedup by lowercase name, first occurrence wins
  *    (api.py:75-83)
  *  - E3 MAX_ENTITIES cap, deterministic importance = mention frequency
  *    (settings.py:30; SURVEY §2.3)
  *  - R1 explicit SVO triples: adjacent mention pairs within a sentence with
  *    a pattern middle between them (stand-in for the relation prompt,
  *    core/api/relationships.py:418-606)
  *  - R3 validation: subject AND object must resolve into the capped entity
  *    list via normName (relationships.py:232-416)
  *  - R4 MAX_RELATIONS cap in document order (settings.py:38)
  *  - R2 implicit relations from KB part_of edges, deduped against existing
  *    by (frozenset{subj,obj}, predicate), capped at IMPLICIT_REL_LIMIT
  *    (relationships.py:608-763, _rel_key :741-755)
  *  - D3 exact-triple dedup on (s,p,o,inferred), first wins
  *    (deduplication.py:93-133)
  *  - D6 fuzzy predicate collapse per unordered entity pair at
  *    SequenceMatcher ratio ≥ 0.85, shortest predicate kept
  *    (deduplication.py:431-480)
  */
object DocProcess extends Serializable {

  final case class RawMention(
      surface: String, canonical: String, qid: String, typ: String,
      start: Int, end: Int, prior: Double)

  /** Sentence spans: a sentence ends after [.!?] when followed by
    * whitespace or end-of-text. */
  def sentences(text: String): Vector[(Int, Int)] = {
    val out = Vector.newBuilder[(Int, Int)]
    var start = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if ((c == '.' || c == '!' || c == '?') &&
          (i + 1 == text.length || Character.isWhitespace(text.charAt(i + 1)))) {
        out += ((start, i + 1))
        i += 1
        while (i < text.length && Character.isWhitespace(text.charAt(i))) i += 1
        start = i
      } else i += 1
    }
    if (start < text.length) out += ((start, text.length))
    out.result()
  }

  /** Predicate for the implicit KB-derived relation (R2). */
  def partOfPredicate(lang: String): String =
    if (lang == "en") "is part of" else "ist teil von"

  def process(
      url: String,
      text: String,
      lang: String,
      mentions: Seq[RawMention],
      patternsByLang: Map[String, Map[String, PatternRow]],
      partOf: Map[String, Set[String]], // qid -> part_of target qids
      cfg: KgConfig,
      qidInfo: Map[String, (String, String)] = Map.empty // qid -> (canonical, typ), for E4
      ): (Vector[EntityRow], Vector[TripleRow]) = {

    // ---- P12: entity-type restriction (settings.py:31 + prompt_utils.py
    // apply_type_restrictions — the LLM never emits disallowed types, so
    // here disallowed mentions are dropped before dedup/caps) ----
    val allowed = mentions.filter(m =>
      cfg.allowedEntityTypes.forall(_.contains(m.typ)))

    // ---- E2: dedup by lowercase canonical, first occurrence wins ----
    val groups = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[RawMention]]
    allowed.sortBy(m => (m.start, m.end)).foreach { m =>
      groups.getOrElseUpdate(m.canonical.toLowerCase(java.util.Locale.ROOT),
        mutable.ArrayBuffer.empty) += m
    }
    // ---- E3: cap by (freq desc, first start asc, canonical asc) ----
    val capped = groups.values.toVector
      .map { ms => (ms.head, ms.length) }
      .sortBy { case (first, freq) => (-freq, first.start, first.canonical) }
      .take(cfg.maxEntities)
    val explicitEntities = capped.map { case (m, freq) =>
      EntityRow(url, lang, TextUtils.entityId(url, m.canonical), m.canonical,
        m.qid, m.typ, m.surface, m.start, m.end, "explicit", freq)
    }

    // ---- E4: standalone implicit-entity stage (entity_inference.py:28-154;
    // deterministic LLM stand-in: entities IMPLIED by the KB — the part_of
    // heads of explicit entities). Merge rule :150-154: explicit overrides
    // implicit on the (name, type) key. P12 applies to inferred types too.
    val entities: Vector[EntityRow] =
      if (!cfg.inferEntities) explicitEntities
      else {
        val have = explicitEntities
          .map(e => (TextUtils.normName(e.entity), e.entity_type)).toSet
        val implied = explicitEntities
          .flatMap(e => partOf.getOrElse(e.qid, Set.empty[String]).toSeq.sorted
            .map(hq => (hq, e.citation)))
          .flatMap { case (hq, via) => qidInfo.get(hq).map { case (n, t) => (hq, n, t, via) } }
          .filter { case (_, _, t, _) => cfg.allowedEntityTypes.forall(_.contains(t)) }
          .filter { case (_, n, t, _) => !have.contains((TextUtils.normName(n), t)) }
          .distinctBy { case (_, n, t, _) => (TextUtils.normName(n), t) }
          .take(cfg.maxEntities)
          .map { case (hq, n, t, via) =>
            EntityRow(url, lang, TextUtils.entityId(url, n), n, hq, t,
              via, -1, -1, "implicit", 0)
          }
        explicitEntities ++ implied
      }
    val byNorm: Map[String, EntityRow] =
      entities.map(e => TextUtils.normName(e.entity) -> e).reverse.toMap

    if (!cfg.relationExtraction) return (entities, Vector.empty)

    // ---- R1: explicit SVO per sentence ----
    val pats = patternsByLang.getOrElse(lang, patternsByLang.getOrElse("de", Map.empty))
    val sents = sentences(text)
    // P12: disallowed mentions are invisible to pairing too
    val sorted = allowed.sortBy(_.start).toVector
    val rawTriples = Vector.newBuilder[TripleRow]
    sents.zipWithIndex.foreach { case ((ss, se), si) =>
      val inSent = sorted.filter(m => m.start >= ss && m.end <= se)
      inSent.sliding(2).foreach {
        case Seq(a, b) =>
          val between = TextUtils.pyStrip(text.substring(a.end, b.start))
          pats.get(between).foreach { p =>
            // R3: both endpoints must be in the capped entity list (normName)
            (byNorm.get(TextUtils.normName(a.canonical)),
             byNorm.get(TextUtils.normName(b.canonical))) match {
              case (Some(es), Some(eo)) =>
                rawTriples += TripleRow(url, es.entity, p.predicate, eo.entity,
                  "explicit", es.entity_type, eo.entity_type,
                  es.entity_id, eo.entity_id, si, p.confidence)
              case _ => // dropped by validation
            }
          }
        case _ =>
      }
    }
    // ---- R4: MAX_RELATIONS cap in document order ----
    val explicit = rawTriples.result().take(cfg.maxRelations)

    // ---- R2: implicit relations from part_of, _rel_key dedup, cap ----
    val relKeys = mutable.HashSet.empty[(Set[String], String)]
    explicit.foreach(t => relKeys += ((Set(t.subject, t.`object`), t.predicate)))
    val pred = partOfPredicate(lang)
    // hoisted: `for { a <- xs; b <- ys }` re-evaluates ys per outer element
    lazy val byEntityName = entities.sortBy(_.entity)
    val implicitTriples =
      if (!cfg.enableEntityInference) Vector.empty[TripleRow]
      else (for {
        a <- byEntityName
        b <- byEntityName
        if a.entity != b.entity
        if partOf.getOrElse(a.qid, Set.empty).contains(b.qid)
        if !relKeys.contains((Set(a.entity, b.entity), pred))
      } yield {
        relKeys += ((Set(a.entity, b.entity), pred))
        TripleRow(url, a.entity, pred, b.entity, "implicit",
          a.entity_type, b.entity_type, a.entity_id, b.entity_id,
          Int.MaxValue, 0.5)
      }).take(cfg.implicitRelLimit)

    // ---- D3: exact dedup on (s,p,o,lower(inferred)), first wins ----
    val seen = mutable.LinkedHashMap.empty[(String, String, String, String), TripleRow]
    (explicit ++ implicitTriples).foreach { t =>
      val k = (t.subject, t.predicate, t.`object`,
        t.inferred.toLowerCase(java.util.Locale.ROOT))
      if (!seen.contains(k)) seen += (k -> t)
    }
    var deduped = seen.values.toVector

    // ---- D6: fuzzy predicate collapse per unordered pair ----
    if (cfg.semanticDedup) deduped = collapsePredicates(deduped, cfg.predSimThreshold)

    (entities, deduped)
  }

  /** filter_semantically_similar_relationships — deduplication.py:431-480.
    * Group by frozenset{subject, object}; greedy similarity clustering in
    * list order; keep the shortest predicate per cluster (first-shortest on
    * ties, Python min stability). */
  def collapsePredicates(rels: Vector[TripleRow], threshold: Double): Vector[TripleRow] = {
    if (rels.length <= 1) return rels
    val grouped = mutable.LinkedHashMap.empty[Set[String], mutable.ArrayBuffer[TripleRow]]
    rels.foreach { r =>
      grouped.getOrElseUpdate(Set(r.subject, r.`object`), mutable.ArrayBuffer.empty) += r
    }
    val result = Vector.newBuilder[TripleRow]
    grouped.values.foreach { rs =>
      val used = mutable.HashSet.empty[Int]
      for (i <- rs.indices if !used.contains(i)) {
        val similar = mutable.ArrayBuffer(rs(i))
        for (j <- rs.indices if j > i && !used.contains(j)) {
          if (TextUtils.seqRatio(rs(i).predicate, rs(j).predicate) >= threshold) {
            similar += rs(j)
            used += j
          }
        }
        result += similar.minBy(_.predicate.length) // stable: first shortest
        used += i
      }
    }
    result.result()
  }
}
