package graft.kg

import scala.collection.mutable

/** Single-threaded, Spark-free re-implementation of the reference semantics
  * (SURVEY §5.3). Deliberately written with naive algorithms — indexOf
  * scanning instead of Aho-Corasick, nested loops instead of joins — so a
  * parity match against the Spark pipeline validates the distributed
  * orchestration, not a shared code path. The parity gate (north_rule)
  * is P/R ≥ 0.95 on (subject, predicate, object).
  */
object Oracle {

  final case class OMention(surface: String, canonical: String, qid: String,
      typ: String, start: Int, end: Int, prior: Double)
  final case class OTriple(subject: String, predicate: String, obj: String, inferred: String)

  private def isWord(c: Char) = Character.isLetterOrDigit(c) || c == '_'

  /** Naive TF-IDF tables for the L14 context cosine, recomputed per call
    * with plain loops (no sharing with the engine's vectorised build). */
  private def naiveTok(s: String): Vector[String] =
    s.toLowerCase(java.util.Locale.ROOT)
      .split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty).toVector

  /** Naive multi-pattern scan: all alias occurrences via indexOf, word
    * boundaries, leftmost-longest non-overlapping selection, then L14
    * scoring (anchor prior + part_of-group coherence with unambiguous
    * document mentions, boost 0.2, + context TF-IDF cosine against the
    * candidate's description, weight cfg.tfidfWeight; tie-break canonical
    * asc). */
  def scan(text: String, aliases: Seq[AliasRow],
      partOf: Map[String, Set[String]] = Map.empty,
      descByQid: Map[String, String] = Map.empty,
      tfidfWeight: Double = KgConfig.default.tfidfWeight): Vector[OMention] = {
    // idf over the description corpus: ln(N/(1+df)) floored at 0
    val n = math.max(descByQid.size, 1)
    val df = mutable.HashMap.empty[String, Int]
    descByQid.values.foreach(d =>
      naiveTok(d).distinct.foreach(t => df(t) = df.getOrElse(t, 0) + 1))
    def idf(t: String): Double =
      df.get(t).map(c => math.max(math.log(n.toDouble / (1 + c)), 0.0)).getOrElse(0.0)
    // document context vector
    val docTf = mutable.HashMap.empty[String, Int]
    naiveTok(text).foreach(t => docTf(t) = docTf.getOrElse(t, 0) + 1)
    val docW = docTf.map { case (t, f) => t -> f * idf(t) }.filter(_._2 > 0)
    val docNorm = math.sqrt(docW.values.map(x => x * x).sum)
    def cosine(qid: String): Double = {
      val toks = naiveTok(descByQid.getOrElse(qid, ""))
      if (toks.isEmpty || docNorm == 0) return 0.0
      val tf = toks.groupBy(identity).map { case (t, g) => t -> g.length.toDouble }
      val w = tf.map { case (t, f) => t -> f * idf(t) }.filter(_._2 > 0)
      val norm = math.sqrt(w.values.map(x => x * x).sum)
      if (norm == 0) 0.0
      else w.map { case (t, x) => x * docW.getOrElse(t, 0.0) }.sum / (norm * docNorm)
    }
    val byAlias = aliases.groupBy(_.alias)
    val all = mutable.ArrayBuffer.empty[(Int, Int, String)] // (start, end, alias)
    byAlias.keys.foreach { a =>
      var from = 0
      var idx = text.indexOf(a, from)
      while (idx >= 0) {
        val end = idx + a.length
        val okL = idx == 0 || !isWord(text.charAt(idx - 1))
        val okR = end == text.length || !isWord(text.charAt(end))
        if (okL && okR) all += ((idx, end, a))
        from = idx + 1
        idx = text.indexOf(a, from)
      }
    }
    val picked = mutable.ArrayBuffer.empty[(Int, Int, String)]
    var lastEnd = 0
    all.sortBy { case (s, e, _) => (s, -(e - s)) }.foreach { m =>
      if (m._1 >= lastEnd) { picked += m; lastEnd = m._2 }
    }
    def grp(qid: String): String =
      partOf.getOrElse(qid, Set.empty).headOption.getOrElse(qid)
    val context: Set[String] = picked.flatMap { case (_, _, a) =>
      byAlias(a) match {
        case Seq(only) => Some(grp(only.qid))
        case _ => None
      }
    }.toSet
    picked.map { case (s, e, a) =>
      val cands = byAlias(a)
      val best =
        if (cands.size == 1) cands.head
        else cands.sortBy { c =>
          val score = c.prior +
            (if (context.contains(grp(c.qid))) 0.2 else 0.0) +
            tfidfWeight * cosine(c.qid)
          // same 9-decimal tie rounding as the engine
          (-math.rint(score * 1e9) / 1e9, c.canonical)
        }.head
      OMention(a, best.canonical, best.qid, best.entity_type, s, e, best.prior)
    }.toVector
  }

  /** Full per-document reference semantics; returns (capped entities, final
    * triples). Mirrors api.py:65-83 (dedup), settings caps, relationships
    * validation, deduplication.py D3/D6. */
  def processDoc(
      page: PageRow,
      aliases: Seq[AliasRow],
      patterns: Seq[PatternRow],
      wd: Seq[WdEntityRow],
      cfg: KgConfig): (Vector[(String, String)], Vector[OTriple]) = {

    val text = page.text
    val partOfAll = wd.map(w => w.qid -> w.part_of.toSet).toMap
    val descs = wd.map(w => w.qid -> w.descriptions.getOrElse("de", "")).toMap
    // P12: type restriction drops disallowed mentions entirely (invisible
    // to dedup AND pairing)
    val ms = scan(text, aliases, partOfAll, descs, cfg.tfidfWeight)
      .filter(m => cfg.allowedEntityTypes.forall(_.contains(m.typ)))

    // dedup by lowercase name, first wins; count frequency
    val order = mutable.ArrayBuffer.empty[String]
    val firstM = mutable.HashMap.empty[String, OMention]
    val freq = mutable.HashMap.empty[String, Int]
    ms.sortBy(_.start).foreach { m =>
      val k = m.canonical.toLowerCase(java.util.Locale.ROOT)
      if (!firstM.contains(k)) { order += k; firstM(k) = m }
      freq(k) = freq.getOrElse(k, 0) + 1
    }
    val capped = order.toVector
      .sortBy(k => (-freq(k), firstM(k).start, firstM(k).canonical))
      .take(cfg.maxEntities)
      .map(k => firstM(k))
    // E4: implied entities (part_of heads of explicit ones), explicit
    // overrides implicit on (normName, type) — entity_inference.py:150-154
    val implied: Vector[OMention] =
      if (!cfg.inferEntities) Vector.empty
      else {
        val qidInfo = aliases.groupBy(_.qid).map { case (q, as) =>
          val a = as.minBy(_.canonical); q -> (a.canonical, a.entity_type)
        }
        val have = capped.map(m => (TextUtils.normName(m.canonical), m.typ)).toSet
        capped
          .flatMap(m => partOfAll.getOrElse(m.qid, Set.empty[String]).toSeq.sorted
            .map(hq => (hq, m.surface)))
          .flatMap { case (hq, via) => qidInfo.get(hq).map { case (n, t) => (hq, n, t, via) } }
          .filter { case (_, _, t, _) => cfg.allowedEntityTypes.forall(_.contains(t)) }
          .filter { case (_, n, t, _) => !have.contains((TextUtils.normName(n), t)) }
          .distinctBy { case (_, n, t, _) => (TextUtils.normName(n), t) }
          .take(cfg.maxEntities)
          .map { case (hq, n, t, via) => OMention(via, n, hq, t, -1, -1, 0.0) }
      }
    val entAll = capped ++ implied
    val entitySet = entAll.map(m => TextUtils.normName(m.canonical)).toSet
    // first occurrence wins (explicit before implied)
    val entOf = entAll.foldLeft(Map.empty[String, OMention]) { (acc, m) =>
      val k = TextUtils.normName(m.canonical)
      if (acc.contains(k)) acc else acc + (k -> m)
    }

    // sentence split (same spec as the pipeline: end after [.!?]+ws/EOT)
    val sentBounds = mutable.ArrayBuffer.empty[(Int, Int)]
    var st = 0; var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (".!?".indexOf(c) >= 0 && (i + 1 == text.length || Character.isWhitespace(text.charAt(i + 1)))) {
        sentBounds += ((st, i + 1)); i += 1
        while (i < text.length && Character.isWhitespace(text.charAt(i))) i += 1
        st = i
      } else i += 1
    }
    if (st < text.length) sentBounds += ((st, text.length))

    val patMap = patterns.filter(p => p.lang == page.lang).map(p => p.middle -> p).toMap
    val trips = mutable.ArrayBuffer.empty[OTriple]
    sentBounds.foreach { case (ss, se) =>
      val in = ms.filter(m => m.start >= ss && m.end <= se).sortBy(_.start)
      var j = 0
      while (j + 1 < in.length) {
        val a = in(j); val b = in(j + 1)
        val between = text.substring(a.end, b.start).trim
        patMap.get(between) match {
          case Some(p)
              if entitySet.contains(TextUtils.normName(a.canonical)) &&
                 entitySet.contains(TextUtils.normName(b.canonical)) =>
            trips += OTriple(entOf(TextUtils.normName(a.canonical)).canonical,
              p.predicate,
              entOf(TextUtils.normName(b.canonical)).canonical, "explicit")
          case _ =>
        }
        j += 1
      }
    }
    val explicitCapped = trips.take(cfg.maxRelations).toVector

    // implicit part_of relations
    val partOfMap = partOfAll
    val relKeys = mutable.HashSet.empty[(Set[String], String)]
    explicitCapped.foreach(t => relKeys += ((Set(t.subject, t.obj), t.predicate)))
    val pred = if (page.lang == "en") "is part of" else "ist teil von"
    val implicits = mutable.ArrayBuffer.empty[OTriple]
    if (cfg.enableEntityInference) {
      val sortedEnts = entAll.sortBy(_.canonical)
      for (a <- sortedEnts; b <- sortedEnts if a.canonical != b.canonical) {
        if (implicits.length < cfg.implicitRelLimit &&
            partOfMap.getOrElse(a.qid, Set.empty).contains(b.qid) &&
            !relKeys.contains((Set(a.canonical, b.canonical), pred))) {
          relKeys += ((Set(a.canonical, b.canonical), pred))
          implicits += OTriple(a.canonical, pred, b.canonical, "implicit")
        }
      }
    }

    // D3 exact dedup, first wins
    val seen = mutable.LinkedHashSet.empty[(String, String, String, String)]
    val ordered = mutable.ArrayBuffer.empty[OTriple]
    (explicitCapped ++ implicits).foreach { t =>
      val k = (t.subject, t.predicate, t.obj, t.inferred)
      if (!seen.contains(k)) { seen += k; ordered += t }
    }

    // D6 fuzzy predicate collapse
    val byPair = mutable.LinkedHashMap.empty[Set[String], mutable.ArrayBuffer[OTriple]]
    ordered.foreach(t => byPair.getOrElseUpdate(Set(t.subject, t.obj), mutable.ArrayBuffer.empty) += t)
    val fin = mutable.ArrayBuffer.empty[OTriple]
    if (cfg.semanticDedup) {
      byPair.values.foreach { rs =>
        val used = mutable.HashSet.empty[Int]
        for (k <- rs.indices if !used(k)) {
          val cluster = mutable.ArrayBuffer(rs(k))
          for (l <- rs.indices if l > k && !used(l)) {
            if (TextUtils.seqRatio(rs(k).predicate, rs(l).predicate) >= cfg.predSimThreshold) {
              cluster += rs(l); used += l
            }
          }
          fin += cluster.minBy(_.predicate.length)
          used += k
        }
      }
    } else fin ++= ordered

    (entAll.map(m => (m.canonical, m.typ)), fin.toVector)
  }

  /** Corpus-level expected triples: set of (subject, predicate, object). */
  def expectedTriples(corpus: SyntheticCorpus.Corpus, cfg: KgConfig): Set[(String, String, String)] =
    corpus.pages.flatMap { p =>
      processDoc(p, corpus.aliases, corpus.patterns, corpus.wdEntities, cfg)._2
        .map(t => (t.subject, t.predicate, t.obj))
    }.toSet
}
