package graft.kg

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Dataset, SparkSession}

/** Spark extract stage: pages → (entities, triples) in ONE fused
  * mapPartitions pass (SURVEY §2.3 E1-E3, §2.5 R1-R4, §2.6 D3/D6).
  *
  * Scale design: mention detection + all document-local rules are map-only —
  * the broadcast Aho-Corasick automaton is built once on the driver and
  * shared per executor, so 10^12 pages need zero shuffles until the
  * cross-document stages (dictionary joins, connected components, global
  * statistics). The `html` binary column is read only here; downstream
  * stages operate on the narrow extracted columns (column pruning keeps the
  * 100 TB scan out of every later stage — SURVEY §4.2).
  */
object KgExtract {

  /** Per-document output of the fused pass. `scrape` carries the first
    * 1200 chars of the extracted text (the exchars cap,
    * async_fetchers.py:235) so the linking stage's scrape fallback (L5)
    * never re-parses html. */
  final case class DocOut(url: String, scrape: String,
      entities: Seq[EntityRow], triples: Seq[TripleRow])

  /** Broadcastable gazetteer: automaton + per-pattern candidate lists. */
  final case class Gazetteer(
      automaton: AhoCorasick,
      candidates: Array[List[(String, String, String, Double)]]) // (canonical, qid, typ, prior)
    extends Serializable

  def buildGazetteer(aliases: Seq[AliasRow]): Gazetteer = {
    val surfaces = aliases.map(_.alias).distinct.sorted.toVector
    val byAlias = aliases.groupBy(_.alias)
    val cands = surfaces.map { s =>
      byAlias(s).sortBy(a => (-a.prior, a.canonical))
        .map(a => (a.canonical, a.qid, a.entity_type, a.prior)).toList
    }.toArray
    Gazetteer(AhoCorasick.build(surfaces), cands)
  }

  /** L14 candidate scoring: anchor prior + pairwise document coherence.
    * Coherence groups come from the Wikidata part_of hierarchy: a candidate
    * whose group (its part_of head, else itself) is shared with any
    * UNAMBIGUOUS mention in the same document gets a +0.2 boost — the
    * deterministic re-rank standing in for the reference's "first/best
    * search hit" (wikidata/service.py:329-331; context TF-IDF cosine is the
    * planned round-2 refinement). Tie-break: canonical asc.
    */
  val CoherenceBoost = 0.2

  def rawMentions(text: String, gaz: Gazetteer,
      partOf: Map[String, Set[String]]): Seq[DocProcess.RawMention] = {
    val found = gaz.automaton.find(text)
    def group(qid: String): String =
      partOf.getOrElse(qid, Set.empty).headOption.getOrElse(qid)
    // context = groups of unambiguous mentions
    val contextGroups: Set[String] = found.iterator
      .map { case (pid, _, _) => gaz.candidates(pid) }
      .collect { case single :: Nil => group(single._2) }
      .toSet
    found.map { case (pid, s, e) =>
      val cands = gaz.candidates(pid)
      val (canonical, qid, typ, prior) = cands match {
        case single :: Nil => single
        case many => many.map { c =>
          val score = c._4 + (if (contextGroups.contains(group(c._2))) CoherenceBoost else 0.0)
          (c, score)
        }.minBy { case (c, score) => (-score, c._1) }._1
      }
      DocProcess.RawMention(text.substring(s, e), canonical, qid, typ, s, e, prior)
    }
  }

  /** The fused extract pass. `useHtml` exercises the byte-stable
    * extract_text path (input_hint invariant); with `useHtml=false` the
    * pre-extracted `text` column is trusted (the natural seam the reference
    * also exposes — api.py:239-240 pre-extracted entities). */
  def run(
      spark: SparkSession,
      pages: Dataset[PageRow],
      aliases: Seq[AliasRow],
      patterns: Seq[PatternRow],
      wdPartOf: Map[String, Set[String]],
      cfg: KgConfig,
      useHtml: Boolean = true): Dataset[DocOut] = {
    import spark.implicits._
    val bcGaz: Broadcast[Gazetteer] =
      spark.sparkContext.broadcast(buildGazetteer(aliases))
    val bcPats = spark.sparkContext.broadcast(
      patterns.groupBy(_.lang).map { case (l, ps) => l -> ps.map(p => p.middle -> p).toMap })
    val bcPartOf = spark.sparkContext.broadcast(wdPartOf)
    val bcCfg = spark.sparkContext.broadcast(cfg)

    pages.mapPartitions { it =>
      val gaz = bcGaz.value
      val pats = bcPats.value
      val partOf = bcPartOf.value
      val c = bcCfg.value
      it.map { p =>
        val text = if (useHtml) TextExtract.extractText(p.html) else p.text
        val ms = rawMentions(text, gaz, partOf)
        val (ents, trips) = DocProcess.process(p.url, text, p.lang, ms, pats, partOf, c)
        DocOut(p.url, text.take(1200), ents, trips)
      }
    }
  }
}
