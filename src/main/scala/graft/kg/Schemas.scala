package graft.kg

import java.sql.Timestamp

/** Typed row models for the KG pipeline (SURVEY.md §1).
  * One case class per table; Spark `Encoders.product` derives the schema.
  */

/** Input table per BASELINE.json input_hint:
  * pages(url, warc_ts, html, text, lang). */
final case class PageRow(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Gazetteer row (FIXTURES.md §2 `aliases`): surface form → canonical. */
final case class AliasRow(
    alias: String,
    canonical: String,
    qid: String,
    entity_type: String,
    prior: Double,
    lang: String)

/** A detected mention in a page (reference: one parsed LLM entity line,
  * services/openai_service.py:309-345; citation = exact matched span). */
final case class MentionRow(
    url: String,
    surface: String,
    canonical: String,
    qid: String,
    entity_type: String,
    start: Int,
    end: Int,
    citation: String,
    prior: Double)

/** Per-document entity after dedup + top-k cap (E2/E3). */
final case class EntityRow(
    url: String,
    lang: String,
    entity_id: String,     // deterministic sha1(url || canonical) — SURVEY §1.2
    entity: String,        // canonical name
    qid: String,
    entity_type: String,
    citation: String,
    citation_start: Int,
    citation_end: Int,
    inferred: String,      // "explicit" | "implicit"
    freq: Int)

/** Edge-table row — the parity-checked artifact (models/relationship.py:17-63,
  * enriched core/api/relationships.py:376-404). */
final case class TripleRow(
    url: String,
    subject: String,
    predicate: String,
    `object`: String,
    inferred: String,
    subject_type: String,
    object_type: String,
    subject_id: String,
    object_id: String,
    sent_idx: Int,
    confidence: Double)

/** Relation pattern (FIXTURES.md §2 `patterns`): deterministic stand-in for
  * the LLM relation prompt (core/api/relationships.py:469-548). */
final case class PatternRow(
    middle: String,
    predicate: String,
    lang: String,
    confidence: Double)

/** Wikipedia dictionary row (stand-in for the live API, SURVEY §2.1 S3). */
final case class WikiPageRow(
    title: String,
    lang: String,
    url: String,
    extract: String,
    categories: Seq[String],
    internal_links: Seq[String],
    wikidata_id: String,
    langlinks: Map[String, String],
    thumbnail: String)

/** Redirect row (reference follows redirects:true — async_fetchers.py:231). */
final case class RedirectRow(from_title: String, to_title: String, lang: String)

/** Synonym dictionary row (L4 — utils/synonym_utils.py:22-120
  * _COMMON_SYNONYMS semantics; rank = the list order the reference tries). */
final case class SynonymRow(term: String, synonym: String, rank: Int)

/** Coordinate pair (P625 — wikidata/formatters.py:196-203). */
final case class CoordRow(latitude: Double, longitude: Double)

/** Wikidata dictionary row (wikidata/formatters.py:37-51 property
  * selection: the full flat projection the reference formats —
  * formatters.py:155-250). Scalar properties default to absent so
  * fixture construction sites only state what they exercise. */
final case class WdEntityRow(
    qid: String,
    labels: Map[String, String],
    descriptions: Map[String, String],
    aliases: Map[String, Seq[String]],
    instance_of: Seq[String],   // qids (P31)
    subclass_of: Seq[String],   // P279
    part_of: Seq[String],       // P361
    has_part: Seq[String],      // P527
    sitelinks: Map[String, String],
    coordinates: Option[CoordRow] = None, // P625
    image_url: String = null,             // P18
    date_of_birth: String = null,         // P569
    date_founded: String = null,          // P571
    date_of_death: String = null,         // P570
    end_time: String = null,              // P582
    official_website: String = null,      // P856
    gnd_id: String = null,                // P227
    isni_id: String = null)               // P213

/** DBpedia dictionary row (SPARQL SELECT fields, dbpedia/fetchers.py:93-152:
  * uri, label, abstract, rdf:type, dct:subject (categories AND subjects),
  * dbo:hasPart/isPartOf). */
final case class DbpediaRow(
    uri: String,
    label_en: String,
    abstract_en: String,
    types: Seq[String],
    categories: Seq[String],
    subjects: Seq[String] = Nil,
    part_of: Seq[String] = Nil,
    has_part: Seq[String] = Nil)

/** Metrics row (per run/stage/partition lineage — north_rule). */
final case class MetricRow(
    run_id: String,
    stage: String,
    metric: String,
    key: String,
    value: Double)
