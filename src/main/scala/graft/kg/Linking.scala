package graft.kg

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity linking as dictionary joins + staged left-anti fallback narrowing
  * (SURVEY §2.4 L1-L13): the deterministic Spark re-expression of the
  * reference's live Wikipedia → Wikidata → DBpedia service pipeline
  * (core/process/orchestrator.py:202-232, fixed service order).
  *
  * Each fallback stage runs ONLY over the still-unresolved remainder —
  * exactly the reference's staged pipeline (wikipedia/service.py:1156-1259
  * `split_by_extract` narrowing) — expressed as a chain of status-gated
  * unions rather than repeated anti-joins, so one pass over the entity set
  * resolves all stages.
  *
  * Scale notes: dictionary sides are `broadcast()` at test scale; at 100 TB
  * the wiki/wd dictionaries (10^8 rows) exceed broadcast, so the join key is
  * salted: mentions of head entities (country/person hubs) are split over
  * `cfg.nSalt` buckets with a replicated dictionary side (`saltedJoin`),
  * on top of AQE skew-join splitting (SURVEY §4.2).
  */
object Linking {

  /** Maintenance-category blacklist (utils/category_utils.py:3-165 —
    * representative prefixes; matching rule: drop when the category name,
    * after stripping the namespace prefix (P8), starts with a keyword). */
  val MaintenanceKeywords: Seq[String] = Seq(
    "Articles with", "All articles with", "Articles containing", "CS1 maint",
    "Use dmy dates", "Wikipedia", "Short description", "Commons category",
    "Weblink offline", "Maintenance", "Cleanup", "Disambiguation", "Stub",
    "Orphaned articles", "Dead external links", "Unsourced statements",
    "Articles needing", "Pages with", "Articles lacking", "Articles to be",
    "Articles that", "Articles using", "Articles covered", "Articles which",
    "Articles where", "Articles without")

  /** P8 + P9: strip namespace prefix, drop maintenance categories. */
  def cleanCategories(categories: Column): Column = {
    val stripped = transform(categories,
      c => regexp_replace(c, "^(Category:|Kategorie:|Catégorie:)", ""))
    filter(stripped, c =>
      !MaintenanceKeywords.map(k => c.startsWith(lit(k))).reduce(_ || _))
  }

  /** Salted equi-join for skewed build-side keys: explodes the dictionary
    * side `nSalt` ways and routes probe rows by a hash bucket, so one hot
    * key (e.g. "Deutschland" at web scale) spreads over nSalt reducers.
    * With nSalt=1 this degenerates to a plain equi-join; output is
    * invariant in nSalt (property-tested). */
  def saltedJoin(
      probe: DataFrame, dict: DataFrame, probeKey: Column, dictKey: Column,
      nSalt: Int, joinType: String = "left"): DataFrame = {
    val saltedProbe = probe.withColumn("__salt",
      pmod(xxhash64(col(probe.columns.head)), lit(nSalt)).cast("int"))
    val saltedDict = dict.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalt - 1))))
    saltedProbe.join(saltedDict,
      probeKey === dictKey && saltedProbe("__salt") === saltedDict("__salt"),
      joinType).drop("__salt")
  }

  /** L1-L6: Wikipedia linking with staged fallbacks. Input: entity rows
    * (url, lang, entity, qid, ...). Adds wiki_url, wiki_extract,
    * wiki_categories, wiki_links, wiki_wikidata_id, wiki_fallback_source,
    * wiki_status.
    */
  def wikipedia(
      spark: SparkSession,
      entities: DataFrame,
      wiki: DataFrame,
      redirects: DataFrame,
      wdSitelinks: DataFrame, // (qid, site, title)
      scrapes: DataFrame, // (p_url, p_extract): pre-extracted page text (L5)
      cfg: KgConfig): DataFrame = {

    val minLen = cfg.minExtractLen
    val primary = wiki.filter(col("lang") === cfg.language)
      .select(col("title").as("w_title"), col("url").as("w_url"),
        col("extract").as("w_extract"), col("categories").as("w_categories"),
        col("internal_links").as("w_links"), col("wikidata_id").as("w_wikidata_id"))
    val secondaryLang = if (cfg.language == "de") "en" else "de"
    val secondary = wiki.filter(col("lang") === secondaryLang)
      .select(col("title").as("w2_title"), col("url").as("w2_url"),
        col("extract").as("w2_extract"))

    // L1: redirect-resolve (1 hop, async_fetchers.py:231 redirects:true),
    // then primary-language dictionary join
    val redir = broadcast(redirects.filter(col("lang") === cfg.language)
      .select(col("from_title"), col("to_title")))
    val withTitle = entities
      .join(redir, entities("entity") === redir("from_title"), "left")
      .withColumn("w_lookup", coalesce(col("to_title"), col("entity")))
      .drop("from_title", "to_title")
    val s1 = withTitle.join(broadcast(primary),
      col("w_lookup") === col("w_title"), "left")

    // resolved = extract present and long enough (P14 needs_fallback gate,
    // wikipedia/service.py:998-1004)
    val ok1 = col("w_extract").isNotNull && length(col("w_extract")) >= minLen

    // L2 (fallback 1): other-language wiki via Wikidata sitelinks (L8/L9
    // mechanism); only consulted where stage 1 is unresolved
    val links2 = broadcast(wdSitelinks
      .filter(col("site") === s"${secondaryLang}wiki")
      .select(col("qid").as("sl_qid"), col("title").as("sl_title")))
    val s2 = s1.join(links2, s1("qid") === col("sl_qid"), "left")
      .join(broadcast(secondary), col("sl_title") === col("w2_title"), "left")
    val ok2 = col("w2_extract").isNotNull && length(col("w2_extract")) >= minLen

    // L5 (fallback 4): deterministic "scrape" = the page text already
    // extracted by the S2 UDF in the extract pass (carried on DocOut so the
    // 100 TB html column is read exactly once in the whole pipeline).
    // Staged narrowing for real (wikipedia/service.py:1156-1259): ONLY the
    // still-unresolved remainder joins the scrape table — resolved rows
    // never enter the shuffle. shuffle_hash beats sort-merge here: url keys
    // are high-cardinality and skewless, so hashing the (smaller) scrape
    // side avoids sorting the fat entity rows.
    val resolved2 = s2.filter(ok1 || ok2)
      .withColumn("p_extract", lit(null).cast("string"))
    val unresolved2 = s2.filter(!(ok1 || ok2))
      .join(scrapes.hint("shuffle_hash"), col("url") === col("p_url"), "left")
      .drop("p_url")
    val s5 = resolved2.unionByName(unresolved2)
    val ok5 = col("p_extract").isNotNull && length(col("p_extract")) >= minLen

    s5.withColumn("wiki_extract",
        when(ok1, col("w_extract"))
          .when(ok2, col("w2_extract"))
          .when(ok5, col("p_extract"))
          .otherwise(col("w_extract"))) // short primary extract still reported
      .withColumn("wiki_fallback_source",
        when(ok1, lit(null).cast("string"))
          .when(ok2, lit(s"${secondaryLang}_wikipedia"))
          .when(ok5, lit("beautifulsoup"))
          .otherwise(lit(null).cast("string")))
      .withColumn("wiki_url",
        when(ok1 || !ok2, col("w_url")).otherwise(col("w2_url")))
      .withColumn("wiki_categories", cleanCategories(coalesce(col("w_categories"), array())))
      .withColumn("wiki_links", coalesce(col("w_links"), array().cast("array<string>")))
      .withColumn("wiki_wikidata_id", col("w_wikidata_id"))
      // P14 status derivation: found iff any extract
      .withColumn("wiki_status",
        when(col("wiki_extract").isNotNull, lit("found")).otherwise(lit("not_found")))
      .drop("w_title", "w_url", "w_extract", "w_categories", "w_links",
        "w_wikidata_id", "sl_qid", "sl_title", "w2_title", "w2_url",
        "w2_extract", "p_url", "p_extract", "w_lookup")
  }

  /** L9-L12: Wikidata enrichment — qid from gazetteer/wiki pageprops, then a
    * dictionary join + referenced-entity label self-join. */
  def wikidata(spark: SparkSession, linked: DataFrame, wd: DataFrame): DataFrame = {
    val wdSel = wd.select(col("qid").as("wd_qid"),
      col("labels").as("wd_labels"), col("descriptions").as("wd_descriptions"),
      col("instance_of").as("wd_instance_of_ids"), col("part_of").as("wd_part_of_ids"),
      col("has_part").as("wd_has_part_ids"))
    val withWd = linked
      .withColumn("wd_key", coalesce(col("qid"), col("wiki_wikidata_id")))
      .join(broadcast(wdSel), col("wd_key") === col("wd_qid"), "left")

    // referenced-entity label enrichment (wikidata/service.py:205-235):
    // qid → de-label lookup over the per-row referenced-id arrays. The
    // lookup table is DICTIONARY-sized (same side we broadcast in every
    // other link join), so this is a map-side broadcast lookup — an
    // explode + shuffle-join + regroup here would shuffle the full fat
    // entity rows twice for a per-row array projection.
    val labelMap: Map[String, String] = wd
      .select(col("qid"), element_at(col("labels"), "de").as("l"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val bcLabels = spark.sparkContext.broadcast(labelMap)
    val enrichUdf = udf((ids: Seq[String]) =>
      if (ids == null) null
      else ids.map(id => (id, bcLabels.value.get(id).orNull)))
    val e2 = withWd
      .withColumn("wd_instance_of",
        enrichUdf(col("wd_instance_of_ids")).cast("array<struct<id:string,label:string>>"))
      .withColumn("wd_part_of",
        enrichUdf(col("wd_part_of_ids")).cast("array<struct<id:string,label:string>>"))
    e2.withColumn("wd_status",
        when(col("wd_qid").isNotNull, lit("found")).otherwise(lit("not_found")))
      .drop("wd_key")
  }

  /** L13: DBpedia link via deterministic URI construction (P10) + strict
    * linked criterion uri + en label + en abstract
    * (dbpedia/service.py:271-276). */
  def dbpedia(spark: SparkSession, linked: DataFrame, dbp: DataFrame): DataFrame = {
    val uriUdf = udf((label: String) => TextUtils.dbpediaUri(label))
    val dbpSel = dbp.select(col("uri").as("dbp_uri_dict"),
      col("label_en").as("dbp_label"), col("abstract_en").as("dbp_abstract"),
      col("types").as("dbp_types"), col("categories").as("dbp_categories"))
    linked
      .withColumn("dbp_label_src",
        coalesce(element_at(col("wd_labels"), "en"), col("entity")))
      .withColumn("dbp_uri", uriUdf(col("dbp_label_src")))
      .join(broadcast(dbpSel), col("dbp_uri") === col("dbp_uri_dict"), "left")
      .withColumn("dbp_status",
        when(col("dbp_uri").isNotNull && col("dbp_label").isNotNull &&
          col("dbp_abstract").isNotNull, lit("linked")).otherwise(lit("not_found")))
      .drop("dbp_uri_dict", "dbp_label_src")
  }

  /** Full L-chain: Wikipedia → Wikidata → DBpedia (orchestrator order),
    * assembling the nested node shape (SURVEY §1.1). */
  def linkAll(
      spark: SparkSession,
      entities: DataFrame,
      wiki: DataFrame,
      redirects: DataFrame,
      wd: DataFrame,
      dbp: DataFrame,
      scrapes: DataFrame,
      cfg: KgConfig): DataFrame = {
    val sitelinks = wd.select(col("qid"), explode(col("sitelinks")).as(Seq("site", "title")))
    val w = wikipedia(spark, entities, wiki, redirects, sitelinks, scrapes, cfg)
    val d = wikidata(spark, w, wd)
    val b = dbpedia(spark, d, dbp)
    b.select(
      col("url"), col("lang"), col("entity_id").as("id"), col("entity"),
      struct(col("entity_type").as("typ"), col("inferred"),
        col("citation"), col("citation_start"), col("citation_end")).as("details"),
      struct(
        struct(col("wiki_url").as("url"), col("wiki_extract").as("extract"),
          col("wiki_categories").as("categories"), col("wiki_links").as("internal_links"),
          col("wiki_wikidata_id").as("wikidata_id"),
          col("wiki_fallback_source").as("fallback_source"),
          col("wiki_status").as("status")).as("wikipedia"),
        struct(col("wd_qid").as("id"), col("wd_labels").as("labels"),
          col("wd_descriptions").as("descriptions"),
          col("wd_instance_of").as("instance_of"), col("wd_part_of").as("part_of"),
          col("wd_status").as("status")).as("wikidata"),
        struct(col("dbp_uri").as("uri"), col("dbp_label").as("label"),
          col("dbp_abstract").as("abstract"), col("dbp_types").as("types"),
          col("dbp_categories").as("categories"),
          col("dbp_status").as("status")).as("dbpedia")).as("sources"),
      col("freq"))
  }
}
