package graft.kg

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

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
  * Scale design: every dictionary join goes through `dictJoin`, which is
  * SIZE-GATED — dictionaries whose optimizer-estimated size fits under
  * `cfg.dictBroadcastMaxBytes` are broadcast; larger ones take the salted
  * shuffle-hash path (`saltedJoin`), spreading head-entity hot keys
  * (country/person hubs) over `cfg.nSalt` buckets on top of AQE skew-join
  * splitting (SURVEY §4.2). `cfg.forceSaltedJoins` pins the shuffle path so
  * tests exercise it at small scale (PipelineParitySpec).
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

  private def containsMap(dt: DataType): Boolean = dt match {
    case _: MapType => true
    case a: ArrayType => containsMap(a.elementType)
    case s: StructType => s.fields.exists(f => containsMap(f.dataType))
    case _ => false
  }

  /** Default probe-salt source: hash of all hashable (non-map) probe
    * columns — row-unique in practice, so hot-key rows spread evenly. A
    * caller with a known row-id column should pass it explicitly (cheaper
    * than hashing fat rows). */
  private def defaultSaltSource(probe: DataFrame): Column = {
    val cols = probe.schema.fields
      .filter(f => !containsMap(f.dataType)).map(f => probe(f.name))
    xxhash64(cols.toIndexedSeq: _*)
  }

  /** Salted equi-join for skewed build-side keys: explodes the dictionary
    * side `nSalt` ways and routes probe rows by a hash bucket, so one hot
    * key (e.g. "Deutschland" at web scale) spreads over nSalt reducers.
    * The probe salt derives from `saltSource` (a row-unique expression —
    * NOT the join key, which would put every hot-key row in one bucket).
    * With nSalt=1 this degenerates to a plain equi-join; output is
    * invariant in nSalt (property-tested). */
  def saltedJoin(
      probe: DataFrame, dict: DataFrame, probeKey: Column, dictKey: Column,
      nSalt: Int, joinType: String = "left",
      saltSource: Option[Column] = None): DataFrame = {
    val src = saltSource.getOrElse(defaultSaltSource(probe))
    val saltedProbe = probe.withColumn("__salt",
      pmod(xxhash64(src), lit(nSalt)).cast("int"))
    // shuffle_hash: dictionary rows are the smaller side per salt bucket;
    // hashing them avoids sort-merge's sort of the fat probe rows
    val saltedDict = dict.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalt - 1)))).hint("shuffle_hash")
    saltedProbe.join(saltedDict,
      probeKey === dictKey && saltedProbe("__salt") === saltedDict("__salt"),
      joinType).drop("__salt")
  }

  /** Size-gated dictionary join (the production join for every L-stage):
    * broadcast when the dictionary's optimizer-estimated size fits under
    * `cfg.dictBroadcastMaxBytes`; salted shuffle-hash otherwise. At 100 TB
    * the wiki/wd dictionaries (10^8 rows) always take the salted path; the
    * pattern/redirect tables stay broadcast. */
  def dictJoin(
      probe: DataFrame, dict: DataFrame, probeKey: Column, dictKey: Column,
      cfg: KgConfig, saltSource: Column, joinType: String = "left"): DataFrame = {
    val small = !cfg.forceSaltedJoins &&
      dict.queryExecution.optimizedPlan.stats.sizeInBytes <= cfg.dictBroadcastMaxBytes
    if (small) probe.join(broadcast(dict), probeKey === dictKey, joinType)
    else saltedJoin(probe, dict, probeKey, dictKey, cfg.nSalt, joinType, Some(saltSource))
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
    val redir = redirects.filter(col("lang") === cfg.language)
      .select(col("from_title"), col("to_title"))
    val withTitle = dictJoin(entities, redir,
        entities("entity"), col("from_title"), cfg, entities("url"))
      .withColumn("w_lookup", coalesce(col("to_title"), col("entity")))
      .drop("from_title", "to_title")
    val s1 = dictJoin(withTitle, primary,
      col("w_lookup"), col("w_title"), cfg, col("url"))

    // resolved = extract present and long enough (P14 needs_fallback gate,
    // wikipedia/service.py:998-1004)
    val ok1 = col("w_extract").isNotNull && length(col("w_extract")) >= minLen

    // L2 (fallback 1): other-language wiki via Wikidata sitelinks (L8/L9
    // mechanism); only consulted where stage 1 is unresolved
    val links2 = wdSitelinks
      .filter(col("site") === s"${secondaryLang}wiki")
      .select(col("qid").as("sl_qid"), col("title").as("sl_title"))
    val s2a = dictJoin(s1, links2, s1("qid"), col("sl_qid"), cfg, s1("url"))
    val s2 = dictJoin(s2a, secondary, col("sl_title"), col("w2_title"), cfg, s2a("url"))
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

    // one flat projection (not a withColumn chain — keeps the analyzed plan
    // a single Project over the join tree)
    val keep = entities.columns.map(col).toIndexedSeq
    s5.select(keep ++ Seq(
      when(ok1, col("w_extract"))
        .when(ok2, col("w2_extract"))
        .when(ok5, col("p_extract"))
        .otherwise(col("w_extract")) // short primary extract still reported
        .as("wiki_extract"),
      when(ok1, lit(null).cast("string"))
        .when(ok2, lit(s"${secondaryLang}_wikipedia"))
        .when(ok5, lit("beautifulsoup"))
        .otherwise(lit(null).cast("string"))
        .as("wiki_fallback_source"),
      when(ok1 || !ok2, col("w_url")).otherwise(col("w2_url")).as("wiki_url"),
      cleanCategories(coalesce(col("w_categories"), array())).as("wiki_categories"),
      coalesce(col("w_links"), array().cast("array<string>")).as("wiki_links"),
      col("w_wikidata_id").as("wiki_wikidata_id"),
      // P14 status derivation: found iff any extract
      when(coalesce(
        when(ok1, col("w_extract")).when(ok2, col("w2_extract"))
          .when(ok5, col("p_extract")).otherwise(col("w_extract"))).isNotNull,
        lit("found")).otherwise(lit("not_found")).as("wiki_status")): _*)
  }

  /** Dictionary-side referenced-label enrichment
    * (wikidata/service.py:205-235): the per-row referenced-id arrays
    * (instance_of, part_of) become array<struct<id,label>> by a SELF-JOIN
    * ON THE DICTIONARY — explode the dict's id arrays, join the (qid,
    * de-label) projection, regroup by position. O(dictionary), runs before
    * any fat entity row is touched; never collects to the driver (the
    * round-1 version materialized the full label map driver-side — a
    * driver OOM at the 10^8-row dictionary scale). */
  def enrichWdDict(wd: DataFrame, cfg: KgConfig): DataFrame = {
    val labels = wd.select(col("qid").as("ref_qid"),
      element_at(col("labels"), "de").as("ref_label"))
    val base = wd.select(col("qid").as("wd_qid"),
      col("labels").as("wd_labels"), col("descriptions").as("wd_descriptions"),
      col("instance_of").as("wd_instance_of_ids"), col("part_of").as("wd_part_of_ids"))
    val pairs = base.select(col("wd_qid"),
      posexplode(concat(
        transform(col("wd_instance_of_ids"), x => struct(lit("i").as("src"), x.as("id"))),
        transform(col("wd_part_of_ids"), x => struct(lit("p").as("src"), x.as("id")))))
        .as(Seq("pos", "sid")))
      .select(col("wd_qid"), col("pos"),
        col("sid.src").as("src"), col("sid.id").as("id"))
    val joined = dictJoin(pairs, labels, col("id"), col("ref_qid"), cfg,
      xxhash64(col("wd_qid"), col("pos")))
    val regrouped = joined
      .groupBy("wd_qid")
      .agg(array_sort(collect_list(struct(col("pos"), col("src"),
        col("id"), col("ref_label").as("label")))).as("all"))
      .select(col("wd_qid").as("g_qid"),
        transform(filter(col("all"), x => x("src") === "i"),
          x => struct(x("id").as("id"), x("label").as("label"))).as("g_instance_of"),
        transform(filter(col("all"), x => x("src") === "p"),
          x => struct(x("id").as("id"), x("label").as("label"))).as("g_part_of"))
    // dict rows with empty id arrays drop out of the explode — restore them
    // with empty enrichments via a dict-scale left join
    base.join(regrouped, col("wd_qid") === col("g_qid"), "left")
      .select(col("wd_qid"), col("wd_labels"), col("wd_descriptions"),
        coalesce(col("g_instance_of"),
          array().cast("array<struct<id:string,label:string>>")).as("wd_instance_of"),
        coalesce(col("g_part_of"),
          array().cast("array<struct<id:string,label:string>>")).as("wd_part_of"))
  }

  /** L9-L12: Wikidata enrichment — qid from gazetteer/wiki pageprops, then
    * ONE dictionary join against the pre-enriched dict (enrichWdDict). */
  def wikidata(spark: SparkSession, linked: DataFrame, wd: DataFrame,
      cfg: KgConfig): DataFrame = {
    val enriched = enrichWdDict(wd, cfg)
    val withKey = linked.withColumn("wd_key",
      coalesce(col("qid"), col("wiki_wikidata_id")))
    dictJoin(withKey, enriched, col("wd_key"), col("wd_qid"), cfg, col("url"))
      .withColumn("wd_status",
        when(col("wd_qid").isNotNull, lit("found")).otherwise(lit("not_found")))
      .drop("wd_key")
  }

  /** L13: DBpedia link via deterministic URI construction (P10) + strict
    * linked criterion uri + en label + en abstract
    * (dbpedia/service.py:271-276). */
  def dbpedia(spark: SparkSession, linked: DataFrame, dbp: DataFrame,
      cfg: KgConfig): DataFrame = {
    val uriUdf = udf((label: String) => TextUtils.dbpediaUri(label))
    val dbpSel = dbp.select(col("uri").as("dbp_uri_dict"),
      col("label_en").as("dbp_label"), col("abstract_en").as("dbp_abstract"),
      col("types").as("dbp_types"), col("categories").as("dbp_categories"))
    val withUri = linked
      .withColumn("dbp_label_src",
        coalesce(element_at(col("wd_labels"), "en"), col("entity")))
      .withColumn("dbp_uri", uriUdf(col("dbp_label_src")))
    dictJoin(withUri, dbpSel, col("dbp_uri"), col("dbp_uri_dict"), cfg, col("url"))
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
    val d = wikidata(spark, w, wd, cfg)
    val b = dbpedia(spark, d, dbp, cfg)
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
