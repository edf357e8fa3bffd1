package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Tables.t
import graft.kg._

/** Driver-oracled linking queries: the REAL production link chain
  * (Linking.linkAll — L1 redirect+dict, L2 language fallback + P13 url_alt
  * demotion, L3 opensearch prefix pick, L4 synonym, L5 scrape, P14 status,
  * Wikidata enrichment, L13 strict DBpedia + S6 Lookup fallback) run over
  * the driver `documents` table with a hand-built dictionary fixture whose
  * per-term outcome is independently derivable — the DuckDB oracle states
  * the expected outcome per (term, document) directly, so every L-stage
  * gets a green driver row (VERDICT r1 gap #2/#3).
  *
  * Fixture design (one term per stage):
  *   customer → L1 direct hit           filter → L1 via redirect
  *   join     → L2 en fallback (url demoted to url_alt, P13)
  *   merge    → L3 opensearch ("merge sort" prefix)
  *   window   → L3 rank order ("window manager" beats "window function")
  *   spark    → L4 synonym (rank-1 synonym has no page, rank-2 wins)
  *   table    → short primary extract → L5 scrape (doc text ≥ 100 chars)
  *   stream   → no dictionary entry   → L5 scrape or not_found
  * DBpedia:    customer strict-linked; filter S6 lookup (disambiguated
  *             resource name); join abstract-less → not_found.
  */
object LinkOps {

  private val LongDe = "x" * 120
  private val LongEn = "y" * 120
  private val LongFr = "z" * 120

  private def deUrl(title: String) =
    s"https://de.wikipedia.org/wiki/${title.replace(' ', '_')}"
  private def enUrl(title: String) =
    s"https://en.wikipedia.org/wiki/${title.replace(' ', '_')}"
  private def frUrl(title: String) =
    s"https://fr.wikipedia.org/wiki/${title.replace(' ', '_')}"

  private val qidOf: Map[String, String] = Map(
    "customer" -> "Q1", "filter" -> "Q2", "join" -> "Q3", "merge" -> "Q4",
    "spark" -> "Q5", "stream" -> "Q6", "table" -> "Q7", "window" -> "Q8")

  private val wikiFixture: Seq[WikiPageRow] = Seq(
    WikiPageRow("customer", "de", deUrl("customer"), LongDe,
      Seq("Kategorie:Begriff"), Seq("filter"), "Q1", Map.empty, null),
    // L7 third-language case: the fr sitelinked page fills multilang['fr']
    WikiPageRow("client (fr)", "fr", frUrl("client"), LongFr,
      Nil, Nil, "Q1", Map.empty, null),
    WikiPageRow("filtern", "de", deUrl("filtern"), LongDe, Nil, Nil, "Q2", Map.empty, null),
    WikiPageRow("join", "de", deUrl("join"), "kurz", Nil, Nil, "Q3", Map.empty, null),
    WikiPageRow("join (en)", "en", enUrl("join"), LongEn, Nil, Nil, "Q3", Map.empty, null),
    WikiPageRow("merge sort", "de", deUrl("merge sort"), LongDe, Nil, Nil, "Q4", Map.empty, null),
    WikiPageRow("funke", "de", deUrl("funke"), LongDe, Nil, Nil, "Q5", Map.empty, null),
    WikiPageRow("table", "de", deUrl("table"), "kurz", Nil, Nil, "Q7", Map.empty, null),
    WikiPageRow("window manager", "de", deUrl("window manager"), LongDe, Nil, Nil, "Q8", Map.empty, null),
    WikiPageRow("window function", "de", deUrl("window function"), LongDe, Nil, Nil, "Q8", Map.empty, null))

  private val redirectFixture = Seq(RedirectRow("filter", "filtern", "de"))

  private val synonymFixture = Seq(
    SynonymRow("spark", "sparkle", 1), // no such page — must be skipped
    SynonymRow("spark", "funke", 2))

  private val wdFixture: Seq[WdEntityRow] =
    qidOf.toSeq.sortBy(_._1).map { case (term, qid) =>
      WdEntityRow(qid, Map("de" -> term, "en" -> term),
        Map("de" -> s"Begriff $term"), Map.empty,
        instance_of = if (term == "customer") Seq("Q100", "Q101") else Nil,
        subclass_of = if (term == "customer") Seq("Q101") else Nil,
        part_of = if (term == "filter") Seq("Q101") else Nil,
        has_part = if (term == "filter") Seq("Q100") else Nil,
        sitelinks =
          if (term == "join") Map("enwiki" -> "join (en)")
          else if (term == "customer") Map("frwiki" -> "client (fr)")
          else Map.empty,
        // L12 scalar cases: one term per property family
        coordinates = if (term == "customer") Some(CoordRow(48.1, 11.5)) else None,
        image_url = if (term == "customer") "https://commons.example/cust.jpg" else null,
        date_founded = if (term == "join") "+2000-01-01T00:00:00Z" else null,
        official_website = if (term == "merge") "https://merge.example" else null,
        gnd_id = if (term == "customer") "gnd-777" else null)
    } ++ Seq(
      WdEntityRow("Q100", Map("de" -> "konzept100"), Map.empty, Map.empty,
        Nil, Nil, Nil, Nil, Map.empty),
      WdEntityRow("Q101", Map("de" -> "konzept101"), Map.empty, Map.empty,
        Nil, Nil, Nil, Nil, Map.empty))

  private val dbpFixture: Seq[DbpediaRow] = Seq(
    DbpediaRow("http://dbpedia.org/resource/Customer", "customer",
      "the customer abstract", Seq("dbo:Thing"), Seq("dbc:Things"),
      subjects = Seq("http://dbpedia.org/resource/Category:Client_topics"),
      part_of = Seq("http://dbpedia.org/resource/Commerce"),
      has_part = Seq("dbo:Account")),
    DbpediaRow("http://dbpedia.org/resource/Filter_(signal)", "filter",
      "the filter abstract", Nil, Nil),
    DbpediaRow("http://dbpedia.org/resource/Join", "join", null, Nil, Nil))

  /** The REAL link chain (Linking.linkAll) over documents-derived mentions
    * against the hand-derivable dictionary fixture — shared by the
    * kg_link_chain projection and the kg_stats statistics query. */
  private def linkChainNodes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val entities = MentionOps.kgMentions(spark, dir)
      .select(concat(lit("doc://"), col("doc_id")).as("url"),
        lit("de").as("lang"), col("term").as("entity"), col("n"))
      // E5 deterministic id (TextUtils.entityId) via the built-in sha1 —
      // keeps the whole kg_link_chain plan free of ScalaUDF nodes
      .withColumn("entity_id", sha1(concat(col("url"), lit("|"), col("entity"))))
      .withColumn("qid", element_at(
        typedLit(qidOf), col("entity")))
      .select(col("url"), col("lang"), col("entity_id"), col("entity"),
        col("qid"), lit("Konzept").as("entity_type"), col("entity").as("citation"),
        lit(0).as("citation_start"), lit(0).as("citation_end"),
        lit("explicit").as("inferred"), col("n").cast("int").as("freq"))
    val scrapes = t(spark, dir, "documents")
      .select(concat(lit("doc://"), col("doc_id")).as("p_url"),
        when(length(col("text")) > 0, col("text")).as("p_extract"))
    Linking.linkAll(spark, entities,
      wikiFixture.toDF(), redirectFixture.toDF(), wdFixture.toDF(),
      dbpFixture.toDF(), scrapes, synonymFixture.toDF(),
      KgConfig.default.copy(extraLanguages = Seq("fr")))
  }

  /** The production link chain over documents-derived mentions. */
  def kgLinkChain(spark: SparkSession, dir: String): DataFrame = {
    val nodes = linkChainNodes(spark, dir)
    nodes.select(
      col("url"), col("entity"),
      col("sources.wikipedia.status").as("wp_status"),
      col("sources.wikipedia.fallback_source").as("wp_fallback"),
      col("sources.wikipedia.url").as("wp_url"),
      col("sources.wikipedia.url_alt").as("wp_url_alt"),
      // L7 multilang entries (primary label always tracks the resolved
      // de-language page; en present only for the sitelinked L2 case)
      expr("try_element_at(sources.wikipedia.multilang, 'de').label").as("ml_de_label"),
      expr("try_element_at(sources.wikipedia.multilang, 'en').url").as("ml_en_url"),
      // L7 third language (extraLanguages): fr entry via the frwiki sitelink
      expr("try_element_at(sources.wikipedia.multilang, 'fr').label").as("ml_fr_label"),
      col("sources.wikidata.status").as("wd_status"),
      col("sources.wikidata.url").as("wd_url"),
      expr("try_element_at(sources.wikidata.instance_of, 1).label").as("inst1"),
      expr("try_element_at(sources.wikidata.subclass_of, 1).label").as("sub1"),
      expr("try_element_at(sources.wikidata.part_of, 1).label").as("part1"),
      expr("try_element_at(sources.wikidata.has_part, 1).label").as("hp1"),
      // L12 scalar projection cases
      col("sources.wikidata.coordinates.latitude").as("wd_lat"),
      col("sources.wikidata.image_url").as("wd_image"),
      col("sources.wikidata.date_founded").as("wd_founded"),
      col("sources.wikidata.official_website").as("wd_website"),
      col("sources.wikidata.gnd_id").as("wd_gnd"),
      col("sources.dbpedia.status").as("dbp_status"),
      col("sources.dbpedia.uri").as("dbp_uri"),
      col("sources.dbpedia.fallback_source").as("dbp_fallback"))
      .orderBy("url", "entity")
  }

  /** A1-A10 statistics (the REAL Statistics.compute pass structure) over
    * the link-chain fixture nodes — every metric row is hand-derivable
    * from per-term mention counts over the documents table, giving the
    * statistics stage a driver oracle that shares NO code with the engine
    * (VERDICT r2 item 3). Percent metrics are INCLUDED since round 4: the
    * engine's banker's rounding (Python round() parity, Spark bround) is
    * expressible in DuckDB as round_even(); decimal ties cannot occur in
    * this fixture (the entity total is coprime with 2000, so 100·c/total
    * never lands exactly on a .x5 boundary), so both systems round the
    * same IEEE double identically. */
  def kgStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nodes = linkChainNodes(spark, dir)
    val edges = Seq.empty[(String, String, String, String)]
      .toDF("subject", "predicate", "object", "inferred")
    val (stats, caches) =
      graft.kg.Statistics.computeTracked(spark, nodes, edges, "driver",
        cacheNarrow = false)
    // the returned plan is lazy (Verify materializes it later), so the
    // caches created by THIS call cannot be released here — instead each
    // call releases its predecessor's, bounding repeated invocations to
    // one live (tiny) grouped-counter cache per session
    lastCaches.synchronized {
      lastCaches.keySet.removeIf(s => s.sparkContext.isStopped)
      Option(lastCaches.put(spark, caches)).foreach(_.foreach(_.unpersist()))
    }
    stats
      .select("metric", "key", "value")
      .orderBy("metric", "key")
  }

  private val lastCaches =
    new java.util.HashMap[SparkSession, Seq[DataFrame]]()

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "kg_link_chain" -> kgLinkChain _,
    "kg_stats"      -> kgStats _)

  private val termList = MentionOps.Terms.map(s => s"'$s'").mkString("[", ", ", "]")

  /** Independent expected-outcome oracle: per-term outcomes hand-derived
    * from the fixture (documents only contribute the L5 text-length gate). */
  val oracles: Map[String, String] = Map(
    "kg_link_chain" ->
      s"""WITH m AS (
           SELECT doc_id, text, t AS term
           FROM documents, (SELECT unnest($termList) AS t) z
           WHERE len(regexp_extract_all(text, '\\b' || t || '\\b')) > 0)
         SELECT
           'doc://' || doc_id AS url,
           term AS entity,
           CASE WHEN term = 'stream' AND length(text) < 100 THEN 'not_found'
                ELSE 'found' END AS wp_status,
           CASE term
             WHEN 'join' THEN 'en_wikipedia'
             WHEN 'merge' THEN 'opensearch'
             WHEN 'window' THEN 'opensearch'
             WHEN 'spark' THEN 'synonym'
             WHEN 'table' THEN CASE WHEN length(text) >= 100 THEN 'beautifulsoup' END
             WHEN 'stream' THEN CASE WHEN length(text) >= 100 THEN 'beautifulsoup' END
           END AS wp_fallback,
           CASE term
             WHEN 'customer' THEN 'https://de.wikipedia.org/wiki/customer'
             WHEN 'filter' THEN 'https://de.wikipedia.org/wiki/filtern'
             WHEN 'merge' THEN 'https://de.wikipedia.org/wiki/merge_sort'
             WHEN 'spark' THEN 'https://de.wikipedia.org/wiki/funke'
             WHEN 'table' THEN 'https://de.wikipedia.org/wiki/table'
             WHEN 'window' THEN 'https://de.wikipedia.org/wiki/window_manager'
           END AS wp_url,
           CASE term WHEN 'join' THEN 'https://en.wikipedia.org/wiki/join' END AS wp_url_alt,
           CASE term
             WHEN 'customer' THEN 'customer'
             WHEN 'filter' THEN 'filtern'
             WHEN 'join' THEN 'join'
             WHEN 'merge' THEN 'merge sort'
             WHEN 'spark' THEN 'funke'
             WHEN 'table' THEN 'table'
             WHEN 'window' THEN 'window manager'
           END AS ml_de_label,
           CASE term WHEN 'join' THEN 'https://en.wikipedia.org/wiki/join' END AS ml_en_url,
           CASE term WHEN 'customer' THEN 'client (fr)' END AS ml_fr_label,
           'found' AS wd_status,
           'https://www.wikidata.org/wiki/' || CASE term
             WHEN 'customer' THEN 'Q1' WHEN 'filter' THEN 'Q2'
             WHEN 'join' THEN 'Q3' WHEN 'merge' THEN 'Q4'
             WHEN 'spark' THEN 'Q5' WHEN 'stream' THEN 'Q6'
             WHEN 'table' THEN 'Q7' WHEN 'window' THEN 'Q8' END AS wd_url,
           CASE term WHEN 'customer' THEN 'konzept100' END AS inst1,
           CASE term WHEN 'customer' THEN 'konzept101' END AS sub1,
           CASE term WHEN 'filter' THEN 'konzept101' END AS part1,
           CASE term WHEN 'filter' THEN 'konzept100' END AS hp1,
           CAST(CASE term WHEN 'customer' THEN 48.1 END AS DOUBLE) AS wd_lat,
           CASE term WHEN 'customer' THEN 'https://commons.example/cust.jpg' END AS wd_image,
           CASE term WHEN 'join' THEN '+2000-01-01T00:00:00Z' END AS wd_founded,
           CASE term WHEN 'merge' THEN 'https://merge.example' END AS wd_website,
           CASE term WHEN 'customer' THEN 'gnd-777' END AS wd_gnd,
           CASE term WHEN 'customer' THEN 'linked' WHEN 'filter' THEN 'linked'
                ELSE 'not_found' END AS dbp_status,
           CASE term
             WHEN 'customer' THEN 'http://dbpedia.org/resource/Customer'
             WHEN 'filter' THEN 'http://dbpedia.org/resource/Filter_(signal)'
             ELSE 'http://dbpedia.org/resource/' || upper(substr(term, 1, 1)) || substr(term, 2)
           END AS dbp_uri,
           CASE term WHEN 'filter' THEN 'lookup_api' END AS dbp_fallback
         FROM m ORDER BY url, entity""",
    // every value derives from per-term mention counts (the engine's
    // groupBy emits only nonzero keys, so counter rows filter value<>0;
    // the scalar-aggregate rows of pass 1 are always present)
    "kg_stats" ->
      s"""WITH m AS (
           SELECT doc_id, text, t AS term
           FROM documents, (SELECT unnest($termList) AS t) z
           WHERE len(regexp_extract_all(text, '\\b' || t || '\\b')) > 0),
         c AS (SELECT
           count(*) AS n,
           count(*) FILTER (WHERE term = 'customer') AS n_customer,
           count(*) FILTER (WHERE term = 'filter') AS n_filter,
           count(*) FILTER (WHERE term = 'join') AS n_join,
           count(*) FILTER (WHERE term = 'merge') AS n_merge,
           count(*) FILTER (WHERE term = 'window') AS n_window,
           count(*) FILTER (WHERE term = 'spark') AS n_spark,
           count(*) FILTER (WHERE term = 'table' AND length(text) >= 100) AS n_table_long,
           count(*) FILTER (WHERE term = 'table' AND length(text) < 100) AS n_table_short,
           count(*) FILTER (WHERE term = 'stream' AND length(text) >= 100) AS n_stream_long,
           count(*) FILTER (WHERE term = 'stream' AND length(text) < 100) AS n_stream_short
         FROM m),
         rows_ AS (
           SELECT 'total' AS metric, 'entities' AS key, n AS v, true AS always FROM c
           UNION ALL SELECT 'total', 'relationships', 0, true FROM c
           UNION ALL SELECT 'linked_count', 'wikipedia', n - n_stream_short, true FROM c
           UNION ALL SELECT 'linked_count', 'wikidata', n, true FROM c
           UNION ALL SELECT 'linked_count', 'dbpedia', n_customer + n_filter, true FROM c
           UNION ALL SELECT 'entity_inference', 'explicit', n, true FROM c
           UNION ALL SELECT 'entity_inference', 'implicit', 0, true FROM c
           UNION ALL SELECT 'linked_percent', 'wikipedia',
             round_even(CAST(100.0 AS DOUBLE) * (n - n_stream_short) / n, 1), true FROM c
           UNION ALL SELECT 'linked_percent', 'wikidata',
             round_even(CAST(100.0 AS DOUBLE) * n / n, 1), true FROM c
           UNION ALL SELECT 'linked_percent', 'dbpedia',
             round_even(CAST(100.0 AS DOUBLE) * (n_customer + n_filter) / n, 1), true FROM c
           UNION ALL SELECT 'entity_inference_percent', 'explicit',
             round_even(CAST(100.0 AS DOUBLE) * n / n, 1), true FROM c
           UNION ALL SELECT 'entity_inference_percent', 'implicit', 0, true FROM c
           UNION ALL SELECT 'types_distribution', 'Konzept', n, false FROM c
           UNION ALL SELECT 'wikipedia_fallback_dist', 'none',
             n_customer + n_filter + n_table_short + n_stream_short, false FROM c
           UNION ALL SELECT 'wikipedia_fallback_dist', 'en_wikipedia', n_join, false FROM c
           UNION ALL SELECT 'wikipedia_fallback_dist', 'opensearch', n_merge + n_window, false FROM c
           UNION ALL SELECT 'wikipedia_fallback_dist', 'synonym', n_spark, false FROM c
           UNION ALL SELECT 'wikipedia_fallback_dist', 'beautifulsoup',
             n_table_long + n_stream_long, false FROM c
           UNION ALL SELECT 'dbpedia_fallback_dist', 'lookup_api', n_filter, false FROM c
           UNION ALL SELECT 'dbpedia_fallback_dist', 'none', n - n_filter, false FROM c
           UNION ALL SELECT 'top10_categories', 'Begriff', n_customer, false FROM c
           UNION ALL SELECT 'top10_internal_links', 'filter', n_customer, false FROM c
           UNION ALL SELECT 'top10_instance_of', 'konzept100', n_customer, false FROM c
           UNION ALL SELECT 'top10_instance_of', 'konzept101', n_customer, false FROM c
           UNION ALL SELECT 'top10_subclass_of', 'konzept101', n_customer, false FROM c
           UNION ALL SELECT 'top10_part_of', 'konzept101', n_filter, false FROM c
           UNION ALL SELECT 'top10_has_part', 'konzept100', n_filter, false FROM c
           UNION ALL SELECT 'top10_dbpedia_types', 'dbo:Thing', n_customer, false FROM c
           UNION ALL SELECT 'top10_dbpedia_categories', 'dbc:Things', n_customer, false FROM c
           UNION ALL SELECT 'top10_dbpedia_subjects', 'Client topics', n_customer, false FROM c
           UNION ALL SELECT 'top10_dbpedia_part_of', 'Commerce', n_customer, false FROM c
           UNION ALL SELECT 'top10_dbpedia_has_part', 'dbo:Account', n_customer, false FROM c)
         SELECT metric, key, CAST(v AS DOUBLE) AS value
         FROM rows_ WHERE always OR v <> 0
         ORDER BY metric, key""")
}
