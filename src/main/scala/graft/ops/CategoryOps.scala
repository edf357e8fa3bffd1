package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Tables.t
import graft.kg.Linking

/** Category-pipeline scalars from the reference (SURVEY §2.2):
  * P8 namespace-prefix strip + P9 maintenance-category blacklist
  * (utils/category_utils.py:3-165) and P11 label-from-URI extraction
  * (context_statistics_top10.py:~230-250), exercised over synthesized
  * category arrays from the driver tables.
  */
object CategoryOps {

  /** P8+P9 via the REAL Linking.cleanCategories column expression. */
  def kgCleanCategories(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(col("p_partkey"),
        array(
          concat(lit("Kategorie:"), col("p_type")),
          lit("Articles with short description"),
          concat(lit("Category:"), col("p_brand")),
          lit("Wikipedia stub"),
          col("p_name"),
          lit("Cleanup needed")).as("categories"))
      .select(col("p_partkey"),
        concat_ws("|", Linking.cleanCategories(col("categories"))).as("kept"))
      .orderBy("p_partkey")

  /** P11 label-from-URI over all three reference branches
    * (context_statistics_top10.py:231-250): dbpedia resource URIs (prefix +
    * Category: stripped, '_'→' '), other URIs with a path (last component,
    * Category: KEPT), and plain strings (returned unchanged, '_' kept). */
  def kgLabelFromUri(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(col("p_partkey"),
        regexp_replace(col("p_name"), " ", "_").as("n"))
      .select(col("p_partkey"), posexplode(array(
        concat(lit("http://dbpedia.org/resource/Category:"), col("n")),
        concat(lit("http://dbpedia.org/resource/"), col("n")),
        concat(lit("http://example.org/ns/Category:"), col("n")),
        concat(lit("dbo:"), col("n")))).as(Seq("variant", "uri")))
      .withColumn("label", Linking.labelFromUri(col("uri")))
      .select("p_partkey", "variant", "uri", "label")
      .orderBy("p_partkey", "variant")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "kg_clean_categories" -> kgCleanCategories _,
    "kg_label_from_uri"   -> kgLabelFromUri _)

  private val kw = Linking.MaintenanceKeywords
    .map(k => s"'$k'").mkString("[", ", ", "]")

  val oracles: Map[String, String] = Map(
    // mirror: strip namespace prefix, drop categories starting with any
    // maintenance keyword, join survivors with '|'
    "kg_clean_categories" ->
      s"""WITH c AS (
           SELECT p_partkey,
             ['Kategorie:' || p_type,
              'Articles with short description',
              'Category:' || p_brand,
              'Wikipedia stub',
              p_name,
              'Cleanup needed'] AS categories
           FROM part),
         s AS (SELECT p_partkey,
             list_transform(categories,
               x -> regexp_replace(x, '^(Category:|Kategorie:|Catégorie:)', '')) AS stripped
           FROM c)
         SELECT p_partkey,
           list_aggregate(
             list_filter(stripped,
               x -> len(list_filter($kw, k -> starts_with(x, k))) = 0),
             'string_agg', '|') AS kept
         FROM s ORDER BY p_partkey""",
    // mirror of the reference branch structure: dbpedia prefix → strip +
    // replace-all Category: (when leading) + '_'→' '; other URI → last
    // path component + '_'→' ' (Category: kept); plain string → unchanged
    "kg_label_from_uri" ->
      """WITH v AS (SELECT p_partkey, replace(p_name, ' ', '_') AS n FROM part),
         u AS (
           SELECT p_partkey, 0 AS variant,
             'http://dbpedia.org/resource/Category:' || n AS uri FROM v
           UNION ALL SELECT p_partkey, 1, 'http://dbpedia.org/resource/' || n FROM v
           UNION ALL SELECT p_partkey, 2, 'http://example.org/ns/Category:' || n FROM v
           UNION ALL SELECT p_partkey, 3, 'dbo:' || n FROM v)
         SELECT p_partkey, variant, uri,
           CASE
             WHEN starts_with(uri, 'http://dbpedia.org/resource/') THEN
               replace(CASE WHEN starts_with(substr(uri, 29), 'Category:')
                            THEN replace(substr(uri, 29), 'Category:', '')
                            ELSE substr(uri, 29) END, '_', ' ')
             WHEN contains(uri, '/') THEN
               replace(regexp_extract(uri, '([^/]+)$', 1), '_', ' ')
             ELSE uri END AS label
         FROM u ORDER BY p_partkey, variant""")
}
