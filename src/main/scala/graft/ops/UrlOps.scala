package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Tables.t
import graft.kg.TextUtils

/** URL scalar operators from the reference (SURVEY §2.2 P3-P5, P10) applied
  * over synthesized URLs/labels from part names — driver-verifiable via
  * DuckDB string functions.
  */
object UrlOps {

  /** P3 validity + P4 ellipsis strip + P5 url sanitization + P10 dbpedia
    * URI, one row per part. */
  def kgUrlutils(spark: SparkSession, dir: String): DataFrame = {
    val sanitize = udf((s: String) => TextUtils.sanitizeWikipediaUrl(s))
    val dbpUri = udf((s: String) => TextUtils.dbpediaUri(s))
    val stripEll = udf((s: String) => TextUtils.stripTrailingEllipsis(s))
    val validUdf = udf((s: String) => TextUtils.isValidWikipediaUrl(s))
    // P6: full URL → (lang, title) round-trip (sanitize ∘ parse = identity
    // on these names); a non-wiki URL parses to ("", "")
    val parse = udf((s: String) => TextUtils.parseWikipediaUrl(s))
    t(spark, dir, "part")
      .select(col("p_partkey"), col("p_name"))
      .withColumn("wiki_url",
        sanitize(concat(lit("https://de.wikipedia.org/wiki/"), col("p_name"))))
      .withColumn("is_valid", validUdf(col("wiki_url")))
      .withColumn("dbpedia_uri", dbpUri(col("p_name")))
      .withColumn("no_ellipsis", stripEll(concat(col("p_name"), lit("..."))))
      .withColumn("parsed", parse(col("wiki_url")))
      .withColumn("nonwiki", parse(lit("https://example.com/page/1")))
      // U2 clean_title (the same column expression the L3 lookup path
      // applies): trailing qualifier dropped, whitespace collapsed+trimmed
      .withColumn("clean_title", graft.kg.Linking.cleanTitleCol(
        concat(lit("  "), regexp_replace(col("p_name"), " ", "   "),
          lit(" (Begriff)"))))
      .select(col("p_partkey"), col("wiki_url"), col("is_valid"),
        col("dbpedia_uri"), col("no_ellipsis"), col("clean_title"),
        col("parsed._1").as("parsed_lang"), col("parsed._2").as("parsed_title"),
        col("nonwiki._1").as("nonwiki_lang"), col("nonwiki._2").as("nonwiki_title"))
      .orderBy("p_partkey")
  }

  /** A4-shape top-10 counter: most frequent words across documents
    * (explode → count → global top-k with deterministic tie-break). */
  def taTop10Words(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc)
      .limit(10)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "kg_urlutils"    -> kgUrlutils _,
    "ta_top10_words" -> taTop10Words _)

  val oracles: Map[String, String] = Map(
    // p_name is lowercase words + spaces → sanitize = space→underscore (no
    // percent-encoding needed); valid per the reference regex; dbpedia uri
    // uppercases the first char and keeps '_'
    "kg_urlutils" ->
      """SELECT p_partkey,
         'https://de.wikipedia.org/wiki/' || replace(p_name, ' ', '_') AS wiki_url,
         regexp_matches('https://de.wikipedia.org/wiki/' || replace(p_name, ' ', '_'),
           '^https?://[a-z]{2}\.wikipedia\.org/wiki/[a-zA-Z0-9_\-%]+') AS is_valid,
         'http://dbpedia.org/resource/' || upper(substr(replace(p_name, ' ', '_'), 1, 1))
           || substr(replace(p_name, ' ', '_'), 2) AS dbpedia_uri,
         p_name AS no_ellipsis,
         p_name AS clean_title,
         'de' AS parsed_lang,
         p_name AS parsed_title,
         '' AS nonwiki_lang,
         '' AS nonwiki_title
         FROM part ORDER BY p_partkey""",
    "ta_top10_words" ->
      """SELECT word, count(*) AS n FROM (
           SELECT unnest(string_split(text, ' ')) AS word FROM documents) z
         GROUP BY word ORDER BY n DESC, word ASC LIMIT 10""")
}
