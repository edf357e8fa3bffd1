package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Tables.t
import graft.kg.TextUtils

/** Text-analysis operators for a training-data pipeline over `documents`:
  * token counting, quality scoring, language-ID (the reference's stopword
  * heuristic, utils/language_utils.py:15-66), rolling-window document
  * fingerprinting, chunking (utils/text_utils.py:90-112), and entity-name
  * normalization (core/api/relationships.py:112-134).
  */
object TextOps {

  /** Token counts: whitespace tokens + a BPE-ish regex tokenizer. */
  def taTokens(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_ws_tokens"),
        size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")).cast("long")
          .as("n_re_tokens"),
        length(col("text")).cast("long").as("n_chars"))
      .orderBy("doc_id")

  /** Quality score: length, stopword ratio, mean word length (the
    * deterministic shape of web-text quality filters). */
  def taQuality(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"), length(col("text")).as("nc"))
      .withColumn("n_words", size(col("ws")).cast("double"))
      .withColumn("stop_ratio",
        expr("size(filter(ws, w -> w in ('the', 'a', 'of', 'and')))") / col("n_words"))
      .withColumn("mean_wlen",
        (col("nc") - (col("n_words") - 1)) / col("n_words"))
      .select(col("doc_id"),
        round(col("stop_ratio") + lit(1e-9), 4).as("stop_ratio"),
        round(col("mean_wlen") + lit(1e-9), 4).as("mean_wlen"),
        round(least(col("n_words") / 100.0, lit(1.0)) * 0.5 +
              (lit(1.0) - col("stop_ratio")) * 0.3 +
              least(col("mean_wlen") / 8.0, lit(1.0)) * 0.2 + lit(1e-9), 4).as("quality"))
      .orderBy("doc_id")

  /** Language-ID via the reference's stopword-marker heuristic (ported UDF
    * — detect_language, language_utils.py:15-66). */
  def taLangid(spark: SparkSession, dir: String): DataFrame = {
    val detect = udf((text: String) => TextUtils.detectLanguage(text))
    t(spark, dir, "documents")
      .select(col("doc_id"), col("lang").as("lang_declared"),
        detect(col("text")).as("lang_detected"))
      .orderBy("doc_id")
  }

  /** Rolling-window fingerprint: min md5 over all 5-char windows (the
    * winnowing primitive for containment detection). Native expression
    * ([[graft.functions.RollingFingerprint]]); the previous HOF
    * formulation — which the DuckDB oracle keeps — ran
    * CodegenFallback-interpreted per character position. */
  def taFingerprint(spark: SparkSession, dir: String): DataFrame = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_fingerprint",
      args => graft.functions.RollingFingerprint(args.head), "built-in")
    t(spark, dir, "documents")
      .select(col("doc_id"),
        call_function("rolling_fingerprint", col("text")).as("fingerprint"))
      .orderBy("doc_id")
  }

  /** chunk_text explode (P1): the ported reference chunker as a UDF. */
  def kgChunks(spark: SparkSession, dir: String): DataFrame = {
    val chunk = udf((text: String) => TextUtils.chunkText(text, 120, 20))
    t(spark, dir, "documents")
      .select(col("doc_id"), posexplode(chunk(col("text"))).as(Seq("chunk_idx", "chunk")))
      .orderBy("doc_id", "chunk_idx")
  }

  /** normalize_entity_name over synthesized variants of part names (P7),
    * via the NATIVE Catalyst expression (codegen, no UDF —
    * graft.functions.NormName). */
  def kgNormname(spark: SparkSession, dir: String): DataFrame = {
    val norm = (c: org.apache.spark.sql.Column) =>
      graft.functions.GraftFunctions.norm_name(spark, c)
    val p = t(spark, dir, "part")
    p.select(col("p_partkey"), lit(0).as("variant"), norm(col("p_name")).as("normed"))
      .union(p.select(col("p_partkey"), lit(1).as("variant"),
        norm(concat(col("p_name"), lit(" ("), col("p_brand"), lit(")")))))
      .union(p.select(col("p_partkey"), lit(2).as("variant"),
        norm(concat(lit("["), col("p_name"), lit("]")))))
      .orderBy("p_partkey", "variant")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_tokens"      -> taTokens _,
    "ta_quality"     -> taQuality _,
    "ta_langid"      -> taLangid _,
    "ta_fingerprint" -> taFingerprint _,
    "kg_chunks"      -> kgChunks _,
    "kg_normname"    -> kgNormname _)

  val oracles: Map[String, String] = Map(
    "ta_tokens" ->
      """SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
         CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_re_tokens,
         CAST(length(text) AS BIGINT) AS n_chars
         FROM documents ORDER BY doc_id""",
    "ta_quality" ->
      """WITH q AS (
           SELECT doc_id, string_split(text, ' ') AS ws, length(text) AS nc FROM documents),
         w AS (
           SELECT doc_id,
             CAST(len(ws) AS DOUBLE) AS n_words,
             len(list_filter(ws, w -> w IN ('the', 'a', 'of', 'and'))) / CAST(len(ws) AS DOUBLE) AS stop_ratio,
             (nc - (len(ws) - 1)) / CAST(len(ws) AS DOUBLE) AS mean_wlen
           FROM q)
         SELECT doc_id, round(stop_ratio + 1e-9, 4) AS stop_ratio,
           round(mean_wlen + 1e-9, 4) AS mean_wlen,
           round(least(n_words / 100.0, 1.0) * 0.5 + (1.0 - stop_ratio) * 0.3 +
                 least(mean_wlen / 8.0, 1.0) * 0.2 + 1e-9, 4) AS quality
         FROM w ORDER BY doc_id""",
    "ta_langid" ->
      """WITH w AS (SELECT doc_id, lang AS lang_declared,
           list_transform(regexp_split_to_array(lower(text), '\s+'), x -> trim(x, '.,;:!?()[]{}"''')) AS ws,
           lower(text) AS lt FROM documents),
         c AS (SELECT doc_id, lang_declared, lt,
           len(list_filter(ws, x -> x IN ('der','die','das','und','ist','in','von','zu','mit','den','für','auf','ein','eine'))) AS c_de,
           len(list_filter(ws, x -> x IN ('the','and','is','in','to','of','for','with','on','at','from','by','an','as'))) AS c_en,
           len(list_filter(ws, x -> x IN ('le','la','les','et','est','en','de','du','dans','pour','avec','sur','un','une'))) AS c_fr,
           len(list_filter(ws, x -> x IN ('el','la','los','las','y','es','en','de','para','con','por','un','una','su'))) AS c_es
           FROM w)
         SELECT doc_id, lang_declared,
           CASE
             WHEN greatest(c_de, c_en, c_fr, c_es) >= 2 THEN
               CASE WHEN c_de >= c_en AND c_de >= c_fr AND c_de >= c_es THEN 'de'
                    WHEN c_en >= c_fr AND c_en >= c_es THEN 'en'
                    WHEN c_fr >= c_es THEN 'fr' ELSE 'es' END
             WHEN regexp_matches(lt, '[äöüß]') THEN 'de'
             ELSE 'en' END AS lang_detected
         FROM c ORDER BY doc_id""",
    "ta_fingerprint" ->
      """SELECT doc_id,
         list_min(list_transform(generate_series(1, greatest(length(text) - 4, 1)),
                  i -> md5(substr(text, i, 5)))) AS fingerprint
         FROM documents ORDER BY doc_id""",
    "kg_chunks" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents WHERE length(text) > 0),
         c AS (SELECT doc_id, text, n,
                 CASE WHEN n <= 120 THEN 1
                      ELSE 1 + CAST(ceil((n - 120) / 100.0) AS INT) END AS n_chunks
               FROM d)
         SELECT doc_id, CAST(i AS INT) AS chunk_idx,
                substr(text, 1 + CAST(i AS INT) * 100, 120) AS chunk
         FROM c, UNNEST(generate_series(0, n_chunks - 1)) AS u(i)
         ORDER BY doc_id, chunk_idx""",
    "kg_normname" ->
      """WITH v AS (
           SELECT p_partkey, 0 AS variant, p_name AS nm FROM part
           UNION ALL
           SELECT p_partkey, 1, p_name || ' (' || p_brand || ')' FROM part
           UNION ALL
           SELECT p_partkey, 2, '[' || p_name || ']' FROM part),
         s1 AS (SELECT p_partkey, variant, trim(lower(nm)) AS x FROM v),
         s2 AS (SELECT p_partkey, variant,
                  CASE WHEN length(x) >= 2 AND substr(x, 1, 1) = '[' AND substr(x, length(x), 1) = ']'
                       THEN trim(substr(x, 2, length(x) - 2)) ELSE x END AS x FROM s1)
         SELECT p_partkey, variant,
           CASE WHEN strpos(x, '(') > 0 AND strpos(x, ')') > 0
                THEN trim(substr(x, 1, strpos(x, '(') - 1)) ELSE x END AS normed
         FROM s2 ORDER BY p_partkey, variant""")
}
