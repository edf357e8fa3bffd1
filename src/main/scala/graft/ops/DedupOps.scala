package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Tables.t

/** Large-scale training-data deduplication operators over the `documents`
  * and `embeddings` tables: exact (hash groupBy), n-gram Jaccard,
  * MinHash+LSH (shingle → signature → band → bucket join), SimHash, and
  * embedding-cosine near-dup.
  *
  * All hashes are md5-based so the DuckDB oracle can reproduce them exactly
  * (engine-portable determinism); all similarity scores are rounded before
  * comparison so float summation order cannot flip the hash compare.
  *
  * Scale notes: shingling/signatures are map-only; the only shuffles are the
  * band-bucket self-join (MinHash) and the shingle equi-join (Jaccard),
  * both of which are the standard linear-scale LSH layouts — the quadratic
  * brute-force variants are deliberately bounded (`doc_id < cap`) and exist
  * as correctness baselines for the LSH paths.
  */
object DedupOps {

  /** 3-gram word shingles as ONE native expression
    * ([[graft.functions.Shingles3]]) — the HOF formulation (which the
    * DuckDB oracle keeps, see `shingleSql`) ran CodegenFallback-interpreted
    * per window; it was the last interpreted HOF on a headline path. */
  private def shingles(spark: SparkSession,
      ws: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingles3", args => graft.functions.Shingles3(args.head), "built-in")
    call_function("shingles3", ws)
  }

  /** Exact dedup summary per source: total vs distinct-content counts. */
  def ddExact(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           countDistinct(md5(col("text"))).as("n_unique"))
      .orderBy("source")

  /** n-gram Jaccard near-dup pairs (correctness baseline; bounded probe). */
  def ddNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents").filter(col("doc_id") < 1000)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), shingles(spark, col("ws")).as("shs"))
    val sh = d.select(col("doc_id"), explode(col("shs")).as("s"))
    // |shingle set| directly from the (already-distinct) shingle array —
    // the explode+groupBy formulation (which the DuckDB oracle keeps) paid
    // an aggregate exchange and a THIRD execution of the shingle map pass
    // for a value that is just size(shs) (guide §2.4: remove shuffles
    // outright). count(*)-over-explode returns long, so cast to keep the
    // downstream arithmetic and schema identical.
    val sizes = d.select(col("doc_id"), size(col("shs")).cast("long").as("sz"))
    val a = sh.toDF("da", "s")
    val b = sh.toDF("db", "s2")
    val inter = a.join(b, col("s") === col("s2") && col("da") < col("db"))
      .groupBy("da", "db").agg(count(lit(1)).as("i"))
    inter
      .join(sizes.toDF("da", "sa"), "da")
      .join(sizes.toDF("db", "sb"), "db")
      .withColumn("jaccard",
        round(col("i") / (col("sa") + col("sb") - col("i")) + lit(1e-9), 4))
      .filter(col("jaccard") >= 0.4)
      .select(col("da").as("doc_a"), col("db").as("doc_b"), col("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** MinHash signature → (band, bucket) rows: the shared LSH layout.
    * The signature (8 per-seed md5 minima over 3-gram shingles) is ONE
    * native expression ([[graft.functions.MinhashSig]]) — the previous
    * nested-HOF formulation (transform(sequence(0,7), k ->
    * array_min(transform(shs, s -> md5(...))))), which the DuckDB oracle
    * still uses verbatim, ran CodegenFallback-interpreted per
    * (seed × shingle) and dominated the signature stage. */
  private def lshBuckets(spark: SparkSession, dir: String): DataFrame = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", args => graft.functions.MinhashSig(args.head), "built-in")
    val sig = t(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), call_function("minhash_sig", col("ws")).as("sig"))
    sig
      .select(col("doc_id"), explode(expr("sequence(0, 3)")).as("band"), col("sig"))
      .select(col("doc_id"), col("band"),
        md5(concat(expr("element_at(sig, 2 * band + 1)"),
                   expr("element_at(sig, 2 * band + 2)"))).as("bucket"))
  }

  /** MinHash + LSH: 8 md5 min-hashes, 4 bands × 2 rows, bucket self-join.
    * Emits candidate pairs with the number of colliding bands — the
    * linear-scale near-dup path (shuffle = one groupBy on (band, bucket)). */
  def ddMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val buckets = lshBuckets(spark, dir)
    val a = buckets.toDF("doc_a", "band1", "bucket1")
    val b = buckets.toDF("doc_b", "band2", "bucket2")
    // shuffle_hash + symmetric renames (guide §3.1, round 6): under the
    // default broadcast self-join BOTH sides run the full signature map
    // pass — the executed plan showed two complete scans+minhash_sig
    // evaluations, one feeding the broadcast build. Hinting the
    // shuffle-hash join makes the two sides identical hash exchanges —
    // and it is the plan shape the join takes at 100 TB anyway (the
    // bucket table outgrows the broadcast budget there). The rename of
    // EVERY column on BOTH sides matters: a one-sided `band AS band2`
    // leaves an extra Alias node in only one subtree, the canonicalized
    // exchanges stop matching, and exchange reuse silently does not
    // fire (verified via the executed plan — ReusedExchange present
    // only with symmetric aliases).
    a.join(b.hint("shuffle_hash"),
        col("band1") === col("band2") && col("bucket1") === col("bucket2") &&
        col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_bands"))
      .orderBy("doc_a", "doc_b")
  }

  /** Incremental dedup: a fresh increment (doc_id%5==0 stands in for the
    * new crawl batch) deduped AGAINST THE EXISTING CORPUS via an LSH
    * band-bucket semi-join — never all-pairs, and the existing side is
    * touched only through its (band, bucket) index. This is the cross-run
    * shape: at 100 TB the bucket index of the accumulated corpus is a
    * materialized table and each increment joins against it. */
  def ddIncremental(spark: SparkSession, dir: String): DataFrame = {
    val buckets = lshBuckets(spark, dir)
    val newB = buckets.filter(col("doc_id") % 5 === 0)
    val oldB = buckets.filter(col("doc_id") % 5 =!= 0)
      .select(col("band").as("band2"), col("bucket").as("bucket2")).distinct()
    val hits = newB.join(oldB,
        col("band") === col("band2") && col("bucket") === col("bucket2"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit_bands"))
    newB.select("doc_id").distinct()
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hit_bands"), lit(0L)).as("n_hit_bands"),
        when(coalesce(col("n_hit_bands"), lit(0L)) > 0, "dup").otherwise("novel").as("status"))
      .orderBy("doc_id")
  }

  /** SimHash: 32-bit signature; bit j is the sign of the count-weighted sum
    * of md5-derived word bits. Near-identical docs share most bits.
    *
    * Scale shape: MAP-ONLY since round 4 — the signature is a per-doc fold
    * over word instances (integer ± sums, order-independent), so the
    * native [[graft.functions.SimHash32]] expression computes it with NO
    * explode and NO shuffle at all. Round 3's groupBy(doc_id) with 32
    * map-side-combined sums (itself down from the 32×-exploded round-2
    * shape) still moved one partial row per (doc, partition) through an
    * aggregate exchange; the DuckDB oracle keeps that formulation. */
  def ddSimhash(spark: SparkSession, dir: String): DataFrame = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash32", args => graft.functions.SimHash32(args.head), "built-in")
    t(spark, dir, "documents")
      .select(col("doc_id"),
        call_function("simhash32", split(col("text"), " ")).as("simhash"))
      .orderBy("doc_id")
  }

  /** Embedding-cosine near-dup pairs (bounded brute force; the scale path is
    * [[SimilarityOps.simLshBuckets]]). Explicit dot/norm expressions keep
    * both engines' float math element-ordered; rounded to 3 decimals. */
  def ddEmbedCos(spark: SparkSession, dir: String): DataFrame = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction("vec_dot",
      args => graft.functions.VecDot(args(0), args(1)), "built-in")
    val e = t(spark, dir, "embeddings").filter(col("vec_id") < 300)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(call_function("vec_dot", col("v"), col("v"))))
    val a = e.toDF("vec_a", "va", "na")
    val b = e.toDF("vec_b", "vb", "nb")
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("dot", call_function("vec_dot", col("va"), col("vb")))
      .withColumn("cosine", round(col("dot") / (col("na") * col("nb")), 3))
      .filter(col("cosine") >= 0.3)
      .select("vec_a", "vec_b", "cosine")
      .orderBy("vec_a", "vec_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_exact"         -> ddExact _,
    "dd_ngram_jaccard" -> ddNgramJaccard _,
    "dd_minhash_lsh"   -> ddMinhashLsh _,
    "dd_incremental"   -> ddIncremental _,
    "dd_simhash"       -> ddSimhash _,
    "dd_embed_cos"     -> ddEmbedCos _)

  private val shingleSql =
    """list_distinct(list_transform(
         generate_series(1, greatest(len(ws) - 2, 1)),
         i -> ws[i] || ' ' || coalesce(ws[i + 1], '') || ' ' || coalesce(ws[i + 2], '')))"""

  val oracles: Map[String, String] = Map(
    "dd_exact" ->
      """SELECT source, count(*) AS n_docs,
         CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique
         FROM documents GROUP BY source ORDER BY source""",
    "dd_ngram_jaccard" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents WHERE doc_id < 1000),
         sh AS (SELECT doc_id, unnest($shingleSql) AS s FROM d),
         sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
         inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                   FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
         SELECT doc_a, doc_b, round(i * 1.0 / (sa.sz + sb.sz - i) + 1e-9, 4) AS jaccard
         FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
         WHERE round(i * 1.0 / (sa.sz + sb.sz - i) + 1e-9, 4) >= 0.4
         ORDER BY doc_a, doc_b""",
    "dd_minhash_lsh" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         sh AS (SELECT doc_id, $shingleSql AS shs FROM d),
         sig AS (SELECT doc_id, list_transform(generate_series(0, 7),
                   k -> list_min(list_transform(shs, s -> md5(k::VARCHAR || '|' || s)))) AS sig FROM sh),
         bands AS (SELECT doc_id, unnest(generate_series(0, 3)) AS band, sig FROM sig),
         buckets AS (SELECT doc_id, band, md5(sig[2 * band + 1] || sig[2 * band + 2]) AS bucket FROM bands)
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_bands
         FROM buckets a JOIN buckets b
           ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "dd_incremental" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         sh AS (SELECT doc_id, $shingleSql AS shs FROM d),
         sig AS (SELECT doc_id, list_transform(generate_series(0, 7),
                   k -> list_min(list_transform(shs, s -> md5(k::VARCHAR || '|' || s)))) AS sig FROM sh),
         bands AS (SELECT doc_id, unnest(generate_series(0, 3)) AS band, sig FROM sig),
         buckets AS (SELECT doc_id, band, md5(sig[2 * band + 1] || sig[2 * band + 2]) AS bucket FROM bands),
         newb AS (SELECT * FROM buckets WHERE doc_id % 5 = 0),
         oldb AS (SELECT DISTINCT band, bucket FROM buckets WHERE doc_id % 5 <> 0),
         hits AS (SELECT n.doc_id, count(*) AS n_hit_bands FROM newb n
                  WHERE EXISTS (SELECT 1 FROM oldb o
                                WHERE o.band = n.band AND o.bucket = n.bucket)
                  GROUP BY n.doc_id)
         SELECT d.doc_id, coalesce(h.n_hit_bands, 0) AS n_hit_bands,
                CASE WHEN coalesce(h.n_hit_bands, 0) > 0 THEN 'dup' ELSE 'novel' END AS status
         FROM (SELECT DISTINCT doc_id FROM newb) d LEFT JOIN hits h USING (doc_id)
         ORDER BY doc_id""",
    "dd_simhash" ->
      """WITH w AS (SELECT doc_id, wd, count(*) AS c FROM
             (SELECT doc_id, unnest(string_split(text, ' ')) AS wd FROM documents) z
           GROUP BY 1, 2),
         j AS (SELECT unnest(generate_series(1, 32)) AS j),
         bits AS (SELECT doc_id, j,
             CASE WHEN sum(c * (CASE WHEN substr(md5(wd), j, 1) >= '8' THEN 1 ELSE -1 END)) > 0
                  THEN '1' ELSE '0' END AS bit
           FROM w, j GROUP BY doc_id, j)
         SELECT doc_id, string_agg(bit, '' ORDER BY j) AS simhash
         FROM bits GROUP BY doc_id ORDER BY doc_id""",
    "dd_embed_cos" ->
      """WITH e AS (SELECT vec_id,
             list_transform(embedding, x -> x::DOUBLE) AS v
           FROM embeddings WHERE vec_id < 300),
         n AS (SELECT vec_id, v,
             sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm FROM e)
         SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_reduce(list_transform(generate_series(1, 64),
                   i -> a.v[i] * b.v[i]), (x, y) -> x + y) / (a.nrm * b.nrm), 3) AS cosine
         FROM n a JOIN n b ON a.vec_id < b.vec_id
         WHERE round(list_reduce(list_transform(generate_series(1, 64),
                 i -> a.v[i] * b.v[i]), (x, y) -> x + y) / (a.nrm * b.nrm), 3) >= 0.3
         ORDER BY vec_a, vec_b""")
}
