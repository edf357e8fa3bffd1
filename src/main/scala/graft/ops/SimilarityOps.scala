package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.queries.Tables.t

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (Array[Float], dim 64): brute-force cosine top-k as the correctness
  * baseline, and an LSH (random-hyperplane / SimHash-for-vectors) bucketing
  * as the scale path — at 10^9 vectors the bucket join replaces the
  * quadratic cross join with a per-bucket local top-k.
  *
  * Hyperplanes are md5-derived so both engines (and re-runs) agree exactly;
  * ranking uses round(cos, 4) with id tie-break so float ulp noise cannot
  * flip the hash compare.
  */
object SimilarityOps {

  /** Register the native vector expressions (graft.functions.VecOps):
    * the aggregate(zip_with(...)) dot product and the hyperplane bucket
    * are CodegenFallback HOFs evaluated interpreted per element per
    * candidate pair; the native forms run the same IEEE ops in the same
    * left-fold order (VecOpsSpec bit-identity), and the bucket's
    * md5-derived hyperplane weights become class-load constants. */
  private def registerVecFns(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot",
      args => graft.functions.VecDot(args(0), args(1)), "built-in")
    reg.createOrReplaceTempFunction("lsh_bucket8",
      args => graft.functions.LshBucket8(args.head), "built-in")
  }

  private def vecs(spark: SparkSession, dir: String): DataFrame = {
    registerVecFns(spark)
    t(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        // element-wise float->double widening: a native Cast (codegen),
        // identical to the transform(..., cast) HOF it replaces
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(call_function("vec_dot", col("v"), col("v"))))
  }

  /** Brute-force cosine top-5 for the first 10 query vectors. */
  def simTopk(spark: SparkSession, dir: String): DataFrame = {
    val e = vecs(spark, dir)
    val q = e.filter(col("vec_id") < 10).select(col("vec_id").as("query_id"),
      col("v").as("qv"), col("nrm").as("qn"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("v").as("nv"), col("nrm").as("nn"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos4").desc, col("neighbor_id").asc)
    q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos4", round(
        call_function("vec_dot", col("qv"), col("nv")) /
          (col("qn") * col("nn")), 4))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("cos4").as("cosine"))
      .orderBy("query_id", "rk")
  }

  def simLshBuckets(spark: SparkSession, dir: String): DataFrame =
    vecs(spark, dir)
      .select(col("vec_id"), call_function("lsh_bucket8", col("v")).as("bucket"))
      .orderBy("vec_id")

  /** ANN top-3 within each LSH bucket (the scale path: shuffle on bucket,
    * local quadratic only inside buckets of ~N/256). */
  def simAnnTopk(spark: SparkSession, dir: String): DataFrame = {
    val e = vecs(spark, dir).withColumn("bucket", call_function("lsh_bucket8", col("v")))
    // symmetric aliases + shuffle_hash (round 6, same reasoning as
    // dd_minhash_lsh): the broadcast self-join evaluated the full
    // vec-norm + hyperplane-bucket pass on BOTH sides; with the two
    // sides canonically identical hash exchanges, exchange reuse runs
    // it once — and the shuffle is the at-scale shape anyway.
    val a = e.select(col("bucket").as("bucket1"), col("vec_id").as("query_id"),
      col("v").as("qv"), col("nrm").as("qn"))
    val b = e.select(col("bucket").as("bucket2"), col("vec_id").as("neighbor_id"),
      col("v").as("nv"), col("nrm").as("nn"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos4").desc, col("neighbor_id").asc)
    a.join(b.hint("shuffle_hash"),
        col("bucket1") === col("bucket2") && col("query_id") =!= col("neighbor_id"))
      .withColumn("cos4", round(
        call_function("vec_dot", col("qv"), col("nv")) /
          (col("qn") * col("nn")), 4))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("cos4").as("cosine"))
      .orderBy("query_id", "rk")
  }

  /** IVF-style ANN (the other classic scale path next to LSH): a
    * deterministic 16-entry coarse codebook (fixed vec_ids as centroids —
    * the seed-stable stand-in for k-means), every vector assigned to its
    * nearest centroid (broadcast join against the codebook, one shuffle on
    * cluster id), queries probe their nprobe=2 nearest clusters and run the
    * local top-k inside those clusters only. At 10^9 vectors the codebook
    * grows to ~√N entries and the per-cluster scan stays ~N/√N. */
  def simIvfTopk(spark: SparkSession, dir: String): DataFrame = {
    val e = vecs(spark, dir)
    val cent = e.filter(col("vec_id") % 37 === 0 && col("vec_id") < 37 * 16)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
    val wAssign = Window.partitionBy("vec_id")
      .orderBy(col("ccos").desc, col("cid").asc)
    val assignAll = e.join(broadcast(cent))
      .withColumn("ccos", round(
        call_function("vec_dot", col("v"), col("cv")) /
          (col("nrm") * col("cn")), 4))
      .withColumn("crk", row_number().over(wAssign))
    val assigned = assignAll.filter(col("crk") === 1)
      .select(col("cid"), col("vec_id").as("neighbor_id"),
        col("v").as("nv"), col("nrm").as("nn"))
    val probes = assignAll.filter(col("crk") <= 2 && col("vec_id") < 10)
      .select(col("cid").as("qcid"), col("vec_id").as("query_id"),
        col("v").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos4").desc, col("neighbor_id").asc)
    probes.join(assigned,
        col("qcid") === col("cid") && col("query_id") =!= col("neighbor_id"))
      .withColumn("cos4", round(
        call_function("vec_dot", col("qv"), col("nv")) /
          (col("qn") * col("nn")), 4))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("cos4").as("cosine"))
      .orderBy("query_id", "rk")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_topk"        -> simTopk _,
    "sim_lsh_buckets" -> simLshBuckets _,
    "sim_ann_topk"    -> simAnnTopk _,
    "sim_ivf_topk"    -> simIvfTopk _)

  private val vecsSql =
    """SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v,
       sqrt(list_reduce(list_transform(embedding, x -> (x::DOUBLE) * (x::DOUBLE)), (a, b) -> a + b)) AS nrm
       FROM embeddings"""

  private val bucketSql =
    """list_aggregate(list_transform(generate_series(0, 7), p ->
         CASE WHEN list_reduce(list_transform(generate_series(1, 64), i ->
             v[i] * (CAST('0x' || substr(md5('p' || p || '_' || i), 1, 2) AS INT) - 127.5)),
             (a, b) -> a + b) > 0 THEN '1' ELSE '0' END), 'string_agg', '')"""

  val oracles: Map[String, String] = Map(
    "sim_topk" ->
      s"""WITH e AS ($vecsSql),
         p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_reduce(list_transform(generate_series(1, 64), i -> q.v[i] * c.v[i]),
               (a, b) -> a + b) / (q.nrm * c.nrm), 4) AS cos4
           FROM e q JOIN e c ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
         r AS (SELECT query_id, neighbor_id, cos4,
             row_number() OVER (PARTITION BY query_id ORDER BY cos4 DESC, neighbor_id ASC) AS rk
           FROM p)
         SELECT query_id, rk, neighbor_id, cos4 AS cosine FROM r WHERE rk <= 5
         ORDER BY query_id, rk""",
    "sim_lsh_buckets" ->
      s"""WITH e AS ($vecsSql)
         SELECT vec_id, $bucketSql AS bucket FROM e ORDER BY vec_id""",
    "sim_ivf_topk" ->
      s"""WITH e AS ($vecsSql),
         cent AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM e
                  WHERE vec_id % 37 = 0 AND vec_id < 592),
         aa AS (SELECT e.vec_id, e.v, e.nrm, c.cid,
             round(list_reduce(list_transform(generate_series(1, 64), i -> e.v[i] * c.cv[i]),
               (a, b) -> a + b) / (e.nrm * c.cn), 4) AS ccos
           FROM e, cent c),
         ar AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS crk FROM aa),
         assigned AS (SELECT cid, vec_id AS neighbor_id, v AS nv, nrm AS nn FROM ar WHERE crk = 1),
         probes AS (SELECT cid AS qcid, vec_id AS query_id, v AS qv, nrm AS qn
                    FROM ar WHERE crk <= 2 AND vec_id < 10),
         p AS (SELECT q.query_id, a.neighbor_id,
             round(list_reduce(list_transform(generate_series(1, 64), i -> q.qv[i] * a.nv[i]),
               (a2, b2) -> a2 + b2) / (q.qn * a.nn), 4) AS cos4
           FROM probes q JOIN assigned a
             ON q.qcid = a.cid AND q.query_id <> a.neighbor_id),
         r AS (SELECT query_id, neighbor_id, cos4,
             row_number() OVER (PARTITION BY query_id ORDER BY cos4 DESC, neighbor_id ASC) AS rk
           FROM p)
         SELECT query_id, rk, neighbor_id, cos4 AS cosine FROM r WHERE rk <= 3
         ORDER BY query_id, rk""",
    "sim_ann_topk" ->
      s"""WITH e AS ($vecsSql),
         eb AS (SELECT vec_id, v, nrm, $bucketSql AS bucket FROM e),
         p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_reduce(list_transform(generate_series(1, 64), i -> q.v[i] * c.v[i]),
               (a, b) -> a + b) / (q.nrm * c.nrm), 4) AS cos4
           FROM eb q JOIN eb c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id),
         r AS (SELECT query_id, neighbor_id, cos4,
             row_number() OVER (PARTITION BY query_id ORDER BY cos4 DESC, neighbor_id ASC) AS rk
           FROM p)
         SELECT query_id, rk, neighbor_id, cos4 AS cosine FROM r WHERE rk <= 3
         ORDER BY query_id, rk""")
}
