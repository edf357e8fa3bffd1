package graft.kg

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** dictJoin size-gate robustness: the row-count fallback for stats-less
  * plans (the 8-EiB defaultSizeInBytes sentinel), the per-run decision
  * recorder, and the join-path metric rows surfaced by Pipeline. */
class DictJoinGateSpec extends SparkSpec {
  import spark.implicits._

  test("stats-less dict (RDD-backed, sentinel estimate) falls back to row count") {
    val probe = Seq(("a", 1), ("b", 2)).toDF("k", "v")
    // RDD-backed DataFrame: LogicalRDD carries no size stats → the
    // optimizer reports defaultSizeInBytes (Long.MaxValue)
    val dictRdd = spark.sparkContext.parallelize(Seq(Row("a", "x"), Row("b", "y")))
    val dict = spark.createDataFrame(dictRdd,
      StructType(Seq(StructField("dk", StringType), StructField("dv", StringType))))
    assert(dict.queryExecution.optimizedPlan.stats.sizeInBytes > BigInt(Long.MaxValue) / 8)

    val rec = new Linking.JoinRecorder
    val joined = Linking.dictJoin(probe, dict, col("k"), col("dk"),
      KgConfig.default, col("k"), site = "gate_test", rec = rec)
    assert(joined.count() == 2)
    val ds = rec.drain().filter(_.site == "gate_test")
    assert(ds.nonEmpty)
    assert(ds.head.fromRowCount, "sentinel estimate must trigger the row-count probe")
    assert(ds.head.broadcast, "2-row dict must broadcast after the fallback")
    assert(ds.head.estBytes == BigInt(2) * 512)
  }

  test("plan-estimated small dict broadcasts without a row-count job") {
    val rec = new Linking.JoinRecorder
    val probe = Seq(("a", 1)).toDF("k", "v")
    val dict = Seq(("a", "x")).toDF("dk", "dv") // LocalRelation: real stats
    Linking.dictJoin(probe, dict, col("k"), col("dk"),
      KgConfig.default, col("k"), site = "gate_local", rec = rec)
    val d = rec.drain().filter(_.site == "gate_local").head
    assert(!d.fromRowCount && d.broadcast)
  }

  test("forceSaltedJoins pins the salted path and is recorded") {
    val rec = new Linking.JoinRecorder
    val probe = Seq(("a", 1)).toDF("k", "v")
    val dict = Seq(("a", "x")).toDF("dk", "dv")
    val out = Linking.dictJoin(probe, dict, col("k"), col("dk"),
      KgConfig.default.copy(forceSaltedJoins = true), col("k"),
      site = "gate_salted", rec = rec)
    assert(out.count() == 1)
    val d = rec.drain().filter(_.site == "gate_salted").head
    assert(d.path == "salted")
  }

  test("recorder is per-run: decisions in one recorder never leak to another") {
    val recA = new Linking.JoinRecorder
    val recB = new Linking.JoinRecorder
    val probe = Seq(("a", 1)).toDF("k", "v")
    val dict = Seq(("a", "x")).toDF("dk", "dv")
    Linking.dictJoin(probe, dict, col("k"), col("dk"),
      KgConfig.default, col("k"), site = "run_a", rec = recA)
    Linking.dictJoin(probe, dict, col("k"), col("dk"),
      KgConfig.default, col("k"), site = "run_b", rec = recB)
    assert(recA.drain().map(_.site) == Seq("run_a"))
    assert(recB.drain().map(_.site) == Seq("run_b"))
    assert(recA.drain().isEmpty, "drain must consume")
  }

  test("Pipeline surfaces one metrics row per dictionary join site") {
    val corpus = SyntheticCorpus.generate(nPages = 20, seed = 7L)
    val pages = spark.createDataset(corpus.pages)
    val res = Pipeline.run(spark, pages, Pipeline.dictsFromCorpus(spark, corpus))
    val sites = res.metrics
      .filter(col("stage") === "link_plan" && col("metric").startsWith("dict_join"))
      .select("key").as[String].collect().toSet
    // l1_syn_primary carries the PRE-COMPOSED redirect hop (round 5) AND
    // the synonym pick (round 6); l2_secondary the pre-composed sitelink
    // hop — one probe join site per remaining stage
    for (s <- Seq("l1_syn_primary", "l2_secondary",
        "l3_opensearch", "wd_enriched", "dbp_strict", "dbp_lookup"))
      assert(sites.contains(s), s"missing join-decision metric for site $s")
    for (s <- Seq("l1_redirects", "l2_sitelinks", "l1_primary", "l4_synonym"))
      assert(!sites.contains(s),
        s"pre-composed stage $s must not appear as a probe join site")
  }

  test("salted-regime Pipeline records the single L5 shuffle_hash scrape join") {
    val corpus = SyntheticCorpus.generate(nPages = 20, seed = 7L)
    val pages = spark.createDataset(corpus.pages)
    val res = Pipeline.run(spark, pages, Pipeline.dictsFromCorpus(spark, corpus),
      KgConfig.default.copy(forceSaltedJoins = true, nSalt = 4))
    val l5 = res.metrics
      .filter(col("stage") === "link_plan" && col("key") === "l5_scrapes")
      .select("metric").as[String].collect().toSeq
    assert(l5 == Seq("dict_join_shuffle_hash"),
      s"L5 must be ONE unsalted shuffle_hash join in the salted regime, got $l5")
  }
}
