package graft.kg

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** dictJoin size-gate robustness: the row-count fallback for stats-less
  * plans (the 8-EiB defaultSizeInBytes sentinel) and the join-path metric
  * rows surfaced by Pipeline. */
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

    Linking.drainJoinDecisions() // clear
    val joined = Linking.dictJoin(probe, dict, col("k"), col("dk"),
      KgConfig.default, col("k"), site = "gate_test")
    assert(joined.count() == 2)
    val ds = Linking.drainJoinDecisions().filter(_.site == "gate_test")
    assert(ds.nonEmpty)
    assert(ds.head.fromRowCount, "sentinel estimate must trigger the row-count probe")
    assert(ds.head.broadcast, "2-row dict must broadcast after the fallback")
    assert(ds.head.estBytes == BigInt(2) * 512)
  }

  test("plan-estimated small dict broadcasts without a row-count job") {
    Linking.drainJoinDecisions()
    val probe = Seq(("a", 1)).toDF("k", "v")
    val dict = Seq(("a", "x")).toDF("dk", "dv") // LocalRelation: real stats
    Linking.dictJoin(probe, dict, col("k"), col("dk"),
      KgConfig.default, col("k"), site = "gate_local")
    val d = Linking.drainJoinDecisions().filter(_.site == "gate_local").head
    assert(!d.fromRowCount && d.broadcast)
  }

  test("forceSaltedJoins pins the salted path and is recorded") {
    Linking.drainJoinDecisions()
    val probe = Seq(("a", 1)).toDF("k", "v")
    val dict = Seq(("a", "x")).toDF("dk", "dv")
    val out = Linking.dictJoin(probe, dict, col("k"), col("dk"),
      KgConfig.default.copy(forceSaltedJoins = true), col("k"), site = "gate_salted")
    assert(out.count() == 1)
    val d = Linking.drainJoinDecisions().filter(_.site == "gate_salted").head
    assert(!d.broadcast)
  }

  test("Pipeline surfaces one metrics row per dictionary join site") {
    val corpus = SyntheticCorpus.generate(nPages = 20, seed = 7L)
    val pages = spark.createDataset(corpus.pages)
    val res = Pipeline.run(spark, pages, Pipeline.dictsFromCorpus(spark, corpus))
    val sites = res.metrics
      .filter(col("stage") === "link_plan" && col("metric").startsWith("dict_join"))
      .select("key").as[String].collect().toSet
    for (s <- Seq("l1_redirects", "l1_primary", "l2_sitelinks", "l2_secondary",
        "l3_opensearch", "l4_synonym", "wd_enriched", "dbp_strict", "dbp_lookup"))
      assert(sites.contains(s), s"missing join-decision metric for site $s")
  }
}
