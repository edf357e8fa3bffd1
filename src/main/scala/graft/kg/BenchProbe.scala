package graft.kg

import org.apache.spark.sql.SparkSession

/** Scratch stage-breakdown probe for bench tuning (not part of the driver
  * contract). Usage: runMain graft.kg.BenchProbe <cpus> <nPages> */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val nPages = args(1).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      a
    }

    val corpus = time("generate")(SyntheticCorpus.generate(nPages))
    val pages = spark.createDataset(corpus.pages).repartition(cpus * 2)
    val dicts = Pipeline.dictsFromCorpus(spark, corpus)
    val cfg = KgConfig.default

    // warmup
    Pipeline.run(spark, spark.createDataset(corpus.pages.take(500)), dicts).edges.count()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))

    val docOut = KgExtract.run(spark, pages, dicts.aliases, dicts.patterns, dicts.wdPartOf, cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("extract (fused map)")(docOut.count())
    val entities = docOut.flatMap(_.entities).toDF()
    val edges = docOut.flatMap(_.triples).toDF()
    time("edges count")(edges.count())
    val scrapes = docOut.toDF().select($"url".as("p_url"),
      org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.length($"scrape") > 0, $"scrape").as("p_extract"))
    val nodes = time("link") {
      val n = Linking.linkAll(spark, entities, dicts.wiki, dicts.redirects, dicts.wd, dicts.dbp, scrapes, dicts.synonyms, cfg)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      n.count()
      n
    }
    time("cc") {
      val aliasEdges = spark.createDataset(dicts.aliases.map(a => (a.alias, a.canonical))).toDF("src", "dst")
      val redirectEdges = dicts.redirects.select($"from_title".as("src"), $"to_title".as("dst"))
      ConnectedComponents.run(spark, aliasEdges.union(redirectEdges)).count()
    }
    time("stats")(Statistics.compute(spark, nodes, edges, "probe").count())
    spark.stop()
  }
}
