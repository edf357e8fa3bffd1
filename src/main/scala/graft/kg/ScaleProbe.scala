package graft.kg

import org.apache.spark.sql.SparkSession

/** Scratch scaling probe: repeated whole-pipeline runs at one parallelism.
  * Usage: runMain graft.kg.ScaleProbe <cpus> <nPages> <reps> */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val (cpus, nPages, reps) = (args(0).toInt, args(1).toInt, args(2).toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val factory = new SyntheticCorpus.PageFactory(42L, 120)
    val dicts = Pipeline.dictsFromCorpus(spark, SyntheticCorpus.generate(0))
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[scale]   $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      a
    }
    val prep = t("prepare(once)")(Pipeline.prepareLink(spark, dicts))
    val keepIds = spark.sparkContext.getPersistentRDDs.keySet
    (0 until reps).foreach { r =>
      val pages = spark.range(nPages)
        .repartition(spark.sparkContext.defaultParallelism * 2)
        .mapPartitions(it => it.map(i => factory.page(i.toInt)))
      val t0 = System.nanoTime()
      println(s"[scale] rep=$r")
      val docOut = KgExtract.run(spark, pages, dicts.aliases, dicts.patterns,
          dicts.wdPartOf, KgConfig.default, useHtml = true, descByQid = dicts.wdDesc)
        .toDF()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("extract")(docOut.count())
      val entities = docOut.select(org.apache.spark.sql.functions.explode($"entities").as("e")).select("e.*")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val edgesDf = docOut.select(org.apache.spark.sql.functions.explode($"triples").as("t")).select("t.*")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val e = t("edges")(edgesDf.count())
      val scrapes = docOut.select(org.apache.spark.sql.functions.col("url").as("p_url"),
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.length($"scrape") > 0, $"scrape").as("p_extract"))
      val nodes = t("link") {
        val n = Linking.linkAll(spark, entities, prep, scrapes, KgConfig.default)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        n.count(); n
      }
      t("cc") {
        val ae = spark.createDataset(dicts.aliases.map(a => (a.alias, a.canonical))).toDF("src", "dst")
        val re = dicts.redirects.select($"from_title".as("src"), $"to_title".as("dst"))
        ConnectedComponents.run(spark, ae.union(re)).count()
      }
      t("stats")(Statistics.compute(spark, nodes, edgesDf, "probe").count())
      t("stats-warm")(Statistics.compute(spark, nodes, edgesDf, "probe").count())
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scale] cpus=$cpus pages=$nPages rep=$r: $secs%.2fs (${nPages / secs}%.0f pages/s, ${e / secs}%.0f triples/s)")
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => keepIds.contains(id) }
        .values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
