package graft.kg

import org.apache.spark.sql.SparkSession

/** Scratch scaling probe: repeated whole-pipeline runs at one parallelism
  * with per-stage timing of the REAL Pipeline.run plan (extract cache fill,
  * edges, link chain, cc, statistics).
  * Usage: runMain graft.kg.ScaleProbe <cpus> <nPages> <reps> */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val (cpus, nPages, reps) = (args(0).toInt, args(1).toInt, args(2).toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.inMemoryColumnarStorage.compressed",
        sys.env.getOrElse("SPARK_GRAFT_CACHE_COMPRESS", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val factory = new SyntheticCorpus.PageFactory(42L, 120)
    val dicts = Pipeline.dictsFromCorpus(spark, SyntheticCorpus.generate(0))
    // SPARK_GRAFT_FORCE_SALTED=1 probes the at-scale join shape (every
    // dictionary join on the salted shuffle-hash path)
    val cfg =
      if (sys.env.get("SPARK_GRAFT_FORCE_SALTED").contains("1"))
        KgConfig.default.copy(forceSaltedJoins = true)
      else KgConfig.default
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[scale]   $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      a
    }
    val prep = t("prepare(once)")(Pipeline.prepareLink(spark, dicts, cfg))
    val keepIds = spark.sparkContext.getPersistentRDDs.keySet
    (0 until reps).foreach { r =>
      val pages = spark.range(nPages)
        .repartition(spark.sparkContext.defaultParallelism * 2)
        .mapPartitions(it => it.map(i => factory.page(i.toInt)))
      val t0 = System.nanoTime()
      println(s"[scale] rep=$r")
      val noNodeCache = sys.env.get("SPARK_GRAFT_NO_NODE_CACHE").contains("1")
      val res = Pipeline.run(spark, pages, dicts, cfg, prepared = Some(prep),
        cacheNodes = !noNodeCache)
      val e = t("edges(extract+cache)")(res.edges.count())
      if (!noNodeCache) t("nodes(link)")(res.nodes.count())
      t("cc")(res.components.count())
      t("stats")(res.metrics.count())
      t("stats-warm")(res.metrics.count())
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scale] cpus=$cpus pages=$nPages rep=$r: $secs%.2fs (${nPages / secs}%.0f pages/s, ${e / secs}%.0f triples/s)")
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => keepIds.contains(id) }
        .values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
