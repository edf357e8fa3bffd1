package graft.kg

import org.apache.spark.sql.SparkSession

/** Scratch probe: per-pass timing of the REAL Statistics.compute branch
  * plans (linked / counters / relTotal) over a
  * materialized pipeline, repeated so warm-cache behavior is visible.
  * Usage: runMain graft.kg.StatsProbe <cpus> <nPages> [reps] */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val (cpus, nPages) = (args(0).toInt, args(1).toInt)
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PARALLELISM_FIRST", "true"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY_PART", "64m"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val factory = new SyntheticCorpus.PageFactory(42L, 120)
    val dicts = Pipeline.dictsFromCorpus(spark, SyntheticCorpus.generate(0))
    val prep = Pipeline.prepareLink(spark, dicts)
    val pages = spark.range(nPages)
      .repartition(spark.sparkContext.defaultParallelism * 2)
      .mapPartitions(it => it.map(i => factory.page(i.toInt)))(
        org.apache.spark.sql.Encoders.product[PageRow])
    val res = Pipeline.run(spark, pages, dicts, prepared = Some(prep))
    res.edges.count()
    res.nodes.count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[stats]   $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      a
    }
    val (passes, _) = Statistics.passes(spark, res.nodes, res.edges,
      cacheNarrow = sys.env.get("SPARK_GRAFT_STATS_NARROW").contains("1"))
    (1 to reps).foreach { r =>
      println(s"[stats] round $r")
      passes.foreach { case (name, df) => t(name)(df.count()) }
      t("full-metrics")(res.metrics.count())
    }
    spark.stop()
  }
}
