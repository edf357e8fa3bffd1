package graft.kg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch probe: per-branch timing of the statistics plan.
  * Usage: runMain graft.kg.StatsProbe <cpus> <nPages> */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val (cpus, nPages) = (args(0).toInt, args(1).toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val factory = new SyntheticCorpus.PageFactory(42L, 120)
    val dicts = Pipeline.dictsFromCorpus(spark, SyntheticCorpus.generate(0))
    val prep = Pipeline.prepareLink(spark, dicts)
    val pages = spark.range(nPages)
      .repartition(spark.sparkContext.defaultParallelism * 2)
      .mapPartitions(it => it.map(i => factory.page(i.toInt)))
    val res = Pipeline.run(spark, pages, dicts, prepared = Some(prep))
    res.nodes.count()
    val edges = res.edges
    edges.count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[stats]   $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      a
    }
    val nodes = res.nodes.select(
      col("details.typ").as("typ"),
      col("sources.wikipedia.status").as("wp_status"),
      col("sources.wikipedia.categories").as("categories"),
      col("sources.wikipedia.internal_links").as("internal_links"),
      col("sources.wikidata.instance_of.label").as("inst_labels"))
      .persist()
    (1 to 2).foreach { r =>
      println(s"[stats] round $r")
      t("narrow-count")(nodes.count())
      t("agg1")(nodes.agg(count(lit(1)), sum(when(col("wp_status") === "found", 1.0))).head())
      t("typesDist")(nodes.groupBy("typ").count().count())
      t("topAll")(
        nodes.select(lit("c").as("metric"), explode(col("categories")).as("key"))
          .union(nodes.select(lit("l"), explode(col("internal_links"))))
          .union(nodes.select(lit("i"), explode(col("inst_labels"))))
          .groupBy("metric", "key").agg(count(lit(1)).as("value"))
          .withColumn("rk", row_number().over(
            Window.partitionBy("metric").orderBy(col("value").desc, col("key").asc)))
          .filter(col("rk") <= 10).count())
      t("topPreds")(edges.groupBy("predicate").count().count())
      t("conns")(
        edges.select(col("subject").as("e"), col("object").as("n"))
          .union(edges.select(col("object"), col("subject")))
          .distinct().groupBy("e").count()
          .orderBy(col("count").desc).limit(10).count())
    }
    spark.stop()
  }
}
