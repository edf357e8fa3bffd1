package graft.kg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch plan probe: prints the formatted physical plan of the LINK
  * chain (Linking.linkFlat over Pipeline-shaped entity rows) under the
  * broadcast regime and under forceSaltedJoins — the at-scale join shape
  * whose exchange count the optimization rounds track (PLANS.md).
  * Usage: runMain graft.kg.LinkPlanProbe [salted|broadcast|both]
  */
object LinkPlanProbe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("both")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = SyntheticCorpus.generate(0)
    val dicts = Pipeline.dictsFromCorpus(spark, corpus)
    val factory = new SyntheticCorpus.PageFactory(42L, 120)
    val pages = spark.range(100).repartition(8)
      .mapPartitions(it => it.map(i => factory.page(i.toInt)))(
        org.apache.spark.sql.Encoders.product[PageRow])

    def planFor(cfg: KgConfig, label: String): Unit = {
      // persist + materialize like Pipeline.prepareLink: production
      // dictionaries are static artifacts, so the probe plan should show
      // cache reads for them, leaving only the probe-side exchanges
      val prep = Pipeline.prepareLink(spark, dicts, cfg)
      val docOut = KgExtract.run(spark, pages, dicts.aliases, dicts.patterns,
        dicts.wdPartOf, cfg, useHtml = true, dicts.wdDesc,
        idf = Some(dicts.idf)).toDF()
      val carryScrape = !cfg.forceSaltedJoins
      val entities =
        if (carryScrape)
          docOut.select(
              when(length(col("scrape")) > 0, col("scrape")).as("p_extract"),
              explode(col("entities")).as("e"))
            .select(col("e.*"), col("p_extract"))
        else docOut.select(explode(col("entities")).as("e")).select("e.*")
      val scrapes =
        if (carryScrape) spark.emptyDataFrame
        else docOut.select(col("url").as("p_url"),
          when(length(col("scrape")) > 0, col("scrape")).as("p_extract"))
      val flat = Linking.linkFlat(spark, entities, prep, scrapes, cfg)
      println(s"\n================ link_flat_$label ================")
      println(flat.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    if (mode == "broadcast" || mode == "both")
      planFor(KgConfig.default, "broadcast")
    if (mode == "salted" || mode == "both")
      planFor(KgConfig.default.copy(forceSaltedJoins = true), "salted")
    spark.stop()
  }
}
