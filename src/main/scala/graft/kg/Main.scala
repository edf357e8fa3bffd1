package graft.kg

import org.apache.spark.sql.SparkSession

/** spark-submit entry: generates (or reads) the pages corpus, runs the full
  * pipeline, materializes node/edge/component/metric tables with resume.
  *
  * Usage: graft.kg.Main [--pages N] [--out DIR] [--run-id ID] [--master M]
  */
object Main {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val nPages = opts.getOrElse("--pages", "2000").toInt
    val out = opts.getOrElse("--out", "/tmp/kg_out")
    val runId = opts.getOrElse("--run-id", "run1")
    val builder = SparkSession.builder()
      .appName("graft-kg")
      .config("spark.sql.shuffle.partitions", opts.getOrElse("--shuffle", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = opts.get("--master").map(builder.master)
      .getOrElse(builder.master("local[32]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val corpus = SyntheticCorpus.generate(nPages)
    val pages = spark.createDataset(corpus.pages).repartition(64)
    val dicts = Pipeline.dictsFromCorpus(spark, corpus)
    val tables = new KgTables(spark, out)
    val t0 = System.nanoTime()
    val res = Pipeline.runMaterialized(spark, pages, dicts, tables, runId = runId)
    val nEdges = res.edges.count()
    val nNodes = res.nodes.count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[kg] pages=$nPages nodes=$nNodes edges=$nEdges in $secs%.1fs " +
      f"(${nPages / secs}%.0f pages/s, ${nEdges / secs}%.0f triples/s)")
    spark.stop()
  }
}
