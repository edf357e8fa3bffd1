package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Run statistics (SURVEY §2.7 A1-A10) as grouped aggregations over the
  * node/edge tables — the Spark form of context_statistics.py:30-187 and
  * context_statistics_top10.py. Emitted as a long-format metrics DataFrame
  * (run_id, stage, metric, key, value) so the same sink carries lineage
  * counts (north_rule: per-partition lineage rows + metrics).
  */
object Statistics {

  def compute(spark: SparkSession, nodes: DataFrame, edges: DataFrame, runId: String): DataFrame = {
    import spark.implicits._

    def m(stage: String, metric: String): (String, Double) => MetricRow =
      (key, value) => MetricRow(runId, stage, metric, key, value)

    // A1 totals (post-dedup counts — context_statistics.py:44-48)
    val totalEntities = nodes.count().toDouble
    val totalRels = edges.count().toDouble

    // A2 types_distribution ("Unknown" default — :106-112)
    val typesDist = nodes
      .groupBy(coalesce(col("details.typ"), lit("Unknown")).as("key"))
      .agg(count(lit(1)).cast("double").as("value"))
      .as[(String, Double)].collect()
      .map { case (k, v) => m("stats", "types_distribution")(k, v) }

    // A3 linked counts + percents; DBpedia counts only status=="linked",
    // wikipedia/wikidata count found (:114-152)
    val linked = nodes.agg(
      sum(when(col("sources.wikipedia.status") === "found", 1.0).otherwise(0.0)).as("wp"),
      sum(when(col("sources.wikidata.status") === "found", 1.0).otherwise(0.0)).as("wd"),
      sum(when(col("sources.dbpedia.status") === "linked", 1.0).otherwise(0.0)).as("dbp")
    ).head()
    def pct(c: Double) = if (totalEntities == 0) 0.0
      else math.round(1000.0 * c / totalEntities) / 10.0 // round(...,1) parity
    val linkedRows = Seq(
      m("stats", "linked_count")("wikipedia", linked.getDouble(0)),
      m("stats", "linked_count")("wikidata", linked.getDouble(1)),
      m("stats", "linked_count")("dbpedia", linked.getDouble(2)),
      m("stats", "linked_percent")("wikipedia", pct(linked.getDouble(0))),
      m("stats", "linked_percent")("wikidata", pct(linked.getDouble(1))),
      m("stats", "linked_percent")("dbpedia", pct(linked.getDouble(2))))

    // A4/A5 top-10 exploded counters (deterministic tie-break: count desc,
    // key asc — context_statistics_top10.py:56)
    def top10(df: DataFrame, arrCol: String, metric: String) = df
      .select(explode(col(arrCol)).as("key"))
      .groupBy("key").agg(count(lit(1)).cast("double").as("value"))
      .orderBy(col("value").desc, col("key").asc).limit(10)
      .as[(String, Double)].collect()
      .map { case (k, v) => m("stats", metric)(k, v) }
    val topCats = top10(nodes, "sources.wikipedia.categories", "top10_categories")
    val topLinks = top10(nodes, "sources.wikipedia.internal_links", "top10_internal_links")
    val topInstOf = top10(
      nodes.select(col("sources.wikidata.instance_of.label").as("lbls")), "lbls",
      "top10_instance_of")

    // A7 top-10 predicates
    val topPreds = edges
      .groupBy(col("predicate").as("key"))
      .agg(count(lit(1)).cast("double").as("value"))
      .orderBy(col("value").desc, col("key").asc).limit(10)
      .as[(String, Double)].collect()
      .map { case (k, v) => m("stats", "top10_predicates")(k, v) }

    // A8 inference ratios
    val infRows = edges
      .groupBy(lower(col("inferred")).as("key"))
      .agg(count(lit(1)).cast("double").as("value"))
      .as[(String, Double)].collect()
      .map { case (k, v) => m("stats", "relationships_inferred")(k, v) }

    // A9 entity_connections: distinct neighbors per entity, top 10
    val conns = edges.select(col("subject").as("e"), col("object").as("n"))
      .union(edges.select(col("object").as("e"), col("subject").as("n")))
      .distinct()
      .groupBy("e").agg(count(lit(1)).cast("double").as("value"))
      .orderBy(col("value").desc, col("e").asc).limit(10)
      .as[(String, Double)].collect()
      .map { case (k, v) => m("stats", "entity_connections")(k, v) }

    val rows = Seq(
      m("stats", "total")("entities", totalEntities),
      m("stats", "total")("relationships", totalRels)) ++
      typesDist ++ linkedRows ++ topCats ++ topLinks ++ topInstOf ++
      topPreds ++ infRows ++ conns
    spark.createDataset(rows).toDF()
  }
}
