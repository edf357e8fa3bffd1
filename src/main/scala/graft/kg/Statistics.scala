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

  def compute(spark: SparkSession, nodesFull: DataFrame, edges: DataFrame, runId: String): DataFrame = {
    import spark.implicits._

    // narrow projection, cached: the statistics aggregates below make ~8
    // passes — re-reading the fat nested node rows each time would dominate;
    // this is column pruning applied across jobs (a cache defeats scan-level
    // pruning, so prune before caching)
    val nodes = nodesFull.select(
      col("details.typ").as("typ"),
      col("sources.wikipedia.status").as("wp_status"),
      col("sources.wikidata.status").as("wd_status"),
      col("sources.dbpedia.status").as("dbp_status"),
      col("sources.wikipedia.categories").as("categories"),
      col("sources.wikipedia.internal_links").as("internal_links"),
      col("sources.wikidata.instance_of.label").as("inst_labels"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    def m(stage: String, metric: String): (String, Double) => MetricRow =
      (key, value) => MetricRow(runId, stage, metric, key, value)

    // A1 + A3 in ONE pass: totals, linked counts (DBpedia counts only
    // status=="linked", wikipedia/wikidata count found —
    // context_statistics.py:44-48, :114-152)
    val agg1 = nodes.agg(
      count(lit(1)).cast("double").as("total"),
      sum(when(col("wp_status") === "found", 1.0).otherwise(0.0)).as("wp"),
      sum(when(col("wd_status") === "found", 1.0).otherwise(0.0)).as("wd"),
      sum(when(col("dbp_status") === "linked", 1.0).otherwise(0.0)).as("dbp")
    ).head()
    val totalEntities = agg1.getDouble(0)
    def pct(c: Double) = if (totalEntities == 0) 0.0
      else math.round(1000.0 * c / totalEntities) / 10.0 // round(...,1) parity
    val linkedRows = Seq(
      m("stats", "linked_count")("wikipedia", agg1.getDouble(1)),
      m("stats", "linked_count")("wikidata", agg1.getDouble(2)),
      m("stats", "linked_count")("dbpedia", agg1.getDouble(3)),
      m("stats", "linked_percent")("wikipedia", pct(agg1.getDouble(1))),
      m("stats", "linked_percent")("wikidata", pct(agg1.getDouble(2))),
      m("stats", "linked_percent")("dbpedia", pct(agg1.getDouble(3))))

    // A2 types_distribution ("Unknown" default — :106-112)
    val typesDist = nodes
      .groupBy(coalesce(col("typ"), lit("Unknown")).as("key"))
      .agg(count(lit(1)).cast("double").as("value"))
      .as[(String, Double)].collect()
      .map { case (k, v) => m("stats", "types_distribution")(k, v) }

    // A4/A5 top-10 exploded counters, all three in ONE unioned pass
    // (deterministic tie-break: count desc, key asc —
    // context_statistics_top10.py:56)
    val topAll = nodes.select(lit("top10_categories").as("metric"),
        explode(col("categories")).as("key"))
      .union(nodes.select(lit("top10_internal_links"), explode(col("internal_links"))))
      .union(nodes.select(lit("top10_instance_of"), explode(col("inst_labels"))))
      .groupBy("metric", "key").agg(count(lit(1)).cast("double").as("value"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("metric")
          .orderBy(col("value").desc, col("key").asc)))
      .filter(col("rk") <= 10)
      .select("metric", "key", "value")
      .as[(String, String, Double)].collect()
      .map { case (metric, k, v) => m("stats", metric)(k, v) }

    // A1 (edges) + A7 top-10 predicates + A8 inference ratios in one pass
    val edgeAgg = edges
      .groupBy(col("predicate").as("key"), lower(col("inferred")).as("inf"))
      .agg(count(lit(1)).cast("double").as("value"))
      .as[(String, String, Double)].collect()
    val totalRels = edgeAgg.map(_._3).sum
    val topPreds = edgeAgg.groupBy(_._1).view.mapValues(_.map(_._3).sum).toSeq
      .sortBy { case (k, v) => (-v, k) }.take(10)
      .map { case (k, v) => m("stats", "top10_predicates")(k, v) }
    val infRows = edgeAgg.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq
      .sortBy(_._1)
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
      typesDist ++ linkedRows ++ topAll ++
      topPreds ++ infRows ++ conns
    nodes.unpersist()
    spark.createDataset(rows).toDF()
  }
}
