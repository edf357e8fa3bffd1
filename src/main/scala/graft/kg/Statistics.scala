package graft.kg

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Run statistics (SURVEY §2.7 A1-A10) as grouped aggregations over the
  * node/edge tables — the Spark form of context_statistics.py:30-187 and
  * context_statistics_top10.py. Emitted as a long-format metrics DataFrame
  * (run_id, stage, metric, key, value) so the same sink carries lineage
  * counts (north_rule: per-partition lineage rows + metrics).
  *
  * The whole computation is ONE lazy plan built from FOUR data passes
  * (no driver collects, no eager jobs):
  *   1. one scalar aggregate over nodes (totals + linked counts/percents),
  *   2. one metric-keyed explode+groupBy over nodes covering SIX counter
  *      families at once (types, both fallback distributions, three top-10
  *      exploded counters — rank filter applied only to top10_* metrics),
  *   3. one metric-keyed explode+groupBy over edges (predicates + inference
  *      ratios, with the edge total derived from the grouped result),
  *   4. one symmetric-explode distinct pass for entity connections.
  * The round-1 version ran ~9 separate branch scans; per-branch stage
  * latency (driver scheduling + AQE re-planning) dominated at 32 threads.
  * The caller is expected to have `nodesFull` persisted.
  */
object Statistics {

  /** `cacheNarrow`: persist the narrow node projection (right when the
    * input is an in-memory fat cache — branch scans would decompress the
    * fat columns each time); pass false when nodes come from parquet,
    * where column pruning already makes repeated scans cheap. */
  def compute(spark: SparkSession, nodesFull: DataFrame, edges: DataFrame,
      runId: String, cacheNarrow: Boolean = true): DataFrame = {

    val narrow = nodesFull.select(
      col("details.typ").as("typ"),
      col("sources.wikipedia.status").as("wp_status"),
      col("sources.wikidata.status").as("wd_status"),
      col("sources.dbpedia.status").as("dbp_status"),
      col("sources.wikipedia.fallback_source").as("wp_fallback"),
      col("sources.dbpedia.fallback_source").as("dbp_fb"),
      col("sources.wikipedia.categories").as("categories"),
      col("sources.wikipedia.internal_links").as("internal_links"),
      col("sources.wikidata.instance_of.label").as("inst_labels"))
    val nodes = if (cacheNarrow)
      narrow.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else narrow

    def row(metric: Column, key: Column, value: Column): Column =
      struct(metric.cast("string").as("metric"), key.cast("string").as("key"),
        value.cast("double").as("value"))

    // ---- pass 1: A1 + A3 in ONE aggregate — totals, linked counts +
    // percents (DBpedia counts only status=="linked", wikipedia/wikidata
    // count found — context_statistics.py:44-48, :114-152; percent rounding
    // parity: round(100*c/total, 1) HALF_UP == the reference's round(.,1))
    def pct(c: Column) = when(col("total") === 0, 0.0)
      .otherwise(round(lit(100.0) * c / col("total"), 1))
    val linked = nodes.agg(
        count(lit(1)).cast("double").as("total"),
        sum(when(col("wp_status") === "found", 1.0).otherwise(0.0)).as("wp"),
        sum(when(col("wd_status") === "found", 1.0).otherwise(0.0)).as("wd"),
        sum(when(col("dbp_status") === "linked", 1.0).otherwise(0.0)).as("dbp"))
      .select(explode(array(
        row(lit("total"), lit("entities"), col("total")),
        row(lit("linked_count"), lit("wikipedia"), col("wp")),
        row(lit("linked_count"), lit("wikidata"), col("wd")),
        row(lit("linked_count"), lit("dbpedia"), col("dbp")),
        row(lit("linked_percent"), lit("wikipedia"), pct(col("wp"))),
        row(lit("linked_percent"), lit("wikidata"), pct(col("wd"))),
        row(lit("linked_percent"), lit("dbpedia"), pct(col("dbp"))))).as("m"))
      .select("m.*")

    // ---- pass 2: all node-side counters in ONE explode+groupBy.
    // A2 types_distribution ("Unknown" default — :106-112), A10 fallback
    // distributions (wikipedia/service.py:786-931 batch stats), A4/A5/A6
    // top-10 exploded counters (tie-break: count desc, key asc —
    // context_statistics_top10.py:56; rank filter only on top10_* metrics)
    def mk(metric: String, key: Column) =
      struct(lit(metric).as("metric"), key.as("key"))
    val nodeCounters = nodes.select(explode(concat(
        array(
          mk("types_distribution", coalesce(col("typ"), lit("Unknown"))),
          mk("wikipedia_fallback_dist", coalesce(col("wp_fallback"), lit("none"))),
          mk("dbpedia_fallback_dist", coalesce(col("dbp_fb"), lit("none")))),
        transform(col("categories"), c =>
          struct(lit("top10_categories").as("metric"), c.as("key"))),
        transform(col("internal_links"), c =>
          struct(lit("top10_internal_links").as("metric"), c.as("key"))),
        transform(col("inst_labels"), c =>
          struct(lit("top10_instance_of").as("metric"), c.as("key"))))).as("mk"))
      .select(col("mk.metric").as("metric"), col("mk.key").as("key"))
      .groupBy("metric", "key").agg(count(lit(1)).cast("double").as("value"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("metric").orderBy(col("value").desc, col("key").asc)))
      .filter(!col("metric").startsWith("top10_") || col("rk") <= 10)
      .select(row(col("metric"), col("key"), col("value")).as("m"))
      .select("m.*")

    // ---- pass 3: edge-side counters in ONE explode+groupBy (A7 top-10
    // predicates + A8 inference ratios); the A1 edge total is derived from
    // the (tiny) grouped inference rows, not another scan
    val edgeGrouped = edges.select(explode(array(
        mk("top10_predicates", col("predicate")),
        mk("relationships_inferred", lower(col("inferred"))))).as("mk"))
      .select(col("mk.metric").as("metric"), col("mk.key").as("key"))
      .groupBy("metric", "key").agg(count(lit(1)).cast("double").as("value"))
    val edgeCounters = edgeGrouped
      .withColumn("rk", row_number().over(
        Window.partitionBy("metric").orderBy(col("value").desc, col("key").asc)))
      .filter(!col("metric").startsWith("top10_") || col("rk") <= 10)
      .select(row(col("metric"), col("key"), col("value")).as("m"))
      .select("m.*")
    val relTotal = edgeGrouped
      .filter(col("metric") === "relationships_inferred")
      .agg(coalesce(sum("value"), lit(0.0)).as("c"))
      .select(row(lit("total"), lit("relationships"), col("c")).as("m"))
      .select("m.*")

    // ---- pass 4: A9 entity_connections — distinct neighbors per entity,
    // top 10, via a single symmetric explode (one edges scan, not two)
    val conns = edges.select(explode(array(
        struct(col("subject").as("e"), col("object").as("n")),
        struct(col("object").as("e"), col("subject").as("n")))).as("p"))
      .select(col("p.e").as("key"), col("p.n").as("n"))
      .distinct()
      .groupBy("key").agg(count(lit(1)).cast("double").as("value"))
      .orderBy(col("value").desc, col("key").asc).limit(10)
      .select(row(lit("entity_connections"), col("key"), col("value")).as("m"))
      .select("m.*")

    Seq(linked, nodeCounters, edgeCounters, relTotal, conns)
      .reduce(_.unionByName(_))
      .select(lit(runId).as("run_id"), lit("stats").as("stage"),
        col("metric"), col("key"), col("value"))
  }
}
