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
  * The whole computation is ONE lazy plan (a union of aggregate branches):
  * no driver-side collects, no eager jobs — the caller materializes it once
  * when writing the metrics sink, and Spark schedules all branches inside a
  * single job. The round-1 version ran 5 separate jobs with driver
  * round-trips between them; at 32 threads that serialized ~7 s of
  * scheduling + collect latency into the critical path. The caller is
  * expected to have `nodesFull` persisted (the branches scan it repeatedly;
  * Spark's InMemoryTableScan prunes to the referenced columns).
  */
object Statistics {

  /** `cacheNarrow`: persist the narrow node projection (right when the
    * input is an in-memory fat cache — 5 branch scans would decompress the
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

    // A1 + A3 in ONE aggregate: totals, linked counts + percents (DBpedia
    // counts only status=="linked", wikipedia/wikidata count found —
    // context_statistics.py:44-48, :114-152; percent rounding parity:
    // round(100*c/total, 1) HALF_UP == the reference's round(..., 1))
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

    // A2 types_distribution ("Unknown" default — :106-112)
    val typesDist = nodes
      .groupBy(coalesce(col("typ"), lit("Unknown")).as("key"))
      .agg(count(lit(1)).cast("double").as("value"))
      .select(row(lit("types_distribution"), col("key"), col("value")).as("m"))
      .select("m.*")

    // A4/A5/A6 top-10 exploded counters in one unioned pass (deterministic
    // tie-break: count desc, key asc — context_statistics_top10.py:56)
    val topAll = nodes.select(lit("top10_categories").as("metric"),
        explode(col("categories")).as("key"))
      .union(nodes.select(lit("top10_internal_links"), explode(col("internal_links"))))
      .union(nodes.select(lit("top10_instance_of"), explode(col("inst_labels"))))
      .groupBy("metric", "key").agg(count(lit(1)).cast("double").as("value"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("metric").orderBy(col("value").desc, col("key").asc)))
      .filter(col("rk") <= 10)
      .select(row(col("metric"), col("key"), col("value")).as("m"))
      .select("m.*")

    // A10 service batch stats (wikipedia/service.py:786-931): per-stage
    // fallback usage — which resolution path served each entity ("none" =
    // direct hit / unresolved; the reference's per-service counters)
    val wpFallbackDist = nodes
      .groupBy(coalesce(col("wp_fallback"), lit("none")).as("key"))
      .agg(count(lit(1)).cast("double").as("value"))
      .select(row(lit("wikipedia_fallback_dist"), col("key"), col("value")).as("m"))
      .select("m.*")
    val dbpFallbackDist = nodes
      .groupBy(coalesce(col("dbp_fb"), lit("none")).as("key"))
      .agg(count(lit(1)).cast("double").as("value"))
      .select(row(lit("dbpedia_fallback_dist"), col("key"), col("value")).as("m"))
      .select("m.*")

    // A1 (edges) total
    val relTotal = edges.agg(count(lit(1)).cast("double").as("c"))
      .select(row(lit("total"), lit("relationships"), col("c")).as("m"))
      .select("m.*")

    // A7 top-10 predicates (single-partition window over the small distinct
    // predicate vocabulary)
    val topPreds = edges.groupBy(col("predicate").as("key"))
      .agg(count(lit(1)).cast("double").as("value"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(lit("p")).orderBy(col("value").desc, col("key").asc)))
      .filter(col("rk") <= 10)
      .select(row(lit("top10_predicates"), col("key"), col("value")).as("m"))
      .select("m.*")

    // A8 inference ratios
    val infRows = edges.groupBy(lower(col("inferred")).as("key"))
      .agg(count(lit(1)).cast("double").as("value"))
      .select(row(lit("relationships_inferred"), col("key"), col("value")).as("m"))
      .select("m.*")

    // A9 entity_connections: distinct neighbors per entity, top 10
    val conns = edges.select(col("subject").as("e"), col("object").as("n"))
      .union(edges.select(col("object").as("e"), col("subject").as("n")))
      .distinct()
      .groupBy(col("e").as("key")).agg(count(lit(1)).cast("double").as("value"))
      .orderBy(col("value").desc, col("key").asc).limit(10)
      .select(row(lit("entity_connections"), col("key"), col("value")).as("m"))
      .select("m.*")

    Seq(linked, typesDist, topAll, wpFallbackDist, dbpFallbackDist,
        relTotal, topPreds, infRows, conns)
      .reduce(_.unionByName(_))
      .select(lit(runId).as("run_id"), lit("stats").as("stage"),
        col("metric"), col("key"), col("value"))
  }
}
