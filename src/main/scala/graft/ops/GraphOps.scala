package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.queries.Tables.t
import graft.kg.ConnectedComponents

/** Graph / ordering operators exercised on the driver tables:
  * connected components (the canonicalization primitive, SURVEY §2.6 D9),
  * first-occurrence dedup (D1-D3 shape), and event sessionization
  * (gap-based windows — the streaming-adjacent stateful op).
  */
object GraphOps {

  /** Real large-star/small-star CC over a deterministic functional graph
    * derived from event user ids; oracled by a recursive-CTE closure. */
  def kgCc(spark: SparkSession, dir: String): DataFrame = {
    val edges = t(spark, dir, "events")
      .select(col("user_id").as("src"),
        ((col("user_id") * 37 + 11) % 150).as("dst"))
      .distinct()
    ConnectedComponents.run(spark, edges)
      .select(col("node").cast("long").as("node"),
        col("component").cast("long").as("component"))
      .orderBy("node")
  }

  /** First-occurrence-wins dedup per (user_id, event_type) by event time —
    * the reference's first-wins dedup rules (deduplication.py:93-133) on
    * driver data. */
  def kgDedupFirst(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts").asc, col("event_id").asc)
    t(spark, dir, "events")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("event_type"), col("event_id").as("first_event_id"))
      .orderBy("user_id", "event_type")
  }

  /** Sessionization: a >30-minute inactivity gap starts a new session.
    * lag + running conditional sum — the batch form of
    * mapGroupsWithState session windows. */
  def evSessions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    t(spark, dir, "events")
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts").cast("timestamp")) -
            unix_micros(col("prev_ts").cast("timestamp")) > 1800000000L, 1L)
          .otherwise(0L))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum("new_session").as("n_sessions"))
      .orderBy("user_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "kg_cc"          -> kgCc _,
    "kg_dedup_first" -> kgDedupFirst _,
    "ev_sessions"    -> evSessions _)

  val oracles: Map[String, String] = Map(
    "kg_cc" ->
      """WITH RECURSIVE base AS (
           SELECT DISTINCT user_id AS a, (user_id * 37 + 11) % 150 AS b FROM events),
         und AS (SELECT a, b FROM base UNION SELECT b, a FROM base),
         reach(s, d) AS (
           SELECT a, b FROM und
           UNION
           SELECT r.s, u.b FROM reach r JOIN und u ON r.d = u.a)
         SELECT CAST(s AS BIGINT) AS node,
                CAST(least(min(d), s) AS BIGINT) AS component
         FROM reach GROUP BY s ORDER BY node""",
    "kg_dedup_first" ->
      """SELECT user_id, event_type, event_id AS first_event_id FROM (
           SELECT user_id, event_type, event_id,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts ASC, event_id ASC) AS rk
           FROM events) z
         WHERE rk = 1 ORDER BY user_id, event_type""",
    "ev_sessions" ->
      """WITH g AS (
           SELECT user_id, event_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
           FROM events)
         SELECT user_id, count(*) AS n_events,
           CAST(sum(CASE WHEN prev_ts IS NULL
                         OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sessions
         FROM g GROUP BY user_id ORDER BY user_id""")
}
