package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core relational operators over the TPC-H-ish driver tables: grouped
  * aggregation, star-schema joins (broadcast dims), per-group top-k windows,
  * semi/anti joins, set ops, running windows, event-time windows.
  *
  * These exercise the join/agg/window/set machinery catalogued in
  * SURVEY.md §2.8-2.11. Every query has a DuckDB oracle in
  * [[graft.SparkEntry.oracleSql]]; column names and ordering are aligned
  * on both sides. Doubles are rounded to 2 decimals so FP summation order
  * cannot flip the hash compare.
  */
object Relational {
  import Tables.t

  /** Grouped aggregation with map-side partial agg (TPC-H Q1 shape). */
  def q01Agg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))) + lit(1e-6), 2).as("revenue"),
        round(avg("l_quantity") + lit(1e-9), 4).as("avg_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Star join: fact × 4 dims. Dims are explicitly broadcast — at 100 TB the
    * fact side never shuffles for dimension joins. */
  def q02JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val o  = t(spark, dir, "orders")
    val c  = broadcast(t(spark, dir, "customer"))
    val n  = broadcast(t(spark, dir, "nation"))
    val r  = broadcast(t(spark, dir, "region"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name", "o_orderpriority")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))) + lit(1e-6), 2).as("revenue"),
           count(lit(1)).as("n"))
      .orderBy("r_name", "o_orderpriority")
  }

  /** Per-group top-k via rank window (the reference's MAX_ENTITIES /
    * MAX_RELATIONS cap shape — SURVEY.md §2.9). */
  def q03TopK(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val c = broadcast(t(spark, dir, "customer"))
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("c_mktsegment", "rk", "o_orderkey", "o_totalprice")
      .orderBy("c_mktsegment", "rk")
  }

  /** Left-semi join (EXISTS): customers with at least one high-value order.
    * Mirrors the reference's entity-list membership validation (R3). */
  def q04SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders").filter(col("o_totalprice") > 100000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Left-anti join (NOT EXISTS): parts never shipped — the reference's
    * "still unresolved rows advance" fallback-narrowing shape (L6). */
  def q05AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val p  = t(spark, dir, "part")
    val li = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("2001-06-01").cast("timestamp"))
    p.join(li, p("p_partkey") === li("l_partkey"), "left_anti")
      .select("p_partkey", "p_name")
      .orderBy("p_partkey")
  }

  /** Distinct union (set op): nations that have a customer or a supplier. */
  def q06Union(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer").select(col("c_nationkey").cast("int").as("nk"))
    val s = t(spark, dir, "supplier").select(col("s_nationkey").cast("int").as("nk"))
    val n = broadcast(t(spark, dir, "nation"))
    c.union(s).distinct()
      .join(n, col("nk") === n("n_nationkey"))
      .select("n_name")
      .orderBy("n_name")
  }

  /** Running-total window (rowsBetween unboundedPreceding..current). */
  def q07RunningSum(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.withColumn("running_total", round(sum("o_totalprice").over(w), 2))
      .select("o_custkey", "o_orderkey", "running_total")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Event-time tumbling window aggregation — the same transform works under
    * Structured Streaming (`readStream` + watermark); see StreamingSpec. */
  def q08EventWindow(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
              col("event_type"), col("n"), col("sum_value"))
      .orderBy("hour_start", "event_type")

  /** Conditional aggregation + percent-of-total (the reference's linked-rate
    * statistics shape, SURVEY.md §2.7 A3). */
  def q09CondAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_finished"),
        round(lit(100.0) * sum(when(col("o_orderstatus") === "F", 1.0).otherwise(0.0)) / count(lit(1)) + lit(1e-9), 1)
          .as("pct_finished"))
      .orderBy("o_orderpriority")

  /** Distinct-count + approx-distinct side by side (exact one is oracled). */
  def q10Distinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
           countDistinct(col("l_suppkey")).as("n_supps"))
      .orderBy("l_returnflag")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg"         -> q01Agg _,
    "q02_join_agg"    -> q02JoinAgg _,
    "q03_topk"        -> q03TopK _,
    "q04_semi_join"   -> q04SemiJoin _,
    "q05_anti_join"   -> q05AntiJoin _,
    "q06_union"       -> q06Union _,
    "q07_running_sum" -> q07RunningSum _,
    "q08_event_window"-> q08EventWindow _,
    "q09_cond_agg"    -> q09CondAgg _,
    "q10_distinct"    -> q10Distinct _
  )

  val oracles: Map[String, String] = Map(
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice * (1.0 - l_discount)) + 1e-6, 2) AS revenue,
         round(avg(l_quantity) + 1e-9, 4) AS avg_qty,
         count(*) AS n
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
    "q02_join_agg" ->
      """SELECT r_name, o_orderpriority,
         round(sum(l_extendedprice * (1.0 - l_discount)) + 1e-6, 2) AS revenue,
         count(*) AS n
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q03_topk" ->
      """SELECT c_mktsegment, rk, o_orderkey, o_totalprice FROM (
           SELECT c_mktsegment, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
           FROM orders JOIN customer ON o_custkey = c_custkey) z
         WHERE rk <= 3 ORDER BY c_mktsegment, rk""",
    "q04_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 100000.0)
         ORDER BY c_custkey""",
    "q05_anti_join" ->
      """SELECT p_partkey, p_name FROM part
         WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey
                           AND l_shipdate >= TIMESTAMP '2001-06-01')
         ORDER BY p_partkey""",
    "q06_union" ->
      """SELECT n_name FROM (
           SELECT CAST(c_nationkey AS INT) AS nk FROM customer
           UNION
           SELECT CAST(s_nationkey AS INT) AS nk FROM supplier) u
         JOIN nation ON nk = n_nationkey
         ORDER BY n_name""",
    "q07_running_sum" ->
      """SELECT o_custkey, o_orderkey,
         round(sum(o_totalprice) OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate ASC, o_orderkey ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "q08_event_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
         event_type, count(*) AS n, round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "q09_cond_agg" ->
      """SELECT o_orderpriority, count(*) AS n,
         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
         round(100.0 * sum(CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END) / count(*) + 1e-9, 1)
           AS pct_finished
         FROM orders GROUP BY 1 ORDER BY 1""",
    "q10_distinct" ->
      """SELECT l_returnflag,
         count(DISTINCT l_partkey) AS n_parts,
         count(DISTINCT l_suppkey) AS n_supps
         FROM lineitem GROUP BY 1 ORDER BY 1"""
  )
}
