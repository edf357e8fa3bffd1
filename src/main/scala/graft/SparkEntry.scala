package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator's entry; `oracleSql`
  * carries the DuckDB-equivalent SQL (same column names, same ordering)
  * for the driver's hash compare at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q02JoinAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.ops.TextOps.queries ++
      graft.ops.DedupOps.queries ++
      graft.ops.SimilarityOps.queries ++
      graft.ops.GraphOps.queries ++
      graft.ops.MentionOps.queries ++
      graft.ops.LinkOps.queries ++
      graft.ops.MultimodalOps.queries ++
      graft.ops.UrlOps.queries ++
      graft.ops.CategoryOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.ops.TextOps.oracles ++
      graft.ops.DedupOps.oracles ++
      graft.ops.SimilarityOps.oracles ++
      graft.ops.GraphOps.oracles ++
      graft.ops.MentionOps.oracles ++
      graft.ops.LinkOps.oracles ++
      graft.ops.MultimodalOps.oracles ++
      graft.ops.UrlOps.oracles ++
      graft.ops.CategoryOps.oracles
}
