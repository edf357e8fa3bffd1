package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative DataFrame connected components via alternating
  * large-star / small-star (Kiveris et al., "Connected Components in
  * MapReduce and Beyond" — PAPERS.md), for cross-document entity
  * canonicalization over alias/redirect edges (SURVEY §2.6 D9; north_rule).
  *
  * Node ids are the natural ordered type of the input (strings for entity
  * names, longs for numeric graphs); the component representative is the
  * minimum node id, so resumed runs are byte-identical (deterministic
  * min-id selection — SURVEY §7.6-5).
  *
  * Each iteration `localCheckpoint`s to cut lineage (driver loop is the only
  * imperative part; every step is a pure DataFrame transform). Convergence
  * is detected by an edge-multiset checksum instead of `except()` — one
  * cheap aggregate per iteration rather than a join.
  */
object ConnectedComponents {

  /** edges: DataFrame with two columns (src, dst) of one ordered type.
    * Returns DataFrame (node, component). */
  def run(spark: SparkSession, edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val srcCol = edges.columns(0)
    val dstCol = edges.columns(1)
    val input = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .where(col("u").isNotNull && col("v").isNotNull)
      .distinct()
      .localCheckpoint()
    // all input nodes — singletons (self-loop-only) must survive to the output
    val allNodes = input.select(col("u").as("node"))
      .union(input.select(col("v").as("node"))).distinct().localCheckpoint()
    var e = input

    def checksum(df: DataFrame): (Long, Long) = {
      // XOR-fold of per-edge hashes: order-independent and overflow-free
      // (ANSI mode rejects sum() overflow on 64-bit hashes)
      val r = df.agg(
        coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)).as("h"),
        count(lit(1)).as("c")).head()
      (r.getLong(0), r.getLong(1))
    }

    var prev = (0L, 0L)
    var cur = checksum(e)
    var iter = 0
    while (cur != prev && iter < maxIter) {
      // large-star: for each u, m = min(N(u) ∪ {u}); emit (v, m) for v > u
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u")
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      val large = sym.join(mins, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()

      // small-star: over edges v <= u, m = min(N≤(u) ∪ {u});
      // emit (w, m) for w ∈ N≤(u) ∪ {u}, w ≠ m
      val sym2 = large.union(large.select(col("v").as("u"), col("u").as("v")))
      val smaller = sym2.where(col("v") <= col("u"))
      val minsS = smaller.groupBy("u")
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      val small = smaller.join(minsS, "u")
        .select(col("v").as("w"), col("m"))
        .union(minsS.select(col("u").as("w"), col("m")))
        .where(col("w") =!= col("m"))
        .select(col("w").as("u"), col("m").as("v"))
        .distinct()

      e = small.localCheckpoint()
      prev = cur
      cur = checksum(e)
      iter += 1
    }
    // final star graph: every edge points to the component minimum; nodes
    // not present anymore (representatives, singletons) map to themselves
    val starred = e.select(col("u").as("node"), col("v").as("component"))
      .groupBy("node").agg(min("component").as("component"))
    allNodes.join(starred, Seq("node"), "left")
      .select(col("node"), coalesce(col("component"), col("node")).as("component"))
  }
}
