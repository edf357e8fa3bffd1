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
  def run(spark: SparkSession, edges: DataFrame, maxIter: Int = 50,
      localThreshold: Long = 1000000L): DataFrame = {
    val srcCol = edges.columns(0)
    val dstCol = edges.columns(1)
    val raw = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .where(col("u").isNotNull && col("v").isNotNull)
      .distinct()
      .localCheckpoint()
    // size the working partitioning to the data: the canonicalization graph
    // (aliases/redirects) is orders of magnitude smaller than the page scan,
    // and the loop runs ~4 shuffles per iteration — tiny inputs on the full
    // shuffle-partition count would pay hundreds of empty-task launches
    val nEdges = raw.count()
    // small-graph fast path: below ~1M edges the alternating-star loop is
    // pure scheduling latency (≈6 tiny jobs × ~5 iterations); a driver-side
    // union-find gives the identical (node, min-id) result in one job.
    // The distributed loop below is the 10^8-edge dictionary-scale path.
    if (nEdges <= localThreshold) {
      val out = localUnionFind(spark, raw)
      // the collect is done — drop the checkpoint blocks so repeated runs
      // in one session (bench reps, streaming batches) don't accumulate
      // block-manager storage
      raw.unpersist()
      return out
    }
    val parts = math.max(1, math.min(spark.sparkContext.defaultParallelism,
      (nEdges / 50000L).toInt))
    val input = raw.repartition(parts)
    // scope the shuffle-partition count to the loop: ~4 shuffles per
    // iteration on the (small) canonicalization graph would otherwise
    // launch defaultParallelism empty tasks each
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try {
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

      val next = small.localCheckpoint()
      // the new checkpoint is materialized (eager) — the superseded
      // iterate's blocks can go; keeping every iteration's checkpoint
      // leaked one graph copy per iteration for the session lifetime
      if (iter > 0) e.unpersist()
      e = next
      prev = cur
      cur = checksum(e)
      iter += 1
    }
    // final star graph: every edge points to the component minimum; nodes
    // not present anymore (representatives, singletons) map to themselves
    val starred = e.select(col("u").as("node"), col("v").as("component"))
      .groupBy("node").agg(min("component").as("component"))
    val out = allNodes.join(starred, Seq("node"), "left")
      .select(col("node"), coalesce(col("component"), col("node")).as("component"))
      .localCheckpoint() // materialize before restoring shuffle partitions
    // only the checkpoint BACKING the returned DataFrame stays alive (it
    // cannot be dropped here — its lineage is truncated); every
    // intermediate block is released now that `out` is materialized
    if (iter > 0) e.unpersist()
    allNodes.unpersist()
    raw.unpersist()
    out
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    }
  }

  /** Driver-side union-find for small graphs; identical output contract
    * (node, component = min node id in component). Works for any ordered
    * node type the DataFrame carries (string or numeric). */
  private def localUnionFind(spark: SparkSession, edges: DataFrame): DataFrame = {
    val schema = edges.schema
    val rows = edges.collect()
    val parent = scala.collection.mutable.HashMap.empty[Any, Any]
    implicit val ord: Ordering[Any] = new Ordering[Any] {
      def compare(a: Any, b: Any): Int = (a, b) match {
        case (x: String, y: String) => x.compareTo(y)
        case (x: Long, y: Long) => java.lang.Long.compare(x, y)
        case (x: Int, y: Int) => java.lang.Integer.compare(x, y)
        case (x: Number, y: Number) => java.lang.Double.compare(x.doubleValue(), y.doubleValue())
        case _ => a.toString.compareTo(b.toString)
      }
    }
    def find(x: Any): Any = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    rows.foreach { r =>
      val (a, b) = (r.get(0), r.get(1))
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ord.lt(ra, rb)) parent(rb) = ra else parent(ra) = rb }
    }
    val nodes = rows.flatMap(r => Seq(r.get(0), r.get(1))).distinct
    // representative = min node id per component
    val reps = nodes.groupBy(find).map { case (_, ns) => ns.min -> ns }
    val out = reps.toSeq.flatMap { case (m, ns) => ns.map(n => org.apache.spark.sql.Row(n, m)) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node", schema(0).dataType),
        org.apache.spark.sql.types.StructField("component", schema(0).dataType))))
  }
}
