package graft.kg

import graft.SparkSpec
import scala.util.Random

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force union-find reference. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.foreach { case (a, b) => union(a, b) }
    val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
    // representative = min node id in component
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) => val m = ns.min; ns.map(_ -> m) }.toMap
  }

  test("large-star/small-star CC matches union-find on random graphs (distributed path)") {
    val rng = new Random(42)
    (0 until 5).foreach { trial =>
      val n = 30 + rng.nextInt(50)
      val edges = (0 until n).map(_ => (rng.nextInt(40).toLong, rng.nextInt(40).toLong))
      val got = ConnectedComponents.run(spark, edges.toDF("src", "dst"), localThreshold = 0L)
        .as[(Long, Long)].collect().toMap
      val want = unionFind(edges)
      assert(got == want, s"trial $trial")
    }
  }

  test("small-graph fast path (driver union-find) matches the distributed path") {
    val rng = new Random(7)
    (0 until 5).foreach { trial =>
      val edges = (0 until 60).map(_ => (rng.nextInt(50).toLong, rng.nextInt(50).toLong))
      val dist = ConnectedComponents.run(spark, edges.toDF("src", "dst"), localThreshold = 0L)
        .as[(Long, Long)].collect().toMap
      val local = ConnectedComponents.run(spark, edges.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      assert(dist == local, s"trial $trial")
      assert(local == unionFind(edges), s"trial $trial vs union-find")
    }
  }

  test("CC over string node ids (entity names): min-lexicographic representative, both paths") {
    val edges = Seq(("b", "a"), ("c", "b"), ("x", "y"), ("z", "z")).toDF("src", "dst")
    val want = Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x", "z" -> "z")
    assert(ConnectedComponents.run(spark, edges).as[(String, String)].collect().toMap == want)
    assert(ConnectedComponents.run(spark, edges, localThreshold = 0L)
      .as[(String, String)].collect().toMap == want)
  }

  test("chain graph converges (worst case for min propagation, distributed path)") {
    val chain = (0L until 63L).map(i => (i, i + 1))
    val got = ConnectedComponents.run(spark, chain.toDF("src", "dst"), localThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(got.values.toSet == Set(0L))
    assert(got.keySet == (0L to 63L).toSet)
  }
}
