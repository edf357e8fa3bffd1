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

  test("large-star/small-star CC matches union-find on random graphs") {
    val rng = new Random(42)
    (0 until 5).foreach { trial =>
      val n = 30 + rng.nextInt(50)
      val edges = (0 until n).map(_ => (rng.nextInt(40).toLong, rng.nextInt(40).toLong))
      val got = ConnectedComponents.run(spark, edges.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      val want = unionFind(edges)
      assert(got == want, s"trial $trial")
    }
  }

  test("CC over string node ids (entity names): min-lexicographic representative") {
    val edges = Seq(("b", "a"), ("c", "b"), ("x", "y"), ("z", "z")).toDF("src", "dst")
    val got = ConnectedComponents.run(spark, edges).as[(String, String)].collect().toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x", "z" -> "z"))
  }

  test("chain graph converges (worst case for min propagation)") {
    val chain = (0L until 63L).map(i => (i, i + 1))
    val got = ConnectedComponents.run(spark, chain.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(got.values.toSet == Set(0L))
    assert(got.keySet == (0L to 63L).toSet)
  }
}
