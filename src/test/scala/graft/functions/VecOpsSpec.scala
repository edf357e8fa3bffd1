package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native vec_dot / lsh_bucket8 expressions must be BIT-IDENTICAL to
  * the SQL-HOF formulations the DuckDB oracles use: same IEEE ops in the
  * same left-fold element order (floating-point sums are order-sensitive,
  * so this is an exact-equality test, not an epsilon test). */
class VecOpsSpec extends SparkSpec {
  import spark.implicits._

  private val hofDot =
    "aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, x) -> acc + x)"
  private val hofNorm = "sqrt(aggregate(a, 0d, (acc, x) -> acc + x * x))"
  private val hofBucket =
    """concat_ws('', transform(sequence(0, 7), p ->
         case when aggregate(
             zip_with(a, sequence(1, 64), (x, i) ->
               x * (cast(conv(substring(md5(concat('p', p, '_', i)), 1, 2), 16, 10) as double) - 127.5)),
             0d, (acc, x) -> acc + x) > 0d then '1' else '0' end))"""

  private def register(): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot",
      args => VecDot(args(0), args(1)), "built-in")
    reg.createOrReplaceTempFunction("lsh_bucket8",
      args => LshBucket8(args.head), "built-in")
  }

  private def randomVecs(n: Int, dim: Int): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(13)
    (0 until n).map(_ => Seq.fill(dim)(rnd.nextGaussian() * (1 + rnd.nextInt(5))))
  }

  test("vec_dot == aggregate(zip_with(...)) exactly, incl. self-dot norm") {
    register()
    val pairs = randomVecs(100, 64).grouped(2).map(g => (g(0), g(1))).toSeq
    val df = pairs.toDF("a", "b")
      .select(
        call_function("vec_dot", col("a"), col("b")).as("native"),
        expr(hofDot).as("hof"),
        sqrt(call_function("vec_dot", col("a"), col("a"))).as("nativeNorm"),
        expr(hofNorm).as("hofNorm"))
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
    assert(df.filter(col("nativeNorm") =!= col("hofNorm")).count() == 0)
    assert(df.filter(col("native").isNull).count() == 0)
  }

  test("vec_dot length mismatch -> null (zip_with null-pad parity)") {
    register()
    val df = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
      .select(call_function("vec_dot", col("a"), col("b")).as("native"),
        expr(hofDot).as("hof"))
    val r = df.collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("lsh_bucket8 == hyperplane HOF exactly; non-64-dim -> all zeros") {
    register()
    val vecs = randomVecs(60, 64) :+ Seq.fill(10)(1.0) // one non-64-dim vector
    val df = vecs.toDF("a")
      .select(call_function("lsh_bucket8", col("a")).as("native"),
        expr(hofBucket).as("hof"))
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
    val short = df.collect().last
    assert(short.getString(0) == "00000000" && short.getString(1) == "00000000")
  }
}
