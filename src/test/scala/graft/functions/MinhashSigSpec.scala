package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native minhash_sig expression must be BIT-IDENTICAL to the SQL-HOF
  * formulation the DuckDB oracle uses (shingle transform + per-seed
  * array_min of md5), including the 1- and 2-word edge windows where the
  * 3-gram falls back to ''-padded shingles. */
class MinhashSigSpec extends SparkSpec {
  import spark.implicits._

  private val hofSig =
    """transform(sequence(0, 7),
         k -> array_min(transform(
           array_distinct(transform(
             sequence(1, greatest(size(ws) - 2, 1)),
             i -> concat(element_at(ws, i), ' ',
                         coalesce(try_element_at(ws, i + 1), ''),
                         ' ',
                         coalesce(try_element_at(ws, i + 2), '')))),
           s -> md5(concat(cast(k as string), '|', s)))))"""

  test("native expression == HOF formulation on varied word arrays") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", args => MinhashSig(args.head), "built-in")
    val docs = Seq(
      "one",
      "two words",
      "three little words",
      "a longer sentence with several words repeating words words",
      "x y z x y z x y z",
      "unicode wörter über straße und mäßig",
      "trailing space words ",
      " leading space words")
    val df = docs.toDF("text")
      .select(split(col("text"), " ").as("ws"))
      .select(
        call_function("minhash_sig", col("ws")).as("native"),
        expr(hofSig).as("hof"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"native ${r.getSeq[String](0)} != hof ${r.getSeq[String](1)}")
    }
  }

  test("property: random word arrays agree") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", args => MinhashSig(args.head), "built-in")
    val rnd = new scala.util.Random(7)
    val docs = (0 until 200).map { _ =>
      val n = 1 + rnd.nextInt(40)
      (0 until n).map(_ => rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString)
        .mkString(" ")
    }
    val df = docs.toDF("text")
      .select(split(col("text"), " ").as("ws"))
      .select(call_function("minhash_sig", col("ws")).as("native"),
        expr(hofSig).as("hof"))
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
  }
}
