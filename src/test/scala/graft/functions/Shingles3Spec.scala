package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native shingles3 expression must be BIT-IDENTICAL to the SQL-HOF
  * formulation the DuckDB oracle uses (windowed concat + array_distinct),
  * including the 1- and 2-word ''-padded edge windows, duplicate-window
  * first-occurrence ordering, and empty-string words. */
class Shingles3Spec extends SparkSpec {
  import spark.implicits._

  private val hofShingles =
    """array_distinct(transform(
         sequence(1, greatest(size(ws) - 2, 1)),
         i -> concat(element_at(ws, i), ' ',
                     coalesce(try_element_at(ws, i + 1), ''),
                     ' ',
                     coalesce(try_element_at(ws, i + 2), ''))))"""

  private def register(): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingles3", args => Shingles3(args.head), "built-in")

  test("native expression == HOF formulation on varied word arrays") {
    register()
    val docs = Seq(
      "one",
      "two words",
      "three little words",
      "a longer sentence with several words repeating words words",
      "x y z x y z x y z", // duplicate windows → distinct ordering matters
      "unicode wörter über straße und mäßig",
      "trailing space words ", // split yields a trailing empty word
      " leading space words",
      "")
    val df = docs.toDF("text")
      .select(split(col("text"), " ").as("ws"))
      .select(call_function("shingles3", col("ws")).as("native"),
        expr(hofShingles).as("hof"))
    df.collect().foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"native ${r.getSeq[String](0)} != hof ${r.getSeq[String](1)}")
    }
  }

  test("property: random word arrays agree") {
    register()
    val rnd = new scala.util.Random(11)
    val docs = (0 until 200).map { _ =>
      val n = 1 + rnd.nextInt(40)
      // a small vocabulary forces duplicate shingles (distinct-order cases)
      (0 until n).map(_ => "w" + rnd.nextInt(6)).mkString(" ")
    }
    val df = docs.toDF("text")
      .select(split(col("text"), " ").as("ws"))
      .select(call_function("shingles3", col("ws")).as("native"),
        expr(hofShingles).as("hof"))
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("plan: dd_ngram_jaccard map side has no interpreted HOF node") {
    register()
    val df = Seq("a b c d e").toDF("text")
      .select(split(col("text"), " ").as("ws"))
      .select(call_function("shingles3", col("ws")).as("shs"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("transform("), s"HOF survived in plan:\n$plan")
  }
}
