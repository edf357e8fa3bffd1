package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native simhash32 expression must be BIT-IDENTICAL to the
  * explode + groupBy + 32-conditional-sums formulation the DuckDB oracle
  * uses (integer ± sums are order-independent, so the per-doc fold is an
  * exact replacement, not an approximation). */
class SimHash32Spec extends SparkSpec {
  import spark.implicits._

  test("native expression == explode+groupBy formulation") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash32", args => SimHash32(args.head), "built-in")
    val rnd = new scala.util.Random(17)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "wörter", "straße",
      "x", "1", "", "the", "of")
    val docs = (0L until 300L).map { id =>
      (id, (0 until 1 + rnd.nextInt(60)).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")

    val native = df.select(col("doc_id"),
      call_function("simhash32", split(col("text"), " ")).as("simhash"))

    val inst = df.select(col("doc_id"), explode(split(col("text"), " ")).as("wd"))
      .withColumn("h", md5(col("wd")))
    val sums = (1 to 32).map(j =>
      sum(when(substring(col("h"), j, 1) >= "8", 1L).otherwise(-1L)).as(s"s$j"))
    val hof = inst.groupBy("doc_id").agg(sums.head, sums.tail: _*)
      .select(col("doc_id"),
        concat((1 to 32).map(j =>
          when(col(s"s$j") > 0, "1").otherwise("0")): _*).as("simhash"))

    assert(native.except(hof).count() == 0 && hof.except(native).count() == 0)
    assert(native.count() == 300)
  }
}
