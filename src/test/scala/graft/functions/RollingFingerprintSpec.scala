package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native rolling_fingerprint expression must be BIT-IDENTICAL to the
  * SQL-HOF formulation the DuckDB oracle uses, including sub-window-length
  * texts (one truncated window) and multi-byte characters (substring is
  * character-based). */
class RollingFingerprintSpec extends SparkSpec {
  import spark.implicits._

  private val hofFp =
    """array_min(transform(
         sequence(1, greatest(char_length(text) - 4, 1)),
         i -> md5(substring(text, i, 5))))"""

  test("native expression == HOF formulation") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_fingerprint", args => RollingFingerprint(args.head), "built-in")
    val rnd = new scala.util.Random(11)
    val texts = Seq("", "a", "abcd", "abcde", "abcdef",
      "wörter über straße mäßig — ünïcødé",
      "the quick brown fox jumps over the lazy dog") ++
      (0 until 100).map(_ => rnd.alphanumeric.take(rnd.nextInt(200)).mkString(" "))
    val df = texts.toDF("text")
      .select(call_function("rolling_fingerprint", col("text")).as("native"),
        expr(hofFp).as("hof"))
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
    assert(df.filter(col("native").isNull).count() == 0)
  }
}
