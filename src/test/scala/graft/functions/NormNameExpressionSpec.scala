package graft.functions

import graft.SparkSpec
import graft.kg.TextUtils
import org.apache.spark.sql.functions._

/** The native Catalyst norm_name expression: semantics identical to the
  * plain-Scala port, codegen-friendly (no ScalaUDF node in the plan), and
  * SQL-registrable. */
class NormNameExpressionSpec extends SparkSpec {
  import spark.implicits._

  private val cases = Seq(
    "  Albert Einstein  ", "[Einstein]", "Paris (Texas)", "A(b", "x)y(",
    "", "ÄÖÜ Straße", "Name (mit) (zwei)", "[ [nested] ]")

  test("expression equals the scalar port on edge cases + is null-safe") {
    val df = (cases.map(Option(_)) :+ None).toDF("s")
    val got = df.select(GraftFunctions.norm_name(spark, col("s")).as("n"))
      .as[Option[String]].collect().toSeq
    val want = cases.map(c => Some(TextUtils.normName(c))) :+ None
    assert(got == want)
  }

  test("no ScalaUDF in the plan — stays inside codegen (fallback disabled)") {
    val df = Seq("Paris (Texas)").toDF("s")
      .select(GraftFunctions.norm_name(spark, col("s")))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    // with codegen fallback OFF, a generated-code compile error would
    // surface here instead of silently degrading to interpreted eval
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try assert(df.as[String].collect().toSeq == Seq("paris"))
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("SQL registration: norm_name usable from spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT norm_name('  Paris (Texas) ') AS n")
      .as[String].head()
    assert(r == TextUtils.normName("  Paris (Texas) "))
  }

  test("extensions injector registers the function") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; wiring covered above
  }
}
