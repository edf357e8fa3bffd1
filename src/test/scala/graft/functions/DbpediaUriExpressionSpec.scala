package graft.functions

import graft.SparkSpec
import graft.kg.TextUtils
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions._

/** The native Catalyst dbpedia_uri expression (P10): semantics identical
  * to the scalar port, and the L13 key projection no longer carries a
  * ScalaUDF node (VERDICT r3 item 5). */
class DbpediaUriExpressionSpec extends SparkSpec {
  import spark.implicits._

  private val cases = Seq(
    "Albert Einstein", "Filter (signal)", "with\nnewline\rand cr",
    "lowercase first", "ä umlaut", "", "a", "Space  Double")

  private def call(c: org.apache.spark.sql.Column) = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dbpedia_uri", (args: Seq[Expression]) => DbpediaUri(args.head), "built-in")
    call_function("dbpedia_uri", c)
  }

  test("expression equals the scalar port on edge cases + is null-safe") {
    val df = (cases.map(Option(_)) :+ None).toDF("s")
    val got = df.select(call(col("s")).as("u"))
      .as[Option[String]].collect().toSeq
    val want = cases.map(c => Some(TextUtils.dbpediaUri(c))) :+ None
    assert(got == want)
  }

  test("no ScalaUDF in the plan — stays inside codegen (fallback disabled)") {
    val df = Seq("Filter (signal)").toDF("s").select(call(col("s")).as("u"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try assert(df.as[String].head() == TextUtils.dbpediaUri("Filter (signal)"))
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("the full kg_link_chain plan carries no ScalaUDF node") {
    val df = graft.ops.LinkOps.queries("kg_link_chain")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan.linesIterator
      .filter(_.contains("ScalaUDF")).mkString("\n"))
  }
}
