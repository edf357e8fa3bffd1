package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `normalize_entity_name` (P7 — core/api/relationships.py:112-134) as a
  * NATIVE Catalyst expression with whole-stage codegen, instead of a Scala
  * UDF: no closure serialization, no encoder round-trip per row, null
  * handling folded into the generated code, and the expression stays
  * inside the surrounding WholeStageCodegen span (a ScalaUDF node breaks
  * it). This is the preferred extension mechanism for scalar reference
  * semantics that built-in functions cannot express (SURVEY §2.13).
  */
case class NormName(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"norm_name expects STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "norm_name"

  override protected def nullSafeEval(input: Any): Any =
    NormNameImpl.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // NormNameImpl is a STANDALONE object: the Scala compiler emits a
    // static forwarder for `normalize`, so the generated Java compiles.
    // (A companion object of the case class would NOT get one — `eval`
    // clashes with Expression.eval and codegen would silently fall back
    // to the interpreted path.)
    defineCodeGen(ctx, ev, c => s"graft.functions.NormNameImpl.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormName =
    copy(child = newChild)
}

/** Static entry shared by interpreted eval and generated code (standalone
  * object → static forwarder → callable from generated Java). */
object NormNameImpl {
  def normalize(s: UTF8String): UTF8String =
    UTF8String.fromString(graft.kg.TextUtils.normName(s.toString))
}

/** Function surface: a typed Column helper, an imperative per-session
  * registration (for sessions built without extensions), and the
  * `SparkSessionExtensions` injector for
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`. */
object GraftFunctions {
  /** DataFrame API: norm_name(col) — resolved through the session's
    * FunctionRegistry (idempotent registration + call_function). */
  def norm_name(spark: SparkSession, c: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("norm_name", c)
  }

  /** SQL surface on an already-built session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "norm_name", (args: Seq[Expression]) => NormName(args.head), "built-in")
}

/** spark.sql.extensions entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((FunctionIdentifier("norm_name"),
      new ExpressionInfo(classOf[NormName].getName, "norm_name"),
      (args: Seq[Expression]) => NormName(args.head)))
}
