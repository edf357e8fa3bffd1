package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** P10 `_create_dbpedia_uri_from_label` (services/dbpedia/service.py:160-193)
  * as a NATIVE Catalyst expression: space→'_', drop \n\r, first char upper,
  * percent-quote with safe="()_", prefix http://dbpedia.org/resource/.
  *
  * Replaces the Scala UDF previously used at the L13 join-key site: a
  * ScalaUDF node breaks the WholeStageCodegen span around the dbp_uri
  * projection and pays closure + encoder overhead per row. Same pattern as
  * [[NormName]] / [[CleanCategories]].
  */
case class DbpediaUri(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dbpedia_uri expects STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dbpedia_uri"

  override protected def nullSafeEval(input: Any): Any =
    DbpediaUriImpl.uri(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // DbpediaUriImpl is a standalone object → static forwarder → callable
    // from generated Java (see NormName for why a companion would not be).
    defineCodeGen(ctx, ev, c => s"graft.functions.DbpediaUriImpl.uri($c)")

  override protected def withNewChildInternal(newChild: Expression): DbpediaUri =
    copy(child = newChild)
}

/** Static entry shared by interpreted eval and generated code. */
object DbpediaUriImpl {
  def uri(s: UTF8String): UTF8String =
    UTF8String.fromString(graft.kg.TextUtils.dbpediaUri(s.toString))
}
