package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** P8+P9 category cleaning (utils/category_utils.py:3-165) as ONE native
  * array expression: strip the namespace prefix, drop maintenance
  * categories and null elements.
  *
  * Why not `filter(transform(...))`: higher-order functions are
  * CodegenFallback — the lambda body is re-evaluated INTERPRETED per array
  * element (26 startsWith probes per category here). At 10^6 nodes per
  * batch this was a dominant interpreted cost in the link stage
  * (thread-dump verified). This expression does the whole array in
  * compiled Scala and stays inside the surrounding WholeStageCodegen span
  * (same pattern as [[NormName]]).
  */
case class CleanCategories(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"clean_categories expects ARRAY<STRING>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "clean_categories"

  override protected def nullSafeEval(input: Any): Any =
    CleanCategoriesImpl.clean(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CleanCategoriesImpl.clean($c)")

  override protected def withNewChildInternal(newChild: Expression): CleanCategories =
    copy(child = newChild)
}

/** Static entry shared by interpreted eval and generated code (standalone
  * object → static forwarder — see NormNameImpl for why). */
object CleanCategoriesImpl {
  private val Prefixes = Array("Category:", "Kategorie:", "Catégorie:")
  // keyword list mirrors Linking.MaintenanceKeywords (single source kept
  // there; read once at class load)
  private lazy val Keywords: Array[String] =
    graft.kg.Linking.MaintenanceKeywords.toArray

  def clean(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      // null elements: the reference's list comprehension drops them (the
      // previous filter() lambda returned null → dropped)
      if (!arr.isNullAt(i)) {
        var s = arr.getUTF8String(i).toString
        var p = 0
        var stripped = false
        while (p < Prefixes.length && !stripped) {
          if (s.startsWith(Prefixes(p))) {
            s = s.substring(Prefixes(p).length)
            stripped = true
          }
          p += 1
        }
        var k = 0
        var drop = false
        while (k < Keywords.length && !drop) {
          if (s.startsWith(Keywords(k))) drop = true
          k += 1
        }
        if (!drop) out.add(UTF8String.fromString(s))
      }
      i += 1
    }
    new GenericArrayData(out.toArray(new Array[UTF8String](out.size())))
  }
}
