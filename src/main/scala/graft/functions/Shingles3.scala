package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct 3-gram word shingles as ONE native expression (the map side of
  * the n-gram Jaccard dedup family, `ops/DedupOps.ddNgramJaccard`).
  *
  * Semantics are BIT-IDENTICAL to the SQL-HOF formulation the DuckDB
  * oracle keeps —
  *   array_distinct(transform(sequence(1, greatest(size(ws) - 2, 1)),
  *     i -> concat(element_at(ws, i), ' ',
  *                 coalesce(try_element_at(ws, i + 1), ''), ' ',
  *                 coalesce(try_element_at(ws, i + 2), ''))))
  * — including the 1- and 2-word edge windows (''-padded shingles), the
  * null-propagating concat when the FIRST word is null, and array_distinct's
  * first-occurrence ordering.
  *
  * Why not the HOF expression: higher-order functions are CodegenFallback —
  * the lambda re-evaluated INTERPRETED per window with per-element
  * tree-walks and UTF8String concats, the last interpreted HOF on a
  * headline-query hot path. This loop does one byte-copy per window and a
  * hash-set probe, and stays inside the surrounding WholeStageCodegen span
  * (same pattern as [[MinhashSig]], which fuses the identical shingling
  * with its md5 minima).
  *
  * Boundary: on a truly EMPTY input array the two formulations diverge —
  * the HOF's element_at(ws, 1) throws under ANSI mode (on in this Spark 4
  * setup) while this expression returns [null]. The divergence is
  * unreachable through the one production caller (split() never yields an
  * empty array), but callers feeding other sources must not assume the
  * oracle HOF form agrees on n == 0.
  */
case class Shingles3(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingles3 expects ARRAY<STRING>, got ${other.catalogString}")
  }
  // containsNull: a null FIRST word nulls its shingle (concat semantics);
  // array_distinct keeps a single null element
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingles3"

  override protected def nullSafeEval(input: Any): Any =
    Shingles3Impl.shingles(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Shingles3Impl.shingles($c)")

  override protected def withNewChildInternal(newChild: Expression): Shingles3 =
    copy(child = newChild)
}

/** Static entry shared by interpreted eval and generated code (standalone
  * object → static forwarder — see NormNameImpl for why). */
object Shingles3Impl {
  def shingles(ws: ArrayData): ArrayData = {
    val n = ws.numElements()
    val count = math.max(n - 2, 1)
    val Space = ' '.toByte
    // first-occurrence dedup, mirroring array_distinct
    val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
    var sawNull = false
    val out = new java.util.ArrayList[Any](count)
    var i = 1
    while (i <= count) {
      // element_at(ws, i): a null (or out-of-range, n=0) FIRST word nulls
      // the whole concat; positions 2/3 use try_element_at + coalesce('')
      if (i - 1 < n && !ws.isNullAt(i - 1)) {
        val b1 = ws.getUTF8String(i - 1).getBytes
        val b2 = if (i < n && !ws.isNullAt(i)) ws.getUTF8String(i).getBytes
                 else Array.emptyByteArray
        val b3 = if (i + 1 < n && !ws.isNullAt(i + 1)) ws.getUTF8String(i + 1).getBytes
                 else Array.emptyByteArray
        val sh = new Array[Byte](b1.length + b2.length + b3.length + 2)
        System.arraycopy(b1, 0, sh, 0, b1.length)
        sh(b1.length) = Space
        System.arraycopy(b2, 0, sh, b1.length + 1, b2.length)
        sh(b1.length + b2.length + 1) = Space
        System.arraycopy(b3, 0, sh, b1.length + b2.length + 2, b3.length)
        val s = UTF8String.fromBytes(sh)
        if (seen.add(s)) out.add(s)
      } else if (!sawNull) {
        sawNull = true
        out.add(null)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
