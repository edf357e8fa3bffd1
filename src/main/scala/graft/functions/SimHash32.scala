package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 32-bit SimHash per document as ONE native expression over the word
  * array — `ops/DedupOps.ddSimhash`.
  *
  * Bit j = sign of Σ over word INSTANCES of ±1, +1 iff hex digit j of
  * md5(word) is ≥ '8' (i.e. the nibble's top bit). Integer sums are
  * order-independent, so this per-doc fold is bit-identical to the
  * explode + groupBy(doc_id) + 32 conditional sums formulation the DuckDB
  * oracle keeps — while removing the explode AND THE WHOLE SHUFFLE: the
  * operator becomes map-only (the previous shape moved one partial row
  * per (doc, partition) through an aggregate exchange; at 10^12 docs that
  * exchange is the operator's entire cost).
  *
  * Null-word parity: md5(null) is null, `substring(null..) >= '8'` is
  * null, and the when().otherwise(-1) branch made a null word contribute
  * −1 to every bit — mirrored (unexercised: split() never yields nulls).
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash32 expects ARRAY<STRING>, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash32"

  override protected def nullSafeEval(input: Any): Any =
    SimHash32Impl.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash32Impl.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

/** Static entry shared by interpreted eval and generated code. */
object SimHash32Impl {
  private val Bits = 32

  def simhash(ws: ArrayData): UTF8String = {
    val sums = new Array[Int](Bits)
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = ws.numElements()
    var i = 0
    while (i < n) {
      if (ws.isNullAt(i)) {
        // null word: the when().otherwise(-1) branch — −1 on every bit
        var j = 0
        while (j < Bits) { sums(j) -= 1; j += 1 }
      } else {
        md.reset()
        val d = md.digest(ws.getUTF8String(i).getBytes)
        var j = 0
        while (j < Bits) {
          // hex digit j of the digest = nibble: '8'..'f' ⇔ nibble ≥ 8
          val b = d(j >> 1)
          val nib = if ((j & 1) == 0) (b >> 4) & 0xf else b & 0xf
          sums(j) += (if (nib >= 8) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Byte](Bits)
    var j = 0
    while (j < Bits) {
      out(j) = (if (sums(j) > 0) '1' else '0').toByte
      j += 1
    }
    UTF8String.fromBytes(out)
  }
}
