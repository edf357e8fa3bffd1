package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling-window document fingerprint (the winnowing primitive for
  * containment detection — `ops/TextOps.taFingerprint`) as ONE native
  * expression: min md5 over all 5-char windows of the text.
  *
  * Bit-identical to the SQL-HOF formulation the DuckDB oracle uses —
  *   array_min(transform(sequence(1, greatest(len-4, 1)),
  *     i -> md5(substring(text, i, 5))))
  * (hex md5 strings compare lexicographically exactly as their digest
  * bytes; `substring` is CHARACTER-based, handled via substringSQL).
  *
  * Why not the HOF: CodegenFallback — one interpreted tree-walk + md5
  * expression eval PER CHARACTER POSITION, plus a materialized
  * sequence-array per row; this loop does the digests and nothing else.
  */
case class RollingFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_fingerprint expects STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    RollingFingerprintImpl.fingerprint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingFingerprintImpl.fingerprint($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

/** Static entry shared by interpreted eval and generated code.
  *
  * One pass records the byte offset of every character start, then each
  * 5-char window digests a SLICE of the original byte buffer
  * (`md.update(bytes, off, len)`) — zero per-window allocation and no
  * repeated from-the-start scans (`substringSQL(i, 5)` re-walks the
  * variable-length UTF-8 prefix per call, O(n²) over the document). */
object RollingFingerprintImpl {
  def fingerprint(text: UTF8String): UTF8String = {
    val bytes = text.getBytes
    val nBytes = bytes.length
    val len = text.numChars()
    val count = math.max(len - 4, 1)
    // offs(c) = byte offset where character c starts; offs(len) = end
    val offs = new Array[Int](len + 1)
    var c = 0
    var o = 0
    while (o < nBytes) {
      offs(c) = o
      o += UTF8String.numBytesForFirstByte(bytes(o))
      c += 1
    }
    offs(len) = nBytes
    val md = java.security.MessageDigest.getInstance("MD5")
    var min: Array[Byte] = null
    var w = 0
    while (w < count) {
      // SQL substring(text, w+1, 5): character-based, shorter at the tail
      val start = offs(w)
      val end = offs(math.min(w + 5, len))
      md.reset()
      md.update(bytes, start, end - start)
      val d = md.digest()
      if (min == null || MinhashSigImpl.lessUnsigned(d, min)) min = d
      w += 1
    }
    MinhashSigImpl.hex(min)
  }
}
