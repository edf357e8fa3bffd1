package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Vector primitives for the similarity family (`ops/SimilarityOps`,
  * `ops/DedupOps.ddEmbedCos`) as native expressions.
  *
  * The SQL-HOF formulations they replace —
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, x) -> acc + x)
  * for the dot product, and the 8-hyperplane bucket with md5-derived
  * weights — are CodegenFallback: one interpreted tree-walk PER VECTOR
  * ELEMENT PER CANDIDATE PAIR, and the bucket recomputed the md5-derived
  * hyperplane CONSTANTS per vector. The DuckDB oracles keep the HOF
  * definitions; bit-identity holds because both run the same IEEE ops in
  * the same left-fold element order (specs assert it).
  */

/** Σ a_i·b_i in element order (exact aggregate-left-fold parity).
  * zip_with pads the shorter side with null and acc+null stays null, so a
  * length mismatch or a null element yields NULL — mirrored here. */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  private def ok(t: DataType) = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects two ARRAY<DOUBLE>, got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOpsImpl.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dotBoxed")
      s"""java.lang.Double $tmp = graft.functions.VecOpsImpl.dot($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** 8-bit random-hyperplane LSH bucket: bit p = sign of Σ v_i·w(p,i) with
  * w(p,i) = (first md5 hex byte of "p{p}_{i}") − 127.5 — the md5-derived
  * weights are CONSTANTS, precomputed once at class load instead of per
  * vector. A non-64-dim or null-element vector sums to SQL NULL and the
  * `case when null > 0` branch yields '0' — mirrored. */
case class LshBucket8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket8 expects ARRAY<DOUBLE>, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_bucket8"

  override protected def nullSafeEval(input: Any): Any =
    VecOpsImpl.bucket8(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecOpsImpl.bucket8($c)")

  override protected def withNewChildInternal(newChild: Expression): LshBucket8 =
    copy(child = newChild)
}

/** Static entries shared by interpreted eval and generated code. */
object VecOpsImpl {
  private val Dim = 64
  private val Planes = 8
  // w(p,i) = conv(substring(md5('p' || p || '_' || i), 1, 2), 16, 10) - 127.5
  private val Weights: Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(Planes) { p =>
      Array.tabulate(Dim) { i0 =>
        val i = i0 + 1
        md.reset()
        val d = md.digest(s"p${p}_$i".getBytes("UTF-8"))
        ((d(0) & 0xff).toDouble) - 127.5
      }
    }
  }

  /** Boxed so generated code can branch on the null (length-mismatch /
    * null-element) case. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def bucket8(v: ArrayData): UTF8String = {
    val bits = new Array[Byte](Planes)
    val valid = v.numElements() == Dim && {
      var i = 0
      var ok = true
      while (ok && i < Dim) { ok = !v.isNullAt(i); i += 1 }
      ok
    }
    var p = 0
    while (p < Planes) {
      var bit = '0'.toByte
      if (valid) {
        val w = Weights(p)
        var acc = 0d
        var i = 0
        while (i < Dim) { acc += v.getDouble(i) * w(i); i += 1 }
        if (acc > 0d) bit = '1'.toByte
      }
      bits(p) = bit
      p += 1
    }
    UTF8String.fromBytes(bits)
  }
}
