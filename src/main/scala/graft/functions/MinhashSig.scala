package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature over a word array as ONE native expression: the
  * 3-gram shingling and the 8 per-seed md5 minima fused into a single
  * compiled pass (reference dedup family; see `ops/DedupOps.lshBuckets`).
  *
  * Semantics are BIT-IDENTICAL to the SQL-HOF formulation the DuckDB
  * oracle still uses —
  *   transform(sequence(0,7), k ->
  *     array_min(transform(shingles(ws), s -> md5(k || '|' || s))))
  * with shingles(ws) the 1..max(|ws|-2, 1) 3-gram join — because the hex
  * md5 strings compare lexicographically exactly as their digest bytes.
  * `array_distinct` in the shingle step is dropped: duplicates cannot
  * change a minimum.
  *
  * Why not the HOF expression: higher-order functions are CodegenFallback,
  * so the nested lambda re-evaluated INTERPRETED per (seed × shingle) —
  * 8·|shingles| tree-walks and UTF8String concats per document dominated
  * the dd_minhash_lsh signature stage; this loop does 8·|shingles| raw
  * MD5 digests and nothing else, and stays inside the surrounding
  * WholeStageCodegen span (same pattern as [[NormName]]).
  */
case class MinhashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects ARRAY<STRING>, got ${other.catalogString}")
  }
  // containsNull: a seed's min is null iff every shingle was null (the
  // array_min-over-all-nulls degenerate case — impossible for split()
  // output but mirrored exactly)
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinhashSigImpl.sig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinhashSigImpl.sig($c)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

/** Static entry shared by interpreted eval and generated code (standalone
  * object → static forwarder — see NormNameImpl for why). */
object MinhashSigImpl {
  private val K = 8
  private val HexDigits = "0123456789abcdef".toCharArray
  // "k|" prefixes, precomputed once
  private val Prefixes: Array[Array[Byte]] =
    Array.tabulate(K)(k => (k.toString + "|").getBytes("UTF-8"))

  private[functions] def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HexDigits((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HexDigits(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  private[functions] def lessUnsigned(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  def sig(ws: ArrayData): ArrayData = {
    val n = ws.numElements()
    val count = math.max(n - 2, 1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val mins = new Array[Array[Byte]](K)
    val Space = ' '.toByte
    var i = 1
    while (i <= count) {
      // element_at(ws, i) — a null FIRST word nulls the whole shingle and
      // array_min skips nulls, so the shingle is skipped; positions 2/3
      // use try_element_at + coalesce('') semantics
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
        var k = 0
        while (k < K) {
          md.reset()
          md.update(Prefixes(k))
          md.update(sh)
          val d = md.digest()
          if (mins(k) == null || lessUnsigned(d, mins(k))) mins(k) = d
          k += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](K)
    var k = 0
    // a null entry mirrors array_min over an all-null shingle array (never
    // the case for split() output, where elements are non-null)
    while (k < K) { out(k) = if (mins(k) == null) null else hex(mins(k)); k += 1 }
    new GenericArrayData(out)
  }
}
