package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SparkInternals
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `span_grams(ws, k)` — every stride-1 k-token window of a token
  * array as `array<struct<pos:int, h:string>>` with `h` the lowercase
  * hex md5 of the window's tokens space-joined, in ONE JVM loop.
  *
  * Replaces the expression composition
  * `transform(sequence(0, n-k), i -> struct(i,
  *   md5(concat_ws(" ", slice(ws, i+1, k)))))`
  * in the span-dedup family's gram front (guide §1.2 per-task work):
  * the composed form paid, PER POSITION, a k-element array slice
  * allocation, a concat_ws string build, a fresh MessageDigest (the
  * built-in `Md5` goes through commons-codec's one-shot digest), and
  * a String→UTF8String round trip. Here token bytes are materialized
  * once per document and each window is fed to one reused, reset
  * digest instance — zero per-position array or string copies besides
  * the 32-byte hex output itself.
  *
  * BYTE-IDENTICAL digests by construction: md5 consumes exactly the
  * UTF-8 bytes of the space-joined window, with `concat_ws` null
  * semantics (null tokens skipped, no doubled separator — tokenizers
  * here never produce null tokens, but the contract is preserved).
  * Short arrays (< k tokens) yield an empty gram array — the caller's
  * old `when(size >= k, …).otherwise(array())` guard, absorbed. A
  * null token ARRAY yields null (explode drops it, as before). Stored
  * span-index digests (`graft.index.cfg` = `k<k>`) are therefore
  * unchanged — no index-format tag bump, and the DuckDB oracle SQL
  * replays identically.
  */
case class SpanGramsExpr(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 2, s"span gram width must be >= 2, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"span_grams requires array<string> input, got $other")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pos", IntegerType, nullable = false),
      StructField("h", StringType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any =
    SpanGrams.grams(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SpanGrams.grams($c, $k)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)

  override def prettyName: String = "span_grams"
}

object SpanGrams {

  private val HexDigits = "0123456789abcdef".getBytes(
    java.nio.charset.StandardCharsets.US_ASCII)

  /** One reused digest per task thread — `MessageDigest.reset()`
    * between windows instead of an instance per md5 call. */
  private val localMd5: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** The loop. Public and catalyst-typed because the generated code
    * calls it. */
  def grams(ws: ArrayData, k: Int): ArrayData = {
    val n = ws.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val md = localMd5.get()
    // token bytes once per document (UTF8String.getBytes copies only
    // when the backing buffer is offset/off-heap)
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val t = ws.isNullAt(i)
      toks(i) = if (t) null else ws.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[Any](n - k + 1)
    var p = 0
    while (p <= n - k) {
      md.reset()
      var first = true
      var j = p
      while (j < p + k) {
        val tb = toks(j)
        if (tb != null) { // concat_ws skips nulls, no doubled sep
          if (!first) md.update(' '.toByte)
          md.update(tb)
          first = false
        }
        j += 1
      }
      val dig = md.digest()
      val hex = new Array[Byte](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = HexDigits((dig(b) >> 4) & 0xf)
        hex(2 * b + 1) = HexDigits(dig(b) & 0xf)
        b += 1
      }
      out(p) = new GenericInternalRow(
        Array[Any](p, UTF8String.fromBytes(hex)))
      p += 1
    }
    new GenericArrayData(out)
  }

  def spanGrams(ws: Column, k: Int): Column =
    SparkInternals.column(
      SpanGramsExpr(SparkInternals.expression(ws), k))
}
