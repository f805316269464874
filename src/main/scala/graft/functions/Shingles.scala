package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SparkInternals
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-loop replacements for the shingle/minhash family's hot
  * per-position expression compositions (guide §1.2, the r15 sweep
  * that also produced [[SpanGrams]]/[[SpanClean]]/[[SimhashFp]]).
  * Each is BYTE-identical to the composition it replaces, pinned by
  * ShinglesSpec — these strings/hashes feed oracle-replayed md5s and
  * persisted indexes, so semantics may not drift.
  */
object Shingles {

  private val Space = UTF8String.fromString(" ")

  /** `word_ngrams(ws, n, distinct)` — the space-joined stride-1 word
    * n-grams of a token array, in order (with multiplicity, or
    * first-occurrence-deduped when `distinct`). Replaces
    * `transform(sequence(1, len-n+1), i -> array_join(slice(ws,i,n),
    * " "))` (+ `array_distinct`): per position that paid an n-token
    * slice allocation plus the lambda/boxing machinery. NULL-SEMANTICS
    * QUIRKS preserved exactly: a null token array yields an EMPTY
    * array (the `when(size >= 1, …).otherwise(array())` guard), and
    * null tokens inside a window are skipped by the join without
    * doubling the separator (array_join semantics). */
  def wordNgrams(ws: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    if (ws == null) return new GenericArrayData(Array.empty[Any])
    val len = ws.numElements()
    val wins = len - n + 1
    if (wins <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](wins)
    val seen =
      if (distinct) new java.util.HashSet[UTF8String](wins * 2) else null
    val buf = new Array[UTF8String](n)
    var m = 0
    var i = 0
    while (i < wins) {
      var j = 0
      var k = 0
      while (j < n) {
        if (!ws.isNullAt(i + j)) { buf(k) = ws.getUTF8String(i + j); k += 1 }
        j += 1
      }
      val g =
        if (k == n) UTF8String.concatWs(Space, buf: _*)
        else { // null tokens skipped: shorter window
          val t = new Array[UTF8String](k)
          System.arraycopy(buf, 0, t, 0, k)
          UTF8String.concatWs(Space, t: _*)
        }
      if (seen == null || seen.add(g)) { out(m) = g; m += 1 }
      i += 1
    }
    if (m == wins) new GenericArrayData(out)
    else {
      val t = new Array[Any](m)
      System.arraycopy(out, 0, t, 0, m)
      new GenericArrayData(t)
    }
  }

  /** `char_shingles(text, n)` — all stride-1 character n-grams.
    * Replaces `transform(sequence(1, len-n+1), i -> substr(text, i,
    * n))`, whose per-position `substr` re-walks the string from byte 0
    * to find the character offset (O(len²) per document on multi-byte
    * text). One pass records the byte offset of every character, then
    * windows are direct byte-range copies. Null text yields an EMPTY
    * array (the composition's guard). */
  def charShingles(text: UTF8String, n: Int): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Any])
    val nChars = text.numChars()
    val wins = nChars - n + 1
    if (wins <= 0) return new GenericArrayData(Array.empty[Any])
    val bytes = text.getBytes
    // byte offset of each character start, plus the terminal offset
    val offs = new Array[Int](nChars + 1)
    var c = 0
    var b = 0
    while (c < nChars) {
      offs(c) = b
      b += org.apache.spark.unsafe.types.UTF8String
        .numBytesForFirstByte(bytes(b))
      c += 1
    }
    offs(nChars) = bytes.length
    val out = new Array[Any](wins)
    var i = 0
    while (i < wins) {
      out(i) = UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bytes, offs(i), offs(i + n)))
      i += 1
    }
    new GenericArrayData(out)
  }

  private val HexDigits = "0123456789abcdef".getBytes(
    java.nio.charset.StandardCharsets.US_ASCII)

  private val localMd5: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** `minhash_sig(gs, k)` — the k-seed MinHash signature of a shingle
    * array: entry i = min over gs of md5hex(s"$i|" + shingle), null
    * when gs is empty (or holds only nulls). Replaces k independent
    * `array_min(transform(gs, g -> md5(concat(lit("i|"), g))))`
    * columns: per shingle that paid k× (a concat allocation + a
    * one-shot digest + a 32-char hex render); here the digest is
    * reused and only the k winning digests are ever hexified —
    * hex strings order exactly like their digest bytes (both
    * lexicographic base-16), so the byte-space min is the same
    * winner. A null gs yields an all-null signature array (what the
    * composition's null propagation produced). */
  def minhashSig(gs: ArrayData, k: Int): ArrayData = {
    val out = new Array[Any](k)
    if (gs == null) return new GenericArrayData(out)
    val n = gs.numElements()
    val md = localMd5.get()
    val mins = new Array[Array[Byte]](k)
    val prefixes = new Array[Array[Byte]](k)
    var s = 0
    while (s < k) {
      prefixes(s) = (s.toString + "|").getBytes(
        java.nio.charset.StandardCharsets.UTF_8)
      s += 1
    }
    var i = 0
    while (i < n) {
      if (!gs.isNullAt(i)) { // null shingles are skipped by array_min
        val g = gs.getUTF8String(i).getBytes
        s = 0
        while (s < k) {
          md.reset()
          md.update(prefixes(s))
          md.update(g)
          val dig = md.digest()
          val cur = mins(s)
          if (cur == null || unsignedLess(dig, cur)) mins(s) = dig
          s += 1
        }
      }
      i += 1
    }
    s = 0
    while (s < k) {
      if (mins(s) != null) out(s) = toHex(mins(s))
      s += 1
    }
    new GenericArrayData(out)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val ai = a(i) & 0xff; val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  private def toHex(dig: Array[Byte]): UTF8String = {
    val hex = new Array[Byte](32)
    var b = 0
    while (b < 16) {
      hex(2 * b) = HexDigits((dig(b) >> 4) & 0xf)
      hex(2 * b + 1) = HexDigits(dig(b) & 0xf)
      b += 1
    }
    UTF8String.fromBytes(hex)
  }

  /** `md5_window_minmax(text, n)` — the lexicographic min and max md5
    * of all stride-1 n-char windows (the winnowing-lite document
    * fingerprint), as one struct. Replaces
    * `array_min/array_max(transform(sequence, i -> md5(substr(text,
    * i, n))))`: per position that paid a from-byte-0 substr walk
    * (O(len²) on multi-byte text), a one-shot digest and a 32-char
    * hex render kept alive in the full array. Here one offset walk,
    * a reused digest fed by byte ranges (no substring copies), min
    * and max tracked in byte space (hex order == digest-byte order)
    * and only the two winners hexified. Returns null (both fields)
    * for null text or texts shorter than n chars — exactly
    * array_min/max over the empty array. */
  def md5WindowMinMax(text: UTF8String, n: Int)
      : org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    if (text == null) return null
    val nChars = text.numChars()
    val wins = nChars - n + 1
    if (wins <= 0) return null
    val bytes = text.getBytes
    val offs = new Array[Int](nChars + 1)
    var c = 0
    var b = 0
    while (c < nChars) {
      offs(c) = b
      b += org.apache.spark.unsafe.types.UTF8String
        .numBytesForFirstByte(bytes(b))
      c += 1
    }
    offs(nChars) = bytes.length
    val md = localMd5.get()
    var min: Array[Byte] = null
    var max: Array[Byte] = null
    var i = 0
    while (i < wins) {
      md.reset()
      md.update(bytes, offs(i), offs(i + n) - offs(i))
      val dig = md.digest()
      if (min == null || unsignedLess(dig, min)) min = dig
      if (max == null || unsignedLess(max, dig)) max = dig
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](toHex(min), toHex(max)))
  }

  def wordNgramsCol(ws: Column, n: Int, distinct: Boolean): Column =
    SparkInternals.column(
      WordNgramsExpr(SparkInternals.expression(ws), n, distinct))

  def charShinglesCol(text: Column, n: Int): Column =
    SparkInternals.column(
      CharShinglesExpr(SparkInternals.expression(text), n))

  def minhashSigCol(gs: Column, k: Int): Column =
    SparkInternals.column(
      MinhashSigExpr(SparkInternals.expression(gs), k))

  def md5WindowMinMaxCol(text: Column, n: Int): Column =
    SparkInternals.column(
      FpMinMaxExpr(SparkInternals.expression(text), n))
}

/** See [[Shingles.wordNgrams]]. Total: null input maps to an empty
  * array, never SQL NULL. */
case class WordNgramsExpr(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  require(n >= 1, s"ngram width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"word_ngrams requires array<string> input, got $other")
    }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    Shingles.wordNgrams(
      child.eval(input).asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val c = child.genCode(ctx)
    val code =
      code"""
        |${c.code}
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        |  graft.functions.Shingles.wordNgrams(
        |    ${c.isNull} ? null : ${c.value}, $n, $distinct);
        |""".stripMargin
    ev.copy(code = code,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen
        .FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)

  override def prettyName: String = "word_ngrams"
}

/** See [[Shingles.charShingles]]. Total: null input maps to an empty
  * array, never SQL NULL. */
case class CharShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"char_shingles requires string input, got $other")
    }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    Shingles.charShingles(
      child.eval(input).asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val c = child.genCode(ctx)
    val code =
      code"""
        |${c.code}
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        |  graft.functions.Shingles.charShingles(
        |    ${c.isNull} ? null : ${c.value}, $n);
        |""".stripMargin
    ev.copy(code = code,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen
        .FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)

  override def prettyName: String = "char_shingles"
}

/** See [[Shingles.minhashSig]]. Entries are null for empty/all-null
  * shingle sets; the ARRAY itself is never null. */
case class MinhashSigExpr(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"signature width must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig requires array<string> input, got $other")
    }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = true)

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    Shingles.minhashSig(
      child.eval(input).asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val c = child.genCode(ctx)
    val code =
      code"""
        |${c.code}
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        |  graft.functions.Shingles.minhashSig(
        |    ${c.isNull} ? null : ${c.value}, $k);
        |""".stripMargin
    ev.copy(code = code,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen
        .FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

/** See [[Shingles.md5WindowMinMax]]. NULL for null/short text (the
  * composition's array_min/max-over-empty). */
case class FpMinMaxExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"window width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"md5_window_minmax requires string input, got $other")
    }

  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("fp_min", StringType),
      org.apache.spark.sql.types.StructField("fp_max", StringType)))

  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val t = child.eval(input)
    if (t == null) null
    else Shingles.md5WindowMinMax(t.asInstanceOf[UTF8String], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val c = child.genCode(ctx)
    // the call itself returns null for short texts, so isNull must be
    // derived from the VALUE, not just the child
    val code =
      code"""
        |${c.code}
        |org.apache.spark.sql.catalyst.expressions.GenericInternalRow
        |  ${ev.value} = ${c.isNull} ? null :
        |    graft.functions.Shingles.md5WindowMinMax(${c.value}, $n);
        |boolean ${ev.isNull} = ${ev.value} == null;
        |""".stripMargin
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)

  override def prettyName: String = "md5_window_minmax"
}
