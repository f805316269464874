package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SparkInternals
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `span_clean(ws, dps, k)` — the surviving tokens of a document
  * space-rejoined after duplicated-span removal, in ONE JVM sweep:
  * token `ti` is removed when some duplicated gram position
  * `p ∈ dps` covers it (`p <= ti < p + k`), everything else joins
  * with single spaces.
  *
  * Replaces the span-assemble rebuild composition
  * `concat_ws(" ", transform(filter(transform(ws, (t,i) ->
  *   struct(t,i)), s -> !exists(dps, p -> p <= s.ti && s.ti < p+k)),
  *   s -> s.tok))`
  * which was measured as THE dominant cost of the span-dedup family
  * (~80% of p_span_dedup_bpe at 10×, guide §1.2): per token it
  * allocated a struct row and re-scanned the whole dps array
  * (O(tokens·|dps|)), then rebuilt two intermediate arrays before the
  * join. Here dps is read once into a sorted int buffer and a
  * two-pointer sweep marks coverage in O(tokens + |dps|), with the
  * output built by one `UTF8String.concatWs` (no intermediate
  * arrays, no struct boxing).
  *
  * EXACT semantics of the old composition, pinned by spec:
  * null tokens survive the position filter but are skipped by the
  * final join (concat_ws semantics); a null `ws` OR null `dps` yields
  * `""` (concat_ws of a null array / filter-over-null-exists both
  * collapse to the empty string) — never SQL NULL, so `md5(...)` of
  * the result matches the oracle's md5('') on fully-covered or
  * missing documents. dps element order does not matter (exists was
  * order-independent; the sweep sorts a copy).
  */
case class SpanClean(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  require(k >= 2, s"span gram width must be >= 2, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"span_clean requires (array<string>, array<int>), got ($l, $r)")
    }

  override def dataType: DataType = StringType

  /** Total function: null inputs map to "" (see scaladoc). */
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val ws = left.eval(input)
    val dps = right.eval(input)
    SpanClean.clean(ws.asInstanceOf[ArrayData],
      dps.asInstanceOf[ArrayData], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val code =
      code"""
        |${l.code}
        |${r.code}
        |UTF8String ${ev.value} = graft.functions.SpanClean.clean(
        |  ${l.isNull} ? null : ${l.value},
        |  ${r.isNull} ? null : ${r.value}, $k);
        |""".stripMargin
    ev.copy(code = code,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen
        .FalseLiteral)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "span_clean"
}

object SpanClean {

  private val Space = UTF8String.fromString(" ")

  /** The sweep. Public and catalyst-typed because the generated code
    * calls it. Never returns null. */
  def clean(ws: ArrayData, dps: ArrayData, k: Int): UTF8String = {
    if (ws == null) return UTF8String.EMPTY_UTF8
    val n = ws.numElements()
    if (dps == null) return UTF8String.EMPTY_UTF8 // exists→NULL drops all
    val d = dps.numElements()
    // sorted copy of the duplicated positions (collect_list order is
    // nondeterministic upstream of sort_array; exists() was
    // order-independent, so the sweep must be too)
    val dp = new Array[Int](d)
    var i = 0
    while (i < d) { dp(i) = dps.getInt(i); i += 1 }
    if (d > 1) java.util.Arrays.sort(dp)
    val out = new Array[UTF8String](n)
    var m = 0
    var di = 0
    var coverEnd = Long.MinValue
    var ti = 0
    while (ti < n) {
      while (di < d && dp(di) <= ti) {
        val e = dp(di).toLong + k
        if (e > coverEnd) coverEnd = e
        di += 1
      }
      if (ti >= coverEnd && !ws.isNullAt(ti)) {
        // null tokens pass the position filter but concat_ws skips
        // them — same output either way, so skip here
        out(m) = ws.getUTF8String(ti)
        m += 1
      }
      ti += 1
    }
    if (m == 0) UTF8String.EMPTY_UTF8
    else UTF8String.concatWs(Space, java.util.Arrays.copyOf(out, m): _*)
  }

  def spanClean(ws: Column, dps: Column, k: Int): Column =
    SparkInternals.column(SpanClean(SparkInternals.expression(ws),
      SparkInternals.expression(dps), k))
}
