package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.SparkInternals
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Zone-map file routing of one probe key in ONE codegen'd
  * expression: `covering_files(key)` returns the `array<bigint>` of
  * `(part << 32 | file)` ids of every index file whose `[min, max]`
  * key range covers the key — the kernel of the over-cap pruning
  * tier's distributed hits pass
  * ([[graft.pipeline.IndexSegments]] `midTierScans`).
  *
  * WHY an expression and not a UDF (the hits pass shipped as the
  * repo's one remaining UDF): the pass runs once per over-cap probe
  * but over EVERY distinct probe key — at production corpus sizes
  * that is millions of rows paying the UDF's catalyst↔Scala
  * conversion and a boxed `Seq[Long]` + `GenericArrayData` per key.
  * Here the boundary arrays are flat `long[][]` reference objects,
  * the generated code is the same binary-search + equal-boundary
  * left-walk as the driver-side sample routing (both pinned to one
  * kernel, [[CoveringFiles.covering]]), the output is a primitive
  * `UnsafeArrayData`, and the whole pass stays inside whole-stage
  * codegen.
  *
  * Null propagation is standard (null key → null array); the caller
  * drops null keys first. A key covered by no file yields an EMPTY
  * array, which `explode` then drops — same semantics as the UDF it
  * replaces.
  */
case class CoveringFiles(child: Expression, mins: Array[Array[Long]],
    maxs: Array[Array[Long]]) extends UnaryExpression {

  require(mins.length == maxs.length,
    "per-part min/max boundary arrays must pair up")
  require(mins.indices.forall(i => mins(i).length == maxs(i).length),
    "each part's min/max boundary arrays must have equal length")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"covering_files requires bigint input, got $other")
    }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(key: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      CoveringFiles.covering(mins, maxs, key.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val minsRef = ctx.addReferenceObj("coveringMins", mins, "long[][]")
    val maxsRef = ctx.addReferenceObj("coveringMaxs", maxs, "long[][]")
    nullSafeCodeGen(ctx, ev, k => {
      val out = ctx.freshName("out")
      val w = ctx.freshName("w")
      val pi = ctx.freshName("pi")
      val pmins = ctx.freshName("pmins")
      val pmaxs = ctx.freshName("pmaxs")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val res = ctx.freshName("res")
      val mid = ctx.freshName("mid")
      val j = ctx.freshName("j")
      // single pass with a doubling primitive buffer: covering sets
      // are tiny (one file + an equal-boundary chain), so the initial
      // 8 slots almost never grow
      s"""
        |long[] $out = new long[8];
        |int $w = 0;
        |for (int $pi = 0; $pi < $minsRef.length; $pi++) {
        |  long[] $pmins = $minsRef[$pi];
        |  long[] $pmaxs = $maxsRef[$pi];
        |  int $lo = 0; int $hi = $pmins.length - 1; int $res = -1;
        |  while ($lo <= $hi) {
        |    int $mid = ($lo + $hi) >>> 1;
        |    if ($pmins[$mid] <= $k) { $res = $mid; $lo = $mid + 1; }
        |    else $hi = $mid - 1;
        |  }
        |  for (int $j = $res; $j >= 0 && $pmaxs[$j] >= $k; $j--) {
        |    if ($w == $out.length)
        |      $out = java.util.Arrays.copyOf($out, $w * 2);
        |    $out[$w++] = ((long) $pi << 32) | (long) $j;
        |  }
        |}
        |${ev.value} =
        |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        |    .fromPrimitiveArray(java.util.Arrays.copyOf($out, $w));
        |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object CoveringFiles {

  /** The routing kernel, shared verbatim by the interpreted path, the
    * driver-side sample routing and (inlined) the generated code:
    * binary-search the last file with `min <= k` per part, then walk
    * left across the equal-boundary chain while `max >= k`. */
  def covering(mins: Array[Array[Long]], maxs: Array[Array[Long]],
      k: Long): Array[Long] = {
    var out = new Array[Long](8)
    var w = 0
    var pi = 0
    while (pi < mins.length) {
      val pmins = mins(pi)
      val pmaxs = maxs(pi)
      var lo = 0; var hi = pmins.length - 1; var res = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (pmins(mid) <= k) { res = mid; lo = mid + 1 } else hi = mid - 1
      }
      var j = res
      while (j >= 0 && pmaxs(j) >= k) {
        if (w == out.length) out = java.util.Arrays.copyOf(out, w * 2)
        out(w) = (pi.toLong << 32) | j.toLong
        w += 1
        j -= 1
      }
      pi += 1
    }
    java.util.Arrays.copyOf(out, w)
  }

  /** `covering_files(key)` as a user-facing Column. */
  def coveringFiles(key: Column, mins: Array[Array[Long]],
      maxs: Array[Array[Long]]): Column =
    SparkInternals.column(
      CoveringFiles(SparkInternals.expression(key), mins, maxs))
}
