package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SparkInternals
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd dot product over two `array<double>` columns — the
  * hot inner loop of the similarity-search family. The builtin
  * composition (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) materializes
  * an intermediate array per row and interprets two lambdas; this
  * expression is a single fused loop over the unsafe array data, inside
  * whole-stage codegen (SURVEY §7.4: the one place a custom Expression
  * pays — everything else stays on builtins).
  *
  * Semantics match the builtin composition exactly, including the edge
  * cases: length-mismatched arrays yield NULL (zip_with pads the shorter
  * side with null, and `null * x` then `null + s` propagate), and a null
  * element on either side yields NULL. Accumulation is the same
  * sequential left-to-right fold, so non-null results are bit-identical.
  * The per-element null branch is only generated when an input's array
  * type admits null elements (`containsNull`), so the hot
  * `containsNull=false` path stays a pure fused multiply-add loop.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_product requires array<double> inputs, got $l / $r")
    }

  override def dataType: DataType = DoubleType

  // even non-null inputs produce NULL on length mismatch
  override def nullable: Boolean = true

  private def elementsNullable: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val checkNulls = elementsNullable
    var s = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val nullCheck =
        if (elementsNullable)
          s"""if ($a.isNullAt($i) || $b.isNullAt($i)) {
             |    ${ev.isNull} = true; break;
             |  }
             |  """.stripMargin
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck$s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

object DotProduct {
  def dot_product(a: Column, b: Column): Column =
    SparkInternals.column(
      DotProduct(SparkInternals.expression(a), SparkInternals.expression(b)))
}
