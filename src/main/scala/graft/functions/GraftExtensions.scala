package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.SparkInternals
import org.apache.spark.sql.types.StringType

/** SparkSessionExtensions entry point: registers the engine's custom
  * functions for SQL use. Activate with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or call `GraftExtensions.register(spark)` on a live session.
  *
  * `dot_product` is a native Expression; `floor_ts`/`ceil_ts` are
  * column-composition builders — the SQL builder extracts the foldable
  * frequency literal and splices in the same expression tree the Scala
  * API produces, so SQL and DataFrame use are identical.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._
  override def apply(ext: SparkSessionExtensions): Unit = {
    builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
    // metadata-only COUNT/MIN/MAX over graft relations (sidecar stats)
    ext.injectOptimizerRule(_ => graft.sources.GraftStatsAgg)
  }
}

object GraftExtensions {

  private def stringLit(e: Expression, what: String): String = e match {
    case Literal(s, StringType) if s != null => s.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private[functions] val builders
      : Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_product" -> { exprs =>
      require(exprs.length == 2, "dot_product takes exactly 2 arguments")
      DotProduct(exprs.head, exprs(1))
    },
    "floor_ts" -> { exprs =>
      require(exprs.length == 2, "floor_ts takes (ts, freq)")
      SparkInternals.expressionEager(TimeFns.floor_ts(
        SparkInternals.column(exprs.head), stringLit(exprs(1), "freq")))
    },
    "ceil_ts" -> { exprs =>
      require(exprs.length == 2, "ceil_ts takes (ts, freq)")
      SparkInternals.expressionEager(TimeFns.ceil_ts(
        SparkInternals.column(exprs.head), stringLit(exprs(1), "freq")))
    })

  /** Runtime registration on an existing session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
