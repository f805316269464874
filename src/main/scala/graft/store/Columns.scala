package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Column-shape helpers — the analog of the reference's column
  * multi-index normalization (`conform_cmidx`,
  * ref parquet_adapter.py:20-85, exported at oups/__init__.py:26): the
  * reference flattens pandas MultiIndex column labels for parquet; the
  * Spark-native equivalent of hierarchical column labels is nested
  * structs, flattened to `parent_child` names for storage and restored
  * by re-nesting.
  */
object Columns {

  /** Flatten all struct columns (recursively) to `parent_sep_child`
    * top-level names.
    */
  def flatten(df: DataFrame, sep: String = "_"): DataFrame = {
    def paths(schema: StructType, prefix: Seq[String]): Seq[Seq[String]] =
      schema.fields.toSeq.flatMap { f =>
        f.dataType match {
          case s: StructType => paths(s, prefix :+ f.name)
          case _             => Seq(prefix :+ f.name)
        }
      }
    val cols = paths(df.schema, Nil).map { p =>
      col(p.map(n => s"`$n`").mkString(".")).as(p.mkString(sep))
    }
    df.select(cols: _*)
  }
}
