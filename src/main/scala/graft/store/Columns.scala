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

  /** Inverse of [[flatten]]: re-nest `parent_sep_child` top-level names
    * into struct columns — the read-side half of the reference's cmidx
    * round-trip (`conform_cmidx`, ref parquet_adapter.py:20-85). Every
    * occurrence of `sep` nests one level (the cmidx convention: level
    * labels themselves do not contain the separator), so
    * `flatten(unflatten(df)) == df` and, for frames whose leaf names are
    * sep-free, `unflatten(flatten(df)) == df`. Sibling order follows
    * first occurrence, matching what flatten emits. A name that is both
    * a leaf and a prefix of nested names (`x` next to `x_y`) is
    * ambiguous and rejected.
    */
  def unflatten(df: DataFrame, sep: String = "_"): DataFrame = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions.struct
    // (path, flatName) leaves in frame order. String.split takes a
    // REGEX — quote the separator or any metachar sep (".", "|", "+")
    // silently shreds every name and breaks the flatten inverse.
    val sepRe = java.util.regex.Pattern.quote(sep)
    val leaves = df.columns.toSeq.map(n => (n.split(sepRe, -1).toSeq, n))
    def build(group: Seq[(Seq[String], String)]): Seq[Column] = {
      val heads = group.map(_._1.head).distinct
      heads.map { h =>
        val sub = group.filter(_._1.head == h)
        val (leaf, nested) = sub.partition(_._1.size == 1)
        if (leaf.nonEmpty && nested.nonEmpty)
          throw new IllegalArgumentException(
            s"ambiguous column '$h': appears both as a leaf and as a " +
              s"struct prefix of ${nested.map(_._2).mkString(", ")}")
        if (nested.isEmpty) col(s"`${leaf.head._2}`").as(h)
        else struct(build(nested.map { case (p, n) => (p.tail, n) }): _*)
          .as(h)
      }
    }
    df.select(build(leaves): _*)
  }
}
