package graft.functions

import graft.SparkSpec
import graft.pipeline.SimilarityOps
import org.apache.spark.sql.functions._

/** [[PqDots]] vs the literal composition it replaces
  * ([[SimilarityOps.pqLookupTableComposed]]): value-parity of every
  * rounded subspace dot — the expression exists purely to collapse a
  * ~2k-node plan tree into one looped node, so any numeric divergence
  * (rounding mode, accumulation order, NaN handling) is a bug here,
  * not a tolerance. Both execution modes are exercised (whole-stage
  * codegen and the interpreted eval fallback), plus the
  * malformed-input contract (null vector / wrong length / null
  * element → NULL result).
  */
class PqDotsSpec extends SparkSpec {
  import spark.implicits._

  private def codebook(m: Int, k: Int, ds: Int, seed: Long)
      : Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(m, k, ds)(rnd.nextGaussian())
  }

  test("value parity with the literal composition, codegen and eval") {
    val (m, k, ds) = (8, 16, 8)
    val cb = codebook(m, k, ds, 42L)
    val rnd = new scala.util.Random(7L)
    // include awkward magnitudes: rounding at 6 dp must agree exactly
    val rows = (0L until 300L).map { i =>
      (i, Array.fill(m * ds)(rnd.nextGaussian() *
        math.pow(10, (i % 7).toInt - 3)))
    }
    val df = rows.toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<double>").as("vec"))
    // the expression is FLAT (array<double> of m·k, primitive); the
    // composition is nested — flatten it for the value compare
    val viaExpr = df.select(col("id"),
        PqDots.pq_dots(col("vec"), cb).as("t"))
      .as[(Long, Seq[Double])].collect().toMap
    val viaComposed = df.select(col("id"),
        SimilarityOps.pqLookupTableComposed(col("vec"), cb).as("t"))
      .as[(Long, Seq[Seq[Double]])].collect().toMap
      .map { case (id, t) => id -> t.flatten }
    assert(viaExpr.keySet == viaComposed.keySet)
    viaExpr.foreach { case (id, t) =>
      assert(t == viaComposed(id), s"row $id diverges: " +
        s"${t.zip(viaComposed(id)).filter(p => p._1 != p._2).take(3)}")
    }
    // interpreted eval path agrees with codegen (same discipline as
    // SignBandsSpec): evaluate the expression directly per row
    val expr = PqDots(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = false),
        nullable = false),
      cb.map(_.map(_.toSeq).toSeq).toSeq)
    rows.take(50).foreach { case (id, v) =>
      val row = org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v))
      val out = expr.eval(row)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val got = (0 until m * k).map(out.getDouble)
      assert(got == viaExpr(id), s"eval/codegen diverge on row $id")
    }
  }

  test("NaN and infinity pass through rounding exactly like Spark's " +
      "round(_, 6)") {
    val (m, k, ds) = (2, 3, 4)
    val cb = codebook(m, k, ds, 5L)
    val special = Seq(
      (0L, Array.fill(m * ds)(Double.NaN)),
      (1L, Array.fill(m * ds)(Double.PositiveInfinity)),
      (2L, Array.tabulate(m * ds)(j =>
        if (j == 0) Double.NaN else 1.0)))
    val df = special.toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<double>").as("vec"))
    val a = df.select(col("id"),
        PqDots.pq_dots(col("vec"), cb).as("t"))
      .as[(Long, Seq[Double])].collect().toMap
    val b = df.select(col("id"),
        SimilarityOps.pqLookupTableComposed(col("vec"), cb).as("t"))
      .as[(Long, Seq[Seq[Double]])].collect().toMap
      .map { case (id, t) => id -> t.flatten }
    // compare with NaN-aware equality (== is false for NaN)
    a.foreach { case (id, t) =>
      t.zip(b(id)).foreach { case (x, y) =>
        assert(java.lang.Double.compare(x, y) == 0,
          s"row $id: $x vs $y")
      }
    }
  }

  test("missing data → NULL result (null vec, null element); clean " +
      "row computes") {
    val (m, k, ds) = (2, 3, 4)
    val cb = codebook(m, k, ds, 9L)
    val rows: Seq[(Long, Option[Array[java.lang.Double]])] = Seq(
      (0L, None),
      (2L, Some(Array.tabulate[java.lang.Double](m * ds)(j =>
        if (j == 2) null else java.lang.Double.valueOf(1.0)))),
      (3L, Some(Array.fill(m * ds)(java.lang.Double.valueOf(0.5)))))
    val df = rows.toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<double>").as("vec"))
    val out = df.select(col("id"),
        PqDots.pq_dots(col("vec"), cb).isNull.as("n"))
      .as[(Long, Boolean)].collect().toMap
    assert(out(0L) && out(2L) && !out(3L), out.toString)
  }

  test("wrong-length vector throws loudly (configuration bug, not " +
      "dirty data) — ADVICE r10") {
    val (m, k, ds) = (2, 3, 4)
    val cb = codebook(m, k, ds, 9L)
    val df = Seq((1L, Array.fill(3)(1.0))).toDF("id", "vec")
    val e = intercept[Exception] {
      df.select(PqDots.pq_dots(col("vec"), cb)).collect()
    }
    // Spark may wrap the executor-side throw; the root message must
    // name the mismatch and the remedy
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(c =>
      c.getMessage != null && c.getMessage.contains("pq_dots") &&
        c.getMessage.contains("dim=8")), e.toString)
  }
}
