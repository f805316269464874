package graft.functions

import graft.SparkSpec
import graft.pipeline.SimilarityOps
import org.apache.spark.sql.functions._

/** [[SignBands]] vs the builtin composition it replaces
  * ([[SimilarityOps.lshBandsComposed]]): bit-parity on every edge the
  * composition defines implicitly — null vectors, null elements,
  * wrong-length vectors, ragged final bands, NaN projections (Spark's
  * double ordering says NaN >= 0) — plus both execution modes
  * (whole-stage codegen and the interpreted eval fallback).
  */
class SignBandsSpec extends SparkSpec {
  import spark.implicits._

  private def both(planes: Seq[Seq[Double]], ppb: Int,
      rows: Seq[(Long, Option[Array[java.lang.Double]])]): Unit = {
    val df = rows.toDF("id", "embedding")
      .select(col("id"), col("embedding").cast("array<double>").as("vec"))
    def collect(out: org.apache.spark.sql.DataFrame) =
      out.select("id", "band_id", "bucket")
        .as[(Long, Int, String)].collect().toSet
    val viaExpr = collect(SimilarityOps.lshBands(df, planes, ppb))
    val viaComposed = collect(SimilarityOps.lshBandsComposed(df, planes, ppb))
    assert(viaExpr == viaComposed,
      s"planes=${planes.size}x$ppb: " +
        s"diff=${(viaExpr.diff(viaComposed) ++
          viaComposed.diff(viaExpr)).take(5)}")
  }

  private def vecOf(xs: Double*): Option[Array[java.lang.Double]] =
    Some(xs.map(java.lang.Double.valueOf).toArray)

  test("bit-parity with the composition: dense, ragged, and edge rows") {
    val rnd = new scala.util.Random(7)
    val dim = 8
    val dense = (0L until 200L).map(i =>
      (i, vecOf(Seq.fill(dim)(rnd.nextGaussian()): _*)))
    val edges: Seq[(Long, Option[Array[java.lang.Double]])] = Seq(
      (1000L, None),                                 // null vector
      (1001L, vecOf(1.0, -2.0)),                     // wrong length
      (1002L, Some(Array[java.lang.Double](
        1.0, null, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0))),  // null element
      (1003L, vecOf(Double.NaN, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0)),
      (1004L, vecOf(0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)),
      (1005L, vecOf(-0.0, 0.0, -0.0, 0.0, -0.0, 0.0, -0.0, 0.0)))
    val rows = dense ++ edges
    // even bands, ragged final band, single wide band, 1-bit bands
    both(SimilarityOps.hyperplanes(12, dim), 3, rows)
    both(SimilarityOps.hyperplanes(7, dim), 3, rows)
    both(SimilarityOps.hyperplanes(5, dim), 5, rows)
    both(SimilarityOps.hyperplanes(4, dim), 1, rows)
  }

  test("null and malformed vectors produce all-zero band keys, not null rows") {
    val df = Seq((1L, None: Option[Array[Double]]))
      .toDF("id", "embedding")
      .select(col("id"), col("embedding").cast("array<double>").as("vec"))
    val out = SimilarityOps.lshBands(df, SimilarityOps.hyperplanes(6, 8), 3)
      .select("band_id", "bucket").as[(Int, String)].collect().toSet
    assert(out == Set((0, "000"), (1, "000")))
  }

  test("interpreted eval matches codegen output") {
    val planes = SimilarityOps.hyperplanes(7, 4)
    val expr = SignBands(
      org.apache.spark.sql.graftbridge.SparkInternals.expression(
        col("vec")), planes, 3)
    // evaluate the SAME rows through the expression's eval() directly
    val df = Seq(
      (1L, Array(0.5, -1.5, 2.5, -0.25)),
      (2L, Array(0.0, 0.0, 0.0, 0.0))).toDF("id", "embedding")
      .select(col("id"),
        col("embedding").cast("array<double>").as("vec"))
    val viaCodegen = SimilarityOps.lshBands(df, planes, 3)
      .select("id", "band_id", "bucket")
      .as[(Long, Int, String)].collect().toSet
    val viaEval = df.select(col("id"), col("vec")).collect().flatMap { r =>
      val vecData = org.apache.spark.sql.catalyst.util.ArrayData
        .toArrayData(r.getSeq[Double](1).toArray)
      val row = org.apache.spark.sql.catalyst.InternalRow(vecData)
      val boundExpr = SignBands(
        org.apache.spark.sql.catalyst.expressions.BoundReference(0,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, false), true),
        planes, 3)
      val out = boundExpr.eval(row)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      (0 until out.numElements()).map(b =>
        (r.getLong(0), b, out.getUTF8String(b).toString))
    }.toSet
    assert(viaCodegen == viaEval)
    assert(expr.prettyName == "sign_bands")
  }
}
