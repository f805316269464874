package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[CoveringFiles]] vs a brute-force reference: for boundary arrays
  * satisfying the sidecar invariant (mins sorted, maxes monotone —
  * ordered files overlap only at equal boundary keys), the routed id
  * set for key k must be exactly {(part << 32 | file) : min <= k <=
  * max}. Random boundaries drawn from a SMALL domain force duplicate
  * boundaries (equal-boundary chains, the left-walk's reason to
  * exist); keys probe below, inside, at, between and above every
  * range. Both execution modes covered: the DataFrame run exercises
  * whole-stage codegen, the direct kernel/eval calls the interpreted
  * path, and the two must agree row for row.
  */
class CoveringFilesSpec extends SparkSpec {
  import spark.implicits._

  private def brute(mins: Array[Array[Long]], maxs: Array[Array[Long]],
      k: Long): Set[Long] =
    (for {
      pi <- mins.indices
      fi <- mins(pi).indices
      if mins(pi)(fi) <= k && maxs(pi)(fi) >= k
    } yield (pi.toLong << 32) | fi.toLong).toSet

  /** Random per-part boundaries honoring the invariant: sort 2n draws
    * from a small domain, pair consecutive values into [min, max]. */
  private def randomBounds(rnd: scala.util.Random, parts: Int)
      : (Array[Array[Long]], Array[Array[Long]]) = {
    val perPart = (0 until parts).map { _ =>
      val n = 1 + rnd.nextInt(12)
      val vs = Array.fill(2 * n)(rnd.nextInt(40).toLong).sorted
      (Array.tabulate(n)(i => vs(2 * i)),
        Array.tabulate(n)(i => vs(2 * i + 1)))
    }
    (perPart.map(_._1).toArray, perPart.map(_._2).toArray)
  }

  test("codegen, interpreted eval and the shared kernel all equal the " +
      "brute-force covering set, including equal-boundary chains") {
    val rnd = new scala.util.Random(42)
    (0 until 20).foreach { round =>
      val (mins, maxs) = randomBounds(rnd, 1 + rnd.nextInt(4))
      val keys = (-2L to 42L) ++ Seq.fill(50)(rnd.nextInt(44).toLong - 2L)
      val df = keys.toDF("k")
      // codegen path: explode drops empty arrays, so carry the key and
      // compare per-key grouped sets against brute
      val routed = df.select(col("k"),
          CoveringFiles.coveringFiles(col("k"), mins, maxs).as("pf"))
        .as[(Long, Seq[Long])].collect()
      assert(routed.length == keys.size)
      routed.foreach { case (k, pf) =>
        val exp = brute(mins, maxs, k)
        assert(pf.toSet == exp && pf.size == exp.size,
          s"round=$round k=$k codegen got ${pf.sorted.toList}, " +
            s"expected ${exp.toList.sorted}")
        val kernel = CoveringFiles.covering(mins, maxs, k)
        assert(kernel.toSet == exp && kernel.length == exp.size,
          s"round=$round k=$k kernel disagrees")
      }
    }
  }

  test("null keys propagate, no-file parts route nothing, and a part " +
      "with one giant file covers every key") {
    val mins = Array(Array.empty[Long], Array(Long.MinValue))
    val maxs = Array(Array.empty[Long], Array(Long.MaxValue))
    val routed = Seq[Option[Long]](Some(7L), None, Some(Long.MinValue))
      .toDF("k")
      .select(CoveringFiles.coveringFiles(col("k"), mins, maxs).as("pf"))
      .collect().map(r => Option(r.get(0)))
    assert(routed(1).isEmpty, "null key must route to null")
    assert(routed(0).get.asInstanceOf[scala.collection.Seq[Long]]
        .toSeq == Seq(1L << 32),
      "only the giant file of part 1 covers")
    assert(routed(2).get.asInstanceOf[scala.collection.Seq[Long]]
      .toSeq == Seq(1L << 32))
  }

  test("a chain growing past the initial 8-slot buffer routes " +
      "completely (the doubling path)") {
    // 20 files all [5, 5]: key 5 must route to every one of them
    val mins = Array(Array.fill(20)(5L))
    val maxs = Array(Array.fill(20)(5L))
    val exp = (0 until 20).map(_.toLong).toSet
    assert(CoveringFiles.covering(mins, maxs, 5L).toSet == exp)
    val viaDf = Seq(5L).toDF("k")
      .select(explode(
        CoveringFiles.coveringFiles(col("k"), mins, maxs)).as("pf"))
      .as[Long].collect().toSet
    assert(viaDf == exp)
  }
}
