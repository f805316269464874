package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("floorDiv matches Math.floorDiv at any sign") {
    val vals = Seq(-17L, -10L, -1L, 0L, 1L, 9L, 10L, 17L, 12345678901L)
    val got = vals.toDF("v")
      .select($"v", RangeJoin.floorDiv($"v", 10L).as("q"))
      .as[(Long, Long)].collect().toMap
    vals.foreach { v =>
      assert(got(v) == Math.floorDiv(v, 10L), s"floorDiv($v, 10)")
    }
  }

  test("pointInInterval == brute-force nested-loop join") {
    // deterministic pseudo-random points/intervals over a signed domain;
    // intervals span 0..several bins, some empty (hi < lo), some overlap
    val pts = (0 until 400).map { i =>
      (i.toLong, ((i * 2654435761L) % 1000L) - 500L)
    }
    val ivs = (0 until 60).map { k =>
      val lo = ((k * 40503L) % 900L) - 450L
      val hi = lo + (k % 7) * 37L - 18L // some negative-width intervals
      (k.toLong, lo, hi)
    }
    val pdf = pts.toDF("pid", "x")
    val idf = ivs.toDF("iid", "lo", "hi")
    val expected = (for {
      (pid, x) <- pts
      (iid, lo, hi) <- ivs
      if x >= lo && x <= hi
    } yield (pid, iid)).toSet
    for (bw <- Seq(16L, 64L, 1000L)) {
      val got = RangeJoin.pointInInterval(pdf, $"x", idf, $"lo", $"hi", bw)
        .select("pid", "iid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"dup pairs at binWidth=$bw")
      assert(got.toSet == expected, s"mismatch at binWidth=$bw")
    }
  }

  test("intervalOverlap == brute-force overlap join") {
    val as = (0 until 120).map { i =>
      val lo = ((i * 48271L) % 800L) - 400L
      (i.toLong, lo, lo + (i % 9) * 23L - 11L)
    }
    val bs = (0 until 90).map { k =>
      val lo = ((k * 69621L) % 700L) - 350L
      (k.toLong, lo, lo + (k % 6) * 31L - 9L)
    }
    val adf = as.toDF("aid", "alo", "ahi")
    val bdf = bs.toDF("bid", "blo", "bhi")
    val expected = (for {
      (aid, alo, ahi) <- as if alo <= ahi
      (bid, blo, bhi) <- bs if blo <= bhi
      if alo <= bhi && blo <= ahi
    } yield (aid, bid)).toSet
    for (bw <- Seq(16L, 64L, 1000L)) {
      val got = RangeJoin.intervalOverlap(adf, $"alo", $"ahi",
          bdf, $"blo", $"bhi", bw)
        .select("aid", "bid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"dup pairs at binWidth=$bw")
      assert(got.toSet == expected, s"mismatch at binWidth=$bw")
    }
  }

  test("colliding column names are rejected") {
    val p = Seq((1L, 2L)).toDF("id", "x")
    val i = Seq((1L, 0L, 5L)).toDF("id", "lo", "hi")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(p, $"x", i, $"lo", $"hi", 10L)
    }
  }
}
