package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ColumnsSpec extends SparkSpec {
  import spark.implicits._

  test("flatten turns nested structs into parent_child columns") {
    val df = Seq((1L, 2.0, 3.0, "x"))
      .toDF("id", "a", "b", "tag")
      .select(col("id"),
        struct(col("a"), struct(col("b").as("inner")).as("deep")).as("m"),
        col("tag"))
    val flat = Columns.flatten(df)
    assert(flat.columns.toSeq == Seq("id", "m_a", "m_deep_inner", "tag"))
    assert(flat.as[(Long, Double, Double, String)].head() ==
      ((1L, 2.0, 3.0, "x")))
  }

  test("write lock blocks a second writer and clears on completion") {
    import java.nio.file.{Files, Paths}
    val dir = tmpDir("lock")
    val ds = new OrderedDataset(spark, s"$dir/d")
    ds.write(Seq((1L, 1.0)).toDF("t", "v"), WriteOpts("t"))
    // lock removed after write
    assert(!Files.exists(Paths.get(s"$dir/d/${OrderedDataset.LockName}")))
    // a fresh foreign lock blocks writes
    Files.createFile(Paths.get(s"$dir/d/${OrderedDataset.LockName}"))
    intercept[IllegalStateException] {
      ds.write(Seq((2L, 2.0)).toDF("t", "v"), WriteOpts("t"))
    }
    Files.delete(Paths.get(s"$dir/d/${OrderedDataset.LockName}"))
    ds.write(Seq((2L, 2.0)).toDF("t", "v"), WriteOpts("t"))
    assert(ds.df.count() == 2)
  }

  test("stale lock is broken; fresh lock survives heartbeat window") {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    val dir = tmpDir("stale-lock")
    val ds = new OrderedDataset(spark, s"$dir/d")
    ds.write(Seq((1L, 1.0)).toDF("t", "v"), WriteOpts("t"))
    // plant an abandoned lock (mtime beyond the staleness cutoff)
    val lock = Paths.get(s"$dir/d/${OrderedDataset.LockName}")
    Files.createFile(lock)
    Files.setLastModifiedTime(lock, FileTime.fromMillis(
      System.currentTimeMillis() - OrderedDataset.LockStaleMs - 1000))
    ds.write(Seq((2L, 2.0)).toDF("t", "v"), WriteOpts("t")) // breaks it
    assert(ds.df.count() == 2)
    assert(!Files.exists(lock))
  }

  test("orphans of a crashed commit are cleaned on next write") {
    import java.nio.file.{Files, Paths}
    val dir = tmpDir("orphans")
    val ds = new OrderedDataset(spark, s"$dir/d")
    ds.write(Seq((1L, 1.0)).toDF("t", "v"), WriteOpts("t"))
    // simulate a crash: an unreferenced data file + a leftover tmp dir
    val orphan = Paths.get(s"$dir/d/f00000099.parquet")
    Files.write(orphan, Array[Byte](1, 2, 3))
    val tmp = Paths.get(s"$dir/d/${OrderedDataset.TmpDirPrefix}deadbeef")
    Files.createDirectories(tmp)
    Files.write(tmp.resolve("part-x.parquet"), Array[Byte](9))
    ds.write(Seq((2L, 2.0)).toDF("t", "v"), WriteOpts("t"))
    assert(!Files.exists(orphan), "unreferenced data file must be deleted")
    assert(!Files.exists(tmp), "leftover tmp dir must be deleted")
    assert(ds.df.count() == 2)
  }

  test("racing writers serialize through the lock; dataset stays sane") {
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val dir = tmpDir("race")
    val ds = new OrderedDataset(spark, s"$dir/d")
    ds.write(Seq((0L, 0.0)).toDF("t", "v"), WriteOpts("t"))
    val pool = Executors.newFixedThreadPool(4)
    val start = new CountDownLatch(1)
    val results = (1 to 4).map { i =>
      pool.submit(new java.util.concurrent.Callable[Either[Throwable, Unit]] {
        def call(): Either[Throwable, Unit] = {
          start.await()
          try Right {
            // retry on lock contention like a real writer would
            var done = false
            var attempts = 0
            while (!done) {
              try {
                ds.write(Seq((i.toLong, i * 1.0)).toDF("t", "v"),
                  WriteOpts("t"))
                done = true
              } catch {
                case _: IllegalStateException if attempts < 60 =>
                  attempts += 1; Thread.sleep(200)
              }
            }
          } catch { case t: Throwable => Left(t) }
        }
      })
    }
    start.countDown()
    val outcomes = results.map(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    outcomes.foreach(o => assert(o.isRight, o))
    // every writer eventually committed; all 5 rows present, sidecar
    // stats consistent with the data
    assert(ds.orderedDf.select("t").as[Long].collect().toSeq ==
      (0L to 4L))
    assert(ds.meta.totalRows == 5)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/d/${OrderedDataset.LockName}")))
  }

  test("empty first batch keeps the schema; dataset stays queryable") {
    val dir = tmpDir("empty-schema")
    val ds = new OrderedDataset(spark, s"$dir/d")
    val empty = Seq.empty[(Long, Double)].toDF("t", "v")
    ds.write(empty, WriteOpts("t"))
    assert(ds.exists)
    assert(ds.df.columns.toSeq == Seq("t", "v"))
    assert(ds.orderedDf.select("v").count() == 0) // column resolves
    assert(ds.rangeDF(None, None).columns.toSeq == Seq("t", "v"))
    // and a later real write still works
    ds.write(Seq((1L, 1.0)).toDF("t", "v"), WriteOpts("t"))
    assert(ds.orderedDf.select("v").as[Double].collect().toSeq == Seq(1.0))
  }
}
