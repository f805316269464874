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

  test("unflatten re-nests parent_child names; flatten∘unflatten = id") {
    val df = Seq((1L, 2.0, 3.0, "x", 7L))
      .toDF("id", "a", "b", "tag", "k")
      .select(col("id"),
        struct(col("a"), struct(col("b").as("inner")).as("deep")).as("m"),
        col("tag"), struct(col("k").as("kk")).as("n"))
    val flat = Columns.flatten(df)
    val back = Columns.unflatten(flat)
    assert(back.schema == df.schema, s"\n${back.schema}\nvs\n${df.schema}")
    assert(back.collect().toSeq == df.collect().toSeq)
    // and the other direction: unflatten∘flatten over an already-flat
    // frame with multi-level names
    val flat2 = Seq((1L, 2L, 3L)).toDF("p_q", "p_r", "s")
    assert(Columns.flatten(Columns.unflatten(flat2)).columns.toSeq ==
      Seq("p_q", "p_r", "s"))
  }

  test("unflatten handles regex-metachar separators") {
    // String.split takes a regex: an unquoted "." would shred every
    // name into empty strings instead of splitting on the literal dot
    val flat = Seq((1L, 2L, 3L)).toDF("p.q", "p.r", "s")
    val nested = Columns.unflatten(flat, sep = ".")
    assert(nested.columns.toSeq == Seq("p", "s"))
    assert(Columns.flatten(nested, sep = ".").columns.toSeq ==
      Seq("p.q", "p.r", "s"))
  }

  test("unflatten property: random nested schemas round-trip") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import org.apache.spark.sql.types._
    val leafGen: Gen[DataType] =
      Gen.oneOf(LongType, DoubleType, StringType, BooleanType)
    def schemaGen(depth: Int, names: Iterator[String]): Gen[StructType] =
      Gen.choose(1, 4).flatMap { n =>
        Gen.sequence[Seq[StructField], StructField](Seq.fill(n) {
          val nm = names.next()
          if (depth <= 0) leafGen.map(t => StructField(nm, t))
          else Gen.frequency(
            3 -> leafGen.map(t => StructField(nm, t)),
            1 -> schemaGen(depth - 1, names).map(s => StructField(nm, s)))
        }).map(fs => StructType(fs))
      }
    // structs rebuilt by struct() are non-nullable containers — compare
    // names + leaf types, not container nullability
    def norm(s: StructType): StructType = StructType(s.fields.map { f =>
      f.dataType match {
        case st: StructType => StructField(f.name, norm(st))
        case dt             => StructField(f.name, dt)
      }
    })
    (1 to 8).foreach { i =>
      val names = Iterator.from(0).map(j => s"c$j")
      val schema = schemaGen(2, names)
        .pureApply(Gen.Parameters.default, Seed(77L + i))
      val df = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      val rt = Columns.unflatten(Columns.flatten(df))
      assert(norm(rt.schema) == norm(schema),
        s"seed=${77 + i}\n$schema\nvs\n${rt.schema}")
    }
  }

  test("unflatten rejects a name that is both leaf and struct prefix") {
    val flat = Seq((1L, 2L)).toDF("x", "x_y")
    intercept[IllegalArgumentException] { Columns.unflatten(flat) }
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
    // tmp dirs are reaped only past the grace window (an optimistic
    // preparer's LIVE tmp dir must survive a committer's sweep —
    // OrderedDataset.cleanOrphans); a crashed writer's dir is by
    // definition no longer being written, so backdating models it
    Files.setLastModifiedTime(tmp,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - OrderedDataset.retireGraceMs - 60000L))
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

  test("with lockWaitMs set, concurrent writers queue without retries") {
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val dir = tmpDir("queue")
    val ds = new OrderedDataset(spark, s"$dir/d")
    ds.write(Seq((0L, 0.0)).toDF("t", "v"), WriteOpts("t"))
    val prev = OrderedDataset.lockWaitMs
    OrderedDataset.lockWaitMs = 120000L
    try {
      val pool = Executors.newFixedThreadPool(4)
      val start = new CountDownLatch(1)
      val results = (1 to 4).map { i =>
        pool.submit(new java.util.concurrent.Callable[Either[Throwable, Unit]] {
          def call(): Either[Throwable, Unit] = {
            start.await()
            // NO application-level retry: the lock's bounded wait is
            // the queueing mechanism
            try Right(ds.write(Seq((i.toLong, i * 1.0)).toDF("t", "v"),
              WriteOpts("t")): Unit)
            catch { case t: Throwable => Left(t) }
          }
        })
      }
      start.countDown()
      val outcomes = results.map(_.get(120, TimeUnit.SECONDS))
      pool.shutdown()
      outcomes.foreach(o => assert(o.isRight, o))
      assert(ds.orderedDf.select("t").as[Long].collect().toSeq ==
        (0L to 4L))
    } finally OrderedDataset.lockWaitMs = prev
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
