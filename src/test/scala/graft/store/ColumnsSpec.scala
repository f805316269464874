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
}
