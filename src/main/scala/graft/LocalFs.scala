package graft

/** Local-filesystem helpers shared by the driver mains and fixture
  * builders (the store's own data path goes through Hadoop FS — this is
  * only for java.io scratch trees: verify dumps, staging dirs).
  */
object LocalFs {
  /** Recursive delete; silently tolerates a missing path. */
  def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmTree))
    f.delete(): Unit
  }
}
