package graft.store

/** Typed key ↔ directory-path codec, the Spark-side analog of the
  * reference's `@toplevel`/`@sublevel` indexer dataclasses
  * (ref oups/store/indexer.py:294-386): fields of one level join with
  * `-`, nested levels become subdirectories, and the codec round-trips
  * via `fromPath`. Field values are restricted like the reference
  * (ref indexer.py:17-22): no `.`, no path separator, and — because it
  * is the field separator — no `-`.
  */
trait Indexer[K] {
  /** Directory levels, outermost first; each level is a list of fields. */
  def encode(k: K): Seq[Seq[String]]
  def decode(levels: Seq[Seq[String]]): Option[K]
  /** Number of directory levels keys of this type occupy. */
  def depth: Int

  final def toPath(k: K): String = {
    val levels = encode(k)
    require(levels.length == depth, s"expected $depth levels, got $levels")
    levels.foreach(_.foreach(Indexer.validateField))
    levels.map(_.mkString(Indexer.FieldSep)).mkString("/")
  }

  final def fromPath(path: String): Option[K] = {
    val levels = path.split('/').toSeq
    if (levels.length != depth || levels.exists(_.isEmpty)) None
    else decode(levels.map(_.split(Indexer.FieldSep).toSeq))
  }
}

object Indexer {
  val FieldSep = "-"

  def validateField(f: String): Unit = {
    require(f.nonEmpty, "empty indexer field")
    require(!f.contains(FieldSep) && !f.contains('/') && !f.contains('.'),
      s"indexer field '$f' contains a forbidden character ('-', '/', '.')")
  }

  /** Build an indexer from plain encode/decode functions. */
  def of[K](d: Int)(enc: K => Seq[Seq[String]])(
      dec: Seq[Seq[String]] => Option[K]): Indexer[K] =
    new Indexer[K] {
      def encode(k: K) = enc(k)
      def decode(levels: Seq[Seq[String]]) = dec(levels)
      def depth = d
    }

  /** Single-level key of raw string fields. */
  def strings(nFields: Int): Indexer[Seq[String]] =
    of[Seq[String]](1)(k => Seq(k))(l =>
      if (l.head.length == nFields) Some(l.head) else None)
}
