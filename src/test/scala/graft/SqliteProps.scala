package graft

import graft.sources.{SqliteFile, SqliteReader}
import org.scalacheck.{Gen, Prop, Properties}

/** Property round-trip for the from-scratch SQLite container pair:
  * arbitrary typed rows (nulls, Longs across every serial-type width
  * boundary, doubles incl. negative zero and subnormals, unicode
  * text, binary blobs) written by [[SqliteFile]] must come back
  * bit-identical through the independent [[SqliteReader]] parse of
  * the file bytes — covering record serial-type selection, varint
  * widths, page packing, and (via large batches) the interior b-tree
  * level, on inputs no fixture enumerates.
  */
object SqliteProps extends Properties("SqliteFile") {

  private val longGen: Gen[Long] = Gen.oneOf(
    Gen.chooseNum(Long.MinValue, Long.MaxValue),
    // the serial-type width boundaries, exactly
    Gen.oneOf(0L, 127L, 128L, -128L, -129L, 32767L, 32768L, -32768L,
      -32769L, 8388607L, 8388608L, Int.MaxValue.toLong,
      Int.MaxValue + 1L, 140737488355327L, 140737488355328L,
      Long.MaxValue, Long.MinValue))

  private val doubleGen: Gen[Double] = Gen.oneOf(
    Gen.chooseNum(-1e300, 1e300),
    Gen.oneOf(0.0, -0.0, 1.5, -2.25, java.lang.Double.MIN_VALUE,
      java.lang.Double.MAX_VALUE, 1e-310 /* subnormal */))

  private val textGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(40)),
    Gen.oneOf("", "émoji ✓", "tab\tnewline\n", "ﬆ≠𝒜", "a" * 200))

  private val blobGen: Gen[Array[Byte]] = Gen.oneOf(
    Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))
      .map(_.take(60).toArray),
    Gen.const(Array.emptyByteArray))

  private val valueGen: Gen[Any] = Gen.oneOf(
    Gen.const(null), longGen, doubleGen, textGen, blobGen)

  private def sameValue(w: Any, r: Any): Boolean = (w, r) match {
    case (null, null) => true
    case (a: Long, b: Long) => a == b
    case (a: Double, b: Double) =>
      java.lang.Double.doubleToRawLongBits(a) ==
        java.lang.Double.doubleToRawLongBits(b)
    case (a: String, b: String) => a == b
    case (a: Array[Byte], b: Array[Byte]) => a.sameElements(b)
    // an empty blob reads back as the empty array, text as "" — the
    // serial types are distinct, so the classes must match exactly
    case _ => false
  }

  property("typed rows round-trip bit-exactly through the file bytes") =
    Prop.forAll(Gen.chooseNum(1, 6), Gen.chooseNum(1, 80)) { (cols, rows) =>
      Prop.forAll(Gen.listOfN(rows, Gen.listOfN(cols, valueGen))) { data =>
        val db = java.nio.file.Files.createTempFile("graft_sqprop_", ".db")
        try {
          SqliteFile.write(db, Seq(SqliteFile.Table(
            "t", s"CREATE TABLE t (${(1 to cols).map("c" + _).mkString(",")})",
            data.iterator.map(_.toSeq))))
          val got = SqliteReader.open(db).table("t").toSeq
          got.length == data.length &&
            got.zip(data).zipWithIndex.forall { case (((rowid, vs), in), i) =>
              rowid == i + 1 && vs.length == in.length &&
                vs.zip(in).forall { case (r, w) => sameValue(w, r) }
            }
        } finally java.nio.file.Files.deleteIfExists(db)
      }
    }

  property("a multi-page table with an interior level round-trips") =
    Prop.forAll(Gen.chooseNum(3000, 9000), Gen.chooseNum(0, 1000)) {
      (n, salt) =>
        val db = java.nio.file.Files.createTempFile("graft_sqbig_", ".db")
        try {
          SqliteFile.write(db, Seq(SqliteFile.Table(
            "b", "CREATE TABLE b (k, pad)",
            (1 to n).iterator.map(i =>
              Seq((i.toLong * 31 + salt), "p" * (i % 97))))))
          var count = 0L
          var ksum = 0L
          SqliteReader.open(db).table("b").foreach { case (_, vs) =>
            count += 1; ksum += vs(0).asInstanceOf[Long]
          }
          count == n && ksum == (1 to n).map(_.toLong * 31 + salt).sum
        } finally java.nio.file.Files.deleteIfExists(db)
    }
}
