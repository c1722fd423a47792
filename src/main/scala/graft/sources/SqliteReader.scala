package graft.sources

/** Minimal from-scratch SQLite database FILE reader — the inverse of
  * [[SqliteFile]], used to put the written container BYTES under the
  * driver's oracle gate: `q_gpkg_sqlite` / `q_mbtiles_file` parse
  * their own output file back and emit rollups computed from the
  * parsed rows, which the DuckDB oracle predicts relationally — so a
  * page-layout or record-encoding regression flips the hash, not just
  * a ScalaTest assertion.
  *
  * Supports what the engine writes (and asserts on anything else):
  * table b-trees (leaf 0x0D / interior 0x05) at any depth, varint
  * records, overflow-page chains (the standard K/M local split),
  * UTF-8 text. Reads any page size.
  *
  * Two access modes: [[open]] reads the whole file into memory (the
  * driver-side oracle gates, small containers); [[openMapped]]
  * memory-maps it so an EXECUTOR task walking one b-tree subtree
  * faults in only the pages it touches — the access mode behind the
  * distributed `{z}/{x}/{y}.pbf` extraction (MvtTiles.extractTiles),
  * where T parallel tasks each walk one child subtree and a full
  * per-task file read would be T× the container size in wasted I/O.
  * (Int offsets cap a mapped container at 2 GB — far above the
  * writer's own ~470 MB/table two-level b-tree bound.)
  */
object SqliteReader {

  /** Random-access byte source: a heap array or a mapped region. */
  sealed trait Bytes {
    def apply(i: Int): Byte
    def length: Int
    def utf8(at: Int, len: Int): String
    def slice(at: Int, len: Int): Array[Byte]
  }

  private final class ArrayBytes(a: Array[Byte]) extends Bytes {
    def apply(i: Int): Byte = a(i)
    def length: Int = a.length
    def utf8(at: Int, len: Int): String = new String(a, at, len, "UTF-8")
    def slice(at: Int, len: Int): Array[Byte] =
      java.util.Arrays.copyOfRange(a, at, at + len)
  }

  private final class MappedBytes(buf: java.nio.ByteBuffer) extends Bytes {
    def apply(i: Int): Byte = buf.get(i)
    def length: Int = buf.limit()
    def utf8(at: Int, len: Int): String =
      new String(slice(at, len), "UTF-8")
    def slice(at: Int, len: Int): Array[Byte] = {
      val out = new Array[Byte](len)
      buf.get(at, out)
      out
    }
  }

  /** (varint value, bytes consumed). */
  private def varint(b: Bytes, at: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    while (i < 8) {
      val x = b(at + i) & 0xff
      v = (v << 7) | (x & 0x7f)
      if ((x & 0x80) == 0) return (v, i + 1)
      i += 1
    }
    ((v << 8) | (b(at + 8) & 0xff), 9)
  }

  private def u16(b: Bytes, at: Int): Int =
    ((b(at) & 0xff) << 8) | (b(at + 1) & 0xff)
  private def u32(b: Bytes, at: Int): Int =
    ((b(at) & 0xff) << 24) | ((b(at + 1) & 0xff) << 16) |
      ((b(at + 2) & 0xff) << 8) | (b(at + 3) & 0xff)

  final class Db(bytes: Bytes) {
    require(bytes.length >= 100 &&
      bytes.utf8(0, 15) == "SQLite format 3",
      "not a sqlite database")
    val pageSize: Int = {
      val raw = u16(bytes, 16)
      if (raw == 1) 65536 else raw
    }

    private def page(n: Int): Int = (n - 1) * pageSize

    /** Decode one record payload into column values. */
    private def record(b: Bytes, at: Int): Seq[Any] = {
      val (hlen, hc) = varint(b, at)
      var tp = at + hc
      val types = scala.collection.mutable.ArrayBuffer[Long]()
      while (tp < at + hlen) {
        val (t, c) = varint(b, tp); types += t; tp += c
      }
      var dp = at + hlen.toInt
      types.map { t =>
        def be(n: Int): Long = {
          var v = if ((b(dp) & 0x80) != 0) -1L else 0L
          (0 until n).foreach(i => v = (v << 8) | (b(dp + i) & 0xff))
          dp += n; v
        }
        t match {
          case 0 => null
          case 1 => be(1)
          case 2 => be(2)
          case 3 => be(3)
          case 4 => be(4)
          case 5 => be(6)
          case 6 => be(8)
          case 7 => java.lang.Double.longBitsToDouble(be(8))
          case 8 => 0L
          case 9 => 1L
          case n if n >= 13 && n % 2 == 1 =>
            val len = ((n - 13) / 2).toInt
            val s = b.utf8(dp, len); dp += len; s
          case n if n >= 12 && n % 2 == 0 =>
            val len = ((n - 12) / 2).toInt
            val o = b.slice(dp, len); dp += len; o
          case other =>
            throw new IllegalArgumentException(s"serial type $other")
        }
      }.toSeq
    }

    /** Max fully-local leaf payload (X) and the spilled local floor
      * (M) — the standard K/M split, mirroring SqliteFile's writer.
      */
    private def maxLocal: Int = pageSize - 35
    private def minLocal: Int = ((pageSize - 12) * 32) / 255 - 23

    /** Reassemble a spilled payload: local prefix + overflow chain
      * ([4-byte next | data] pages).
      */
    private def assembleOverflow(cellOff: Int, plen: Int): Array[Byte] = {
      val k = minLocal + (plen - minLocal) % (pageSize - 4)
      val local = if (k <= maxLocal) k else minLocal
      val out = new Array[Byte](plen)
      System.arraycopy(bytes.slice(cellOff, local), 0, out, 0, local)
      var next = u32(bytes, cellOff + local)
      var off = local
      while (next != 0) {
        val base = page(next)
        val len = math.min(pageSize - 4, plen - off)
        System.arraycopy(bytes.slice(base + 4, len), 0, out, off, len)
        off += len
        next = u32(bytes, base)
      }
      require(off == plen,
        s"overflow chain ended at $off of $plen payload bytes")
      out
    }

    /** In-order walk of a table b-tree: (rowid, values). */
    def walk(rootPage: Int): Iterator[(Long, Seq[Any])] = {
      val base = page(rootPage)
      val h = if (rootPage == 1) base + 100 else base
      bytes(h) & 0xff match {
        case 0x0d =>
          val n = u16(bytes, h + 3)
          (0 until n).iterator.map { i =>
            val off = base + u16(bytes, h + 8 + 2 * i)
            val (plen, c1) = varint(bytes, off)
            val (rowid, c2) = varint(bytes, off + c1)
            if (plen <= maxLocal)
              (rowid, record(bytes, off + c1 + c2))
            else {
              val full = assembleOverflow(off + c1 + c2, plen.toInt)
              (rowid, record(new ArrayBytes(full), 0))
            }
          }
        case 0x05 =>
          val n = u16(bytes, h + 3)
          val kids = (0 until n).map { i =>
            u32(bytes, base + u16(bytes, h + 12 + 2 * i))
          } :+ u32(bytes, h + 8)
          kids.iterator.flatMap(walk)
        case other =>
          throw new IllegalArgumentException(
            f"page $rootPage: unsupported b-tree type 0x$other%02x")
      }
    }

    /** sqlite_master rows: (type, name, rootpage). */
    def master: Seq[(String, String, Int)] =
      walk(1).map { case (_, v) =>
        (v(0).asInstanceOf[String], v(1).asInstanceOf[String],
          v(3).asInstanceOf[Long].toInt)
      }.toSeq

    private def rootOf(name: String): Int =
      master.find(m => m._1 == "table" && m._2 == name) match {
        case Some((_, _, root)) => root
        case None => throw new NoSuchElementException(s"table $name")
      }

    /** All (rowid, values) of a named table. */
    def table(name: String): Iterator[(Long, Seq[Any])] =
      walk(rootOf(name))

    /** Independent b-tree subtrees jointly covering a table, in rowid
      * order: the root's child pages when the root is interior, else
      * the root itself. The parallel-extraction planner hands each
      * subtree to one executor task (`walk` of distinct subtrees
      * touches disjoint pages).
      */
    def subtreeRoots(name: String): Seq[Int] = {
      val root = rootOf(name)
      val base = page(root)
      val h = if (root == 1) base + 100 else base
      bytes(h) & 0xff match {
        case 0x05 =>
          val n = u16(bytes, h + 3)
          (0 until n).map { i =>
            u32(bytes, base + u16(bytes, h + 12 + 2 * i))
          } :+ u32(bytes, h + 8)
        case _ => Seq(root)
      }
    }
  }

  /** Whole-file in-memory open — driver-side gates, small containers. */
  def open(path: java.nio.file.Path): Db =
    new Db(new ArrayBytes(java.nio.file.Files.readAllBytes(path)))

  /** Memory-mapped open: pages fault in on first touch, so a task
    * walking one subtree reads only that subtree's pages. Used from
    * executor tasks (the mapping is per-open; no shared state).
    */
  def openMapped(path: java.nio.file.Path): Db = {
    val ch = java.nio.channels.FileChannel.open(path,
      java.nio.file.StandardOpenOption.READ)
    try {
      val size = ch.size()
      require(size <= Int.MaxValue, s"container over 2 GB: $size")
      new Db(new MappedBytes(ch.map(
        java.nio.channels.FileChannel.MapMode.READ_ONLY, 0, size)))
    } finally ch.close()
  }
}
