package graft.sources

/** From-scratch SQLite database FILE writer — no sqlite library, just
  * the public file format (sqlite.org/fileformat2: 100-byte header,
  * 4096-byte pages, table b-trees of leaf/interior pages, varint
  * record cells). This closes the one in-engine gap the offline
  * environment previously forced out-of-band: GeoPackage (`.gpkg`)
  * and MBTiles (`.mbtiles`) are SQLite containers, and with this
  * writer the engine emits the CONTAINER itself, not just its rows
  * and geometry BLOBs. Validated independently by Python's stdlib
  * `sqlite3` in SqliteFileSpec (`PRAGMA integrity_check` + full row
  * round-trip).
  *
  * Scale shape: the expensive part — encoding each row into its
  * b-tree cell bytes — is embarrassingly parallel and runs
  * distributed (the caller maps rows to cells wherever it likes);
  * page ASSEMBLY is inherently single-stream (a SQLite file is one
  * page-addressed artifact, same as any single-file sink) and runs
  * on the driver over an iterator of pre-encoded cells. The writer
  * STREAMS: pages are positioned by explicit page number, so each
  * leaf page is written to its file offset the moment it fills
  * (page 1 — header + sqlite_master — is seeked back to last), and
  * the driver holds one in-flight page plus 16 bytes of (pageNo,
  * maxRowid) bookkeeping per completed leaf — driver memory is
  * BOUNDED regardless of row count, never proportional to the
  * table. Capacity (r15): cell payloads of ANY size — payloads over
  * the 4061-byte local maximum spill to standard overflow-page
  * chains (emitted as they're built, still one in-flight page), the
  * size a real planet tile needs — and interior levels stack to
  * whatever DEPTH the leaf count requires (250 children per interior
  * page, unbounded levels), so a table is bounded by the format's
  * 2^31-page file ceiling, not by this writer.
  *
  * Limitations (asserted, documented): no freelist, no indices
  * (SELECT scans work; `WITHOUT ROWID` and index b-trees are out of
  * scope), schema must fit page 1.
  */
object SqliteFile {

  val PageSize = 4096
  private val Usable = PageSize // reserved-space-per-page = 0
  private val MaxLeafPayload = Usable - 35 // X: max fully-local payload
  // M: the spilled cell's local prefix floor (fileformat2 §B-tree
  // Pages: M = ((U-12)*32/255)-23; K = M + (P-M) % (U-4); local = K
  // when K <= X else M) — mirrored bit-for-bit in SqliteReader
  private val MinLeafLocal = ((Usable - 12) * 32) / 255 - 23

  /** One column value: null, Long, Double, String, or Array[Byte]. */
  type Value = Any

  final case class Table(
      name: String,
      createSql: String,
      /** rows in rowid order; rowid = position + 1 */
      rows: Iterator[Seq[Value]])

  // ---- varint + record encoding ------------------------------------------

  /** SQLite variable-length integer (big-endian 7-bit groups). */
  def varint(v0: Long): Array[Byte] = {
    require(v0 >= 0, s"negative varint $v0 unsupported here")
    if (v0 < 0x80) Array(v0.toByte)
    else {
      var v = v0
      val groups = scala.collection.mutable.ArrayBuffer[Byte]()
      while (v != 0) { groups += (v & 0x7f).toByte; v >>>= 7 }
      val out = groups.reverse.toArray
      (0 until out.length - 1).foreach(i => out(i) = (out(i) | 0x80).toByte)
      out
    }
  }

  /** (serialType, dataBytes) for one value. */
  private def serial(v: Value): (Long, Array[Byte]) = v match {
    case null => (0L, Array.emptyByteArray)
    case l: Long =>
      def be(n: Int): Array[Byte] =
        (0 until n).map(i => ((l >> (8 * (n - 1 - i))) & 0xff).toByte).toArray
      if (l >= -128 && l <= 127) (1L, be(1))
      else if (l >= -32768 && l <= 32767) (2L, be(2))
      else if (l >= -8388608 && l <= 8388607) (3L, be(3))
      else if (l >= Int.MinValue && l <= Int.MaxValue) (4L, be(4))
      else if (l >= -140737488355328L && l <= 140737488355327L) (5L, be(6))
      else (6L, be(8))
    case d: Double =>
      val bits = java.lang.Double.doubleToLongBits(d)
      (7L, (0 until 8).map(i =>
        ((bits >> (8 * (7 - i))) & 0xff).toByte).toArray)
    case s: String =>
      val b = s.getBytes("UTF-8")
      (13L + 2L * b.length, b)
    case b: Array[Byte] => (12L + 2L * b.length, b)
    case other => throw new IllegalArgumentException(
      s"unsupported sqlite value ${other.getClass}")
  }

  /** The record format: header (self-inclusive length varint + serial
    * types) then data.
    */
  def record(values: Seq[Value]): Array[Byte] = {
    val enc = values.map(serial)
    val typeBytes = enc.flatMap { case (t, _) => varint(t) }.toArray
    // the header length varint includes itself — iterate to a
    // fixpoint: at the boundary where the extra varint byte pushes
    // hlen across a varint-width threshold (~16382 type bytes) a
    // single adjustment pass would write a wrong header length
    var hlen = 1 + typeBytes.length
    var settled = false
    while (!settled) {
      val next = varint(hlen.toLong).length + typeBytes.length
      settled = next == hlen
      hlen = next
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(varint(hlen.toLong))
    out.write(typeBytes)
    enc.foreach { case (_, d) => out.write(d) }
    out.toByteArray
  }

  /** A fully-local table-leaf cell: payload length, rowid, payload.
    * (Page-1 schema cells use this directly; data cells go through
    * [[leafCellSpilling]], which falls back to this when local.)
    */
  def leafCell(rowid: Long, payload: Array[Byte]): Array[Byte] = {
    require(payload.length <= MaxLeafPayload,
      s"payload ${payload.length} needs overflow pages" +
        " (use leafCellSpilling)")
    val out = new java.io.ByteArrayOutputStream()
    out.write(varint(payload.length.toLong))
    out.write(varint(rowid))
    out.write(payload)
    out.toByteArray
  }

  /** A table-leaf cell for ANY payload size: payloads over the local
    * maximum (U-35 = 4061 bytes) spill to an overflow-page chain —
    * each chain page is [4-byte next-page-number | data] — allocated
    * and emitted through `alloc`/`sink` the moment the cell is built,
    * so the writer stays streaming (one in-flight page) for cells of
    * any size. The local prefix length follows the standard K/M
    * formula, so stock SQLite reads the file.
    */
  private def leafCellSpilling(rowid: Long, payload: Array[Byte],
      alloc: () => Int, sink: (Int, Array[Byte]) => Unit): Array[Byte] = {
    if (payload.length <= MaxLeafPayload) leafCell(rowid, payload)
    else {
      val p = payload.length
      val k = MinLeafLocal + (p - MinLeafLocal) % (Usable - 4)
      val local = if (k <= MaxLeafPayload) k else MinLeafLocal
      val perPage = Usable - 4
      val nPages = (p - local + perPage - 1) / perPage
      val pages = (0 until nPages).map(_ => alloc())
      var off = local
      pages.indices.foreach { i =>
        val page = new Array[Byte](PageSize)
        putInt(page, 0, if (i + 1 < nPages) pages(i + 1) else 0)
        val len = math.min(perPage, p - off)
        System.arraycopy(payload, off, page, 4, len)
        off += len
        sink(pages(i), page)
      }
      val out = new java.io.ByteArrayOutputStream()
      out.write(varint(p.toLong))
      out.write(varint(rowid))
      out.write(payload, 0, local)
      val first = pages.head
      out.write((first >> 24) & 0xff); out.write((first >> 16) & 0xff)
      out.write((first >> 8) & 0xff); out.write(first & 0xff)
      out.toByteArray
    }
  }

  // ---- page building ------------------------------------------------------

  /** Pack (rowid, payload) records into b-tree pages, EMITTING each
    * page through `sink` the moment it is complete — leaves (and any
    * overflow chains their cells spill to) stream out as they fill;
    * only (pageNo, maxRowid) bookkeeping is retained per leaf for the
    * interior levels, which are built bottom-up to WHATEVER DEPTH the
    * leaf count needs (grouping `maxKids` children per interior page
    * until one root remains — 250 keeps every interior page under the
    * 4 KB bound even with 9-byte rowid varints). Returns the root
    * page. `alloc` hands out file page numbers; `maxKids` is
    * parameterized so a spec can force depth ≥ 3 without writing
    * 60k+ real leaves.
    */
  private def buildTableBtree(records: Iterator[(Long, Array[Byte])],
      alloc: () => Int, sink: (Int, Array[Byte]) => Unit,
      maxKids: Int = 250): Int = {
    // leaves: (pageNo, maxRowid) only — the bytes are already on disk
    val leaves = scala.collection.mutable.ArrayBuffer[(Int, Long)]()
    val cur = scala.collection.mutable.ArrayBuffer[(Long, Array[Byte])]()
    var curBytes = 0
    def headerSize = 8
    def flushLeaf(): Unit = if (cur.nonEmpty) {
      val pageNo = alloc()
      sink(pageNo, leafPage(cur.toSeq))
      leaves += ((pageNo, cur.last._1))
      cur.clear(); curBytes = 0
    }
    records.foreach { case (rowid, payload) =>
      val cell = leafCellSpilling(rowid, payload, alloc, sink)
      if (headerSize + curBytes + cell.length + 2 > Usable) flushLeaf()
      cur += ((rowid, cell)); curBytes += cell.length + 2
    }
    flushLeaf()
    if (leaves.isEmpty) {
      val pageNo = alloc()
      sink(pageNo, leafPage(Seq.empty))
      leaves += ((pageNo, 0L))
    }
    // interior levels bottom-up until a single root remains. A tail
    // group of ONE child would make a zero-cell interior page (only a
    // rightmost pointer — malformed per SQLite's integrity_check), so
    // a singleton tail borrows one child from the group before it;
    // maxKids >= 3 guarantees the donor keeps >= 2.
    require(maxKids >= 3, s"maxKids $maxKids < 3")
    var level: Seq[(Int, Long)] = leaves.toSeq
    while (level.length > 1) {
      val gs0 = level.grouped(maxKids).toSeq
      val gs = if (gs0.length > 1 && gs0.last.size == 1)
        gs0.dropRight(2) :+ gs0(gs0.length - 2).init :+
          (gs0(gs0.length - 2).last +: gs0.last)
      else gs0
      level = gs.map { g =>
        val pageNo = alloc()
        sink(pageNo, interiorPage(g.init.toSeq, g.last._1))
        (pageNo, g.last._2)
      }
    }
    level.head._1
  }

  /** Serialize one leaf page (type 0x0D). `offset` shifts the page
    * header (100 for page 1).
    */
  private def leafPage(cells: Seq[(Long, Array[Byte])],
      offset: Int = 0): Array[Byte] = {
    val page = new Array[Byte](PageSize)
    var top = PageSize
    val offs = cells.map { case (_, c) =>
      top -= c.length
      System.arraycopy(c, 0, page, top, c.length)
      top
    }
    val h = offset
    page(h) = 0x0d
    putShort(page, h + 1, 0) // no freeblocks
    putShort(page, h + 3, cells.length)
    putShort(page, h + 5, if (cells.isEmpty) PageSize else top)
    page(h + 7) = 0
    offs.zipWithIndex.foreach { case (o, i) =>
      putShort(page, h + 8 + 2 * i, o)
    }
    require(h + 8 + 2 * cells.length <= top || cells.isEmpty,
      "leaf overflow — packing bug")
    page
  }

  /** Serialize one interior page (type 0x05). */
  private def interiorPage(cells: Seq[(Int, Long)],
      rightmost: Int): Array[Byte] = {
    val page = new Array[Byte](PageSize)
    var top = PageSize
    val offs = cells.map { case (child, key) =>
      val c = new java.io.ByteArrayOutputStream()
      c.write((child >> 24) & 0xff); c.write((child >> 16) & 0xff)
      c.write((child >> 8) & 0xff); c.write(child & 0xff)
      c.write(varint(key))
      val b = c.toByteArray
      top -= b.length
      System.arraycopy(b, 0, page, top, b.length)
      top
    }
    page(0) = 0x05
    putShort(page, 1, 0)
    putShort(page, 3, cells.length)
    putShort(page, 5, if (cells.isEmpty) PageSize else top)
    page(7) = 0
    putInt(page, 8, rightmost)
    offs.zipWithIndex.foreach { case (o, i) => putShort(page, 12 + 2 * i, o) }
    page
  }

  private def putShort(b: Array[Byte], at: Int, v: Int): Unit = {
    b(at) = ((v >> 8) & 0xff).toByte; b(at + 1) = (v & 0xff).toByte
  }
  private def putInt(b: Array[Byte], at: Int, v: Int): Unit = {
    b(at) = ((v >> 24) & 0xff).toByte; b(at + 1) = ((v >> 16) & 0xff).toByte
    b(at + 2) = ((v >> 8) & 0xff).toByte; b(at + 3) = (v & 0xff).toByte
  }

  // ---- whole-file assembly ------------------------------------------------

  /** Write `tables` into a single SQLite database file, streaming:
    * each b-tree page goes to its file offset the moment it is built
    * (rows are consumed strictly once, lazily), and page 1 — whose
    * header needs the final page count — is seeked back to at the
    * end. Returns the per-table (name, rootPage, nRows).
    */
  def write(path: java.nio.file.Path, tables: Seq[Table],
      applicationId: Int = 0, userVersion: Int = 0,
      maxKids: Int = 250)
      : Seq[(String, Int, Long)] = {
    val raf = new java.io.RandomAccessFile(path.toFile, "rw")
    val built = try {
      raf.setLength(0)
      def sink(pageNo: Int, bytes: Array[Byte]): Unit = {
        raf.seek((pageNo - 1).toLong * PageSize)
        raf.write(bytes)
      }
      // 1. stream every table's b-tree out; page 1 is the schema, so
      //    content starts at page 2
      var nextPage = 2
      def alloc(): Int = { val p = nextPage; nextPage += 1; p }
      val built = tables.map { t =>
        var n = 0L
        val recs = t.rows.map { r =>
          n += 1
          (n, record(r))
        }
        val root = buildTableBtree(recs, alloc, sink, maxKids)
        (t, root, n)
      }
      // 2. sqlite_master on page 1
      val masterCells = built.zipWithIndex.map { case ((t, root, _), i) =>
        val rec = record(
          Seq("table", t.name, t.name, root.toLong, t.createSql))
        ((i + 1).toLong, leafCell((i + 1).toLong, rec))
      }
      val page1 = leafPage(masterCells, offset = 100)
      require(100 + 8 + 2 * masterCells.length <=
        PageSize - masterCells.map(_._2.length).sum,
        "schema does not fit page 1 (unsupported)")
      val totalPages = nextPage - 1

      // 3. 100-byte header into page 1, seeked back and written last
      val hdr = java.nio.ByteBuffer.allocate(100)
      hdr.put(("SQLite format 3" + "\u0000").getBytes("ISO-8859-1"))
      hdr.putShort(PageSize.toShort) // 16
      hdr.put(1.toByte).put(1.toByte) // file format write/read version
      hdr.put(0.toByte) // reserved per page
      hdr.put(64.toByte).put(32.toByte).put(32.toByte) // payload fractions
      hdr.putInt(1) // change counter
      hdr.putInt(totalPages) // 28
      hdr.putInt(0).putInt(0) // freelist head + count
      hdr.putInt(1) // schema cookie
      hdr.putInt(1) // schema format 1 (most compatible)
      hdr.putInt(0) // default page cache
      hdr.putInt(0) // largest root (no vacuum)
      hdr.putInt(1) // UTF-8
      hdr.putInt(userVersion) // 60
      hdr.putInt(0) // incremental vacuum
      hdr.putInt(applicationId) // 68
      hdr.put(new Array[Byte](20)) // reserved
      hdr.putInt(1) // version-valid-for
      hdr.putInt(3040000) // sqlite version number
      System.arraycopy(hdr.array(), 0, page1, 0, 100)
      sink(1, page1)
      built
    } finally raf.close()
    built.map { case (t, root, n) => (t.name, root, n) }
  }
}
