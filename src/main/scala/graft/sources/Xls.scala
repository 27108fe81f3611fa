package graft.sources

/** Legacy Excel scan (the BIFF8 half of S4): the reference ingests
  * workbooks through pandas `read_excel`
  * (`/root/reference/utils/gsheets_utils.py:177-181`), which accepts
  * BOTH the 2007+ zip/XML format ([[Xlsx]]) and the 97-2003 binary
  * `.xls` — partner exports from older systems still arrive as the
  * latter routinely. No xls library ships in this environment, so this
  * is a minimal self-contained reader for the two PUBLIC formats that
  * compose a `.xls` file ([MS-CFB] and [MS-XLS], both openly
  * specified):
  *
  *   1. the OLE2 / Compound File Binary container — 512-byte header,
  *      FAT-chained 512-byte sectors, a directory of streams, and a
  *      mini-FAT of 64-byte mini-sectors for streams smaller than
  *      4096 bytes (small workbooks live THERE, so both chains are
  *      implemented, not just the big-file path);
  *   2. the BIFF8 record stream named `Workbook` (or `Book`):
  *      `[opcode u16][length u16][payload]` records — BoundSheet8
  *      locates the first worksheet substream, the globals' SST holds
  *      the shared strings (with CONTINUE-record splits mid-string,
  *      the format's hairiest corner), and the sheet substream's cell
  *      records (LabelSst, Number, RK, MulRk, Label, BoolErr, Formula
  *      + String) carry the values.
  *
  * Fidelity contract — IDENTICAL to [[Xlsx]] (and to `spark.read.csv`
  * without inferSchema): every cell surfaces as a string and
  * downstream casts pick types. Numbers render via [[numStr]]
  * (integral doubles without the trailing `.0`, matching the xlsx
  * writer's serialization), booleans as 0/1, dates as Excel serial
  * numbers. The header row of the first file names the columns.
  *
  * Distribution shape: same as [[Xlsx]] — files arrive through the
  * `binaryFile` source and parse where their bytes land (per-file
  * parallelism; a single sheet is driver-bounded by the format's own
  * 64k-row cap, far below any splitting threshold).
  */
object Xls {

  /** `[MS-CFB]` magic. */
  private val CfbMagic =
    Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)

  private[graft] def isCfb(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && CfbMagic.indices.forall(i => bytes(i) == CfbMagic(i))

  // ── little-endian primitive readers ────────────────────────────────
  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def f64(b: Array[Byte], o: Int): Double = {
    var bits = 0L
    var i = 7
    while (i >= 0) { bits = (bits << 8) | (b(o + i) & 0xffL); i -= 1 }
    java.lang.Double.longBitsToDouble(bits)
  }

  private val EndOfChain = 0xFFFFFFFE
  private val FreeSect = 0xFFFFFFFF

  /** Extract a named stream from a CFB container: walk the (possibly
    * multi-sector, DIFAT-extended) FAT, read the directory, and follow
    * either the normal 512-byte chain or — for streams under the mini
    * cutoff — the 64-byte mini-sector chain inside the root entry's
    * mini stream.
    */
  private def cfbStream(bytes: Array[Byte],
      names: Set[String]): Array[Byte] = {
    require(isCfb(bytes), "not an OLE2/CFB container")
    // [MS-CFB] 2.2: sector shift MUST be 9 (v3) or 12 (v4), mini shift
    // MUST be 6 — validated up front so a corrupted shift can't drive
    // the FAT walk into gigabyte allocations (1 << arbitrary u16)
    val sectorShift = u16(bytes, 30)
    require(sectorShift == 9 || sectorShift == 12,
      s"CFB: invalid sector shift $sectorShift (must be 9 or 12)")
    val miniShift = u16(bytes, 32)
    require(miniShift == 6, s"CFB: invalid mini sector shift $miniShift")
    val sectorSize = 1 << sectorShift   // 512 for v3 (the .xls case)
    val miniSize = 1 << miniShift       // 64
    val nFat = i32(bytes, 44)
    val dirStart = i32(bytes, 48)
    val miniCutoff = i32(bytes, 56)      // 4096
    val miniFatStart = i32(bytes, 60)
    val nDifat = i32(bytes, 72)
    // the header occupies one full sector, so sector N starts at
    // (N + 1) * sectorSize — correct for both v3 (512) and v4 (4096)
    def sector(id: Int): Array[Byte] =
      bytes.slice((id + 1) * sectorSize, (id + 2) * sectorSize)
    // FAT sector list: 109 header slots + DIFAT chain sectors
    val fatSectors = {
      val b = Vector.newBuilder[Int]
      var i = 0
      while (i < 109) {
        val v = i32(bytes, 76 + i * 4)
        if (v != FreeSect && v != EndOfChain) b += v
        i += 1
      }
      var difat = i32(bytes, 68)
      var guard = 0
      // bound the walk by the file's own sector count as well as the
      // declared nDifat: a corrupted nDifat plus a cyclic DIFAT pointer
      // must terminate, not spin
      val maxDifat = math.min(nDifat.toLong,
        bytes.length.toLong / sectorSize + 1)
      while (difat != EndOfChain && difat != FreeSect && guard <= maxDifat) {
        val s = sector(difat)
        var j = 0
        while (j < sectorSize / 4 - 1) {
          val v = i32(s, j * 4)
          if (v != FreeSect && v != EndOfChain) b += v
          j += 1
        }
        difat = i32(s, sectorSize - 4)
        guard += 1
      }
      b.result().take(nFat)
    }
    val fat: Array[Int] = fatSectors.toArray.flatMap { sid =>
      val s = sector(sid)
      Array.tabulate(sectorSize / 4)(j => i32(s, j * 4))
    }
    def chain(start: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var cur = start
      var guard = 0
      while (cur != EndOfChain && cur != FreeSect && guard < fat.length + 2) {
        out.write(sector(cur))
        cur = fat(cur)
        guard += 1
      }
      out.toByteArray
    }
    val dir = chain(dirStart)
    // 128-byte directory entries: UTF-16 name (len at +64), type at
    // +66 (2 = stream, 5 = root), start sector +116, size +120
    case class Entry(name: String, typ: Int, start: Int, size: Long)
    val entries = (0 until dir.length / 128).map { i =>
      val o = i * 128
      val nameLen = u16(dir, o + 64) // bytes incl terminator
      val name = new String(dir.slice(o, o + math.max(0, nameLen - 2)),
        java.nio.charset.StandardCharsets.UTF_16LE)
      Entry(name, dir(o + 66) & 0xff, i32(dir, o + 116),
        i32(dir, o + 120) & 0xFFFFFFFFL)
    }
    val root = entries.find(_.typ == 5).getOrElse(
      throw new IllegalArgumentException("CFB: no root directory entry"))
    val want = entries.find(e => e.typ == 2 && names.contains(e.name))
      .getOrElse(throw new IllegalArgumentException(
        s"CFB: no ${names.mkString("/")} stream — not an Excel workbook"))
    if (want.size >= miniCutoff)
      chain(want.start).take(want.size.toInt)
    else {
      // mini stream: root entry's chain holds the mini sectors;
      // mini-FAT (its own normal chain) links them 64 bytes at a time
      val miniStream = chain(root.start)
      val miniFat = {
        val raw = chain(miniFatStart)
        Array.tabulate(raw.length / 4)(j => i32(raw, j * 4))
      }
      val out = new java.io.ByteArrayOutputStream()
      var cur = want.start
      var guard = 0
      while (cur != EndOfChain && cur != FreeSect &&
          guard < miniFat.length + 2) {
        out.write(miniStream.slice(cur * miniSize, (cur + 1) * miniSize))
        cur = miniFat(cur)
        guard += 1
      }
      out.toByteArray.take(want.size.toInt)
    }
  }

  // ── BIFF8 record opcodes ───────────────────────────────────────────
  private val BOF = 0x809
  private val EOF = 0x0A
  private val BOUNDSHEET = 0x85
  private val SST = 0xFC
  private val CONTINUE = 0x3C
  private val LABELSST = 0xFD
  private val LABEL = 0x204
  private val NUMBER = 0x203
  private val RK = 0x27E
  private val MULRK = 0xBD
  private val BOOLERR = 0x205
  private val FORMULA = 0x06
  private val STRING = 0x207

  /** One raw record (opcode, payload offset, payload length). */
  private final case class Rec(op: Int, off: Int, len: Int)

  private def records(s: Array[Byte]): Vector[Rec] = {
    val b = Vector.newBuilder[Rec]
    var o = 0
    while (o + 4 <= s.length) {
      val op = u16(s, o)
      val len = u16(s, o + 2)
      if (op == 0) o = s.length // zero padding after the last EOF
      else { b += Rec(op, o + 4, len); o += 4 + len }
    }
    b.result()
  }

  /** Render a cached BIFF double exactly like the xlsx writer
    * serializes numbers: integral values without the `.0`.
    */
  private def numStr(d: Double): String =
    if (d.isWhole && math.abs(d) < 1e15) d.toLong.toString else d.toString

  /** Decode one CONTIGUOUS XLUnicodeString/RichExtendedString at
    * offset `o` (used by Label and STRING records, whose payloads
    * never split): 16-bit length, a grbit whose bit 0 selects
    * compressed-Latin-1 vs UTF-16LE characters and whose bits 2/3
    * declare skippable rich/ext blocks. SST strings — which CAN split
    * across CONTINUE records — go through [[parseSst]]'s fragment
    * cursor instead.
    */
  private def readShortString(b: Array[Byte], o: Int): (String, Int) = {
    // 16-bit length + grbit + optional rich/ext headers + chars
    val cch = u16(b, o)
    val grbit = b(o + 2) & 0xff
    var p = o + 3
    val richCount = if ((grbit & 0x08) != 0) { val c = u16(b, p); p += 2; c }
      else 0
    val extSize = if ((grbit & 0x04) != 0) { val c = i32(b, p); p += 4; c }
      else 0
    val (s, np) =
      if ((grbit & 0x01) != 0) {
        (new String(b.slice(p, p + cch * 2),
          java.nio.charset.StandardCharsets.UTF_16LE), p + cch * 2)
      } else {
        (new String(b.slice(p, p + cch),
          java.nio.charset.StandardCharsets.ISO_8859_1), p + cch)
      }
    (s, np + richCount * 4 + extSize)
  }

  /** Parse the SST record plus its CONTINUE records into the shared
    * string table. A string may SPLIT across a record boundary; the
    * continuation re-states a 1-byte grbit for the remaining
    * characters (a string compressed in one fragment may continue
    * uncompressed in the next — the format's trap). Parsed with an
    * explicit cursor over the fragment list rather than a naive
    * concatenation for exactly that reason.
    */
  private def parseSst(stream: Array[Byte], recs: Vector[Rec],
      at: Int): Vector[String] = {
    val frags = {
      val b = Vector.newBuilder[(Int, Int)] // (off, len) in stream
      b += ((recs(at).off, recs(at).len))
      var i = at + 1
      while (i < recs.length && recs(i).op == CONTINUE) {
        b += ((recs(i).off, recs(i).len))
        i += 1
      }
      b.result()
    }
    val out = Vector.newBuilder[String]
    val cstUnique = i32(stream, frags.head._1 + 4)
    var frag = 0
    var pos = frags.head._1 + 8 // past cst/cstUnique
    def fragEnd = frags(frag)._1 + frags(frag)._2
    def ensure(): Unit = // hop to the next fragment when exhausted
      while (pos >= fragEnd && frag < frags.length - 1) {
        frag += 1; pos = frags(frag)._1
      }
    def readBytes(n: Int): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      var left = n
      while (left > 0) {
        ensure()
        val take = math.min(left, fragEnd - pos)
        if (take == 0) // past the last fragment with bytes still owed
          throw new IllegalArgumentException("SST: truncated record")
        o.write(stream, pos, take)
        pos += take; left -= take
      }
      o.toByteArray
    }
    var k = 0
    while (k < cstUnique) {
      ensure()
      val cch = u16(readBytes(2), 0)
      val grbit0 = readBytes(1)(0) & 0xff
      val richCount = if ((grbit0 & 0x08) != 0) u16(readBytes(2), 0) else 0
      val extSize = if ((grbit0 & 0x04) != 0) i32(readBytes(4), 0) else 0
      val sb = new StringBuilder
      var left = cch
      var high = (grbit0 & 0x01) != 0
      while (left > 0) {
        ensure()
        if (pos >= fragEnd) // ran off the table: malformed input
          throw new IllegalArgumentException("SST: truncated string")
        // a split mid-string re-states the grbit at the fragment start
        if (pos == frags(frag)._1 && sb.length + (cch - left) > 0 &&
            left == cch - sb.length) {
          // only when the CHARACTER RUN continues into this fragment:
          // the first byte is the new grbit
          high = (stream(pos) & 0x01) != 0
          pos += 1
        }
        val avail = fragEnd - pos
        val take = if (high) math.min(left, avail / 2) else
          math.min(left, avail)
        // a UTF-16 run must split on an even byte boundary; take == 0
        // with characters still owed means a malformed (or hostile)
        // file — fail instead of spinning
        if (take == 0)
          throw new IllegalArgumentException(
            "SST: character run split on odd byte boundary")
        if (high) {
          sb.append(new String(stream.slice(pos, pos + take * 2),
            java.nio.charset.StandardCharsets.UTF_16LE))
          pos += take * 2
        } else {
          sb.append(new String(stream.slice(pos, pos + take),
            java.nio.charset.StandardCharsets.ISO_8859_1))
          pos += take
        }
        left -= take
      }
      readBytes(richCount * 4 + extSize) // skip formatting runs
      out += sb.toString
      k += 1
    }
    out.result()
  }

  /** Decode an RK value: 30-bit payload, bit0 = ×1/100, bit1 = int. */
  private def rkValue(v: Int): Double = {
    val base =
      if ((v & 0x02) != 0) (v >> 2).toDouble
      else java.lang.Double.longBitsToDouble((v & 0xFFFFFFFCL) << 32)
    if ((v & 0x01) != 0) base / 100.0 else base
  }

  /** The full `.xls` parse: CFB → Workbook stream → SST + first
    * BoundSheet8 substream → padded rows of string cells (null for
    * gaps) — the same shape [[Xlsx.parse]] returns, so [[Xlsx.read]]
    * treats both formats identically.
    */
  private[graft] def parse(bytes: Array[Byte]): Vector[Vector[String]] =
    // untrusted-input contract (FuzzSpec pins it): every malformed
    // input fails as IllegalArgumentException — a structural violation
    // the record readers surface as an out-of-bounds read is the
    // input's fault, not a crash class callers should have to know
    try parseUnsafe(bytes)
    catch {
      case e: IllegalArgumentException => throw e
      case e @ (_: IndexOutOfBoundsException |
                _: NegativeArraySizeException |
                _: UnsupportedOperationException |
                _: NoSuchElementException) =>
        throw new IllegalArgumentException(s"malformed .xls: $e", e)
    }

  private def parseUnsafe(bytes: Array[Byte]): Vector[Vector[String]] = {
    val s = cfbStream(bytes, Set("Workbook", "Book"))
    val recs = records(s)
    require(recs.nonEmpty && recs.head.op == BOF,
      "not a BIFF stream: missing BOF")
    // shared strings (globals substream)
    val sstAt = recs.indexWhere(_.op == SST)
    val sst =
      if (sstAt < 0) Vector.empty[String] else parseSst(s, recs, sstAt)
    // first sheet's substream offset (BoundSheet8.lbPlyPos)
    val sheetOff = recs.find(_.op == BOUNDSHEET)
      .map(r => i32(s, r.off))
      .getOrElse(throw new IllegalArgumentException(
        "BIFF: no BoundSheet record"))
    val sheetRecs = {
      val all = records(s.drop(sheetOff))
        .map(r => Rec(r.op, r.off + sheetOff, r.len))
      val eof = all.indexWhere(_.op == EOF)
      if (eof < 0) all else all.take(eof)
    }
    val cells = scala.collection.mutable.Map.empty[(Int, Int), String]
    var i = 0
    while (i < sheetRecs.length) {
      val r = sheetRecs(i)
      r.op match {
        case LABELSST =>
          val idx = i32(s, r.off + 6)
          cells((u16(s, r.off), u16(s, r.off + 2))) =
            sst.lift(idx).getOrElse("")
        case LABEL => // BIFF8 inline string cell
          val (v, _) = readShortString(s, r.off + 6)
          cells((u16(s, r.off), u16(s, r.off + 2))) = v
        case NUMBER =>
          cells((u16(s, r.off), u16(s, r.off + 2))) =
            numStr(f64(s, r.off + 6))
        case RK =>
          cells((u16(s, r.off), u16(s, r.off + 2))) =
            numStr(rkValue(i32(s, r.off + 6)))
        case MULRK =>
          val row = u16(s, r.off)
          val colFirst = u16(s, r.off + 2)
          val n = (r.len - 6) / 6
          var j = 0
          while (j < n) {
            cells((row, colFirst + j)) =
              numStr(rkValue(i32(s, r.off + 4 + j * 6 + 2)))
            j += 1
          }
        case BOOLERR =>
          val isErr = (s(r.off + 7) & 0xff) != 0
          cells((u16(s, r.off), u16(s, r.off + 2))) =
            if (isErr) null else String.valueOf(s(r.off + 6) & 0xff)
        case FORMULA =>
          val row = u16(s, r.off)
          val c = u16(s, r.off + 2)
          // cached result: doubles directly; the 0xFFFF-tagged variants
          // mean string (value follows in a STRING record) / bool / err
          if (u16(s, r.off + 12) == 0xFFFF) {
            (s(r.off + 6) & 0xff) match {
              case 0 => // string: next STRING record carries it
                sheetRecs.drop(i + 1).find(x =>
                    x.op == STRING || x.op == CONTINUE)
                  .filter(_.op == STRING)
                  .foreach(sr =>
                    cells((row, c)) = readShortString(s, sr.off)._1)
              case 1 => cells((row, c)) =
                String.valueOf(s(r.off + 8) & 0xff)
              case _ => cells((row, c)) = null // error result
            }
          } else cells((row, c)) = numStr(f64(s, r.off + 6))
        case _ => // dimensions/format/etc — irrelevant to values
      }
      i += 1
    }
    if (cells.isEmpty) Vector.empty
    else {
      val maxRow = cells.keys.map(_._1).max
      val width = cells.keys.map(_._2).max + 1
      // BIFF8 caps sheets at 65536 rows × 256 columns; the row index is
      // u16-bounded by construction, so only the column needs a guard
      // (MulRk's colFirst + run length can exceed it in a corrupted
      // file, turning the dense grid below into a multi-GB allocation)
      require(width <= 256,
        s"BIFF8: column index ${width - 1} out of range (max 255)")
      Vector.tabulate(maxRow + 1)(r =>
        Vector.tabulate(width)(c => cells.getOrElse((r, c), null)))
    }
  }
}
