package graft.stream

import java.nio.charset.StandardCharsets.UTF_8

/** Read-only SQLite database file parser, from the public file-format spec
  * (https://sqlite.org/fileformat2.html). Just enough surface for the one
  * job it has: the reference engine archives stream state as a vacuumed
  * SQLite file (`state.db.zstd`, /root/reference/leaf-server/src/
  * storage.rs:781-815), whose tables are the module's own `state_init_sql`
  * DDL — restoring a reference bucket means reading that file's tables and
  * rows. A vacuumed database is a clean single-file snapshot: no WAL, no
  * journal, no freelist garbage, which is exactly the subset implemented
  * here. Reads table b-trees (interior + leaf + overflow chains), the
  * record serial-type format, rowid aliasing for INTEGER PRIMARY KEY
  * columns, and column names/types from the schema's CREATE TABLE text.
  *
  * Deliberately rejected with clear errors (never silently misread):
  * non-UTF-8 text encodings, WITHOUT ROWID tables (index b-trees), corrupt
  * page references, and record/DDL column-count overflows.
  */
object SqliteFile {

  /** A column as declared in the table's CREATE TABLE statement. */
  case class Column(name: String, declType: String)

  /** One user table: declared columns and decoded rows. Row values are
    * null | java.lang.Long | java.lang.Double | String | Array[Byte] —
    * SQLite's storage classes. */
  case class Table(name: String, columns: Vector[Column], rows: Vector[Vector[Any]])

  def parse(bytes: Array[Byte]): Vector[Table] = new Parser(bytes).userTables()

  private final class Parser(bytes: Array[Byte]) {
    require(bytes.length >= 100, "not a SQLite file: shorter than the header")
    private val magic = ("SQLite format 3" + 0.toChar).getBytes(UTF_8)
    require(bytes.view.slice(0, 16).sameElements(magic.toSeq),
      "not a SQLite file: bad magic")

    private def u8(off: Int): Int = bytes(off) & 0xff
    private def u16(off: Int): Int = (u8(off) << 8) | u8(off + 1)
    private def u32(off: Int): Long =
      (u8(off).toLong << 24) | (u8(off + 1) << 16) | (u8(off + 2) << 8) | u8(off + 3)

    private val pageSize: Int = u16(16) match {
      case 1 => 65536
      case n =>
        require(n >= 512 && (n & (n - 1)) == 0, s"invalid page size $n")
        n
    }
    private val reserved: Int = u8(20)
    private val usable: Int = pageSize - reserved
    require(usable >= 480, s"usable page size $usable below the spec minimum")
    require(u32(56) == 1, "only UTF-8 text encoding is supported " +
      s"(encoding flag ${u32(56)})")
    private val pageCount: Long = bytes.length.toLong / pageSize

    private def pageStart(page: Long): Int = {
      require(page >= 1 && page <= pageCount,
        s"page $page out of range (file has $pageCount pages)")
      ((page - 1) * pageSize).toInt
    }

    // ---------------- varints & records ----------------

    /** SQLite varint: big-endian base-128, at most 9 bytes (9th byte
      * contributes all 8 bits). Returns (value, bytesRead). */
    private def varint(off: Int): (Long, Int) = {
      var v = 0L; var i = 0
      while (i < 8) {
        val b = u8(off + i)
        if ((b & 0x80) == 0) return (v << 7 | b, i + 1)
        v = v << 7 | (b & 0x7f)
        i += 1
      }
      (v << 8 | u8(off + 8), 9)
    }

    private def serialTypeLen(t: Long): Int = t match {
      case 0 | 8 | 9 => 0
      case 1 => 1
      case 2 => 2
      case 3 => 3
      case 4 => 4
      case 5 => 6
      case 6 | 7 => 8
      case n if n >= 12 => ((n - 12) / 2).toInt
      case other => throw new IllegalArgumentException(
        s"reserved serial type $other")
    }

    private def readBE(b: Array[Byte], off: Int, n: Int): Long = {
      // sign-extend from the first byte
      var v = (b(off).toLong << 56) >> 56
      var i = 1
      while (i < n) { v = (v << 8) | (b(off + i) & 0xff); i += 1 }
      v
    }

    /** Decode one record (the b-tree cell payload format). */
    private def decodeRecord(payload: Array[Byte]): Vector[Any] = {
      var p = 0
      def vint(): Long = {
        var v = 0L; var i = 0
        while (i < 8) {
          require(p < payload.length, "record truncated in header")
          val b = payload(p) & 0xff; p += 1
          if ((b & 0x80) == 0) return v << 7 | b
          v = v << 7 | (b & 0x7f)
          i += 1
        }
        require(p < payload.length, "record truncated in header")
        val last = payload(p) & 0xff; p += 1
        v << 8 | last
      }
      val headerSize = vint()
      require(headerSize >= 1 && headerSize <= payload.length,
        s"record header size $headerSize out of range")
      val types = Vector.newBuilder[Long]
      while (p < headerSize) types += vint()
      var body = headerSize.toInt
      types.result().map { t =>
        val n = serialTypeLen(t)
        require(body + n <= payload.length,
          s"record body truncated (serial type $t needs $n bytes)")
        val v: Any = t match {
          case 0 => null
          case 8 => java.lang.Long.valueOf(0L)
          case 9 => java.lang.Long.valueOf(1L)
          case 7 => java.lang.Double.valueOf(
            java.lang.Double.longBitsToDouble(readBE(payload, body, 8)))
          case i if i >= 1 && i <= 6 => java.lang.Long.valueOf(readBE(payload, body, n))
          case s if s >= 13 && s % 2 == 1 =>
            new String(payload, body, n, UTF_8)
          case b2 if b2 >= 12 =>
            java.util.Arrays.copyOfRange(payload, body, body + n)
        }
        body += n
        v
      }
    }

    // ---------------- b-tree walk ----------------

    /** Collect every (rowid, record) of a table b-tree rooted at `page`. */
    private def walkTable(page: Long): Vector[(Long, Vector[Any])] = {
      val acc = Vector.newBuilder[(Long, Vector[Any])]
      var visited = 0
      def go(pg: Long, depth: Int): Unit = {
        require(depth <= 32, "b-tree deeper than 32 levels — corrupt file")
        visited += 1
        require(visited <= pageCount + 1, "b-tree page cycle — corrupt file")
        val base = pageStart(pg)
        val hdr = if (pg == 1) base + 100 else base
        val tpe = u8(hdr)
        val nCells = u16(hdr + 3)
        val ptrArray = hdr + (if (tpe == 5 || tpe == 2) 12 else 8)
        tpe match {
          case 5 => // interior table page
            var i = 0
            while (i < nCells) {
              val cell = base + u16(ptrArray + 2 * i)
              go(u32(cell), depth + 1) // left child; key varint follows, unused
              i += 1
            }
            go(u32(hdr + 8), depth + 1) // right-most pointer
          case 13 => // leaf table page
            var i = 0
            while (i < nCells) {
              val cell = base + u16(ptrArray + 2 * i)
              val (payloadLen, a) = varint(cell)
              val (rowid, b) = varint(cell + a)
              acc += ((rowid, decodeRecord(
                cellPayload(cell + a + b, payloadLen))))
              i += 1
            }
          case 2 | 10 => throw new IllegalArgumentException(
            "index b-tree where a table was expected — WITHOUT ROWID " +
              "tables are not supported")
          case other => throw new IllegalArgumentException(
            s"unknown b-tree page type $other at page $pg")
        }
      }
      go(page, 0)
      acc.result()
    }

    /** Assemble a table-leaf cell payload, following the overflow chain
      * when the payload spills (threshold formulas from the spec's
      * "B-tree Pages" section; U = usable page size). */
    private def cellPayload(payloadOff: Int, payloadLen: Long): Array[Byte] = {
      require(payloadLen >= 0 && payloadLen <= Int.MaxValue,
        s"cell payload length $payloadLen out of range")
      val total = payloadLen.toInt
      require(total <= bytes.length,
        s"cell payload length $total exceeds the file size")
      val x = usable - 35
      if (total <= x) {
        require(payloadOff + total <= bytes.length, "cell payload truncated")
        java.util.Arrays.copyOfRange(bytes, payloadOff, payloadOff + total)
      } else {
        val m = (usable - 12) * 32 / 255 - 23
        val k = m + (total - m) % (usable - 4)
        val local = if (k <= x) k else m
        val out = new Array[Byte](total)
        require(payloadOff + local + 4 <= bytes.length, "cell payload truncated")
        System.arraycopy(bytes, payloadOff, out, 0, local)
        var written = local
        var next = u32(payloadOff + local)
        var hops = 0L
        while (next != 0) {
          hops += 1
          require(hops <= pageCount, "overflow page cycle — corrupt file")
          val base = pageStart(next)
          val chunk = math.min(usable - 4, total - written)
          require(base + 4 + chunk <= bytes.length, "overflow page truncated")
          System.arraycopy(bytes, base + 4, out, written, chunk)
          written += chunk
          next = if (written < total) u32(base) else 0L
        }
        require(written == total,
          s"overflow chain ended at $written of $total payload bytes")
        out
      }
    }

    // ---------------- schema ----------------

    /** 'Not inside a string literal' sentinel for the DDL scanners below —
      * written with the escape (not a raw NUL byte) so text tooling never
      * classifies this source file as binary. NUL cannot appear in the
      * schema's CREATE TABLE text, which SQLite stores as a UTF-8 string. */
    private val NotInString = '\u0000'

    /** Parse column definitions out of CREATE TABLE text: the segment
      * between the outer parens, split on top-level commas, first
      * (possibly quoted) token of each definition; table-level constraint
      * clauses (PRIMARY/UNIQUE/CHECK/FOREIGN/CONSTRAINT) are skipped.
      * The flag marks the INTEGER PRIMARY KEY column (the rowid alias). */
    private[stream] def columnsOf(sql: String): Vector[(Column, Boolean)] = {
      val open = sql.indexOf('(')
      require(open >= 0, s"CREATE TABLE without a column list: $sql")
      var depth2 = 0; var i = open; var close = -1
      var inStr = NotInString
      while (i < sql.length && close < 0) {
        val c = sql.charAt(i)
        if (inStr != NotInString) { if (c == inStr) inStr = NotInString }
        else c match {
          case '\'' | '"' | '`' => inStr = c
          case '(' => depth2 += 1
          case ')' => depth2 -= 1; if (depth2 == 0) close = i
          case _ =>
        }
        i += 1
      }
      require(close > open, s"unbalanced parens in DDL: $sql")
      val body = sql.substring(open + 1, close)
      // split top-level commas
      val parts = Vector.newBuilder[String]
      var start = 0; var d = 0; inStr = NotInString
      for (j <- 0 until body.length) {
        val c = body.charAt(j)
        if (inStr != NotInString) { if (c == inStr) inStr = NotInString }
        else c match {
          case '\'' | '"' | '`' => inStr = c
          case '(' => d += 1
          case ')' => d -= 1
          case ',' if d == 0 => parts += body.substring(start, j); start = j + 1
          case _ =>
        }
      }
      parts += body.substring(start)
      val constraintKw = Set("PRIMARY", "UNIQUE", "CHECK", "FOREIGN", "CONSTRAINT")
      def leadingIdent(defn: String): (String, String) = defn.charAt(0) match {
        case q @ ('"' | '`' | '\'') =>
          val end = defn.indexOf(q, 1)
          require(end > 0, s"unterminated quoted identifier in: $defn")
          (defn.substring(1, end), defn.substring(end + 1))
        case '[' =>
          val end = defn.indexOf(']', 1)
          require(end > 0, s"unterminated [identifier] in: $defn")
          (defn.substring(1, end), defn.substring(end + 1))
        case _ =>
          val end0 = defn.indexWhere(c => c.isWhitespace || c == '(')
          val end = if (end0 < 0) defn.length else end0
          (defn.substring(0, end), defn.substring(end))
      }
      val entries = parts.result().map(_.trim).filter(_.nonEmpty)
      // a table-level `PRIMARY KEY(x)` / `CONSTRAINT c PRIMARY KEY(x)` on a
      // single INTEGER column ALSO aliases the rowid — such tables store the
      // key as NULL in every record, so missing this form would silently
      // restore the column as all NULLs. Per the spec's quirks list, the
      // table-constraint form aliases for both ASC and DESC; only the
      // COLUMN-level `INTEGER PRIMARY KEY DESC` form is excluded.
      var tablePkCols: Option[Vector[String]] = None
      entries.foreach { defn =>
        val (name, rest0) = leadingIdent(defn)
        val up = name.toUpperCase
        val rest =
          if (up == "CONSTRAINT") {
            val t = rest0.trim
            if (t.isEmpty) "" else leadingIdent(t)._2 // skip the constraint name
          } else rest0
        if ((up == "PRIMARY" || up == "CONSTRAINT") &&
          rest.trim.toUpperCase.startsWith(if (up == "PRIMARY") "KEY" else "PRIMARY")) {
          // the column list is the first balanced (...) group; anything
          // after the close paren (ON CONFLICT REPLACE, ...) is legal
          // SQLite and irrelevant to the alias question
          val inner0 = rest.indexOf('(')
          require(inner0 >= 0,
            s"unrecognized table-level PRIMARY KEY shape: $defn")
          var depth3 = 0; var j = inner0; var innerEnd = -1
          while (j < rest.length && innerEnd < 0) {
            rest.charAt(j) match {
              case '(' => depth3 += 1
              case ')' => depth3 -= 1; if (depth3 == 0) innerEnd = j
              case _ =>
            }
            j += 1
          }
          require(innerEnd > inner0,
            s"unbalanced parens in table-level PRIMARY KEY: $defn")
          val cols = rest.substring(inner0 + 1, innerEnd).split(",")
            .toVector.map(_.trim).filter(_.nonEmpty)
            .map(e => leadingIdent(e)._1) // strips quotes; drops ASC/DESC/COLLATE
          require(cols.nonEmpty,
            s"table-level PRIMARY KEY with no columns: $defn")
          tablePkCols = Some(cols)
        }
      }
      val defs = entries.flatMap { defn =>
        val (name, rest) = leadingIdent(defn)
        if (constraintKw.contains(name.toUpperCase)) None
        else {
          val toks = rest.trim.split("\\s+").toVector.filter(_.nonEmpty)
          val declType = toks.takeWhile(t =>
            !Set("PRIMARY", "NOT", "UNIQUE", "CHECK", "DEFAULT", "REFERENCES",
              "COLLATE", "GENERATED", "AS").contains(t.toUpperCase))
            .mkString(" ").trim
          // the rowid-alias rule applies per COLUMN DEFINITION: declared
          // type INTEGER with a column-level PRIMARY KEY clause. Decided
          // on this definition's own tokens — a raw-SQL substring search
          // would false-match suffix column names ("id" inside
          // "session_id") and miss quoted or oddly-spaced declarations.
          // `INTEGER PRIMARY KEY DESC` is the spec's documented exception:
          // that one spelling does NOT alias the rowid.
          val up = toks.map(_.toUpperCase)
          val isIpk = declType.equalsIgnoreCase("INTEGER") &&
            up.indices.dropRight(1).exists(i =>
              up(i) == "PRIMARY" && up(i + 1) == "KEY" &&
                !up.lift(i + 2).contains("DESC"))
          Some((Column(name, declType), isIpk))
        }
      }
      tablePkCols match {
        case Some(Vector(pk)) if !defs.exists(_._2) =>
          val idx = defs.indexWhere(_._1.name.equalsIgnoreCase(pk))
          require(idx >= 0,
            s"table-level PRIMARY KEY names unknown column '$pk' in: $sql")
          if (defs(idx)._1.declType.equalsIgnoreCase("INTEGER"))
            defs.updated(idx, (defs(idx)._1, true))
          else defs
        case _ => defs
      }
    }

    def userTables(): Vector[Table] = {
      // sqlite_schema: root page 1; columns (type, name, tbl_name, rootpage, sql)
      val schema = walkTable(1L)
      schema.flatMap { case (_, rec) =>
        (rec.lift(0), rec.lift(1), rec.lift(3), rec.lift(4)) match {
          case (Some("table"), Some(name: String), Some(root: java.lang.Long),
              Some(sql: String)) if !name.startsWith("sqlite_") =>
            require(!sql.toUpperCase.contains("WITHOUT ROWID"),
              s"table $name is WITHOUT ROWID — not supported")
            val parsed = columnsOf(sql)
            val cols = parsed.map(_._1)
            val ipk = parsed.indexWhere(_._2)
            // REAL-affinity read conversion: SQLite stores integral float
            // values as INTEGER serial types on disk and converts back on
            // read (the spec's "Type Affinity" optimization) — mirror it,
            // or 1.0 comes back as the Long 1
            val realAffinity: Set[Int] = cols.zipWithIndex.collect {
              case (c, i) if {
                val t = c.declType.toUpperCase
                t.contains("REAL") || t.contains("FLOA") || t.contains("DOUB")
              } => i
            }.toSet
            val rows = walkTable(root.longValue()).map { case (rowid, rec2) =>
              require(rec2.length <= cols.length,
                s"table $name: record has ${rec2.length} values but the DDL " +
                  s"declares ${cols.length} columns — corrupt or mismatched file")
              // ALTER TABLE ADD COLUMN leaves old records short: pad nulls
              val padded0 = rec2 ++ Vector.fill(cols.length - rec2.length)(null)
              val padded = padded0.zipWithIndex.map {
                case (l: java.lang.Long, i) if realAffinity(i) =>
                  java.lang.Double.valueOf(l.doubleValue)
                case (v, _) => v
              }
              // INTEGER PRIMARY KEY is the rowid alias: stored NULL
              if (ipk >= 0 && padded(ipk) == null)
                padded.updated(ipk, java.lang.Long.valueOf(rowid))
              else padded
            }
            Some(Table(name, cols, rows))
          case _ => None
        }
      }
    }
  }
}
