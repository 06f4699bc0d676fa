package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.stream.SqliteFile

/** [[SqliteFile]] against a file written by REAL SQLite (3.40.1, vacuumed —
  * the exact producer shape of the reference's `state.db.zstd`,
  * storage.rs:796-804). The fixture carries: multi-page table b-trees, an
  * overflow chain (5000-byte text on 4096-byte pages), NULLs, negative
  * integers, blobs, an INTEGER PRIMARY KEY rowid alias, and an
  * auto-assigned rowid. */
class SqliteFileSpec extends AnyFunSuite {

  private lazy val fixture: Array[Byte] = {
    val in = getClass.getResourceAsStream("/state_fixture.db")
    require(in != null, "state_fixture.db test resource missing")
    try in.readAllBytes() finally in.close()
  }

  test("parses a real SQLite file: schema, types, rows") {
    val tables = SqliteFile.parse(fixture).sortBy(_.name)
    assert(tables.map(_.name) == Vector("state_counts", "state_sessions"))

    val counts = tables(0)
    assert(counts.columns.map(_.name) == Vector("k", "n", "avg"))
    assert(counts.columns.map(_.declType.toUpperCase) ==
      Vector("TEXT", "INTEGER", "REAL"))
    assert(counts.rows.length == 301)
    // spot-check decoded values (writer inserted k=f"key_%04d", n=i*7, avg=i/3)
    val byK = counts.rows.collect {
      case Vector(k: String, n: java.lang.Long, avg: java.lang.Double) =>
        k -> ((n.longValue, avg.doubleValue))
    }.toMap
    assert(byK("key_0000") == ((0L, 0.0)))
    assert(byK("key_0123") == ((123L * 7, 123 / 3.0)))
    assert(byK("key_0299") == ((299L * 7, 299 / 3.0)))
    // the NULL/negative row
    val nullRow = counts.rows.find(_(0) == null).get
    assert(nullRow(1) == java.lang.Long.valueOf(-42L) && nullRow(2) == null)
  }

  test("rowid aliasing, blobs, and the overflow chain") {
    val sessions = SqliteFile.parse(fixture).find(_.name == "state_sessions").get
    assert(sessions.columns.map(_.name) == Vector("sid", "who", "blob_v", "note"))
    val bySid = sessions.rows.map(r => r(0).asInstanceOf[java.lang.Long].longValue -> r).toMap
    // explicit INTEGER PRIMARY KEY values come back through the rowid alias
    assert(bySid.keySet == Set(7L, 9001L, 9002L))
    assert(bySid(7L)(1) == "alice")
    assert(bySid(7L)(2).asInstanceOf[Array[Byte]].toSeq == Seq[Byte](1, 2, 3, 4, 5))
    // the 5000-char note spilled to an overflow chain; must reassemble whole
    assert(bySid(9001L)(3).asInstanceOf[String] == "x" * 5000)
    assert(bySid(9001L)(2) == null)
    // auto-assigned rowid lands after the explicit 9001
    assert(bySid(9002L)(1) == "carol" && bySid(9002L)(3) == "auto-rowid")
  }

  private lazy val tricky: Array[Byte] = {
    val in = getClass.getResourceAsStream("/state_tricky.db")
    require(in != null, "state_tricky.db test resource missing")
    try in.readAllBytes() finally in.close()
  }

  test("rowid alias: quoted IPK declaration, suffix-named sibling column") {
    // "session_id" INTEGER PRIMARY KEY is quoted AND has a sibling column
    // "id" whose name is its suffix — the alias must attach to session_id
    // only (a substring match over the raw DDL would pick "id")
    val t = SqliteFile.parse(tricky).find(_.name == "state_tricky").get
    assert(t.columns.map(_.name) == Vector("id", "session_id", "note"))
    val rows = t.rows.map(r => r(2).asInstanceOf[String] -> r).toMap
    // explicit IPK value comes back through the alias; plain "id" keeps
    // its stored value (would be clobbered if misattributed)
    assert(rows("a")(1) == java.lang.Long.valueOf(42L))
    assert(rows("a")(0) == java.lang.Long.valueOf(5L))
    // auto-assigned rowid materializes for the row that omitted the IPK
    assert(rows("b")(1).asInstanceOf[java.lang.Long].longValue > 42L)
    assert(rows("b")(0) == java.lang.Long.valueOf(6L))
  }

  test("NUMERIC affinity: integral and fractional values both decode") {
    // SQLite stores 2 (integral) as an INTEGER serial type and 2.5 as
    // REAL in the same DECIMAL column — both must surface, types intact
    val t = SqliteFile.parse(tricky).find(_.name == "state_prices").get
    assert(t.columns.map(_.declType) == Vector("TEXT", "DECIMAL(10,2)"))
    val byK = t.rows.map(r => r(0).asInstanceOf[String] -> r(1)).toMap
    assert(byK("int") == java.lang.Long.valueOf(2L))
    assert(byK("frac") == java.lang.Double.valueOf(2.5))
    assert(byK("none") == null)
  }

  private lazy val tablePk: Array[Byte] = {
    val in = getClass.getResourceAsStream("/state_tablepk.db")
    require(in != null, "state_tablepk.db test resource missing")
    try in.readAllBytes() finally in.close()
  }

  test("table-level PRIMARY KEY(k) on an INTEGER column aliases the rowid") {
    // such tables store the key as NULL in every record — without the
    // table-constraint alias resolution they would restore as all NULLs
    val t = SqliteFile.parse(tablePk).find(_.name == "state_tpk").get
    val byV = t.rows.map(r => r(1).asInstanceOf[String] -> r(0)).toMap
    assert(byV("a") == java.lang.Long.valueOf(42L))
    assert(byV("b") == java.lang.Long.valueOf(7L))
  }

  test("CONSTRAINT-named table-level PK, even DESC, aliases the rowid") {
    // the spec's quirk: the table-constraint form aliases for ASC and
    // DESC alike; only the column-level `INTEGER PRIMARY KEY DESC`
    // spelling is excluded
    val t = SqliteFile.parse(tablePk).find(_.name == "state_cpk").get
    val byV = t.rows.map(r => r(1).asInstanceOf[String] -> r(0)).toMap
    assert(byV("x") == java.lang.Long.valueOf(100L))
    assert(byV("y") == java.lang.Long.valueOf(3L))
  }

  test("column-level INTEGER PRIMARY KEY DESC is NOT a rowid alias") {
    // values are stored in the record (rowid runs separately), and the key
    // may legitimately be NULL — a wrongly-applied alias would clobber
    // that NULL with the rowid
    val t = SqliteFile.parse(tablePk).find(_.name == "state_desc").get
    val byV = t.rows.map(r => r(1).asInstanceOf[String] -> r(0)).toMap
    assert(byV("p") == java.lang.Long.valueOf(55L))
    assert(byV("q") == null, "NULL key in a non-alias PK must stay NULL")
  }

  test("a conflict clause after the table-level PK parses, alias intact") {
    // PRIMARY KEY(k) ON CONFLICT REPLACE is a common SQLite upsert idiom:
    // the trailing clause must not be mistaken for a malformed PK shape
    val txt = SqliteFile.parse(tablePk).find(_.name == "state_conf_txt").get
    val byK = txt.rows.map(r => r(0).asInstanceOf[String] -> r(1)).toMap
    assert(byK == Map("a" -> java.lang.Long.valueOf(1L),
      "b" -> java.lang.Long.valueOf(2L)))
    // ...and on an INTEGER column the alias still resolves through it
    val i = SqliteFile.parse(tablePk).find(_.name == "state_conf_int").get
    assert(i.rows.map(r => (r(0), r(1))) ==
      Vector((java.lang.Long.valueOf(9L), "i")))
  }

  test("rejects non-SQLite and truncated input with clean errors") {
    val junk = intercept[IllegalArgumentException](
      SqliteFile.parse(Array.fill[Byte](200)(0x41)))
    assert(junk.getMessage.contains("magic"), junk.getMessage)
    assert(intercept[IllegalArgumentException](
      SqliteFile.parse(Array.empty[Byte])).getMessage.contains("header"))
    // chop the fixture mid-page: page references past the end must fail,
    // not decode garbage
    intercept[IllegalArgumentException](
      SqliteFile.parse(fixture.take(fixture.length / 2)))
  }
}
