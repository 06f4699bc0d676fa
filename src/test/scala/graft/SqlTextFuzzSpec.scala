package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.stream.SqlText

/** Property fuzz for the SQL-text layer: the rewriters must be safe on
  * arbitrary statement text — never throw, never touch string literals,
  * and be identity when no dialect construct is present. */
class SqlTextFuzzSpec extends AnyFunSuite {

  private val fragment: Gen[String] = Gen.oneOf(
    Gen.identifier.map(_.take(8)),
    Gen.oneOf("SELECT ", " FROM t ", " WHERE ", "(", ")", ", ", " = 1 ",
      "''", " -- note\n", ";", "$p", " > ", "sum(x)", "count(*)"),
    Gen.alphaNumStr.map(s => s"'${s.take(10)}'"))

  private val sqlish: Gen[String] =
    Gen.listOfN(12, fragment).map(_.mkString)

  private def samples(g: Gen[String], n: Int): Seq[String] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("dialectRewrite never throws and is identity without dialect calls") {
    samples(sqlish, 500).foreach { s =>
      val out = SqlText.dialectRewrite(s) // must not throw
      val lower = s.toLowerCase
      if (!Seq("total", "iif", "format", "group_concat", "json_object",
          "json_array", "json_group_array", "->").exists(lower.contains))
        assert(out == s, s"rewrite changed non-dialect text:\n$s\n$out")
    }
  }

  test("prepare round-trips arbitrary statement lists without throwing") {
    samples(sqlish, 300).grouped(3).foreach { parts =>
      SqlText.prepare(parts.mkString(";")) // must not throw
    }
  }

  test("rewrites never alter single-quoted literal contents") {
    for (payload <- Seq("total(x)", "iif(a,b,c)", "x ->> k", "format(d,1)")) {
      val sql = s"SELECT '$payload' AS s"
      val out = SqlText.dialectRewrite(sql)
      assert(out.contains(s"'$payload'"), s"literal rewritten: $out")
    }
  }

  test("unbalanced parens degrade gracefully (no rewrite, no crash)") {
    assert(SqlText.dialectRewrite("SELECT total(x FROM t") ==
      "SELECT total(x FROM t")
    assert(SqlText.dialectRewrite("SELECT iif(((a,b") == "SELECT iif(((a,b")
  }
}
