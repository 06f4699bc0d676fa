package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.types._

/** Pure validation/window-math fixtures (FIXTURES.md §4-5;
  * behavioral spec: leaf-stream-types/src/lib.rs:195-212, 268-320). */
class TypesSpec extends AnyFunSuite {
  import SqlValue._

  private def defn(p: ParamDef*) = QueryDef("SELECT 1", p)

  test("param validation matrix") {
    val intReq = defn(ParamDef("x", ParamKind.PInteger))
    assert(QueryValidation.validate(intReq,
      LeafQuery("q", Map("x" -> SqlInteger(5)))).isRight)
    assert(QueryValidation.validate(intReq,
      LeafQuery("q", Map("x" -> SqlText("5")))).isLeft, "no text->int coercion")
    assert(QueryValidation.validate(intReq,
      LeafQuery("q", Map("x" -> SqlNull))).isLeft, "required rejects null")
    assert(QueryValidation.validate(intReq, LeafQuery("q")).isLeft, "required must be present")
    assert(QueryValidation.validate(intReq,
      LeafQuery("q", Map("x" -> SqlInteger(1), "y" -> SqlInteger(2)))).isLeft,
      "unknown param rejected")

    val anyOpt = defn(ParamDef("x", ParamKind.PAny, optional = true))
    assert(QueryValidation.validate(anyOpt, LeafQuery("q")).isRight)
    assert(QueryValidation.validate(anyOpt,
      LeafQuery("q", Map("x" -> SqlNull))).isRight)
    assert(QueryValidation.validate(anyOpt,
      LeafQuery("q", Map("x" -> SqlBlob(Array[Byte](1))))).isRight)

    // real accepts integer (numeric affinity), not vice versa
    val realReq = defn(ParamDef("x", ParamKind.PReal))
    assert(QueryValidation.validate(realReq,
      LeafQuery("q", Map("x" -> SqlInteger(5)))).isRight)
    assert(QueryValidation.validate(intReq,
      LeafQuery("q", Map("x" -> SqlReal(5.0)))).isLeft)
  }

  test("query window math: lastEvent + subscription advance") {
    assert(LeafQuery("q").lastEvent == 1000L) // defaults start=1, limit=1000
    assert(LeafQuery("q", start = Some(1), limit = 1000).lastEvent == 1000L)
    assert(LeafQuery("q", start = Some(1001), limit = 1000).lastEvent == 2000L)
    assert(LeafQuery("q", start = Some(2001), limit = 1000).lastEvent == 3000L)
    val advanced = LeafQuery("q", start = Some(1), limit = 250).updateForSubscription(42)
    assert(advanced.start.contains(42L) && advanced.lastEvent == 291L)
  }

  test("module cid covers every field") {
    val base = ModuleDef(initSql = "a", materializer = "b",
      queries = Map("q" -> QueryDef("SELECT 1", Seq(ParamDef("p", ParamKind.PText)))))
    assert(base.cid == base.copy().cid)
    for (variant <- Seq(
        base.copy(initSql = "a2"),
        base.copy(authorizer = "x"),
        base.copy(materializer = "b2"),
        base.copy(stateInitSql = "s"),
        base.copy(stateMaterializer = "s2"),
        base.copy(queries = Map("q" -> QueryDef("SELECT 2"))),
        base.copy(queries = Map("q" -> QueryDef("SELECT 1",
          Seq(ParamDef("p", ParamKind.PText, optional = true)))))))
      assert(variant.cid != base.cid, s"cid must change for $variant")
  }
}
