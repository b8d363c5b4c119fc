package graft

import org.apache.spark.sql.sources._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.FilterEval

class FilterEvalSpec extends AnyFunSuite {
  private val row: Map[String, Any] = Map("a" -> 5L, "s" -> "hello", "nul" -> null)
  private def get(name: String): Option[Any] =
    if (row.contains(name)) Some(row(name)) else None

  test("comparisons and string predicates") {
    assert(FilterEval.eval(EqualTo("a", 5), get))
    assert(!FilterEval.eval(EqualTo("a", 6), get))
    assert(FilterEval.eval(GreaterThan("a", 4.5), get))
    assert(FilterEval.eval(LessThanOrEqual("a", 5), get))
    assert(FilterEval.eval(StringStartsWith("s", "he"), get))
    assert(FilterEval.eval(In("a", Array(1, 5, 9)), get))
  }

  test("null semantics: unknown-from-null drops the row") {
    assert(!FilterEval.eval(EqualTo("nul", 5), get))
    assert(FilterEval.eval(IsNull("nul"), get))
    assert(!FilterEval.eval(IsNotNull("nul"), get))
    // null OR true = true (three-valued logic)
    assert(FilterEval.eval(Or(EqualTo("nul", 5), EqualTo("a", 5)), get))
    // null AND true = null -> dropped
    assert(!FilterEval.eval(And(EqualTo("nul", 5), EqualTo("a", 5)), get))
  }

  test("unknown columns keep the row (residual decides)") {
    assert(FilterEval.eval(EqualTo("missing", 1), get))
    assert(FilterEval.eval(Not(EqualTo("missing", 1)), get))
    assert(FilterEval.eval(And(EqualTo("missing", 1), EqualTo("a", 5)), get))
    // ...but a definite false still prunes even with an unknown sibling
    assert(!FilterEval.eval(And(EqualTo("missing", 1), EqualTo("a", 6)), get))
  }

  test("backtick-quoted attribute names are unquoted before lookup") {
    assert(FilterEval.eval(EqualTo("`a`", 5), get))
    val spaced: String => Option[Any] = n => if (n == "has space") Some("x") else None
    assert(FilterEval.eval(EqualTo("`has space`", "x"), spaced))
  }
}
