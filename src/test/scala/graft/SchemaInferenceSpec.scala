package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GdalOptions, RawFeature, SchemaInference}

/** SURVEY.md §1.4 rules 1-6 as unit tests. */
class SchemaInferenceSpec extends AnyFunSuite {
  private val opts = GdalOptions.from(Map.empty)
  private def infer(fs: RawFeature*) = SchemaInference.infer(fs.iterator, opts)

  test("rule 1: column typed from first observed value; first-seen order") {
    val s = infer(
      RawFeature(0, null, IndexedSeq("a" -> 1, "b" -> "x")),
      RawFeature(1, null, IndexedSeq("c" -> 2.5, "a" -> 3)))
    assert(s.fieldNames.toSeq === Seq("a", "b", "c", "geometry"))
    assert(s("a").dataType === IntegerType)
    assert(s("b").dataType === StringType)
    assert(s("c").dataType === DoubleType)
  }

  test("rules 2-3: late/missing fields are nullable") {
    val s = infer(
      RawFeature(0, null, IndexedSeq("a" -> 1)),
      RawFeature(1, null, IndexedSeq("a" -> 2, "late" -> "v")))
    assert(s("late").nullable)
  }

  test("rule 4: all-null columns dropped") {
    val s = infer(
      RawFeature(0, null, IndexedSeq("a" -> 1, "ghost" -> null)),
      RawFeature(1, null, IndexedSeq("ghost" -> null)))
    assert(!s.fieldNames.contains("ghost"))
  }

  test("rule 5: collision with geometry column renamed _original") {
    val s = infer(RawFeature(0, null, IndexedSeq("geometry" -> "oops", "a" -> 1)))
    assert(s.fieldNames.toSeq === Seq("geometry_original", "a", "geometry"))
    assert(s("geometry").dataType === BinaryType)
    assert(s("geometry_original").dataType === StringType)
  }

  test("rule 6: fid first when requested, geometry last") {
    val o = GdalOptions.from(Map("fidColumnName" -> "fid"))
    val s = SchemaInference.infer(
      Iterator(RawFeature(7, null, IndexedSeq("a" -> 1))), o)
    assert(s.fieldNames.toSeq === Seq("fid", "a", "geometry"))
    assert(s("fid").dataType === LongType)
  }

  test("numeric widening int -> long -> double; mixed -> string") {
    val s = infer(
      RawFeature(0, null, IndexedSeq("n" -> 1, "m" -> 1, "x" -> 1)),
      RawFeature(1, null, IndexedSeq("n" -> 5000000000L, "m" -> 1.5, "x" -> "s")))
    assert(s("n").dataType === LongType)
    assert(s("m").dataType === DoubleType)
    assert(s("x").dataType === StringType)
  }

  test("list values typed as arrays (reference left lists unimplemented)") {
    val s = infer(RawFeature(0, null, IndexedSeq("tags" -> Seq("a", "b"))))
    assert(s("tags").dataType === ArrayType(StringType))
  }
}
