package graft.core

import graft.SparkSpec
import graft.core.Finalize.Container
import graft.functions.Jsonata
import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._

/** Port of the reference's path/flattening quirk battery
  * (builtin_test.cljc:318-481) to Column-level semantics. Cases whose
  * arrays are heterogeneous at the type level (`[[1,2,3], 4]`) cannot
  * exist in Spark's type system and are representable only through the
  * EAV/variant path; the homogeneous cases are ported 1:1.
  */
class QuirkSpec extends SparkSpec {

  private def eval1(c: Column): Any =
    spark.range(1).select(c.as("v")).collect()(0).get(0)
  private def seq1(c: Column): Seq[Any] =
    eval1(c).asInstanceOf[scala.collection.Seq[Any]].toSeq
  private def fin(v: Any): Option[Any] = Finalize.jflatten(v)
  private def asContainer(c: Column): Option[Any] =
    fin(Container(seq1(c)))

  private def objArr: Column = array(
    struct(lit(1).as("a")), struct(lit(2).as("a")), struct(lit(3).as("a")))

  test("simple mapping: [{'a':1},{'a':2},{'a':3}].a = [1,2,3]") {
    assert(asContainer(Paths.getStep(objArr, "a")).contains(Seq(1, 2, 3)))
  }

  test("simple mapping (2): .(a + 1) = [2,3,4]") {
    assert(asContainer(
      Paths.mapStep(objArr, x => x.getField("a") + 1))
      .contains(Seq(2, 3, 4)))
  }

  test("simple navigation: {'a':{'b':111}}.a.b = 111") {
    val doc = struct(struct(lit(111).as("b")).as("a"))
    assert(eval1(doc.getField("a").getField("b")) == 111)
  }

  test("navigation with arithmetic: .(a.b.c + a.b.f) = 33") {
    val doc = struct(struct(struct(lit(30).as("c"), lit(3).as("f"))
      .as("b")).as("a"))
    val b = doc.getField("a").getField("b")
    assert(eval1(b.getField("c") + b.getField("f")) == 33)
  }

  test("navigation with aref: a + b.e * c[1] + d = 525") {
    val doc = struct(lit(5).as("a"),
      struct(lit(2).as("e")).as("b"),
      array(lit(0), lit(10)).as("c"), lit(500).as("d"))
    assert(eval1(doc.getField("a") +
      doc.getField("b").getField("e") *
        Jsonata.aref(doc.getField("c"), lit(1)) +
      doc.getField("d")) == 525)
  }

  private def numsArr: Column = array(
    struct(array(lit(1), lit(2)).as("nums")),
    struct(array(lit(3), lit(4)).as("nums")))

  test("quirk 2a: .nums merges = [1,2,3,4]") {
    assert(asContainer(Paths.getStepFlatten(numsArr, "nums"))
      .contains(Seq(1, 2, 3, 4)))
  }

  test("quirk 2b: .nums[1] is per-parent = [2,4]") {
    assert(asContainer(
      Paths.indexPerParent(Paths.getStep(numsArr, "nums"), 1))
      .contains(Seq(2, 4)))
  }

  test("number[2] on a JSON array indexes directly = 33") {
    val arr = array(lit(11), lit(22), lit(33), lit(44))
    assert(eval1(Paths.index(arr, 2)) == 33)
  }

  test("simple filter singleton-collapses: letter[$='b'] = 'b'") {
    val letters = array(lit("a"), lit("b"), lit("c"), lit("d"))
    assert(asContainer(Paths.filterStep(letters, x => x === "b"))
      .contains("b"))
  }

  test("filter on mapped structs: .num[x = 2] keeps duplicates") {
    val arr = array(
      struct(struct(lit(1).as("x")).as("num")),
      struct(struct(lit(2).as("x")).as("num")),
      struct(struct(lit(2).as("x")).as("num")),
      struct(struct(lit(3).as("x")).as("num")))
    val out = seq1(Paths.filterStep(Paths.getStep(arr, "num"),
      n => n.getField("x") === 2))
    assert(out.map(_.asInstanceOf[Row].getInt(0)) == Seq(2, 2))
  }

  test("row filter [num.x = 2] singleton-collapses to the object") {
    val arr = array(
      struct(struct(lit(1).as("x")).as("num")),
      struct(struct(lit(2).as("x")).as("num")),
      struct(struct(lit(3).as("x")).as("num")))
    val kept = asContainer(Paths.filterStep(arr,
      r => r.getField("num").getField("x") === 2))
    // the finalizer renders the singleton Row as a document map
    assert(kept.contains(Map("num" -> Map("x" -> 2))))
  }

  test("value-step .[num.x = 2] = [[false],[true],[false]]") {
    val arr = array(
      struct(struct(lit(1).as("x")).as("num")),
      struct(struct(lit(2).as("x")).as("num")),
      struct(struct(lit(3).as("x")).as("num")))
    val out = seq1(Paths.valueStep(arr,
      r => array(r.getField("num").getField("x") === 2)))
      .map(_.asInstanceOf[scala.collection.Seq[Any]].toSeq)
    assert(out == Seq(Seq(false), Seq(true), Seq(false)))
  }

  test("string concat with number stringification: 1 & 2 & 'abc'") {
    assert(eval1(concat(Jsonata.string(lit(1)), Jsonata.string(lit(2)),
      lit("abc"))) == "12abc")
  }

  test("$match goldens from the battery") {
    val m1 = seq1(Jsonata.rmatch(lit("bbfoovar"), "foo"))
    val r1 = m1.head.asInstanceOf[Row]
    assert(r1.getString(0) == "foo" && r1.getInt(1) == 2 &&
      r1.getSeq[String](2).isEmpty)
    val m2 = seq1(Jsonata.rmatch(lit("foobarxababy"), "\\d*x(ab)+y"))
    val r2 = m2.head.asInstanceOf[Row]
    assert(r2.getString(0) == "xababy" && r2.getInt(1) == 6 &&
      r2.getSeq[String](2) == Seq("ab"))
  }

  test("reduce battery: [1..5] fold, one-arg, one-arg+init") {
    val r15 = Paths.range(lit(1), lit(5))
    assert(eval1(aggregate(r15, lit(0), (a, x) => a + x)) == 15)
    assert(eval1(aggregate(array(lit(3)), lit(0), (a, x) => a + x)) == 3)
    assert(eval1(aggregate(array(lit(3)), lit(2), (a, x) => a + x)) == 5)
  }

  test("thread into reverse: [1..5] ~> $reverse() = [5,4,3,2,1]") {
    assert(seq1(Paths.thread(Paths.range(lit(1), lit(5)),
      Jsonata.reverseArr)) == Seq(5, 4, 3, 2, 1))
  }

  test("scalar treated as singleton: 1[0] = 1") {
    // reference: "RADmapper doesn't mind" — scalars index as singletons
    assert(eval1(Paths.index(array(lit(1)), 0)) == 1)
  }
}
