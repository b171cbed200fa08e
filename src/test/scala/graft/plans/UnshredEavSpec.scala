package graft.plans

import graft.SparkSpec
import graft.shred.Shred
import graft.query.QueryCompiler
import graft.query.QueryCompiler.{C, Pattern, V}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The EAV-unshred optimizer rule (SURVEY §4 item 7): every test is
  * differential against the generator path (flag off), so the rule can
  * only pass by reproducing ShredGenerator's triples exactly —
  * including null walks, canon encodings, and ref-entity id minting.
  */
class UnshredEavSpec extends SparkSpec {
  import spark.implicits._

  private def withFlag[T](on: Boolean)(f: => T): T = {
    spark.conf.set(UnshredEav.FLAG, on.toString)
    try f finally spark.conf.set(UnshredEav.FLAG, "true")
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Build fresh (plans cache their optimization), run with the rule
    * on and off, require identical bags.
    */
  private def differential(mk: () => DataFrame): DataFrame = {
    val on = withFlag(true) { val df = mk(); (df, rows(df)) }
    val off = withFlag(false) { val df = mk(); rows(df) }
    assert(on._2 == off, "rule-on and generator rows diverge")
    on._1
  }

  private def plan(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString.toLowerCase

  /** id, name, age, score, city (top-level), addr struct with its own
    * city + zip + nested geo struct; d3 has a null addr, d4 null zip.
    */
  private def docs: DataFrame =
    Seq(
      ("d1", "alice", 10L, 2.0, "NYC",
        Some(("NYC", "10001", 40.7)), Seq("a", "b")),
      ("d2", "bob", 11L, 2.5, "LA",
        Some(("LA", "90001", 34.0)), Seq("c")),
      ("d3", "carol", 12L, 3.0, "SF", None, Seq()),
      ("d4", "dan", 13L, 4.0, "NYC",
        Some((null.asInstanceOf[String], null.asInstanceOf[String], 0.0)),
        Seq("d")))
      .toDF("id", "name", "age", "score", "city", "addrRaw", "tags")
      .select($"id", $"name", $"age", $"score", $"city", $"tags",
        when($"addrRaw".isNotNull,
          struct($"addrRaw._1".as("acity"), $"addrRaw._2".as("zip"),
            struct($"addrRaw._3".as("lat")).as("geo"))).as("addr"))
      .drop("addrRaw")

  private def triples(df: DataFrame = docs): DataFrame =
    Shred.shred(df, Some("id"))

  test("contradictory attribute pins bail to the (empty) generator") {
    // CombineFilters merges the stacked filters into one conjunction;
    // taking just the first a-literal would return all name triples —
    // the correct result is empty
    val df = differential(() =>
      triples().filter($"a" === "name").filter($"a" === "age"))
    assert(df.count() == 0)
    // redundant duplicate pins of the SAME attribute still rewrite
    val dup = differential(() =>
      triples().filter($"a" === "name").filter($"a" === "name"))
    assert(!plan(dup).contains("shredgenerator"), plan(dup))
    assert(dup.count() == 4)
  }

  test("top-level scalar filter collapses to a projection") {
    val df = differential(() => triples().filter($"a" === "name"))
    assert(!plan(df).contains("shredgenerator"), plan(df))
    assert(df.count() == 4)
  }

  test("struct-nested scalar collapses with the sub-entity id") {
    val df = differential(() => triples().filter($"a" === "zip"))
    assert(!plan(df).contains("shredgenerator"), plan(df))
    // d3 (null addr) and d4 (null zip) emit nothing
    val es = df.select("e").as[String].collect().sorted
    assert(es.toSeq == Seq("d1/addr", "d2/addr"))
  }

  test("doubly-nested scalar minting the full path id") {
    val df = differential(() => triples().filter($"a" === "lat"))
    assert(!plan(df).contains("shredgenerator"), plan(df))
    assert(df.select("e").as[String].collect().sorted.toSeq ==
      Seq("d1/addr/geo", "d2/addr/geo", "d4/addr/geo"))
  }

  test("ref attribute reproduces the generator's ref triples") {
    val df = differential(() => triples().filter($"a" === "addr"))
    assert(!plan(df).contains("shredgenerator"), plan(df))
    val r = df.select("e", "v", "vt").collect().map(_.toString).sorted
    assert(r.toSeq == Seq("[d1,d1/addr,ref]", "[d2,d2/addr,ref]",
      "[d4,d4/addr,ref]"))
  }

  test("same name at two sites unions both projections") {
    // "city" exists top-level; rename addr's field to city too
    val two = docs.withColumn("addr",
      when($"addr".isNotNull,
        struct($"addr.acity".as("city"), $"addr.zip", $"addr.geo")))
    val df = differential(() => Shred.shred(two, Some("id"))
      .filter($"a" === "city"))
    assert(!plan(df).contains("shredgenerator"), plan(df))
    assert(plan(df).contains("union"), plan(df))
    assert(df.count() == 6) // 4 top-level + d1 d2 nested (d4 acity null)
  }

  test("array sites keep the generator") {
    val df = withFlag(true)(triples().filter($"a" === "tags"))
    assert(plan(df).contains("shredgenerator"), plan(df))
    // and a name hiding under an array-of-structs bails the rewrite
    val nested = docs.withColumn("exts", array(struct($"city".as("zip"))))
    val df2 = withFlag(true)(Shred.shred(nested, Some("id"))
      .filter($"a" === "zip"))
    assert(plan(df2).contains("shredgenerator"), plan(df2))
    differential(() => Shred.shred(nested, Some("id"))
      .filter($"a" === "zip"))
  }

  test("generator-canon-divergent types bail (date)") {
    val dated = docs.withColumn("day", to_date(lit("2024-01-02")))
    val df = withFlag(true)(Shred.shred(dated, Some("id"))
      .filter($"a" === "day"))
    assert(plan(df).contains("shredgenerator"), plan(df))
  }

  test("absent attribute becomes an empty relation") {
    val df = withFlag(true)(triples().filter($"a" === "nope"))
    assert(!plan(df).contains("shredgenerator"), plan(df))
    assert(plan(df).contains("localrelation"), plan(df))
    assert(df.count() == 0)
    assert(withFlag(false)(triples().filter($"a" === "nope")).count() == 0)
  }

  test("numeric canon parity: integral doubles and vn") {
    val df = differential(() => triples().filter($"a" === "score"))
    assert(!plan(df).contains("shredgenerator"), plan(df))
    val v = df.orderBy("e").select("v").as[String].collect().toSeq
    assert(v == Seq("2", "2.5", "3", "4")) // canon drops ".0"
    assert(df.filter($"vt" =!= "num" || $"vn".isNull).count() == 0)
  }

  test("extra conjuncts survive above the rewrite") {
    val df = differential(() => triples()
      .filter($"a" === "age" && $"v" === "11"))
    assert(!plan(df).contains("shredgenerator"), plan(df))
    assert(df.select("e").as[String].collect().toSeq == Seq("d2"))
  }

  test("derived (content-hash) entity ids rewrite too") {
    val df = differential(() =>
      Shred.shred(docs.select("name", "age")).filter($"a" === "age"))
    assert(!plan(df).contains("shredgenerator"), plan(df))
    assert(df.count() == 4)
  }

  test("a full nested query{} chain matches the generator path") {
    def q() = QueryCompiler.run(
      Map("default" -> triples()),
      Seq(
        Pattern(V("c"), C("name"), V("n")),
        Pattern(V("c"), C("addr"), V("p")),
        Pattern(V("p"), C("acity"), V("city"))))
    val df = differential(() => q())
    assert(!plan(df).contains("shredgenerator"), plan(df))
    assert(df.count() == 2) // d1, d2 (d4's acity is null)
  }

  test("the scan narrows to the referenced columns") {
    val df = withFlag(true)(
      Shred.shred(spark.read.parquet(s"${sf()}/customer.parquet"),
        Some("c_custkey")).filter($"a" === "c_mktsegment"))
    val physical = df.queryExecution.executedPlan.toString
    val read = physical.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("c_mktsegment") && !read.contains("c_name"), read)
  }
}
