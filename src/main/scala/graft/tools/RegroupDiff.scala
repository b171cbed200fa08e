package graft.tools

import org.apache.spark.sql.functions._
import graft.query.QueryCompiler
import graft.query.QueryCompiler.{C, Pattern, V, W}
import graft.shred.Shred

/** Differential probe: regrouped/direct tier vs the canonical EAV
  * authority on adversarial document shapes — (1) a value constant
  * whose vt tag mismatches the column type ("5" the string vs 5 the
  * number), (2) duplicate entity ids (two rows, one id: the EAV form
  * joins on e, giving the per-entity cross product; a row-local
  * fusion would zip). Prints per-shape row counts for both tiers.
  */
object RegroupDiff {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    import spark.implicits._

    def counts(name: String, df: org.apache.spark.sql.DataFrame,
        idCol: String, pats: Seq[Pattern]): Unit = {
      val triples = Shred.shred(df, Some(idCol))
      val auth = QueryCompiler.runBoxedCanonical(
        Map("default" -> triples), pats)
      val live = QueryCompiler.runBoxed(Map("default" -> triples), pats)
      val a = auth.collect().map(_.toString).sorted.toSeq
      val l = live.collect().map(_.toString).sorted.toSeq
      val tag = if (a == l) "OK " else "DIVERGE"
      println(s"$tag $name: authority=${a.size} live=${l.size}")
      if (a != l) {
        println(s"  authority: ${a.mkString(" | ")}")
        println(s"  live:      ${l.mkString(" | ")}")
      }
    }

    // (1) vt mismatch: string column holding "5", constant pattern 5
    val vtDf = Seq(("a", "5"), ("b", "7")).toDF("id", "name")
    counts("vt-mismatch str-col num-const", vtDf, "id",
      Seq(Pattern(V("e"), C("name"), C(5))))
    val vtDf2 = Seq(("a", 5L), ("b", 7L)).toDF("id", "name")
    counts("vt-match num-col num-const", vtDf2, "id",
      Seq(Pattern(V("e"), C("name"), C(5))))
    counts("vt-mismatch num-col str-const", vtDf2, "id",
      Seq(Pattern(V("e"), C("name"), C("5"))))
    val vtDf3 = Seq(("a", true)).toDF("id", "flag")
    counts("vt-mismatch bool-col str-const", vtDf3, "id",
      Seq(Pattern(V("e"), C("flag"), C("true"))))

    // (2) duplicate ids: two rows share id X with different values
    val dupDf = Seq(("X", 1L, 10L), ("X", 2L, 20L), ("Y", 3L, 30L))
      .toDF("id", "a", "b")
    counts("dup-id two-value-patterns", dupDf, "id",
      Seq(Pattern(V("e"), C("a"), V("x")), Pattern(V("e"), C("b"), V("y"))))
    counts("dup-id one-value-one-const", dupDf, "id",
      Seq(Pattern(V("e"), C("a"), C(1)), Pattern(V("e"), C("b"), V("y"))))
    counts("dup-id single-pattern", dupDf, "id",
      Seq(Pattern(V("e"), C("a"), V("x"))))
    // repeated qvar within the group: per-entity intersection vs row-zip
    val dupDf2 = Seq(("X", 1L, 2L), ("X", 2L, 1L)).toDF("id", "p", "r")
    counts("dup-id repeated-qvar", dupDf2, "id",
      Seq(Pattern(V("e"), C("p"), V("x")), Pattern(V("e"), C("r"), V("x"))))

    // (3) nested struct-ref chains (the reference's nested-document
    // shape, query_test.cljc:622-702)
    val nested = Seq(
      (1L, "Bob", "BUILDING", 100L), (2L, "Ann", "AUTO", 50L),
      (3L, "Cid", "BUILDING", 900L))
      .toDF("id", "name", "seg", "bal")
      .select(col("id"), col("name"),
        struct(col("seg"), col("bal")).as("profile"))
    val chainPats = Seq(
      Pattern(V("c"), C("name"), V("n")),
      Pattern(V("c"), C("profile"), V("p")),
      Pattern(V("p"), C("seg"), C("BUILDING")),
      Pattern(V("p"), C("bal"), V("b")))
    counts("chain 2-level conjunction", nested, "id", chainPats)
    counts("chain ref-only binding", nested, "id",
      Seq(Pattern(V("c"), C("profile"), V("p"))))
    counts("chain under wildcard root", nested, "id",
      Seq(Pattern(W, C("profile"), V("p")),
        Pattern(V("p"), C("bal"), V("b"))))
    counts("chain keeps sub-ids", nested, "id",
      Seq(Pattern(V("c"), C("profile"), V("p")),
        Pattern(V("p"), C("seg"), V("s"))))
    // duplicate root ids THROUGH a chain: per-entity product of the
    // sub-entity's value sets
    val dupNested = Seq((7L, 1L, 10L), (7L, 2L, 20L), (8L, 3L, 30L))
      .toDF("id", "a", "b")
      .select(col("id"), struct(col("a"), col("b")).as("inner"))
    counts("dup-id chain two-value-patterns", dupNested, "id",
      Seq(Pattern(V("e"), C("inner"), V("i")),
        Pattern(V("i"), C("a"), V("x")),
        Pattern(V("i"), C("b"), V("y"))))
    // two-level nesting
    val deep = Seq((1L, "x", 5L), (2L, "y", 7L))
      .toDF("id", "tag", "n")
      .select(col("id"),
        struct(col("tag"), struct(col("n")).as("leaf")).as("mid"))
    counts("chain two levels deep", deep, "id",
      Seq(Pattern(V("e"), C("mid"), V("m")),
        Pattern(V("m"), C("leaf"), V("l")),
        Pattern(V("l"), C("n"), V("v"))))
    // null struct rows must drop from chain patterns
    val withNull = Seq((1L, true), (2L, false)).toDF("id", "has")
      .select(col("id"),
        when(col("has"), struct(col("id").as("z"))).as("opt"))
    counts("chain over nullable struct", withNull, "id",
      Seq(Pattern(V("e"), C("opt"), V("o")),
        Pattern(V("o"), C("z"), V("z"))))
    // content-derived ids (no idCol): the fused row-local tier
    def countsNoId(name: String, df: org.apache.spark.sql.DataFrame,
        pats: Seq[Pattern]): Unit = {
      val triples = Shred.shred(df)
      val auth = QueryCompiler.runBoxedCanonical(
        Map("default" -> triples), pats)
      val live = QueryCompiler.runBoxed(Map("default" -> triples), pats)
      val a = auth.collect().map(_.toString).sorted.toSeq
      val l = live.collect().map(_.toString).sorted.toSeq
      println(s"${if (a == l) "OK " else "DIVERGE"} $name: " +
        s"authority=${a.size} live=${l.size}")
    }
    countsNoId("content-id chain conjunction", nested, chainPats)
    countsNoId("content-id flat conjunction",
      Seq(("X", 1L, 10L), ("X", 2L, 20L)).toDF("k", "a", "b"),
      Seq(Pattern(V("e"), C("a"), V("x")),
        Pattern(V("e"), C("b"), V("y"))))

    // (4) array shapes (r16: fused-only — content-hash ids)
    val pets = spark.read.json(Seq(
      """{"id": 1, "name": "Bob",
         "pets": [{"pn": "Rex", "age": 3}, {"pn": "Ada", "age": 1}],
         "tags": ["a", "b"]}""",
      """{"id": 2, "name": "Ann", "pets": [],
         "tags": []}""",
      """{"id": 3, "name": "Cid",
         "pets": [null, {"pn": "Taz", "age": 3}],
         "tags": ["b", null, "2"]}""").toDS())
    countsNoId("array chain one child", pets,
      Seq(Pattern(V("c"), C("name"), V("n")),
        Pattern(V("c"), C("pets"), V("p")),
        Pattern(V("p"), C("pn"), V("pname"))))
    countsNoId("array chain two children", pets,
      Seq(Pattern(V("c"), C("pets"), V("p")),
        Pattern(V("p"), C("pn"), V("pname")),
        Pattern(V("p"), C("age"), V("a"))))
    countsNoId("array chain ref-only", pets,
      Seq(Pattern(V("c"), C("pets"), V("p"))))
    countsNoId("array chain constant filter", pets,
      Seq(Pattern(V("c"), C("pets"), V("p")),
        Pattern(V("p"), C("age"), C(3L)),
        Pattern(V("c"), C("name"), V("n"))))
    countsNoId("scalar-array value var", pets,
      Seq(Pattern(V("c"), C("name"), V("n")),
        Pattern(V("c"), C("tags"), V("t"))))
    countsNoId("scalar-array constant", pets,
      Seq(Pattern(V("c"), C("tags"), C("b")),
        Pattern(V("c"), C("name"), V("n"))))
    countsNoId("scalar-array kind-mismatch const", pets,
      Seq(Pattern(V("c"), C("tags"), C(2L)),
        Pattern(V("c"), C("name"), V("n"))))
    countsNoId("scalar-array wildcard", pets,
      Seq(Pattern(V("c"), C("tags"), W),
        Pattern(V("c"), C("name"), V("n"))))
    countsNoId("ref-array wildcard value", pets,
      Seq(Pattern(V("c"), C("pets"), W),
        Pattern(V("c"), C("name"), V("n"))))
    // idCol regime: array shapes must DECLINE to EAV (still equal)
    counts("idCol array chain declines to EAV", pets, "id",
      Seq(Pattern(V("c"), C("pets"), V("p")),
        Pattern(V("p"), C("pn"), V("pname")),
        Pattern(V("c"), C("name"), V("n"))))
    // struct nested INSIDE array elements, one level deeper
    val deepArr = spark.read.json(Seq(
      """{"id": 1, "rooms": [{"label": "a",
           "size": {"w": 3, "h": 4}}, {"label": "b",
           "size": {"w": 5, "h": 6}}]}""").toDS())
    countsNoId("struct under array element", deepArr,
      Seq(Pattern(V("c"), C("rooms"), V("r")),
        Pattern(V("r"), C("label"), V("l")),
        Pattern(V("r"), C("size"), V("s")),
        Pattern(V("s"), C("w"), V("w"))))

    // (5) r17: verified shreds (write-time uniqueness proof → fused)
    def countsVerified(name: String,
        df: org.apache.spark.sql.DataFrame, idCol: String,
        pats: Seq[Pattern]): Unit = {
      val triples = Shred.shredVerified(df, idCol)
      val auth = QueryCompiler.runBoxedCanonical(
        Map("default" -> triples), pats)
      val live = QueryCompiler.runBoxed(Map("default" -> triples), pats)
      val a = auth.collect().map(_.toString).sorted.toSeq
      val l = live.collect().map(_.toString).sorted.toSeq
      println(s"${if (a == l) "OK " else "DIVERGE"} $name: " +
        s"authority=${a.size} live=${l.size}")
    }
    countsVerified("verified unique-id conjunction",
      Seq(("X", 1L, 10L), ("Y", 2L, 20L), ("Z", 3L, 30L))
        .toDF("id", "a", "b"), "id",
      Seq(Pattern(V("e"), C("a"), V("x")),
        Pattern(V("e"), C("b"), V("y"))))
    // duplicate ids through the SAME entry point: proof fails, the
    // product plan serves — values must still match the authority
    countsVerified("verified duplicate-id falls back to product",
      dupDf, "id",
      Seq(Pattern(V("e"), C("a"), V("x")),
        Pattern(V("e"), C("b"), V("y"))))
    // verified ARRAY chain: fused lateral explode under a proven key
    countsVerified("verified array chain fuses", pets, "id",
      Seq(Pattern(V("c"), C("pets"), V("p")),
        Pattern(V("p"), C("pn"), V("pname")),
        Pattern(V("c"), C("name"), V("n"))))
    // persisted round trip with the sidecar uniqueness proof
    locally {
      val base = "/tmp/graft_regroupdiff_persist"
      pets.write.mode("overwrite").parquet(s"$base/docs")
      Shred.shredWrite(spark, s"$base/docs", Some("id"),
        s"$base/triples")
      val opened = Shred.openShred(spark, s"$base/triples")
      val pats = Seq(Pattern(V("c"), C("pets"), V("p")),
        Pattern(V("p"), C("pn"), V("pname")),
        Pattern(V("c"), C("name"), V("n")))
      val auth = QueryCompiler.runBoxedCanonical(
        Map("default" -> opened), pats)
      val live = QueryCompiler.runBoxed(Map("default" -> opened), pats)
      val a = auth.collect().map(_.toString).sorted.toSeq
      val l = live.collect().map(_.toString).sorted.toSeq
      println(s"${if (a == l) "OK " else "DIVERGE"} " +
        s"persisted key-licensed array chain: " +
        s"authority=${a.size} live=${l.size} " +
        s"audit=${Shred.auditPersisted(spark, s"$base/triples")}")
    }

    spark.stop()
  }
}
