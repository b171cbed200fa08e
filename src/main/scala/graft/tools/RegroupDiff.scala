package graft.tools

import org.apache.spark.sql.functions._
import graft.query.QueryCompiler
import graft.query.QueryCompiler.{C, Pattern, V}
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

    spark.stop()
  }
}
