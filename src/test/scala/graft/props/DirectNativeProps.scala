package graft.props

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.{classify, forAll}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.query.QueryCompiler
import graft.query.QueryCompiler.{C, DocSource, Pattern, V, W}

/** Generative differential test for the r14 native-typed direct path:
  * on ARBITRARY flat frames (random column types incl. int/long/
  * double/string/bool, nulls, small value pools forcing join hits and
  * duplicate binding sets) and ARBITRARY constant-attribute pattern
  * conjunctions (1–2 sources, shared value vars, constants,
  * wildcards), [[QueryCompiler.runDocsNative]] — whenever it engages —
  * must return row-for-row and schema-for-schema exactly what the
  * boxed authority [[QueryCompiler.runDocsBoxed]] returns. When it
  * declines (mixed integral+fractional vars etc.), the boxed form
  * must still evaluate — the caller's fallback is always sound.
  */
object DirectNativeProps extends Properties("graft.query.native") {

  private lazy val spark = graft.SparkSpec.session

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private val colTypes: Seq[DataType] =
    Seq(LongType, IntegerType, DoubleType, StringType, BooleanType)

  // small pools force cross-row duplicates (distinct has work to do)
  // and cross-source join hits; numeric pools overlap integrally so a
  // long column and a double column CAN carry equal canonical values
  private def valueGen(dt: DataType): Gen[Any] = {
    val g: Gen[Any] = dt match {
      case LongType => Gen.oneOf(1L, 2L, 3L, 4L)
      case IntegerType => Gen.oneOf(1, 2, 3)
      case DoubleType => Gen.oneOf(1.0d, 2.0d, 2.5d, -3.25d)
      case StringType => Gen.oneOf("a", "b", "2", "")
      case BooleanType => Gen.oneOf(true, false)
      case other => sys.error(s"unexpected $other")
    }
    Gen.frequency(5 -> g, 1 -> Gen.const(null))
  }

  private case class Src(name: String, schema: StructType,
    rows: Seq[Row])

  private val attrPool = Seq("p", "q", "r")

  private def srcGen(name: String): Gen[Src] = for {
    nAttrs <- Gen.choose(1, 3)
    attrs = attrPool.take(nAttrs)
    dts <- Gen.sequence[Seq[DataType], DataType](
      attrs.map(_ => Gen.oneOf(colTypes)))
    nRows <- Gen.choose(1, 12)
    rows <- Gen.sequence[Seq[Row], Row]((1 to nRows).map { i =>
      Gen.sequence[Seq[Any], Any](dts.map(valueGen))
        .map(vs => Row.fromSeq(i.toLong +: vs))
    })
  } yield Src(name,
    StructType(StructField("rid", LongType, nullable = false) +:
      attrs.zip(dts).map { case (a, dt) =>
        StructField(a, dt, nullable = true) }),
    rows)

  /** Pattern conjunction: per source one entity var, 1–attrs patterns
    * with distinct attrs; value positions draw vars from a SHARED
    * small pool (cross-source joins), constants, or wildcards.
    */
  private def patsGen(srcs: Seq[Src]): Gen[Seq[Pattern]] =
    Gen.sequence[Seq[Seq[Pattern]], Seq[Pattern]](
      srcs.zipWithIndex.map { case (s, si) =>
        val attrs = s.schema.fields.drop(1).map(_.name).toSeq
        for {
          n <- Gen.choose(1, attrs.size)
          chosen = attrs.take(n)
          vterms <- Gen.sequence[Seq[QueryCompiler.Term],
            QueryCompiler.Term](chosen.map { a =>
              val dt = s.schema(a).dataType
              Gen.frequency[QueryCompiler.Term](
                5 -> Gen.oneOf("x", "y", "z").map(V(_)),
                2 -> valueGen(dt).retryUntil(_ != null).map(C(_)),
                1 -> Gen.const(W))
            })
        } yield chosen.zip(vterms).map { case (a, vt) =>
          Pattern(V(s"e$si"), C(a), vt, s.name)
        }
      }).map(_.flatten)

  private def render(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  property("native == boxed on arbitrary frames and conjunctions") =
    forAll(Gen.choose(1, 2).flatMap(k =>
      Gen.sequence[Seq[Src], Src]((0 until k).map(i => srcGen(s"s$i")))
        .flatMap(ss => patsGen(ss).map(ps => (ss, ps))))) {
      case (srcs, pats) =>
        val sources = srcs.map(s => s.name -> DocSource(
          spark.createDataFrame(
            spark.sparkContext.parallelize(s.rows, 2), s.schema),
          "rid")).toMap
        val boxed = QueryCompiler.runDocsBoxed(sources, pats)
        val nativeOpt = QueryCompiler.runDocsNative(sources, pats)
        // classify so a vacuous run (native never engaging) is
        // VISIBLE in the report, not silently green
        classify(nativeOpt.isDefined, "native", "fallback") {
          nativeOpt match {
            case Some(native) =>
              val (ns, bs) = (render(native), render(boxed))
              val ok = ns == bs && native.schema == boxed.schema
              if (!ok) println(s"MISMATCH pats=$pats\n native=$ns\n " +
                s"boxed=$bs")
              ok
            case None => // fallback: the authority must still evaluate
              render(boxed); true
          }
        }
    }
}
