// Scratch: print the analyzed plan of a shredGen output and what
// Shred.unshredSource makes of it.
package graft.tools

import graft.shred.Shred

object UnshredDetect {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("4")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = Seq((1L, "Bob", 10.5, true), (2L, "Alice", 20.0, false))
      .toDF("id", "name", "bal", "vip")
    val t = Shred.shred(docs)
    println("=== analyzed ===")
    println(t.queryExecution.analyzed.toString.take(3000))
    println("=== detect ===")
    println(Shred.unshredSource(t).map { u =>
      s"doc=${u.doc.columns.mkString(",")} e=${u.idExpr} " +
        s"names=${u.shredded} idFunctional=${u.idFunctional}"
    })
    println("=== step-by-step ===")
    locally {
      import org.apache.spark.sql.catalyst.expressions._
      import org.apache.spark.sql.catalyst.plans.logical._
      def strip(e: Expression): Expression = e match {
        case a: Alias => strip(a.child); case e => e }
      t.queryExecution.analyzed match {
        case Project(pl, g: Generate) =>
          println("project over generate; gen is shred=" +
            g.generator.isInstanceOf[graft.shred.ShredGenerator] +
            " outer=" + g.outer + " reqChild=" + g.requiredChildOutput)
          println("pl ids=" + pl.map(strip).map {
            case a: AttributeReference => a.exprId.toString
            case o => "non-attr:" + o.getClass.getSimpleName })
          println("genOut ids=" + g.generatorOutput.map(_.exprId))
          strip(g.generator.asInstanceOf[graft.shred.ShredGenerator]
            .child) match {
            case cns: CreateNamedStruct =>
              println("cns vals=" + cns.valExprs.size)
              val e0 = strip(cns.valExprs.head)
              println("e det=" + e0.deterministic + " nullable=" +
                e0.nullable + " cls=" + e0.getClass.getSimpleName)
              strip(cns.valExprs(1)) match {
                case row: CreateNamedStruct =>
                  val childIds = g.child.output.map(_.exprId).toSet
                  row.nameExprs.zip(row.valExprs.map(strip)).foreach {
                    case (Literal(n, _), a: AttributeReference) =>
                      println(s"entry $n -> ${a.name}#${a.exprId} " +
                        s"inChild=${childIds(a.exprId)}")
                    case (n, v) => println("odd entry " + n + " " +
                      v.getClass.getSimpleName)
                  }
                case o => println("row not CNS: " +
                  o.getClass.getSimpleName)
              }
            case o => println("child not CNS: " +
              o.getClass.getSimpleName)
          }
        case o => println("top: " + o.getClass.getSimpleName)
      }
    }
    spark.stop()
  }
}
