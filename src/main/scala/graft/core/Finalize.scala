package graft.core

import org.apache.spark.sql.{DataFrame, Row}

/** Driver-side result finalization implementing the JSONata sequence
  * flattening rules (reference `jflatten`, `builtin_macros.cljc:49-98`;
  * applied by `finalize`, `builtin.cljc:133-141`):
  *
  *  1. empty sequence → "no match" (None; dropped from parent objects)
  *  2. singleton sequence → the value itself
  *  3. multi-value sequence → array; explicit JSON arrays untouched
  *  4. nested sequences are spliced up
  *
  * This deliberately runs on *collected* results only (bounded output);
  * the distributed plan keeps everything un-collapsed arrays so column
  * types stay stable (SURVEY.md §7.4 risk register).
  */
object Finalize {

  /** A mapping-produced sequence (vs an explicit JSON array). */
  final case class Container(items: Seq[Any])

  /** Apply rules 1–4 to a value tree of Container/Seq/Map/Row/scalar. */
  def jflatten(v: Any): Option[Any] = v match {
    case null => None
    case Container(items) =>
      val flat = items.flatMap {
        case c: Container => splice(c)
        case x => jflatten(x).toSeq
      }
      flat match {
        case Seq() => None          // rule 1
        case Seq(one) => Some(one)  // rule 2
        case many => Some(many)     // rule 3
      }
    case s: Seq[_] => // explicit JSON array: finalize elements, keep arity
      Some(s.flatMap(jflatten))
    case m: Map[_, _] =>
      // keys may be non-string (typed express keys restore to native)
      Some(m.asInstanceOf[Map[Any, Any]].flatMap { case (k, x) =>
        jflatten(x).map(k -> _) // rule 1: no-match entries drop out
      })
    case r: Row =>
      Some(r.schema.fieldNames.zipWithIndex.flatMap { case (n, i) =>
        jflatten(r.get(i)).map(n -> _)
      }.toMap)
    case other => Some(other)
  }

  /** rule 4: nested containers splice into the parent sequence. */
  private def splice(c: Container): Seq[Any] =
    c.items.flatMap {
      case n: Container => splice(n)
      case x => jflatten(x).toSeq
    }

  /** Materialize a (bounded) result frame as finalized values: one
    * finalized value per row for single-column frames, a map per row
    * otherwise; the row sequence itself follows container semantics.
    */
  def result(df: DataFrame): Option[Any] = {
    val rows = df.collect()
    val vals: Seq[Any] = rows.toSeq.map { r =>
      if (r.size == 1) r.get(0) else r
    }
    jflatten(Container(vals))
  }
}
