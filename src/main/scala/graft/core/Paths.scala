package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.Jsonata

/** JSONata path/step semantics over array columns (SURVEY.md §2.1;
  * reference `builtin.cljc:174-283`).
  *
  * In the distributed plan everything stays as arrays (never collapse
  * singletons mid-plan — SURVEY §7.4); the jflatten rules apply only at
  * result materialization (Finalize).
  */
object Paths {

  /** `.field` get-step over an array of objects: map the field across
    * elements, dropping "no match" (null) results — the reference's
    * lightweight flatten (`builtin.cljc:245-263`).
    */
  def getStep(arr: Column, field: String): Column =
    filter(transform(arr, _.getField(field)), _.isNotNull)

  /** get-step when the field itself holds arrays: splice children up
    * one level (sequence flattening rule 4).
    */
  def getStepFlatten(arr: Column, field: String): Column =
    flatten(filter(transform(arr, _.getField(field)), _.isNotNull))

  /** `a[i]` NON-COMPOSITIONAL index after a get-step: selects the i-th
    * element *per parent*, never of the merged sequence
    * (`builtin.cljc:206-243`; quirk battery builtin_test.cljc:392-456).
    * `arrOfArr` is the un-flattened per-parent grouping.
    */
  def indexPerParent(arrOfArr: Column, i: Int): Column =
    filter(transform(arrOfArr, p => Jsonata.aref(p, lit(i))), _.isNotNull)

  /** `[i]` on a plain sequence: 0-based, negative from end, null when
    * out of range.
    */
  def index(arr: Column, i: Int): Column = Jsonata.aref(arr, lit(i))

  /** `[pred]` filter-step (non-numeric predicate). */
  def filterStep(arr: Column, pred: Column => Column): Column =
    filter(arr, pred)

  /** `.(expr)` map-step: evaluate per element with `$` bound to it. */
  def mapStep(arr: Column, f: Column => Column): Column = transform(arr, f)

  /** `.[expr]` value-step: each element is replaced by the (array)
    * value of expr (`rewrite.cljc:341-365`).
    */
  def valueStep(arr: Column, f: Column => Column): Column =
    transform(arr, x => f(x))

  /** `[a..b]` range constructor (inclusive). */
  def range(a: Column, b: Column): Column = sequence(a, b)

  /** `~>` thread: plain function application, kept for API parity. */
  def thread(c: Column, f: Column => Column): Column = f(c)
}
