package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture application — MERGE INTO semantics as a pure
  * declarative plan: fold a batch of (key, op, ts, payload) change
  * events into a snapshot, latest change per key wins, deletes drop
  * the row, inserts/updates replace it. This is how a training-data
  * pipeline keeps its dimension/metadata tables current without a
  * table format's transaction log (and the per-batch core of one —
  * Delta/Iceberg MERGE compiles to exactly this join shape).
  *
  * Scale shape (100 TB): one window over the CHANGE BATCH (batches
  * are deltas — orders of magnitude smaller than the snapshot) and
  * ONE full-outer join keyed on the snapshot key; with both sides
  * bucketed by key the join is co-partitioned and exchange-free.
  * No collect, nothing iterative.
  *
  * Determinism: the latest-change winner orders by (ts, tie) DESC —
  * equal-timestamp batches resolve identically on every engine.
  */
object Cdc {

  /** @param snapshot current table state; first column set = payload
    * @param changes  change events: keyCol, opCol ('I'/'U'/'D'),
    *                 tsCol, tieCol, plus every snapshot payload column
    * @param keyCol   join key (same name both sides)
    * @param opCol    operation column in `changes`
    * @return the new snapshot, same schema as `snapshot`
    */
  def applyChanges(snapshot: DataFrame, changes: DataFrame,
      keyCol: String, opCol: String, tsCol: String,
      tieCol: String): DataFrame = {
    val dataCols = snapshot.columns.filterNot(_ == keyCol).toSeq
    require(dataCols.forall(changes.columns.contains),
      s"changes must carry every snapshot payload column: $dataCols")
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    val latest = changes
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select((keyCol +: opCol +: dataCols).map(col): _*)
    val s = snapshot.alias("s")
    val c = latest.alias("c")
    val merged = s.join(c, col(s"s.$keyCol") === col(s"c.$keyCol"),
        "full_outer")
      // a change row wins wherever it exists; snapshot-only keys pass
      // through; delete drops below
      .select(
        coalesce(col(s"c.$keyCol"), col(s"s.$keyCol")).as(keyCol) +:
        col(s"c.$opCol").as("__op") +:
        dataCols.map(n =>
          when(col(s"c.$keyCol").isNotNull, col(s"c.$n"))
            .otherwise(col(s"s.$n")).as(n)): _*)
    merged.filter(col("__op").isNull || col("__op") =!= "D")
      .select((keyCol +: dataCols).map(col): _*)
  }
}
