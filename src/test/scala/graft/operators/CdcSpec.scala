package graft.operators

import graft.SparkSpec

class CdcSpec extends SparkSpec {

  test("applyChanges: pass-through, update, delete, insert, and " +
      "latest-wins within the batch") {
    import spark.implicits._
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("k", "v")
    val ch = Seq(
      // key 2: two updates, later ts wins
      (2L, "U", 10, 1, "b1"), (2L, "U", 20, 2, "b2"),
      // key 3: update then delete at the same ts — higher tie wins
      (3L, "U", 30, 1, "c1"), (3L, "D", 30, 2, "x"),
      // key 9: insert
      (9L, "I", 5, 1, "new"))
      .toDF("k", "op", "ts", "tie", "v")
    val out = Cdc.applyChanges(snap, ch, "k", "op", "ts", "tie")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a", 2L -> "b2", 4L -> "d", 9L -> "new"))
  }

  test("applyChanges: delete of an absent key is a no-op, schema " +
      "is preserved") {
    import spark.implicits._
    val snap = Seq((1L, "a", 7)).toDF("k", "v", "n")
    val ch = Seq((99L, "D", 1, 1, "z", 0))
      .toDF("k", "op", "ts", "tie", "v", "n")
    val out = Cdc.applyChanges(snap, ch, "k", "op", "ts", "tie")
    assert(out.columns.toSeq == Seq("k", "v", "n"))
    assert(out.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getInt(2))).toSeq ==
      Seq((1L, "a", 7)))
  }
}
