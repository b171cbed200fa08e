package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scale pattern: bucketed tables make repeated large joins co-located
  * — no exchange on either side. At 100 TB this is the difference
  * between re-shuffling 100 TB per join and none; the same layout
  * serves every downstream join/aggregation on the key.
  */
class BucketedJoinSpec extends SparkSpec {

  test("join of co-bucketed tables plans without a shuffle") {
    val o = spark.read.parquet(s"${sf("sf0.001")}/orders.parquet")
    val l = spark.read.parquet(s"${sf("sf0.001")}/lineitem.parquet")
    o.write.mode("overwrite").bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    l.write.mode("overwrite").bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey").agg(sum("l_quantity").as("q"))
      val physical = joined.queryExecution.executedPlan.toString
      assert(physical.contains("SortMergeJoin"))
      // co-located: no exchange feeding the join (the only exchange
      // allowed is the final single-partition collect, none here)
      assert(!physical.contains("Exchange hashpartitioning"),
        s"unexpected shuffle in plan:\n$physical")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
