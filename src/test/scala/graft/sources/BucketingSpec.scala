package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed layout → shuffle-free joins/aggs: the plan-level proof of
  * the 100 TB story (write once pre-partitioned, never shuffle the
  * fact table again).
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def withNoBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed join and aggregation plan without an Exchange") {
    val left = (1L to 500L).map(i => (i % 50, s"l$i")).toDF("k", "lv")
    val right = (1L to 500L).map(i => (i % 50, i * 2.0)).toDF("k", "rv")
    Bucketing.writeBucketed(left, "b_left", "k", 8)
    Bucketing.writeBucketed(right, "b_right", "k", 8)
    try withNoBroadcast {
      val joined = Bucketing.bucketedJoin(spark, "b_left", "b_right", "k")
      val jp = joined.queryExecution.executedPlan.toString
      assert(!jp.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$jp")
      assert(joined.count() == 5000) // 10 × 10 per key × 50 keys

      val agg = Bucketing.bucketedAgg(spark, "b_right", "k", "rv" -> "sum")
      val ap = agg.queryExecution.executedPlan.toString
      assert(!ap.contains("Exchange"),
        s"bucketed agg must not shuffle:\n$ap")
      assert(agg.count() == 50)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_left")
      spark.sql("DROP TABLE IF EXISTS b_right")
    }
  }

  test("non-bucketed baseline DOES shuffle (the contrast)") {
    val left = (1L to 500L).map(i => (i % 50, s"l$i")).toDF("k", "lv")
    val right = (1L to 500L).map(i => (i % 50, i * 2.0)).toDF("k", "rv")
    withNoBroadcast {
      val p = left.join(right, "k").queryExecution.executedPlan.toString
      assert(p.contains("Exchange"), p)
    }
  }
}
