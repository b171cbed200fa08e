package graft

import org.apache.spark.sql.functions._
import graft.sources.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zvalue interleaves bits exactly (brute force over a small grid)") {
    def brute(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map { b =>
        (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))
      }.sum
    val df = (for { x <- 0L to 15L; y <- 0L to 15L } yield (x, y))
      .toDF("x", "y")
    // bounds [0, 15] at bits=4: scaled == raw, so zv == brute morton
    val got = df.select(col("x"), col("y"),
        Layout.zvalue(Seq(col("x"), col("y")), Seq(0L, 0L),
          Seq(15L, 15L), bits = 4).as("zv"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == brute(r.getLong(0), r.getLong(1), 4),
        s"(${r.getLong(0)},${r.getLong(1)})")
    }
  }

  test("out-of-bounds values clamp; constant dims contribute no bits") {
    val df = Seq((-5L, 7L), (100L, 7L), (3L, 7L)).toDF("x", "y")
    val zv = df.select(Layout.zvalue(Seq(col("x"), col("y")),
        Seq(0L, 7L), Seq(7L, 7L), bits = 3).as("zv"))
      .collect().map(_.getLong(0))
    // y is constant -> zv is just x's bits spread at stride 2
    def spread(x: Long) = (0 until 3).map(b => ((x >> b) & 1L) << (2 * b)).sum
    assert(zv(0) == spread(0L) && zv(1) == spread(7L) &&
      zv(2) == spread(3L))
  }

  test("z-order layout prunes a 2-d box far better than single-column sort") {
    val li = Tables.lineitem(spark, sf("sf0.01"))
      .select(col("l_partkey").cast("long").as("pk"),
        col("l_suppkey").cast("long").as("sk"))
    val dir = java.nio.file.Files
      .createTempDirectory("layout").toString
    Layout.zorderWrite(li, Seq("pk", "sk"), s"$dir/z", bits = 16,
      files = 16)
    // competing layout: range-sorted by pk only, same file count
    li.repartitionByRange(16, col("pk")).sortWithinPartitions("pk")
      .write.mode("overwrite").parquet(s"$dir/single")

    // file-level skipping under the two layouts, per predicate shape
    def touched(path: String, pred: org.apache.spark.sql.Column): Long =
      Layout.fileSpans(spark, path, Seq("pk", "sk")).filter(pred).count()
    val pkPred = col("pk_min") <= 500 && col("pk_max") >= 251
    val skPred = col("sk_min") <= 24 && col("sk_max") >= 13
    // on the dimension the single-column layout did NOT sort, its
    // spans are full-range in every file: z-order must dominate hard
    val zSk = touched(s"$dir/z", skPred)
    val singleSk = touched(s"$dir/single", skPred)
    assert(singleSk == 16 && zSk <= singleSk / 2,
      s"sk-only: z=$zSk single=$singleSk")
    // on the sorted dimension single-column is optimal; z-order pays
    // for its 2-d locality but must stay within a small factor
    val zPk = touched(s"$dir/z", pkPred)
    val singlePk = touched(s"$dir/single", pkPred)
    // +1: repartitionByRange's reservoir sample seeds off the RDD id,
    // so file boundaries jitter with suite execution order — measured
    // 8 vs 9 touched files for the same data across orderings
    assert(zPk <= 4 * singlePk + 1, s"pk-only: z=$zPk single=$singlePk")
    // across the two-query workload z-order touches fewer files total
    assert(zSk + zPk < singleSk + singlePk,
      s"workload: z=${zSk + zPk} single=${singleSk + singlePk}")
    // and the layout must preserve the data
    assert(spark.read.parquet(s"$dir/z").count() == li.count())
  }

  test("bounds reads min/max in one aggregate") {
    val (mins, maxs) = Layout.bounds(
      Seq((1L, 10L), (5L, -2L)).toDF("a", "b"), Seq("a", "b"))
    assert(mins == Seq(1L, -2L) && maxs == Seq(5L, 10L))
  }

  test("parameter validation fails loudly") {
    assert(intercept[IllegalArgumentException] {
      Layout.zvalue(Seq(col("x")), Seq(0L), Seq(1L), bits = 63)
    }.getMessage.contains("dims*bits"))
    assert(intercept[IllegalArgumentException] {
      Layout.zvalue(Seq(col("x")), Seq(5L), Seq(1L))
    }.getMessage.contains("max"))
  }
}
