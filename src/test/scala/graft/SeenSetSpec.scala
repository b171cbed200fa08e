package graft

import org.apache.spark.sql.functions._
import graft.pipeline.SeenSet

class SeenSetSpec extends SparkSpec {
  import spark.implicits._

  private def keys(n: Int, tag: String) =
    (0 until n).map(i => s"$tag-key-$i").toDF("k")

  test("no false negatives: every built key probes true") {
    val base = keys(200, "a")
    val seen = SeenSet.build(base, "k", mBits = 4096, nHashes = 4,
      nShards = 3)
    val misses = SeenSet.probe(base, "k", seen)
      .filter(!col("maybe_seen")).count()
    assert(misses == 0)
  }

  test("novel() never returns a built key and keeps null keys") {
    val base = keys(100, "a")
    val seen = SeenSet.build(base, "k", mBits = 65536)
    val batch = keys(100, "a").union(keys(50, "b"))
      .union(Seq(Option.empty[String]).toDF("k"))
    val nov = SeenSet.novel(batch, "k", seen).collect().map(_.getString(0))
    assert(!nov.exists(k => k != null && k.startsWith("a-")))
    assert(nov.count(_ == null) == 1)
    // null key probes NULL, not false/true
    val nullProbe = SeenSet.probe(batch.filter(col("k").isNull), "k", seen)
      .select("maybe_seen").head()
    assert(nullProbe.isNullAt(0))
  }

  test("sharding is monotone: positions are shard-independent, so the " +
      "1-shard bitset is the OR of the 4-shard ones") {
    val base = keys(300, "a")
    val batch = keys(600, "a") // half seen, half new
    val one = SeenSet.probe(batch, "k",
        SeenSet.build(base, "k", mBits = 1024, nHashes = 3, nShards = 1))
      .select("k", "maybe_seen").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    val four = SeenSet.probe(batch, "k",
        SeenSet.build(base, "k", mBits = 1024, nHashes = 3, nShards = 4))
      .select("k", "maybe_seen").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    // true members are true under any sharding...
    (0 until 300).foreach { i =>
      assert(one(s"a-key-$i") && four(s"a-key-$i"))
    }
    // ...and sharding never ADDS positives (each shard sees a subset
    // of the single filter's bits), only removes false ones
    four.foreach { case (k, m) => if (m) assert(one(k)) }
    assert(four.count(_._2) <= one.count(_._2))
  }

  test("append == rebuild, bit for bit") {
    val a = keys(80, "a"); val b = keys(80, "b")
    val appended = SeenSet.append(b, "k",
        SeenSet.build(a, "k", mBits = 2048, nShards = 2))
      .orderBy("shard").collect()
    val rebuilt = SeenSet.build(a.union(b), "k", mBits = 2048,
        nShards = 2)
      .orderBy("shard").collect()
    assert(appended.map(_.getSeq[Long](1)).toSeq ==
      rebuilt.map(_.getSeq[Long](1)).toSeq)
    assert(appended.map(_.getLong(2)).sum == 160)
  }

  test("empty build is a valid always-false filter with all shards") {
    val seen = SeenSet.build(keys(5, "a").filter(lit(false)), "k",
      mBits = 256, nShards = 4)
    assert(seen.count() == 4)
    val probed = SeenSet.probe(keys(10, "x"), "k", seen)
    assert(probed.filter(col("maybe_seen")).count() == 0)
    assert(SeenSet.novel(keys(10, "x"), "k", seen).count() == 10)
  }

  test("a saturated tiny filter produces false positives but never misses") {
    val base = keys(150, "a")
    val seen = SeenSet.build(base, "k", mBits = 64, nHashes = 2)
    val probed = SeenSet.probe(keys(150, "a").union(keys(150, "b")),
      "k", seen)
    assert(probed.filter(col("k").startsWith("a-") &&
      !col("maybe_seen")).count() == 0)
    // 64 bits for 300 positions: the b-side must show false positives
    assert(probed.filter(col("k").startsWith("b-") &&
      col("maybe_seen")).count() > 0)
  }

  test("write / open / appendTo round-trip") {
    val dir = java.nio.file.Files
      .createTempDirectory("seenset").toString + "/f"
    SeenSet.write(keys(60, "a"), "k", dir, mBits = 1024, nShards = 2)
    val opened = SeenSet.open(spark, dir)
    assert(SeenSet.probe(keys(60, "a"), "k", opened)
      .filter(!col("maybe_seen")).count() == 0)
    SeenSet.appendTo(spark, keys(40, "b"), "k", dir)
    val after = SeenSet.open(spark, dir)
    assert(SeenSet.probe(keys(40, "b"), "k", after)
      .filter(!col("maybe_seen")).count() == 0)
    assert(after.agg(sum("n_keys")).head().getLong(0) == 100)
  }

  test("mixed-parameter filter frames are rejected") {
    val a = SeenSet.build(keys(5, "a"), "k", mBits = 256)
    val b = SeenSet.build(keys(5, "b"), "k", mBits = 512)
    val e = intercept[IllegalArgumentException] {
      SeenSet.probe(keys(5, "a"), "k", a.union(b))
    }
    assert(e.getMessage.contains("distinct"))
  }

  test("parameter validation fails loudly") {
    assert(intercept[IllegalArgumentException] {
      SeenSet.build(keys(1, "a"), "k", mBits = 100)
    }.getMessage.contains("multiple of 64"))
    assert(intercept[IllegalArgumentException] {
      SeenSet.build(keys(1, "a"), "k", nHashes = 0)
    }.getMessage.contains("nHashes"))
  }
}
