package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class NfcSpec extends SparkSpec {

  test("NFC composes combining sequences; idempotent; null-safe") {
    import spark.implicits._
    val decomposed = "café"
    val precomposed = "caf\u00e9"
    val df = Seq(Some(decomposed), Some(precomposed), Some("plain"),
      None).toDF("s")
    val out = df.select(NfcNormalize(col("s")).as("n"))
      .collect().map(r => Option(r.getString(0)))
    assert(out(0) == Some(precomposed), "combining sequence composes")
    assert(out(1) == Some(precomposed), "already-NFC passes through")
    assert(out(2) == Some("plain"))
    assert(out(3).isEmpty, "null in, null out")
    // byte-level consequence: dedup hashes now agree across forms
    val hashes = df.filter(col("s").isNotNull)
      .select(md5(NfcNormalize(col("s"))).as("h"))
      .collect().map(_.getString(0))
    assert(hashes(0) == hashes(1) && hashes(0) != hashes(2))
  }

  test("fast path returns the input reference when already normalized") {
    val s = org.apache.spark.unsafe.types.UTF8String.fromString("already")
    assert(NfcText.nfc(s) eq s)
  }
}
