package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The REAL ImageIO dHash path (round 17): fixtures are encoded
  * in-test with the same JDK ImageIO (BufferedImage → PNG/JPEG
  * bytes), so no binary fixture files and no external codecs — the
  * decode the expression performs is the true inverse of the encode
  * the spec performs. Pins the dHash invariances that make the kernel
  * a dedup key (brightness-shift invariance, format robustness),
  * discrimination between unrelated images, null behavior on corrupt
  * payloads, and the end-to-end block-join pair topology on real
  * signatures.
  */
class ImageHashSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic grayscale test image from a luma function. */
  private def png(w: Int, h: Int, f: (Int, Int) => Int,
      format: String = "png"): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = math.max(0, math.min(255, f(x, y)))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, out)
    out.toByteArray
  }

  private def hashOf(payload: Array[Byte]): Option[Seq[Int]] = {
    val rows = Seq(Tuple1(payload)).toDF("data")
      .select(DHashWordsImageIO(col("data")).as("dh"))
      .collect()
    Option(rows.head.get(0)).map(
      _.asInstanceOf[scala.collection.Seq[Int]].toSeq)
  }

  private def hamming(a: Seq[Int], b: Seq[Int]): Int =
    a.zip(b).map { case (x, y) =>
      Integer.bitCount((x ^ y) & 0xffff) }.sum

  // a gradient-ish image with enough structure that all 64
  // comparisons are decided (no ties at cell granularity)
  private def base(x: Int, y: Int): Int =
    (x * 7 + y * 3 + (x * y) % 11) % 256

  test("decodes real PNG bytes; brightness shift is hash-invariant") {
    val h1 = hashOf(png(90, 80, base)).get
    assert(h1.size == 4 && h1.forall(w => w >= 0 && w < 65536))
    // dHash compares neighboring cells, so +20 luma everywhere
    // preserves every comparison — Hamming 0 (the invariance that
    // makes it a near-dup key, unlike a byte hash: the payloads
    // differ in nearly every byte)
    val h2 = hashOf(png(90, 80, (x, y) => base(x, y) / 2 + 20)).get
    assert(hamming(h1, h2) <= 2,
      s"brightness shift moved ${hamming(h1, h2)} bits")
    // resize robustness: the same scene at half resolution lands
    // within a few bits (area-averaged grid)
    val h3 = hashOf(png(45, 40, (x, y) => base(x * 2, y * 2))).get
    assert(hamming(h1, h3) <= 8,
      s"downscale moved ${hamming(h1, h3)} bits")
    // a genuinely different image is far away
    val noise = hashOf(png(90, 80,
      (x, y) => ((x * 2654435761L + y * 40503L) % 256).toInt)).get
    assert(hamming(h1, noise) >= 16,
      s"unrelated images only ${hamming(h1, noise)} bits apart")
  }

  test("JPEG re-encode of the same scene stays within Hamming radius") {
    val p = hashOf(png(90, 80, base)).get
    val j = hashOf(png(90, 80, base, "jpg")).get
    assert(hamming(p, j) <= 3,
      s"jpeg artifacts moved ${hamming(p, j)} bits")
  }

  test("undecodable payloads yield null, not an exception") {
    assert(hashOf("not an image at all".getBytes("UTF-8")).isEmpty)
    // truncated PNG: header present, data missing
    assert(hashOf(png(20, 20, base).take(30)).isEmpty)
    // null payload passes through the null-intolerant default
    assert(Seq(Tuple1(null: Array[Byte])).toDF("data")
      .select(DHashWordsImageIO(col("data")).as("dh"))
      .collect().head.isNullAt(0))
  }

  test("real signatures drive the block-join dedup topology end-to-end") {
    val rows = Seq(
      (1L, png(90, 80, base)),
      (2L, png(90, 80, (x, y) => base(x, y) / 2 + 20)), // near-dup of 1
      (3L, png(90, 80,
        (x, y) => ((x * 2654435761L + y * 40503L) % 256).toInt)),
      (4L, "corrupt".getBytes("UTF-8"))) // drops out via null sig
      .toDF("id", "data")
    val sigs = rows
      .select(col("id"),
        DHashWordsImageIO(col("data")).as("dh"))
      .filter(col("dh").isNotNull)
    val pairs = graft.pipeline.Multimodal
      .imageDupPairsFromSigs(sigs, maxHamming = 3)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)),
      s"expected exactly the near-dup pair, got $pairs")
  }
}
